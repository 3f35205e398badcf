from sky_embeddings_tpu.models import layers, location, pos_embed  # noqa: F401
