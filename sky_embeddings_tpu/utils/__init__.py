from sky_embeddings_tpu.utils import checkpoint, misc  # noqa: F401
