from sky_embeddings_tpu.ops import losses, masking  # noqa: F401
