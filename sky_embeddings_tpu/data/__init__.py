from sky_embeddings_tpu.data import augment, h5_loader, prefetch, synthetic  # noqa: F401
