from sky_embeddings_tpu.parallel import mesh, sharding  # noqa: F401
