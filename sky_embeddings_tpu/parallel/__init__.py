from sky_embeddings_tpu.parallel import mesh, sharding, zero  # noqa: F401
