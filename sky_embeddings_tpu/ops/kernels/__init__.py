from sky_embeddings_tpu.ops.kernels import simscore  # noqa: F401
