from sky_embeddings_tpu.cluster import queue_tpu  # noqa: F401
