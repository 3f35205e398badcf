from sky_embeddings_tpu.train import optim, schedules  # noqa: F401
