from sky_embeddings_tpu.eval import eval_fns, linear_probe  # noqa: F401
