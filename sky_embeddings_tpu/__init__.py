"""sky_embeddings_tpu — a TPU-native (JAX / XLA / Pallas / pjit) framework for
self-supervised learning on astronomical sky-survey cutouts.

Re-designed from scratch with the capabilities of the reference repo
``teaghan/sky_embeddings`` (masked image modelling on HSC cutouts, downstream
classification / redshift regression, and survey-scale similarity search), but
built TPU-first:

* models are pure-functional ``flax.linen`` modules compiled with ``jax.jit``;
* masking, augmentation, and losses run on device inside the compiled step;
* scaling is expressed with ``jax.sharding.Mesh`` + ``NamedSharding`` so XLA
  inserts the collectives (no hand-written communication);
* the hot retrieval path (similarity scoring + streaming top-k) has a fused
  Pallas kernel;
* checkpointing is functional (train-state PyTree + metric history).

Layout:
    configuration  INI-compatible config system (drop-in schema parity)
    models/        ViT encoder/decoder stacks, positional & location encoders
    ops/           patchify, masking, losses, similarity (+ Pallas kernels)
    parallel/      mesh + sharding helpers
    train/         optimizers, schedules, train states, training loops
    data/          host-side streaming datasets (HDF5, FITS) + device augment
    eval/          embedding extraction, linear probes, metrics, simsearch
    utils/         plotting, checkpointing, misc
    cluster/       job-farm launchers (TPU equivalent of the Slurm tooling)
"""

__version__ = "0.1.0"


def _honor_platform_env() -> None:
    """Make ``JAX_PLATFORMS`` authoritative even when a PJRT plugin has
    already registered itself: on some managed runtimes the plugin wins the
    backend race regardless of the env var, so ``JAX_PLATFORMS=cpu
    python pretrain_mim.py …`` would still try (and, with the link down,
    hang on) the accelerator. Mirroring the env var into the live config
    restores the documented JAX semantics for every CLI/tool that imports
    this package. No-op when the var is unset."""
    import os

    platforms = os.environ.get("JAX_PLATFORMS", "").strip()
    if not platforms:
        return
    import jax

    try:
        jax.config.update("jax_platforms", platforms)
    except Exception:  # config locked after backend init — leave it be
        pass


_honor_platform_env()
