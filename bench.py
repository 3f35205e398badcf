#!/usr/bin/env python
"""Benchmark: flagship MIM pretraining throughput (images/sec/chip).

Measures the full compiled training step — on-device SimMIM mask generation,
ViT-B forward, NaN-aware masked loss, backward, AdamW update — on synthetic
device-resident data (the input pipeline is benchmarked separately; the
reference's hot loop is measured the same way, per-batch step time).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "img/s", "vs_baseline": N}

Baseline: the reference publishes no numbers (BASELINE.md). The comparison
constant below is the driver's north-star target — 5× an A100 running the
fp32 PyTorch reference on the same geometry, with the A100 figure estimated
at 600 img/s (ViT-B fwd+bwd ≈ 33 GFLOP/img at 64px/p8; fp32 A100 ≈ 19.5
TFLOPS peak, ~50% realized, input-bound reference loop). vs_baseline is
measured/(5·600): ≥1.0 meets the target. Update the constant when a measured
A100 number exists.
"""

import json
import time

A100_REFERENCE_IMG_PER_SEC = 600.0
TARGET_MULTIPLIER = 5.0


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from sky_embeddings_tpu.models.mim import SkyMIM
    from sky_embeddings_tpu.ops.masking import simmim_batch_mask
    from sky_embeddings_tpu.train.optim import pretrain_optimizer
    from sky_embeddings_tpu.train.schedules import cosine_annealing

    model = SkyMIM(
        img_size=64, patch_size=8, in_chans=5, embed_dim=768, depth=12,
        num_heads=12, simmim=True, norm_pix_loss=True, loss_fn="l1",
        dtype=jnp.bfloat16,
    )
    B = 1024
    key = jax.random.PRNGKey(0)
    imgs = jax.random.normal(key, (B, 5, 64, 64), jnp.float32)
    variables = jax.jit(model.init)(key, imgs[:2], mask=jnp.zeros((2, 5, 64, 64)))
    params = variables["params"]
    tx = pretrain_optimizer(params, cosine_annealing(1e-4, 10_000, 1e4), 0.05)
    opt_state = jax.jit(tx.init)(params)

    @jax.jit
    def step(params, opt_state, imgs, key):
        k_mask, k_next = jax.random.split(key)
        mask = simmim_batch_mask(k_mask, B, 5, 64, 8, 0.9)

        def loss_fn(p):
            loss, _, _ = model.apply({"params": p}, imgs, mask=mask)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, k_next

    # Warmup / compile. NOTE: sync via host transfer (float(...)) — on the
    # tunneled TPU runtime block_until_ready returns before execution
    # finishes, which silently inflates throughput ~400×.
    params, opt_state, loss, key = step(params, opt_state, imgs, key)
    float(loss)

    n_steps = 30
    t0 = time.perf_counter()
    for _ in range(n_steps):
        params, opt_state, loss, key = step(params, opt_state, imgs, key)
    float(loss)
    dt = time.perf_counter() - t0

    img_per_sec = B * n_steps / dt
    baseline = A100_REFERENCE_IMG_PER_SEC * TARGET_MULTIPLIER
    print(
        json.dumps(
            {
                "metric": "mim_pretrain_img_per_sec_per_chip",
                "value": round(img_per_sec, 1),
                "unit": "img/s",
                "vs_baseline": round(img_per_sec / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
