#!/usr/bin/env python
"""Benchmark: flagship MIM pretraining throughput (images/sec/chip).

Two stages, one JSON line:

1. **Device step** — the full compiled training step (on-device SimMIM mask
   generation, ViT-B forward, NaN-aware masked loss, backward, AdamW update)
   on synthetic device-resident data: the pure device ceiling.
2. **End-to-end** — the same step fed from a synthetic-but-on-disk HDF5 file
   through the production input path (``H5Batcher`` chunk-shuffle mode +
   ``device_prefetch``): what a real ``pretrain_mim.py`` run sustains,
   loader → host→device transfer → step (VERDICT r1 #1).

Output keys:
  value / vs_baseline   device-step img/s vs the 5×A100 north-star target
  end_to_end_img_per_sec  disk→step throughput (within 5% of `value` = the
                          input pipeline keeps the device fed)
  mfu_pct               model-FLOPs utilization: 34 GFLOP/img (ViT-B fwd+bwd
                        at 64px/p8, ≈3× forward) vs the v5e bf16 peak
                        197 TFLOPS (sustained chained-matmul ceiling measured
                        at ~166-177 TFLOPS on this chip; see BASELINE.md)

Baseline: the reference publishes no numbers (BASELINE.md). Measured anchor:
the reference-equivalent fp32 torch model (tests/torch_oracle.py) does
2.46 img/s/core on this host's CPU (tools/bench_torch_reference.py). The
comparison constant below remains the driver's north-star target — 5× an
A100 running the fp32 PyTorch reference at this geometry, with the A100
figure estimated at 600 img/s (ViT-B fwd+bwd ≈ 33-34 GFLOP/img; fp32 A100
≈ 19.5 TFLOPS peak, ~50% realized, input-bound reference loop).
vs_baseline = measured/(5·600); ≥1.0 meets the target.
"""

import json
import os
import time

A100_REFERENCE_IMG_PER_SEC = 600.0
TARGET_MULTIPLIER = 5.0
MODEL_GFLOP_PER_IMG = 34.0           # ViT-B fwd+bwd, 64px / patch 8 geometry
PEAK_BF16_TFLOPS = 197.0             # TPU v5e chip peak
E2E_FILE = os.environ.get("SKY_BENCH_H5", "/tmp/sky_bench_data.h5")
E2E_IMAGES = 16384


def _build():
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

    return B, step, params, opt_state, imgs, key


def bench_device_step(B, step, params, opt_state, imgs, key, n_steps=30):
    # Warmup / compile. NOTE: sync via host transfer (float(...)) — on the
    # tunneled TPU runtime block_until_ready returns before execution
    # finishes, which silently inflates throughput ~400×.
    params, opt_state, loss, key = step(params, opt_state, imgs, key)
    float(loss)

    t0 = time.perf_counter()
    for _ in range(n_steps):
        params, opt_state, loss, key = step(params, opt_state, imgs, key)
    float(loss)
    dt = time.perf_counter() - t0
    return B * n_steps / dt, params, opt_state, key


def bench_end_to_end(B, step, params, opt_state, key, n_steps=10):
    """Disk h5 → H5Batcher(chunk shuffle) → device_prefetch → train step.

    Also measures the two legs separately (host loader img/s, host→device
    MB/s) so the end-to-end number is attributable: on this harness the TPU
    is reached through a network tunnel whose H2D path sustains only
    ~17 MB/s (measured) — on a real TPU VM (PCIe, >10 GB/s) the loader rate
    is the binding constraint and exceeds the device step rate.
    """
    import jax
    import numpy as np

    from sky_embeddings_tpu.data.h5_loader import H5Batcher
    from sky_embeddings_tpu.data.prefetch import device_prefetch
    from sky_embeddings_tpu.data.synthetic import write_synthetic_h5

    if not os.path.exists(E2E_FILE):
        write_synthetic_h5(E2E_FILE, E2E_IMAGES, channels=5, img_size=64,
                           nan_band_frac=0.05)
    batcher = H5Batcher(
        E2E_FILE, batch_size=B, img_size=64, shuffle=True,
        shuffle_mode="chunk", pixel_min=None,  # clip fused into the step
    )

    # Leg 1: host loader alone.
    it = batcher.forever()
    next(it)
    t0 = time.perf_counter()
    for _ in range(10):
        next(it)
    loader_rate = B * 10 / (time.perf_counter() - t0)
    it.close()

    # Leg 2: host->device link bandwidth.
    x = np.zeros((B, 5, 64, 64), np.float32)
    y = jax.device_put(x); float(y.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(3):
        y = jax.device_put(x)
        float(y.ravel()[0])
    h2d_mb_s = 3 * x.nbytes / 1e6 / (time.perf_counter() - t0)

    # Full chain.
    stream = device_prefetch(batcher.forever(), size=2)
    batch = next(stream)
    params, opt_state, loss, key = step(params, opt_state, batch["cutouts"], key)
    float(loss)

    t0 = time.perf_counter()
    for _ in range(n_steps):
        batch = next(stream)
        params, opt_state, loss, key = step(params, opt_state, batch["cutouts"], key)
    float(loss)
    dt = time.perf_counter() - t0
    stream.close()
    return B * n_steps / dt, loader_rate, h2d_mb_s


def bench_extraction(B=1024, n=20):
    """Encoder-only embedding extraction (BASELINE.json tracked metric)."""
    import jax
    import jax.numpy as jnp

    from sky_embeddings_tpu.models.mim import SkyMIM

    model = SkyMIM(img_size=64, patch_size=8, in_chans=5, embed_dim=768,
                   depth=12, num_heads=12, simmim=True, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    imgs = jax.random.normal(key, (B, 5, 64, 64), jnp.float32)
    variables = jax.jit(model.init)(key, imgs[:2], mask=jnp.zeros((2, 5, 64, 64)))

    @jax.jit
    def extract(vs, imgs):
        tokens, _, _ = model.apply(vs, imgs, method=SkyMIM.encode)
        return tokens

    out = extract(variables, imgs)
    float(out.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = extract(variables, imgs)
    float(out.ravel()[0])
    return B * n / (time.perf_counter() - t0)


def bench_retrieval(n_bank=1_000_000, d=768, n=20):
    """Weighted-cosine top-300 over a survey-scale bank (tracked metric)."""
    import jax
    import jax.numpy as jnp

    from sky_embeddings_tpu.ops.kernels.simscore import bank_topk

    key = jax.random.PRNGKey(0)
    bank = jax.random.normal(key, (n_bank, d), jnp.float32)
    tgt = jax.random.normal(jax.random.PRNGKey(1), (d,), jnp.float32)
    w = jax.random.uniform(jax.random.PRNGKey(2), (d,), jnp.float32) + 0.1
    vals, _ = bank_topk(bank, tgt, w, 300)
    float(vals[0])
    t0 = time.perf_counter()
    for _ in range(n):
        vals, _ = bank_topk(bank, tgt, w, 300)
    float(vals[0])
    return n / (time.perf_counter() - t0)


def main():
    B, step, params, opt_state, imgs, key = _build()
    dev_rate, params, opt_state, key = bench_device_step(
        B, step, params, opt_state, imgs, key
    )
    try:
        e2e = bench_end_to_end(B, step, params, opt_state, key)
    except Exception:
        e2e = None
    try:
        extract_rate = bench_extraction()
    except Exception:
        extract_rate = None
    try:
        retrieval_qps = bench_retrieval()
    except Exception:
        retrieval_qps = None

    baseline = A100_REFERENCE_IMG_PER_SEC * TARGET_MULTIPLIER
    out = {
        "metric": "mim_pretrain_img_per_sec_per_chip",
        "value": round(dev_rate, 1),
        "unit": "img/s",
        "vs_baseline": round(dev_rate / baseline, 3),
        "mfu_pct": round(dev_rate * MODEL_GFLOP_PER_IMG / (PEAK_BF16_TFLOPS * 1e3) * 100, 1),
    }
    if e2e is not None:
        e2e_rate, loader_rate, h2d_mb_s = e2e
        out["end_to_end_img_per_sec"] = round(e2e_rate, 1)
        out["host_loader_img_per_sec"] = round(loader_rate, 1)
        out["h2d_link_mb_per_sec"] = round(h2d_mb_s, 1)
        # attribute the gap: with a tunneled H2D link slower than ~the batch
        # rate the chain measures the tunnel, not the framework
        img_mb = 5 * 64 * 64 * 4 / 1e6
        out["e2e_bottleneck"] = (
            "h2d-link" if h2d_mb_s < img_mb * min(dev_rate, loader_rate)
            else ("host-loader" if loader_rate < dev_rate else "device-step")
        )
    if extract_rate is not None:
        out["extraction_img_per_sec"] = round(extract_rate, 1)
    if retrieval_qps is not None:
        out["retrieval_queries_per_sec_1m_bank"] = round(retrieval_qps, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
