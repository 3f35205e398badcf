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

import functools
import json
import os
import sys
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

    import functools as _ft

    @_ft.partial(jax.jit, donate_argnums=(0, 1))
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

    # Leg 1b: the supervised stream (buffer-mode shuffle + labels — what
    # train_predictor.py runs) with worker processes: the r3 VERDICT flagged
    # that num_workers was a silent no-op off the chunk path; this row
    # records the worker-parallel supervised rate. On a 1-core host (this
    # harness) forked readers only add IPC overhead (measured: 20.2k img/s
    # in-process vs 8.0k at 2 workers), so workers are only engaged when
    # cores exist to run them.
    cores = os.cpu_count() or 1
    sup_workers = 0 if cores < 4 else min(4, cores - 1)
    sup = H5Batcher(
        E2E_FILE, batch_size=B, img_size=64, shuffle=True,
        shuffle_mode="buffer", label_keys=["zspec"], pixel_min=None,
        num_workers=sup_workers,
    )
    it = sup.forever()
    next(it)
    t0 = time.perf_counter()
    for _ in range(10):
        next(it)
    sup_rate = B * 10 / (time.perf_counter() - t0)
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
    return B * n_steps / dt, loader_rate, h2d_mb_s, sup_rate, sup_workers


def vit_train_gflops_per_img(
    depth: int, d: int, n_tokens: int, mlp_ratio: float = 4.0,
    dec_depth: int = 0, dec_d: int = 0, dec_tokens: int = 0,
    patch_in: int = 0, bwd_mult: float = 3.0,
) -> float:
    """Model-FLOPs per image for a ViT encoder(+optional MAE decoder) train
    step: per layer 2·N·D·(4D + 2F) dense + 4·N²·D attention math; fwd+bwd
    = ``bwd_mult``× forward. ``patch_in`` adds the patchify/pred projections.
    Reproduces the hardcoded 34 GF for SimMIM ViT-B (12×768, N=65)."""
    def enc(L, D, N, ratio=mlp_ratio):
        f = D * ratio
        return L * (2 * N * D * (4 * D + 2 * f) + 4 * N * N * D)

    fl = enc(depth, d, n_tokens)
    if dec_depth:
        fl += enc(dec_depth, dec_d, dec_tokens)
        fl += 2 * dec_tokens * d * dec_d          # decoder_embed
        fl += 2 * dec_tokens * dec_d * patch_in   # decoder_pred
    if patch_in:
        fl += 2 * n_tokens * patch_in * d         # patch embed
        if not dec_depth:                          # simmim 1x1-conv decoder
            fl += 2 * n_tokens * d * patch_in
    return fl * bwd_mult / 1e9


def _time_train_step(model, B, n_steps, rng_mask=False, in_chans=5, img=64,
                     ra_dec=False, compiler_options=None):
    """Compile + time a full train step (mask gen, fwd, bwd, AdamW) at B.

    ``compiler_options`` reaches the top-level step jit — used to raise
    ``xla_tpu_scoped_vmem_limit_kib`` for the wide-model kernels (v5e has
    128 MB physical VMEM; the XLA default scoped limit is far lower)."""
    import jax
    import jax.numpy as jnp
    import optax

    from sky_embeddings_tpu.ops.masking import simmim_batch_mask
    from sky_embeddings_tpu.train.optim import pretrain_optimizer
    from sky_embeddings_tpu.train.schedules import cosine_annealing

    key = jax.random.PRNGKey(0)
    imgs = jax.random.normal(key, (B, in_chans, img, img), jnp.float32)
    rd = jnp.zeros((B, 2), jnp.float32) if ra_dec else None
    kw = dict(ra_dec=rd) if ra_dec else {}
    init_rngs = {"params": key, "mask": key} if rng_mask else key
    variables = jax.jit(model.init)(
        init_rngs, imgs[:2], mask=jnp.zeros((2, in_chans, img, img)),
        **({"ra_dec": rd[:2]} if ra_dec else {}),
    )
    params = variables["params"]
    tx = pretrain_optimizer(params, cosine_annealing(1e-4, 10_000, 1e4), 0.05)
    opt_state = jax.jit(tx.init)(params)

    # donate params+opt_state: in-place updates, required headroom for ViT-H
    # (632M params x fp32 x {p, m, v, grads} would otherwise double-buffer)
    @functools.partial(jax.jit, donate_argnums=(0, 1),
                       compiler_options=compiler_options)
    def step(params, opt_state, imgs, key):
        k_mask, k_next = jax.random.split(key)

        def loss_fn(p):
            if rng_mask:  # MAE: token masking drawn from the rng stream
                loss, _, _ = model.apply(
                    {"params": p}, imgs, rngs={"mask": k_mask}, **kw
                )
            else:
                mask = simmim_batch_mask(
                    k_mask, imgs.shape[0], in_chans, img, model.patch_size, 0.9
                )
                loss, _, _ = model.apply({"params": p}, imgs, mask=mask, **kw)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, k_next

    params, opt_state, loss, key = step(params, opt_state, imgs, key)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        params, opt_state, loss, key = step(params, opt_state, imgs, key)
    float(loss)
    return B * n_steps / (time.perf_counter() - t0)


def bench_mae(B=1024, n_steps=20, stash_decoder=True, pack_tokens=4):
    """MAE-mode pretraining (token dropping at mask_ratio 0.75: the encoder
    sees 17 of 65 tokens; 512-d 8-deep decoder over the full sequence —
    reference ``mim_vit.py:440-471`` semantics). Returns (img/s, GF/img).

    ``stash_decoder=False`` drops the decoder's qkv+probs attention stash
    (~1 GB/layer at B=2048 — the allocation that OOMs the plain B=2048
    attempt, BASELINE.md r4) in exchange for backward recompute.
    ``pack_tokens`` packs that many samples per encoder sequence under the
    block-diagonal attention mask (models/mim.py). Default 4 — the r5 A/B
    against the 17-token sublane padding measured pack=4 fastest (68-token
    sequences land on the flagship-tuned 72-row tiles): 5 030.8 img/s
    (48.4% MFU) vs 4 931.5 (47.5%) unpacked, with pack=2 far slower
    (2 953.7; 40-row tiles)."""
    import jax.numpy as jnp

    from sky_embeddings_tpu.models.mim import SkyMIM

    model = SkyMIM(
        img_size=64, patch_size=8, in_chans=5, embed_dim=768, depth=12,
        num_heads=12, simmim=False, norm_pix_loss=True, loss_fn="l1",
        mask_ratio=0.75, dtype=jnp.bfloat16, stash_decoder=stash_decoder,
        pack_tokens=pack_tokens,
    )
    gflop = vit_train_gflops_per_img(
        12, 768, 17, dec_depth=8, dec_d=512, dec_tokens=65, patch_in=320
    )
    rate = _time_train_step(model, B, n_steps, rng_mask=True)
    return rate, gflop


def bench_vit_l(B=256, n_steps=10):
    """ViT-L at the shipped ``mim_32`` geometry (mimlarge: 24×1024/16h,
    9-band, ra_dec token), scan encoder + fused loop-heads kernels."""
    import jax.numpy as jnp

    from sky_embeddings_tpu.models.mim import SkyMIM

    model = SkyMIM(
        img_size=64, patch_size=8, in_chans=9, embed_dim=1024, depth=24,
        num_heads=16, simmim=True, norm_pix_loss=True, loss_fn="l1",
        ra_dec=True, dtype=jnp.bfloat16, scan_blocks=False, stash_mlp=True,
    )
    gflop = vit_train_gflops_per_img(24, 1024, 66, patch_in=576)
    rate = _time_train_step(model, B, n_steps, in_chans=9, ra_dec=True)
    return rate, gflop


def bench_vit_h(B=256, n_steps=5):
    """ViT-H (mimhuge: 32×1280/16h, reference ``mim_vit.py:603-612``) at the
    mim_32 data geometry — the VERDICT r2 #2 'record ViT-H' row."""
    import jax.numpy as jnp

    from sky_embeddings_tpu.models.mim import SkyMIM

    model = SkyMIM(
        img_size=64, patch_size=8, in_chans=9, embed_dim=1280, depth=32,
        num_heads=16, simmim=True, norm_pix_loss=True, loss_fn="l1",
        ra_dec=True, dtype=jnp.bfloat16, scan_blocks=False, remat=False,
        stash=False,
    )
    gflop = vit_train_gflops_per_img(32, 1280, 66, patch_in=576)
    rate = _time_train_step(model, B, n_steps, in_chans=9, ra_dec=True)
    return rate, gflop


def bench_predictor_ft(B=256, n_steps=20):
    """Predictor fine-tune step — the second training loop a reference user
    runs (``train_predictor.py``, reference ``vit.py:138-161``): ViT-B
    backbone + map-pooling head, mse loss, layer-decay AdamW at the z_ft
    geometry. Returns (img/s, GF/img)."""
    import jax
    import jax.numpy as jnp

    from sky_embeddings_tpu.models.predictor import SkyViT
    from sky_embeddings_tpu.train import optim
    from sky_embeddings_tpu.train.predictor import make_predictor_step
    from sky_embeddings_tpu.train.schedules import linear_lr
    from sky_embeddings_tpu.train.state import TrainState

    model = SkyViT(
        img_size=64, patch_size=8, in_chans=5, embed_dim=768, depth=12,
        num_heads=12, num_labels=1, global_pool="map", dtype=jnp.bfloat16,
    )
    key = jax.random.PRNGKey(0)
    imgs = jax.random.normal(key, (B, 5, 64, 64), jnp.float32)
    labels = jax.random.uniform(key, (B, 1), jnp.float32)
    ra_dec = jnp.zeros((B, 2), jnp.float32)  # unused (model.ra_dec=False)
    params = jax.jit(model.init)(key, imgs[:2])["params"]
    tx = optim.finetune_optimizer(
        params, lambda lr: linear_lr(lr, 10_000, 1e4), model.depth,
        layer_decay=0.75, init_lr=1e-4, weight_decay=0.05,
    )
    state = TrainState.create(params, tx, key)
    step = jax.jit(
        make_predictor_step(
            model=model, tx=tx, loss_fn_name="mse", use_label_errs=False,
            augment=False, augment_params={}, train=True,
        ),
        donate_argnums=(0,),
    )
    # encoder + patch embed + map-pool probe (1 query over N keys at D)
    n_tok = model.grid_size**2 + 1
    gflop = vit_train_gflops_per_img(model.depth, model.embed_dim, n_tok)
    gflop += 3.0 * (
        2 * n_tok * 320 * model.embed_dim            # patch embed
        + 4 * n_tok * model.embed_dim**2             # map-pool q/kv proj
        + 4 * n_tok * model.embed_dim                # probe attn math
    ) / 1e9

    state, loss, _ = step(state, imgs, ra_dec, labels)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, loss, _ = step(state, imgs, ra_dec, labels)
    float(loss)
    return B * n_steps / (time.perf_counter() - t0), gflop


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


def bench_retrieval(n_bank=1_000_000, d=768, n=50):
    """Weighted-cosine top-300 over a survey-scale bank (tracked metric).

    The production path (``EmbeddingBank.query`` default at this scale) is
    the two-stage scorer: int8 dots-only cut selected via ``approx_max_k``,
    then an exact weighted-cosine rescore of the 8192 candidates against
    the stored bf16 rows — that is the headline q/s. The single-pass
    native-bf16 XLA scorer (``exact=True``) is measured alongside. fp32
    top-300 agreement of each path is verified in the same run.
    """
    import numpy as np

    import jax
    import jax.numpy as jnp

    from sky_embeddings_tpu.ops.kernels.simscore import (
        bank_topk,
        bank_topk_int8,
        quantize_bank_int8,
        weighted_bank_scores_xla,
    )

    key = jax.random.PRNGKey(0)
    bank32 = jax.random.normal(key, (n_bank, d), jnp.float32)
    bank = bank32.astype(jnp.bfloat16)
    bank8, rnorm = quantize_bank_int8(bank32)
    tgt = jax.random.normal(jax.random.PRNGKey(1), (d,), jnp.float32)
    w = jax.random.uniform(jax.random.PRNGKey(2), (d,), jnp.float32) + 0.1

    # agreement gate: every candidate winner's fp32 score reaches the cut
    vals32, _ = bank_topk(bank32, tgt, w, 300)
    full32 = np.asarray(weighted_bank_scores_xla(bank32, tgt, w))
    cut = float(np.asarray(vals32)[-1])

    def agreement_of(idx):
        return float(np.mean(full32[np.asarray(idx)] >= cut - 5e-3))

    _, idx16 = bank_topk(bank, tgt, w, 300)
    agreement = agreement_of(idx16)
    _, idx8 = bank_topk_int8(bank8, rnorm, bank, tgt, w, 300)
    agreement8 = agreement_of(idx8)
    del bank32, full32

    def rate(fn, *args):
        vals, _ = fn(*args)
        float(vals[0])
        t0 = time.perf_counter()
        for _ in range(n):
            vals, _ = fn(*args)
        float(vals[0])
        return n / (time.perf_counter() - t0)

    qps = rate(bank_topk, bank, tgt, w, 300)
    qps8 = rate(bank_topk_int8, bank8, rnorm, bank, tgt, w, 300)
    return qps, agreement, qps8, agreement8


def _retrieval_keys(out, retrieval):
    """Emit the retrieval metrics (headline = the production two-stage path)."""
    qps_exact, agreement, qps_2stage, agreement8 = retrieval
    out["retrieval_queries_per_sec_1m_bank"] = round(qps_2stage, 1)
    out["retrieval_top300_agreement"] = round(agreement8, 4)
    out["retrieval_bf16_exact_queries_per_sec"] = round(qps_exact, 1)
    out["retrieval_bf16_top300_agreement"] = round(agreement, 4)


def main():
    B, step, params, opt_state, imgs, key = _build()
    dev_rate, params, opt_state, key = bench_device_step(
        B, step, params, opt_state, imgs, key
    )
    def _attempt(name, fn, *a, **kw):
        # A failed stage must be attributable, not a silently-missing key.
        try:
            return fn(*a, **kw)
        except Exception as e:
            import traceback
            print(f"bench stage '{name}' failed: {e!r}", file=sys.stderr)
            traceback.print_exc(file=sys.stderr)
            errors[name] = repr(e)
            return None

    errors: dict = {}
    e2e = _attempt("end_to_end", bench_end_to_end, B, step, params, opt_state, key)
    extract_rate = _attempt("extraction", bench_extraction)
    retrieval = _attempt("retrieval", bench_retrieval)
    mae = _attempt("mae", bench_mae)
    vit_l = _attempt("vit_l", bench_vit_l)
    vit_h = _attempt("vit_h", bench_vit_h)
    pred_ft = _attempt("predictor_ft", bench_predictor_ft)
    # iso-batch with the flagship: the B=256 row's 5-point MFU gap is the
    # fixed AdamW state traffic amortized over 4x fewer images (ft
    # breakdown, BASELINE.md r4); at B=1024 the ft step matches flagship MFU
    pred_ft_1024 = _attempt("predictor_ft_b1024", bench_predictor_ft, 1024)

    def _parity():
        from tools.kernel_parity import MAE_GEOMS, run_kernel_parity

        return run_kernel_parity(extra_geoms=MAE_GEOMS)

    parity = _attempt("kernel_parity", _parity)

    baseline = A100_REFERENCE_IMG_PER_SEC * TARGET_MULTIPLIER
    out = {
        "metric": "mim_pretrain_img_per_sec_per_chip",
        "value": round(dev_rate, 1),
        "unit": "img/s",
        "vs_baseline": round(dev_rate / baseline, 3),
        "mfu_pct": round(dev_rate * MODEL_GFLOP_PER_IMG / (PEAK_BF16_TFLOPS * 1e3) * 100, 1),
    }
    if e2e is not None:
        e2e_rate, loader_rate, h2d_mb_s, sup_rate, sup_workers = e2e
        out["end_to_end_img_per_sec"] = round(e2e_rate, 1)
        out["host_loader_img_per_sec"] = round(loader_rate, 1)
        out["supervised_loader_img_per_sec"] = round(sup_rate, 1)
        out["supervised_loader_workers"] = sup_workers
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
    if retrieval is not None:
        _retrieval_keys(out, retrieval)
    def _mfu(rate, gflop):
        return round(rate * gflop / (PEAK_BF16_TFLOPS * 1e3) * 100, 1)

    for name, res in (
        ("mae", mae), ("vit_l", vit_l), ("vit_h", vit_h),
        ("predictor_ft", pred_ft), ("predictor_ft_b1024", pred_ft_1024),
    ):
        if res is not None:
            rate, gflop = res
            out[f"{name}_img_per_sec"] = round(rate, 1)
            out[f"{name}_mfu_pct"] = _mfu(rate, gflop)
    if parity is not None:
        out["kernel_parity_ok"] = parity["ok"]
        out["kernel_parity_max_err"] = max(
            c["err"] for c in parity["checks"].values()
        )
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
