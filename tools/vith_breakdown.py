#!/usr/bin/env python
"""Per-stage timing of the ViT-H training step (VERDICT r4 weak #4).

``BENCH_r04.json`` put ViT-H (mimhuge 32×1280/16h, SimMIM, B=256) at 52.3%
MFU vs ViT-L's 59.3%, and r4's plateau diagnosis ("XLA MLP already at
roofline, fused attention structurally below it") was argued from kernel
chains, not measured on the step's actual pieces. This tool attributes the
~7-point gap the way ``tools/ft_breakdown.py`` did for the predictor:

  * the full SimMIM ViT-H step (bench geometry, B=256);
  * the bare encoder chain (32 × [fused attn (no stash) + XLA mlp]);
  * per-sub-block chains: fused attention alone, XLA mlp alone, and the
    mlp's matmuls without LN (``ln_cost = mlp − matmuls``: is the unfused
    LN/residual HBM traffic around the XLA mlp the remaining cost?);
  * the AdamW update alone (3×2.5 GB fp32 moment/param traffic at 632M
    params — the fixed HBM floor);
  * the remainder (patchify/embed/decoder/loss).

Each piece also prints its achieved TFLOPS against the 197 bf16 peak.

    python tools/vith_breakdown.py [-n 10] [--trace DIR]

``--trace`` additionally captures a ``jax.profiler`` trace of a few full
steps into DIR for offline inspection.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

D, HEADS, F, DEPTH, N = 1280, 16, 5120, 32, 66
PEAK = 197.0  # bf16 TFLOPS, v5e


def _sync(x):
    return float(jnp.asarray(x).ravel()[0])


def timed_ms(fn, *args, n=10):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / n * 1e3


def _block_params(key, dt):
    scale = jnp.ones((D,), jnp.float32)
    bias = jnp.zeros((D,), jnp.float32)
    wqkv = (jax.random.normal(key, (D, 3 * D), jnp.float32) * 0.02).astype(dt)
    bqkv = jnp.zeros((3 * D,), jnp.float32)
    wproj = (jax.random.normal(key, (D, D), jnp.float32) * 0.02).astype(dt)
    bproj = jnp.zeros((D,), jnp.float32)
    w1 = (jax.random.normal(key, (D, F), jnp.float32) * 0.02).astype(dt)
    b1 = jnp.zeros((F,), jnp.float32)
    w2 = (jax.random.normal(key, (F, D), jnp.float32) * 0.02).astype(dt)
    b2 = jnp.zeros((D,), jnp.float32)
    return scale, bias, wqkv, bqkv, wproj, bproj, w1, b1, w2, b2


def chain_ms(B, n, kind):
    """fwd+bwd over a DEPTH-layer chain of the requested sub-block mix."""
    from sky_embeddings_tpu.ops.kernels.attn_block import fused_attn_block
    from sky_embeddings_tpu.ops.kernels.mlp_block import xla_mlp_block

    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    (scale, bias, wqkv, bqkv, wproj, bproj, w1, b1, w2, b2) = _block_params(key, dt)
    x = jax.random.normal(key, (B, N, D), dt) * 0.5
    g = jax.random.normal(key, (B, N, D), dt)

    def attn(x):
        return fused_attn_block(
            x, scale, bias, wqkv, bqkv, wproj, bproj, HEADS, 0, 0, False, False
        )

    def mlp(x):
        return xla_mlp_block(x, scale, bias, w1, b1, w2, b2)

    def matmuls(x):
        # the mlp's MXU work without the LN (bias/GELU/residual kept):
        # ln_cost = mlp − this
        h = jnp.dot(x.reshape(-1, D), w1, preferred_element_type=jnp.float32) + b1
        h = jax.nn.gelu(h, approximate=False).astype(dt)
        o = jnp.dot(h, w2, preferred_element_type=jnp.float32) + b2
        return x + o.reshape(x.shape).astype(dt)

    body = {"enc": lambda x: mlp(attn(x)), "attn": attn, "mlp": mlp,
            "mlp_matmuls": matmuls}[kind]

    @jax.jit
    def chain(x):
        def f(x):
            for _ in range(DEPTH):
                x = body(x)
            return x
        out, vjp = jax.vjp(f, x)
        return vjp(g)[0]

    return timed_ms(chain, x, n=n)


def full_step_ms(B, n, trace_dir=None):
    import numpy as np

    from sky_embeddings_tpu.models.mim import SkyMIM
    from sky_embeddings_tpu.train.optim import pretrain_optimizer
    from sky_embeddings_tpu.train.pretrain import make_mim_step
    from sky_embeddings_tpu.train.schedules import cosine_annealing
    from sky_embeddings_tpu.train.state import TrainState

    model = SkyMIM(
        img_size=64, patch_size=8, in_chans=9, embed_dim=D, depth=DEPTH,
        num_heads=HEADS, simmim=True, norm_pix_loss=True, loss_fn="l1",
        ra_dec=True, dtype=jnp.bfloat16, stash=False,
    )
    key = jax.random.PRNGKey(0)
    imgs = jax.random.normal(key, (B, 9, 64, 64), jnp.float32)
    ra_dec = jnp.zeros((B, 2), jnp.float32)
    variables = jax.jit(model.init)(
        {"params": key, "mask": key}, imgs[:2], ra_dec=ra_dec[:2],
        mask=jnp.zeros((2, 9, 64, 64), jnp.float32),
    )
    params = variables["params"]
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
    tx = pretrain_optimizer(params, cosine_annealing(1e-4, 10_000, 1e4), 0.05)
    state = TrainState.create(params, tx, key)
    step = jax.jit(
        make_mim_step(model=model, tx=tx, max_mask_ratio=0.9, train=True),
        donate_argnums=(0,),
    )

    state, loss = step(state, imgs, ra_dec)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(n):
        state, loss = step(state, imgs, ra_dec)
    float(loss)
    ms = (time.perf_counter() - t0) / n * 1e3

    if trace_dir:
        with jax.profiler.trace(trace_dir):
            for _ in range(3):
                state, loss = step(state, imgs, ra_dec)
            float(loss)
        print(f"profiler trace written to {trace_dir}", flush=True)
    return ms, n_params


def adamw_update_ms(n):
    """AdamW over a ViT-H-sized param tree (the fixed HBM floor)."""
    import functools

    import optax

    from sky_embeddings_tpu.train.optim import pretrain_optimizer
    from sky_embeddings_tpu.train.schedules import cosine_annealing

    key = jax.random.PRNGKey(0)
    params = {
        f"l{i}": {
            "wqkv": jax.random.normal(key, (D, 3 * D), jnp.float32) * 0.02,
            "wproj": jax.random.normal(key, (D, D), jnp.float32) * 0.02,
            "w1": jax.random.normal(key, (D, F), jnp.float32) * 0.02,
            "w2": jax.random.normal(key, (F, D), jnp.float32) * 0.02,
        }
        for i in range(DEPTH)
    }
    tx = pretrain_optimizer(params, cosine_annealing(1e-4, 10_000, 1e4), 0.05)
    opt_state = jax.jit(tx.init)(params)
    grads = jax.tree_util.tree_map(lambda p: jnp.ones_like(p) * 1e-4, params)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def upd(params, opt_state, grads):
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    params, opt_state = upd(params, opt_state, grads)
    _sync(params["l0"]["wproj"])
    t0 = time.perf_counter()
    for _ in range(n):
        params, opt_state = upd(params, opt_state, grads)
    _sync(params["l0"]["wproj"])
    return (time.perf_counter() - t0) / n * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=10)
    ap.add_argument("-B", type=int, default=256)
    ap.add_argument("--trace", type=str, default=None)
    args = ap.parse_args()
    B, n = args.B, args.n

    ms_full, n_params = full_step_ms(B, n, trace_dir=args.trace)
    print(f"full SimMIM step  B={B}: {ms_full:8.2f} ms  "
          f"({B / ms_full * 1e3:7.1f} img/s)  [{n_params/1e6:.0f}M params]",
          flush=True)
    enc = chain_ms(B, n, "enc")
    print(f"encoder chain (32x attn+mlp): {enc:8.2f} ms", flush=True)
    attn = chain_ms(B, n, "attn")
    mlp = chain_ms(B, n, "mlp")
    mm = chain_ms(B, n, "mlp_matmuls")
    # achieved TFLOPS: fwd+bwd ≈ 3× the forward matmul FLOPs
    attn_fl = 3 * 2 * B * N * (4 * D * D + 2 * N * D) * DEPTH
    mlp_fl = 3 * 2 * B * N * (2 * D * F) * DEPTH
    print(f"attention chain alone:        {attn:8.2f} ms "
          f"({attn_fl / attn / 1e9:6.1f} TF/s vs {PEAK:.0f} peak)", flush=True)
    print(f"XLA mlp chain alone:          {mlp:8.2f} ms "
          f"({mlp_fl / mlp / 1e9:6.1f} TF/s)", flush=True)
    print(f"mlp matmuls (no LN):          {mm:8.2f} ms "
          f"({mlp_fl / mm / 1e9:6.1f} TF/s)  -> LN+stats cost "
          f"{mlp - mm:6.2f} ms", flush=True)
    opt = adamw_update_ms(n)
    print(f"AdamW update (fixed grads):   {opt:8.2f} ms", flush=True)
    print(f"remainder (patchify/embed/decoder/loss/mask): "
          f"{ms_full - enc - opt:8.2f} ms", flush=True)
    print(f"attn+mlp sum vs enc chain:    {attn + mlp:8.2f} vs {enc:8.2f} ms "
          f"(layout-transition delta {enc - attn - mlp:+.2f})", flush=True)


if __name__ == "__main__":
    main()
