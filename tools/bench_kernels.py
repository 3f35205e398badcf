#!/usr/bin/env python
"""Per-kernel TPU microbenchmarks at the flagship geometry (ViT-B, B=1024,
N=65, D=768, bf16). Times forward and forward+backward of each fused kernel
and the XLA formulations, per layer.

Sync note: on the tunneled runtime, block_until_ready returns early — every
timing loop ends with a host transfer (float()).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / n


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(jax.device_get(leaf.ravel()[0]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-B", type=int, default=1024)
    ap.add_argument("-N", type=int, default=65)
    ap.add_argument("-D", type=int, default=768)
    ap.add_argument("-H", type=int, default=12)
    ap.add_argument("-F", type=int, default=3072)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("-n", type=int, default=20)
    ap.add_argument("--only", default="", help="comma list: fab,fab_bwd,fa,fa_bwd,fmb,fmb_bwd,xab,xab_bwd,xmb_bwd,floor")
    args = ap.parse_args()
    B, N, D, H, F = args.B, args.N, args.D, args.H, args.F
    dt = jnp.dtype(args.dtype).type

    from sky_embeddings_tpu.ops.kernels.attn_block import (
        fused_attn_block, xla_attn_block,
    )
    from sky_embeddings_tpu.ops.kernels.attention import fused_attention_ad
    from sky_embeddings_tpu.ops.kernels.mlp_block import fused_mlp_block, xla_mlp_block

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, N, D), dt) * 0.5
    g = jax.random.normal(key, (B, N, D), dt)
    scale = jnp.ones((D,), jnp.float32)
    bias = jnp.zeros((D,), jnp.float32)
    wqkv = (jax.random.normal(key, (D, 3 * D), jnp.float32) * 0.05).astype(dt)
    bqkv = jnp.zeros((3 * D,), jnp.float32)
    wproj = (jax.random.normal(key, (D, D), jnp.float32) * 0.05).astype(dt)
    bproj = jnp.zeros((D,), jnp.float32)
    w1 = (jax.random.normal(key, (D, F), jnp.float32) * 0.05).astype(dt)
    b1 = jnp.zeros((F,), jnp.float32)
    w2 = (jax.random.normal(key, (F, D), jnp.float32) * 0.05).astype(dt)
    b2 = jnp.zeros((D,), jnp.float32)
    qkv = jax.random.normal(key, (B, N, 3 * D), dt)

    flops_layer = 2 * B * N * D * (3 * D + D + 2 * F)  # fwd dense flops
    print(f"geometry: B={B} N={N} D={D} H={H} F={F} dtype={args.dtype}", flush=True)
    print(f"dense fwd FLOPs/layer: {flops_layer/1e9:.1f} GF", flush=True)

    def run(label, fn, *a):
        ms = timeit(fn, *a, n=args.n) * 1e3
        print(f"{label:32s} {ms:8.2f} ms", flush=True)

    which = set(args.only.split(",")) if args.only else None
    sel = lambda name: which is None or name in which

    if sel("fab"):
        fab = jax.jit(lambda *a: fused_attn_block(*a, H))
        run("attn_block fwd", fab, x, scale, bias, wqkv, bqkv, wproj, bproj)
    if sel("fab_bwd"):
        fab_vjp = jax.jit(
            lambda g_, *a: jax.vjp(lambda *b: fused_attn_block(*b, H), *a)[1](g_)
        )
        run("attn_block fwd+bwd", fab_vjp, g, x, scale, bias, wqkv, bqkv, wproj, bproj)
    if sel("fa"):
        fa = jax.jit(lambda q: fused_attention_ad(q, H))
        run("attention(old) fwd", fa, qkv)
    if sel("fa_bwd"):
        fa_vjp = jax.jit(
            lambda g_, q: jax.vjp(lambda qq: fused_attention_ad(qq, H), q)[1](g_)
        )
        run("attention(old) fwd+bwd", fa_vjp, x, qkv)
    if sel("fmb"):
        fmb = jax.jit(lambda *a: fused_mlp_block(*a))
        run("mlp_block fwd", fmb, x, scale, bias, w1, b1, w2, b2)
    if sel("fmb_bwd"):
        fmb_vjp = jax.jit(
            lambda g_, *a: jax.vjp(lambda *b: fused_mlp_block(*b), *a)[1](g_)
        )
        run("mlp_block fwd+bwd", fmb_vjp, g, x, scale, bias, w1, b1, w2, b2)
    if sel("xab"):
        xab = jax.jit(lambda *a: xla_attn_block(*a, H))
        run("attn_block fwd (XLA)", xab, x, scale, bias, wqkv, bqkv, wproj, bproj)
    if sel("xab_bwd"):
        xab_vjp = jax.jit(
            lambda g_, *a: jax.vjp(lambda *b: xla_attn_block(*b, H), *a)[1](g_)
        )
        run("attn_block fwd+bwd (XLA)", xab_vjp, g, x, scale, bias, wqkv, bqkv, wproj, bproj)
    if sel("xmb_bwd"):
        xmb_vjp = jax.jit(
            lambda g_, *a: jax.vjp(lambda *b: xla_mlp_block(*b), *a)[1](g_)
        )
        run("mlp_block fwd+bwd (XLA)", xmb_vjp, g, x, scale, bias, w1, b1, w2, b2)
    if sel("floor"):
        x2 = x.reshape(B * N, D)

        @jax.jit
        def dense_floor(x2_, wqkv_, wproj_, w1_, w2_):
            a = jnp.dot(x2_, wqkv_, preferred_element_type=jnp.float32).astype(dt)
            b_ = jnp.dot(a[:, :D], wproj_, preferred_element_type=jnp.float32).astype(dt)
            c = jnp.dot(b_, w1_, preferred_element_type=jnp.float32).astype(dt)
            d = jnp.dot(c, w2_, preferred_element_type=jnp.float32).astype(dt)
            return d

        run("dense matmuls fwd floor", dense_floor, x2, wqkv, wproj, w1, w2)


if __name__ == "__main__":
    main()
