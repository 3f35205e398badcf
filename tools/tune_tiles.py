#!/usr/bin/env python
"""Batch-tile sweep for the fused kernels (VERDICT r2 #2/#9).

Times depth-layer chains of the fused attn/mlp kernels at explicit batch
tiles, across model geometries (ViT-B/L/H), to find the fastest tile per
(kernel, direction, D) — the auto_block_b heuristics are then updated to
match the measured optimum.

    python tools/tune_tiles.py --geom vitl --attn-fwd 16,32 --attn-bwd 8,16

Sync note: on the tunneled runtime block_until_ready returns early — every
timing loop ends with a host transfer (float()).
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

GEOMS = {
    # name: (B, N, D, H, F, depth)
    "vitb": (1024, 65, 768, 12, 3072, 12),
    "vitl": (256, 66, 1024, 16, 4096, 24),
    "vith": (128, 66, 1280, 16, 5120, 32),
    # MAE-mode geometries: token-dropped encoder (mask_ratio 0.75 keeps
    # 16 of 64 patches + cls) and the 512-d decoder over the restored seq
    "maeenc": (1024, 17, 768, 12, 3072, 12),
    "maedec": (1024, 65, 512, 16, 2048, 8),
}


def chain_time(fn, x, n=10, warmup=1):
    for _ in range(warmup):
        out = fn(x)
    float(jnp.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(out)
    float(jnp.asarray(out).ravel()[0])
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--geom", default="vitl", choices=sorted(GEOMS))
    ap.add_argument("--attn-fwd", default="", help="comma tiles; empty=skip")
    ap.add_argument("--attn-bwd", default="", help="comma tiles; empty=skip")
    ap.add_argument("--mlp", default="", help="comma tiles (fwd+bwd); empty=skip")
    ap.add_argument("--attn-fwd-stash", default="",
                    help="comma tiles for the stash-writing fwd; empty=skip")
    ap.add_argument("--mlp-stash", action="store_true")
    ap.add_argument("--stash", action="store_true", default=True)
    ap.add_argument("-n", type=int, default=10)
    ap.add_argument("--pipeline", action="store_true",
                    help="enable the pipelined loop-heads forward "
                         "(attn_block.PIPELINE_FWD) for this sweep")
    ap.add_argument("--pipeline-bwd", action="store_true",
                    help="enable the pipelined loop-heads backward "
                         "(attn_block.PIPELINE_BWD) for this sweep")
    ap.add_argument("--mlp-pipeline", action="store_true",
                    help="enable the row-chunked pipelined MLP forward "
                         "(mlp_block.PIPELINE_FWD) for this sweep")
    ap.add_argument("--mlp-fwd", default="",
                    help="comma tiles for the fwd-only MLP chain; empty=skip")
    ap.add_argument("--rows", action="store_true",
                    help="row-flat 2D MLP tiling: --mlp/--mlp-fwd tiles are "
                         "ROW counts (0 = auto_rows); sweeps rows=True "
                         "against the default 3D layout")
    ap.add_argument("--mlp-stream", action="store_true",
                    help="use the weight-streaming backward (stash='stream') "
                         "in the --mlp chains; tiles are row counts")
    ap.add_argument("--vmem-kib", type=int, default=0,
                    help="raise the scoped-VMEM limit for these compiles "
                         "(0 = XLA default 16384; v5e has 128 MB physical)")
    args = ap.parse_args()
    jit = jax.jit
    if args.vmem_kib:
        jit = functools.partial(
            jax.jit,
            compiler_options={"xla_tpu_scoped_vmem_limit_kib": args.vmem_kib},
        )
    B, N, D, H, F, depth = GEOMS[args.geom]

    from sky_embeddings_tpu.ops.kernels import attn_block as _ab
    from sky_embeddings_tpu.ops.kernels import mlp_block as _mb
    from sky_embeddings_tpu.ops.kernels.attn_block import fused_attn_block
    from sky_embeddings_tpu.ops.kernels.mlp_block import fused_mlp_block

    if args.pipeline:
        _ab.PIPELINE_FWD = True
    if args.pipeline_bwd:
        _ab.PIPELINE_BWD = True
    if args.mlp_pipeline:
        _mb.PIPELINE_FWD = True

    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, N, D), dt) * 0.5
    g = jax.random.normal(key, (B, N, D), dt)
    scale = jnp.ones((D,), jnp.float32)
    bias = jnp.zeros((D,), jnp.float32)
    wqkv = (jax.random.normal(key, (D, 3 * D), jnp.float32) * 0.03).astype(dt)
    bqkv = jnp.zeros((3 * D,), jnp.float32)
    wproj = (jax.random.normal(key, (D, D), jnp.float32) * 0.03).astype(dt)
    bproj = jnp.zeros((D,), jnp.float32)
    w1 = (jax.random.normal(key, (D, F), jnp.float32) * 0.03).astype(dt)
    b1 = jnp.zeros((F,), jnp.float32)
    w2 = (jax.random.normal(key, (F, D), jnp.float32) * 0.03).astype(dt)
    b2 = jnp.zeros((D,), jnp.float32)

    print(f"geom={args.geom} B={B} N={N} D={D} H={H} F={F} depth={depth}", flush=True)

    def report(label, tb, builder):
        try:
            ms = chain_time(builder, x, n=args.n) * 1e3
            print(f"{label:24s} tb={tb:3d}  {ms:8.2f} ms/chain "
                  f"({ms/depth:6.3f} ms/layer)", flush=True)
        except Exception as e:
            print(f"{label:24s} tb={tb:3d}  FAILED: {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)

    for tb in [int(t) for t in args.attn_fwd.split(",") if t]:
        @jit
        def attn_fwd_chain(x, tb=tb):
            for _ in range(depth):
                x = fused_attn_block(
                    x, scale, bias, wqkv, bqkv, wproj, bproj, H, tb, 0, False,
                )
            return x
        report("attn fwd", tb, attn_fwd_chain)

    for tb in [int(t) for t in args.attn_bwd.split(",") if t]:
        @jit
        def attn_vjp_chain(x, tb=tb):
            def f(x):
                for _ in range(depth):
                    x = fused_attn_block(
                        x, scale, bias, wqkv, bqkv, wproj, bproj,
                        H, 0, tb, False, args.stash,
                    )
                return x
            out, vjp = jax.vjp(f, x)
            return vjp(g)[0]
        report(f"attn fwd+bwd stash={args.stash}", tb, attn_vjp_chain)

    for tb in [int(t) for t in args.attn_fwd_stash.split(",") if t]:
        @jit
        def attn_stash_fwd_chain(x, tb=tb):
            def f(x):
                for _ in range(depth):
                    x = fused_attn_block(
                        x, scale, bias, wqkv, bqkv, wproj, bproj,
                        H, tb, 0, False, True,
                    )
                return x
            return jax.vjp(f, x)[0]  # differentiation-path fwd (writes stash)
        report("attn stash-fwd", tb, attn_stash_fwd_chain)

    rows = args.rows
    mlp_stash = "stream" if args.mlp_stream else args.mlp_stash
    for tb in [int(t) for t in args.mlp_fwd.split(",") if t]:
        @jit
        def mlp_fwd_chain(x, tb=tb):
            for _ in range(depth):
                x = fused_mlp_block(x, scale, bias, w1, b1, w2, b2, tb, False,
                                    False, rows)
            return x
        report(f"mlp fwd rows={rows}", tb, mlp_fwd_chain)

    for tb in [int(t) for t in args.mlp.split(",") if t]:
        @jit
        def mlp_vjp_chain(x, tb=tb):
            def f(x):
                for _ in range(depth):
                    x = fused_mlp_block(
                        x, scale, bias, w1, b1, w2, b2, tb, False,
                        mlp_stash, rows,
                    )
                return x
            out, vjp = jax.vjp(f, x)
            return vjp(g)[0]
        report(f"mlp fwd+bwd stash={mlp_stash} rows={rows}", tb, mlp_vjp_chain)


if __name__ == "__main__":
    main()
