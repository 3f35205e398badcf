#!/usr/bin/env python
"""On-device kernel parity gate (VERDICT r2 #4).

Compares the *compiled* Pallas kernels (no interpret mode) against their XLA
oracle formulations on the current default device at flagship geometry:

* attn-block: fused forward, recompute backward, bf16-stash backward — the
  production dispatch at ViT-B shapes uses the loop-heads kernels
  (``attn_block._use_loop_heads`` is true for H=12/hd=64), so this exercises
  the loop-heads path end to end;
* mlp-block: fused forward, recompute + stash backwards;
* simscore: one-pass bank scoring at fp32 and bf16 storage.

Each check asserts a max normalized error bound. A Mosaic or XLA-plugin
update that corrupts kernel numerics flips ``ok`` to False — ``bench.py``
embeds the result in the bench JSON so the regression is visible per round
(previously the on-TPU parity claim lived only in a commit message).

Run directly: ``python tools/kernel_parity.py`` prints one JSON line.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

# Normalized-error bounds: generous enough for benign scheduling differences
# between Mosaic and XLA at bf16, far below any real miscompile (O(1) errors).
TOL_FWD = 2e-2
TOL_BWD = 3e-2
TOL_BWD_STASH = 5e-2   # stashed qkv/probs are bf16-quantized by design
# On TPU both XLA and Mosaic execute fp32 contractions as bf16 multiply
# passes at DEFAULT matmul precision, so the two fp32 paths differ by
# bf16-pass rounding (~2e-3 measured on v5e) — not by kernel error. On CPU
# interpret mode they agree to ~0 (verified in tests).
TOL_SCORE_F32 = 5e-3
TOL_SCORE_BF16 = 2e-2


def _rel(a, b) -> float:
    """max|a-b| / max|b| as a host float (computed on device)."""
    diff = jax.jit(lambda x, y: (jnp.max(jnp.abs(x - y)), jnp.max(jnp.abs(y))))(
        a.astype(jnp.float32), b.astype(jnp.float32)
    )
    return float(diff[0]) / (float(diff[1]) + 1e-12)


def _tree_rel(ta, tb) -> float:
    leaves_a = jax.tree_util.tree_leaves(ta)
    leaves_b = jax.tree_util.tree_leaves(tb)
    return max(_rel(a, b) for a, b in zip(leaves_a, leaves_b))


# Extra geometries checked by bench.py on top of the flagship: the MAE
# token-dropped encoder (N=17 — exercises the short-sequence grown tiles)
# and the 512-d MAE decoder. (name, B, N, D, H, F)
MAE_GEOMS = (
    ("mae17", 256, 17, 768, 12, 3072),
    ("dec512", 256, 65, 512, 16, 2048),
)


def _block_checks(
    B: int, N: int, D: int, H: int, F: int, dtype: str, interpret: bool,
) -> dict:
    """attn-block + mlp-block fused-vs-XLA checks at one geometry."""
    from sky_embeddings_tpu.ops.kernels.attn_block import (
        fused_attn_block, xla_attn_block,
    )
    from sky_embeddings_tpu.ops.kernels.mlp_block import (
        fused_mlp_block, xla_mlp_block,
    )

    dt = jnp.dtype(dtype).type
    key = jax.random.PRNGKey(7)
    ks = jax.random.split(key, 10)
    x = jax.random.normal(ks[0], (B, N, D), dt) * 0.5
    g = jax.random.normal(ks[1], (B, N, D), dt)
    scale = 1.0 + 0.1 * jax.random.normal(ks[2], (D,), jnp.float32)
    bias = 0.1 * jax.random.normal(ks[3], (D,), jnp.float32)
    wqkv = (jax.random.normal(ks[4], (D, 3 * D), jnp.float32) * 0.03).astype(dt)
    bqkv = 0.02 * jax.random.normal(ks[5], (3 * D,), jnp.float32)
    wproj = (jax.random.normal(ks[6], (D, D), jnp.float32) * 0.03).astype(dt)
    bproj = 0.02 * jax.random.normal(ks[7], (D,), jnp.float32)
    w1 = (jax.random.normal(ks[8], (D, F), jnp.float32) * 0.03).astype(dt)
    b1 = jnp.zeros((F,), jnp.float32)
    w2 = (jax.random.normal(ks[9], (F, D), jnp.float32) * 0.03).astype(dt)
    b2 = jnp.zeros((D,), jnp.float32)

    checks: dict[str, tuple[float, float]] = {}  # name -> (err, bound)

    # ---- attn block --------------------------------------------------
    want = jax.jit(lambda *a: xla_attn_block(*a, H))(
        x, scale, bias, wqkv, bqkv, wproj, bproj
    )
    got = jax.jit(lambda *a: fused_attn_block(*a, H, 0, 0, interpret))(
        x, scale, bias, wqkv, bqkv, wproj, bproj
    )
    checks["attn_fwd"] = (_rel(got, want), TOL_FWD)

    def vjp_of(fn):
        return jax.jit(
            lambda g_, *a: jax.vjp(fn, *a)[1](g_)
        )(g, x, scale, bias, wqkv, bqkv, wproj, bproj)

    want_g = vjp_of(lambda *a: xla_attn_block(*a, H))
    got_rec = vjp_of(lambda *a: fused_attn_block(*a, H, 0, 0, interpret, False))
    checks["attn_bwd_recompute"] = (_tree_rel(got_rec, want_g), TOL_BWD)
    got_sta = vjp_of(lambda *a: fused_attn_block(*a, H, 0, 0, interpret, True))
    checks["attn_bwd_stash"] = (_tree_rel(got_sta, want_g), TOL_BWD_STASH)

    # ---- mlp block ---------------------------------------------------
    want = jax.jit(xla_mlp_block)(x, scale, bias, w1, b1, w2, b2)
    got = jax.jit(lambda *a: fused_mlp_block(*a, 0, interpret))(
        x, scale, bias, w1, b1, w2, b2
    )
    checks["mlp_fwd"] = (_rel(got, want), TOL_FWD)

    def vjp_mlp(fn):
        return jax.jit(
            lambda g_, *a: jax.vjp(fn, *a)[1](g_)
        )(g, x, scale, bias, w1, b1, w2, b2)

    want_g = vjp_mlp(xla_mlp_block)
    got_rec = vjp_mlp(lambda *a: fused_mlp_block(*a, 0, interpret, False))
    checks["mlp_bwd_recompute"] = (_tree_rel(got_rec, want_g), TOL_BWD)
    got_sta = vjp_mlp(lambda *a: fused_mlp_block(*a, 0, interpret, True))
    checks["mlp_bwd_stash"] = (_tree_rel(got_sta, want_g), TOL_BWD_STASH)
    return checks


def run_kernel_parity(
    B: int = 256, N: int = 65, D: int = 768, H: int = 12, F: int = 3072,
    dtype: str = "bfloat16", interpret: bool = False,
    extra_geoms: tuple = (),
) -> dict:
    """Flagship-geometry checks, plus ``extra_geoms`` entries of
    ``(prefix, B, N, D, H, F)`` (e.g. :data:`MAE_GEOMS`) whose check names
    are prefixed ``<prefix>_``."""
    from sky_embeddings_tpu.ops.kernels.simscore import (
        weighted_bank_scores_pallas, weighted_bank_scores_xla,
    )

    checks: dict[str, tuple[float, float]] = {}
    checks.update(_block_checks(B, N, D, H, F, dtype, interpret))
    for prefix, gb, gn, gd, gh, gf in extra_geoms:
        geom = _block_checks(gb, gn, gd, gh, gf, dtype, interpret)
        checks.update({f"{prefix}_{k}": v for k, v in geom.items()})

    # ---- simscore ----------------------------------------------------
    bank = jax.random.normal(jax.random.PRNGKey(21), (1 << 16, D), jnp.float32)
    tgt = jax.random.normal(jax.random.PRNGKey(22), (D,), jnp.float32)
    w = jax.random.uniform(jax.random.PRNGKey(23), (D,), jnp.float32) + 0.1
    want = weighted_bank_scores_xla(bank, tgt, w)
    got32 = weighted_bank_scores_pallas(bank, tgt, w, interpret=interpret)
    checks["simscore_fp32"] = (_rel(got32, want), TOL_SCORE_F32)
    got16 = weighted_bank_scores_pallas(
        bank.astype(jnp.bfloat16), tgt, w, interpret=interpret
    )
    checks["simscore_bf16_bank"] = (_rel(got16, want), TOL_SCORE_BF16)

    ok = all(err <= bound for err, bound in checks.values())
    return {
        "ok": bool(ok),
        "backend": jax.default_backend(),
        "checks": {k: {"err": round(e, 6), "bound": b} for k, (e, b) in checks.items()},
    }


if __name__ == "__main__":
    print(json.dumps(run_kernel_parity(extra_geoms=MAE_GEOMS)))
