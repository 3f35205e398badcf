"""Fused attention block kernel: LN → qkv → attention → proj → residual.

Fuses the whole pre-norm attention sub-block

    out = x + W_proj · attn(W_qkv · LN(x))

into one Pallas call per direction. Two backward strategies (``stash``
flag; see ``fused_attn_block``):

* **recompute** (``stash=False``): only ``x`` is saved; the backward
  re-derives LN, qkv and the softmax probabilities in VMEM. Lowest memory
  — the right mode under ``remat``.
* **stash** (``stash=True``, the training default): the differentiation-
  path forward also writes qkv and the per-head softmax probabilities
  (bf16) to HBM — writes that overlap the MXU-bound matmuls — and the
  backward skips their recompute. Measured on v5e at ViT-B B=1024:
  fwd+bwd 13.7 → 10.5 ms/layer for ~400 MB/layer of stash.

Head-math strategies (kernel-side dispatch, ``_use_loop_heads``):

* **loop** (default whenever the 128-lane head-group count divides H):
  a ``fori_loop`` over head groups (2 heads/iter at hd=64, 8 at hd=80)
  slicing qkv/ctx VMEM scratch refs at 128-aligned lane offsets. Compiles
  in O(1) of the head count and measured slightly faster than the unroll.
* **unroll**: static per-head loop with lane-axis slices — fallback for
  head counts with no aligned group decomposition (tiny test geometries).
  Its Mosaic compile cost grows superlinearly with H (H=16 takes ~10 min
  or OOMs the compile helper — the reason the loop form exists).
* **pipelined loop** (``PIPELINE_FWD`` / ``PIPELINE_BWD``, opt-in): the
  loop carries the next group's MXU precursors (fwd: logits; bwd: dp and
  recompute-mode logits) one iteration ahead so each group's VPU softmax
  pass has an independent MXU stream to overlap with. Identical numerics;
  enable per-process via SKY_ATTN_PIPELINE[_BWD]=1 after measuring with
  ``tools/tune_tiles.py --pipeline [--pipeline-bwd]``. **A/B-measured on
  v5e (r3, tools/ab_pipeline.sh): no win** — the fwd+bwd training chain is
  10.5 ms/layer either way (11.2 with both pipelined), and what the sweep
  initially credited to pipelining was a batch-tile effect (the stash-fwd
  simply wants tb=16, now the ``auto_block_b_fwd`` default). Stays opt-in
  for re-measurement on future toolchains.

Layout notes:
* sequences are short (≤ ~70 tokens), so a (batch-tile, ·) slab of every
  intermediate fits VMEM; batch tiles shrink automatically for wider
  models (``auto_block_b``);
* LN statistics, softmax, bias adds and all matmul accumulations are fp32;
  matmul operands are the input dtype (bf16 in the training configs);
* parameter gradients accumulate across the (sequential) grid in fp32
  outputs with constant index maps, initialized at step 0.

Reference semantics: pre-norm timm ``Block.attn`` (``mim_vit.py:422-423``
uses timm blocks; qkv bias on, no qk-norm, proj bias on).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

DEFAULT_BLOCK_B_FWD = 32
DEFAULT_BLOCK_B_BWD = 16

# Software-pipelined head loop for the loop-heads forward kernels: iteration
# j issues group j+1's logits matmuls (MXU) alongside group j's softmax (VPU)
# so the two units overlap instead of serializing per group. Numerics are
# identical to the straight loop (same per-head ops, same order of rounding).
# Off by default until measured faster on-chip (tools/tune_tiles.py
# --pipeline); flip via env SKY_ATTN_PIPELINE=1 or the module attribute.
import os as _os

PIPELINE_FWD = _os.environ.get("SKY_ATTN_PIPELINE", "0") == "1"
PIPELINE_BWD = _os.environ.get("SKY_ATTN_PIPELINE_BWD", "0") == "1"


def _ln_forward(x2: jnp.ndarray, scale, bias, eps=1e-6):
    mu = x2.mean(axis=-1, keepdims=True)
    var = ((x2 - mu) ** 2).mean(axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (x2 - mu) * rstd
    return xhat * scale + bias, xhat, rstd


def _seg_bias(N: int, seg_len: int):
    """Static block-diagonal segment mask for sequence packing.

    ``seg_len > 0`` declares the N tokens to be ``N // seg_len`` independent
    samples packed along the sequence axis (MAE short-sequence packing: two
    17-token samples share one 40-row sublane tile instead of two 24-row
    ones). Cross-segment logits get −1e9 before the softmax — exp underflows
    to exactly 0 in fp32, so packed attention ≡ per-sample attention. The
    mask is a compile-time constant; the stash backward needs no mask at all
    (stashed probs already carry the zeros, and softmax-backward's
    ``dp·p − p·Σ(dp·p)`` vanishes wherever ``p = 0``).
    """
    if not seg_len or seg_len >= N:
        return None
    ids = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0) // seg_len
    jds = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1) // seg_len
    return jnp.where(ids == jds, 0.0, -1e9).astype(jnp.float32)


def _softmax(logits, attn_scale: float, seg_bias):
    z = logits * attn_scale
    if seg_bias is not None:
        z = z + seg_bias
    return jax.nn.softmax(z, axis=-1)


def _heads_forward(qkv3, num_heads: int, head_dim: int, out_dtype, seg_bias=None):
    """(TB, N, 3D) qkv activations -> (TB, N, D) context, fp32 softmax."""
    D = num_heads * head_dim
    scale = head_dim ** -0.5
    ctx_parts = []
    for h in range(num_heads):
        lo = h * head_dim
        q = qkv3[:, :, lo : lo + head_dim]
        k = qkv3[:, :, D + lo : D + lo + head_dim]
        v = qkv3[:, :, 2 * D + lo : 2 * D + lo + head_dim]
        logits = jax.lax.dot_general(
            q, k, dimension_numbers=((((2,), (2,))), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        probs = _softmax(logits, scale, seg_bias)
        ctx = jax.lax.dot_general(
            probs.astype(qkv3.dtype), v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        ctx_parts.append(ctx.astype(out_dtype))
    return jnp.concatenate(ctx_parts, axis=-1)


def _fwd_kernel(
    x_ref, scale_ref, bias_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, out_ref,
    *, num_heads: int, seg_len: int = 0,
):
    TB, N, D = x_ref.shape
    x2 = x_ref[:].reshape(TB * N, D).astype(jnp.float32)
    y, _, _ = _ln_forward(x2, scale_ref[0], bias_ref[0])
    y_c = y.astype(wqkv_ref.dtype)
    qkv = (
        jnp.dot(y_c, wqkv_ref[:], preferred_element_type=jnp.float32) + bqkv_ref[0]
    )
    qkv3 = qkv.reshape(TB, N, 3 * D).astype(wqkv_ref.dtype)
    ctx = _heads_forward(
        qkv3, num_heads, D // num_heads, wproj_ref.dtype, _seg_bias(N, seg_len)
    )
    ctx2 = ctx.reshape(TB * N, D)
    out = (
        jnp.dot(ctx2, wproj_ref[:], preferred_element_type=jnp.float32) + bproj_ref[0]
    )
    out_ref[:] = (x2 + out).reshape(TB, N, D).astype(out_ref.dtype)


def _bwd_kernel(
    x_ref, scale_ref, bias_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, g_ref,
    dx_ref, dscale_ref, dbias_ref, dwqkv_ref, dbqkv_ref, dwproj_ref, dbproj_ref,
    *, num_heads: int, seg_len: int = 0,
):
    from jax.experimental import pallas as pl

    TB, N, D = x_ref.shape
    hd = D // num_heads
    attn_scale = hd ** -0.5
    seg_bias = _seg_bias(N, seg_len)
    x2 = x_ref[:].reshape(TB * N, D).astype(jnp.float32)
    g2 = g_ref[:].reshape(TB * N, D).astype(jnp.float32)
    scale = scale_ref[0]

    # ---- recompute forward intermediates ----
    y, xhat, rstd = _ln_forward(x2, scale, bias_ref[0])
    y_c = y.astype(wqkv_ref.dtype)
    qkv = jnp.dot(y_c, wqkv_ref[:], preferred_element_type=jnp.float32) + bqkv_ref[0]
    qkv3 = qkv.reshape(TB, N, 3 * D).astype(wqkv_ref.dtype)

    g_c = g2.astype(wproj_ref.dtype)
    dctx = jnp.dot(g_c, wproj_ref[:].T, preferred_element_type=jnp.float32)
    dctx3 = dctx.reshape(TB, N, D)

    # ---- per-head attention forward recompute + backward ----
    bd = lambda a, b, contract, batch=((0,), (0,)): jax.lax.dot_general(
        a, b, dimension_numbers=(contract, batch), preferred_element_type=jnp.float32
    )
    ctx_parts, dqkv_parts = [], [None] * (3 * num_heads)
    for h in range(num_heads):
        lo = h * hd
        q = qkv3[:, :, lo : lo + hd]
        k = qkv3[:, :, D + lo : D + lo + hd]
        v = qkv3[:, :, 2 * D + lo : 2 * D + lo + hd]
        logits = bd(q, k, ((2,), (2,)))
        probs = _softmax(logits, attn_scale, seg_bias)  # (TB, N, N) fp32
        probs_c = probs.astype(v.dtype)

        ctx_parts.append(bd(probs_c, v, ((2,), (1,))).astype(v.dtype))

        dc = dctx3[:, :, lo : lo + hd].astype(v.dtype)
        dv = bd(probs_c, dc, ((1,), (1,)))                    # (TB, N, hd)
        dp = bd(dc, v, ((2,), (2,)))                          # (TB, N, N)
        tmp = dp * probs
        ds = (tmp - probs * tmp.sum(axis=-1, keepdims=True)) * attn_scale
        ds_c = ds.astype(q.dtype)
        dqkv_parts[h] = bd(ds_c, k, ((2,), (1,)))             # dq
        dqkv_parts[num_heads + h] = bd(ds_c, q, ((1,), (1,)))  # dk
        dqkv_parts[2 * num_heads + h] = dv

    ctx2 = jnp.concatenate(ctx_parts, axis=-1).reshape(TB * N, D)
    dqkv = jnp.concatenate(dqkv_parts, axis=-1).reshape(TB * N, 3 * D)
    dqkv_c = dqkv.astype(wqkv_ref.dtype)

    dy = jnp.dot(dqkv_c, wqkv_ref[:].T, preferred_element_type=jnp.float32)

    # ---- LayerNorm backward ----
    dxhat = dy * scale
    m1 = dxhat.mean(axis=-1, keepdims=True)
    m2 = (dxhat * xhat).mean(axis=-1, keepdims=True)
    dx_ln = rstd * (dxhat - m1 - xhat * m2)
    dx_ref[:] = (g2 + dx_ln).reshape(TB, N, D).astype(dx_ref.dtype)

    # ---- parameter gradients, accumulated across the sequential grid ----
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dscale_ref[:] = jnp.zeros_like(dscale_ref)
        dbias_ref[:] = jnp.zeros_like(dbias_ref)
        dwqkv_ref[:] = jnp.zeros_like(dwqkv_ref)
        dbqkv_ref[:] = jnp.zeros_like(dbqkv_ref)
        dwproj_ref[:] = jnp.zeros_like(dwproj_ref)
        dbproj_ref[:] = jnp.zeros_like(dbproj_ref)

    dscale_ref[0] += (dy * xhat).sum(axis=0)
    dbias_ref[0] += dy.sum(axis=0)
    dwqkv_ref[:] += jnp.dot(y_c.T, dqkv_c, preferred_element_type=jnp.float32)
    dbqkv_ref[0] += dqkv.sum(axis=0)
    dwproj_ref[:] += jnp.dot(ctx2.T, g_c, preferred_element_type=jnp.float32)
    dbproj_ref[0] += g2.sum(axis=0)


def _fwd_stash_kernel(
    x_ref, scale_ref, bias_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
    out_ref, qkv_ref, probs_ref,
    *, num_heads: int, seg_len: int = 0,
):
    """Forward that also writes qkv (bf16, 2D (B·N, 3D)) and the per-head
    softmax probabilities (bf16, (B, H, N, N)) for the stash backward."""
    TB, N, D = x_ref.shape
    hd = D // num_heads
    attn_scale = hd ** -0.5
    seg_bias = _seg_bias(N, seg_len)
    x2 = x_ref[:].reshape(TB * N, D).astype(jnp.float32)
    y, _, _ = _ln_forward(x2, scale_ref[0], bias_ref[0])
    y_c = y.astype(wqkv_ref.dtype)
    qkv = (
        jnp.dot(y_c, wqkv_ref[:], preferred_element_type=jnp.float32) + bqkv_ref[0]
    )
    qkv3 = qkv.astype(qkv_ref.dtype).reshape(TB, N, 3 * D)
    qkv_ref[...] = qkv3
    ctx_parts = []
    for h in range(num_heads):
        lo = h * hd
        q = qkv3[:, :, lo : lo + hd]
        k = qkv3[:, :, D + lo : D + lo + hd]
        v = qkv3[:, :, 2 * D + lo : 2 * D + lo + hd]
        logits = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        probs = _softmax(logits, attn_scale, seg_bias)
        probs_c = probs.astype(probs_ref.dtype)
        probs_ref[:, h, :, :] = probs_c
        ctx = jax.lax.dot_general(
            probs_c, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        ctx_parts.append(ctx.astype(wproj_ref.dtype))
    ctx2 = jnp.concatenate(ctx_parts, axis=-1).reshape(TB * N, D)
    out = (
        jnp.dot(ctx2, wproj_ref[:], preferred_element_type=jnp.float32) + bproj_ref[0]
    )
    out_ref[:] = (x2 + out).reshape(TB, N, D).astype(out_ref.dtype)


def _bwd_stash_kernel(
    x_ref, scale_ref, bias_ref, wqkv_ref, wproj_ref, qkv_ref, probs_ref, g_ref,
    dx_ref, dscale_ref, dbias_ref, dwqkv_ref, dbqkv_ref, dwproj_ref, dbproj_ref,
    *, num_heads: int,
):
    """Backward consuming stashed qkv + probs: no qkv-matmul, logits-matmul or
    softmax recompute — only LN (VPU) and ctx = probs·v (for dW_proj)."""
    from jax.experimental import pallas as pl

    TB, N, D = x_ref.shape
    hd = D // num_heads
    attn_scale = hd ** -0.5
    x2 = x_ref[:].reshape(TB * N, D).astype(jnp.float32)
    g2 = g_ref[:].reshape(TB * N, D).astype(jnp.float32)
    scale = scale_ref[0]

    y, xhat, rstd = _ln_forward(x2, scale, bias_ref[0])
    y_c = y.astype(wqkv_ref.dtype)
    qkv3 = qkv_ref[:]

    g_c = g2.astype(wproj_ref.dtype)
    dctx = jnp.dot(g_c, wproj_ref[:].T, preferred_element_type=jnp.float32)
    dctx3 = dctx.reshape(TB, N, D)

    bd = lambda a, b, contract, batch=((0,), (0,)): jax.lax.dot_general(
        a, b, dimension_numbers=(contract, batch), preferred_element_type=jnp.float32
    )
    ctx_parts, dqkv_parts = [], [None] * (3 * num_heads)
    for h in range(num_heads):
        lo = h * hd
        q = qkv3[:, :, lo : lo + hd]
        k = qkv3[:, :, D + lo : D + lo + hd]
        v = qkv3[:, :, 2 * D + lo : 2 * D + lo + hd]
        probs_c = probs_ref[:, h, :, :]
        probs = probs_c.astype(jnp.float32)

        ctx_parts.append(bd(probs_c, v, ((2,), (1,))).astype(v.dtype))

        dc = dctx3[:, :, lo : lo + hd].astype(v.dtype)
        dv = bd(probs_c, dc, ((1,), (1,)))                    # (TB, N, hd)
        dp = bd(dc, v, ((2,), (2,)))                          # (TB, N, N)
        tmp = dp * probs
        ds = (tmp - probs * tmp.sum(axis=-1, keepdims=True)) * attn_scale
        ds_c = ds.astype(q.dtype)
        dqkv_parts[h] = bd(ds_c, k, ((2,), (1,)))             # dq
        dqkv_parts[num_heads + h] = bd(ds_c, q, ((1,), (1,)))  # dk
        dqkv_parts[2 * num_heads + h] = dv

    ctx2 = jnp.concatenate(ctx_parts, axis=-1).reshape(TB * N, D)
    dqkv = jnp.concatenate(dqkv_parts, axis=-1).reshape(TB * N, 3 * D)
    dqkv_c = dqkv.astype(wqkv_ref.dtype)

    dy = jnp.dot(dqkv_c, wqkv_ref[:].T, preferred_element_type=jnp.float32)

    dxhat = dy * scale
    m1 = dxhat.mean(axis=-1, keepdims=True)
    m2 = (dxhat * xhat).mean(axis=-1, keepdims=True)
    dx_ln = rstd * (dxhat - m1 - xhat * m2)
    dx_ref[:] = (g2 + dx_ln).reshape(TB, N, D).astype(dx_ref.dtype)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dscale_ref[:] = jnp.zeros_like(dscale_ref)
        dbias_ref[:] = jnp.zeros_like(dbias_ref)
        dwqkv_ref[:] = jnp.zeros_like(dwqkv_ref)
        dbqkv_ref[:] = jnp.zeros_like(dbqkv_ref)
        dwproj_ref[:] = jnp.zeros_like(dwproj_ref)
        dbproj_ref[:] = jnp.zeros_like(dbproj_ref)

    dscale_ref[0] += (dy * xhat).sum(axis=0)
    dbias_ref[0] += dy.sum(axis=0)
    dwqkv_ref[:] += jnp.dot(y_c.T, dqkv_c, preferred_element_type=jnp.float32)
    dbqkv_ref[0] += dqkv.sum(axis=0)
    dwproj_ref[:] += jnp.dot(ctx2.T, g_c, preferred_element_type=jnp.float32)
    dbproj_ref[0] += g2.sum(axis=0)


def _head_group(hd: int) -> int:
    """Heads per 128-lane-aligned slab (Mosaic requires dynamic lane slices
    to start at multiples of 128): hd=64 -> 2, hd=80 -> 8, hd=128 -> 1."""
    g = 1
    while (g * hd) % 128:
        g += 1
    return g


def _use_loop_heads(num_heads: int, hd: int) -> bool:
    """Prefer the fori_loop-over-head-groups form whenever the group count
    divides H: measured slightly faster than the full unroll even at ViT-B
    (10.5 vs 11.0 ms/layer fwd+bwd) and it compiles in O(1) of the head
    count — the unroll's Mosaic compile cost grows superlinearly (H=12 tens
    of seconds, H=16 ~10 min or compile-helper OOM). The unroll remains the
    fallback for head counts with no 128-lane group decomposition."""
    g = _head_group(hd)
    return num_heads % g == 0 and g <= num_heads


def _loop_heads_fwd(qkv_ref, ctx_s, num_heads: int, hd: int, dtype,
                    seg_bias=None):
    """Shared fwd head loop: qkv_ref (TB, N, 3D) sliceable ref ->
    ctx written into ctx_s (TB, N, D). Returns probs writer hook via
    the optional ``probs_ref`` argument of the caller (see stash kernel)."""
    from jax.experimental import pallas as pl

    D = num_heads * hd
    G = _head_group(hd)
    S = G * hd
    attn_scale = hd ** -0.5

    def body(j, _):
        lo = pl.multiple_of(j * S, 128)
        q_g = qkv_ref[:, :, pl.ds(lo, S)]
        k_g = qkv_ref[:, :, pl.ds(D + lo, S)]
        v_g = qkv_ref[:, :, pl.ds(2 * D + lo, S)]
        parts = []
        for u in range(G):
            q = q_g[:, :, u * hd:(u + 1) * hd]
            k = k_g[:, :, u * hd:(u + 1) * hd]
            v = v_g[:, :, u * hd:(u + 1) * hd]
            logits = jax.lax.dot_general(
                q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            probs = _softmax(logits, attn_scale, seg_bias)
            ctx = jax.lax.dot_general(
                probs.astype(dtype), v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            parts.append(ctx.astype(dtype))
        ctx_s[:, :, pl.ds(lo, S)] = jnp.concatenate(parts, axis=-1)
        return 0

    jax.lax.fori_loop(0, num_heads // G, body, 0)


def _loop_heads_fwd_pipe(qkv_ref, ctx_s, num_heads: int, hd: int, dtype,
                         probs_ref=None, seg_bias=None):
    """Pipelined variant of the fwd head loop (see ``PIPELINE_FWD``): the
    loop carries group j's logits while issuing group j+1's logits matmuls,
    so the VPU softmax of one group and the MXU logits of the next have no
    data dependence and can be co-scheduled. With ``probs_ref`` the softmax
    probabilities are also stashed (the stash-forward path)."""
    from jax.experimental import pallas as pl

    D = num_heads * hd
    G = _head_group(hd)
    S = G * hd
    n_groups = num_heads // G
    attn_scale = hd ** -0.5

    def logits_for(j):
        lo = pl.multiple_of(j * S, 128)
        q_g = qkv_ref[:, :, pl.ds(lo, S)]
        k_g = qkv_ref[:, :, pl.ds(D + lo, S)]
        parts = []
        for u in range(G):
            q = q_g[:, :, u * hd:(u + 1) * hd]
            k = k_g[:, :, u * hd:(u + 1) * hd]
            parts.append(jax.lax.dot_general(
                q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ))
        return jnp.stack(parts, axis=1)  # (TB, G, N, N) fp32

    def consume(j, logits):
        lo = pl.multiple_of(j * S, 128)
        v_g = qkv_ref[:, :, pl.ds(2 * D + lo, S)]
        ctx_parts, probs_parts = [], []
        for u in range(G):
            probs = _softmax(logits[:, u], attn_scale, seg_bias)
            v = v_g[:, :, u * hd:(u + 1) * hd]
            if probs_ref is not None:
                probs_c = probs.astype(probs_ref.dtype)
                probs_parts.append(probs_c)
            else:
                probs_c = probs.astype(dtype)
            ctx = jax.lax.dot_general(
                probs_c, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            ctx_parts.append(ctx.astype(dtype))
        if probs_ref is not None:
            probs_ref[:, pl.ds(j * G, G), :, :] = jnp.stack(probs_parts, axis=1)
        ctx_s[:, :, pl.ds(lo, S)] = jnp.concatenate(ctx_parts, axis=-1)

    if n_groups == 1:
        consume(jnp.int32(0), logits_for(jnp.int32(0)))
        return

    def body(j, carry):
        nxt = logits_for(j + 1)
        consume(j, carry)
        return nxt

    carry = jax.lax.fori_loop(0, n_groups - 1, body, logits_for(jnp.int32(0)))
    consume(jnp.int32(n_groups - 1), carry)


def _fwd_kernel_loop(
    x_ref, scale_ref, bias_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, out_ref,
    qkv_s, ctx_s,
    *, num_heads: int, seg_len: int = 0,
):
    """Loop-heads forward (wide-head models; numerics identical to
    ``_fwd_kernel``)."""
    TB, N, D = x_ref.shape
    x2 = x_ref[:].reshape(TB * N, D).astype(jnp.float32)
    y, _, _ = _ln_forward(x2, scale_ref[0], bias_ref[0])
    qkv = (
        jnp.dot(y.astype(wqkv_ref.dtype), wqkv_ref[:], preferred_element_type=jnp.float32)
        + bqkv_ref[0]
    )
    qkv_s[...] = qkv.astype(qkv_s.dtype).reshape(TB, N, 3 * D)
    heads_loop = _loop_heads_fwd_pipe if PIPELINE_FWD else _loop_heads_fwd
    heads_loop(qkv_s, ctx_s, num_heads, D // num_heads, wproj_ref.dtype,
               seg_bias=_seg_bias(N, seg_len))
    ctx2 = ctx_s[...].reshape(TB * N, D)
    out = (
        jnp.dot(ctx2, wproj_ref[:], preferred_element_type=jnp.float32) + bproj_ref[0]
    )
    out_ref[:] = (x2 + out).reshape(TB, N, D).astype(out_ref.dtype)


def _fwd_stash_kernel_loop(
    x_ref, scale_ref, bias_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
    out_ref, qkv_ref, probs_ref, ctx_s,
    *, num_heads: int, seg_len: int = 0,
):
    """Loop-heads stash forward: the qkv OUTPUT ref doubles as the sliceable
    head buffer; per-group softmax probs go to ``probs_ref`` (B, H, N, N)."""
    from jax.experimental import pallas as pl

    TB, N, D = x_ref.shape
    hd = D // num_heads
    G = _head_group(hd)
    S = G * hd
    attn_scale = hd ** -0.5
    seg_bias = _seg_bias(N, seg_len)
    x2 = x_ref[:].reshape(TB * N, D).astype(jnp.float32)
    y, _, _ = _ln_forward(x2, scale_ref[0], bias_ref[0])
    qkv = (
        jnp.dot(y.astype(wqkv_ref.dtype), wqkv_ref[:], preferred_element_type=jnp.float32)
        + bqkv_ref[0]
    )
    qkv_ref[...] = qkv.astype(qkv_ref.dtype).reshape(TB, N, 3 * D)

    if PIPELINE_FWD:
        _loop_heads_fwd_pipe(
            qkv_ref, ctx_s, num_heads, hd, wproj_ref.dtype, probs_ref=probs_ref,
            seg_bias=seg_bias,
        )
    else:
        def body(j, _):
            lo = pl.multiple_of(j * S, 128)
            q_g = qkv_ref[:, :, pl.ds(lo, S)]
            k_g = qkv_ref[:, :, pl.ds(D + lo, S)]
            v_g = qkv_ref[:, :, pl.ds(2 * D + lo, S)]
            ctx_parts, probs_parts = [], []
            for u in range(G):
                q = q_g[:, :, u * hd:(u + 1) * hd]
                k = k_g[:, :, u * hd:(u + 1) * hd]
                v = v_g[:, :, u * hd:(u + 1) * hd]
                logits = jax.lax.dot_general(
                    q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
                probs = _softmax(logits, attn_scale, seg_bias)
                probs_c = probs.astype(probs_ref.dtype)
                probs_parts.append(probs_c)
                ctx = jax.lax.dot_general(
                    probs_c, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
                ctx_parts.append(ctx.astype(wproj_ref.dtype))
            probs_ref[:, pl.ds(j * G, G), :, :] = jnp.stack(probs_parts, axis=1)
            ctx_s[:, :, pl.ds(lo, S)] = jnp.concatenate(ctx_parts, axis=-1)
            return 0

        jax.lax.fori_loop(0, num_heads // G, body, 0)
    ctx2 = ctx_s[...].reshape(TB * N, D)
    out = (
        jnp.dot(ctx2, wproj_ref[:], preferred_element_type=jnp.float32) + bproj_ref[0]
    )
    out_ref[:] = (x2 + out).reshape(TB, N, D).astype(out_ref.dtype)


def _loop_heads_bwd(
    qkv_ref, probs_ref, dctx_s, dqkv_s, ctx_s, num_heads: int, hd: int, dtype,
    seg_bias=None,
):
    """Shared bwd head loop. ``probs_ref`` None -> recompute softmax from
    qkv; else read the stashed probabilities. Writes per-head dq/dk/dv into
    ``dqkv_s`` (fp32) and the recomputed context into ``ctx_s``."""
    from jax.experimental import pallas as pl

    D = num_heads * hd
    G = _head_group(hd)
    S = G * hd
    attn_scale = hd ** -0.5

    def body(j, _):
        lo = pl.multiple_of(j * S, 128)
        q_g = qkv_ref[:, :, pl.ds(lo, S)]
        k_g = qkv_ref[:, :, pl.ds(D + lo, S)]
        v_g = qkv_ref[:, :, pl.ds(2 * D + lo, S)]
        dc_g = dctx_s[:, :, pl.ds(lo, S)]
        if probs_ref is not None:
            probs_g = probs_ref[:, pl.ds(j * G, G), :, :]
        bd = lambda a, b, contract, batch=((0,), (0,)): jax.lax.dot_general(
            a, b, dimension_numbers=(contract, batch),
            preferred_element_type=jnp.float32,
        )
        dq_parts, dk_parts, dv_parts, ctx_parts = [], [], [], []
        for u in range(G):
            q = q_g[:, :, u * hd:(u + 1) * hd]
            k = k_g[:, :, u * hd:(u + 1) * hd]
            v = v_g[:, :, u * hd:(u + 1) * hd]
            if probs_ref is not None:
                probs_c = probs_g[:, u]
                probs = probs_c.astype(jnp.float32)
            else:
                logits = bd(q, k, ((2,), (2,)))
                probs = _softmax(logits, attn_scale, seg_bias)
                probs_c = probs.astype(dtype)
            ctx_parts.append(bd(probs_c, v, ((2,), (1,))).astype(dtype))
            dc = dc_g[:, :, u * hd:(u + 1) * hd].astype(dtype)
            dv = bd(probs_c, dc, ((1,), (1,)))
            dp = bd(dc, v, ((2,), (2,)))
            tmp = dp * probs
            ds = (tmp - probs * tmp.sum(axis=-1, keepdims=True)) * attn_scale
            ds_c = ds.astype(dtype)
            dq_parts.append(bd(ds_c, k, ((2,), (1,))))
            dk_parts.append(bd(ds_c, q, ((1,), (1,))))
            dv_parts.append(dv)
        dqkv_s[:, :, pl.ds(lo, S)] = jnp.concatenate(dq_parts, axis=-1)
        dqkv_s[:, :, pl.ds(D + lo, S)] = jnp.concatenate(dk_parts, axis=-1)
        dqkv_s[:, :, pl.ds(2 * D + lo, S)] = jnp.concatenate(dv_parts, axis=-1)
        ctx_s[:, :, pl.ds(lo, S)] = jnp.concatenate(ctx_parts, axis=-1)
        return 0

    jax.lax.fori_loop(0, num_heads // G, body, 0)


def _loop_heads_bwd_pipe(
    qkv_ref, probs_ref, dctx_s, dqkv_s, ctx_s, num_heads: int, hd: int, dtype,
    seg_bias=None,
):
    """Pipelined variant of the bwd head loop (see ``PIPELINE_BWD``): the
    carry holds group j's MXU-only precursors — dp = dctx · Vᵀ and, in
    recompute mode (``probs_ref`` None), the logits — issued one iteration
    ahead so the softmax-backward VPU pass of group j has an independent
    MXU stream (group j+1's precursors) to overlap with. Per-op numerics
    are identical to ``_loop_heads_bwd``."""
    from jax.experimental import pallas as pl

    D = num_heads * hd
    G = _head_group(hd)
    S = G * hd
    n_groups = num_heads // G
    attn_scale = hd ** -0.5

    bd = lambda a, b, contract, batch=((0,), (0,)): jax.lax.dot_general(
        a, b, dimension_numbers=(contract, batch),
        preferred_element_type=jnp.float32,
    )

    def produce(j):
        lo = pl.multiple_of(j * S, 128)
        v_g = qkv_ref[:, :, pl.ds(2 * D + lo, S)]
        dc_g = dctx_s[:, :, pl.ds(lo, S)]
        dp_parts = []
        for u in range(G):
            v = v_g[:, :, u * hd:(u + 1) * hd]
            dc = dc_g[:, :, u * hd:(u + 1) * hd].astype(dtype)
            dp_parts.append(bd(dc, v, ((2,), (2,))))
        dps = jnp.stack(dp_parts, axis=1)  # (TB, G, N, N) fp32
        if probs_ref is not None:
            return dps, None
        q_g = qkv_ref[:, :, pl.ds(lo, S)]
        k_g = qkv_ref[:, :, pl.ds(D + lo, S)]
        logit_parts = []
        for u in range(G):
            q = q_g[:, :, u * hd:(u + 1) * hd]
            k = k_g[:, :, u * hd:(u + 1) * hd]
            logit_parts.append(bd(q, k, ((2,), (2,))))
        return dps, jnp.stack(logit_parts, axis=1)

    def consume(j, carry):
        dps, logits = carry
        lo = pl.multiple_of(j * S, 128)
        q_g = qkv_ref[:, :, pl.ds(lo, S)]
        k_g = qkv_ref[:, :, pl.ds(D + lo, S)]
        v_g = qkv_ref[:, :, pl.ds(2 * D + lo, S)]
        dc_g = dctx_s[:, :, pl.ds(lo, S)]
        if probs_ref is not None:
            probs_g = probs_ref[:, pl.ds(j * G, G), :, :]
        dq_parts, dk_parts, dv_parts, ctx_parts = [], [], [], []
        for u in range(G):
            q = q_g[:, :, u * hd:(u + 1) * hd]
            k = k_g[:, :, u * hd:(u + 1) * hd]
            v = v_g[:, :, u * hd:(u + 1) * hd]
            if probs_ref is not None:
                probs_c = probs_g[:, u]
                probs = probs_c.astype(jnp.float32)
            else:
                probs = _softmax(logits[:, u], attn_scale, seg_bias)
                probs_c = probs.astype(dtype)
            ctx_parts.append(bd(probs_c, v, ((2,), (1,))).astype(dtype))
            dc = dc_g[:, :, u * hd:(u + 1) * hd].astype(dtype)
            dv = bd(probs_c, dc, ((1,), (1,)))
            tmp = dps[:, u] * probs
            ds = (tmp - probs * tmp.sum(axis=-1, keepdims=True)) * attn_scale
            ds_c = ds.astype(dtype)
            dq_parts.append(bd(ds_c, k, ((2,), (1,))))
            dk_parts.append(bd(ds_c, q, ((1,), (1,))))
            dv_parts.append(dv)
        dqkv_s[:, :, pl.ds(lo, S)] = jnp.concatenate(dq_parts, axis=-1)
        dqkv_s[:, :, pl.ds(D + lo, S)] = jnp.concatenate(dk_parts, axis=-1)
        dqkv_s[:, :, pl.ds(2 * D + lo, S)] = jnp.concatenate(dv_parts, axis=-1)
        ctx_s[:, :, pl.ds(lo, S)] = jnp.concatenate(ctx_parts, axis=-1)

    if n_groups == 1:
        consume(jnp.int32(0), produce(jnp.int32(0)))
        return

    def body(j, carry):
        nxt = produce(j + 1)
        consume(j, carry)
        return nxt

    carry = jax.lax.fori_loop(0, n_groups - 1, body, produce(jnp.int32(0)))
    consume(jnp.int32(n_groups - 1), carry)


def _bwd_stash_kernel_loop(
    x_ref, scale_ref, bias_ref, wqkv_ref, wproj_ref, qkv_ref, probs_ref, g_ref,
    dx_ref, dscale_ref, dbias_ref, dwqkv_ref, dbqkv_ref, dwproj_ref, dbproj_ref,
    dctx_s, dqkv_s, ctx_s,
    *, num_heads: int,
):
    from jax.experimental import pallas as pl

    TB, N, D = x_ref.shape
    x2 = x_ref[:].reshape(TB * N, D).astype(jnp.float32)
    g2 = g_ref[:].reshape(TB * N, D).astype(jnp.float32)
    scale = scale_ref[0]
    y, xhat, rstd = _ln_forward(x2, scale, bias_ref[0])
    y_c = y.astype(wqkv_ref.dtype)

    g_c = g2.astype(wproj_ref.dtype)
    dctx = jnp.dot(g_c, wproj_ref[:].T, preferred_element_type=jnp.float32)
    dctx_s[...] = dctx.astype(dctx_s.dtype).reshape(TB, N, D)

    heads_bwd = _loop_heads_bwd_pipe if PIPELINE_BWD else _loop_heads_bwd
    heads_bwd(
        qkv_ref, probs_ref, dctx_s, dqkv_s, ctx_s, num_heads, D // num_heads,
        wqkv_ref.dtype,
    )
    ctx2 = ctx_s[...].reshape(TB * N, D)
    dqkv = dqkv_s[...].reshape(TB * N, 3 * D)
    dqkv_c = dqkv.astype(wqkv_ref.dtype)
    dy = jnp.dot(dqkv_c, wqkv_ref[:].T, preferred_element_type=jnp.float32)

    dxhat = dy * scale
    m1 = dxhat.mean(axis=-1, keepdims=True)
    m2 = (dxhat * xhat).mean(axis=-1, keepdims=True)
    dx_ln = rstd * (dxhat - m1 - xhat * m2)
    dx_ref[:] = (g2 + dx_ln).reshape(TB, N, D).astype(dx_ref.dtype)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dscale_ref[:] = jnp.zeros_like(dscale_ref)
        dbias_ref[:] = jnp.zeros_like(dbias_ref)
        dwqkv_ref[:] = jnp.zeros_like(dwqkv_ref)
        dbqkv_ref[:] = jnp.zeros_like(dbqkv_ref)
        dwproj_ref[:] = jnp.zeros_like(dwproj_ref)
        dbproj_ref[:] = jnp.zeros_like(dbproj_ref)

    dscale_ref[0] += (dy * xhat).sum(axis=0)
    dbias_ref[0] += dy.sum(axis=0)
    dwqkv_ref[:] += jnp.dot(y_c.T, dqkv_c, preferred_element_type=jnp.float32)
    dbqkv_ref[0] += dqkv.sum(axis=0)
    dwproj_ref[:] += jnp.dot(ctx2.T, g_c, preferred_element_type=jnp.float32)
    dbproj_ref[0] += g2.sum(axis=0)


def _bwd_kernel_loop(
    x_ref, scale_ref, bias_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, g_ref,
    dx_ref, dscale_ref, dbias_ref, dwqkv_ref, dbqkv_ref, dwproj_ref, dbproj_ref,
    dctx_s, dqkv_s, ctx_s, qkv_s,
    *, num_heads: int, seg_len: int = 0,
):
    """Loop-heads recompute backward: qkv re-derived into a scratch, then the
    shared head loop with softmax recompute (``probs_ref=None``)."""
    from jax.experimental import pallas as pl

    TB, N, D = x_ref.shape
    x2 = x_ref[:].reshape(TB * N, D).astype(jnp.float32)
    g2 = g_ref[:].reshape(TB * N, D).astype(jnp.float32)
    scale = scale_ref[0]
    y, xhat, rstd = _ln_forward(x2, scale, bias_ref[0])
    y_c = y.astype(wqkv_ref.dtype)
    qkv = jnp.dot(y_c, wqkv_ref[:], preferred_element_type=jnp.float32) + bqkv_ref[0]
    qkv_s[...] = qkv.astype(qkv_s.dtype).reshape(TB, N, 3 * D)

    g_c = g2.astype(wproj_ref.dtype)
    dctx = jnp.dot(g_c, wproj_ref[:].T, preferred_element_type=jnp.float32)
    dctx_s[...] = dctx.astype(dctx_s.dtype).reshape(TB, N, D)

    heads_bwd = _loop_heads_bwd_pipe if PIPELINE_BWD else _loop_heads_bwd
    heads_bwd(
        qkv_s, None, dctx_s, dqkv_s, ctx_s, num_heads, D // num_heads,
        wqkv_ref.dtype, seg_bias=_seg_bias(N, seg_len),
    )
    ctx2 = ctx_s[...].reshape(TB * N, D)
    dqkv = dqkv_s[...].reshape(TB * N, 3 * D)
    dqkv_c = dqkv.astype(wqkv_ref.dtype)
    dy = jnp.dot(dqkv_c, wqkv_ref[:].T, preferred_element_type=jnp.float32)

    dxhat = dy * scale
    m1 = dxhat.mean(axis=-1, keepdims=True)
    m2 = (dxhat * xhat).mean(axis=-1, keepdims=True)
    dx_ln = rstd * (dxhat - m1 - xhat * m2)
    dx_ref[:] = (g2 + dx_ln).reshape(TB, N, D).astype(dx_ref.dtype)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dscale_ref[:] = jnp.zeros_like(dscale_ref)
        dbias_ref[:] = jnp.zeros_like(dbias_ref)
        dwqkv_ref[:] = jnp.zeros_like(dwqkv_ref)
        dbqkv_ref[:] = jnp.zeros_like(dbqkv_ref)
        dwproj_ref[:] = jnp.zeros_like(dwproj_ref)
        dbproj_ref[:] = jnp.zeros_like(dbproj_ref)

    dscale_ref[0] += (dy * xhat).sum(axis=0)
    dbias_ref[0] += dy.sum(axis=0)
    dwqkv_ref[:] += jnp.dot(y_c.T, dqkv_c, preferred_element_type=jnp.float32)
    dbqkv_ref[0] += dqkv.sum(axis=0)
    dwproj_ref[:] += jnp.dot(ctx2.T, g_c, preferred_element_type=jnp.float32)
    dbproj_ref[0] += g2.sum(axis=0)


def _pick_block(b: int, cap: int) -> int:
    tb = 8
    while tb * 2 <= cap and b % (tb * 2) == 0:
        tb *= 2
    return min(tb, b)


def _seq_scale(n_tokens: int) -> float:
    """Padded-sublane ratio vs the 65-token flagship the tiles were tuned
    at: every per-tile activation term (qkv, ctx, logits rows) scales with
    tb·N, so shorter sequences afford proportionally larger batch tiles."""
    n_pad = max(-(-n_tokens // 8) * 8, 8)
    return 72.0 / n_pad


def auto_block_b(
    B: int, D: int, base: int, full_tile_max_d: int = 768, n_tokens: int = 65
) -> int:
    """Geometry-scaled batch tile (cf. ``mlp_block.auto_block_b``): the
    kernel's VMEM footprint grows with tb·N·D activations over a fixed D²
    weight+grad term, and the TPU compile helper exhausts on wide-D backward
    tiles (measured r3, tools/tune_tiles.py: bwd tb=16 at D=1024 fails to
    compile), so tiles shrink quadratically past ``full_tile_max_d``. The
    forward kernels keep the full base tile through D=1024 — measured both
    compiling and faster there (fwd 1.475 vs 1.512 ms/layer at ViT-L) —
    while at D=1280 the shrunk tile wins again (fwd tb=8 1.072 vs tb=16
    1.136 ms/layer at ViT-H). Sub-8 caps are honored (the ViT-H backward
    shrinks to tb=4) — unlike ``_pick_block``, which starts at 8 and would
    silently raise the cap back up. Short sequences (``n_tokens``) scale
    the cap the other way — see :func:`_seq_scale`."""
    if D <= full_tile_max_d:
        tb = base
    else:
        scale = (768.0 / D) ** 2
        tb = base
        while tb > 4 and tb > base * scale:
            tb //= 2
    cap = base if D <= full_tile_max_d else tb
    target = cap * _seq_scale(n_tokens)
    while tb * 2 <= target and tb * 2 <= B and B % (tb * 2) == 0:
        tb *= 2
    while tb > 1 and tb > target:  # long sequences shrink the same budget
        tb //= 2
    while tb > 1 and B % tb:
        tb //= 2
    return max(min(tb, B), 1)


def auto_block_b_fwd(B: int, D: int, stash: bool, n_tokens: int = 65) -> int:
    """Measured fwd tile optima (tools/tune_tiles.py, r3 on v5e): the plain
    fwd prefers 64 at ViT-B width (3.395 vs 3.529 ms/layer) while the stash
    fwd — which streams the qkv+probs outputs back to HBM — wants a smaller
    tile so the sequential grid pipelines those stores against the next
    tile's matmuls: tb=16 at ViT-B (3.24 vs 3.61 ms/layer at tb=32), tb=8
    at ViT-L (1.44 vs 1.63/1.52 at tb=16/32). The plain fwd holds 32
    through D=1024 (1.475 vs 1.516 ms/layer at ViT-L); at D≥1280 the
    smaller tile wins everywhere (fwd tb=8 1.072 vs tb=16 1.136 at ViT-H).
    Short sequences scale the tile up by the padded-sublane ratio
    (:func:`_seq_scale`)."""
    if D <= 768:
        tb = 16 if stash else 64
    elif D <= 1024:
        tb = 8 if stash else 32
    else:
        tb = 8
    target = tb * _seq_scale(n_tokens)
    while tb * 2 <= target and tb * 2 <= B and B % (tb * 2) == 0:
        tb *= 2
    while tb > 1 and tb > target:  # long sequences shrink the same budget
        tb //= 2
    while tb > 1 and B % tb:
        tb //= 2
    return max(min(tb, B), 1)


def _pallas_fwd(x, scale, bias, wqkv, bqkv, wproj, bproj, num_heads, block_b, interpret, seg_len=0):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N, D = x.shape
    tb = _pick_block(B, block_b) if block_b else auto_block_b_fwd(B, D, stash=False, n_tokens=N)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024,
        )
    row = lambda i: (0, 0)
    hd = D // num_heads
    if _use_loop_heads(num_heads, hd):
        kern = functools.partial(_fwd_kernel_loop, num_heads=num_heads, seg_len=seg_len)
        kwargs["scratch_shapes"] = [
            pltpu.VMEM((tb, N, 3 * D), x.dtype),
            pltpu.VMEM((tb, N, D), x.dtype),
        ]
    else:
        kern = functools.partial(_fwd_kernel, num_heads=num_heads, seg_len=seg_len)
    return pl.pallas_call(
        kern,
        grid=(B // tb,),
        in_specs=[
            pl.BlockSpec((tb, N, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 3 * D), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * D), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, D), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), row, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, N, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, D), x.dtype),
        interpret=interpret,
        **kwargs,
    )(x, scale, bias, wqkv, bqkv, wproj, bproj)


def _pallas_fwd_stash(x, scale, bias, wqkv, bqkv, wproj, bproj, num_heads, block_b, interpret, seg_len=0):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N, D = x.shape
    tb = _pick_block(B, block_b) if block_b else auto_block_b_fwd(B, D, stash=True, n_tokens=N)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024,
        )
    row = lambda i: (0, 0)
    hd = D // num_heads
    if _use_loop_heads(num_heads, hd):
        kern = functools.partial(_fwd_stash_kernel_loop, num_heads=num_heads, seg_len=seg_len)
        kwargs["scratch_shapes"] = [pltpu.VMEM((tb, N, D), x.dtype)]
    else:
        kern = functools.partial(_fwd_stash_kernel, num_heads=num_heads, seg_len=seg_len)
    return pl.pallas_call(
        kern,
        grid=(B // tb,),
        in_specs=[
            pl.BlockSpec((tb, N, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 3 * D), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * D), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, D), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), row, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tb, N, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, N, 3 * D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tb, num_heads, N, N), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, D), x.dtype),
            jax.ShapeDtypeStruct((B, N, 3 * D), x.dtype),
            jax.ShapeDtypeStruct((B, num_heads, N, N), x.dtype),
        ),
        interpret=interpret,
        **kwargs,
    )(x, scale, bias, wqkv, bqkv, wproj, bproj)


def _pallas_bwd_stash(
    x, scale, bias, wqkv, wproj, qkv, probs, g, num_heads, block_b, interpret
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N, D = x.shape
    tb = _pick_block(B, block_b) if block_b else auto_block_b(B, D, DEFAULT_BLOCK_B_BWD, n_tokens=N)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024,
        )
    row = lambda i: (0, 0)
    outs = (
        jax.ShapeDtypeStruct((B, N, D), x.dtype),        # dx
        jax.ShapeDtypeStruct((1, D), jnp.float32),       # dscale
        jax.ShapeDtypeStruct((1, D), jnp.float32),       # dbias
        jax.ShapeDtypeStruct((D, 3 * D), jnp.float32),   # dwqkv
        jax.ShapeDtypeStruct((1, 3 * D), jnp.float32),   # dbqkv
        jax.ShapeDtypeStruct((D, D), jnp.float32),       # dwproj
        jax.ShapeDtypeStruct((1, D), jnp.float32),       # dbproj
    )
    hd = D // num_heads
    if _use_loop_heads(num_heads, hd):
        kern = functools.partial(_bwd_stash_kernel_loop, num_heads=num_heads)
        kwargs["scratch_shapes"] = [
            pltpu.VMEM((tb, N, D), jnp.float32),      # dctx
            pltpu.VMEM((tb, N, 3 * D), jnp.float32),  # dqkv
            pltpu.VMEM((tb, N, D), x.dtype),          # ctx
        ]
    else:
        kern = functools.partial(_bwd_stash_kernel, num_heads=num_heads)
    return pl.pallas_call(
        kern,
        grid=(B // tb,),
        in_specs=[
            pl.BlockSpec((tb, N, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 3 * D), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, D), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, N, 3 * D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tb, num_heads, N, N), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((tb, N, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tb, N, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 3 * D), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * D), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, D), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), row, memory_space=pltpu.VMEM),
        ),
        out_shape=outs,
        interpret=interpret,
        **kwargs,
    )(x, scale, bias, wqkv, wproj, qkv, probs, g)


def _pallas_bwd(x, scale, bias, wqkv, bqkv, wproj, bproj, g, num_heads, block_b, interpret, seg_len=0):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N, D = x.shape
    tb = _pick_block(B, block_b) if block_b else auto_block_b(B, D, DEFAULT_BLOCK_B_BWD, n_tokens=N)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024,
        )
    row = lambda i: (0, 0)
    outs = (
        jax.ShapeDtypeStruct((B, N, D), x.dtype),        # dx
        jax.ShapeDtypeStruct((1, D), jnp.float32),       # dscale
        jax.ShapeDtypeStruct((1, D), jnp.float32),       # dbias
        jax.ShapeDtypeStruct((D, 3 * D), jnp.float32),   # dwqkv
        jax.ShapeDtypeStruct((1, 3 * D), jnp.float32),   # dbqkv
        jax.ShapeDtypeStruct((D, D), jnp.float32),       # dwproj
        jax.ShapeDtypeStruct((1, D), jnp.float32),       # dbproj
    )
    hd = D // num_heads
    if _use_loop_heads(num_heads, hd):
        kern = functools.partial(_bwd_kernel_loop, num_heads=num_heads, seg_len=seg_len)
        kwargs["scratch_shapes"] = [
            pltpu.VMEM((tb, N, D), jnp.float32),      # dctx
            pltpu.VMEM((tb, N, 3 * D), jnp.float32),  # dqkv
            pltpu.VMEM((tb, N, D), x.dtype),          # ctx
            pltpu.VMEM((tb, N, 3 * D), x.dtype),      # qkv recompute
        ]
    else:
        kern = functools.partial(_bwd_kernel, num_heads=num_heads, seg_len=seg_len)
    return pl.pallas_call(
        kern,
        grid=(B // tb,),
        in_specs=[
            pl.BlockSpec((tb, N, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 3 * D), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * D), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, D), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, N, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tb, N, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 3 * D), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * D), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, D), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), row, memory_space=pltpu.VMEM),
        ),
        out_shape=outs,
        interpret=interpret,
        **kwargs,
    )(x, scale, bias, wqkv, bqkv, wproj, bproj, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12))
def fused_attn_block(
    x, scale, bias, wqkv, bqkv, wproj, bproj,
    num_heads: int,
    block_b_fwd: int = 0,
    block_b_bwd: int = 0,
    interpret: bool = False,
    stash: bool = False,
    seg_len: int = 0,
):
    """x + proj(attn(qkv(LN(x)))) with everything resident in VMEM per tile.

    Shapes: x (B, N, D); scale/bias (D,) fp32; wqkv (D, 3D); bqkv (3D,);
    wproj (D, D); bproj (D,). Weights should be pre-cast to the activation
    dtype. Returns (B, N, D) in x's dtype. ``stash=False``: the backward
    saves only ``x`` and recomputes everything. ``stash=True``: the
    differentiation-path forward also writes qkv + softmax probs (bf16) and
    the backward skips their recompute (see module docstring); the primal
    (inference) path never pays the stash writes. ``seg_len > 0``: the N
    tokens are ``N // seg_len`` packed samples — attention is restricted to
    the block diagonal (:func:`_seg_bias`; MAE short-sequence packing).
    """
    return _pallas_fwd(
        x, scale.reshape(1, -1), bias.reshape(1, -1), wqkv,
        bqkv.reshape(1, -1), wproj, bproj.reshape(1, -1),
        num_heads, block_b_fwd, interpret, seg_len,
    )


def _fab_fwd(x, scale, bias, wqkv, bqkv, wproj, bproj,
             num_heads, block_b_fwd, block_b_bwd, interpret, stash, seg_len):
    if stash:
        out, qkv, probs = _pallas_fwd_stash(
            x, scale.reshape(1, -1), bias.reshape(1, -1), wqkv,
            bqkv.reshape(1, -1), wproj, bproj.reshape(1, -1),
            num_heads, block_b_fwd, interpret, seg_len,
        )
        return out, (x, scale, bias, wqkv, bqkv, wproj, bproj, qkv, probs)
    out = fused_attn_block(
        x, scale, bias, wqkv, bqkv, wproj, bproj,
        num_heads, block_b_fwd, block_b_bwd, interpret, stash, seg_len,
    )
    return out, (x, scale, bias, wqkv, bqkv, wproj, bproj, None, None)


def _fab_bwd(num_heads, block_b_fwd, block_b_bwd, interpret, stash, seg_len, res, g):
    x, scale, bias, wqkv, bqkv, wproj, bproj, qkv, probs = res
    if stash:
        # stashed probs already encode the segment mask (zeros off-diagonal)
        dx, dscale, dbias, dwqkv, dbqkv, dwproj, dbproj = _pallas_bwd_stash(
            x, scale.reshape(1, -1), bias.reshape(1, -1), wqkv, wproj,
            qkv, probs, g, num_heads, block_b_bwd, interpret,
        )
    else:
        dx, dscale, dbias, dwqkv, dbqkv, dwproj, dbproj = _pallas_bwd(
            x, scale.reshape(1, -1), bias.reshape(1, -1), wqkv,
            bqkv.reshape(1, -1), wproj, bproj.reshape(1, -1), g,
            num_heads, block_b_bwd, interpret, seg_len,
        )
    return (
        dx,
        dscale[0].astype(scale.dtype),
        dbias[0].astype(bias.dtype),
        dwqkv.astype(wqkv.dtype),
        dbqkv[0].astype(bqkv.dtype),
        dwproj.astype(wproj.dtype),
        dbproj[0].astype(bproj.dtype),
    )


fused_attn_block.defvjp(_fab_fwd, _fab_bwd)


def xla_attn_block(x, scale, bias, wqkv, bqkv, wproj, bproj, num_heads: int,
                   seg_len: int = 0):
    """Reference formulation (CPU fallback + parity oracle). Matches the
    kernel's numerics: fp32 LN/softmax/bias adds, operand-dtype matmuls,
    fp32 accumulation."""
    B, N, D = x.shape
    hd = D // num_heads
    x2 = x.astype(jnp.float32)
    mu = x2.mean(axis=-1, keepdims=True)
    var = ((x2 - mu) ** 2).mean(axis=-1, keepdims=True)
    y = (x2 - mu) * jax.lax.rsqrt(var + 1e-6) * scale + bias
    y_c = y.astype(wqkv.dtype)
    qkv = jnp.dot(y_c, wqkv, preferred_element_type=jnp.float32) + bqkv
    qkv5 = qkv.reshape(B, N, 3, num_heads, hd).astype(wqkv.dtype)
    q, k, v = qkv5[:, :, 0], qkv5[:, :, 1], qkv5[:, :, 2]
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32)
    probs = _softmax(logits, hd ** -0.5, _seg_bias(N, seg_len))
    ctx = jnp.einsum(
        "bhnm,bmhd->bnhd", probs.astype(wqkv.dtype), v,
        preferred_element_type=jnp.float32,
    )
    ctx2 = ctx.reshape(B * N, D).astype(wproj.dtype)
    out = jnp.dot(ctx2, wproj, preferred_element_type=jnp.float32) + bproj
    return (x2.reshape(B * N, D) + out).reshape(B, N, D).astype(x.dtype)
