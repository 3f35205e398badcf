"""Fused transformer-MLP block kernel: LN → fc1 → GELU → fc2 → residual.

After fusing attention, the encoder's remaining wall time is elementwise HBM
traffic: the pre-MLP LayerNorm, the (B·N, 4D) activation round-trips, and the
residual add each pass the full activation tensor through HBM. This kernel
keeps one batch tile's entire MLP in VMEM with the weights stationary across
the grid, reading x once and writing the residual output once.

The backward pass is a second kernel that recomputes the forward intermediates
per tile and accumulates weight/LN gradients across the sequential grid
(initialized at step 0, accumulated in fp32 outputs with constant index maps).

Three backward strategies, chosen by the ``stash`` flag:

* ``stash=False`` (memory-lean): backward recomputes LN and fc1 from ``x``.
* ``stash=True`` (throughput): the differentiation-path forward also writes
  the fc1 pre-activation ``a`` (bf16, (B·N, F)) to HBM — the write overlaps
  with the MXU-bound matmuls — and the backward skips the fc1 recompute
  matmul (2·M·D·F FLOPs). Measured on v5e at ViT-B geometry the saving is
  only ~0.5 ms/layer fwd+bwd (the stash traffic eats most of the matmul
  win) for ~400 MB/layer of HBM, so it is OFF by default (models/layers
  MlpBlock); the attention stash is the one that pays. Inference calls
  never pay the stash write (the custom_vjp primal uses the plain forward).
* ``stash="stream"`` (weight-streaming, for wide geometries): the plain
  backward pins both weight matrices (bf16) plus fp32 grad accumulators in
  VMEM — a fixed 12·D·F-byte term (~79 MB at ViT-H D=1280/F=5120) that
  blows the VMEM budget past ViT-L at any batch tile. The streaming
  backward adds a second (outer) grid dimension over F-column slabs of
  w1/w2: per slab, the weight slice and its fp32 grad accumulator are the
  only resident weight state (12·D·fs bytes, :func:`_stream_slab`), and
  the row tiles sweep beneath it. The dx path needs ``dy = Σ_j da_j@w1_jᵀ``
  across slabs, so a fp32 (B·N, D) partial-sum buffer is carried between
  slab passes as a regular functional input/output (``dyin``/``dyout`` —
  each pass allocates a fresh output rather than aliasing in place);
  LN backward + dx/dscale/dbias run on the last slab's pass. Extra HBM
  traffic vs the resident backward: (nj−1)·(x+g) reads + nj·dy r/w —
  ~0.8 GB/layer at ViT-H B=256 with nj=4, far below the measured ~400 GB/s
  HBM rate over the layer's ~7 ms of matmul time, so it overlaps.

An opt-in software-pipelined forward (``PIPELINE_FWD`` / env
``SKY_MLP_PIPELINE=1``) splits the tile's rows into chunks and interleaves
chunk j+1's LN→fc1 with chunk j's GELU→fc2 so the VPU passes have an
independent MXU stream to overlap with — identical numerics (LN/GELU are
row-local); measure with ``tools/tune_tiles.py --mlp-fwd 16 --mlp-pipeline``.
**A/B-measured on v5e (r3, tools/ab_pipeline.sh): no win** — at tb=16 the
chunked and straight forwards time identically (4.92 ms/layer), and the
apparent pipelined-tb=8 win was a batch-tile effect (chunking is inert at
tb=8 rows; the plain forward at tb=8 measures the same 4.33 ms/layer — now
the ``auto_block_b_fwd`` default). Stays opt-in for future re-measurement.

GELU is the exact (erf) form; Mosaic has no erf lowering, so erf uses the
Abramowitz–Stegun 7.1.26 rational approximation (|err| ≤ 1.5e-7 — below fp32
noise for this use).

Numerics: LN statistics, GELU, and all matmul accumulations in fp32; matmul
operands in the input dtype (bf16 in the training configs).
"""

from __future__ import annotations

import functools
import math
import os as _os

import jax
import jax.numpy as jnp

DEFAULT_BLOCK_B = 16

# Software-pipelined row-chunked forward: the tile's rows are split into
# chunks and chunk j's GELU→fc2 (VPU then MXU) is interleaved with chunk
# j+1's LN→fc1 (VPU then MXU), giving Mosaic two independent VPU/MXU chains
# to co-schedule instead of the serial LN→fc1→GELU→fc2 chain. Numerics are
# identical (LN/GELU are row-local; matmul accumulation order per row is
# unchanged). Off by default until measured faster on-chip
# (tools/tune_tiles.py --mlp-pipeline); flip via env SKY_MLP_PIPELINE=1.
PIPELINE_FWD = _os.environ.get("SKY_MLP_PIPELINE", "0") == "1"
_PIPE_CHUNKS = 2
_PIPE_MIN_ROWS = 256  # below this the fc1/fc2 row count is MXU-inefficient
_INV_SQRT2 = 1.0 / math.sqrt(2.0)
_INV_SQRT2PI = 1.0 / math.sqrt(2.0 * math.pi)


def auto_block_b(
    B: int, D: int, F: int, base: int = DEFAULT_BLOCK_B, n_tokens: int = 65
) -> int:
    """Geometry-scaled batch tile: the backward kernel's VMEM footprint grows
    with tb·N·F (activations) on top of a fixed D·F weight+grad term, so the
    ViT-B tile (16 at D=768/F=3072) must shrink for larger variants —
    measured: the ViT-L (D=1024, F=4096) backward exceeds the VMEM budget at
    tb=16 and compiles at tb=8. Yields `base` at ViT-B geometry.

    ``n_tokens`` scales the tile the other way: the heuristics were measured
    at the flagship sequence (65 tokens → 72 padded sublanes); shorter
    sequences shrink every tb·N activation term proportionally, so the tile
    cap grows by the padded-sublane ratio — the grown tile's VMEM footprint
    stays at or under the measured-compiling flagship tiles (e.g. the MAE
    encoder's tb=32 at N=17 ≈ tb=10.7 at N=65 in activation bytes). Growth
    from a *narrower* geometry is capped by the F ratio alone: the backward
    holds four fp32 (tb·N, F) slabs (a, h, dh, da), so scaling tb by the
    D·F weight ratio overshoots VMEM when D shrinks but F stays large —
    measured: the MAE decoder (D=512, F=2048) backward needs 109 MB at the
    D·F-scaled tb=32 vs the 100 MB limit, and compiles at the F-scaled
    tb=16. Sweep with ``tools/tune_tiles.py --geom maeenc|maedec``."""
    scale = (768 * 3072) / float(D * F)
    grow = min(scale, 3072.0 / F)
    scale *= _seq_scale(n_tokens)
    grow *= _seq_scale(n_tokens)
    tb = base
    while tb > 4 and tb > base * scale:
        tb //= 2
    while tb * 2 <= base * grow and tb * 2 <= B and B % (tb * 2) == 0:
        tb *= 2
    while tb > 1 and tb > base * scale:  # long sequences shrink the budget
        tb //= 2
    while tb > 1 and B % tb:
        tb //= 2
    return max(tb, 1)


def auto_block_b_fwd(B: int, D: int, F: int, n_tokens: int = 65) -> int:
    """Measured fwd-only tile optima (tools/tune_tiles.py --mlp-fwd, r3 on
    v5e): the forward (also the recompute inside the non-stash backward's
    *primal*, and every inference call) wants roughly 260–520 rows per tile
    so the sequential grid pipelines the next tile's HBM x-load against the
    current tile's matmuls — half the backward's tile at each geometry:
    tb=8 at ViT-B (4.33 vs 4.93 ms/layer at tb=16), tb=4 at ViT-L (1.89 vs
    2.20 at tb=8) and ViT-H (1.49 vs 1.63/1.52 at tb=8/2). Short sequences
    scale the tile up by the padded-sublane ratio (:func:`_seq_scale`) —
    the MAE encoder (N=17) measures fastest at the scaled tb=16 (1.32 vs
    1.37 ms/layer at tb=8). The backward keeps :func:`auto_block_b` (its
    grad accumulators want fewer, larger grid steps)."""
    tb = 8 if D <= 768 else 4
    target = tb * _seq_scale(n_tokens)
    while tb * 2 <= target and tb * 2 <= B and B % (tb * 2) == 0:
        tb *= 2
    while tb > 1 and tb > target:  # long sequences shrink the same budget
        tb //= 2
    while tb > 1 and B % tb:
        tb //= 2
    return max(min(tb, B), 1)


def _seq_scale(n_tokens: int) -> float:
    """Padded-sublane ratio vs the 65-token flagship the tiles were tuned at
    (bf16 packs 16 sublanes: 65 → 72 → effectively 80 with the fp32
    upcast rows; use the plain 8-row padding as the conservative ratio)."""
    n_pad = max(-(-n_tokens // 8) * 8, 8)
    return 72.0 / n_pad


# Row-flat (2D) tiling: the whole block is row-local (LN per token, matmuls
# over rows), so the batch/sequence structure is irrelevant to the kernel —
# flattening (B, N, D) -> (B·N, D) in HBM (a free row-major reshape) and
# tiling rows directly removes the per-sample sublane padding that the
# (tb, N, D) blocks pay: pad8(N)/N - 1 = 41% wasted rows at the MAE
# encoder's N=17, ~11% at the flagship's N=65. Off until measured on-chip
# (tools/tune_tiles.py sweeps both layouts); flip via env SKY_MLP_ROWS=1.
ROWS_DEFAULT = _os.environ.get("SKY_MLP_ROWS", "0") == "1"

# Weight-streaming backward for wide geometries (D·F past the resident
# backward's VMEM budget, e.g. ViT-H): lets models/layers.MlpBlock keep the
# fused path instead of dispatching to XLA. Off until measured on-chip
# against the XLA-mlp ViT-H recipe (BASELINE.md r3: 405 img/s / 51.8% MFU);
# flip via env SKY_MLP_STREAM=1.
STREAM_WIDE_DEFAULT = _os.environ.get("SKY_MLP_STREAM", "0") == "1"


def _row_tile(M: int, target: int, align: int = 8) -> int:
    """Largest divisor of ``M`` that is a multiple of ``align`` and ≤
    ``target``; falls back to the largest plain divisor ≤ target (alignment
    only affects efficiency — Mosaic pads within the tile)."""
    cap = min(target, M)
    for d in range(cap - cap % align, 0, -align):
        if M % d == 0:
            return d
    for d in range(cap, 0, -1):
        if M % d == 0:
            return d
    return M


def auto_rows_fwd(B: int, N: int, D: int, F: int, align: int = 8) -> int:
    """Row-tile for the 2D forward: the measured 3D optima
    (:func:`auto_block_b_fwd`) translated to real rows (tb·N) and snapped to
    an aligned divisor of B·N."""
    tb = auto_block_b_fwd(B, D, F, n_tokens=N)
    return _row_tile(B * N, max(tb * N, align), align)


def auto_rows_bwd(B: int, N: int, D: int, F: int, align: int = 8) -> int:
    """Row-tile for the 2D backward, from :func:`auto_block_b`'s tuning."""
    tb = auto_block_b(B, D, F, n_tokens=N)
    return _row_tile(B * N, max(tb * N, align), align)


def _align_for(dtype) -> int:
    return 16 if dtype == jnp.bfloat16 else 8


def _erf(x: jnp.ndarray) -> jnp.ndarray:
    """Abramowitz-Stegun 7.1.26 rational erf approximation (fp32)."""
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    )
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu(x: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * x * (1.0 + _erf(x * _INV_SQRT2))


def _gelu_grad(x: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * (1.0 + _erf(x * _INV_SQRT2)) + x * jnp.exp(-0.5 * x * x) * _INV_SQRT2PI


def _ln_forward(x2: jnp.ndarray, scale, bias, eps=1e-6):
    mu = x2.mean(axis=-1, keepdims=True)
    var = ((x2 - mu) ** 2).mean(axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (x2 - mu) * rstd
    return xhat * scale + bias, xhat, rstd


def _fwd_kernel(x_ref, scale_ref, bias_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref):
    D = x_ref.shape[-1]
    x2 = x_ref[:].reshape(-1, D).astype(jnp.float32)
    y, _, _ = _ln_forward(x2, scale_ref[0], bias_ref[0])
    a = (
        jnp.dot(y.astype(w1_ref.dtype), w1_ref[:], preferred_element_type=jnp.float32)
        + b1_ref[0]
    )
    h = _gelu(a)
    out = (
        jnp.dot(h.astype(w2_ref.dtype), w2_ref[:], preferred_element_type=jnp.float32)
        + b2_ref[0]
    )
    out_ref[:] = (x2 + out).reshape(out_ref.shape).astype(out_ref.dtype)


def _row_chunks(M: int) -> int:
    """Chunk count for the pipelined forward: chunks must be whole sublane
    groups (8 fp32 rows) and large enough to keep the fc1/fc2 matmuls at
    MXU-efficient row counts."""
    n = _PIPE_CHUNKS
    while n > 1 and (M % n or (M // n) % 8 or M // n < _PIPE_MIN_ROWS):
        n -= 1
    return n


def _fwd_pipe(x2, scale, bias, w1_ref, b1, w2_ref, b2, a_ref=None):
    """Pipelined LN→fc1→GELU→fc2 over row chunks (see ``PIPELINE_FWD``).
    ``x2`` is the tile's rows in fp32; returns the (M, D) fp32 block output
    (residual added by the caller). With ``a_ref`` the fc1 pre-activation is
    also stashed per chunk (the stash-forward path)."""
    M, D = x2.shape
    n = _row_chunks(M)
    c = M // n

    def produce(j):
        y, _, _ = _ln_forward(x2[j * c:(j + 1) * c], scale, bias)
        return (
            jnp.dot(y.astype(w1_ref.dtype), w1_ref[:],
                    preferred_element_type=jnp.float32)
            + b1
        )

    outs = []
    a = produce(0)
    for j in range(n):
        a_next = produce(j + 1) if j + 1 < n else None
        if a_ref is not None:
            a_ref[j * c:(j + 1) * c, :] = a.astype(a_ref.dtype)
        h = _gelu(a)
        outs.append(
            jnp.dot(h.astype(w2_ref.dtype), w2_ref[:],
                    preferred_element_type=jnp.float32)
            + b2
        )
        a = a_next
    return jnp.concatenate(outs, axis=0) if n > 1 else outs[0]


def _fwd_kernel_pipe(
    x_ref, scale_ref, bias_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref
):
    D = x_ref.shape[-1]
    x2 = x_ref[:].reshape(-1, D).astype(jnp.float32)
    out = _fwd_pipe(x2, scale_ref[0], bias_ref[0], w1_ref, b1_ref[0],
                    w2_ref, b2_ref[0])
    out_ref[:] = (x2 + out).reshape(out_ref.shape).astype(out_ref.dtype)


def _fwd_stash_kernel_pipe(
    x_ref, scale_ref, bias_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, a_ref
):
    D = x_ref.shape[-1]
    x2 = x_ref[:].reshape(-1, D).astype(jnp.float32)
    out = _fwd_pipe(x2, scale_ref[0], bias_ref[0], w1_ref, b1_ref[0],
                    w2_ref, b2_ref[0], a_ref=a_ref)
    out_ref[:] = (x2 + out).reshape(out_ref.shape).astype(out_ref.dtype)


def _bwd_kernel(
    x_ref, scale_ref, bias_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref,
    dx_ref, dscale_ref, dbias_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
):
    from jax.experimental import pallas as pl

    D = x_ref.shape[-1]
    x2 = x_ref[:].reshape(-1, D).astype(jnp.float32)
    g2 = g_ref[:].reshape(-1, D).astype(jnp.float32)

    scale = scale_ref[0]
    y, xhat, rstd = _ln_forward(x2, scale, bias_ref[0])
    y_c = y.astype(w1_ref.dtype)
    a = jnp.dot(y_c, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[0]
    h = _gelu(a)
    h_c = h.astype(w2_ref.dtype)
    g_c = g2.astype(w2_ref.dtype)

    dh = jnp.dot(g_c, w2_ref[:].T, preferred_element_type=jnp.float32)
    da = dh * _gelu_grad(a)
    da_c = da.astype(w1_ref.dtype)
    dy = jnp.dot(da_c, w1_ref[:].T, preferred_element_type=jnp.float32)

    # LayerNorm backward
    dxhat = dy * scale
    m1 = dxhat.mean(axis=-1, keepdims=True)
    m2 = (dxhat * xhat).mean(axis=-1, keepdims=True)
    dx_ln = rstd * (dxhat - m1 - xhat * m2)
    dx_ref[:] = (g2 + dx_ln).reshape(dx_ref.shape).astype(dx_ref.dtype)

    # Parameter gradients, accumulated across the (sequential) grid.
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dscale_ref[:] = jnp.zeros_like(dscale_ref)
        dbias_ref[:] = jnp.zeros_like(dbias_ref)
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    dscale_ref[0] += (dy * xhat).sum(axis=0)
    dbias_ref[0] += dy.sum(axis=0)
    dw1_ref[:] += jnp.dot(y_c.T, da_c, preferred_element_type=jnp.float32)
    db1_ref[0] += da.sum(axis=0)
    dw2_ref[:] += jnp.dot(h_c.T, g_c, preferred_element_type=jnp.float32)
    db2_ref[0] += g2.sum(axis=0)


def _fwd_stash_kernel(
    x_ref, scale_ref, bias_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, a_ref
):
    """Forward that also writes the fc1 pre-activation (bf16) for the
    stash backward. ``a_ref`` block is 2D (rows, F) — no relayout on store."""
    D = x_ref.shape[-1]
    x2 = x_ref[:].reshape(-1, D).astype(jnp.float32)
    y, _, _ = _ln_forward(x2, scale_ref[0], bias_ref[0])
    a = (
        jnp.dot(y.astype(w1_ref.dtype), w1_ref[:], preferred_element_type=jnp.float32)
        + b1_ref[0]
    )
    a_ref[:] = a.astype(a_ref.dtype)
    h = _gelu(a)
    out = (
        jnp.dot(h.astype(w2_ref.dtype), w2_ref[:], preferred_element_type=jnp.float32)
        + b2_ref[0]
    )
    out_ref[:] = (x2 + out).reshape(out_ref.shape).astype(out_ref.dtype)


def _bwd_stash_kernel(
    x_ref, scale_ref, bias_ref, w1_ref, w2_ref, a_ref, g_ref,
    dx_ref, dscale_ref, dbias_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
):
    """Backward consuming the stashed fc1 pre-activation: recomputes only LN
    (VPU) and gelu(a) (VPU) — no fc1 matmul recompute."""
    from jax.experimental import pallas as pl

    D = x_ref.shape[-1]
    x2 = x_ref[:].reshape(-1, D).astype(jnp.float32)
    g2 = g_ref[:].reshape(-1, D).astype(jnp.float32)

    scale = scale_ref[0]
    y, xhat, rstd = _ln_forward(x2, scale, bias_ref[0])
    y_c = y.astype(w1_ref.dtype)
    a = a_ref[:].astype(jnp.float32)
    h = _gelu(a)
    h_c = h.astype(w2_ref.dtype)
    g_c = g2.astype(w2_ref.dtype)

    dh = jnp.dot(g_c, w2_ref[:].T, preferred_element_type=jnp.float32)
    da = dh * _gelu_grad(a)
    da_c = da.astype(w1_ref.dtype)
    dy = jnp.dot(da_c, w1_ref[:].T, preferred_element_type=jnp.float32)

    dxhat = dy * scale
    m1 = dxhat.mean(axis=-1, keepdims=True)
    m2 = (dxhat * xhat).mean(axis=-1, keepdims=True)
    dx_ln = rstd * (dxhat - m1 - xhat * m2)
    dx_ref[:] = (g2 + dx_ln).reshape(dx_ref.shape).astype(dx_ref.dtype)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dscale_ref[:] = jnp.zeros_like(dscale_ref)
        dbias_ref[:] = jnp.zeros_like(dbias_ref)
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    dscale_ref[0] += (dy * xhat).sum(axis=0)
    dbias_ref[0] += dy.sum(axis=0)
    dw1_ref[:] += jnp.dot(y_c.T, da_c, preferred_element_type=jnp.float32)
    db1_ref[0] += da.sum(axis=0)
    dw2_ref[:] += jnp.dot(h_c.T, g_c, preferred_element_type=jnp.float32)
    db2_ref[0] += g2.sum(axis=0)


# Fixed-VMEM budget for the streaming backward's resident weight state
# (bf16 w1/w2 slabs + fp32 dw1/dw2 accumulators = 12·D·fs bytes). 24 MB
# yields fs=1280 (nj=4) at ViT-H — comfortably inside the compiling
# ViT-L resident term (50 MB) with room for the activation slabs.
_STREAM_FIXED_BUDGET = 24 * 1024 * 1024


def _stream_slab(D: int, F: int, budget: int = _STREAM_FIXED_BUDGET) -> int:
    """F-column slab width for the streaming backward: the whole F when the
    resident weight state fits the budget (degenerate single slab), else the
    largest 128-multiple divisor of F that fits; plain divisors as a last
    resort for odd test geometries."""
    if 12 * D * F <= budget:
        return F
    for fs in range(F - F % 128, 0, -128):
        if F % fs == 0 and 12 * D * fs <= budget:
            return fs
    for fs in range(F, 0, -1):
        if F % fs == 0 and 12 * D * fs <= budget:
            return fs
    return 1


def _stream_rows(M: int, D: int, fs: int, align: int) -> int:
    """Row tile for the streaming backward: sized so the per-step activation
    slabs (four fp32 (tr, fs) + the (tr, D) x/g/dy/dx/LN buffers) stay within
    ~45 MB next to the fixed weight term."""
    budget = 45 * 1024 * 1024
    per_row = 16 * fs + 32 * D
    target = max(budget // per_row, align)
    return _row_tile(M, min(target, 2048), align)


def _bwd_stream_slab_kernel(
    x_ref, scale_ref, bias_ref, w1_ref, b1_ref, w2_ref, g_ref, *refs,
    first: bool, last: bool,
):
    """Weight-streaming backward body for ONE F-column slab of w1/w2 (one
    of ``nj`` sequential pallas_calls, grid over row tiles). Only the slab's
    weights (bf16) and fp32 grad accumulators are VMEM-resident — the fixed
    term shrinks from 12·D·F to 12·D·fs bytes. The cross-slab ``dy``
    partial sum is a regular functional input/output carried between the
    calls (``dyin``/``dyout``); the last slab finishes the LN backward and
    emits dx/dscale/dbias instead of the partial."""
    from jax.experimental import pallas as pl

    k = 0
    dyin_ref = None
    if not first:
        dyin_ref = refs[0]
        k = 1
    if last:
        dx_ref, dscale_ref, dbias_ref = refs[k:k + 3]
        k += 3
    else:
        dyout_ref = refs[k]
        k += 1
    dw1_ref, db1_ref, dw2_ref = refs[k:k + 3]
    db2_ref = refs[k + 3] if first else None

    x2 = x_ref[:].astype(jnp.float32)
    g2 = g_ref[:].astype(jnp.float32)
    scale = scale_ref[0]
    y, xhat, rstd = _ln_forward(x2, scale, bias_ref[0])
    y_c = y.astype(w1_ref.dtype)
    a = jnp.dot(y_c, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[0]
    h = _gelu(a)
    h_c = h.astype(w2_ref.dtype)
    g_c = g2.astype(w2_ref.dtype)

    dh = jnp.dot(g_c, w2_ref[:].T, preferred_element_type=jnp.float32)
    da = dh * _gelu_grad(a)
    da_c = da.astype(w1_ref.dtype)
    dy = jnp.dot(da_c, w1_ref[:].T, preferred_element_type=jnp.float32)
    if not first:
        dy = dy + dyin_ref[:]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        if first:
            db2_ref[:] = jnp.zeros_like(db2_ref)
        if last:
            dscale_ref[:] = jnp.zeros_like(dscale_ref)
            dbias_ref[:] = jnp.zeros_like(dbias_ref)

    dw1_ref[:] += jnp.dot(y_c.T, da_c, preferred_element_type=jnp.float32)
    db1_ref[0] += da.sum(axis=0)
    dw2_ref[:] += jnp.dot(h_c.T, g_c, preferred_element_type=jnp.float32)
    if first:
        db2_ref[0] += g2.sum(axis=0)

    if last:
        dxhat = dy * scale
        m1 = dxhat.mean(axis=-1, keepdims=True)
        m2 = (dxhat * xhat).mean(axis=-1, keepdims=True)
        dx_ln = rstd * (dxhat - m1 - xhat * m2)
        dx_ref[:] = (g2 + dx_ln).reshape(dx_ref.shape).astype(dx_ref.dtype)
        dscale_ref[0] += (dy * xhat).sum(axis=0)
        dbias_ref[0] += dy.sum(axis=0)
    else:
        dyout_ref[:] = dy


def _pallas_bwd_stream(x, scale, bias, w1, b1, w2, g, block_b, interpret):
    import functools as _ft

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N, D = x.shape
    F = w1.shape[1]
    fs = _stream_slab(D, F)
    if F % fs:
        raise ValueError(f"stream slab {fs} does not divide F={F}")
    nj = F // fs
    if nj == 1:
        # resident weights fit — the plain (row-tiled) backward is strictly
        # better (no dy round-trips)
        return _pallas_bwd(x, scale, bias, w1, b1, w2,
                           jnp.zeros((1, D), jnp.float32), g, block_b,
                           interpret, rows=True)
    M = B * N
    align = _align_for(x.dtype)
    tr = _row_tile(M, block_b, align) if block_b else _stream_rows(M, D, fs, align)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024,
        )
    row = lambda i: (0, 0)
    tile2 = lambda i: (i, 0)
    tile_spec = pl.BlockSpec((tr, D), tile2, memory_space=pltpu.VMEM)
    x2d, g2d = x.reshape(M, D), g.reshape(M, D)

    dy = None
    dw1_parts, db1_parts, dw2_parts = [], [], []
    dx = dscale = dbias = db2 = None
    for j in range(nj):
        first, last = j == 0, j == nj - 1
        w1j = jax.lax.slice_in_dim(w1, j * fs, (j + 1) * fs, axis=1)
        b1j = jax.lax.slice_in_dim(b1, j * fs, (j + 1) * fs, axis=1)
        w2j = jax.lax.slice_in_dim(w2, j * fs, (j + 1) * fs, axis=0)
        in_specs = [
            tile_spec,
            pl.BlockSpec((1, D), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, fs), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, fs), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((fs, D), row, memory_space=pltpu.VMEM),
            tile_spec,
        ]
        args = [x2d, scale, bias, w1j, b1j, w2j, g2d]
        if not first:
            in_specs.append(tile_spec)
            args.append(dy)
        if last:
            out_specs = (tile_spec,
                         pl.BlockSpec((1, D), row, memory_space=pltpu.VMEM),
                         pl.BlockSpec((1, D), row, memory_space=pltpu.VMEM))
            out_shape = (jax.ShapeDtypeStruct((M, D), x.dtype),
                         jax.ShapeDtypeStruct((1, D), jnp.float32),
                         jax.ShapeDtypeStruct((1, D), jnp.float32))
        else:
            out_specs = (tile_spec,)
            out_shape = (jax.ShapeDtypeStruct((M, D), jnp.float32),)
        out_specs += (
            pl.BlockSpec((D, fs), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, fs), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((fs, D), row, memory_space=pltpu.VMEM),
        )
        out_shape += (
            jax.ShapeDtypeStruct((D, fs), jnp.float32),
            jax.ShapeDtypeStruct((1, fs), jnp.float32),
            jax.ShapeDtypeStruct((fs, D), jnp.float32),
        )
        if first:
            out_specs += (pl.BlockSpec((1, D), row, memory_space=pltpu.VMEM),)
            out_shape += (jax.ShapeDtypeStruct((1, D), jnp.float32),)
        res = pl.pallas_call(
            _ft.partial(_bwd_stream_slab_kernel, first=first, last=last),
            grid=(M // tr,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
            **kwargs,
        )(*args)
        if last:
            dx, dscale, dbias = res[0].reshape(B, N, D), res[1], res[2]
            k = 3
        else:
            dy = res[0]
            k = 1
        dw1_parts.append(res[k])
        db1_parts.append(res[k + 1])
        dw2_parts.append(res[k + 2])
        if first:
            db2 = res[k + 3]
    dw1 = jnp.concatenate(dw1_parts, axis=1)
    db1 = jnp.concatenate(db1_parts, axis=1)
    dw2 = jnp.concatenate(dw2_parts, axis=0)
    return dx, dscale, dbias, dw1, db1, dw2, db2


def _pallas_fwd(x, scale, bias, w1, b1, w2, b2, block_b, interpret, rows=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N, D = x.shape
    F = w1.shape[1]
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        )
    row = lambda i: (0, 0)
    param_specs = [
        pl.BlockSpec((1, D), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, D), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((D, F), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, F), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((F, D), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, D), row, memory_space=pltpu.VMEM),
    ]
    kernel = _fwd_kernel_pipe if PIPELINE_FWD else _fwd_kernel
    if rows:
        M = B * N
        align = _align_for(x.dtype)
        tr = (_row_tile(M, block_b, align) if block_b
              else auto_rows_fwd(B, N, D, F, align))
        out = pl.pallas_call(
            kernel,
            grid=(M // tr,),
            in_specs=[
                pl.BlockSpec((tr, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ] + param_specs,
            out_specs=pl.BlockSpec((tr, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, D), x.dtype),
            interpret=interpret,
            **kwargs,
        )(x.reshape(M, D), scale, bias, w1, b1, w2, b2)
        return out.reshape(B, N, D)
    tb = min(block_b, B) if block_b else auto_block_b_fwd(B, D, F, n_tokens=N)
    return pl.pallas_call(
        kernel,
        grid=(B // tb,),
        in_specs=[
            pl.BlockSpec((tb, N, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ] + param_specs,
        out_specs=pl.BlockSpec((tb, N, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, D), x.dtype),
        interpret=interpret,
        **kwargs,
    )(x, scale, bias, w1, b1, w2, b2)


def _pallas_fwd_stash(x, scale, bias, w1, b1, w2, b2, block_b, interpret, rows=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N, D = x.shape
    F = w1.shape[1]
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        )
    row = lambda i: (0, 0)
    param_specs = [
        pl.BlockSpec((1, D), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, D), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((D, F), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, F), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((F, D), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, D), row, memory_space=pltpu.VMEM),
    ]
    kernel = _fwd_stash_kernel_pipe if PIPELINE_FWD else _fwd_stash_kernel
    if rows:
        M = B * N
        align = _align_for(x.dtype)
        tr = (_row_tile(M, block_b, align) if block_b
              else auto_rows_fwd(B, N, D, F, align))
        out, a = pl.pallas_call(
            kernel,
            grid=(M // tr,),
            in_specs=[
                pl.BlockSpec((tr, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ] + param_specs,
            out_specs=(
                pl.BlockSpec((tr, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tr, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((M, D), x.dtype),
                jax.ShapeDtypeStruct((M, F), x.dtype),
            ),
            interpret=interpret,
            **kwargs,
        )(x.reshape(M, D), scale, bias, w1, b1, w2, b2)
        return out.reshape(B, N, D), a
    tb = min(block_b, B) if block_b else auto_block_b_fwd(B, D, F, n_tokens=N)
    return pl.pallas_call(
        kernel,
        grid=(B // tb,),
        in_specs=[
            pl.BlockSpec((tb, N, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ] + param_specs,
        out_specs=(
            pl.BlockSpec((tb, N, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb * N, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, D), x.dtype),
            jax.ShapeDtypeStruct((B * N, F), x.dtype),
        ),
        interpret=interpret,
        **kwargs,
    )(x, scale, bias, w1, b1, w2, b2)


def _grad_out_specs(D, F, row, pl, pltpu):
    return (
        pl.BlockSpec((1, D), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, D), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((D, F), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, F), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((F, D), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, D), row, memory_space=pltpu.VMEM),
    )


def _grad_out_shapes(D, F):
    return (
        jax.ShapeDtypeStruct((1, D), jnp.float32),  # dscale
        jax.ShapeDtypeStruct((1, D), jnp.float32),  # dbias
        jax.ShapeDtypeStruct((D, F), jnp.float32),  # dw1
        jax.ShapeDtypeStruct((1, F), jnp.float32),  # db1
        jax.ShapeDtypeStruct((F, D), jnp.float32),  # dw2
        jax.ShapeDtypeStruct((1, D), jnp.float32),  # db2
    )


def _pallas_bwd_stash(x, scale, bias, w1, w2, a, g, block_b, interpret, rows=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N, D = x.shape
    F = w1.shape[1]
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024,
        )
    row = lambda i: (0, 0)
    param_specs = [
        pl.BlockSpec((1, D), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, D), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((D, F), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((F, D), row, memory_space=pltpu.VMEM),
    ]
    if rows:
        M = B * N
        align = _align_for(x.dtype)
        tr = (_row_tile(M, block_b, align) if block_b
              else auto_rows_bwd(B, N, D, F, align))
        res = pl.pallas_call(
            _bwd_stash_kernel,
            grid=(M // tr,),
            in_specs=[
                pl.BlockSpec((tr, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ] + param_specs + [
                pl.BlockSpec((tr, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tr, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((tr, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ) + _grad_out_specs(D, F, row, pl, pltpu),
            out_shape=(jax.ShapeDtypeStruct((M, D), x.dtype),) + _grad_out_shapes(D, F),
            interpret=interpret,
            **kwargs,
        )(x.reshape(M, D), scale, bias, w1, w2, a, g.reshape(M, D))
        return (res[0].reshape(B, N, D),) + tuple(res[1:])
    tb = min(block_b, B) if block_b else auto_block_b(B, D, F, n_tokens=N)
    return pl.pallas_call(
        _bwd_stash_kernel,
        grid=(B // tb,),
        in_specs=[
            pl.BlockSpec((tb, N, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ] + param_specs + [
            pl.BlockSpec((tb * N, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, N, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tb, N, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ) + _grad_out_specs(D, F, row, pl, pltpu),
        out_shape=(jax.ShapeDtypeStruct((B, N, D), x.dtype),) + _grad_out_shapes(D, F),
        interpret=interpret,
        **kwargs,
    )(x, scale, bias, w1, w2, a, g)


def _pallas_bwd(x, scale, bias, w1, b1, w2, b2, g, block_b, interpret, rows=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N, D = x.shape
    F = w1.shape[1]
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        )
    row = lambda i: (0, 0)
    param_specs = [
        pl.BlockSpec((1, D), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, D), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((D, F), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, F), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((F, D), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, D), row, memory_space=pltpu.VMEM),
    ]
    if rows:
        M = B * N
        align = _align_for(x.dtype)
        tr = (_row_tile(M, block_b, align) if block_b
              else auto_rows_bwd(B, N, D, F, align))
        res = pl.pallas_call(
            _bwd_kernel,
            grid=(M // tr,),
            in_specs=[
                pl.BlockSpec((tr, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ] + param_specs + [
                pl.BlockSpec((tr, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((tr, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ) + _grad_out_specs(D, F, row, pl, pltpu),
            out_shape=(jax.ShapeDtypeStruct((M, D), x.dtype),) + _grad_out_shapes(D, F),
            interpret=interpret,
            **kwargs,
        )(x.reshape(M, D), scale, bias, w1, b1, w2, b2, g.reshape(M, D))
        return (res[0].reshape(B, N, D),) + tuple(res[1:])
    tb = min(block_b, B) if block_b else auto_block_b(B, D, F, n_tokens=N)
    return pl.pallas_call(
        _bwd_kernel,
        grid=(B // tb,),
        in_specs=[
            pl.BlockSpec((tb, N, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ] + param_specs + [
            pl.BlockSpec((tb, N, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tb, N, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ) + _grad_out_specs(D, F, row, pl, pltpu),
        out_shape=(jax.ShapeDtypeStruct((B, N, D), x.dtype),) + _grad_out_shapes(D, F),
        interpret=interpret,
        **kwargs,
    )(x, scale, bias, w1, b1, w2, b2, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def fused_mlp_block(x, scale, bias, w1, b1, w2, b2,
                    block_b: int = 0, interpret: bool = False,
                    stash: bool = False, rows: bool | None = None):
    """x + fc2(gelu(fc1(LN(x)))) with everything resident in VMEM per tile.

    Shapes: x (B, N, D); scale/bias (D,); w1 (D, F); b1 (F,); w2 (F, D);
    b2 (D,). Returns (B, N, D) in x's dtype. ``stash=True`` selects the
    stashed-residual backward (see module docstring); the primal (inference)
    path is identical either way and never writes the stash. ``rows``
    selects the row-flat 2D tiling (``None`` → module default
    ``ROWS_DEFAULT``); in rows mode ``block_b`` is a row count.
    """
    rows = ROWS_DEFAULT if rows is None else rows
    return _pallas_fwd(
        x, scale.reshape(1, -1), bias.reshape(1, -1), w1,
        b1.reshape(1, -1), w2, b2.reshape(1, -1), block_b, interpret, rows,
    )


def _fmb_fwd(x, scale, bias, w1, b1, w2, b2, block_b, interpret, stash, rows=None):
    if stash is True:
        out, a = _pallas_fwd_stash(
            x, scale.reshape(1, -1), bias.reshape(1, -1), w1,
            b1.reshape(1, -1), w2, b2.reshape(1, -1), block_b, interpret,
            ROWS_DEFAULT if rows is None else rows,
        )
        return out, (x, scale, bias, w1, b1, w2, b2, a)
    out = fused_mlp_block(x, scale, bias, w1, b1, w2, b2, block_b, interpret,
                          stash, rows)
    return out, (x, scale, bias, w1, b1, w2, b2, None)


def _fmb_bwd(block_b, interpret, stash, rows, res, g):
    x, scale, bias, w1, b1, w2, b2, a = res
    rows = ROWS_DEFAULT if rows is None else rows
    if stash == "stream":
        # the streaming backward tiles flattened rows; in 3D (batch-tile)
        # mode translate the caller's sample tile to rows so one block_b
        # value means the same thing across the fwd and this bwd
        bb = block_b * x.shape[1] if (block_b and not rows) else block_b
        dx, dscale, dbias, dw1, db1, dw2, db2 = _pallas_bwd_stream(
            x, scale.reshape(1, -1), bias.reshape(1, -1), w1,
            b1.reshape(1, -1), w2, g, bb, interpret,
        )
    elif stash:
        dx, dscale, dbias, dw1, db1, dw2, db2 = _pallas_bwd_stash(
            x, scale.reshape(1, -1), bias.reshape(1, -1), w1, w2, a, g,
            block_b, interpret, rows,
        )
    else:
        dx, dscale, dbias, dw1, db1, dw2, db2 = _pallas_bwd(
            x, scale.reshape(1, -1), bias.reshape(1, -1), w1,
            b1.reshape(1, -1), w2, b2.reshape(1, -1), g, block_b, interpret,
            rows,
        )
    return (
        dx,
        dscale[0].astype(scale.dtype),
        dbias[0].astype(bias.dtype),
        dw1.astype(w1.dtype),
        db1[0].astype(b1.dtype),
        dw2.astype(w2.dtype),
        db2[0].astype(b2.dtype),
    )


fused_mlp_block.defvjp(_fmb_fwd, _fmb_bwd)


def xla_mlp_block(x, scale, bias, w1, b1, w2, b2):
    """Reference formulation (CPU fallback + parity oracle). Matches the
    kernel's numerics: fp32 LN/gelu, operand-dtype matmuls, fp32 accum."""
    x2 = x.astype(jnp.float32)
    mu = x2.mean(axis=-1, keepdims=True)
    var = ((x2 - mu) ** 2).mean(axis=-1, keepdims=True)
    y = (x2 - mu) * jax.lax.rsqrt(var + 1e-6) * scale + bias
    a = jnp.dot(y.astype(w1.dtype), w1, preferred_element_type=jnp.float32) + b1
    h = 0.5 * a * (1.0 + jax.lax.erf(a * _INV_SQRT2))
    out = jnp.dot(h.astype(w2.dtype), w2, preferred_element_type=jnp.float32) + b2
    return (x2 + out).astype(x.dtype)
