"""Fused multi-head attention for short sequences (Pallas TPU).

The encoder's sequences are tiny (64 grid tokens + ≤2 prefix tokens), so the
whole attention for a (batch-tile, head) pair fits in VMEM. XLA's generic
lowering materializes transposed q/k/v copies and fp32 logits in HBM — for
ViT-B at batch 1024 that traffic costs ~9 ms/layer while the matmuls need
<1 ms. This kernel reads the fused qkv projection output once, computes
logits → softmax(fp32) → context entirely in VMEM with batched MXU dots, and
writes only the (B, N, H, hd) context.

Measured (B=1024, N=65, ViT-B geometry, v5e): 12 attention layers
108 ms (XLA einsum path) → ~11 ms fused. See ``tests/test_kernels.py`` for
numerical parity with the reference einsum formulation.

Falls back to the XLA einsum path on non-TPU backends (or interpret=True in
tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

DEFAULT_BLOCK_B = 64


def _attn_kernel(qkv_ref, out_ref, *, scale: float, num_heads: int, head_dim: int):
    """qkv block (TB, N, 3·D) -> context block (TB, N, D).

    Heads are unrolled in a static loop, sliced directly out of the fused
    projection on the feature (lane) axis — no reshapes or transposes, which
    Mosaic cannot lower across tiled dims.
    """
    D = num_heads * head_dim
    for h in range(num_heads):
        lo = h * head_dim
        q = qkv_ref[:, :, lo : lo + head_dim]            # (TB, N, hd)
        k = qkv_ref[:, :, D + lo : D + lo + head_dim]
        v = qkv_ref[:, :, 2 * D + lo : 2 * D + lo + head_dim]
        logits = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (TB, N, N) fp32
        probs = jax.nn.softmax(logits * scale, axis=-1)
        ctx = jax.lax.dot_general(
            probs.astype(v.dtype), v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (TB, N, hd)
        out_ref[:, :, lo : lo + head_dim] = ctx.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "block_b", "interpret")
)
def fused_attention(
    qkv: jnp.ndarray,
    num_heads: int,
    block_b: int = DEFAULT_BLOCK_B,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, N, 3·D) fused qkv activations -> (B, N, D) attention context.

    The qkv layout matches a single Dense(3·D) projection reshaped to
    (B, N, 3, H, hd) — the same layout the XLA path uses, so no extra
    transposes on either side.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N, three_d = qkv.shape
    D = three_d // 3
    hd = D // num_heads
    scale = hd ** -0.5

    tb = min(block_b, B)
    if B % tb:
        raise ValueError(f"batch {B} not divisible by block_b {tb}")

    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        )
    return pl.pallas_call(
        functools.partial(
            _attn_kernel, scale=scale, num_heads=num_heads, head_dim=hd
        ),
        grid=(B // tb,),
        in_specs=[
            pl.BlockSpec((tb, N, three_d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((tb, N, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, D), qkv.dtype),
        interpret=interpret,
        **kwargs,
    )(qkv)


def _attn_bwd_kernel(
    qkv_ref, dctx_ref, dqkv_ref, *, scale: float, num_heads: int, head_dim: int
):
    """Backward: recompute probs per head in VMEM, emit d(qkv).

    Standard softmax-attention VJP:
        dV = Pᵀ dC;  dP = dC Vᵀ;  dS = P ⊙ (dP − rowsum(dP ⊙ P));
        dQ = scale · dS K;  dK = scale · dSᵀ Q.
    """
    D = num_heads * head_dim
    bd = lambda a, b, contract, batch=((0,), (0,)): jax.lax.dot_general(
        a, b, dimension_numbers=(contract, batch), preferred_element_type=jnp.float32
    )
    for h in range(num_heads):
        lo = h * head_dim
        q = qkv_ref[:, :, lo : lo + head_dim]
        k = qkv_ref[:, :, D + lo : D + lo + head_dim]
        v = qkv_ref[:, :, 2 * D + lo : 2 * D + lo + head_dim]
        dc = dctx_ref[:, :, lo : lo + head_dim]

        logits = bd(q, k, ((2,), (2,)))
        probs = jax.nn.softmax(logits * scale, axis=-1)  # (TB, N, N) fp32

        probs_c = probs.astype(v.dtype)
        dv = bd(probs_c, dc, ((1,), (1,)))               # (TB, N, hd)
        dp = bd(dc, v, ((2,), (2,)))                     # (TB, N, N)
        tmp = dp * probs
        ds = (tmp - probs * tmp.sum(axis=-1, keepdims=True)) * scale
        ds_c = ds.astype(q.dtype)
        dq = bd(ds_c, k, ((2,), (1,)))                   # (TB, N, hd)
        dk = bd(ds_c, q, ((1,), (1,)))                   # (TB, N, hd)

        dqkv_ref[:, :, lo : lo + head_dim] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[:, :, D + lo : D + lo + head_dim] = dk.astype(dqkv_ref.dtype)
        dqkv_ref[:, :, 2 * D + lo : 2 * D + lo + head_dim] = dv.astype(dqkv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "block_b", "interpret"))
def _fused_attention_bwd_call(
    qkv: jnp.ndarray,
    dctx: jnp.ndarray,
    num_heads: int,
    block_b: int = DEFAULT_BLOCK_B,
    interpret: bool = False,
) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N, three_d = qkv.shape
    D = three_d // 3
    hd = D // num_heads
    tb = min(block_b, B)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        )
    return pl.pallas_call(
        functools.partial(
            _attn_bwd_kernel, scale=hd ** -0.5, num_heads=num_heads, head_dim=hd
        ),
        grid=(B // tb,),
        in_specs=[
            pl.BlockSpec((tb, N, three_d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, N, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, N, three_d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, three_d), qkv.dtype),
        interpret=interpret,
        **kwargs,
    )(qkv, dctx)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def fused_attention_ad(
    qkv: jnp.ndarray, num_heads: int, block_b: int = DEFAULT_BLOCK_B, interpret: bool = False
) -> jnp.ndarray:
    """Differentiable fused attention (forward + backward Pallas kernels)."""
    return fused_attention(qkv, num_heads, block_b=block_b, interpret=interpret)


def _fused_attention_fwd(qkv, num_heads, block_b, interpret):
    return fused_attention(qkv, num_heads, block_b=block_b, interpret=interpret), qkv


def _fused_attention_bwd(num_heads, block_b, interpret, qkv, dctx):
    # The backward kernel holds ~3x the forward's buffers (qkv, dctx, dqkv);
    # cap its batch tile so double-buffered blocks fit VMEM.
    bwd_block = min(block_b, 32)
    while qkv.shape[0] % bwd_block:
        bwd_block //= 2
    return (_fused_attention_bwd_call(qkv, dctx, num_heads, bwd_block, interpret),)


fused_attention_ad.defvjp(_fused_attention_fwd, _fused_attention_bwd)


def xla_attention(qkv: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """Reference einsum formulation (used on CPU and as the parity oracle)."""
    B, N, three_d = qkv.shape
    D = three_d // 3
    hd = D // num_heads
    qkv5 = qkv.reshape(B, N, 3, num_heads, hd)
    q, k, v = qkv5[:, :, 0], qkv5[:, :, 1], qkv5[:, :, 2]
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits.astype(jnp.float32) * hd ** -0.5, axis=-1)
    out = jnp.einsum("bhnm,bmhd->bnhd", probs.astype(qkv.dtype), v)
    return out.reshape(B, N, D)


def attention_context(qkv: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """Dispatch: fused differentiable Pallas kernel on TPU (when the batch
    tiles and the sequence is short enough for VMEM), XLA einsum elsewhere.

    The batch tile is sized by element width so double-buffered qkv blocks
    fit VMEM for fp32 inputs too (fwd parity on TPU is exact; bwd ~1e-5)."""
    B, N, three_d = qkv.shape
    if (
        jax.default_backend() == "tpu"
        and B % 16 == 0
        and N <= 256
        and (three_d // 3) % num_heads == 0
    ):
        itemsize = jnp.dtype(qkv.dtype).itemsize
        max_block = DEFAULT_BLOCK_B if itemsize <= 2 else DEFAULT_BLOCK_B // 4
        block_b = 16
        while block_b * 2 <= max_block and B % (block_b * 2) == 0:
            block_b *= 2
        return fused_attention_ad(qkv, num_heads, block_b)
    return xla_attention(qkv, num_heads)
