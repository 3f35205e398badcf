"""Core transformer layers (pre-norm ViT family), TPU-first.

Design notes
------------
* Patch embedding is a reshape + one Dense (mathematically identical to the
  usual stride-p conv, reference ``mim_vit.py:206`` via timm ``PatchEmbed``)
  — on TPU this maps straight onto one large MXU matmul over
  (B·L, p²·C) × (p²·C, D) instead of a convolution, and XLA fuses the
  patch-extraction reshapes into the operand layout.
* All shapes are static; sequence length for the shipped geometry is
  64 patches + ≤2 prefix tokens, so attention is a small fraction of the
  FLOPs — the MLP matmuls dominate and tile cleanly onto the 128×128 MXU
  once the batch is large.
* ``dtype`` selects the activation/computation dtype (bfloat16 for speed);
  parameters always live in float32. Softmax and LayerNorm statistics are
  computed in float32 for stability.
* Numerics match the reference stack: LayerNorm eps 1e-6, exact (erf) GELU,
  qkv bias, xavier-uniform linear init, zero biases
  (reference ``mim_vit.py:315-324``).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any

xavier_uniform = nn.initializers.xavier_uniform()
token_init = nn.initializers.normal(stddev=0.02)

# Process-wide fused-Pallas-kernel switch. GSPMD cannot partition an opaque
# pallas_call, so under tensor parallelism (mesh 'model' axis > 1) the fused
# kernels would force per-layer all-gathers of the TP-sharded weights; the
# trainers call set_fused_kernels(False) when TP is active and the encoder
# falls back to XLA einsums, which GSPMD shards natively.
_FUSED_KERNELS = True


def set_fused_kernels(enabled: bool) -> None:
    global _FUSED_KERNELS
    _FUSED_KERNELS = enabled


def fused_kernels_enabled() -> bool:
    return _FUSED_KERNELS


def patchify(imgs: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """(B, C, H, W) -> (B, L, p²·C), row-major patches, (ph, pw, c) flatten.

    Flatten order inside each patch matches the reference's loss-side
    patchify (``mim_vit.py:326-338``: einsum 'nchpwq->nhwpqc') so per-patch
    statistics (norm_pix_loss) agree elementwise.
    """
    B, C, H, W = imgs.shape
    p = patch_size
    h, w = H // p, W // p
    x = imgs.reshape(B, C, h, p, w, p)
    x = x.transpose(0, 2, 4, 3, 5, 1)  # B, h, w, p, p, C
    return x.reshape(B, h * w, p * p * C)


def unpatchify(x: jnp.ndarray, patch_size: int, channels: int) -> jnp.ndarray:
    """(B, L, p²·C) -> (B, C, H, W); inverse of :func:`patchify`."""
    B, L, _ = x.shape
    p = patch_size
    h = w = int(round(L ** 0.5))
    if h * w != L:
        raise ValueError(f"token count {L} is not a square grid")
    x = x.reshape(B, h, w, p, p, channels)
    x = x.transpose(0, 5, 1, 3, 2, 4)  # B, C, h, p, w, p
    return x.reshape(B, channels, h * p, w * p)


class PatchEmbed(nn.Module):
    """Patchify + linear projection to the token embedding space."""

    patch_size: int
    embed_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, imgs: jnp.ndarray) -> jnp.ndarray:
        x = patchify(imgs, self.patch_size)
        return nn.Dense(
            self.embed_dim,
            kernel_init=xavier_uniform,
            dtype=self.dtype,
            name="proj",
        )(x.astype(self.dtype))


class Mlp(nn.Module):
    """Dense -> exact GELU -> Dense."""

    hidden_dim: int
    out_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.hidden_dim, kernel_init=xavier_uniform, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.out_dim, kernel_init=xavier_uniform, dtype=self.dtype, name="fc2")(x)
        return x


class Attention(nn.Module):
    """Multi-head self-attention with a fused qkv projection.

    One (D -> 3D) matmul for qkv keeps the MXU busy with a single large
    contraction. The attention core (logits -> fp32 softmax -> context)
    dispatches to a fused Pallas kernel on TPU — the sequences here are short
    (≤ ~70 tokens), so the whole attention fits in VMEM and the fused kernel
    removes all transposed q/k/v and fp32-logit HBM traffic
    (``ops/kernels/attention.py``); elsewhere it runs as XLA einsums with the
    same numerics.
    """

    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from sky_embeddings_tpu.ops.kernels.attention import attention_context

        B, N, D = x.shape
        if D % self.num_heads:
            raise ValueError(f"dim {D} not divisible by heads {self.num_heads}")
        qkv = nn.Dense(3 * D, kernel_init=xavier_uniform, dtype=self.dtype, name="qkv")(x)
        out = attention_context(qkv, self.num_heads).astype(self.dtype)
        return nn.Dense(D, kernel_init=xavier_uniform, dtype=self.dtype, name="proj")(out)


class CrossAttention(nn.Module):
    """Query tokens attend over a separate key/value sequence (fused kv)."""

    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q_tokens: jnp.ndarray, kv_tokens: jnp.ndarray) -> jnp.ndarray:
        B, M, D = q_tokens.shape
        N = kv_tokens.shape[1]
        head_dim = D // self.num_heads
        q = nn.Dense(D, kernel_init=xavier_uniform, dtype=self.dtype, name="q")(q_tokens)
        kv = nn.Dense(2 * D, kernel_init=xavier_uniform, dtype=self.dtype, name="kv")(kv_tokens)
        q = q.reshape(B, M, self.num_heads, head_dim)
        kv = kv.reshape(B, N, 2, self.num_heads, head_dim)
        k, v = kv[:, :, 0], kv[:, :, 1]

        scale = head_dim ** -0.5
        logits = jnp.einsum("bmhd,bnhd->bhmn", q, k, preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits.astype(jnp.float32) * scale, axis=-1)
        out = jnp.einsum("bhmn,bnhd->bmhd", probs.astype(self.dtype), v)
        out = out.reshape(B, M, D)
        return nn.Dense(D, kernel_init=xavier_uniform, dtype=self.dtype, name="proj")(out)


class LayerNorm(nn.Module):
    """LayerNorm with float32 statistics, eps 1e-6 (matching the reference)."""

    eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="ln")(x)


class MlpBlock(nn.Module):
    """LN -> fc1 -> exact GELU -> fc2 -> residual, with explicit parameters.

    On TPU this dispatches to the fused Pallas kernel
    (``ops/kernels/mlp_block.py``) that keeps the whole tile in VMEM with
    stationary weights; elsewhere (and whenever shapes don't tile) it runs the
    identical math as XLA ops. LN statistics, GELU, and accumulations are
    fp32 in both paths.
    """

    hidden_dim: int
    dtype: Dtype = jnp.float32
    # fc1-preactivation stash: skips the fc1 recompute matmul in the backward
    # but costs ~400 MB/layer of HBM at ViT-B B=1024 for only ~0.5 ms/layer
    # (the stash write is bandwidth-bound) — off by default; the attention
    # stash (see Block) is the one that pays.
    stash: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from sky_embeddings_tpu.ops.kernels.mlp_block import (
            STREAM_WIDE_DEFAULT,
            fused_mlp_block,
            xla_mlp_block,
        )

        D = x.shape[-1]
        scale = self.param("norm_scale", nn.initializers.ones, (D,), jnp.float32)
        bias = self.param("norm_bias", nn.initializers.zeros, (D,), jnp.float32)
        w1 = self.param("fc1_kernel", xavier_uniform, (D, self.hidden_dim), jnp.float32)
        b1 = self.param("fc1_bias", nn.initializers.zeros, (self.hidden_dim,), jnp.float32)
        w2 = self.param("fc2_kernel", xavier_uniform, (self.hidden_dim, D), jnp.float32)
        b2 = self.param("fc2_bias", nn.initializers.zeros, (D,), jnp.float32)

        w1c, w2c = w1.astype(self.dtype), w2.astype(self.dtype)
        xc = x.astype(self.dtype)
        B = x.shape[0]
        # Fused path: bf16 only — fp32 weights don't fit the backward
        # kernel's VMEM budget, and fp32 "parity mode" should keep XLA's
        # exact erf rather than the kernel's polynomial approximation.
        # Width cap: the backward kernel keeps both weight matrices (bf16)
        # plus their fp32 grad accumulators VMEM-resident — a fixed
        # 6·D·F-byte term (~50 MB at ViT-L, ~79 MB at ViT-H) that exceeds
        # the scoped-VMEM budget past the ViT-L geometry even at the
        # minimum batch tile. Measured on v5e (r3): at D=1280/F=5120 the
        # XLA mlp in a loop encoder reaches 409 img/s vs 371 for the
        # fused-mlp scan encoder — so wider-than-ViT-L blocks dispatch
        # to XLA (whose own fwd+bwd runs near the MXU roofline there).
        # No width floor / token-padding cap: standalone kernel chains
        # measure XLA's mlp faster at the MAE geometries (N=17 enc: XLA
        # 2.66 vs fused 3.87 ms/layer; D=512 dec: 5.63 vs 6.45), but
        # in the full MAE model both XLA-mlp dispatches measured SLOWER
        # (4935 img/s fused-everywhere vs 4603 XLA-dec / 4483 XLA-both,
        # r3 on v5e) — the isolated-chain win does not survive the layout
        # transitions next to the fused attention kernels, so the fused
        # path keeps these geometries.
        # Past the width cap, the weight-streaming backward (stash="stream",
        # F-column slabs, ops/kernels/mlp_block.py) removes the fixed VMEM
        # term — measured SLOWER at ViT-H (model 400.9 vs 407.2 img/s;
        # kernel 5.14 ms/layer ≈ 129 TFLOPS vs XLA's ~170 at D=1280 —
        # the K-slab loop serializes weight loads against the matmuls;
        # larger tiles SIGKILL the compile helper, BASELINE.md r4), so
        # wide stays on XLA unless SKY_MLP_STREAM=1 overrides.
        wide = D * self.hidden_dim > 1024 * 4096
        if (
            _FUSED_KERNELS
            and jax.default_backend() == "tpu"
            and self.dtype == jnp.bfloat16
            and B % 16 == 0
            and D % 128 == 0
            and self.hidden_dim % 128 == 0
            and (not wide or STREAM_WIDE_DEFAULT)
        ):
            # block_b=0 -> geometry-scaled auto tile (auto_block_b)
            stash = "stream" if wide else self.stash
            return fused_mlp_block(
                xc, scale, bias, w1c, b1, w2c, b2, 0, False, stash,
            )
        return xla_mlp_block(xc, scale, bias, w1c, b1, w2c, b2)


class _LNParams(nn.Module):
    """Parameter holder producing the same tree paths as ``nn.LayerNorm``."""

    dim: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        return scale, bias


class _LinearParams(nn.Module):
    """Parameter holder producing the same tree paths as ``nn.Dense``."""

    din: int
    dout: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", xavier_uniform, (self.din, self.dout), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.dout,), jnp.float32)
        return kernel, bias


class _AttnParams(nn.Module):
    """qkv + proj parameters under the same paths as the ``Attention`` module."""

    dim: int

    @nn.compact
    def __call__(self):
        wqkv, bqkv = _LinearParams(self.dim, 3 * self.dim, name="qkv")()
        wproj, bproj = _LinearParams(self.dim, self.dim, name="proj")()
        return wqkv, bqkv, wproj, bproj


class Block(nn.Module):
    """Pre-norm transformer block: x + attn(ln(x)); x + mlp(ln(x)).

    Both halves dispatch to fused Pallas kernels on TPU (bf16): the attention
    sub-block (``ops/kernels/attn_block.py``, recompute backward — only ``x``
    is saved per layer) and the MLP sub-block (``ops/kernels/mlp_block.py``).
    Parameters are declared under the classic ``norm1``/``attn/{qkv,proj}``
    paths so checkpoints, the torch porter and the sharding rules are
    layout-independent of the kernel dispatch.
    """

    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32
    # qkv+probs stash: measured 13.7 -> 11.0 ms/layer fwd+bwd at ViT-B
    # B=1024 bf16 for ~400 MB/layer HBM (writes overlap the MXU-bound fwd).
    stash: bool = True
    stash_mlp: bool = False
    # seg_len > 0 declares x's N axis to hold N // seg_len packed samples
    # (MAE short-sequence packing): attention is masked to the block
    # diagonal; the per-token LN/MLP halves need no change. An attribute
    # (not a call arg) so it stays static under nn.remat.
    seg_len: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        seg_len = self.seg_len
        from sky_embeddings_tpu.ops.kernels.attn_block import (
            _use_loop_heads,
            fused_attn_block,
            xla_attn_block,
        )

        B, N, D = x.shape
        scale, bias = _LNParams(D, name="norm1")()
        wqkv, bqkv, wproj, bproj = _AttnParams(D, name="attn")()
        xc = x.astype(self.dtype)
        args = (
            xc, scale, bias,
            wqkv.astype(self.dtype), bqkv,
            wproj.astype(self.dtype), bproj,
        )
        if (
            _FUSED_KERNELS
            and jax.default_backend() == "tpu"
            and self.dtype == jnp.bfloat16
            and B % 16 == 0
            and D % 128 == 0
            and N <= 256
            and D % self.num_heads == 0
            # fori_loop over 128-lane head groups when the group count
            # divides H (the usual case; kernel-side dispatch), per-head
            # unroll for small head counts otherwise, XLA einsums for
            # head counts with neither decomposition.
            and (
                self.num_heads <= 12
                or _use_loop_heads(self.num_heads, D // self.num_heads)
            )
        ):
            # block sizes 0 -> geometry-scaled auto tiles (auto_block_b)
            x = fused_attn_block(*args, self.num_heads, 0, 0, False, self.stash,
                                 seg_len)
        else:
            x = xla_attn_block(*args, self.num_heads, seg_len)
        return MlpBlock(
            int(D * self.mlp_ratio), dtype=self.dtype, stash=self.stash_mlp,
            name="ffn"
        )(x)


class _ScanBody(nn.Module):
    """Scan-compatible wrapper: ``(carry, _) -> (carry, None)`` around Block."""

    num_heads: int
    mlp_ratio: float
    dtype: Dtype
    remat: bool
    stash: bool
    stash_mlp: bool
    seg_len: int = 0

    @nn.compact
    def __call__(self, x, _):
        block_cls = nn.remat(Block) if self.remat else Block
        x = block_cls(
            self.num_heads, self.mlp_ratio, dtype=self.dtype, stash=self.stash,
            stash_mlp=self.stash_mlp, seg_len=self.seg_len, name="block"
        )(x)
        return x, None


class Encoder(nn.Module):
    """A stack of ``depth`` transformer blocks.

    Two compilation strategies:

    * ``scan=False`` (default) — a Python loop with distinct per-block
      parameter scopes (``block0``..``blockN``, matching the reference's
      ModuleList): each block is inlined into the jit program. Fine up to
      ViT-B depth; at depth 24+ with the fused Pallas kernels the unrolled
      program can exhaust the TPU compiler (observed: ViT-L OOMs the
      remote compile helper on this harness).
    * ``scan=True`` — ``nn.scan`` over depth-stacked parameters (one
      ``blocks`` scope with a leading (depth, ...) axis on every leaf): the
      block body compiles ONCE regardless of depth. The idiomatic big-model
      JAX form; use for large/huge variants. ``stack_block_params`` /
      ``unstack_block_params`` convert checkpoints between the layouts.

    ``remat`` wraps each block in ``jax.checkpoint`` to trade FLOPs for HBM
    during training of the larger variants.
    """

    depth: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32
    remat: bool = False
    stash: bool = True
    stash_mlp: bool = False
    scan: bool = False
    # lax.scan unroll factor: compiles the block body `scan_unroll` times
    # (compile memory grows linearly) but amortizes the scan's per-iteration
    # stacked-residual/grad bookkeeping, which measures ~2 ms/layer of
    # backward overhead at ViT-L scale. Middle ground between scan=1 and a
    # full unroll (which exhausts the TPU compiler at ViT-H depth/width).
    scan_unroll: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, seg_len: int = 0) -> jnp.ndarray:
        # Under remat the forward is replayed in the backward anyway, so the
        # stash writes would be paid twice for no recompute saving — disable.
        stash = self.stash and not self.remat
        stash_mlp = self.stash_mlp and not self.remat
        if self.scan:
            scanned = nn.scan(
                _ScanBody,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=self.depth,
                unroll=self.scan_unroll,
            )
            x, _ = scanned(
                self.num_heads, self.mlp_ratio, self.dtype, self.remat,
                stash, stash_mlp, seg_len, name="blocks",
            )(x, None)
            return x
        block_cls = nn.remat(Block) if self.remat else Block
        for i in range(self.depth):
            x = block_cls(
                self.num_heads, self.mlp_ratio, dtype=self.dtype, stash=stash,
                stash_mlp=stash_mlp, seg_len=seg_len, name=f"block{i}"
            )(x)
        return x


def stack_block_params(params: dict, depth: int) -> dict:
    """Convert loop-encoder params (``block0``..``blockN`` scopes) to the
    scan layout (one ``blocks/block`` scope, leaves stacked on axis 0).
    Non-block entries pass through unchanged."""
    blocks = [params[f"block{i}"] for i in range(depth)]
    stacked = jax.tree_util.tree_map(lambda *ls: jnp.stack(ls, axis=0), *blocks)
    out = {k: v for k, v in params.items() if not _is_block_key(k)}
    out["blocks"] = {"block": stacked}
    return out


def unstack_block_params(params: dict) -> dict:
    """Inverse of :func:`stack_block_params`."""
    stacked = params["blocks"]["block"]
    depth = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    out = {k: v for k, v in params.items() if k != "blocks"}
    for i in range(depth):
        out[f"block{i}"] = jax.tree_util.tree_map(lambda l: l[i], stacked)
    return out


def _is_block_key(key: str) -> bool:
    return key.startswith("block") and key[5:].isdigit()


class AttentionPoolLatent(nn.Module):
    """Latent-query attention pooling (capability parity with timm's
    ``AttentionPoolLatent`` used at reference ``mim_vit.py:247-250`` and
    ``vit.py:303-308``).

    A single learned latent token cross-attends over the sequence, followed by
    a residual MLP; returns the pooled (B, D) feature.
    """

    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, N, D = x.shape
        latent = self.param(
            "latent", nn.initializers.normal(stddev=D ** -0.5), (1, 1, D), jnp.float32
        )
        q = jnp.broadcast_to(latent.astype(self.dtype), (B, 1, D))
        y = CrossAttention(self.num_heads, dtype=self.dtype, name="xattn")(q, x)
        z = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(y)
        y = y + Mlp(int(D * self.mlp_ratio), D, dtype=self.dtype, name="mlp")(z)
        return y[:, 0]
