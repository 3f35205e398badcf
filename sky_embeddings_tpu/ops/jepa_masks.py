"""I-JEPA multi-block mask sampling, static-shape / on-device.

The reference ships an I-JEPA config (``configs/jepa_1.ini``) with no model
code; this implements the published I-JEPA masking strategy (Assran et al.
2023) in a jit-friendly form:

* ``num_pred`` rectangular *target* blocks per sample, area scale ~
  U(pred_mask_scale), aspect ratio log-U(aspect_ratio);
* one rectangular *context* block, scale ~ U(enc_mask_scale), unit aspect,
  minus the union of target blocks (``allow_overlap=False``);
* everything is returned as **fixed-length index sets with validity flags**
  (the PyTorch implementation collates variable-length masks; fixed budgets +
  masking keep shapes static under jit).

Selection uses the rank trick: order tokens by (membership, random
tiebreak), take the first K, flag ranks beyond the true member count
invalid.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp


class BlockMasks(NamedTuple):
    ctx_idx: jnp.ndarray     # (B, K_ctx) int32 token indices
    ctx_valid: jnp.ndarray   # (B, K_ctx) bool
    tgt_idx: jnp.ndarray     # (B, num_pred, K_tgt) int32
    tgt_valid: jnp.ndarray   # (B, num_pred, K_tgt) bool


def _rect_mask(key, batch: int, grid: int, scale_range, ratio_range):
    """(B, G, G) boolean rectangle masks with sampled area/aspect."""
    k_s, k_r, k_y, k_x = jax.random.split(key, 4)
    L = grid * grid
    s = jax.random.uniform(k_s, (batch,), minval=scale_range[0], maxval=scale_range[1])
    log_r = jax.random.uniform(
        k_r, (batch,),
        minval=math.log(ratio_range[0]), maxval=math.log(ratio_range[1]),
    )
    r = jnp.exp(log_r)
    h = jnp.clip(jnp.round(jnp.sqrt(s * L * r)), 1, grid)
    w = jnp.clip(jnp.round(jnp.sqrt(s * L / r)), 1, grid)
    y0 = jnp.floor(jax.random.uniform(k_y, (batch,)) * (grid - h + 1))
    x0 = jnp.floor(jax.random.uniform(k_x, (batch,)) * (grid - w + 1))

    ys = jax.lax.broadcasted_iota(jnp.float32, (batch, grid, grid), 1)
    xs = jax.lax.broadcasted_iota(jnp.float32, (batch, grid, grid), 2)
    return (
        (ys >= y0[:, None, None]) & (ys < (y0 + h)[:, None, None])
        & (xs >= x0[:, None, None]) & (xs < (x0 + w)[:, None, None])
    )


def _select(key, member: jnp.ndarray, k: int):
    """(B, L) bool membership -> (idx (B,k) int32, valid (B,k) bool).

    Members come first in random order; surplus slots point at the first
    member (valid=False) so gathers stay in-bounds.
    """
    B, L = member.shape
    tie = jax.random.uniform(key, (B, L))
    score = member.astype(jnp.float32) * 2.0 + tie
    order = jnp.argsort(-score, axis=-1)  # members first, shuffled
    idx = order[:, :k].astype(jnp.int32)
    counts = member.sum(axis=-1, keepdims=True)
    ranks = jax.lax.broadcasted_iota(jnp.int32, (B, k), 1)
    valid = ranks < counts
    safe = jnp.where(valid, idx, idx[:, :1])
    return safe, valid


def sample_block_masks(
    key: jax.Array,
    batch: int,
    grid: int,
    num_pred: int = 4,
    pred_mask_scale=(0.15, 0.2),
    enc_mask_scale=(0.85, 1.0),
    aspect_ratio=(0.75, 1.5),
    min_keep: int = 5,
) -> BlockMasks:
    """Draw I-JEPA context/target index sets for a batch."""
    L = grid * grid
    k_tgt = max(int(math.ceil(pred_mask_scale[1] * L)), min_keep)
    k_ctx = max(int(math.ceil(enc_mask_scale[1] * L)), min_keep)

    keys = jax.random.split(key, num_pred + 3)
    tgt_rects = []
    for t in range(num_pred):
        tgt_rects.append(
            _rect_mask(keys[t], batch, grid, pred_mask_scale, aspect_ratio)
        )
    tgt_union = jnp.zeros((batch, grid, grid), bool)
    for m in tgt_rects:
        tgt_union = tgt_union | m

    ctx_rect = _rect_mask(keys[num_pred], batch, grid, enc_mask_scale, (1.0, 1.0))
    ctx_member = (ctx_rect & ~tgt_union).reshape(batch, L)
    # guarantee min_keep context tokens: if too few survive, fall back to the
    # raw context rectangle for that sample
    too_few = ctx_member.sum(-1, keepdims=True) < min_keep
    ctx_member = jnp.where(too_few, ctx_rect.reshape(batch, L), ctx_member)

    ctx_idx, ctx_valid = _select(keys[num_pred + 1], ctx_member, k_ctx)

    sel_keys = jax.random.split(keys[num_pred + 2], num_pred)
    tgt_idx, tgt_valid = [], []
    for t in range(num_pred):
        idx, valid = _select(sel_keys[t], tgt_rects[t].reshape(batch, L), k_tgt)
        tgt_idx.append(idx)
        tgt_valid.append(valid)
    return BlockMasks(
        ctx_idx,
        ctx_valid,
        jnp.stack(tgt_idx, axis=1),
        jnp.stack(tgt_valid, axis=1),
    )
