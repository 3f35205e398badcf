"""On-device mask generation for masked image modelling.

The reference generates SimMIM masks on the host, one sample at a time,
inside DataLoader workers (``utils/dataloaders.py:155-219``). On TPU the
whole batch's masks are drawn inside the compiled train step from a
``jax.random`` key: shapes are static, the host stays free for I/O, and the
mask never crosses PCIe. Distributional semantics are identical:

* per sample, a masking ratio is drawn uniformly from (0, max_mask_ratio);
* ``ceil(ratio · n_tokens)`` patches are masked, independently per channel
  (the same count in every channel);
* the patch-level mask is upsampled to pixel resolution.

MAE-style masking (reference ``mim_vit.py:354-379``) keeps a *static*
``len_keep`` derived from the run-level ``mask_ratio`` config — the ratio is
fixed per run in the reference too (``pretrain_mim.py:69``), so no dynamic
shapes are needed under jit.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def upsample_patch_mask(mask: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """(..., G, G) patch-level mask -> (..., G·p, G·p) pixel-level mask."""
    *lead, gh, gw = mask.shape
    p = patch_size
    out = jnp.broadcast_to(
        mask[..., :, None, :, None], (*lead, gh, p, gw, p)
    )
    return out.reshape(*lead, gh * p, gw * p)


def simmim_batch_mask(
    key: jax.Array,
    batch_size: int,
    channels: int,
    img_size: int,
    patch_size: int,
    max_mask_ratio: float,
) -> jnp.ndarray:
    """Draw a batch of channel-wise SimMIM pixel masks: (B, C, H, W) in {0,1}.

    Per sample b: ratio_b ~ U(0, max_mask_ratio); each channel masks exactly
    ``ceil(ratio_b · G²)`` patches chosen uniformly without replacement.
    """
    g = img_size // patch_size
    n_tokens = g * g
    k_ratio, k_noise = jax.random.split(key)
    ratio = jax.random.uniform(k_ratio, (batch_size,)) * max_mask_ratio
    count = jnp.ceil(n_tokens * ratio)  # (B,) float

    # Rank trick: rank[i] = position of token i in a random permutation;
    # the `count` smallest ranks are the masked patches.
    noise = jax.random.uniform(k_noise, (batch_size, channels, n_tokens))
    rank = jnp.argsort(jnp.argsort(noise, axis=-1), axis=-1)
    mask = (rank < count[:, None, None]).astype(jnp.float32)

    mask = mask.reshape(batch_size, channels, g, g)
    return upsample_patch_mask(mask, patch_size)


class MaeMasking(NamedTuple):
    """Result of MAE-style random masking."""

    tokens_kept: jnp.ndarray  # (B, len_keep, D)
    mask: jnp.ndarray         # (B, L) — 0 keep, 1 removed
    ids_restore: jnp.ndarray  # (B, L) — inverse shuffle permutation


def mae_random_masking(
    key: jax.Array, tokens: jnp.ndarray, mask_ratio: float, noise=None
) -> MaeMasking:
    """Per-sample random shuffle-and-keep with a static keep count.

    ``len_keep = int(L · (1 - mask_ratio))`` is a Python int, so the output
    shapes are static under jit. Matches reference ``mim_vit.py:354-379``.
    ``noise`` optionally injects the (B, L) shuffle noise (golden-parity
    tests share one draw between frameworks); default draws from ``key``.
    """
    B, L, D = tokens.shape
    len_keep = int(L * (1.0 - mask_ratio))

    if noise is None:
        noise = jax.random.uniform(key, (B, L))
    ids_shuffle = jnp.argsort(noise, axis=1)
    ids_restore = jnp.argsort(ids_shuffle, axis=1)

    ids_keep = ids_shuffle[:, :len_keep]
    kept = jnp.take_along_axis(tokens, ids_keep[:, :, None], axis=1)

    # Token i is masked iff its shuffled rank is >= len_keep.
    mask = (ids_restore >= len_keep).astype(jnp.float32)
    return MaeMasking(kept, mask, ids_restore)


def mae_unshuffle(
    decoder_tokens: jnp.ndarray,
    mask_token: jnp.ndarray,
    ids_restore: jnp.ndarray,
) -> jnp.ndarray:
    """Scatter kept decoder tokens back to image order, filling the rest with
    the learned mask token (reference ``mim_vit.py:446-449``).

    decoder_tokens: (B, len_keep, Dd) — grid tokens only (no prefix tokens).
    """
    B, len_keep, Dd = decoder_tokens.shape
    L = ids_restore.shape[1]
    fill = jnp.broadcast_to(mask_token.reshape(1, 1, Dd), (B, L - len_keep, Dd))
    full = jnp.concatenate([decoder_tokens, fill.astype(decoder_tokens.dtype)], axis=1)
    return jnp.take_along_axis(full, ids_restore[:, :, None], axis=1)
