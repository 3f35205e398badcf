"""On-device batch augmentations.

The reference augments per-sample on host DataLoader workers
(``utils/dataloaders.py:14-106``: H/V flips, RandomResizedCrop(scale=(0.8,1),
ratio=(0.9,1.1)), multiplicative brightness, additive gaussian noise, and
whole-band NaN dropout). On a TPU host with few cores that pipeline starves
the chip, so here the same distributions run *inside the compiled step* over
the whole batch: pure ``jax.random`` + gathers, fully fused by XLA.

All functions take a PRNG key and a (B, C, H, W) batch and are jit-safe
(static shapes; per-sample randomness via batched draws).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def random_flips(key: jax.Array, imgs: jnp.ndarray) -> jnp.ndarray:
    """Independent per-sample horizontal and vertical flips (p=0.5 each)."""
    B = imgs.shape[0]
    kh, kv = jax.random.split(key)
    do_h = jax.random.bernoulli(kh, 0.5, (B,))
    do_v = jax.random.bernoulli(kv, 0.5, (B,))
    flipped_w = imgs[..., ::-1]
    imgs = jnp.where(do_h[:, None, None, None], flipped_w, imgs)
    flipped_h = imgs[..., ::-1, :]
    return jnp.where(do_v[:, None, None, None], flipped_h, imgs)


def _axis_linear_sample(imgs: jnp.ndarray, coords: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Separable linear interpolation along one spatial axis.

    imgs: (B, C, H, W); coords: (B, S) fractional source coordinates for the
    output positions along ``axis`` (-2 rows or -1 cols). Returns the batch
    resampled along that axis to length S.
    """
    size = imgs.shape[axis]
    lo = jnp.clip(jnp.floor(coords), 0, size - 1)
    hi = jnp.clip(lo + 1, 0, size - 1)
    w_hi = jnp.clip(coords - lo, 0.0, 1.0)
    lo = lo.astype(jnp.int32)
    hi = hi.astype(jnp.int32)

    if axis in (-1, imgs.ndim - 1):
        idx_shape = (imgs.shape[0], 1, 1, coords.shape[1])
        take = lambda idx: jnp.take_along_axis(imgs, idx.reshape(imgs.shape[0], 1, 1, -1).repeat(imgs.shape[1], 1).repeat(imgs.shape[2], 2), axis=-1)
        w = w_hi[:, None, None, :]
    else:
        take = lambda idx: jnp.take_along_axis(imgs, idx.reshape(imgs.shape[0], 1, -1, 1).repeat(imgs.shape[1], 1).repeat(imgs.shape[3], 3), axis=-2)
        w = w_hi[:, None, :, None]
    return take(lo) * (1.0 - w) + take(hi) * w


def random_resized_crop(
    key: jax.Array,
    imgs: jnp.ndarray,
    out_size: Optional[int] = None,
    scale: tuple[float, float] = (0.8, 1.0),
    ratio: tuple[float, float] = (0.9, 1.1),
) -> jnp.ndarray:
    """Per-sample random crop of random area/aspect, bilinearly resized.

    Same parameter distributions as the reference's RandomResizedCrop
    (area scale uniform, aspect ratio log-uniform); crop boxes exceeding the
    image are clamped to fit instead of rejection-sampled (static shapes).
    """
    B, C, H, W = imgs.shape
    S = out_size or H
    k_area, k_ratio, k_y, k_x = jax.random.split(key, 4)
    area = jax.random.uniform(k_area, (B,), minval=scale[0], maxval=scale[1]) * (H * W)
    log_r = jax.random.uniform(
        k_ratio, (B,), minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1])
    )
    r = jnp.exp(log_r)
    crop_w = jnp.minimum(jnp.sqrt(area * r), W)
    crop_h = jnp.minimum(jnp.sqrt(area / r), H)
    y0 = jax.random.uniform(k_y, (B,)) * (H - crop_h)
    x0 = jax.random.uniform(k_x, (B,)) * (W - crop_w)

    # torch-style coordinate mapping: src = (dst + 0.5) * (crop/S) - 0.5 + origin
    grid = (jnp.arange(S, dtype=jnp.float32) + 0.5) / S
    ys = y0[:, None] + grid[None, :] * crop_h[:, None] - 0.5
    xs = x0[:, None] + grid[None, :] * crop_w[:, None] - 0.5

    imgs = _axis_linear_sample(imgs, ys, axis=-2)
    imgs = _axis_linear_sample(imgs, xs, axis=-1)
    return imgs


def random_brightness(
    key: jax.Array, imgs: jnp.ndarray, brightness: float = 0.8
) -> jnp.ndarray:
    """Multiply each sample by a factor ~ U(brightness, 1/brightness)."""
    B = imgs.shape[0]
    factor = jax.random.uniform(key, (B,), minval=brightness, maxval=1.0 / brightness)
    return imgs * factor[:, None, None, None]


def random_noise(key: jax.Array, imgs: jnp.ndarray, noise: float = 0.01) -> jnp.ndarray:
    """Add gaussian noise with a per-sample sigma ~ U(0, noise)."""
    B = imgs.shape[0]
    k_sigma, k_eps = jax.random.split(key)
    sigma = jax.random.uniform(k_sigma, (B,), minval=0.0, maxval=noise)
    eps = jax.random.normal(k_eps, imgs.shape, dtype=imgs.dtype)
    return imgs + eps * sigma[:, None, None, None]


def random_channel_nan(
    key: jax.Array, imgs: jnp.ndarray, max_channels: int = 1
) -> jnp.ndarray:
    """NaN-out up to ``max_channels`` whole bands per sample (missing-band
    fault injection, reference ``RandomChannelNaN``, ``dataloaders.py:39-87``).

    Per sample: n ~ uniform{0..max_channels}; n distinct channels chosen
    uniformly (rank trick keeps shapes static).
    """
    B, C = imgs.shape[:2]
    k_n, k_pick = jax.random.split(key)
    n_drop = jax.random.randint(k_n, (B,), 0, max_channels + 1)
    noise = jax.random.uniform(k_pick, (B, C))
    rank = jnp.argsort(jnp.argsort(noise, axis=-1), axis=-1)
    drop = rank < n_drop[:, None]
    return jnp.where(drop[:, :, None, None], jnp.nan, imgs)


def augment_batch(
    key: jax.Array,
    imgs: jnp.ndarray,
    flip: bool = True,
    crop: bool = True,
    brightness: Optional[float] = 0.8,
    noise: Optional[float] = 0.01,
    nan_channels: Optional[int] = 2,
) -> jnp.ndarray:
    """Full pipeline in the reference's composition order
    (``get_augmentations``, ``dataloaders.py:90-106``)."""
    keys = jax.random.split(key, 5)
    if flip:
        imgs = random_flips(keys[0], imgs)
    if crop:
        imgs = random_resized_crop(keys[1], imgs)
    if brightness is not None:
        imgs = random_brightness(keys[2], imgs, brightness)
    if noise is not None:
        imgs = random_noise(keys[3], imgs, noise)
    if nan_channels is not None and nan_channels > 0:
        imgs = random_channel_nan(keys[4], imgs, nan_channels)
    return imgs
