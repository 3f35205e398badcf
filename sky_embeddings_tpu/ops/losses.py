"""NaN-aware masked reconstruction losses.

Sky-survey cutouts carry NaN pixels for missing bands; the loss must (a) only
score masked-out regions and (b) ignore NaN targets, with the same guarded
reductions as the reference (``mim_vit.py:473-521,614-627``) so loss curves
are comparable run-to-run. Everything here is elementwise + reductions — XLA
fuses it into the decoder's epilogue.
"""

from __future__ import annotations

import jax.numpy as jnp


def patch_mean_and_var(patches: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-patch mean/variance over the last axis, ignoring NaN entries.

    Zero-filled sums guarded exactly as the reference (``mim_vit.py:614-627``):
    an all-NaN patch yields 0/0 = NaN, which downstream masking removes.
    """
    valid = ~jnp.isnan(patches)
    count = valid.sum(axis=-1, keepdims=True)
    filled = jnp.where(valid, patches, 0.0)
    mean = filled.sum(axis=-1, keepdims=True) / count
    sq = jnp.where(valid, patches - mean, 0.0) ** 2
    var = sq.sum(axis=-1, keepdims=True) / count
    return mean, var


def normalize_patches(patches: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Per-patch standardization used by ``norm_pix_loss``."""
    mean, var = patch_mean_and_var(patches)
    return (patches - mean) / jnp.sqrt(var + eps)


def denormalize_patches(
    normalized: jnp.ndarray, reference_patches: jnp.ndarray, eps: float = 1e-6
) -> jnp.ndarray:
    """Invert :func:`normalize_patches` using stats of ``reference_patches``
    (reference ``undo_pixel_norm``, ``mim_vit.py:629-648``)."""
    mean, var = patch_mean_and_var(reference_patches)
    return normalized * jnp.sqrt(var + eps) + mean


def masked_recon_loss(
    target: jnp.ndarray,
    pred: jnp.ndarray,
    mask: jnp.ndarray,
    loss_fn: str = "l1",
) -> jnp.ndarray:
    """Masked, NaN-guarded mean of per-element L1/MSE.

    ``mask`` is 1 where the loss counts (masked-out AND valid); it may have
    one fewer trailing dim than ``target`` (MAE's (B, L) vs (B, L, p²C)), in
    which case it broadcasts. Reduction matches the reference formula
    ``(loss·mask).sum() / (mask.sum()/mask.numel()·loss.numel() + 1e-5)``
    (``mim_vit.py:508-519``), which for equal-shaped operands is the masked
    mean with a +1e-5 guard.
    """
    if loss_fn.lower() in ("mse", "l2"):
        per_elem = (target - pred) ** 2
    else:
        per_elem = jnp.abs(target - pred)

    if mask.ndim == per_elem.ndim - 1:
        mask = mask[..., None]
    mask = jnp.broadcast_to(mask, per_elem.shape)

    # Exclude NaN targets from both numerator and denominator.
    finite = ~jnp.isnan(per_elem)
    mask = jnp.where(finite, mask, 0.0)
    per_elem = jnp.where(finite, per_elem, 0.0)

    denom = mask.sum() + 1e-5
    return (per_elem * mask).sum() / denom
