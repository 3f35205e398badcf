"""Inference utilities: reconstruction preview, embedding extraction, and
predictor inference (reference ``utils/eval_fns.py``).

All device work goes through jitted closures compiled once per (model,
batch-shape); iteration and collection stay on host.
"""

from __future__ import annotations

from functools import partial
from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sky_embeddings_tpu.data.augment import augment_batch
from sky_embeddings_tpu.models.layers import unpatchify
from sky_embeddings_tpu.models.mim import SkyMIM
from sky_embeddings_tpu.models.predictor import SkyViT
from sky_embeddings_tpu.ops.losses import denormalize_patches
from sky_embeddings_tpu.ops.masking import simmim_batch_mask, upsample_patch_mask


def mim_reconstruct(
    model: SkyMIM,
    variables: dict,
    batch: dict,
    key: jax.Array,
    max_mask_ratio: Optional[float] = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One-batch reconstruction preview (reference ``mae_predict``,
    ``eval_fns.py:9-70``).

    Returns (pred_imgs, masked_inputs, orig_imgs) as (B, H, W, C) numpy, with
    the prediction composited over the masked region only and masked input
    pixels set to NaN for display.
    """
    imgs = jnp.asarray(batch["cutouts"])
    ra_dec = jnp.asarray(batch["ra_dec"]) if model.ra_dec else None
    B = imgs.shape[0]

    if model.simmim:
        ratio = max_mask_ratio if max_mask_ratio is not None else 0.9
        mask = simmim_batch_mask(
            key, B, model.in_chans, model.img_size, model.patch_size, ratio
        )
        _, pred, _ = jax.jit(
            lambda vs, x, rd, m: model.apply(vs, x, ra_dec=rd, mask=m)
        )(variables, imgs, ra_dec, mask)
        pix_mask = mask
    else:
        _, pred, tok_mask = jax.jit(
            lambda vs, x, rd, k: model.apply(vs, x, ra_dec=rd, rngs={"mask": k})
        )(variables, imgs, ra_dec, key)
        if model.norm_pix_loss:
            from sky_embeddings_tpu.models.layers import patchify

            target_patches = patchify(model.norm_inputs(imgs), model.patch_size)
            pred = denormalize_patches(pred, target_patches)
        pred = unpatchify(pred, model.patch_size, model.in_chans)
        g = model.grid_size
        pix_mask = upsample_patch_mask(
            tok_mask.reshape(B, g, g), model.patch_size
        )[:, None, :, :]
        pix_mask = jnp.broadcast_to(pix_mask, imgs.shape)

    if model.simmim and model.norm_pix_loss:
        from sky_embeddings_tpu.models.layers import patchify

        target_patches = patchify(model.norm_inputs(imgs), model.patch_size)
        pred_patches = patchify(pred, model.patch_size)
        pred = unpatchify(
            denormalize_patches(pred_patches, target_patches),
            model.patch_size,
            model.in_chans,
        )
    pred = model.denorm_outputs(pred)

    pred_np = np.asarray(pred).transpose(0, 2, 3, 1)
    mask_np = np.asarray(pix_mask).transpose(0, 2, 3, 1)
    orig_np = np.asarray(imgs).transpose(0, 2, 3, 1)

    pred_np = np.where(mask_np == 0, orig_np, pred_np)
    masked_inputs = orig_np.copy()
    masked_inputs[mask_np == 1] = np.nan
    return pred_np, masked_inputs, orig_np


def _encode_fn(model, variables, imgs, ra_dec):
    from sky_embeddings_tpu.models.jepa import SkyJEPA

    if isinstance(model, SkyMIM):
        tokens, _, _ = model.apply(variables, imgs, ra_dec=ra_dec, method=SkyMIM.encode)
    elif isinstance(model, SkyJEPA):
        tokens = model.apply(variables, imgs, method=SkyJEPA.encode)
    else:
        tokens = model.apply(variables, imgs, ra_dec=ra_dec, method=SkyViT.encode)
    return tokens


def make_encoder(model, variables):
    """A jitted (imgs, ra_dec) -> tokens closure for repeated extraction.

    ``variables`` is passed as a jit argument, NOT closed over — closure
    constants embed the full parameter tree into the compiled program (and
    into remote-compile requests), which breaks at ViT-B scale.
    """
    uses_ra_dec = model.ra_dec

    @jax.jit
    def encode(vs, imgs, ra_dec):
        return _encode_fn(model, vs, imgs, ra_dec if uses_ra_dec else None)

    return lambda imgs, ra_dec: encode(variables, imgs, ra_dec)


def extract_latents(
    model,
    variables: dict,
    batches: Iterable[dict],
    n_batches: Optional[int] = None,
    remove_prefix: bool = True,
    apply_augmentations: bool = False,
    num_augmentations: int = 16,
    key: Optional[jax.Array] = None,
    return_images: bool = False,
    to_host: bool = True,
    batch_transform=None,
    augment_params: Optional[dict] = None,
):
    """Batched encoder-only embeddings (reference ``mae_latent``,
    ``eval_fns.py:72-140``).

    With ``apply_augmentations``, each sample contributes 1 original +
    ``num_augmentations`` augmented copies (augmented on device);
    ``augment_params`` overrides ``augment_batch``'s reference-default TTA
    pipeline (e.g. ``nan_channels=0`` to keep every band when
    characterizing a color-defined target group). Prefix
    tokens (cls [+ ra_dec]) are stripped when ``remove_prefix`` unless the
    model attention-pools (single pooled token). With ``to_host=False`` the
    latents stay on device as a jnp array (used by the on-device probe).
    ``batch_transform`` (tokens → array), when given, is applied per batch
    before accumulation — so a consumer that only needs pooled features
    never holds the full (N, L, D) token set (on device or host).
    """
    attn_pooled = getattr(model, "attn_pool", False) and getattr(model, "simmim", False)
    if attn_pooled:
        remove_prefix = False
    encode = make_encoder(model, variables)
    if apply_augmentations:
        if key is None:
            key = jax.random.PRNGKey(0)

        aug_kw = dict(augment_params or {})

        @jax.jit
        def augment(k, imgs):
            return augment_batch(k, imgs, **aug_kw)

    latents, images = [], []
    for i, batch in enumerate(batches):
        if n_batches is not None and i >= n_batches:
            break
        imgs = jnp.asarray(batch["cutouts"])
        ra_dec = jnp.asarray(batch["ra_dec"])
        if apply_augmentations:
            reps_i, reps_r = [imgs], [ra_dec]
            for a in range(num_augmentations):
                key, sub = jax.random.split(key)
                reps_i.append(augment(sub, imgs))
                reps_r.append(ra_dec)
            # Interleave so copies of one sample are adjacent:
            # (1+A, B, ...) -> (B·(1+A), ...)
            imgs = jnp.stack(reps_i, axis=1).reshape(-1, *imgs.shape[1:])
            ra_dec = jnp.stack(reps_r, axis=1).reshape(-1, 2)
        tokens = encode(imgs, ra_dec)
        if remove_prefix and not attn_pooled:
            tokens = tokens[:, model.num_extra_tokens :]
        if batch_transform is not None:
            tokens = batch_transform(tokens)
        latents.append(tokens if not to_host else np.asarray(tokens))
        if return_images:
            images.append(np.asarray(imgs))
    latents = jnp.concatenate(latents) if not to_host else np.concatenate(latents)
    if return_images:
        return latents, np.concatenate(images)
    return latents


def predictor_infer(
    model: SkyViT,
    variables: dict,
    batches: Iterable[dict],
    n_batches: Optional[int] = None,
    use_label_errs: bool = False,
    return_images: bool = False,
):
    """Predictor inference with denormalized outputs (reference
    ``ft_predict``, ``eval_fns.py:142-190``). Returns (targets, preds[, imgs])."""

    @jax.jit
    def _run(vs, imgs, ra_dec):
        out = model.apply(vs, imgs, ra_dec=ra_dec if model.ra_dec else None)
        return model.denormalize_labels(out)

    run = lambda imgs, ra_dec: _run(variables, imgs, ra_dec)

    targets, preds, images = [], [], []
    for i, batch in enumerate(batches):
        if n_batches is not None and i >= n_batches:
            break
        labels = np.asarray(batch["labels"])
        if use_label_errs:
            labels = labels[:, : labels.shape[1] // 2]
        out = run(jnp.asarray(batch["cutouts"]), jnp.asarray(batch["ra_dec"]))
        targets.append(labels)
        preds.append(np.asarray(out))
        if return_images:
            images.append(np.asarray(batch["cutouts"]))
    targets = np.concatenate(targets)
    preds = np.concatenate(preds)
    if return_images:
        return targets, preds, np.concatenate(images)
    return targets, preds
