"""Streaming similarity search over a survey (reference ``mae_simsearch``,
``utils/similarity.py:37-132``).

Per batch, one jitted device step: encode → standardize → weighted score →
merge into the running best-k. The host only streams batches; the best-k set
(images + ra/dec + scores) lives on device until the end.

Semantics parity notes:
* feature standardization uses the mean/std of the FIRST test batch
  (reference quirk, ``similarity.py:98-102``) — deterministic given a fixed
  iteration order;
* ``cls_token`` uses only the cls token; otherwise prefix tokens are dropped
  and ``max_pool`` optionally max-pools over patches;
* after the scan, the winners are re-encoded to return their features.
"""

from __future__ import annotations

from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sky_embeddings_tpu.models.mim import SkyMIM
from sky_embeddings_tpu.models.predictor import SkyViT
from sky_embeddings_tpu.ops.similarity import (
    compute_similarity,
    topk_finalize,
    topk_init,
    topk_update,
)


def _select_tokens(latent, num_extra_tokens: int, cls_token: bool, max_pool: bool):
    if cls_token:
        return latent[:, :1]
    latent = latent[:, num_extra_tokens:]
    if max_pool:
        latent = latent.max(axis=1, keepdims=True)
    return latent


def mim_simsearch(
    model,
    variables: dict,
    target_latent: np.ndarray,
    batches: Iterable[dict],
    n_save: int = 256,
    metric: str = "cosine",
    combine: str = "min",
    use_weights: bool = True,
    max_pool: bool = False,
    cls_token: bool = False,
    n_batches: Optional[int] = None,
    log_every: int = 100,
    log_fn=print,
):
    """Returns (best_images, best_latent, best_ra_decs, best_scores) numpy.

    ``target_latent``: (Bt, Lt, D) token features of the target set
    (including prefix tokens, as returned by ``extract_latents`` with
    ``remove_prefix=False``).
    """
    largest = metric == "cosine"
    n_extra = model.num_extra_tokens
    target = _select_tokens(jnp.asarray(target_latent), n_extra, cls_token, max_pool)

    # NOTE: variables are jit *arguments* — closing over them would embed the
    # full parameter tree as constants in the compiled program.
    def encode(vs, imgs, ra_dec):
        kwargs = {"ra_dec": ra_dec} if model.ra_dec else {}
        if isinstance(model, SkyMIM):
            tokens, _, _ = model.apply(vs, imgs, method=SkyMIM.encode, **kwargs)
        else:
            tokens = model.apply(vs, imgs, method=SkyViT.encode, **kwargs)
        return tokens

    @jax.jit
    def first_batch_stats(vs, imgs, ra_dec):
        latent = _select_tokens(encode(vs, imgs, ra_dec), n_extra, cls_token, max_pool)
        mean = latent.mean(axis=(0, 1))
        n = latent.shape[0] * latent.shape[1]
        var = ((latent - mean) ** 2).sum(axis=(0, 1)) / jnp.maximum(n - 1, 1)
        return mean, jnp.sqrt(var)

    @jax.jit
    def search_step(vs, topk, imgs, ra_dec, target_std, mean, std):
        latent = _select_tokens(encode(vs, imgs, ra_dec), n_extra, cls_token, max_pool)
        latent = (latent - mean) / (std + 1e-8)
        scores = compute_similarity(
            target_std, latent, metric=metric, combine=combine, use_weights=use_weights
        )
        return topk_update(topk, scores, {"images": imgs, "ra_decs": ra_dec}, largest=largest)

    topk = None
    mean = std = target_std = None
    n_done = 0
    for i, batch in enumerate(batches):
        if n_batches is not None and i >= n_batches:
            break
        imgs = jnp.asarray(batch["cutouts"])
        ra_dec = jnp.asarray(batch["ra_dec"])
        if i == 0:
            mean, std = first_batch_stats(variables, imgs, ra_dec)
            target_std = (target - mean) / (std + 1e-8)
            payload_shapes = {
                "images": jax.ShapeDtypeStruct(imgs.shape[1:], imgs.dtype),
                "ra_decs": jax.ShapeDtypeStruct((2,), jnp.float32),
            }
            topk = topk_init(n_save, payload_shapes, largest=largest)
        topk = search_step(variables, topk, imgs, ra_dec, target_std, mean, std)
        n_done += 1
        if log_every and (i + 1) % log_every == 0:
            log_fn(f"Processed {i + 1} image batches...")

    if topk is None:
        raise ValueError("similarity search received no batches")

    scores, payload = topk_finalize(topk, largest=largest)
    best_images = payload["images"]
    best_ra_decs = payload["ra_decs"]

    # Re-encode the winners for their features (reference similarity.py:124-130)
    best_latent = jax.jit(encode)(variables, best_images, best_ra_decs)

    return (
        np.asarray(best_images),
        np.asarray(best_latent),
        np.asarray(best_ra_decs),
        np.asarray(scores),
    )


def mim_simsearch_multi(
    model,
    variables: dict,
    target_latents: list,
    batches: Iterable[dict],
    n_save: int = 256,
    metric: str = "cosine",
    combine: str = "min",
    use_weights: bool = True,
    max_pool: bool = False,
    cls_token: bool = False,
    n_batches: Optional[int] = None,
    log_every: int = 100,
    log_fn=print,
):
    """Search the survey for G target groups in ONE pass.

    The expensive leg — encoding every survey cutout — is shared across all
    targets; scoring against the G (target, weight) pairs is a fused multi-
    query contraction (cf. ``ops/kernels/simscore.weighted_bank_scores_multi``
    for the precomputed-bank variant), and G running best-k sets are
    maintained on device via a vmapped top-k merge. New capability beyond the
    reference (which re-streams the survey per target,
    ``similarity.py:37-132``).

    ``target_latents``: list of (Bt_g, Lt, D) token-feature arrays, one per
    target group. Returns lists of per-target (images, latent, ra_decs,
    scores) arrays, ordered like the input.
    """
    from sky_embeddings_tpu.ops.similarity import target_features

    largest = metric == "cosine"
    n_extra = model.num_extra_tokens
    targets = [
        _select_tokens(jnp.asarray(t), n_extra, cls_token, max_pool)
        for t in target_latents
    ]
    G = len(targets)

    def encode(vs, imgs, ra_dec):
        kwargs = {"ra_dec": ra_dec} if model.ra_dec else {}
        if isinstance(model, SkyMIM):
            tokens, _, _ = model.apply(vs, imgs, method=SkyMIM.encode, **kwargs)
        else:
            tokens = model.apply(vs, imgs, method=SkyViT.encode, **kwargs)
        return tokens

    @jax.jit
    def first_batch_stats(vs, imgs, ra_dec):
        latent = _select_tokens(encode(vs, imgs, ra_dec), n_extra, cls_token, max_pool)
        mean = latent.mean(axis=(0, 1))
        n = latent.shape[0] * latent.shape[1]
        var = ((latent - mean) ** 2).sum(axis=(0, 1)) / jnp.maximum(n - 1, 1)
        return mean, jnp.sqrt(var)

    def _score_one(tgt_mean, tgt_w, latent):
        from sky_embeddings_tpu.ops.similarity import (
            weighted_cosine,
            weighted_mae,
            weighted_mse,
        )

        if metric == "cosine":
            sims = weighted_cosine(tgt_mean, latent, tgt_w)
        elif metric.upper() == "MSE":
            sims = weighted_mse(tgt_mean, latent, tgt_w)
        else:
            sims = weighted_mae(tgt_mean, latent, tgt_w)
        if combine == "mean":
            return sims.mean(axis=1)
        if combine == "min":
            return sims.min(axis=1)
        return sims.max(axis=1)

    @jax.jit
    def search_step(vs, topk, imgs, ra_dec, tgt_means, tgt_ws, mean, std):
        # encode ONCE; score all G targets against the shared latent
        latent = _select_tokens(encode(vs, imgs, ra_dec), n_extra, cls_token, max_pool)
        latent = (latent - mean) / (std + 1e-8)  # first-batch stats (ref quirk)
        scores = jax.vmap(_score_one, in_axes=(0, 0, None))(
            tgt_means, tgt_ws, latent
        )  # (G, B)
        payload = {"images": imgs, "ra_decs": ra_dec}
        return jax.vmap(
            lambda st, sc: topk_update(st, sc, payload, largest=largest),
            in_axes=(0, 0),
        )(topk, scores)

    topk = None
    tgt_means = tgt_ws = mean = std = None
    for i, batch in enumerate(batches):
        if n_batches is not None and i >= n_batches:
            break
        imgs = jnp.asarray(batch["cutouts"])
        ra_dec = jnp.asarray(batch["ra_dec"])
        if i == 0:
            mean, std = first_batch_stats(variables, imgs, ra_dec)
            std_targets = [(t - mean) / (std + 1e-8) for t in targets]
            stats = [target_features(t) for t in std_targets]
            tgt_means = jnp.stack([m for m, _ in stats])
            ws = [w for _, w in stats]
            if not use_weights:
                ws = [jnp.ones_like(w) / w.shape[0] for w in ws]
            tgt_ws = jnp.stack(ws)
            payload_shapes = {
                "images": jax.ShapeDtypeStruct(imgs.shape[1:], imgs.dtype),
                "ra_decs": jax.ShapeDtypeStruct((2,), jnp.float32),
            }
            one = topk_init(n_save, payload_shapes, largest=largest)
            topk = jax.tree_util.tree_map(
                lambda leaf: jnp.broadcast_to(leaf, (G,) + leaf.shape), one
            )
        topk = search_step(
            variables, topk, imgs, ra_dec, tgt_means, tgt_ws, mean, std
        )
        if log_every and (i + 1) % log_every == 0:
            log_fn(f"Processed {i + 1} image batches...")

    if topk is None:
        raise ValueError("similarity search received no batches")

    results = []
    for g in range(G):
        one = jax.tree_util.tree_map(lambda leaf: leaf[g], topk)
        scores, payload = topk_finalize(one, largest=largest)
        imgs_g = payload["images"]
        ra_g = payload["ra_decs"]
        latent_g = jax.jit(encode)(variables, imgs_g, ra_g)
        results.append(
            (
                np.asarray(imgs_g),
                np.asarray(latent_g),
                np.asarray(ra_g),
                np.asarray(scores),
            )
        )
    return results
