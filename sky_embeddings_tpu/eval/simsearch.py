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
