"""Similarity scoring + streaming top-k, on device.

Counterpart of the reference ``utils/similarity.py``: a target group's token
features collapse to one mean feature vector with inverse-variance feature
weights; test samples score against it with a weighted cosine / MSE / MAE
over (sample, patch); per-sample combine = mean/min/max; a running best-k set
is maintained while streaming the survey.

TPU design: scoring is one batched contraction (MXU) fused with the combine;
the running top-k merge is ``jax.lax.top_k`` over the concatenated candidate
set — all inside one jitted step, so the host only feeds batches.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


def target_features(target_latent: jnp.ndarray, eps_w: float = 0.0):
    """(B, L, D) target token features -> (mean (D,), weights (D,)).

    Weights are inverse variance over all (sample, patch) rows, normalized to
    sum 1 (reference ``determine_target_features``, ``similarity.py:134-147``;
    std is the unbiased sample std like torch.std).
    """
    flat = target_latent.reshape(-1, target_latent.shape[-1])
    mean = flat.mean(axis=0)
    n = flat.shape[0]
    var = ((flat - mean) ** 2).sum(axis=0) / jnp.maximum(n - 1, 1)
    w = 1.0 / (var + eps_w)
    return mean, w / w.sum()


def weighted_cosine(target: jnp.ndarray, test: jnp.ndarray, weights: jnp.ndarray, eps: float = 1e-6):
    """Weighted cosine similarity of (..., D) test rows vs a (D,) target."""
    dot = jnp.einsum("d,...d->...", weights * target, test)
    mag_t = jnp.sqrt(jnp.sum(weights * target ** 2))
    mag_x = jnp.sqrt(jnp.einsum("d,...d->...", weights, test ** 2))
    return dot / (mag_t * mag_x + eps)


def weighted_mse(target: jnp.ndarray, test: jnp.ndarray, weights: jnp.ndarray):
    """mean_d(err² · w/Σw) (reference ``weighted_MSE``, ``similarity.py:174-192``)."""
    w = weights / weights.sum()
    return jnp.einsum("d,...d->...", w, (test - target) ** 2) / test.shape[-1]


def weighted_mae(target: jnp.ndarray, test: jnp.ndarray, weights: jnp.ndarray):
    """mean_d(|err| · w/Σw) (reference ``weighted_MAE``, ``similarity.py:194-212``)."""
    w = weights / weights.sum()
    return jnp.einsum("d,...d->...", w, jnp.abs(test - target)) / test.shape[-1]


def compute_similarity(
    target_latent: jnp.ndarray,
    test_latent: jnp.ndarray,
    metric: str = "cosine",
    combine: str = "min",
    use_weights: bool = True,
    n_top_sims: Optional[int] = None,
) -> jnp.ndarray:
    """(B, L, D) test features vs (Bt, Lt, D) target features -> (B,) scores
    (reference ``compute_similarity``, ``similarity.py:214-268``)."""
    tgt, weights = target_features(target_latent)
    if not use_weights:
        weights = jnp.ones_like(weights) / weights.shape[0]

    if metric == "cosine":
        sims = weighted_cosine(tgt, test_latent, weights)
        largest = True
    elif metric.upper() == "MSE":
        sims = weighted_mse(tgt, test_latent, weights)
        largest = False
    elif metric.upper() == "MAE":
        sims = weighted_mae(tgt, test_latent, weights)
        largest = False
    else:
        raise ValueError(f"unknown metric {metric!r}")

    if n_top_sims is not None and sims.ndim > 1:
        vals = jax.lax.top_k(sims if largest else -sims, n_top_sims)[0]
        sims = vals if largest else -vals

    if sims.ndim == 1:
        return sims
    if combine == "mean":
        return sims.mean(axis=1)
    if combine == "min":
        return sims.min(axis=1)
    if combine == "max":
        return sims.max(axis=1)
    raise ValueError(f"unknown combine {combine!r}")


class TopK(NamedTuple):
    """Running best-k candidates (scores + arbitrary payload PyTree)."""

    scores: jnp.ndarray  # (k,) — always in 'larger is better' orientation
    payload: dict        # each leaf (k, ...)


def topk_init(k: int, payload_shapes: dict, largest: bool = True) -> TopK:
    """Empty running set. Scores are stored negated for smallest-is-better
    metrics so a single descending top-k covers both."""
    scores = jnp.full((k,), -jnp.inf)
    payload = jax.tree_util.tree_map(
        lambda sd: jnp.zeros((k,) + tuple(sd.shape), sd.dtype), payload_shapes
    )
    return TopK(scores, payload)


def topk_update(state: TopK, scores: jnp.ndarray, payload: dict, largest: bool = True) -> TopK:
    """Merge a batch of candidates into the running best-k (device-side;
    reference ``update_best_scores``, ``similarity.py:18-35``)."""
    oriented = scores if largest else -scores
    all_scores = jnp.concatenate([state.scores, oriented])
    k = state.scores.shape[0]
    top_vals, top_idx = jax.lax.top_k(all_scores, k)
    merged_payload = jax.tree_util.tree_map(
        lambda old, new: jnp.concatenate([old, new])[top_idx],
        state.payload,
        payload,
    )
    return TopK(top_vals, merged_payload)


def topk_finalize(state: TopK, largest: bool = True):
    """(scores, payload) in final orientation, best first."""
    scores = state.scores if largest else -state.scores
    return scores, state.payload
