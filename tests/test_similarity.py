"""Similarity ops tests: formula parity vs a torch oracle of the reference
math, top-k streaming invariants, end-to-end search."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
import torch

from sky_embeddings_tpu.ops.kernels.simscore import (
    bank_topk,
    weighted_bank_scores_pallas,
    weighted_bank_scores_xla,
)
from sky_embeddings_tpu.ops.similarity import (
    compute_similarity,
    target_features,
    topk_finalize,
    topk_init,
    topk_update,
    weighted_cosine,
    weighted_mae,
    weighted_mse,
)


def torch_target_features(target_latent):
    """Oracle of reference determine_target_features (similarity.py:134-147)."""
    t = torch.from_numpy(target_latent).reshape(-1, target_latent.shape[-1])
    avg = t.mean(dim=0)
    w = 1 / t.std(dim=0) ** 2
    w = w / w.sum()
    return avg.numpy(), w.numpy()


def torch_weighted_cosine(tgt, test, w, eps=1e-6):
    tgt = torch.from_numpy(tgt)
    test = torch.from_numpy(test)
    w = torch.from_numpy(w)
    dot = torch.sum(w * tgt * test, dim=-1)
    mt = torch.sqrt(torch.sum(w * tgt ** 2, dim=-1))
    mx = torch.sqrt(torch.sum(w * test ** 2, dim=-1))
    return (dot / (mt * mx + eps)).numpy()


def test_target_features_match_torch():
    rng = np.random.default_rng(0)
    latent = rng.normal(size=(4, 16, 32)).astype(np.float32)
    mean, w = target_features(jnp.asarray(latent))
    mean_t, w_t = torch_target_features(latent)
    np.testing.assert_allclose(np.asarray(mean), mean_t, atol=1e-5)
    np.testing.assert_allclose(np.asarray(w), w_t, rtol=1e-4)


def test_weighted_metrics_match_torch():
    rng = np.random.default_rng(1)
    tgt = rng.normal(size=32).astype(np.float32)
    test = rng.normal(size=(8, 16, 32)).astype(np.float32)
    w = np.abs(rng.normal(size=32)).astype(np.float32)

    got = np.asarray(weighted_cosine(jnp.asarray(tgt), jnp.asarray(test), jnp.asarray(w)))
    want = torch_weighted_cosine(tgt, test, w)
    np.testing.assert_allclose(got, want, atol=1e-5)

    # reference weighted_MSE: mean_d(err^2 * w / sum(w))
    want_mse = ((test - tgt) ** 2 * (w / w.sum())).mean(axis=-1)
    got_mse = np.asarray(weighted_mse(jnp.asarray(tgt), jnp.asarray(test), jnp.asarray(w)))
    np.testing.assert_allclose(got_mse, want_mse, rtol=1e-4)

    want_mae = (np.abs(test - tgt) * (w / w.sum())).mean(axis=-1)
    got_mae = np.asarray(weighted_mae(jnp.asarray(tgt), jnp.asarray(test), jnp.asarray(w)))
    np.testing.assert_allclose(got_mae, want_mae, rtol=1e-4)


def test_compute_similarity_combines():
    rng = np.random.default_rng(2)
    target = jnp.asarray(rng.normal(size=(2, 4, 16)).astype(np.float32))
    test = jnp.asarray(rng.normal(size=(8, 4, 16)).astype(np.float32))
    for combine in ("mean", "min", "max"):
        s = compute_similarity(target, test, metric="cosine", combine=combine)
        assert s.shape == (8,)
    s_mse = compute_similarity(target, test, metric="MSE", combine="mean")
    assert (np.asarray(s_mse) >= 0).all()


def test_topk_streaming_equals_global():
    rng = np.random.default_rng(3)
    scores = rng.normal(size=200).astype(np.float32)
    payload = rng.normal(size=(200, 3)).astype(np.float32)
    k = 16
    state = topk_init(k, {"p": jax.ShapeDtypeStruct((3,), jnp.float32)})
    for i in range(0, 200, 40):
        state = topk_update(
            state, jnp.asarray(scores[i : i + 40]), {"p": jnp.asarray(payload[i : i + 40])}
        )
    got_scores, got_payload = topk_finalize(state)
    order = np.argsort(scores)[::-1][:k]
    np.testing.assert_allclose(np.asarray(got_scores), scores[order], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got_payload["p"]), payload[order], rtol=1e-6)


def test_topk_smallest_metric():
    scores = jnp.asarray([5.0, 1.0, 3.0, 0.5])
    state = topk_init(2, {"i": jax.ShapeDtypeStruct((), jnp.int32)}, largest=False)
    state = topk_update(state, scores, {"i": jnp.arange(4, dtype=jnp.int32)}, largest=False)
    got, payload = topk_finalize(state, largest=False)
    np.testing.assert_allclose(np.asarray(got), [0.5, 1.0])
    np.testing.assert_array_equal(np.asarray(payload["i"]), [3, 1])


def test_bank_scores_pallas_interpret_matches_xla():
    rng = np.random.default_rng(4)
    bank = jnp.asarray(rng.normal(size=(300, 64)).astype(np.float32))
    tgt = jnp.asarray(rng.normal(size=64).astype(np.float32))
    w = jnp.abs(jnp.asarray(rng.normal(size=64).astype(np.float32)))
    xla = np.asarray(weighted_bank_scores_xla(bank, tgt, w))
    pls = np.asarray(weighted_bank_scores_pallas(bank, tgt, w, interpret=True))
    np.testing.assert_allclose(pls, xla, atol=1e-4)


def test_bank_topk():
    rng = np.random.default_rng(5)
    bank = jnp.asarray(rng.normal(size=(500, 32)).astype(np.float32))
    tgt = jnp.asarray(rng.normal(size=32).astype(np.float32))
    w = jnp.ones((32,))
    vals, idx = bank_topk(bank, tgt, w, 10)
    scores = np.asarray(weighted_bank_scores_xla(bank, tgt, w))
    np.testing.assert_allclose(np.asarray(vals), np.sort(scores)[::-1][:10], rtol=1e-5)


@pytest.mark.slow
def test_end_to_end_simsearch():
    """Plant a near-duplicate of the target in the stream; it must win."""
    from sky_embeddings_tpu.eval.simsearch import mim_simsearch
    from sky_embeddings_tpu.models.mim import SkyMIM

    model = SkyMIM(
        img_size=16, patch_size=4, in_chans=3, embed_dim=32, depth=2,
        num_heads=4, simmim=True,
    )
    rng = np.random.default_rng(6)
    target_img = rng.normal(size=(1, 3, 16, 16)).astype(np.float32)
    # several noisy copies so the inverse-variance feature weights are finite
    # (a single max-pooled target row has undefined variance — same as the
    # reference, which always uses multiple augmented targets)
    target_set = target_img + 0.05 * rng.normal(size=(6, 3, 16, 16)).astype(np.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(target_img),
        mask=jnp.zeros((1, 3, 16, 16)),
    )
    tokens, _, _ = model.apply(variables, jnp.asarray(target_set), method=SkyMIM.encode)
    target_latent = np.asarray(tokens)

    batches = []
    planted_ra = 123.0
    for b in range(3):
        imgs = rng.normal(size=(8, 3, 16, 16)).astype(np.float32) * 3
        ra_dec = rng.uniform(0, 90, size=(8, 2)).astype(np.float32)
        if b == 1:
            imgs[3] = target_img[0] + 0.01 * rng.normal(size=(3, 16, 16))
            ra_dec[3] = [planted_ra, 45.0]
        batches.append({"cutouts": imgs, "ra_dec": ra_dec})

    best_imgs, best_latent, best_ra, best_scores = mim_simsearch(
        model, variables, target_latent, batches, n_save=4,
        metric="cosine", combine="min", max_pool=True, log_every=0,
    )
    assert best_imgs.shape == (4, 3, 16, 16)
    assert best_scores[0] >= best_scores[-1]
    assert best_ra[0, 0] == planted_ra  # the planted duplicate ranks first
    assert np.isfinite(best_latent).all()


@pytest.mark.slow
def test_multi_target_simsearch_matches_single():
    """One-pass multi-target search must reproduce per-target single searches
    (same model, same stream) — the survey encode is shared, results aren't."""
    from sky_embeddings_tpu.eval.simsearch import mim_simsearch, mim_simsearch_multi
    from sky_embeddings_tpu.models.mim import SkyMIM

    model = SkyMIM(
        img_size=16, patch_size=4, in_chans=3, embed_dim=32, depth=2,
        num_heads=4, simmim=True,
    )
    rng = np.random.default_rng(21)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 3, 16, 16)),
        mask=jnp.zeros((1, 3, 16, 16)),
    )

    target_sets = [
        rng.normal(size=(5, 3, 16, 16)).astype(np.float32),
        rng.normal(size=(5, 3, 16, 16)).astype(np.float32) * 2.0,
    ]
    target_latents = [
        np.asarray(model.apply(variables, jnp.asarray(t), method=SkyMIM.encode)[0])
        for t in target_sets
    ]

    batches = []
    for _ in range(3):
        batches.append({
            "cutouts": rng.normal(size=(8, 3, 16, 16)).astype(np.float32),
            "ra_dec": rng.uniform(0, 90, size=(8, 2)).astype(np.float32),
        })

    multi = mim_simsearch_multi(
        model, variables, target_latents, batches, n_save=4,
        metric="cosine", combine="min", max_pool=True, log_every=0,
    )
    assert len(multi) == 2
    for g, latent in enumerate(target_latents):
        imgs_s, _, ra_s, scores_s = mim_simsearch(
            model, variables, latent, batches, n_save=4,
            metric="cosine", combine="min", max_pool=True, log_every=0,
        )
        imgs_m, _, ra_m, scores_m = multi[g]
        np.testing.assert_allclose(scores_m, scores_s, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(ra_m, ra_s, rtol=1e-6)
        np.testing.assert_allclose(imgs_m, imgs_s, rtol=1e-6)
