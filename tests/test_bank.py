"""Precomputed embedding-bank retrieval (eval/bank.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sky_embeddings_tpu.eval.bank import EmbeddingBank, build_bank
from sky_embeddings_tpu.models.mim import SkyMIM


@pytest.fixture(scope="module")
def tiny_model():
    model = SkyMIM(
        img_size=16, patch_size=4, in_chans=3, embed_dim=48, depth=2,
        num_heads=4, decoder_embed_dim=32, decoder_depth=1,
        decoder_num_heads=2, simmim=True,
    )
    imgs = jnp.zeros((2, 3, 16, 16), jnp.float32)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), imgs, mask=jnp.zeros_like(imgs)
    )
    return model, variables


def _batches(n_batches, bs=8, seed=0):
    rng = np.random.default_rng(seed)
    for _ in range(n_batches):
        yield {
            "cutouts": rng.normal(size=(bs, 3, 16, 16)).astype(np.float32),
            "ra_dec": rng.uniform(size=(bs, 2)).astype(np.float32),
        }


def test_build_query_roundtrip(tiny_model, tmp_path):
    model, variables = tiny_model
    bank = build_bank(model, variables, _batches(4))
    assert bank.features.shape == (32, 48)
    assert str(bank.features.dtype) == "bfloat16"
    assert bank.ra_decs.shape == (32, 2)
    # standardized: near zero mean / unit std per feature
    f32 = bank.features.astype(np.float32)
    assert np.abs(f32.mean(axis=0)).max() < 0.1
    assert np.abs(f32.std(axis=0) - 1).max() < 0.2

    # target = re-encoded rows 3..5 -> those rows must rank on top
    from sky_embeddings_tpu.eval.eval_fns import extract_latents

    tgt_batch = list(_batches(1, bs=8, seed=0))[0]
    latent = extract_latents(
        model, variables, [tgt_batch], remove_prefix=False
    )
    scores, idx = bank.query(latent[3:6], k=5)
    assert scores.shape == (5,) and idx.shape == (5,)
    assert set(idx[:3].tolist()) & {3, 4, 5}, f"target rows not retrieved: {idx}"

    # save / load (eager + lazy) reproduce the same top-k
    path = str(tmp_path / "bank.h5")
    bank.save(path)
    for lazy in (False, True):
        loaded = EmbeddingBank.load(path, lazy=lazy)
        s2, i2 = loaded.query(latent[3:6], k=5)
        np.testing.assert_allclose(s2, scores, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(i2), np.asarray(idx))


def test_pool_modes(tiny_model):
    model, variables = tiny_model
    for pool in ("mean", "max", "cls"):
        bank = build_bank(model, variables, _batches(1), pool=pool)
        assert bank.features.shape == (8, 48)
    # central = the probe's combine='central' space: 4 central patches
    # flattened -> 4*D feature rows; query targets pool the same way
    bank = build_bank(model, variables, _batches(1), pool="central")
    assert bank.features.shape == (8, 4 * 48)
    latents = np.random.default_rng(0).normal(
        size=(3, bank.n_extra + 16, 48)).astype(np.float32)
    scores, idx = bank.query(latents, k=4, exact=True)
    assert idx.shape == (4,)
    assert np.isfinite(np.asarray(scores)).all()


def test_cli_bank_search_roundtrip(tiny_model, tmp_path):
    """similarity_search.py's --bank mode: build-on-first-use, reuse-on-next,
    winner images/features/ra_decs keep best-first order."""
    import os
    import sys
    from types import SimpleNamespace

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from similarity_search import bank_search

    from sky_embeddings_tpu.data.h5_loader import build_h5_batcher
    from sky_embeddings_tpu.data.synthetic import write_synthetic_h5
    from sky_embeddings_tpu.eval.eval_fns import extract_latents

    model, variables = tiny_model
    test_path = write_synthetic_h5(
        str(tmp_path / "test.h5"), n=40, channels=3, img_size=16, seed=4
    )
    test_indices = np.arange(0, 40, 2)  # pretend S/N filter kept every 2nd
    batcher = build_h5_batcher(test_path, batch_size=10, img_size=16,
                               shuffle=False, indices=test_indices,
                               drop_remainder=False)
    target_latent = extract_latents(
        model, variables, batcher.take(1), remove_prefix=False
    )
    args = SimpleNamespace(cls_token="False", max_pool="False", n_save=7)
    bank_path = str(tmp_path / "bank.h5")

    imgs, latent, ra_decs, scores = bank_search(
        model, variables, target_latent, iter(batcher), test_path,
        test_indices, bank_path, args,
    )
    assert os.path.exists(bank_path)
    assert imgs.shape == (7, 3, 16, 16) and latent.shape[0] == 7
    assert ra_decs.shape == (7, 2) and scores.shape == (7,)
    assert np.all(np.diff(scores) <= 1e-6)  # best-first

    # second call must reuse the bank (batcher exhausted on purpose)
    imgs2, _, _, scores2 = bank_search(
        model, variables, target_latent, iter(()), test_path,
        test_indices, bank_path, args,
    )
    np.testing.assert_allclose(scores2, scores, atol=1e-6)
    np.testing.assert_allclose(imgs2, imgs, atol=1e-6)


def test_chunked_route_matches_device(tiny_model):
    """Forcing the chunked path must reproduce the device-resident result."""
    model, variables = tiny_model
    bank = build_bank(model, variables, _batches(4))
    from sky_embeddings_tpu.eval import bank as bank_mod

    from sky_embeddings_tpu.eval.eval_fns import extract_latents

    latent = extract_latents(
        model, variables, list(_batches(1, bs=4, seed=7)), remove_prefix=False
    )
    s_dev, i_dev = bank.query(latent, k=7)
    old = bank_mod.DEVICE_ROWS_LIMIT
    try:
        bank_mod.DEVICE_ROWS_LIMIT = 0
        s_ch, i_ch = bank.query(latent, k=7)
    finally:
        bank_mod.DEVICE_ROWS_LIMIT = old
    np.testing.assert_allclose(np.asarray(s_ch), np.asarray(s_dev), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i_ch), np.asarray(i_dev))


def test_two_stage_default_matches_exact_above_threshold():
    """Above TWO_STAGE_MIN_ROWS the query default routes through the int8
    two-stage scorer; its exact-rescored top-k must agree with the
    single-pass (``exact=True``) scorer on the same bf16 bank."""
    import ml_dtypes

    from sky_embeddings_tpu.eval import bank as bank_mod

    rng = np.random.default_rng(5)
    n = bank_mod.TWO_STAGE_MIN_ROWS + 512
    feats = rng.normal(size=(n, 48)).astype(np.float32)
    feats = (feats - feats.mean(0)) / (feats.std(0) + 1e-8)
    bank = EmbeddingBank(
        feats.astype(ml_dtypes.bfloat16),
        rng.uniform(size=(n, 2)).astype(np.float32),
        mean=np.zeros(48, np.float32), std=np.ones(48, np.float32),
    )
    latent = rng.normal(size=(3, 4, 48)).astype(np.float32)

    s_exact, i_exact = bank.query(latent, k=50, exact=True)
    s_two, i_two = bank.query(latent, k=50)
    # the head must match exactly; the candidate-set boundary may slip a
    # rank or two (approx_max_k recall is per-candidate, guarded at scale
    # by the bench agreement gate)
    np.testing.assert_array_equal(i_two[:10], i_exact[:10])
    # the single-pass scorer squares rows in bf16, the rescore in fp32 —
    # agreement is bounded by the bf16 rounding of the squares, not exact
    np.testing.assert_allclose(s_two[:10], s_exact[:10], rtol=3e-3, atol=3e-3)
    overlap = len(set(i_two.tolist()) & set(i_exact.tolist()))
    assert overlap >= 45, f"two-stage/exact overlap {overlap}/50"
    assert np.all(np.diff(s_two) <= 1e-6)  # best-first ordering


def test_query_multi_matches_per_query(tiny_model):
    """query_multi must reproduce per-group query() results (small bank →
    exact route both ways), and raise on non-device-resident banks."""
    model, variables = tiny_model
    bank = build_bank(model, variables, _batches(4))
    from sky_embeddings_tpu.eval import bank as bank_mod
    from sky_embeddings_tpu.eval.eval_fns import extract_latents

    groups = [
        extract_latents(model, variables, list(_batches(1, bs=4, seed=s)),
                        remove_prefix=False)
        for s in (7, 8)
    ]
    s_multi, i_multi = bank.query_multi(groups, k=6)
    assert s_multi.shape == (2, 6) and i_multi.shape == (2, 6)
    for q, latent in enumerate(groups):
        s1, i1 = bank.query(latent, k=6)
        np.testing.assert_array_equal(i_multi[q], i1)
        # single-query path squares rows in bf16, the multi path upcasts
        # first — same winners, scores differ at the bf16 rounding level
        np.testing.assert_allclose(s_multi[q], s1, rtol=3e-3, atol=3e-3)

    old = bank_mod.DEVICE_ROWS_LIMIT
    try:
        bank_mod.DEVICE_ROWS_LIMIT = 0
        with pytest.raises(ValueError, match="device-resident"):
            bank.query_multi(groups, k=6)
    finally:
        bank_mod.DEVICE_ROWS_LIMIT = old
