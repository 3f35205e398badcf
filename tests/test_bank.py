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
