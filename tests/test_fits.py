"""FITS I/O + WCS + tile streaming tests (self-contained writer/reader)."""

import math
import os

import numpy as np
import pytest

from sky_embeddings_tpu.data.fits_io import TanWCS, read_fits, read_image, write_image
from sky_embeddings_tpu.data.fits_loader import (
    FitsTileBatcher,
    find_band_files,
    load_band_stack,
    overlap_coords,
    overlapping_cutouts,
    random_cutouts,
)


def classic_tan_inverse(u_deg, v_deg, a0_deg, d0_deg):
    """Independent oracle: classic gnomonic deprojection formulas."""
    xi = np.deg2rad(u_deg)
    eta = np.deg2rad(v_deg)
    a0 = math.radians(a0_deg)
    d0 = math.radians(d0_deg)
    denom = math.cos(d0) - eta * math.sin(d0)
    ra = a0 + np.arctan2(xi, denom)
    dec = np.arctan((np.sin(d0) + eta * np.cos(d0)) / np.sqrt(xi ** 2 + denom ** 2) * np.cos(ra - a0) / np.maximum(np.cos(ra - a0), 1e-12))
    dec = np.arctan2(math.sin(d0) + eta * math.cos(d0), np.sqrt(xi ** 2 + denom ** 2))
    return np.rad2deg(ra) % 360.0, np.rad2deg(dec)


@pytest.fixture
def wcs():
    scale = 0.168 / 3600.0  # HSC-like 0.168"/pix
    return TanWCS(crpix=(100.5, 120.5), crval=(150.1, 2.2),
                  cd=[[-scale, 0.0], [0.0, scale]])


def test_fits_roundtrip(tmp_path, wcs):
    data = np.random.default_rng(0).normal(size=(32, 48)).astype(np.float32)
    path = str(tmp_path / "img.fits")
    write_image(path, data, wcs.to_cards())
    back, header = read_image(path)
    np.testing.assert_allclose(back, data, rtol=1e-6)
    assert header["CTYPE1"] == "RA---TAN"
    w2 = TanWCS.from_header(header)
    np.testing.assert_allclose(w2.crval, wcs.crval)
    np.testing.assert_allclose(w2.cd, wcs.cd)


def test_wcs_reference_point(wcs):
    # CRPIX (1-based) maps to CRVAL; crpix-1 in 0-based coords
    ra, dec = wcs.pixel_to_world(wcs.crpix[0] - 1, wcs.crpix[1] - 1)
    np.testing.assert_allclose([ra, dec], wcs.crval, atol=1e-9)


def test_wcs_matches_classic_formulas(wcs):
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 200, 64)
    y = rng.uniform(0, 240, 64)
    ra, dec = wcs.pixel_to_world(x, y)
    dx = x + 1 - wcs.crpix[0]
    dy = y + 1 - wcs.crpix[1]
    u = wcs.cd[0, 0] * dx + wcs.cd[0, 1] * dy
    v = wcs.cd[1, 0] * dx + wcs.cd[1, 1] * dy
    ra_o, dec_o = classic_tan_inverse(u, v, *wcs.crval)
    np.testing.assert_allclose(ra, ra_o, atol=1e-8)
    np.testing.assert_allclose(dec, dec_o, atol=1e-8)


def test_wcs_roundtrip(wcs):
    rng = np.random.default_rng(2)
    x = rng.uniform(0, 200, 32)
    y = rng.uniform(0, 240, 32)
    ra, dec = wcs.pixel_to_world(x, y)
    x2, y2 = wcs.world_to_pixel(ra, dec)
    np.testing.assert_allclose(x2, x, atol=1e-6)
    np.testing.assert_allclose(y2, y, atol=1e-6)


def test_wcs_local_linearity(wcs):
    # one pixel east ≈ CD[0,0] deg in RA·cos(dec)
    ra0, dec0 = wcs.pixel_to_world(100, 100)
    ra1, _ = wcs.pixel_to_world(101, 100)
    dra = (ra1 - ra0 + 180) % 360 - 180
    np.testing.assert_allclose(
        dra * math.cos(math.radians(dec0)), wcs.cd[0, 0], rtol=1e-4
    )


def _write_tile_set(tmp_path, wcs, bands=("G", "R", "I"), patch="9813-3,4", H=160, W=150):
    rng = np.random.default_rng(3)
    tiles = {}
    for i, band in enumerate(bands):
        if band == "R":
            continue  # missing band
        data = rng.normal(size=(H, W)).astype(np.float32) + i
        path = str(tmp_path / f"calexp-HSC-{band}-{patch}.fits")
        write_image(path, data, wcs.to_cards())
        tiles[band] = data
    return tiles


def test_band_discovery_and_stack(tmp_path, wcs):
    _write_tile_set(tmp_path, wcs)
    files = find_band_files([str(tmp_path)], ["G", "R", "I"], min_bands=2, verbose=False)
    assert len(files) == 1
    assert files[0][1] == "None"  # R missing
    stack, w = load_band_stack(files[0], return_wcs=True)
    assert stack.shape == (3, 160, 150)
    assert np.isnan(stack[1]).all()
    assert np.isfinite(stack[0]).all()
    assert w is not None


def test_min_bands_filter(tmp_path, wcs):
    _write_tile_set(tmp_path, wcs)
    files = find_band_files([str(tmp_path)], ["G", "R", "I"], min_bands=3, verbose=False)
    assert files == []


def test_random_and_overlapping_cutouts(wcs):
    tile = np.random.default_rng(4).normal(size=(3, 160, 150)).astype(np.float32)
    cuts, ra_dec = random_cutouts(tile, 64, 10, wcs, np.random.default_rng(0))
    assert cuts.shape == (10, 3, 64, 64)
    assert ra_dec.shape == (10, 2)
    assert (ra_dec[:, 0] > 149).all() and (ra_dec[:, 0] < 151).all()
    cuts2, ra_dec2 = overlapping_cutouts(tile, 64, 0.5, wcs)
    coords = overlap_coords((160, 150), 64, 0.5)
    assert len(cuts2) == len(coords)
    # grid covers the edges
    ys = {c[0] for c in coords}
    xs = {c[1] for c in coords}
    assert 160 - 64 in ys and 150 - 64 in xs and 0 in ys and 0 in xs


def test_fits_tile_batcher(tmp_path, wcs):
    _write_tile_set(tmp_path, wcs)
    b = FitsTileBatcher(
        [str(tmp_path)], bands=("G", "R", "I"), min_bands=2, img_size=64,
        cutouts_per_tile=40, batch_size=16, shuffle=False,
    )
    batches = list(b)
    assert len(batches) == 2  # 40 // 16
    for batch in batches:
        assert batch["cutouts"].shape == (16, 3, 64, 64)
        assert batch["ra_dec"].shape == (16, 2)
        assert np.isnan(batch["cutouts"][:, 1]).all()  # missing band
        # RA/Dec near the tile center
        assert (np.abs(batch["ra_dec"][:, 1] - 2.2) < 0.1).all()


def test_batcher_overlap_mode(tmp_path, wcs):
    _write_tile_set(tmp_path, wcs)
    b = FitsTileBatcher(
        [str(tmp_path)], bands=("G", "R", "I"), min_bands=2, img_size=64,
        batch_size=4, use_overlap=True, overlap=0.4, shuffle=False,
    )
    batches = list(b)
    n = len(overlap_coords((160, 150), 64, 0.4))
    assert len(batches) == n // 4


@pytest.mark.slow
def test_sky_search_fits_bank_and_multi(tmp_path, wcs):
    """sky_sim_search.py survey-scale surface over a real FITS tile stream:
    --bank builds once / reuses on the next call, and the one-pass
    multi-target search returns per-group results (VERDICT r3 #8)."""
    import sys
    from types import SimpleNamespace

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from sky_sim_search import _parse_target_groups, bank_sky_search

    from sky_embeddings_tpu.eval.simsearch import mim_simsearch_multi
    from sky_embeddings_tpu.models.mim import SkyMIM

    groups, multi = _parse_target_groups("[[1,2],[5,6]]")
    assert multi and groups == [[1, 2], [5, 6]]
    groups1, multi1 = _parse_target_groups("[1,2]")
    assert not multi1 and groups1 == [[1, 2]]

    _write_tile_set(tmp_path, wcs)

    def fresh_batcher():
        return FitsTileBatcher(
            [str(tmp_path)], bands=("G", "R", "I"), min_bands=2, img_size=64,
            batch_size=4, use_overlap=True, overlap=0.4, shuffle=False,
        )

    model = SkyMIM(
        img_size=64, patch_size=16, in_chans=3, embed_dim=32, depth=1,
        num_heads=4, decoder_embed_dim=16, decoder_depth=1,
        decoder_num_heads=2, simmim=True,
    )
    imgs0 = jnp.zeros((1, 3, 64, 64), jnp.float32)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), imgs0, mask=jnp.zeros_like(imgs0)
    )

    rng = np.random.default_rng(9)
    target_latents = [
        np.asarray(model.apply(
            variables,
            jnp.asarray(rng.normal(size=(5, 3, 64, 64)).astype(np.float32)),
            method=SkyMIM.encode,
        )[0])
        for _ in range(2)
    ]

    # --bank: first call builds the bank from the FITS sweep
    args = SimpleNamespace(cls_token="False", max_pool="True", n_save=6)
    bank_path = str(tmp_path / "sky_bank.h5")
    results = bank_sky_search(
        model, variables, target_latents, fresh_batcher(), bank_path, args,
    )
    assert os.path.exists(bank_path)
    assert len(results) == 2
    for ra_decs, scores, feats in results:
        assert ra_decs.shape == (6, 2) and scores.shape == (6,)
        assert feats.shape[0] == 6
        assert np.all(np.diff(scores) <= 1e-6)  # best-first
        assert np.isfinite(scores).all()

    # second call answers from the saved bank (stream exhausted on purpose)
    results2 = bank_sky_search(
        model, variables, target_latents, iter(()), bank_path, args,
    )
    for (ra1, s1, _), (ra2, s2, _) in zip(results, results2):
        np.testing.assert_allclose(s2, s1, atol=1e-5)
        np.testing.assert_allclose(ra2, ra1, atol=1e-6)

    # streaming multi-target over the same FITS stream: per-group winners
    multi_results = mim_simsearch_multi(
        model, variables, target_latents, fresh_batcher(), n_save=6,
        metric="cosine", combine="min", max_pool=True, log_every=0,
    )
    assert len(multi_results) == 2
    for imgs, latent, ra, scores in multi_results:
        assert imgs.shape == (6, 3, 64, 64) and ra.shape == (6, 2)
        assert scores.shape == (6,) and np.isfinite(scores).all()


def test_extract_group_latents_keeps_per_group_images(tmp_path):
    """Each target group's npz must pair its OWN target images with its
    latents (a shared group-0 image grid mislabels every other group's
    results)."""
    import sys
    from types import SimpleNamespace

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from sky_sim_search import _extract_group_latents

    from sky_embeddings_tpu.data.synthetic import write_synthetic_h5
    from sky_embeddings_tpu.models.mim import SkyMIM

    path = write_synthetic_h5(str(tmp_path / "tgt.h5"), 12, channels=3,
                              img_size=16, nan_band_frac=0.0)
    model = SkyMIM(
        img_size=16, patch_size=4, in_chans=3, embed_dim=32, depth=1,
        num_heads=4, decoder_embed_dim=16, decoder_depth=1,
        decoder_num_heads=2, simmim=True,
    )
    imgs0 = jnp.zeros((1, 3, 16, 16), jnp.float32)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), imgs0, mask=jnp.zeros_like(imgs0)
    )
    args = SimpleNamespace(batch_size=4, augment_targets="False")
    groups = [[0, 1], [5, 6, 7]]
    latents, group_images = _extract_group_latents(
        model, variables, path, groups, 16, args,
    )
    assert len(latents) == 2 and len(group_images) == 2
    assert group_images[0].shape[0] == 2 and group_images[1].shape[0] == 3
    import h5py
    with h5py.File(path, "r") as f:
        raw = f["cutouts"][:]
    np.testing.assert_allclose(
        np.asarray(group_images[1]), np.clip(raw[[5, 6, 7]], -3.0, None),
        atol=1e-6,
    )
