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
