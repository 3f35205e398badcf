"""Structured synthetic survey (data/synthetic.make_structured_cutouts).

The generator must plant real semantics — class-separable morphology+color
and redshift-correlated band colors — so the full pretrain→probe→simsearch
loop can be validated end-to-end (the reference proves semantic learning via
its probe protocol on real HSC data, ``utils/pretrain_fns.py:52-159``; this
set is the in-environment stand-in, VERDICT r3 #1).
"""

import numpy as np
import pytest

from sky_embeddings_tpu.data.synthetic import (
    _band_centers,
    _galaxy_sed,
    _qso_sed,
    make_structured_cutouts,
    write_structured_h5,
)


def _crude_features(cutouts):
    """Host-side color + concentration features (no learned model)."""
    cc = np.nan_to_num(cutouts)
    s = cutouts.shape[-1]
    lo, hi = 3 * s // 8, 5 * s // 8
    central = cc[:, :, lo:hi, lo:hi].mean(axis=(2, 3))
    colors = central / (central.mean(axis=1, keepdims=True) + 1e-8)
    core = cc[:, :, s // 2 - 2:s // 2 + 2, s // 2 - 2:s // 2 + 2]
    conc = core.mean(axis=(1, 2, 3)) / (cc[:, :, lo:hi, lo:hi].mean(axis=(1, 2, 3)) + 1e-8)
    return np.concatenate([colors, conc[:, None]], axis=1)


def test_schema_and_balance():
    d = make_structured_cutouts(300, channels=5, img_size=32, seed=0)
    assert d["cutouts"].shape == (300, 5, 32, 32)
    assert d["cutouts"].dtype == np.float32
    for k in ("ra", "dec", "zspec", "zspec_err", "class"):
        assert d[k].shape == (300,)
    counts = np.bincount(d["class"], minlength=3)
    assert counts.min() >= 90  # ~balanced thirds
    # stars (class 2) carry zspec = 0; others span the z range
    z, y = d["zspec"], d["class"]
    assert np.all(z[y == 2] == 0.0)
    assert z[y == 0].max() > 1.2 and z[y == 0].min() < 0.3
    # classes are shuffled, not block-ordered
    assert len(np.unique(y[:30])) > 1


def test_nan_bands_and_snr_spread():
    d = make_structured_cutouts(400, channels=5, img_size=32, seed=1,
                                nan_band_frac=0.1)
    c = d["cutouts"]
    band_nan = np.isnan(c).all(axis=(2, 3))  # whole-band drops only
    per_pixel_nan = np.isnan(c).any(axis=(2, 3))
    np.testing.assert_array_equal(band_nan, per_pixel_nan)
    assert 0.05 < band_nan.mean() < 0.2
    # realistic spread of central S/N (some sources sink into the noise)
    s = c.shape[-1]
    cen = np.nanmean(c[:, :, s // 2 - 4:s // 2 + 4, s // 2 - 4:s // 2 + 4], axis=(2, 3))
    ring = np.nanstd(c[:, :, :s // 4, :s // 4], axis=(2, 3))
    with np.errstate(invalid="ignore"):
        snr = np.nanmin(cen / (ring + 1e-8), axis=1)
    assert np.nanpercentile(snr, 10) < 2.0 < np.nanpercentile(snr, 75)


def test_sed_redshift_monotonicity():
    """The galaxy break marches redward: at fixed observed band, flux in the
    bluest band falls as z rises (the break crosses it); QSO colors change
    too. This is the photo-z signal the probe R2 must find."""
    lam = _band_centers(5)
    z_lo, z_hi = 0.1, 1.4
    g_lo = _galaxy_sed(lam / (1 + z_lo))
    g_hi = _galaxy_sed(lam / (1 + z_hi))
    # normalized blue-to-red color hardens with z
    assert (g_lo[0] / g_lo[-1]) > (g_hi[0] / g_hi[-1]) * 1.5
    q_lo = _qso_sed(lam / (1 + z_lo))
    q_hi = _qso_sed(lam / (1 + z_hi))
    assert not np.allclose(q_lo / q_lo.sum(), q_hi / q_hi.sum(), atol=0.02)


def test_classes_separable_and_z_predictable():
    """Crude host-side features must already separate classes well above
    chance and carry z signal — the floor a learned embedding has to beat."""
    from sklearn.linear_model import LogisticRegression, Ridge
    from sklearn.preprocessing import StandardScaler

    d = make_structured_cutouts(900, channels=5, img_size=32, seed=2,
                                nan_band_frac=0.0)
    X = StandardScaler().fit_transform(_crude_features(d["cutouts"]))
    y, z = d["class"], d["zspec"]
    n_tr = 700
    acc = LogisticRegression(max_iter=2000).fit(X[:n_tr], y[:n_tr]).score(
        X[n_tr:], y[n_tr:])
    assert acc > 0.55, f"3-class accuracy {acc} barely above chance"
    gal = y != 2  # z defined for galaxies+QSOs
    r2 = Ridge().fit(X[:n_tr][gal[:n_tr]], z[:n_tr][gal[:n_tr]]).score(
        X[n_tr:][gal[n_tr:]], z[n_tr:][gal[n_tr:]])
    assert r2 > 0.1, f"colors carry no redshift signal (R2={r2})"


def test_write_structured_h5_chunked(tmp_path):
    import h5py

    path = write_structured_h5(
        str(tmp_path / "s.h5"), 50, channels=3, img_size=16, seed=3, chunk=16
    )
    with h5py.File(path, "r") as f:
        assert f["cutouts"].shape == (50, 3, 16, 16)
        assert set(f.keys()) == {"cutouts", "ra", "dec", "zspec", "zspec_err", "class"}
        y = f["class"][:]
    assert np.bincount(y, minlength=3).min() >= 10


def test_class_fracs_filter():
    d = make_structured_cutouts(
        200, channels=3, img_size=16, seed=4, class_fracs=(1.0, 0.0, 0.0)
    )
    assert np.all(d["class"] == 0)
    assert np.all(d["zspec"] > 0)
