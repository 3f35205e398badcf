"""Location-encoder tests: spherical harmonics validated against scipy."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.special

from sky_embeddings_tpu.models.location import (
    LocationEncoder,
    SirenNet,
    normalize_ra_dec,
    real_spherical_harmonics,
)


def scipy_real_sh(l, m, phi, theta):
    """Real spherical harmonics from scipy's complex ones.

    Y_lm real convention: m>0 -> sqrt(2)(-1)^m Re(Y_l^m); m<0 ->
    sqrt(2)(-1)^m Im(Y_l^|m|); m=0 -> Y_l^0. The Condon-Shortley phase is in
    scipy's definition; the closed-form recurrence used by the encoder also
    includes it, giving sqrt(2)·K·cos(mφ)·P_l^m directly (without the extra
    (-1)^m) — i.e. the 'geodesy' convention without phase removal.
    """
    # scipy.special.sph_harm_y(l, m, theta, phi): theta polar, phi azimuth
    if m == 0:
        return np.real(scipy.special.sph_harm_y(l, 0, theta, phi))
    if m > 0:
        # closed form: sqrt2 * K(l,m) * cos(m phi) * P_l^m(cos theta)
        # scipy: Y_l^m = K * e^{im phi} * P_l^m  -> Re = K cos(m phi) P_l^m
        return math.sqrt(2.0) * np.real(scipy.special.sph_harm_y(l, m, theta, phi))
    am = -m
    return math.sqrt(2.0) * np.imag(scipy.special.sph_harm_y(l, am, theta, phi))


@pytest.mark.parametrize("degree", [1, 3, 5])
def test_sh_matches_scipy(degree):
    rng = np.random.default_rng(1)
    ra = rng.uniform(0, 360, size=32)
    dec = rng.uniform(-90, 90, size=32)
    ra_dec = np.stack([ra, dec], axis=-1).astype(np.float32)

    got = np.asarray(real_spherical_harmonics(jnp.asarray(ra_dec), degree))
    assert got.shape == (32, degree * degree)

    phi = np.deg2rad(ra)
    theta = np.deg2rad(dec + 90.0)
    idx = 0
    for l in range(degree):
        for m in range(-l, l + 1):
            want = scipy_real_sh(l, m, phi, theta)
            np.testing.assert_allclose(got[:, idx], want, atol=2e-4, err_msg=f"l={l} m={m}")
            idx += 1


def test_sh_y00_constant():
    ra_dec = jnp.asarray([[10.0, 20.0], [200.0, -45.0]])
    out = real_spherical_harmonics(ra_dec, 1)
    np.testing.assert_allclose(out, 1.0 / math.sqrt(4 * math.pi), atol=1e-6)


def test_siren_shapes_and_init_range():
    net = SirenNet(hidden_dim=8, out_dim=16, num_layers=1)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((4, 25)))
    y = net.apply(params, jnp.ones((4, 25)))
    assert y.shape == (4, 16)
    # first layer init bounded by 1/fan_in
    w0 = params["params"]["SirenLayer_0"]["Dense_0"]["kernel"]
    assert np.abs(w0).max() <= 1.0 / 25 + 1e-6


@pytest.mark.parametrize("head", ["siren", "fcnet", "linear"])
def test_location_encoder_heads(head):
    enc = LocationEncoder(out_dim=32, degree=5, head=head)
    ra_dec = jnp.asarray([[120.0, 30.0], [10.0, -5.0]])
    params = enc.init(jax.random.PRNGKey(0), ra_dec)
    out = enc.apply(params, ra_dec)
    assert out.shape == (2, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_normalize_ra_dec():
    ra_dec = jnp.asarray([[0.0, -90.0], [360.0, 90.0], [180.0, 0.0]])
    out = np.asarray(normalize_ra_dec(ra_dec))
    np.testing.assert_allclose(out, [[-1, -1], [1, 1], [0, 0]], atol=1e-6)
