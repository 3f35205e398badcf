"""Sky-position (RA/Dec) encoders.

A closed-form real spherical-harmonics basis over the celestial sphere feeds a
small neural head (SIREN sine-MLP, residual FCNet, or plain linear). Same
capability as the reference ``utils/location_encoder.py`` (itself derived from
the public location-encoder literature), re-implemented as pure-functional
flax modules with the basis unrolled at trace time (degree is static, so XLA
sees a fixed fused expression — no Python-level recursion at runtime).

Conventions (reference ``location_encoder.py:190-207``):
* inputs are (ra, dec) in degrees; phi = deg2rad(ra), theta = deg2rad(dec+90)
* output channel order is (l, m) for l in 0..L-1, m in -l..l  →  L² channels
* real SH with Condon-Shortley phase folded into the Legendre recurrence.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


# --------------------------------------------------------------------------
# Real spherical harmonics (closed form, static degree)
# --------------------------------------------------------------------------

def _assoc_legendre(l: int, m: int, x: jnp.ndarray) -> jnp.ndarray:
    """Associated Legendre polynomial P_l^m(x), m >= 0, Condon-Shortley phase.

    Standard stable recurrence: seed P_m^m, step to P_{m+1}^m, then raise l.
    l and m are Python ints (static), so this unrolls into a fixed expression.
    """
    pmm = jnp.ones_like(x)
    if m > 0:
        somx2 = jnp.sqrt((1.0 - x) * (1.0 + x))
        fact = 1.0
        for _ in range(m):
            pmm = pmm * (-fact) * somx2
            fact += 2.0
    if l == m:
        return pmm
    pmmp1 = x * (2.0 * m + 1.0) * pmm
    if l == m + 1:
        return pmmp1
    for ll in range(m + 2, l + 1):
        pll = ((2.0 * ll - 1.0) * x * pmmp1 - (ll + m - 1.0) * pmm) / (ll - m)
        pmm, pmmp1 = pmmp1, pll
    return pmmp1


def _sh_norm(l: int, m: int) -> float:
    return math.sqrt(
        (2.0 * l + 1.0) * math.factorial(l - m) / (4.0 * math.pi * math.factorial(l + m))
    )


def real_spherical_harmonics(ra_dec_deg: jnp.ndarray, degree: int) -> jnp.ndarray:
    """Real SH basis of (..., 2) RA/Dec degrees -> (..., degree²) features."""
    ra = ra_dec_deg[..., 0]
    dec = ra_dec_deg[..., 1]
    phi = jnp.deg2rad(ra)
    theta = jnp.deg2rad(dec + 90.0)
    cos_theta = jnp.cos(theta)

    feats = []
    for l in range(degree):
        for m in range(-l, l + 1):
            am = abs(m)
            plm = _assoc_legendre(l, am, cos_theta)
            if m == 0:
                y = _sh_norm(l, 0) * plm
            elif m > 0:
                y = math.sqrt(2.0) * _sh_norm(l, m) * jnp.cos(m * phi) * plm
            else:
                y = math.sqrt(2.0) * _sh_norm(l, am) * jnp.sin(am * phi) * plm
            feats.append(y)
    return jnp.stack(feats, axis=-1)


# --------------------------------------------------------------------------
# Neural heads
# --------------------------------------------------------------------------

def _siren_uniform(scale_fn: Callable[[int], float]) -> Callable:
    """Uniform(-w_std, w_std) initializer with w_std a function of fan-in."""

    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[0] if len(shape) == 2 else shape[-1]
        w_std = scale_fn(fan_in)
        return jax.random.uniform(key, shape, dtype, minval=-w_std, maxval=w_std)

    return init


class SirenLayer(nn.Module):
    """One sine-activated layer: sin(w0 · (Wx + b)).

    Init follows the SIREN paper: first layer U(±1/fan_in), later layers
    U(±sqrt(c/fan_in)/w0) (reference ``location_encoder.py:40-47``).
    """

    features: int
    w0: float = 1.0
    c: float = 6.0
    is_first: bool = False
    use_bias: bool = True
    linear_out: bool = False  # skip the sine (used for the output layer)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.is_first:
            scale = lambda fan_in: 1.0 / fan_in
        else:
            scale = lambda fan_in: math.sqrt(self.c / fan_in) / self.w0
        y = nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=_siren_uniform(scale),
            bias_init=_siren_uniform(scale),
        )(x)
        return y if self.linear_out else jnp.sin(self.w0 * y)


class SirenNet(nn.Module):
    """SIREN MLP: ``num_layers`` sine layers + linear output (siren-init)."""

    hidden_dim: int
    out_dim: int
    num_layers: int = 1
    w0: float = 1.0
    w0_initial: float = 30.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(self.num_layers):
            x = SirenLayer(
                self.hidden_dim,
                w0=self.w0_initial if i == 0 else self.w0,
                is_first=(i == 0),
            )(x)
        return SirenLayer(self.out_dim, w0=self.w0, linear_out=True)(x)


class ResBlock(nn.Module):
    """Residual MLP block from the GeoPrior FCNet (reference ``:101-119``)."""

    features: int
    dropout_rate: float = 0.5

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        y = nn.relu(nn.Dense(self.features)(x))
        y = nn.Dropout(self.dropout_rate, deterministic=deterministic)(y)
        y = nn.relu(nn.Dense(self.features)(y))
        return x + y


class FCNet(nn.Module):
    """GeoPrior residual MLP head (reference ``location_encoder.py:121-137``)."""

    hidden_dim: int
    out_dim: int
    num_blocks: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = nn.relu(nn.Dense(self.hidden_dim)(x))
        for _ in range(self.num_blocks):
            x = ResBlock(self.hidden_dim)(x, deterministic=deterministic)
        return nn.Dense(self.out_dim, use_bias=False)(x)


class LocationEncoder(nn.Module):
    """RA/Dec (degrees) -> embedding. SH basis + configurable neural head.

    Defaults used by the models (reference ``mim_vit.py:211-215``):
    ``head='siren', degree=5, hidden_dim=8, num_layers=1``.
    """

    out_dim: int
    degree: int = 5
    head: str = "siren"  # 'siren' | 'fcnet' | 'linear'
    hidden_dim: int = 8
    num_layers: int = 1

    @nn.compact
    def __call__(self, ra_dec_deg: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        basis = real_spherical_harmonics(ra_dec_deg, self.degree)
        if self.head == "siren":
            return SirenNet(self.hidden_dim, self.out_dim, num_layers=self.num_layers)(basis)
        if self.head == "fcnet":
            return FCNet(self.hidden_dim, self.out_dim)(basis, deterministic=deterministic)
        if self.head == "linear":
            return nn.Dense(self.out_dim)(basis)
        raise ValueError(f"unknown location-encoder head: {self.head!r}")


def normalize_ra_dec(ra_dec: jnp.ndarray) -> jnp.ndarray:
    """Scale RA [0,360] and Dec [-90,90] to [-1,1] (reference ``mim_vit.py:532-550``)."""
    ra = ra_dec[..., 0] / 180.0 - 1.0
    dec = ra_dec[..., 1] / 90.0
    return jnp.stack([ra, dec], axis=-1)
