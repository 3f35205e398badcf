"""Positional-embedding tests against an independent closed-form oracle.

The oracle reimplements the published MAE sin-cos recipe directly from its
definition (independent code path from the library implementation)."""

import numpy as np
import pytest

from sky_embeddings_tpu.models.pos_embed import (
    central_crop_grid,
    interpolate_grid,
    sincos_pos_embed_1d,
    sincos_pos_embed_2d,
)


def oracle_2d(embed_dim, grid_size):
    """Reference math: token t=(r,c); first half encodes c, second half r;
    each half is [sin | cos] over frequencies 10000^(-2i/d_half)."""
    d_half = embed_dim // 2
    d_q = d_half // 2
    omega = 1.0 / 10000 ** (np.arange(d_q) / d_q)
    out = np.zeros((grid_size * grid_size, embed_dim))
    for r in range(grid_size):
        for c in range(grid_size):
            t = r * grid_size + c
            out[t, :d_q] = np.sin(c * omega)
            out[t, d_q : 2 * d_q] = np.cos(c * omega)
            out[t, 2 * d_q : 2 * d_q + d_q] = np.sin(r * omega)
            out[t, 3 * d_q :] = np.cos(r * omega)
    return out


@pytest.mark.parametrize("embed_dim,grid", [(8, 4), (64, 8), (768, 8)])
def test_sincos_2d_matches_oracle(embed_dim, grid):
    got = sincos_pos_embed_2d(embed_dim, grid)
    want = oracle_2d(embed_dim, grid)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_prefix_rows_zero():
    table = sincos_pos_embed_2d(16, 4, n_prefix_tokens=2)
    assert table.shape == (2 + 16, 16)
    np.testing.assert_array_equal(table[:2], 0.0)
    assert np.abs(table[2:]).sum() > 0


def test_sincos_1d_shape_and_values():
    table = sincos_pos_embed_1d(8, 5, n_prefix_tokens=1)
    assert table.shape == (6, 8)
    # position 0: sin=0, cos=1
    np.testing.assert_allclose(table[1, :4], 0.0, atol=1e-7)
    np.testing.assert_allclose(table[1, 4:], 1.0, atol=1e-7)


def test_interpolate_identity():
    table = sincos_pos_embed_2d(32, 8, n_prefix_tokens=1)
    out = np.asarray(interpolate_grid(table, 8, 1))
    np.testing.assert_allclose(out, table, atol=1e-6)


def test_interpolate_resizes():
    table = sincos_pos_embed_2d(32, 8, n_prefix_tokens=2)
    out = np.asarray(interpolate_grid(table, 4, 2))
    assert out.shape == (2 + 16, 32)
    np.testing.assert_allclose(out[:2], table[:2], atol=1e-6)


def test_central_crop():
    table = sincos_pos_embed_2d(16, 6, n_prefix_tokens=1)
    out = np.asarray(central_crop_grid(table, 2, 1))
    assert out.shape == (1 + 4, 16)
    grid = table[1:].reshape(6, 6, 16)
    want = grid[2:4, 2:4].reshape(4, 16)
    np.testing.assert_allclose(out[1:], want, atol=1e-6)
