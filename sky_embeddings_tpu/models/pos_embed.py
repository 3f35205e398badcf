"""Frozen 2-D sine-cosine positional embeddings and geometry transfer.

Semantics match the reference (``utils/pos_embed.py``): half the channels
encode the row coordinate, half the column coordinate; each half splits into
sin then cos of ``pos * (1/10000^(2i/d))``; prefix tokens (cls and the
optional ra/dec token) get all-zero rows. Computed once on host in float64
numpy and baked into the (non-trainable) parameter tree.

Cross-geometry checkpoint transfer: ``interpolate_grid`` (bicubic resize, the
DeiT recipe, reference ``pos_embed.py:123-144``) and ``central_crop_grid``
(reference ``pos_embed.py:89-115``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _sincos_1d(embed_dim: int, positions: np.ndarray) -> np.ndarray:
    """(M,) positions -> (M, embed_dim) with [sin | cos] halves."""
    if embed_dim % 2 != 0:
        raise ValueError(f"embed_dim must be even, got {embed_dim}")
    half = embed_dim // 2
    freqs = 1.0 / (10000.0 ** (np.arange(half, dtype=np.float64) / half))
    angles = np.outer(positions.reshape(-1).astype(np.float64), freqs)
    return np.concatenate([np.sin(angles), np.cos(angles)], axis=1)


def sincos_pos_embed_1d(embed_dim: int, length: int, n_prefix_tokens: int = 0) -> np.ndarray:
    """1-D sin-cos table: (n_prefix_tokens + length, embed_dim), prefix rows zero."""
    table = _sincos_1d(embed_dim, np.arange(length, dtype=np.float64))
    if n_prefix_tokens:
        table = np.concatenate([np.zeros((n_prefix_tokens, embed_dim)), table], axis=0)
    return table.astype(np.float32)


def sincos_pos_embed_2d(embed_dim: int, grid_size: int, n_prefix_tokens: int = 0) -> np.ndarray:
    """2-D sin-cos table over a square token grid.

    Returns (n_prefix_tokens + grid_size**2, embed_dim). Token order is
    row-major over (row, col); the first ``embed_dim//2`` channels encode the
    row index, the rest the column index (reference ``pos_embed.py:57-65``,
    where ``grid[0]`` is the meshgrid of the fast/column axis fed to the
    *first* half — reproduced here by feeding rows' repeats accordingly).
    """
    if embed_dim % 2 != 0:
        raise ValueError(f"embed_dim must be even, got {embed_dim}")
    coords = np.arange(grid_size, dtype=np.float64)
    # Row-major traversal: for token t = r*G + c, the first half encodes c
    # (the fast axis) and the second half encodes r — matching the reference's
    # meshgrid convention ("w goes first", pos_embed.py:26-32 with grid[0]=w).
    col = np.tile(coords, grid_size)      # c varies fastest
    row = np.repeat(coords, grid_size)    # r varies slowest
    emb_fast = _sincos_1d(embed_dim // 2, col)
    emb_slow = _sincos_1d(embed_dim // 2, row)
    table = np.concatenate([emb_fast, emb_slow], axis=1)
    if n_prefix_tokens:
        table = np.concatenate([np.zeros((n_prefix_tokens, embed_dim)), table], axis=0)
    return table.astype(np.float32)


def interpolate_grid(pos_embed: jnp.ndarray, new_grid_size: int, n_prefix_tokens: int) -> jnp.ndarray:
    """Bicubically resize the grid part of a (1+extra+G², D) pos-embed table.

    Equivalent of the reference's DeiT-style ``interpolate_pos_embed``
    (``pos_embed.py:123-144``) for loading a checkpoint trained at a different
    image size. Prefix-token rows pass through unchanged.
    """
    pos_embed = jnp.asarray(pos_embed)
    squeeze = pos_embed.ndim == 2
    if squeeze:
        pos_embed = pos_embed[None]
    prefix = pos_embed[:, :n_prefix_tokens]
    grid = pos_embed[:, n_prefix_tokens:]
    n_tokens = grid.shape[1]
    old = int(round(n_tokens ** 0.5))
    if old * old != n_tokens:
        raise ValueError(f"pos embed grid is not square: {n_tokens} tokens")
    if old != new_grid_size:
        d = grid.shape[-1]
        grid = grid.reshape(-1, old, old, d)
        grid = jax.image.resize(
            grid, (grid.shape[0], new_grid_size, new_grid_size, d), method="bicubic"
        )
        grid = grid.reshape(-1, new_grid_size * new_grid_size, d)
    out = jnp.concatenate([prefix, grid], axis=1)
    return out[0] if squeeze else out


def central_crop_grid(pos_embed: jnp.ndarray, new_grid_size: int, n_prefix_tokens: int) -> jnp.ndarray:
    """Take the central ``new_grid_size²`` tokens of the grid part
    (reference ``crop_pos_embed``, ``pos_embed.py:89-115``)."""
    pos_embed = jnp.asarray(pos_embed)
    squeeze = pos_embed.ndim == 2
    if squeeze:
        pos_embed = pos_embed[None]
    prefix = pos_embed[:, :n_prefix_tokens]
    grid = pos_embed[:, n_prefix_tokens:]
    n_tokens = grid.shape[1]
    old = int(round(n_tokens ** 0.5))
    if old * old != n_tokens:
        raise ValueError(f"pos embed grid is not square: {n_tokens} tokens")
    if old != new_grid_size:
        if new_grid_size > old:
            raise ValueError("cannot crop to a larger grid")
        start = (old - new_grid_size) // 2
        d = grid.shape[-1]
        grid = grid.reshape(-1, old, old, d)
        grid = grid[:, start : start + new_grid_size, start : start + new_grid_size]
        grid = grid.reshape(-1, new_grid_size * new_grid_size, d)
    out = jnp.concatenate([prefix, grid], axis=1)
    return out[0] if squeeze else out
