"""Masking invariants and NaN-aware loss semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from sky_embeddings_tpu.models.layers import patchify, unpatchify
from sky_embeddings_tpu.ops.losses import (
    masked_recon_loss,
    normalize_patches,
    patch_mean_and_var,
)
from sky_embeddings_tpu.ops.masking import (
    mae_random_masking,
    mae_unshuffle,
    simmim_batch_mask,
    upsample_patch_mask,
)


def test_patchify_roundtrip():
    rng = np.random.default_rng(0)
    imgs = rng.normal(size=(3, 5, 16, 16)).astype(np.float32)
    x = patchify(jnp.asarray(imgs), 4)
    assert x.shape == (3, 16, 4 * 4 * 5)
    back = unpatchify(x, 4, 5)
    np.testing.assert_allclose(np.asarray(back), imgs, atol=1e-6)


def test_patchify_flatten_order():
    # patch flatten order must be (ph, pw, c): build an image whose value
    # encodes (c, y, x) and check the first patch's layout.
    C, H, W, p = 2, 4, 4, 2
    img = np.zeros((1, C, H, W), np.float32)
    for c in range(C):
        for y in range(H):
            for x in range(W):
                img[0, c, y, x] = c + 10 * y + 100 * x
    patches = np.asarray(patchify(jnp.asarray(img), p))
    first = patches[0, 0]  # top-left patch
    want = [c + 10 * y + 100 * x for y in range(p) for x in range(p) for c in range(C)]
    np.testing.assert_array_equal(first, want)


def test_simmim_mask_counts_per_channel():
    key = jax.random.PRNGKey(0)
    B, C, S, P = 8, 3, 32, 4
    mask = np.asarray(simmim_batch_mask(key, B, C, S, P, max_mask_ratio=0.9))
    assert mask.shape == (B, C, S, S)
    assert set(np.unique(mask)) <= {0.0, 1.0}
    g = S // P
    patch = mask.reshape(B, C, g, P, g, P)
    # mask is constant within each patch
    assert (patch.min(axis=(3, 5)) == patch.max(axis=(3, 5))).all()
    counts = patch[:, :, :, 0, :, 0].sum(axis=(2, 3))
    # same masked-patch count in every channel of a sample
    assert (counts == counts[:, :1]).all()
    # counts bounded by ceil(0.9 * G^2)
    assert counts.max() <= np.ceil(0.9 * g * g)


def test_simmim_mask_ratio_distribution():
    key = jax.random.PRNGKey(1)
    mask = np.asarray(simmim_batch_mask(key, 256, 1, 32, 4, max_mask_ratio=0.8))
    ratios = mask.mean(axis=(1, 2, 3))
    # ratios approx U(0, 0.8): mean ~0.4
    assert 0.3 < ratios.mean() < 0.5
    # ceil() can overshoot max_mask_ratio by at most one patch
    assert ratios.max() <= 0.8 + 1.0 / 64 + 1e-6


def test_upsample_patch_mask():
    m = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    up = np.asarray(upsample_patch_mask(m, 2))
    want = np.kron(np.asarray(m), np.ones((2, 2)))
    np.testing.assert_array_equal(up, want)


def test_mae_masking_invariants():
    key = jax.random.PRNGKey(0)
    B, L, D = 4, 16, 8
    tokens = jnp.arange(B * L * D, dtype=jnp.float32).reshape(B, L, D)
    kept, mask, ids_restore = mae_random_masking(key, tokens, mask_ratio=0.75)
    assert kept.shape == (B, 4, D)
    assert mask.shape == (B, L)
    # exactly L - len_keep masked per sample
    np.testing.assert_array_equal(np.asarray(mask).sum(axis=1), L - 4)
    # ids_restore is a permutation
    assert (np.sort(np.asarray(ids_restore), axis=1) == np.arange(L)).all()
    # kept tokens are real rows of the input
    tok_np = np.asarray(tokens)
    for b in range(B):
        for row in np.asarray(kept)[b]:
            assert any((tok_np[b] == row).all(axis=-1))


def test_mae_unshuffle_restores_positions():
    key = jax.random.PRNGKey(3)
    B, L, D = 2, 16, 4
    # tokens whose value identifies their original position
    tokens = jnp.broadcast_to(
        jnp.arange(L, dtype=jnp.float32)[None, :, None], (B, L, D)
    )
    kept, mask, ids_restore = mae_random_masking(key, tokens, 0.5)
    mask_token = jnp.full((1, 1, D), -1.0)
    restored = np.asarray(mae_unshuffle(kept, mask_token, ids_restore))
    m = np.asarray(mask)
    for b in range(B):
        for i in range(L):
            if m[b, i] == 0:
                np.testing.assert_allclose(restored[b, i], i)
            else:
                np.testing.assert_allclose(restored[b, i], -1.0)


def test_patch_mean_and_var_nan_aware():
    x = jnp.asarray([[1.0, 2.0, 3.0, jnp.nan]])
    mean, var = patch_mean_and_var(x)
    np.testing.assert_allclose(np.asarray(mean), [[2.0]], atol=1e-6)
    np.testing.assert_allclose(np.asarray(var), [[2.0 / 3.0]], atol=1e-6)


def test_normalize_patches_matches_plain_when_no_nan():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(4, 7)).astype(np.float32)
    out = np.asarray(normalize_patches(jnp.asarray(x)))
    mean = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    want = (x - mean) / np.sqrt(var + 1e-6)
    np.testing.assert_allclose(out, want, atol=1e-5)


def test_masked_loss_is_masked_mean():
    target = jnp.asarray([[1.0, 2.0], [3.0, 4.0]])
    pred = jnp.zeros((2, 2))
    mask = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    loss = float(masked_recon_loss(target, pred, mask, "l1"))
    np.testing.assert_allclose(loss, (1.0 + 4.0) / (2 + 1e-5), rtol=1e-6)


def test_masked_loss_ignores_nan_targets():
    target = jnp.asarray([[jnp.nan, 2.0, 4.0]])
    pred = jnp.zeros((1, 3))
    mask = jnp.ones((1, 3))
    loss = float(masked_recon_loss(target, pred, mask, "mse"))
    np.testing.assert_allclose(loss, (4.0 + 16.0) / (2 + 1e-5), rtol=1e-6)


def test_masked_loss_broadcast_mask():
    # MAE shape: target (B, L, p2c), mask (B, L)
    target = jnp.ones((2, 3, 4))
    pred = jnp.zeros((2, 3, 4))
    mask = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 0.0, 0.0]])
    loss = float(masked_recon_loss(target, pred, mask, "l1"))
    np.testing.assert_allclose(loss, 4.0 / (4 + 1e-5), rtol=1e-6)


def test_host_mask_generator_parity():
    """Host MaskGenerator must match the device generator's distribution
    contract: same count per channel, patch-constant, ceil(ratio*G²) bound."""
    import numpy as np
    from sky_embeddings_tpu.data.mask_generator import MaskGenerator

    gen = MaskGenerator(input_size=32, patch_size=4, max_mask_ratio=0.9,
                        num_mask_chans=3, rng=np.random.default_rng(0))
    g = 8
    for _ in range(10):
        m = gen()
        assert m.shape == (3, 32, 32)
        patch = m.reshape(3, g, 4, g, 4)
        assert (patch.min(axis=(2, 4)) == patch.max(axis=(2, 4))).all()
        counts = patch[:, :, 0, :, 0].sum(axis=(1, 2))
        assert (counts == counts[0]).all()
        assert counts[0] <= np.ceil(0.9 * g * g)

    single = MaskGenerator(input_size=16, patch_size=4, num_mask_chans=1,
                           rng=np.random.default_rng(1))()
    assert single.shape == (16, 16)
