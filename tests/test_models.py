"""Model-level forward tests for SkyMIM and SkyViT (tiny geometries)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sky_embeddings_tpu.configuration import Config
from sky_embeddings_tpu.models.mim import SkyMIM, build_mim_model
from sky_embeddings_tpu.models.predictor import SkyViT, build_predictor_model
from sky_embeddings_tpu.ops.masking import simmim_batch_mask

TINY = dict(
    img_size=16,
    patch_size=4,
    in_chans=3,
    embed_dim=32,
    depth=2,
    num_heads=4,
    decoder_embed_dim=16,
    decoder_depth=1,
    decoder_num_heads=2,
)


def _imgs(B=2, C=3, S=16, seed=0, with_nan=True):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(B, C, S, S)).astype(np.float32)
    if with_nan:
        x[0, 1] = np.nan  # a fully-missing band
    return jnp.asarray(x)


@pytest.mark.slow
def test_simmim_forward():
    model = SkyMIM(simmim=True, norm_pix_loss=True, loss_fn="l1", **TINY)
    imgs = _imgs()
    mask = simmim_batch_mask(jax.random.PRNGKey(1), 2, 3, 16, 4, 0.9)
    variables = model.init(jax.random.PRNGKey(0), imgs, mask=mask)
    loss, pred, out_mask = model.apply(variables, imgs, mask=mask)
    assert pred.shape == imgs.shape
    assert np.isfinite(float(loss))
    np.testing.assert_array_equal(np.asarray(out_mask), np.asarray(mask))


def test_simmim_forward_rectangular_geometry():
    """grid_size != patch_size (img 32 / p4: 8×8 grid of 4px patches) — the
    pixel-shuffle upsample must be the encoder stride, not the grid size
    (regression: both were 8 at the flagship 64/p8 geometry, masking it)."""
    model = SkyMIM(simmim=True, norm_pix_loss=True, loss_fn="l1",
                   **{**TINY, "img_size": 32})
    imgs = _imgs(S=32)
    mask = simmim_batch_mask(jax.random.PRNGKey(1), 2, 3, 32, 4, 0.9)
    variables = model.init(jax.random.PRNGKey(0), imgs, mask=mask)
    loss, pred, _ = model.apply(variables, imgs, mask=mask)
    assert pred.shape == imgs.shape
    assert np.isfinite(float(loss))


def test_simmim_attn_pool_forward():
    model = SkyMIM(simmim=True, attn_pool=True, **TINY)
    imgs = _imgs()
    mask = simmim_batch_mask(jax.random.PRNGKey(1), 2, 3, 16, 4, 0.9)
    variables = model.init(jax.random.PRNGKey(0), imgs, mask=mask)
    loss, pred, _ = model.apply(variables, imgs, mask=mask)
    assert pred.shape == imgs.shape
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_mae_forward():
    model = SkyMIM(simmim=False, mask_ratio=0.75, loss_fn="mse", **TINY)
    imgs = _imgs(with_nan=False)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)}, imgs
    )
    loss, pred, mask = model.apply(variables, imgs, rngs={"mask": jax.random.PRNGKey(2)})
    L = (16 // 4) ** 2
    assert pred.shape == (2, L, 4 * 4 * 3)
    assert mask.shape == (2, L)
    np.testing.assert_array_equal(np.asarray(mask).sum(axis=1), int(L * 0.75))
    assert np.isfinite(float(loss))


def test_mae_with_ra_dec():
    model = SkyMIM(simmim=False, ra_dec=True, **TINY)
    imgs = _imgs(with_nan=False)
    ra_dec = jnp.asarray([[120.0, 30.0], [10.0, -5.0]])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
        imgs, ra_dec=ra_dec,
    )
    loss, _, _ = model.apply(variables, imgs, ra_dec=ra_dec, rngs={"mask": jax.random.PRNGKey(2)})
    assert np.isfinite(float(loss))


def test_encode_is_deterministic_and_nan_free():
    model = SkyMIM(simmim=True, **TINY)
    imgs = _imgs()
    mask = jnp.zeros_like(imgs)
    variables = model.init(jax.random.PRNGKey(0), imgs, mask=mask)
    t1, _, _ = model.apply(variables, imgs, method=SkyMIM.encode)
    t2, _, _ = model.apply(variables, imgs, method=SkyMIM.encode)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    assert np.isfinite(np.asarray(t1)).all()
    n_extra = 1
    assert t1.shape == (2, n_extra + 16, 32)


def test_nan_fill_uses_patch_mask_values():
    model = SkyMIM(simmim=True, **TINY)
    imgs = _imgs(with_nan=True)
    mask = jnp.zeros_like(imgs)
    variables = model.init(jax.random.PRNGKey(0), imgs, mask=mask)
    # with patch_mask_values == 0 (init), a NaN channel behaves like zeros
    loss1, _, _ = model.apply(variables, imgs, mask=jnp.ones_like(imgs) * 0)
    assert np.isfinite(float(loss1))


def test_predictor_forward_all_pools():
    for pool in ("avg", "token", "map"):
        model = SkyViT(
            img_size=16, patch_size=4, in_chans=3, embed_dim=32, depth=2,
            num_heads=4, num_labels=3, global_pool=pool,
        )
        imgs = _imgs()
        variables = model.init(jax.random.PRNGKey(0), imgs)
        out = model.apply(variables, imgs)
        assert out.shape == (2, 3)
        assert np.isfinite(np.asarray(out)).all(), pool


def test_predictor_label_normalization():
    model = SkyViT(label_means=(0.64,), label_stds=(0.32,), num_labels=1)
    labels = jnp.asarray([[0.64], [0.96]])
    normed = model.normalize_labels(labels)
    np.testing.assert_allclose(np.asarray(normed), [[0.0], [1.0]], atol=1e-6)
    back = model.denormalize_labels(normed)
    np.testing.assert_allclose(np.asarray(back), np.asarray(labels), atol=1e-6)


def _mim_config(model_type="simmim", **over):
    arch = dict(
        img_size=16, num_channels=3, pixel_mean=0.0, pixel_std=1.0,
        embed_dim=48, patch_size=4, model_type=model_type,
    )
    arch.update(over)
    return Config.from_dict({
        "DATA": {},
        "TRAINING": dict(
            batch_size=4, total_batch_iters="100.0", max_mask_ratio=0.9,
            mask_ratio=0.75, norm_pix_loss=True, weight_decay=0.05,
            init_lr=1e-4, final_lr_factor=1e4, loss_fn="L1",
        ),
        "ARCHITECTURE": arch,
    }, name="test_mim")


def test_build_mim_from_config():
    model = build_mim_model(_mim_config())
    assert model.simmim and model.depth == 12 and model.loss_fn == "l1"
    model = build_mim_model(_mim_config(model_type="mimlarge"))
    assert model.depth == 24 and model.num_heads == 16
    model = build_mim_model(_mim_config(model_type="maesimple"))
    assert not model.simmim and model.decoder_depth == 1
    with pytest.raises(ValueError):
        build_mim_model(_mim_config(model_type="nope"))


def test_build_predictor_from_config():
    mae_cfg = _mim_config()
    cfg = Config.from_dict({
        "DATA": dict(label_keys="['zspec']", label_means="[0.64]", label_stds="[0.64]"),
        "TRAINING": dict(
            train_method="ft", pretained_mae="test_mim", num_train=-1,
            batch_size=8, total_batch_iters=100, layer_decay=0.5,
            weight_decay=0.01, init_lr=1e-6, final_lr_factor=1e3,
            augment=False, use_label_errs=False, loss_fn="mse",
        ),
        "ARCHITECTURE": dict(img_size=16, global_pool="map", dropout=0.0),
    }, name="test_pred")
    model = build_predictor_model(cfg, mae_cfg)
    assert model.num_labels == 1 and model.global_pool == "map"
    assert model.label_means == (0.64,)
    assert cfg.pretrained_mae_name() == "test_mim"


@pytest.mark.slow
def test_mae_decoder_stash_knob_parity():
    """``stash_decoder=False`` (recompute backward in the MAE decoder — the
    memory lever that makes B=2048 fit, BASELINE.md r4) must not change the
    loss or gradients; the stash only changes the backward's data source."""
    kw = dict(TINY, simmim=False, mask_ratio=0.5, dtype=jnp.float32)
    imgs = _imgs(with_nan=False)
    key = jax.random.PRNGKey(0)
    noise = jax.random.uniform(key, (2, (16 // 4) ** 2))

    def loss_and_grads(stash_decoder):
        m = SkyMIM(**kw, stash_decoder=stash_decoder)
        params = jax.jit(m.init)(key, imgs, mae_noise=noise)["params"]

        def f(p):
            loss, _, _ = m.apply({"params": p}, imgs, mae_noise=noise)
            return loss

        return jax.value_and_grad(f)(params)

    l1, g1 = loss_and_grads(True)
    l2, g2 = loss_and_grads(False)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_mae_pack_tokens_matches_unpacked():
    """pack_tokens=2 (two samples share one encoder sequence under the
    block-diagonal attention mask) must reproduce the unpacked model's loss,
    prediction and gradients exactly — packing is a layout change, not a
    model change (models/mim.py encode; ops/kernels/attn_block._seg_bias)."""
    kw = dict(TINY, simmim=False, mask_ratio=0.5, dtype=jnp.float32)
    imgs = _imgs(B=2, with_nan=False, seed=3)
    key = jax.random.PRNGKey(0)
    noise = jax.random.uniform(key, (2, (16 // 4) ** 2))

    def run(pack):
        m = SkyMIM(**kw, pack_tokens=pack)
        params = jax.jit(m.init)(key, imgs, mae_noise=noise)["params"]

        def f(p):
            loss, pred, _ = m.apply({"params": p}, imgs, mae_noise=noise)
            return loss, pred

        (loss, pred), grads = jax.value_and_grad(f, has_aux=True)(params)
        return loss, pred, grads

    l1, p1, g1 = run(1)
    l2, p2, g2 = run(2)
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p1), atol=1e-5)
    flat1 = jax.tree_util.tree_leaves_with_path(g1)
    flat2 = jax.tree_util.tree_leaves_with_path(g2)
    for (k1, a), (_, b) in zip(flat1, flat2):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=1e-5, rtol=1e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(k1)}",
        )
    # packing must not engage on the unmasked (inference/latent) path
    m = SkyMIM(**kw, pack_tokens=2)
    params = jax.jit(m.init)(key, imgs, mae_noise=noise)["params"]
    t_packed, _, _ = m.apply({"params": params}, imgs, method=SkyMIM.encode)
    m1 = SkyMIM(**kw, pack_tokens=1)
    t_ref, _, _ = m1.apply({"params": params}, imgs, method=SkyMIM.encode)
    np.testing.assert_allclose(np.asarray(t_packed), np.asarray(t_ref), atol=0)
