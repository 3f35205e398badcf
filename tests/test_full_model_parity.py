"""Full-model golden parity vs independent PyTorch oracles (the BASELINE.json
north star: embedding cosine ≥ 0.999, losses matching).

Flow: build a randomly-initialized torch oracle (reference state-dict
layout), port its weights through ``tools/port_torch_checkpoint`` (the real
porting path), run both models on the same inputs — SimMIM loss/pred with a
shared pixel mask, MAE loss/pred with a shared shuffle-noise draw, predictor
logits for all three poolings — and assert elementwise agreement.

RA/Dec parity is covered at the LocationEncoder level (test_location.py);
these oracles run ra_dec=False (the torch twin of the spherical-harmonics
basis is out of scope for the oracle).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from sky_embeddings_tpu.models.mim import SkyMIM
from sky_embeddings_tpu.models.predictor import SkyViT
from sky_embeddings_tpu.models.pos_embed import sincos_pos_embed_2d
from tools.port_torch_checkpoint import port_mim_state_dict, port_vit_state_dict
from tests.torch_oracle import (
    OracleMaskedAutoencoderViT,
    OracleVisionTransformer,
)

GEOM = dict(img_size=16, patch_size=4, in_chans=3, embed_dim=48, depth=2,
            num_heads=4)
DEC = dict(decoder_embed_dim=32, decoder_depth=1, decoder_num_heads=4)


def _rand_images(B=4, nan_channel=True, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(B, 3, 16, 16)).astype(np.float32)
    if nan_channel:
        x[0, 1] = np.nan  # a fully missing band exercises the NaN-fill path
        x[2, 0, :3, :3] = np.nan
    return x


def _randomize(oracle, seed=1):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in oracle.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    return oracle


def _cosine(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30))


def _sd(oracle):
    return {k: v.numpy() for k, v in oracle.state_dict().items()}


def _set_pos_embed(oracle, embed_dim=48, grid=4, decoder_dim=None):
    table = sincos_pos_embed_2d(embed_dim, grid, 1)
    with torch.no_grad():
        oracle.pos_embed.copy_(torch.from_numpy(np.asarray(table))[None])
        if decoder_dim is not None:
            dec = sincos_pos_embed_2d(decoder_dim, grid, 1)
            oracle.decoder_pos_embed.copy_(torch.from_numpy(np.asarray(dec))[None])


@pytest.mark.parametrize("norm_pix_loss,loss_fn", [(True, "l1"), (False, "mse")])
@pytest.mark.slow
def test_simmim_full_model_parity(norm_pix_loss, loss_fn):
    oracle = _randomize(OracleMaskedAutoencoderViT(
        simmim=True, norm_pix_loss=norm_pix_loss, loss_fn=loss_fn,
        pixel_mean=0.1, pixel_std=1.2, **GEOM,
    ))
    _set_pos_embed(oracle)
    params = port_mim_state_dict(_sd(oracle), simmim=True)

    model = SkyMIM(simmim=True, norm_pix_loss=norm_pix_loss, loss_fn=loss_fn,
                   pixel_mean=0.1, pixel_std=1.2, **GEOM)
    x = _rand_images()
    mask = (np.random.default_rng(2).uniform(size=x.shape) < 0.5).astype(np.float32)

    loss_j, pred_j, _ = model.apply({"params": params}, jnp.asarray(x),
                                    mask=jnp.asarray(mask))
    with torch.no_grad():
        loss_t, pred_t, _ = oracle(torch.from_numpy(x), mask=torch.from_numpy(mask))

    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(pred_j), pred_t.numpy(), atol=2e-5, rtol=1e-4
    )

    # encoder embeddings (the retrieval/probe feature path)
    tokens, _, _ = model.apply(
        {"params": params}, jnp.asarray(x), method=SkyMIM.encode
    )
    grid_j = np.asarray(tokens)[:, 1:]  # (B, L, D)
    feat_t, _, _ = oracle.forward_features(torch.from_numpy(x))
    grid_t = feat_t.detach().numpy().reshape(4, 48, -1).transpose(0, 2, 1)
    assert _cosine(grid_j, grid_t) >= 0.999
    np.testing.assert_allclose(grid_j, grid_t, atol=2e-5, rtol=1e-4)


def test_simmim_attn_pool_parity():
    oracle = _randomize(OracleMaskedAutoencoderViT(
        simmim=True, attn_pool=True, **GEOM,
    ))
    _set_pos_embed(oracle)
    params = port_mim_state_dict(_sd(oracle), simmim=True)
    model = SkyMIM(simmim=True, attn_pool=True, **GEOM)
    x = _rand_images(nan_channel=False, seed=3)
    mask = (np.random.default_rng(4).uniform(size=x.shape) < 0.4).astype(np.float32)
    loss_j, pred_j, _ = model.apply({"params": params}, jnp.asarray(x),
                                    mask=jnp.asarray(mask))
    with torch.no_grad():
        loss_t, pred_t, _ = oracle(torch.from_numpy(x), mask=torch.from_numpy(mask))
    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(pred_j), pred_t.numpy(), atol=2e-5, rtol=1e-4)


def test_mae_full_model_parity_shared_mask():
    oracle = _randomize(OracleMaskedAutoencoderViT(
        simmim=False, norm_pix_loss=True, loss_fn="mse", **GEOM, **DEC,
    ), seed=5)
    _set_pos_embed(oracle, decoder_dim=32)
    params = port_mim_state_dict(_sd(oracle), simmim=False)
    model = SkyMIM(simmim=False, norm_pix_loss=True, loss_fn="mse",
                   mask_ratio=0.75, **GEOM, **DEC)
    x = _rand_images(seed=6)
    noise = np.random.default_rng(7).uniform(size=(4, 16)).astype(np.float32)

    loss_j, pred_j, mask_j = model.apply(
        {"params": params}, jnp.asarray(x), mae_noise=jnp.asarray(noise)
    )
    with torch.no_grad():
        loss_t, pred_t, mask_t = oracle(
            torch.from_numpy(x), noise=torch.from_numpy(noise), mask_ratio=0.75
        )
    np.testing.assert_array_equal(np.asarray(mask_j), mask_t.numpy())
    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(pred_j), pred_t.numpy(), atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("pool", ["map", "avg", "token"])
def test_predictor_full_model_parity(pool):
    oracle = _randomize(OracleVisionTransformer(
        global_pool=pool, num_classes=3, pixel_mean=0.05, pixel_std=0.9, **GEOM,
    ), seed=8)
    # quirk preserved: predictor pos_embed stays zeros (vit.py:290-291)
    params = port_vit_state_dict(_sd(oracle), global_pool=pool)
    model = SkyViT(global_pool=pool, num_labels=3, zero_pos_embed=True,
                   pixel_mean=0.05, pixel_std=0.9, **GEOM)
    x = _rand_images(seed=9)
    out_j = model.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        out_t = oracle(torch.from_numpy(x))
    assert _cosine(out_j, out_t.numpy()) >= 0.999
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(), atol=2e-5, rtol=1e-4)


def test_port_roundtrip_preserves_embeddings(tmp_path):
    """jax -> torch-sd -> jax round trip: the double-ported model's
    embeddings are bit-identical to the original's."""
    from tests.test_port_checkpoint import _to_sd_block, _to_sd_linear, _to_sd_norm, _to_sd_patch_embed

    model = SkyMIM(simmim=True, **GEOM)
    x = _rand_images(seed=10)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           mask=jnp.zeros_like(jnp.asarray(x)))
    params = variables["params"]

    sd = {}
    _to_sd_patch_embed(sd, params, p=4, C=3)
    sd["cls_token"] = np.asarray(params["cls_token"])
    sd["patch_mask_values"] = np.asarray(params["patch_mask_values"])
    _to_sd_norm(sd, "norm", params["norm"])
    for i in range(2):
        _to_sd_block(sd, f"blocks.{i}", params["encoder"][f"block{i}"])
    dk = np.asarray(params["decoder_pred"]["kernel"])  # (D, S²C)
    sd["decoder.0.weight"] = np.ascontiguousarray(dk.T)[:, :, None, None]
    sd["decoder.0.bias"] = np.asarray(params["decoder_pred"]["bias"])
    sd["mask_token"] = np.asarray(params["mask_token"])

    params2 = port_mim_state_dict(sd, simmim=True)
    t1, _, _ = model.apply({"params": params}, jnp.asarray(x), method=SkyMIM.encode)
    t2, _, _ = model.apply({"params": params2}, jnp.asarray(x), method=SkyMIM.encode)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
