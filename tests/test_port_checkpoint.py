"""Checkpoint-porting round trip: export a SkyMIM/SkyViT param tree into a
reference-style torch state dict (inverse mapping, written independently
here), port it back with the tool, and require identical forwards."""

import pytest
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from sky_embeddings_tpu.models.mim import SkyMIM
from sky_embeddings_tpu.models.predictor import SkyViT
from tools.port_torch_checkpoint import port_mim_state_dict, port_vit_state_dict

TINY = dict(
    img_size=16, patch_size=4, in_chans=3, embed_dim=32, depth=2, num_heads=4,
)


def _to_sd_linear(sd, name, p):
    sd[f"{name}.weight"] = np.asarray(p["kernel"]).T
    if "bias" in p:
        sd[f"{name}.bias"] = np.asarray(p["bias"])


def _to_sd_norm(sd, name, p):
    sd[f"{name}.weight"] = np.asarray(p["scale"])
    sd[f"{name}.bias"] = np.asarray(p["bias"])


def _to_sd_block(sd, prefix, blk):
    _to_sd_norm(sd, f"{prefix}.norm1", blk["norm1"])
    _to_sd_linear(sd, f"{prefix}.attn.qkv", blk["attn"]["qkv"])
    _to_sd_linear(sd, f"{prefix}.attn.proj", blk["attn"]["proj"])
    ffn = blk["ffn"]
    sd[f"{prefix}.norm2.weight"] = np.asarray(ffn["norm_scale"])
    sd[f"{prefix}.norm2.bias"] = np.asarray(ffn["norm_bias"])
    sd[f"{prefix}.mlp.fc1.weight"] = np.asarray(ffn["fc1_kernel"]).T
    sd[f"{prefix}.mlp.fc1.bias"] = np.asarray(ffn["fc1_bias"])
    sd[f"{prefix}.mlp.fc2.weight"] = np.asarray(ffn["fc2_kernel"]).T
    sd[f"{prefix}.mlp.fc2.bias"] = np.asarray(ffn["fc2_bias"])


def _to_sd_patch_embed(sd, params, p=4, C=3):
    k = np.asarray(params["patch_embed"]["proj"]["kernel"])  # (p²C, D)
    D = k.shape[1]
    sd["patch_embed.proj.weight"] = k.reshape(p, p, C, D).transpose(3, 2, 0, 1)
    sd["patch_embed.proj.bias"] = np.asarray(params["patch_embed"]["proj"]["bias"])


@pytest.mark.slow
def test_simmim_port_roundtrip():
    model = SkyMIM(simmim=True, norm_pix_loss=True, **TINY)
    imgs = jnp.asarray(np.random.default_rng(0).normal(size=(2, 3, 16, 16)).astype(np.float32))
    mask = jnp.zeros_like(imgs)
    variables = model.init(jax.random.PRNGKey(0), imgs, mask=mask)
    params = jax.device_get(variables["params"])

    # build a reference-style state dict from the params
    sd = {}
    _to_sd_patch_embed(sd, params)
    sd["cls_token"] = np.asarray(params["cls_token"])
    sd["patch_mask_values"] = np.asarray(params["patch_mask_values"])
    sd["mask_token"] = np.asarray(params["mask_token"])
    _to_sd_norm(sd, "norm", params["norm"])
    for i in range(2):
        _to_sd_block(sd, f"blocks.{i}", params["encoder"][f"block{i}"])
    # SimMIM decoder: conv1x1 (S²C, D, 1, 1)
    k = np.asarray(params["decoder_pred"]["kernel"])  # (D, S²C)
    sd["decoder.0.weight"] = k.T[:, :, None, None]
    sd["decoder.0.bias"] = np.asarray(params["decoder_pred"]["bias"])

    ported = port_mim_state_dict(sd, simmim=True)
    out_ref, _, _ = model.apply({"params": params}, imgs, mask=mask)
    out_ported, _, _ = model.apply({"params": ported}, imgs, mask=mask)
    np.testing.assert_allclose(float(out_ported), float(out_ref), rtol=1e-6)
    # tree equality leaf-by-leaf
    for (ka, a), (kb, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(params), key=lambda t: str(t[0])),
        sorted(jax.tree_util.tree_leaves_with_path(ported), key=lambda t: str(t[0])),
    ):
        assert str(ka) == str(kb)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7, err_msg=str(ka))


def test_vit_port_roundtrip():
    model = SkyViT(num_labels=3, global_pool="map", **TINY)
    imgs = jnp.asarray(np.random.default_rng(1).normal(size=(2, 3, 16, 16)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), imgs)
    params = jax.device_get(variables["params"])

    sd = {}
    _to_sd_patch_embed(sd, params)
    sd["cls_token"] = np.asarray(params["cls_token"])
    sd["patch_mask_values"] = np.asarray(params["patch_mask_values"])
    _to_sd_norm(sd, "norm", params["norm"])
    _to_sd_linear(sd, "head", params["head"])
    for i in range(2):
        _to_sd_block(sd, f"blocks.{i}", params["encoder"][f"block{i}"])
    pool = params["pool"]
    sd["attn_pool.latent"] = np.asarray(pool["latent"])
    _to_sd_linear(sd, "attn_pool.q", pool["xattn"]["q"])
    _to_sd_linear(sd, "attn_pool.kv", pool["xattn"]["kv"])
    _to_sd_linear(sd, "attn_pool.proj", pool["xattn"]["proj"])
    _to_sd_norm(sd, "attn_pool.norm", pool["norm"])
    _to_sd_linear(sd, "attn_pool.mlp.fc1", pool["mlp"]["fc1"])
    _to_sd_linear(sd, "attn_pool.mlp.fc2", pool["mlp"]["fc2"])

    ported = port_vit_state_dict(sd, global_pool="map")
    out_ref = model.apply({"params": params}, imgs)
    out_ported = model.apply({"params": ported}, imgs)
    np.testing.assert_allclose(np.asarray(out_ported), np.asarray(out_ref), atol=1e-6)
