"""Cross-check the JAX transformer layers against the PyTorch oracle with
shared weights — the correctness keystone for embedding parity."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from sky_embeddings_tpu.models.layers import (
    Attention,
    AttentionPoolLatent,
    Block,
    Mlp,
    patchify,
)
from torch_oracle import (
    OracleAttention,
    OracleAttentionPoolLatent,
    OracleBlock,
    set_layernorm,
    set_linear,
    t2n,
)

torch.manual_seed(0)


def _np(x):
    return np.asarray(x)


def test_attention_matches_torch():
    D, H, B, N = 32, 4, 2, 10
    attn = Attention(num_heads=H)
    x = np.random.default_rng(0).normal(size=(B, N, D)).astype(np.float32)
    params = attn.init(jax.random.PRNGKey(0), jnp.asarray(x))

    oracle = OracleAttention(D, H)
    p = params["params"]
    set_linear(oracle.qkv, _np(p["qkv"]["kernel"]), _np(p["qkv"]["bias"]))
    set_linear(oracle.proj, _np(p["proj"]["kernel"]), _np(p["proj"]["bias"]))

    got = _np(attn.apply(params, jnp.asarray(x)))
    want = t2n(oracle(torch.from_numpy(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def _load_block(oracle: OracleBlock, p):
    set_layernorm(oracle.norm1, _np(p["norm1"]["scale"]), _np(p["norm1"]["bias"]))
    set_layernorm(oracle.norm2, _np(p["ffn"]["norm_scale"]), _np(p["ffn"]["norm_bias"]))
    set_linear(oracle.attn.qkv, _np(p["attn"]["qkv"]["kernel"]), _np(p["attn"]["qkv"]["bias"]))
    set_linear(oracle.attn.proj, _np(p["attn"]["proj"]["kernel"]), _np(p["attn"]["proj"]["bias"]))
    set_linear(oracle.mlp.fc1, _np(p["ffn"]["fc1_kernel"]), _np(p["ffn"]["fc1_bias"]))
    set_linear(oracle.mlp.fc2, _np(p["ffn"]["fc2_kernel"]), _np(p["ffn"]["fc2_bias"]))


def test_block_matches_torch():
    D, H, B, N = 48, 6, 3, 18
    block = Block(num_heads=H)
    x = np.random.default_rng(1).normal(size=(B, N, D)).astype(np.float32)
    params = block.init(jax.random.PRNGKey(1), jnp.asarray(x))

    oracle = OracleBlock(D, H)
    _load_block(oracle, params["params"])

    got = _np(block.apply(params, jnp.asarray(x)))
    want = t2n(oracle(torch.from_numpy(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_attention_pool_latent_matches_torch():
    D, H, B, N = 32, 2, 4, 12
    pool = AttentionPoolLatent(num_heads=H)
    x = np.random.default_rng(2).normal(size=(B, N, D)).astype(np.float32)
    params = pool.init(jax.random.PRNGKey(2), jnp.asarray(x))
    p = params["params"]

    oracle = OracleAttentionPoolLatent(D, H)
    with torch.no_grad():
        oracle.latent.copy_(torch.from_numpy(_np(p["latent"]).copy()))
    set_linear(oracle.q, _np(p["xattn"]["q"]["kernel"]), _np(p["xattn"]["q"]["bias"]))
    set_linear(oracle.kv, _np(p["xattn"]["kv"]["kernel"]), _np(p["xattn"]["kv"]["bias"]))
    set_linear(oracle.proj, _np(p["xattn"]["proj"]["kernel"]), _np(p["xattn"]["proj"]["bias"]))
    set_layernorm(oracle.norm, _np(p["norm"]["scale"]), _np(p["norm"]["bias"]))
    set_linear(oracle.mlp.fc1, _np(p["mlp"]["fc1"]["kernel"]), _np(p["mlp"]["fc1"]["bias"]))
    set_linear(oracle.mlp.fc2, _np(p["mlp"]["fc2"]["kernel"]), _np(p["mlp"]["fc2"]["bias"]))

    got = _np(pool.apply(params, jnp.asarray(x)))
    want = t2n(oracle(torch.from_numpy(x)))
    assert got.shape == (B, D)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_patch_embed_equals_conv():
    """Patchify+Dense must equal a stride-p conv with suitably laid-out weights."""
    B, C, S, p, D = 2, 3, 16, 4, 24
    rng = np.random.default_rng(3)
    imgs = rng.normal(size=(B, C, S, S)).astype(np.float32)
    kernel = rng.normal(size=(p * p * C, D)).astype(np.float32) * 0.1
    bias = rng.normal(size=(D,)).astype(np.float32)

    x = patchify(jnp.asarray(imgs), p)
    got = _np(x @ kernel + bias)

    # torch conv: weight (D, C, p, p); our flatten order is (ph, pw, c)
    w = kernel.reshape(p, p, C, D).transpose(3, 2, 0, 1).copy()
    conv = torch.nn.Conv2d(C, D, p, stride=p)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(w))
        conv.bias.copy_(torch.from_numpy(bias))
    out = conv(torch.from_numpy(imgs))  # (B, D, g, g)
    want = t2n(out.flatten(2).transpose(1, 2))  # (B, L, D)
    np.testing.assert_allclose(got, want, atol=1e-4)
