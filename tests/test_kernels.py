"""Pallas kernel parity tests (interpret mode on CPU): fused attention
forward + backward vs the XLA einsum formulation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sky_embeddings_tpu.ops.kernels.attention import (
    _fused_attention_bwd_call,
    fused_attention,
    fused_attention_ad,
    xla_attention,
)


@pytest.fixture
def qkv():
    B, N, D = 8, 17, 48
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.normal(size=(B, N, 3 * D)).astype(np.float32) * 0.3)


def test_fused_attention_forward_parity(qkv):
    out_k = fused_attention(qkv, num_heads=4, block_b=4, interpret=True)
    out_x = xla_attention(qkv, num_heads=4)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_x), atol=1e-5)


def test_fused_attention_backward_parity(qkv):
    def loss_k(q):
        return (fused_attention_ad(q, 4, 4, True) ** 2).sum()

    def loss_x(q):
        return (xla_attention(q, 4) ** 2).sum()

    g_k = jax.grad(loss_k)(qkv)
    g_x = jax.grad(loss_x)(qkv)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_x), atol=2e-4, rtol=1e-4)


def test_fused_attention_bwd_kernel_directly(qkv):
    dctx = jnp.ones((8, 17, 48), jnp.float32)
    dqkv = _fused_attention_bwd_call(qkv, dctx, 4, block_b=4, interpret=True)

    _, vjp = jax.vjp(lambda q: xla_attention(q, 4), qkv)
    want = vjp(dctx)[0]
    np.testing.assert_allclose(np.asarray(dqkv), np.asarray(want), atol=2e-4, rtol=1e-4)


def test_attention_module_cpu_uses_xla_path():
    # On CPU the layer must fall back to the einsum path and stay differentiable
    from sky_embeddings_tpu.models.layers import Attention

    attn = Attention(num_heads=4)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 10, 32)).astype(np.float32))
    params = attn.init(jax.random.PRNGKey(0), x)
    g = jax.grad(lambda p: (attn.apply(p, x) ** 2).sum())(params)
    assert np.isfinite(np.asarray(jax.tree_util.tree_leaves(g)[0])).all()
