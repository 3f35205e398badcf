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


# ----------------------------------------------------------------------
# Fused MLP block
# ----------------------------------------------------------------------

def _mlp_inputs(B=8, N=17, D=48, F=192, seed=2):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32) * 0.5)
    scale = jnp.asarray(1.0 + 0.1 * rng.normal(size=D).astype(np.float32))
    bias = jnp.asarray(0.1 * rng.normal(size=D).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(D, F)).astype(np.float32) * 0.05)
    b1 = jnp.asarray(0.01 * rng.normal(size=F).astype(np.float32))
    w2 = jnp.asarray(rng.normal(size=(F, D)).astype(np.float32) * 0.05)
    b2 = jnp.asarray(0.01 * rng.normal(size=D).astype(np.float32))
    return x, scale, bias, w1, b1, w2, b2


def test_fused_mlp_block_forward_parity():
    from sky_embeddings_tpu.ops.kernels.mlp_block import fused_mlp_block, xla_mlp_block

    args = _mlp_inputs()
    out_k = fused_mlp_block(*args, 4, True)
    out_x = xla_mlp_block(*args)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_x), atol=2e-5)


def test_fused_mlp_block_backward_parity():
    from sky_embeddings_tpu.ops.kernels.mlp_block import fused_mlp_block, xla_mlp_block

    args = _mlp_inputs()

    def loss_k(*a):
        return (fused_mlp_block(*a, 4, True) ** 2).sum()

    def loss_x(*a):
        return (xla_mlp_block(*a) ** 2).sum()

    g_k = jax.grad(loss_k, argnums=tuple(range(7)))(*args)
    g_x = jax.grad(loss_x, argnums=tuple(range(7)))(*args)
    names = ["x", "scale", "bias", "w1", "b1", "w2", "b2"]
    for name, a, b in zip(names, g_k, g_x):
        scale = max(float(np.abs(np.asarray(b)).max()), 1e-3)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5 * scale, rtol=2e-4,
            err_msg=f"grad mismatch for {name}",
        )


def test_fused_mlp_block_stash_backward_parity():
    """stash=True backward (consumes the stashed fc1 pre-activation) must
    match the recompute backward. In fp32 (as here) the stash is lossless;
    on TPU the bf16 stash adds noise on the order of the bf16 activations."""
    from sky_embeddings_tpu.ops.kernels.mlp_block import fused_mlp_block, xla_mlp_block

    args = _mlp_inputs()

    def loss_k(*a):
        return (fused_mlp_block(*a, 4, True, True) ** 2).sum()

    def loss_x(*a):
        return (xla_mlp_block(*a) ** 2).sum()

    g_k = jax.grad(loss_k, argnums=tuple(range(7)))(*args)
    g_x = jax.grad(loss_x, argnums=tuple(range(7)))(*args)
    names = ["x", "scale", "bias", "w1", "b1", "w2", "b2"]
    for name, a, b in zip(names, g_k, g_x):
        scale = max(float(np.abs(np.asarray(b)).max()), 1e-3)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5 * scale, rtol=2e-4,
            err_msg=f"grad mismatch for {name}",
        )


def test_fused_mlp_block_rows_parity():
    """rows=True (row-flat 2D tiling — no per-sample sublane padding) must
    match the XLA oracle through forward and both backwards. N=17 here is
    the MAE-encoder shape the layout exists for (41% padded rows in 3D)."""
    from sky_embeddings_tpu.ops.kernels import mlp_block as mb

    args = _mlp_inputs()  # B=8, N=17 -> M=136 rows
    out_k = mb.fused_mlp_block(*args, 0, True, False, True)
    out_x = mb.xla_mlp_block(*args)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_x), atol=2e-5)

    # explicit row-tile override: 8 rows (17 tiles of M=136)
    out_k8 = mb.fused_mlp_block(*args, 8, True, False, True)
    np.testing.assert_allclose(np.asarray(out_k8), np.asarray(out_x), atol=2e-5)

    def loss_x(*a):
        return (mb.xla_mlp_block(*a) ** 2).sum()

    g_x = jax.grad(loss_x, argnums=tuple(range(7)))(*args)
    for stash in (False, True):
        def loss_k(*a, stash=stash):
            return (mb.fused_mlp_block(*a, 0, True, stash, True) ** 2).sum()

        g_k = jax.grad(loss_k, argnums=tuple(range(7)))(*args)
        for name, a, b in zip(["x", "scale", "bias", "w1", "b1", "w2", "b2"], g_k, g_x):
            s = max(float(np.abs(np.asarray(b)).max()), 1e-3)
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=3e-5 * s, rtol=2e-4,
                err_msg=f"rows grad mismatch for {name} (stash={stash})",
            )


def test_row_tile_divisors():
    from sky_embeddings_tpu.ops.kernels.mlp_block import _row_tile, auto_rows_fwd

    assert _row_tile(66560, 512, 16) == 512      # flagship M: exact
    assert _row_tile(17408, 1024, 16) == 1024    # MAE-enc M: exact
    assert _row_tile(18688, 768, 16) == 256      # ViT-L M = 2^8 * 73
    assert _row_tile(136, 4, 8) == 4             # tiny test geometry
    # every result divides M
    for M in (136, 17408, 18688, 66560):
        for t in (64, 500, 1024):
            d = _row_tile(M, t, 16)
            assert M % d == 0 and d <= max(t, 1)
    # auto fwd rows stay near the measured 3D optima (tb*N)
    assert auto_rows_fwd(1024, 65, 768, 3072, 16) in (512, 520)


@pytest.mark.slow
def test_pipelined_mlp_forward_parity():
    """mlp_block.PIPELINE_FWD restructures the forward into row chunks with
    chunk j+1's LN→fc1 interleaved against chunk j's GELU→fc2; LN/GELU are
    row-local, so the chunked output must be bit-comparable to the straight
    kernel and the XLA oracle — in the plain forward, the stash forward
    (per-chunk a writes), and through both backwards (which are unchanged
    but consume the pipe-written stash / primal residuals)."""
    from sky_embeddings_tpu.ops.kernels import mlp_block as mb

    # geometry chosen so the tile splits into 2 aligned chunks: tb=16, N=32
    # -> M=512 rows -> 2x256 at the test-lowered row floor
    args = _mlp_inputs(B=16, N=32)
    out_x = mb.xla_mlp_block(*args)
    saved = mb.PIPELINE_FWD, mb._PIPE_MIN_ROWS
    try:
        mb.PIPELINE_FWD = True
        mb._PIPE_MIN_ROWS = 256
        assert mb._row_chunks(16 * 32) == 2  # the pipeline is exercised
        out_p = mb.fused_mlp_block(*args, 16, True)
        np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x), atol=2e-5)

        # degenerate single-chunk path (tile too small to split)
        out_p1 = mb.fused_mlp_block(*args, 4, True)
        np.testing.assert_allclose(np.asarray(out_p1), np.asarray(out_x), atol=2e-5)

        # both backwards through the pipelined differentiation-path forward
        for stash in (False, True):
            def loss_k(*a, stash=stash):
                return (mb.fused_mlp_block(*a, 16, True, stash) ** 2).sum()

            def loss_x(*a):
                return (mb.xla_mlp_block(*a) ** 2).sum()

            g_k = jax.grad(loss_k, argnums=tuple(range(7)))(*args)
            g_x = jax.grad(loss_x, argnums=tuple(range(7)))(*args)
            for name, a, b in zip(["x", "scale", "bias", "w1", "b1", "w2", "b2"], g_k, g_x):
                s = max(float(np.abs(np.asarray(b)).max()), 1e-3)
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), atol=3e-5 * s, rtol=2e-4,
                    err_msg=f"pipelined grad mismatch for {name} (stash={stash})",
                )
    finally:
        mb.PIPELINE_FWD, mb._PIPE_MIN_ROWS = saved


def test_mlp_row_chunks_alignment():
    """_row_chunks only splits when chunks are whole sublane groups above
    the row floor; otherwise it degrades to the straight single chunk."""
    from sky_embeddings_tpu.ops.kernels import mlp_block as mb

    assert mb._row_chunks(1040) == 2    # flagship training tile: 2x520
    assert mb._row_chunks(2080) == 2    # fwd tile 32: 2x1040
    assert mb._row_chunks(68) == 1      # tiny tile: unsplittable (34 % 8)
    assert mb._row_chunks(400) == 1     # below the 256-row chunk floor
    assert mb._row_chunks(520) == 1     # 260 % 8 != 0


def test_fused_mlp_block_stash_forward_matches_plain():
    """The stash forward's primal output must equal the plain forward."""
    from sky_embeddings_tpu.ops.kernels.mlp_block import fused_mlp_block

    args = _mlp_inputs()
    out_plain = fused_mlp_block(*args, 4, True, False)
    out_stash, _ = jax.vjp(lambda *a: fused_mlp_block(*a, 4, True, True), *args)
    np.testing.assert_allclose(
        np.asarray(out_stash), np.asarray(out_plain), atol=1e-6
    )


def test_gelu_approximation_accuracy():
    from sky_embeddings_tpu.ops.kernels.mlp_block import _gelu, _gelu_grad

    x = jnp.linspace(-6, 6, 1001)
    want = jax.nn.gelu(x, approximate=False)
    np.testing.assert_allclose(np.asarray(_gelu(x)), np.asarray(want), atol=2e-6)
    want_grad = jax.vmap(jax.grad(lambda v: jax.nn.gelu(v, approximate=False)))(x)
    np.testing.assert_allclose(np.asarray(_gelu_grad(x)), np.asarray(want_grad), atol=5e-6)


# ----------------------------------------------------------------------
# Fused attention block (LN -> qkv -> attention -> proj -> residual)
# ----------------------------------------------------------------------

def _attn_block_inputs(B=8, N=17, D=48, seed=3):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32) * 0.5)
    scale = jnp.asarray(1.0 + 0.1 * rng.normal(size=D).astype(np.float32))
    bias = jnp.asarray(0.1 * rng.normal(size=D).astype(np.float32))
    wqkv = jnp.asarray(rng.normal(size=(D, 3 * D)).astype(np.float32) * 0.08)
    bqkv = jnp.asarray(0.01 * rng.normal(size=3 * D).astype(np.float32))
    wproj = jnp.asarray(rng.normal(size=(D, D)).astype(np.float32) * 0.08)
    bproj = jnp.asarray(0.01 * rng.normal(size=D).astype(np.float32))
    return x, scale, bias, wqkv, bqkv, wproj, bproj


def test_fused_attn_block_forward_parity():
    from sky_embeddings_tpu.ops.kernels.attn_block import (
        fused_attn_block,
        xla_attn_block,
    )

    args = _attn_block_inputs()
    out_k = fused_attn_block(*args, 4, 4, 4, True)
    out_x = xla_attn_block(*args, 4)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_x), atol=2e-5)


@pytest.mark.slow
def test_fused_attn_block_backward_parity():
    from sky_embeddings_tpu.ops.kernels.attn_block import (
        fused_attn_block,
        xla_attn_block,
    )

    args = _attn_block_inputs()
    # non-uniform cotangent so dx/dW are all exercised
    g = jnp.asarray(
        np.random.default_rng(4).normal(size=args[0].shape).astype(np.float32)
    )

    def loss_k(*a):
        return (fused_attn_block(*a, 4, 4, 4, True) * g).sum()

    def loss_x(*a):
        return (xla_attn_block(*a, 4) * g).sum()

    grads_k = jax.grad(loss_k, argnums=tuple(range(7)))(*args)
    grads_x = jax.grad(loss_x, argnums=tuple(range(7)))(*args)
    names = ["x", "scale", "bias", "wqkv", "bqkv", "wproj", "bproj"]
    for name, gk, gx in zip(names, grads_k, grads_x):
        np.testing.assert_allclose(
            np.asarray(gk), np.asarray(gx), atol=5e-4, rtol=1e-3,
            err_msg=f"grad mismatch for {name}",
        )


@pytest.mark.slow
def test_fused_attn_block_stash_backward_parity():
    """stash=True backward (consumes stashed qkv + probs) must match the
    XLA reference gradients. fp32 here -> lossless stash."""
    from sky_embeddings_tpu.ops.kernels.attn_block import (
        fused_attn_block,
        xla_attn_block,
    )

    args = _attn_block_inputs()
    g = jnp.asarray(
        np.random.default_rng(7).normal(size=args[0].shape).astype(np.float32)
    )

    def loss_k(*a):
        return (fused_attn_block(*a, 4, 4, 4, True, True) * g).sum()

    def loss_x(*a):
        return (xla_attn_block(*a, 4) * g).sum()

    grads_k = jax.grad(loss_k, argnums=tuple(range(7)))(*args)
    grads_x = jax.grad(loss_x, argnums=tuple(range(7)))(*args)
    names = ["x", "scale", "bias", "wqkv", "bqkv", "wproj", "bproj"]
    for name, gk, gx in zip(names, grads_k, grads_x):
        np.testing.assert_allclose(
            np.asarray(gk), np.asarray(gx), atol=5e-4, rtol=1e-3,
            err_msg=f"grad mismatch for {name}",
        )


def test_fused_attn_block_stash_forward_matches_plain():
    from sky_embeddings_tpu.ops.kernels.attn_block import fused_attn_block

    args = _attn_block_inputs()
    out_plain = fused_attn_block(*args, 4, 4, 4, True, False)
    out_stash, _ = jax.vjp(
        lambda *a: fused_attn_block(*a, 4, 4, 4, True, True), *args
    )
    np.testing.assert_allclose(
        np.asarray(out_stash), np.asarray(out_plain), atol=1e-6
    )


def test_block_module_parity_with_unfused_reference():
    """The Block module (CPU -> xla_attn_block path) must match an explicit
    LN/attention composition numerically, and keep the classic param tree."""
    from sky_embeddings_tpu.models.layers import Attention, Block

    x = jnp.asarray(np.random.default_rng(5).normal(size=(2, 10, 32)).astype(np.float32))
    block = Block(num_heads=4)
    params = block.init(jax.random.PRNGKey(0), x)["params"]
    assert set(params) == {"norm1", "attn", "ffn"}
    assert set(params["attn"]) == {"qkv", "proj"}
    assert params["attn"]["qkv"]["kernel"].shape == (32, 96)

    # reference composition with the same parameters
    attn = Attention(num_heads=4)
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = ((x32 - mu) ** 2).mean(-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + 1e-6)
    y = y * params["norm1"]["scale"] + params["norm1"]["bias"]
    mid = x32 + attn.apply({"params": params["attn"]}, y)

    out = block.apply({"params": params}, x)
    from sky_embeddings_tpu.ops.kernels.mlp_block import xla_mlp_block

    ffn = params["ffn"]
    want = xla_mlp_block(
        mid, ffn["norm_scale"], ffn["norm_bias"], ffn["fc1_kernel"],
        ffn["fc1_bias"], ffn["fc2_kernel"], ffn["fc2_bias"],
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-5)


# ----------------------------------------------------------------------
# Multi-query bank scoring
# ----------------------------------------------------------------------

def test_multi_query_bank_scores_parity():
    """Pallas multi-query kernel vs XLA formulation vs Q independent
    single-query scores."""
    from sky_embeddings_tpu.ops.kernels.simscore import (
        weighted_bank_scores_multi_pallas,
        weighted_bank_scores_multi_xla,
        weighted_bank_scores_xla,
    )

    rng = np.random.default_rng(11)
    bank = jnp.asarray(rng.normal(size=(300, 64)).astype(np.float32))
    targets = jnp.asarray(rng.normal(size=(5, 64)).astype(np.float32))
    weights = jnp.asarray(rng.random((5, 64)).astype(np.float32) + 0.1)

    got = weighted_bank_scores_multi_pallas(bank, targets, weights, interpret=True)
    want = weighted_bank_scores_multi_xla(bank, targets, weights)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    for q in range(5):
        single = weighted_bank_scores_xla(bank, targets[q], weights[q])
        np.testing.assert_allclose(
            np.asarray(got[:, q]), np.asarray(single), atol=2e-5,
            err_msg=f"query {q} disagrees with single-query scoring",
        )


def test_multi_query_bank_topk():
    from sky_embeddings_tpu.ops.kernels.simscore import (
        bank_topk,
        bank_topk_multi,
    )

    rng = np.random.default_rng(12)
    bank = jnp.asarray(rng.normal(size=(200, 32)).astype(np.float32))
    targets = jnp.asarray(rng.normal(size=(3, 32)).astype(np.float32))
    weights = jnp.asarray(rng.random((3, 32)).astype(np.float32) + 0.1)

    scores_m, idx_m = bank_topk_multi(bank, targets, weights, 7)
    assert scores_m.shape == (3, 7) and idx_m.shape == (3, 7)
    for q in range(3):
        s1, i1 = bank_topk(bank, targets[q], weights[q], 7)
        np.testing.assert_allclose(np.asarray(scores_m[q]), np.asarray(s1), atol=2e-5)
        np.testing.assert_array_equal(np.asarray(idx_m[q]), np.asarray(i1))


# ----------------------------------------------------------------------
# bf16 banks + chunked survey-scale retrieval (VERDICT r2 #3)
# ----------------------------------------------------------------------

def test_bf16_bank_pallas_scores_parity():
    """The one-pass kernel consumes a bf16 bank directly (no fp32 HBM copy);
    scores must match the fp32 XLA oracle at bf16 storage precision."""
    from sky_embeddings_tpu.ops.kernels.simscore import (
        weighted_bank_scores_pallas,
        weighted_bank_scores_xla,
    )

    rng = np.random.default_rng(13)
    bank32 = jnp.asarray(rng.normal(size=(2048, 64)).astype(np.float32))
    target = jnp.asarray(rng.normal(size=(64,)).astype(np.float32))
    weights = jnp.asarray(rng.random(64).astype(np.float32) + 0.1)

    want = weighted_bank_scores_xla(bank32, target, weights)
    got16 = weighted_bank_scores_pallas(
        bank32.astype(jnp.bfloat16), target, weights, interpret=True
    )
    # scores live in [-1, 1]; bf16 storage adds ~2^-8 relative input noise
    np.testing.assert_allclose(np.asarray(got16), np.asarray(want), atol=1.5e-2)
    # and the same kernel at fp32 storage is exact to fp32 math
    got32 = weighted_bank_scores_pallas(bank32, target, weights, interpret=True)
    np.testing.assert_allclose(np.asarray(got32), np.asarray(want), atol=2e-5)


def test_bf16_bank_topk_agreement():
    """Top-300 from the bf16 bank must agree with the fp32 ranking at ≥0.999
    (score-wise: every bf16 winner's fp32 score reaches the fp32 cut within
    bf16 noise) — the acceptance bar for storing survey banks in bf16."""
    from sky_embeddings_tpu.ops.kernels.simscore import bank_topk

    rng = np.random.default_rng(14)
    bank32 = jnp.asarray(rng.normal(size=(20000, 64)).astype(np.float32))
    target = jnp.asarray(rng.normal(size=(64,)).astype(np.float32))
    weights = jnp.asarray(rng.random(64).astype(np.float32) + 0.1)

    vals32, idx32 = bank_topk(bank32, target, weights, 300)
    vals16, idx16 = bank_topk(bank32.astype(jnp.bfloat16), target, weights, 300)

    scores32 = np.asarray(vals32)
    cut = scores32[-1]
    # fp32 scores of the bf16-chosen rows
    from sky_embeddings_tpu.ops.kernels.simscore import weighted_bank_scores_xla

    full32 = np.asarray(weighted_bank_scores_xla(bank32, target, weights))
    chosen = full32[np.asarray(idx16)]
    agreement = float(np.mean(chosen >= cut - 5e-3))
    assert agreement >= 0.999, f"bf16 top-300 agreement {agreement:.4f}"
    np.testing.assert_allclose(np.asarray(vals16), scores32, atol=1.5e-2)


def test_bf16_native_scores_match_fp32_of_rounded():
    """The native-bf16 XLA scorer (the TPU bf16-bank hot path) must equal
    fp32 scoring of the bf16-rounded bank: fp32 accumulation makes the
    contraction exact over bf16 operands."""
    from sky_embeddings_tpu.ops.kernels.simscore import (
        weighted_bank_scores_xla,
        weighted_bank_scores_xla_bf16,
    )

    rng = np.random.default_rng(21)
    bank16 = jnp.asarray(rng.normal(size=(4096, 64)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    target = jnp.asarray(rng.normal(size=(64,)).astype(np.float32))
    weights = jnp.asarray(rng.random(64).astype(np.float32) + 0.1)

    got = np.asarray(weighted_bank_scores_xla_bf16(bank16, target, weights))
    # oracle: fp32 math on the bf16-rounded values (weights/target rounded
    # to bf16 where the native path rounds them)
    wt = np.asarray((weights * target).astype(jnp.bfloat16)).astype(np.float32)
    w16 = np.asarray(weights.astype(jnp.bfloat16)).astype(np.float32)
    b = np.asarray(bank16).astype(np.float32)
    dots = b @ wt
    # the native path squares in bf16 (bank * bank before the contraction)
    bb = np.asarray((bank16 * bank16)).astype(np.float32)
    mags = np.sqrt(bb @ w16)
    tnorm = np.sqrt(np.sum(np.asarray(weights) * np.asarray(target) ** 2))
    want = dots / (mags * tnorm + 1e-6)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_int8_two_stage_topk_exact_recall():
    """int8 stage-1 + exact fp32 rescore: the returned top-k must agree with
    the full fp32 ranking (score-wise at the fp32 cut) and the returned
    scores must BE exact fp32 weighted-cosine scores of the chosen rows."""
    from sky_embeddings_tpu.ops.kernels.simscore import (
        bank_topk,
        bank_topk_int8,
        quantize_bank_int8,
        weighted_bank_scores_xla,
    )

    rng = np.random.default_rng(22)
    bank32 = jnp.asarray(rng.normal(size=(20000, 64)).astype(np.float32))
    target = jnp.asarray(rng.normal(size=(64,)).astype(np.float32))
    weights = jnp.asarray(rng.random(64).astype(np.float32) + 0.1)

    bank8, rnorm = quantize_bank_int8(bank32)
    vals, idx = bank_topk_int8(
        bank8, rnorm, bank32, target, weights, 300, oversample=2048
    )
    vals32, _ = bank_topk(bank32, target, weights, 300)
    cut = float(np.asarray(vals32)[-1])
    full32 = np.asarray(weighted_bank_scores_xla(bank32, target, weights))
    agreement = float(np.mean(full32[np.asarray(idx)] >= cut - 5e-3))
    assert agreement >= 0.999, f"int8 two-stage agreement {agreement:.4f}"
    # returned scores are the exact fp32 scores of the chosen rows
    np.testing.assert_allclose(
        np.asarray(vals), full32[np.asarray(idx)], rtol=2e-5, atol=2e-5
    )


def test_quantize_bank_int8_scale_invariance():
    """Row scaling must not change the int8 code (cosine drops the row
    scale, so the quantizer may too)."""
    from sky_embeddings_tpu.ops.kernels.simscore import quantize_bank_int8

    rng = np.random.default_rng(23)
    rows = rng.normal(size=(64, 32)).astype(np.float32)
    scales = (rng.random(64).astype(np.float32) * 10 + 0.1)[:, None]
    b1, _ = quantize_bank_int8(jnp.asarray(rows))
    b2, _ = quantize_bank_int8(jnp.asarray(rows * scales))
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))


def test_bank_topk_chunked_matches_monolithic():
    """Streaming slabs (with a padded tail) must reproduce the whole-bank
    result exactly for fp32 banks."""
    from sky_embeddings_tpu.ops.kernels.simscore import bank_topk, bank_topk_chunked

    rng = np.random.default_rng(15)
    bank = rng.normal(size=(5000, 32)).astype(np.float32)
    target = jnp.asarray(rng.normal(size=(32,)).astype(np.float32))
    weights = jnp.asarray(rng.random(32).astype(np.float32) + 0.1)

    want_v, want_i = bank_topk(jnp.asarray(bank), target, weights, 50)
    got_v, got_i = bank_topk_chunked(bank, target, weights, 50, slab_rows=700)
    np.testing.assert_allclose(got_v, np.asarray(want_v), atol=2e-5)
    np.testing.assert_array_equal(got_i, np.asarray(want_i))


def test_bank_topk_chunked_all_negative_scores():
    """Tail-slab padding must not displace real rows: zero pad rows score
    exactly 0, which would beat every row of an anti-aligned bank (all true
    cosines ≈ -1) inside the per-slab top-k. Regression for the -inf mask
    in ``_bank_topk_masked``."""
    from sky_embeddings_tpu.ops.kernels.simscore import bank_topk, bank_topk_chunked

    rng = np.random.default_rng(17)
    target = rng.normal(size=(32,)).astype(np.float32)
    # every bank row anti-aligned with the target -> all scores negative
    bank = (-target[None, :] + 0.05 * rng.normal(size=(1100, 32))).astype(
        np.float32
    )
    weights = (rng.random(32) + 0.1).astype(np.float32)
    tj, wj = jnp.asarray(target), jnp.asarray(weights)

    want_v, want_i = bank_topk(jnp.asarray(bank), tj, wj, 40)
    assert float(np.asarray(want_v)[0]) < 0  # the scenario is real
    # slab split 1000+100: the tail slab is 90% padding and k > its 100
    # real rows, so unmasked pad rows would win its whole top-k
    got_v, got_i = bank_topk_chunked(bank, tj, wj, 40, slab_rows=1000)
    np.testing.assert_array_equal(got_i, np.asarray(want_i))
    np.testing.assert_allclose(got_v, np.asarray(want_v), atol=2e-5)


@pytest.mark.slow
def test_bank_topk_chunked_10m_rows():
    """Survey scale: 10M rows streamed in 1M-row slabs (the bank never sits
    on the device whole), verified against a direct numpy ranking."""
    from sky_embeddings_tpu.ops.kernels.simscore import bank_topk_chunked

    rng = np.random.default_rng(16)
    n, d = 10_000_000, 8
    bank = rng.standard_normal((n, d)).astype(np.float32)
    target = rng.standard_normal(d).astype(np.float32)
    weights = (rng.random(d) + 0.1).astype(np.float32)

    got_v, got_i = bank_topk_chunked(
        bank, jnp.asarray(target), jnp.asarray(weights), 100, slab_rows=1 << 20
    )
    dots = bank @ (weights * target)
    mags = np.sqrt((bank ** 2) @ weights)
    tnorm = np.sqrt(np.sum(weights * target ** 2))
    scores = dots / (mags * tnorm + 1e-6)
    want_i = np.argsort(-scores, kind="stable")[:100]
    assert set(got_i.tolist()) == set(want_i.tolist())
    np.testing.assert_allclose(got_v, scores[want_i], rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_kernel_parity_gate_tool():
    """The bench-embedded parity gate (tools/kernel_parity.py) must pass in
    interpret mode at a small loop-heads geometry — keeps the gate itself
    from rotting between TPU runs."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tools.kernel_parity import run_kernel_parity

    out = run_kernel_parity(B=8, N=17, D=128, H=4, F=256, interpret=True)
    assert out["ok"], out["checks"]


# ----------------------------------------------------------------------
# Loop-heads attention kernels (wide-head models, H > 12)
# ----------------------------------------------------------------------

def _wide_attn_inputs(B=8, N=17, D=256, seed=9):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32) * 0.5)
    scale = jnp.asarray(1.0 + 0.1 * rng.normal(size=D).astype(np.float32))
    bias = jnp.asarray(0.1 * rng.normal(size=D).astype(np.float32))
    wqkv = jnp.asarray(rng.normal(size=(D, 3 * D)).astype(np.float32) * 0.04)
    bqkv = jnp.asarray(0.01 * rng.normal(size=3 * D).astype(np.float32))
    wproj = jnp.asarray(rng.normal(size=(D, D)).astype(np.float32) * 0.04)
    bproj = jnp.asarray(0.01 * rng.normal(size=D).astype(np.float32))
    return x, scale, bias, wqkv, bqkv, wproj, bproj


def test_loop_heads_mode_selected():
    from sky_embeddings_tpu.ops.kernels.attn_block import _head_group, _use_loop_heads

    assert _head_group(64) == 2     # ViT-B/L head dim
    assert _head_group(80) == 8     # ViT-H head dim
    assert _head_group(128) == 1
    assert _use_loop_heads(12, 64)       # ViT-B: loop (groups of 2)
    assert _use_loop_heads(16, 64)       # ViT-L: loop
    assert _use_loop_heads(16, 80)       # ViT-H: loop (groups of 8)
    assert not _use_loop_heads(4, 12)    # tiny test geometry: unroll


@pytest.mark.slow
def test_loop_heads_forward_parity():
    """H=16, hd=16 -> group=8, 2 loop iterations; vs the XLA oracle."""
    from sky_embeddings_tpu.ops.kernels.attn_block import (
        _use_loop_heads,
        fused_attn_block,
        xla_attn_block,
    )

    assert _use_loop_heads(16, 16)
    args = _wide_attn_inputs()
    out_k = fused_attn_block(*args, 16, 4, 4, True)
    out_x = xla_attn_block(*args, 16)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_x), atol=2e-5)

    # hd=64 (the ViT-B/L head dim -> pairs of heads per 128-lane slab)
    assert _use_loop_heads(4, 64)
    out_k4 = fused_attn_block(*args, 4, 4, 4, True)
    out_x4 = xla_attn_block(*args, 4)
    np.testing.assert_allclose(np.asarray(out_k4), np.asarray(out_x4), atol=2e-5)


@pytest.mark.slow
def test_loop_heads_backward_parity_both_modes():
    from sky_embeddings_tpu.ops.kernels.attn_block import (
        fused_attn_block,
        xla_attn_block,
    )

    args = _wide_attn_inputs()
    g = jnp.asarray(
        np.random.default_rng(10).normal(size=args[0].shape).astype(np.float32)
    )

    def loss_x(*a):
        return (xla_attn_block(*a, 16) * g).sum()

    grads_x = jax.grad(loss_x, argnums=tuple(range(7)))(*args)
    names = ["x", "scale", "bias", "wqkv", "bqkv", "wproj", "bproj"]
    for stash in (False, True):
        def loss_k(*a):
            return (fused_attn_block(*a, 16, 4, 4, True, stash) * g).sum()

        grads_k = jax.grad(loss_k, argnums=tuple(range(7)))(*args)
        for name, gk, gx in zip(names, grads_k, grads_x):
            np.testing.assert_allclose(
                np.asarray(gk), np.asarray(gx), atol=5e-4, rtol=1e-3,
                err_msg=f"grad mismatch for {name} (stash={stash})",
            )


@pytest.mark.slow
def test_pipelined_fwd_loop_parity():
    """PIPELINE_FWD restructures the loop-heads forward into a carried
    lookahead (group j+1 logits issued alongside group j softmax); the
    numerics must be identical to the straight loop and the XLA oracle,
    in both the plain and stash forward (and through the stash backward,
    which consumes pipe-written probs)."""
    from sky_embeddings_tpu.ops.kernels import attn_block as ab

    args = _wide_attn_inputs()
    g = jnp.asarray(
        np.random.default_rng(11).normal(size=args[0].shape).astype(np.float32)
    )
    out_x = ab.xla_attn_block(*args, 16)
    saved = ab.PIPELINE_FWD
    try:
        ab.PIPELINE_FWD = True
        # plain forward, multi-group (H=16, hd=16 -> G=8, 2 iterations)
        out_p = ab.fused_attn_block(*args, 16, 4, 4, True)
        np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x), atol=2e-5)
        # single-group degenerate path (H=2, hd=128 -> G=1, n_groups=2)
        out_p2 = ab.fused_attn_block(*args, 2, 4, 4, True)
        out_x2 = ab.xla_attn_block(*args, 2)
        np.testing.assert_allclose(np.asarray(out_p2), np.asarray(out_x2), atol=2e-5)

        # stash path: pipe-written probs feed the stash backward
        def loss_k(*a):
            return (ab.fused_attn_block(*a, 16, 4, 4, True, True) * g).sum()

        grads_p = jax.grad(loss_k, argnums=tuple(range(7)))(*args)
    finally:
        ab.PIPELINE_FWD = saved

    def loss_x(*a):
        return (ab.xla_attn_block(*a, 16) * g).sum()

    grads_x = jax.grad(loss_x, argnums=tuple(range(7)))(*args)
    for gk, gx in zip(grads_p, grads_x):
        np.testing.assert_allclose(
            np.asarray(gk), np.asarray(gx), atol=5e-4, rtol=1e-3
        )


@pytest.mark.slow
def test_pipelined_flagship_head_layout_parity():
    """The ViT-B head layout (H=12, hd=64 -> G=2, six head groups) runs the
    pipelined loops through 5 carried iterations plus the epilogue — deeper
    than the 2-group geometries above. Forward and both backward modes must
    match the XLA oracle."""
    from sky_embeddings_tpu.ops.kernels import attn_block as ab

    rng = np.random.default_rng(21)
    B, N, D, H = 4, 65, 768, 12
    x = jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32) * 0.5)
    scale = jnp.asarray(1.0 + 0.1 * rng.normal(size=D).astype(np.float32))
    bias = jnp.asarray(0.1 * rng.normal(size=D).astype(np.float32))
    wqkv = jnp.asarray(rng.normal(size=(D, 3 * D)).astype(np.float32) * 0.02)
    bqkv = jnp.asarray(0.01 * rng.normal(size=3 * D).astype(np.float32))
    wproj = jnp.asarray(rng.normal(size=(D, D)).astype(np.float32) * 0.02)
    bproj = jnp.asarray(0.01 * rng.normal(size=D).astype(np.float32))
    args = (x, scale, bias, wqkv, bqkv, wproj, bproj)
    g = jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32))

    assert ab._use_loop_heads(H, D // H) and H // ab._head_group(D // H) == 6
    out_x = ab.xla_attn_block(*args, H)

    def loss_x(*a):
        return (ab.xla_attn_block(*a, H) * g).sum()

    grads_x = jax.grad(loss_x, argnums=tuple(range(7)))(*args)
    saved = ab.PIPELINE_FWD, ab.PIPELINE_BWD
    try:
        ab.PIPELINE_FWD = ab.PIPELINE_BWD = True
        out_p = ab.fused_attn_block(*args, H, 4, 4, True)
        np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x), atol=3e-5)
        for stash in (False, True):
            def loss_k(*a):
                return (ab.fused_attn_block(*a, H, 4, 4, True, stash) * g).sum()

            grads_p = jax.grad(loss_k, argnums=tuple(range(7)))(*args)
            for gk, gx in zip(grads_p, grads_x):
                np.testing.assert_allclose(
                    np.asarray(gk), np.asarray(gx), atol=2e-3, rtol=2e-3,
                    err_msg=f"flagship pipelined grad mismatch (stash={stash})",
                )
    finally:
        ab.PIPELINE_FWD, ab.PIPELINE_BWD = saved


@pytest.mark.slow
def test_pipelined_bwd_loop_parity():
    """PIPELINE_BWD carries each head group's MXU precursors (dp, and the
    logits in recompute mode) one iteration ahead; gradients must match the
    XLA oracle in both stash and recompute modes."""
    from sky_embeddings_tpu.ops.kernels import attn_block as ab

    args = _wide_attn_inputs()
    g = jnp.asarray(
        np.random.default_rng(12).normal(size=args[0].shape).astype(np.float32)
    )

    def loss_x(*a):
        return (ab.xla_attn_block(*a, 16) * g).sum()

    grads_x = jax.grad(loss_x, argnums=tuple(range(7)))(*args)
    saved = ab.PIPELINE_BWD
    try:
        ab.PIPELINE_BWD = True
        for stash in (False, True):
            def loss_k(*a):
                return (ab.fused_attn_block(*a, 16, 4, 4, True, stash) * g).sum()

            grads_p = jax.grad(loss_k, argnums=tuple(range(7)))(*args)
            for gk, gx in zip(grads_p, grads_x):
                np.testing.assert_allclose(
                    np.asarray(gk), np.asarray(gx), atol=5e-4, rtol=1e-3,
                    err_msg=f"pipelined bwd mismatch (stash={stash})",
                )
    finally:
        ab.PIPELINE_BWD = saved


def test_int8_multi_query_two_stage_agreement():
    """Multi-query int8 two-stage: each query's exact-rescored top-k must
    agree with the single-query two-stage path and carry exact fp32 scores."""
    from sky_embeddings_tpu.ops.kernels.simscore import (
        bank_topk_multi_int8,
        quantize_bank_int8,
        weighted_bank_scores_multi_xla,
    )

    rng = np.random.default_rng(31)
    bank32 = jnp.asarray(rng.normal(size=(20000, 64)).astype(np.float32))
    targets = jnp.asarray(rng.normal(size=(5, 64)).astype(np.float32))
    weights = jnp.asarray(rng.random((5, 64)).astype(np.float32) + 0.1)

    bank8, rnorm = quantize_bank_int8(bank32)
    vals, idx = bank_topk_multi_int8(
        bank8, rnorm, bank32, targets, weights, 100, oversample=2048
    )
    assert vals.shape == (5, 100) and idx.shape == (5, 100)
    full = np.asarray(weighted_bank_scores_multi_xla(bank32, targets, weights))
    for q in range(5):
        order = np.argsort(-full[:, q], kind="stable")
        cut = full[order[99], q]
        agreement = float(np.mean(full[np.asarray(idx[q]), q] >= cut - 5e-3))
        assert agreement >= 0.99, f"query {q}: agreement {agreement:.4f}"
        # returned scores are the exact fp32 scores of the chosen rows
        np.testing.assert_allclose(
            np.asarray(vals[q]), full[np.asarray(idx[q]), q],
            rtol=2e-5, atol=2e-5,
        )
        # rows are sorted best-first
        assert np.all(np.diff(np.asarray(vals[q])) <= 1e-6)


def test_tile_heuristics_flagship_neutral_and_seq_scaled():
    """The N-aware tile heuristics (r3) must be behavior-neutral at the
    geometries whose tiles were TPU-measured (N=65/66 pads to 72 sublanes,
    seq scale 1.0) and must grow tiles only for genuinely shorter sequences
    such as the MAE token-dropped encoder (N=17) and the 512-d decoder."""
    from sky_embeddings_tpu.ops.kernels import attn_block as ab
    from sky_embeddings_tpu.ops.kernels import mlp_block as mb

    # flagship ViT-B/L/H: identical to the measured r2/r3 tiles
    assert ab.auto_block_b_fwd(1024, 768, stash=False, n_tokens=65) == 64
    assert ab.auto_block_b_fwd(1024, 768, stash=True, n_tokens=65) == 16
    assert ab.auto_block_b_fwd(256, 1024, stash=True, n_tokens=66) == 8
    assert ab.auto_block_b_fwd(128, 1280, stash=False, n_tokens=66) == 8
    assert ab.auto_block_b(1024, 768, 16, n_tokens=65) == 16
    assert ab.auto_block_b(256, 1024, 16, n_tokens=66) == 8
    assert mb.auto_block_b(1024, 768, 3072, n_tokens=65) == 16
    assert mb.auto_block_b(256, 1024, 4096, n_tokens=66) == 8
    # MAE decoder (D=512, F=2048): growth capped by the F ratio — the
    # D·F-scaled tb=32 exceeds the backward's 100 MB VMEM limit (measured)
    assert mb.auto_block_b(1024, 512, 2048, n_tokens=65) == 16
    # fwd-only mlp tiles (r3 sweep: half the backward's at each geometry)
    assert mb.auto_block_b_fwd(1024, 768, 3072, n_tokens=65) == 8
    assert mb.auto_block_b_fwd(256, 1024, 4096, n_tokens=66) == 4
    assert mb.auto_block_b_fwd(128, 1280, 5120, n_tokens=66) == 4
    assert mb.auto_block_b_fwd(1024, 768, 3072, n_tokens=17) == 16
    assert mb.auto_block_b_fwd(1024, 512, 2048, n_tokens=65) == 8

    # sub-8 caps still honored (ViT-H backward shrinks below _pick_block's 8)
    assert ab.auto_block_b(128, 1280, 16, n_tokens=66) == 4

    # MAE encoder (N=17 -> 24 padded sublanes, 3x) grows tiles but stays
    # within the 3x VMEM-equivalent budget and divides B
    enc = ab.auto_block_b_fwd(1024, 768, stash=True, n_tokens=17)
    assert enc == 32  # 16 * 3.0 -> 48 target, capped at 32 by doubling
    assert mb.auto_block_b(1024, 768, 3072, n_tokens=17) == 32
    assert ab.auto_block_b(1024, 768, 16, n_tokens=17) == 32

    # MAE decoder (D=512, F=2048, N=65): the D·F width scale is 2.25, but
    # growth is capped by the F ratio (3072/2048 = 1.5) — see the duplicate
    # assertion above with the measured-VMEM rationale
    assert mb.auto_block_b(1024, 512, 2048, n_tokens=65) == 16

    # grown tiles always divide B
    for B in (48, 96, 1024, 136):
        t = ab.auto_block_b_fwd(B, 768, stash=True, n_tokens=17)
        assert B % t == 0
        t = mb.auto_block_b(B, 512, 2048, n_tokens=65)
        assert B % t == 0


def test_tile_heuristics_long_sequence_shrink():
    """Longer sequences than the tuned flagship (e.g. img_size 128 -> 257
    tokens) must SHRINK the batch tile to hold the tb*N VMEM budget — the
    compile helper OOMs on backward tiles whose activation slab exceeds the
    measured flagship footprint."""
    from sky_embeddings_tpu.ops.kernels import attn_block as ab
    from sky_embeddings_tpu.ops.kernels import mlp_block as mb

    # 257 tokens pads to 264 sublanes: 72/264 ~ 0.27x the flagship budget
    assert ab.auto_block_b_fwd(1024, 768, stash=False, n_tokens=257) == 16
    assert ab.auto_block_b_fwd(1024, 768, stash=True, n_tokens=257) == 4
    assert ab.auto_block_b(1024, 768, 16, n_tokens=257) == 4
    assert mb.auto_block_b(1024, 768, 3072, n_tokens=257) == 4

    # the tb*N product never exceeds the flagship tile's (within one doubling)
    for n in (17, 65, 66, 130, 257, 1025):
        n_pad = -(-n // 8) * 8
        for fn in (
            lambda: ab.auto_block_b_fwd(1024, 768, stash=True, n_tokens=n),
            lambda: ab.auto_block_b(1024, 768, 16, n_tokens=n),
            lambda: mb.auto_block_b(1024, 768, 3072, n_tokens=n),
        ):
            t = fn()
            assert t >= 1 and 1024 % t == 0
            assert t * n_pad <= 64 * 72 + 1, (n, t)


@pytest.mark.slow  # stash="stream" is not a default path anywhere
# (measured negative, BASELINE.md r4); parity stays gated in the slow tier
def test_fused_mlp_block_stream_backward_parity(monkeypatch):
    """stash="stream" (weight-streaming backward: resident fp32 grad
    accumulators, weights in column slabs over a second grid dim) must match
    the XLA grads. Slab width forced small so the test exercises the
    multi-slab path: per-tile LN reuse, cross-slab dy accumulation, and the
    sliced dw1/db1/dw2 accumulation."""
    from sky_embeddings_tpu.ops.kernels import mlp_block as mb

    monkeypatch.setattr(mb, "_stream_slab", lambda D, F, **kw: 64)
    args = _mlp_inputs(B=8, N=17, D=48, F=192)

    def loss_k(*a):
        return (mb.fused_mlp_block(*a, 4, True, "stream") ** 2).sum()

    def loss_x(*a):
        return (mb.xla_mlp_block(*a) ** 2).sum()

    g_k = jax.grad(loss_k, argnums=tuple(range(7)))(*args)
    g_x = jax.grad(loss_x, argnums=tuple(range(7)))(*args)
    names = ["x", "scale", "bias", "w1", "b1", "w2", "b2"]
    for name, a, b in zip(names, g_k, g_x):
        scale = max(float(np.abs(np.asarray(b)).max()), 1e-3)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5 * scale, rtol=2e-4,
            err_msg=f"grad mismatch for {name}",
        )


def test_stream_slab_widths():
    from sky_embeddings_tpu.ops.kernels.mlp_block import _stream_slab

    assert _stream_slab(1280, 5120) in (640, 1280)  # ViT-H: multi-slab
    fk = _stream_slab(1280, 5120)
    assert 5120 % fk == 0 and fk % 128 == 0
    assert _stream_slab(48, 192) == 192  # no 128-multiple divides F -> 1 slab
    assert _stream_slab(64, 256) == 256  # small weights -> single slab


# ----------------------------------------------------------------------
# Segment-masked (packed-sequence) attention block
# ----------------------------------------------------------------------

def _packed(args, pack=2):
    """(B, N, D) inputs -> (B/pack, pack·N, D) via the free row-major
    reshape the model uses for MAE sequence packing."""
    x = args[0]
    B, N, D = x.shape
    return (x.reshape(B // pack, pack * N, D),) + args[1:]


def test_attn_block_seg_mask_forward_matches_unpacked():
    """seg_len-masked attention over packed samples must equal per-sample
    attention exactly (the packing contract, models/mim.py encode)."""
    from sky_embeddings_tpu.ops.kernels.attn_block import (
        fused_attn_block,
        xla_attn_block,
    )

    args = _attn_block_inputs(B=8, N=17)
    B, N, D = args[0].shape
    ref = xla_attn_block(*args, 4)
    for out in (
        xla_attn_block(*_packed(args), 4, N),
        fused_attn_block(*_packed(args), 4, 4, 4, True, False, N),
    ):
        np.testing.assert_allclose(
            np.asarray(out).reshape(B, N, D), np.asarray(ref), atol=2e-5
        )


@pytest.mark.slow
@pytest.mark.parametrize("stash", [False, True])
def test_attn_block_seg_mask_backward_matches_unpacked(stash):
    """Packed gradients must equal unpacked ones for both backward modes:
    recompute (re-applies the mask in-kernel) and stash (masked probs carry
    the zeros through)."""
    from sky_embeddings_tpu.ops.kernels.attn_block import (
        fused_attn_block,
        xla_attn_block,
    )

    args = _attn_block_inputs(B=8, N=17, seed=11)
    B, N, D = args[0].shape
    g = jnp.asarray(
        np.random.default_rng(12).normal(size=args[0].shape).astype(np.float32)
    )
    gp = g.reshape(B // 2, 2 * N, D)

    def loss_ref(*a):
        return (xla_attn_block(*a, 4) * g).sum()

    def loss_packed(*a):
        return (fused_attn_block(*_packed(a), 4, 4, 4, True, stash, N) * gp).sum()

    grads_ref = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    grads_pk = jax.grad(loss_packed, argnums=tuple(range(7)))(*args)
    names = ["x", "scale", "bias", "wqkv", "bqkv", "wproj", "bproj"]
    for name, gr, gk in zip(names, grads_ref, grads_pk):
        np.testing.assert_allclose(
            np.asarray(gk), np.asarray(gr), atol=5e-4, rtol=1e-3,
            err_msg=f"packed grad mismatch for {name} (stash={stash})",
        )


def test_attn_block_seg_mask_loop_heads_forward():
    """The fori_loop head-group kernels (D=256, hd=64 -> loop form) must
    honor the segment mask too."""
    from sky_embeddings_tpu.ops.kernels.attn_block import (
        _use_loop_heads,
        fused_attn_block,
        xla_attn_block,
    )

    args = _wide_attn_inputs(B=8, N=17)
    B, N, D = args[0].shape
    assert _use_loop_heads(4, D // 4)
    ref = xla_attn_block(*args, 4)
    out = fused_attn_block(*_packed(args), 4, 4, 4, True, False, N)
    np.testing.assert_allclose(
        np.asarray(out).reshape(B, N, D), np.asarray(ref),
        atol=3e-5, rtol=1e-4,
    )
