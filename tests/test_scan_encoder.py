"""Scan-encoder (depth-stacked lax.scan blocks) parity + layout conversion.

The scan form exists because the unrolled fused-kernel program at depth>=24
exhausts TPU compiler memory (ViT-L on the shipped harness); it must be
numerically identical to the loop form given the same (restacked) params.
"""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from sky_embeddings_tpu.models.layers import (
    Encoder,
    stack_block_params,
    unstack_block_params,
)


def _x(B=2, N=9, D=32, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=(B, N, D)).astype(np.float32) * 0.5
    )


@pytest.mark.slow
def test_scan_encoder_matches_loop():
    x = _x()
    loop = Encoder(depth=3, num_heads=4)
    scan = Encoder(depth=3, num_heads=4, scan=True)
    p_loop = loop.init(jax.random.PRNGKey(0), x)["params"]
    p_scan = {"blocks": {"block": stack_block_params(p_loop, 3)["blocks"]["block"]}}
    out_loop = loop.apply({"params": p_loop}, x)
    out_scan = scan.apply({"params": p_scan}, x)
    np.testing.assert_allclose(
        np.asarray(out_scan), np.asarray(out_loop), atol=1e-5, rtol=1e-5
    )


def test_stack_unstack_roundtrip():
    x = _x()
    loop = Encoder(depth=3, num_heads=4)
    p_loop = loop.init(jax.random.PRNGKey(1), x)["params"]
    back = unstack_block_params(stack_block_params(p_loop, 3))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        p_loop,
        back,
    )


def test_scan_encoder_param_shapes():
    x = _x()
    scan = Encoder(depth=3, num_heads=4, scan=True)
    p = scan.init(jax.random.PRNGKey(2), x)["params"]
    qkv = p["blocks"]["block"]["attn"]["qkv"]["kernel"]
    assert qkv.shape == (3, 32, 96)  # (depth, D, 3D)


@pytest.mark.slow
def test_scan_encoder_grads_match_loop():
    x = _x()
    loop = Encoder(depth=2, num_heads=4)
    scan = Encoder(depth=2, num_heads=4, scan=True)
    p_loop = loop.init(jax.random.PRNGKey(3), x)["params"]
    p_scan = stack_block_params(p_loop, 2)

    g_loop = jax.grad(lambda p: (loop.apply({"params": p}, x) ** 2).sum())(p_loop)
    g_scan = jax.grad(lambda p: (scan.apply({"params": p}, x) ** 2).sum())(p_scan)
    g_scan_unstacked = unstack_block_params(g_scan)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-4
        ),
        g_loop,
        g_scan_unstacked,
    )


def test_scan_sharding_specs_have_depth_axis():
    from jax.sharding import PartitionSpec as P

    from sky_embeddings_tpu.parallel.sharding import param_specs

    x = _x()
    scan = Encoder(depth=2, num_heads=4, scan=True)
    p = scan.init(jax.random.PRNGKey(4), x)["params"]
    specs = param_specs(p)
    block = specs["blocks"]["block"]
    assert block["attn"]["qkv"]["kernel"] == P(None, None, "model")
    assert block["attn"]["proj"]["kernel"] == P(None, "model", None)
    assert block["ffn"]["fc1_kernel"] == P(None, None, "model")
    assert block["ffn"]["fc2_kernel"] == P(None, "model", None)
    assert block["norm1"]["scale"] == P()


@pytest.mark.slow
def test_checkpoint_layout_adaptation(tmp_path):
    """A checkpoint written by a loop-encoder model restores into a
    scan-encoder model (and back), including the optimizer state."""
    from sky_embeddings_tpu.configuration import load_config
    from sky_embeddings_tpu.train.pretrain import MIMPretrainer

    from sky_embeddings_tpu.configuration import Config

    cfg = load_config("mim_tiny", "configs")

    loop_tr = MIMPretrainer(cfg)
    batch = {
        "cutouts": np.random.default_rng(5).normal(size=(4, 3, 16, 16)).astype(np.float32),
        "ra_dec": np.zeros((4, 2), np.float32),
    }
    loop_tr.train_batch(batch)
    path = str(tmp_path / "m.ckpt.msgpack")
    loop_tr.save(path)
    loss_loop = float(loop_tr.eval_batch(batch, idx=0))

    sections = {s: dict(cfg[s]) for s in cfg.sections()}
    sections["ARCHITECTURE"]["scan_blocks"] = "True"
    cfg2 = Config.from_dict(sections, name="mim_tiny_scan")
    scan_tr = MIMPretrainer(cfg2)
    assert scan_tr.model.scan_blocks
    assert scan_tr.restore(path)
    loss_scan = float(scan_tr.eval_batch(batch, idx=0))
    np.testing.assert_allclose(loss_scan, loss_loop, rtol=1e-5, atol=1e-6)

    # and back: scan checkpoint -> loop model
    path2 = str(tmp_path / "s.ckpt.msgpack")
    scan_tr.save(path2)
    loop_tr2 = MIMPretrainer(cfg)
    assert loop_tr2.restore(path2)
    loss_back = float(loop_tr2.eval_batch(batch, idx=0))
    np.testing.assert_allclose(loss_back, loss_loop, rtol=1e-5, atol=1e-6)
