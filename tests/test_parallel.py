"""Multi-device sharding tests on the 8-device virtual CPU mesh:
data-parallel and tensor-parallel results must match single-device math."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import PartitionSpec as P

from sky_embeddings_tpu.models.mim import SkyMIM
from sky_embeddings_tpu.ops.masking import simmim_batch_mask
from sky_embeddings_tpu.parallel.mesh import batch_sharding, create_mesh, replicated
from sky_embeddings_tpu.parallel.sharding import param_specs, shard_params

TINY = dict(
    img_size=16, patch_size=4, in_chans=3, embed_dim=64, depth=2,
    num_heads=4, decoder_embed_dim=32, decoder_depth=1, decoder_num_heads=2,
)


def test_eight_virtual_devices_present():
    assert len(jax.devices()) == 8


def test_mesh_shapes():
    mesh = create_mesh()
    assert mesh.devices.shape == (8, 1)
    mesh = create_mesh(model=2)
    assert mesh.devices.shape == (4, 2)
    with pytest.raises(ValueError):
        create_mesh(data=3, model=2)


@pytest.mark.slow
def test_param_specs_tp_rules():
    model = SkyMIM(simmim=True, **TINY)
    imgs = jnp.zeros((2, 3, 16, 16))
    params = model.init(jax.random.PRNGKey(0), imgs, mask=jnp.zeros_like(imgs))["params"]
    specs = param_specs(params)
    blk = specs["encoder"]["block0"]
    assert blk["attn"]["qkv"]["kernel"] == P(None, "model")
    assert blk["attn"]["proj"]["kernel"] == P("model", None)
    assert blk["ffn"]["fc1_kernel"] == P(None, "model")
    assert blk["ffn"]["fc2_kernel"] == P("model", None)
    assert blk["ffn"]["fc1_bias"] == P("model")
    assert blk["ffn"]["norm_scale"] == P()
    assert specs["cls_token"] == P()
    assert specs["patch_embed"]["proj"]["kernel"] == P(None, "model")


@pytest.mark.parametrize("tp", [1, 2])
@pytest.mark.slow
def test_sharded_loss_matches_single_device(tp):
    """Forward loss must be identical (to fp tolerance) under dp/tp sharding."""
    model = SkyMIM(simmim=True, norm_pix_loss=True, **TINY)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(size=(16, 3, 16, 16)).astype(np.float32))
    mask = simmim_batch_mask(jax.random.PRNGKey(1), 16, 3, 16, 4, 0.9)
    variables = model.init(jax.random.PRNGKey(0), imgs, mask=mask)

    loss_single, _, _ = jax.jit(model.apply)(variables, imgs, mask=mask)

    mesh = create_mesh(model=tp)
    params = shard_params(mesh, variables["params"])
    imgs_s = jax.device_put(imgs, batch_sharding(mesh))
    mask_s = jax.device_put(mask, batch_sharding(mesh))
    loss_sharded, _, _ = jax.jit(
        lambda p, x, m: model.apply({"params": p}, x, mask=m)
    )(params, imgs_s, mask_s)
    np.testing.assert_allclose(float(loss_sharded), float(loss_single), rtol=2e-5)


@pytest.mark.slow
def test_sharded_gradients_match_single_device():
    """Gradients under 4x2 dp/tp must match the unsharded backward pass.

    (Gradients, not one Adam step: Adam's first update is ~sign(grad)·lr, so
    reduction-order noise near zero-gradient entries flips signs and makes a
    post-step comparison meaningless.)
    """
    model = SkyMIM(simmim=True, **TINY)
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.normal(size=(8, 3, 16, 16)).astype(np.float32))
    mask = simmim_batch_mask(jax.random.PRNGKey(2), 8, 3, 16, 4, 0.9)
    variables = model.init(jax.random.PRNGKey(0), imgs, mask=mask)

    def grad_fn(params, imgs, mask):
        return jax.grad(lambda p: model.apply({"params": p}, imgs, mask=mask)[0])(params)

    params0 = variables["params"]
    g_single = jax.jit(grad_fn)(params0, imgs, mask)

    mesh = create_mesh(model=2)
    params_s = shard_params(mesh, params0)
    imgs_s = jax.device_put(imgs, batch_sharding(mesh))
    mask_s = jax.device_put(mask, batch_sharding(mesh))
    g_shard = jax.jit(grad_fn)(params_s, imgs_s, mask_s)

    flat_a, flat_b = jax.tree_util.tree_leaves(g_single), jax.tree_util.tree_leaves(g_shard)
    for a, b in zip(flat_a, flat_b):
        scale = max(float(np.abs(np.asarray(a)).max()), 1e-3)
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=1e-5 * scale, rtol=1e-4
        )


@pytest.mark.slow
def test_graft_dryrun_multichip():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


@pytest.mark.slow
def test_pretrainer_on_mesh():
    """MIMPretrainer over the full 8-device mesh trains with batch sharding."""
    from sky_embeddings_tpu.configuration import Config
    from sky_embeddings_tpu.train.pretrain import MIMPretrainer

    config = Config.from_dict({
        "DATA": {},
        "TRAINING": dict(
            batch_size=16, total_batch_iters=4, max_mask_ratio=0.9,
            norm_pix_loss=True, weight_decay=0.05, init_lr=1e-3,
            final_lr_factor=1e4, loss_fn="L1",
        ),
        "ARCHITECTURE": dict(
            img_size=16, num_channels=3, pixel_mean=0.0, pixel_std=1.0,
            embed_dim=48, patch_size=4, model_type="simmim",
        ),
    }, name="mesh_t")
    pre = MIMPretrainer(config, mesh=create_mesh())
    rng = np.random.default_rng(2)
    batch = {
        "cutouts": rng.normal(size=(16, 3, 16, 16)).astype(np.float32),
        "ra_dec": rng.uniform(0, 90, size=(16, 2)).astype(np.float32),
    }
    batch = jax.device_put(batch, pre.batch_shard)
    l1 = float(pre.train_batch(batch))
    l2 = float(pre.train_batch(batch))
    assert np.isfinite(l1) and np.isfinite(l2)
