"""End-to-end pretraining smoke tests on synthetic data (tiny geometry),
including checkpoint/resume and the optimizer/schedule semantics."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from sky_embeddings_tpu.configuration import Config
from sky_embeddings_tpu.data.synthetic import write_synthetic_h5
from sky_embeddings_tpu.data.h5_loader import build_h5_batcher
from sky_embeddings_tpu.train.pretrain import MIMPretrainer, train_network
from sky_embeddings_tpu.train.schedules import cosine_annealing, linear_lr
from sky_embeddings_tpu.train import optim


def tiny_config(model_type="simmim", **training_over):
    training = dict(
        batch_size=8, total_batch_iters=12, max_mask_ratio=0.9, mask_ratio=0.75,
        norm_pix_loss=True, weight_decay=0.05, init_lr=1e-3,
        final_lr_factor=1e4, loss_fn="L1",
    )
    training.update(training_over)
    return Config.from_dict({
        "DATA": {"val_data_file": "val.h5"},
        "TRAINING": training,
        "ARCHITECTURE": dict(
            img_size=16, num_channels=3, pixel_mean=0.0, pixel_std=1.0,
            embed_dim=48, patch_size=4, model_type=model_type,
        ),
    }, name="tiny")


@pytest.fixture(scope="module")
def data_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("pretrain")
    train = write_synthetic_h5(str(d / "train.h5"), 64, channels=3, img_size=16, seed=0)
    val = write_synthetic_h5(str(d / "val.h5"), 32, channels=3, img_size=16, seed=1)
    return train, val, str(d)


def _patch_depth(config):
    """Shrink to 2 blocks for test speed by building a custom SkyMIM."""


def test_schedules_match_torch_formulas():
    sched = cosine_annealing(1e-3, 100, 1e4)
    # t=0 -> init; t=100 -> eta_min
    np.testing.assert_allclose(float(sched(0)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(sched(100)), 1e-7, rtol=1e-4)
    # t=50 -> midpoint
    np.testing.assert_allclose(
        float(sched(50)), 1e-7 + (1e-3 - 1e-7) * 0.5, rtol=1e-5
    )
    lin = linear_lr(1e-3, 100, 1e3)
    np.testing.assert_allclose(float(lin(0)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(lin(50)), (1e-3 + 1e-6) / 2, rtol=1e-5)
    np.testing.assert_allclose(float(lin(100)), 1e-6, rtol=1e-5)


def test_decay_mask_excludes_1d():
    params = {
        "norm": {"scale": jnp.ones((4,)), "bias": jnp.zeros((4,))},
        "dense": {"kernel": jnp.ones((4, 4)), "bias": jnp.zeros((4,))},
        "cls_token": jnp.zeros((1, 1, 4)),
    }
    mask = optim.decay_mask(params)
    assert mask["dense"]["kernel"] is True
    assert mask["dense"]["bias"] is False
    assert mask["norm"]["scale"] is False
    assert mask["cls_token"] is True  # ndim 3, decayed (timm semantics)
    mask2 = optim.decay_mask(params, no_decay_names=("cls_token",))
    assert mask2["cls_token"] is False


def test_layer_ids_and_scales():
    params = {
        "patch_embed": {"proj": {"kernel": jnp.ones((2, 2))}},
        "cls_token": jnp.zeros((1, 1, 2)),
        "encoder": {
            "block0": {"attn": {"qkv": {"kernel": jnp.ones((2, 6))}}},
            "block11": {"mlp": {"fc1": {"kernel": jnp.ones((2, 8))}}},
        },
        "head": {"kernel": jnp.ones((2, 3))},
    }
    depth = 12
    assert optim.vit_layer_id(("patch_embed", "proj", "kernel"), depth) == 0
    assert optim.vit_layer_id(("cls_token",), depth) == 0
    assert optim.vit_layer_id(("encoder", "block0", "attn", "qkv", "kernel"), depth) == 1
    assert optim.vit_layer_id(("encoder", "block11", "mlp", "fc1", "kernel"), depth) == 12
    assert optim.vit_layer_id(("head", "kernel"), depth) == 13
    scales = optim.layer_scale_tree(params, depth, 0.5)
    assert scales["head"]["kernel"] == 1.0  # layer 13 of 13
    np.testing.assert_allclose(scales["encoder"]["block11"]["mlp"]["fc1"]["kernel"], 0.5)
    np.testing.assert_allclose(scales["patch_embed"]["proj"]["kernel"], 0.5 ** 13)


def test_lp_optimizer_freezes_backbone():
    params = {
        "encoder": {"block0": {"attn": {"qkv": {"kernel": jnp.ones((2, 6))}}}},
        "norm": {"scale": jnp.ones((2,))},
        "head": {"kernel": jnp.ones((2, 3)), "bias": jnp.zeros((3,))},
        "pool": {"latent": jnp.zeros((1, 1, 2))},
    }
    tx = optim.linear_probe_optimizer(params, optax.constant_schedule(1e-3), 0.0, "map")
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    assert float(jnp.abs(updates["encoder"]["block0"]["attn"]["qkv"]["kernel"]).sum()) == 0.0
    assert float(jnp.abs(updates["head"]["kernel"]).sum()) > 0.0
    assert float(jnp.abs(updates["pool"]["latent"]).sum()) > 0.0
    assert float(jnp.abs(updates["norm"]["scale"]).sum()) > 0.0


@pytest.mark.slow
def test_pretrain_loop_end_to_end(data_files, tmp_path):
    train, val, d = data_files
    config = tiny_config()
    pre = MIMPretrainer(config)
    train_batcher = build_h5_batcher(train, batch_size=8, img_size=16)
    val_batcher = build_h5_batcher(val, batch_size=8, img_size=16)
    model_file = str(tmp_path / "tiny.ckpt.msgpack")
    logs = []
    train_network(
        pre, train_batcher.forever(), val_batcher,
        total_batch_iters=12, verbose_iters=6, cp_time_minutes=1e9,
        model_filename=model_file, fig_dir=None, log_fn=logs.append,
    )
    assert pre.cur_iter == 12
    assert os.path.exists(model_file)
    assert len(pre.losses["train_loss"]) == 2
    assert all(np.isfinite(v) for v in pre.losses["train_loss"])
    assert sum("Batch Iterations" in m for m in logs) == 2

    # Resume: fresh trainer restores step, params, losses
    pre2 = MIMPretrainer(config)
    assert pre2.restore(model_file)
    assert pre2.cur_iter == 12
    np.testing.assert_allclose(
        np.asarray(pre2.state.params["cls_token"]),
        np.asarray(pre.state.params["cls_token"]),
    )
    assert pre2.losses["train_loss"] == pre.losses["train_loss"]


@pytest.mark.slow
def test_pretrain_loss_decreases(data_files):
    train, val, d = data_files
    config = tiny_config(total_batch_iters=30, init_lr=3e-3)
    pre = MIMPretrainer(config)
    batcher = build_h5_batcher(train, batch_size=8, img_size=16)
    first, last = None, None
    for i, batch in enumerate(batcher.forever()):
        loss = float(pre.train_batch(batch))
        if i == 0:
            first = loss
        if i >= 29:
            last = loss
            break
    assert last < first


@pytest.mark.slow
def test_mae_pretrainer_runs(data_files):
    train, val, d = data_files
    config = tiny_config(model_type="maesimple")
    pre = MIMPretrainer(config)
    batch = next(iter(build_h5_batcher(train, batch_size=8, img_size=16)))
    loss = float(pre.train_batch(batch))
    assert np.isfinite(loss)
    assert pre.max_mask_ratio is None


def test_ft_compat_lr_quirk():
    """The reference feeds config weight_decay into the ft base LR
    (vit.py:141-143); compat mode must reproduce that, and the fixed mode
    must use init_lr (PARITY.md #1)."""
    import jax.numpy as jnp
    from sky_embeddings_tpu.train import optim as O

    params = {"head": {"kernel": jnp.ones((2, 3))}}  # layer id = depth+1, scale 1
    grads = {"head": {"kernel": jnp.ones((2, 3))}}
    wd_value, lr_value = 0.01, 1e-6

    def first_update(compat):
        tx = O.finetune_optimizer(
            params, lambda lr: lambda step: lr, depth=12, layer_decay=0.5,
            init_lr=lr_value, weight_decay=wd_value, compat_ft_lr=compat,
        )
        state = tx.init(params)
        updates, _ = tx.update(grads, state, params)
        return float(jnp.abs(updates["head"]["kernel"]).max())

    # first Adam step: |update| ~ lr * |sign + wd*param|
    up_compat = first_update(True)
    up_fixed = first_update(False)
    # compat: base lr == weight_decay (0.01); fixed: base lr == init_lr (1e-6)
    assert 0.001 < up_compat < 0.02
    assert up_fixed < 1e-5


@pytest.mark.slow
def test_val_masks_vary_across_batches_and_passes(data_files):
    """Round-2 fix: eval folds the val-batch index and the training step into
    the mask key, so val loss averages over mask draws (the round-1 eval step
    reused one frozen draw for every val batch of the entire run)."""
    train, val, d = data_files
    pre = MIMPretrainer(tiny_config())
    batcher = build_h5_batcher(val, batch_size=8, img_size=16, shuffle=False)
    batch = next(iter(batcher))
    l0 = float(pre.eval_batch(batch, idx=0))
    l1 = float(pre.eval_batch(batch, idx=1))
    l0_again = float(pre.eval_batch(batch, idx=0))
    assert l0 != l1          # different batch index -> different mask
    assert l0 == l0_again    # deterministic given (state, idx)
    # after a train step the state advances -> a new eval pass redraws
    pre.train_batch(batch)
    assert float(pre.eval_batch(batch, idx=0)) != l0
