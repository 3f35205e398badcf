"""Predictor training stack tests (tiny geometry, synthetic data)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sky_embeddings_tpu.configuration import Config
from sky_embeddings_tpu.data.h5_loader import build_h5_batcher
from sky_embeddings_tpu.data.synthetic import write_synthetic_h5
from sky_embeddings_tpu.eval.eval_fns import predictor_infer
from sky_embeddings_tpu.train.pretrain import MIMPretrainer
from sky_embeddings_tpu.train.predictor import (
    PredictorTrainer,
    train_predictor_network,
    warm_start_from_mim,
)


def mim_config():
    return Config.from_dict({
        "DATA": {},
        "TRAINING": dict(
            batch_size=8, total_batch_iters=5, max_mask_ratio=0.9,
            norm_pix_loss=True, weight_decay=0.05, init_lr=1e-3,
            final_lr_factor=1e4, loss_fn="L1",
        ),
        "ARCHITECTURE": dict(
            img_size=16, num_channels=3, pixel_mean=0.0, pixel_std=1.0,
            embed_dim=48, patch_size=4, model_type="simmim",
        ),
    }, name="mim_t")


def predictor_config(loss_fn="mse", train_method="ft", **over):
    data = dict(label_keys="['zspec']", label_means="[0.64]", label_stds="[0.64]")
    if "crossentropy" in loss_fn:
        data = dict(label_keys="['class']", num_classes=3,
                    label_means="[0]", label_stds="[1]")
    training = dict(
        train_method=train_method, pretained_mae="mim_t", num_train=-1,
        batch_size=8, total_batch_iters=10, layer_decay=0.5,
        weight_decay=0.01, init_lr=1e-3, final_lr_factor=1e3,
        augment=True, brightness=0.8, noise=0.05, nan_channels=1,
        use_label_errs=False, loss_fn=loss_fn,
    )
    training.update(over)
    return Config.from_dict({
        "DATA": data,
        "TRAINING": training,
        "ARCHITECTURE": dict(img_size=16, global_pool="map", dropout=0.0),
    }, name="pred_t")


@pytest.fixture(scope="module")
def data_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("pred")
    train = write_synthetic_h5(str(d / "train.h5"), 64, channels=3, img_size=16, seed=0)
    val = write_synthetic_h5(str(d / "val.h5"), 24, channels=3, img_size=16, seed=1)
    return train, val


def test_warm_start_copies_matching():
    dst = {
        "patch_embed": {"proj": {"kernel": jnp.zeros((48, 8)), "bias": jnp.zeros((8,))}},
        "head": {"kernel": jnp.full((8, 3), 7.0)},
        "extra": jnp.zeros((4,)),
    }
    src = {
        "patch_embed": {"proj": {"kernel": jnp.ones((48, 8)), "bias": jnp.ones((8,))}},
        "head": {"kernel": jnp.full((8, 3), -1.0)},
        "decoder": {"kernel": jnp.ones((2, 2))},
    }
    out = warm_start_from_mim(dst, src, log_fn=lambda m: None)
    np.testing.assert_array_equal(np.asarray(out["patch_embed"]["proj"]["kernel"]), 1.0)
    # head stays fresh
    np.testing.assert_array_equal(np.asarray(out["head"]["kernel"]), 7.0)
    # unmatched keeps fresh init
    np.testing.assert_array_equal(np.asarray(out["extra"]), 0.0)


@pytest.mark.slow
def test_warm_start_from_real_mim_checkpoint(tmp_path):
    pre = MIMPretrainer(mim_config())
    ckpt_file = str(tmp_path / "mim_t.ckpt.msgpack")
    pre.save(ckpt_file)

    trainer = PredictorTrainer(predictor_config(), mim_config(), seed=7)
    before = np.asarray(trainer.state.params["patch_embed"]["proj"]["kernel"]).copy()
    assert trainer.warm_start(ckpt_file, log_fn=lambda m: None)
    after = np.asarray(trainer.state.params["patch_embed"]["proj"]["kernel"])
    np.testing.assert_allclose(
        after, np.asarray(pre.state.params["patch_embed"]["proj"]["kernel"])
    )
    assert not np.allclose(before, after)
    # encoder blocks copied too
    np.testing.assert_allclose(
        np.asarray(trainer.state.params["encoder"]["block0"]["attn"]["qkv"]["kernel"]),
        np.asarray(pre.state.params["encoder"]["block0"]["attn"]["qkv"]["kernel"]),
    )


@pytest.mark.parametrize("loss_fn", ["mse", "crossentropy"])
@pytest.mark.slow
def test_predictor_training_runs(data_files, loss_fn):
    train, val = data_files
    cfg = predictor_config(loss_fn=loss_fn)
    trainer = PredictorTrainer(cfg, mim_config())
    label_keys = ["class"] if "crossentropy" in loss_fn else ["zspec"]
    batcher = build_h5_batcher(train, batch_size=8, img_size=16, label_keys=label_keys)
    losses = []
    for i, batch in enumerate(batcher.forever()):
        loss, metric = trainer.train_batch(batch)
        losses.append(float(loss))
        if i >= 9:
            break
    assert all(np.isfinite(losses))
    assert trainer.cur_iter == 10


@pytest.mark.slow
def test_lp_regime_only_updates_head(data_files):
    train, _ = data_files
    cfg = predictor_config(train_method="lp")
    trainer = PredictorTrainer(cfg, mim_config())
    p0 = jax.device_get(trainer.state.params)
    batch = next(iter(build_h5_batcher(train, batch_size=8, img_size=16, label_keys=["zspec"])))
    trainer.train_batch(batch)
    p1 = jax.device_get(trainer.state.params)
    # backbone untouched
    np.testing.assert_array_equal(
        p0["encoder"]["block0"]["attn"]["qkv"]["kernel"],
        p1["encoder"]["block0"]["attn"]["qkv"]["kernel"],
    )
    np.testing.assert_array_equal(
        p0["patch_embed"]["proj"]["kernel"], p1["patch_embed"]["proj"]["kernel"]
    )
    # head and pool updated
    assert not np.allclose(p0["head"]["kernel"], p1["head"]["kernel"])
    assert not np.allclose(
        p0["pool"]["xattn"]["kv"]["kernel"], p1["pool"]["xattn"]["kv"]["kernel"]
    )


@pytest.mark.slow
def test_predictor_loop_best_ckpt_and_early_stop(data_files, tmp_path):
    train, val = data_files
    cfg = predictor_config(total_batch_iters=8)
    trainer = PredictorTrainer(cfg, mim_config())
    tb = build_h5_batcher(train, batch_size=8, img_size=16, label_keys=["zspec"])
    vb = build_h5_batcher(val, batch_size=8, img_size=16, label_keys=["zspec"])
    model_file = str(tmp_path / "pred_t.ckpt.msgpack")
    logs = []
    train_predictor_network(
        trainer, tb.forever(), vb, verbose_iters=4, cp_time_minutes=1e9,
        model_filename=model_file, log_fn=logs.append,
    )
    assert os.path.exists(model_file)
    best_file = str(tmp_path / "pred_t_best.ckpt.msgpack")
    assert os.path.exists(best_file)  # first eval always improves over inf
    assert any("best" in m for m in logs)

    # resume from best
    t2 = PredictorTrainer(cfg, mim_config())
    assert t2.restore(best_file)
    assert t2.cur_iter > 0


@pytest.mark.slow
def test_predictor_infer(data_files):
    _, val = data_files
    cfg = predictor_config()
    trainer = PredictorTrainer(cfg, mim_config())
    vb = build_h5_batcher(
        val, batch_size=8, img_size=16, label_keys=["zspec"],
        shuffle=False, drop_remainder=False,
    )
    targets, preds = predictor_infer(trainer.model, trainer.variables(), vb)
    assert targets.shape == (24, 1)
    assert preds.shape == (24, 1)
    assert np.isfinite(preds).all()


@pytest.mark.slow
def test_lp_regime_skips_backbone_backward(data_files):
    """Round-2 fix: frozen subtrees are stop_gradient'ed, so the lp train
    step's compiled FLOPs are close to eval (forward-only) cost instead of
    the full forward+backward the ft regime pays."""

    def step_flops(trainer):
        args = (
            trainer.state,
            jnp.zeros((8, 3, 16, 16), jnp.float32),
            jnp.zeros((8, 2), jnp.float32),
            jnp.zeros((8, 1), jnp.float32),
        )
        comp = trainer._train_step.lower(*args).compile()
        (analysis,) = [comp.cost_analysis()] if isinstance(
            comp.cost_analysis(), dict
        ) else [comp.cost_analysis()[0]]
        return analysis["flops"]

    lp = PredictorTrainer(predictor_config(train_method="lp"), mim_config())
    ft = PredictorTrainer(predictor_config(train_method="ft"), mim_config())
    assert step_flops(lp) < 0.6 * step_flops(ft)
