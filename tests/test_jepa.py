"""I-JEPA tests: mask sampling invariants, model forward, trainer step/EMA."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sky_embeddings_tpu.configuration import Config
from sky_embeddings_tpu.models.jepa import SkyJEPA, build_jepa_model
from sky_embeddings_tpu.ops.jepa_masks import sample_block_masks
from sky_embeddings_tpu.train.jepa import JEPATrainer


def jepa_config(**over):
    training = dict(
        batch_size=8, ema="[0.9, 1.0]", total_batch_iters=10,
        weight_decay=0.04, final_weight_decay=0.4,
        start_lr=2e-4, ref_lr=1e-3, final_lr=1e-6,
    )
    training.update(over)
    return Config.from_dict({
        "DATA": {},
        "TRAINING": training,
        "MASK": dict(
            allow_overlap=False, aspect_ratio="[0.75, 1.5]",
            enc_mask_scale="[0.85, 1.0]", min_keep=5,
            num_enc_masks=1, num_pred_masks=4, pred_mask_scale="[0.15, 0.2]",
        ),
        "ARCHITECTURE": dict(
            img_size=16, num_channels=3, pixel_mean=0.0, pixel_std=1.0,
            patch_size=4, model_type="tiny", pred_depth=2, pred_emb_dim=96,
        ),
    }, name="jepa_t")


def test_mask_sampling_invariants():
    grid = 8
    masks = sample_block_masks(jax.random.PRNGKey(0), 32, grid)
    L = grid * grid
    assert masks.ctx_idx.shape[0] == 32
    assert masks.tgt_idx.shape[:2] == (32, 4)
    # indices in range
    assert int(masks.ctx_idx.max()) < L and int(masks.ctx_idx.min()) >= 0
    assert int(masks.tgt_idx.max()) < L
    # at least min_keep valid context and some valid targets per sample
    assert (np.asarray(masks.ctx_valid).sum(axis=1) >= 5).all()
    assert (np.asarray(masks.tgt_valid).sum(axis=(1, 2)) >= 4).all()
    # no-overlap: valid context tokens never appear in any valid target block
    ctx_i = np.asarray(masks.ctx_idx)
    ctx_v = np.asarray(masks.ctx_valid)
    tgt_i = np.asarray(masks.tgt_idx)
    tgt_v = np.asarray(masks.tgt_valid)
    violations = 0
    for b in range(32):
        ctx_set = set(ctx_i[b][ctx_v[b]].tolist())
        tgt_set = set(tgt_i[b][tgt_v[b]].tolist())
        violations += len(ctx_set & tgt_set)
    assert violations == 0


def test_mask_target_sizes_in_range():
    grid = 8
    masks = sample_block_masks(jax.random.PRNGKey(1), 64, grid)
    sizes = np.asarray(masks.tgt_valid).sum(axis=2).reshape(-1)
    L = grid * grid
    # block areas ~ scale*L with rounding of rectangle dims
    assert sizes.min() >= 4
    assert sizes.max() <= np.ceil(0.2 * L) + 4


@pytest.mark.slow
def test_jepa_forward():
    model = build_jepa_model(jepa_config())
    assert model.embed_dim == 192 and model.pred_embed_dim == 96
    imgs = jnp.asarray(
        np.random.default_rng(0).normal(size=(4, 3, 16, 16)).astype(np.float32)
    )
    masks = sample_block_masks(jax.random.PRNGKey(0), 4, model.grid_size)
    tgt = jnp.zeros((4, model.grid_size ** 2, model.embed_dim))
    variables = model.init(jax.random.PRNGKey(1), imgs, masks, tgt)
    loss = model.apply(variables, imgs, masks, tgt)
    assert np.isfinite(float(loss))
    # encode: full grid representation
    repr_full = model.apply(variables, imgs, method=SkyJEPA.encode)
    assert repr_full.shape == (4, 16, 192)


@pytest.mark.slow
def test_jepa_trainer_step_and_ema():
    trainer = JEPATrainer(jepa_config())
    rng = np.random.default_rng(1)
    batch = {
        "cutouts": rng.normal(size=(8, 3, 16, 16)).astype(np.float32),
        "ra_dec": rng.uniform(0, 90, size=(8, 2)).astype(np.float32),
    }
    t0 = jax.device_get(trainer.state.target_params)
    p0 = jax.device_get(trainer.state.params["encoder"])
    # target starts as a copy of the online encoder
    np.testing.assert_allclose(
        jax.tree_util.tree_leaves(t0)[0], jax.tree_util.tree_leaves(p0)[0]
    )
    losses = [float(trainer.train_batch(batch)) for _ in range(3)]
    assert all(np.isfinite(losses))
    # the shared train_network val pass calls eval_batch(batch, idx=i) —
    # regression for the signature (caught live on a TPU smoke run) — and
    # different idx values must draw different val masks
    ev0 = float(trainer.eval_batch(batch, idx=0))
    ev1 = float(trainer.eval_batch(batch, idx=1))
    assert np.isfinite(ev0) and np.isfinite(ev1)
    assert ev0 != ev1
    t1 = jax.device_get(trainer.state.target_params)
    p1 = jax.device_get(trainer.state.params["encoder"])
    a = jax.tree_util.tree_leaves(t1)[0]
    b = jax.tree_util.tree_leaves(p1)[0]
    c = jax.tree_util.tree_leaves(t0)[0]
    # EMA target moved, but less than the online encoder
    assert not np.allclose(a, c)
    assert np.abs(a - c).mean() < np.abs(b - jax.tree_util.tree_leaves(p0)[0]).mean()


@pytest.mark.slow
def test_jepa_checkpoint_roundtrip(tmp_path):
    trainer = JEPATrainer(jepa_config())
    rng = np.random.default_rng(2)
    batch = {
        "cutouts": rng.normal(size=(8, 3, 16, 16)).astype(np.float32),
        "ra_dec": np.zeros((8, 2), np.float32),
    }
    trainer.train_batch(batch)
    path = str(tmp_path / "jepa_t.ckpt.msgpack")
    trainer.losses["train_loss"].append(1.0)
    trainer.save(path)

    t2 = JEPATrainer(jepa_config())
    assert t2.restore(path)
    assert t2.cur_iter == 1
    np.testing.assert_allclose(
        jax.tree_util.tree_leaves(jax.device_get(t2.state.target_params))[0],
        jax.tree_util.tree_leaves(jax.device_get(trainer.state.target_params))[0],
    )


@pytest.mark.slow
def test_jepa_loss_decreases():
    trainer = JEPATrainer(jepa_config(total_batch_iters=40, ref_lr=3e-3))
    rng = np.random.default_rng(3)
    batch = {
        "cutouts": rng.normal(size=(8, 3, 16, 16)).astype(np.float32),
        "ra_dec": np.zeros((8, 2), np.float32),
    }
    first = float(trainer.train_batch(batch))
    for _ in range(25):
        last = float(trainer.train_batch(batch))
    assert last < first


def test_committed_jepa_validation_artifact():
    """Gate on the committed full-scale JEPA learning record
    (results/jepa_validation.json, produced on TPU by
    tools/jepa_validation.py — the r4 VERDICT #7 protocol): the probe
    accuracy AND redshift R² must rise during I-JEPA pretraining on the
    structured survey, mirroring the MIM semantic-validation gate."""
    import json
    import os

    import pytest

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "results", "jepa_validation.json",
    )
    if not os.path.exists(path):
        pytest.skip("full-scale jepa_validation.json not committed yet")
    with open(path) as f:
        results = json.load(f)

    pre = results["pretrain"]
    acc, r2 = pre["val_lp_acc"], pre["val_lp_r2"]
    assert max(acc) >= acc[0] + 0.05, f"probe accuracy flat: {acc[0]} -> {max(acc)}"
    assert max(r2) >= r2[0] + 0.05, f"probe R2 flat: {r2[0]} -> {max(r2)}"
