"""Predictor training: fine-tune / linear-probe / fully-supervised.

Counterpart of the reference ``train_predictor.py`` + ``vit.build_model`` +
``predictor_training_fns.run_iter``:

* dual-config build (architecture from the pretraining config, head/pooling
  from the predictor config);
* warm start from a MIM checkpoint — copy every parameter whose path+shape
  matches, keep the freshly initialized head (reference ``vit.py:224-249``);
* three optimizer regimes via ``train/optim.py`` with the effective LinearLR
  schedule (``vit.py:182-185``);
* losses: cross-entropy + accuracy, or (optionally inverse-uncertainty-
  weighted) MSE + MAE on normalized labels (``predictor_training_fns.py``);
* on-device train-time augmentation (brightness/noise/channel-NaN per
  config, flips+crop always — reference ``train_predictor.py:85-98``);
* best-checkpoint ``_best`` sidecar + early stopping after 50 stale evals.
"""

from __future__ import annotations

import os
import time
from collections import defaultdict
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sky_embeddings_tpu.configuration import Config
from sky_embeddings_tpu.data.augment import augment_batch
from sky_embeddings_tpu.data.prefetch import device_prefetch
from sky_embeddings_tpu.models.predictor import SkyViT, build_predictor_model
from sky_embeddings_tpu.parallel.mesh import batch_sharding, create_mesh, replicated
from sky_embeddings_tpu.train import optim
from sky_embeddings_tpu.train.schedules import linear_lr
from sky_embeddings_tpu.train.state import TrainState
from sky_embeddings_tpu.utils import checkpoint as ckpt


def warm_start_from_mim(predictor_params, mim_params, log_fn=print):
    """Copy path+shape-matching parameters from a MIM tree into a predictor
    tree; the head (and anything unmatched) keeps its fresh init.

    ``predictor_params`` leaves may be real arrays or ShapeDtypeStructs —
    unmatched leaves are returned as-is, so callers can merge on device
    without pulling current values to host.
    """
    copied, skipped = [], []

    def walk(dst, src, path=()):
        out = {}
        for k, v in dst.items():
            if k == "head":
                out[k] = v  # fresh head (trunc_normal 2e-5), ref vit.py:246
                skipped.append("/".join(path + (k,)))
                continue
            if isinstance(v, dict):
                out[k] = walk(v, src.get(k, {}) if isinstance(src, dict) else {}, path + (k,))
            else:
                s = src.get(k) if isinstance(src, dict) else None
                if s is not None and np.shape(s) == np.shape(v):
                    out[k] = jnp.asarray(s)
                    copied.append("/".join(path + (k,)))
                else:
                    out[k] = v
                    skipped.append("/".join(path + (k,)))
        return out

    result = walk(predictor_params, mim_params)
    log_fn(f"Warm start: copied {len(copied)} tensors, kept fresh {len(skipped)}.")
    return result


def make_predictor_step(
    model: SkyViT,
    tx,
    loss_fn_name: str,
    use_label_errs: bool,
    augment: bool,
    augment_params: dict,
    train: bool,
    trainable=None,
    pixel_min=None,
    pixel_max=None,
):
    """(state, cutouts, ra_dec, labels) -> (state, loss, metric).

    ``trainable`` (optional boolean tree) marks which params the regime
    updates; frozen subtrees are wrapped in ``stop_gradient`` so the backward
    pass only extends as deep as the deepest trainable parameter — for the
    'lp' regime XLA then dead-code-eliminates the whole backbone backward
    (the reference pays full backward with frozen param groups,
    ``vit.py:146-161``). ``pixel_min``/``pixel_max``: on-device pixel clip
    (idempotent with host clipping)."""
    is_ce = "crossentropy" in loss_fn_name.lower()

    def compute(params, cutouts, ra_dec, labels, key):
        if trainable is not None:
            params = jax.tree_util.tree_map(
                lambda p, t: p if t else jax.lax.stop_gradient(p), params, trainable
            )
        if pixel_min is not None:
            cutouts = jnp.maximum(cutouts, pixel_min)
        if pixel_max is not None:
            cutouts = jnp.minimum(cutouts, pixel_max)
        cutouts = cutouts.astype(jnp.float32)
        if train and augment:
            key, k_aug = jax.random.split(key)
            cutouts = augment_batch(k_aug, cutouts, **augment_params)

        label_errs = None
        if use_label_errs and not is_ce:
            n = labels.shape[1] // 2
            labels, label_errs = labels[:, :n], labels[:, n:]

        kwargs = {"ra_dec": ra_dec} if model.ra_dec else {}
        rngs = {}
        if train and model.dropout > 0:
            key, k_drop = jax.random.split(key)
            rngs["dropout"] = k_drop
        out = model.apply(
            {"params": params}, cutouts, deterministic=not train, rngs=rngs, **kwargs
        )

        if is_ce:
            tgt = labels.reshape(-1).astype(jnp.int32)
            loss = optax.softmax_cross_entropy_with_integer_labels(out, tgt).mean()
            metric = (jnp.argmax(out, axis=1) == tgt).mean()
        else:
            tgt = model.normalize_labels(labels.astype(jnp.float32))
            per = (out - tgt) ** 2
            if label_errs is not None:
                weights = 1.0 / (label_errs + 1e-5)
                loss = (per * weights).mean()
            else:
                loss = per.mean()
            metric = jnp.abs(out - tgt).mean()
        return loss, metric

    def step(state: TrainState, cutouts, ra_dec, labels):
        rng, k_step, k_next = jax.random.split(state.rng, 3)

        if not train:
            loss, metric = compute(state.params, cutouts, ra_dec, labels, k_step)
            return state, loss, metric

        (loss, metric), grads = jax.value_and_grad(
            lambda p: compute(p, cutouts, ra_dec, labels, k_step), has_aux=True
        )(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state, rng=k_next
        )
        return new_state, loss, metric

    return step


class PredictorTrainer:
    """Model/optimizer/state owner for one predictor run."""

    def __init__(
        self,
        config: Config,
        mae_config: Config,
        mesh=None,
        dtype=None,
        seed: int = 0,
        compat_ft_lr: bool = True,
    ):
        self.config = config
        self.mae_config = mae_config
        # [TRAINING] tensor_parallel / zero_optimizer — same knobs as the
        # MIM pretrainer (see train/pretrain.py); default = pure DP.
        tp = config.training.int("tensor_parallel", 1)
        self.zero_optimizer = config.training.bool("zero_optimizer", False)
        self.mesh = mesh if mesh is not None else create_mesh(model=tp)
        if int(self.mesh.shape.get("model", 1)) > 1:
            # GSPMD can't partition the opaque pallas_call — under TP the
            # encoder runs as XLA einsums (see models/layers.py).
            from sky_embeddings_tpu.models.layers import set_fused_kernels

            set_fused_kernels(False)
        if dtype is None:
            dtype = jnp.dtype(config.training.str("dtype", "float32")).type
        self.model = build_predictor_model(
            config, mae_config, dtype=dtype,
            remat=config.training.bool("remat", False),
        )

        training = config.training
        self.total_batch_iters = training.int("total_batch_iters")
        self.batch_size = training.int("batch_size")
        self.loss_fn_name = training.str("loss_fn", "mse")
        self.use_label_errs = training.bool("use_label_errs", False)
        self.train_method = training.str("train_method", "fs").lower()
        init_lr = training.float("init_lr")
        final_lr_factor = training.float("final_lr_factor")
        weight_decay = training.float("weight_decay", 0.0)
        layer_decay = training.float("layer_decay", 0.75)

        self.augment = training.bool("augment", False)
        self.augment_params = dict(
            brightness=training.float("brightness", 0.8),
            noise=training.float("noise", 0.01),
            nan_channels=training.int("nan_channels", 2),
        )

        key = jax.random.PRNGKey(seed)
        k_param, k_state = jax.random.split(key)
        sample = jnp.zeros(
            (2, self.model.in_chans, self.model.img_size, self.model.img_size),
            jnp.float32,
        )
        init_kwargs = {}
        if self.model.ra_dec:
            init_kwargs["ra_dec"] = jnp.zeros((2, 2), jnp.float32)
        variables = jax.jit(self.model.init)(k_param, sample, **init_kwargs)
        params = variables["params"]

        sched = lambda lr: linear_lr(lr, self.total_batch_iters, final_lr_factor)
        if self.train_method in ("ft", "finetune"):
            self.tx = optim.finetune_optimizer(
                params, sched, self.model.depth, layer_decay,
                init_lr, weight_decay, compat_ft_lr=compat_ft_lr,
            )
        elif self.train_method in ("lp", "linearprobe"):
            self.tx = optim.linear_probe_optimizer(
                params, sched(init_lr), weight_decay, self.model.global_pool
            )
        else:
            self.tx = optim.supervised_optimizer(params, sched(init_lr), weight_decay)

        self.state = TrainState.create(params, self.tx, k_state)
        # Params follow the TP rules (replication at tensor_parallel=1);
        # optimizer state additionally shards over 'data' under ZeRO-1.
        from sky_embeddings_tpu.parallel.sharding import param_shardings
        from sky_embeddings_tpu.parallel.zero import opt_state_shardings

        rep = replicated(self.mesh)
        self.state_shardings = TrainState(
            step=rep,
            params=param_shardings(self.mesh, params),
            opt_state=opt_state_shardings(
                self.mesh, self.tx, self.state.opt_state, params,
                dp=None if self.zero_optimizer else 1,
            ),
            rng=rep,
        )
        self.state = jax.device_put(self.state, self.state_shardings)
        self.batch_shard = batch_sharding(self.mesh)
        self.losses: dict = defaultdict(list)

        trainable = None
        if self.train_method in ("lp", "linearprobe"):
            trainable = optim.trainable_mask(
                params, self.train_method, self.model.global_pool
            )
        self.pixel_min = config.data.float("pixel_min", -3.0)
        pm = config.data.str("pixel_max", "")
        self.pixel_max = float(pm) if pm else None
        common = dict(
            model=self.model,
            tx=self.tx,
            loss_fn_name=self.loss_fn_name,
            use_label_errs=self.use_label_errs,
            augment=self.augment,
            augment_params=self.augment_params,
            trainable=trainable,
            pixel_min=self.pixel_min,
            pixel_max=self.pixel_max,
        )
        self._train_step = jax.jit(
            make_predictor_step(train=True, **common),
            donate_argnums=(0,),
            # pin the state layout so the ZeRO/TP shards survive the update
            out_shardings=(self.state_shardings, None, None),
        )
        self._eval_step = jax.jit(make_predictor_step(train=False, **common))

    # ------------------------------------------------------------------
    @property
    def cur_iter(self) -> int:
        return int(self.state.step)

    def variables(self) -> dict:
        return {"params": self.state.params}

    def train_batch(self, batch: dict):
        self.state, loss, metric = self._train_step(
            self.state, batch["cutouts"], batch["ra_dec"], batch["labels"]
        )
        return loss, metric

    def eval_batch(self, batch: dict):
        if jax.process_count() > 1:
            from sky_embeddings_tpu.parallel.distributed import put_global

            batch = put_global(
                {k: batch[k] for k in ("cutouts", "ra_dec", "labels")},
                self.batch_shard,
            )
        _, loss, metric = self._eval_step(
            self.state, batch["cutouts"], batch["ra_dec"], batch["labels"]
        )
        return loss, metric

    # ------------------------------------------------------------------
    def warm_start(self, mim_checkpoint_path: str, log_fn=print) -> bool:
        payload = ckpt.load_checkpoint(mim_checkpoint_path)
        if payload is None:
            return False
        # Match against shape metadata; merge on device (unmatched leaves —
        # head, geometry mismatches — keep their live fresh values).
        abstract = self.state.abstract()
        mim_params = ckpt.adapt_block_layout(payload["params"], abstract.params)
        merged = warm_start_from_mim(abstract.params, mim_params, log_fn=log_fn)
        params = jax.tree_util.tree_map(
            lambda cur, new, sh: cur
            if isinstance(new, jax.ShapeDtypeStruct)
            else jax.device_put(jnp.asarray(new), sh),
            self.state.params,
            merged,
            self.state_shardings.params,
        )
        self.state = self.state.replace(params=params)
        return True

    def save(self, path: str) -> None:
        if jax.process_index() != 0:
            return  # one writer per run; state is replicated
        ckpt.save_checkpoint(
            path,
            {
                "step": np.asarray(self.state.step),
                "params": jax.device_get(self.state.params),
                "opt_state": jax.device_get(self.state.opt_state),
                "rng": np.asarray(jax.device_get(self.state.rng)),
                "losses": dict(self.losses),
            },
        )

    def restore(self, path: str) -> bool:
        payload = ckpt.load_checkpoint(path)
        if payload is None:
            return False
        # Shape-metadata templates only — no device_get (see pretrain.py).
        abstract = self.state.abstract()
        adapted = ckpt.adapt_block_layout(payload["params"], abstract.params)
        params = ckpt.restore_like(abstract.params, adapted)
        opt_sd = ckpt.adapt_block_layout(
            payload["opt_state"], ckpt.state_dict_template(abstract.opt_state)
        )
        opt_state = ckpt.restore_like(abstract.opt_state, opt_sd)
        rng = payload.get("rng")
        rng = jnp.asarray(rng, jnp.uint32) if rng is not None else jax.random.PRNGKey(1)
        state = TrainState(
            step=jnp.asarray(payload["step"], jnp.int32),
            params=params,
            opt_state=opt_state,
            rng=rng,
        )
        self.state = jax.device_put(state, self.state_shardings)
        self.losses = defaultdict(list, ckpt.losses_to_lists(payload.get("losses", {})))
        return True


def train_predictor_network(
    trainer: PredictorTrainer,
    train_batches,
    val_batcher,
    verbose_iters: int,
    cp_time_minutes: float,
    model_filename: str,
    fig_dir: Optional[str] = None,
    early_stop_evals: int = 50,
    log_fn: Callable[[str], None] = print,
) -> None:
    """The predictor loop (reference ``train_predictor.train_network``):
    full-val evals, best-model sidecar, early stopping, periodic saves."""
    losses = trainer.losses
    total = trainer.total_batch_iters
    is_ce = "crossentropy" in trainer.loss_fn_name.lower()
    metric_name = "acc" if is_ce else "mae"
    best_val = min(losses["val_loss"]) if losses.get("val_loss") else np.inf
    stale = 0
    losses_cp: dict = defaultdict(list)
    cp_start = time.time()
    best_filename = model_filename.replace(ckpt.CKPT_SUFFIX, "_best" + ckpt.CKPT_SUFFIX)
    model_name = os.path.basename(model_filename).split(".")[0]

    if trainer.cur_iter >= total:
        log_fn("Training already complete for this config; nothing to do.")
        return

    stream = device_prefetch(train_batches, size=2, sharding=trainer.batch_shard)
    for batch in stream:
        loss, metric = trainer.train_batch(batch)
        losses_cp["train_loss"].append(loss)
        losses_cp[f"train_{metric_name}"].append(metric)
        cur_iter = trainer.cur_iter

        if cur_iter % verbose_iters == 0:
            for vbatch in val_batcher:
                vloss, vmetric = trainer.eval_batch(vbatch)
                losses_cp["val_loss"].append(vloss)
                losses_cp[f"val_{metric_name}"].append(vmetric)

            for k in losses_cp:
                losses[k].append(float(np.mean([float(x) for x in losses_cp[k]])))
            losses["batch_iters"].append(cur_iter)
            losses_cp = defaultdict(list)

            log_fn(
                f"Batch Iterations: {cur_iter}/{total} | "
                f"train loss {losses['train_loss'][-1]:.3e} | "
                f"val loss {losses['val_loss'][-1]:.3e} | "
                f"val {metric_name} {losses[f'val_{metric_name}'][-1]:.4f}"
            )

            if fig_dir is not None and len(losses["batch_iters"]) > 1:
                from sky_embeddings_tpu.utils.plotting import plot_progress

                plot_progress(
                    losses,
                    savename=os.path.join(fig_dir, f"{model_name}_progress.png"),
                )

            if losses["val_loss"][-1] < best_val:
                best_val = losses["val_loss"][-1]
                log_fn("Saving network (best)...")
                trainer.losses = losses
                trainer.save(best_filename)
                stale = 0
            else:
                stale += 1
                if stale >= early_stop_evals:
                    log_fn(f"Early stopping after {stale} stale evaluations.")
                    trainer.losses = losses
                    trainer.save(model_filename)
                    return

        if (time.time() - cp_start) >= cp_time_minutes * 60:
            log_fn("Saving network...")
            trainer.losses = losses
            trainer.save(model_filename)
            cp_start = time.time()

        if cur_iter >= total:
            log_fn("Saving network...")
            trainer.losses = losses
            trainer.save(model_filename)
            break
