"""I-JEPA training: EMA target encoder, scheduled weight decay, warmup-cosine LR.

Hyperparameter surface follows the reference config (``configs/jepa_1.ini``):
``ema = [m0, m1]`` (momentum ramps linearly m0→m1 over training),
``weight_decay → final_weight_decay`` (cosine ramp), and
``start_lr / ref_lr / final_lr`` (linear warmup to ref over 10% of training,
cosine decay to final). The whole step — mask sampling, EMA-target encoding,
context/predictor forward, backward, AdamW update, EMA update — is one jit.
"""

from __future__ import annotations

import math
from collections import defaultdict
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from sky_embeddings_tpu.configuration import Config
from sky_embeddings_tpu.models.jepa import SkyJEPA, build_jepa_model
from sky_embeddings_tpu.ops.jepa_masks import sample_block_masks
from sky_embeddings_tpu.parallel.mesh import batch_sharding, create_mesh, replicated
from sky_embeddings_tpu.train.optim import decay_mask
from sky_embeddings_tpu.utils import checkpoint as ckpt


class JEPAState(struct.PyTreeNode):
    step: jax.Array
    params: Any          # context encoder + predictor
    target_params: Any   # EMA copy of the encoder subtree
    opt_state: Any
    rng: jax.Array

    def abstract(self) -> "JEPAState":
        return jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), self
        )


def scheduled_weight_decay(schedule, mask) -> optax.GradientTransformation:
    """add_decayed_weights with a step-dependent coefficient."""

    def init_fn(params):
        return optax.ScaleByScheduleState(count=jnp.zeros([], jnp.int32))

    def update_fn(updates, state, params):
        wd = schedule(state.count)
        updates = jax.tree_util.tree_map(
            lambda u, p, m: u + wd * p if m else u, updates, params, mask
        )
        return updates, optax.ScaleByScheduleState(count=state.count + 1)

    return optax.GradientTransformation(init_fn, update_fn)


class JEPATrainer:
    def __init__(self, config: Config, mesh=None, dtype=None, seed: int = 0):
        self.config = config
        # [TRAINING] tensor_parallel / zero_optimizer — same knobs as the
        # MIM pretrainer (train/pretrain.py); default = pure DP.
        tp = config.training.int("tensor_parallel", 1)
        self.zero_optimizer = config.training.bool("zero_optimizer", False)
        self.mesh = mesh if mesh is not None else create_mesh(model=tp)
        if int(self.mesh.shape.get("model", 1)) > 1:
            from sky_embeddings_tpu.models.layers import set_fused_kernels

            set_fused_kernels(False)
        if dtype is None:
            dtype = jnp.dtype(config.training.str("dtype", "float32")).type
        self.model = build_jepa_model(config, dtype=dtype)

        training = config.training
        mask_cfg = config["MASK"] if "MASK" in config else None
        self.total_batch_iters = training.int("total_batch_iters")
        self.batch_size = training.int("batch_size")
        self.max_mask_ratio = None  # loop-compat with MIMPretrainer

        ema = training.list("ema", [0.996, 1.0])
        self.ema0, self.ema1 = float(ema[0]), float(ema[1])

        self.mask_params = dict(
            num_pred=mask_cfg.int("num_pred_masks", 4) if mask_cfg else 4,
            pred_mask_scale=tuple(mask_cfg.list("pred_mask_scale", [0.15, 0.2])) if mask_cfg else (0.15, 0.2),
            enc_mask_scale=tuple(mask_cfg.list("enc_mask_scale", [0.85, 1.0])) if mask_cfg else (0.85, 1.0),
            aspect_ratio=tuple(mask_cfg.list("aspect_ratio", [0.75, 1.5])) if mask_cfg else (0.75, 1.5),
            min_keep=mask_cfg.int("min_keep", 5) if mask_cfg else 5,
        )

        start_lr = training.float("start_lr", 2e-4)
        ref_lr = training.float("ref_lr", 1e-3)
        final_lr = training.float("final_lr", 1e-6)
        warmup = max(int(0.1 * self.total_batch_iters), 1)
        self.lr_schedule = optax.warmup_cosine_decay_schedule(
            init_value=start_lr, peak_value=ref_lr, warmup_steps=warmup,
            decay_steps=self.total_batch_iters, end_value=final_lr,
        )
        wd0 = training.float("weight_decay", 0.04)
        wd1 = training.float("final_weight_decay", wd0)
        total = self.total_batch_iters

        def wd_schedule(step):
            frac = jnp.clip(step / total, 0.0, 1.0)
            return wd1 + (wd0 - wd1) * 0.5 * (1.0 + jnp.cos(jnp.pi * frac))

        key = jax.random.PRNGKey(seed)
        k_param, k_state = jax.random.split(key)
        sample = jnp.zeros(
            (2, self.model.in_chans, self.model.img_size, self.model.img_size),
            jnp.float32,
        )
        masks = sample_block_masks(k_param, 2, self.model.grid_size, **self.mask_params)
        tgt0 = jnp.zeros(
            (2, self.model.grid_size ** 2, self.model.embed_dim), jnp.float32
        )
        variables = jax.jit(self.model.init)(k_param, sample, masks, tgt0)
        params = variables["params"]

        self.tx = optax.chain(
            optax.scale_by_adam(b1=0.9, b2=0.999),
            scheduled_weight_decay(wd_schedule, decay_mask(params)),
            optax.scale_by_learning_rate(self.lr_schedule),
        )

        self.state = JEPAState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            target_params=jax.tree_util.tree_map(jnp.copy, params["encoder"]),
            opt_state=jax.jit(self.tx.init)(params),
            rng=k_state,
        )
        # Params + EMA targets follow the TP rules (replication at tp=1);
        # optimizer state additionally shards over 'data' under ZeRO-1.
        from sky_embeddings_tpu.parallel.sharding import param_shardings
        from sky_embeddings_tpu.parallel.zero import opt_state_shardings

        rep = replicated(self.mesh)
        self.state_shardings = JEPAState(
            step=rep,
            params=param_shardings(self.mesh, params),
            target_params=param_shardings(self.mesh, self.state.target_params),
            opt_state=opt_state_shardings(
                self.mesh, self.tx, self.state.opt_state, params,
                dp=None if self.zero_optimizer else 1,
            ),
            rng=rep,
        )
        self.state = jax.device_put(self.state, self.state_shardings)
        self.batch_shard = batch_sharding(self.mesh)
        self.losses: dict = defaultdict(list)

        self._train_step = jax.jit(
            self._make_step(train=True),
            donate_argnums=(0,),
            # pin the state layout so the ZeRO/TP shards survive the update
            out_shardings=(self.state_shardings, None),
        )
        self._eval_step = jax.jit(self._make_step(train=False))

    # ------------------------------------------------------------------
    def _make_step(self, train: bool):
        model = self.model
        tx = self.tx
        total = self.total_batch_iters
        ema0, ema1 = self.ema0, self.ema1
        mask_params = self.mask_params

        def step(state: JEPAState, imgs, ra_dec, idx=None):
            del ra_dec  # position conditioning not part of I-JEPA
            rng, k_mask, k_next = jax.random.split(state.rng, 3)
            if not train and idx is not None:
                # fresh block masks per val batch and per eval pass (same
                # convention as make_mim_step)
                k_mask = jax.random.fold_in(jax.random.fold_in(k_mask, idx), state.step)
            masks = sample_block_masks(
                k_mask, imgs.shape[0], model.grid_size, **mask_params
            )
            target_repr = jax.lax.stop_gradient(
                model.apply({"params": {"encoder": state.target_params}},
                            imgs, method=SkyJEPA.encode)
            )

            def loss_fn(p):
                return model.apply({"params": p}, imgs, masks, target_repr)

            if not train:
                return state, loss_fn(state.params)

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)

            m = ema0 + (ema1 - ema0) * jnp.clip(state.step / total, 0.0, 1.0)
            target_params = jax.tree_util.tree_map(
                lambda t, s: t * m + s.astype(t.dtype) * (1.0 - m),
                state.target_params,
                params["encoder"],
            )
            return (
                state.replace(
                    step=state.step + 1, params=params,
                    target_params=target_params, opt_state=opt_state, rng=k_next,
                ),
                loss,
            )

        return step

    # ------------------------------------------------------------------
    @property
    def cur_iter(self) -> int:
        return int(self.state.step)

    def variables(self) -> dict:
        return {"params": self.state.params}

    def target_variables(self) -> dict:
        """EMA encoder variables — the representation used downstream."""
        return {"params": {"encoder": jax.device_get(self.state.target_params)}}

    def train_batch(self, batch: dict):
        self.state, loss = self._train_step(self.state, batch["cutouts"], batch["ra_dec"])
        return loss

    def eval_batch(self, batch: dict, idx: int = 0):
        _, loss = self._eval_step(
            self.state, batch["cutouts"], batch["ra_dec"], jnp.int32(idx)
        )
        return loss

    # ------------------------------------------------------------------
    def save(self, path: str) -> None:
        ckpt.save_checkpoint(
            path,
            {
                "step": np.asarray(self.state.step),
                "params": jax.device_get(self.state.params),
                "target_params": jax.device_get(self.state.target_params),
                "opt_state": jax.device_get(self.state.opt_state),
                "rng": np.asarray(jax.device_get(self.state.rng)),
                "losses": dict(self.losses),
            },
        )

    def restore(self, path: str) -> bool:
        payload = ckpt.load_checkpoint(path)
        if payload is None:
            return False
        abstract = self.state.abstract()
        state = JEPAState(
            step=jnp.asarray(payload["step"], jnp.int32),
            params=ckpt.restore_like(abstract.params, payload["params"]),
            target_params=ckpt.restore_like(
                abstract.target_params, payload["target_params"]
            ),
            opt_state=ckpt.restore_like(abstract.opt_state, payload["opt_state"]),
            rng=jnp.asarray(payload["rng"], jnp.uint32),
        )
        self.state = jax.device_put(state, self.state_shardings)
        self.losses = defaultdict(list, ckpt.losses_to_lists(payload.get("losses", {})))
        return True
