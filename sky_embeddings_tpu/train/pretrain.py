"""MIM pretraining: compiled step + host loop.

The reference loop (``pretrain_mim.py:138-259``) per iteration does H2D
copies, forward/backward, optimizer+scheduler steps; every ``verbose_iters``
a ≤200-batch validation pass and optional sklearn linear probes; wall-clock
checkpointing every ``cp_time`` minutes and at the end.

TPU-native translation:
* one ``jax.jit`` train step — SimMIM mask generation, forward, backward,
  AdamW update all on device, state donated (no HBM churn);
* batch sharded over the mesh 'data' axis, params replicated (or TP-sharded);
  gradient reduction is just XLA's global sum — no explicit collectives;
* the host only streams raw h5 batches and logs.
"""

from __future__ import annotations

import os
import time
from collections import defaultdict
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sky_embeddings_tpu.configuration import Config
from sky_embeddings_tpu.data.h5_loader import H5Batcher, build_h5_batcher
from sky_embeddings_tpu.data.prefetch import device_prefetch
from sky_embeddings_tpu.models.mim import SkyMIM, build_mim_model
from sky_embeddings_tpu.ops.masking import simmim_batch_mask
from sky_embeddings_tpu.parallel.mesh import batch_sharding, create_mesh, replicated
from sky_embeddings_tpu.train.optim import pretrain_optimizer
from sky_embeddings_tpu.train.schedules import cosine_annealing
from sky_embeddings_tpu.train.state import TrainState
from sky_embeddings_tpu.utils import checkpoint as ckpt


def make_mim_step(
    model: SkyMIM,
    tx,
    max_mask_ratio: Optional[float],
    train: bool,
    pixel_min: Optional[float] = None,
    pixel_max: Optional[float] = None,
):
    """Build the step function: ``(state, cutouts, ra_dec) -> (state, loss)``
    when training, ``(state, cutouts, ra_dec, idx) -> (state, loss)`` in eval
    (``idx`` = val-batch index, folded into the mask key so every val batch of
    every eval pass draws a fresh mask — the reference draws masks loader-side,
    ``pretrain_mim.py:174-187``).

    SimMIM masks are drawn on device per step; MAE token masking uses the
    model's 'mask' rng stream. ``pixel_min``/``pixel_max`` apply the loader's
    pixel clip on device (fused into the step; idempotent with host clipping,
    so it is safe for batches that were already clipped).
    """

    def step(state: TrainState, cutouts, ra_dec, idx=None):
        rng, k_mask, k_next = jax.random.split(state.rng, 3)
        if not train and idx is not None:
            # vary masks across val batches and across eval passes
            k_mask = jax.random.fold_in(jax.random.fold_in(k_mask, idx), state.step)
        if pixel_min is not None:
            cutouts = jnp.maximum(cutouts, pixel_min)
        if pixel_max is not None:
            cutouts = jnp.minimum(cutouts, pixel_max)
        cutouts = cutouts.astype(jnp.float32)

        def loss_fn(params):
            variables = {"params": params}
            kwargs = {}
            if model.ra_dec:
                kwargs["ra_dec"] = ra_dec
            if model.simmim:
                mask = simmim_batch_mask(
                    k_mask,
                    cutouts.shape[0],
                    model.in_chans,
                    model.img_size,
                    model.patch_size,
                    max_mask_ratio if max_mask_ratio is not None else 0.9,
                )
                loss, _, _ = model.apply(variables, cutouts, mask=mask, **kwargs)
            else:
                loss, _, _ = model.apply(
                    variables, cutouts, rngs={"mask": k_mask}, **kwargs
                )
            return loss

        if not train:
            return state, loss_fn(state.params)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        import optax

        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state, rng=k_next
        )
        return new_state, loss

    return step


class MIMPretrainer:
    """Owns model/optimizer/state + compiled steps for one pretraining run."""

    def __init__(
        self,
        config: Config,
        mesh=None,
        dtype=None,
        seed: int = 0,
        remat: Optional[bool] = None,
    ):
        self.config = config
        # [TRAINING] tensor_parallel: 'model'-axis size for Megatron-style TP
        # (parallel/sharding.py rules); 1 = pure data parallelism.
        # [TRAINING] zero_optimizer: shard AdamW moments 1/dp over 'data'
        # (ZeRO-1, parallel/zero.py) — the fixed-memory lever for large
        # models on small meshes.
        tp = config.training.int("tensor_parallel", 1)
        self.zero_optimizer = config.training.bool("zero_optimizer", False)
        self.mesh = mesh if mesh is not None else create_mesh(model=tp)
        if int(self.mesh.shape.get("model", 1)) > 1:
            # GSPMD can't partition the opaque pallas_call: under TP the
            # encoder must run as XLA einsums (which GSPMD shards natively)
            # or every fused kernel would all-gather its sharded weights.
            from sky_embeddings_tpu.models.layers import set_fused_kernels

            set_fused_kernels(False)
        if dtype is None:
            # [TRAINING] dtype = float32 (reference-parity default) | bfloat16
            # (recommended on TPU: ~2x step throughput, fused kernels)
            dtype = jnp.dtype(config.training.str("dtype", "float32")).type
        if remat is None:
            # [TRAINING] remat: checkpoint each block (large models / big
            # batches trade ~1 extra forward for O(depth) less live memory)
            remat = config.training.bool("remat", False)
        self.model = build_mim_model(config, dtype=dtype, remat=remat)

        training = config.training
        self.total_batch_iters = training.int("total_batch_iters")
        self.batch_size = training.int("batch_size")
        init_lr = training.float("init_lr")
        final_lr_factor = training.float("final_lr_factor")
        weight_decay = training.float("weight_decay")
        if self.model.simmim:
            self.max_mask_ratio = training.float("max_mask_ratio", 0.9)
        else:
            self.max_mask_ratio = None
        # pixel clip applied on device inside the jitted step (idempotent
        # with host-side clipping; lets the loader skip its clip pass)
        self.pixel_min = config.data.float("pixel_min", -3.0)
        pm = config.data.str("pixel_max", "")
        self.pixel_max = float(pm) if pm else None

        self.schedule = cosine_annealing(init_lr, self.total_batch_iters, final_lr_factor)

        # Initialize params (abstractly cheap at these sizes; on host then
        # placed replicated on the mesh).
        key = jax.random.PRNGKey(seed)
        k_param, k_mask, k_state = jax.random.split(key, 3)
        sample = jnp.zeros(
            (2, self.model.in_chans, self.model.img_size, self.model.img_size),
            jnp.float32,
        )
        init_kwargs = {}
        if self.model.ra_dec:
            init_kwargs["ra_dec"] = jnp.zeros((2, 2), jnp.float32)
        # NOTE: always jit the init — eager init dispatches thousands of tiny
        # ops, which is pathological over a remote/tunneled TPU runtime.
        if self.model.simmim:
            variables = jax.jit(self.model.init)(
                k_param, sample, mask=jnp.zeros_like(sample), **init_kwargs
            )
        else:
            variables = jax.jit(self.model.init)(
                {"params": k_param, "mask": k_mask}, sample, **init_kwargs
            )
        params = variables["params"]

        self.tx = pretrain_optimizer(params, self.schedule, weight_decay)
        self.state = TrainState.create(params, self.tx, k_state)
        self.losses: dict = defaultdict(list)

        # Place state on the mesh: params follow the TP rules (which collapse
        # to replication at tensor_parallel=1), AdamW moments additionally
        # shard 1/dp over 'data' under ZeRO-1. Batches are data-sharded.
        from sky_embeddings_tpu.parallel.sharding import param_shardings
        from sky_embeddings_tpu.parallel.zero import opt_state_shardings

        rep = replicated(self.mesh)
        p_sh = param_shardings(self.mesh, params)
        opt_sh = opt_state_shardings(
            self.mesh, self.tx, self.state.opt_state, params,
            dp=None if self.zero_optimizer else 1,
        )
        self.state_shardings = TrainState(
            step=rep, params=p_sh, opt_state=opt_sh, rng=rep
        )
        self.state = jax.device_put(self.state, self.state_shardings)
        self.batch_shard = batch_sharding(self.mesh)

        clip = dict(pixel_min=self.pixel_min, pixel_max=self.pixel_max)
        self._train_step = jax.jit(
            make_mim_step(self.model, self.tx, self.max_mask_ratio, train=True, **clip),
            donate_argnums=(0,),
            # pin the output layout so the ZeRO/TP shards survive the update
            out_shardings=(self.state_shardings, None),
        )
        self._eval_step = jax.jit(
            make_mim_step(self.model, self.tx, self.max_mask_ratio, train=False, **clip)
        )

    # ------------------------------------------------------------------
    @property
    def cur_iter(self) -> int:
        return int(self.state.step)

    def variables(self) -> dict:
        return {"params": self.state.params}

    def train_batch(self, batch: dict) -> jax.Array:
        self.state, loss = self._train_step(
            self.state, batch["cutouts"], batch["ra_dec"]
        )
        return loss

    def eval_batch(self, batch: dict, idx: int = 0) -> jax.Array:
        if jax.process_count() > 1:
            from sky_embeddings_tpu.parallel.distributed import put_global

            batch = put_global(
                {k: batch[k] for k in ("cutouts", "ra_dec")}, self.batch_shard
            )
        _, loss = self._eval_step(
            self.state, batch["cutouts"], batch["ra_dec"], jnp.int32(idx)
        )
        return loss

    # ------------------------------------------------------------------
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
        # Templates from shape metadata only — never device_get here (leaf-
        # by-leaf transfers over a tunneled runtime take minutes).
        abstract = self.state.abstract()
        # Accept checkpoints saved with either encoder layout (loop vs scan).
        adapted = ckpt.adapt_block_layout(payload["params"], abstract.params)
        params = ckpt.restore_like(abstract.params, adapted)
        opt_sd = ckpt.adapt_block_layout(
            payload["opt_state"], ckpt.state_dict_template(abstract.opt_state)
        )
        opt_state = ckpt.restore_like(abstract.opt_state, opt_sd)
        rng = payload.get("rng")
        rng = (
            jnp.asarray(rng, jnp.uint32) if rng is not None else jax.random.PRNGKey(1)
        )
        state = TrainState(
            step=jnp.asarray(payload["step"], jnp.int32),
            params=params,
            opt_state=opt_state,
            rng=rng,
        )
        self.state = jax.device_put(state, self.state_shardings)
        self.losses = defaultdict(list, ckpt.losses_to_lists(payload.get("losses", {})))
        return True


def train_network(
    pretrainer: MIMPretrainer,
    train_batches,
    val_batcher: Optional[H5Batcher],
    total_batch_iters: int,
    verbose_iters: int,
    cp_time_minutes: float,
    model_filename: str,
    fig_dir: Optional[str] = None,
    lp_class_data_file: Optional[str] = None,
    lp_regress_data_file: Optional[str] = None,
    lp_combine: str = "central",
    max_val_batches: int = 200,
    log_fn: Callable[[str], None] = print,
) -> None:
    """The pretraining loop (reference ``pretrain_mim.train_network``)."""
    losses = pretrainer.losses
    losses_cp: dict = defaultdict(list)
    cp_start = time.time()
    model_name = os.path.basename(model_filename).split(".")[0]

    if pretrainer.cur_iter >= total_batch_iters:
        log_fn("Training already complete for this config; nothing to do.")
        return

    from sky_embeddings_tpu.utils.profiling import StepTimer

    timer = StepTimer(batch_size=pretrainer.batch_size)
    stream = device_prefetch(train_batches, size=2, sharding=pretrainer.batch_shard)
    for batch in stream:
        loss = pretrainer.train_batch(batch)
        losses_cp["train_loss"].append(loss)
        timer.step()
        cur_iter = pretrainer.cur_iter

        if cur_iter % verbose_iters == 0:
            perf = timer.lap(loss)  # close the timing window before eval work
            # Validation pass (≤ max_val_batches, ref pretrain_mim.py:186-187)
            if val_batcher is not None:
                for i, vbatch in enumerate(val_batcher.take(max_val_batches)):
                    losses_cp["val_loss"].append(pretrainer.eval_batch(vbatch, idx=i))
            if lp_class_data_file or lp_regress_data_file:
                from sky_embeddings_tpu.eval.linear_probe import linear_probe

                probe = linear_probe(
                    pretrainer.model,
                    pretrainer.variables(),
                    lp_class_data_file,
                    lp_regress_data_file,
                    combine=lp_combine,
                    img_size=pretrainer.model.img_size,
                )
                for k, v in probe.items():
                    losses_cp[k].append(v)

            for k in losses_cp:
                losses[k].append(float(np.mean([float(x) for x in losses_cp[k]])))
            losses["batch_iters"].append(cur_iter)
            losses_cp = defaultdict(list)

            msg = [f"Batch Iterations: {cur_iter}/{total_batch_iters}"]
            msg.append(f"  train loss {losses['train_loss'][-1]:.4f}")
            if perf.get("img_per_sec"):
                msg.append(f"  {perf['img_per_sec']:.0f} img/s")
            if losses.get("val_loss"):
                msg.append(f"  val loss {losses['val_loss'][-1]:.4f}")
            if losses.get("val_lp_acc"):
                msg.append(f"  lp acc {losses['val_lp_acc'][-1]:.3f}")
            if losses.get("val_lp_r2"):
                msg.append(f"  lp r2 {losses['val_lp_r2'][-1]:.3f}")
            log_fn(" |".join(msg))

            if fig_dir is not None and len(losses["batch_iters"]) > 1:
                from sky_embeddings_tpu.utils.plotting import plot_batch, plot_progress

                plot_progress(
                    losses,
                    savename=os.path.join(fig_dir, f"{model_name}_progress.png"),
                )
                if val_batcher is not None and isinstance(pretrainer.model, SkyMIM):
                    from sky_embeddings_tpu.eval.eval_fns import mim_reconstruct
                    from sky_embeddings_tpu.utils.plotting import plot_batch_tiled

                    first = next(val_batcher.take(1))
                    pred, masked, orig = mim_reconstruct(
                        pretrainer.model,
                        pretrainer.variables(),
                        first,
                        jax.random.PRNGKey(cur_iter),
                        max_mask_ratio=pretrainer.max_mask_ratio,
                    )
                    plot_batch(
                        orig, masked, pred, n_samples=5,
                        savename=os.path.join(fig_dir, f"{model_name}_{cur_iter}iters.png"),
                    )
                    if orig.shape[-1] > 1:  # all-band mosaic (ref plot_batch_tiled)
                        plot_batch_tiled(
                            orig, masked, pred, n_samples=5,
                            savename=os.path.join(
                                fig_dir, f"{model_name}_{cur_iter}iters_tiled.png"
                            ),
                        )

        if (time.time() - cp_start) >= cp_time_minutes * 60:
            log_fn("Saving network...")
            pretrainer.losses = losses
            pretrainer.save(model_filename)
            cp_start = time.time()

        if cur_iter >= total_batch_iters:
            log_fn("Saving network...")
            pretrainer.losses = losses
            pretrainer.save(model_filename)
            break
