#!/usr/bin/env python
"""Per-stage timing of the predictor fine-tune step (VERDICT r3 #6).

``BENCH_r03.json`` put the predictor fine-tune at 54.9% MFU vs the 59.9%
SimMIM flagship — same fused ViT-B encoder, no decoder, yet 5 points down,
and BASELINE.md had no breakdown of where they go. This tool times the ft
step's pieces in isolation so the gap is attributable:

  * the full ft step at the bench geometry (B=256, map-pool head, MSE,
    layer-decay AdamW) and at the flagship batch (B=1024);
  * the bare encoder fwd+bwd chain at both batch sizes (is it batch-size
    kernel efficiency?);
  * the optimizer update alone (grads precomputed — is it the
    multi_transform layer-decay bookkeeping?);
  * the map-pool head + loss alone on a frozen encoder output.

    python tools/ft_breakdown.py [-n 20]

Sync note: the tunneled runtime's block_until_ready returns early; every
timing loop ends with a host transfer (float()).
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timed(fn, *args, n=20, sync=lambda out: float(jnp.asarray(out[0]).ravel()[0])):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / n


def full_step_ms(B, n):
    """The bench_predictor_ft step, verbatim geometry."""
    import optax

    from sky_embeddings_tpu.models.predictor import SkyViT
    from sky_embeddings_tpu.train import optim
    from sky_embeddings_tpu.train.predictor import make_predictor_step
    from sky_embeddings_tpu.train.schedules import linear_lr
    from sky_embeddings_tpu.train.state import TrainState

    model = SkyViT(
        img_size=64, patch_size=8, in_chans=5, embed_dim=768, depth=12,
        num_heads=12, num_labels=1, global_pool="map", dtype=jnp.bfloat16,
    )
    key = jax.random.PRNGKey(0)
    imgs = jax.random.normal(key, (B, 5, 64, 64), jnp.float32)
    labels = jax.random.uniform(key, (B, 1), jnp.float32)
    ra_dec = jnp.zeros((B, 2), jnp.float32)
    params = jax.jit(model.init)(key, imgs[:2])["params"]
    # state donation below deletes these buffers — keep a live copy for the
    # optimizer-only timers
    params_keep = jax.tree_util.tree_map(jnp.copy, params)
    tx = optim.finetune_optimizer(
        params, lambda lr: linear_lr(lr, 10_000, 1e4), model.depth,
        layer_decay=0.75, init_lr=1e-4, weight_decay=0.05,
    )
    state = TrainState.create(params, tx, key)
    step = jax.jit(
        make_predictor_step(
            model=model, tx=tx, loss_fn_name="mse", use_label_errs=False,
            augment=False, augment_params={}, train=True,
        ),
        donate_argnums=(0,),
    )

    def run(state):
        state, loss, metric = step(state, imgs, ra_dec, labels)
        return loss, state

    def sync(out):
        return float(out[0])

    # timed() re-feeds the same donated state; rebuild per call instead
    state, loss, _ = step(state, imgs, ra_dec, labels)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(n):
        state, loss, _ = step(state, imgs, ra_dec, labels)
    float(loss)
    ms = (time.perf_counter() - t0) / n * 1e3
    return ms, model, params_keep


def encoder_chain_ms(B, n):
    """Bare fused-encoder fwd+bwd at the ft geometry (no head, no optim)."""
    from sky_embeddings_tpu.ops.kernels.attn_block import fused_attn_block
    from sky_embeddings_tpu.ops.kernels.mlp_block import fused_mlp_block

    D, H, F, depth, N = 768, 12, 3072, 12, 65
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, N, D), dt) * 0.5
    g = jax.random.normal(key, (B, N, D), dt)
    scale = jnp.ones((D,), jnp.float32)
    bias = jnp.zeros((D,), jnp.float32)
    wqkv = (jax.random.normal(key, (D, 3 * D), jnp.float32) * 0.03).astype(dt)
    bqkv = jnp.zeros((3 * D,), jnp.float32)
    wproj = (jax.random.normal(key, (D, D), jnp.float32) * 0.03).astype(dt)
    bproj = jnp.zeros((D,), jnp.float32)
    w1 = (jax.random.normal(key, (D, F), jnp.float32) * 0.03).astype(dt)
    b1 = jnp.zeros((F,), jnp.float32)
    w2 = (jax.random.normal(key, (F, D), jnp.float32) * 0.03).astype(dt)
    b2 = jnp.zeros((D,), jnp.float32)

    @jax.jit
    def chain(x):
        def f(x):
            for _ in range(depth):
                x = fused_attn_block(
                    x, scale, bias, wqkv, bqkv, wproj, bproj, H, 0, 0, False, True
                )
                x = fused_mlp_block(x, scale, bias, w1, b1, w2, b2, 0, False)
            return x
        out, vjp = jax.vjp(f, x)
        return vjp(g)[0]

    return timed(chain, x, n=n, sync=lambda o: float(jnp.asarray(o).ravel()[0])) * 1e3


def _update_ms(tx_factory, params, n):
    """tx.update + apply_updates alone on fixed grads, donated like the
    real step. Works on a copy (donation would delete the caller's tree)."""
    import optax

    params = jax.tree_util.tree_map(jnp.copy, params)
    tx = tx_factory(params)
    opt_state = jax.jit(tx.init)(params)
    grads = jax.tree_util.tree_map(lambda p: jnp.ones_like(p) * 1e-4, params)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def upd(params, opt_state, grads):
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    params, opt_state = upd(params, opt_state, grads)
    float(jax.tree_util.tree_leaves(params)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        params, opt_state = upd(params, opt_state, grads)
    float(jax.tree_util.tree_leaves(params)[0].ravel()[0])
    return (time.perf_counter() - t0) / n * 1e3


def optimizer_update_ms(model, params, n):
    """Layer-decay multi_transform AdamW (the ft regime's update)."""
    from sky_embeddings_tpu.train import optim
    from sky_embeddings_tpu.train.schedules import linear_lr

    return _update_ms(
        lambda p: optim.finetune_optimizer(
            p, lambda lr: linear_lr(lr, 10_000, 1e4), model.depth,
            layer_decay=0.75, init_lr=1e-4, weight_decay=0.05,
        ),
        params, n,
    )


def plain_adamw_update_ms(model, params, n):
    """Same update through the flagship's single-group AdamW, for the
    multi_transform overhead delta."""
    from sky_embeddings_tpu.train.optim import pretrain_optimizer
    from sky_embeddings_tpu.train.schedules import cosine_annealing

    return _update_ms(
        lambda p: pretrain_optimizer(p, cosine_annealing(1e-4, 10_000, 1e4), 0.05),
        params, n,
    )


def head_loss_ms(model, params, B, n):
    """Map-pool head + MSE loss fwd+bwd on a frozen encoder output."""
    N = model.grid_size ** 2 + model.num_extra_tokens
    key = jax.random.PRNGKey(1)
    tokens = jax.random.normal(key, (B, N, model.embed_dim), jnp.bfloat16)
    labels = jax.random.uniform(key, (B, model.num_labels), jnp.float32)

    @jax.jit
    def fwd_bwd(tokens):
        def f(t):
            preds = model.apply({"params": params}, t, method=model.forward_head)
            return jnp.mean((preds.astype(jnp.float32) - labels) ** 2)
        return jax.value_and_grad(f)(tokens)

    return timed(fwd_bwd, tokens, n=n,
                 sync=lambda o: float(o[0])) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=20)
    args = ap.parse_args()

    for B in (256, 1024):
        ms, model, params = full_step_ms(B, args.n)
        print(f"full ft step        B={B:5d}: {ms:8.2f} ms  "
              f"({B / ms * 1e3:7.1f} img/s)", flush=True)
        enc = encoder_chain_ms(B, args.n)
        print(f"encoder fwd+bwd     B={B:5d}: {enc:8.2f} ms", flush=True)
        head = head_loss_ms(model, params, B, args.n)
        print(f"map-pool head+loss  B={B:5d}: {head:8.2f} ms", flush=True)
        if B == 256:
            opt = optimizer_update_ms(model, params, args.n)
            plain = plain_adamw_update_ms(model, params, args.n)
            print(f"layer-decay update  (fixed): {opt:8.2f} ms", flush=True)
            print(f"plain adamw update  (fixed): {plain:8.2f} ms", flush=True)
            print(f"remainder (patchify/embed/misc) B={B}: "
                  f"{ms - enc - head - opt:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
