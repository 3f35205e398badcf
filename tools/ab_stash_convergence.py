#!/usr/bin/env python
"""A/B convergence check: stashed-residual vs recompute attention backward.

PARITY #17 argues the bf16 qkv+probs stash (the training default,
``models/layers.Block.stash``) adds only bf16-level gradient noise. This
tool backs that claim with data (VERDICT r2 #5): two training runs from the
same init on the same on-device synthetic data stream — one with
``stash=True``, one with ``stash=False`` — must produce loss trajectories
that match within a small tolerance over hundreds of iterations.

Runs on the TPU (the stash path only exists in the compiled Pallas
kernels). Saves ``figures/ab_stash_convergence.png`` +
``results/ab_stash_convergence.npz`` and prints one JSON verdict line.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

N_ITERS = 400
TAIL = 50          # iterations averaged for the convergence-level comparison
TOL_TAIL = 0.02    # relative difference of tail-mean losses
TOL_EMA = 0.05     # max relative difference of EMA-smoothed curves


def run_arm(stash: bool, n_iters: int = N_ITERS) -> np.ndarray:
    import optax

    from sky_embeddings_tpu.models.mim import SkyMIM
    from sky_embeddings_tpu.ops.masking import simmim_batch_mask
    from sky_embeddings_tpu.train.optim import pretrain_optimizer
    from sky_embeddings_tpu.train.schedules import cosine_annealing

    model = SkyMIM(
        img_size=32, patch_size=8, in_chans=5, embed_dim=256, depth=4,
        num_heads=4, simmim=True, norm_pix_loss=True, loss_fn="l1",
        dtype=jnp.bfloat16, stash=stash,
    )
    B = 256
    imgs0 = jnp.zeros((B, 5, 32, 32), jnp.float32)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), imgs0, mask=jnp.zeros_like(imgs0)
    )
    params = variables["params"]
    tx = pretrain_optimizer(params, cosine_annealing(3e-4, n_iters, 1e4), 0.05)
    opt_state = jax.jit(tx.init)(params)

    @jax.jit
    def step(params, opt_state, i):
        # same data + mask keys in both arms: identical streams by design
        k_data = jax.random.fold_in(jax.random.PRNGKey(11), i)
        k_mask = jax.random.fold_in(jax.random.PRNGKey(12), i)
        imgs = jax.random.normal(k_data, (B, 5, 32, 32), jnp.float32)
        mask = simmim_batch_mask(k_mask, B, 5, 32, 8, 0.9)

        def loss_fn(p):
            loss, _, _ = model.apply({"params": p}, imgs, mask=mask)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for i in range(n_iters):
        params, opt_state, loss = step(params, opt_state, jnp.int32(i))
        losses.append(loss)
    return np.array([float(l) for l in losses])


def ema(x: np.ndarray, alpha: float = 0.05) -> np.ndarray:
    out = np.empty_like(x)
    acc = x[0]
    for i, v in enumerate(x):
        acc = (1 - alpha) * acc + alpha * v
        out[i] = acc
    return out


def main() -> dict:
    loss_stash = run_arm(stash=True)
    loss_recompute = run_arm(stash=False)

    tail_s = float(loss_stash[-TAIL:].mean())
    tail_r = float(loss_recompute[-TAIL:].mean())
    tail_rel = abs(tail_s - tail_r) / (abs(tail_r) + 1e-12)
    es, er = ema(loss_stash), ema(loss_recompute)
    ema_rel = float(np.max(np.abs(es - er) / (np.abs(er) + 1e-12)))
    monotone = bool(
        loss_stash[-TAIL:].mean() < loss_stash[:TAIL].mean()
        and loss_recompute[-TAIL:].mean() < loss_recompute[:TAIL].mean()
    )
    ok = tail_rel <= TOL_TAIL and ema_rel <= TOL_EMA and monotone

    os.makedirs("results", exist_ok=True)
    np.savez(
        "results/ab_stash_convergence.npz",
        loss_stash=loss_stash, loss_recompute=loss_recompute,
    )
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(7, 4))
        ax.plot(loss_stash, lw=0.6, alpha=0.35, color="C0")
        ax.plot(loss_recompute, lw=0.6, alpha=0.35, color="C1")
        ax.plot(es, lw=1.8, color="C0", label="stash=True (bf16 qkv+probs)")
        ax.plot(er, lw=1.8, color="C1", label="stash=False (recompute)")
        ax.set_xlabel("iteration")
        ax.set_ylabel("SimMIM L1 loss")
        ax.set_title(
            f"A/B: stashed vs recompute attention backward "
            f"(tail Δ={tail_rel*100:.2f}%, EMA max Δ={ema_rel*100:.2f}%)"
        )
        ax.legend()
        fig.tight_layout()
        os.makedirs("figures", exist_ok=True)
        fig.savefig("figures/ab_stash_convergence.png", dpi=120)
    except Exception as e:  # figure is best-effort; the npz is the record
        print(f"figure skipped: {e!r}", file=sys.stderr)

    out = {
        "ok": ok,
        "tail_mean_stash": round(tail_s, 6),
        "tail_mean_recompute": round(tail_r, 6),
        "tail_rel_diff": round(tail_rel, 6),
        "ema_max_rel_diff": round(ema_rel, 6),
        "monotone_decline": monotone,
        "n_iters": N_ITERS,
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
