"""Learning-rate schedules with torch-scheduler semantics.

The reference uses:
* ``CosineAnnealingLR(total_iters, eta_min=init_lr/final_lr_factor)`` for MIM
  pretraining (``mim_vit.py:142-144``);
* ``LinearLR(start_factor=1, end_factor=1/final_lr_factor, total_iters)`` for
  predictor training — the OneCycleLR built just before it is immediately
  overwritten (``vit.py:174-185``), so LinearLR is the effective schedule.

Both are exact closed forms of the torch schedulers at step t.
"""

from __future__ import annotations

import optax


def cosine_annealing(init_lr: float, total_iters: int, final_lr_factor: float) -> optax.Schedule:
    """lr(t) = eta_min + (init - eta_min) · (1 + cos(π·t/T)) / 2, clamped at T."""
    eta_min = init_lr / final_lr_factor
    alpha = eta_min / init_lr if init_lr else 0.0
    return optax.cosine_decay_schedule(init_lr, decay_steps=max(total_iters, 1), alpha=alpha)


def linear_lr(init_lr: float, total_iters: int, final_lr_factor: float) -> optax.Schedule:
    """lr(t) linearly from init to init/final_lr_factor over total_iters."""
    return optax.linear_schedule(
        init_value=init_lr,
        end_value=init_lr / final_lr_factor,
        transition_steps=max(total_iters, 1),
    )
