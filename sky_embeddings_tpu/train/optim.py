"""Optimizer construction: AdamW regimes matching the reference.

Three training regimes (reference ``vit.py:130-185`` and
``mim_vit.py:119-148``), expressed as optax chains ordered to reproduce torch
AdamW semantics exactly (decoupled weight decay *and* layer scale both
multiplied by the learning rate):

    scale_by_adam -> add_decayed_weights(mask) -> layer_scale -> -lr

* ``pretrain``: AdamW(betas 0.9/0.95) + cosine annealing; weight decay on
  parameters with ndim > 1 only (timm ``param_groups_weight_decay``).
* ``ft``: BEiT layer-wise lr decay. NOTE the reference passes its
  ``weight_decay`` config positionally into ``param_groups_lrd``'s
  ``init_lr`` slot (``vit.py:141-143`` vs ``lr_decay.py:14``), so the
  effective base LR is the *weight_decay* value and the applied weight decay
  is the function default 0.05. ``compat_ft_lr=True`` (default) reproduces
  this so shipped configs train identically; set it False for the intended
  ``init_lr``/``weight_decay`` wiring.
* ``lp``: train only norm/fc_norm/head (+ attention pool when pooling is
  'map'); everything else frozen.
* ``fs``: all parameters, plain AdamW with the ndim>1 decay mask.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

FT_DEFAULT_WEIGHT_DECAY = 0.05  # lr_decay.py:14 default, active under the quirk


# ----------------------------------------------------------------------
# PyTree labelling helpers
# ----------------------------------------------------------------------

def _path_keys(path) -> tuple[str, ...]:
    return tuple(k.key if hasattr(k, "key") else str(k) for k in path)


def tree_label(params: Any, fn: Callable[[tuple[str, ...], Any], Any]) -> Any:
    """Map (path, leaf) -> label over a param PyTree."""
    return jax.tree_util.tree_map_with_path(lambda p, x: fn(_path_keys(p), x), params)


def decay_mask(params: Any, no_decay_names: tuple[str, ...] = ()) -> Any:
    """True where weight decay applies: ndim > 1 and not in the no-decay list
    (timm ``param_groups_weight_decay`` semantics; cls_token/pos_embed are in
    timm ViT's ``no_weight_decay`` set used by the ft path)."""

    def label(path, leaf):
        if leaf.ndim <= 1:
            return False
        if any(name in path for name in no_decay_names):
            return False
        return True

    return tree_label(params, label)


def vit_layer_id(path: tuple[str, ...], depth: int) -> int:
    """BEiT layer id (reference ``lr_decay.get_layer_id_for_vit``,
    ``lr_decay.py:60-74``): embeddings/tokens -> 0, block i -> i+1,
    everything else (norm, head, pool) -> depth+1."""
    num_layers = depth + 1
    for part in path:
        if part.startswith("block"):
            try:
                return int(part[5:]) + 1
            except ValueError:
                continue
    head_names = ("patch_embed", "cls_token")
    if any(p in head_names for p in path):
        return 0
    if "pos_embed" in path:
        return 0
    return num_layers


def layer_scale_tree(params: Any, depth: int, layer_decay: float) -> Any:
    """Per-parameter LR multiplier: layer_decay^(num_layers - layer_id)."""
    num_layers = depth + 1

    def label(path, leaf):
        lid = vit_layer_id(path, depth)
        return layer_decay ** (num_layers - lid)

    return tree_label(params, label)


def scale_by_tree(scales: Any) -> optax.GradientTransformation:
    """Multiply updates elementwise by a static per-leaf scalar tree."""

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        updates = jax.tree_util.tree_map(lambda u, s: u * s, updates, scales)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


# ----------------------------------------------------------------------
# Regime builders
# ----------------------------------------------------------------------

def _adamw_chain(
    schedule,
    params: Any,
    weight_decay: float,
    betas: tuple[float, float],
    mask: Any,
    layer_scales: Any = None,
) -> optax.GradientTransformation:
    parts = [optax.scale_by_adam(b1=betas[0], b2=betas[1])]
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay, mask=mask))
    if layer_scales is not None:
        parts.append(scale_by_tree(layer_scales))
    parts.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*parts)


def pretrain_optimizer(
    params: Any, schedule, weight_decay: float
) -> optax.GradientTransformation:
    """MIM pretraining AdamW (reference ``mim_vit.py:126-129``: betas 0.9/0.95)."""
    return _adamw_chain(schedule, params, weight_decay, (0.9, 0.95), decay_mask(params))


def finetune_optimizer(
    params: Any,
    schedule_base: Callable[[float], Any],
    depth: int,
    layer_decay: float,
    init_lr: float,
    weight_decay: float,
    compat_ft_lr: bool = True,
) -> optax.GradientTransformation:
    """Layer-wise LR decay fine-tuning (reference ``vit.py:138-144``).

    ``schedule_base(lr)`` builds the schedule from a base LR so the quirk can
    redirect which config value feeds it.
    """
    if compat_ft_lr:
        base_lr, wd = weight_decay, FT_DEFAULT_WEIGHT_DECAY
    else:
        base_lr, wd = init_lr, weight_decay
    scales = layer_scale_tree(params, depth, layer_decay)
    mask = decay_mask(params, no_decay_names=("cls_token", "pos_embed"))
    return _adamw_chain(schedule_base(base_lr), params, wd, (0.9, 0.999), mask, scales)


def _lp_trainable(path: tuple[str, ...], global_pool: str) -> bool:
    """Head-only training set (reference ``vit.py:146-161``): final norm,
    fc_norm, head, plus the attention pool for 'map' pooling."""
    if "head" in path:
        return True
    # SkyViT names: 'norm' (pre-head LN), 'fc_norm' (avg pooling), 'pool'.
    if any(p in ("norm", "fc_norm") for p in path):
        return True
    if global_pool == "map" and "pool" in path:
        return True
    return False


def linear_probe_optimizer(
    params: Any, schedule, weight_decay: float, global_pool: str
) -> optax.GradientTransformation:
    """Freeze the backbone; AdamW on the head components only."""
    labels = tree_label(
        params, lambda path, _: "train" if _lp_trainable(path, global_pool) else "freeze"
    )
    train_tx = _adamw_chain(
        schedule, params, weight_decay, (0.9, 0.999),
        decay_mask(params),
    )
    return optax.multi_transform(
        {"train": train_tx, "freeze": optax.set_to_zero()}, labels
    )


def supervised_optimizer(
    params: Any, schedule, weight_decay: float
) -> optax.GradientTransformation:
    """Fully-supervised AdamW (reference ``vit.py:163-171``)."""
    return _adamw_chain(schedule, params, weight_decay, (0.9, 0.999), decay_mask(params))


def trainable_mask(params: Any, train_method: str, global_pool: str) -> Any:
    """Boolean tree: which params the regime actually updates (for tests and
    for excluding frozen params from grad computation)."""
    if train_method in ("lp", "linearprobe"):
        return tree_label(params, lambda p, _: _lp_trainable(p, global_pool))
    return tree_label(params, lambda p, _: True)
