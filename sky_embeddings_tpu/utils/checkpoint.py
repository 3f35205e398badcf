"""Single-file checkpointing with the reference's logical payload.

The reference saves one artifact per model holding
``{batch_iters, losses, optimizer, lr_scheduler, model}``
(``pretrain_mim.py:239-244``) and a ``_best`` sidecar for predictors
(``train_predictor.py:229-241``). We keep exactly those semantics — one
atomic file, metric history inside, ``_best`` preferred at load — with a
msgpack PyTree payload:

    {"step": int, "params": ..., "opt_state": ..., "rng": key,
     "losses": {name: [floats]}, "meta": {...}}

Atomicity via write-to-temp + rename, so a preempted job never sees a torn
checkpoint (the elasticity story relies on it, SURVEY §5).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
from flax import serialization

CKPT_SUFFIX = ".ckpt.msgpack"


def checkpoint_path(model_dir: str, model_name: str, best: bool = False) -> str:
    suffix = "_best" + CKPT_SUFFIX if best else CKPT_SUFFIX
    return os.path.join(model_dir, model_name + suffix)


def _to_host(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: np.asarray(jax.device_get(x)), tree)


def save_checkpoint(path: str, payload: dict) -> None:
    """Atomically serialize a payload dict (PyTrees of arrays + plain data).

    Typed PyTrees (optax states etc.) are flattened to plain nested dicts via
    flax's state-dict mechanism (msgpack cannot encode tuples); restore with
    :func:`restore_like` against a template of the same structure.
    """
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {k: serialization.to_state_dict(v) for k, v in payload.items()}
    data = serialization.msgpack_serialize(_to_host(payload))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Optional[dict]:
    """Load a raw payload dict, or None if the file doesn't exist."""
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def restore_like(template: Any, state_dict: Any) -> Any:
    """Rebuild a typed PyTree (e.g. an optax state) from its raw msgpack form."""
    return serialization.from_state_dict(template, state_dict)


def state_dict_template(tree: Any) -> Any:
    """State-dict (plain nested dict) view of a typed tree, for use as an
    :func:`adapt_block_layout` template."""
    return serialization.to_state_dict(tree)


def adapt_block_layout(params: dict, template: dict) -> dict:
    """Convert a params dict between the loop-encoder (``block0``..``blockN``)
    and scan-encoder (``blocks``, depth-stacked) layouts to match ``template``
    (see ``models.layers.Encoder``). Applies recursively, so the MAE decoder's
    nested encoder converts too. No-op when layouts already agree."""
    from sky_embeddings_tpu.models.layers import (
        stack_block_params,
        unstack_block_params,
    )

    from collections.abc import Mapping

    if not isinstance(params, Mapping) or not isinstance(template, Mapping):
        return params
    params = dict(params)
    has_loop = any(k.startswith("block") and k[5:].isdigit() for k in params)
    tmpl_scan = "blocks" in template
    if has_loop and tmpl_scan:
        depth = 1 + max(
            int(k[5:]) for k in params if k.startswith("block") and k[5:].isdigit()
        )
        params = stack_block_params(params, depth)
    elif "blocks" in params and not tmpl_scan:
        params = unstack_block_params(params)
    return {
        k: adapt_block_layout(v, template[k]) if k in template else v
        for k, v in params.items()
    }


def losses_to_lists(losses: dict) -> dict:
    """Normalize a restored losses dict to {str: list[float]}.

    flax's state-dict form stores lists as {'0': v0, '1': v1, ...}; undo that.
    """
    out: dict[str, list] = {}
    for k, v in (losses or {}).items():
        if isinstance(v, dict):
            v = [v[i] for i in sorted(v, key=lambda s: int(s))]
        arr = np.asarray(v)
        out[str(k)] = [float(x) for x in np.atleast_1d(arr)]
    return out
