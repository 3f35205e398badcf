"""Parameter sharding rules (GSPMD-style, rule-based over param paths).

Megatron-style tensor parallelism for the ViT stack, expressed purely as
``PartitionSpec`` annotations — XLA inserts the all-reduces over ICI:

* qkv / mlp-fc1 kernels: split the *output* features over 'model'
  (column-parallel);
* attn-proj / mlp-fc2 kernels: split the *input* features over 'model'
  (row-parallel), producing a psum XLA schedules with the following ops;
* biases of column-parallel layers follow their kernel; everything else
  (embeddings, norms, tokens, heads) is replicated.

With ``model=1`` every spec collapses to replication and the mesh is pure
data-parallel — the semantics the reference needs (SURVEY §2.10).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path-substring, param-name, spec) rules; first match wins.
_COLUMN = ("qkv", "fc1", "kv", "q")
_ROW = ("proj", "fc2")


def _spec_for(path: tuple[str, ...]) -> P:
    names = [p for p in path]
    leaf = names[-1]
    parent = names[-2] if len(names) > 1 else ""
    # Scan-encoder params (the consecutive 'blocks'/'block' scope pair from
    # nn.scan in models/layers.py) carry a leading depth axis — prepend an
    # unsharded dim to whatever the base rule says. Matching 'blocks' alone
    # would also catch the JEPA predictor's loop-layout encoder, whose flax
    # scope is literally named 'blocks' but whose kernels are rank-2.
    stacked = any(
        a == "blocks" and b == "block" for a, b in zip(names, names[1:])
    )

    def out(spec: P) -> P:
        return P(None, *spec) if stacked else spec

    # The patch embedding's Dense is also named 'proj' but is column-parallel
    # (split the embedding dim, not the pixel dim).
    if "patch_embed" in names:
        if leaf == "kernel":
            return P(None, "model")
        return P("model") if leaf == "bias" else P()
    if leaf == "kernel":
        if parent in _COLUMN:
            return out(P(None, "model"))
        if parent in _ROW:
            return out(P("model", None))
    if leaf == "bias" and parent in _COLUMN:
        return out(P("model"))
    # MlpBlock flat parameter names (fused-kernel module)
    if leaf == "fc1_kernel":
        return out(P(None, "model"))
    if leaf == "fc2_kernel":
        return out(P("model", None))
    if leaf == "fc1_bias":
        return out(P("model"))
    return P()


def param_specs(params: Any) -> Any:
    """PartitionSpec PyTree matching ``params`` (tensor-parallel rules)."""

    def assign(path, leaf):
        keys = tuple(
            k.key if hasattr(k, "key") else str(k) for k in path
        )
        return _spec_for(keys)

    return jax.tree_util.tree_map_with_path(assign, params)


def param_shardings(mesh: Mesh, params: Any) -> Any:
    """NamedSharding PyTree for ``params`` on ``mesh``."""
    specs = param_specs(params)
    return jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), specs)


def shard_params(mesh: Mesh, params: Any) -> Any:
    """Place ``params`` on the mesh according to the TP rules."""
    return jax.device_put(params, param_shardings(mesh, params))
