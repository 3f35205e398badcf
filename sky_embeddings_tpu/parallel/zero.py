"""ZeRO-1 optimizer-state sharding over the data-parallel axis.

The reference's only parallelism is single-host ``nn.DataParallel``
(SURVEY §2.10), which replicates AdamW moments on every GPU. On a TPU mesh
the moments are the dominant *fixed* memory term for large models (2×fp32
per param — ~2.5 GB for ViT-H), and data-parallel replicas hold identical
copies. ZeRO-1 shards them over the 'data' axis instead: expressed purely
as ``NamedSharding`` annotations on the optimizer-state leaves, so XLA
GSPMD inserts the reduce-scatter/all-gather pair over ICI — no manual
collectives, and the training step itself is unchanged.

Composition with tensor parallelism is automatic: a moment inherits its
parameter's TP spec (from ``parallel.sharding.param_specs``) and 'data' is
added on the first still-unsharded dimension divisible by the dp size.
Leaves with no such dimension (biases already split over 'model', scalar
``count``) stay as-is — ZeRO-1 is an annotation, not a requirement.

Use:

    shardings = opt_state_shardings(mesh, tx, opt_state, params)
    opt_state = jax.device_put(opt_state, shardings)   # shard once
    # ... inside jit, pin the output layout so XLA keeps the shards:
    train_step = jax.jit(step, out_shardings=(param_sh, shardings, None))
"""

from __future__ import annotations

from typing import Any

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sky_embeddings_tpu.parallel.sharding import param_specs


def zero_spec(tp_spec: P, shape: tuple[int, ...], dp: int) -> P:
    """Add 'data' to ``tp_spec`` on the first free dim divisible by ``dp``.

    'Free' = the spec entry is None (not already sharded over 'model').
    Returns ``tp_spec`` unchanged when no dimension qualifies (dp=1,
    scalars, 'model'-consumed biases, indivisible dims).
    """
    if dp <= 1 or not shape:
        return tp_spec
    entries = list(tp_spec) + [None] * (len(shape) - len(tp_spec))
    for i, (axis, n) in enumerate(zip(entries, shape)):
        if axis is None and n % dp == 0:
            entries[i] = "data"
            # trim trailing Nones for a canonical spec
            while entries and entries[-1] is None:
                entries.pop()
            return P(*entries)
    return tp_spec


def opt_state_shardings(
    mesh: Mesh,
    tx: optax.GradientTransformation,
    opt_state: Any,
    params: Any,
    dp: int | None = None,
) -> Any:
    """NamedSharding PyTree matching ``opt_state`` (ZeRO-1 rules).

    Param-shaped leaves (AdamW mu/nu, schedule-free z, …) get their
    parameter's tensor-parallel spec plus 'data' on the first free
    divisible dim; every other leaf (step counts) is replicated.
    ``optax.tree_map_params`` walks the state with the param tree aligned,
    so this works through ``chain`` / ``multi_transform`` / masked wrappers.

    ``dp`` overrides the data-axis factor; pass ``dp=1`` for moments that
    should only follow their parameter's tensor-parallel spec (no ZeRO).
    """
    if dp is None:
        dp = int(mesh.shape.get("data", 1))
    tp_specs = param_specs(params)
    # NamedSharding is not a pytree node, so a specs-as-leaves tree passes
    # through tree_map_params intact (PartitionSpec itself is a tuple and
    # would be flattened).
    tp_sh = jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), tp_specs)
    replicated = NamedSharding(mesh, P())

    def moment(leaf, tp_sharding):
        shape = getattr(leaf, "shape", ())
        return NamedSharding(mesh, zero_spec(tp_sharding.spec, tuple(shape), dp))

    try:
        return optax.tree_map_params(
            tx, moment, opt_state, tp_sh, transform_non_params=lambda _: replicated
        )
    except ValueError:
        # optax.tree_map_params cannot walk every wrapper with an auxiliary
        # rest-tree — ``optax.multi_transform`` (the linear-probe regime,
        # optim.linear_probe_optimizer) raises "Expected named tuple" on the
        # NamedSharding leaves. Fall back to replicating the whole state:
        # correct under any mesh, and the lp regime's trainable state (head
        # + norms + attn-pool moments) is far too small for ZeRO-1 sharding
        # to matter.
        return jax.tree_util.tree_map(lambda _: replicated, opt_state)


def shard_opt_state(
    mesh: Mesh,
    tx: optax.GradientTransformation,
    opt_state: Any,
    params: Any,
) -> tuple[Any, Any]:
    """Place ``opt_state`` on the mesh under ZeRO-1; returns
    ``(sharded_state, shardings)`` — pass ``shardings`` to the train step's
    ``out_shardings`` so the layout survives the update."""
    shardings = opt_state_shardings(mesh, tx, opt_state, params)
    return jax.device_put(opt_state, shardings), shardings
