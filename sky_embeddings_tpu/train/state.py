"""Functional train state.

One PyTree carries everything a step mutates — params, optimizer state, step
counter, PRNG key — so the jitted step is ``state, batch -> state, metrics``
with buffer donation, and checkpointing is a pure serialization of the state
plus the host-side metric history (matching the reference's single-artifact
checkpoint, ``pretrain_mim.py:239-244``).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    rng: jax.Array

    @classmethod
    def create(cls, params: Any, tx: optax.GradientTransformation, rng: jax.Array):
        import jax.numpy as jnp

        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            # jitted: eager init dispatches one tiny op per parameter, which
            # is pathological over a tunneled TPU runtime.
            opt_state=jax.jit(tx.init)(params),
            rng=rng,
        )

    def abstract(self) -> "TrainState":
        """Shape/dtype skeleton (no device access) for checkpoint templates."""
        return jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), self
        )
