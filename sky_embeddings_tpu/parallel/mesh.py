"""Device mesh construction.

The reference's only parallelism is single-host ``nn.DataParallel``
(SURVEY §2.10; reference ``mim_vit.py:117``). The TPU-native equivalent is a
``jax.sharding.Mesh`` with the batch sharded over a ``data`` axis and XLA
compiling the gradient ``psum`` over ICI. A second ``model`` axis is
supported for tensor-parallel sharding of the MLP/attention matmuls when a
single model's activations outgrow one chip (see ``parallel/sharding.py``).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices.

    Defaults to pure data parallelism over every device. ``data * model``
    must equal the device count when both are given.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model != n:
        raise ValueError(f"data({data}) * model({model}) != device count ({n})")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'; replicate the rest."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
