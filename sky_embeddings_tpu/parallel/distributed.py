"""Multi-process (multi-host) runtime support.

The reference never goes beyond one host (``nn.DataParallel``,
SURVEY §2.10); TPU pods beyond one host (v4-16+, v5e-16+) require one JAX
process per host. This module keeps that concern in one place:

* :func:`initialize_from_env` — opt-in ``jax.distributed.initialize`` driven
  by environment variables (set by the cluster launcher, see
  ``cluster/queue_tpu.py``). On TPU VMs with no explicit coordinator the
  runtime autodetects peers, so bare ``SKY_DISTRIBUTED=1`` suffices there.
* :func:`process_count` / :func:`process_index` / :func:`is_main` — safe on
  single-process runs (1 / 0 / True).
* :func:`put_global` — build a *global* jax.Array from each process's local
  batch shard via ``jax.make_array_from_process_local_data``; on a
  single-process mesh this degrades to a plain sharded ``device_put``.

Data contract: each process feeds its own ``H5Batcher`` shard
(``process_count``/``process_index`` constructor args — disjoint chunk-run /
slab / index splits) with the *per-process* batch size; ``put_global``
assembles the global batch the compiled step sees. The training step itself
is unchanged — XLA inserts the cross-host collectives for the replicated
parameter update.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax

ENV_FLAG = "SKY_DISTRIBUTED"
ENV_COORD = "SKY_COORDINATOR_ADDRESS"
ENV_NPROC = "SKY_NUM_PROCESSES"
ENV_PID = "SKY_PROCESS_ID"

_initialized = False


def initialize_from_env(log_fn=print) -> bool:
    """Call ``jax.distributed.initialize`` when the launcher asked for it.

    Returns True when a multi-process runtime was initialized. Safe to call
    more than once and in single-process runs (no-op).
    """
    global _initialized
    if _initialized or not os.environ.get(ENV_FLAG):
        return _initialized
    kwargs = {}
    if os.environ.get(ENV_COORD):
        kwargs["coordinator_address"] = os.environ[ENV_COORD]
    if os.environ.get(ENV_NPROC):
        kwargs["num_processes"] = int(os.environ[ENV_NPROC])
    if os.environ.get(ENV_PID):
        kwargs["process_id"] = int(os.environ[ENV_PID])
    jax.distributed.initialize(**kwargs)
    _initialized = True
    log_fn(
        f"jax.distributed initialized: process {jax.process_index()}"
        f"/{jax.process_count()}, {jax.local_device_count()} local devices"
    )
    return True


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_main() -> bool:
    return jax.process_index() == 0


def put_global(batch: Any, sharding) -> Any:
    """Per-process local batch (PyTree of np arrays) -> global jax.Array tree.

    With one process this is exactly ``device_put(x, sharding)``; with many,
    each process contributes its local rows and the result is the global
    array laid out by ``sharding`` (batch axis sharded over 'data').
    """
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, x), batch
    )
