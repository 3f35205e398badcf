"""Host→device prefetch.

Keeps a small pipeline of batches already transferred to HBM (optionally laid
out with a ``NamedSharding`` over the batch axis) so the device never waits on
PCIe. ``jax.device_put`` is asynchronous, so a depth-2 deque suffices: while
step N computes, batch N+1 is in flight.
"""

from __future__ import annotations

import collections
from typing import Any, Iterable, Iterator, Optional

import jax


def device_prefetch(
    iterator: Iterable[Any],
    size: int = 2,
    sharding: Optional[Any] = None,
) -> Iterator[Any]:
    """Yield items of ``iterator`` pre-transferred to device.

    ``sharding`` may be a ``jax.sharding.Sharding`` (applied to every leaf) or
    None (default device placement).
    """
    it = iter(iterator)
    buf: collections.deque = collections.deque()
    multiprocess = jax.process_count() > 1

    def put(item):
        if sharding is not None:
            if multiprocess:
                # each process contributes its local shard of the global batch
                from sky_embeddings_tpu.parallel.distributed import put_global

                return put_global(item, sharding)
            return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), item)
        return jax.tree_util.tree_map(jax.device_put, item)

    try:
        for _ in range(size):
            buf.append(put(next(it)))
    except StopIteration:
        pass

    while buf:
        out = buf.popleft()
        try:
            buf.append(put(next(it)))
        except StopIteration:
            pass
        yield out
