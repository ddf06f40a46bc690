"""Async host->device batch prefetching.

The reference hides H2D copies behind torch DataLoader pin_memory workers;
the TPU-native equivalent is dispatching `jax.device_put` for batch N+1
while batch N's step executes — device transfers are async in JAX, so a
one-deep pipeline suffices to take the copy off the critical path.
"""

from __future__ import annotations

from typing import Iterator, Optional

import jax


def device_prefetch(iterator, sharding=None, depth: int = 2) -> Iterator:
    """Yield device-resident pytrees, keeping `depth` batches in flight.

    Multi-process (jax.process_count() > 1): each host's iterator yields its
    LOCAL shard (BucketedLoader process_index slicing); the shards are
    assembled into one global array spanning the mesh via
    `make_array_from_process_local_data` — the jax form of the reference's
    per-rank DistributedSampler batches feeding one DDP step."""
    if sharding is not None and jax.process_count() > 1:
        import numpy as np

        put = lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x))
    elif sharding is not None:
        put = lambda x: jax.device_put(x, sharding)
    else:
        put = jax.device_put
    queue = []
    for item in iterator:
        queue.append(jax.tree.map(put, item))
        if len(queue) >= depth:
            yield queue.pop(0)
    while queue:
        yield queue.pop(0)
