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
    """Yield device-resident pytrees, keeping `depth` batches in flight."""
    put = (
        (lambda x: jax.device_put(x, sharding)) if sharding is not None else jax.device_put
    )
    queue = []
    for item in iterator:
        queue.append(jax.tree.map(put, item))
        if len(queue) >= depth:
            yield queue.pop(0)
    while queue:
        yield queue.pop(0)
