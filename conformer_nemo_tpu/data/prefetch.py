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

    # Uploads run on a dedicated thread: through a tunneled/networked runtime
    # `device_put` blocks the caller for the wire transfer (~70 ms for a
    # 7.5 MB batch), which would serialize with step dispatch in the train
    # loop. One background uploader overlaps the socket send with device
    # compute; `depth` transfers ride ahead of the consumer.
    from concurrent.futures import ThreadPoolExecutor

    ex = ThreadPoolExecutor(max_workers=1, thread_name_prefix="h2d-prefetch")
    try:
        pending = []
        for item in iterator:
            pending.append(ex.submit(lambda it=item: jax.tree.map(put, it)))
            if len(pending) >= depth:
                yield pending.pop(0).result()
        while pending:
            yield pending.pop(0).result()
    finally:
        for f in pending:
            f.cancel()
        ex.shutdown(wait=False)
