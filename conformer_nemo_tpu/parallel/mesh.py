"""Device mesh + sharding helpers.

Replaces the reference's NCCL/DDP machinery (`/root/reference/nemo/utils/
distributed.py:22`, PTL `strategy: ddp`) the TPU way: one logical
`jax.sharding.Mesh` with ('data', 'model') axes; jit + NamedSharding make XLA
insert the collectives (grad psum over ICI/DCN), so there is no process-group
code to port. Host-side data sharding uses `jax.process_index()` in place of
rank-scattered shard lists (audio_to_text.py:170).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    *,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """('data', 'model') mesh. Defaults: all devices on the data axis (DP),
    model axis for encoder sharding when HBM demands it (SURVEY.md 2.7)."""
    devs = list(devices if devices is not None else jax.devices())
    n = len(devs)
    if data is None:
        assert n % model == 0, (n, model)
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devs).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the 'data' axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch_arrays):
    """Device-put a pytree of host arrays with batch-dim sharding."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch_arrays)
