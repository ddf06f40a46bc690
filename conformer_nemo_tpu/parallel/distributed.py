"""Multi-host bootstrap + cross-host utilities.

Parity target: reference `initialize_distributed`
(`/root/reference/nemo/utils/distributed.py:22-47`): NCCL process groups from
MASTER_ADDR/MASTER_PORT env. TPU-native replacement: `jax.distributed.
initialize()` (coordinator from env or args); collectives are then inserted
by the compiler over ICI/DCN — there are no explicit process groups.

Also provides the AppState analogue (`/root/reference/nemo/utils/app_state.py:29`)
as a thin snapshot of the jax process topology.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import jax


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> tuple[int, int]:
    """Initialize the multi-host JAX runtime. Returns (process_index,
    process_count). Safe to call in single-process mode (no-op)."""
    addr = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    if addr is None and os.environ.get("MASTER_ADDR"):
        # honor torch-style env for drop-in config compatibility
        addr = f"{os.environ['MASTER_ADDR']}:{os.environ.get('MASTER_PORT', '12355')}"
    nproc = num_processes if num_processes is not None else int(os.environ.get("WORLD_SIZE", "1") or 1)
    pid = process_id if process_id is not None else int(os.environ.get("RANK", "0") or 0)
    if nproc > 1:
        jax.distributed.initialize(
            coordinator_address=addr, num_processes=nproc, process_id=pid
        )
    return jax.process_index(), jax.process_count()


@dataclasses.dataclass
class AppState:
    """Topology snapshot (reference AppState singleton analogue)."""

    process_index: int
    process_count: int
    local_device_count: int
    global_device_count: int

    @classmethod
    def current(cls) -> "AppState":
        return cls(
            process_index=jax.process_index(),
            process_count=jax.process_count(),
            local_device_count=jax.local_device_count(),
            global_device_count=jax.device_count(),
        )

    @property
    def is_main_process(self) -> bool:
        return self.process_index == 0


def host_psum_scalars(mesh, **scalars):
    """Sum scalar metrics across the mesh (the torchmetrics dist_reduce_fx
    'sum' analogue, wer.py:124-125): returns dict of python floats."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    vals = jnp.asarray([float(v) for v in scalars.values()], jnp.float64)

    @jax.jit
    def _sum(x):
        return x  # single-controller: jax.process-level metrics are host-side

    if jax.process_count() == 1:
        return {k: float(v) for k, v in scalars.items()}
    # multi-host: all-gather via a tiny replicated computation
    out = jax.experimental.multihost_utils.process_allgather(vals)
    summed = out.sum(axis=0)
    return {k: float(summed[i]) for i, k in enumerate(scalars.keys())}
