"""Multi-host orchestration: the pod-slice layer (BASELINE config 5).

The reference tops out at one FPGA with a host poking ports; the TPU
equivalent of "more throughput" is more chips across hosts.  Everything in
parallel/shard.py is mesh-shape-agnostic — this module only adds process
bootstrap and host-local data feeding so the same shard_map programs run
on a v5e-16 (or any slice) unchanged:

  * initialize(): jax.distributed.initialize() when env indicates a
    multi-process launch (no-op on a single host)
  * global_mesh(): 1-D "dp" mesh over ALL devices in the slice
  * host_shard_bounds(): which chunks this process should materialize —
    with jax.make_array_from_single_device_arrays the per-host feeding
    pattern; collectives then ride ICI within hosts and DCN across.

Single-host degenerates to parallel/shard.py exactly; multi-host behavior
is validated by the driver's dryrun on a virtual device mesh.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize() -> bool:
    """Initialize jax.distributed if a multi-process environment is
    detected (COORDINATOR_ADDRESS / JAX_COORDINATOR or TPU pod env).
    Returns True if the process is part of a multi-process slice.

    Must run before anything touches the XLA backend, so the coordinator
    env is checked FIRST — jax.process_count() itself would initialize
    the backend and poison jax.distributed.initialize()."""
    coord = os.environ.get("COORDINATOR_ADDRESS") or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if coord:
        from jax._src import distributed as _dist

        if _dist.global_state.client is None:
            jax.distributed.initialize(
                coordinator_address=coord,
                num_processes=int(os.environ["NUM_PROCESSES"]),
                process_id=int(os.environ["PROCESS_ID"]),
            )
        return True
    return jax.process_count() > 1


def global_mesh(axis: str = "dp") -> Mesh:
    """1-D mesh over every device in the slice (all hosts)."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def host_shard_bounds(nchunks: int) -> tuple[int, int]:
    """[start, end) chunk range this process must materialize when the
    chunk batch is sharded over the global mesh."""
    pc, pid = jax.process_count(), jax.process_index()
    per = -(-nchunks // pc)
    return min(pid * per, nchunks), min((pid + 1) * per, nchunks)


def make_global_batch(local_chunks: np.ndarray, nchunks_global: int, mesh: Mesh, axis: str = "dp"):
    """Assemble a process-local chunk array into a globally-sharded jax
    Array (each host contributes only its shard; no host holds the full
    batch)."""
    sharding = NamedSharding(mesh, P(axis))
    shape = (nchunks_global,) + tuple(local_chunks.shape[1:])
    local_devices = [d for d in mesh.devices.flat if d.process_index == jax.process_index()]
    per_dev = -(-local_chunks.shape[0] // max(len(local_devices), 1))
    arrays = []
    for i, d in enumerate(local_devices):
        piece = local_chunks[i * per_dev : (i + 1) * per_dev]
        arrays.append(jax.device_put(piece, d))
    return jax.make_array_from_single_device_arrays(shape, sharding, arrays)
