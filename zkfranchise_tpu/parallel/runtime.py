"""Multi-host runtime bootstrap for the proving fleet.

The reference is a single Go process (SURVEY.md §2c: "the reference has
none"); the build's multi-host story is jax.distributed + a global mesh
over (hosts x local chips), with XLA compiling the collectives over
ICI/DCN — there is no NCCL/MPI layer to manage.

Usage on every host of a pod slice (env-driven, TPU pods usually
auto-detect all three values):

    from zkfranchise_tpu.parallel import runtime
    runtime.init_distributed()                  # no-op on single host
    mesh = runtime.global_mesh(n_model=4)       # hosts*chips devices

Then build a parallel.prove.ShardedProver over `mesh`; jit dispatch is
SPMD — every host runs the same program on its address-space slice of the
globally sharded arrays.
"""
from __future__ import annotations

import os

import jax

from .mesh import make_mesh


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> bool:
    """Initialize jax.distributed from args or environment.

    Env fallbacks: ZKF_COORDINATOR (host:port), ZKF_NUM_PROCESSES,
    ZKF_PROCESS_ID.  On TPU pods all three may be None (auto-detected
    from the TPU metadata).  Returns True iff multi-process mode was
    initialized; single-process runs (no coordinator configured and not
    on a pod) are a no-op returning False.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "ZKF_COORDINATOR")
    if num_processes is None and "ZKF_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["ZKF_NUM_PROCESSES"])
    if process_id is None and "ZKF_PROCESS_ID" in os.environ:
        process_id = int(os.environ["ZKF_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)
    return True


def global_mesh(n_model: int = 1):
    """(data x model) mesh over ALL processes' devices.  The model axis is
    laid out within-host first so its all_to_all/all_gather collectives
    ride ICI; the data axis (pure batch parallelism, no per-step
    collectives) spans hosts over DCN."""
    devs = jax.devices()                  # global, grouped by process
    return make_mesh(n_data=len(devs) // n_model, n_model=n_model,
                     devices=devs)


def make_global(x, mesh, spec):
    """Full host copy of `x` (identical on every process) -> a globally
    sharded jax.Array over `mesh` with PartitionSpec `spec`.  This is the
    multi-host input path: each process uploads only the shards it
    addresses (jax.make_array_from_callback slices the local copy)."""
    import numpy as np
    from jax.sharding import NamedSharding

    x = np.asarray(x)
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(x.shape, sharding,
                                        lambda idx: x[idx])


def process_info() -> dict:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
