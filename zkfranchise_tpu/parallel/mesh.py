"""Device-mesh construction for the proving fleet.

Two mesh axes (SURVEY.md §2c):
  * 'data'  — voter-batch data parallelism (each chip proves its slice of
    the voter stream);
  * 'model' — proving-key/point-table sharding for MSMs (the tensor-parallel
    analog: bucket partials combined with an all_gather over ICI) and NTT
    stage exchange.

The reference has no distributed anything (single Go process + child
procs); this layer is the build's scaling story.  XLA owns the collective
implementation over ICI/DCN — there is no NCCL/MPI equivalent to manage.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // n_model
    assert n_data * n_model <= n, (n_data, n_model, n)
    dev_arr = np.asarray(devices[: n_data * n_model]).reshape(
        n_data, n_model)
    return Mesh(dev_arr, axis_names=("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-leading arrays sharded over the 'data' axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
