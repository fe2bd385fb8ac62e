"""Device-mesh utilities for data/model-parallel QAT and serving.

The reference has no distributed layer at all (SURVEY.md §2c: no
torch.distributed import anywhere; DDP compatibility is incidental).  On TPU
this is a first-class component: a ``jax.sharding.Mesh`` over ICI/DCN with
named axes, ``NamedSharding`` annotations, and XLA-inserted collectives —
the "pick a mesh, annotate shardings, let XLA insert collectives" recipe.

Axes convention:
  * ``data``  — data parallelism for QAT (gradient all-reduce over ICI);
  * ``model`` — tensor parallelism for the serving path (weight-sharded
    matmuls; all-gather/reduce-scatter fused by XLA).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "data_sharding", "replicated", "shard_batch",
           "initialize_distributed"]


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, model) mesh.  ``data=None`` ⇒ use all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} needs {data*model} devices, have {n}")
    dev_array = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))


def data_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'; replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place every array in ``batch`` with its leading axis over 'data'."""
    return jax.tree.map(
        lambda a: jax.device_put(a, data_sharding(mesh, a.ndim)), batch)


def initialize_distributed() -> Tuple[int, int]:
    """Multi-host bring-up: ``jax.distributed.initialize`` from env vars.

    Conventions: ``JAX_COORDINATOR_ADDRESS`` triggers initialization; if
    ``JAX_NUM_PROCESSES``/``JAX_PROCESS_ID`` are set they are passed
    explicitly (manual clusters — e.g. the two-process CPU test,
    tests/test_distributed.py), otherwise JAX's cluster autodetection
    (SLURM/GKE/TPU-pod metadata) fills them in.  Single-host no-op.
    Returns (process_index, process_count)."""
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr:
        kw = {}
        if os.environ.get("JAX_NUM_PROCESSES"):
            kw = dict(coordinator_address=addr,
                      num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
                      process_id=int(os.environ.get("JAX_PROCESS_ID", "0")))
        try:
            jax.distributed.initialize(**kw)
        except RuntimeError:
            # Backend already up (interactive session / second call): a late
            # initialize is impossible; proceed with what we have.  But if a
            # MULTI-process run was explicitly requested and we are still a
            # single process, swallowing the error would silently train N
            # independent copies — re-raise instead.
            if (int(os.environ.get("JAX_NUM_PROCESSES", "1")) > 1
                    and jax.process_count() == 1):
                raise
    return jax.process_index(), jax.process_count()
