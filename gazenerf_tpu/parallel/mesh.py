"""Device mesh construction for data x ray sharding.

The reference is strictly single-GPU (reference train.py:86-88; SURVEY.md §2.8)
— this axis layout is new, TPU-first design:

* ``data`` — batch dimension; per-sample offset-table *gradients* are
  row-disjoint across the batch so the only cross-chip traffic is the net
  parameter ``psum`` that XLA inserts, riding ICI.
* ``ray``  — ray/tile dimension inside an image; the per-ray sample scan is
  chip-local so ray sharding needs no collectives until the featmap gather.

Multi-host: call :func:`init_distributed` first (jax.distributed), then the
mesh spans all hosts' devices; XLA routes collectives over ICI intra-slice
and DCN across slices.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator: Optional[str] = None, num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host initialization (no-op when single-process, idempotent so a
    resumed run can re-enter the launch path in-process)."""
    if num_processes and num_processes > 1:
        try:
            from jax._src import distributed as _jdist

            if _jdist.global_state.client is not None:
                return  # already initialized (train -> resume in-process);
                # probing jax.process_count() instead would itself
                # initialize the backend before distributed setup
        except ImportError:  # pragma: no cover - private-API drift
            pass
        jax.distributed.initialize(coordinator, num_processes, process_id)


def make_mesh(
    data_parallel: int = 0,
    ray_parallel: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """``Mesh`` with axes ``("data", "ray")``.

    ``data_parallel=0`` means "all remaining devices".
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data_parallel <= 0:
        assert n % ray_parallel == 0, (n, ray_parallel)
        data_parallel = n // ray_parallel
    assert data_parallel * ray_parallel == n, (data_parallel, ray_parallel, n)
    arr = np.asarray(devices).reshape(data_parallel, ray_parallel)
    return Mesh(arr, ("data", "ray"))


def batch_spec() -> P:
    """Batch tensors: sharded over data, rays over ray axis where present."""
    return P("data")


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
