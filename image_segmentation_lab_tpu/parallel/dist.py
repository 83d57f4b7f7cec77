"""Multi-process (multi-host) utilities.

Parity target: reference ``core/mixed_precision/dist_utils.py``: ``init_dist``
launcher dispatch (:34-99), ``get_dist_info`` (:102-109), ``@master_only``
(:112-120), allreduce helpers (:123-188).  JAX redesign:

* process bring-up is ``jax.distributed.initialize`` (the analog of the
  pytorch/mpi/slurm launchers — coordinator address + process id come from
  the environment, as with the reference's MASTER_ADDR/RANK plumbing);
* rank/world = ``jax.process_index()/process_count()``;
* parameter/gradient allreduce helpers are **not** re-implemented: inside
  pjit XLA emits the collectives (see ``parallel/mesh.py``); the host-side
  helpers here are only for the few host-scope reductions (metrics).
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple


_dist_initialized = False


def init_dist(launcher: str = "jax",
              coordinator_address: Optional[str] = None,
              num_processes: Optional[int] = None,
              process_id: Optional[int] = None) -> None:
    """Initialize multi-process JAX.

    ``launcher`` values mirror the reference CLI ('pytorch'/'mpi'/'slurm' are
    accepted and treated identically — JAX reads the coordination info from
    standard env vars / the TPU metadata service when args are None).

    Must run before any JAX call that initializes the XLA backend, so the
    idempotence guard is a module flag — probing ``jax.process_count()``
    here would itself initialize the backend and doom the call.
    """
    global _dist_initialized
    if _dist_initialized:
        return
    import jax
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    try:
        jax.distributed.initialize(**kwargs)
        _dist_initialized = True
    except Exception as e:
        if kwargs:
            # explicit multi-process request must not silently degrade to
            # N independent single-process jobs (every rank thinking it is
            # master would corrupt checkpoints)
            raise
        print(f"jax.distributed.initialize skipped ({e})")


def get_dist_info() -> Tuple[int, int]:
    """(rank, world_size) (reference dist_utils.py:102-109)."""
    import jax
    return jax.process_index(), jax.process_count()


def is_master() -> bool:
    import jax
    return jax.process_index() == 0


def master_only(func):
    """Run only on process 0 (reference dist_utils.py:112-120)."""

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        if is_master():
            return func(*args, **kwargs)
        return None

    return wrapper


def barrier(name: str = "barrier") -> None:
    """Cross-process synchronization point."""
    import jax
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(name)


def all_reduce_scalar(value: float, op: str = "mean") -> float:
    """Host-scope scalar reduction across processes (metric logging)."""
    import jax
    import numpy as np
    if jax.process_count() == 1:
        return float(value)
    from jax.experimental import multihost_utils
    arr = multihost_utils.process_allgather(np.asarray(value, np.float64))
    return float(arr.mean() if op == "mean" else arr.sum())
