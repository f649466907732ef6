"""Multi-host orchestration (the distributed backend the reference lacks).

Single-controller-per-host model: `maybe_initialize()` wires up
jax.distributed from the standard env vars; work is split by genome across
processes (the reference's OMP-dynamic file loop, lifted to hosts), and
global sketch state merges with the register-max collective.

On a pod slice:
    DASHING_TPU_DISTRIBUTED=1 \
    JAX_COORDINATOR=host0:1234 JAX_NUM_PROCESSES=4 JAX_PROCESS_ID=$i \
    python -m dashing_tpu.cli sketch ...

Within-host chip parallelism is parallel/mesh.py; this file only adds the
process boundary.  Functions degrade to no-ops in single-process runs, so
the same CLI code path serves laptop and pod.
"""
from __future__ import annotations

import os
from typing import List, Sequence

import numpy as np


def maybe_initialize() -> bool:
    """Initialize jax.distributed when DASHING_TPU_DISTRIBUTED is set."""
    if os.environ.get("DASHING_TPU_DISTRIBUTED", "") in ("", "0"):
        return False
    import jax
    coord = os.environ.get("JAX_COORDINATOR")
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    kwargs = {}
    if coord:
        if nproc is None or pid is None:
            raise SystemExit(
                "DASHING_TPU_DISTRIBUTED: JAX_COORDINATOR is set but "
                "JAX_NUM_PROCESSES/JAX_PROCESS_ID are missing")
        kwargs = dict(coordinator_address=coord,
                      num_processes=int(nproc), process_id=int(pid))
    jax.distributed.initialize(**kwargs)
    return True


def process_index() -> int:
    import jax
    return jax.process_index()


def process_count() -> int:
    import jax
    return jax.process_count()


def is_main() -> bool:
    return process_index() == 0


def my_shard(items: Sequence, strided: bool = True) -> List:
    """This process's share of a work list.

    Strided assignment preserves the size-descending load balance the
    reference gets from sort_paths_by_fsize (src/finalizers.cpp:6-22):
    after the global sort, process i takes items i, i+P, i+2P, ...
    """
    p, n = process_index(), process_count()
    if n == 1:
        return list(items)
    if strided:
        return list(items[p::n])
    chunk = -(-len(items) // n)
    return list(items[p * chunk:(p + 1) * chunk])


def global_register_max(regs: np.ndarray) -> np.ndarray:
    """Merge per-process registers with a cross-process max all-reduce
    (the multi-host extension of the ICI merge in parallel/mesh.py)."""
    import jax
    import jax.numpy as jnp
    if jax.process_count() == 1:
        return regs
    from jax.experimental import multihost_utils
    return np.asarray(
        multihost_utils.process_allgather(jnp.asarray(regs))).max(axis=0)
