"""Multi-host (multi-process) runtime support.

TPU-native replacement for the reference's rank handling
(/root/reference/hamgnn/main.py:81-89 LOCAL_RANK/SLURM probing and
hamgnn/models/Model.py:105-126 torch.distributed availability checks +
all_gather_object): JAX's single-controller-per-host model needs exactly

  * one ``jax.distributed.initialize`` call before first device use, and
  * ``jax.process_index() == 0`` gating for host-side effects
    (checkpoints, metrics files, plots),
  * ``process_allgather`` for cross-host metric aggregation (the analog of
    the reference's epoch-end ``all_gather_object``).

On a Cloud TPU slice ``jax.distributed.initialize()`` autodetects the
coordinator from the metadata server; elsewhere (CPU fleets, manual
clusters) the standard env vars are honored:
``JAX_COORDINATOR_ADDRESS``, ``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID``.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np

_initialized = False


def maybe_initialize_distributed(coordinator: Optional[str] = None,
                                 num_processes: Optional[int] = None,
                                 process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed when multi-host execution is requested.

    Returns True when running (or now initialized) multi-process.  Safe to
    call multiple times and in single-process runs (no-op).
    """
    global _initialized
    if _initialized:
        return jax.process_count() > 1
    # NOTE: do NOT touch jax.process_count()/jax.devices() before deciding —
    # querying them initializes the runtime and jax.distributed.initialize
    # then raises "must be called before any JAX computations" (caught by
    # tests/test_parallel.py::test_multihost_two_process_cpu).
    try:
        if jax.distributed.is_initialized():
            _initialized = True
            return jax.process_count() > 1
    except AttributeError:  # older jax without is_initialized
        pass

    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    num = num_processes if num_processes is not None else int(
        os.environ.get("JAX_NUM_PROCESSES", "0") or 0)
    pid = process_id if process_id is not None else int(
        os.environ.get("JAX_PROCESS_ID", "-1") or -1)

    if coordinator and num > 1 and pid >= 0:
        try:
            jax.distributed.initialize(coordinator_address=coordinator,
                                       num_processes=num, process_id=pid)
        except RuntimeError as e:  # already initialized by external code
            if "already" not in str(e).lower():
                raise
        _initialized = True
        return True
    if os.environ.get("HAMGNN_AUTO_DISTRIBUTED"):
        # Cloud TPU slice: full autodetection
        try:
            jax.distributed.initialize()
        except RuntimeError as e:  # already initialized by external code
            if "already" not in str(e).lower():
                raise
        _initialized = True
        return jax.process_count() > 1
    _initialized = True  # single-process decided; runtime queries now safe
    return jax.process_count() > 1


def is_primary() -> bool:
    """True on the process that owns host-side effects (rank-zero gate)."""
    return jax.process_index() == 0


def process_count() -> int:
    return jax.process_count()


def allgather_metrics(tree: Any):
    """Gather a pytree of scalars/arrays from every process (replacement for
    the reference's ``all_gather_object`` of numpy dicts at epoch end,
    Model.py:113-126).  Single-process: returns the tree with a leading
    axis of size 1 for shape parity."""
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x: np.asarray(x)[None, ...], tree)
    from jax.experimental import multihost_utils

    return jax.tree_util.tree_map(
        lambda x: np.asarray(multihost_utils.process_allgather(x)), tree)
