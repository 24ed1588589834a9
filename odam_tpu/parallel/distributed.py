"""Multi-host initialization and cross-host aggregation helpers.

TPU-native replacement for the reference's torch.distributed/NCCL scaffolding
(src/utils/misc.py:90-157, 346-412; SURVEY.md C28): jax.distributed per
TPU-VM host instead of env-var/SLURM rank discovery + NCCL process groups;
fixed-schema array gathers instead of pickled byte-tensor all_gather.
"""
from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Initialize multi-host JAX (one call per TPU-VM host).

    With no arguments, jax.distributed auto-discovers the TPU pod topology;
    explicit values support non-TPU backends (misc.py:390-412 equivalent).

    The no-argument form is permissive (no-op when already initialized or in
    a single-process environment).  The explicit form PROPAGATES failures: a
    caller that names a coordinator is running a real multi-process rig, and
    silently continuing single-process would make every collective a no-op
    while looking green (scripts/dryrun_multiprocess.py exercises this path
    with 2 real processes).
    """
    if coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return
    try:
        jax.distributed.initialize()
    except (RuntimeError, ValueError):
        pass  # already initialized or single-process environment


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    """misc.py:379-382 equivalent."""
    return jax.process_index() == 0


def main_process_only_print() -> None:
    """Silence stdout on non-main hosts (misc.py:346-358 equivalent)."""
    if not is_main_process():
        import builtins

        builtins.print = lambda *a, **k: None


def all_gather_arrays(x: np.ndarray) -> np.ndarray:
    """Gather a same-shape host array from every process -> stacked [P, ...].

    Fixed-schema replacement for the reference's pickle-based all_gather
    (misc.py:90-130): uses a tiny jitted global computation over a
    process-sharded array.
    """
    if jax.process_count() == 1:
        return np.asarray(x)[None]
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x))


def reduce_scalars(values: dict[str, float], average: bool = True) -> dict[str, float]:
    """Cross-process reduction of a scalar dict (misc.py:133-157 reduce_dict)."""
    if jax.process_count() == 1:
        return dict(values)
    keys = sorted(values)
    stacked = all_gather_arrays(np.asarray([values[k] for k in keys], np.float64))
    agg = stacked.mean(axis=0) if average else stacked.sum(axis=0)
    return {k: float(v) for k, v in zip(keys, agg)}


def local_device_count() -> int:
    return jax.local_device_count()


def save_on_main(save_fn, *args: Any, **kwargs: Any) -> None:
    """Run a checkpoint-save callable only on the main process (misc.py:385-387)."""
    if is_main_process():
        save_fn(*args, **kwargs)
