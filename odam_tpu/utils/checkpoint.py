"""Checkpoint save/restore (orbax) — train-state and plain param trees.

The reference only ever loads torch checkpoints (SURVEY.md §5 "load-only");
this framework adds real save/resume: orbax for the native format, plus the
torch porting path (odam_tpu.models.porting) for reference weights.
"""
from __future__ import annotations

import os
from typing import Any

import jax


def save(path: str, tree: Any) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.tree.map(lambda x: x, tree), force=True)


def restore(path: str, like: Any | None = None) -> Any:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if like is not None:
            return ckptr.restore(path, like)
        return ckptr.restore(path)
