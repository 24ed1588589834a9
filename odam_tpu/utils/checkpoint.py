"""Checkpoint save/restore (orbax) — train-state and plain param trees.

The reference only ever loads torch checkpoints (SURVEY.md §5 "load-only");
this framework adds real save/resume: orbax for the native format, plus the
torch porting path (odam_tpu.models.porting) for reference weights.
"""
from __future__ import annotations

import os
from typing import Any

import jax


METAFILE = "odam_meta.json"


def save(path: str, tree: Any, meta: dict | None = None) -> None:
    """Crash-safe checkpoint write.

    orbax's ``force=True`` deletes the destination before committing the new
    checkpoint, so a process killed mid-save (this environment's TPU worker
    kernel-faults under sustained load) loses BOTH the old and new state.
    Here the new checkpoint is written to ``<path>.tmp`` and swapped in with
    renames; the previous checkpoint survives as ``<path>.bak`` until the
    swap completes, and :func:`restore` falls back to it if a crash landed
    between the renames.

    ``meta`` (JSON-serializable, e.g. ``{"global_step": 4500}``) is written
    as ``odam_meta.json`` *inside* the checkpoint directory before the swap,
    so it is atomically bound to the exact array state it describes — a
    resume can verify its schedule offset against :func:`load_meta` instead
    of trusting CLI arguments (orbax ignores the extra file on restore).
    """
    import json
    import shutil

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    tmp, bak = path + ".tmp", path + ".bak"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(tmp, jax.tree.map(lambda x: x, tree), force=True)
    if meta is not None:
        with open(os.path.join(tmp, METAFILE), "w") as f:
            json.dump(meta, f)
    if os.path.exists(bak):
        shutil.rmtree(bak)
    if os.path.exists(path):
        os.rename(path, bak)
    os.rename(tmp, path)
    if os.path.exists(bak):
        shutil.rmtree(bak)


def load_meta(path: str) -> dict | None:
    """The ``meta`` dict saved alongside the newest intact checkpoint for
    ``path`` (see :func:`save`), or None for metaless/legacy checkpoints."""
    import json

    p = latest_path(path)
    if p is None:
        return None
    mf = os.path.join(p, METAFILE)
    if not os.path.exists(mf):
        return None
    with open(mf) as f:
        return json.load(f)


def _committed(p: str) -> bool:
    """True iff ``p`` is a fully-written orbax checkpoint dir.  orbax writes
    ``_CHECKPOINT_METADATA`` at commit time, so its presence distinguishes a
    complete ``.tmp`` from one truncated by a crash mid-save."""
    return os.path.isdir(p) and os.path.exists(
        os.path.join(p, "_CHECKPOINT_METADATA")
    )


def latest_path(path: str) -> str | None:
    """The newest intact checkpoint for ``path`` (itself, or the .tmp/.bak
    left by an interrupted :func:`save`), or None.

    Order matters: :func:`save` fully writes ``.tmp`` *before* the rename
    dance, so a committed ``.tmp`` is always the newest state (a crash landed
    between the write and the swap); ``path`` itself is next; ``.bak`` (the
    pre-save state) is the oldest.  Uncommitted dirs (no orbax commit marker)
    are skipped entirely — handing a truncated ``.tmp`` to orbax restore
    fails with a confusing internal error.
    """
    path = os.path.abspath(path)
    for p in (path + ".tmp", path, path + ".bak"):
        if _committed(p):
            return p
    return None


def restore(path: str, like: Any | None = None) -> Any:
    """Restore a checkpoint.  ``like`` may be a concrete pytree or an
    abstract one from ``jax.eval_shape`` (restoring against shapes skips
    compiling an init program); abstract leaves get a default single-device
    sharding, which orbax requires."""
    import orbax.checkpoint as ocp

    path = latest_path(path) or os.path.abspath(path)
    if like is not None:
        sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])
        like = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding)
            if isinstance(x, jax.ShapeDtypeStruct) and x.sharding is None
            else x,
            like,
        )
    with ocp.StandardCheckpointer() as ckptr:
        if like is not None:
            return ckptr.restore(path, like)
        return ckptr.restore(path)
