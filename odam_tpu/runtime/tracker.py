"""Static-shape on-device track store.

The reference keeps tracks as a Python list of growing NumPy arrays
(processor.py:95-131, 209-257) — every frame crosses host<->device and
reallocates.  Here the associator-visible state is a fixed-capacity pytree
that lives on device for the whole sequence:

- a rolling observation window per track slot ([T, W, 82], oldest-first,
  -1-padded — the exact layout the reference feeds its associator),
- running aggregates (count, sum of translations / azimuths / dims) so the
  "mean state" the reference recomputes from full history every frame
  (processor.py:189-195, arithmetic means) is O(1) per step,
- an active mask + slot counter instead of list append.

Track row layout (82 columns, processor.py:98-108):
  0 frame_id | 1 class | 2:6 bbox xyxy (pixels) | 6:9 dims | 9:12 t_wo |
  12 azi_wo | 13 score | 14:78 code | 78:82 projected bbox (pixels).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array

TRACK_DIM = 82


class TrackStore(NamedTuple):
    window: Array    # [T, W, 82] rolling observation window (-1 padded)
    length: Array    # [T] int32 observations currently in the window
    n_obs: Array     # [T] int32 total observations ever
    sum_t: Array     # [T, 3] running sum of t_wo
    sum_azi: Array   # [T] running sum of azi_wo (arithmetic, as in reference)
    sum_dims: Array  # [T, 3] running sum of dims
    active: Array    # [T] bool
    count: Array     # [] int32 number of active tracks

    @property
    def capacity(self) -> int:
        return self.window.shape[0]

    @property
    def window_size(self) -> int:
        return self.window.shape[1]


def init_store(max_tracks: int, window: int, dtype=jnp.float32) -> TrackStore:
    return TrackStore(
        window=jnp.full((max_tracks, window, TRACK_DIM), -1.0, dtype),
        length=jnp.zeros((max_tracks,), jnp.int32),
        n_obs=jnp.zeros((max_tracks,), jnp.int32),
        sum_t=jnp.zeros((max_tracks, 3), dtype),
        sum_azi=jnp.zeros((max_tracks,), dtype),
        sum_dims=jnp.zeros((max_tracks, 3), dtype),
        active=jnp.zeros((max_tracks,), bool),
        count=jnp.zeros((), jnp.int32),
    )


def mean_state(store: TrackStore) -> tuple[Array, Array, Array]:
    """Per-track mean (t_wo [T,3], azi_wo [T], dims [T,3]) over full history.

    Arithmetic means, exactly as the reference computes them
    (processor.py:191-195), with dims clipped at 0.05.
    """
    n = jnp.maximum(store.n_obs, 1).astype(store.sum_t.dtype)
    t = store.sum_t / n[:, None]
    azi = store.sum_azi / n
    dims = jnp.clip(store.sum_dims / n[:, None], min=0.05)
    return t, azi, dims


def append_rows(store: TrackStore, rows: Array, slots: Array, valid: Array) -> TrackStore:
    """Append detection rows to track slots (push into each rolling window).

    Args:
        rows: [N, 82] world-frame track rows.
        slots: [N] int32 target slot per row (assumed unique among valid).
        valid: [N] bool; invalid rows are dropped.

    Matches the reference append semantics (processor.py:252-257): windows are
    oldest-first; when full, the oldest observation is shifted out.
    """
    W = store.window_size

    def push_one(i, st: TrackStore) -> TrackStore:
        s = slots[i]
        ok = valid[i]
        s_safe = jnp.clip(s, 0, st.capacity - 1)
        row = rows[i]

        cur = st.window[s_safe]
        full = st.length[s_safe] >= W
        shifted = jnp.where(full, jnp.roll(cur, -1, axis=0), cur)
        pos = jnp.minimum(st.length[s_safe], W - 1)
        new_win = jax.lax.dynamic_update_slice(shifted, row[None], (pos, 0))

        window = jnp.where(ok, st.window.at[s_safe].set(new_win), st.window)
        inc = ok.astype(jnp.int32)
        fin = ok.astype(st.sum_t.dtype)
        return TrackStore(
            window=window,
            length=st.length.at[s_safe].add(
                jnp.where(full, 0, inc).astype(jnp.int32)
            ),
            n_obs=st.n_obs.at[s_safe].add(inc),
            sum_t=st.sum_t.at[s_safe].add(row[9:12] * fin),
            sum_azi=st.sum_azi.at[s_safe].add(row[12] * fin),
            sum_dims=st.sum_dims.at[s_safe].add(row[6:9] * fin),
            active=st.active.at[s_safe].set(st.active[s_safe] | ok),
            count=st.count,
        )

    N = rows.shape[0]
    store = jax.lax.fori_loop(0, N, push_one, store)
    new_count = jnp.sum(store.active.astype(jnp.int32))
    return store._replace(count=new_count)


class FrameLog(NamedTuple):
    """Device-resident append-only observation log.

    The mapping/merge stages need every observation ever made, not just the
    associator window.  Rather than pulling per-frame results to the host
    (a blocking device->host round trip per frame — the dominant cost on a
    tunneled TPU), the step appends each frame's attached rows here and the
    host drains the log once per sequence.
    """

    rows: Array   # [F_cap, N, 82] world-frame rows of attached detections
    slots: Array  # [F_cap, N] int32 track slot per row, -1 = not attached
    count: Array  # [] int32 frames logged

    @property
    def capacity(self) -> int:
        return self.rows.shape[0]


def init_log(max_frames: int, max_dets: int, dtype=jnp.float32) -> FrameLog:
    return FrameLog(
        rows=jnp.zeros((max_frames, max_dets, TRACK_DIM), dtype),
        slots=jnp.full((max_frames, max_dets), -1, jnp.int32),
        count=jnp.zeros((), jnp.int32),
    )


def log_frame(log: FrameLog, rows: Array, slots: Array, attached: Array) -> FrameLog:
    """Append one frame's attach results (saturates at capacity)."""
    idx = jnp.minimum(log.count, log.capacity - 1)
    slot_entry = jnp.where(attached, slots, -1).astype(jnp.int32)
    return FrameLog(
        rows=jax.lax.dynamic_update_slice(log.rows, rows[None], (idx, 0, 0)),
        slots=jax.lax.dynamic_update_slice(log.slots, slot_entry[None], (idx, 0)),
        count=jnp.minimum(log.count + 1, log.capacity),
    )


def drain_log(log: FrameLog) -> list:
    """One host pull: rebuild the per-track observation history.

    Returns a list of [n_obs, 82] arrays indexed by track slot (empty slots
    dropped by the caller)."""
    import numpy as np

    n = int(log.count)
    rows = np.asarray(log.rows[:n])
    slots = np.asarray(log.slots[:n])
    max_slot = int(slots.max()) if n else -1
    tracks = [[] for _ in range(max_slot + 1)]
    for f in range(n):
        for i in np.nonzero(slots[f] >= 0)[0]:
            tracks[slots[f, i]].append(rows[f, i])
    return [np.stack(t) if t else np.zeros((0, TRACK_DIM), np.float32) for t in tracks]


def assign_new_slots(store: TrackStore, is_new: Array) -> Array:
    """Slot indices for newly spawned tracks: [N] bool -> [N] int32 (-1 if
    capacity exhausted).  New tracks fill slots count, count+1, ... in
    detection order, matching the reference's list append order
    (processor.py:252-253)."""
    offsets = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    slot = store.count + offsets
    ok = is_new & (slot < store.capacity)
    return jnp.where(ok, slot, -1).astype(jnp.int32)
