"""Static-shape on-device track store.

The reference keeps tracks as a Python list of growing NumPy arrays
(processor.py:95-131, 209-257) — every frame crosses host<->device and
reallocates, but the list is unbounded.  Here the associator-visible state is
a fixed-capacity pytree that lives on device for the whole sequence:

- a rolling observation window per track slot ([T, W, 82], oldest-first,
  -1-padded — the exact layout the reference feeds its associator),
- running aggregates (count, sum of translations / azimuths / dims) so the
  "mean state" the reference recomputes from full history every frame
  (processor.py:189-195, arithmetic means) is O(1) per step,
- an active mask + slot counter instead of list append.

Capacity safety (ScanNet scenes fragment into >64 tracks before merge): every
track carries a *global id*; when all slots are taken, spawning a new track
evicts the least-recently-observed unprotected slot and recycles it under a
fresh id.  The evicted track's full history is safe in the FrameLog (keyed by
global id, not slot), so the offline mapping/merge stages still see every
observation — only the associator window forgets stale fragments, which the
100-frame window had mostly aged out anyway.  ``n_evicted`` / ``n_dropped``
counters make overflow observable instead of silent.

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
    track_id: Array  # [T] int32 global track id per slot, -1 = never used
    last_frame: Array  # [T] float32 frame_id of the latest observation
    next_id: Array   # [] int32 next global track id to assign
    n_evicted: Array  # [] int32 slots recycled due to capacity pressure
    n_dropped: Array  # [] int32 new tracks dropped (no assignable slot)

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
        track_id=jnp.full((max_tracks,), -1, jnp.int32),
        last_frame=jnp.full((max_tracks,), -1.0, dtype),
        next_id=jnp.zeros((), jnp.int32),
        n_evicted=jnp.zeros((), jnp.int32),
        n_dropped=jnp.zeros((), jnp.int32),
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
        return st._replace(
            window=window,
            length=st.length.at[s_safe].add(
                jnp.where(full, 0, inc).astype(jnp.int32)
            ),
            n_obs=st.n_obs.at[s_safe].add(inc),
            sum_t=st.sum_t.at[s_safe].add(row[9:12] * fin),
            sum_azi=st.sum_azi.at[s_safe].add(row[12] * fin),
            sum_dims=st.sum_dims.at[s_safe].add(row[6:9] * fin),
            active=st.active.at[s_safe].set(st.active[s_safe] | ok),
            last_frame=st.last_frame.at[s_safe].set(
                jnp.where(ok, row[0], st.last_frame[s_safe])
            ),
        )

    N = rows.shape[0]
    store = jax.lax.fori_loop(0, N, push_one, store)
    new_count = jnp.sum(store.active.astype(jnp.int32))
    return store._replace(count=new_count)


def assign_new_slots(store: TrackStore, is_new: Array,
                     protected: Array | None = None
                     ) -> tuple[TrackStore, Array]:
    """Allocate slots (and fresh global ids) for newly spawned tracks.

    New tracks take free slots first (ascending index — the reference's list
    append order, processor.py:252-253); when none remain, the
    least-recently-observed unprotected active slot is evicted and recycled
    (its full history stays in the FrameLog under its old global id).  Only
    when every slot is protected does a spawn drop, counted in ``n_dropped``.

    Args:
        is_new: [N] bool, detections that should spawn a track.
        protected: optional [T] bool — slots that must not be evicted
            (e.g. slots matched by this frame's association).

    Returns:
        (updated store, slots [N] int32 with -1 where dropped).  Evicted
        slots are cleared in the returned store; ``append_rows`` then writes
        the first observation.
    """
    T = store.capacity
    if protected is None:
        protected = jnp.zeros((T,), bool)
    free = ~store.active
    evictable = store.active & ~protected

    # Slot priority: free (by index), then evictable (by last_frame, stable
    # on index), then protected.  Integer keys < 3T, so the sort is exact.
    idx = jnp.arange(T, dtype=jnp.int32)
    lru_rank = jnp.argsort(
        jnp.argsort(jnp.where(evictable, store.last_frame, jnp.inf))
    ).astype(jnp.int32)
    key = jnp.where(free, idx, jnp.where(evictable, T + lru_rank, 2 * T + idx))
    order = jnp.argsort(key).astype(jnp.int32)

    n_assignable = jnp.sum(free.astype(jnp.int32)) + jnp.sum(evictable.astype(jnp.int32))
    rank = jnp.cumsum(is_new.astype(jnp.int32)) - 1              # [N]
    cand = order[jnp.clip(rank, 0, T - 1)]
    ok = is_new & (rank < n_assignable) & (rank < T)
    slots = jnp.where(ok, cand, -1).astype(jnp.int32)

    # Clear recycled slots and stamp fresh ids.
    scatter_to = jnp.where(ok, cand, T)
    taken = jnp.zeros((T,), bool).at[scatter_to].set(True, mode="drop")
    new_ids = (store.next_id + rank).astype(jnp.int32)
    slot_ids = (
        jnp.full((T,), -1, jnp.int32).at[scatter_to].set(new_ids, mode="drop")
    )
    evicted = taken & store.active
    n_ok = jnp.sum(ok.astype(jnp.int32))

    store = store._replace(
        window=jnp.where(taken[:, None, None], -1.0, store.window),
        length=jnp.where(taken, 0, store.length),
        n_obs=jnp.where(taken, 0, store.n_obs),
        sum_t=jnp.where(taken[:, None], 0.0, store.sum_t),
        sum_azi=jnp.where(taken, 0.0, store.sum_azi),
        sum_dims=jnp.where(taken[:, None], 0.0, store.sum_dims),
        active=jnp.where(taken, False, store.active),
        count=jnp.sum((store.active & ~taken).astype(jnp.int32)),
        track_id=jnp.where(taken, slot_ids, store.track_id),
        last_frame=jnp.where(taken, -1.0, store.last_frame),
        next_id=store.next_id + n_ok,
        n_evicted=store.n_evicted + jnp.sum(evicted.astype(jnp.int32)),
        n_dropped=store.n_dropped + jnp.sum((is_new & ~ok).astype(jnp.int32)),
    )
    return store, slots


class FrameLog(NamedTuple):
    """Device-resident append-only observation log.

    The mapping/merge stages need every observation ever made, not just the
    associator window.  Rather than pulling per-frame results to the host
    (a blocking device->host round trip per frame — the dominant cost on a
    tunneled TPU), the step appends each frame's attached rows here and the
    host drains the log in chunks (OdamPipeline drains + resets every
    ``max_log_frames`` frames, so scenes longer than the capacity lose
    nothing).  Rows are keyed by *global track id*, which survives slot
    eviction in the TrackStore.
    """

    rows: Array   # [F_cap, N, 82] world-frame rows of attached detections
    ids: Array    # [F_cap, N] int32 global track id per row, -1 = not attached
    count: Array  # [] int32 frames logged
    n_lost: Array  # [] int32 frames dropped because the log was full

    @property
    def capacity(self) -> int:
        return self.rows.shape[0]


def init_log(max_frames: int, max_dets: int, dtype=jnp.float32) -> FrameLog:
    return FrameLog(
        rows=jnp.zeros((max_frames, max_dets, TRACK_DIM), dtype),
        ids=jnp.full((max_frames, max_dets), -1, jnp.int32),
        count=jnp.zeros((), jnp.int32),
        n_lost=jnp.zeros((), jnp.int32),
    )


def log_frame(log: FrameLog, rows: Array, ids: Array) -> FrameLog:
    """Append one frame's attach results.

    Args:
        ids: [N] int32 global track id per row, -1 where not attached.

    A full log drops the frame and counts it in ``n_lost`` instead of
    silently overwriting (the pipeline's chunked drain keeps it from ever
    filling in normal operation).
    """
    full = log.count >= log.capacity
    idx = jnp.minimum(log.count, log.capacity - 1)
    ids = ids.astype(jnp.int32)
    write_rows = jnp.where(full, log.rows[idx], rows)
    write_ids = jnp.where(full, log.ids[idx], ids)
    return FrameLog(
        rows=jax.lax.dynamic_update_slice(log.rows, write_rows[None], (idx, 0, 0)),
        ids=jax.lax.dynamic_update_slice(log.ids, write_ids[None], (idx, 0)),
        count=jnp.minimum(log.count + 1, log.capacity),
        n_lost=log.n_lost + full.astype(jnp.int32),
    )


def drain_log(log: FrameLog) -> dict[int, "np.ndarray"]:
    """One host pull: observation rows grouped by global track id.

    Returns {track_id: [n_obs, 82] array}; ids ascend in spawn order.
    Vectorized grouping (stable sort by id, frame order preserved within
    each id) — the naive per-entry Python loop costs seconds per drain at
    6000 x 30 on a small host CPU.
    """
    import numpy as np

    n = int(log.count)
    flat_ids = np.asarray(log.ids[:n]).reshape(-1)
    flat_rows = np.asarray(log.rows[:n]).reshape(-1, TRACK_DIM)
    keep = flat_ids >= 0
    ids = flat_ids[keep]
    rows = flat_rows[keep]
    if len(ids) == 0:
        return {}
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    rows = rows[order]
    uniq, starts = np.unique(ids, return_index=True)
    bounds = np.append(starts, len(ids))
    return {
        int(u): rows[bounds[i]:bounds[i + 1]] for i, u in enumerate(uniq)
    }
