"""Linear assignment (Hungarian) entirely on device.

The reference calls scipy.optimize.linear_sum_assignment on host in three
places — the training matcher (matcher.py:76), association decode
(associator.py:30), and the feature tracker (run_tracking.py:212).  Moving
assignment on-device removes a host round-trip from every pipeline frame and
lets the full training step jit/pjit without callbacks.

This is a from-scratch JAX implementation of the shortest-augmenting-path
(Jonker–Volkgenant style) algorithm with dual potentials: the outer loop runs
once per row (``lax.fori_loop``), the inner Dijkstra sweep and the
augmentation walk are bounded ``lax.while_loop``s over fixed-size state, so
the whole solve compiles to one XLA program and vmaps across batches.

Exactness: produces an optimal assignment (cost-optimal; ties may resolve
differently than scipy).  Validated against scipy on random matrices in
tests/test_lap.py.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array

_INF = jnp.inf
_BIG_COST = 1e6


def _solve_square_leq(cost: Array) -> Array:
    """Core solver; cost [R, C] with R <= C. Returns col4row [R] (column per row)."""
    R, C = cost.shape
    dtype = cost.dtype

    def assign_row(cur_row, state):
        u, v, row4col, col4row = state

        spc0 = jnp.full((C,), _INF, dtype=dtype)  # shortest path costs per col
        path0 = jnp.full((C,), -1, dtype=jnp.int32)  # predecessor row per col
        sc0 = jnp.zeros((C,), dtype=bool)  # scanned columns
        sr0 = jnp.zeros((R,), dtype=bool)  # scanned rows

        def dijkstra_cond(s):
            _, _, _, _, _, _, sink = s
            return sink < 0

        def dijkstra_body(s):
            i, min_val, spc, path, sr, sc, _ = s
            sr = sr.at[i].set(True)
            r = min_val + cost[i] - u[i] - v
            better = (~sc) & (r < spc)
            spc = jnp.where(better, r, spc)
            path = jnp.where(better, i, path)

            masked = jnp.where(sc, _INF, spc)
            lowest = jnp.min(masked)
            # Prefer an unassigned column among the minimizers (mirrors the
            # classical tie-break that shortens augmenting paths).
            is_min = (masked <= lowest) & (~sc)
            unassigned = is_min & (row4col < 0)
            j = jnp.where(
                jnp.any(unassigned),
                jnp.argmax(unassigned),
                jnp.argmax(is_min),
            ).astype(jnp.int32)
            sc = sc.at[j].set(True)
            nxt_i = row4col[j]
            sink = jnp.where(nxt_i < 0, j, -1)
            i = jnp.where(nxt_i < 0, i, nxt_i)
            return (i, lowest, spc, path, sr, sc, sink)

        init = (
            jnp.asarray(cur_row, jnp.int32),
            jnp.zeros((), dtype=dtype),
            spc0,
            path0,
            sr0,
            sc0,
            jnp.asarray(-1, jnp.int32),
        )
        _, min_val, spc, path, sr, sc, sink = jax.lax.while_loop(
            dijkstra_cond, dijkstra_body, init
        )

        # Dual updates (standard JV potentials).
        u = u.at[cur_row].add(min_val)
        other_rows = sr & (jnp.arange(R) != cur_row)
        spc_at_row_cols = spc[jnp.clip(col4row, 0, C - 1)]
        u = jnp.where(other_rows, u + min_val - spc_at_row_cols, u)
        v = jnp.where(sc, v - (min_val - spc), v)

        # Augment along the alternating path back to cur_row.
        def aug_cond(s):
            _, _, _, done = s
            return ~done

        def aug_body(s):
            sink_j, r4c, c4r, _ = s
            i = path[sink_j]
            r4c = r4c.at[sink_j].set(i)
            prev = c4r[i]
            c4r = c4r.at[i].set(sink_j)
            done = i == cur_row
            return (prev, r4c, c4r, done)

        _, row4col, col4row, _ = jax.lax.while_loop(
            aug_cond, aug_body, (sink, row4col, col4row, jnp.asarray(False))
        )
        return (u, v, row4col, col4row)

    u0 = jnp.zeros((R,), dtype=dtype)
    v0 = jnp.zeros((C,), dtype=dtype)
    row4col0 = jnp.full((C,), -1, jnp.int32)
    col4row0 = jnp.full((R,), -1, jnp.int32)
    _, _, _, col4row = jax.lax.fori_loop(
        0, R, assign_row, (u0, v0, row4col0, col4row0)
    )
    return col4row


@jax.jit
def linear_sum_assignment(cost: Array) -> tuple[Array, Array]:
    """Optimal assignment minimizing total cost; cost [R, C].

    Returns:
        (row_ids [K], col_ids [K]) with K = min(R, C), rows in ascending order
        — same contract as scipy.optimize.linear_sum_assignment.
    """
    R, C = cost.shape
    cost = cost.astype(jnp.float32)
    if R <= C:
        col4row = _solve_square_leq(cost)
        return jnp.arange(R), col4row
    row4col = _solve_square_leq(cost.T)
    order = jnp.argsort(row4col)
    return row4col[order], jnp.arange(C)[order]


@partial(jax.jit, static_argnames=())
def masked_assignment(cost: Array, row_mask: Array, col_mask: Array) -> Array:
    """Assignment over the valid submatrix of a padded cost matrix.

    Invalid rows/columns are priced out so the solve keeps a static shape;
    assignments that touch an invalid slot are reported as unmatched.

    The pricing is SCALE-AWARE: valid costs are shifted to start at 0 and
    invalid slots priced at 128x the valid-cost span.  A fixed huge constant
    (the previous 1e6) is wrong in float32 — eps(1e6) ~ 0.06, so once the
    dual potentials absorb the big constant, genuine cost gaps below 0.06
    are rounded away and the solver returns near-arbitrary assignments
    among the valid pairs (caught by the pipeline replay-parity test: the
    associator decode picked a total 1e-3 worse than scipy's optimum on a
    64x30 padded matrix with 3x4 valid).

    Args:
        cost: [R, C]; row_mask: [R] bool; col_mask: [C] bool.

    Returns:
        col4row [R]: assigned column per row, -1 where unmatched/invalid.
    """
    R, C = cost.shape
    valid = row_mask[:, None] & col_mask[None, :]
    cost = jnp.clip(cost, -_BIG_COST, _BIG_COST)
    any_valid = jnp.any(valid)
    lo = jnp.where(any_valid, jnp.min(jnp.where(valid, cost, jnp.inf)), 0.0)
    hi = jnp.where(any_valid, jnp.max(jnp.where(valid, cost, -jnp.inf)), 0.0)
    span = jnp.maximum(hi - lo, 1e-6)
    big = span * 128.0
    cost = jnp.where(valid, cost - lo, big)
    if R <= C:
        col4row = _solve_square_leq(cost)
    else:
        row4col = _solve_square_leq(cost.T)
        col4row = jnp.full((R,), -1, jnp.int32)
        col4row = col4row.at[row4col].set(jnp.arange(C, dtype=jnp.int32))
    ok = (
        row_mask
        & (col4row >= 0)
        & col_mask[jnp.clip(col4row, 0, C - 1)]
        & (cost[jnp.arange(R), jnp.clip(col4row, 0, C - 1)] < big / 2)
    )
    return jnp.where(ok, col4row, -1)


def greedy_peel_match(score: Array, threshold: float | Array,
                      row_mask: Array | None = None,
                      col_mask: Array | None = None) -> Array:
    """Greedy global-argmax assignment decode: [M, N] score -> [N] track ids.

    Repeatedly takes the highest remaining score, assigns that (track,
    detection) pair, and removes its row/column — min(M, N) vectorized steps
    instead of the Hungarian solver's long sequential while-loops.  On
    Sinkhorn-sharpened (near-permutation) score matrices this decodes
    identically to the exact solver (tested); it is the pipeline's
    low-latency default, with :func:`match_by_score` as the exact option.
    """
    M, N = score.shape
    neg = -jnp.inf
    s = score
    if row_mask is not None:
        s = jnp.where(row_mask[:, None], s, neg)
    if col_mask is not None:
        s = jnp.where(col_mask[None, :], s, neg)

    def body(carry, _):
        s, out = carry
        flat = jnp.argmax(s)
        r = flat // N
        c = flat % N
        ok = s[r, c] > threshold
        out = jnp.where(ok, out.at[c].set(r.astype(jnp.int32)), out)
        # remove the pair whether or not it cleared the threshold (nothing
        # below the current max can exceed it later)
        s = s.at[r, :].set(neg).at[:, c].set(neg)
        return (s, out), None

    (_, out), _ = jax.lax.scan(
        body, (s, jnp.full((N,), -1, jnp.int32)), None, length=min(M, N)
    )
    if col_mask is not None:
        out = jnp.where(col_mask, out, -1)
    return out


def match_by_score(score: Array, threshold: float | Array,
                   row_mask: Array | None = None,
                   col_mask: Array | None = None) -> Array:
    """Track-per-detection decode used by the associator.

    Equivalent capability to reference associator.py:17-34
    (hungarian_matching): solve LAP on cost = 1 - score and keep matches whose
    score exceeds ``threshold``.

    Args:
        score: [M, N] (tracks x detections) score matrix in [0, 1].

    Returns:
        match_track_ids [N]: track index per detection, -1 if unmatched.
    """
    M, N = score.shape
    if row_mask is None:
        row_mask = jnp.ones((M,), bool)
    if col_mask is None:
        col_mask = jnp.ones((N,), bool)
    col4row = masked_assignment(1.0 - score, row_mask, col_mask)  # column per track
    rows = jnp.arange(M)
    ok = (col4row >= 0) & (
        score[rows, jnp.clip(col4row, 0, N - 1)] > threshold
    )
    # Scatter track ids into their matched detection slots; rejected matches
    # are routed to an out-of-range index and dropped.
    idx = jnp.where(ok, col4row, N)
    track_for_det = (
        jnp.full((N,), -1, jnp.int32).at[idx].set(rows.astype(jnp.int32), mode="drop")
    )
    return jnp.where(col_mask, track_for_det, -1)
