"""Dense LM-envelope boundary sweep: refit the auto-router thresholds.

The LM solver's envelope constants (mapping/lm_solver.py:
ENVELOPE_EDGE_FRAC_MIN / ENVELOPE_ASPECT_MIN) route out-of-envelope objects
to the reference-exact Adam solve.  Round 2 derived them from a 12-case
qualitative sweep; this script densifies the boundary (VERDICT r2 #8):
a grid of edge-keep fraction x aspect ratio, every cell solved by BOTH
paths in ONE batched call each (cells are just objects of the batched
solvers — no per-cell loop), then reports the per-cell IoU delta
(LM - Adam) and the tightest thresholds with a 0.02-IoU safety margin.

Run: ``python scripts/lm_envelope_sweep.py [--views 48] [--samples 256]``.
"""
from __future__ import annotations

import argparse

import numpy as np

EDGE_FRACS = (0.30, 0.40, 0.50, 0.60, 0.70)
ASPECTS = (0.06, 0.09, 0.12, 0.16, 0.20)
SEEDS = (0, 1)


def _look_at(cam, target):
    fwd = target - cam
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, [0.0, 0.0, 1.0])
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    T = np.eye(4)
    T[:3, 0], T[:3, 1], T[:3, 2], T[:3, 3] = right, down, fwd, cam
    return T


def build_batch(edge_fracs=EDGE_FRACS, aspects=ASPECTS, seeds=SEEDS,
                n_views: int = 48, noise: float = 1.0):
    """All grid cells as one object batch: returns solver args + metadata."""
    import jax.numpy as jnp

    from odam_tpu.mapping import superquadric as sq
    from odam_tpu.utils import geometry as geo

    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)
    center = np.array([0.1, -0.2, 0.8])
    angle = 0.35

    cells = [(e, a, s) for e in edge_fracs for a in aspects for s in seeds]
    O, V = len(cells), n_views
    boxes = np.zeros((O, V, 4), np.float32)
    box_mask = np.zeros((O, V, 4), np.float32)
    P_cw = np.zeros((O, V, 3, 4), np.float32)
    init_t = np.zeros((O, 3), np.float32)
    init_a = np.zeros((O,), np.float32)
    init_d = np.zeros((O, 3), np.float32)
    gts = np.zeros((O, 8, 3))

    for o, (edge_frac, aspect, seed) in enumerate(cells):
        rng = np.random.default_rng(100 + seed)
        dims = np.array([1.2, 1.05, 1.2 * aspect])
        corners = np.asarray(geo.box3d_corners(
            jnp.asarray(dims), jnp.asarray(angle), jnp.asarray(center)))
        gts[o] = corners
        for v in range(V):
            phi = 2 * np.pi * v / V
            cam = center + 3.0 * np.array([np.cos(phi), np.sin(phi), 0.35])
            P = K @ np.linalg.inv(_look_at(cam, center))[:3, :]
            hom = np.concatenate([corners, np.ones((8, 1))], 1)
            uv = hom @ P.T
            uv = uv[:, :2] / uv[:, 2:]
            boxes[o, v] = [uv[:, 0].min(), uv[:, 1].min(),
                           uv[:, 0].max(), uv[:, 1].max()]
            boxes[o, v] += rng.normal(0, noise, 4)
            box_mask[o, v] = rng.random(4) < edge_frac
            P_cw[o, v] = P
        init_t[o] = center + [0.3, -0.2, 0.1]
        init_a[o] = angle + 0.15
        init_d[o] = dims * 1.3

    init = sq.init_params(jnp.asarray(init_t), jnp.asarray(init_a),
                          jnp.asarray(init_d))
    args = (
        init, jnp.asarray(boxes), jnp.asarray(box_mask),
        jnp.ones((O, V), jnp.float32), jnp.asarray(P_cw),
        jnp.ones((O,), bool), None,
    )
    return args, cells, gts


def run_sweep(n_views: int = 48, n_samples: int = 256,
              lm_iters: int = 25, adam_iters: int = 150,
              verbose: bool = True):
    import jax.numpy as jnp  # noqa: F401  (device selection side effect)

    from odam_tpu.mapping import lm_solver, optimizer
    from odam_tpu.utils import host_boxes

    args, cells, gts = build_batch(n_views=n_views)
    lm = lm_solver.optimize_superquadrics_lm(
        *args, n_iters=lm_iters, n_samples=n_samples, use_prior=False)
    ad = optimizer.optimize_superquadrics(
        *args, n_iters=adam_iters, n_samples=n_samples, use_prior=False)

    # A-posteriori residuals of both solutions: calibrates ACCEPT_RESID_MAX
    # (the Adam residuals are the observation-noise floor a perfect solver
    # pays; the gate must sit above that floor and below failed-LM levels).
    lm_resid = np.asarray(lm_solver.normalized_fit_residual(
        lm.params, *args[1:5], n_samples=n_samples))
    ad_resid = np.asarray(lm_solver.normalized_fit_residual(
        ad.params, *args[1:5], n_samples=n_samples))

    rows = []
    for o, (edge_frac, aspect, seed) in enumerate(cells):
        lm_iou, _ = host_boxes.box3d_iou(
            np.asarray(lm.corners[o], np.float64), gts[o])
        ad_iou, _ = host_boxes.box3d_iou(
            np.asarray(ad.corners[o], np.float64), gts[o])
        rows.append((edge_frac, aspect, seed, lm_iou, ad_iou,
                     float(lm_resid[o]), float(ad_resid[o])))

    # Aggregate the worst delta per (edge_frac, aspect) cell over seeds.
    agg: dict = {}
    for e, a, s, lm_iou, ad_iou, _, _ in rows:
        d = lm_iou - ad_iou
        agg[(e, a)] = min(agg.get((e, a), np.inf), d)

    if verbose:
        efs = sorted({e for e, _ in agg})
        asps = sorted({a for _, a in agg})
        print("worst-over-seeds IoU delta (LM - Adam); rows=edge_frac, cols=aspect")
        print("        " + "  ".join(f"{a:6.2f}" for a in asps))
        for e in efs:
            print(f"  {e:4.2f}  " + "  ".join(f"{agg[(e, a)]:+6.3f}" for a in asps))

    # Tightest thresholds with a 0.02 margin: smallest (edge_frac, aspect)
    # grid corner such that every cell at or above BOTH is within -0.02.
    ok_corners = []
    efs = sorted({e for e, _ in agg})
    asps = sorted({a for _, a in agg})
    for te in efs:
        for ta in asps:
            cells_in = [(e, a) for e, a in agg if e >= te and a >= ta]
            if cells_in and all(agg[c] >= -0.02 for c in cells_in):
                ok_corners.append((te, ta))
    if verbose:
        print("corners with all-in-envelope cells within -0.02:", ok_corners)
        if ok_corners:
            best = min(ok_corners)
            print(f"suggested: ENVELOPE_EDGE_FRAC_MIN ~ {best[0]}, "
                  f"ENVELOPE_ASPECT_MIN ~ {best[1]} (add safety margin)")
        # Residual-gate calibration: separate good LM fits (delta >= -0.02)
        # from failures (delta < -0.05) by the normalized residual alone.
        good = [r[5] for r in rows if r[3] - r[4] >= -0.02]
        bad = [r[5] for r in rows if r[3] - r[4] < -0.05]
        floor = [r[6] for r in rows]
        print(f"normalized residual — Adam floor: max {max(floor):.3f}; "
              f"good-LM: max {max(good):.3f} (n={len(good)}); "
              f"failed-LM: min {min(bad) if bad else float('nan'):.3f} "
              f"(n={len(bad)})")
        if bad and max(good) < min(bad):
            print(f"suggested ACCEPT_RESID_MAX in ({max(good):.3f}, "
                  f"{min(bad):.3f})")
    return rows, agg, ok_corners


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--views", type=int, default=48)
    ap.add_argument("--samples", type=int, default=256)
    ap.add_argument("--lm_iters", type=int, default=25)
    ap.add_argument("--adam_iters", type=int, default=150)
    args = ap.parse_args()
    run_sweep(args.views, args.samples, args.lm_iters, args.adam_iters)
