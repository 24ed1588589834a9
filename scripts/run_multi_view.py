#!/usr/bin/env python
"""Standalone mapping stage: optimize superquadrics from cached tracks.

Reference surface: src/scripts/run_multi_view.py — runs the multi-view
optimization for every object in cached track pickles, without re-running
detection/association.  Useful for iterating on the optimizer and for the
"batched SQ optimization from cached detections" benchmark config
(BASELINE.json configs[2]).

    python scripts/run_multi_view.py --tracks <pickle-with-tracks> \
        --scans_root ./data/ScanNet/scans --scene scene0000_00 --out out.pkl
"""
from __future__ import annotations

import argparse
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from odam_tpu.utils import compile_cache
    compile_cache.enable()
    ap = argparse.ArgumentParser()
    ap.add_argument("--tracks", required=True,
                    help="pickle holding {'tracks': [...]} or a raw track list")
    ap.add_argument("--scans_root", default="./data/ScanNet/scans")
    ap.add_argument("--scene", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--representation", default="super_quadric")
    ap.add_argument("--use_prior", action="store_true")
    ap.add_argument("--n_iters", type=int, default=200)
    ap.add_argument("--min_views", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from odam_tpu.data import scannet, transforms
    from odam_tpu.mapping import constraints, optimizer, prior, superquadric as sq

    with open(args.tracks, "rb") as f:
        data = pickle.load(f)
    tracks = data["tracks"] if isinstance(data, dict) else data

    index = scannet.SceneIndex(args.scans_root, [args.scene])
    K = scannet.read_intrinsic(index.intrinsic_path(args.scene))[:3, :3]
    axis_align = scannet.read_axis_align(index.meta_path(args.scene))
    frames = index.frame_names(args.scene)

    frame_ids, P_cws = [], []
    for frame in frames:
        T_cw = scannet.read_extrinsic(index.pose_path(args.scene, frame))
        if np.isnan(T_cw).any():
            continue
        T_wc = axis_align @ np.linalg.inv(T_cw)
        frame_ids.append(int(frame))
        P_cws.append(K @ np.linalg.inv(T_wc)[:3, :])

    img_h, img_w = 968, 1296  # ScanNet color resolution
    sc = constraints.build_scene_constraints(
        tracks, np.asarray(frame_ids), np.asarray(P_cws), img_h, img_w,
        max_objs=max(len(tracks), 1), max_views=512, min_views=args.min_views,
    )
    init = sq.init_params(
        jnp.asarray(sc.init_translate), jnp.asarray(sc.init_angle),
        jnp.asarray(sc.init_dims), args.representation,
    )
    t0 = time.time()
    res = optimizer.optimize_superquadrics(
        init, jnp.asarray(sc.boxes), jnp.asarray(sc.box_mask),
        jnp.asarray(sc.view_mask), jnp.asarray(sc.P_cw),
        jnp.asarray(sc.optimize_mask),
        jnp.asarray(prior.prior_invcov_for_classes(sc.obj_class)),
        n_iters=args.n_iters, representation=args.representation,
        use_prior=args.use_prior,
    )
    jax.block_until_ready(res.corners)
    print(f"optimized {int(sc.obj_valid.sum())} objects in {time.time() - t0:.2f}s")

    out = {
        "tracks": tracks,
        "bboxes_qc": list(np.asarray(res.corners)[: len(tracks)]),
        "bboxes_dl": list(np.asarray(res.corners_detector)[: len(tracks)]),
        "quadrics": jax.tree.map(np.asarray, res.params),
    }
    with open(args.out, "wb") as f:
        pickle.dump(out, f)


if __name__ == "__main__":
    main()
