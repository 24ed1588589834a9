#!/usr/bin/env python
"""Heuristic tracker baseline CLI (reference surface: src/scripts/run_tracking.py).

Runs the detector with the non-learned IoU/point-containment tracker instead
of the GNN associator; needs RGB (and optionally depth) frames.

    python scripts/run_tracking.py --config_path configs/detr_scan_net.yaml \
        --scans_root ./data/ScanNet/scans --out_dir ./result/tracking
"""
from __future__ import annotations

import argparse
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from odam_tpu import config as config_mod  # noqa: E402
from odam_tpu.data import scannet, transforms  # noqa: E402


def main():
    from odam_tpu.utils import compile_cache
    compile_cache.enable()
    ap = argparse.ArgumentParser()
    ap.add_argument("--config_path", default="configs/detr_scan_net.yaml")
    ap.add_argument("--scans_root", default="./data/ScanNet/scans")
    ap.add_argument("--sequences", default=None)
    ap.add_argument("--detector_ckpt", default="./experiments/detector.pth")
    ap.add_argument("--detect_threshold", type=float, default=0.6)
    ap.add_argument("--track_threshold", type=float, default=0.6)
    ap.add_argument("--out_dir", default="./result/tracking")
    ap.add_argument("--use_depth", action="store_true",
                    help="use depth maps (frames/depth/*.png) for point matching")
    ap.add_argument("--max_frames", default=None, type=int)
    args = ap.parse_args()

    import jax.numpy as jnp
    from PIL import Image

    from odam_tpu.models import detr as detr_mod
    from odam_tpu.runtime.heuristic_tracker import HeuristicTracker
    from scripts.run_processor import build_models

    cfg = config_mod.merge_cfg([args.config_path])
    detr, dparams, _, _ = build_models(cfg, args.detector_ckpt, None)

    sequences = None
    if args.sequences:
        with open(args.sequences) as f:
            sequences = f.read().splitlines()
    index = scannet.SceneIndex(args.scans_root, sequences)

    for seq_id in index.sequences:
        print(f"tracking: {seq_id}")
        K = scannet.read_intrinsic(index.intrinsic_path(seq_id))[:3, :3]
        axis_align = scannet.read_axis_align(index.meta_path(seq_id))
        frames = index.frame_names(seq_id)
        if args.max_frames:
            frames = frames[: args.max_frames]

        first = np.asarray(Image.open(index.image_path(seq_id, frames[0])))
        ih, iw = transforms.target_size(*first.shape[:2])
        K_s = K.copy()
        K_s[0] *= iw / first.shape[1]
        K_s[1] *= ih / first.shape[0]

        tracker = HeuristicTracker(track_threshold=args.track_threshold)
        t0 = time.time()
        for frame in frames:
            T_cw = scannet.read_extrinsic(index.pose_path(seq_id, frame))
            if np.isnan(T_cw).any():
                continue
            T_wc = axis_align @ np.linalg.inv(T_cw)
            rgb = np.asarray(Image.open(index.image_path(seq_id, frame)))
            img = transforms.preprocess_image(rgb, ih, iw)
            out = detr.apply(dparams, jnp.asarray(img)[None])
            dets = detr_mod.postprocess(
                out, jnp.asarray(float(iw)), jnp.asarray(float(ih)),
                jnp.asarray(args.detect_threshold), jnp.asarray(K_s),
            )
            det_list = []
            for i in range(int(dets.valid.shape[1])):
                if not bool(dets.valid[0, i]):
                    continue
                det_list.append({
                    "cls": int(dets.classes[0, i]),
                    "box": np.asarray(dets.boxes[0, i]),
                    "dims": np.asarray(dets.dims[0, i]),
                    "t_co": np.asarray(dets.t_co[0, i]),
                    "score": float(dets.scores[0, i]),
                    "angle": float(dets.angle_deg[0, i]) * np.pi / 180.0,
                })
            depth = depth_K = img_for_depth = None
            if args.use_depth:
                dpath = os.path.join(
                    args.scans_root, seq_id, "frames", "depth", f"{frame}.png"
                )
                if os.path.exists(dpath):
                    depth = np.asarray(Image.open(dpath)).astype(np.float32) / 1000.0
                    depth_K = K  # depth shares intrinsics up to resolution scaling
                    img_for_depth = rgb
            tracker.step(det_list, int(frame), T_wc, img_for_depth, depth, depth_K)
        fps = len(frames) / max(time.time() - t0, 1e-6)
        tracks = tracker.export_tracks()
        print(f"  {len(frames)} frames, {fps:.1f} fps, {len(tracks)} tracks")

        out_dir = os.path.join(args.out_dir, seq_id)
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, seq_id), "wb") as f:
            pickle.dump({"tracks": tracks}, f)


if __name__ == "__main__":
    main()
