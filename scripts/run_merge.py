#!/usr/bin/env python
"""Standalone track-merge stage over cached mapping outputs.

Reference surface: src/scripts/run_merge.py — cluster optimized boxes by
oriented-3D-IoU and fuse fragmented tracks.

    python scripts/run_merge.py --input result/scene0000_00/scene0000_00 \
        --frames 0,1,2,... --out merged.pkl
"""
from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from odam_tpu.mapping import merge  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="pickle with {tracks, bboxes_qc, ...}")
    ap.add_argument("--out", required=True)
    ap.add_argument("--threshold", type=float, default=merge.MERGE_DISTANCE_THRESHOLD)
    args = ap.parse_args()

    with open(args.input, "rb") as f:
        data = pickle.load(f)
    frame_ids = np.unique(np.concatenate([t[:, 0] for t in data["tracks"]]))
    merged = merge.merge_tracks(
        data["tracks"], data["bboxes_qc"], frame_ids, args.threshold
    )
    print(f"{len(data['tracks'])} tracks -> {len(merged)} after merge")
    with open(args.out, "wb") as f:
        pickle.dump({"tracks": merged}, f)


if __name__ == "__main__":
    main()
