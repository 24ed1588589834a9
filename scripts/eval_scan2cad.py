#!/usr/bin/env python
"""Scan2CAD F1 evaluation CLI (reference surface: src/scripts/eval_scan2cad.py).

    python scripts/eval_scan2cad.py --result_dir ./result/test \
        --scan2cad ./data/Scan2CAD/full_annotations.json \
        --scans_root ./data/ScanNet/scans \
        --val_split ./data/ScanNet/scannetv2_val.txt \
        --threshold 0.25 --min_views 10
"""
from __future__ import annotations

import os

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the axon TPU plugin wins over the env var alone (CLAUDE.md);
    # honor an explicit CPU request before any backend use
    import jax

    jax.config.update("jax_platforms", "cpu")

import argparse
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from odam_tpu.eval import scan2cad  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--result_dir", required=True)
    ap.add_argument("--scan2cad", default="./data/Scan2CAD/full_annotations.json")
    ap.add_argument("--scans_root", default="./data/ScanNet/scans")
    ap.add_argument("--val_split", default="./data/ScanNet/scannetv2_val.txt")
    ap.add_argument("--threshold", type=float, default=0.25)
    ap.add_argument("--min_views", type=int, default=1)
    ap.add_argument("--vid2cad_csv", default=None,
                    help="score Vid2CAD CSV predictions instead of pickles")
    ap.add_argument("--box2cad", default="./box2cad.json",
                    help="CAD bbox-normalization table for --vid2cad_csv")
    args = ap.parse_args()

    with open(args.val_split) as f:
        sequences = f.read().splitlines()
    scan2cad.evaluate(
        args.result_dir, args.scan2cad, args.scans_root, sequences,
        threshold=args.threshold, min_views=args.min_views,
        vid2cad_csv=args.vid2cad_csv, box2cad_path=args.box2cad,
    )


if __name__ == "__main__":
    main()
