#!/usr/bin/env python
"""Inspect mapping results: export superquadric meshes / view interactively.

Reference surface: src/viewers/result_viewer.py.  Without Open3D installed,
exports a Wavefront OBJ instead of opening a window.

    python scripts/result_viewer.py --input result/scene0000_00/scene0000_00 \
        --obj_out scene.obj
"""
from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from odam_tpu.utils import visualization as viz  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="run_processor output pickle")
    ap.add_argument("--obj_out", default=None, help="write OBJ mesh here")
    ap.add_argument("--scene_mesh", default=None, help="optional scene mesh to overlay")
    ap.add_argument("--grid", type=int, default=32)
    args = ap.parse_args()

    with open(args.input, "rb") as f:
        data = pickle.load(f)
    quadrics = [q for q in data.get("quadrics", []) if q is not None]
    print(f"{len(quadrics)} objects")

    if args.obj_out:
        viz.export_scene_obj(args.obj_out, quadrics, grid=args.grid)
        print(f"wrote {args.obj_out}")
        return
    try:
        viz.view_scene_open3d(quadrics, args.scene_mesh)
    except ImportError:
        out = os.path.splitext(args.input)[0] + ".obj"
        viz.export_scene_obj(out, quadrics, grid=args.grid)
        print(f"open3d unavailable; wrote {out}")


if __name__ == "__main__":
    main()
