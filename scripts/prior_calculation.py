#!/usr/bin/env python
"""Recompute the per-class scale prior from Scan2CAD annotations.

Reference surface: src/super_quadric/prior_calculation.py.  The framework
ships the resulting tables as literals (odam_tpu/mapping/prior.py); this
script regenerates them from a full_annotations.json.
"""
from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from odam_tpu.mapping import prior  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scan2cad", required=True,
                    help="path to Scan2CAD full_annotations.json")
    ap.add_argument("--out", default=None, help="optional pickle output path")
    args = ap.parse_args()

    tables = prior.compute_scale_prior(args.scan2cad)
    for cat, invcov in tables.items():
        print(prior.CLASS_NAMES[cat])
        print(invcov)
        print("---------")
    if args.out:
        with open(args.out, "wb") as f:
            pickle.dump(tables, f)


if __name__ == "__main__":
    main()
