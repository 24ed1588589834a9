"""Config-ablation matrix over the HARD rehearsal split.

Runs the real run_processor -> eval_scan2cad CLI chain for every
combination of the three accuracy-relevant config axes the pipeline
exposes — mapping solver (adam/lm), association decode (exact/greedy),
track re-projection (sampled/exact) — plus a deliberate fault injection
(skip the per-frame projected-bbox refresh) that a discriminative
benchmark must catch as an F1 drop.

    PYTHONPATH=.:examples/cli_rehearsal python examples/cli_rehearsal/ablate.py \
        [--data examples/cli_rehearsal/data_hard] \
        [--detector_ckpt rehearsal_hard_detr_ckpt] \
        [--associator_ckpt rehearsal_hard_assoc_ckpt]

Prints a table and writes ablation.json next to the results.
"""
from __future__ import annotations

import argparse
import itertools
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _img_size(data):
    with open(os.path.join(data, "rehearsal.yaml")) as f:
        m = re.search(r"img_h:\s*(\d+)", f.read())
    return m.group(1)


def run_config(data, out_root, name, extra_args, env_extra, ckpts):
    out_dir = os.path.join(out_root, name)
    img = _img_size(data)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = f"{REPO}:" + env.get("PYTHONPATH", "")
    env.update(env_extra)
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/run_processor.py"),
         "--config_path", os.path.join(data, "rehearsal.yaml"),
         "--scans_root", os.path.join(data, "scans"),
         "--detector_ckpt", ckpts[0], "--associator_ckpt", ckpts[1],
         "--out_dir", out_dir, "--offline", "--use_prior",
         "--short_side", img, "--max_size", img, "--dtype", "float32",
         # static mapping shapes right-sized to the rehearsal scenes
         # (<=10 objects, 32 frames): identical results, ~16x less padded
         # mapping compute per cell on the 1-core CPU host
         "--max_objs", "24", "--max_views", "64",
         ] + extra_args,
        cwd=REPO, env=env, capture_output=True, text=True,
    )
    if r.returncode != 0:
        print(r.stdout[-2000:], r.stderr[-2000:])
        raise RuntimeError(f"run_processor failed for {name}")
    ev = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/eval_scan2cad.py"),
         "--result_dir", out_dir,
         "--scan2cad", os.path.join(data, "full_annotations.json"),
         "--scans_root", os.path.join(data, "scans"),
         "--val_split", os.path.join(data, "val.txt"),
         "--min_views", "10"],
        cwd=REPO, env=env, capture_output=True, text=True,
    )
    if ev.returncode != 0:
        print(ev.stdout[-2000:], ev.stderr[-2000:])
        raise RuntimeError(f"eval failed for {name}")
    m = re.search(r"average: precision ([0-9.]+) recall ([0-9.]+) F1 ([0-9.]+)",
                  ev.stdout)
    prec, rec, f1 = (float(x) for x in m.groups())
    dt = time.time() - t0
    print(f"{name::>40}: F1 {f1:.3f} (P {prec:.3f} R {rec:.3f}) [{dt:.0f}s]", flush=True)
    return {"name": name, "precision": prec, "recall": rec, "f1": f1,
            "seconds": dt}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="examples/cli_rehearsal/data_hard")
    ap.add_argument("--out", default="examples/cli_rehearsal/result_hard")
    ap.add_argument("--detector_ckpt", default="rehearsal_hard_detr_ckpt")
    ap.add_argument("--associator_ckpt", default="rehearsal_hard_assoc_ckpt")
    ap.add_argument("--full", action="store_true",
                    help="all 8 config cells (default: the 4 informative "
                         "ones: axes varied one at a time)")
    args = ap.parse_args()
    data = os.path.abspath(args.data)
    ckpts = (os.path.abspath(args.detector_ckpt),
             os.path.abspath(args.associator_ckpt))

    results = []
    if args.full:
        combos = list(itertools.product(("adam", "lm"), ("exact", "greedy"),
                                        ("sampled", "exact")))
    else:
        combos = [("adam", "exact", "sampled"),   # reference semantics
                  ("lm", "exact", "sampled"),     # solver axis
                  ("adam", "greedy", "sampled"),  # decode axis
                  ("adam", "exact", "exact"),     # projection axis
                  ("lm", "greedy", "exact")]      # full fast profile
    def bank():
        # written after every cell: a killed matrix keeps its finished cells
        with open(os.path.join(args.out, "ablation.json"), "w") as f:
            json.dump(results, f, indent=1)

    for solver, decode, bbox in combos:
        name = f"{solver}_{decode}_{bbox}"
        results.append(run_config(
            data, args.out, name,
            ["--solver", solver, "--decode", decode, "--track_bbox", bbox],
            {}, ckpts,
        ))
        bank()

    # fault injection: a discriminative benchmark must catch this
    results.append(run_config(
        data, args.out, "FAULT_stale_track_bbox",
        ["--solver", "adam", "--decode", "exact", "--track_bbox", "sampled"],
        {"ODAM_FAULT_INJECT": "stale_track_bbox"}, ckpts,
    ))
    bank()
    base = results[0]["f1"]
    fault = results[-1]["f1"]
    print(f"\nbaseline F1 {base:.3f}; injected-bug F1 {fault:.3f} "
          f"(drop {base - fault:+.3f})")


if __name__ == "__main__":
    main()
