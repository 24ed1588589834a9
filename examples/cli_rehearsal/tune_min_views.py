"""min_views operating-point sweep on the TUNING split (eval-time only).

The reference evaluates at ``--min_views 10`` (eval_scan2cad.py:349 default
protocol; load_prediction_ours drops tracks with fewer rows) and the miss
audit classifies the dominant remaining loss as ``short_track`` — a
well-placed track exists but assembles < 10 rows (several objects have
19-25 detectable frames yet yield 6-9 attached rows under occlusion gaps).
min_views is purely an eval-load filter, so existing result pickles can be
re-scored without re-running the pipeline: this sweeps min_views on the
TUNE split over the already-produced threshold-sweep result dirs, prints
the grid, and the argmax is then reported ONCE on the eval split (as with
the attach-threshold tuning, MEASURED.md).

    PYTHONPATH=.:examples/cli_rehearsal python examples/cli_rehearsal/tune_min_views.py
"""
from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, REPO)

# Eval is host-side NumPy; pin the CPU backend BEFORE importing odam_tpu —
# the env var alone does not override this image's axon TPU plugin, and a
# stray TPU backend init would stall on (or contend with) the tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from odam_tpu.eval import scan2cad as s2c  # noqa: E402


def score(result_dir: str, data: str, min_views: int) -> dict:
    with open(os.path.join(data, "val.txt")) as f:
        sequences = f.read().splitlines()
    out = s2c.evaluate(
        result_dir,
        os.path.join(data, "full_annotations.json"),
        os.path.join(data, "scans"),
        sequences,
        min_views=min_views,
        verbose=False,
    )
    avg = out["average"]
    return {"min_views": min_views, "f1": round(avg["f1"], 4),
            "precision": round(avg["precision"], 4),
            "recall": round(avg["recall"], 4)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="examples/cli_rehearsal/data_hard_tune")
    ap.add_argument("--results", default="examples/cli_rehearsal/result_hard_tune")
    ap.add_argument("--configs", default="thr0.6_att0.7,thr0.6_att0.8")
    ap.add_argument("--min_views", default="4,6,8,10")
    ap.add_argument("--out", default=None,
                    help="JSON output path (default <results>/min_views_sweep.json)")
    args = ap.parse_args()

    rows = []
    for cfg in args.configs.split(","):
        rdir = os.path.join(args.results, cfg)
        if not os.path.isdir(rdir):
            print(f"skip {cfg}: no result dir {rdir}", file=sys.stderr)
            continue
        for mv in (int(v) for v in args.min_views.split(",")):
            r = {"config": cfg, **score(rdir, args.data, mv)}
            rows.append(r)
            print(f"{cfg} min_views={mv}: F1 {r['f1']:.3f} "
                  f"P {r['precision']:.3f} R {r['recall']:.3f}", flush=True)
    out = args.out or os.path.join(args.results, "min_views_sweep.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
    best = max(rows, key=lambda r: r["f1"])
    print(f"\nbest on tuning split: {best['config']} min_views="
          f"{best['min_views']} (F1 {best['f1']:.3f}, "
          f"P {best['precision']:.3f}, R {best['recall']:.3f})")


if __name__ == "__main__":
    main()
