"""Associator-window accuracy experiment: 100 (reference bound) vs 400.

The reference caps the association history at a 100-step window
(src/processor.py:133-178).  The flash streaming-softmax kernel
(ops/attention.py, routed at key-len >= 256) removes the memory reason for
that bound; this experiment measures whether the CAPABILITY is worth
anything: on streams long enough that 100 rows actually truncate history,
does window=400 change F1 / recall / fragmentation?

Protocol (all from-scratch in this repo; VERDICT r4 item #4):
  1. data_hard_long: the hard eval layouts on one slow 480-frame orbit
     (make_dataset.py --long) — tracks accumulate ~10x more observations
     than the 32-frame split, so w100 truncates and w400 does not.
  2. Two associators fine-tuned from the committed w100 checkpoint on
     long-stream (480-frame) training layouts, identical step budget,
     differing ONLY in the training window (100 vs 400).  The GNN is
     length-agnostic, but attention mass dilutes over 4x rows — the w400
     arm must see that regime in training for a fair comparison, and the
     w100 arm must see the long-stream domain so the window axis is
     isolated from long-stream adaptation.
  3. run_processor --offline + eval_scan2cad per arm (the real CLI chain),
     plus a fragmentation count (final tracks with >= min_views rows per
     GT object actually matched).

Round-5 re-run (VERDICT r4 weak #6 / next #7): the round-4 step-matched
design left "the w400 arm is under-trained at 300 steps" as a standing
excuse — the w400 fuser both adapts to a harder regime (attention over 4x
rows) and was only ever trained 300 updates.  The re-run removes it:

  - ``--ft_steps_w400`` gives the w400 arm its own (larger) update budget
    — default 4x the w100 arm's, i.e. ~64x the FLOPs of the round-4 w400
    arm relative to w100-300 (the w400 step is already ~16x costlier, so
    this is compute-matched in the only direction a skeptic can contest:
    the w400 arm gets strictly MORE of everything);
  - both arms report a convergence check: mean loss over the last eighth
    of training vs the preceding eighth (a plateaued arm cannot be called
    under-trained);
  - ``--n_scenes`` enlarges the long split beyond the original 3 scenes
    (seeds 0..n-1, 480 frames each) so the decision delta is read against
    a scene-bootstrap CI (ci_eval.py) instead of a 1-2-object flip.

Writes result_window/window_experiment.json and prints the table.

    PYTHONPATH=.:examples/cli_rehearsal python examples/cli_rehearsal/window_experiment.py
"""
from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
HERE = os.path.dirname(os.path.abspath(__file__))

FT_STEPS = 300
STREAM_FRAMES = 480


def sh(cmd, env_extra=None, timeout=None):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = f"{REPO}:{HERE}:" + env.get("PYTHONPATH", "")
    if env_extra:
        env.update(env_extra)
    t0 = time.time()
    r = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                       text=True, timeout=timeout)
    if r.returncode != 0:
        print(r.stdout[-3000:], r.stderr[-3000:])
        raise RuntimeError(f"failed: {' '.join(cmd)}")
    return r.stdout, time.time() - t0


def ensure_data(data, n_scenes=3):
    val = os.path.join(data, "val.txt")
    if os.path.exists(val):
        with open(val) as f:
            if len([l for l in f if l.strip()]) >= n_scenes:
                return
    print(f"writing long-stream split ({n_scenes} scenes x "
          f"{STREAM_FRAMES} frames)...", flush=True)
    sys.path.insert(0, HERE)
    import make_dataset

    t0 = time.time()
    make_dataset.main_hard(data, seeds=tuple(range(n_scenes)),
                           n_frames=STREAM_FRAMES)
    print(f"[{time.time() - t0:.0f}s]", flush=True)


def finetune(window, base_ckpt, out_ckpt, steps=FT_STEPS):
    """Fine-tune the committed associator on long streams at ``window``.

    Returns the banked-loss trajectory (for the convergence check); [] if
    the checkpoint already existed."""
    if os.path.exists(os.path.join(out_ckpt, "odam_meta.json")):
        print(f"{out_ckpt}: already trained", flush=True)
        return []
    if os.path.exists(out_ckpt):
        shutil.rmtree(out_ckpt)
    shutil.copytree(base_ckpt, out_ckpt)
    # restart the fine-tune schedule: the copied meta belongs to the base run
    for f in ("odam_meta.json",):
        p = os.path.join(out_ckpt, f)
        if os.path.exists(p):
            os.remove(p)
    out, dt = sh(
        [sys.executable, os.path.join(HERE, "train.py"),
         "associator", "0", str(steps), out_ckpt],
        env_extra={"ODAM_HARD": "1", "ODAM_WINDOW": str(window),
                   "ODAM_STREAM_FRAMES": str(STREAM_FRAMES)},
    )
    nll = [float(x) for x in re.findall(r"loss ([0-9.]+)", out)]
    conv = ""
    if len(nll) >= 8:
        q = max(1, len(nll) // 4)
        last, prev = nll[-q:], nll[-2 * q:-q]
        conv = (f"  convergence: last-quarter mean {sum(last) / q:.3f} vs "
                f"prev {sum(prev) / q:.3f} "
                f"({(sum(last) - sum(prev)) / sum(prev) * 100:+.1f}%)")
    print(f"w{window} fine-tune ({steps} steps): final NLL "
          f"{nll[-1] if nll else '?'} [{dt:.0f}s]{conv}", flush=True)
    return nll


def run_arm(data, out_root, window, assoc_ckpt, detector_ckpt, min_views):
    name = f"window{window}"
    out_dir = os.path.join(out_root, name)
    with open(os.path.join(data, "rehearsal.yaml")) as f:
        img = re.search(r"img_h:\s*(\d+)", f.read()).group(1)
    out, dt = sh(
        [sys.executable, os.path.join(REPO, "scripts/run_processor.py"),
         "--config_path", os.path.join(data, "rehearsal.yaml"),
         "--scans_root", os.path.join(data, "scans"),
         "--detector_ckpt", detector_ckpt, "--associator_ckpt", assoc_ckpt,
         "--out_dir", out_dir, "--offline", "--use_prior",
         "--short_side", img, "--max_size", img, "--dtype", "float32",
         "--max_objs", "24", "--max_views", "128",
         "--window", str(window)],
    )
    ev, _ = sh(
        [sys.executable, os.path.join(REPO, "scripts/eval_scan2cad.py"),
         "--result_dir", out_dir,
         "--scan2cad", os.path.join(data, "full_annotations.json"),
         "--scans_root", os.path.join(data, "scans"),
         "--val_split", os.path.join(data, "val.txt"),
         "--min_views", str(min_views)],
    )
    m = re.search(r"average: precision ([0-9.]+) recall ([0-9.]+) F1 ([0-9.]+)", ev)
    prec, rec, f1 = (float(x) for x in m.groups())

    # fragmentation: final tracks per scene (eligible >= min_views), vs GT
    import pickle

    import numpy as np
    n_tracks = n_eligible = 0
    for scene in open(os.path.join(data, "val.txt")).read().split():
        with open(os.path.join(out_dir, scene, scene), "rb") as f:
            d = pickle.load(f)
        n_tracks += len(d["tracks"])
        n_eligible += sum(len(np.asarray(t)) >= min_views for t in d["tracks"])
    print(f"{name}: F1 {f1:.3f} (P {prec:.3f} R {rec:.3f}) "
          f"tracks {n_tracks} (eligible {n_eligible}) [{dt:.0f}s]", flush=True)
    return {"window": window, "f1": f1, "precision": prec, "recall": rec,
            "tracks": n_tracks, "eligible_tracks": n_eligible,
            "pipeline_seconds": dt}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default=os.path.join(HERE, "data_hard_long"))
    ap.add_argument("--out", default=os.path.join(HERE, "result_window"))
    ap.add_argument("--detector_ckpt",
                    default=os.path.join(REPO, "artifacts/rehearsal_hard_detr_ckpt"))
    ap.add_argument("--base_assoc",
                    default=os.path.join(REPO, "artifacts/rehearsal_hard_assoc_ckpt"))
    ap.add_argument("--min_views", type=int, default=10)
    ap.add_argument("--ft_steps", type=int, default=FT_STEPS)
    ap.add_argument("--ft_steps_w400", type=int, default=None,
                    help="w400 arm's own update budget (default 4x "
                         "--ft_steps: the compute-matched round-5 design)")
    ap.add_argument("--n_scenes", type=int, default=3,
                    help="long-split size (seeds 0..n-1); >3 enables the "
                         "scene-bootstrap CI on the decision delta")
    ap.add_argument("--json_name", default="window_experiment.json")
    args = ap.parse_args()

    ensure_data(args.data, args.n_scenes)
    os.makedirs(args.out, exist_ok=True)
    w400_steps = args.ft_steps_w400 or 4 * args.ft_steps
    results, losses = [], {}
    for window, steps in ((100, args.ft_steps), (400, w400_steps)):
        ck = os.path.join(args.out, f"assoc_w{window}_long_ckpt")
        losses[window] = finetune(window, args.base_assoc, ck, steps=steps)
        r = run_arm(args.data, args.out, window, ck,
                    args.detector_ckpt, args.min_views)
        r["ft_steps"] = steps
        r["banked_losses"] = losses[window]
        results.append(r)
        with open(os.path.join(args.out, args.json_name), "w") as f:
            json.dump(results, f, indent=1)
    if len(results) == 2:
        d = results[1]["f1"] - results[0]["f1"]
        print(f"window 400 vs 100: dF1 {d:+.3f}, "
              f"dR {results[1]['recall'] - results[0]['recall']:+.3f}, "
              f"tracks {results[0]['tracks']} -> {results[1]['tracks']}")
        # scene-bootstrap paired delta (decision-grade when n_scenes > 3)
        import ci_eval

        tables = {w: ci_eval.scene_table(
            os.path.join(args.out, f"window{w}"), args.data,
            min_views=args.min_views) for w in (100, 400)}
        delta = ci_eval.paired_delta(tables[100], tables[400], 10000)
        for w in (100, 400):
            m = ci_eval.bootstrap_ci(tables[w], 10000)
            print(ci_eval.fmt_cell(f"window{w}", m), flush=True)
        f1d, md = delta["f1"], delta["mean_obj_iou"]
        print(f"DELTA w400 - w100: dF1 {f1d['delta']:+.3f} CI "
              f"[{f1d['ci'][0]:+.3f},{f1d['ci'][1]:+.3f}]  dmIoU "
              f"{md['delta']:+.3f} CI [{md['ci'][0]:+.3f},{md['ci'][1]:+.3f}]")
        results.append({"paired_delta_w400_minus_w100": delta})
        with open(os.path.join(args.out, args.json_name), "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
