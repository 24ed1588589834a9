"""Recall-loss decomposition for the hard rehearsal.

The full trained pipeline measured F1 0.556 (recall 0.417) while the
benchmark's intrinsic recall ceiling (analyze_visibility.py) is 0.792 at
min_views=10.  This script attributes the gap stage by stage by running the
downstream pipeline on progressively more idealized inputs:

  stage gt_full     GT instance tracks, every GT-listed frame (objects the
                    camera never really sees included)  -> upper bound of
                    mapping + merge + eval under pose/observation noise.
  stage gt_visible  GT tracks restricted to frames where the object is
                    actually detectable (the oracle visibility criterion)
                    -> the mapping+eval bound a PERFECT detector+associator
                    could reach; should approach the 0.792 ceiling.
  stage oracle_det  Per-frame oracle detections (visible objects only,
                    mild noise) fed through the REAL trained associator and
                    track store via runtime.offline.CachedDetectionPipeline
                    -> adds association/tracking loss.  Requires
                    --associator_ckpt.

Compare each stage's eval_scan2cad F1/recall with the full-pipeline
ablation cell (adam_exact_sampled) to locate the loss.

    PYTHONPATH=.:examples/cli_rehearsal python examples/cli_rehearsal/diagnose_recall.py \
        --stages gt_full,gt_visible [--associator_ckpt rehearsal_hard_assoc_ckpt]
"""
from __future__ import annotations

import argparse
import os
import pickle
import re
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

# Force CPU BEFORE any backend use: this image's axon TPU plugin wins over
# the JAX_PLATFORMS env var alone, and merely asking jax.default_backend()
# would initialize the tunnel backend (CLAUDE.md).
jax.config.update("jax_platforms", "cpu")

import hard
from analyze_visibility import visible_flags

DATA = os.path.join(REPO, "examples/cli_rehearsal/data_hard")


def build_pipeline(associator_ckpt=None, decode="exact"):
    """CachedDetectionPipeline with the rehearsal associator geometry."""
    import dataclasses

    import jax.numpy as jnp

    from common import make_assoc
    from odam_tpu.runtime import offline as offline_mod, processor as proc_mod
    from odam_tpu.utils import checkpoint as ckpt_mod

    assoc, acfg = make_assoc()
    assoc = type(assoc)(dataclasses.replace(acfg, decode=decode))
    aparams = assoc.init(
        jax.random.key(1),
        jnp.full((1, 4, 4, 79), -1.0), jnp.zeros((1, 4), bool),
        jnp.full((1, 4, 79), -1.0), jnp.zeros((1, 4), bool),
    )
    if associator_ckpt:
        aparams = ckpt_mod.restore(os.path.abspath(associator_ckpt), aparams)
    # capacities right-sized to the rehearsal (<=10 objects, 32 frames):
    # shapes are static, so the default 64x256 slots would cost 16x the
    # mapping FLOPs for identical results on these scenes
    pcfg = proc_mod.PipelineConfig(use_prior=True,
                                   representation="super_quadric",
                                   max_objs=24, max_views=64)
    return offline_mod.CachedDetectionPipeline(assoc, aparams, pcfg)


def mapping_chain(pipe, tracks, frame_ids, T_wcs):
    """optim -> merge -> optim on explicit tracks (run_processor order)."""
    seq = pipe.sequence
    seq["usable_frames"] = [int(f) for f in frame_ids]
    seq["T_wcs"] = [np.asarray(T, np.float32) for T in T_wcs]
    seq["P_cws"] = [seq["K"][:3, :3] @ np.linalg.inv(T)[:3, :] for T in T_wcs]
    out = pipe.optim_process(tracks)
    merged = pipe.merge_process(out)
    return pipe.optim_process(merged)


def oracle_detections(seed, flags, noise, rng, max_dets=30):
    """Per-frame Detections a perfect detector would emit: every visible
    object, correct class, GT geometry + mild observation noise."""
    import jax.numpy as jnp

    from odam_tpu.models import detr as detr_mod

    objects = hard.make_hard_objects(seed)
    Kinv = np.linalg.inv(hard.K)
    per_frame = []
    for fid, T_wc, img, rows, inst_ids in hard.hard_scene_views(seed):
        valid = np.zeros((1, max_dets), bool)
        classes = np.zeros((1, max_dets), np.int32)
        scores = np.zeros((1, max_dets), np.float32)
        boxes = np.zeros((1, max_dets, 4), np.float32)
        dims = np.zeros((1, max_dets, 3), np.float32)
        t_co = np.zeros((1, max_dets, 3), np.float32)
        angle = np.zeros((1, max_dets), np.float32)
        j = 0
        for r, inst in zip(rows, inst_ids):
            if not flags[fid, int(inst)] or j >= max_dets:
                continue
            valid[0, j] = True
            classes[0, j] = int(r[0])
            scores[0, j] = 0.95
            bbox = np.array([r[1] - r[3] / 2, r[2] - r[4] / 2,
                             r[1] + r[3] / 2, r[2] + r[4] / 2]) * hard.IMG
            boxes[0, j] = bbox + rng.normal(0, noise * hard.IMG, 4)
            dims[0, j] = r[5:8] * np.exp(rng.normal(0, noise, 3))
            # projected center (px) + depth -> camera-frame center
            sc = (r[8:10] + r[1:3]) * hard.IMG
            z = r[10] * np.exp(rng.normal(0, noise))
            t_co[0, j] = z * (Kinv @ np.array([sc[0], sc[1], 1.0]))
            angle[0, j] = np.degrees(r[11] + rng.normal(0, noise))
            j += 1
        per_frame.append((fid, T_wc, detr_mod.Detections(
            valid=jnp.asarray(valid), classes=jnp.asarray(classes),
            scores=jnp.asarray(scores), boxes=jnp.asarray(boxes),
            dims=jnp.asarray(dims), t_co=jnp.asarray(t_co),
            angle_deg=jnp.asarray(angle),
            features=jnp.zeros((1, max_dets, 1), np.float32),
        )))
    return per_frame


def run_stage(stage, out_root, noise, associator_ckpt, decode):
    out_dir = os.path.join(out_root, stage)
    for seed in hard.EVAL_SEEDS:
        scene = hard.hard_scene_id(seed)
        rng = np.random.default_rng(7000 + seed)
        pipe = build_pipeline(
            associator_ckpt if stage == "oracle_det" else None, decode)
        pipe.init_sequence(hard.K, hard.IMG, hard.IMG)
        if stage in ("gt_full", "gt_visible"):
            keep = None
            if stage == "gt_visible":
                _, flags, _, _ = visible_flags(seed)
                keep = lambda fid, inst: bool(flags[fid, inst])  # noqa: E731
            tracks, poses = hard.hard_gt_world_tracks(
                seed, rng, noise=noise, keep=keep)
            fids = sorted(poses)
            out = mapping_chain(pipe, tracks, fids, [poses[f] for f in fids])
        elif stage == "oracle_det":
            _, flags, _, _ = visible_flags(seed)
            for fid, T_wc, dets in oracle_detections(seed, flags, noise, rng):
                pipe.process_detections(dets, fid, T_wc)
            out = pipe.optim_process(pipe.tracks)
            merged = pipe.merge_process(out)
            out = pipe.optim_process(merged)
        else:
            raise ValueError(stage)
        os.makedirs(os.path.join(out_dir, scene), exist_ok=True)
        with open(os.path.join(out_dir, scene, scene), "wb") as f:
            pickle.dump({k: out[k] for k in
                         ("tracks", "bboxes_qc", "bboxes_dl", "quadrics")}, f)
        print(f"  {scene}: {len(out['tracks'])} final tracks", flush=True)

    ev = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/eval_scan2cad.py"),
         "--result_dir", out_dir,
         "--scan2cad", os.path.join(DATA, "full_annotations.json"),
         "--scans_root", os.path.join(DATA, "scans"),
         "--val_split", os.path.join(DATA, "val.txt"),
         "--min_views", "10"],
        cwd=REPO, capture_output=True, text=True,
    )
    if ev.returncode != 0:
        print(ev.stdout[-2000:], ev.stderr[-2000:])
        raise RuntimeError(f"eval failed for {stage}")
    m = re.search(r"average: precision ([0-9.]+) recall ([0-9.]+) F1 ([0-9.]+)",
                  ev.stdout)
    prec, rec, f1 = (float(x) for x in m.groups())
    print(f"{stage:>12}: F1 {f1:.3f}  precision {prec:.3f}  recall {rec:.3f}")
    return {"stage": stage, "f1": f1, "precision": prec, "recall": rec}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", default="gt_full,gt_visible")
    ap.add_argument("--noise", type=float, default=0.02)
    ap.add_argument("--decode", default="exact", choices=["exact", "greedy"])
    ap.add_argument("--associator_ckpt", default="rehearsal_hard_assoc_ckpt")
    ap.add_argument("--out", default="examples/cli_rehearsal/result_hard/diagnose")
    args = ap.parse_args()
    results = [run_stage(s, args.out, args.noise, args.associator_ckpt,
                         args.decode)
               for s in args.stages.split(",")]
    print("\nsummary (compare with ablation adam_exact_sampled and the "
          "0.792 visibility ceiling):")
    for r in results:
        print(f"  {r['stage']:>12}: F1 {r['f1']:.3f} R {r['recall']:.3f} "
              f"P {r['precision']:.3f}")


if __name__ == "__main__":
    main()
