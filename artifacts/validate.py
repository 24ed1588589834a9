"""Validate the committed trained artifacts (see README.md).

Restores the committed hard-rehearsal checkpoints and measures them on a
deterministic HELD-OUT stream (hard.EVAL_SEEDS — layout seeds the training
never draws), so a session that recommits a checkpoint can prove it is the
model the docs claim, without rerunning the full ablation chain:

- associator: mean association NLL over the eval scenes' domain-matched
  stream (visibility-gated GT tracks; same sample geometry as
  train.py:train_associator).  The complete 800-step checkpoint measures
  ~0.10-0.15 here (train-stream final NLL 0.064); > 0.5 means a wrong or
  truncated checkpoint.
- detector: restoreability + per-frame visible-object recall/class-accuracy
  via probe_detector's criterion on a few eval views.  Recall is REPORTED
  (a partial segment ckpt scores lower by design, TRAINLOG.md has the
  position); the full 12-segment model measured 0.883 (MEASURED.md).

Run:  JAX_PLATFORMS=cpu ODAM_HARD=1 PYTHONPATH=.:examples/cli_rehearsal \
          python artifacts/validate.py
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("ODAM_HARD", "1")

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

REPO = os.path.join(os.path.dirname(__file__), "..")
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "examples", "cli_rehearsal"))

from odam_tpu.utils import checkpoint  # noqa: E402

ASSOC = os.path.join(os.path.dirname(__file__), "rehearsal_hard_assoc_ckpt")
DETR = os.path.join(os.path.dirname(__file__), "rehearsal_hard_detr_ckpt")


def eval_associator() -> float:
    import analyze_visibility as av
    from hard import IMG, EVAL_SEEDS, hard_gt_world_tracks
    from common import make_assoc
    from odam_tpu.data.datasets import build_association_sample
    from odam_tpu.models import associator as assoc_mod

    T, N, W, P = 16, 30, 100, 32
    samples = []
    for seed in EVAL_SEEDS:
        _, flags, _, _ = av.visible_flags(seed)

        def keep(fid, inst, flags=flags):
            return bool(flags[fid, inst])

        tracks, poses = hard_gt_world_tracks(
            seed, np.random.default_rng(seed), noise=0.05, keep=keep)
        srng = np.random.default_rng(2000 + seed)
        for t in tracks:
            t[:, 13] = srng.uniform(0.6, 1.0, len(t))
        for fid, T_wc in poses.items():
            if fid == 0:
                continue
            s = build_association_sample(
                tracks, float(fid), T, N, W, T_wc=T_wc,
                img_w=float(IMG), img_h=float(IMG))
            if s is None:
                continue
            pairs = np.zeros((P, 2), np.int32)
            valid = np.zeros((P,), bool)
            k = min(len(s["gt_pairs"]), P)
            pairs[:k] = s["gt_pairs"][:k]
            valid[:k] = True
            s["gt_pairs"], s["pair_valid"] = pairs, valid
            samples.append(s)

    model, _ = make_assoc()
    s0 = samples[0]
    init = jax.eval_shape(
        lambda k: model.init(
            k, jnp.asarray(s0["tracks"][None]),
            jnp.asarray(s0["track_mask"][None]),
            jnp.asarray(s0["detections"][None]),
            jnp.asarray(s0["det_mask"][None])),
        jax.random.key(0))
    params = checkpoint.restore(ASSOC, init)

    @jax.jit
    def nll(tracks, track_mask, dets, det_mask, gt_pairs, pair_valid):
        out = model.apply(params, tracks, track_mask, dets, det_mask)
        n = jnp.maximum(pair_valid.sum(), 1)
        return assoc_mod.association_nll(
            out.log_assignment, gt_pairs, pair_valid) / n

    keys = ("tracks", "track_mask", "detections", "det_mask",
            "gt_pairs", "pair_valid")
    assert len(samples) >= 8, (
        f"only {len(samples)} eval association samples materialized; the "
        "held-out stream is broken (not the checkpoint) — np.mean over zero "
        "batches would NaN the NLL assertion")
    vals = []
    for i in range(0, len(samples) - 7, 8):
        batch = [jnp.asarray(np.stack([samples[j][k] for j in range(i, i + 8)]))
                 for k in keys]
        vals.append(float(nll(*batch)))
    return float(np.mean(vals))


# Recall pin for the COMPLETE (18k-step) detector: the finished model must
# score near its documented operating point or the committed-artifact
# guarantee is decorative (VERDICT r3 weak #6).  Partial checkpoints are
# only reported — TRAINLOG.md carries their position.
FULL_STEPS = 18000
RECALL_PIN = 0.84


def eval_detector():
    if not checkpoint.latest_path(DETR):
        return None
    import probe_detector
    from common import make_detr
    from hard import IMG, EVAL_SEEDS

    model, _ = make_detr(16, backbone_stage=3, backbone="tiny")
    shapes = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, IMG, IMG, 3))), jax.random.key(0))
    params = checkpoint.restore(DETR, shapes)
    tp, ce, fn, fp = probe_detector.stats(
        model, params, EVAL_SEEDS, n_frames=8, visible_only=True)
    rec = (tp + ce) / max(tp + ce + fn, 1)
    acc = tp / max(tp + ce, 1)
    meta = checkpoint.load_meta(DETR) or {}
    return {"recall": round(rec, 3), "class_acc": round(acc, 3),
            "tp": tp, "cls_err": ce, "fn": fn, "fp": fp,
            "global_step": meta.get("global_step")}


def main() -> None:
    nll = eval_associator()
    print(f"associator eval-stream NLL: {nll:.3f} (expect ~0.10-0.15; fail > 0.5)")
    assert nll < 0.5, "committed associator checkpoint does not match its docs"

    det = eval_detector()
    if det is None:
        print("detector checkpoint absent (segments not yet committed)")
    else:
        print(f"detector probe on eval views: {det}")
        if (det["global_step"] or 0) >= FULL_STEPS:
            assert det["recall"] >= RECALL_PIN, (
                f"complete detector checkpoint scores visible-recall "
                f"{det['recall']} < {RECALL_PIN}: not the model the docs "
                f"describe (MEASURED.md operating point)")
        else:
            print(f"  (partial checkpoint at {det['global_step']}/"
                  f"{FULL_STEPS} steps: recall reported, not pinned)")
    print("ARTIFACT VALIDATION OK")


if __name__ == "__main__":
    main()
