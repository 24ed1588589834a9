"""Held-out detection-quality probe for the hard rehearsal detector.

Runs the banked checkpoint over eval-layout frames (and optionally train
layouts) and reports per-frame recall / class accuracy / false positives —
the fast diagnostic that separates layout memorization from generalization
(full pipeline F1 needs a run_processor pass; this is the 2-minute signal).

    JAX_PLATFORMS=cpu ODAM_HARD=1 PYTHONPATH=.:examples/cli_rehearsal \
        python examples/cli_rehearsal/probe_detector.py [ckpt] [--train]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.dirname(__file__))

import numpy as np
import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from odam_tpu.utils import checkpoint, compile_cache  # noqa: E402

compile_cache.enable()

from common import make_detr, norm  # noqa: E402
from hard import hard_scene_views, IMG, EVAL_SEEDS  # noqa: E402


def stats(model, params, seeds, phase=0.0, n_frames=16, thresh=0.6,
          visible_only=False):
    """Per-frame detection stats vs GT rows.

    ``visible_only`` restricts GT to rows passing the detectability gate
    (analyze_visibility.visible_flags) — the fair recall metric, since GT
    rows list every projectable object including fully overpainted ones.
    A detection matching only an invisible row still counts as fp in this
    mode (it IS a hallucination).
    """
    fwd = jax.jit(lambda p, x: model.apply(p, x))
    flags = {}
    if visible_only:
        from analyze_visibility import visible_flags

        for seed in seeds:
            flags[seed] = visible_flags(seed)[1]
    tp = fp = fn = cls_err = 0
    for seed in seeds:
        for fid, T, img, rows, inst in hard_scene_views(seed, phase=phase)[:n_frames]:
            if visible_only and phase == 0.0:
                keep_rows = [r for r, i in zip(rows, inst)
                             if flags[seed][fid, int(i)]]
            else:
                keep_rows = list(rows)
            out = fwd(params, jnp.asarray(norm(img))[None])
            logits = np.asarray(out["pred_logits"][0])
            boxes = np.asarray(out["pred_boxes"][0])
            prob = np.exp(logits - logits.max(-1, keepdims=True))
            prob /= prob.sum(-1, keepdims=True)
            keep = prob[:, :-1].max(-1) > thresh
            dets = [(int(prob[q, :-1].argmax()), boxes[q, :2])
                    for q in range(len(keep)) if keep[q]]
            used = set()
            for r in keep_rows:
                gcls, gc = int(r[0]), r[1:3]
                best, bestd = None, 0.08
                for j, (dcls, dc) in enumerate(dets):
                    if j in used:
                        continue
                    d = np.linalg.norm(dc - gc)
                    if d < bestd:
                        best, bestd = j, d
                if best is None:
                    fn += 1
                else:
                    used.add(best)
                    if dets[best][0] == gcls:
                        tp += 1
                    else:
                        cls_err += 1
            fp += len(dets) - len(used)
    return tp, cls_err, fn, fp


def main():
    ckpt = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") \
        else "rehearsal_hard_detr_ckpt"
    model, cfg = make_detr(16, backbone_stage=3, backbone="tiny")
    shapes = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, IMG, IMG, 3))), jax.random.key(0))
    params = checkpoint.restore(ckpt, shapes)
    tp, ce, fn, fp = stats(model, params, EVAL_SEEDS)
    rec = (tp + ce) / max(tp + ce + fn, 1)
    acc = tp / max(tp + ce, 1)
    print(f"eval layouts (all GT rows):   tp {tp} cls_err {ce} fn {fn} fp {fp} | "
          f"recall {rec:.3f} class_acc {acc:.3f}")
    tp, ce, fn, fp = stats(model, params, EVAL_SEEDS, visible_only=True)
    rec = (tp + ce) / max(tp + ce + fn, 1)
    acc = tp / max(tp + ce, 1)
    print(f"eval layouts (visible only):  tp {tp} cls_err {ce} fn {fn} fp {fp} | "
          f"recall {rec:.3f} class_acc {acc:.3f}")
    if "--train" in sys.argv:
        tp, ce, fn, fp = stats(model, params, (100, 101, 102))
        print(f"train-range layouts: tp {tp} cls_err {ce} fn {fn} fp {fp}")


if __name__ == "__main__":
    main()
