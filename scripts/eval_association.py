#!/usr/bin/env python
"""Offline associator evaluation CLI.

Working replacement for the reference's broken run_association.py: replay
ground-truth track pickles through a trained associator and report matching
precision/recall/F1 per scene.

    python scripts/eval_association.py --tracks_dir track_pickles \
        --ckpt runs/assoc/ckpt_5000 [--associator_pth experiments/associator.pth]
"""
from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from odam_tpu import config as config_mod  # noqa: E402


def main():
    from odam_tpu.utils import compile_cache

    compile_cache.enable()
    ap = argparse.ArgumentParser()
    ap.add_argument("--config_path", default="configs/detr_scan_net.yaml")
    ap.add_argument("--tracks_dir", required=True)
    ap.add_argument("--ckpt", default=None, help="orbax checkpoint (native)")
    ap.add_argument("--associator_pth", default=None, help="torch checkpoint")
    ap.add_argument("--match_threshold", type=float, default=0.1)
    ap.add_argument("--max_tracks", type=int, default=64)
    ap.add_argument("--max_dets", type=int, default=30)
    ap.add_argument("--window", type=int, default=100)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from odam_tpu.eval import association
    from odam_tpu.models import associator as assoc_mod, porting
    from odam_tpu.utils import checkpoint

    cfg = config_mod.merge_cfg([args.config_path])
    acfg = assoc_mod.AssociatorConfig.from_cfg(cfg)
    model = assoc_mod.Associator(acfg)

    if args.associator_pth:
        params = porting.convert_associator(
            porting.load_torch_checkpoint(args.associator_pth),
            d_model=acfg.descriptor_dim, n_gnn=len(acfg.gnn_layers),
            n_fuser=len(acfg.self_gnn_layers),
        )
    elif args.ckpt:
        init = model.init(
            jax.random.key(0),
            jnp.full((1, 4, 4, 79), -1.0), jnp.zeros((1, 4), bool),
            jnp.full((1, 4, 79), -1.0), jnp.zeros((1, 4), bool),
        )
        params = checkpoint.restore(args.ckpt, init)
    else:
        sys.exit("need --ckpt or --associator_pth")

    totals = association.AssociationMetrics()
    for fn in sorted(os.listdir(args.tracks_dir)):
        with open(os.path.join(args.tracks_dir, fn), "rb") as f:
            data = pickle.load(f)
        tracks = data["tracks"] if isinstance(data, dict) else data
        m = association.evaluate_scene(
            model, params, tracks, args.match_threshold,
            args.max_tracks, args.max_dets, args.window,
        )
        print(f"{fn}: P {m.precision:.3f} R {m.recall:.3f} F1 {m.f1:.3f} "
              f"({m.n_frames} frames)")
        totals.n_correct += m.n_correct
        totals.n_pred_matched += m.n_pred_matched
        totals.n_gt_matched += m.n_gt_matched
        totals.n_frames += m.n_frames
    print(f"TOTAL: P {totals.precision:.3f} R {totals.recall:.3f} "
          f"F1 {totals.f1:.3f} ({totals.n_frames} frames)")


if __name__ == "__main__":
    main()
