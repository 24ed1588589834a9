#!/usr/bin/env python
"""Associator training CLI (completes the reference's dormant capability:
SetCriterion-style NLL supervision over track/detection assignment).

    python scripts/train_associator.py --config_path configs/detr_scan_net.yaml \
        --tracks_dir data/ScanNet/track_pickles --steps 5000 --out_dir runs/assoc

--synthetic runs a dataless smoke loop on generated track histories.
"""
from __future__ import annotations

import argparse
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from odam_tpu import config as config_mod  # noqa: E402


def synthetic_scenes(rng, n_scenes=4, n_tracks=6, n_frames=40):
    scenes = {}
    for s in range(n_scenes):
        tracks = []
        for t in range(n_tracks):
            n = int(rng.integers(min(10, n_frames - 1), n_frames))
            frames = np.sort(rng.choice(n_frames, n, replace=False))
            rows = np.full((n, 82), -1.0, np.float32)
            rows[:, 0] = frames
            rows[:, 1] = rng.integers(0, 8)
            rows[:, 2:6] = rng.uniform(0, 1, (n, 4))
            rows[:, 6:9] = rng.uniform(0.3, 2.0, 3) + rng.normal(0, 0.05, (n, 3))
            rows[:, 9:12] = rng.uniform(-3, 3, 3) + rng.normal(0, 0.05, (n, 3))
            rows[:, 12] = rng.uniform(-np.pi, np.pi) + rng.normal(0, 0.05, n)
            rows[:, 13] = rng.uniform(0.6, 1.0, n)
            tracks.append(rows)
        scenes[f"synthetic_{s}"] = tracks
    return scenes


def main():
    from odam_tpu.utils import compile_cache
    compile_cache.enable()
    ap = argparse.ArgumentParser()
    ap.add_argument("--config_path", default="configs/detr_scan_net.yaml")
    ap.add_argument("--tracks_dir", default=None,
                    help="directory of per-scene track pickles")
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--out_dir", default="runs/assoc")
    ap.add_argument("--log_every", type=int, default=20)
    ap.add_argument("--save_every", type=int, default=1000)
    ap.add_argument("--synthetic", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from odam_tpu.data import datasets
    from odam_tpu.models import associator as assoc_mod
    from odam_tpu.models import training as train_mod
    from odam_tpu.parallel import mesh as mesh_mod
    from odam_tpu.utils import checkpoint, metrics

    cfg = config_mod.merge_cfg([args.config_path])
    acfg = assoc_mod.AssociatorConfig.from_cfg(cfg)
    model = assoc_mod.Associator(acfg)

    rng = np.random.default_rng(0)
    if args.synthetic or not args.tracks_dir:
        scenes = synthetic_scenes(rng)
    else:
        scenes = {}
        for fn in sorted(os.listdir(args.tracks_dir)):
            with open(os.path.join(args.tracks_dir, fn), "rb") as f:
                data = pickle.load(f)
            scenes[fn] = data["tracks"] if isinstance(data, dict) else data
    ds = datasets.AssociatorDataset(scenes, max_tracks=32, max_dets=16, window=50)
    print(f"{len(ds)} association samples from {len(scenes)} scenes")

    sample = ds.get(0)
    params = model.init(
        jax.random.key(0),
        jnp.asarray(sample["tracks"][None]), jnp.asarray(sample["track_mask"][None]),
        jnp.asarray(sample["detections"][None]), jnp.asarray(sample["det_mask"][None]),
    )
    tcfg = train_mod.AssocTrainConfig()
    tx = optax.chain(optax.clip_by_global_norm(tcfg.clip_norm), optax.adam(tcfg.lr))
    state = train_mod.init_train_state(params, tx)
    mesh = mesh_mod.make_mesh() if len(jax.devices()) > 1 else None
    step_fn = train_mod.make_assoc_train_step(model, tx, mesh)

    os.makedirs(args.out_dir, exist_ok=True)
    logger = metrics.MetricLogger(os.path.join(args.out_dir, "train_log.jsonl"))
    batches = ds.batches(args.batch_size, rng)
    t0 = time.time()
    for step in range(args.steps):
        b = next(batches)
        arrs = [jnp.asarray(b[k]) for k in
                ("tracks", "track_mask", "detections", "det_mask", "gt_pairs", "pair_valid")]
        if mesh is not None:
            arrs = [mesh_mod.shard_batch(a, mesh) for a in arrs]
        state, loss = step_fn(state, *arrs)
        if (step + 1) % args.log_every == 0:
            rate = args.log_every * args.batch_size / (time.time() - t0)
            t0 = time.time()
            logger.log(step=step + 1, loss=float(loss), samples_per_sec=round(rate, 2))
        if (step + 1) % args.save_every == 0 or step + 1 == args.steps:
            checkpoint.save(os.path.join(args.out_dir, f"ckpt_{step + 1}"), state.params)
    print("done")


if __name__ == "__main__":
    main()
