#!/usr/bin/env python
"""Detector training CLI (the reference ships criterion code but no train
loop — SURVEY.md §1 "notably absent"; this completes the capability).

    python scripts/train_detector.py --config_path configs/detr_scan_net.yaml \
        --annotations data/ScanNet/imovotenet_scan2cad/train.json \
        --batch_size 8 --steps 10000 --out_dir runs/detr

Data-parallel over all visible devices (frames sharded over a ``dp`` mesh).
Use --synthetic for a dataless smoke run.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from odam_tpu import config as config_mod  # noqa: E402


def synthetic_batches(batch_size, h, w, num_classes, max_objects, rng):
    while True:
        from odam_tpu.data.datasets import pack_targets

        images = rng.normal(size=(batch_size, h, w, 3)).astype(np.float32)
        objs = []
        for _ in range(batch_size):
            n = rng.integers(1, max_objects + 1)
            rows = np.zeros((n, 12), np.float32)
            rows[:, 0] = rng.integers(0, num_classes, n)
            rows[:, 1:5] = rng.uniform(0.2, 0.6, (n, 4))
            rows[:, 5:8] = rng.uniform(0.3, 2.0, (n, 3))
            rows[:, -2] = rng.uniform(0.5, 5.0, n)
            rows[:, -1] = rng.uniform(-np.pi, np.pi, n)
            objs.append(rows)
        yield images, pack_targets(objs, max_objects)


def main():
    from odam_tpu.utils import compile_cache
    compile_cache.enable()
    ap = argparse.ArgumentParser()
    ap.add_argument("--config_path", default="configs/detr_scan_net.yaml")
    ap.add_argument("--annotations", default=None)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--img_h", type=int, default=512)
    ap.add_argument("--img_w", type=int, default=672)
    ap.add_argument("--out_dir", default="runs/detr")
    ap.add_argument("--save_every", type=int, default=1000)
    ap.add_argument("--log_every", type=int, default=20)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    ap.add_argument("--resume_ckpt", default=None,
                    help="orbax params checkpoint to resume from (this "
                         "environment's TPU worker can crash under sustained "
                         "load; segmented runs resume here)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from odam_tpu.data import datasets
    from odam_tpu.models import criterion as crit_mod, detr as detr_mod
    from odam_tpu.models import training as train_mod
    from odam_tpu.parallel import mesh as mesh_mod
    from odam_tpu.utils import checkpoint, metrics

    cfg = config_mod.merge_cfg([args.config_path])
    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[args.dtype]
    dcfg = detr_mod.DETRConfig.from_cfg(cfg, dtype=dtype)
    model = detr_mod.DETR(dcfg)

    params = model.init(
        jax.random.key(0), jnp.zeros((1, args.img_h, args.img_w, 3))
    )
    if args.resume_ckpt:
        params = checkpoint.restore(args.resume_ckpt, params)
        print(f"resumed params from {args.resume_ckpt}")
    tcfg = train_mod.DetrTrainConfig(
        lr=float(cfg.get("lr", 1e-4)), lr_backbone=float(cfg.get("lr_backbone", 1e-5)),
        criterion=crit_mod.CriterionConfig(
            num_classes=dcfg.num_classes, eos_coef=float(cfg.get("eos_coef", 0.1))
        ),
    )
    tx = train_mod.make_detr_optimizer(params, tcfg)
    state = train_mod.init_train_state(params, tx)

    mesh = mesh_mod.make_mesh() if len(jax.devices()) > 1 else None
    step_fn = train_mod.make_detr_train_step(model, tx, tcfg, mesh)

    rng = np.random.default_rng(0)
    if args.synthetic or not args.annotations:
        batches = synthetic_batches(
            args.batch_size, args.img_h, args.img_w, dcfg.num_classes, 8, rng
        )
    else:
        ds = datasets.DetectorDataset(args.annotations)
        batches = ds.batches(args.batch_size, args.img_h, args.img_w, rng)

    os.makedirs(args.out_dir, exist_ok=True)
    logger = metrics.MetricLogger(os.path.join(args.out_dir, "train_log.jsonl"))
    t0 = time.time()
    for step in range(args.steps):
        images, targets = next(batches)
        images = jnp.asarray(images)
        targets = crit_mod.Targets(*[jnp.asarray(x) for x in targets])
        if mesh is not None:
            images = mesh_mod.shard_batch(images, mesh)
            targets = crit_mod.Targets(*mesh_mod.shard_batch(tuple(targets), mesh))
        state, m = step_fn(state, images, targets, jax.random.key(step))
        if (step + 1) % args.log_every == 0:
            m = {k: float(v) for k, v in m.items() if not k[-1].isdigit()}
            rate = args.log_every * args.batch_size / (time.time() - t0)
            t0 = time.time()
            logger.log(step=step + 1, imgs_per_sec=round(rate, 2), **m)
        if (step + 1) % args.save_every == 0 or step + 1 == args.steps:
            checkpoint.save(os.path.join(args.out_dir, f"ckpt_{step + 1}"),
                            state.params)
    print("done")


if __name__ == "__main__":
    main()
