#!/usr/bin/env python
"""End-to-end pipeline CLI: detect -> associate -> map over ScanNet scenes.

Public surface parity with the reference (src/scripts/run_processor.py):

    python scripts/run_processor.py --config_path configs/detr_scan_net.yaml \
        --no_code --use_prior --representation super_quadric --out_dir ./result/test

Differences (deliberate fixes of reference quirks, SURVEY.md §7):
- --detect_threshold and --no_code are actually forwarded into the pipeline
  (the reference parsed but dropped them, run_processor.py:61-67);
- the mapping stage honors --use_prior (the reference hardcoded prior=True,
  processor.py:364).

Output: per scene, a pickle {tracks, bboxes_qc, bboxes_dl, quadrics} with the
reference's schema (run_processor.py:86-91).
"""
from __future__ import annotations

import os

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the axon TPU plugin wins over the env var alone (CLAUDE.md);
    # honor an explicit CPU request before any backend use
    import jax

    jax.config.update("jax_platforms", "cpu")

import argparse
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from odam_tpu import config as config_mod  # noqa: E402
from odam_tpu.data import scannet, transforms  # noqa: E402


def build_models(cfg, detector_ckpt, associator_ckpt, dtype_name="bfloat16",
                 use_pallas=None, decode="exact"):
    import jax
    import jax.numpy as jnp

    from odam_tpu.models import associator as assoc_mod, detr as detr_mod, porting

    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[dtype_name]
    if use_pallas is None:
        # fused attention kernel by default on TPU (measured -21% encoder
        # attention); the XLA path remains the CPU/debug default.
        use_pallas = jax.default_backend() not in ("cpu",)
    dcfg = detr_mod.DETRConfig.from_cfg(cfg, dtype=dtype, use_pallas=use_pallas)
    detr = detr_mod.DETR(dcfg)
    import dataclasses as _dc

    acfg = _dc.replace(
        assoc_mod.AssociatorConfig.from_cfg(cfg, dtype=dtype), decode=decode,
        use_pallas=use_pallas,
    )
    assoc = assoc_mod.Associator(acfg)

    if detector_ckpt and os.path.isdir(detector_ckpt):
        # orbax directory: natively-trained flax weights
        from odam_tpu.utils import checkpoint as ckpt_mod

        dparams = detr.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
        dparams = ckpt_mod.restore(detector_ckpt, dparams)
        print(f"loaded detector weights (orbax) from {detector_ckpt}")
    elif detector_ckpt and os.path.exists(detector_ckpt):
        dparams = porting.convert_detr(
            porting.load_torch_checkpoint(detector_ckpt),
            enc_layers=dcfg.enc_layers, dec_layers=dcfg.dec_layers,
        )
        print(f"loaded detector weights from {detector_ckpt}")
    else:
        print("WARNING: no detector checkpoint; using random init", file=sys.stderr)
        dparams = detr.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))

    if associator_ckpt and os.path.isdir(associator_ckpt):
        from odam_tpu.utils import checkpoint as ckpt_mod

        aparams = assoc.init(
            jax.random.key(1),
            jnp.full((1, 4, 4, 79), -1.0), jnp.zeros((1, 4), bool),
            jnp.full((1, 4, 79), -1.0), jnp.zeros((1, 4), bool),
        )
        aparams = ckpt_mod.restore(associator_ckpt, aparams)
        print(f"loaded associator weights (orbax) from {associator_ckpt}")
    elif associator_ckpt and os.path.exists(associator_ckpt):
        aparams = porting.convert_associator(
            porting.load_torch_checkpoint(associator_ckpt),
            d_model=acfg.descriptor_dim, n_gnn=len(acfg.gnn_layers),
            n_fuser=len(acfg.self_gnn_layers),
        )
        print(f"loaded associator weights from {associator_ckpt}")
    else:
        print("WARNING: no associator checkpoint; using random init", file=sys.stderr)
        aparams = assoc.init(
            jax.random.key(1),
            jnp.full((1, 4, 4, 79), -1.0), jnp.zeros((1, 4), bool),
            jnp.full((1, 4, 79), -1.0), jnp.zeros((1, 4), bool),
        )
    return detr, dparams, assoc, aparams


class _LazyFrames:
    """Sequence of pre-resized uint8 frames, loaded on access.

    The scene-parallel runner touches each scene's frame f exactly once per
    lockstep round, so memory stays O(P frames) instead of O(P * F)."""

    def __init__(self, index, seq_id, names, ih, iw):
        self.index = index
        self.seq_id = seq_id
        self.names = names
        self.size = (iw, ih)

    def __len__(self):
        return len(self.names)

    def __getitem__(self, i):
        from PIL import Image

        img = Image.open(self.index.image_path(self.seq_id, self.names[i]))
        return np.asarray(img.resize(self.size, Image.BILINEAR))


def run_scene_parallel(args, index, scene_list, pcfg,
                       detr, dparams, assoc, aparams):
    """P pipeline replicas, one scene per device (SURVEY §2 DP plan)."""
    import pickle
    import time

    import jax

    from odam_tpu.parallel import mesh as mesh_mod
    from odam_tpu.runtime import scene_parallel as sp_mod

    P = args.scene_parallel
    # More lanes than devices is fine: lanes are a vmap axis sharded over
    # the mesh, so each device runs P/D scenes batched (on one chip the
    # whole group runs batched — the throughput mode for val splits).
    D = len(jax.devices())
    n_dev = max(d for d in range(1, min(P, D) + 1) if P % d == 0)
    mesh = mesh_mod.make_mesh({"dp": n_dev})
    runner = sp_mod.SceneParallelRunner(detr, dparams, assoc, aparams,
                                        pcfg, mesh, n_lanes=P)

    pending = [
        s for s in scene_list
        if not (args.resume
                and os.path.exists(os.path.join(args.out_dir, s, s)))
    ]
    ih = iw = None
    for start in range(0, len(pending), P):
        group_ids = pending[start:start + P]
        group = []
        for seq_id in group_ids:
            K = scannet.read_intrinsic(index.intrinsic_path(seq_id))[:3, :3]
            axis_align = scannet.read_axis_align(index.meta_path(seq_id))
            names = index.frame_names(seq_id)
            if args.max_frames:
                names = names[: args.max_frames]
            from PIL import Image

            first = np.asarray(Image.open(index.image_path(seq_id, names[0])))
            ih, iw = transforms.target_size(
                *first.shape[:2], short_side=args.short_side,
                max_size=args.max_size,
            )
            K_scaled = K.copy()
            K_scaled[0] *= iw / first.shape[1]
            K_scaled[1] *= ih / first.shape[0]
            fids, T_wcs, keep = [], [], []
            for i, name in enumerate(names):
                T_cw = scannet.read_extrinsic(index.pose_path(seq_id, name))
                if np.isnan(T_cw).any():
                    continue
                keep.append(i)
                fids.append(int(name))
                T_wcs.append(axis_align @ np.linalg.inv(T_cw))
            frames = _LazyFrames(index, seq_id,
                                 [names[i] for i in keep], ih, iw)
            group.append({"frames": frames, "frame_ids": fids,
                          "T_wcs": T_wcs, "K": K_scaled, "seq_id": seq_id})
        t0 = time.time()
        outs = runner.run_scenes(group, float(ih), float(iw))
        n_frames = sum(len(s["frame_ids"]) for s in group)
        print(f"group of {len(group)} scenes: {n_frames} frames in "
              f"{time.time() - t0:.1f}s "
              f"({n_frames / max(time.time() - t0, 1e-6):.1f} fps aggregate)")
        for s, out in zip(group, outs):
            seq_id = s["seq_id"]
            os.makedirs(os.path.join(args.out_dir, seq_id), exist_ok=True)
            with open(os.path.join(args.out_dir, seq_id, seq_id), "wb") as f:
                pickle.dump({k: out[k] for k in
                             ("tracks", "bboxes_qc", "bboxes_dl", "quadrics")},
                            f)
            print(f"  {seq_id}: {len(out['tracks'])} tracks")


def main():
    from odam_tpu.utils import compile_cache
    compile_cache.enable()
    ap = argparse.ArgumentParser()
    ap.add_argument("--config_path", default="configs/detr_scan_net.yaml")
    ap.add_argument("--detect_threshold", default=0.6, type=float)
    ap.add_argument("--min_views", default=10, type=int,
                    help="optimizer view gate: tracks with fewer valid views "
                         "keep their detector-average box (the reference "
                         "hardcodes 10, processor.py:353-354; the eval-side "
                         "twin is eval_scan2cad --min_views)")
    ap.add_argument("--attach_threshold", default=0.8, type=float,
                    help="Sinkhorn attach/new-track score gate (the "
                         "reference's hardcoded 0.8, processor.py:226-229); "
                         "exposed for operating-point tuning")
    ap.add_argument("--robust_init", action="store_true",
                    help="median (vs the reference's mean, "
                         "run_multi_view.py:49) track aggregation for the "
                         "mapping init + detector-average fallback box — "
                         "attacks the measured bad_box 'aggregation' miss "
                         "class (audit_misses.py, MEASURED.md round 5)")
    ap.add_argument("--use_prior", action="store_true")
    ap.add_argument("--no_code", action="store_true")
    ap.add_argument("--representation", default="super_quadric",
                    help="[cube, super_quadric, quadric]")
    ap.add_argument("--out_dir", default="./result/test")
    ap.add_argument("--scans_root", default="./data/ScanNet/scans")
    ap.add_argument("--sequences", default=None,
                    help="file with one scene id per line (default: all scenes)")
    ap.add_argument("--detector_ckpt", default="./experiments/detector.pth")
    ap.add_argument("--associator_ckpt", default="./experiments/associator.pth")
    ap.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    ap.add_argument("--max_frames", default=None, type=int)
    ap.add_argument("--resume", action="store_true",
                    help="skip scenes whose output already exists (per-scene "
                         "outputs make crashed runs resumable, SURVEY.md §5)")
    ap.add_argument("--offline", action="store_true",
                    help="batched-ahead detection + streamed association "
                         "instead of the frame-sequential online step")
    ap.add_argument("--detect_batch", type=int, default=8)
    ap.add_argument("--device_resize", action="store_true",
                    help="ship raw uint8 frames and resize+normalize on device")
    ap.add_argument("--prefetch_workers", type=int, default=2)
    ap.add_argument("--use_pallas", choices=["auto", "on", "off"], default="auto",
                    help="fused Pallas attention (auto: on for TPU)")
    ap.add_argument("--profile", choices=["parity", "fast"], default="parity",
                    help="parity: exact Hungarian + sampled track projection "
                         "(reference semantics); fast: greedy decode + "
                         "closed-form projection (~23%% higher fps, "
                         "equivalence-tested)")
    ap.add_argument("--solver", choices=["adam", "lm"], default="adam",
                    help="mapping solver: adam (reference-exact) or lm "
                         "(fast GN/LM with automatic Adam fallback)")
    ap.add_argument("--decode", choices=["profile", "exact", "greedy"],
                    default="profile",
                    help="association decode (overrides --profile)")
    ap.add_argument("--track_bbox", choices=["profile", "sampled", "exact"],
                    default="profile",
                    help="track re-projection mode (overrides --profile)")
    ap.add_argument("--max_objs", type=int, default=64,
                    help="mapping-stage object-slot capacity (static shape; "
                         "right-size to the scene for less padded compute)")
    ap.add_argument("--max_views", type=int, default=256,
                    help="mapping-stage view-slot capacity per object")
    ap.add_argument("--window", type=int, default=100,
                    help="associator track-history window (observations per "
                         "track fed to the GNN; reference bound: 100, "
                         "src/processor.py:133-178 — >=256 routes the flash "
                         "streaming attention kernel, ops/attention.py)")
    ap.add_argument("--short_side", type=int, default=800,
                    help="inference resize: shorter side (reference: 800)")
    ap.add_argument("--max_size", type=int, default=1333,
                    help="inference resize: longest-side cap (reference: 1333)")
    ap.add_argument("--shard", default=None,
                    help="'i/n': process scenes i, i+n, i+2n, ... — shard a "
                         "val split across hosts/processes (outputs are "
                         "per-scene, so shards combine trivially)")
    ap.add_argument("--scene_parallel", type=int, default=0,
                    help="run N pipeline replicas concurrently, one scene "
                         "per device of an N-device mesh (the SURVEY §2 DP "
                         "plan; requires N <= len(jax.devices()))")
    args = ap.parse_args()

    from PIL import Image

    from odam_tpu.runtime import processor as proc_mod

    cfg = config_mod.merge_cfg([args.config_path])
    fast = args.profile == "fast"
    decode = args.decode if args.decode != "profile" else (
        "greedy" if fast else "exact"
    )
    track_bbox = args.track_bbox if args.track_bbox != "profile" else (
        "exact" if fast else "sampled"
    )
    detr, dparams, assoc, aparams = build_models(
        cfg, args.detector_ckpt, args.associator_ckpt, args.dtype,
        use_pallas={"auto": None, "on": True, "off": False}[args.use_pallas],
        decode=decode,
    )
    pcfg = proc_mod.PipelineConfig(
        detect_threshold=args.detect_threshold,
        score_threshold=args.attach_threshold,
        representation=args.representation,
        use_prior=args.use_prior,
        no_code=args.no_code,
        resize_on_device=args.device_resize,
        track_bbox_mode=track_bbox,
        optim_solver=args.solver,
        min_views=args.min_views,
        robust_init=args.robust_init,
        max_objs=args.max_objs,
        max_views=args.max_views,
        window=args.window,
    )
    pipe = proc_mod.OdamPipeline(detr, dparams, assoc, aparams, pcfg)

    sequences = None
    if args.sequences:
        with open(args.sequences) as f:
            sequences = f.read().splitlines()
    index = scannet.SceneIndex(args.scans_root, sequences)

    scene_list = index.sequences
    if args.shard:
        i, n = (int(x) for x in args.shard.split("/"))
        scene_list = scene_list[i::n]
        print(f"shard {i}/{n}: {len(scene_list)} scenes")

    if args.scene_parallel:
        run_scene_parallel(args, index, scene_list, pcfg,
                           detr, dparams, assoc, aparams)
        return

    for seq_id in scene_list:
        out_dir = os.path.join(args.out_dir, seq_id)
        out_path = os.path.join(out_dir, seq_id)
        if args.resume and os.path.exists(out_path):
            print(f"skipping (resume): {seq_id}")
            continue
        print(f"processing: {seq_id}")
        os.makedirs(out_dir, exist_ok=True)

        K = scannet.read_intrinsic(index.intrinsic_path(seq_id))[:3, :3]
        axis_align = scannet.read_axis_align(index.meta_path(seq_id))
        frames = index.frame_names(seq_id)
        if args.max_frames:
            frames = frames[: args.max_frames]

        first = np.asarray(Image.open(index.image_path(seq_id, frames[0])))
        ih, iw = transforms.target_size(
            *first.shape[:2], short_side=args.short_side, max_size=args.max_size
        )
        scale = np.array([iw / first.shape[1], ih / first.shape[0]])
        K_scaled = K.copy()
        K_scaled[0] *= scale[0]
        K_scaled[1] *= scale[1]
        pipe.init_sequence(K_scaled, ih, iw)

        from odam_tpu.data.loader import scene_frame_loader

        if args.device_resize:
            preprocess = None  # raw uint8; resize+normalize inside the step
        else:
            preprocess = lambda rgb: transforms.preprocess_image(rgb, ih, iw)  # noqa: E731
        loader = scene_frame_loader(
            index, seq_id, frames, preprocess,
            num_workers=args.prefetch_workers,
        )

        t0 = time.time()
        if args.offline:
            from odam_tpu.runtime import offline as offline_mod

            images, fids, poses = [], [], []
            for fid, img, T_cw in loader:
                if np.isnan(T_cw).any():
                    continue
                images.append(img)
                fids.append(fid)
                poses.append(axis_align @ np.linalg.inv(T_cw))
            detector = offline_mod.BatchedDetector(
                detr, dparams, pcfg, batch_size=args.detect_batch
            )
            cached = offline_mod.CachedDetectionPipeline(assoc, aparams, pcfg)
            out = offline_mod.run_scene_offline(
                detector, cached, images, fids, poses, K_scaled, ih, iw
            )
            n_frames = len(fids)
            n_tracks = len(out["tracks"])
        else:
            from odam_tpu.data.loader import device_prefetch

            n_frames = 0
            usable = (
                item for item in loader if not np.isnan(item[2]).any()
            )  # NaN-pose frames skipped (run_processor.py:74-75)
            for fid, img, T_cw in device_prefetch(usable):
                pipe.process_frame(img, fid, axis_align @ np.linalg.inv(T_cw))
                n_frames += 1
            n_tracks = len(pipe.tracks)
            out = pipe.optim_process(pipe.tracks)
            merged = pipe.merge_process(out)
            out = pipe.optim_process(merged)
        fps = n_frames / max(time.time() - t0, 1e-6)
        print(f"  {n_frames} frames, {fps:.1f} fps, {n_tracks} tracks")

        with open(os.path.join(out_dir, seq_id), "wb") as f:
            pickle.dump(
                {
                    "tracks": out["tracks"],
                    "bboxes_qc": out["bboxes_qc"],
                    "bboxes_dl": out["bboxes_dl"],
                    "quadrics": out["quadrics"],
                },
                f,
            )


if __name__ == "__main__":
    main()
