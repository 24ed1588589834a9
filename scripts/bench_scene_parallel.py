"""Scene-parallel aggregate throughput on hardware (VERDICT r3 weak #5).

The reference processes a val split serially, one scene at a time
(src/scripts/run_processor.py:46-92).  `SceneParallelRunner` vmaps the
whole online per-frame step over a scene axis; on ONE chip that runs S
scenes batched, amortizing the per-dispatch and per-layer overheads the
batch-16 detection bench measured as a 2.8x win.  This measures the
aggregate online-step throughput (frames/s summed over lanes) at
S in {1, 2, 4, 8} with device-resident frames, forced pulls, median of
N passes — directly comparable to bench.py's device-resident number.

Usage: python scripts/bench_scene_parallel.py  [--lanes 1 2 4 8]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from odam_tpu.utils import compile_cache

    compile_cache.enable()

    from odam_tpu.models import associator as assoc_mod, detr as detr_mod
    from odam_tpu.parallel import mesh as mesh_mod
    from odam_tpu.runtime import scene_parallel as sp_mod
    from odam_tpu.runtime import processor as proc_mod, tracker

    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--passes", type=int, default=5)
    args = ap.parse_args()

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    print(f"device: {dev}", file=sys.stderr)
    img_h, img_w = (800, 1071) if on_tpu else (160, 208)
    n_frames = int(os.environ.get("ODAM_BENCH_FRAMES", "80" if on_tpu else "4"))
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    def force(x):
        return float(jnp.sum(x.astype(jnp.float32)))

    # The completion barrier costs one tunnel RTT (pure apparatus, not
    # workload); calibrate on a ready scalar and subtract per pass, exactly
    # as bench.py does.
    ready_scalar = jnp.zeros((), jnp.float32) + 1.0
    float(ready_scalar)

    def pull_rtt():
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            float(ready_scalar)
            best = min(best, time.time() - t0)
        return best

    dcfg = detr_mod.DETRConfig(dtype=dtype, use_pallas=on_tpu)
    detr = detr_mod.DETR(dcfg)
    dparams = detr.init(jax.random.key(0), jnp.zeros((1, img_h, img_w, 3)))
    acfg = assoc_mod.AssociatorConfig(dtype=dtype)
    assoc = assoc_mod.Associator(acfg)
    pcfg = proc_mod.PipelineConfig(detect_threshold=0.0, score_threshold=0.0)
    aparams = assoc.init(
        jax.random.key(1),
        jnp.full((1, pcfg.max_tracks, pcfg.window, 79), -1.0),
        jnp.zeros((1, pcfg.max_tracks), bool),
        jnp.full((1, pcfg.max_dets, 79), -1.0),
        jnp.zeros((1, pcfg.max_dets), bool),
    )
    mesh = mesh_mod.make_mesh({"dp": 1})

    rng = np.random.default_rng(0)
    frames_np = [
        rng.normal(0, 1, (img_h, img_w, 3)).astype(np.float32)
        for _ in range(4)
    ]
    K = np.array(
        [[1170.0 * img_w / 1296, 0, img_w / 2],
         [0, 1170.0 * img_h / 968, img_h / 2],
         [0, 0, 1]], np.float32,
    )

    def pose(f, lane):
        T = np.eye(4, dtype=np.float32)
        phi = 0.02 * f + 0.7 * lane
        T[:3, :3] = np.array(
            [[np.cos(phi), -np.sin(phi), 0],
             [np.sin(phi), np.cos(phi), 0], [0, 0, 1]], np.float32)
        T[:3, 3] = [0.05 * f, 0.1 * lane, 1.4]
        return T

    results = {}
    for S in args.lanes:
        runner = sp_mod.SceneParallelRunner(
            detr, dparams, assoc, aparams, pcfg, mesh, n_lanes=S)
        stores = sp_mod._stack(
            [tracker.init_store(pcfg.max_tracks, pcfg.window)
             for _ in range(S)])
        logs = sp_mod._stack(
            [tracker.init_log(pcfg.max_log_frames, pcfg.max_dets)
             for _ in range(S)])
        Ks = jnp.asarray(np.stack([K] * S))
        w_dev = jnp.asarray(float(img_w))
        h_dev = jnp.asarray(float(img_h))
        dev_frames = [
            jnp.asarray(np.stack([frames_np[(f + l) % 4] for l in range(S)]))
            for f in range(4)
        ]
        valid = jnp.ones((S,), bool)

        def run_block(f0, stores, logs):
            for f in range(f0, f0 + n_frames):
                res = runner._step(
                    dparams, aparams, stores, logs, dev_frames[f % 4],
                    jnp.asarray([float(f)] * S, jnp.float32),
                    jnp.asarray(np.stack([pose(f, l) for l in range(S)])),
                    Ks, w_dev, h_dev, valid)
                stores, logs = res.store, res.log
            return stores, logs

        t0 = time.time()
        stores, logs = run_block(0, stores, logs)
        force(stores.window)
        print(f"S={S}: warmup/compile {time.time() - t0:.1f}s",
              file=sys.stderr)
        fps = []
        for rep in range(args.passes):
            rtt = pull_rtt()
            t0 = time.time()
            stores, logs = run_block(n_frames * (rep + 1), stores, logs)
            force(stores.window)
            fps.append(S * n_frames / max(time.time() - t0 - rtt, 1e-6))
        results[S] = fps
        print(f"S={S}: aggregate median {np.median(fps):.2f} fps "
              f"[{', '.join(f'{x:.1f}' for x in fps)}]", flush=True)

    base = np.median(results[args.lanes[0]])
    for S, fps in results.items():
        print(f"S={S}: {np.median(fps):.2f} fps aggregate "
              f"({np.median(fps) / base:.2f}x vs S={args.lanes[0]})")


if __name__ == "__main__":
    main()
