#!/usr/bin/env python
"""Per-stage pipeline profiling on the current backend.

Times each stage of the online pipeline in isolation (jitted, steady state)
plus the composed step, and optionally captures a jax.profiler trace.

    python scripts/profile_pipeline.py [--h 800 --w 1071] [--trace /tmp/trace]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, *args, iters=10):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters * 1000


def main():
    from odam_tpu.utils import compile_cache
    compile_cache.enable()
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=800)
    ap.add_argument("--w", type=int, default=1071)
    ap.add_argument("--trace", default=None)
    ap.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from odam_tpu.models import associator as assoc_mod, detr as detr_mod
    from odam_tpu.runtime import processor as proc_mod, tracker
    from odam_tpu.utils.metrics import profiler_trace

    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[args.dtype]
    print(f"backend: {jax.devices()[0]}  input {args.h}x{args.w}  {args.dtype}")

    dcfg = detr_mod.DETRConfig(dtype=dtype)
    detr = detr_mod.DETR(dcfg)
    dparams = detr.init(jax.random.key(0), jnp.zeros((1, args.h, args.w, 3)))
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

    K = jnp.asarray(np.array([[500.0, 0, args.w / 2], [0, 500, args.h / 2], [0, 0, 1]],
                             np.float32))
    img = jax.device_put(np.zeros((1, args.h, args.w, 3), np.float32))
    w = jnp.asarray(float(args.w))
    h = jnp.asarray(float(args.h))

    fwd = jax.jit(lambda p, im: detr.apply(p, im))
    out = fwd(dparams, img)
    print(f"detr forward:        {timeit(fwd, dparams, img):8.2f} ms")

    pp = jax.jit(lambda o: detr_mod.postprocess(o, w, h, jnp.asarray(0.6), K))
    print(f"postprocess + NMS:   {timeit(pp, out):8.2f} ms")

    store = tracker.init_store(pcfg.max_tracks, pcfg.window)
    prep = jax.jit(
        lambda s, T: proc_mod.prepare_track_inputs(s, T, K, w, h, pcfg.track_bbox_samples)
    )
    T_wc = jnp.eye(4)
    print(f"track re-projection: {timeit(prep, store, T_wc):8.2f} ms")

    tr = jnp.full((1, pcfg.max_tracks, pcfg.window, 79), -1.0)
    tm = jnp.zeros((1, pcfg.max_tracks), bool).at[:, :10].set(True)
    de = jnp.full((1, pcfg.max_dets, 79), -1.0)
    dm = jnp.zeros((1, pcfg.max_dets), bool).at[:, :10].set(True)
    afwd = jax.jit(lambda p, *a: assoc.apply(p, *a))
    print(f"associator forward:  {timeit(afwd, aparams, tr, tm, de, dm):8.2f} ms")

    pipe = proc_mod.OdamPipeline(detr, dparams, assoc, aparams, pcfg)
    pipe.init_sequence(np.asarray(K), args.h, args.w)
    frame = np.zeros((args.h, args.w, 3), np.uint8)
    for f in range(2):
        r = pipe.process_frame(frame, f, np.eye(4, dtype=np.float32))
    jax.block_until_ready(r.store.window)
    t0 = time.time()
    N = 30
    for f in range(2, 2 + N):
        r = pipe.process_frame(frame, f, np.eye(4, dtype=np.float32))
    jax.block_until_ready(r.store.window)
    dt = (time.time() - t0) / N * 1000
    print(f"composed step (async, incl. H2D): {dt:8.2f} ms  ({1000 / dt:.1f} fps)")

    if args.trace:
        with profiler_trace(args.trace):
            for f in range(40, 45):
                r = pipe.process_frame(frame, f, np.eye(4, dtype=np.float32))
            jax.block_until_ready(r.store.window)
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
