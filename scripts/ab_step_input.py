"""A/B the jitted step's frame-transport forms on hardware.

VERDICT r3 weak #1: the driver bench dropped 113.9 -> 105.7 fps
device-resident between rounds 2 and 3, coinciding with the round-3
transport additions inside the jitted step (YUV 4:2:0 reconstruction,
uint8 normalize, optional on-device resize — runtime/processor.py step).
This times the SAME pipeline step with each device-resident input form:

  float32  pre-normalized [H, W, 3] float32 (round-2's bench transport)
  uint8    [H, W, 3] uint8, normalized on device
  yuv420   (Y, UV) uint8 tuple, reconstructed + normalized on device

Each form retraces the step once; passes are timed with a forced pull
(bench.py force()).  Run on a quiet host.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from odam_tpu.utils import compile_cache

    compile_cache.enable()

    from odam_tpu.data.transforms import rgb_to_yuv420
    from odam_tpu.models import associator as assoc_mod, detr as detr_mod
    from odam_tpu.runtime import processor as proc_mod

    def force(x):
        return float(jnp.sum(x.astype(jnp.float32)))

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    print(f"device: {dev}", file=sys.stderr)
    img_h, img_w = (800, 1071) if on_tpu else (160, 208)
    n_frames = 40 if on_tpu else 4
    n_passes = int(os.environ.get("ODAM_AB_PASSES", "5"))
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

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
    pipe = proc_mod.OdamPipeline(detr, dparams, assoc, aparams, pcfg)
    K = np.array(
        [[1170.0 * img_w / 1296, 0, img_w / 2],
         [0, 1170.0 * img_h / 968, img_h / 2],
         [0, 0, 1]], np.float32,
    )

    rng = np.random.default_rng(0)
    rgb_u8 = [rng.integers(0, 256, size=(img_h, img_w, 3), dtype=np.uint8)
              for _ in range(4)]
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    forms = {
        "float32": [jax.device_put(((f / 255.0 - mean) / std).astype(np.float32))
                    for f in rgb_u8],
        "uint8": [jax.device_put(f) for f in rgb_u8],
        "yuv420": [tuple(jax.device_put(p) for p in rgb_to_yuv420(f))
                   for f in rgb_u8],
    }

    def pose(f):
        T = np.eye(4, dtype=np.float32)
        phi = 0.02 * f
        T[:3, :3] = np.array(
            [[np.cos(phi), -np.sin(phi), 0],
             [np.sin(phi), np.cos(phi), 0], [0, 0, 1]], np.float32)
        T[:3, 3] = [0.05 * f, 0, 1.4]
        return T

    results = {}
    for name, frames in forms.items():
        pipe.init_sequence(K, img_h, img_w)
        t0 = time.time()
        for f in range(2):
            r = pipe.process_frame(frames[f % 4], f, pose(f))
        force(r.store.window)
        print(f"{name}: warmup/compile {time.time() - t0:.1f}s",
              file=sys.stderr)
        fps = []
        for rep in range(n_passes):
            t0 = time.time()
            for f in range(2 + rep * n_frames, 2 + (rep + 1) * n_frames):
                r = pipe.process_frame(frames[f % 4], f, pose(f))
            force(r.store.window)
            fps.append(n_frames / (time.time() - t0))
        results[name] = fps
        print(f"{name}: median {np.median(fps):.2f} fps "
              f"[{', '.join(f'{x:.1f}' for x in fps)}]")

    base = np.median(results["float32"])
    for name, fps in results.items():
        print(f"{name}: {np.median(fps):.2f} fps "
              f"({100 * (np.median(fps) / base - 1):+.1f}% vs float32)")


if __name__ == "__main__":
    main()
