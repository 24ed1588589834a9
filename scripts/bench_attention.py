"""Attention-kernel bench: XLA vs fused Pallas vs flash (streaming) Pallas.

Run on real TPU hardware.  Shapes are the framework's two attention hot
spots: the DETR encoder (~1.1k image tokens) and the associator's
track-history fuser at window 100 (reference bound, processor.py:133) and
the long-window 400 variant the flash kernel exists for.

Timing protocol per CLAUDE.md: this backend's block_until_ready returns at
dispatch-acknowledge, so every timed region ends with a forced device->host
pull (float(jnp.sum(...))).

Usage: python scripts/bench_attention.py [--dtype bfloat16] [--iters 30]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def force(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def bench(fn, args, iters):
    out = fn(*args)
    force(out)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    force(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    from odam_tpu.ops import attention, pallas_attention
    from odam_tpu.utils import compile_cache

    compile_cache.enable()
    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[args.dtype]
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform}); dtype {args.dtype}")

    cases = [
        # (name, B, Lq, Lk, H, dh)
        ("encoder_1050tok", 1, 1050, 1050, 8, 32),
        ("fuser_w100_48trk", 48, 100, 100, 4, 64),
        ("fuser_w400_48trk", 48, 400, 400, 4, 64),
    ]
    rng = np.random.default_rng(0)
    for name, B, Lq, Lk, H, dh in cases:
        D = H * dh
        q = jnp.asarray(rng.normal(size=(B, Lq, D)), dtype)
        k = jnp.asarray(rng.normal(size=(B, Lk, D)), dtype)
        v = jnp.asarray(rng.normal(size=(B, Lk, D)), dtype)
        kpm = jnp.asarray(np.arange(Lk)[None, :] >= Lk - 7).repeat(B, 0)

        xla = jax.jit(lambda q, k, v: attention.mha_core(q, k, v, H, kpm))
        qh = q.reshape(B, Lq, H, dh)
        kh = k.reshape(B, Lk, H, dh)
        vh = v.reshape(B, Lk, H, dh)
        fused = jax.jit(
            lambda q, k, v: pallas_attention.fused_attention(q, k, v, kpm)
        )
        flash = jax.jit(
            lambda q, k, v: pallas_attention.flash_attention(
                q, k, v, kpm, block_k=256
            )
        )

        ref = np.asarray(
            attention.mha_core(
                q.astype(jnp.float32), k.astype(jnp.float32),
                v.astype(jnp.float32), H, kpm,
            )
        ).reshape(B, Lq, H, dh)
        err_fused = float(np.max(np.abs(
            np.asarray(fused(qh, kh, vh), np.float32) - ref)))
        err_flash = float(np.max(np.abs(
            np.asarray(flash(qh, kh, vh), np.float32) - ref)))

        t_xla = bench(xla, (q, k, v), args.iters)
        t_fused = bench(fused, (qh, kh, vh), args.iters)
        t_flash = bench(flash, (qh, kh, vh), args.iters)
        print(
            f"{name:>18}: XLA {t_xla:7.3f} ms | fused {t_fused:7.3f} ms "
            f"(err {err_fused:.2e}) | flash {t_flash:7.3f} ms "
            f"(err {err_flash:.2e})"
        )


if __name__ == "__main__":
    main()
