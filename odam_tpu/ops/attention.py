"""Multi-head attention kernels.

One attention core shared by the DETR transformer and the associator GNN.
``mha_core`` is the pure-JAX path (XLA fuses it well at DETR's ~1k-token
scale); :mod:`odam_tpu.ops.pallas_attention` provides a fused Pallas TPU
kernel for the encoder hot loop, selected via ``use_pallas``.

Layout is batch-first [B, L, D] throughout (the reference uses torch's
seq-first [L, B, D]; batch-first maps better onto TPU tiling).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

NEG_INF = -1e9

# Key-sequence length beyond which the Pallas path streams KV in blocks
# (online-softmax flash kernel) instead of materializing the full [Lq, Lk]
# logits tile in VMEM.  At the associator's default 100-step track window
# the whole slice fits VMEM and the single-tile kernel wins; long-window
# variants (window 400+, lifting the reference's processor.py:133 bound)
# cross over to the streaming kernel.
FLASH_MIN_KEYS = 256

# Batch bound for the Pallas kernels.  Measured on hardware (round 4,
# scripts/profile_batched_detector.py --pallas {on,off}): at B=1 latency
# mode the flash kernel wins the DETR encoder (4.8 vs 5.1 ms whole
# forward), but in throughput mode XLA's own attention fusion is ~2x
# faster per transformer stage (B=16: 8.5 vs 17.3 ms; B=32: 15.3 vs
# 34.6 ms -> 434 vs 347 fps detection throughput).  The round-3 kernel
# table (BENCHMARKS.md) shows the same pattern for the associator's
# batched fuser rows (B=48 tracks: XLA 1.16/1.33 ms vs Pallas
# 1.22-1.88 ms at bf16).  So ``use_pallas=True`` means "Pallas where
# Pallas wins": only small-batch calls take the hand-written kernels.
PALLAS_MAX_BATCH = 2


def mha_core(q: Array, k: Array, v: Array, num_heads: int,
             key_padding_mask: Array | None = None,
             use_pallas: bool = False) -> Array:
    """Scaled dot-product attention over heads.

    Args:
        q: [B, Lq, D]; k, v: [B, Lk, D] (already projected).
        num_heads: H; D must be divisible by H.
        key_padding_mask: optional [B, Lk] bool, True = PADDED (masked out),
            matching the torch key_padding_mask convention used by the
            reference (transformer.py:160-161).

    Returns:
        [B, Lq, D] attention output (pre out-projection).
    """
    B, Lq, D = q.shape
    Lk = k.shape[1]
    H = num_heads
    dh = D // H

    qh = q.reshape(B, Lq, H, dh)
    kh = k.reshape(B, Lk, H, dh)
    vh = v.reshape(B, Lk, H, dh)

    if use_pallas and B <= PALLAS_MAX_BATCH:
        from . import pallas_attention

        if Lk >= FLASH_MIN_KEYS:
            out = pallas_attention.flash_attention(
                qh, kh, vh, key_padding_mask, block_k=256
            )
        else:
            out = pallas_attention.fused_attention(qh, kh, vh, key_padding_mask)
        return out.reshape(B, Lq, D)

    logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / jnp.sqrt(
        jnp.asarray(dh, q.dtype)
    )
    if key_padding_mask is not None:
        logits = jnp.where(
            key_padding_mask[:, None, None, :], NEG_INF, logits
        )
    attn = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn, vh)
    return out.reshape(B, Lq, D)
