"""Fused multi-head attention as a Pallas TPU kernel.

One kernel instance computes a full (batch, head) attention slice —
QK^T -> masked softmax -> PV — entirely in VMEM, avoiding the HBM round
trips of the unfused path.  At DETR scale (~1.1k tokens, 32-dim heads) the
whole slice fits VMEM comfortably, so no K/V streaming loop is needed; the
grid runs over (batch, heads).

Falls back transparently: odam_tpu.ops.attention.mha_core selects this
kernel only when ``use_pallas=True`` (TPU builds); the pure-XLA path remains
the default and the numerical reference (tests compare the two).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

NEG_INF = -1e9


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale: float):
    # blocks: q [1,1,Lq,dh], k/v [1,1,Lk,dh], mask [1,1,Lk], o [1,1,Lq,dh]
    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                                             # [Lq, Lk]
    pad = mask_ref[0, 0][None, :] > 0.5                   # [1, Lk]
    logits = jnp.where(pad, NEG_INF, logits)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    v = v_ref[0, 0].astype(jnp.float32)
    out = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) / denom
    o_ref[0, 0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_attention(q: Array, k: Array, v: Array,
                    key_padding_mask: Array | None = None,
                    interpret: bool | None = None) -> Array:
    """Fused softmax attention.

    Args:
        q: [B, Lq, H, dh]; k, v: [B, Lk, H, dh].
        key_padding_mask: [B, Lk] bool, True = padded key.

    Returns:
        [B, Lq, H, dh].
    """
    B, Lq, H, dh = q.shape
    Lk = k.shape[1]
    scale = 1.0 / (dh ** 0.5)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"  # run interpreted off-TPU

    if key_padding_mask is None:
        mask = jnp.zeros((B, 1, Lk), jnp.float32)
    else:
        mask = key_padding_mask.astype(jnp.float32)[:, None, :]

    # [B, L, H, dh] -> [B, H, L, dh] so each grid cell reads a contiguous slice.
    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)

    grid = (B, H)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((B, H, Lq, dh), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, Lq, dh), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Lk, dh), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Lk, dh), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Lk), lambda b, h: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, Lq, dh), lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qt, kt, vt, mask)
    return jnp.swapaxes(out, 1, 2)


# ---------------------------------------------------------------------------
# Streaming (flash-style) variant for long key sequences
# ---------------------------------------------------------------------------

def _flash_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, acc_ref, m_ref, l_ref,
                  *, scale: float, kv_blocks: int):
    """Online-softmax attention: the KV sequence is blocked over the last
    grid axis; running (max, sum, weighted-value) accumulators live in VMEM
    scratch across the KV sweep.

    Grid: (B, H, kv_blocks); blocks: q [1,1,Lq,dh], k/v [1,1,Bk,dh],
    mask [1,1,Bk]; scratch acc [Lq, dh], m/l [Lq, 1].
    """
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                                                 # [Lq, Bk]
    logits = jnp.where(mask_ref[0, 0][None, :] > 0.5, NEG_INF, logits)

    m_prev = m_ref[:]                                         # [Lq, 1]
    m_cur = jnp.max(logits, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)                           # rescale old
    p = jnp.exp(logits - m_new)                               # [Lq, Bk]
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    m_ref[:] = m_new

    @pl.when(kv_idx == kv_blocks - 1)
    def _():
        o_ref[0, 0] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_k", "interpret"))
def flash_attention(q: Array, k: Array, v: Array,
                    key_padding_mask: Array | None = None,
                    block_k: int = 512,
                    interpret: bool | None = None) -> Array:
    """Streaming softmax attention for long key sequences.

    Same contract as :func:`fused_attention` but the KV axis is processed in
    ``block_k`` chunks with online-softmax accumulators, so VMEM usage is
    O(Lq * dh + block_k * dh) independent of Lk — this is the blockwise
    fuser for long track windows (SURVEY.md §5's optional long-context path).
    """
    B, Lq, H, dh = q.shape
    Lk = k.shape[1]
    scale = 1.0 / (dh ** 0.5)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    pad = (-Lk) % block_k
    if key_padding_mask is None:
        key_padding_mask = jnp.zeros((B, Lk), bool)
    if pad:
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
        key_padding_mask = jnp.pad(
            key_padding_mask, ((0, 0), (0, pad)), constant_values=True
        )
    Lk_p = Lk + pad
    kv_blocks = Lk_p // block_k

    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    mask = key_padding_mask.astype(jnp.float32)[:, None, :]

    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, kv_blocks=kv_blocks),
        out_shape=jax.ShapeDtypeStruct((B, H, Lq, dh), q.dtype),
        grid=(B, H, kv_blocks),
        in_specs=[
            pl.BlockSpec((1, 1, Lq, dh), lambda b, h, i: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, dh), lambda b, h, i: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, dh), lambda b, h, i: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k), lambda b, h, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, Lq, dh), lambda b, h, i: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((Lq, dh), jnp.float32),
            pltpu.VMEM((Lq, 1), jnp.float32),
            pltpu.VMEM((Lq, 1), jnp.float32),
        ],
        interpret=interpret,
    )(qt, kt, vt, mask)
    return jnp.swapaxes(out, 1, 2)
