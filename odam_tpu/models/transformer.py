"""DETR transformer encoder/decoder (Flax, batch-first).

Re-design of the reference transformer (src/models/transformer.py:16-305) for
TPU: batch-first [B, L, D] tensors (torch uses seq-first), explicit q/k/v/out
projections so torch's packed in_proj weights port cleanly, the attention core
shared with the associator (odam_tpu.ops.attention, with an optional Pallas
fused path), and all dropout expressed-but-off at inference.  Positional
embeddings are added inside attention (DETR style), post-norm by default, and
the decoder returns the per-layer intermediate stack for auxiliary losses.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import mha_core

Array = jax.Array


class MultiHeadAttention(nn.Module):
    """Torch-MultiheadAttention-compatible projections around the shared core."""

    d_model: int
    num_heads: int
    dtype: Any = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, query: Array, key: Array, value: Array,
                 key_padding_mask: Array | None = None) -> Array:
        dense = lambda name: nn.Dense(self.d_model, dtype=self.dtype, name=name)  # noqa: E731
        q = dense("q_proj")(query)
        k = dense("k_proj")(key)
        v = dense("v_proj")(value)
        out = mha_core(q, k, v, self.num_heads, key_padding_mask,
                       use_pallas=self.use_pallas)
        return dense("out_proj")(out)


class EncoderLayer(nn.Module):
    d_model: int
    num_heads: int
    dim_feedforward: int
    dropout: float = 0.1
    normalize_before: bool = False
    dtype: Any = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, src: Array, pos: Array,
                 key_padding_mask: Array | None = None,
                 deterministic: bool = True) -> Array:
        attn = MultiHeadAttention(self.d_model, self.num_heads, self.dtype,
                                  self.use_pallas, name="self_attn")
        norm1 = nn.LayerNorm(dtype=self.dtype, name="norm1")
        norm2 = nn.LayerNorm(dtype=self.dtype, name="norm2")
        drop = nn.Dropout(self.dropout, deterministic=deterministic)

        def ffn(x):
            x = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(x)
            x = drop(nn.relu(x))
            return nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(x)

        if self.normalize_before:
            s2 = norm1(src)
            qk = s2 + pos
            src = src + drop(attn(qk, qk, s2, key_padding_mask))
            src = src + drop(ffn(norm2(src)))
            return src
        qk = src + pos
        src = norm1(src + drop(attn(qk, qk, src, key_padding_mask)))
        src = norm2(src + drop(ffn(src)))
        return src


class DecoderLayer(nn.Module):
    d_model: int
    num_heads: int
    dim_feedforward: int
    dropout: float = 0.1
    normalize_before: bool = False
    dtype: Any = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, tgt: Array, memory: Array, pos: Array, query_pos: Array,
                 memory_key_padding_mask: Array | None = None,
                 deterministic: bool = True) -> Array:
        self_attn = MultiHeadAttention(self.d_model, self.num_heads, self.dtype,
                                       self.use_pallas, name="self_attn")
        cross_attn = MultiHeadAttention(self.d_model, self.num_heads, self.dtype,
                                        self.use_pallas, name="multihead_attn")
        norm1 = nn.LayerNorm(dtype=self.dtype, name="norm1")
        norm2 = nn.LayerNorm(dtype=self.dtype, name="norm2")
        norm3 = nn.LayerNorm(dtype=self.dtype, name="norm3")
        drop = nn.Dropout(self.dropout, deterministic=deterministic)

        def ffn(x):
            x = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(x)
            x = drop(nn.relu(x))
            return nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(x)

        if self.normalize_before:
            t2 = norm1(tgt)
            qk = t2 + query_pos
            tgt = tgt + drop(self_attn(qk, qk, t2))
            t2 = norm2(tgt)
            tgt = tgt + drop(
                cross_attn(t2 + query_pos, memory + pos, memory, memory_key_padding_mask)
            )
            tgt = tgt + drop(ffn(norm3(tgt)))
            return tgt
        qk = tgt + query_pos
        tgt = norm1(tgt + drop(self_attn(qk, qk, tgt)))
        tgt = norm2(
            tgt + drop(
                cross_attn(tgt + query_pos, memory + pos, memory, memory_key_padding_mask)
            )
        )
        tgt = norm3(tgt + drop(ffn(tgt)))
        return tgt


class Transformer(nn.Module):
    """Encoder/decoder with per-layer intermediate decoder outputs.

    Inputs are NHWC feature maps; flattening to token sequences happens here
    (reference transformer.py:45-57).
    """

    d_model: int = 256
    num_heads: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    dim_feedforward: int = 2048
    dropout: float = 0.1
    normalize_before: bool = False
    dtype: Any = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, src: Array, mask: Array, query_embed: Array, pos: Array,
                 deterministic: bool = True) -> tuple[Array, Array]:
        """
        Args:
            src: [B, H, W, D] projected features.
            mask: [B, H, W] bool padding mask (True = padded).
            query_embed: [Q, D] learned query positions.
            pos: [B, H, W, D] positional features.

        Returns:
            (hs [L_dec, B, Q, D] intermediate decoder states, memory [B, H, W, D]).
        """
        B, H, W, D = src.shape
        src_seq = src.reshape(B, H * W, D)
        pos_seq = pos.reshape(B, H * W, D)
        mask_seq = mask.reshape(B, H * W)

        kwargs = dict(
            d_model=self.d_model, num_heads=self.num_heads,
            dim_feedforward=self.dim_feedforward, dropout=self.dropout,
            normalize_before=self.normalize_before, dtype=self.dtype,
            use_pallas=self.use_pallas,
        )

        memory = src_seq
        for i in range(self.num_encoder_layers):
            memory = EncoderLayer(**kwargs, name=f"encoder_layer{i}")(
                memory, pos_seq, mask_seq, deterministic
            )
        if self.normalize_before:
            memory = nn.LayerNorm(dtype=self.dtype, name="encoder_norm")(memory)

        Q = query_embed.shape[0]
        query_pos = jnp.broadcast_to(query_embed[None], (B, Q, D)).astype(src.dtype)
        tgt = jnp.zeros_like(query_pos)
        decoder_norm = nn.LayerNorm(dtype=self.dtype, name="decoder_norm")

        intermediates = []
        out = tgt
        for i in range(self.num_decoder_layers):
            out = DecoderLayer(**kwargs, name=f"decoder_layer{i}")(
                out, memory, pos_seq, query_pos, mask_seq, deterministic
            )
            intermediates.append(decoder_norm(out))
        hs = jnp.stack(intermediates, axis=0)  # [L_dec, B, Q, D]
        return hs, memory.reshape(B, H, W, D)
