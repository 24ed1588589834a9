"""Positional encodings (sine and learned) for the DETR transformer.

Reference: src/models/position_encoding.py:11-87.  NHWC layout; the sine
variant normalizes cumulative-sum coordinates over the unpadded region so
weights port 1:1 from the torch checkpoint.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


def sine_position_encoding(mask: Array, num_pos_feats: int = 128,
                           temperature: float = 10000.0,
                           normalize: bool = True,
                           scale: float = 2 * jnp.pi,
                           dtype: Any = jnp.float32) -> Array:
    """2D sine positional features from a padding mask.

    Args:
        mask: [B, H, W] bool, True = PADDED pixel (torch convention).

    Returns:
        [B, H, W, 2 * num_pos_feats] positional features (y-features first,
        matching position_encoding.py:44-46).
    """
    not_mask = (~mask).astype(jnp.float32)
    y_embed = jnp.cumsum(not_mask, axis=1)
    x_embed = jnp.cumsum(not_mask, axis=2)
    if normalize:
        eps = 1e-6
        y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
        x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale

    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * jnp.floor(dim_t / 2) / num_pos_feats)

    pos_x = x_embed[..., None] / dim_t
    pos_y = y_embed[..., None] / dim_t
    # interleave sin/cos over pairs, as in position_encoding.py:44-45
    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])], axis=-1)
    pos_x = pos_x.reshape(pos_x.shape[:-2] + (-1,))
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])], axis=-1)
    pos_y = pos_y.reshape(pos_y.shape[:-2] + (-1,))
    return jnp.concatenate([pos_y, pos_x], axis=-1).astype(dtype)


class LearnedPositionEncoding(nn.Module):
    """Learned row/col embeddings (position_encoding.py:50-75)."""

    num_pos_feats: int = 128
    max_size: int = 50
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feature_shape: tuple[int, int, int]) -> Array:
        B, H, W = feature_shape
        row = nn.Embed(self.max_size, self.num_pos_feats, name="row_embed")(
            jnp.arange(H)
        )
        col = nn.Embed(self.max_size, self.num_pos_feats, name="col_embed")(
            jnp.arange(W)
        )
        pos = jnp.concatenate(
            [
                jnp.broadcast_to(col[None, :, :], (H, W, self.num_pos_feats)),
                jnp.broadcast_to(row[:, None, :], (H, W, self.num_pos_feats)),
            ],
            axis=-1,
        )
        return jnp.broadcast_to(pos[None], (B, H, W, 2 * self.num_pos_feats)).astype(self.dtype)


def timestep_encoding(position: Array, d_model: int = 256) -> Array:
    """Sinusoidal encoding of scalar time indices: [..., L] -> [..., L, d_model].

    Reference: associator.py:315-327 (the associator's PositionalEncoding) —
    even channels sin, odd channels cos of position / 10000^(2i/d).
    """
    half = d_model // 2
    div = jnp.exp(2.0 * jnp.arange(half) * (-jnp.log(10000.0) / d_model))
    arg = position[..., None] * div
    pe = jnp.stack([jnp.sin(arg), jnp.cos(arg)], axis=-1)
    return pe.reshape(pe.shape[:-2] + (d_model,))
