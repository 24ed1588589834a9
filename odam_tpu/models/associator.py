"""Detection-to-track associator: attentional GNN + Sinkhorn OT (Flax).

Capability parity with the reference associator (src/models/associator.py:
156-348), re-laid-out for TPU: batch-first tensors, one static-shape program
(fixed MAX_TRACKS / MAX_DETS / WINDOW), Sinkhorn via lax.scan, and Hungarian
decode on device (odam_tpu.ops.lap) instead of a scipy host call.

Padding semantics match the reference exactly: detection slots are padded
with -1 feature rows that *participate* in attention (the reference collater
always pads detections to 30 unmasked, processor.py:44-93), while padded
track slots are masked out of attention — numerically equivalent to the
reference running with exactly n_tracks unpadded tracks.

Feature layout per entity (79 columns; scan_net_track.py:1-12):
  0 time index | 1 class | 2:6 normalized bbox | 6:9 dims | 9:12 t_co |
  12 sin azi | 13 cos azi | 14 score | 15:79 shape code.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, NamedTuple, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import lap, sinkhorn
from ..ops.attention import mha_core
from . import position

Array = jax.Array

FEATURE_DIM = 79  # time + 78 entity features
MAX_TRACKS = 64
MAX_DETS = 30
WINDOW = 100


@dataclass(frozen=True)
class AssociatorConfig:
    descriptor_dim: int = 256
    keypoint_encoder: Sequence[int] = (78, 256, 256)
    gnn_layers: Sequence[str] = ("self", "cross") * 4
    self_gnn_layers: Sequence[str] = ("self", "self")
    sinkhorn_iterations: int = 100
    num_heads: int = 4
    decode: str = "exact"  # "exact" (Hungarian, reference parity) | "greedy" (fast peel)
    use_pallas: bool = False  # Pallas attention kernels (fused; flash for
                              # long track windows, ops/attention.py)
    dtype: Any = jnp.float32

    @classmethod
    def from_cfg(cls, cfg: dict, dtype: Any = jnp.float32) -> "AssociatorConfig":
        return cls(
            descriptor_dim=int(cfg.get("descriptor_dim", 256)),
            keypoint_encoder=tuple(cfg.get("keypoint_encoder", (78, 256, 256))),
            gnn_layers=tuple(cfg.get("GNN_layers", ("self", "cross") * 4)),
            self_gnn_layers=tuple(cfg.get("self_GNN_layers", ("self", "self"))),
            sinkhorn_iterations=int(cfg.get("sinkhorn_iterations", 100)),
            dtype=dtype,
        )


class ChannelMLP(nn.Module):
    """Per-token MLP (the reference's 1x1-conv stacks, associator.py:58-69)."""

    channels: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        n = len(self.channels)
        for i in range(1, n):
            x = nn.Dense(self.channels[i], dtype=self.dtype, name=f"layer{i - 1}")(x)
            if i < n - 1:
                x = nn.relu(x)
        return x


class AttentionalPropagation(nn.Module):
    """message = MHA(x, source); x + MLP([x ; message]) (associator.py:91-101)."""

    d_model: int
    num_heads: int
    dtype: Any = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: Array, source: Array,
                 key_padding_mask: Array | None = None) -> Array:
        dense = lambda name: nn.Dense(self.d_model, dtype=self.dtype, name=name)  # noqa: E731
        q = dense("q_proj")(x)
        k = dense("k_proj")(source)
        v = dense("v_proj")(source)
        msg = mha_core(q, k, v, self.num_heads, key_padding_mask,
                       use_pallas=self.use_pallas)
        msg = dense("merge")(msg)
        return ChannelMLP(
            (2 * self.d_model, 2 * self.d_model, self.d_model),
            dtype=self.dtype, name="mlp",
        )(jnp.concatenate([x, msg], axis=-1))


class AssociatorOutput(NamedTuple):
    log_assignment: Array   # [B, T+1, N+1]
    scores: Array           # [B, T, N] raw pre-Sinkhorn scores
    matches: Array          # [B, N] track id per detection, -1 unmatched


class Associator(nn.Module):
    config: AssociatorConfig = field(default_factory=AssociatorConfig)

    @nn.compact
    def __call__(self, tracks: Array, track_mask: Array, detections: Array,
                 det_mask: Array, match_threshold: Array | float = 0.1) -> AssociatorOutput:
        """
        Args:
            tracks: [B, T, W, 79] track histories (padded slots/timesteps = -1).
            track_mask: [B, T] bool validity of track slots.
            detections: [B, N, 79] this frame's detections (padded rows = -1).
            det_mask: [B, N] bool validity of detection slots.
        """
        c = self.config
        B, T, W, _ = tracks.shape
        N = detections.shape[1]
        D = c.descriptor_dim

        track_pe = position.timestep_encoding(tracks[..., 0], D).astype(c.dtype)
        det_pe = position.timestep_encoding(detections[..., 0], D).astype(c.dtype)

        encoder = ChannelMLP(tuple(c.keypoint_encoder), dtype=c.dtype, name="encoder")
        trk = encoder(tracks[..., 1:].astype(c.dtype)) + track_pe     # [B, T, W, D]
        det = encoder(detections[..., 1:].astype(c.dtype)) + det_pe   # [B, N, D]

        # Track-history fusion: self-attention over the time axis per track,
        # then average pooling over the full window (associator.py:135-153,
        # 227-229 — padded timesteps participate, as in the reference).
        fused = trk.reshape(B * T, W, D)
        for i, _ in enumerate(c.self_gnn_layers):
            fused = fused + AttentionalPropagation(
                D, c.num_heads, c.dtype, c.use_pallas, name=f"fuser_layer{i}"
            )(fused, fused)
        fused = jnp.mean(fused, axis=1).reshape(B, T, D)

        # Padded track slots are -1 feature rows in the reference's reshape
        # (associator.py:184-200); mask them out of attention keys instead so
        # the result equals the reference's unpadded run.
        trk_kpm = ~track_mask  # True = exclude key

        t_feat, d_feat = fused, det
        for i, kind in enumerate(c.gnn_layers):
            layer = AttentionalPropagation(D, c.num_heads, c.dtype,
                                           c.use_pallas, name=f"gnn_layer{i}")
            if kind == "cross":
                t_src, t_kpm = d_feat, None
                d_src, d_kpm = t_feat, trk_kpm
            else:
                t_src, t_kpm = t_feat, trk_kpm
                d_src, d_kpm = d_feat, None
            t_new = t_feat + layer(t_feat, t_src, t_kpm)
            d_new = d_feat + layer(d_feat, d_src, d_kpm)
            t_feat, d_feat = t_new, d_new

        proj = nn.Dense(D, dtype=c.dtype, name="final_proj")
        t_feat = proj(t_feat)
        d_feat = proj(d_feat)

        scores = jnp.einsum("btd,bnd->btn", t_feat, d_feat).astype(jnp.float32)
        scores = scores / jnp.sqrt(jnp.asarray(D, jnp.float32))

        bin_score = self.param("bin_score", nn.initializers.ones, ())
        Z = sinkhorn.log_optimal_transport(
            scores, bin_score.astype(jnp.float32), iters=c.sinkhorn_iterations,
            row_mask=track_mask, col_mask=det_mask,
        )

        decode_fn = (
            lap.greedy_peel_match if c.decode == "greedy" else lap.match_by_score
        )
        matches = jax.vmap(
            lambda z, tm, dm: decode_fn(
                jnp.exp(z[:-1, :-1]), match_threshold, tm, dm
            )
        )(Z, track_mask, det_mask)

        return AssociatorOutput(log_assignment=Z, scores=scores, matches=matches)


def association_nll(Z: Array, gt_pairs: Array, pair_valid: Array) -> Array:
    """Negative log-likelihood of ground-truth matches (associator.py:256-258).

    Args:
        Z: [B, T+1, N+1] log assignment.
        gt_pairs: [B, P, 2] (track_or_bin, det_or_bin) index pairs.
        pair_valid: [B, P] bool.
    """
    picked = jax.vmap(lambda z, r, c: z[r, c])(
        Z, gt_pairs[..., 0], gt_pairs[..., 1]
    )  # [B, P]
    return -jnp.sum(picked * pair_valid)
