"""DETR-style 3D-aware per-frame detector (Flax).

Capability parity with the reference detector (src/models/detr.py:18-205):
ResNet-50 frozen-BN backbone, sine positional encoding, 6+6 transformer, and
six prediction heads — class (num_classes + 1), 2D box (cxcywh, sigmoid),
2D center offset, azimuth over 30 bins, 3D dimensions, depth — plus a fully
jitted postprocess: softmax threshold, unprojection of the 3D center from
(box center + offset, depth, K), argmax angle decode, and a static-shape
greedy 3D NMS.  Everything is fixed-shape: postprocess returns MAX_DETS
slots with a validity mask instead of ragged Python lists.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any, NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..utils import boxes as box_ops
from . import position, resnet
from .transformer import Transformer

Array = jax.Array

MAX_DETECTIONS = 30  # pipeline cap (processor.py:318-319)


@dataclass(frozen=True)
class DETRConfig:
    num_classes: int = 18          # scan_net (detr.py:531-532)
    num_queries: int = 100
    hidden_dim: int = 256
    nheads: int = 8
    enc_layers: int = 6
    dec_layers: int = 6
    dim_feedforward: int = 2048
    dropout: float = 0.1
    pre_norm: bool = False
    aux_loss: bool = True
    num_angle_bins: int = 30
    backbone: str = "resnet50"
    backbone_stage: int = 4        # feature stage fed to the transformer;
    # 4 = reference semantics (layer4, stride 32 — backbone.py:59-81).
    # Lower stages give finer grids + more local receptive fields (the
    # DC5-style resolution axis), used by the small-image rehearsal configs.
    dilation: bool = False
    position_embedding: str = "sine"
    dtype: Any = jnp.float32
    use_pallas: bool = False
    stem: str = "conv"  # "s2d" = space-to-depth stem (same math/params)

    @classmethod
    def from_cfg(cls, cfg: dict, dtype: Any = jnp.float32,
                 use_pallas: bool = False) -> "DETRConfig":
        """Build from the reference YAML schema (configs/detr_scan_net.yaml)."""
        return cls(
            num_classes=int(cfg.get(
                "num_classes",
                18 if cfg.get("dataset_file", "scan_net") == "scan_net" else 20,
            )),
            num_queries=int(cfg.get("num_queries", 100)),
            hidden_dim=int(cfg.get("hidden_dim", 256)),
            nheads=int(cfg.get("nheads", 8)),
            enc_layers=int(cfg.get("enc_layers", 6)),
            dec_layers=int(cfg.get("dec_layers", 6)),
            dim_feedforward=int(cfg.get("dim_feedforward", 2048)),
            dropout=float(cfg.get("dropout", 0.1)),
            pre_norm=bool(cfg.get("pre_norm", False)),
            aux_loss=bool(cfg.get("aux_loss", True)),
            dilation=bool(cfg.get("dilation", False)),
            position_embedding=cfg.get("position_embedding", "sine"),
            backbone=cfg.get("backbone", "resnet50"),
            backbone_stage=int(cfg.get("backbone_stage", 4)),
            stem=cfg.get("stem", "conv"),
            dtype=dtype,
            use_pallas=use_pallas,
        )


class HeadMLP(nn.Module):
    """3-layer ReLU MLP prediction head (reference detr.py:515-527)."""

    hidden_dim: int
    out_dim: int
    num_layers: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for i in range(self.num_layers - 1):
            x = nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype, name=f"layer{i}")(x))
        return nn.Dense(self.out_dim, dtype=self.dtype, name=f"layer{self.num_layers - 1}")(x)


class DETR(nn.Module):
    config: DETRConfig = field(default_factory=DETRConfig)

    @nn.compact
    def __call__(self, images: Array, pixel_mask: Array | None = None,
                 deterministic: bool = True) -> dict:
        """
        Args:
            images: [B, H, W, 3] normalized images (NHWC).
            pixel_mask: [B, H, W] bool, True = padded pixel.

        Returns:
            dict with pred_logits [B, Q, C+1], pred_boxes [B, Q, 4] (cxcywh,
            sigmoid), pred_angle [B, Q, bins], pred_offset [B, Q, 2],
            pred_size [B, Q, 3], pred_depth [B, Q, 1], pred_obj_features
            [B, Q, D], and aux_outputs (list per decoder layer) if aux_loss.
        """
        c = self.config
        B, H, W, _ = images.shape
        if pixel_mask is None:
            pixel_mask = jnp.zeros((B, H, W), bool)

        if c.backbone == "tiny":
            # lightweight trainable backbone (resnet.TinyBackbone) — same
            # {stage: feature} contract and strides as the ResNet path
            feats = resnet.TinyBackbone(
                return_stages=(c.backbone_stage,), dtype=c.dtype,
                name="backbone",
            )(images)[c.backbone_stage]
        else:
            feats = resnet.ResNet(
                stage_sizes=resnet.RESNET50_STAGES,
                return_stages=(c.backbone_stage,),
                dilate_last=c.dilation, dtype=c.dtype, stem=c.stem,
                name="backbone",
            )(images)[c.backbone_stage]
        fh, fw = feats.shape[1], feats.shape[2]
        feat_mask = jax.image.resize(
            pixel_mask.astype(jnp.float32), (B, fh, fw), method="nearest"
        ).astype(bool)

        pos = position.sine_position_encoding(
            feat_mask, num_pos_feats=c.hidden_dim // 2, dtype=c.dtype
        )
        src = nn.Conv(c.hidden_dim, (1, 1), dtype=c.dtype, name="input_proj")(feats)

        query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0), (c.num_queries, c.hidden_dim)
        )
        hs, _ = Transformer(
            d_model=c.hidden_dim, num_heads=c.nheads,
            num_encoder_layers=c.enc_layers, num_decoder_layers=c.dec_layers,
            dim_feedforward=c.dim_feedforward, dropout=c.dropout,
            normalize_before=c.pre_norm, dtype=c.dtype, use_pallas=c.use_pallas,
            name="transformer",
        )(src, feat_mask, query_embed, pos, deterministic)

        class_head = nn.Dense(c.num_classes + 1, dtype=c.dtype, name="class_embed")
        bbox_head = HeadMLP(c.hidden_dim, 4, dtype=c.dtype, name="bbox_embed")
        offset_head = HeadMLP(c.hidden_dim, 2, dtype=c.dtype, name="offset_embed")
        angle_head = HeadMLP(c.hidden_dim, c.num_angle_bins, dtype=c.dtype, name="angle_embed")
        size_head = HeadMLP(c.hidden_dim, 3, dtype=c.dtype, name="size_embed")
        depth_head = HeadMLP(c.hidden_dim, 1, dtype=c.dtype, name="depth_embed")

        logits = class_head(hs)
        boxes = jax.nn.sigmoid(bbox_head(hs))
        angle = angle_head(hs)
        offset = offset_head(hs)
        size = size_head(hs)
        depth = depth_head(hs)

        out = {
            "pred_logits": logits[-1],
            "pred_boxes": boxes[-1],
            "pred_angle": angle[-1],
            "pred_offset": offset[-1],
            "pred_size": size[-1],
            "pred_depth": depth[-1],
            "pred_obj_features": hs[-1],
        }
        if c.aux_loss:
            out["aux_outputs"] = [
                {
                    "pred_logits": logits[i],
                    "pred_boxes": boxes[i],
                    "pred_angle": angle[i],
                    "pred_offset": offset[i],
                    "pred_size": size[i],
                    "pred_depth": depth[i],
                }
                for i in range(hs.shape[0] - 1)
            ]
        return out


class Detections(NamedTuple):
    """Fixed-shape postprocess output ([N] = MAX_DETECTIONS slots per image)."""

    valid: Array       # [B, N] bool
    classes: Array     # [B, N] int32
    scores: Array      # [B, N]
    boxes: Array       # [B, N, 4] xyxy pixels
    dims: Array        # [B, N, 3]
    t_co: Array        # [B, N, 3] camera-frame center
    angle_deg: Array   # [B, N] azimuth in degrees
    features: Array    # [B, N, D] query features


def _suppression_pairs(classes: Array, t_co: Array, dims: Array,
                       boxes_2d: Array, iou3d_threshold: float,
                       iou2d_threshold: float, use_2d: bool) -> Array:
    """[Q, Q] bool: i and j mutually conflict under the reference NMS rules."""
    Q = classes.shape[0]
    half = dims / 2.0
    aabb = jnp.stack([t_co - half, t_co + half], axis=-2)  # [Q, 2, 3]
    iou3 = box_ops.iou_aabb(aabb[:, None], aabb[None, :])  # [Q, Q]
    same_class = classes[:, None] == classes[None, :]
    sup_pair = same_class & (iou3 > iou3d_threshold)
    if use_2d:
        iou2, _ = box_ops.pairwise_box_iou(boxes_2d, boxes_2d)
        sup_pair = sup_pair | (iou2 > iou2d_threshold)
    return sup_pair & ~jnp.eye(Q, dtype=bool)


def nms_3d_mask(classes: Array, scores: Array, t_co: Array, dims: Array,
                boxes_2d: Array, valid: Array, iou3d_threshold: float = 0.25,
                iou2d_threshold: float = 0.5, use_2d: bool = True) -> Array:
    """Greedy 3D NMS over one image's candidates -> keep mask [Q].

    Reference semantics (detr.py:161-205): process by descending score;
    suppress later candidates of the same class with axis-aligned 3D IoU >
    0.25, or (any class) 2D IoU > 0.5.  One deliberate divergence: on EXACT
    score ties the reference's ``np.argsort(scores)[::-1]`` ranks the
    higher index first, while both of this module's formulations rank the
    lower index first (a stable, contiguous-memory order).  Exact float
    ties between distinct softmax outputs do not occur in practice; the two
    in-repo paths (fixpoint + sequential oracle) use the same rule so they
    bit-match each other.

    Computed as a fixed point instead of the Q-step sequential sweep: greedy
    NMS is the unique solution of ``keep_i = valid_i and no higher-ranked
    kept j conflicts with i`` (unique by induction on rank), so iterating
    ``keep <- valid & ~(S @ keep)`` — one [Q, Q] masked matvec per round —
    converges to exactly the greedy mask in (suppression-chain depth + 1)
    rounds, typically 2-4 instead of Q = 100.  The while_loop's
    data-dependent trip count is fine inside jit (same pattern as the exact
    Hungarian in ops/lap.py).
    """
    Q = classes.shape[0]
    sup_pair = _suppression_pairs(classes, t_co, dims, boxes_2d,
                                  iou3d_threshold, iou2d_threshold, use_2d)
    # j outranks i: higher score, ties broken by lower index (the stable
    # argsort order the sequential sweep used).
    idx = jnp.arange(Q)
    outranks = (scores[None, :] > scores[:, None]) | (
        (scores[None, :] == scores[:, None]) & (idx[None, :] < idx[:, None]))
    S = (sup_pair & outranks & valid[None, :]).astype(jnp.float32)

    def cond(state):
        keep, prev, it = state
        return jnp.any(keep != prev) & (it < Q + 1)

    def body(state):
        keep, _, it = state
        suppressed = (S @ keep.astype(jnp.float32)) > 0
        return valid & ~suppressed, keep, it + 1

    keep, _, _ = jax.lax.while_loop(cond, body, (valid, ~valid, 0))
    return keep


def _nms_3d_mask_sequential(classes: Array, scores: Array, t_co: Array,
                            dims: Array, boxes_2d: Array, valid: Array,
                            iou3d_threshold: float = 0.25,
                            iou2d_threshold: float = 0.5,
                            use_2d: bool = True) -> Array:
    """The literal Q-step greedy sweep (equivalence oracle for tests)."""
    Q = classes.shape[0]
    sup_pair = _suppression_pairs(classes, t_co, dims, boxes_2d,
                                  iou3d_threshold, iou2d_threshold, use_2d)
    order = jnp.argsort(jnp.where(valid, -scores, jnp.inf))

    def body(k, state):
        keep, suppressed = state
        i = order[k]
        active = valid[i] & ~suppressed[i]
        keep = keep.at[i].set(active)
        suppressed = suppressed | (active & sup_pair[i])
        return keep, suppressed

    keep, _ = jax.lax.fori_loop(
        0, Q, body, (jnp.zeros(Q, bool), jnp.zeros(Q, bool)), unroll=8
    )
    return keep


@partial(jax.jit, static_argnames=("max_dets", "use_nms_2d"))
def postprocess(outputs: dict, img_w: Array, img_h: Array, threshold: Array,
                K: Array, max_dets: int = MAX_DETECTIONS,
                use_nms_2d: bool = True) -> Detections:
    """Decode raw DETR outputs into fixed-shape detections.

    Reference behavior: detr.py:96-159 — softmax-threshold keep, cxcywh ->
    xyxy pixel rescale, 3D center = unproject(box center + offset) * depth,
    angle-bin argmax * (180 / bins) degrees, greedy NMS, then the pipeline's
    top-``max_dets`` cap (processor.py:318-319).
    """
    logits = outputs["pred_logits"].astype(jnp.float32)
    B, Q, _ = logits.shape
    probs = jax.nn.softmax(logits, axis=-1)[..., :-1]
    scores = jnp.max(probs, axis=-1)
    classes = jnp.argmax(probs, axis=-1).astype(jnp.int32)
    keep = scores > threshold

    boxes = box_ops.cxcywh_to_xyxy(outputs["pred_boxes"].astype(jnp.float32))
    scale = jnp.stack([img_w, img_h, img_w, img_h]).astype(jnp.float32)
    boxes = boxes * scale

    offset = outputs["pred_offset"].astype(jnp.float32) * jnp.stack([img_w, img_h])
    box_center = (boxes[..., :2] + boxes[..., 2:]) / 2.0
    shape_center = offset + box_center
    f = jnp.stack([K[0, 0], K[1, 1]])
    cxy = jnp.stack([K[0, 2], K[1, 2]])
    depth = outputs["pred_depth"].astype(jnp.float32)
    center_xy = (shape_center - cxy) / f * depth
    t_co = jnp.concatenate([center_xy, depth], axis=-1)

    n_bins = outputs["pred_angle"].shape[-1]
    angle_deg = (
        jnp.argmax(outputs["pred_angle"].astype(jnp.float32), axis=-1)
        * (180.0 / n_bins)
    ).astype(jnp.float32)
    dims = outputs["pred_size"].astype(jnp.float32)

    keep = jax.vmap(
        lambda c, s, t, d, b2, v: nms_3d_mask(c, s, t, d, b2, v, use_2d=use_nms_2d)
    )(classes, scores, t_co, dims, boxes, keep)

    # Top-max_dets by score among the kept, static shape.  Models with fewer
    # queries than max_dets still emit exactly max_dets slots (extra slots
    # invalid) so downstream fixed-shape consumers (track store, frame log)
    # always see the contracted width.
    sort_key = jnp.where(keep, -scores, jnp.inf)
    order = jnp.argsort(sort_key, axis=-1)[:, :max_dets]  # [B, min(Q, N)]
    valid = jnp.take_along_axis(keep, order, axis=1)
    if order.shape[1] < max_dets:
        pad = max_dets - order.shape[1]
        order = jnp.pad(order, ((0, 0), (0, pad)))
        valid = jnp.pad(valid, ((0, 0), (0, pad)))
    take = lambda x: jnp.take_along_axis(  # noqa: E731
        x, order.reshape(order.shape + (1,) * (x.ndim - 2)), axis=1
    )
    return Detections(
        valid=valid,
        classes=jnp.take_along_axis(classes, order, axis=1),
        scores=jnp.take_along_axis(scores, order, axis=1),
        boxes=take(boxes),
        dims=take(dims),
        t_co=take(t_co),
        angle_deg=jnp.take_along_axis(angle_deg, order, axis=1),
        features=take(outputs["pred_obj_features"].astype(jnp.float32)),
    )
