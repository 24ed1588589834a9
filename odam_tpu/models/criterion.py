"""DETR set-prediction training losses.

Capability parity with the reference SetCriterion (src/models/detr.py:
258-481): cross-entropy with 0.1 no-object weight, cardinality error, box
L1 + GIoU, size/depth/offset L1, 30-bin angle CE, per-decoder-layer auxiliary
losses, all normalized by the global target-box count.  Written as pure
functions over padded targets so the whole loss jits and shards; the global
``num_boxes`` normalizer emerges naturally from computing over the global
(sharded) batch instead of the reference's explicit NCCL all_reduce
(detr.py:456-458).

Padded target layout:
    classes [B, M] int | boxes [B, M, 4] cxcywh | sizes [B, M, 3] |
    offsets [B, M, 2] | depths [B, M] | angle_bins [B, M] int | mask [B, M].
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils import boxes as box_ops
from . import matcher as matcher_mod

Array = jax.Array


class Targets(NamedTuple):
    classes: Array
    boxes: Array
    sizes: Array
    offsets: Array
    depths: Array
    angle_bins: Array
    mask: Array


@dataclass(frozen=True)
class CriterionConfig:
    num_classes: int = 18
    eos_coef: float = 0.1
    matcher: matcher_mod.MatcherConfig = field(default_factory=matcher_mod.MatcherConfig)
    # loss weights (detr.py:550-562)
    weight_ce: float = 1.0
    weight_bbox: float = 5.0
    weight_giou: float = 2.0
    weight_angle: float = 1.0
    weight_offset: float = 3.0
    weight_size: float = 1.0
    weight_depth: float = 1.0
    weight_mask: float = 1.0   # mask_loss_coef (configs/detr_scan_net.yaml:17)
    weight_dice: float = 1.0   # dice_loss_coef (configs/detr_scan_net.yaml:18)
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0


def _gather_targets(t: Array, tgt4query: Array) -> Array:
    """Gather per-query matched target values; index -1 -> garbage (masked later)."""
    idx = jnp.clip(tgt4query, 0, t.shape[0] - 1)
    return t[idx]


def layer_losses(outputs: dict, targets: Targets, tgt4query: Array,
                 num_boxes: Array, cfg: CriterionConfig) -> dict[str, Array]:
    """All losses for one prediction set (one decoder layer)."""
    B, Q, _ = outputs["pred_logits"].shape
    matched = tgt4query >= 0  # [B, Q]

    # --- classification CE with eos weighting (detr.py:286-305)
    tgt_cls = jax.vmap(_gather_targets)(targets.classes, tgt4query)
    tgt_cls = jnp.where(matched, tgt_cls, cfg.num_classes)
    logp = jax.nn.log_softmax(outputs["pred_logits"], axis=-1)
    nll = -jnp.take_along_axis(logp, tgt_cls[..., None], axis=-1)[..., 0]
    w = jnp.where(matched, 1.0, cfg.eos_coef)
    loss_ce = jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)

    # --- cardinality error, logging only (detr.py:307-320)
    probs = jax.nn.softmax(outputs["pred_logits"], axis=-1)[..., :-1]
    card_pred = jnp.sum((jnp.max(probs, -1) > 0.7).astype(jnp.float32), axis=1)
    n_tgt = jnp.sum(targets.mask.astype(jnp.float32), axis=1)
    cardinality = jax.lax.stop_gradient(jnp.mean(jnp.abs(card_pred - n_tgt)))

    m = matched.astype(jnp.float32)

    def matched_l1(pred, tgt_field):
        tgt = jax.vmap(_gather_targets)(tgt_field, tgt4query)
        l1 = jnp.sum(jnp.abs(pred - tgt), axis=-1) if pred.ndim == 3 else jnp.abs(pred - tgt)
        return jnp.sum(l1 * m) / num_boxes

    loss_bbox = matched_l1(outputs["pred_boxes"], targets.boxes)

    tgt_boxes = jax.vmap(_gather_targets)(targets.boxes, tgt4query)
    giou = jax.vmap(
        lambda p, t: jnp.diagonal(
            box_ops.pairwise_generalized_box_iou(
                box_ops.cxcywh_to_xyxy(p), box_ops.cxcywh_to_xyxy(t)
            )
        )
    )(outputs["pred_boxes"], tgt_boxes)
    loss_giou = jnp.sum((1.0 - giou) * m) / num_boxes

    loss_size = matched_l1(outputs["pred_size"], targets.sizes)
    loss_offset = matched_l1(outputs["pred_offset"], targets.offsets)
    loss_depth = matched_l1(outputs["pred_depth"][..., 0], targets.depths)

    tgt_angle = jax.vmap(_gather_targets)(targets.angle_bins, tgt4query)
    logp_a = jax.nn.log_softmax(outputs["pred_angle"], axis=-1)
    nll_a = -jnp.take_along_axis(
        logp_a, jnp.clip(tgt_angle, 0, logp_a.shape[-1] - 1)[..., None], axis=-1
    )[..., 0]
    loss_angle = jnp.sum(nll_a * m) / num_boxes

    return {
        "loss_ce": loss_ce,
        "loss_bbox": loss_bbox,
        "loss_giou": loss_giou,
        "loss_size": loss_size,
        "loss_offset": loss_offset,
        "loss_depth": loss_depth,
        "loss_angle": loss_angle,
        "cardinality_error": cardinality,
    }


def sigmoid_focal_loss(logits: Array, targets: Array, valid: Array,
                       num_boxes: Array, alpha: float = 0.25,
                       gamma: float = 2.0) -> Array:
    """Per-pixel focal loss, averaged per mask then normalized by num_boxes.

    The reference's loss_masks (src/models/detr.py:386-413) calls a
    ``sigmoid_focal_loss`` it never defines (dead code that would NameError);
    semantics here follow the DETR lineage it copy-pastes from.

    Args:
        logits: [K, P] predicted mask logits (flattened pixels).
        targets: [K, P] binary target masks.
        valid: [K] bool, padded/unmatched rows excluded.
    """
    prob = jax.nn.sigmoid(logits)
    ce = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    p_t = prob * targets + (1.0 - prob) * (1.0 - targets)
    loss = ce * (1.0 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * targets + (1.0 - alpha) * (1.0 - targets)
        loss = alpha_t * loss
    per_mask = jnp.mean(loss, axis=-1)
    return jnp.sum(per_mask * valid.astype(loss.dtype)) / num_boxes


def dice_loss(logits: Array, targets: Array, valid: Array,
              num_boxes: Array) -> Array:
    """Soft-dice loss over flattened masks (DETR-lineage semantics; the
    reference cites but never defines it, src/models/detr.py:410-411)."""
    inputs = jax.nn.sigmoid(logits)
    numerator = 2.0 * jnp.sum(inputs * targets, axis=-1)
    denominator = jnp.sum(inputs, axis=-1) + jnp.sum(targets, axis=-1)
    per_mask = 1.0 - (numerator + 1.0) / (denominator + 1.0)
    return jnp.sum(per_mask * valid.astype(per_mask.dtype)) / num_boxes


def loss_masks(pred_masks: Array, target_masks: Array, tgt4query: Array,
               num_boxes: Array, cfg: CriterionConfig = CriterionConfig()) -> dict:
    """Focal + dice mask losses over matched (query, target) pairs.

    Mirrors reference loss_masks (src/models/detr.py:386-413): gather matched
    predictions, bilinearly upsample to the target resolution, flatten, and
    normalize by the global box count.  Static-shape: every query slot is
    computed and unmatched slots are masked out of the sums.

    Args:
        pred_masks: [B, Q, h, w] predicted mask logits.
        target_masks: [B, M, H, W] binary target masks (padded slots zero).
        tgt4query: [B, Q] matched target index per query, -1 if unmatched.
    """
    B, Q, h, w = pred_masks.shape
    H, W = target_masks.shape[-2:]
    up = jax.image.resize(pred_masks, (B, Q, H, W), method="bilinear")
    tgt = jax.vmap(_gather_targets)(target_masks, tgt4query)  # [B, Q, H, W]
    valid = (tgt4query >= 0).reshape(B * Q)
    logits = up.reshape(B * Q, H * W).astype(jnp.float32)
    targets = tgt.reshape(B * Q, H * W).astype(jnp.float32)
    return {
        "loss_mask": sigmoid_focal_loss(logits, targets, valid, num_boxes,
                                        cfg.focal_alpha, cfg.focal_gamma),
        "loss_dice": dice_loss(logits, targets, valid, num_boxes),
    }


def weighted_total(losses: dict[str, Array], cfg: CriterionConfig) -> Array:
    return (
        cfg.weight_ce * losses["loss_ce"]
        + cfg.weight_bbox * losses["loss_bbox"]
        + cfg.weight_giou * losses["loss_giou"]
        + cfg.weight_size * losses["loss_size"]
        + cfg.weight_offset * losses["loss_offset"]
        + cfg.weight_depth * losses["loss_depth"]
        + cfg.weight_angle * losses["loss_angle"]
    )


def set_criterion(outputs: dict, targets: Targets,
                  cfg: CriterionConfig = CriterionConfig(),
                  target_masks: Array | None = None) -> tuple[Array, dict]:
    """Total weighted loss incl. aux layers -> (scalar, metrics dict).

    The normalizer is the target count over the *global* batch (clamped at
    1), equal to the reference's distributed num_boxes averaging when the
    batch axis is sharded (detr.py:453-458).

    When ``target_masks`` [B, M, H, W] is given and the model emits
    ``pred_masks``, focal + dice mask losses are added for the final layer
    only — the reference skips intermediate mask losses as too costly
    (detr.py:472-474).
    """
    num_boxes = jnp.maximum(jnp.sum(targets.mask.astype(jnp.float32)), 1.0)

    def match(out):
        return matcher_mod.hungarian_match(
            out["pred_logits"], out["pred_boxes"], targets.classes,
            targets.boxes, targets.mask, cfg.matcher,
        )

    def match_and_lose(out):
        return layer_losses(out, targets, match(out), num_boxes, cfg)

    tgt4query = match(outputs)
    losses = layer_losses(outputs, targets, tgt4query, num_boxes, cfg)
    total = weighted_total(losses, cfg)
    metrics = dict(losses)
    if target_masks is not None and "pred_masks" in outputs:
        mlosses = loss_masks(outputs["pred_masks"], target_masks, tgt4query,
                             num_boxes, cfg)
        total = (total + cfg.weight_mask * mlosses["loss_mask"]
                 + cfg.weight_dice * mlosses["loss_dice"])
        metrics.update(mlosses)
    for i, aux in enumerate(outputs.get("aux_outputs", [])):
        aux_losses = match_and_lose(aux)
        total = total + weighted_total(aux_losses, cfg)
        metrics.update({f"{k}_{i}": v for k, v in aux_losses.items() if k != "cardinality_error"})
    metrics["total"] = total
    return total, metrics
