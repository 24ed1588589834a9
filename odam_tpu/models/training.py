"""Training steps for the detector and associator (data-parallel via pjit).

The reference ships criterion/matcher code but no train loop (SURVEY.md §1
"notably absent").  This module supplies the full capability: jitted,
mesh-sharded train steps for both models — batch axes sharded over ``dp``,
parameters replicated, gradient reduction compiled to ICI collectives by XLA
from the global-program formulation (no hand-written psum).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from . import associator as assoc_mod
from . import criterion as crit_mod
from . import detr as detr_mod

Array = jax.Array


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: Array


@dataclass(frozen=True)
class DetrTrainConfig:
    lr: float = 1e-4
    lr_backbone: float = 1e-5
    weight_decay: float = 1e-4
    clip_norm: float = 0.1
    criterion: crit_mod.CriterionConfig = field(
        default_factory=crit_mod.CriterionConfig
    )


def _is_backbone_path(path) -> bool:
    return any(getattr(p, "key", None) == "backbone" for p in path)


def _is_frozen_path(path) -> bool:
    """Frozen-BN buffers and (as in the reference, backbone.py:63-65) all
    backbone params outside layer2-4 stay frozen."""
    keys = [getattr(p, "key", "") for p in path]
    if any(k.startswith("bn") or k.endswith("_bn") or k == "downsample_bn" for k in keys):
        if "backbone" in keys:
            return True
    if "backbone" in keys:
        trainable = any(
            k.startswith(("layer2", "layer3", "layer4")) for k in keys
        )
        return not trainable
    return False


def make_detr_optimizer(params, cfg: DetrTrainConfig) -> optax.GradientTransformation:
    """AdamW with the reference's backbone/frozen param groups
    (lr 1e-4 / backbone 1e-5, detr_scan_net.yaml:1-2)."""
    labels = jax.tree_util.tree_map_with_path(
        lambda path, _: (
            "frozen" if _is_frozen_path(path)
            else ("backbone" if _is_backbone_path(path) else "main")
        ),
        params,
    )
    def group(lr):
        return optax.chain(
            optax.clip_by_global_norm(cfg.clip_norm),
            optax.adamw(lr, weight_decay=cfg.weight_decay),
        )
    return optax.multi_transform(
        {"main": group(cfg.lr), "backbone": group(cfg.lr_backbone),
         "frozen": optax.set_to_zero()},
        labels,
    )


def make_detr_train_step(model: detr_mod.DETR, tx: optax.GradientTransformation,
                         cfg: DetrTrainConfig, mesh: Mesh | None = None):
    """Jitted (optionally mesh-sharded) detector train step.

    When ``mesh`` is given, the image/target batch axes are sharded over
    ``dp`` and parameters are replicated; XLA inserts the gradient
    all-reduce.
    """

    def loss_fn(params, images, targets: crit_mod.Targets, rng):
        outputs = model.apply(params, images, deterministic=False,
                              rngs={"dropout": rng})
        return crit_mod.set_criterion(outputs, targets, cfg.criterion)

    def step(state: TrainState, images, targets: crit_mod.Targets, rng):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, images, targets, rng
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics

    if mesh is None:
        return jax.jit(step)

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("dp"))
    state_sh = TrainState(params=repl, opt_state=repl, step=repl)
    tgt_sh = crit_mod.Targets(*([data] * 7))
    return jax.jit(
        step,
        in_shardings=(state_sh, data, tgt_sh, repl),
        out_shardings=(state_sh, repl),
    )


@dataclass(frozen=True)
class AssocTrainConfig:
    lr: float = 1e-4
    clip_norm: float = 1.0


def make_assoc_train_step(model: assoc_mod.Associator,
                          tx: optax.GradientTransformation,
                          mesh: Mesh | None = None):
    """Associator NLL train step (loss: associator.py:256-258)."""

    def loss_fn(params, tracks, track_mask, dets, det_mask, gt_pairs, pair_valid):
        out = model.apply(params, tracks, track_mask, dets, det_mask)
        n = jnp.maximum(jnp.sum(pair_valid.astype(jnp.float32)), 1.0)
        return assoc_mod.association_nll(out.log_assignment, gt_pairs, pair_valid) / n

    def step(state: TrainState, tracks, track_mask, dets, det_mask, gt_pairs, pair_valid):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, tracks, track_mask, dets, det_mask, gt_pairs, pair_valid
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    if mesh is None:
        return jax.jit(step)

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("dp"))
    state_sh = TrainState(params=repl, opt_state=repl, step=repl)
    return jax.jit(
        step,
        in_shardings=(state_sh,) + (data,) * 6,
        out_shardings=(state_sh, repl),
    )


def init_train_state(params, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(params=params, opt_state=tx.init(params),
                      step=jnp.zeros((), jnp.int32))
