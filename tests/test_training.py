import jax
import jax.numpy as jnp
import numpy as np

from odam_tpu.models import criterion as crit_mod
from odam_tpu.models import detr as detr_mod
from odam_tpu.models import matcher as matcher_mod
from odam_tpu.models import training as train_mod
from odam_tpu.parallel import mesh as mesh_mod


def _targets(B, M, num_classes, rng, n_valid=None):
    n_valid = M if n_valid is None else n_valid
    mask = np.zeros((B, M), bool)
    mask[:, :n_valid] = True
    return crit_mod.Targets(
        classes=jnp.asarray(rng.integers(0, num_classes, (B, M)), jnp.int32),
        boxes=jnp.asarray(rng.uniform(0.2, 0.6, (B, M, 4)).astype(np.float32)),
        sizes=jnp.asarray(rng.uniform(0.5, 2.0, (B, M, 3)).astype(np.float32)),
        offsets=jnp.zeros((B, M, 2), jnp.float32),
        depths=jnp.ones((B, M), jnp.float32),
        angle_bins=jnp.asarray(rng.integers(0, 30, (B, M)), jnp.int32),
        mask=jnp.asarray(mask),
    )


def test_matcher_matches_all_valid_targets():
    rng = np.random.default_rng(0)
    B, Q, M, C = 2, 10, 4, 6
    logits = jnp.asarray(rng.normal(size=(B, Q, C + 1)).astype(np.float32))
    boxes = jnp.asarray(rng.uniform(0.2, 0.6, (B, Q, 4)).astype(np.float32))
    t = _targets(B, M, C, rng, n_valid=3)
    tgt4query = np.asarray(
        matcher_mod.hungarian_match(logits, boxes, t.classes, t.boxes, t.mask)
    )
    for b in range(B):
        matched = tgt4query[b][tgt4query[b] >= 0]
        assert sorted(matched.tolist()) == [0, 1, 2]  # each valid target once


def test_matcher_prefers_box_overlap():
    """A query with the exact target box must win the assignment."""
    B, Q, M, C = 1, 4, 1, 3
    logits = jnp.zeros((B, Q, C + 1))
    boxes = jnp.asarray(
        np.array([[[0.1, 0.1, 0.05, 0.05], [0.5, 0.5, 0.2, 0.2],
                   [0.9, 0.9, 0.05, 0.05], [0.3, 0.7, 0.1, 0.1]]], np.float32)
    )
    t = crit_mod.Targets(
        classes=jnp.zeros((B, M), jnp.int32),
        boxes=jnp.asarray(np.array([[[0.5, 0.5, 0.2, 0.2]]], np.float32)),
        sizes=jnp.ones((B, M, 3)), offsets=jnp.zeros((B, M, 2)),
        depths=jnp.ones((B, M)), angle_bins=jnp.zeros((B, M), jnp.int32),
        mask=jnp.ones((B, M), bool),
    )
    tgt4query = np.asarray(
        matcher_mod.hungarian_match(logits, boxes, t.classes, t.boxes, t.mask)
    )
    assert tgt4query[0, 1] == 0
    assert (tgt4query[0, [0, 2, 3]] == -1).all()


def test_criterion_finite_and_perfect_prediction_low():
    rng = np.random.default_rng(1)
    B, Q, M, C = 1, 6, 3, 5
    t = _targets(B, M, C, rng)

    def outputs_from(boxes, classes, noise):
        logits = np.full((B, Q, C + 1), -5.0, np.float32)
        logits[..., -1] = 5.0  # default: no-object
        out_boxes = np.full((B, Q, 4), 0.5, np.float32)
        for j in range(M):
            logits[0, j, :] = -5.0
            logits[0, j, int(classes[0, j])] = 5.0
            out_boxes[0, j] = np.asarray(boxes[0, j]) + noise
        return {
            "pred_logits": jnp.asarray(logits),
            "pred_boxes": jnp.asarray(out_boxes),
            "pred_angle": jnp.zeros((B, Q, 30)),
            "pred_offset": jnp.zeros((B, Q, 2)),
            "pred_size": jnp.ones((B, Q, 3)),
            "pred_depth": jnp.ones((B, Q, 1)),
        }

    good = outputs_from(np.asarray(t.boxes), np.asarray(t.classes), 0.0)
    bad = outputs_from(np.asarray(t.boxes), np.asarray(t.classes), 0.2)
    cfg = crit_mod.CriterionConfig(num_classes=C)
    loss_good, m_good = crit_mod.set_criterion(good, t, cfg)
    loss_bad, m_bad = crit_mod.set_criterion(bad, t, cfg)
    assert np.isfinite(float(loss_good)) and np.isfinite(float(loss_bad))
    assert float(loss_good) < float(loss_bad)
    assert float(m_good["loss_bbox"]) < 1e-5


def test_detr_train_step_reduces_loss():
    cfg = detr_mod.DETRConfig(
        num_classes=4, num_queries=6, hidden_dim=32, nheads=4,
        enc_layers=1, dec_layers=1, dim_feedforward=32, aux_loss=False,
    )
    model = detr_mod.DETR(cfg)
    rng = np.random.default_rng(2)
    B, M = 2, 2
    images = jnp.asarray(rng.normal(size=(B, 64, 64, 3)).astype(np.float32))
    params = model.init(jax.random.key(0), images)
    tcfg = train_mod.DetrTrainConfig(
        lr=1e-3, criterion=crit_mod.CriterionConfig(num_classes=cfg.num_classes)
    )
    tx = train_mod.make_detr_optimizer(params, tcfg)
    state = train_mod.init_train_state(params, tx)
    step = train_mod.make_detr_train_step(model, tx, tcfg)
    targets = _targets(B, M, cfg.num_classes, rng)
    losses = []
    for i in range(8):
        state, metrics = step(state, images, targets, jax.random.key(i))
        losses.append(float(metrics["total"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8


def test_backbone_frozen_params_do_not_move():
    cfg = detr_mod.DETRConfig(
        num_classes=4, num_queries=6, hidden_dim=32, nheads=4,
        enc_layers=1, dec_layers=1, dim_feedforward=32, aux_loss=False,
    )
    model = detr_mod.DETR(cfg)
    rng = np.random.default_rng(3)
    images = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    params = model.init(jax.random.key(0), images)
    tcfg = train_mod.DetrTrainConfig(lr=1e-2,
                                     criterion=crit_mod.CriterionConfig(num_classes=4))
    tx = train_mod.make_detr_optimizer(params, tcfg)
    state = train_mod.init_train_state(params, tx)
    step = train_mod.make_detr_train_step(model, tx, tcfg)
    targets = _targets(1, 2, 4, rng)
    new_state, _ = step(state, images, targets, jax.random.key(0))
    p0 = params["params"]["backbone"]
    p1 = new_state.params["params"]["backbone"]
    # conv1 (outside layer2-4) frozen
    np.testing.assert_array_equal(
        np.asarray(p0["conv1"]["kernel"]), np.asarray(p1["conv1"]["kernel"])
    )
    # frozen BN buffers inside layer3 frozen too
    np.testing.assert_array_equal(
        np.asarray(p0["layer3_0"]["bn1"]["weight"]),
        np.asarray(p1["layer3_0"]["bn1"]["weight"]),
    )
    # layer3 conv weights DO move
    assert not np.array_equal(
        np.asarray(p0["layer3_0"]["conv1"]["kernel"]),
        np.asarray(p1["layer3_0"]["conv1"]["kernel"]),
    )


def test_dryrun_multichip_8_devices():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    assert len(jax.devices()) >= 8
    ge.dryrun_multichip(8)


def test_mesh_helpers():
    mesh = mesh_mod.make_mesh({"dp": 4, "mp": 2})
    assert mesh.shape == {"dp": 4, "mp": 2}
    x = np.ones((5, 3), np.float32)
    padded = mesh_mod.pad_to_multiple(x, 4)
    assert padded.shape == (8, 3)


def test_mask_losses_match_detr_lineage_formulas():
    """Focal + dice mask losses (criterion.loss_masks) vs an independent
    torch implementation of the standard DETR formulas.  The reference's
    loss_masks (src/models/detr.py:386-413) calls sigmoid_focal_loss /
    dice_loss it never defines, so the DETR lineage is the ground truth."""
    import numpy as np
    import torch
    import torch.nn.functional as tF

    from odam_tpu.models import criterion

    rng = np.random.default_rng(3)
    B, Q, M, h, w, H, W = 2, 5, 3, 4, 4, 8, 8
    pred = rng.normal(size=(B, Q, h, w)).astype(np.float32)
    tgt = (rng.random(size=(B, M, H, W)) > 0.5).astype(np.float32)
    tgt4query = np.full((B, Q), -1, np.int32)
    tgt4query[0, 1] = 0
    tgt4query[0, 4] = 2
    tgt4query[1, 0] = 1
    num_boxes = 3.0

    out = criterion.loss_masks(
        jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(tgt4query),
        jnp.asarray(num_boxes),
    )

    # torch ground truth over the matched pairs only
    src_list, tgt_list = [], []
    for b in range(B):
        for q in range(Q):
            if tgt4query[b, q] >= 0:
                up = tF.interpolate(
                    torch.from_numpy(pred[b, q])[None, None], size=(H, W),
                    mode="bilinear", align_corners=False,
                )[0, 0]
                src_list.append(up.flatten())
                tgt_list.append(torch.from_numpy(tgt[b, tgt4query[b, q]]).flatten())
    inputs = torch.stack(src_list)
    targets = torch.stack(tgt_list)

    prob = inputs.sigmoid()
    ce = tF.binary_cross_entropy_with_logits(inputs, targets, reduction="none")
    p_t = prob * targets + (1 - prob) * (1 - targets)
    focal = ce * ((1 - p_t) ** 2)
    alpha_t = 0.25 * targets + 0.75 * (1 - targets)
    ref_focal = float((alpha_t * focal).mean(1).sum() / num_boxes)

    numerator = 2 * (prob * targets).sum(-1)
    denominator = prob.sum(-1) + targets.sum(-1)
    ref_dice = float((1 - (numerator + 1) / (denominator + 1)).sum() / num_boxes)

    np.testing.assert_allclose(float(out["loss_mask"]), ref_focal, rtol=1e-5)
    np.testing.assert_allclose(float(out["loss_dice"]), ref_dice, rtol=1e-5)
