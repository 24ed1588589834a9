import jax
import jax.numpy as jnp
import numpy as np

from odam_tpu.models import associator as assoc_mod
from odam_tpu.models import detr as detr_mod
from odam_tpu.models import position, resnet
from odam_tpu.models.transformer import Transformer


TINY = detr_mod.DETRConfig(
    num_classes=8, num_queries=12, hidden_dim=32, nheads=4,
    enc_layers=2, dec_layers=2, dim_feedforward=64, aux_loss=True,
)


def test_frozen_bn_identity_at_init():
    m = resnet.FrozenBatchNorm(4)
    x = jnp.ones((1, 2, 2, 4)) * 3.0
    params = m.init(jax.random.key(0), x)
    np.testing.assert_allclose(np.asarray(m.apply(params, x)), 3.0, rtol=1e-4)


def test_resnet50_feature_shape():
    m = resnet.resnet50()
    x = jnp.zeros((1, 64, 96, 3))
    params = m.init(jax.random.key(0), x)
    out = m.apply(params, x)
    assert out[4].shape == (1, 2, 3, 2048)
    n_params = sum(p.size for p in jax.tree.leaves(params))
    # torchvision resnet50 has 25.55M params incl. fc; ours drops fc (~2.05M)
    assert 23_000_000 < n_params < 24_000_000, n_params


def test_sine_position_encoding_shape_and_mask():
    mask = jnp.zeros((2, 4, 6), bool).at[:, :, 4:].set(True)
    pos = position.sine_position_encoding(mask, num_pos_feats=16)
    assert pos.shape == (2, 4, 6, 32)
    assert np.isfinite(np.asarray(pos)).all()


def test_timestep_encoding_even_odd():
    pe = np.asarray(position.timestep_encoding(jnp.array([0.0, 1.0]), d_model=8))
    np.testing.assert_allclose(pe[0, 0::2], 0.0, atol=1e-6)  # sin(0)
    np.testing.assert_allclose(pe[0, 1::2], 1.0, atol=1e-6)  # cos(0)


def test_transformer_shapes():
    m = Transformer(d_model=32, num_heads=4, num_encoder_layers=2,
                    num_decoder_layers=3, dim_feedforward=64)
    B, H, W, D, Q = 2, 3, 5, 32, 7
    src = jnp.zeros((B, H, W, D))
    mask = jnp.zeros((B, H, W), bool)
    qe = jnp.zeros((Q, D))
    pos = jnp.zeros((B, H, W, D))
    params = m.init(jax.random.key(0), src, mask, qe, pos)
    hs, mem = m.apply(params, src, mask, qe, pos)
    assert hs.shape == (3, B, Q, D)
    assert mem.shape == (B, H, W, D)


def test_detr_forward_output_shapes():
    model = detr_mod.DETR(TINY)
    x = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)
    Q = TINY.num_queries
    assert out["pred_logits"].shape == (1, Q, TINY.num_classes + 1)
    assert out["pred_boxes"].shape == (1, Q, 4)
    assert out["pred_angle"].shape == (1, Q, 30)
    assert out["pred_offset"].shape == (1, Q, 2)
    assert out["pred_size"].shape == (1, Q, 3)
    assert out["pred_depth"].shape == (1, Q, 1)
    assert len(out["aux_outputs"]) == TINY.dec_layers - 1
    assert (np.asarray(out["pred_boxes"]) >= 0).all()
    assert (np.asarray(out["pred_boxes"]) <= 1).all()


def test_nms_3d_suppression_rules():
    # obj0 high score; obj1 same class, heavy 3D overlap -> suppressed;
    # obj2 other class, same position but distinct 2D box -> kept;
    # obj3 other class but 2D IoU > 0.5 -> suppressed; obj4 invalid.
    classes = jnp.array([1, 1, 2, 3, 1])
    scores = jnp.array([0.9, 0.8, 0.7, 0.6, 0.99])
    t_co = jnp.array([[0, 0, 2.0], [0.05, 0, 2.0], [0, 0, 2.0], [5, 5, 2.0], [0, 0, 2.0]])
    dims = jnp.ones((5, 3))
    boxes = jnp.array(
        [
            [0, 0, 100, 100],
            [200, 200, 300, 300],
            [400, 400, 500, 500],
            [5, 5, 95, 95],     # 2D IoU with obj0 > 0.5
            [0, 0, 10, 10],
        ],
        jnp.float32,
    )
    valid = jnp.array([True, True, True, True, False])
    keep = np.asarray(detr_mod.nms_3d_mask(classes, scores, t_co, dims, boxes, valid))
    assert keep.tolist() == [True, False, True, False, False]


def test_s2d_stem_matches_conv_stem():
    # the space-to-depth and im2col stems are rearrangements, not
    # approximations: identical outputs incl. odd H/W (parity padding)
    from odam_tpu.models import resnet as resnet_mod

    rng = np.random.default_rng(3)
    k = jnp.asarray(rng.normal(size=(7, 7, 3, 16)).astype(np.float32) * 0.1)
    for H, W in [(64, 64), (63, 81), (30, 47)]:
        x = jnp.asarray(rng.normal(size=(2, H, W, 3)).astype(np.float32))
        a = resnet_mod._stem_conv(x, k, jnp.float32)
        b = resnet_mod._stem_conv_s2d(x, k, jnp.float32)
        c = resnet_mod._stem_conv_im2col(x, k, jnp.float32)
        assert a.shape == b.shape == c.shape, (H, W)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-5, atol=1e-5)

    # whole backbone: same params, either stem, same features
    model_a = resnet_mod.ResNet(stage_sizes=(1, 1), return_stages=(2,))
    model_b = resnet_mod.ResNet(stage_sizes=(1, 1), return_stages=(2,),
                                stem="s2d")
    x = jnp.asarray(rng.normal(size=(1, 49, 66, 3)).astype(np.float32))
    params = model_a.init(jax.random.key(0), x)
    fa = model_a.apply(params, x)[2]
    fb = model_b.apply(params, x)[2]
    np.testing.assert_allclose(np.asarray(fa), np.asarray(fb),
                               rtol=1e-4, atol=1e-4)


def test_nms_fixpoint_matches_sequential_sweep():
    # The fixed-point NMS must reproduce the literal greedy sweep bit-exactly
    # on dense random scenes (crowded same-class clusters force multi-level
    # suppression chains, exercising >1 fixpoint round) including score ties.
    rng = np.random.default_rng(7)
    for trial in range(20):
        Q = int(rng.integers(1, 64))
        classes = jnp.asarray(rng.integers(0, 3, Q).astype(np.int32))
        # quantized scores so exact ties occur
        scores = jnp.asarray((rng.integers(0, 8, Q) / 8.0).astype(np.float32))
        t_co = jnp.asarray(rng.uniform(-2, 2, (Q, 3)).astype(np.float32))
        dims = jnp.asarray(rng.uniform(0.5, 3.0, (Q, 3)).astype(np.float32))
        xy = rng.uniform(0, 200, (Q, 2))
        wh = rng.uniform(20, 150, (Q, 2))
        boxes = jnp.asarray(
            np.concatenate([xy, xy + wh], axis=1).astype(np.float32))
        valid = jnp.asarray(rng.uniform(size=Q) > 0.2)
        got = np.asarray(detr_mod.nms_3d_mask(
            classes, scores, t_co, dims, boxes, valid))
        want = np.asarray(detr_mod._nms_3d_mask_sequential(
            classes, scores, t_co, dims, boxes, valid))
        assert got.tolist() == want.tolist(), f"trial {trial}"


def test_postprocess_fixed_shapes():
    B, Q, C = 1, 12, 8
    rng = np.random.default_rng(0)
    outputs = {
        "pred_logits": jnp.asarray(rng.normal(size=(B, Q, C + 1)).astype(np.float32)),
        "pred_boxes": jnp.asarray(rng.uniform(0.3, 0.6, size=(B, Q, 4)).astype(np.float32)),
        "pred_angle": jnp.asarray(rng.normal(size=(B, Q, 30)).astype(np.float32)),
        "pred_offset": jnp.zeros((B, Q, 2)),
        "pred_size": jnp.ones((B, Q, 3)),
        "pred_depth": jnp.full((B, Q, 1), 2.0),
        "pred_obj_features": jnp.zeros((B, Q, 16)),
    }
    K = jnp.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]])
    dets = detr_mod.postprocess(
        outputs, jnp.asarray(640.0), jnp.asarray(480.0), jnp.asarray(0.0), K, max_dets=5
    )
    assert dets.valid.shape == (B, 5)
    assert dets.boxes.shape == (B, 5, 4)
    # with threshold 0 at least one detection survives NMS
    assert bool(dets.valid.any())
    # valid slots sorted by descending score
    s = np.asarray(dets.scores[0])
    v = np.asarray(dets.valid[0])
    s_valid = s[v]
    assert (np.diff(s_valid) <= 1e-6).all()
    # t_co depth equals pred_depth
    np.testing.assert_allclose(np.asarray(dets.t_co[0, v, 2]), 2.0, atol=1e-5)


def test_postprocess_threshold_filters_everything():
    B, Q, C = 1, 6, 4
    outputs = {
        "pred_logits": jnp.zeros((B, Q, C + 1)),
        "pred_boxes": jnp.full((B, Q, 4), 0.5),
        "pred_angle": jnp.zeros((B, Q, 30)),
        "pred_offset": jnp.zeros((B, Q, 2)),
        "pred_size": jnp.ones((B, Q, 3)),
        "pred_depth": jnp.ones((B, Q, 1)),
        "pred_obj_features": jnp.zeros((B, Q, 8)),
    }
    K = jnp.eye(3)
    dets = detr_mod.postprocess(
        outputs, jnp.asarray(100.0), jnp.asarray(100.0), jnp.asarray(0.99), K, max_dets=4
    )
    assert not bool(dets.valid.any())


TINY_ASSOC = assoc_mod.AssociatorConfig(
    descriptor_dim=32, keypoint_encoder=(78, 32, 32),
    gnn_layers=("self", "cross"), self_gnn_layers=("self",),
    sinkhorn_iterations=30,
)


def _assoc_inputs(B=1, T=4, W=8, N=6, t_valid=3, n_valid=4, seed=0):
    rng = np.random.default_rng(seed)
    tracks = np.full((B, T, W, 79), -1.0, np.float32)
    tracks[:, :t_valid, :5] = rng.normal(size=(B, t_valid, 5, 79)).astype(np.float32)
    tracks[:, :t_valid, :5, 0] = np.arange(5)
    dets = np.full((B, N, 79), -1.0, np.float32)
    dets[:, :n_valid] = rng.normal(size=(B, n_valid, 79)).astype(np.float32)
    tm = np.zeros((B, T), bool); tm[:, :t_valid] = True
    dm = np.zeros((B, N), bool); dm[:, :n_valid] = True
    return (jnp.asarray(tracks), jnp.asarray(tm), jnp.asarray(dets), jnp.asarray(dm))


def test_associator_shapes():
    m = assoc_mod.Associator(TINY_ASSOC)
    args = _assoc_inputs()
    params = m.init(jax.random.key(0), *args)
    out = m.apply(params, *args)
    assert out.log_assignment.shape == (1, 5, 7)
    assert out.scores.shape == (1, 4, 6)
    assert out.matches.shape == (1, 6)
    # padded detections unmatched
    assert (np.asarray(out.matches)[0, 4:] == -1).all()
    # matched ids are valid tracks
    m_ = np.asarray(out.matches)[0, :4]
    assert ((m_ >= -1) & (m_ < 3)).all()


def test_associator_invariant_to_track_padding():
    """Adding extra padded track slots must not change valid outputs."""
    m = assoc_mod.Associator(TINY_ASSOC)
    tracks, tm, dets, dm = _assoc_inputs(T=4)
    params = m.init(jax.random.key(0), tracks, tm, dets, dm)
    out_a = m.apply(params, tracks, tm, dets, dm)

    pad = jnp.full((1, 3, 8, 79), -1.0)
    tracks_b = jnp.concatenate([tracks, pad], axis=1)
    tm_b = jnp.concatenate([tm, jnp.zeros((1, 3), bool)], axis=1)
    out_b = m.apply(params, tracks_b, tm_b, dets, dm)
    np.testing.assert_allclose(
        np.asarray(out_a.scores[0, :3]), np.asarray(out_b.scores[0, :3]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_a.matches), np.asarray(out_b.matches)
    )


def test_association_nll_picks_entries():
    Z = jnp.log(jnp.full((1, 3, 3), 0.25))
    pairs = jnp.array([[[0, 0], [1, 2]]])
    valid = jnp.array([[True, False]])
    nll = float(assoc_mod.association_nll(Z, pairs, valid))
    np.testing.assert_allclose(nll, -np.log(0.25), rtol=1e-6)


def test_detr_backbone_stage_selection():
    """backbone_stage feeds an earlier ResNet stage to the transformer
    (finer grid, more local receptive field) without changing the backbone
    parameter tree — stage-4 checkpoints keep their backbone weights."""
    import dataclasses

    cfg3 = dataclasses.replace(TINY, backbone_stage=3)
    m4, m3 = detr_mod.DETR(TINY), detr_mod.DETR(cfg3)
    x = jnp.zeros((1, 64, 64, 3))
    p4 = m4.init(jax.random.key(0), x)
    p3 = m3.init(jax.random.key(0), x)
    # identical backbone parameter tree (all stages always built)
    assert (jax.tree_util.tree_structure(p4["params"]["backbone"])
            == jax.tree_util.tree_structure(p3["params"]["backbone"]))
    # input_proj consumes the stage's channel width (stage 3 = 1024)
    assert p3["params"]["input_proj"]["kernel"].shape[2] == 1024
    assert p4["params"]["input_proj"]["kernel"].shape[2] == 2048
    out = m3.apply(p3, x)
    assert out["pred_logits"].shape == (1, TINY.num_queries, TINY.num_classes + 1)


def test_detr_tiny_backbone():
    """backbone="tiny" (resnet.TinyBackbone) composes with DETR: same
    {stage: feature} contract and strides as the ResNet path, fully
    trainable (no frozen statistics) — the CLI rehearsal's end-to-end
    CPU-training backbone."""
    import dataclasses

    from odam_tpu.models import resnet

    feats = resnet.TinyBackbone(return_stages=(3, 4)).init_with_output(
        jax.random.key(0), jnp.zeros((1, 64, 64, 3))
    )[0]
    assert feats[3].shape == (1, 4, 4, 128)   # stride 16, width*4
    assert feats[4].shape == (1, 2, 2, 256)   # stride 32, width*8

    cfg = dataclasses.replace(TINY, backbone="tiny", backbone_stage=3)
    m = detr_mod.DETR(cfg)
    p = m.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    out = m.apply(p, jnp.zeros((1, 64, 64, 3)))
    assert out["pred_logits"].shape == (1, TINY.num_queries, TINY.num_classes + 1)
    # no FrozenBatchNorm buffers anywhere in the tiny backbone
    flat = jax.tree_util.tree_leaves_with_path(p["params"]["backbone"])
    assert not any("running_mean" in jax.tree_util.keystr(k) for k, _ in flat)
