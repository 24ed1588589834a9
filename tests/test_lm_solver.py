"""LM mapping solver: convergence and comparison with the Adam path."""
import jax.numpy as jnp
import numpy as np

from odam_tpu.mapping import lm_solver, optimizer, superquadric as sq
from odam_tpu.utils import geometry as geo, host_boxes


def _look_at(cam, target):
    fwd = target - cam
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, [0.0, 0.0, 1.0])
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    T = np.eye(4)
    T[:3, 0], T[:3, 1], T[:3, 2], T[:3, 3] = right, down, fwd, cam
    return T


def _views(center, dims, angle, n_views=12, noise=1.0, seed=0):
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)
    rng = np.random.default_rng(seed)
    corners = np.asarray(
        geo.box3d_corners(jnp.asarray(dims), jnp.asarray(angle), jnp.asarray(center))
    )
    Ps, boxes = [], []
    for k in range(n_views):
        phi = 2 * np.pi * k / n_views
        cam = center + 3.0 * np.array([np.cos(phi), np.sin(phi), 0.35])
        P = K @ np.linalg.inv(_look_at(cam, center))[:3, :]
        hom = np.concatenate([corners, np.ones((8, 1))], 1)
        uv = hom @ P.T
        uv = uv[:, :2] / uv[:, 2:]
        boxes.append(
            np.array([uv[:, 0].min(), uv[:, 1].min(), uv[:, 0].max(), uv[:, 1].max()])
            + rng.normal(0, noise, 4)
        )
        Ps.append(P)
    return np.asarray(Ps, np.float32), np.asarray(boxes, np.float32)


def test_lm_converges_and_matches_adam_quality():
    center = np.array([0.1, -0.2, 0.8])
    dims = np.array([0.9, 0.6, 1.1])
    angle = 0.4
    Ps, boxes = _views(center, dims, angle)
    V = len(Ps)

    init = sq.init_params(
        jnp.asarray((center + [0.35, -0.25, 0.2])[None].astype(np.float32)),
        jnp.asarray(np.array([angle], np.float32)),
        jnp.asarray((dims * 1.4)[None].astype(np.float32)),
    )
    args = (
        init, jnp.asarray(boxes[None]), jnp.ones((1, V, 4), jnp.float32),
        jnp.ones((1, V), jnp.float32), jnp.asarray(Ps[None]),
        jnp.ones((1,), bool), None,
    )
    gt_corners = np.asarray(
        geo.box3d_corners(jnp.asarray(dims), jnp.asarray(angle), jnp.asarray(center))
    )

    lm = lm_solver.optimize_superquadrics_lm(
        *args, n_iters=25, n_samples=300, use_prior=False
    )
    lm_iou, _ = host_boxes.box3d_iou(np.asarray(lm.corners[0], np.float64), gt_corners)
    lm_log = np.asarray(lm.loss_log)
    assert lm_log[-1] < lm_log[0] * 0.5
    np.testing.assert_allclose(np.asarray(lm.params.translate[0]), center, atol=0.15)

    adam = optimizer.optimize_superquadrics(
        *args, n_iters=200, n_samples=300, use_prior=False
    )
    adam_iou, _ = host_boxes.box3d_iou(np.asarray(adam.corners[0], np.float64), gt_corners)

    # 25 LM iterations reach Adam-200 quality (within a small margin)
    assert lm_iou > 0.5, (lm_iou, adam_iou)
    assert lm_iou > adam_iou - 0.1, (lm_iou, adam_iou)


def test_lm_respects_masks_and_freeze():
    init = sq.init_params(
        jnp.zeros((2, 3)), jnp.zeros((2,)), jnp.ones((2, 3))
    )
    V = 4
    res = lm_solver.optimize_superquadrics_lm(
        init,
        jnp.full((2, V, 4), 100.0),
        jnp.ones((2, V, 4)),
        jnp.ones((2, V)),
        jnp.broadcast_to(
            jnp.concatenate([jnp.eye(3), jnp.ones((3, 1))], 1), (2, V, 3, 4)
        ).astype(jnp.float32),
        jnp.array([True, False]),  # object 1 frozen
        None,
        n_iters=5,
        n_samples=64,
        use_prior=False,
    )
    assert np.isfinite(np.asarray(res.corners)).all()
    # frozen object's params unchanged
    np.testing.assert_allclose(np.asarray(res.params.translate[1]), 0.0, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(res.corners[1]), np.asarray(res.corners_detector[1]), atol=1e-5
    )


def test_lm_cube_mode_freezes_shapes():
    init = sq.init_params(
        jnp.zeros((1, 3)), jnp.zeros((1,)), jnp.ones((1, 3)), "cube"
    )
    Ps, boxes = _views(np.zeros(3) + [0, 0, 0.5], np.ones(3), 0.0, n_views=6)
    res = lm_solver.optimize_superquadrics_lm(
        init, jnp.asarray(boxes[None]), jnp.ones((1, 6, 4)), jnp.ones((1, 6)),
        jnp.asarray(Ps[None]), jnp.ones((1,), bool), None,
        n_iters=5, n_samples=64, representation="cube", use_prior=False,
    )
    np.testing.assert_allclose(
        np.asarray(res.params.shapes[0]), sq.CUBE_SHAPE_LOGIT, atol=1e-4
    )


def _ring(center, r, z, n, arc=2 * np.pi):
    return [
        center + [r * np.cos(arc * k / n), r * np.sin(arc * k / n), z]
        for k in range(n)
    ]


def _case(center, dims, angle, cams, noise=1.0, edge_keep=1.0, seed=0):
    """(Ps, boxes, edge_mask, gt_corners) for a camera set; drops views with
    the object behind/near the camera."""
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)
    rng = np.random.default_rng(seed)
    corners = np.asarray(
        geo.box3d_corners(jnp.asarray(dims), jnp.asarray(angle), jnp.asarray(center))
    )
    Ps, boxes, masks = [], [], []
    for cam in cams:
        P = K @ np.linalg.inv(_look_at(np.asarray(cam, float), np.asarray(center, float)))[:3, :]
        hom = np.concatenate([corners, np.ones((8, 1))], 1)
        uv = hom @ P.T
        if (uv[:, 2] < 0.3).any():
            continue
        uv = uv[:, :2] / uv[:, 2:]
        boxes.append(
            [uv[:, 0].min(), uv[:, 1].min(), uv[:, 0].max(), uv[:, 1].max()]
            + rng.normal(0, noise, 4)
        )
        Ps.append(P)
        masks.append(rng.random(4) < edge_keep)
    return (np.asarray(Ps, np.float32), np.asarray(boxes, np.float32),
            np.asarray(masks, np.float32), corners)


def _solve_both(center, dims, angle, cams, **kw):
    Ps, boxes, mask, gt = _case(center, dims, angle, cams, **kw)
    V = len(Ps)
    init = sq.init_params(
        jnp.asarray((np.asarray(center) + [0.3, -0.2, 0.15])[None].astype(np.float32)),
        jnp.asarray(np.array([angle + 0.15], np.float32)),
        jnp.asarray((np.asarray(dims) * 1.35)[None].astype(np.float32)),
    )
    args = (init, jnp.asarray(boxes[None]), jnp.asarray(mask[None]),
            jnp.ones((1, V), jnp.float32), jnp.asarray(Ps[None]),
            jnp.ones((1,), bool), None)
    lm = lm_solver.optimize_superquadrics_lm(
        *args, n_iters=25, n_samples=256, use_prior=False
    )
    ad = optimizer.optimize_superquadrics(
        *args, n_iters=150, n_samples=256, use_prior=False
    )
    lm_iou, _ = host_boxes.box3d_iou(np.asarray(lm.corners[0], np.float64), gt)
    ad_iou, _ = host_boxes.box3d_iou(np.asarray(ad.corners[0], np.float64), gt)
    return lm_iou, ad_iou, args, init, gt


def test_lm_robustness_sweep_inside_envelope():
    """Degenerate-geometry sweep INSIDE the documented envelope (edge frac
    >= 0.5, aspect >= 0.12): LM must match the Adam path within 0.06 IoU.
    Full 12-case sweep results are recorded in lm_solver.py's envelope note."""
    c = np.array([0.1, -0.2, 0.8])
    dims = np.array([0.9, 0.6, 1.1])
    cases = {
        "grazing_in_plane": (c, dims, 0.4, _ring(c, 3.0, 0.05, 10)),
        "grazing_below": (c, dims, 0.4, _ring(c, 3.0, -0.3, 10)),
        "narrow_arc": (c, dims, 0.4, _ring(c, 3.0, 1.0, 8, arc=np.pi / 6)),
        "extreme_aspect": (c, np.array([2.4, 0.35, 0.45]), 0.4, _ring(c, 3.5, 1.0, 10)),
        "few_views": (c, dims, 0.4, _ring(c, 3.0, 1.0, 5)),
    }
    for name, (cc, dd, aa, cams) in cases.items():
        lm_iou, ad_iou, *_ = _solve_both(cc, dd, aa, cams)
        assert lm_iou > ad_iou - 0.06, (name, lm_iou, ad_iou)
        assert lm_iou > 0.4, (name, lm_iou)


def test_lm_envelope_detects_degenerate_inputs():
    c = np.array([0.0, 0.0, 0.5])
    # near-planar object: out of envelope via aspect
    thin = sq.init_params(
        jnp.zeros((1, 3)), jnp.zeros((1,)), jnp.asarray([[1.5, 1.4, 0.08]])
    )
    ok = lm_solver.lm_envelope_ok(
        thin, jnp.ones((1, 6, 4)), jnp.ones((1, 6))
    )
    assert not bool(ok[0])
    # heavily masked edges: out of envelope via edge fraction
    fat = sq.init_params(jnp.zeros((1, 3)), jnp.zeros((1,)), jnp.ones((1, 3)))
    mask = np.zeros((1, 6, 4), np.float32)
    mask[0, :, 0] = 1.0  # only x_min observed
    ok = lm_solver.lm_envelope_ok(fat, jnp.asarray(mask), jnp.ones((1, 6)))
    assert not bool(ok[0])
    # nominal: inside
    ok = lm_solver.lm_envelope_ok(fat, jnp.ones((1, 6, 4)), jnp.ones((1, 6)))
    assert bool(ok[0])


def test_lm_envelope_boundary_sweep():
    """Dense boundary sweep (VERDICT r2 #8): across the edge_frac x aspect
    grid at 10 views — the regime where LM failures are systematic — the
    auto-router must be accuracy-neutral: out-of-envelope cells take the
    Adam result EXACTLY, and in-envelope cells lose nothing systematic
    (mean delta within 0.02 IoU, no cell worse than the measured noise
    floor).  Grid construction and the full measured tables live in
    scripts/lm_envelope_sweep.py; envelope constants in lm_solver.py carry
    the provenance comment."""
    import sys

    sys.path.insert(0, "scripts")
    try:
        from lm_envelope_sweep import build_batch
    finally:
        sys.path.remove("scripts")

    args, cells, gts = build_batch(seeds=(0,), n_views=10)
    (init, boxes, box_mask, view_mask, P_cw, opt_mask, _) = args

    auto = lm_solver.optimize_superquadrics_auto(
        *args, n_iters=25, n_samples=256, adam_iters=150, adam_samples=256,
        use_prior=False,
    )
    adam = optimizer.optimize_superquadrics(
        *args, n_iters=150, n_samples=256, use_prior=False,
    )
    ok = np.asarray(lm_solver.lm_envelope_ok(init, box_mask, view_mask))
    assert ok.any() and (~ok).any(), "sweep must straddle the envelope"

    deltas_in = []
    for o, (edge_frac, aspect, _) in enumerate(cells):
        if not ok[o]:
            # router took Adam: bitwise-identical corners
            np.testing.assert_allclose(
                np.asarray(auto.corners[o]), np.asarray(adam.corners[o]),
                atol=1e-6, err_msg=f"cell {edge_frac}/{aspect}",
            )
        else:
            a_iou, _ = host_boxes.box3d_iou(
                np.asarray(auto.corners[o], np.float64), gts[o])
            d_iou, _ = host_boxes.box3d_iou(
                np.asarray(adam.corners[o], np.float64), gts[o])
            deltas_in.append(a_iou - d_iou)
            assert a_iou > d_iou - 0.1, (edge_frac, aspect, a_iou, d_iou)
    assert np.mean(deltas_in) > -0.02, deltas_in


def test_lm_auto_fallback_recovers_near_planar():
    """The auto path must route the near-planar case (LM's worst, -0.25 IoU
    in the sweep) to Adam and match plain-Adam quality."""
    c = np.array([0.1, -0.2, 0.8])
    dims = np.array([1.5, 1.4, 0.08])
    Ps, boxes, mask, gt = _case(c, dims, 0.3, _ring(c, 3.0, 1.2, 10))
    V = len(Ps)
    init = sq.init_params(
        jnp.asarray((c + [0.3, -0.2, 0.1])[None].astype(np.float32)),
        jnp.asarray(np.array([0.45], np.float32)),
        jnp.asarray((dims * 1.35)[None].astype(np.float32)),
    )
    args = (init, jnp.asarray(boxes[None]), jnp.asarray(mask[None]),
            jnp.ones((1, V), jnp.float32), jnp.asarray(Ps[None]),
            jnp.ones((1,), bool), None)
    auto = lm_solver.optimize_superquadrics_auto(
        *args, n_iters=25, n_samples=256, adam_iters=150, adam_samples=256,
        use_prior=False,
    )
    adam = optimizer.optimize_superquadrics(
        *args, n_iters=150, n_samples=256, use_prior=False
    )
    auto_iou, _ = host_boxes.box3d_iou(np.asarray(auto.corners[0], np.float64), gt)
    adam_iou, _ = host_boxes.box3d_iou(np.asarray(adam.corners[0], np.float64), gt)
    np.testing.assert_allclose(auto_iou, adam_iou, atol=1e-6)


def test_normalized_fit_residual_separates_good_from_bad():
    """The a-posteriori gate's statistic: near-zero at the true solution,
    large at a wrong one, invariant to the image/box scale (normalized by
    the observed box diagonal)."""
    center = np.array([0.1, -0.2, 0.8])
    dims = np.array([0.9, 0.6, 1.1])
    Ps, boxes = _views(center, dims, 0.4, noise=0.0)
    V = len(Ps)
    good = sq.init_params(
        jnp.asarray(center[None].astype(np.float32)),
        jnp.asarray(np.array([0.4], np.float32)),
        jnp.asarray(dims[None].astype(np.float32)),
    )
    bad = sq.init_params(
        jnp.asarray((center + [0.8, 0.5, 0.3])[None].astype(np.float32)),
        jnp.asarray(np.array([1.2], np.float32)),
        jnp.asarray((dims * 0.4)[None].astype(np.float32)),
    )
    args = (jnp.asarray(boxes[None]), jnp.ones((1, V, 4), jnp.float32),
            jnp.ones((1, V), jnp.float32), jnp.asarray(Ps[None]))
    r_good = float(lm_solver.normalized_fit_residual(good, *args)[0])
    r_bad = float(lm_solver.normalized_fit_residual(bad, *args)[0])
    # The floor is nonzero even at the true parameters: box-corner-generated
    # GT boxes circumscribe the superquadric surface (~0.08 measured), which
    # is why ACCEPT_RESID_MAX sits at 0.2 — above the representation floor,
    # below wrong-basin levels.
    assert r_good < 0.6 * lm_solver.ACCEPT_RESID_MAX, r_good
    assert r_bad > lm_solver.ACCEPT_RESID_MAX, r_bad


def test_lm_auto_residual_gate_routes_to_adam():
    """Acceptance-gate plumbing: with an impossibly strict threshold every
    in-envelope object must take the Adam result bitwise; with the gate
    disabled (accept_resid=None) the LM result must be returned."""
    center = np.array([0.1, -0.2, 0.8])
    dims = np.array([0.9, 0.6, 1.1])
    Ps, boxes = _views(center, dims, 0.4)
    V = len(Ps)
    init = sq.init_params(
        jnp.asarray((center + [0.3, -0.2, 0.1])[None].astype(np.float32)),
        jnp.asarray(np.array([0.5], np.float32)),
        jnp.asarray((dims * 1.3)[None].astype(np.float32)),
    )
    args = (init, jnp.asarray(boxes[None]), jnp.ones((1, V, 4), jnp.float32),
            jnp.ones((1, V), jnp.float32), jnp.asarray(Ps[None]),
            jnp.ones((1,), bool), None)
    kw = dict(n_iters=10, n_samples=256, adam_iters=40, adam_samples=256,
              use_prior=False)
    assert bool(lm_solver.lm_envelope_ok(init, args[2], args[3])[0])
    strict = lm_solver.optimize_superquadrics_auto(
        *args, accept_resid=0.0, **kw)
    adam = optimizer.optimize_superquadrics(
        *args, n_iters=40, n_samples=256, use_prior=False)
    np.testing.assert_allclose(
        np.asarray(strict.corners[0]), np.asarray(adam.corners[0]), atol=1e-6)
    off = lm_solver.optimize_superquadrics_auto(
        *args, accept_resid=None, **kw)
    lm = lm_solver.optimize_superquadrics_lm(
        *args, n_iters=10, n_samples=256, use_prior=False)
    np.testing.assert_allclose(
        np.asarray(off.corners[0]), np.asarray(lm.corners[0]), atol=1e-6)
