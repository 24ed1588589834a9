import jax.numpy as jnp
import numpy as np
import pytest

from odam_tpu.mapping import constraints, merge, optimizer, prior, quadric, superquadric as sq
from odam_tpu.utils import geometry as geo, host_boxes


def _look_at_camera(cam_pos, target):
    """T_wc with +z optical axis pointing from cam_pos to target, z-up world."""
    fwd = target - cam_pos
    fwd = fwd / np.linalg.norm(fwd)
    up = np.array([0.0, 0.0, 1.0])
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    T = np.eye(4)
    T[:3, 0] = right
    T[:3, 1] = down
    T[:3, 2] = fwd
    T[:3, 3] = cam_pos
    return T


K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)
IMG_H, IMG_W = 480, 640


def _make_views(center, dims, angle, n_views=12, radius=3.0):
    """Cameras on a ring around the object; observed boxes from GT corners."""
    corners = np.asarray(
        geo.box3d_corners(jnp.asarray(dims), jnp.asarray(angle), jnp.asarray(center))
    )
    P_list, box_list = [], []
    for k in range(n_views):
        phi = 2 * np.pi * k / n_views
        cam = center + radius * np.array([np.cos(phi), np.sin(phi), 0.3])
        T_wc = _look_at_camera(cam, center)
        P = K @ np.linalg.inv(T_wc)[:3, :]
        hom = np.concatenate([corners, np.ones((8, 1))], 1)
        pix = hom @ P.T
        uv = pix[:, :2] / pix[:, 2:]
        box = np.array([uv[:, 0].min(), uv[:, 1].min(), uv[:, 0].max(), uv[:, 1].max()])
        P_list.append(P)
        box_list.append(box)
    return np.asarray(P_list, np.float32), np.asarray(box_list, np.float32)


def test_superquadric_surface_extents():
    params = sq.init_params(
        jnp.array([[1.0, 2.0, 0.5]]), jnp.array([0.0]), jnp.array([[1.0, 2.0, 3.0]]),
        "cube",
    )
    pts = np.asarray(sq.surface_points_world(params, n_samples=500))[0]
    ext = pts.max(0) - pts.min(0)
    # cube mode (eps -> 0.2) spans nearly the full dims
    np.testing.assert_allclose(ext, [1.0, 2.0, 3.0], rtol=0.1)
    np.testing.assert_allclose((pts.max(0) + pts.min(0)) / 2, [1.0, 2.0, 0.5], atol=0.1)


def test_projected_bbox_matches_direct_projection():
    params = sq.init_params(
        jnp.array([[0.0, 0.0, 1.5]]), jnp.array([0.3]), jnp.array([[0.8, 0.6, 0.9]])
    )
    T_wc = _look_at_camera(np.array([2.0, 0.0, 1.5]), np.array([0.0, 0.0, 1.5]))
    P = (K @ np.linalg.inv(T_wc)[:3, :]).astype(np.float32)
    bbox = np.asarray(sq.projected_bbox(params, jnp.asarray(P)[None]))[0]
    assert bbox[0] < bbox[2] and bbox[1] < bbox[3]
    assert 0 < bbox[0] < IMG_W and 0 < bbox[3] < IMG_H


def test_optimizer_recovers_translation():
    """Perturbed init must converge back to the GT box from 2D constraints."""
    center = np.array([0.0, 0.0, 1.0])
    dims = np.array([0.8, 1.2, 0.9])
    angle = 0.4
    P, boxes = _make_views(center, dims, angle)
    V = len(P)

    init = sq.init_params(
        jnp.asarray((center + np.array([0.4, -0.3, 0.2]))[None].astype(np.float32)),
        jnp.asarray(np.array([angle], np.float32)),
        jnp.asarray((dims * 1.4)[None].astype(np.float32)),
    )
    res = optimizer.optimize_superquadrics(
        init,
        jnp.asarray(boxes[None]),
        jnp.ones((1, V, 4), jnp.float32),
        jnp.ones((1, V), jnp.float32),
        jnp.asarray(P[None]),
        jnp.ones((1,), bool),
        None,
        n_iters=300,
        n_samples=300,
        use_prior=False,
    )
    t = np.asarray(res.params.translate)[0]
    np.testing.assert_allclose(t, center, atol=0.15)
    # loss decreased by a lot
    log = np.asarray(res.loss_log)
    assert log[-1] < log[0] * 0.2
    # recovered oriented box overlaps GT well
    gt_corners = np.asarray(
        geo.box3d_corners(jnp.asarray(dims), jnp.asarray(angle), jnp.asarray(center))
    )
    iou, _ = host_boxes.box3d_iou(np.asarray(res.corners[0], np.float64), gt_corners)
    assert iou > 0.5, iou


def test_optimizer_skips_low_view_objects():
    center = np.array([0.0, 0.0, 1.0])
    dims = np.array([1.0, 1.0, 1.0])
    P, boxes = _make_views(center, dims, 0.0, n_views=4)
    init = sq.init_params(
        jnp.asarray(center[None].astype(np.float32)),
        jnp.zeros((1,), jnp.float32),
        jnp.asarray(dims[None].astype(np.float32)),
    )
    res = optimizer.optimize_superquadrics(
        init,
        jnp.asarray(boxes[None]),
        jnp.ones((1, 4, 4), jnp.float32),
        jnp.ones((1, 4), jnp.float32),
        jnp.asarray(P[None]),
        jnp.zeros((1,), bool),  # frozen
        None,
        n_iters=5,
        n_samples=100,
        use_prior=False,
    )
    np.testing.assert_allclose(
        np.asarray(res.corners[0]), np.asarray(res.corners_detector[0]), atol=1e-5
    )


def test_edge_constraints_border_filtering():
    boxes = np.array(
        [
            [100, 100, 200, 200],  # fully inside
            [5, 100, 200, 470],    # x_min and y_max at the border
        ],
        np.float32,
    )
    mask = constraints.edge_constraints(boxes, IMG_H, IMG_W)
    assert mask[0].all()
    assert not mask[1, 0] and mask[1, 1] and mask[1, 2] and not mask[1, 3]


def test_build_scene_constraints_padding():
    rng = np.random.default_rng(0)
    frame_ids = np.arange(20)
    P_cws = rng.normal(size=(20, 3, 4)).astype(np.float32)
    t1 = np.zeros((15, 82))
    t1[:, 0] = np.arange(15)
    t1[:, 1] = 5
    t1[:, 2:6] = [100, 100, 200, 200]
    t1[:, 6:9] = [1, 1, 1]
    t1[:, 9:12] = [0, 0, 1]
    t2 = t1[:3].copy()
    sc = constraints.build_scene_constraints(
        [t2, t1], frame_ids, P_cws, IMG_H, IMG_W, max_objs=4, max_views=8, min_views=10
    )
    # longest first
    assert sc.n_views[0] == 15 and sc.n_views[1] == 3
    assert sc.optimize_mask[0] and not sc.optimize_mask[1]
    assert sc.obj_valid[:2].all() and not sc.obj_valid[2:].any()
    assert sc.view_mask[0].sum() == 8  # subsampled to max_views
    assert sc.view_mask[1].sum() == 3


def test_build_scene_constraints_robust_init():
    """Median aggregation shrugs off outlier rows the mean cannot
    (the round-5 bad_box 'aggregation' miss class, audit_misses.py);
    default (mean) semantics stay reference-exact."""
    rng = np.random.default_rng(1)
    frame_ids = np.arange(20)
    P_cws = rng.normal(size=(20, 3, 4)).astype(np.float32)
    t = np.zeros((15, 82))
    t[:, 0] = np.arange(15)
    t[:, 1] = 5
    t[:, 2:6] = [100, 100, 200, 200]
    t[:, 6:9] = [1.0, 1.0, 1.0]
    t[:, 9:12] = [0.0, 0.0, 1.0]
    t[:, 12] = 0.1
    # two truncated-view outlier rows with wildly wrong dims/center/yaw
    t[3, 6:9], t[3, 9:12], t[3, 12] = [6.0, 6.0, 6.0], [4.0, 4.0, 4.0], 2.8
    t[9, 6:9], t[9, 9:12], t[9, 12] = [5.0, 0.1, 4.0], [-3.0, 2.0, 0.0], -2.5

    mean_sc = constraints.build_scene_constraints(
        [t], frame_ids, P_cws, IMG_H, IMG_W, max_objs=2, max_views=16,
        min_views=10)
    rob_sc = constraints.build_scene_constraints(
        [t], frame_ids, P_cws, IMG_H, IMG_W, max_objs=2, max_views=16,
        min_views=10, robust_init=True)
    # median lands on the clean majority value; mean is dragged off it
    np.testing.assert_allclose(rob_sc.init_dims[0], [1.0, 1.0, 1.0])
    np.testing.assert_allclose(rob_sc.init_translate[0], [0.0, 0.0, 1.0])
    assert abs(rob_sc.init_angle[0] - 0.1) < 1e-6
    assert np.abs(mean_sc.init_dims[0] - 1.0).max() > 0.2
    assert np.abs(mean_sc.init_translate[0] - [0, 0, 1]).max() > 0.05
    # the default path is the reference's mean (unchanged semantics)
    np.testing.assert_allclose(mean_sc.init_dims[0], t[:, 6:9].mean(0))


def test_fault_off_by_one_pose_plumbing(monkeypatch):
    """ODAM_FAULT_INJECT=off_by_one_pose pairs each observation with the
    PREVIOUS usable frame's projection (the injected indexing-bug class,
    examples/cli_rehearsal/ablate_big.py); unset, packing is exact."""
    rng = np.random.default_rng(2)
    frame_ids = np.arange(20)
    P_cws = rng.normal(size=(20, 3, 4)).astype(np.float32)
    t = np.zeros((12, 82))
    t[:, 0] = np.arange(2, 14)  # frames 2..13
    t[:, 1] = 5
    t[:, 2:6] = [100, 100, 200, 200]

    clean = constraints.build_scene_constraints(
        [t], frame_ids, P_cws, IMG_H, IMG_W, max_objs=2, max_views=16,
        min_views=10)
    monkeypatch.setenv("ODAM_FAULT_INJECT", "off_by_one_pose")
    bad = constraints.build_scene_constraints(
        [t], frame_ids, P_cws, IMG_H, IMG_W, max_objs=2, max_views=16,
        min_views=10)
    np.testing.assert_allclose(clean.P_cw[0, :12], P_cws[2:14])
    np.testing.assert_allclose(bad.P_cw[0, :12], P_cws[1:13])


def test_prior_table_shapes():
    table = prior.prior_invcov_table()
    assert table.shape == (8, 3, 3)
    # symmetric positive-definite-ish
    np.testing.assert_allclose(table, np.swapaxes(table, 1, 2), atol=1e-4)
    gathered = prior.prior_invcov_for_classes(np.array([0, 7, 99]))
    np.testing.assert_allclose(gathered[0], table[0])
    np.testing.assert_allclose(gathered[2], 0.0)


def test_quadric_projection_roundtrip():
    """Projected conic bbox of an axis-aligned ellipsoid in front of an
    identity camera has a simple closed form."""
    Q = quadric.quadric_matrix(
        jnp.array([0.0, 0.0, 5.0]), jnp.asarray(0.0), jnp.array([1.0, 1.0, 1.0])
    )
    P = jnp.asarray(np.hstack([K, np.zeros((3, 1), np.float32)]))
    bbox = np.asarray(quadric.quadric_bbox(Q, P))
    # unit sphere at depth 5: angular radius asin(1/5); extent ~ f * tan(asin(0.2))
    r = 500 * np.tan(np.arcsin(1 / 5)) * np.sqrt(1)  # approx for small angles
    np.testing.assert_allclose(bbox[2] - bbox[0], 2 * r, rtol=0.05)
    np.testing.assert_allclose((bbox[0] + bbox[2]) / 2, 320, atol=2.0)


def test_quadric_decompose_roundtrip():
    Qm = np.asarray(
        quadric.quadric_matrix(
            jnp.array([1.0, -2.0, 0.5]), jnp.asarray(0.7), jnp.array([4.0, 1.0, 0.25])
        )
    )
    axes_sq, R, t, is_ell = quadric.decompose_quadric(Qm)
    assert is_ell
    np.testing.assert_allclose(sorted(axes_sq), [0.25, 1.0, 4.0], rtol=1e-4)
    np.testing.assert_allclose(t.ravel(), [1.0, -2.0, 0.5], atol=1e-5)


def test_merge_clusters_overlapping_tracks():
    def mk_track(frames, cls):
        t = np.zeros((len(frames), 82))
        t[:, 0] = frames
        t[:, 1] = cls
        return t

    corners_a = np.asarray(geo.box3d_corners(jnp.ones(3), jnp.asarray(0.0), jnp.zeros(3)))
    corners_b = corners_a + 0.05  # heavy overlap -> merge
    corners_c = corners_a + np.array([10.0, 0, 0])  # far -> keep separate
    tracks = [mk_track([0, 1, 2], 5), mk_track([3, 4], 5), mk_track([0, 1], 5)]
    merged = merge.merge_tracks(
        tracks, [corners_a, corners_b, corners_c], np.arange(5)
    )
    assert len(merged) == 2
    lens = sorted(len(m) for m in merged)
    assert lens == [2, 5]


def test_merge_respects_class_compatibility():
    def mk_track(frames, cls):
        t = np.zeros((len(frames), 82))
        t[:, 0] = frames
        t[:, 1] = cls
        return t

    corners = np.asarray(geo.box3d_corners(jnp.ones(3), jnp.asarray(0.0), jnp.zeros(3)))
    # same box, incompatible classes (0 vs 1) -> no merge
    merged = merge.merge_tracks(
        [mk_track([0], 0), mk_track([1], 1)], [corners, corners.copy()], np.arange(2)
    )
    assert len(merged) == 2
    # same box, sofa(4)/chair(5) -> merge
    merged = merge.merge_tracks(
        [mk_track([0], 4), mk_track([1], 5)], [corners, corners.copy()], np.arange(2)
    )
    assert len(merged) == 1


def test_average_linkage_matches_sklearn():
    sklearn = pytest.importorskip("sklearn.cluster")
    rng = np.random.default_rng(4)
    pts = np.concatenate([rng.normal(0, 0.1, (5, 2)), rng.normal(3, 0.1, (4, 2))])
    d = np.linalg.norm(pts[:, None] - pts[None], axis=-1)
    ours = merge.average_linkage_clusters(d, threshold=1.0)
    ref = sklearn.AgglomerativeClustering(
        n_clusters=None, distance_threshold=1.0, metric="precomputed", linkage="average"
    ).fit(d).labels_
    # same partition (labels may be permuted)
    assert len(np.unique(ours)) == len(np.unique(ref)) == 2
    for lab in np.unique(ours):
        members = ours == lab
        assert len(np.unique(ref[members])) == 1
