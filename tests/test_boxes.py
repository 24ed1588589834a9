import jax
import jax.numpy as jnp
import numpy as np
import pytest

from odam_tpu.utils import boxes, geometry as geo, host_boxes


def _random_corners(rng, n):
    dims = rng.uniform(0.5, 3.0, size=(n, 3)).astype(np.float32)
    angles = rng.uniform(-np.pi, np.pi, size=(n,)).astype(np.float32)
    centers = rng.uniform(-2, 2, size=(n, 3)).astype(np.float32)
    return np.asarray(
        geo.box3d_corners(jnp.asarray(dims), jnp.asarray(angles), jnp.asarray(centers))
    )


def test_cxcywh_roundtrip(rng):
    b = jnp.asarray(rng.uniform(0.2, 0.8, size=(6, 4)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(boxes.xyxy_to_cxcywh(boxes.cxcywh_to_xyxy(b))), np.asarray(b), atol=1e-6
    )


def test_pairwise_iou_identity():
    b = jnp.array([[0.0, 0.0, 2.0, 2.0], [1.0, 1.0, 3.0, 3.0]])
    iou, _ = boxes.pairwise_box_iou(b, b)
    np.testing.assert_allclose(np.diag(np.asarray(iou)), 1.0, atol=1e-6)
    np.testing.assert_allclose(iou[0, 1], 1.0 / 7.0, atol=1e-6)


def test_generalized_iou_bounds(rng):
    b1 = np.sort(rng.uniform(0, 10, size=(8, 2, 2)), axis=1).reshape(8, 4).astype(np.float32)
    b2 = np.sort(rng.uniform(0, 10, size=(5, 2, 2)), axis=1).reshape(5, 4).astype(np.float32)
    g = np.asarray(boxes.pairwise_generalized_box_iou(jnp.asarray(b1), jnp.asarray(b2)))
    assert (g <= 1.0 + 1e-6).all() and (g >= -1.0 - 1e-6).all()


def test_iou_aabb_2d_3d():
    a2 = jnp.array([[0.0, 0.0], [2.0, 2.0]])
    b2 = jnp.array([[1.0, 1.0], [3.0, 3.0]])
    np.testing.assert_allclose(float(boxes.iou_aabb(a2, b2)), 1.0 / 7.0, atol=1e-6)
    a3 = jnp.array([[0.0, 0.0, 0.0], [2.0, 2.0, 2.0]]).reshape(2, 3)
    b3 = jnp.array([[1.0, 1.0, 1.0], [3.0, 3.0, 3.0]]).reshape(2, 3)
    np.testing.assert_allclose(float(boxes.iou_aabb(a3, b3)), 1.0 / 15.0, atol=1e-6)


def test_quad_intersection_axis_aligned():
    q1 = jnp.array([[0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 2.0]])  # CCW
    q2 = q1 + jnp.array([1.0, 1.0])
    area = float(boxes.convex_quad_intersection_area(q1, q2))
    np.testing.assert_allclose(area, 1.0, atol=1e-5)
    # disjoint
    q3 = q1 + jnp.array([5.0, 0.0])
    np.testing.assert_allclose(float(boxes.convex_quad_intersection_area(q1, q3)), 0.0, atol=1e-6)
    # identical
    np.testing.assert_allclose(float(boxes.convex_quad_intersection_area(q1, q1)), 4.0, atol=1e-5)


def test_quad_intersection_rotated_vs_montecarlo(rng):
    # 45-degree rotated square over an axis-aligned square: analytic overlap.
    s = np.sqrt(2.0)
    q1 = jnp.array([[-1.0, -1.0], [1.0, -1.0], [1.0, 1.0], [-1.0, 1.0]])
    q2 = jnp.array([[0.0, -s], [s, 0.0], [0.0, s], [-s, 0.0]])
    area = float(boxes.convex_quad_intersection_area(q1, q2))
    # Octagon intersection area = 8*(sqrt(2)-1) for these two unit squares
    np.testing.assert_allclose(area, 8 * (np.sqrt(2) - 1), rtol=1e-4)


def test_box3d_iou_identity_and_disjoint(rng):
    c = _random_corners(rng, 4)
    for k in range(4):
        iou, iou2d = boxes.box3d_iou(jnp.asarray(c[k]), jnp.asarray(c[k]))
        np.testing.assert_allclose(float(iou), 1.0, atol=1e-4)
        np.testing.assert_allclose(float(iou2d), 1.0, atol=1e-4)
    far = c[0] + np.array([100.0, 0, 0])
    iou, _ = boxes.box3d_iou(jnp.asarray(c[0]), jnp.asarray(far))
    np.testing.assert_allclose(float(iou), 0.0, atol=1e-6)


def test_box3d_iou_matches_host_reference(rng):
    """Device (masked clipping) vs host (exact list-based clipping) parity."""
    c1 = _random_corners(rng, 24)
    c2 = _random_corners(rng, 24)
    for a, b in zip(c1, c2):
        dev_iou, dev_2d = boxes.box3d_iou(jnp.asarray(a), jnp.asarray(b))
        host_iou, host_2d = host_boxes.box3d_iou(a.astype(np.float64), b.astype(np.float64))
        np.testing.assert_allclose(float(dev_iou), host_iou, atol=2e-3)
        np.testing.assert_allclose(float(dev_2d), host_2d, atol=2e-3)


def test_pairwise_box3d_iou_shape(rng):
    c1 = jnp.asarray(_random_corners(rng, 5))
    c2 = jnp.asarray(_random_corners(rng, 7))
    mat = jax.jit(boxes.pairwise_box3d_iou)(c1, c2)
    assert mat.shape == (5, 7)
    assert bool(jnp.all(mat >= -1e-6)) and bool(jnp.all(mat <= 1 + 1e-6))


def test_min_area_rect_exact_square():
    pts = np.array([[0, 0], [2, 0], [2, 1], [0, 1]], dtype=np.float64)
    corners, ang = host_boxes.min_area_rect(pts)
    assert abs(host_boxes.polygon_area(corners) - 2.0) < 1e-9
    assert abs(ang) < 1e-9 or abs(ang - np.pi / 2) < 1e-9


def test_sweep_matches_exact(rng):
    for _ in range(8):
        theta = rng.uniform(0, np.pi / 2)
        c, s = np.cos(theta), np.sin(theta)
        R = np.array([[c, -s], [s, c]])
        base = rng.uniform(-1, 1, size=(40, 2)) * np.array([3.0, 1.0])
        pts = base @ R.T + rng.normal(size=2)
        exact_corners, _ = host_boxes.min_area_rect(pts)
        sweep_corners, _ = boxes.oriented_bbox_2d_sweep(jnp.asarray(pts, dtype=jnp.float32))
        exact_area = host_boxes.polygon_area(exact_corners)
        sweep_area = host_boxes.polygon_area(np.asarray(sweep_corners))
        assert sweep_area >= exact_area - 1e-5
        assert sweep_area <= exact_area * 1.02 + 1e-6


def test_oriented_bbox_3d_sweep_masked(rng):
    pts = rng.normal(size=(64, 3)).astype(np.float32)
    pts[50:] += 100.0  # outliers that must be masked away
    w = np.ones(64, np.float32)
    w[50:] = 0.0
    corners = np.asarray(
        boxes.oriented_bbox_3d_sweep(jnp.asarray(pts), jnp.asarray(w))
    )
    assert corners.shape == (8, 3)
    assert np.abs(corners).max() < 50.0
    assert (corners[:4, 2] >= corners[4:, 2]).all()


def test_host_convex_hull_ccw(rng):
    pts = rng.normal(size=(50, 2))
    hull = host_boxes.convex_hull_2d(pts)
    # CCW orientation => positive signed area
    x, y = hull[:, 0], hull[:, 1]
    signed = 0.5 * (x @ np.roll(y, -1) - y @ np.roll(x, -1))
    assert signed > 0
