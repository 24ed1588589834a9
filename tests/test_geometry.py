import jax
import jax.numpy as jnp
import numpy as np

from odam_tpu.utils import geometry as geo


def test_to_homogeneous():
    pts = jnp.ones((5, 3))
    h = geo.to_homogeneous(pts)
    assert h.shape == (5, 4)
    np.testing.assert_allclose(h[:, 3], 1.0)
    # batched
    assert geo.to_homogeneous(jnp.ones((2, 5, 3))).shape == (2, 5, 4)


def test_rotz_matches_numpy():
    theta = 0.7
    R = np.asarray(geo.rotz(jnp.asarray(theta)))
    c, s = np.cos(theta), np.sin(theta)
    expected = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    np.testing.assert_allclose(R, expected, atol=1e-6)
    # batched
    Rb = geo.rotz(jnp.array([0.1, 0.2]))
    assert Rb.shape == (2, 3, 3)


def test_invert_se3(rng):
    angle = rng.uniform(-np.pi, np.pi)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = np.asarray(geo.rotz(jnp.asarray(angle)))
    T[:3, 3] = rng.normal(size=3)
    Tinv = np.asarray(geo.invert_se3(jnp.asarray(T)))
    np.testing.assert_allclose(Tinv @ T, np.eye(4), atol=1e-5)


def test_project_unproject_roundtrip(rng):
    K = jnp.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    pts = jnp.asarray(rng.uniform(0.5, 5.0, size=(10, 3)).astype(np.float32))
    uvz = geo.project(pts, K)
    np.testing.assert_allclose(uvz[:, 2], pts[:, 2], rtol=1e-5)
    back = geo.unproject(uvz[:, :2], uvz[:, 2], K)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), rtol=1e-4)


def test_transform_points_matches_homogeneous(rng):
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = np.asarray(geo.rotz(jnp.asarray(1.1)))
    T[:3, 3] = [1.0, -2.0, 0.5]
    pts = rng.normal(size=(7, 3)).astype(np.float32)
    out = np.asarray(geo.transform_points(jnp.asarray(T), jnp.asarray(pts)))
    expected = (np.concatenate([pts, np.ones((7, 1), np.float32)], 1) @ T.T)[:, :3]
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_camera_azimuth():
    # Camera looking along world +x: optical axis +z maps to +x.
    T_wc = np.eye(4, dtype=np.float32)
    T_wc[:3, :3] = np.array([[0, 0, 1], [0, 1, 0], [-1, 0, 0]], np.float32)
    azi = float(geo.camera_azimuth(jnp.asarray(T_wc)))
    assert abs(azi) < 1e-6
    # looking along world +y
    T_wc[:3, :3] = np.array([[0, 0, 0], [0, 0, 1], [-1, 0, 0]], np.float32)
    azi = float(geo.camera_azimuth(jnp.asarray(T_wc)))
    np.testing.assert_allclose(azi, np.pi / 2, atol=1e-6)


def test_box3d_corners():
    corners = np.asarray(geo.box3d_corners(
        jnp.array([2.0, 4.0, 6.0]), jnp.asarray(0.0), jnp.array([10.0, 0.0, 0.0])
    ))
    assert corners.shape == (8, 3)
    np.testing.assert_allclose(corners[0], [11.0, 2.0, 3.0])
    np.testing.assert_allclose(corners[6], [9.0, -2.0, -3.0])
    # top face first
    assert (corners[:4, 2] > corners[4:, 2]).all()


def test_mean_rotation_z_wraps():
    angles = jnp.array([np.pi - 0.1, -np.pi + 0.1])
    mean = float(geo.mean_rotation_z(angles))
    assert abs(abs(mean) - np.pi) < 1e-5


def test_jit_compatible():
    f = jax.jit(lambda d, a, c: geo.box3d_corners(d, a, c))
    out = f(jnp.ones(3), jnp.asarray(0.3), jnp.zeros(3))
    assert out.shape == (8, 3)
