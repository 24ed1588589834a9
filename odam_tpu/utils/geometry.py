"""Geometry primitives: homogeneous transforms, projection, rotations.

Pure-JAX, jit/vmap-friendly re-expression of the reference geometry layer
(reference: src/utils/geometry_utils.py:7-49, 276-316; src/utils/box_utils.py:311-316;
src/datasets/scannet_utils.py:213-222).  Everything here is shape-polymorphic in the
leading/batch axes and uses only static control flow.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def to_homogeneous(pts: Array) -> Array:
    """Append a 1 to the last axis: [..., N, 3] -> [..., N, 4].

    Reference behavior: geometry_utils.py:7-49 (get_homogeneous), generalized to
    arbitrary batch axes.
    """
    ones = jnp.ones_like(pts[..., :1])
    return jnp.concatenate([pts, ones], axis=-1)


def transform_points(T: Array, pts: Array) -> Array:
    """Apply a [..., 4, 4] rigid transform to [..., N, 3] points -> [..., N, 3]."""
    return jnp.einsum("...ij,...nj->...ni", T[..., :3, :3], pts) + T[..., None, :3, 3]


def project(pts_c: Array, K: Array, eps: float = 1e-6) -> Array:
    """Perspective projection of camera-frame points.

    Args:
        pts_c: [..., N, 3] points in camera frame.
        K: [..., 3, 3] intrinsics.

    Returns:
        [..., N, 3]: (u, v, z) pixel coordinates with the raw depth in the last
        channel (reference: geometry_utils.py:276-316 with keep_z=True).
    """
    uvw = jnp.einsum("...ij,...nj->...ni", K, pts_c)
    z = uvw[..., 2:]
    uv = uvw[..., :2] / jnp.where(jnp.abs(z) < eps, jnp.sign(z) * eps + (z == 0) * eps, z)
    return jnp.concatenate([uv, z], axis=-1)


def unproject(pixels: Array, depth: Array, K: Array) -> Array:
    """Back-project pixel coordinates with depths to camera-frame 3D points.

    Args:
        pixels: [..., N, 2] (u, v).
        depth: [..., N] depths.
        K: [..., 3, 3] intrinsics.

    Reference behavior: geometry_utils.py:258-273.
    """
    fx = K[..., 0, 0][..., None]
    fy = K[..., 1, 1][..., None]
    cx = K[..., 0, 2][..., None]
    cy = K[..., 1, 2][..., None]
    x = (pixels[..., 0] - cx) / fx
    y = (pixels[..., 1] - cy) / fy
    rays = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
    return rays * depth[..., None]


def rotz(angle: Array) -> Array:
    """Rotation matrix about +z for angle [...] -> [..., 3, 3].

    Reference behavior: box_utils.py:311-316 / sq_libs.py:556-575.
    """
    c = jnp.cos(angle)
    s = jnp.sin(angle)
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([c, -s, z], axis=-1),
            jnp.stack([s, c, z], axis=-1),
            jnp.stack([z, z, o], axis=-1),
        ],
        axis=-2,
    )


def invert_se3(T: Array) -> Array:
    """Invert a [..., 4, 4] rigid transform analytically (no linear solve)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    t_inv = -jnp.einsum("...ij,...j->...i", Rt, t)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=T.dtype), T[..., :1, :].shape
    )
    top = jnp.concatenate([Rt, t_inv[..., None]], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def camera_azimuth(T_wc: Array) -> Array:
    """Azimuth of the camera's optical axis in the world frame (z-up).

    The optical (+z) axis is rotated into the world, flattened onto the
    ground plane, and measured as atan2(y, x).
    Reference behavior: scannet_utils.py:213-222 (get_cam_azi).
    """
    fwd = T_wc[..., :3, 2]  # rotation of [0,0,1]; translation cancels in the difference
    return jnp.arctan2(fwd[..., 1], fwd[..., 0])


def corners_from_dims(dims: Array) -> Array:
    """8 corner points of an origin-centered axis-aligned box, [..., 3] -> [..., 8, 3].

    Corner order matches the reference (box_utils.py:286-308 / get_3d_box):
    top face (+z) counter-clockwise first, then bottom face, i.e.
    [+,+,+], [+,-,+], [-,-,+], [-,+,+], [+,+,-], [+,-,-], [-,-,-], [-,+,-] (× dims/2).
    """
    signs = jnp.array(
        [
            [1, 1, 1],
            [1, -1, 1],
            [-1, -1, 1],
            [-1, 1, 1],
            [1, 1, -1],
            [1, -1, -1],
            [-1, -1, -1],
            [-1, 1, -1],
        ],
        dtype=dims.dtype,
    )
    return signs * (dims[..., None, :] / 2.0)


def box3d_corners(dims: Array, angle: Array, center: Array) -> Array:
    """Oriented (yaw-only) 3D box corners: [..., 8, 3].

    Reference behavior: box_utils.py:286-308 (get_3d_box) with rotz heading.
    """
    pts = corners_from_dims(dims)
    R = rotz(angle)
    return jnp.einsum("...ij,...nj->...ni", R, pts) + center[..., None, :]


def mean_rotation_z(angles: Array, weights: Array | None = None, axis=-1) -> Array:
    """Average a set of yaw angles on the circle (chordal mean via sin/cos)."""
    s = jnp.sin(angles)
    c = jnp.cos(angles)
    if weights is not None:
        s = s * weights
        c = c * weights
    return jnp.arctan2(jnp.sum(s, axis=axis), jnp.sum(c, axis=axis))


def normalize_plane(plane: Array, eps: float = 1e-12) -> Array:
    """Scale [..., 4] plane coefficients so the normal has unit norm.

    Reference behavior: quadric_helper.py:61-66.
    """
    n = jnp.linalg.norm(plane[..., :3], axis=-1, keepdims=True)
    return plane / jnp.maximum(n, eps)
