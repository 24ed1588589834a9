"""Dual-quadric object representation (closed-form projection alternative).

Capability parity with the reference's QuadricOptimizer / DualQuadric
(sq_libs.py:39-348): an ellipsoid is represented by its dual quadric
Q = T diag(a1^2, a2^2, a3^2, -1) T^T; its image under a projective camera is
the dual conic C = P Q P^T whose bounding box has a closed form.  All batched
and jittable; the iterative fit is one ``lax.scan``.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..utils import geometry as geo

Array = jax.Array


def quadric_matrix(translate: Array, angle: Array, scale_sq: Array) -> Array:
    """Dual quadric from pose + squared semi-axes: [..., 4, 4].

    Reference behavior: sq_libs.py:68-78 (params2mat) with a yaw rotation.
    """
    R = geo.rotz(angle)
    t = translate[..., :, None]
    top = jnp.concatenate([R, t], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=translate.dtype),
        top[..., :1, :].shape,
    )
    T = jnp.concatenate([top, bottom], axis=-2)
    d = jnp.concatenate([scale_sq, -jnp.ones_like(scale_sq[..., :1])], axis=-1)
    Q0 = d[..., :, None] * jnp.eye(4, dtype=translate.dtype)
    return T @ Q0 @ jnp.swapaxes(T, -1, -2)


def conic_bbox_lines(C: Array, eps: float = 1e-9) -> Array:
    """Bounding-box line offsets of a dual conic: [..., 3, 3] -> [..., 4].

    Returns (-x_min, -y_min, -x_max, -y_max), the line-equation constants, as
    in the reference (sq_libs.py:123-147: the negatives of the box edges).
    Discriminants are clipped at zero so degenerate conics yield finite output
    instead of NaN (the reference asserts; we mask downstream instead).
    """
    c22 = C[..., 2, 2]
    bx = jnp.sqrt(jnp.clip(4 * C[..., 0, 2] ** 2 - 4 * C[..., 0, 0] * c22, min=0.0))
    x0 = 0.5 / c22 * (2 * C[..., 0, 2] + bx)
    x1 = 0.5 / c22 * (2 * C[..., 0, 2] - bx)
    by = jnp.sqrt(jnp.clip(4 * C[..., 1, 2] ** 2 - 4 * C[..., 1, 1] * c22, min=0.0))
    y0 = 0.5 / c22 * (2 * C[..., 1, 2] + by)
    y1 = 0.5 / c22 * (2 * C[..., 1, 2] - by)
    x_min = jnp.minimum(x0, x1)
    x_max = jnp.maximum(x0, x1)
    y_min = jnp.minimum(y0, y1)
    y_max = jnp.maximum(y0, y1)
    return jnp.stack([-x_min, -y_min, -x_max, -y_max], axis=-1)


def project_quadric(Q: Array, P: Array) -> Array:
    """Dual conic C = P Q P^T: [..., 4, 4] x [..., 3, 4] -> [..., 3, 3]."""
    return P @ Q @ jnp.swapaxes(P, -1, -2)


def quadric_bbox(Q: Array, P: Array) -> Array:
    """Projected bbox [..., 4] (x_min, y_min, x_max, y_max) of a dual quadric."""
    lines = conic_bbox_lines(project_quadric(Q, P))
    return -lines


def plane_distance_residual(Q: Array, planes: Array, plane_mask: Array) -> Array:
    """3D plane-tangency residual of a dual quadric (sq_libs.py:170-192).

    For each plane [n (3), d_gt], the two offsets d1/d2 at which a plane with
    normal n is tangent to the quadric are the roots of the tangency
    condition pᵀ Q p = 0; the residual is min(|d_gt - d1|, |d_gt - d2|).
    The reference computes this in ``constraint_3d`` but comments it out of
    its own optimizer loop (weight 0, sq_libs.py:236-237) — provided here for
    the full capability surface, off by default in :func:`fit_quadric`.

    Args:
        Q: [..., 4, 4] dual quadrics.
        planes: [..., P, 4]; plane_mask: [..., P].

    Returns:
        [...] masked mean residual.
    """
    n = planes[..., :3]
    d_gt = planes[..., 3]
    t = -Q[..., :3, 3]
    tn = 2.0 * jnp.einsum("...i,...pi->...p", t, n)
    nQn = jnp.einsum("...pi,...ij,...pj->...p", n, Q[..., :3, :3], n)
    B = jnp.sqrt(jnp.clip(tn ** 2 + 4.0 * nQn, min=0.0))
    d1 = -(tn + B) / 2.0
    d2 = -(tn - B) / 2.0
    res = jnp.minimum(jnp.abs(d_gt - d1), jnp.abs(d_gt - d2))
    res = jnp.where(jnp.isnan(res), 0.0, res) * plane_mask
    return jnp.sum(res, axis=-1) / jnp.maximum(jnp.sum(plane_mask, axis=-1), 1.0)


def decompose_quadric(Q: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray, bool]:
    """Recover (squared semi-axes, R, t, is_ellipsoid) from a dual quadric.

    Host-side; reference behavior sq_libs.py:257-280 (get_srt) with a
    symmetric eigendecomposition.
    """
    Q = np.asarray(Q, np.float64)
    t = -Q[:3, 3:]
    A = Q[:3, :3] + t @ t.T
    w, V = np.linalg.eigh((A + A.T) / 2)
    if np.linalg.det(V) < 0:
        V = -V
    is_ellipsoid = bool((w > 0).all())
    return np.abs(w).astype(np.float32), V.astype(np.float32), t.astype(np.float32), is_ellipsoid


def ellipsoid_points(Q: np.ndarray, side: int = 50) -> tuple[np.ndarray, bool]:
    """Dense ellipsoid surface grid from a dual quadric (sq_libs.py:316-348)."""
    axes_sq, R, t, is_ellipsoid = decompose_quadric(Q)
    axes = np.sqrt(axes_sq)
    u = np.linspace(0, 2 * np.pi, side)
    v = np.linspace(0, np.pi, side)
    x = axes[0] * np.outer(np.cos(u), np.sin(v))
    y = axes[1] * np.outer(np.sin(u), np.sin(v))
    z = axes[2] * np.outer(np.ones_like(u), np.cos(v))
    pts = np.stack([x, y, z], axis=-1).reshape(-1, 3) @ R.T + t.ravel()
    return pts.astype(np.float32), is_ellipsoid


class QuadricFitResult(NamedTuple):
    translate: Array
    angle: Array
    scale_factor: Array
    loss_log: Array


@partial(jax.jit, static_argnames=("n_iters", "plane_weight"))
def fit_quadric(
    init_translate: Array,
    init_angle: Array,
    half_dims: Array,
    lines: Array,
    line_mask: Array,
    Ms: Array,
    planes: Array | None = None,
    plane_mask: Array | None = None,
    *,
    n_iters: int = 500,
    lr: float = 0.01,
    plane_weight: float = 0.0,
) -> QuadricFitResult:
    """Iteratively fit dual quadrics to 2D box-line constraints.

    Batched equivalent of QuadricOptimizer.run (sq_libs.py:194-241): the
    optimizable state is (translation, yaw, a global scale factor); loss is
    masked L1 between the conic-bbox line constants and the observed ones,
    optionally plus the 3D plane-tangency term (``plane_weight`` > 0 —
    mirrors the reference's constraint_3d, which its own loop keeps at
    weight 0, sq_libs.py:236-237).

    Args:
        init_translate: [O, 3]; init_angle: [O]; half_dims: [O, 3] (bbox/2).
        lines: [O, V, 4] observed line constants (-x_min, -y_min, -x_max, -y_max).
        line_mask: [O, V, 4]; Ms: [O, V, 3, 4].
        planes: optional [O, P, 4] 3D plane constraints [normal, offset].
        plane_mask: [O, P] validity of plane rows.
    """
    params = {
        "translate": init_translate,
        "angle": init_angle,
        "scale_factor": jnp.ones(init_translate.shape[:-1], init_translate.dtype),
    }

    def loss_fn(p):
        scale_sq = (p["scale_factor"][..., None] * half_dims) ** 2
        Q = quadric_matrix(p["translate"], p["angle"], scale_sq)  # [O, 4, 4]
        C = jnp.einsum("ovij,ojk,ovlk->ovil", Ms, Q, Ms)          # [O, V, 3, 3]
        pred = conic_bbox_lines(C)                                 # [O, V, 4]
        l1 = jnp.abs(pred - lines)
        l1 = jnp.where(jnp.isnan(l1), 0.0, l1) * line_mask
        n_valid = jnp.maximum(jnp.sum(line_mask, axis=(-2, -1)), 1.0)
        loss = jnp.sum(l1) / jnp.sum(jnp.maximum(n_valid, 1.0))
        if planes is not None and plane_weight > 0.0:
            pm = (
                plane_mask if plane_mask is not None
                else jnp.ones(planes.shape[:-1], planes.dtype)
            )
            loss = loss + plane_weight * jnp.mean(
                plane_distance_residual(Q, planes, pm)
            )
        return loss, None

    tx = optax.adam(lr)
    state = tx.init(params)

    def step(carry, _):
        p, s = carry
        (loss, _), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
        g = jax.tree.map(lambda x: jnp.where(jnp.isnan(x), 0.0, x), g)
        upd, s = tx.update(g, s, p)
        return (optax.apply_updates(p, upd), s), loss

    (params, _), loss_log = jax.lax.scan(step, (params, state), None, length=n_iters)
    return QuadricFitResult(
        translate=params["translate"],
        angle=params["angle"],
        scale_factor=params["scale_factor"],
        loss_log=loss_log,
    )
