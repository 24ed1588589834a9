"""Superquadric surface math (differentiable, pure JAX).

Implements the parametric superellipsoid surface
    x = a1 * f(cos eta, e1) * f(cos omega, e2)
    y = a2 * f(cos eta, e1) * f(sin omega, e2)
    z = a3 * f(sin eta, e1)
with the sign-preserving fractional power f(x, p) = sign(x)*|x|^p, and the
gradient-safe clamping that the reference applies so that autodiff through
near-zero magnitudes stays finite (reference:
src/super_quadric/learnable_primitives/sampling.py:508-516, 558-622).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def fexp(x: Array, p: Array) -> Array:
    """Sign-preserving fractional power: sign(x) * |x| ** p.

    |x| is floored away from zero so the power (and its gradient w.r.t. p)
    is finite even at the coordinate axes.
    """
    ax = jnp.maximum(jnp.abs(x), 1e-6)
    return jnp.sign(x) * jnp.power(ax, p)


def squash_shape(shape: Array, min_: float = 0.2, max_: float = 1.6) -> Array:
    """Map unconstrained shape logits to the valid epsilon range.

    Reference behavior: sq_libs.py:26-27 (squashing) — sigmoid into [0.2, 1.6].
    """
    return jax.nn.sigmoid(shape) * (max_ - min_) + min_


def sq_surface_points(scales: Array, epsilons: Array, etas: Array, omegas: Array
                      ) -> tuple[Array, Array]:
    """Surface points and (unnormalized) normals of a superquadric.

    Args:
        scales: [..., 3] axis scales (a1, a2, a3).
        epsilons: [..., 2] shape exponents (e1, e2), already squashed.
        etas: [..., S] latitude angles in [-pi/2, pi/2].
        omegas: [..., S] longitude angles in [-pi, pi].

    Returns:
        (points [..., S, 3], normals [..., S, 3]).

    Matches the reference's magnitude clamping (sampling.py:591-592, 613-615):
    each coordinate is pushed away from zero by 1e-6 with its sign preserved
    (sign convention: x > 0 -> +1, else -1), and angles that are exactly zero
    are nudged by 1e-6.
    """
    etas = jnp.where(etas == 0.0, 1e-6, etas)
    omegas = jnp.where(omegas == 0.0, 1e-6, omegas)

    a1 = scales[..., 0:1]
    a2 = scales[..., 1:2]
    a3 = scales[..., 2:3]
    e1 = epsilons[..., 0:1]
    e2 = epsilons[..., 1:2]

    ce, se = jnp.cos(etas), jnp.sin(etas)
    co, so = jnp.cos(omegas), jnp.sin(omegas)

    x = a1 * fexp(ce, e1) * fexp(co, e2)
    y = a2 * fexp(ce, e1) * fexp(so, e2)
    z = a3 * fexp(se, e1)

    def clamp_mag(v):
        s = (v > 0).astype(v.dtype) * 2.0 - 1.0
        return s * jnp.maximum(jnp.abs(v), 1e-6)

    x = clamp_mag(x)
    y = clamp_mag(y)
    z = clamp_mag(z)

    nx = (ce ** 2) * (co ** 2) / x
    ny = (ce ** 2) * (so ** 2) / y
    nz = (se ** 2) / z

    pts = jnp.stack([x, y, z], axis=-1)
    normals = jnp.stack([nx, ny, nz], axis=-1)
    return pts, normals


def sq_inside_outside(pts: Array, scales: Array, epsilons: Array) -> Array:
    """Superquadric inside-outside function F(p) for body-frame points.

    F < 1 inside, F = 1 on the surface, F > 1 outside:
        F = ((|x/a1|^(2/e2) + |y/a2|^(2/e2))^(e2/e1) + |z/a3|^(2/e1))
    """
    x = jnp.abs(pts[..., 0] / scales[..., 0:1])
    y = jnp.abs(pts[..., 1] / scales[..., 1:2])
    z = jnp.abs(pts[..., 2] / scales[..., 2:3])
    e1 = epsilons[..., 0:1]
    e2 = epsilons[..., 1:2]
    xy = jnp.power(jnp.maximum(x, 1e-9), 2.0 / e2) + jnp.power(jnp.maximum(y, 1e-9), 2.0 / e2)
    return jnp.power(jnp.maximum(xy, 1e-12), e2 / e1) + jnp.power(jnp.maximum(z, 1e-9), 2.0 / e1)
