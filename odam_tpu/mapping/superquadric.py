"""Superquadric object state: a 9-DoF optimizable pytree.

Parameterization matches the reference's SuperQuadric object
(sq_libs.py:531-595): translation t in R^3, yaw angle, per-axis "scale roots"
(the stored scale is sqrt(dims/2), squared on use) and two unconstrained shape
logits squashed into epsilon in [0.2, 1.6].  Cube mode pins the shape logits at
-10000 (epsilon -> 0.2, near-box); quadric/ellipsoid mode pins them at 0
(epsilon -> 0.9).  Unlike the reference (one Python object per track), the
params here carry arbitrary leading batch axes so a whole scene of objects is
one pytree.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import sampler, surface
from ..utils import geometry as geo

Array = jax.Array

CUBE_SHAPE_LOGIT = -10000.0
ELLIPSOID_SHAPE_LOGIT = 0.0

REPRESENTATIONS = ("cube", "super_quadric", "quadric")


class SQParams(NamedTuple):
    """Batched superquadric parameters ([...] leading axes shared)."""

    translate: Array  # [..., 3]
    angle: Array      # [...]
    scales: Array     # [..., 3]  (sqrt of half-dimensions)
    shapes: Array     # [..., 2]  (unconstrained logits)


def init_params(translate: Array, angle: Array, dims: Array,
                representation: str = "super_quadric") -> SQParams:
    """Initialize from detector outputs (reference: sq_libs.py:353-369).

    Args:
        translate: [..., 3] world-frame centers.
        angle: [...] yaw.
        dims: [..., 3] full box dimensions; stored scale = sqrt(dims / 2).
    """
    assert representation in REPRESENTATIONS, representation
    scales = jnp.sqrt(jnp.clip(dims, min=1e-4) / 2.0)
    logit = CUBE_SHAPE_LOGIT if representation == "cube" else ELLIPSOID_SHAPE_LOGIT
    shapes = jnp.full(translate.shape[:-1] + (2,), logit, dtype=translate.dtype)
    return SQParams(translate=translate, angle=jnp.asarray(angle), scales=scales,
                    shapes=shapes)


def effective_scales(params: SQParams) -> Array:
    """a = scales ** 2 (reference squares the stored roots, sq_libs.py:581)."""
    return params.scales ** 2


def effective_epsilons(params: SQParams) -> Array:
    return surface.squash_shape(params.shapes)


def surface_points_world(params: SQParams, n_samples: int = 1000) -> Array:
    """Sampled world-frame surface points: [..., S, 3].

    Reference behavior: sq_libs.py:577-595 (compute_ellipsoid_points) —
    sample the canonical surface, rotate by rotz(angle), translate.
    """
    a = effective_scales(params)
    eps = effective_epsilons(params)
    pts, _ = sampler.sample_surface_points(a, eps, n_samples=n_samples)
    R = geo.rotz(params.angle)
    pts = jnp.einsum("...ij,...sj->...si", R, pts)
    return pts + params.translate[..., None, :]


def projected_bbox(params: SQParams, P_cw: Array, n_samples: int = 256) -> Array:
    """Project the surface to an image and take pixel extremes -> [..., 4] xyxy.

    Reference behavior: sq_libs.py:547-554 (get_bbox).
    """
    pts = surface_points_world(params, n_samples)
    hom = geo.to_homogeneous(pts)
    pix = jnp.einsum("...ij,...sj->...si", P_cw, hom)
    uv = pix[..., :2] / jnp.maximum(jnp.abs(pix[..., 2:]), 1e-6)
    lo = jnp.min(uv, axis=-2)
    hi = jnp.max(uv, axis=-2)
    return jnp.concatenate([lo, hi], axis=-1)


def oriented_box_corners(params: SQParams, n_samples: int = 1000) -> Array:
    """Oriented (z-up) 3D box of the optimized surface: [..., 8, 3].

    Reference pipeline: compute_ellipsoid_points -> compute_oriented_bbox
    (run_multi_view.py:64-69).  Uses the on-device min-area sweep.
    """
    from ..utils import boxes as box_ops

    pts = surface_points_world(params, n_samples)
    flat = pts.reshape((-1,) + pts.shape[-2:])
    corners = jax.vmap(box_ops.oriented_bbox_3d_sweep)(flat)
    return corners.reshape(pts.shape[:-2] + (8, 3))
