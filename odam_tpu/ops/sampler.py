"""Deterministic equal-distance angle sampling on superquadric surfaces.

The reference implements Pilu & Fisher (BMVC 1995) equal-distance sampling as
a recursive C++ divide-and-conquer over superellipse arcs followed by seeded
random draws (reference: fast_sampler/sampling.cpp:76-215, _sampler.pyx:383-441,
seed=0).  That computation is host-serial and data-dependent — hostile to XLA.

This module re-derives the same goal — angle pairs whose surface points are
approximately equidistant / uniformly distributed — as a fixed-shape,
fully-vectorized inverse-CDF construction:

1. ``equal_arclength_angles``: a dense theta grid -> cumulative superellipse
   chord length -> inverse-CDF at K uniform levels.  This is exactly the
   quantity the reference's divide-and-conquer approximates (equal 2D
   arclength spacing along the superellipse cross-sections).
2. ``sample_sq_angles``: latitudes are importance-weighted by the local
   circumference factor (a1+a2) * |cos eta|^e1 — the same CDF the reference
   builds in sample_etas (sampling.cpp:128-155) — and drawn at N *stratified*
   quantiles instead of N pseudo-random ones; longitudes are paired via a
   golden-ratio lattice, giving a deterministic low-discrepancy cover of the
   (eta, omega) torus instead of the reference's mt19937 draws.

Determinism: bit-identical across runs and devices by construction (the
reference needed a fixed seed for this; SURVEY.md §5 "determinism anchors").
Everything jits and vmaps over batches of superquadrics.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .surface import fexp, sq_surface_points

Array = jax.Array

# Dense grid used to tabulate arclength CDFs (static).
_DENSE = 512


def _superellipse_xy(theta: Array, a1: Array, a2: Array, e: Array) -> Array:
    """Point on the superellipse (a1*f(cos,e), a2*f(sin,e)); [..., T] -> [..., T, 2]."""
    x = a1[..., None] * fexp(jnp.cos(theta), e[..., None])
    y = a2[..., None] * fexp(jnp.sin(theta), e[..., None])
    return jnp.stack([x, y], axis=-1)


def equal_arclength_angles(a1: Array, a2: Array, e: Array,
                           theta_min: float, theta_max: float,
                           num_out: int, dense: int = _DENSE) -> Array:
    """K angles equally spaced in superellipse arclength over [theta_min, theta_max].

    Args:
        a1, a2, e: [...] superellipse axes and exponent (broadcast batch).
        num_out: K, number of output angles (static).

    Returns:
        [..., K] monotonically spaced angles.
    """
    theta = jnp.linspace(theta_min, theta_max, dense)
    theta = jnp.broadcast_to(theta, a1.shape + (dense,))
    pts = _superellipse_xy(theta, a1, a2, e)
    seg = jnp.linalg.norm(jnp.diff(pts, axis=-2), axis=-1)  # [..., dense-1]
    cdf = jnp.concatenate(
        [jnp.zeros_like(seg[..., :1]), jnp.cumsum(seg, axis=-1)], axis=-1
    )
    total = cdf[..., -1:]
    cdf = cdf / jnp.maximum(total, 1e-12)
    levels = jnp.linspace(0.0, 1.0, num_out)
    # Invert the per-batch CDF: for each level find the surrounding grid cell.
    idx = jnp.clip(
        jnp.sum(cdf[..., None, :] <= levels[:, None], axis=-1) - 1, 0, dense - 2
    )  # [..., K]
    c0 = jnp.take_along_axis(cdf, idx, axis=-1)
    c1 = jnp.take_along_axis(cdf, idx + 1, axis=-1)
    t0 = jnp.take_along_axis(theta, idx, axis=-1)
    t1 = jnp.take_along_axis(theta, idx + 1, axis=-1)
    frac = (levels - c0) / jnp.maximum(c1 - c0, 1e-12)
    return t0 + frac * (t1 - t0)


# Golden-ratio fraction used for the low-discrepancy eta/omega pairing.
_PHI_FRAC = 0.6180339887498949


@partial(jax.jit, static_argnames=("n_samples", "grid"))
def sample_sq_angles(scales: Array, epsilons: Array, n_samples: int = 1000,
                     grid: int = 201) -> tuple[Array, Array]:
    """Deterministic (eta, omega) samples approximately uniform on the surface.

    Args:
        scales: [..., 3] superquadric axis scales (a1, a2, a3).
        epsilons: [..., 2] shape exponents (e1, e2), already squashed.
        n_samples: S, number of angle pairs (static; reference uses 1000).
        grid: K, equal-arclength grid resolution (static; reference buffer 201).

    Returns:
        (etas [..., S], omegas [..., S]); gradients are stopped, matching the
        reference's detached CPU sampling (sampling.py:586-595).
    """
    a1 = scales[..., 0]
    a2 = scales[..., 1]
    a3 = scales[..., 2]
    e1 = epsilons[..., 0]
    e2 = epsilons[..., 1]

    # Latitude grid: equal arclength on the (a1, a3) superellipse profile,
    # swept pi/2 -> -pi/2 as in sampling.cpp:183-190.
    eta_grid = equal_arclength_angles(a1, a3, e1, jnp.pi / 2, -jnp.pi / 2, grid)
    # Longitude grid: equal arclength on the (a1, a2) equatorial superellipse.
    omega_grid = equal_arclength_angles(a1, a2, e2, jnp.pi, -jnp.pi, grid)

    # Latitude importance weights ~ circumference of the latitude ring,
    # the same CDF the reference builds (sampling.cpp:137-148): smoothing +
    # (a1 + a2) * f(cos eta, e1).
    smoothing = 1e-3
    w = smoothing + (a1 + a2)[..., None] * fexp(jnp.cos(eta_grid), e1[..., None])
    w = jnp.maximum(w, 0.0)
    cdf = jnp.cumsum(w, axis=-1)
    cdf = cdf / jnp.maximum(cdf[..., -1:], 1e-12)

    # Stratified quantile levels instead of mt19937 draws: deterministic and
    # lower-variance than the reference's random choice.
    levels = (jnp.arange(n_samples) + 0.5) / n_samples
    idx = jnp.clip(
        jnp.sum(cdf[..., None, :] < levels[:, None], axis=-1), 0, grid - 1
    )
    etas = jnp.take_along_axis(eta_grid, idx, axis=-1)

    # Longitudes: golden-ratio lattice over the equal-arclength grid — a
    # deterministic low-discrepancy pairing across the (eta, omega) torus.
    frac = jnp.mod(jnp.arange(n_samples) * _PHI_FRAC, 1.0)
    omega_idx = jnp.clip((frac * grid).astype(jnp.int32), 0, grid - 1)
    omegas = jnp.take_along_axis(
        omega_grid, jnp.broadcast_to(omega_idx, etas.shape), axis=-1
    )
    return jax.lax.stop_gradient(etas), jax.lax.stop_gradient(omegas)


def sample_surface_points(scales: Array, epsilons: Array, n_samples: int = 1000,
                          grid: int = 201) -> tuple[Array, Array]:
    """Sampled surface points + normals of a superquadric batch.

    Equivalent capability to the reference's sample_points_on_surface
    (sampling.py:558-622): angles come from the deterministic sampler
    (detached), the point coordinates stay differentiable w.r.t.
    scales/epsilons through the trig expressions.

    Args:
        scales: [..., 3], epsilons: [..., 2].

    Returns:
        (points [..., S, 3], normals [..., S, 3]).
    """
    etas, omegas = sample_sq_angles(scales, epsilons, n_samples, grid)
    return sq_surface_points(scales, epsilons, etas, omegas)
