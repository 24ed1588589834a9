"""Levenberg–Marquardt superquadric solver — the fast-convergence mapping path.

The Adam path (odam_tpu.mapping.optimizer) replicates the reference's
optimization semantics exactly; this module is the TPU-first alternative the
north star calls for (BASELINE.json: "vmapped Gauss-Newton/LM loop over
objects"): per-object damped normal-equation steps on smoothed box-edge
residuals, converging in ~20-40 iterations instead of 200.

Key re-formulations that make GN/LM work here:
- the hard min/max pixel extremes (sq_libs.py:402-413) have sparse,
  flickering subgradients; they are replaced by temperature-annealed
  soft extremes (logsumexp), sharpened over the iteration schedule so the
  final objective approaches the reference's;
- residuals are a fixed-shape vector per object ([V, 4] masked edge errors
  + 3 prior rows via the Cholesky factor of the prior inverse covariance);
- Jacobians come from one ``jax.jacfwd`` over the 9 packed parameters
  (9 forward passes, batched over all objects), J^T J is a 9x9 solve —
  tiny, so the whole iteration is dominated by the same batched projection
  contractions as the Adam path;
- damping follows a standard multiplicative Marquardt schedule with
  accept/reject, implemented branchlessly inside the scan.
"""
from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp

from ..utils import geometry as geo
from . import superquadric as sq
from .optimizer import PRIOR_WEIGHT, VALID_Z, OptimizeResult

Array = jax.Array

N_PARAMS = 9  # translate(3) + angle(1) + scales(3) + shapes(2)


def _pack(params: sq.SQParams) -> Array:
    return jnp.concatenate(
        [params.translate, params.angle[..., None], params.scales, params.shapes],
        axis=-1,
    )


def _unpack(x: Array) -> sq.SQParams:
    return sq.SQParams(
        translate=x[..., 0:3], angle=x[..., 3], scales=x[..., 4:7],
        shapes=x[..., 7:9],
    )


def _soft_extremes(params: sq.SQParams, P_cw: Array, n_samples: int,
                   temp: Array) -> Array:
    """Soft min/max pixel extremes: [O, V, 4] (xmin, ymin, xmax, ymax).

    softmax-weighted extremes with invalid (z <= 0.5) samples excluded;
    as temp -> inf this approaches the reference's hard extremes.
    """
    pts = sq.surface_points_world(params, n_samples)           # [O, S, 3]
    hom = geo.to_homogeneous(pts)
    pix = jnp.einsum("ovij,osj->ovsi", P_cw, hom)              # [O, V, S, 3]
    z = pix[..., 2]
    valid = z > VALID_Z
    uv = pix[..., :2] / (jnp.abs(pix[..., 2:]) + 1e-6)
    x = uv[..., 0]
    y = uv[..., 1]
    neg = -1e9

    def soft_max(v):
        logits = jnp.where(valid, v * temp, neg)
        w = jax.nn.softmax(logits, axis=-1)
        return jnp.sum(w * jnp.where(valid, v, 0.0), axis=-1)

    return jnp.stack(
        [-soft_max(-x), -soft_max(-y), soft_max(x), soft_max(y)], axis=-1
    )


@partial(
    jax.jit,
    static_argnames=("n_iters", "n_samples", "representation", "use_prior"),
)
def optimize_superquadrics_lm(
    init_params: sq.SQParams,
    boxes: Array,
    box_mask: Array,
    view_mask: Array,
    P_cw: Array,
    optimize_mask: Array,
    prior_invcov: Array | None = None,
    *,
    n_iters: int = 30,
    n_samples: int = 512,
    representation: str = "super_quadric",
    use_prior: bool = True,
    lambda_init: float = 1e-2,
    temp_start: float = 2.0,
    temp_end: float = 50.0,
    anchor_weight: float = 0.1,
) -> OptimizeResult:
    """LM solve over all objects of a scene (same contract as the Adam path).

    Args match :func:`odam_tpu.mapping.optimizer.optimize_superquadrics`.

    ``anchor_weight``: weak pull of the translation toward the detector-
    average init, in units of (mean observed box diagonal) px per meter.
    Few-view / heavily-masked constraint sets are genuinely ambiguous —
    several 3D boxes reproject to the same observed edges.  The reference's
    Adam path resolves the ambiguity *implicitly* (200 small steps from the
    detector init stay in its basin); an unregularized LM jumps to whichever
    consistent solution its first Gauss-Newton steps reach (measured up to
    -0.46 IoU vs Adam on the lm_envelope_sweep grid, at image residuals
    within 0.004 of Adam's — indistinguishable in image space).  The anchor
    makes the bias explicit: when data constrains the solution, edge terms
    dominate (O(10 px) vs O(0.1·diag·|dt|) for sub-meter moves); under
    ambiguity the anchor is the tie-breaker.  Weight 0.1 measured best of
    {0.03, 0.1} on the sweep grid (0.03 left v10 boundary cells failing).
    """
    assert representation in sq.REPRESENTATIONS
    O, V, _ = boxes.shape
    scales_init = init_params.scales
    if prior_invcov is None:
        prior_invcov = jnp.zeros((O, 3, 3), boxes.dtype)
    # Cholesky of the (PSD) prior metric; jitter for zero blocks.
    prior_chol = jnp.linalg.cholesky(
        PRIOR_WEIGHT * prior_invcov + 1e-8 * jnp.eye(3)
    ) if use_prior else jnp.zeros((O, 3, 3), boxes.dtype)

    active = box_mask * view_mask[..., None]                 # [O, V, 4]
    n_valid = jnp.maximum(jnp.sum(view_mask, axis=-1), 1.0)  # [O]
    res_scale = 1.0 / jnp.sqrt(n_valid)[:, None]             # mean-like norm

    # Translation-anchor strength: anchor_weight x mean observed box diagonal
    # (px/m), so one constant works across image and object scales.
    diag = jnp.sqrt(
        (boxes[..., 2] - boxes[..., 0]) ** 2
        + (boxes[..., 3] - boxes[..., 1]) ** 2
    )
    diag = jnp.where(jnp.isnan(diag), 0.0, diag) * view_mask
    mean_diag = jnp.sum(diag, axis=-1) / n_valid             # [O]
    anchor_w = anchor_weight * mean_diag                     # [O]
    t_init = _pack(init_params)[:, 0:3]

    shapes_free = 1.0 if representation == "super_quadric" else 0.0
    param_free = jnp.concatenate(
        [jnp.ones(7), jnp.full(2, shapes_free)]
    )

    x0 = _pack(init_params)
    lam0 = jnp.full((O,), lambda_init)

    log_t0 = jnp.log(temp_start)
    log_t1 = jnp.log(temp_end)

    # The Jacobian is differentiated per object under vmap (jacfwd of the
    # full [O, 9] -> [O, R] map would build a block-diagonal [O, R, O, 9]
    # intermediate).
    def residuals_single(x_o, P_o, boxes_o, active_o, rs_o, chol_o, s_init_o,
                         aw_o, t_init_o, temp):
        p = sq.SQParams(
            translate=x_o[0:3][None], angle=x_o[3][None], scales=x_o[4:7][None],
            shapes=x_o[7:9][None],
        )
        pred = _soft_extremes(p, P_o[None], n_samples, temp)[0]  # [V, 4]
        r_edge = (pred - boxes_o) * active_o * rs_o
        r_edge = jnp.where(jnp.isnan(r_edge), 0.0, r_edge)
        r_prior = chol_o @ (x_o[4:7] - s_init_o)
        r_anchor = aw_o * (x_o[0:3] - t_init_o)
        return jnp.concatenate([r_edge.reshape(V * 4), r_prior, r_anchor])

    def lm_step(carry, it):
        x, lam = carry
        frac = it / max(n_iters - 1, 1)
        temp = jnp.exp(log_t0 + (log_t1 - log_t0) * frac)
        # Anchor schedule: full strength early (basin selection happens in
        # the first large Gauss-Newton jumps), decayed to ~2% by the final
        # iteration so well-constrained solves refine on data alone.  Under
        # true ambiguity the late iterations cannot drift back: the
        # along-null-space gradient is ~0 and Marquardt damping bounds the
        # step, so the solution stays where the early anchor left it.
        anchor_decay = jnp.exp(-4.0 * frac)

        def per_obj(x_o, P_o, b_o, a_o, rs_o, c_o, si_o, aw_o, ti_o, lam_o, on):
            r = residuals_single(x_o, P_o, b_o, a_o, rs_o, c_o, si_o, aw_o,
                                 ti_o, temp)
            J = jax.jacfwd(residuals_single)(x_o, P_o, b_o, a_o, rs_o, c_o,
                                             si_o, aw_o, ti_o, temp)
            J = J * param_free[None, :]
            g = J.T @ r                                       # [9]
            H = J.T @ J                                       # [9, 9]
            A = H + lam_o * jnp.eye(N_PARAMS) * (jnp.diag(H) + 1e-6)
            dx = jnp.linalg.solve(A, g) * param_free
            x_new = x_o - dx
            r_new = residuals_single(x_new, P_o, b_o, a_o, rs_o, c_o, si_o,
                                     aw_o, ti_o, temp)
            better = jnp.sum(r_new ** 2) < jnp.sum(r ** 2)
            accept = better & on
            x_out = jnp.where(accept, x_new, x_o)
            lam_out = jnp.clip(
                jnp.where(better, lam_o * 0.5, lam_o * 4.0), 1e-6, 1e4
            )
            return x_out, lam_out, jnp.sum(jnp.where(accept, r_new ** 2, r ** 2))

        x, lam, losses = jax.vmap(per_obj)(
            x, P_cw, boxes, active, res_scale[:, 0],
            prior_chol, scales_init, anchor_w * anchor_decay, t_init, lam,
            optimize_mask,
        )
        return (x, lam), jnp.sum(losses * optimize_mask)

    (x_final, _), loss_log = jax.lax.scan(
        lm_step, (x0, lam0), jnp.arange(n_iters)
    )
    params = _unpack(x_final)

    corners = sq.oriented_box_corners(params, max(n_samples, 512))
    dims_init = 2.0 * scales_init ** 2
    corners_det = geo.box3d_corners(dims_init, init_params.angle, init_params.translate)
    keep = optimize_mask[:, None, None]
    corners = jnp.where(keep, corners, corners_det)
    return OptimizeResult(
        params=params, loss_log=loss_log, corners=corners,
        corners_detector=corners_det,
    )


# ---------------------------------------------------------------------------
# Envelope + auto-fallback
# ---------------------------------------------------------------------------
#
# Measured envelope.  Round 2 derived thresholds from a 12-case qualitative
# sweep (tests/test_lm_solver.py::test_lm_robustness_sweep); round 3
# densified the boundary with a 50-case edge_frac x aspect grid at several
# view counts (scripts/lm_envelope_sweep.py), which exposed the dominant
# failure mode: under few/masked views the constraint set is AMBIGUOUS
# (multiple 3D boxes reproject to the same edges — failed LM solutions sat
# within 0.004 normalized residual of Adam's), and unanchored LM jumps to
# the wrong consistent solution while Adam's 200 small steps stay in the
# detector-init basin.  The translation anchor (anchor_weight above) makes
# that bias explicit (decayed over iterations — constant anchoring held
# data-constrained narrow-arc solves at the offset init); re-measured with
# it (IoU delta LM - Adam, same grid):
#
#   n_views=10 (the ambiguity regime): edge_frac>=0.4 & aspect>=0.09 all
#                positive, +0.02..+0.17 (LM WINS — soft extremes + anchor
#                average noise better than hard extremes); edge_frac 0.3
#                still fails at aspect<=0.12 (-0.27..-0.36);
#   n_views=24:  in-envelope worst -0.041, rest within +-0.03..+0.12;
#   n_views=48 (4 seeds): in-envelope means 0+-0.04, sporadic single-seed
#                -0.1 cells — the same noise band the unanchored solver
#                showed; no systematic loss;
#   aspect 0.06 (ultra-thin) fails at every view count: -0.08..-0.49.
#
# Thresholds sit one grid step inside the measured-good region: edge_frac
# 0.5 (0.4 measured good), aspect 0.12 (0.09 measured good; widened from
# round 2's 0.16 — the anchor fixed the thin-object boundary cells).  Both
# are computable from the INPUTS, so the auto path routes out-of-envelope
# objects to the reference-exact Adam solve up front.

ENVELOPE_EDGE_FRAC_MIN = 0.5
ENVELOPE_ASPECT_MIN = 0.12

# A-posteriori acceptance gate (the envelope above is a-priori: computable
# from the inputs alone).  Honesty note from the calibration sweep: this
# gate CANNOT catch ambiguity failures — those solutions fit the observed
# edges as well as Adam's (residuals within 0.004; the translation anchor
# is what prevents them).  It exists as a divergence safety net: a solve
# that leaves the observations entirely (numerical blowup, degenerate
# Jacobian) shows residuals far above both the Adam noise floor (<= 0.015
# measured) and the superquadric-vs-box representation floor (~0.08 at true
# parameters), and gets re-routed to Adam.
ACCEPT_RESID_MAX = 0.2


def lm_envelope_ok(init_params: sq.SQParams, box_mask: Array, view_mask: Array,
                   edge_frac_min: float = ENVELOPE_EDGE_FRAC_MIN,
                   aspect_min: float = ENVELOPE_ASPECT_MIN) -> Array:
    """[O] bool — objects inside the measured LM-matches-Adam envelope."""
    n_views = jnp.maximum(jnp.sum(view_mask, axis=-1), 1.0)
    edge_frac = jnp.sum(box_mask * view_mask[..., None], axis=(-2, -1)) / (4.0 * n_views)
    dims = 2.0 * init_params.scales ** 2
    aspect = jnp.min(dims, axis=-1) / jnp.maximum(jnp.max(dims, axis=-1), 1e-6)
    return (edge_frac >= edge_frac_min) & (aspect >= aspect_min)


@partial(jax.jit, static_argnames=("n_samples",))
def normalized_fit_residual(params: sq.SQParams, boxes: Array, box_mask: Array,
                            view_mask: Array, P_cw: Array,
                            n_samples: int = 512) -> Array:
    """[O] mean hard-extreme edge error / mean observed box diagonal.

    The reference objective's own residual (optimizer.projected_extremes,
    sq_libs.py:395-430 semantics) evaluated at a solution, scale-normalized
    so one threshold works across image sizes and object scales.  NaN-safe:
    inactive constraints contribute nothing.
    """
    from .optimizer import projected_extremes

    pred = projected_extremes(params, P_cw, n_samples)          # [O, V, 4]
    active = box_mask * view_mask[..., None]
    err = jnp.abs(pred - boxes)
    err = jnp.where(jnp.isnan(err) | (active == 0), 0.0, err)
    mean_err = jnp.sum(err, axis=(-2, -1)) / jnp.maximum(
        jnp.sum(active, axis=(-2, -1)), 1.0
    )
    diag = jnp.sqrt(
        (boxes[..., 2] - boxes[..., 0]) ** 2
        + (boxes[..., 3] - boxes[..., 1]) ** 2
    )
    diag = jnp.where(jnp.isnan(diag), 0.0, diag) * view_mask
    mean_diag = jnp.sum(diag, axis=-1) / jnp.maximum(
        jnp.sum(view_mask, axis=-1), 1.0
    )
    return mean_err / jnp.maximum(mean_diag, 1e-6)


def optimize_superquadrics_auto(
    init_params: sq.SQParams,
    boxes: Array,
    box_mask: Array,
    view_mask: Array,
    P_cw: Array,
    optimize_mask: Array,
    prior_invcov: Array | None = None,
    *,
    n_iters: int = 30,
    n_samples: int = 512,
    adam_iters: int = 200,
    adam_samples: int = 1000,
    representation: str = "super_quadric",
    use_prior: bool = True,
    accept_resid: float | None = ACCEPT_RESID_MAX,
) -> OptimizeResult:
    """LM for in-envelope objects, reference-exact Adam fallback outside it.

    Two gates route an object to the Adam fallback:
    1. a-priori: outside the measured envelope (heavily masked edges or
       near-degenerate aspect — ``lm_envelope_ok``);
    2. a-posteriori: the LM solution's own hard-extreme residual exceeds
       ``accept_resid`` × (mean observed box diagonal) — a basin failure the
       input-side envelope cannot predict (``normalized_fit_residual``;
       pass ``accept_resid=None`` to disable).

    Typical scenes stay all-LM (one 0.2 s solve); any fallback costs one
    extra batched Adam pass (~0.5 s), never a per-object loop.

    The returned ``loss_log`` is the LM pass's per-iteration total over the
    in-envelope objects only — out-of-envelope objects are excluded from the
    LM solve entirely, so the trace corresponds to the returned LM solutions
    (the Adam pass's convergence trace is not returned; residual-rejected
    objects' LM iterations remain in the trace).
    """
    from . import optimizer as adam_opt

    ok = lm_envelope_ok(init_params, box_mask, view_mask)
    res = optimize_superquadrics_lm(
        init_params, boxes, box_mask, view_mask, P_cw, optimize_mask & ok,
        prior_invcov, n_iters=n_iters, n_samples=n_samples,
        representation=representation, use_prior=use_prior,
    )
    fallback = optimize_mask & ~ok
    if accept_resid is not None:
        resid = normalized_fit_residual(
            res.params, boxes, box_mask, view_mask, P_cw, n_samples=n_samples
        )
        fallback = fallback | (optimize_mask & ok & (resid > accept_resid))
    if not bool(jnp.any(fallback)):
        return res
    res_adam = adam_opt.optimize_superquadrics(
        init_params, boxes, box_mask, view_mask, P_cw, fallback,
        prior_invcov, n_iters=adam_iters, n_samples=adam_samples,
        representation=representation, use_prior=use_prior,
    )

    def pick(a, b, extra_dims):
        m = fallback.reshape(fallback.shape + (1,) * extra_dims)
        return jnp.where(m, a, b)

    params = sq.SQParams(
        translate=pick(res_adam.params.translate, res.params.translate, 1),
        angle=pick(res_adam.params.angle, res.params.angle, 0),
        scales=pick(res_adam.params.scales, res.params.scales, 1),
        shapes=pick(res_adam.params.shapes, res.params.shapes, 1),
    )
    return OptimizeResult(
        params=params,
        loss_log=res.loss_log,
        corners=pick(res_adam.corners, res.corners, 2),
        corners_detector=res.corners_detector,
    )
