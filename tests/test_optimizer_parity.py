"""Parity of the mapping optimizer against the reference SuperQuadricOptimizer.

Imports the reference sq_libs with its compiled sampler stubbed by a
test-local torch surface evaluator that consumes OUR deterministic angles —
so both optimizers see identical surface samples, identical constraints, and
identical Adam hyperparameters.  Verifies that loss trajectories and
recovered translations match.
"""
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "src")), reason="reference not mounted"
)


@pytest.fixture(scope="module")
def ref_sq_libs():
    import torch

    # --- stub torchvision (box_utils import chain)
    tv = types.ModuleType("torchvision")
    tv_ops = types.ModuleType("torchvision.ops")
    tv_boxes = types.ModuleType("torchvision.ops.boxes")
    tv_boxes.box_area = lambda b: (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    tv_ops.boxes = tv_boxes
    tv.ops = tv_ops
    for name, mod in [("torchvision", tv), ("torchvision.ops", tv_ops),
                      ("torchvision.ops.boxes", tv_boxes)]:
        sys.modules.setdefault(name, mod)

    # --- stub learnable_primitives.sampling: same parametric surface, with
    # angles supplied by OUR deterministic sampler (detached, as in the
    # reference where angles come from CPU C++).
    from odam_tpu.ops import sampler as our_sampler
    import jax.numpy as jnp

    lp = types.ModuleType("learnable_primitives")
    lp_s = types.ModuleType("learnable_primitives.sampling")

    class EqualDistanceSamplerSQ:
        def __init__(self, n_samples, *a, **k):
            self.n_samples = n_samples

    def sample_points_on_surface(shape_params, epsilons, sq_sampler):
        etas_j, omegas_j = our_sampler.sample_sq_angles(
            jnp.asarray(shape_params.detach().numpy()),
            jnp.asarray(epsilons.detach().numpy()),
            n_samples=sq_sampler.n_samples,
        )
        etas = torch.tensor(np.asarray(etas_j))
        omegas = torch.tensor(np.asarray(omegas_j))
        etas[etas == 0] += 1e-6
        omegas[omegas == 0] += 1e-6

        def fexp(x, p):
            return torch.sign(x) * torch.abs(x).clamp(min=1e-6) ** p

        a1 = shape_params[:, :, 0].unsqueeze(-1)
        a2 = shape_params[:, :, 1].unsqueeze(-1)
        a3 = shape_params[:, :, 2].unsqueeze(-1)
        e1 = epsilons[:, :, 0].unsqueeze(-1)
        e2 = epsilons[:, :, 1].unsqueeze(-1)
        x = a1 * fexp(torch.cos(etas), e1) * fexp(torch.cos(omegas), e2)
        y = a2 * fexp(torch.cos(etas), e1) * fexp(torch.sin(omegas), e2)
        z = a3 * fexp(torch.sin(etas), e1)
        clamp = lambda v: ((v > 0).float() * 2 - 1) * torch.max(  # noqa: E731
            torch.abs(v), torch.tensor(1e-6)
        )
        return torch.stack([clamp(x), clamp(y), clamp(z)], -1), None

    lp_s.EqualDistanceSamplerSQ = EqualDistanceSamplerSQ
    lp_s.sample_points_on_surface = sample_points_on_surface
    lp.sampling = lp_s
    sys.modules["learnable_primitives"] = lp
    sys.modules["learnable_primitives.sampling"] = lp_s

    sys.path.insert(0, REF)
    cwd = os.getcwd()
    os.chdir(REF)  # sq_libs loads ./src/super_quadric/scale_prior relatively
    try:
        import importlib

        yield importlib.import_module("src.super_quadric.sq_libs")
    finally:
        os.chdir(cwd)
        sys.path.remove(REF)


def _scene(rng, n_views=10):
    """GT box + cameras + observed 2D boxes, in both formats."""
    import jax.numpy as jnp

    from odam_tpu.utils import geometry as geo

    K = np.array([[400.0, 0, 320], [0, 400.0, 240], [0, 0, 1]])
    center = np.array([0.2, -0.1, 0.8])
    dims = np.array([0.9, 0.7, 1.1])
    yaw = 0.5

    corners = np.asarray(
        geo.box3d_corners(jnp.asarray(dims), jnp.asarray(yaw), jnp.asarray(center))
    )
    Ps, boxes = [], []
    for k in range(n_views):
        phi = 2 * np.pi * k / n_views
        cam = center + 3.0 * np.array([np.cos(phi), np.sin(phi), 0.4])
        fwd = center - cam
        fwd /= np.linalg.norm(fwd)
        right = np.cross(fwd, [0, 0, 1.0])
        right /= np.linalg.norm(right)
        down = np.cross(fwd, right)
        T_wc = np.eye(4)
        T_wc[:3, 0], T_wc[:3, 1], T_wc[:3, 2], T_wc[:3, 3] = right, down, fwd, cam
        P = K @ np.linalg.inv(T_wc)[:3, :]
        hom = np.concatenate([corners, np.ones((8, 1))], 1)
        uv = hom @ P.T
        uv = uv[:, :2] / uv[:, 2:]
        box = np.array([uv[:, 0].min(), uv[:, 1].min(), uv[:, 0].max(), uv[:, 1].max()])
        box += rng.normal(0, 1.0, 4)
        Ps.append(P)
        boxes.append(box)
    return np.asarray(Ps), np.asarray(boxes), center, dims, yaw


def test_optimizer_trajectory_parity(ref_sq_libs, rng):
    import jax.numpy as jnp

    from odam_tpu.mapping import optimizer as our_opt, superquadric as sq

    Ps, boxes, center, dims, yaw = _scene(rng)
    n_views = len(Ps)
    init_t = center + np.array([0.3, -0.2, 0.15])
    init_dims = dims * 1.3
    n_iters = 60
    n_samples = 300

    # ---- reference optimizer (prior off for a pure-geometry comparison)
    ref = ref_sq_libs.SuperQuadricOptimizer(
        init_t.copy(), yaw, init_dims.copy(), obj_class=5,
        representation="super_quadric", prior=False,
    )
    ref.Q_init.sampler.n_samples = n_samples  # match sample counts
    gt_lines = [
        {
            "x_min": np.array([1, 0, -b[0]]),
            "y_min": np.array([0, 1, -b[1]]),
            "x_max": np.array([1, 0, -b[2]]),
            "y_max": np.array([0, 1, -b[3]]),
        }
        for b in boxes
    ]
    ref_q = ref.run(gt_lines, None, Ps.astype(np.float32), n_iters=n_iters)
    ref_losses = [float(l[0]) for l in ref.loss_log]
    ref_t = ref_q.translate.detach().numpy()

    # ---- our optimizer on identical constraints
    init = sq.init_params(
        jnp.asarray(init_t[None].astype(np.float32)),
        jnp.asarray(np.array([yaw], np.float32)),
        jnp.asarray(init_dims[None].astype(np.float32)),
    )
    res = our_opt.optimize_superquadrics(
        init,
        jnp.asarray(boxes[None].astype(np.float32)),
        jnp.ones((1, n_views, 4), jnp.float32),
        jnp.ones((1, n_views), jnp.float32),
        jnp.asarray(Ps[None].astype(np.float32)),
        jnp.ones((1,), bool),
        None,
        n_iters=n_iters,
        n_samples=n_samples,
        use_prior=False,
    )
    our_losses = np.asarray(res.loss_log)
    our_t = np.asarray(res.params.translate[0])

    # Same starting loss (identical surface samples + identical loss math).
    np.testing.assert_allclose(our_losses[0], ref_losses[0], rtol=1e-3)
    # Trajectories track each other (both standard Adam, lr 0.01/0.1).
    np.testing.assert_allclose(our_losses[:10], ref_losses[:10], rtol=0.05)
    # Final states agree.
    np.testing.assert_allclose(our_t, ref_t, atol=0.05)
    np.testing.assert_allclose(
        our_losses[-1], ref_losses[-1], rtol=0.25
    )
    # Both converged toward the GT center.
    assert np.linalg.norm(our_t - center) < np.linalg.norm(init_t - center)


def test_surface_points_match_reference(ref_sq_libs):
    """SuperQuadric.compute_ellipsoid_points (reference torch path, stubbed
    sampler) vs our surface_points_world on identical parameters."""
    import jax.numpy as jnp

    from odam_tpu.mapping import superquadric as sq

    t = np.array([0.5, -1.0, 0.3])
    yaw = 0.8
    scales_root = np.sqrt(np.array([1.2, 0.8, 1.5]) / 2)
    ref_q = ref_sq_libs.SuperQuadric(
        t.copy(), yaw, scales_root.copy(), shapes=np.array([0.0, 0.0])
    )
    ref_q.sampler.n_samples = 200
    ref_pts, _ = ref_q.compute_ellipsoid_points(use_numpy=True)

    params = sq.SQParams(
        translate=jnp.asarray(t[None].astype(np.float32)),
        angle=jnp.asarray(np.array([yaw], np.float32)),
        scales=jnp.asarray(scales_root[None].astype(np.float32)),
        shapes=jnp.zeros((1, 2), jnp.float32),
    )
    our_pts = np.asarray(sq.surface_points_world(params, n_samples=200))[0]
    np.testing.assert_allclose(our_pts, ref_pts, atol=1e-4)


def test_plane_constraint_3d_parity(ref_sq_libs):
    """Our dual-quadric plane-tangency residual equals the reference's
    QuadricOptimizer.constraint_3d (sq_libs.py:170-192) on random quadrics."""
    import jax.numpy as jnp
    import torch

    from odam_tpu.mapping import quadric as quad_mod

    rng = np.random.default_rng(5)
    t = rng.normal(size=3)
    angle = rng.uniform(-np.pi, np.pi)
    scale_sq = rng.uniform(0.2, 2.0, 3)
    Q = np.asarray(quad_mod.quadric_matrix(
        jnp.asarray(t, jnp.float32), jnp.asarray(np.float32(angle)),
        jnp.asarray(scale_sq, jnp.float32),
    ), np.float64)

    P = 7
    normals = rng.normal(size=(P, 3))
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    planes = np.concatenate([normals, rng.normal(size=(P, 1))], axis=1)

    ref = ref_sq_libs.QuadricOptimizer.constraint_3d(
        None, torch.tensor(Q).float(), torch.tensor(planes).float()
    )
    ours = quad_mod.plane_distance_residual(
        jnp.asarray(Q, jnp.float32)[None],
        jnp.asarray(planes, jnp.float32)[None],
        jnp.ones((1, P), jnp.float32),
    )
    np.testing.assert_allclose(float(ours[0]), float(ref), rtol=1e-4)
