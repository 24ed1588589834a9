import jax
import jax.numpy as jnp
import numpy as np
import scipy.optimize
import pytest

from odam_tpu.ops import surface, sampler, sinkhorn, lap


# ---------------------------------------------------------------------------
# surface
# ---------------------------------------------------------------------------

def test_fexp_sign_preserving():
    x = jnp.array([-8.0, -1.0, 0.5, 8.0])
    out = np.asarray(surface.fexp(x, jnp.asarray(1.0 / 3.0)))
    np.testing.assert_allclose(out, [-2.0, -1.0, 0.5 ** (1 / 3), 2.0], rtol=1e-5)


def test_squash_shape_range():
    out = np.asarray(surface.squash_shape(jnp.array([-1e4, 0.0, 1e4])))
    np.testing.assert_allclose(out, [0.2, 0.9, 1.6], atol=1e-4)


def test_sq_surface_sphere():
    """e1=e2=1 and equal scales reduces to a sphere of radius a."""
    scales = jnp.array([2.0, 2.0, 2.0])
    eps = jnp.array([1.0, 1.0])
    etas = jnp.linspace(-np.pi / 2 + 0.1, np.pi / 2 - 0.1, 50)
    omegas = jnp.linspace(-np.pi + 0.1, np.pi - 0.1, 50)
    pts, normals = surface.sq_surface_points(scales, eps, etas, omegas)
    r = np.linalg.norm(np.asarray(pts), axis=-1)
    np.testing.assert_allclose(r, 2.0, rtol=1e-4)
    # normals parallel to points for a sphere
    n = np.asarray(normals)
    cos = np.sum(n * np.asarray(pts), -1) / (np.linalg.norm(n, axis=-1) * r)
    np.testing.assert_allclose(cos, 1.0, atol=1e-4)


def test_sq_surface_gradients_finite():
    def loss(scales, eps):
        etas = jnp.linspace(-jnp.pi / 2, jnp.pi / 2, 64)
        omegas = jnp.linspace(-jnp.pi, jnp.pi, 64)
        pts, _ = surface.sq_surface_points(scales, surface.squash_shape(eps), etas, omegas)
        return jnp.sum(pts ** 2)

    g1, g2 = jax.grad(loss, argnums=(0, 1))(jnp.array([1.0, 0.5, 2.0]), jnp.array([0.0, 0.0]))
    assert np.isfinite(np.asarray(g1)).all()
    assert np.isfinite(np.asarray(g2)).all()


def test_inside_outside():
    scales = jnp.array([1.0, 2.0, 3.0])
    eps = jnp.array([0.5, 0.8])
    pts, _ = surface.sq_surface_points(
        scales, eps, jnp.linspace(-1.4, 1.4, 30), jnp.linspace(-3.0, 3.0, 30)
    )
    F = np.asarray(surface.sq_inside_outside(pts, scales, eps))
    np.testing.assert_allclose(F, 1.0, atol=1e-2)
    inside = np.asarray(surface.sq_inside_outside(jnp.zeros((1, 3)) + 0.01, scales, eps))
    assert (inside < 1).all()


# ---------------------------------------------------------------------------
# sampler
# ---------------------------------------------------------------------------

def test_equal_arclength_circle():
    """On a circle the equal-arclength angles are uniformly spaced."""
    a = jnp.asarray(1.0)
    angles = np.asarray(
        sampler.equal_arclength_angles(a, a, jnp.asarray(1.0), -np.pi, np.pi, 33)
    )
    diffs = np.diff(angles)
    np.testing.assert_allclose(diffs, diffs[0], rtol=2e-2)


def test_sample_sq_angles_shapes_and_determinism():
    scales = jnp.array([[0.5, 0.3, 0.9], [1.0, 1.0, 1.0]])
    eps = jnp.array([[0.3, 1.2], [1.0, 1.0]])
    e1, o1 = sampler.sample_sq_angles(scales, eps, n_samples=256)
    e2, o2 = sampler.sample_sq_angles(scales, eps, n_samples=256)
    assert e1.shape == (2, 256) and o1.shape == (2, 256)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
    assert (np.asarray(e1) >= -np.pi / 2 - 1e-5).all()
    assert (np.asarray(e1) <= np.pi / 2 + 1e-5).all()
    assert (np.asarray(o1) >= -np.pi - 1e-5).all()
    assert (np.asarray(o1) <= np.pi + 1e-5).all()


def test_sampled_points_cover_surface_uniformly():
    """Sampled sphere points should cover all octants roughly evenly."""
    scales = jnp.array([1.0, 1.0, 1.0])
    eps = jnp.array([1.0, 1.0])
    pts, _ = sampler.sample_surface_points(scales, eps, n_samples=1000)
    pts = np.asarray(pts)
    assert pts.shape == (1000, 3)
    octant = (pts[:, 0] > 0).astype(int) * 4 + (pts[:, 1] > 0).astype(int) * 2 + (
        pts[:, 2] > 0
    ).astype(int)
    counts = np.bincount(octant, minlength=8)
    assert counts.min() > 60, counts  # uniform would be 125 per octant
    # extents reach the full radius
    assert pts[:, 2].max() > 0.95 and pts[:, 2].min() < -0.95
    assert pts[:, 0].max() > 0.95 and pts[:, 1].max() > 0.95


def test_sampled_points_bbox_matches_scales():
    """Extents of sampled points should approach the box defined by scales."""
    scales = jnp.array([0.5, 1.5, 0.8])
    eps = jnp.array([0.21, 0.21])  # near-cube
    pts, _ = sampler.sample_surface_points(scales, eps, n_samples=1000)
    ext = np.asarray(pts).max(0)
    np.testing.assert_allclose(ext, np.asarray(scales), rtol=0.08)


# ---------------------------------------------------------------------------
# sinkhorn
# ---------------------------------------------------------------------------

def test_sinkhorn_marginals():
    rng = np.random.default_rng(1)
    scores = jnp.asarray(rng.normal(size=(4, 6)).astype(np.float32))
    Z = sinkhorn.log_optimal_transport(scores, jnp.asarray(1.0), iters=100)
    P = np.exp(np.asarray(Z)) / (4 + 6)
    # rows 0..3 sum to 1/(m+n)*... : each row marginal = 1/(m+n); scaled by (m+n) → 1
    np.testing.assert_allclose(P[:-1].sum(axis=1) * 10, 1.0, atol=1e-3)
    np.testing.assert_allclose(P[:, :-1].sum(axis=0)[: 6] * 10, 1.0, atol=1e-3)
    # dustbin row absorbs n mass
    np.testing.assert_allclose(P[-1].sum() * 10, 6.0, atol=1e-2)


def test_sinkhorn_strong_match_wins():
    scores = jnp.full((3, 3), -5.0)
    scores = scores.at[jnp.arange(3), jnp.arange(3)].set(5.0)
    Z = sinkhorn.log_optimal_transport(scores, jnp.asarray(0.0), iters=100)
    P = np.exp(np.asarray(Z))[:3, :3]
    assert (np.argmax(P, axis=1) == np.arange(3)).all()


def test_sinkhorn_masked_equals_unpadded():
    rng = np.random.default_rng(2)
    s_small = rng.normal(size=(3, 4)).astype(np.float32)
    Z_small = np.asarray(
        sinkhorn.log_optimal_transport(jnp.asarray(s_small), jnp.asarray(0.7), iters=100)
    )
    # pad to (6, 7) with masks
    s_pad = np.full((6, 7), 99.0, np.float32)
    s_pad[:3, :4] = s_small
    rm = np.zeros(6, bool); rm[:3] = True
    cm = np.zeros(7, bool); cm[:4] = True
    Z_pad = np.asarray(
        sinkhorn.log_optimal_transport(
            jnp.asarray(s_pad), jnp.asarray(0.7), iters=100,
            row_mask=jnp.asarray(rm), col_mask=jnp.asarray(cm),
        )
    )
    np.testing.assert_allclose(Z_pad[:3, :4], Z_small[:3, :4], atol=1e-4)
    np.testing.assert_allclose(Z_pad[6, :4], Z_small[3, :4], atol=1e-4)
    np.testing.assert_allclose(Z_pad[:3, 7], Z_small[:3, 4], atol=1e-4)


# ---------------------------------------------------------------------------
# lap
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("shape", [(5, 5), (4, 7), (7, 4), (1, 3), (10, 10)])
def test_lap_matches_scipy(shape):
    rng = np.random.default_rng(hash(shape) % 2**31)
    for _ in range(5):
        cost = rng.normal(size=shape).astype(np.float32)
        ri, ci = lap.linear_sum_assignment(jnp.asarray(cost))
        sri, sci = scipy.optimize.linear_sum_assignment(cost)
        ours = cost[np.asarray(ri), np.asarray(ci)].sum()
        theirs = cost[sri, sci].sum()
        np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_masked_assignment_ignores_padding():
    rng = np.random.default_rng(3)
    cost = rng.normal(size=(4, 5)).astype(np.float32)
    # pad to (8, 9)
    pad = np.full((8, 9), 7.0, np.float32)
    pad[:4, :5] = cost
    rm = np.zeros(8, bool); rm[:4] = True
    cm = np.zeros(9, bool); cm[:5] = True
    col4row = np.asarray(lap.masked_assignment(jnp.asarray(pad), jnp.asarray(rm), jnp.asarray(cm)))
    assert (col4row[4:] == -1).all()
    valid = col4row[:4]
    assert (valid >= 0).all() and (valid < 5).all()
    sri, sci = scipy.optimize.linear_sum_assignment(cost)
    np.testing.assert_allclose(
        cost[np.arange(4), valid].sum(), cost[sri, sci].sum(), atol=1e-4
    )


def test_masked_assignment_near_degenerate_costs():
    """Regression: with a fixed huge pad price (the old 1e6), float32 dual
    potentials lose genuine cost gaps below eps(1e6) ~ 0.06, and the solver
    returns suboptimal assignments on near-degenerate score matrices (the
    associator decode's everyday regime — Sinkhorn scores all ~0.2).
    Caught by the pipeline replay-parity test; the scale-aware pricing must
    match scipy's optimum in heavily-padded layouts."""
    rng = np.random.default_rng(7)
    M, N = 64, 30
    for _ in range(25):
        m = int(rng.integers(2, 9))
        n = int(rng.integers(2, 9))
        S = (0.2 + 0.002 * rng.standard_normal((m, n))).astype(np.float32)
        pad = np.zeros((M, N), np.float32)
        pad[:m, :n] = 1.0 - S
        rm = np.zeros(M, bool); rm[:m] = True
        cm = np.zeros(N, bool); cm[:n] = True
        col = np.asarray(lap.masked_assignment(
            jnp.asarray(pad), jnp.asarray(rm), jnp.asarray(cm)))
        tot = sum(S[i, c] for i, c in enumerate(col[:m]) if c >= 0)
        sri, sci = scipy.optimize.linear_sum_assignment(1.0 - S)
        opt = S[sri, sci].sum()
        np.testing.assert_allclose(tot, opt, atol=2e-6)


def test_match_by_score_threshold():
    score = jnp.asarray(
        np.array(
            [
                [0.9, 0.05, 0.0],
                [0.0, 0.04, 0.0],  # best match below threshold
            ],
            np.float32,
        )
    )
    out = np.asarray(lap.match_by_score(score, 0.1))
    assert out[0] == 0
    assert out[1] == -1  # 0.04 < threshold
    assert out[2] == -1


def test_greedy_peel_matches_exact_on_sharp_scores():
    """On decisive (trained-associator-like) score matrices the greedy peel
    decode agrees with the exact Hungarian decode.  (On ambiguous random
    matrices they can differ — that is why "exact" stays the default.)"""
    rng = np.random.default_rng(7)
    for trial in range(10):
        M, N = 12, 9
        # strong ground-truth assignment + weak clutter
        scores = rng.normal(scale=0.3, size=(M, N)).astype(np.float32) - 3.0
        perm = rng.permutation(M)[:N]
        for d in range(N):
            scores[perm[d], d] = 4.0 + rng.normal(scale=0.2)
        scores = jnp.asarray(scores)
        Z = sinkhorn.log_optimal_transport(scores, jnp.asarray(1.0), iters=100)
        P = jnp.exp(Z[:-1, :-1])
        exact = np.asarray(lap.match_by_score(P, 0.1))
        greedy = np.asarray(lap.greedy_peel_match(P, 0.1))
        np.testing.assert_array_equal(greedy, exact, err_msg=f"trial {trial}")
        np.testing.assert_array_equal(exact, perm[:N])


def test_greedy_peel_threshold_and_masks():
    score = jnp.asarray(
        np.array([[0.9, 0.05, 0.0], [0.0, 0.04, 0.0]], np.float32)
    )
    out = np.asarray(lap.greedy_peel_match(score, 0.1))
    assert out[0] == 0 and out[1] == -1 and out[2] == -1
    cm = jnp.asarray(np.array([False, True, True]))
    out = np.asarray(lap.greedy_peel_match(score, 0.01, col_mask=cm))
    assert out[0] == -1  # masked column stays unmatched
    assert out[1] == 0   # best remaining score (0.05) belongs to track 0


def test_match_by_score_masked():
    M, N = 6, 5
    score = np.zeros((M, N), np.float32)
    score[2, 1] = 0.95
    rm = np.zeros(M, bool); rm[:3] = True
    cm = np.zeros(N, bool); cm[:2] = True
    out = np.asarray(
        lap.match_by_score(jnp.asarray(score), 0.1, jnp.asarray(rm), jnp.asarray(cm))
    )
    assert out[1] == 2
    assert (out[2:] == -1).all()
