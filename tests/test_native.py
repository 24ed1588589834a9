import numpy as np
import pytest

native = pytest.importorskip("odam_tpu.native")


def _surface(scales, eps, etas, omegas):
    a1, a2, a3 = scales
    e1, e2 = eps

    def fexp(x, p):
        return np.sign(x) * np.abs(x) ** p

    x = a1 * fexp(np.cos(etas), e1) * fexp(np.cos(omegas), e2)
    y = a2 * fexp(np.cos(etas), e1) * fexp(np.sin(omegas), e2)
    z = a3 * fexp(np.sin(etas), e1)
    return np.stack([x, y, z], -1)


def test_native_builds_and_samples():
    scales = np.array([[[0.5, 0.3, 0.9]]], np.float32)
    eps = np.array([[[0.9, 0.9]]], np.float32)
    etas, omegas = native.sample_sq_batch(scales, eps, n_samples=500)
    assert etas.shape == (1, 1, 500)
    assert (np.abs(etas) <= np.pi / 2 + 1e-5).all()
    assert (np.abs(omegas) <= np.pi + 1e-5).all()


def test_native_deterministic_mode_is_reproducible():
    scales = np.random.default_rng(0).uniform(0.2, 1.0, (2, 3, 3)).astype(np.float32)
    eps = np.full((2, 3, 2), 0.8, np.float32)
    e1, o1 = native.sample_sq_batch(scales, eps, n_samples=200)
    e2, o2 = native.sample_sq_batch(scales, eps, n_samples=200)
    np.testing.assert_array_equal(e1, e2)
    np.testing.assert_array_equal(o1, o2)


def test_native_seeded_mode_reproducible_and_seed_sensitive():
    scales = np.ones((1, 1, 3), np.float32) * 0.5
    eps = np.ones((1, 1, 2), np.float32) * 0.7
    a, _ = native.sample_sq_batch(scales, eps, 300, seed=0, deterministic=False)
    b, _ = native.sample_sq_batch(scales, eps, 300, seed=0, deterministic=False)
    c, _ = native.sample_sq_batch(scales, eps, 300, seed=7, deterministic=False)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_native_matches_device_sampler_distribution():
    """Native (deterministic mode) and the JAX sampler build the same
    construction; surfaces sampled from both should have matching extents and
    octant coverage."""
    import jax.numpy as jnp

    from odam_tpu.ops import sampler as jsampler

    scales = np.array([0.5, 1.2, 0.8], np.float32)
    eps = np.array([0.4, 1.1], np.float32)
    etas_n, omegas_n = native.sample_sq_batch(
        scales[None, None], eps[None, None], n_samples=1000
    )
    pts_n = _surface(scales, eps, etas_n[0, 0], omegas_n[0, 0])

    etas_j, omegas_j = jsampler.sample_sq_angles(
        jnp.asarray(scales), jnp.asarray(eps), n_samples=1000
    )
    pts_j = _surface(scales, eps, np.asarray(etas_j), np.asarray(omegas_j))

    np.testing.assert_allclose(pts_n.max(0), pts_j.max(0), atol=0.05)
    np.testing.assert_allclose(pts_n.min(0), pts_j.min(0), atol=0.05)

    def octants(p):
        idx = (p[:, 0] > 0) * 4 + (p[:, 1] > 0) * 2 + (p[:, 2] > 0)
        return np.bincount(idx.astype(int), minlength=8) / len(p)

    np.testing.assert_allclose(octants(pts_n), octants(pts_j), atol=0.06)
