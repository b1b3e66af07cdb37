"""Diagonal-Fisher RHMC (metric.make_diag_metric_fn + rhmc "rhmc_diag"
paths): the diagonal metric must equal the full metric's diagonal exactly,
the generalized leapfrog on it must be reversible/symplectic, and the
sampler must target the same posterior as plain HMC (the metric choice
affects mixing only, never the invariant distribution)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import starcat
from starcat import diagnostics
from starcat.hmc import HMCConfig, run_hmc
from starcat.metric import make_diag_metric_fn, make_metric_fn
from starcat.potential import PriorSpec, sample_prior, unconstrain
from starcat.rhmc import RHMCConfig, make_rhmc_diag_functions, make_rhmc_kernel
from starcat.driver import run_mcmc
from starcat.integrators import riemannian_leapfrog
from starcat.scene import SceneSpec, make_mock_image

SPEC = SceneSpec(16, 16, 1.5, 5.0)
PRIOR = PriorSpec(4.0, 1.0)


def test_diag_metric_equals_full_diagonal():
    theta = sample_prior(jax.random.key(1), 4, PRIOR)
    mask = jnp.array([1.0, 1.0, 0.0, 1.0])
    full = make_metric_fn(SPEC, PRIOR)(theta, mask)
    diag = make_diag_metric_fn(SPEC, PRIOR)(theta, mask)
    np.testing.assert_allclose(
        np.asarray(diag), np.asarray(jnp.diagonal(full)), rtol=1e-6, atol=1e-7
    )
    # tempered variant too
    full_b = make_metric_fn(SPEC, PRIOR)(theta, mask, 0.37)
    diag_b = make_diag_metric_fn(SPEC, PRIOR)(theta, mask, 0.37)
    np.testing.assert_allclose(
        np.asarray(diag_b), np.asarray(jnp.diagonal(full_b)), rtol=1e-6, atol=1e-7
    )
    # dead slot: exactly 1 + jitter
    np.testing.assert_allclose(np.asarray(diag[6:9]), 1.0 + 1e-3, atol=1e-7)


def test_diag_riemannian_leapfrog_reversible_and_energy():
    img = make_mock_image(
        jax.random.key(2), jnp.array([8.0]), jnp.array([8.0]), jnp.array([200.0]), SPEC
    )
    mask = jnp.ones(1)
    pfn = starcat.make_potential(SPEC, img, PRIOR)
    dmetric = make_diag_metric_fn(SPEC, PRIOR)
    ham3, dhdt3, dhdp3 = make_rhmc_diag_functions(pfn, dmetric)
    ham = lambda th, p: ham3(th, p, mask)
    dhdt = lambda th, p: dhdt3(th, p, mask)
    dhdp = lambda th, p: dhdp3(th, p, mask)

    theta0 = unconstrain(
        jnp.array([8.2]), jnp.array([7.9]), jnp.array([190.0]), SPEC
    ).reshape(-1)
    g = dmetric(theta0.reshape(-1, 3), mask)
    p0 = jnp.sqrt(g) * jax.random.normal(jax.random.key(3), (3,))

    h0 = float(ham(theta0, p0))
    for eps, tol in [(0.2, 0.05), (0.1, 0.015)]:
        res = riemannian_leapfrog(dhdt, dhdp, theta0, p0, eps, 10, fixed_point_iters=8)
        h1 = float(ham(res.theta, res.p))
        assert abs(h1 - h0) < tol, (eps, h1 - h0)
        back = riemannian_leapfrog(
            dhdt, dhdp, res.theta, -res.p, eps, 10, fixed_point_iters=8
        )
        np.testing.assert_allclose(np.asarray(back.theta), np.asarray(theta0), atol=1e-3)


def test_rhmc_diag_freezes_dead_slots():
    img = make_mock_image(
        jax.random.key(5), jnp.array([8.0]), jnp.array([8.0]), jnp.array([200.0]), SPEC
    )
    mask = jnp.array([1.0, 0.0])
    pfn = starcat.make_potential(SPEC, img, PRIOR)
    pg = starcat.make_potential_and_grad(SPEC, img, PRIOR)
    dmetric = make_diag_metric_fn(SPEC, PRIOR)
    kernel = make_rhmc_kernel(pfn, dmetric, mask,
                          RHMCConfig(n_leapfrog=2, fixed_point_iters=2),
                          diag_metric=True)
    theta0 = sample_prior(jax.random.key(6), 2, PRIOR)[None].repeat(4, 0)
    res, _ = run_mcmc(
        jax.random.key(7), kernel, lambda th: pg(th, mask), theta0, 8, 6,
        step_size=0.2, adapt_mass=False,
    )
    draws = np.asarray(res.thetas)  # (4, 8, 2, 3)
    np.testing.assert_array_equal(
        draws[:, :, 1, :], np.broadcast_to(np.asarray(theta0)[:, None, 1, :], draws[:, :, 1, :].shape)
    )
    assert np.std(draws[:, :, 0, 2]) > 0  # live slot moves


@pytest.mark.slow
def test_api_rhmc_metric_diag():
    """rhmc.metric="diag" reaches the head through configs/api (public CLI
    surface of the diagonal-Fisher option)."""
    from starcat.api import sample
    from starcat.configs import CONFIGS, apply_overrides

    cfg = apply_overrides(CONFIGS["cfg1_rhmc"], {
        "n_chains": 4, "n_samples": 30, "n_warmup": 30, "n_stars": 2,
        "kmax": 2, "scene.height": 16, "scene.width": 16,
        "rhmc.metric": "diag", "rhmc.step_size": 0.3,
    })
    out = sample(cfg, seed=0)
    assert out.stats["accept"] > 0.3
    assert np.isfinite(out.thetas).all()


@pytest.mark.slow
def test_rhmc_diag_matches_hmc_on_scene():
    """Posterior agreement: diag-metric RHMC vs plain HMC on the 1-star scene."""
    img = make_mock_image(
        jax.random.key(7), jnp.array([8.3]), jnp.array([7.6]), jnp.array([300.0]), SPEC
    )
    prior = PriorSpec(5.0, 1.0)
    mask = jnp.ones(1)
    pg = starcat.make_potential_and_grad(SPEC, img, prior)
    gf = lambda th: pg(th, mask)
    pfn = starcat.make_potential(SPEC, img, prior)
    dmetric = make_diag_metric_fn(SPEC, prior)

    theta0 = unconstrain(jnp.array([8.3]), jnp.array([7.6]), jnp.array([300.0]), SPEC)[
        None
    ] + 0.01 * jax.random.normal(jax.random.key(3), (16, 1, 3))

    res_h, _ = run_hmc(
        jax.random.key(4), gf, theta0, mask, 800, 500,
        HMCConfig(step_size=0.05, n_leapfrog=15),
    )
    kernel = make_rhmc_kernel(
        pfn, dmetric, mask,
        RHMCConfig(step_size=0.5, n_leapfrog=8, fixed_point_iters=6),
        diag_metric=True,
    )
    res_r, _ = run_mcmc(
        jax.random.key(5), kernel, gf, theta0, 600, 300,
        step_size=0.5, target_accept=0.9, adapt_mass=False,
    )
    assert np.asarray(res_r.accept_prob).mean() > 0.5
    dh = np.asarray(res_h.thetas)[:, :, 0, :]
    dr = np.asarray(res_r.thetas)[:, :, 0, :]
    for j, nm in enumerate(["ux", "uy", "s"]):
        cmp = diagnostics.compare_moments(dr[:, :, j], dh[:, :, j], nm)
        assert cmp["z"] < 4.0, cmp
