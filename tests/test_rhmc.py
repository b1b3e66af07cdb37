"""RHMC / Fisher-metric tests (SURVEY.md §4.2: metric PSD, Fisher vs
numerical Jacobian, Riemannian-leapfrog reversibility & energy error,
posterior agreement with HMC)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import starcat
from starcat import diagnostics
from starcat.hmc import HMCConfig, run_hmc
from starcat.metric import make_metric_fn, scene_jacobian
from starcat.potential import PriorSpec, make_potential, sample_prior, unconstrain
from starcat.rhmc import RHMCConfig, make_rhmc_functions, run_rhmc
from starcat.integrators import riemannian_leapfrog
from starcat.scene import SceneSpec, make_mock_image, render_scene

SPEC = SceneSpec(16, 16, 1.5, 5.0)
PRIOR = PriorSpec(4.0, 1.0)


def test_scene_jacobian_matches_fd():
    theta = sample_prior(jax.random.key(0), 3, PRIOR)
    mask = jnp.ones(3)
    lam, j = scene_jacobian(theta, mask, SPEC)
    x, y, f = starcat.constrain(theta, SPEC)
    np.testing.assert_allclose(
        np.asarray(lam), np.asarray(render_scene(x, y, f, mask, SPEC)), rtol=1e-5
    )
    eps = 1e-3
    for k in range(3):
        for a in range(3):
            tp = theta.at[k, a].add(eps)
            tm = theta.at[k, a].add(-eps)
            xp, yp, fp = starcat.constrain(tp, SPEC)
            xm, ym, fm = starcat.constrain(tm, SPEC)
            fd = (render_scene(xp, yp, fp, mask, SPEC) - render_scene(xm, ym, fm, mask, SPEC)) / (2 * eps)
            np.testing.assert_allclose(
                np.asarray(j[k, a]), np.asarray(fd), atol=2e-2, rtol=2e-2
            )


def test_metric_pd_symmetric_and_masked():
    theta = sample_prior(jax.random.key(1), 4, PRIOR)
    mask = jnp.array([1.0, 1.0, 0.0, 1.0])
    metric = make_metric_fn(SPEC, PRIOR)
    g = np.asarray(metric(theta, mask))
    np.testing.assert_allclose(g, g.T, atol=1e-5)
    evals = np.linalg.eigvalsh(g)
    assert evals.min() > 0
    # dead slot (params 6,7,8): identity rows/cols
    dead = slice(6, 9)
    np.testing.assert_allclose(g[dead, dead], (1.0 + 1e-3) * np.eye(3), atol=1e-6)
    off = g[dead, :6]
    np.testing.assert_allclose(off, 0.0, atol=1e-6)


def test_fisher_flux_block_analytic():
    """Flux-flux Fisher entry for one star == sum_p (f*psf)^2/lam (in s-coords)."""
    theta = unconstrain(jnp.array([8.0]), jnp.array([8.0]), jnp.array([200.0]), SPEC)
    mask = jnp.ones(1)
    metric = make_metric_fn(SPEC, PRIOR, jitter=0.0)
    g = np.asarray(metric(theta, mask))
    lam, j = scene_jacobian(theta, mask, SPEC)
    expected = float((np.asarray(j[0, 2]) ** 2 / np.asarray(lam)).sum()) + 1.0 / PRIOR.logf_sigma**2
    np.testing.assert_allclose(g[2, 2], expected, rtol=1e-5)


def test_riemannian_leapfrog_reversible_and_energy():
    img = make_mock_image(
        jax.random.key(2), jnp.array([8.0]), jnp.array([8.0]), jnp.array([200.0]), SPEC
    )
    mask = jnp.ones(1)
    pfn = starcat.make_potential(SPEC, img, PRIOR)
    metric = make_metric_fn(SPEC, PRIOR)
    ham3, dhdt3, dhdp3 = make_rhmc_functions(pfn, metric)
    ham = lambda th, p: ham3(th, p, mask)
    dhdt = lambda th, p: dhdt3(th, p, mask)
    dhdp = lambda th, p: dhdp3(th, p, mask)

    theta0 = unconstrain(jnp.array([8.2]), jnp.array([7.9]), jnp.array([190.0]), SPEC).reshape(-1)
    g = metric(theta0.reshape(-1, 3), mask)
    p0 = jnp.linalg.cholesky(g) @ jax.random.normal(jax.random.key(3), (3,))

    h0 = float(ham(theta0, p0))
    for eps, tol in [(0.2, 0.05), (0.1, 0.015)]:
        res = riemannian_leapfrog(dhdt, dhdp, theta0, p0, eps, 10, fixed_point_iters=8)
        h1 = float(ham(res.theta, res.p))
        assert abs(h1 - h0) < tol, (eps, h1 - h0)
        # reversibility: negate momentum, integrate back
        back = riemannian_leapfrog(dhdt, dhdp, res.theta, -res.p, eps, 10, fixed_point_iters=8)
        np.testing.assert_allclose(np.asarray(back.theta), np.asarray(theta0), atol=1e-3)


@pytest.mark.slow
@pytest.mark.slow
def test_rhmc_matches_hmc_on_scene():
    """Config-1-style check: RHMC and HMC moments agree on the single-star scene."""
    img = make_mock_image(
        jax.random.key(7), jnp.array([8.3]), jnp.array([7.6]), jnp.array([300.0]), SPEC
    )
    prior = PriorSpec(5.0, 1.0)
    mask = jnp.ones(1)
    pg = starcat.make_potential_and_grad(SPEC, img, prior)
    gf = lambda th: pg(th, mask)
    pfn = starcat.make_potential(SPEC, img, prior)
    metric = make_metric_fn(SPEC, prior)

    theta0 = unconstrain(jnp.array([8.3]), jnp.array([7.6]), jnp.array([300.0]), SPEC)[
        None
    ] + 0.01 * jax.random.normal(jax.random.key(3), (16, 1, 3))

    res_h, _ = run_hmc(
        jax.random.key(4), gf, theta0, mask, 800, 500,
        HMCConfig(step_size=0.05, n_leapfrog=15),
    )
    res_r, wr_r = run_rhmc(
        jax.random.key(5), pfn, metric, gf, theta0, mask, 600, 300,
        RHMCConfig(step_size=0.5, n_leapfrog=8, fixed_point_iters=6),
    )
    assert np.asarray(res_r.accept_prob).mean() > 0.5
    dh = np.asarray(res_h.thetas)[:, :, 0, :]
    dr = np.asarray(res_r.thetas)[:, :, 0, :]
    for j, nm in enumerate(["ux", "uy", "s"]):
        cmp = diagnostics.compare_moments(dr[:, :, j], dh[:, :, j], nm)
        assert cmp["z"] < 4.0, cmp
