"""ADVI tests: exact recovery on a Gaussian target, posterior-location
agreement with HMC on the scene, dead-slot freezing."""
import jax
import jax.numpy as jnp
import numpy as np

import starcat
from starcat.advi import ADVIConfig, ADVIResult, advi_sample, fit_advi
from starcat.potential import PriorSpec, unconstrain
from starcat.scene import SceneSpec, make_mock_image


def test_advi_exact_on_gaussian():
    """Mean-field family contains a diagonal Gaussian target -> exact fit."""
    mu_t = jnp.array([[1.0, -2.0, 0.5]])
    sigma_t = jnp.array([[0.5, 2.0, 1.0]])

    def gf(theta):
        z = (theta - mu_t) / sigma_t
        return 0.5 * jnp.sum(z * z), z / sigma_t

    res = fit_advi(
        jax.random.key(0), gf, jnp.zeros((1, 3)), jnp.ones(1),
        ADVIConfig(n_steps=3000, n_mc=16, learning_rate=5e-2),
    )
    np.testing.assert_allclose(np.asarray(res.mu), np.asarray(mu_t), atol=0.08)
    np.testing.assert_allclose(
        np.asarray(jnp.exp(res.log_sigma)), np.asarray(sigma_t), rtol=0.15
    )
    # ELBO increased and converged
    e = np.asarray(res.elbo_trace)
    assert e[-100:].mean() > e[:100].mean()


def test_advi_on_scene_matches_truth():
    spec = SceneSpec(16, 16, 1.5, 5.0)
    prior = PriorSpec(5.0, 1.0)
    x, y, f = jnp.array([8.3]), jnp.array([7.6]), jnp.array([300.0])
    img = make_mock_image(jax.random.key(7), x, y, f, spec)
    pg = starcat.make_potential_and_grad(spec, img, prior)
    gf = lambda th: pg(th, jnp.ones(1))
    mu0 = unconstrain(jnp.array([8.0]), jnp.array([8.0]), jnp.array([200.0]), spec)
    res = fit_advi(jax.random.key(1), gf, mu0, jnp.ones(1), ADVIConfig(n_steps=2000))
    xs = spec.width * jax.nn.sigmoid(res.mu[0, 0])
    fs = jnp.exp(res.mu[0, 2])
    # HMC posterior from earlier runs: x ~ 8.40 +- 0.14, f ~ 277 +- 22
    assert abs(float(xs) - 8.40) < 0.1
    assert abs(float(fs) - 277.0) / 277.0 < 0.1


def test_advi_dead_slots_frozen():
    spec = SceneSpec(16, 16, 1.5, 5.0)
    prior = PriorSpec(4.0, 1.0)
    img = make_mock_image(
        jax.random.key(0), jnp.array([8.0]), jnp.array([8.0]), jnp.array([100.0]), spec
    )
    pg = starcat.make_potential_and_grad(spec, img, prior)
    mask = jnp.array([1.0, 0.0])
    gf = lambda th: pg(th, mask)
    mu0 = jnp.array([[0.0, 0.0, 4.0], [1.0, -1.0, 2.0]])
    res = fit_advi(jax.random.key(2), gf, mu0, mask, ADVIConfig(n_steps=300))
    np.testing.assert_array_equal(np.asarray(res.mu)[1], np.asarray(mu0)[1])
    np.testing.assert_array_equal(np.asarray(res.log_sigma)[1], -2.0 * np.ones(3))
    draws = advi_sample(jax.random.key(3), res, mask, 50)
    np.testing.assert_array_equal(
        np.asarray(draws)[:, 1, :], np.broadcast_to(np.asarray(mu0)[1], (50, 3))
    )


def test_fullrank_advi_recovers_correlation():
    """Full-rank family recovers an off-diagonal covariance the mean-field
    family cannot."""
    from starcat.advi import ADVIConfig, advi_sample_fullrank, fit_advi_fullrank

    rng = np.random.default_rng(0)
    a = np.array([[1.0, 0.8, 0.0], [0.8, 1.0, 0.3], [0.0, 0.3, 1.0]])
    cov = a @ a.T
    prec = jnp.asarray(np.linalg.inv(cov), jnp.float32)

    def gf(theta):
        v = theta.reshape(3)
        g = prec @ v
        return 0.5 * jnp.dot(v, g), g.reshape(1, 3)

    res = fit_advi_fullrank(
        jax.random.key(0), gf, jnp.zeros((1, 3)),
        ADVIConfig(n_steps=4000, n_mc=16, learning_rate=3e-2),
    )
    fitted_cov = np.asarray(res.scale_tril @ res.scale_tril.T)
    np.testing.assert_allclose(fitted_cov, cov, atol=0.4, rtol=0.25)
    # correlations specifically (mean-field would give 0 off-diagonal)
    corr = fitted_cov / np.sqrt(np.outer(np.diag(fitted_cov), np.diag(fitted_cov)))
    corr_true = cov / np.sqrt(np.outer(np.diag(cov), np.diag(cov)))
    np.testing.assert_allclose(corr, corr_true, atol=0.1)
    draws = advi_sample_fullrank(jax.random.key(1), res, 2000)
    emp = np.cov(np.asarray(draws).reshape(2000, 3).T)
    np.testing.assert_allclose(emp, cov, atol=0.5, rtol=0.3)
