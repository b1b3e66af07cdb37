"""ChEES-HMC tests: exactness on a correlated Gaussian (trajectory length
must adapt toward the slowest direction) and agreement with NUTS on the
stellar scene."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import starcat
from starcat import diagnostics
from starcat.chees import ChEESConfig, run_chees
from starcat.nuts import NUTSConfig, run_nuts
from starcat.potential import PriorSpec, unconstrain
from starcat.scene import SceneSpec, make_mock_image


def test_chees_exact_on_gaussian():
    sigma = jnp.array([[0.3, 1.0, 3.0]])  # anisotropic

    def gf(theta):
        z = theta / sigma
        return 0.5 * jnp.sum(z * z), z / sigma

    n_chains = 32
    theta0 = 0.5 * jax.random.normal(jax.random.key(0), (n_chains, 1, 3))
    res, ad = run_chees(
        jax.random.key(1), gf, theta0, jnp.ones(1), 1500, 800,
        ChEESConfig(step_size=0.3, traj_length=0.5),
    )
    draws = np.asarray(res.thetas)[:, :, 0, :]
    assert np.asarray(res.accept_prob).mean() > 0.5
    for j in range(3):
        s = diagnostics.summarize(draws[:, :, j])
        assert abs(s["mean"]) / max(s["mcse"], 1e-9) < 4.5, (j, s)
        assert abs(s["sd"] - float(sigma[0, j])) / float(sigma[0, j]) < 0.12, (j, s)
        assert s["rhat"] < 1.03
    # with mass adaptation the target is ~isotropic; T should land at O(1)
    # in standardized units (not collapse to ~eps, not blow up to max cap)
    t_over_eps = float(ad["traj_length"]) / float(ad["step_size"])
    assert 2.0 < t_over_eps < 500.0, (ad["traj_length"], ad["step_size"])


@pytest.mark.slow
def test_chees_matches_nuts_on_scene():
    spec = SceneSpec(16, 16, 1.5, 5.0)
    prior = PriorSpec(5.0, 1.0)
    x, y, f = jnp.array([8.3]), jnp.array([7.6]), jnp.array([300.0])
    img = make_mock_image(jax.random.key(7), x, y, f, spec)
    pg = starcat.make_potential_and_grad(spec, img, prior)
    gf = lambda th: pg(th, jnp.ones(1))
    theta0 = unconstrain(x, y, f, spec)[None] + 0.01 * jax.random.normal(
        jax.random.key(3), (16, 1, 3)
    )
    res_c, _ = run_chees(
        jax.random.key(4), gf, theta0, jnp.ones(1), 600, 500,
        ChEESConfig(step_size=0.1, traj_length=0.5),
    )
    res_n, _ = run_nuts(
        jax.random.key(5), gf, theta0, jnp.ones(1), 600, 500,
        NUTSConfig(step_size=0.05, max_depth=8),
    )
    dc = np.asarray(res_c.thetas)[:, :, 0, :]
    dn = np.asarray(res_n.thetas)[:, :, 0, :]
    for j, nm in enumerate(["ux", "uy", "s"]):
        cmp = diagnostics.compare_moments(dc[:, :, j], dn[:, :, j], nm)
        assert cmp["z"] < 4.0, cmp
