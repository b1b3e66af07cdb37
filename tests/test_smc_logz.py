"""SMC evidence validation: logZ against brute-force 3-D quadrature on a
single-star scene (the only SMC output not cross-checked elsewhere)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import starcat
from starcat.potential import PriorSpec
from starcat.scene import SceneSpec, make_mock_image
from starcat.smc import SMCConfig, run_smc


@pytest.mark.slow
def test_smc_logz_matches_quadrature():
    spec = SceneSpec(8, 8, 1.2, 3.0)
    prior = PriorSpec(logf_mean=3.0, logf_sigma=0.5)
    x_t, y_t, f_t = jnp.array([4.2]), jnp.array([3.8]), jnp.array([25.0])
    img = make_mock_image(jax.random.key(0), x_t, y_t, f_t, spec)

    # --- quadrature over unconstrained (ux, uy, s) -----------------------
    # log Z = log ∫ exp(loglik(theta)) p(theta) dtheta; integrate on a grid
    # in unconstrained space with the prior density included.
    n_pos, n_s = 80, 60
    ux = np.linspace(-5, 5, n_pos)
    uy = np.linspace(-5, 5, n_pos)
    s = np.linspace(3.0 - 4 * 0.5, 3.0 + 4 * 0.5, n_s)
    dux, duy, ds = ux[1] - ux[0], uy[1] - uy[0], s[1] - s[0]

    uxg, uyg, sg = np.meshgrid(ux, uy, s, indexing="ij")
    thetas = jnp.asarray(
        np.stack([uxg.ravel(), uyg.ravel(), sg.ravel()], -1)[:, None, :],
        jnp.float32,
    )

    @jax.jit
    def logpost_batch(th):
        def one(t):
            ll = starcat.log_likelihood(t, jnp.ones(1), spec, img)
            lp = starcat.log_prior(t, jnp.ones(1), prior)
            return ll + lp
        return jax.vmap(one)(th)

    lp = np.asarray(logpost_batch(thetas), np.float64)
    m = lp.max()
    log_z_quad = m + np.log(np.exp(lp - m).sum() * dux * duy * ds)

    # --- SMC -------------------------------------------------------------
    cfg = SMCConfig(n_particles=1024, mutation="hmc", n_mutation_steps=3,
                    n_leapfrog=8, step_size0=0.1, ess_target_frac=0.6)
    logzs = []
    for seed in range(3):
        res = run_smc(jax.random.key(10 + seed), spec, img, prior, 1, cfg)
        logzs.append(float(res.log_z))
    logzs = np.array(logzs)

    # MC spread of the 3 independent estimates bounds the tolerance
    spread = max(logzs.std(), 0.05)
    assert abs(logzs.mean() - log_z_quad) < 4 * spread + 0.2, (
        logzs, log_z_quad
    )
