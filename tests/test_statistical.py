"""Statistical correctness tests (SURVEY.md §4.2): Geweke-style
MCMC-on-prior joint-distribution test, checkpoint-resume determinism
(fault-injection recovery §5.3), metrics/cost-analysis smoke."""
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

import starcat
from starcat.driver import init_chain_states, sample
from starcat.hmc import HMCConfig, make_hmc_kernel
from starcat.potential import PriorSpec, constrain, sample_prior
from starcat.scene import SceneSpec, make_mock_image

SPEC = SceneSpec(12, 12, 1.5, 4.0)
PRIOR = PriorSpec(logf_mean=4.0, logf_sigma=0.6)


@pytest.mark.slow
def test_geweke_joint_distribution():
    """Successive-conditional simulator: alternate
         data  ~ p(D | theta)          (fresh Poisson draw)
         theta ~ MCMC step targeting p(theta | D)
    The stationary theta-marginal is the prior; compare flux/position
    marginals against fresh prior draws by KS test."""
    n_chains, n_iter = 64, 300
    key = jax.random.key(0)
    theta = jax.vmap(lambda k: sample_prior(k, 1, PRIOR))(
        jax.random.split(key, n_chains)
    )

    @jax.jit
    def sweep(theta, key):
        k_data, k_mcmc = jax.random.split(key)

        def one(th, kd, km):
            x, y, f = constrain(th, SPEC)
            img = make_mock_image(kd, x, y, f, SPEC)
            pg = starcat.make_potential_and_grad(SPEC, img, PRIOR)
            gf = lambda t: pg(t, jnp.ones(1))
            from starcat.driver import ChainState
            u, g = gf(th)
            st = ChainState(th, u, g, km)
            # several HMC transitions per data refresh
            def body(s, _):
                from starcat.hmc import hmc_step
                s, _info = hmc_step(s, gf, jnp.asarray(0.1), jnp.ones_like(th), 10,
                                    jnp.ones(1))
                return s, None
            st, _ = jax.lax.scan(body, st, None, length=5)
            return st.theta

        kds = jax.random.split(k_data, theta.shape[0])
        kms = jax.random.split(k_mcmc, theta.shape[0])
        return jax.vmap(one)(theta, kds, kms)

    keys = jax.random.split(jax.random.key(1), n_iter)
    for i in range(n_iter):
        theta = sweep(theta, keys[i])

    th = np.asarray(theta)[:, 0, :]
    # compare against the prior analytically
    s = th[:, 2]
    ks_flux = stats.kstest(s, "norm", args=(PRIOR.logf_mean, PRIOR.logf_sigma))
    assert ks_flux.pvalue > 1e-3, ks_flux
    x = SPEC.width / (1 + np.exp(-th[:, 0]))
    ks_x = stats.kstest(x, "uniform", args=(0, SPEC.width))
    assert ks_x.pvalue > 1e-3, ks_x


def test_checkpoint_resume_bitwise(tmp_path):
    """Crash-recovery invariant (SURVEY.md §5.3): sample 50, checkpoint,
    restore, sample 50 more == uninterrupted sample 100, bitwise."""
    from starcat.checkpoint import restore_state, save_state

    img = make_mock_image(
        jax.random.key(1), jnp.array([6.0]), jnp.array([6.0]), jnp.array([80.0]), SPEC
    )
    pg = starcat.make_potential_and_grad(SPEC, img, PRIOR)
    mask = jnp.ones(1)
    gf = lambda th: pg(th, mask)
    kernel = make_hmc_kernel(gf, mask, HMCConfig(step_size=0.05, n_leapfrog=5))
    theta0 = sample_prior(jax.random.key(2), 1, PRIOR)[None] + jnp.zeros((8, 1, 3))
    states = init_chain_states(jax.random.key(3), theta0, gf)
    eps = jnp.asarray(0.05)
    im = jnp.ones((1, 3))

    full = sample(states, kernel, 100, eps, im)

    half = sample(states, kernel, 50, eps, im)
    save_state(str(tmp_path / "ck"), half.final_states)
    blank = init_chain_states(jax.random.key(9), jnp.zeros_like(theta0), gf)
    restored = restore_state(str(tmp_path / "ck"), blank)
    second = sample(restored, kernel, 50, eps, im)

    np.testing.assert_array_equal(
        np.asarray(full.thetas[:, 50:]), np.asarray(second.thetas)
    )
    np.testing.assert_array_equal(
        np.asarray(full.final_states.theta), np.asarray(second.final_states.theta)
    )


def test_metrics_logger_and_cost_analysis(tmp_path):
    from starcat.metrics import MetricsLogger, cost_analysis, timed

    path = tmp_path / "metrics.jsonl"
    log = MetricsLogger(str(path), "t")
    log.log("warmup", accept=0.8, eps=0.1)
    with timed(log, "phase", window=1):
        _ = jnp.ones(4).sum()
    log.close()
    lines = [json.loads(l) for l in open(path)]
    assert lines[0]["event"] == "warmup" and lines[0]["accept"] == 0.8
    assert lines[1]["event"] == "phase" and lines[1]["wall_seconds"] >= 0

    ca = cost_analysis(lambda a, b: a @ b, jnp.ones((64, 64)), jnp.ones((64, 64)))
    assert ca["flops"] > 0


def test_blocked_sampling_bitwise_equal():
    """sample_blocked == one big sample() call, bitwise (long-run pattern)."""
    from starcat.driver import sample_blocked

    img = make_mock_image(
        jax.random.key(1), jnp.array([6.0]), jnp.array([6.0]), jnp.array([80.0]), SPEC
    )
    pg = starcat.make_potential_and_grad(SPEC, img, PRIOR)
    mask = jnp.ones(1)
    gf = lambda th: pg(th, mask)
    kernel = make_hmc_kernel(gf, mask, HMCConfig(step_size=0.05, n_leapfrog=5))
    theta0 = sample_prior(jax.random.key(2), 1, PRIOR)[None] + jnp.zeros((8, 1, 3))
    states = init_chain_states(jax.random.key(3), theta0, gf)
    eps, im = jnp.asarray(0.05), jnp.ones((1, 3))

    full = sample(states, kernel, 90, eps, im)
    blocked = sample_blocked(states, kernel, 90, eps, im, block_size=40)
    np.testing.assert_array_equal(np.asarray(full.thetas), np.asarray(blocked.thetas))
    np.testing.assert_array_equal(
        np.asarray(full.final_states.theta), np.asarray(blocked.final_states.theta)
    )
