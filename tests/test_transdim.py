"""Trans-dimensional move tests (SURVEY.md §4.2: detailed balance via
prior recovery with no data; mask invariants; acceptance-ratio sanity)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

import starcat
from starcat.potential import PriorSpec, sample_prior
from starcat.scene import SceneSpec, make_mock_image
from starcat.transdim import (
    MoveInfo,
    TransDimConfig,
    birth_death_step,
    split_merge_step,
    transdim_sweep,
)

SPEC = SceneSpec(16, 16, 1.5, 5.0)
PRIOR = PriorSpec(logf_mean=3.0, logf_sigma=0.8)
KMAX = 8


def _run_prior_chains(move_fn, n_chains=256, n_steps=600, seed=0):
    """Run trans-d moves with a FLAT likelihood; the chain must then sample
    the prior: n ~ truncated Poisson(Lambda), params ~ prior."""
    cfg = TransDimConfig(lam_count=2.5, split_sigma=1.0)
    flat_loglik = lambda theta, mask: jnp.asarray(0.0, jnp.float32)

    key = jax.random.key(seed)
    k_init, k_run = jax.random.split(key)
    theta0 = jax.vmap(lambda k: sample_prior(k, KMAX, PRIOR))(
        jax.random.split(k_init, n_chains)
    )
    # start from n=1 alive
    mask0 = jnp.zeros((n_chains, KMAX)).at[:, 0].set(1.0)
    ll0 = jnp.zeros(n_chains)

    def step(carry, i):
        theta, mask, ll, key = carry
        key, sub = jax.random.split(key)
        keys = jax.random.split(sub, n_chains)
        theta, mask, ll, info = jax.vmap(
            lambda k, t, m, l: move_fn(k, t, m, l, flat_loglik, cfg)
        )(keys, theta, mask, ll)
        return (theta, mask, ll, key), (mask.sum(-1), info.accepted)

    carry, (ns, accs) = jax.lax.scan(
        step, (theta0, mask0, ll0, k_run), jnp.arange(n_steps)
    )
    return np.asarray(ns), np.asarray(accs), carry


def _truncated_poisson_pmf(lam, kmax):
    ks = np.arange(kmax + 1)
    pmf = stats.poisson.pmf(ks, lam)
    return pmf / pmf.sum()


def test_birth_death_prior_recovery():
    """No data => birth/death chain recovers truncated Poisson(Lambda) on n."""
    move = lambda k, t, m, l, llf, cfg: birth_death_step(k, t, m, l, llf, PRIOR, cfg)
    ns, accs, carry = _run_prior_chains(move, n_chains=256, n_steps=500)
    counts = ns[250:].reshape(-1).astype(int)  # post-burnin
    pmf = _truncated_poisson_pmf(2.5, KMAX)
    emp = np.bincount(counts, minlength=KMAX + 1)[: KMAX + 1] / counts.size
    # chi-square-ish check with generous tolerance (correlated draws)
    assert np.abs(emp - pmf).max() < 0.03, (emp, pmf)
    assert abs(counts.mean() - (pmf * np.arange(KMAX + 1)).sum()) < 0.1


def test_birth_death_plus_split_merge_prior_recovery():
    """Full sweep (bd + sm) must also preserve the prior exactly."""
    move = lambda k, t, m, l, llf, cfg: transdim_sweep(
        k, t, m, l, llf, PRIOR, SPEC, cfg
    )
    ns, accs, carry = _run_prior_chains(move, n_chains=256, n_steps=600, seed=1)
    counts = ns[300:].reshape(-1).astype(int)
    pmf = _truncated_poisson_pmf(2.5, KMAX)
    emp = np.bincount(counts, minlength=KMAX + 1)[: KMAX + 1] / counts.size
    assert np.abs(emp - pmf).max() < 0.03, (emp, pmf)

    # alive-star flux marginal must match the prior (KS on final state)
    theta, mask, _, _ = carry
    s = np.asarray(theta[..., 2])[np.asarray(mask) > 0]
    if s.size > 100:
        ks = stats.kstest(s, "norm", args=(PRIOR.logf_mean, PRIOR.logf_sigma))
        assert ks.pvalue > 1e-4, ks


@pytest.mark.slow
def test_birth_increases_loglik_accept_bias():
    """With real data and an obvious missing star, birth proposals that land
    near it should be accepted more often than prior-rate."""
    truth = sample_prior(jax.random.key(0), 1, PriorSpec(6.0, 0.3))
    x, y, f = starcat.constrain(truth, SPEC)
    img = make_mock_image(jax.random.key(1), x, y, f, SPEC)
    llf = lambda th, m: starcat.log_likelihood(th, m, SPEC, img)
    cfg = TransDimConfig(lam_count=1.0)

    # empty catalog; many birth attempts
    keys = jax.random.split(jax.random.key(2), 512)
    theta0 = sample_prior(jax.random.key(3), KMAX, PriorSpec(6.0, 0.3))
    mask0 = jnp.zeros(KMAX)
    ll0 = llf(theta0, mask0)
    outs = jax.vmap(
        lambda k: birth_death_step(k, theta0, mask0, ll0, llf, PriorSpec(6.0, 0.3), cfg)
    )(keys)
    accepted = np.asarray(outs[3].accepted)
    n_after = np.asarray(outs[1].sum(-1))
    # at least some births accepted (those that explain the bright star)
    assert accepted.mean() > 0.01
    assert (n_after[accepted] == 1).all()


def test_mask_semantics_after_moves():
    """Masks stay 0/1 and loglik cache stays consistent with recompute."""
    img = make_mock_image(
        jax.random.key(1), jnp.array([8.0]), jnp.array([8.0]), jnp.array([60.0]), SPEC
    )
    llf = lambda th, m: starcat.log_likelihood(th, m, SPEC, img)
    cfg = TransDimConfig(lam_count=3.0)
    theta = sample_prior(jax.random.key(4), KMAX, PRIOR)
    mask = jnp.zeros(KMAX).at[:3].set(1.0)
    ll = llf(theta, mask)
    key = jax.random.key(5)
    for i in range(40):
        key, sub = jax.random.split(key)
        theta, mask, ll, info = transdim_sweep(sub, theta, mask, ll, llf, PRIOR, SPEC, cfg)
        m = np.asarray(mask)
        assert set(np.unique(m)).issubset({0.0, 1.0})
        np.testing.assert_allclose(float(ll), float(llf(theta, mask)), rtol=1e-5, atol=1e-4)


@pytest.mark.slow
def test_residual_birth_prior_stationarity_with_real_image():
    """Detailed balance of the residual-driven birth/death (PCAT-style
    proposals): with a FLAT likelihood but a non-trivial image driving the
    proposal, the prior must be STATIONARY — chains initialized at the
    truncated-Poisson prior stay there (the reverse-proposal density
    correction is exact for any data).  Stationarity is the sharp form:
    the mismatched proposal mixes slowly from a cold start, but any error
    in the q-correction would drift an equilibrium start within steps."""
    from starcat.transdim import birth_death_step_residual

    img = make_mock_image(
        jax.random.key(9),
        jnp.array([4.0, 12.0]), jnp.array([4.0, 12.0]),
        jnp.array([120.0, 90.0]), SPEC,
    )
    cfg = TransDimConfig(lam_count=2.5)
    flat = lambda t, m: jnp.asarray(0.0, jnp.float32)
    n_chains = 384
    theta0 = jax.vmap(lambda k: sample_prior(k, KMAX, PRIOR))(
        jax.random.split(jax.random.key(0), n_chains)
    )
    ks = jnp.arange(KMAX + 1, dtype=jnp.float32)
    logpmf = ks * jnp.log(2.5) - jax.scipy.special.gammaln(ks + 1.0)
    n_draw = jax.random.categorical(jax.random.key(5), logpmf, shape=(n_chains,))
    mask0 = (jnp.arange(KMAX)[None, :] < n_draw[:, None]).astype(jnp.float32)

    def step(carry, _):
        theta, mask, ll, key = carry
        key, sub = jax.random.split(key)
        keys = jax.random.split(sub, n_chains)
        theta, mask, ll, info = jax.vmap(
            lambda k, t, m, l: birth_death_step_residual(
                k, t, m, l, flat, PRIOR, SPEC, img, cfg
            )
        )(keys, theta, mask, ll)
        return (theta, mask, ll, key), mask.sum(-1)

    _, ns = jax.lax.scan(
        step, (theta0, mask0, jnp.zeros(n_chains), jax.random.key(1)),
        jnp.arange(600),
    )
    counts = np.asarray(ns)[300:].reshape(-1).astype(int)
    pmf = _truncated_poisson_pmf(2.5, KMAX)
    emp = np.bincount(counts, minlength=KMAX + 1)[: KMAX + 1] / counts.size
    assert np.abs(emp - pmf).max() < 0.03, (emp, pmf)
    assert abs(counts.mean() - (pmf * np.arange(KMAX + 1)).sum()) < 0.15


@pytest.mark.slow
def test_residual_birth_targets_unexplained_star():
    """With an obvious missing bright star, residual births must hit it far
    more often than uniform births (the cfg4 crowded-field fix)."""
    from starcat.transdim import birth_death_step, birth_death_step_residual

    big = SceneSpec(32, 32, 1.5, 5.0)
    bright = PriorSpec(5.5, 0.4)
    img = make_mock_image(
        jax.random.key(1), jnp.array([20.0]), jnp.array([11.0]),
        jnp.array([260.0]), big,
    )
    llf = lambda th, m: starcat.log_likelihood(th, m, big, img)
    cfg = TransDimConfig(lam_count=1.0)
    theta0 = sample_prior(jax.random.key(3), KMAX, bright)
    mask0 = jnp.zeros(KMAX)
    ll0 = llf(theta0, mask0)
    keys = jax.random.split(jax.random.key(4), 256)

    out_u = jax.vmap(lambda k: birth_death_step(
        k, theta0, mask0, ll0, llf, bright, cfg))(keys)
    out_r = jax.vmap(lambda k: birth_death_step_residual(
        k, theta0, mask0, ll0, llf, bright, big, img, cfg))(keys)
    acc_u = np.asarray(out_u[3].accepted).mean()
    acc_r = np.asarray(out_r[3].accepted).mean()
    # uniform births hit the star ~pi*r^2/1024 of the time; residual births
    # should accept at several times that rate
    assert acc_r > 3 * max(acc_u, 0.01), (acc_u, acc_r)
