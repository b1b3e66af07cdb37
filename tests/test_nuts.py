"""NUTS tests (SURVEY.md §4.2): the checkpoint u-turn scheme vs the
recursive reference enumeration, exactness on a correlated Gaussian, and
agreement with the HMC head on the stellar scene."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import starcat
from starcat import diagnostics
from starcat.hmc import HMCConfig, run_hmc
from starcat.nuts import NUTSConfig, run_nuts
from starcat.potential import PriorSpec, sample_prior, unconstrain
from starcat.scene import SceneSpec, make_mock_image


def _recursive_check_pairs(a: int, d: int):
    """Pairs (first, last) whose u-turn the recursive build_tree checks for a
    subtree of depth d starting at leaf a (leaf indices in generation order)."""
    if d == 0:
        return []
    half = 1 << (d - 1)
    pairs = _recursive_check_pairs(a, d - 1) + _recursive_check_pairs(a + half, d - 1)
    pairs.append((a, a + (1 << d) - 1))
    return pairs


def _iterative_check_pairs(d: int):
    """Pairs produced by the popcount checkpoint rule in starcat.nuts."""
    pairs = []
    for i in range(1 << d):
        t = 0
        j = i
        while j & 1:
            t += 1
            j >>= 1
        for k in range(1, t + 1):
            pairs.append((i - (1 << k) + 1, i))
    return pairs


@pytest.mark.parametrize("d", [1, 2, 3, 4, 5, 6])
def test_checkpoint_scheme_matches_recursive(d):
    rec = sorted(_recursive_check_pairs(0, d))
    it = sorted(_iterative_check_pairs(d))
    assert rec == it


@pytest.mark.parametrize("d", [3, 5])
def test_checkpoint_slots_consistent(d):
    """The stored-slot rule (even leaf i -> slot popcount(i)) must still hold
    the right partner when an odd leaf reads slots [popcount(i)-t, popcount(i>>1)]."""
    slots = {}
    for i in range(1 << d):
        if i % 2 == 0:
            slots[bin(i).count("1")] = i
        else:
            t = 0
            j = i
            while j & 1:
                t += 1
                j >>= 1
            lo = bin(i).count("1") - t
            hi = bin(i >> 1).count("1")
            partners = [slots[s] for s in range(lo, hi + 1)]
            expected = [i - (1 << k) + 1 for k in range(t, 0, -1)]
            assert partners == expected, (i, partners, expected)


def _gaussian_grad_fn(prec_chol):
    """U = 0.5 th^T P th for a (3,3) precision P = L L^T, theta shape (1,3)."""
    prec = prec_chol @ prec_chol.T

    def grad_fn(theta):
        v = theta[0]
        g = prec @ v
        return 0.5 * jnp.dot(v, g), g[None]

    return grad_fn


def test_nuts_exact_on_correlated_gaussian():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(3, 3))
    cov = a @ a.T + 3 * np.eye(3)
    prec_chol = np.linalg.cholesky(np.linalg.inv(cov))
    gf = _gaussian_grad_fn(jnp.asarray(prec_chol, jnp.float32))

    n_chains, n_samples = 16, 1500
    theta0 = 0.5 * jax.random.normal(jax.random.key(0), (n_chains, 1, 3))
    res, wr = run_nuts(
        jax.random.key(1), gf, theta0, jnp.ones(1), n_samples, 600,
        NUTSConfig(step_size=0.5, max_depth=8),
    )
    draws = np.asarray(res.thetas)[:, :, 0, :]
    assert np.asarray(res.diverged).mean() < 0.01
    for j in range(3):
        s = diagnostics.summarize(draws[:, :, j])
        assert abs(s["mean"]) / s["mcse"] < 4.5, (j, s)
        assert abs(s["sd"] - np.sqrt(cov[j, j])) / np.sqrt(cov[j, j]) < 0.1, (j, s)
        assert s["rhat"] < 1.02
    # off-diagonal correlation recovered
    flat = draws.reshape(-1, 3)
    corr_emp = np.corrcoef(flat.T)
    corr_true = cov / np.sqrt(np.outer(np.diag(cov), np.diag(cov)))
    assert np.abs(corr_emp - corr_true).max() < 0.05


@pytest.mark.slow
def test_nuts_matches_hmc_on_scene():
    """Config-2-style check at small scale: NUTS and HMC sample the same
    stellar posterior -> moments agree within MC error."""
    spec = SceneSpec(16, 16, 1.5, 5.0)
    prior = PriorSpec(5.0, 1.0)
    x, y, f = jnp.array([8.3]), jnp.array([7.6]), jnp.array([300.0])
    img = make_mock_image(jax.random.key(7), x, y, f, spec)
    pg = starcat.make_potential_and_grad(spec, img, prior)
    gf = lambda th: pg(th, jnp.ones(1))
    theta0 = unconstrain(x, y, f, spec)[None] + 0.01 * jax.random.normal(
        jax.random.key(3), (16, 1, 3)
    )
    res_h, _ = run_hmc(
        jax.random.key(4), gf, theta0, jnp.ones(1), 800, 500,
        HMCConfig(step_size=0.05, n_leapfrog=15),
    )
    res_n, wr_n = run_nuts(
        jax.random.key(5), gf, theta0, jnp.ones(1), 800, 500,
        NUTSConfig(step_size=0.05, max_depth=8),
    )
    dh = np.asarray(res_h.thetas)[:, :, 0, :]
    dn = np.asarray(res_n.thetas)[:, :, 0, :]
    for j, nm in enumerate(["ux", "uy", "s"]):
        cmp = diagnostics.compare_moments(dn[:, :, j], dh[:, :, j], nm)
        assert cmp["z"] < 4.0, cmp
        assert diagnostics.split_rhat(dn[:, :, j]) < 1.02


def test_nuts_dead_slots_frozen():
    spec = SceneSpec(16, 16, 1.5, 5.0)
    prior = PriorSpec(4.0, 1.0)
    img = make_mock_image(
        jax.random.key(0), jnp.array([8.0]), jnp.array([8.0]), jnp.array([100.0]), spec
    )
    pg = starcat.make_potential_and_grad(spec, img, prior)
    mask = jnp.array([1.0, 0.0])
    gf = lambda th: pg(th, mask)
    theta0 = jnp.tile(sample_prior(jax.random.key(1), 2, prior)[None], (4, 1, 1))
    res, _ = run_nuts(
        jax.random.key(2), gf, theta0, mask, 40, 40,
        NUTSConfig(step_size=0.05, max_depth=6),
    )
    draws = np.asarray(res.thetas)
    np.testing.assert_array_equal(
        draws[:, :, 1, :],
        np.broadcast_to(np.asarray(theta0)[:, None, 1, :], draws[:, :, 1, :].shape),
    )
    assert np.std(draws[:, :, 0, 2]) > 0


@pytest.mark.slow
def test_nuts_sharded_matches_single_device():
    """Sharded-vs-single invariance for an MCMC head (SURVEY.md §4.2
    distributed row; VERDICT round-1 item 8): NUTS on the fake 8-device
    chain mesh.  Pooled-warmup psums reorder float reductions, so the
    adapted eps differs in low bits and trajectories decorrelate — the
    assertion is statistical (same posterior within MC error), plus a
    check that the chain axis is actually sharded."""
    import jax
    from starcat import diagnostics
    from starcat.api import sample
    from starcat.configs import CONFIGS, apply_overrides
    from starcat.dist import make_mesh

    assert len(jax.devices()) == 8, "conftest must fake 8 CPU devices"
    cfg = apply_overrides(CONFIGS["cfg0_single_star"], {
        "head": "nuts", "n_chains": "8", "n_samples": "200", "n_warmup": "100",
    })
    out_a = sample(cfg, seed=3)
    out_b = sample(cfg, seed=3, mesh=make_mesh("chains"))
    for j, nm in enumerate(["ux", "uy", "s"]):
        cmp = diagnostics.compare_moments(
            out_a.thetas[:, :, 0, j], out_b.thetas[:, :, 0, j], nm
        )
        assert cmp["z"] < 4.0, (nm, cmp)
