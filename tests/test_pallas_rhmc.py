"""Pallas Riemannian leapfrog kernel (SURVEY.md ⑮ "Riemannian variant"):
the closed-form metric-derivative tile math vs the XLA autodiff head, and
the pallas_call plumbing in interpreter mode.  CPU (conftest).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import starcat

# interpret-mode Pallas is slow on CPU; the compiled kernel runs on the
# chip via bench.py and the SMC/RHMC heads
pytestmark = pytest.mark.slow
from starcat import pallas_rhmc as prh
from starcat.integrators import riemannian_leapfrog
from starcat.metric import make_metric_fn
from starcat.pallas_kernels import _pack
from starcat.potential import make_tempered_potential_and_grad
from starcat.rhmc import make_rhmc_functions

K, H, W, T = 4, 12, 12, 8
BETA, JITTER, EPS = 0.7, 1e-3, 0.02


@pytest.fixture(scope="module")
def setup():
    spec = starcat.SceneSpec(H, W, 1.5, 5.0)
    prior = starcat.PriorSpec(3.0, 0.7)
    truth = starcat.sample_prior(jax.random.key(0), K, prior)
    x, y, f = starcat.constrain(truth, spec)
    img = starcat.make_mock_image(jax.random.key(1), x, y, f, spec)
    theta_c = truth[None] + 0.05 * jax.random.normal(jax.random.key(2), (T, K, 3))
    # per-chain masks with some dead slots (trans-d SMC case)
    mask_c = jnp.ones((T, K)).at[:, -1].set(jnp.array([1.0, 0.0] * (T // 2)))

    tpg = make_tempered_potential_and_grad(spec, img, prior)
    metric = make_metric_fn(spec, prior, jitter=JITTER)
    pfn = lambda th, m: tpg(th, m, BETA)[0]
    mfn = lambda th, m: metric(th, m, BETA)
    ham, dhdt, dhdp = make_rhmc_functions(pfn, mfn)

    # packed (type-major t*K+i) <-> flat (star-major 3*i+t) permutation
    perm = np.array([3 * i + t for t in range(3) for i in range(K)])
    inv = np.argsort(perm)
    return dict(spec=spec, prior=prior, img=img, theta_c=theta_c, mask_c=mask_c,
                pfn=pfn, mfn=mfn, ham=ham, dhdt=dhdt, dhdp=dhdp,
                perm=perm, inv=inv)


def _structs(s):
    theta_pk = _pack(s["theta_c"], K)
    mask_pk = s["mask_c"].T
    st, chol = prh._build_structs(
        theta_pk.reshape(3, K, T), mask_pk, s["img"].astype(jnp.float32),
        s["spec"], s["prior"], K, BETA, JITTER,
    )
    return theta_pk, mask_pk, st, chol


def test_metric_matches_xla(setup):
    s = setup
    theta_pk, mask_pk, st, chol = _structs(s)
    pr = prh._profiles(theta_pk.reshape(3, K, T), mask_pk, s["spec"], K)
    fisher, _ = prh._fisher_and_hessian(pr, st.r1, K, with_s=True)
    g_tile, _ = prh._metric_from_fisher(
        fisher, pr, mask_pk, s["prior"], BETA, JITTER, theta_pk.reshape(3, K, T)
    )
    g_ref = jax.vmap(s["mfn"])(s["theta_c"], s["mask_c"])
    g_sm = np.moveaxis(np.asarray(g_tile), -1, 0)[:, s["inv"]][:, :, s["inv"]]
    np.testing.assert_allclose(g_sm, np.asarray(g_ref), atol=2e-5)


def test_cholesky_inverse_logdet(setup):
    s = setup
    _, _, st, chol = _structs(s)
    g_ref = np.asarray(jax.vmap(s["mfn"])(s["theta_c"], s["mask_c"]), np.float64)
    ginv = np.moveaxis(np.asarray(st.ginv), -1, 0)[:, s["inv"]][:, :, s["inv"]]
    np.testing.assert_allclose(ginv, np.linalg.inv(g_ref), atol=5e-4, rtol=1e-3)
    _, logdet_ref = np.linalg.slogdet(g_ref)
    np.testing.assert_allclose(np.asarray(st.logdet), logdet_ref, atol=2e-3)


def test_dh_dtheta_dh_dp_match_autodiff(setup):
    """The hand-derived dH/dθ (t1 + t2 split, ψ/φ field contractions) vs
    jax.grad through the metric build + Cholesky — the core derivation."""
    s = setup
    theta_pk, mask_pk, st, chol = _structs(s)
    p_c = np.asarray(
        jax.random.normal(jax.random.key(3), (T, 3 * K))
    ) * np.repeat(np.asarray(s["mask_c"]), 3, -1)
    p_pk = jnp.asarray(p_c[:, s["perm"]].T)

    a_tile = prh._matvec(st.ginv, p_pk)
    dhdp_ref = jax.vmap(lambda th, p, m: s["dhdp"](th.reshape(-1), p, m))(
        s["theta_c"], jnp.asarray(p_c), s["mask_c"]
    )
    np.testing.assert_allclose(
        np.asarray(a_tile)[s["inv"]].T, np.asarray(dhdp_ref), atol=1e-4
    )

    dh_tile = prh._dh_dtheta(st, p_pk.reshape(3, K, T), K, BETA)
    dhdt_ref = jax.vmap(lambda th, p, m: s["dhdt"](th.reshape(-1), p, m))(
        s["theta_c"], jnp.asarray(p_c), s["mask_c"]
    )
    np.testing.assert_allclose(
        np.asarray(dh_tile).reshape(3 * K, T)[s["inv"]].T,
        np.asarray(dhdt_ref), atol=2e-3, rtol=1e-4,
    )


def test_trajectory_matches_xla_integrator(setup):
    s = setup
    theta_pk, mask_pk, st, chol = _structs(s)
    xi_pk = _pack(jax.random.normal(jax.random.key(4), (T, K, 3)), K)
    nst, fpi = 3, 5
    th1, p1, h0, h1, u1, _res = prh.rhmc_trajectory_tile(
        theta_pk, xi_pk, jnp.full((1, T), EPS), mask_pk,
        s["img"].astype(jnp.float32), s["spec"], s["prior"], K, nst, fpi,
        BETA, JITTER,
    )
    p0_sm = np.asarray(
        prh._matvec(chol, xi_pk) * jnp.concatenate([mask_pk] * 3, 0)
    )[s["inv"]].T

    def one(th, p0, m):
        dt = lambda t_, p_: s["dhdt"](t_, p_, m)
        dp = lambda t_, p_: s["dhdp"](t_, p_, m)
        res = riemannian_leapfrog(dt, dp, th.reshape(-1), p0,
                                  jnp.asarray(EPS), nst, fpi)
        return res.theta, res.p

    th_ref, p_ref = jax.vmap(one)(s["theta_c"], jnp.asarray(p0_sm), s["mask_c"])
    np.testing.assert_allclose(np.asarray(th1)[s["inv"]].T, np.asarray(th_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(p1)[s["inv"]].T, np.asarray(p_ref), atol=1e-3)

    h0_ref = jax.vmap(lambda th, p, m: s["ham"](th.reshape(-1), p, m))(
        s["theta_c"], jnp.asarray(p0_sm), s["mask_c"])
    h1_ref = jax.vmap(lambda th, p, m: s["ham"](th, p, m))(th_ref, p_ref, s["mask_c"])
    np.testing.assert_allclose(np.asarray(h0), np.asarray(h0_ref), atol=2e-3)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h1_ref), atol=2e-3)

    # dead slots frozen exactly (masked-catalog invariant, SURVEY.md §7.3)
    dead = np.asarray(s["mask_c"]) == 0.0          # (T, K)
    th1_c = np.asarray(th1).reshape(3, K, T)
    th0_c = np.asarray(theta_pk).reshape(3, K, T)
    for t in range(T):
        for i in range(K):
            if dead[t, i]:
                np.testing.assert_array_equal(th1_c[:, i, t], th0_c[:, i, t])


def test_pallas_call_interpret_matches_tile(setup):
    """The kernel plumbing (packing, BlockSpecs, grid) in interpreter mode
    vs the pure tile function."""
    s = setup
    from starcat.pallas_rhmc import make_pallas_rhmc_leapfrog

    c = 128
    theta_c = jnp.tile(s["theta_c"], (c // T, 1, 1))
    mask_c = jnp.tile(s["mask_c"], (c // T, 1))
    xi_c = jax.random.normal(jax.random.key(5), theta_c.shape)
    eps_c = 0.01 * (1.0 + 0.1 * jax.random.uniform(jax.random.key(6), (c,)))

    fused = make_pallas_rhmc_leapfrog(
        s["spec"], s["img"], s["prior"], K, n_steps=2, fixed_point_iters=3,
        jitter=JITTER, interpret=True,
    )
    th1, p1, h0, h1, u1, _res = fused(theta_c, xi_c, eps_c, mask_c, BETA)

    th1_t, p1_t, h0_t, h1_t, u1_t, _res_t = prh.rhmc_trajectory_tile(
        _pack(theta_c, K), _pack(xi_c, K), eps_c.reshape(1, c), mask_c.T,
        s["img"].astype(jnp.float32), s["spec"], s["prior"], K, 2, 3,
        jnp.asarray(BETA), JITTER,
    )
    np.testing.assert_allclose(np.asarray(_pack(th1, K)), np.asarray(th1_t), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h1_t), atol=1e-4)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u1_t), atol=1e-4)


def test_run_rhmc_pallas_head_smoke():
    """The full head (driver warmup + sampling on the batched Pallas RHMC
    kernel) in interpreter mode: finite draws, sane acceptance."""
    from starcat.rhmc import RHMCConfig, run_rhmc_pallas

    spec = starcat.SceneSpec(8, 8, 1.5, 4.0)
    prior = starcat.PriorSpec(3.0, 0.7)
    truth = starcat.sample_prior(jax.random.key(0), 2, prior)
    x, y, f = starcat.constrain(truth, spec)
    img = starcat.make_mock_image(jax.random.key(1), x, y, f, spec)
    mask = jnp.ones(2)
    theta0 = truth[None] + 0.01 * jax.random.normal(jax.random.key(2), (128, 2, 3))

    cfg = RHMCConfig(step_size=0.05, n_leapfrog=2, fixed_point_iters=2)
    res, wr = run_rhmc_pallas(
        jax.random.key(3), spec, img, prior, theta0, mask,
        n_samples=4, n_warmup=4, config=cfg, interpret=True,
    )
    assert res.thetas.shape == (128, 4, 2, 3)
    assert np.isfinite(np.asarray(res.thetas)).all()
    assert 0.2 < float(np.asarray(res.accept_prob).mean()) <= 1.0


def test_smc_rhmc_pallas_mutation_smoke():
    """SMC with the fused Pallas Riemannian mutation (traced β, per-particle
    masks): tempering advances, logZ finite (interpret mode on CPU)."""
    from starcat.smc import SMCConfig, init_smc, smc_tempering

    spec = starcat.SceneSpec(8, 8, 1.5, 4.0)
    prior = starcat.PriorSpec(3.0, 0.7)
    truth = starcat.sample_prior(jax.random.key(0), 2, prior)
    x, y, f = starcat.constrain(truth, spec)
    img = starcat.make_mock_image(jax.random.key(1), x, y, f, spec)

    cfg = SMCConfig(
        n_particles=128, mutation="rhmc_pallas", n_mutation_steps=1,
        n_leapfrog=2, fixed_point_iters=2, max_steps=2,
    )
    s0 = init_smc(jax.random.key(2), spec, img, prior, 2, cfg)
    res = smc_tempering(s0, spec, img, prior, cfg)
    assert float(res.beta) > 0.0
    assert np.isfinite(float(res.log_z))
    assert np.isfinite(np.asarray(res.theta)).all()
    assert 0.0 < float(res.mean_accept) <= 1.0
