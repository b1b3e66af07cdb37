"""Pallas DIAGONAL-Fisher Riemannian leapfrog (VERDICT round-2 item 2):
the closed-form diag-metric-derivative tile math vs the XLA autodiff head
(rhmc.make_rhmc_diag_functions), and the pallas_call plumbing in
interpreter mode.  CPU (conftest).  Mirrors tests/test_pallas_rhmc.py.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import starcat

pytestmark = pytest.mark.slow
from starcat import pallas_rhmc_diag as prd
from starcat.integrators import riemannian_leapfrog
from starcat.metric import make_diag_metric_fn
from starcat.pallas_kernels import _pack
from starcat.potential import make_tempered_potential_and_grad
from starcat.rhmc import make_rhmc_diag_functions

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
    dmetric = make_diag_metric_fn(spec, prior, jitter=JITTER)
    pfn = lambda th, m: tpg(th, m, BETA)[0]
    mfn = lambda th, m: dmetric(th, m, BETA)
    ham, dhdt, dhdp = make_rhmc_diag_functions(pfn, mfn)

    # packed (type-major t*K+i) <-> flat (star-major 3*i+t) permutation
    perm = np.array([3 * i + t for t in range(3) for i in range(K)])
    inv = np.argsort(perm)
    return dict(spec=spec, prior=prior, img=img, theta_c=theta_c, mask_c=mask_c,
                pfn=pfn, mfn=mfn, ham=ham, dhdt=dhdt, dhdp=dhdp,
                perm=perm, inv=inv)


def _structs(s):
    theta_pk = _pack(s["theta_c"], K)
    mask_pk = s["mask_c"].T
    st = prd._build_structs_diag(
        theta_pk.reshape(3, K, T), mask_pk, s["img"].astype(jnp.float32),
        s["spec"], s["prior"], K, BETA, JITTER,
    )
    return theta_pk, mask_pk, st


def test_diag_metric_matches_xla(setup):
    s = setup
    _, _, st = _structs(s)
    g_ref = jax.vmap(s["mfn"])(s["theta_c"], s["mask_c"])   # (T, 3K) flat
    g_tile = np.asarray(st.g).reshape(3 * K, T)[s["inv"]].T
    np.testing.assert_allclose(g_tile, np.asarray(g_ref), rtol=1e-5, atol=2e-6)


def test_dh_dtheta_dh_dp_match_autodiff(setup):
    """The hand-derived dH/dθ (t1 + t2 split, C tensor + q field) vs
    jax.grad through the diag metric build — the core derivation."""
    s = setup
    theta_pk, mask_pk, st = _structs(s)
    p_c = np.asarray(
        jax.random.normal(jax.random.key(3), (T, 3 * K))
    ) * np.repeat(np.asarray(s["mask_c"]), 3, -1)
    p_pk = jnp.asarray(p_c[:, s["perm"]].T)

    a_tile = p_pk.reshape(3, K, T) / st.g
    dhdp_ref = jax.vmap(lambda th, p, m: s["dhdp"](th.reshape(-1), p, m))(
        s["theta_c"], jnp.asarray(p_c), s["mask_c"]
    )
    np.testing.assert_allclose(
        np.asarray(a_tile).reshape(3 * K, T)[s["inv"]].T,
        np.asarray(dhdp_ref), atol=1e-5,
    )

    dh_tile = prd._dh_dtheta_diag(st, p_pk.reshape(3, K, T), K, BETA)
    dhdt_ref = jax.vmap(lambda th, p, m: s["dhdt"](th.reshape(-1), p, m))(
        s["theta_c"], jnp.asarray(p_c), s["mask_c"]
    )
    np.testing.assert_allclose(
        np.asarray(dh_tile).reshape(3 * K, T)[s["inv"]].T,
        np.asarray(dhdt_ref), atol=2e-4, rtol=1e-4,
    )


def test_trajectory_matches_xla_integrator(setup):
    s = setup
    theta_pk, mask_pk, st = _structs(s)
    xi_pk = _pack(jax.random.normal(jax.random.key(4), (T, K, 3)), K)
    nst, fpi = 3, 5
    th1, p1, h0, h1, u1, _res = prd.rhmc_diag_trajectory_tile(
        theta_pk, xi_pk, jnp.full((1, T), EPS), mask_pk,
        s["img"].astype(jnp.float32), s["spec"], s["prior"], K, nst, fpi,
        BETA, JITTER,
    )
    mask3 = np.repeat(np.asarray(s["mask_c"]), 3, -1)        # (T, 3K) flat
    g0 = np.asarray(st.g).reshape(3 * K, T)[s["inv"]].T
    p0_sm = np.sqrt(g0) * np.asarray(xi_pk)[s["inv"]].T * mask3

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
    c = 128
    theta_c = jnp.tile(s["theta_c"], (c // T, 1, 1))
    mask_c = jnp.tile(s["mask_c"], (c // T, 1))
    xi_c = jax.random.normal(jax.random.key(5), theta_c.shape)
    eps_c = 0.01 * (1.0 + 0.1 * jax.random.uniform(jax.random.key(6), (c,)))

    fused = prd.make_pallas_rhmc_diag_leapfrog(
        s["spec"], s["img"], s["prior"], K, n_steps=2, fixed_point_iters=3,
        jitter=JITTER, interpret=True,
    )
    th1, p1, h0, h1, u1, _res = fused(theta_c, xi_c, eps_c, mask_c, BETA)

    th1_t, p1_t, h0_t, h1_t, u1_t, _res_t = prd.rhmc_diag_trajectory_tile(
        _pack(theta_c, K), _pack(xi_c, K), eps_c.reshape(1, c), mask_c.T,
        s["img"].astype(jnp.float32), s["spec"], s["prior"], K, 2, 3,
        jnp.asarray(BETA), JITTER,
    )
    np.testing.assert_allclose(np.asarray(_pack(th1, K)), np.asarray(th1_t), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h1_t), atol=1e-4)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u1_t), atol=1e-4)


# ---------------------------------------------------------------------------
# MXU (chains-on-sublanes) layout — same math, crowded-field packing
# ---------------------------------------------------------------------------

def _pack_rows_np(theta_c):
    return np.concatenate(
        [np.asarray(theta_c)[:, :, 0], np.asarray(theta_c)[:, :, 1],
         np.asarray(theta_c)[:, :, 2]], axis=1)


def test_mxu_trajectory_matches_xla_integrator(setup):
    s = setup
    from starcat.pallas_rhmc_diag import (_build_stacks_mxu,
                                          rhmc_diag_trajectory_mxu)

    theta_rows = jnp.asarray(_pack_rows_np(s["theta_c"]))       # (T, 3K)
    mask_tk = s["mask_c"]
    xi_c = jax.random.normal(jax.random.key(7), (T, K, 3))
    xi_rows = jnp.asarray(_pack_rows_np(xi_c))
    nst, fpi = 3, 5

    th1, p1, h0, h1, u1, _res = rhmc_diag_trajectory_mxu(
        theta_rows, xi_rows, jnp.full((T, 1), EPS), mask_tk,
        s["img"].astype(jnp.float32), s["spec"], s["prior"], K, nst, fpi,
        BETA, JITTER,
    )

    st0 = _build_stacks_mxu(theta_rows, mask_tk,
                            s["img"].astype(jnp.float32), s["spec"],
                            s["prior"], K, BETA, JITTER)
    mask3 = np.concatenate([np.asarray(mask_tk)] * 3, axis=1)
    # rows are type-major [u|v|s] like the packed layout; flat is star-major
    p0_rows = np.sqrt(np.asarray(st0.g)) * np.asarray(xi_rows) * mask3
    p0_flat = p0_rows[:, s["inv"]]

    def one(th, p0, m):
        dt = lambda t_, p_: s["dhdt"](t_, p_, m)
        dp = lambda t_, p_: s["dhdp"](t_, p_, m)
        res = riemannian_leapfrog(dt, dp, th.reshape(-1), p0,
                                  jnp.asarray(EPS), nst, fpi)
        return res.theta, res.p

    th_ref, p_ref = jax.vmap(one)(s["theta_c"], jnp.asarray(p0_flat),
                                  s["mask_c"])
    np.testing.assert_allclose(np.asarray(th1)[:, s["inv"]],
                               np.asarray(th_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(p1)[:, s["inv"]],
                               np.asarray(p_ref), atol=1e-3)

    h0_ref = jax.vmap(lambda th, p, m: s["ham"](th.reshape(-1), p, m))(
        s["theta_c"], jnp.asarray(p0_flat), s["mask_c"])
    h1_ref = jax.vmap(lambda th, p, m: s["ham"](th, p, m))(
        th_ref, p_ref, s["mask_c"])
    np.testing.assert_allclose(np.asarray(h0), np.asarray(h0_ref), atol=2e-3)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h1_ref), atol=2e-3)


def test_mxu_pallas_call_interpret_matches_tile(setup):
    s = setup
    from starcat.pallas_rhmc_diag import (make_pallas_rhmc_diag_mxu,
                                          rhmc_diag_trajectory_mxu)

    c = 16
    theta_c = jnp.tile(s["theta_c"], (c // T, 1, 1))
    mask_c = jnp.tile(s["mask_c"], (c // T, 1))
    xi_c = jax.random.normal(jax.random.key(8), theta_c.shape)
    eps_c = 0.01 * (1.0 + 0.1 * jax.random.uniform(jax.random.key(9), (c,)))

    fused = make_pallas_rhmc_diag_mxu(
        s["spec"], s["img"], s["prior"], K, n_steps=2, fixed_point_iters=3,
        jitter=JITTER, interpret=True,
    )
    th1, p1, h0, h1, u1, _res = fused(theta_c, xi_c, eps_c, mask_c, BETA)

    th1_t, p1_t, h0_t, h1_t, u1_t, _res_t = rhmc_diag_trajectory_mxu(
        jnp.asarray(_pack_rows_np(theta_c)), jnp.asarray(_pack_rows_np(xi_c)),
        eps_c.reshape(c, 1), mask_c, s["img"].astype(jnp.float32),
        s["spec"], s["prior"], K, 2, 3, jnp.asarray(BETA), JITTER,
    )
    np.testing.assert_allclose(np.asarray(_pack_rows_np(th1)),
                               np.asarray(th1_t), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h1_t), atol=1e-4)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u1_t), atol=1e-4)


def test_smc_rhmc_diag_pallas_mutation_smoke():
    """SMC with the fused diag-Pallas mutation (traced β, per-particle
    masks): tempering advances, logZ finite (interpret mode on CPU)."""
    from starcat.smc import SMCConfig, init_smc, smc_tempering

    spec = starcat.SceneSpec(8, 8, 1.5, 4.0)
    prior = starcat.PriorSpec(3.0, 0.7)
    truth = starcat.sample_prior(jax.random.key(0), 2, prior)
    x, y, f = starcat.constrain(truth, spec)
    img = starcat.make_mock_image(jax.random.key(1), x, y, f, spec)

    cfg = SMCConfig(
        n_particles=128, mutation="rhmc_diag_pallas", n_mutation_steps=1,
        n_leapfrog=2, fixed_point_iters=2, max_steps=2,
    )
    s0 = init_smc(jax.random.key(2), spec, img, prior, 2, cfg)
    res = smc_tempering(s0, spec, img, prior, cfg)
    assert float(res.beta) > 0.0
    assert np.isfinite(float(res.log_z))
    assert np.isfinite(np.asarray(res.theta)).all()
    assert 0.0 < float(res.mean_accept) <= 1.0


def test_transdim_rhmc_diag_pallas_mutation_smoke():
    """Trans-d MCMC head on the fused diag-Riemannian mutation (per-chain
    masks through the kernel's mask path; interpret mode on CPU)."""
    from starcat.transdim import TransDimConfig
    from starcat.transdim_mcmc import TransDimMCMCConfig, run_transdim

    spec = starcat.SceneSpec(8, 8, 1.5, 4.0)
    prior = starcat.PriorSpec(3.0, 0.7)
    truth = starcat.sample_prior(jax.random.key(0), 2, prior)
    x, y, f = starcat.constrain(truth, spec)
    img = starcat.make_mock_image(jax.random.key(1), x, y, f, spec)
    tdm = TransDimMCMCConfig(
        step_size=0.1, mutation="rhmc_diag_pallas", n_leapfrog=2,
        fixed_point_iters=2, n_transdim_sweeps=1,
        transdim=TransDimConfig(lam_count=3.0),
    )
    res, eps = run_transdim(jax.random.key(2), spec, img, prior, 4, 16, 4, 4, tdm)
    assert res.thetas.shape == (16, 4, 4, 3)
    assert np.isfinite(np.asarray(res.thetas)).all()
    assert 0.0 < float(np.asarray(res.accept_prob).mean()) <= 1.0
    assert float(jnp.asarray(eps)) > 0.0
