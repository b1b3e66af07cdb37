#!/usr/bin/env python
"""Benchmark harness (SURVEY.md ⑲; BASELINE.json:2).

Prints ONE JSON line (always the LAST line of output):
  {"metric": "leapfrog_grad_evals_per_sec_per_chip", "value": N,
   "unit": "evals/s", "vs_baseline": R}

The workload is the flagship config-2 shape: vmapped chains on the 10-star
32x32 scene, timing fused leapfrog trajectories (the hot loop of every head
— SURVEY.md §3.1 "HOTTEST").  The reference publishes no numbers
(BASELINE.md), so vs_baseline is the speedup over the in-repo NumPy
oracle's gradient-evaluation rate on the SAME scene — the reference's
implementation technology (single-process CPU NumPy, BASELINE.json:7).
That baseline is PINNED (measured once, best-of-5 x 2000 evals,
uncontended) so vs_baseline does not drift run to run; re-measure with
--retime-baseline.

Performance-regression gate (SURVEY.md §4.2 perf row): on a real TPU the
headline rate is asserted against FLOOR_EVALS_PER_SEC; a violation still
prints the headline JSON but exits 1 with "floor_violation": true.

`--full` measures every secondary metric (XLA path, Riemannian kernel,
NUTS and ChEES ESS/sec, crowded field, chain-count sweep) and emits them
as ONE JSON document on the line before the headline (also written to
BENCH_FULL.json).
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np

# Pinned reference-technology baseline: oracle/numpy_sampler.OracleModel
# grad_potential on the config-2 scene, this VM's CPU, best of 5 x 2000
# evals, measured 2026-08-19 (uncontended).  Round-1 re-timed ~4.7k under
# load; the pinned value is the FASTER (fairer-to-baseline) measurement.
NUMPY_BASELINE_EVALS_PER_SEC = 7472.0

# Regression floor for the headline metric on a v5e chip: round-1 recorded
# 40.7M evals/s at the 32k-chain saturation point (BENCH_r01.json); the
# floor leaves ~25% headroom for environment jitter.
FLOOR_EVALS_PER_SEC = 30e6


def _bench_setup(n_chains: int):
    import jax
    import jax.numpy as jnp
    import starcat
    from starcat.configs import CONFIGS

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    cfg = CONFIGS["cfg2_nuts"]
    truth, img = cfg.make_data()
    mask = jnp.ones(cfg.kmax)
    theta0 = truth[None] + 0.01 * jax.random.normal(
        jax.random.key(0), (n_chains,) + truth.shape
    )
    p0 = jax.random.normal(jax.random.key(1), theta0.shape)
    inv_mass = jnp.ones(truth.shape)
    return cfg, truth, img, mask, theta0, p0, inv_mass


def bench_pallas_grad_evals(n_chains: int, n_leapfrog: int, n_scan: int, repeats: int):
    """Headline: the fused Pallas trajectory kernel (SURVEY.md ⑮)."""
    import jax
    from starcat.pallas_kernels import make_pallas_leapfrog

    import starcat

    cfg, truth, img, mask, theta0, p0, inv_mass = _bench_setup(n_chains)
    fused = make_pallas_leapfrog(cfg.scene, img, cfg.prior, cfg.kmax, n_leapfrog)
    pg = starcat.make_potential_and_grad(cfg.scene, img, cfg.prior)
    _, grad0 = jax.jit(jax.vmap(lambda th: pg(th, mask)))(theta0)

    @jax.jit
    def many(theta, p, grad):
        # The entry gradient is carried between trajectories (as in the HMC
        # chain state), so each fused call costs exactly n_leapfrog evals.
        def body(carry, _):
            th, pp, g = carry
            th, pp, _, g = fused(th, pp, 0.002, inv_mass, mask, grad=g)
            return (th, pp, g), None

        return jax.lax.scan(body, (theta, p, grad), None, length=n_scan)[0]

    out = many(theta0, p0, grad0)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = many(theta0, p0, grad0)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return n_chains * n_leapfrog * n_scan / best, best


def bench_xla_grad_evals(n_chains: int, n_leapfrog: int, n_scan: int, repeats: int):
    """Secondary: the pure-XLA leapfrog path (full f32 precision)."""
    import jax
    import jax.numpy as jnp
    import starcat
    from starcat.integrators import leapfrog

    cfg, truth, img, mask, theta0, p0, inv_mass = _bench_setup(n_chains)
    pg = starcat.make_potential_and_grad(cfg.scene, img, cfg.prior)
    grad_fn = lambda th: pg(th, mask)

    @jax.jit
    def many_trajectories(theta, p):
        us, gs = jax.vmap(grad_fn)(theta)

        def body(carry, _):
            th, pp, u, g = carry
            res = jax.vmap(
                lambda t, q, uu, gg: leapfrog(
                    grad_fn, t, q, uu, gg, jnp.asarray(0.002), n_leapfrog, inv_mass
                )
            )(th, pp, u, g)
            return (res.theta, res.p, res.u, res.grad), None

        (theta, p, _, _), _ = jax.lax.scan(body, (theta, p, us, gs), None, length=n_scan)
        return theta, p

    out = many_trajectories(theta0, p0)
    jax.block_until_ready(out)

    best = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = many_trajectories(theta0, p0)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return n_chains * n_leapfrog * n_scan / best, best


def _scanned_traj_bench(fused, theta0, xi, mask, n_steps, n_scan, repeats):
    """Time a fused trajectory builder under lax.scan (n_scan trajectories
    per device program).  Round-3 protocol fix: a SINGLE pallas_call per
    jit carries ~20 ms of axon per-call dispatch latency, which swamped
    the kernels' actual compute and understated every trajectory-kernel
    rate (docs/DESIGN.md round-3 note); scanning amortizes it exactly as
    bench_pallas_grad_evals always did.  Returns (steps_per_sec, best_s)."""
    import jax
    import jax.numpy as jnp

    n_chains = theta0.shape[0]

    @jax.jit
    def f(t, x):
        def body(th, _):
            out = fused(th, x, 0.02, mask, 1.0)
            return out[0], None

        th, _ = jax.lax.scan(body, t, None, length=n_scan)
        return th, jnp.sum(th[0])

    out = f(theta0, xi)
    float(out[1])
    best = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = f(out[0], xi)
        float(out[1])
        best = min(best, time.perf_counter() - t0)
    return n_chains * n_steps * n_scan / best, best


def bench_pallas_rhmc_steps(n_chains: int = 1024, n_steps: int = 10,
                            fpi: int = 6, repeats: int = 3,
                            n_scan: int = 10):
    """Secondary: fused Pallas Riemannian leapfrog (pallas_rhmc.py) —
    full-Fisher-metric generalized-leapfrog steps/s, scan-amortized."""
    import jax
    from starcat.pallas_rhmc import make_pallas_rhmc_leapfrog

    cfg, truth, img, mask, theta0, p0, inv_mass = _bench_setup(n_chains)
    fused = make_pallas_rhmc_leapfrog(
        cfg.scene, img, cfg.prior, cfg.kmax, n_steps, fpi
    )
    xi = jax.random.normal(jax.random.key(2), theta0.shape)
    return _scanned_traj_bench(fused, theta0, xi, mask, n_steps, n_scan,
                               repeats)


def bench_rhmc_diag_steps(n_chains: int = 1024, n_steps: int = 10,
                          fpi: int = 6, repeats: int = 3):
    """Secondary: diagonal-Fisher generalized leapfrog (XLA autodiff,
    metric.make_diag_metric_fn) — Riemannian steps/s at the config-1/2
    shape, comparable to pallas_rhmc_steps_per_sec (full metric)."""
    import jax
    import jax.numpy as jnp
    import starcat
    from starcat.integrators import riemannian_leapfrog
    from starcat.metric import make_diag_metric_fn
    from starcat.rhmc import make_rhmc_diag_functions

    cfg, truth, img, mask, theta0, p0, inv_mass = _bench_setup(n_chains)
    pfn = starcat.make_potential(cfg.scene, img, cfg.prior)
    dm = make_diag_metric_fn(cfg.scene, cfg.prior)
    _, dhdt, dhdp = make_rhmc_diag_functions(pfn, dm)
    tf = theta0.reshape(n_chains, -1)
    pf = p0.reshape(n_chains, -1)
    n_scan = 10  # amortize per-call dispatch (see _scanned_traj_bench)

    @jax.jit
    def f(t, p):
        def one(t1, p1):
            res = riemannian_leapfrog(
                lambda th, pp: dhdt(th, pp, mask),
                lambda th, pp: dhdp(th, pp, mask),
                t1, p1, jnp.asarray(0.02), n_steps, fpi,
            )
            return res.theta, res.p

        def body(tt, _):
            th, pp = jax.vmap(one)(tt, p)
            return th, None

        th, _ = jax.lax.scan(body, t, None, length=n_scan)
        # scalar output: float() of it is a true completion sync even when
        # block_until_ready returns early (axon async semantics)
        return th, jnp.sum(th[0])

    out = f(tf, pf)
    float(out[1])
    best = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = f(out[0], pf)
        float(out[1])
        best = min(best, time.perf_counter() - t0)
    return n_chains * n_steps * n_scan / best, best


def bench_pallas_rhmc_diag_steps(n_chains: int = 1024, n_steps: int = 10,
                                 fpi: int = 6, repeats: int = 3,
                                 n_scan: int = 10):
    """Secondary: fused Pallas DIAGONAL-Fisher Riemannian leapfrog
    (pallas_rhmc_diag.py, chains-on-lanes) — steps/s at the config-1/2
    shape, directly comparable to rhmc_diag_steps_per_sec (the XLA autodiff
    diag path; VERDICT round-2 item 2 gate: >= 3x)."""
    import jax
    from starcat.pallas_rhmc_diag import make_pallas_rhmc_diag_leapfrog

    cfg, truth, img, mask, theta0, p0, inv_mass = _bench_setup(n_chains)
    fused = make_pallas_rhmc_diag_leapfrog(
        cfg.scene, img, cfg.prior, cfg.kmax, n_steps, fpi
    )
    xi = jax.random.normal(jax.random.key(2), theta0.shape)
    return _scanned_traj_bench(fused, theta0, xi, mask, n_steps, n_scan,
                               repeats)


def bench_rhmc_diag_crowded(n_chains: int = 256, repeats: int = 3):
    """cfg4's actual mutation workload (K=64, 128x128, cfg4 leapfrog/fpi):
    XLA autodiff diag path vs the fused MXU diag kernel
    (pallas_rhmc_diag.make_pallas_rhmc_diag_mxu), back to back in one
    process.  Returns (xla_steps_per_sec, mxu_steps_per_sec)."""
    import jax
    import jax.numpy as jnp
    import starcat
    from starcat.configs import CONFIGS
    from starcat.integrators import riemannian_leapfrog
    from starcat.metric import make_diag_metric_fn
    from starcat.pallas_rhmc_diag import make_pallas_rhmc_diag_mxu
    from starcat.rhmc import make_rhmc_diag_functions

    cfg = CONFIGS["cfg4_crowded"]
    truth, img = cfg.make_data()
    kmax = cfg.kmax
    mask = jnp.concatenate(
        [jnp.ones(cfg.n_stars), jnp.zeros(kmax - cfg.n_stars)]
    )
    theta0 = starcat.sample_prior(jax.random.key(5), kmax, cfg.prior)[None] \
        + 0.01 * jax.random.normal(jax.random.key(6), (n_chains, kmax, 3))
    n_steps, fpi = cfg.smc.n_leapfrog, cfg.smc.fixed_point_iters

    pfn = starcat.make_potential(cfg.scene, img, cfg.prior)
    dm = make_diag_metric_fn(cfg.scene, cfg.prior)
    _, dhdt, dhdp = make_rhmc_diag_functions(pfn, dm)
    tf = theta0.reshape(n_chains, -1)
    pf = jax.random.normal(jax.random.key(7), tf.shape)

    n_scan = 5  # amortize per-call dispatch (see _scanned_traj_bench)

    @jax.jit
    def f_xla(t, p):
        def one(t1, p1):
            res = riemannian_leapfrog(
                lambda th, pp: dhdt(th, pp, mask),
                lambda th, pp: dhdp(th, pp, mask),
                t1, p1, jnp.asarray(0.02), n_steps, fpi,
            )
            return res.theta, res.p

        def body(tt, _):
            th, pp = jax.vmap(one)(tt, p)
            return th, None

        th, _ = jax.lax.scan(body, t, None, length=n_scan)
        return th, jnp.sum(th[0])

    out = f_xla(tf, pf)
    float(out[1])
    best_xla = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = f_xla(out[0], pf)
        float(out[1])
        best_xla = min(best_xla, time.perf_counter() - t0)

    fused = make_pallas_rhmc_diag_mxu(cfg.scene, img, cfg.prior, kmax,
                                      n_steps, fpi)
    xi = jax.random.normal(jax.random.key(8), theta0.shape)
    rate_mxu, _ = _scanned_traj_bench(fused, theta0, xi, mask, n_steps,
                                      n_scan, repeats)
    return (n_chains * n_steps * n_scan / best_xla, rate_mxu)


def bench_mxu_repro(rounds: int = 3, repeats: int = 3):
    """MXU-vs-XLA crowded-field comparison, ALTERNATED back-to-back in one
    process `rounds` times (VERDICT round-2 item 3: the round-2 claim
    rested on one measurement; this makes the protocol reproducible).
    Returns per-round rates and the median ratio."""
    xla, mxu = [], []
    for _ in range(rounds):
        xla.append(bench_crowded_field(repeats=repeats))
        mxu.append(bench_crowded_mxu(repeats=repeats))
    ratio = sorted(m / x for m, x in zip(mxu, xla))[rounds // 2]
    return {
        "crowded_xla_evals_per_sec_rounds": [round(r, 1) for r in xla],
        "crowded_mxu_evals_per_sec_rounds": [round(r, 1) for r in mxu],
        "mxu_vs_xla_median_ratio": round(ratio, 3),
    }


def bench_numpy_baseline(n_evals: int = 2000, repeats: int = 3):
    """Re-measure the reference-technology baseline (--retime-baseline)."""
    import jax
    import starcat  # noqa: F401
    from starcat.configs import CONFIGS
    from oracle.numpy_sampler import OracleModel

    cfg = CONFIGS["cfg2_nuts"]
    truth, img = cfg.make_data()
    model = OracleModel(
        image=np.asarray(img, np.float64),
        height=cfg.scene.height,
        width=cfg.scene.width,
        psf_sigma=cfg.scene.psf_sigma,
        background=cfg.scene.background,
        logf_mean=cfg.prior.logf_mean,
        logf_sigma=cfg.prior.logf_sigma,
    )
    theta = np.asarray(truth, np.float64).reshape(-1)
    for _ in range(200):
        model.grad_potential(theta)
    best = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(n_evals):
            model.grad_potential(theta)
        best = min(best, time.perf_counter() - t0)
    return n_evals / best


def bench_ess_per_sec(n_chains: int = 256, n_samples: int = 200, n_warmup: int = 300):
    """Secondary metric (BASELINE.json:2): NUTS ESS/sec on the 10-star
    32x32 scene (ESS of the permutation-invariant total flux, pooled
    across chains, divided by post-warmup wall time)."""
    import jax
    import starcat
    from starcat import diagnostics
    from starcat.driver import init_chain_states, sample as drv_sample, warmup
    from starcat.nuts import NUTSConfig, make_nuts_kernel

    cfg, truth, img, mask, theta0, p0, inv_mass = _bench_setup(n_chains)
    pg = starcat.make_potential_and_grad(cfg.scene, img, cfg.prior)
    grad_fn = lambda th: pg(th, mask)
    kernel = make_nuts_kernel(grad_fn, mask, NUTSConfig(step_size=0.05, max_depth=8))
    states = init_chain_states(jax.random.key(2), theta0, grad_fn)
    wr = warmup(states, kernel, n_warmup, step_size=0.05)
    r = drv_sample(wr.states, kernel, n_samples, wr.step_size, wr.inv_mass)
    jax.block_until_ready(r.thetas)
    t0 = time.perf_counter()
    r = drv_sample(r.final_states, kernel, n_samples, wr.step_size, wr.inv_mass)
    jax.block_until_ready(r.thetas)
    dt = time.perf_counter() - t0
    tot_flux = np.exp(np.asarray(r.thetas)[..., 2]).sum(-1)
    ess = diagnostics.ess(tot_flux)
    return ess / dt, ess, dt


def bench_ess_chees(n_chains: int = 256, n_samples: int = 200, n_warmup: int = 300):
    """ChEES ESS/sec on the same workload/protocol as bench_ess_per_sec —
    the lockstep adaptive-trajectory head on the runtime-trip-count fused
    kernel (VERDICT round-1 item 4)."""
    import jax
    import starcat
    from starcat import diagnostics
    from starcat.chees import ChEESConfig, make_fused_leapfrog_impl, run_chees

    cfg, truth, img, mask, theta0, p0, inv_mass = _bench_setup(n_chains)
    pg = starcat.make_potential_and_grad(cfg.scene, img, cfg.prior)
    grad_fn = lambda th: pg(th, mask)
    from starcat.chees import chees_sample

    impl = make_fused_leapfrog_impl(cfg.scene, img, cfg.prior, cfg.kmax,
                                    interpret=jax.default_backend() != "tpu")
    ccfg = ChEESConfig(step_size=0.05)
    # adapt (eps, mass, T) once, then time a sampling-only continuation —
    # the same protocol as the NUTS ESS bench (warmup excluded from timing)
    res, ad = run_chees(jax.random.key(2), grad_fn, theta0, mask,
                        n_samples, n_warmup, ccfg, leapfrog_impl=impl)
    r = chees_sample(res.final_states, grad_fn, mask, n_samples,
                     ad["step_size"], ad["inv_mass"], ad["traj_length"],
                     ccfg, impl)
    jax.block_until_ready(r.thetas)
    t0 = time.perf_counter()
    r = chees_sample(r.final_states, grad_fn, mask, n_samples,
                     ad["step_size"], ad["inv_mass"], ad["traj_length"],
                     ccfg, impl)
    jax.block_until_ready(r.thetas)
    dt = time.perf_counter() - t0
    tot_flux = np.exp(np.asarray(r.thetas)[..., 2]).sum(-1)
    ess = diagnostics.ess(tot_flux)
    return ess / dt, ess, dt, float(ad["traj_length"])


def bench_crowded_mxu(n_chains: int = 1024, n_leapfrog: int = 10,
                      n_scan: int = 5, repeats: int = 3):
    """Config-4 scene on the fused MXU trajectory kernel (pallas_mxu.py)."""
    import jax
    import jax.numpy as jnp
    import starcat
    from starcat.configs import CONFIGS
    from starcat.pallas_mxu import make_pallas_leapfrog_mxu

    cfg = CONFIGS["cfg4_crowded"]
    truth, img = cfg.make_data()
    mask = jnp.ones(cfg.n_stars)
    pg = starcat.make_potential_and_grad(cfg.scene, img, cfg.prior)
    theta0 = truth[None] + 0.01 * jax.random.normal(
        jax.random.key(0), (n_chains,) + truth.shape
    )
    p0 = jax.random.normal(jax.random.key(1), theta0.shape)
    inv_mass = jnp.ones(truth.shape)
    fused = make_pallas_leapfrog_mxu(cfg.scene, img, cfg.prior, cfg.n_stars,
                                     n_leapfrog)
    _, g0 = jax.jit(jax.vmap(lambda th: pg(th, mask)))(theta0)

    @jax.jit
    def many(theta, p, grad):
        def body(carry, _):
            th, pp, g = carry
            th, pp, _, g = fused(th, pp, 0.0005, inv_mass, mask, grad=g)
            return (th, pp, g), None

        return jax.lax.scan(body, (theta, p, grad), None, length=n_scan)[0]

    out = many(theta0, p0, g0)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = many(theta0, p0, g0)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return n_chains * n_leapfrog * n_scan / best


def bench_crowded_field(n_chains: int = 1024, n_leapfrog: int = 10,
                        n_scan: int = 10, repeats: int = 3):
    """Config-4 scene (50 stars, 128x128) on the XLA/MXU path — the
    deliberate large-scene route (pallas_kernels.fused_supported)."""
    import jax
    import jax.numpy as jnp
    import starcat
    from starcat.configs import CONFIGS
    from starcat.integrators import leapfrog

    cfg = CONFIGS["cfg4_crowded"]
    truth, img = cfg.make_data()
    mask = jnp.ones(cfg.n_stars)
    pg = starcat.make_potential_and_grad(cfg.scene, img, cfg.prior)
    grad_fn = lambda th: pg(th, mask)
    theta0 = truth[None] + 0.01 * jax.random.normal(
        jax.random.key(0), (n_chains,) + truth.shape
    )
    p0 = jax.random.normal(jax.random.key(1), theta0.shape)
    inv_mass = jnp.ones(truth.shape)

    @jax.jit
    def many(theta, p):
        us, gs = jax.vmap(grad_fn)(theta)

        def body(carry, _):
            th, pp, u, g = carry
            res = jax.vmap(
                lambda t, q, uu, gg: leapfrog(
                    grad_fn, t, q, uu, gg, jnp.asarray(0.0005), n_leapfrog,
                    inv_mass)
            )(th, pp, u, g)
            return (res.theta, res.p, res.u, res.grad), None

        return jax.lax.scan(body, (theta, p, us, gs), None, length=n_scan)[0]

    out = many(theta0, p0)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = many(theta0, p0)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return n_chains * n_leapfrog * n_scan / best


def bench_scaling(device_counts=None, n_chains: int = 1024,
                  n_samples: int = 100, n_leapfrog: int = 10,
                  verify: bool = False):
    """Turn-key multi-chip/multi-host scaling harness (VERDICT round-4
    item 5; BASELINE.json:5 "samples/s at 1 chip, 1 host and N hosts").

    Protocol (SURVEY.md §7.3 "multi-host jitter and benchmark honesty"):
    for each device count d, shard the chain axis of the flagship config-2
    HMC workload over a d-device mesh, synchronize every device with a
    psum-of-ones BARRIER, then time a fixed sampling scan end to end and
    report samples/s (= chains x draws / wall).  Efficiency is measured
    against the 1-device row's per-device rate, so a multi-host run's
    >=95% target (BASELINE.json:5) reads directly off the output.

    On this VM only one real chip exists, so the TPU run emits the 1-chip
    row; the same function runs on the fake 8-device CPU mesh
    (conftest/XLA_FLAGS trick) where `verify=True` additionally asserts
    the PLUMBING — per-device work (the sampled draws actually live on d
    devices) and collective counts (the pooled-warmup program contains
    cross-device all-reduces exactly when d > 1) — wall-clock numbers on
    the fake mesh are meaningless and not asserted.  A real pod run is:
        python bench.py --scaling            # on each host, via
        starcat.dist.init_distributed(...)   # jax.distributed
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    import starcat
    from starcat.configs import CONFIGS
    from starcat.dist import make_mesh, shard_chains
    from starcat.driver import (
        _warmup_chunk, init_chain_states, sample as drv_sample,
    )
    from starcat.adapt import da_init, welford_init
    from starcat.hmc import HMCConfig, make_hmc_kernel

    cfg, truth, img, mask, _, _, _ = _bench_setup(max(n_chains, 128))
    pg = starcat.make_potential_and_grad(cfg.scene, img, cfg.prior)
    grad_fn = lambda th: pg(th, mask)
    kernel = make_hmc_kernel(
        grad_fn, mask, HMCConfig(step_size=0.02, n_leapfrog=n_leapfrog))

    n_avail = len(jax.devices())
    if device_counts is None:
        device_counts = [d for d in (1, 2, 4, 8, 16, 32, 64) if d <= n_avail]
    rows = []
    for d in device_counts:
        mesh = make_mesh("chains", n_devices=d)
        c = max(n_chains // d, 1) * d  # divisible chain count
        theta0 = truth[None] + 0.01 * jax.random.normal(
            jax.random.key(0), (c,) + truth.shape)
        theta0 = shard_chains(theta0, mesh)
        states = init_chain_states(jax.random.key(1), theta0, grad_fn)
        eps = jnp.asarray(0.02)
        inv_mass = jnp.ones(truth.shape, jnp.float32)

        if verify:
            # collective count: the pooled-warmup chunk (per-iteration
            # cross-chain mean feeding dual averaging) must lower to
            # cross-device all-reduces exactly when the mesh has > 1 device
            da = da_init(0.02)
            wf = welford_init(truth.shape)
            hlo = _warmup_chunk.lower(
                states, kernel, da, wf, inv_mass, jnp.zeros(()), 5, True,
                0.8, 0.0,
            ).compile().as_text()
            n_ar = hlo.count("all-reduce")
            assert (n_ar > 0) == (d > 1), (d, n_ar)

        # psum-of-ones barrier over the mesh: every device aligned before
        # the timer starts (SURVEY.md §7.3 benchmark honesty)
        ones = shard_chains(jnp.ones((d,), jnp.float32), mesh)
        barrier = jax.jit(jax.shard_map(
            lambda x: jax.lax.psum(jnp.sum(x), "chains"),
            mesh=mesh, in_specs=P("chains"), out_specs=P()))
        jax.block_until_ready(barrier(ones))

        # warm the sampling program, then barrier + time it
        r = drv_sample(states, kernel, n_samples, eps, inv_mass)
        jax.block_until_ready(r.thetas)
        jax.block_until_ready(barrier(ones))
        t0 = time.perf_counter()
        r = drv_sample(r.final_states, kernel, n_samples, eps, inv_mass)
        jax.block_until_ready(r.thetas)
        dt = time.perf_counter() - t0
        if verify:  # per-device work: the draws really live on d devices
            assert len(r.thetas.sharding.device_set) == d, r.thetas.sharding
        rows.append({
            "devices": d,
            "chains": c,
            "samples_per_sec": round(c * n_samples / dt, 1),
            "sec": round(dt, 4),
        })
    base = rows[0]["samples_per_sec"] / rows[0]["devices"]
    for row in rows:
        row["efficiency_vs_1dev"] = round(
            row["samples_per_sec"] / (base * row["devices"]), 4)
    return {
        "metric": "hmc_samples_per_sec_scaling",
        "unit": "chains*draws/s",
        "workload": f"cfg2 scene, {n_leapfrog}-leapfrog HMC, "
                    f"{n_samples} draws, barrier-synced",
        "backend": jax.default_backend(),
        "points": rows,
    }


def main():
    ap = argparse.ArgumentParser()
    # 32768 chains is the single-chip saturation point of the fused kernel
    # (throughput-vs-chains measured round 1: 1k=18.5M, 8k=28M, 32k=40.7M);
    # the sampler state is tiny (3.9 MB), so "thousands of chains" (B:5)
    # runs at the saturated operating point.
    ap.add_argument("--chains", type=int, default=32768)
    ap.add_argument("--leapfrog", type=int, default=20)
    ap.add_argument("--scan", type=int, default=50)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--full", action="store_true")
    ap.add_argument("--mxu-repro", action="store_true",
                    help="alternated MXU-vs-XLA crowded-field comparison "
                         "(>=3 rounds, one process) and exit")
    ap.add_argument("--scaling", action="store_true",
                    help="barrier-synchronized samples/s over 1..N-device "
                         "meshes (BASELINE.json:5 scaling points) and exit")
    ap.add_argument("--retime-baseline", action="store_true",
                    help="re-measure the NumPy baseline instead of the pin")
    args = ap.parse_args()

    import jax

    on_tpu = jax.default_backend() == "tpu"
    if args.mxu_repro:
        print(json.dumps(bench_mxu_repro(repeats=args.repeats)))
        raise SystemExit(0)
    if args.scaling:
        print(json.dumps(bench_scaling()))
        raise SystemExit(0)
    rate, best = bench_pallas_grad_evals(args.chains, args.leapfrog,
                                         args.scan, args.repeats)
    np_rate = (bench_numpy_baseline() if args.retime_baseline
               else NUMPY_BASELINE_EVALS_PER_SEC)

    if args.full:
        full = {
            "pallas_fused_leapfrog_evals_per_sec": round(rate, 1),
            "pallas_best_ms": round(best * 1e3, 2),
            "chains": args.chains,
        }
        xla_rate, _ = bench_xla_grad_evals(args.chains, args.leapfrog,
                                           args.scan, args.repeats)
        full["xla_leapfrog_evals_per_sec"] = round(xla_rate, 1)
        full["pallas_vs_xla"] = round(rate / xla_rate, 2)
        rhmc_rate, rhmc_best = bench_pallas_rhmc_steps(min(args.chains, 1024))
        full["pallas_rhmc_steps_per_sec"] = round(rhmc_rate, 1)
        diag_rate, _ = bench_rhmc_diag_steps(min(args.chains, 1024))
        full["rhmc_diag_steps_per_sec"] = round(diag_rate, 1)
        pdiag_rate, _ = bench_pallas_rhmc_diag_steps(min(args.chains, 1024))
        full["pallas_rhmc_diag_steps_per_sec"] = round(pdiag_rate, 1)
        full["pallas_rhmc_diag_vs_xla"] = round(pdiag_rate / diag_rate, 2)
        cr_xla, cr_mxu = bench_rhmc_diag_crowded()
        full["crowded_rhmc_diag_xla_steps_per_sec"] = round(cr_xla, 1)
        full["crowded_rhmc_diag_mxu_steps_per_sec"] = round(cr_mxu, 1)
        full["crowded_rhmc_diag_mxu_vs_xla"] = round(cr_mxu / cr_xla, 2)
        ess_rate, ess, dt = bench_ess_per_sec()
        full["nuts_ess_per_sec"] = round(ess_rate, 1)
        full["nuts_ess"] = round(float(ess), 1)
        ch_rate, ch_ess, ch_dt, traj = bench_ess_chees()
        full["chees_ess_per_sec"] = round(ch_rate, 1)
        full["chees_ess"] = round(float(ch_ess), 1)
        full["chees_traj_length"] = round(traj, 3)
        # production chain count (round 4): the chain-count-aware adam_lr
        # fixed the >=1024-chain collapse (runs/chees_chain_sweep.json) —
        # measure the 1024-chain operating point in the artifact too
        ch_rate_1k, ch_ess_1k, _, traj_1k = bench_ess_chees(n_chains=1024)
        full["chees_ess_per_sec_1024"] = round(ch_rate_1k, 1)
        full["chees_ess_1024"] = round(float(ch_ess_1k), 1)
        full["chees_traj_length_1024"] = round(traj_1k, 3)
        full["crowded_field_xla_evals_per_sec"] = round(bench_crowded_field(), 1)
        full["crowded_field_mxu_evals_per_sec"] = round(bench_crowded_mxu(), 1)
        sweep = {}
        for c in (1024, 8192):
            r, _ = bench_pallas_grad_evals(c, args.leapfrog, args.scan, 2)
            sweep[str(c)] = round(r, 1)
        sweep[str(args.chains)] = round(rate, 1)
        full["chain_sweep_evals_per_sec"] = sweep
        full["numpy_baseline_evals_per_sec"] = round(np_rate, 1)
        with open("BENCH_FULL.json", "w") as fh:
            json.dump(full, fh, indent=1)
        print(json.dumps({"bench_full": full}))

    headline = {
        "metric": "leapfrog_grad_evals_per_sec_per_chip",
        "value": round(rate, 1),
        "unit": "evals/s",
        "vs_baseline": round(rate / np_rate, 2),
    }
    floor_violation = on_tpu and rate < FLOOR_EVALS_PER_SEC
    if floor_violation:
        headline["floor_violation"] = True
        headline["floor"] = FLOOR_EVALS_PER_SEC
    print(json.dumps(headline))
    raise SystemExit(1 if floor_violation else 0)


if __name__ == "__main__":
    main()
