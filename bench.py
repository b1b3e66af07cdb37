#!/usr/bin/env python
"""Benchmark harness headline (SURVEY.md ⑲; BASELINE.json:2).

Prints ONE JSON line:
  {"metric": "leapfrog_grad_evals_per_sec_per_chip", "value": N,
   "unit": "evals/s", "vs_baseline": R}

The workload is the flagship config-2 shape: 1024 vmapped chains on the
10-star 32x32 scene, timing fused leapfrog trajectories (the hot loop of
every head — SURVEY.md §3.1 "HOTTEST").  The reference publishes no
numbers (BASELINE.md), so vs_baseline is the measured speedup over the
in-repo NumPy oracle's gradient evaluation rate on the SAME scene — the
reference's implementation technology (single-process CPU NumPy,
BASELINE.json:7).

Runs on whatever backend jax defaults to (the real TPU chip under axon);
`python bench.py --full` adds secondary metrics (ESS/sec via NUTS) on
stderr-free extra lines prefixed with '#'.
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


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


def bench_pallas_rhmc_steps(n_chains: int = 1024, n_steps: int = 10,
                            fpi: int = 6, repeats: int = 3):
    """Secondary: fused Pallas Riemannian leapfrog (pallas_rhmc.py) —
    full-Fisher-metric generalized-leapfrog steps/s.  The XLA autodiff
    path measures ~11.4k steps/s on this workload (v5e, 1024 chains)."""
    import jax
    from starcat.pallas_rhmc import make_pallas_rhmc_leapfrog

    cfg, truth, img, mask, theta0, p0, inv_mass = _bench_setup(n_chains)
    fused = make_pallas_rhmc_leapfrog(
        cfg.scene, img, cfg.prior, cfg.kmax, n_steps, fpi
    )
    xi = jax.random.normal(jax.random.key(2), theta0.shape)
    f = jax.jit(lambda t, x: fused(t, x, 0.02, mask, 1.0))
    out = f(theta0, xi)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = f(out[0], xi)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return n_chains * n_steps / best, best


def bench_numpy_baseline(n_evals: int = 300):
    """Reference-technology baseline: oracle NumPy grad rate, same scene."""
    import jax
    import jax.numpy as jnp
    import starcat
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
    model.grad_potential(theta)  # warm caches
    t0 = time.perf_counter()
    for _ in range(n_evals):
        model.grad_potential(theta)
    dt = time.perf_counter() - t0
    return n_evals / dt


def bench_ess_per_sec(n_chains: int = 256, n_samples: int = 200, n_warmup: int = 300):
    """Secondary metric (BASELINE.json:2): ESS/sec on the 10-star 32x32
    scene via the NUTS head (ESS of the permutation-invariant total flux,
    pooled across chains, divided by post-warmup wall time)."""
    import jax
    import jax.numpy as jnp
    import starcat
    from starcat import diagnostics
    from starcat.configs import CONFIGS
    from starcat.driver import init_chain_states, sample as drv_sample, warmup
    from starcat.nuts import NUTSConfig, make_nuts_kernel

    cfg, truth, img, mask, theta0, p0, inv_mass = _bench_setup(n_chains)
    pg = starcat.make_potential_and_grad(cfg.scene, img, cfg.prior)
    grad_fn = lambda th: pg(th, mask)
    kernel = make_nuts_kernel(grad_fn, mask, NUTSConfig(step_size=0.05, max_depth=8))
    states = init_chain_states(jax.random.key(2), theta0, grad_fn)
    wr = warmup(states, kernel, n_warmup, step_size=0.05)
    # compile sampling before timing
    r = drv_sample(wr.states, kernel, n_samples, wr.step_size, wr.inv_mass)
    jax.block_until_ready(r.thetas)
    t0 = time.perf_counter()
    r = drv_sample(r.final_states, kernel, n_samples, wr.step_size, wr.inv_mass)
    jax.block_until_ready(r.thetas)
    dt = time.perf_counter() - t0
    tot_flux = np.exp(np.asarray(r.thetas)[..., 2]).sum(-1)
    ess = diagnostics.ess(tot_flux)
    return ess / dt, ess, dt


def main():
    ap = argparse.ArgumentParser()
    # 32768 chains is the single-chip saturation point of the fused kernel
    # (throughput-vs-chains measured: 1k=18.5M, 8k=28M, 32k=33M evals/s);
    # the sampler state is tiny (3.9 MB), so "thousands of chains" (B:5)
    # runs at the saturated operating point.
    ap.add_argument("--chains", type=int, default=32768)
    ap.add_argument("--leapfrog", type=int, default=20)
    ap.add_argument("--scan", type=int, default=50)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--full", action="store_true")
    args = ap.parse_args()

    rate, best = bench_pallas_grad_evals(args.chains, args.leapfrog, args.scan, args.repeats)
    np_rate = bench_numpy_baseline()

    if args.full:
        xla_rate, _ = bench_xla_grad_evals(args.chains, args.leapfrog, args.scan, args.repeats)
        rhmc_rate, rhmc_best = bench_pallas_rhmc_steps(args.chains)
        ess_rate, ess, dt = bench_ess_per_sec()
        print(f"# pallas fused leapfrog: {rate:,.0f} grad-evals/s ({best * 1e3:.1f} ms best, "
              f"{args.chains} chains x {args.leapfrog} steps x {args.scan} scans)")
        print(f"# xla leapfrog (f32 'highest'): {xla_rate:,.0f} grad-evals/s "
              f"({rate / xla_rate:.2f}x pallas speedup)")
        print(f"# pallas fused RIEMANNIAN leapfrog: {rhmc_rate:,.0f} steps/s "
              f"({rhmc_best * 1e3:.1f} ms/traj; XLA autodiff path ~11.4k steps/s)")
        print(f"# numpy oracle baseline: {np_rate:,.0f} grad-evals/s (single process)")
        print(f"# NUTS ESS/sec (total flux, 10-star 32x32): {ess_rate:,.0f} "
              f"(ESS {ess:,.0f} in {dt:.1f}s post-warmup)")

    print(json.dumps({
        "metric": "leapfrog_grad_evals_per_sec_per_chip",
        "value": round(rate, 1),
        "unit": "evals/s",
        "vs_baseline": round(rate / np_rate, 2),
    }))


if __name__ == "__main__":
    main()
