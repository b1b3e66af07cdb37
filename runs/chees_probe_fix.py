"""Round-5 T-probe validation: rerun the chain-sweep rows where the Adam
ascent landed at a seed-dependent low T (runs/chees_chain_sweep_r5.json:
256/seed{3,4}, 512/seed{3,4}, 1024/seed4 — pooled ESS/s 1.9-5k vs 14-22k
on the good seeds) with the post-warmup T probe enabled (the round-5
default, ChEESConfig.t_probe_factors), plus good rows (256/seed2,
1024/seed2, 4096/seed2) to confirm the probe does not degrade healthy
landings.  Protocol identical to runs/chees_chain_sweep_r5.py (the probe
is the ONLY delta — that script ran at the pre-probe HEAD).

Run from /root/repo on the TPU:
    PYTHONPATH=/root/repo:/root/.axon_site python runs/chees_probe_fix.py
Writes runs/chees_probe_fix.json.
"""
import json
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

import starcat
from starcat import diagnostics
from starcat.chees import (
    ChEESConfig,
    chees_sample,
    make_fused_leapfrog_impl,
    run_chees,
)
from starcat.configs import CONFIGS

N_SAMPLES, N_WARMUP = 200, 300

cfg = CONFIGS["cfg2_nuts"]
truth, img = cfg.make_data()
mask = jnp.ones(cfg.kmax)
pg = starcat.make_potential_and_grad(cfg.scene, img, cfg.prior)
grad_fn = lambda th: pg(th, mask)
impl = make_fused_leapfrog_impl(cfg.scene, img, cfg.prior, cfg.kmax,
                                interpret=jax.default_backend() != "tpu")


def ess_centered(x):
    xc = x - x.mean(axis=1, keepdims=True)
    return diagnostics.ess(xc)


def one(n_chains, seed):
    ccfg = ChEESConfig(step_size=0.05)  # probe ON by default (round 5)
    theta0 = truth[None] + 0.01 * jax.random.normal(
        jax.random.key(0), (n_chains,) + truth.shape
    )
    t0 = time.perf_counter()
    res, ad = run_chees(jax.random.key(seed), grad_fn, theta0, mask,
                        N_SAMPLES, N_WARMUP, ccfg, leapfrog_impl=impl)
    jax.block_until_ready(res.thetas)
    warm_wall = time.perf_counter() - t0
    traj = jnp.asarray(ad["traj_length"])
    r = chees_sample(res.final_states, grad_fn, mask, N_SAMPLES,
                     ad["step_size"], ad["inv_mass"], traj, ccfg, impl)
    jax.block_until_ready(r.thetas)
    t0 = time.perf_counter()
    r = chees_sample(r.final_states, grad_fn, mask, N_SAMPLES,
                     ad["step_size"], ad["inv_mass"], traj, ccfg, impl)
    jax.block_until_ready(r.thetas)
    dt = time.perf_counter() - t0

    tot_flux = np.exp(np.asarray(r.thetas)[..., 2]).sum(-1)
    ess_total = diagnostics.ess(tot_flux)
    return {
        "n_chains": n_chains, "seed": seed,
        "adapted_traj": float(ad["traj_length"]),
        "t_probe_factor": float(ad["t_probe_factor"]),
        "traj_drift": round(float(ad["traj_drift"]), 4),
        "warmup_extensions": int(ad["warmup_extensions"]),
        "step_size": float(ad["step_size"]),
        "warmup_plus_probe_wall": round(warm_wall, 2),
        "sec_timed": round(dt, 4),
        "ess_total_flux": round(float(ess_total), 1),
        "ess_per_sec": round(float(ess_total) / dt, 1),
        "ess_centered": round(float(ess_centered(tot_flux)), 1),
        "split_rhat_total_flux": round(
            float(diagnostics.split_rhat(tot_flux)), 4),
        "accept": round(float(np.asarray(r.accept_prob).mean()), 4),
    }


out = {"protocol": "chain-sweep rows rerun with the round-5 T probe "
                   "(sole delta vs runs/chees_chain_sweep_r5.json)",
       "rows": []}
for c, seed in ((256, 3), (256, 4), (512, 3), (512, 4), (1024, 4),
                (256, 2), (1024, 2), (4096, 2)):
    r = one(c, seed)
    out["rows"].append(r)
    print(json.dumps(r), flush=True)
    with open("runs/chees_probe_fix.json", "w") as fh:
        json.dump(out, fh, indent=1)
print("wrote runs/chees_probe_fix.json")
