"""Follow-up to runs/chees_chain_sweep.py: pin the adam_lr fix.

The sweep showed the ≥1024-chain ESS/s collapse is the log-T Adam ascent
under-converging within the fixed warmup when the pooled ChEES gradient is
smooth (large C): lr 0.05 at 1024 chains restored T≈30 and 22k ESS/s.
This script checks lr=0.05 doesn't hurt 256 chains, replicates the
1024-chain fix on a fresh seed, and asks which lr the 4096-chain optimum
wants, to choose the shipped default.

Run from /root/repo: python -c "exec(open('runs/chees_lr_fix.py').read())"
Writes runs/chees_lr_fix.json.
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
from starcat.chees import ChEESConfig, chees_sample, make_fused_leapfrog_impl, run_chees
from starcat.configs import CONFIGS

N_SAMPLES, N_WARMUP = 200, 300

cfg = CONFIGS["cfg2_nuts"]
truth, img = cfg.make_data()
mask = jnp.ones(cfg.kmax)
pg = starcat.make_potential_and_grad(cfg.scene, img, cfg.prior)
grad_fn = lambda th: pg(th, mask)
impl = make_fused_leapfrog_impl(cfg.scene, img, cfg.prior, cfg.kmax,
                                interpret=jax.default_backend() != "tpu")


def one(n_chains, ccfg, seed=2):
    theta0 = truth[None] + 0.01 * jax.random.normal(
        jax.random.key(0), (n_chains,) + truth.shape
    )
    res, ad = run_chees(jax.random.key(seed), grad_fn, theta0, mask,
                        N_SAMPLES, N_WARMUP, ccfg, leapfrog_impl=impl)
    r = chees_sample(res.final_states, grad_fn, mask, N_SAMPLES,
                     ad["step_size"], ad["inv_mass"], ad["traj_length"],
                     ccfg, impl)
    jax.block_until_ready(r.thetas)
    t0 = time.perf_counter()
    r = chees_sample(r.final_states, grad_fn, mask, N_SAMPLES,
                     ad["step_size"], ad["inv_mass"], ad["traj_length"],
                     ccfg, impl)
    jax.block_until_ready(r.thetas)
    dt = time.perf_counter() - t0
    tot = np.exp(np.asarray(r.thetas)[..., 2]).sum(-1)
    ess = diagnostics.ess(tot)
    return {
        "n_chains": n_chains, "adam_lr": ccfg.adam_lr, "seed": seed,
        "adapted_traj": float(ad["traj_length"]),
        "step_size": float(ad["step_size"]),
        "sec_per_200_draws": round(dt, 4),
        "ess_total_flux": round(float(ess), 1),
        "ess_per_sec": round(float(ess) / dt, 1),
        "split_rhat_total_flux": round(float(diagnostics.split_rhat(tot)), 4),
    }


out = {}
for name, c, lr, seed in (("c256_lr05", 256, 0.05, 2),
                          ("c1024_lr05_seed3", 1024, 0.05, 3),
                          ("c4096_lr05", 4096, 0.05, 2),
                          ("c4096_lr10", 4096, 0.10, 2)):
    r = one(c, ChEESConfig(step_size=0.05, adam_lr=lr), seed=seed)
    out[name] = r
    print(name, json.dumps(r))

with open("runs/chees_lr_fix.json", "w") as fh:
    json.dump(out, fh, indent=1)
print("wrote runs/chees_lr_fix.json")
