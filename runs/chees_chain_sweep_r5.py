"""Round-5 ChEES chain-count sweep at the SHIPPED defaults + 512-chain
root-cause diagnostics (VERDICT round-4 item 1b / Missing #2).

What changed since runs/chees_chain_sweep.py (round 4):
  - adam_lr now resolves smoothly (resolve_adam_lr: 0.025*sqrt(C/256)
    clipped to [0.025, 0.05]), so 512 runs 0.035 and 2048 runs 0.05 —
    both previously unmeasured holes;
  - warmup carries the T-convergence gate (traj_drift / extensions), so
    every row also records whether the ascent had settled.

Protocol = bench.bench_ess_chees (cfg2 scene, fused dyn kernel, warmup
excluded, timed 200-draw sampling continuation), swept over chain counts
with 3 seeds each (the round-4 sweep was single-seed; its 512-row deficit
could be tail noise).  For the 512-chain root cause, each row additionally
records the ESS DECOMPOSITION:
  - ess_total: the pooled estimator (between-chain variance included) —
    the headline quantity;
  - ess_centered: same estimator on per-chain mean-centered series — pure
    within-chain mixing, immune to chain disagreement;
  - stuck chains (per-chain mean accept < 0.2) and worst chain-mean
    z-scores — is the between-chain variance a bulk effect or a few
    outlier ancestries?
And one long-window variant at 512 (1000 draws) tests whether the deficit
is a 200-draw-window transient (chain means still carrying init/warmup
memory) or persistent disagreement.

Run from /root/repo on the TPU:
    python runs/chees_chain_sweep_r5.py
Writes runs/chees_chain_sweep_r5.json.
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
    resolve_adam_lr,
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
    """Pooled ESS on per-chain mean-centered series: within-chain mixing
    only (drops the between-chain variance term entirely)."""
    xc = x - x.mean(axis=1, keepdims=True)
    return diagnostics.ess(xc)


def one(n_chains, seed=2, n_samples=N_SAMPLES, ccfg=None):
    ccfg = ccfg or ChEESConfig(step_size=0.05)
    theta0 = truth[None] + 0.01 * jax.random.normal(
        jax.random.key(0), (n_chains,) + truth.shape
    )
    res, ad = run_chees(jax.random.key(seed), grad_fn, theta0, mask,
                        n_samples, N_WARMUP, ccfg, leapfrog_impl=impl)
    traj = jnp.asarray(ad["traj_length"])
    r = chees_sample(res.final_states, grad_fn, mask, n_samples,
                     ad["step_size"], ad["inv_mass"], traj, ccfg, impl)
    jax.block_until_ready(r.thetas)
    t0 = time.perf_counter()
    r = chees_sample(r.final_states, grad_fn, mask, n_samples,
                     ad["step_size"], ad["inv_mass"], traj, ccfg, impl)
    jax.block_until_ready(r.thetas)
    dt = time.perf_counter() - t0

    tot_flux = np.exp(np.asarray(r.thetas)[..., 2]).sum(-1)  # (C, N)
    acc = np.asarray(r.accept_prob)                          # (C, N)
    chain_means = tot_flux.mean(1)
    w_sd = tot_flux.std(1, ddof=1).mean()
    mean_z = np.abs(chain_means - chain_means.mean()) / max(w_sd, 1e-9)
    ess_total = diagnostics.ess(tot_flux)
    return {
        "n_chains": n_chains,
        "seed": seed,
        "n_samples": n_samples,
        "adam_lr": resolve_adam_lr(n_chains),
        "adapted_traj": float(ad["traj_length"]),
        "traj_drift": float(ad["traj_drift"]),
        "traj_converged": bool(ad["traj_converged"]),
        "warmup_extensions": int(ad["warmup_extensions"]),
        "step_size": float(ad["step_size"]),
        "warmup_divergences": int(ad["warmup_divergences"]),
        "sec_timed": round(dt, 4),
        "ess_total_flux": round(float(ess_total), 1),
        "ess_per_sec": round(float(ess_total) / dt, 1),
        "ess_centered": round(float(ess_centered(tot_flux)), 1),
        "split_rhat_total_flux": round(float(diagnostics.split_rhat(tot_flux)), 4),
        "accept": round(float(acc.mean()), 4),
        "n_stuck_chains": int((acc.mean(1) < 0.2).sum()),
        "worst_chain_mean_z": round(float(mean_z.max()), 2),
        "n_chain_mean_z_gt3": int((mean_z > 3.0).sum()),
    }


out = {"protocol": "bench_ess_chees sweep at round-5 shipped defaults "
                   "(smooth lr + T-convergence gate), 3 seeds per count, "
                   "200 timed draws, warmup excluded",
       "sweep": [], "long_window_512": [], "long_window_1024": []}

for c in (256, 512, 1024, 2048, 4096):
    for seed in (2, 3, 4):
        r = one(c, seed=seed)
        out["sweep"].append(r)
        print(json.dumps(r), flush=True)
        with open("runs/chees_chain_sweep_r5.json", "w") as fh:
            json.dump(out, fh, indent=1)

# long-window variants: does the pooled-ESS deficit persist at 1000 draws,
# or is it a short-window transient of chain-mean memory?
for c, key_ in ((512, "long_window_512"), (1024, "long_window_1024")):
    r = one(c, seed=2, n_samples=1000)
    out[key_].append(r)
    print(json.dumps(r), flush=True)
    with open("runs/chees_chain_sweep_r5.json", "w") as fh:
        json.dump(out, fh, indent=1)

print("wrote runs/chees_chain_sweep_r5.json")
