"""Round-5 relocation cure validation: the chain-sweep rows rerun with the
dimension-preserving relocate sweep composed into the sampler (the shipped
default for stellar ChEES runs, ChEESConfig.relocate_every=16 + the
equilibration detector).  The mechanism chain
(sweep -> probe -> long-window -> eq-gate, docs/DESIGN.md) established
that bad seeds' chain populations split across metastable star/flux
configurations that trajectories cannot hop; transdim.relocate_step jumps
them directly (death + residual-driven birth fused into one exact MH
move).  Expectation: bad-row eq_disagreement falls through warmup blocks
and pooled short-window ESS/s rises toward the within-chain level; good
rows unchanged; posterior moments invariant (exact kernel).

Run: PYTHONPATH=/root/repo:/root/.axon_site python runs/chees_relocate.py
Writes runs/chees_relocate.json.
"""
import json, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import starcat
from starcat import diagnostics
from starcat.chees import (ChEESConfig, chees_sample, make_chees_relocate,
                           make_fused_leapfrog_impl, run_chees)
from starcat.configs import CONFIGS

N_SAMPLES, N_WARMUP = 200, 300
cfg = CONFIGS["cfg2_nuts"]
truth, img = cfg.make_data()
mask = jnp.ones(cfg.kmax)
pg = starcat.make_potential_and_grad(cfg.scene, img, cfg.prior)
grad_fn = lambda th: pg(th, mask)
impl = make_fused_leapfrog_impl(cfg.scene, img, cfg.prior, cfg.kmax,
                                interpret=jax.default_backend() != "tpu")
reloc = make_chees_relocate(cfg.scene, img, cfg.prior)

def ess_centered(x):
    return diagnostics.ess(x - x.mean(axis=1, keepdims=True))

def one(n_chains, seed):
    ccfg = ChEESConfig(step_size=0.05)  # relocate_every=16 default
    theta0 = truth[None] + 0.01 * jax.random.normal(
        jax.random.key(0), (n_chains,) + truth.shape)
    t0 = time.perf_counter()
    res, ad = run_chees(jax.random.key(seed), grad_fn, theta0, mask,
                        N_SAMPLES, N_WARMUP, ccfg, leapfrog_impl=impl,
                        relocate_fn=reloc)
    jax.block_until_ready(res.thetas)
    warm_wall = time.perf_counter() - t0
    traj = jnp.asarray(ad["traj_length"])
    r = chees_sample(res.final_states, grad_fn, mask, N_SAMPLES,
                     ad["step_size"], ad["inv_mass"], traj, ccfg, impl,
                     relocate_fn=reloc)
    jax.block_until_ready(r.thetas)
    t0 = time.perf_counter()
    r = chees_sample(r.final_states, grad_fn, mask, N_SAMPLES,
                     ad["step_size"], ad["inv_mass"], traj, ccfg, impl,
                     relocate_fn=reloc)
    jax.block_until_ready(r.thetas)
    dt = time.perf_counter() - t0
    tot = np.exp(np.asarray(r.thetas)[..., 2]).sum(-1)
    ess = diagnostics.ess(tot)
    row = {"n_chains": n_chains, "seed": seed,
           "adapted_traj": round(float(traj), 2),
           "eq_stages": int(ad["eq_stages"]),
           "eq_disagreement": round(float(ad["eq_disagreement"]), 4),
           "warmup_wall": round(warm_wall, 2),
           "sec_timed": round(dt, 4),
           "ess_total_flux": round(float(ess), 1),
           "ess_per_sec": round(float(ess) / dt, 1),
           "ess_centered": round(float(ess_centered(tot)), 1),
           "split_rhat_total_flux": round(float(diagnostics.split_rhat(tot)), 4),
           "accept": round(float(np.asarray(r.accept_prob).mean()), 4),
           "mean_total_flux": round(float(tot.mean()), 1)}
    print(json.dumps(row), flush=True)
    return row

out = {"protocol": "chain-sweep rows rerun with relocation every 16 draws "
                   "+ equilibration detector (the round-5 shipped default; "
                   "compare runs/chees_chain_sweep_r5.json [no cure] and "
                   "runs/chees_eq_gate.json [detector only])", "rows": []}
for c, s in ((256, 3), (256, 4), (512, 3), (512, 4), (1024, 4),
             (256, 2), (512, 2), (1024, 2), (2048, 4), (4096, 2)):
    out["rows"].append(one(c, s))
    with open("runs/chees_relocate.json", "w") as fh:
        json.dump(out, fh, indent=1)
print("wrote runs/chees_relocate.json")
