"""Round-5 equilibration-gate validation: the chain-sweep rows rerun with
the gate (ChEESConfig.eq_tol=0.5, max_eq_stages=3 — the full
escalation ladder; the shipped default became 2 after this record).  Protocol identical to runs/chees_chain_sweep_r5.py
(probe off; the gate is the sole delta).  Expectation from the mechanism
chain (sweep -> probe negative result -> long-window persistence ->
stuck-chain diagnosis): bad-seed rows reconcile during the discarded
blocks and their pooled short-window ESS/s rises toward the
within-chain (ess_centered) level; good-seed rows pay one ~50-draw check
block and are otherwise unchanged.

Run: PYTHONPATH=/root/repo:/root/.axon_site python runs/chees_eq_gate.py
Writes runs/chees_eq_gate.json.
"""
import json, time
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

def ess_centered(x):
    return diagnostics.ess(x - x.mean(axis=1, keepdims=True))

def one(n_chains, seed):
    ccfg = ChEESConfig(step_size=0.05)  # gate ON by default (round 5)
    theta0 = truth[None] + 0.01 * jax.random.normal(
        jax.random.key(0), (n_chains,) + truth.shape)
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
    tot = np.exp(np.asarray(r.thetas)[..., 2]).sum(-1)
    ess = diagnostics.ess(tot)
    row = {"n_chains": n_chains, "seed": seed,
           "adapted_traj": round(float(traj), 2),
           "eq_stages": int(ad["eq_stages"]),
           "eq_disagreement": round(float(ad["eq_disagreement"]), 4),
           "traj_drift": round(float(ad["traj_drift"]), 4),
           "step_size": float(ad["step_size"]),
           "warmup_incl_gate_wall": round(warm_wall, 2),
           "sec_timed": round(dt, 4),
           "ess_total_flux": round(float(ess), 1),
           "ess_per_sec": round(float(ess) / dt, 1),
           "ess_centered": round(float(ess_centered(tot)), 1),
           "split_rhat_total_flux": round(float(diagnostics.split_rhat(tot)), 4),
           "accept": round(float(np.asarray(r.accept_prob).mean()), 4)}
    print(json.dumps(row), flush=True)
    return row

out = {"protocol": "chain-sweep rows rerun with the round-5 equilibration "
                   "gate (sole delta vs runs/chees_chain_sweep_r5.json; "
                   "probe off)", "rows": []}
for c, s in ((256, 3), (256, 4), (512, 3), (512, 4), (1024, 4),
             (256, 2), (512, 2), (1024, 2), (2048, 4), (4096, 2)):
    out["rows"].append(one(c, s))
    with open("runs/chees_eq_gate.json", "w") as fh:
        json.dump(out, fh, indent=1)
print("wrote runs/chees_eq_gate.json")
