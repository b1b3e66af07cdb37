"""ChEES chain-count sweep + ESS/s-collapse diagnosis (VERDICT round-3
item 3 / Missing #3; BASELINE.md:18 cites this record).

Protocol = bench.bench_ess_chees (cfg2 scene, fused dyn kernel, warmup
excluded, timed 200-draw sampling continuation), swept over chain counts,
plus targeted variants at 1024 chains that test the collapse hypotheses:

  - "fixT": adaptation DISABLED for T — sampling uses the 256-chain
    adapted trajectory length.  If ESS/s recovers, the pooled
    trajectory-length adaptation (not per-chain mixing) is the root cause.
  - "lr half/double": Adam learning-rate sensitivity of the adapted T.
  - "warm2x": doubled warmup budget (600) — tests "adaptation not
    converged yet at 300 iterations".

Run from /root/repo on the TPU:
    python -c "exec(open('runs/chees_chain_sweep.py').read())"
Writes runs/chees_chain_sweep.json.
"""
import json
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import starcat
from starcat import diagnostics
from starcat.chees import ChEESConfig, chees_sample, make_fused_leapfrog_impl, run_chees
from starcat.configs import CONFIGS

import jax.numpy as jnp

N_SAMPLES, N_WARMUP = 200, 300

cfg = CONFIGS["cfg2_nuts"]
truth, img = cfg.make_data()
mask = jnp.ones(cfg.kmax)
pg = starcat.make_potential_and_grad(cfg.scene, img, cfg.prior)
grad_fn = lambda th: pg(th, mask)
impl = make_fused_leapfrog_impl(cfg.scene, img, cfg.prior, cfg.kmax,
                                interpret=jax.default_backend() != "tpu")


def one(n_chains, ccfg=ChEESConfig(step_size=0.05), n_warmup=N_WARMUP,
        fix_traj=None, seed=2):
    theta0 = truth[None] + 0.01 * jax.random.normal(
        jax.random.key(0), (n_chains,) + truth.shape
    )
    res, ad = run_chees(jax.random.key(seed), grad_fn, theta0, mask,
                        N_SAMPLES, n_warmup, ccfg, leapfrog_impl=impl)
    traj = float(ad["traj_length"]) if fix_traj is None else fix_traj
    # warm the sampling program, then time it
    r = chees_sample(res.final_states, grad_fn, mask, N_SAMPLES,
                     ad["step_size"], ad["inv_mass"], jnp.asarray(traj),
                     ccfg, impl)
    jax.block_until_ready(r.thetas)
    t0 = time.perf_counter()
    r = chees_sample(r.final_states, grad_fn, mask, N_SAMPLES,
                     ad["step_size"], ad["inv_mass"], jnp.asarray(traj),
                     ccfg, impl)
    jax.block_until_ready(r.thetas)
    dt = time.perf_counter() - t0

    tot_flux = np.exp(np.asarray(r.thetas)[..., 2]).sum(-1)  # (C, N)
    ess_total = diagnostics.ess(tot_flux)
    # decomposition: within-chain-only ESS (drops the between-chain mean
    # variance term) isolates "chains mix slower" from "chains disagree"
    per_chain = np.array([diagnostics.ess(tot_flux[i:i + 1])
                          for i in range(0, n_chains, max(1, n_chains // 64))])
    rhat = diagnostics.split_rhat(tot_flux)
    return {
        "n_chains": n_chains,
        "adapted_traj": float(ad["traj_length"]),
        "used_traj": traj,
        "step_size": float(ad["step_size"]),
        "warmup_divergences": int(ad["warmup_divergences"]),
        "sec_per_200_draws": round(dt, 4),
        "ess_total_flux": round(float(ess_total), 1),
        "ess_per_sec": round(float(ess_total) / dt, 1),
        "ess_per_chain_median": round(float(np.median(per_chain)), 2),
        "split_rhat_total_flux": round(float(rhat), 4),
        "mean_n_leapfrog_per_draw": round(traj / float(ad["step_size"]) / 2, 1),
    }


out = {"protocol": "bench_ess_chees sweep (cfg2 scene, fused dyn kernel, "
                   "200 timed draws, warmup excluded)", "sweep": [],
       "variants_1024": {}}

for c in (256, 512, 1024, 2048, 4096):
    r = one(c)
    out["sweep"].append(r)
    print(json.dumps(r))

t256 = out["sweep"][0]["adapted_traj"]
out["variants_1024"]["fixT_from_256"] = one(1024, fix_traj=t256)
out["variants_1024"]["lr_half"] = one(
    1024, ChEESConfig(step_size=0.05, adam_lr=0.0125))
out["variants_1024"]["lr_double"] = one(
    1024, ChEESConfig(step_size=0.05, adam_lr=0.05))
out["variants_1024"]["warm2x"] = one(1024, n_warmup=600)
for k, v in out["variants_1024"].items():
    print(k, json.dumps(v))

with open("runs/chees_chain_sweep.json", "w") as fh:
    json.dump(out, fh, indent=1)
print("wrote runs/chees_chain_sweep.json")
