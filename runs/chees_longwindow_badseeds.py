"""Round-5 mechanism closure: do the bad-seed pooled-ESS deficits persist
at production window lengths?  The probe experiment (runs/chees_probe_fix
.json) showed sampling-time trajectory length is NOT the limiter (4x T at
unchanged split-R-hat); the remaining hypothesis is end-of-warmup chain
disagreement (metastable flux configurations) that a 200-draw window
cannot reconcile.  If 1000 draws at the NATIVE adapted T restores
ESS/s-parity with the good seeds, the deficit is a short-window
measurement artifact and the operating guidance is window length, not
trajectory length.

Run: PYTHONPATH=/root/repo:/root/.axon_site python runs/chees_longwindow_badseeds.py
Writes runs/chees_longwindow_badseeds.json.
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

N_WARMUP = 300
cfg = CONFIGS["cfg2_nuts"]
truth, img = cfg.make_data()
mask = jnp.ones(cfg.kmax)
pg = starcat.make_potential_and_grad(cfg.scene, img, cfg.prior)
grad_fn = lambda th: pg(th, mask)
impl = make_fused_leapfrog_impl(cfg.scene, img, cfg.prior, cfg.kmax,
                                interpret=jax.default_backend() != "tpu")

def ess_centered(x):
    return diagnostics.ess(x - x.mean(axis=1, keepdims=True))

def one(n_chains, seed, n_samples):
    # probe OFF: match the r5 sweep protocol exactly (native adapted T)
    ccfg = ChEESConfig(step_size=0.05, t_probe_iters=0)
    theta0 = truth[None] + 0.01 * jax.random.normal(
        jax.random.key(0), (n_chains,) + truth.shape)
    res, ad = run_chees(jax.random.key(seed), grad_fn, theta0, mask,
                        200, N_WARMUP, ccfg, leapfrog_impl=impl)
    traj = jnp.asarray(ad["traj_length"])
    r = chees_sample(res.final_states, grad_fn, mask, n_samples,
                     ad["step_size"], ad["inv_mass"], traj, ccfg, impl)
    jax.block_until_ready(r.thetas)
    t0 = time.perf_counter()
    r = chees_sample(r.final_states, grad_fn, mask, n_samples,
                     ad["step_size"], ad["inv_mass"], traj, ccfg, impl)
    jax.block_until_ready(r.thetas)
    dt = time.perf_counter() - t0
    tot = np.exp(np.asarray(r.thetas)[..., 2]).sum(-1)
    ess = diagnostics.ess(tot)
    row = {"n_chains": n_chains, "seed": seed, "n_samples": n_samples,
           "adapted_traj": round(float(traj), 2),
           "sec_timed": round(dt, 3),
           "ess_total_flux": round(float(ess), 1),
           "ess_per_sec": round(float(ess) / dt, 1),
           "ess_centered": round(float(ess_centered(tot)), 1),
           "split_rhat_total_flux": round(float(diagnostics.split_rhat(tot)), 4)}
    print(json.dumps(row), flush=True)
    return row

out = {"protocol": "bad-seed rows at 1000-draw windows, native adapted T, "
                   "probe off (mechanism test: warmup chain disagreement "
                   "vs sampling-time trajectory length)", "rows": []}
for c, s in ((256, 3), (256, 4), (512, 4), (1024, 4)):
    out["rows"].append(one(c, s, 1000))
    with open("runs/chees_longwindow_badseeds.json", "w") as fh:
        json.dump(out, fh, indent=1)
print("wrote runs/chees_longwindow_badseeds.json")
