"""Replication probe for the suspicious islands point (VERDICT item 2b):
cfg4 16x512 measured between-island R-hat 1.0008/1.0006 (flux/count) next
to 1.56 at 16x256 and 1.42 at 8x512 — too perfect to trust from one seed.
Rerun 16x512 and 8x512 on a fresh seed; if 16x512 replicates ~1.0 the
size axis genuinely closes the gate between 256 and 512 particles/island
at this budget; if not, seed 0 was a fluke and the surface is noisier
than its grid suggests.

Run: PYTHONPATH=/root/repo:/root/.axon_site python runs/islands_replicate.py
Appends rows (seed 1) to runs/islands_surface.json.
"""
import json, os, sys, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
from starcat.configs import CONFIGS
from starcat.smc import run_smc

PATH = "runs/islands_surface.json"
out = json.load(open(PATH))

def point(n_islands, island_size, seed):
    cfg = CONFIGS["cfg4_crowded"]
    scfg = cfg.smc._replace(n_particles=n_islands * island_size,
                            n_islands=n_islands, plateau_window=0,
                            n_final_rounds=300)
    truth, img = cfg.make_data()
    t0 = time.perf_counter()
    res = run_smc(jax.random.key(seed), cfg.scene, img, cfg.prior,
                  cfg.kmax, scfg)
    jax.block_until_ready(res.theta)
    wall = time.perf_counter() - t0
    mask = np.asarray(res.mask)
    flux = (np.exp(np.asarray(res.theta)[..., 2]) * mask).sum(-1)
    row = {"scene": "cfg4_crowded", "n_islands": n_islands,
           "island_size": island_size, "n_particles": int(flux.size),
           "seed": seed, "beta": float(res.beta),
           "n_temp_steps": int(res.n_steps), "wall_sec": round(wall, 1),
           "log_z": round(float(res.log_z), 2),
           "mean_count": round(float(mask.sum(-1).mean()), 2),
           "mean_flux": round(float(flux.mean()), 1),
           **{k: (round(v, 4) if isinstance(v, float) else v)
              for k, v in res.island_diag.items()}}
    print(json.dumps(row), flush=True)
    return row

for g, s, seed in ((16, 512, 1), (8, 512, 1), (32, 256, 0), (4, 2048, 0)):
    done = [r for r in out["cfg4"]
            if (r["n_islands"], r["island_size"], r["seed"]) == (g, s, seed)]
    if done:
        continue
    out["cfg4"].append(point(g, s, seed=seed))
    with open(PATH, "w") as fh:
        json.dump(out, fh, indent=1)
print("appended to", PATH)
