"""Island-geometry convergence surface (VERDICT round-4 item 2b /
Missing #4): measure between-island R̂ as a function of
(n_islands x island_size) instead of extrapolating the
"~100 islands x >=1024 particles -> R̂ < 1.05" gate from one point.

Design: independent-ancestry islands are iid replicates of a single-island
SMC run sharing one (beta, eps) schedule, so between-island R̂ measures
how converged ONE island of that size is — the expected trend is R̂
falling with ISLAND SIZE and roughly flat in ISLAND COUNT (more islands
sharpen the R̂ estimate and pool diversity linearly; they do not mix any
single ancestry better).  The scale-out gate stands or falls on the size
axis.

Grid:
  - cfg3 scene (10-star 32x32, trans-d SMC): islands {4, 8, 16} x island
    size {256, 512, 1024} — total P up to 16384, fused diag mutation so
    the largest point stays minutes-scale; fixed 20 posterior rounds for
    comparability.
  - cfg4 scene (50-star 128x128 crowded field): the largest single-chip
    points — (16 x 256) [the round-4 study point, now via the first-class
    stats], (8 x 512), (16 x 512) — fixed 300 posterior rounds.

Between-island stats come from run_smc's first-class island_diag
(smc._attach_island_diag — item 2a).  Run from /root/repo on the TPU:
    python runs/islands_surface.py [cfg3|cfg4]
Writes runs/islands_surface.json (merging across invocations).
"""
import json
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from starcat.configs import CONFIGS
from starcat.smc import run_smc

PATH = "runs/islands_surface.json"
out = json.load(open(PATH)) if os.path.exists(PATH) else {"cfg3": [], "cfg4": []}
which = sys.argv[1] if len(sys.argv) > 1 else "both"


def point(base_name, n_islands, island_size, smc_over, seed=0):
    cfg = CONFIGS[base_name]
    scfg = cfg.smc._replace(
        n_particles=n_islands * island_size, n_islands=n_islands, **smc_over)
    truth, img = cfg.make_data()
    t0 = time.perf_counter()
    res = run_smc(jax.random.key(seed), cfg.scene, img, cfg.prior, cfg.kmax,
                  scfg)
    jax.block_until_ready(res.theta)
    wall = time.perf_counter() - t0
    mask = np.asarray(res.mask)
    flux = (np.exp(np.asarray(res.theta)[..., 2]) * mask).sum(-1)
    row = {
        "scene": base_name, "n_islands": n_islands,
        "island_size": island_size, "n_particles": int(flux.size),
        "seed": seed, "beta": float(res.beta),
        "n_temp_steps": int(res.n_steps), "wall_sec": round(wall, 1),
        "log_z": round(float(res.log_z), 2),
        "mean_count": round(float(mask.sum(-1).mean()), 2),
        "mean_flux": round(float(flux.mean()), 1),
        **{k: (round(v, 4) if isinstance(v, float) else v)
           for k, v in res.island_diag.items()},
    }
    print(json.dumps(row), flush=True)
    return row


if which in ("cfg3", "both"):
    # fused diag mutation + modest fixed posterior rounds: comparable,
    # minutes-scale points up to P=16384
    over = dict(mutation="rhmc_diag_pallas", n_mutation_steps=2,
                n_leapfrog=6, n_final_rounds=20, mutation_chunk=1024)
    for g in (4, 8, 16):
        for s in (256, 512, 1024):
            done = [r for r in out["cfg3"]
                    if r["n_islands"] == g and r["island_size"] == s]
            if done:
                continue
            out["cfg3"].append(point("cfg3_transdim_smc", g, s, over))
            with open(PATH, "w") as fh:
                json.dump(out, fh, indent=1)

if which in ("cfg4", "both"):
    # crowded field: fixed 300 posterior rounds (plateau off) for
    # comparability; the preset's other knobs unchanged
    over = dict(plateau_window=0, n_final_rounds=300)
    for g, s in ((16, 256), (8, 512), (16, 512)):
        done = [r for r in out["cfg4"]
                if r["n_islands"] == g and r["island_size"] == s]
        if done:
            continue
        out["cfg4"].append(point("cfg4_crowded", g, s, over))
        with open(PATH, "w") as fh:
            json.dump(out, fh, indent=1)

print("wrote", PATH)
