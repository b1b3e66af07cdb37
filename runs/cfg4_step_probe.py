"""cfg4 temperature-step probe (VERDICT round-3): time ONE SMC temperature
step at the cfg4 preset operating point (P=4096, K=64, 128x128, 2 mutation
transitions x 6 generalized-leapfrog steps, 12 trans-d sweeps) for each
mutation variant / chunking:

  - rhmc_diag, mutation_chunk 256 (the round-2 preset as shipped)
  - rhmc_diag, mutation_chunk 1024 / 4096 (less / no lax.map chunking)
  - rhmc_diag_pallas (fused MXU diag kernel, full batch)

Writes runs/cfg4_step_probe.json.  The winner becomes the cfg4 preset and
the BASELINE.md mutation-cost row.
"""
import json
import time

import jax
import jax.numpy as jnp

import starcat
from starcat.configs import CONFIGS, apply_overrides
from starcat.smc import init_smc, make_smc_step

cfg0 = CONFIGS["cfg4_crowded"]
truth, img = cfg0.make_data()

res = {"P": cfg0.smc.n_particles, "kmax": cfg0.kmax,
       "scene": [cfg0.scene.height, cfg0.scene.width],
       "n_mutation_steps": cfg0.smc.n_mutation_steps,
       "n_leapfrog": cfg0.smc.n_leapfrog, "results": {}}

VARIANTS = [
    ("rhmc_diag_chunk256", {"smc.mutation": "rhmc_diag",
                            "smc.mutation_chunk": 256}),
    ("rhmc_diag_chunk1024", {"smc.mutation": "rhmc_diag",
                             "smc.mutation_chunk": 1024}),
    ("rhmc_diag_full_vmap", {"smc.mutation": "rhmc_diag",
                             "smc.mutation_chunk": 4096}),
    ("rhmc_diag_pallas", {"smc.mutation": "rhmc_diag_pallas"}),
]

for name, ov in VARIANTS:
    cfg = apply_overrides(cfg0, ov).smc
    step = jax.jit(make_smc_step(cfg0.scene, img, cfg0.prior, cfg))
    s = init_smc(jax.random.key(0), cfg0.scene, img, cfg0.prior,
                 cfg0.kmax, cfg)
    t0 = time.perf_counter()
    s1 = step(s)
    jax.block_until_ready(s1.theta)
    compile_s = time.perf_counter() - t0
    best = float("inf")
    cur = s1
    for _ in range(3):
        t0 = time.perf_counter()
        cur = step(cur)
        jax.block_until_ready(cur.theta)
        best = min(best, time.perf_counter() - t0)
    res["results"][name] = {
        "compile_s": round(compile_s, 2),
        "step_s": round(best, 4),
        "accept": round(float(cur.mean_accept), 4),
        "beta": round(float(cur.beta), 6),
    }
    print(name, res["results"][name], flush=True)

json.dump(res, open("runs/cfg4_step_probe.json", "w"), indent=1)
print(json.dumps(res))
