"""MXU-path roofline analysis for the crowded-field (cfg4) gradient
evaluation (VERDICT round-1 item 3): XLA cost analysis vs measured rate."""
import json
import jax, jax.numpy as jnp
import numpy as np
import starcat
from starcat.configs import CONFIGS
from starcat.metrics import cost_analysis

cfg = CONFIGS["cfg4_crowded"]
truth, img = cfg.make_data()
mask = jnp.ones(cfg.n_stars)
pg = starcat.make_potential_and_grad(cfg.scene, img, cfg.prior)
C = 1024
theta0 = truth[None] + 0.01 * jax.random.normal(jax.random.key(0), (C,) + truth.shape)

f = lambda th: jax.vmap(lambda t: pg(t, mask))(th)
ca = cost_analysis(f, theta0)
ca["chains"] = C
ca["flops_per_chain_eval"] = ca["flops"] / C
ca["bytes_per_chain_eval"] = ca["bytes_accessed"] / C
# measured rate from BENCH_FULL.json
full = json.load(open("BENCH_FULL.json"))
rate = full["crowded_field_xla_evals_per_sec"]
ca["measured_evals_per_sec"] = rate
ca["sol_evals_per_sec_f32_flops"] = 49e12 / ca["flops_per_chain_eval"]
ca["sol_evals_per_sec_hbm"] = 819e9 / ca["bytes_per_chain_eval"]
ca["pct_of_flops_sol"] = round(100 * rate / ca["sol_evals_per_sec_f32_flops"], 1)
ca["pct_of_hbm_sol"] = round(100 * rate / ca["sol_evals_per_sec_hbm"], 1)
print(json.dumps(ca, indent=1, default=float))
json.dump(ca, open("runs/cfg4_roofline.json", "w"), indent=1, default=float)
