"""Solver-failure / divergence / ESS vs step-size probe at the cfg1 shape
(VERDICT round-3 item 5 calibration).

Fixes eps (no adaptation) and runs 200 sampling transitions of the XLA
full-metric RHMC kernel at each value, recording the divergence fraction
(Delta-H > 1000), solver-rejection fraction (residual > solver_tol), mean
acceptance, and total-flux ESS per 200 draws.  This pins (a) where the
divergence cliff sits, (b) what divergence_penalty makes the dual-averaged
eps settle there, and (c) how much trajectory length (n_leapfrog) must
grow to keep mixing when eps shrinks.

Run from /root/repo on the TPU:
    python -c "exec(open('runs/solver_probe.py').read())"
Writes runs/solver_probe.json.
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
from starcat.configs import CONFIGS
from starcat.driver import init_chain_states, sample
from starcat.metric import make_metric_fn
from starcat.potential import make_potential, make_potential_and_grad
from starcat.rhmc import RHMCConfig, make_rhmc_kernel

cfg = CONFIGS["cfg1_rhmc"]
truth, img = cfg.make_data()
mask = jnp.ones(cfg.kmax)
pfn = make_potential(cfg.scene, img, cfg.prior)
metric = make_metric_fn(cfg.scene, cfg.prior)
pg = make_potential_and_grad(cfg.scene, img, cfg.prior)
grad_fn = lambda th: pg(th, mask)
theta0 = truth[None] + 0.01 * jax.random.normal(
    jax.random.key(7), (cfg.n_chains,) + truth.shape
)
states0 = init_chain_states(jax.random.key(8), theta0, grad_fn)
inv_mass = jnp.ones(truth.shape)

rows = []
for nlf in (8, 16):
    rcfg = RHMCConfig(n_leapfrog=nlf, fixed_point_iters=6)
    kern = make_rhmc_kernel(pfn, metric, mask, rcfg)
    for eps in (0.027, 0.022, 0.018, 0.014, 0.010):
        # burn 200 transitions at this eps from the shared start, then time
        # (same n_samples as the timed leg -> ONE compiled program per nlf)
        t_c = time.perf_counter()
        res = sample(states0, kern, 200, jnp.asarray(eps), inv_mass)
        st = res.final_states
        jax.block_until_ready(st.theta)
        print(f"# nlf={nlf} eps={eps} burn+compile {time.perf_counter()-t_c:.1f}s", flush=True)
        t0 = time.perf_counter()
        res = sample(st, kern, 200, jnp.asarray(eps), inv_mass)
        jax.block_until_ready(res.thetas)
        dt = time.perf_counter() - t0
        tot = np.exp(np.asarray(res.thetas)[..., 2]).sum(-1)
        row = {
            "n_leapfrog": nlf,
            "eps": eps,
            "accept": round(float(np.asarray(res.accept_prob).mean()), 4),
            "div_frac": round(float(np.asarray(res.diverged).mean()), 4),
            "solver_frac": round(float(np.asarray(res.solver_fail).mean()), 4),
            "ess_200": round(float(diagnostics.ess(tot)), 1),
            "sec_200": round(dt, 3),
        }
        rows.append(row)
        print(json.dumps(row))

with open("runs/solver_probe.json", "w") as fh:
    json.dump(rows, fh, indent=1)
print("wrote runs/solver_probe.json")
