"""Explicit (Tao/Cobb) vs implicit Riemannian integrator on config 1
(VERDICT round-1 item 7): omega sweep, accept/divergence/ESS comparison."""
import jax
jax.config.update("jax_platforms", "cpu")
import json, time
import jax.numpy as jnp
import numpy as np
import starcat
from starcat import diagnostics
from starcat.configs import CONFIGS
from starcat.metric import make_metric_fn
from starcat.potential import make_potential, make_potential_and_grad
from starcat.rhmc import RHMCConfig, run_rhmc

cfg = CONFIGS["cfg1_rhmc"]
truth, img = cfg.make_data()
mask = jnp.ones(cfg.kmax)
pfn = make_potential(cfg.scene, img, cfg.prior)
metric = make_metric_fn(cfg.scene, cfg.prior)
pg = make_potential_and_grad(cfg.scene, img, cfg.prior)
gf = lambda th: pg(th, mask)
theta0 = truth[None] + 0.01 * jax.random.normal(jax.random.key(3), (16,) + truth.shape)

def trial(integ, omega=10.0):
    rcfg = RHMCConfig(step_size=0.3, n_leapfrog=8, fixed_point_iters=6,
                      integrator=integ, omega=omega)
    t0 = time.time()
    res, wr = run_rhmc(jax.random.key(4), pfn, metric, gf, theta0, mask,
                       150, 150, rcfg)
    dt = time.time() - t0
    tot = np.exp(np.asarray(res.thetas)[..., 2]).sum(-1)
    return {
        "integrator": integ, "omega": omega,
        "eps": round(float(wr.step_size), 5),
        "accept": round(float(np.asarray(res.accept_prob).mean()), 3),
        "div_rate": round(float(np.asarray(res.diverged).mean()), 4),
        "ess_total_flux": round(float(diagnostics.ess(tot)), 1),
        "wall_s": round(dt, 1),
    }

out = [trial("implicit")]
print(json.dumps(out[-1]), flush=True)
for om in (1.0, 3.0, 10.0, 30.0, 100.0):
    out.append(trial("explicit", om))
    print(json.dumps(out[-1]), flush=True)
json.dump(out, open("runs/omega_sweep.json", "w"), indent=1)
