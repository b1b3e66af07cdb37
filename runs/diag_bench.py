"""Time SMC temperature steps at the cfg4 crowded-field shape (K=64 slots,
128x128, P=1024) for one mutation kind (argv[1]), isolating where cfg4's
2894 s wall time goes and measuring the diagonal-Fisher win.

Usage: python runs/diag_bench.py {rhmc|rhmc_diag|hmc|transdim12}
Appends the variant's row to runs/diag_bench.json.
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

from starcat.configs import CONFIGS
from starcat.potential import sample_prior
from starcat.scene import make_mock_image
from starcat.smc import _smc_step_jit, init_smc

rc = CONFIGS["cfg4_crowded"]
spec, prior, kmax = rc.scene, rc.prior, rc.kmax
P = 1024
N_TIMED = 3

variants = {
    "rhmc": dict(mutation="rhmc", n_transdim_sweeps=0),
    "rhmc_diag": dict(mutation="rhmc_diag", n_transdim_sweeps=0),
    "hmc": dict(mutation="hmc", n_transdim_sweeps=0),
    "transdim12": dict(mutation="hmc", n_mutation_steps=0, n_transdim_sweeps=12),
}
name = sys.argv[1]

key = jax.random.key(0)
kk = jax.random.split(key, 3)
truth = sample_prior(kk[0], rc.n_stars, prior)
x = jax.nn.sigmoid(truth[:, 0]) * spec.width
y = jax.nn.sigmoid(truth[:, 1]) * spec.height
f = jnp.exp(truth[:, 2])
img = make_mock_image(kk[1], x, y, f, spec)

def sync(s):
    # On axon, block_until_ready returns before remote execution finishes,
    # and any NEW eager op (e.g. jnp.sum of a slice) triggers a multi-minute
    # remote compile.  A scalar transfer of an existing output buffer is the
    # only cheap true sync.
    # mean_accept depends on the step's full mutation, so transferring it
    # waits for everything.
    return float(s.mean_accept)


cfg = rc.smc._replace(n_particles=P, mutation_chunk=256, **variants[name])
s = init_smc(kk[2], spec, img, prior, kmax, cfg)
t0 = time.perf_counter()
s = _smc_step_jit(s, spec, img, prior, cfg)
sync(s)
compile_s = time.perf_counter() - t0
print(f"{name}: compiled+first step in {compile_s:.1f}s", flush=True)

t0 = time.perf_counter()
for _ in range(N_TIMED):
    s = _smc_step_jit(s, spec, img, prior, cfg)
sync(s)
step_s = (time.perf_counter() - t0) / N_TIMED

row = {
    "compile_s": round(compile_s, 2),
    "step_s": round(step_s, 3),
    "accept": round(float(s.mean_accept), 3),
    "beta": round(float(s.beta), 5),
}
path = "runs/diag_bench.json"
doc = (json.load(open(path)) if os.path.exists(path)
       else {"P": P, "kmax": kmax, "scene": [spec.height, spec.width],
             "n_mutation_steps": rc.smc.n_mutation_steps,
             "n_leapfrog": rc.smc.n_leapfrog, "results": {}})
doc["results"][name] = row
json.dump(doc, open(path, "w"), indent=1)
print(name, row, flush=True)
