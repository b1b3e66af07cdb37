"""Probe axon sync semantics on the headline fused-leapfrog benchmark:
time the identical workload (a) closed by jax.block_until_ready, and
(b) closed by a scalar device->host transfer of an output that depends on
everything.  If (a) << (b), block_until_ready returned early and
block-timed rates are inflated."""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import starcat
from starcat.configs import CONFIGS
from starcat.pallas_kernels import make_pallas_leapfrog

N_CHAINS, N_LEAPFROG, N_SCAN, REPEATS = 32768, 20, 50, 3

cfg = CONFIGS["cfg2_nuts"]
truth, img = cfg.make_data()
mask = jnp.ones(cfg.kmax)
theta0 = truth[None] + 0.01 * jax.random.normal(
    jax.random.key(0), (N_CHAINS,) + truth.shape
)
p0 = jax.random.normal(jax.random.key(1), theta0.shape)
inv_mass = jnp.ones(truth.shape)
fused = make_pallas_leapfrog(cfg.scene, img, cfg.prior, cfg.kmax, N_LEAPFROG)
pg = starcat.make_potential_and_grad(cfg.scene, img, cfg.prior)
_, grad0 = jax.jit(jax.vmap(lambda th: pg(th, mask)))(theta0)


@jax.jit
def many(theta, p, grad):
    def body(carry, _):
        th, pp, g = carry
        th, pp, _, g = fused(th, pp, 0.002, inv_mass, mask, grad=g)
        return (th, pp, g), None

    (th, pp, g), _ = jax.lax.scan(body, (theta, p, grad), None, length=N_SCAN)
    return th, pp, g, jnp.sum(th[0])


out = many(theta0, p0, grad0)
float(out[3])

res = {}
for mode in ("block", "transfer"):
    best = np.inf
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        out = many(theta0, p0, grad0)
        if mode == "block":
            jax.block_until_ready(out[:3])
        else:
            float(out[3])
        best = min(best, time.perf_counter() - t0)
    # drain any stragglers before the next mode's timing
    float(out[3])
    rate = N_CHAINS * N_LEAPFROG * N_SCAN / best
    res[mode] = {"best_s": round(best, 4), "evals_per_sec": round(rate, 1)}
    print(mode, res[mode], flush=True)

res["ratio_transfer_over_block"] = round(
    res["transfer"]["best_s"] / res["block"]["best_s"], 3
)
json.dump(res, open("runs/sync_probe.json", "w"), indent=1)
print(json.dumps(res))
