"""On-chip benchmark: fused MXU trajectory kernel vs XLA at the cfg4 shape."""
import json, time
import jax, jax.numpy as jnp
import numpy as np
import starcat
from starcat.configs import CONFIGS
from starcat.integrators import leapfrog
from starcat.pallas_mxu import make_pallas_leapfrog_mxu

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

cfg = CONFIGS["cfg4_crowded"]
truth, img = cfg.make_data()
K = cfg.n_stars
mask = jnp.ones(K)
pg = starcat.make_potential_and_grad(cfg.scene, img, cfg.prior)
gf = lambda th: pg(th, mask)
C, L, SCAN = 1024, 10, 5
theta0 = truth[None] + 0.01 * jax.random.normal(jax.random.key(0), (C,) + truth.shape)
p0 = jax.random.normal(jax.random.key(1), theta0.shape)
inv_mass = jnp.ones(truth.shape)

out = {}
for tile in (8, 16):
    fused = make_pallas_leapfrog_mxu(cfg.scene, img, cfg.prior, K, L, tile=tile)
    _, g0 = jax.jit(jax.vmap(gf))(theta0)

    @jax.jit
    def many(theta, p, grad):
        def body(carry, _):
            th, pp, g = carry
            th, pp, _, g = fused(th, pp, 0.0005, inv_mass, mask, grad=g)
            return (th, pp, g), None
        return jax.lax.scan(body, (theta, p, grad), None, length=SCAN)[0]

    try:
        r = many(theta0, p0, g0)
        jax.block_until_ready(r)
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            r = many(theta0, p0, g0)
            jax.block_until_ready(r)
            best = min(best, time.perf_counter() - t0)
        out[f"mxu_tile{tile}_evals_per_sec"] = round(C * L * SCAN / best, 1)
        # accuracy cross-check vs XLA single step
        th2, p2, u2, g2 = fused(theta0, p0, 0.0005, inv_mass, mask, grad=g0)
        us, gs = jax.jit(jax.vmap(gf))(theta0)
        ref = jax.jit(jax.vmap(lambda t, q, uu, gg: leapfrog(
            gf, t, q, uu, gg, jnp.asarray(0.0005), L, inv_mass)))(theta0, p0, us, gs)
        out[f"mxu_tile{tile}_theta_maxdiff"] = float(jnp.abs(th2 - ref.theta).max())
    except Exception as e:
        out[f"mxu_tile{tile}_error"] = repr(e)[:500]

@jax.jit
def many_xla(theta, p):
    us, gs = jax.vmap(gf)(theta)
    def body(carry, _):
        th, pp, u, g = carry
        res = jax.vmap(lambda t, q, uu, gg: leapfrog(
            gf, t, q, uu, gg, jnp.asarray(0.0005), L, inv_mass))(th, pp, u, g)
        return (res.theta, res.p, res.u, res.grad), None
    return jax.lax.scan(body, (theta, p, us, gs), None, length=SCAN)[0]

r = many_xla(theta0, p0); jax.block_until_ready(r)
best = np.inf
for _ in range(3):
    t0 = time.perf_counter()
    r = many_xla(theta0, p0); jax.block_until_ready(r)
    best = min(best, time.perf_counter() - t0)
out["xla_evals_per_sec"] = round(C * L * SCAN / best, 1)
print(json.dumps(out, indent=1))
json.dump(out, open("runs/mxu_bench.json", "w"), indent=1)
