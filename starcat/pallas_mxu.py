"""Fused MXU leapfrog kernel for CROWDED-FIELD scenes (SURVEY.md ⑮;
BASELINE.json:11 config 4: 50 stars, 128x128).

The chains-on-lanes VPU kernel (pallas_kernels.py) wins on small scenes
but its per-chain (H, W, 128)-lane fields overflow VMEM beyond ~48x48
pixels, and at K >= ~50 the per-chain contractions become genuinely
MXU-shaped: lam = gy_w^T gx is a (H, K) @ (K, W) matmul, and both residual
contractions are (H, W) @ (W, K).  The XLA path runs those as batched
matmuls but round-trips every per-step intermediate (lam, resid, profiles
— ~200 KB/chain/step) through HBM; measured ~1.0-1.3M grad-evals/s at
1024 chains on a v5e.  Roofline note (round 3, docs/DESIGN.md): the
f32-matmul bound (49e12 / (6 K H W) ~ 7.8M evals/s) is NOT the binding
limit — the kernel is exp-bound (24.6K profile exps/eval at ~26-33G
exp/s caps ~1.0-1.3M evals/s, exactly where it measures); transpose-
reuse of the profile arrays measured slower than the second exp.

This kernel tiles a few chains per grid step, keeps the whole L-step
trajectory VMEM-resident (per-tile working set ~3 MB at tile 8: profiles
4 x (Tc, K, max(H,W)), lam/resid (Tc, H, W), image (H, W)), and runs the
three contractions per gradient as batched f32 MXU dots:

    lam  = bg + gyw @ gx          (Tc, H, K) @ (Tc, K, W)
    rgx  = resid @ gx^T           (Tc, H, W) @ (Tc, W, K)
    rdgx = resid @ dgx^T          (Tc, H, W) @ (Tc, W, K)

with the remaining reductions (d_flux, d_x, d_y, priors, chain rule) as
small VPU elementwise work.  HBM sees only theta/p/grad in and out per
TRAJECTORY — the same fusion argument as the small-scene kernel, now on
the MXU.

TPU layout note: operands are packed CHAINS-ON-SUBLANES — (C, 3K) with a
(tile, 3K) block — because Mosaic requires block last-dims divisible by
128 (or full); a chain tile of 8 therefore lives on the sublane axis and
the 3K parameter vector on lanes.  Same math as
potential.make_potential_and_grad; cross-checked in tests.

Citation note: the reference repo (empty mount, SURVEY.md §0) has no
counterpart — its NumPy gradient is the dense pixel sum of SURVEY.md §3.1.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .potential import PriorSpec
from .scene import SceneSpec

MXU_TILE = 8  # chains per grid step (sublane group)


def _dot(a, b):
    """2-D (M, K) @ (K, N) -> (M, N), f32 accumulation — plain MXU dot."""
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _grad_eval_mxu(theta, mask_tk, image, spec: SceneSpec, prior: PriorSpec,
                   kmax: int, with_u: bool):
    """Potential + gradient for one chain tile, chains on sublanes.

    theta:   (T, 3K) packed [ux | uy | s] along lanes
    mask_tk: (T, K) per-chain alive mask (broadcast from (1, K) if shared)
    image:   (H, W)
    returns (u (T,), grad (T, 3K))

    The pixel math is a STATICALLY UNROLLED loop over the tile's chains
    with plain 2-D MXU dots per chain — Mosaic has no batched-dot lowering
    (a batched dot_general SIGABRTs the compiler) and no dynamic_slice on
    values, and a per-chain (H,K)@(K,W) is already a full-width MXU op at
    crowded-field shapes; unrolling 8 chains also lets Mosaic pipeline the
    dots.
    """
    k, h, w = kmax, spec.height, spec.width
    t = theta.shape[0]
    sig = spec.psf_sigma
    norm = 1.0 / (math.sqrt(2.0 * math.pi) * sig)
    sig2 = sig * sig

    ux = theta[:, 0:k]                           # (T, K)
    uy = theta[:, k:2 * k]
    s = theta[:, 2 * k:]
    sx = jax.nn.sigmoid(ux)
    sy = jax.nn.sigmoid(uy)
    x = w * sx
    y = h * sy
    f = jnp.exp(s)
    wk = f * mask_tk                             # (T, K)

    cx = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1).astype(jnp.float32) + 0.5
    cyT = jax.lax.broadcasted_iota(jnp.int32, (h, 1), 0).astype(jnp.float32) + 0.5
    cxT = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0).astype(jnp.float32) + 0.5

    d_flux_rows = []
    d_x_rows = []
    d_y_rows = []
    ll_rows = []
    for c in range(t):                           # static unroll over the tile
        x_c = x[c:c + 1]                         # (1, K) static slice
        y_c = y[c:c + 1]
        wk_c = wk[c:c + 1]
        # every profile is built NATIVELY in the orientation its consumer
        # needs — Mosaic relayouts (transposes) between the dots dominate
        # the runtime otherwise (measured: 651k vs 989k evals/s for XLA)
        zx = (cx - x_c.T) / sig                  # (K, W)
        gx_c = jnp.exp(-0.5 * zx * zx) * norm    # (K, W)   lam rhs
        zxT = (cxT - x_c) / sig                  # (W, K)
        gxT_c = jnp.exp(-0.5 * zxT * zxT) * norm  # (W, K)
        dgxT_c = gxT_c * zxT / sig               # (W, K)
        zyT = (cyT - y_c) / sig                  # (H, K)
        gyT_c = jnp.exp(-0.5 * zyT * zyT) * norm  # (H, K)
        dgyT_c = gyT_c * zyT / sig               # (H, K)
        gywT_c = gyT_c * wk_c                    # (H, K)   lam lhs

        lam_c = _dot(gywT_c, gx_c) + spec.background    # (H, W) MXU
        resid_c = image / lam_c - 1.0
        # both residual contractions as ONE (H, W) @ (W, 2K) dot
        rb_c = _dot(resid_c, jnp.concatenate([gxT_c, dgxT_c], axis=1))
        rgx_c = rb_c[:, :k]                      # (H, K)
        rdgx_c = rb_c[:, k:]

        # sublane-sum reductions (measured faster than folding them into a
        # (1,H)@(H,3K) MXU pass: 1.27M vs 0.91M evals/s)
        d_flux_rows.append(jnp.sum(gyT_c * rgx_c, axis=0)[None])    # (1, K)
        d_x_rows.append(jnp.sum(gyT_c * rdgx_c, axis=0)[None] * wk_c)
        d_y_rows.append(jnp.sum(dgyT_c * rgx_c, axis=0)[None] * wk_c)
        if with_u:
            ll_rows.append(jnp.sum(image * jnp.log(lam_c) - lam_c).reshape(1, 1))

    d_flux = jnp.concatenate(d_flux_rows, axis=0)        # (T, K)
    d_x = jnp.concatenate(d_x_rows, axis=0)
    d_y = jnp.concatenate(d_y_rows, axis=0)
    if with_u:
        loglik = jnp.concatenate(ll_rows, axis=0)[:, 0]  # (T,)
    else:
        loglik = jnp.zeros((t,), jnp.float32)

    # chain rule + priors (identical math to potential.py)
    gl_ux = d_x * w * sx * (1.0 - sx)
    gl_uy = d_y * h * sy * (1.0 - sy)
    gl_s = d_flux * wk

    lp_pos = -(jax.nn.softplus(ux) + jax.nn.softplus(-ux)
               + jax.nn.softplus(uy) + jax.nn.softplus(-uy))
    zf = (s - prior.logf_mean) / prior.logf_sigma
    if with_u:
        lp_flux = (-0.5 * zf * zf - math.log(prior.logf_sigma)
                   - 0.5 * math.log(2 * math.pi))
        lp = jnp.sum((lp_pos + lp_flux) * mask_tk, axis=1)
    else:
        lp = jnp.zeros((t,), jnp.float32)

    gp_ux = (1.0 - 2.0 * sx) * mask_tk
    gp_uy = (1.0 - 2.0 * sy) * mask_tk
    gp_s = -zf / prior.logf_sigma * mask_tk

    grad = jnp.concatenate(
        [
            -(gl_ux * mask_tk + gp_ux),
            -(gl_uy * mask_tk + gp_uy),
            -(gl_s + gp_s),          # gl_s already carries wk = f*mask
        ],
        axis=1,
    )                                # (T, 3K)
    return -(loglik + lp), grad


def _mxu_leapfrog_kernel(
    image_ref, eps_ref, invm_ref, mask_ref, theta_ref, p_ref, *rest,
    spec: SceneSpec, prior: PriorSpec, kmax: int, n_steps: int, grad_in: bool,
):
    if grad_in:
        grad_in_ref, theta_out, p_out, u_out, grad_out = rest
    else:
        grad_in_ref = None
        theta_out, p_out, u_out, grad_out = rest
    image = image_ref[:]
    eps = eps_ref[:]            # (T, 1)
    inv_mass = invm_ref[:]      # (1, 3K)
    mask_tk = jnp.broadcast_to(mask_ref[:], (theta_ref.shape[0], kmax))
    theta = theta_ref[:]        # (T, 3K)
    p = p_ref[:]

    if n_steps == 0:
        u, grad = _grad_eval_mxu(theta, mask_tk, image, spec, prior, kmax,
                                 with_u=True)
    else:
        if grad_in_ref is not None:
            grad = grad_in_ref[:]
        else:
            _, grad = _grad_eval_mxu(theta, mask_tk, image, spec, prior,
                                     kmax, with_u=False)

        def step(_, carry):
            theta, p, grad = carry
            p_half = p - 0.5 * eps * grad
            theta = theta + eps * inv_mass * p_half
            _, grad = _grad_eval_mxu(theta, mask_tk, image, spec, prior,
                                     kmax, with_u=False)
            p = p_half - 0.5 * eps * grad
            return theta, p, grad

        theta, p, grad = jax.lax.fori_loop(0, n_steps - 1, step,
                                           (theta, p, grad))
        p_half = p - 0.5 * eps * grad
        theta = theta + eps * inv_mass * p_half
        u, grad = _grad_eval_mxu(theta, mask_tk, image, spec, prior, kmax,
                                 with_u=True)
        p = p_half - 0.5 * eps * grad

    theta_out[:] = theta
    p_out[:] = p
    u_out[:] = u[:, None]
    grad_out[:] = grad


def mxu_fused_supported(spec: SceneSpec, kmax: int, n_chains: int,
                        tile: int = MXU_TILE) -> bool:
    """VMEM feasibility of the MXU trajectory kernel: the per-tile working
    set (4 profile sets (T,K,max(H,W)) + 3 pixel fields (T,H,W) + image)
    must fit comfortably inside ~12 MB of VMEM."""
    t = tile
    prof = 4 * t * kmax * max(spec.height, spec.width) * 4
    fields = 3 * t * spec.height * spec.width * 4
    return (
        n_chains % tile == 0
        and prof + fields + spec.height * spec.width * 4 < 12 * 2**20
    )


def _pack_rows(theta: jax.Array, kmax: int) -> jax.Array:
    """(C, K, 3) -> (C, 3K) rows [ux | uy | s]."""
    return jnp.concatenate(
        [theta[:, :, 0], theta[:, :, 1], theta[:, :, 2]], axis=1
    )


def _unpack_rows(packed: jax.Array, kmax: int) -> jax.Array:
    """(C, 3K) -> (C, K, 3)."""
    return jnp.stack(
        [packed[:, :kmax], packed[:, kmax:2 * kmax], packed[:, 2 * kmax:]],
        axis=-1,
    )


def make_pallas_leapfrog_mxu(
    spec: SceneSpec,
    image: jax.Array,
    prior: PriorSpec,
    kmax: int,
    n_steps: int,
    interpret: bool = False,
    tile: int = MXU_TILE,
):
    """Build the crowded-field fused trajectory: same call contract as
    pallas_kernels.make_pallas_leapfrog — fused(theta (C,K,3), p, eps,
    inv_mass (K,3), mask (K,) or (C,K), grad=None) -> (theta', p', u', grad').
    """
    d3 = 3 * kmax
    image_f = image.astype(jnp.float32)

    def fused(theta, p, eps, inv_mass, mask, grad=None):
        grad_in = grad is not None and n_steps > 0
        kernel = partial(
            _mxu_leapfrog_kernel, spec=spec, prior=prior, kmax=kmax,
            n_steps=n_steps, grad_in=grad_in,
        )
        c = theta.shape[0]
        t = tile
        if c % t:
            t = math.gcd(c, t)
        grid = (c // t,)
        theta_t = _pack_rows(theta, kmax)                       # (C, 3K)
        p_t = _pack_rows(p, kmax)
        invm_t = _pack_rows(inv_mass[None], kmax)               # (1, 3K)
        eps_arr = jnp.broadcast_to(
            jnp.asarray(eps, jnp.float32).reshape(-1), (c,)
        ).reshape(c, 1)

        chain_block = lambda i: (i, 0)
        if mask.ndim == 2:  # per-chain (C, K), blocked over chain rows
            mask_arr = mask.astype(jnp.float32)
            mask_spec = pl.BlockSpec((t, kmax), chain_block,
                                     memory_space=pltpu.VMEM)
        else:               # shared (1, K), replicated to every tile
            mask_arr = mask.reshape(1, kmax).astype(jnp.float32)
            mask_spec = pl.BlockSpec((1, kmax), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)
        in_specs = [
            pl.BlockSpec((spec.height, spec.width), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, 1), chain_block, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            mask_spec,
            pl.BlockSpec((t, d3), chain_block, memory_space=pltpu.VMEM),
            pl.BlockSpec((t, d3), chain_block, memory_space=pltpu.VMEM),
        ]
        operands = [image_f, eps_arr, invm_t, mask_arr, theta_t, p_t]
        if grad_in:
            in_specs.append(
                pl.BlockSpec((t, d3), chain_block, memory_space=pltpu.VMEM)
            )
            operands.append(_pack_rows(grad, kmax))
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((t, d3), chain_block, memory_space=pltpu.VMEM),
                pl.BlockSpec((t, d3), chain_block, memory_space=pltpu.VMEM),
                pl.BlockSpec((t, 1), chain_block, memory_space=pltpu.VMEM),
                pl.BlockSpec((t, d3), chain_block, memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((c, d3), jnp.float32),
                jax.ShapeDtypeStruct((c, d3), jnp.float32),
                jax.ShapeDtypeStruct((c, 1), jnp.float32),
                jax.ShapeDtypeStruct((c, d3), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 2**20,
            ),
            interpret=interpret,
        )(*operands)

        theta_new, p_new, u_new, grad_new = out
        return (
            _unpack_rows(theta_new, kmax),
            _unpack_rows(p_new, kmax),
            u_new[:, 0],
            _unpack_rows(grad_new, kmax),
        )

    return fused
