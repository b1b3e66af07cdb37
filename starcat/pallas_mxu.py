"""Fused MXU leapfrog kernel for CROWDED-FIELD scenes (SURVEY.md ⑮;
BASELINE.json:11 config 4: 50 stars, 128x128).

The chains-on-lanes VPU kernel (pallas_kernels.py) wins on small scenes
but its per-chain (H, W, 128)-lane fields overflow VMEM beyond ~48x48
pixels, and at K >= ~50 the per-chain contractions become genuinely
MXU-shaped: lam = gy_w^T gx is a (H, K) @ (K, W) matmul, and both residual
contractions are (H, W) @ (W, K).  The XLA path runs those as batched
matmuls but round-trips every per-step intermediate (lam, resid, profiles
— ~200 KB/chain/step) through HBM; measured 1.26M grad-evals/s at
1024 chains on a v5e — ~25% of the f32-matmul speed-of-light
(49e12 / (6 K H W) ~ 7.8M evals/s at K=64, 128x128).

This kernel tiles a few chains per grid step (default 8), keeps the whole
L-step trajectory VMEM-resident (per-tile working set ~3 MB: profiles
4 x (Tc, K, max(H,W)), lam/resid (Tc, H, W), image (H, W)), and runs the
three contractions per gradient as batched f32 MXU dots:

    lam  = bg + gyw @ gx          (Tc, H, K) @ (Tc, K, W)
    rgx  = resid @ gx^T           (Tc, H, W) @ (Tc, W, K)
    rdgx = resid @ dgx^T          (Tc, H, W) @ (Tc, W, K)

with the remaining reductions (d_flux, d_x, d_y, priors, chain rule) as
small VPU elementwise work.  HBM sees only theta/p/grad in and out per
TRAJECTORY — the same fusion argument as the small-scene kernel, now on
the MXU.  Same math as potential.make_potential_and_grad (f32
"highest"-precision equivalent), cross-checked in tests.

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

MXU_TILE = 8  # chains per grid step


def _bdot(a, b):
    """Batched (T, M, K) @ (T, K, N) -> (T, M, N), f32 accumulation."""
    return jax.lax.dot_general(
        a, b, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def _grad_eval_mxu(theta, mask_row, image, spec: SceneSpec, prior: PriorSpec,
                   kmax: int, with_u: bool):
    """Potential + gradient for one chain tile.

    theta:    (3K, T) packed [ux; uy; s] (same layout as pallas_kernels)
    mask_row: (K, 1) shared or (K, T) per-chain alive mask
    image:    (H, W)
    returns (u (T,), grad (3K, T))
    """
    k, h, w = kmax, spec.height, spec.width
    t = theta.shape[-1]
    sig = spec.psf_sigma
    norm = 1.0 / (math.sqrt(2.0 * math.pi) * sig)
    sig2 = sig * sig

    ux, uy, s = theta[:k], theta[k:2 * k], theta[2 * k:]
    sx = jax.nn.sigmoid(ux)                      # (K, T)
    sy = jax.nn.sigmoid(uy)
    x = w * sx
    y = h * sy
    f = jnp.exp(s)
    mask_kt = jnp.broadcast_to(mask_row, (k, t))
    wk = f * mask_kt                             # (K, T)

    # profiles, chains leading: (T, K, W) / (T, K, H)
    cx = jax.lax.broadcasted_iota(jnp.float32, (1, 1, w), 2) + 0.5
    cy = jax.lax.broadcasted_iota(jnp.float32, (1, 1, h), 2) + 0.5
    xt = x.T[:, :, None]                         # (T, K, 1)
    yt = y.T[:, :, None]
    dx = cx - xt                                 # (T, K, W)
    dy = cy - yt                                 # (T, K, H)
    gx = jnp.exp(-0.5 * (dx / sig) ** 2) * norm  # (T, K, W)
    gy = jnp.exp(-0.5 * (dy / sig) ** 2) * norm  # (T, K, H)
    gyw = gy * wk.T[:, :, None]                  # flux-weighted rows

    # lam: (T, H, W) = gyw^T @ gx  per chain  — MXU
    lam = _bdot(jnp.swapaxes(gyw, 1, 2), gx) + spec.background
    d = image[None]
    resid = d / lam - 1.0                        # (T, H, W)
    if with_u:
        loglik = jnp.sum(d * jnp.log(lam) - lam, axis=(1, 2))  # (T,)
    else:
        loglik = jnp.zeros((t,), jnp.float32)

    # residual contractions — MXU
    rgx = _bdot(resid, jnp.swapaxes(gx, 1, 2))    # (T, H, K)
    dgx = gx * dx / sig2                          # (T, K, W) d gx / d x
    rdgx = _bdot(resid, jnp.swapaxes(dgx, 1, 2))  # (T, H, K)
    dgy = gy * dy / sig2                          # (T, K, H)

    # VPU reductions over H: (T, K)
    rgx_t = jnp.swapaxes(rgx, 1, 2)               # (T, K, H)
    rdgx_t = jnp.swapaxes(rdgx, 1, 2)
    d_flux = jnp.sum(gy * rgx_t, axis=2).T        # (K, T)   gy^T R gx
    d_x = jnp.sum(gy * rdgx_t, axis=2).T * wk     # (K, T)   gy^T R dgx
    d_y = jnp.sum(dgy * rgx_t, axis=2).T * wk     # (K, T)   dgy^T R gx

    # chain rule + priors (identical to pallas_kernels._grad_eval)
    gl_ux = d_x * w * sx * (1.0 - sx)
    gl_uy = d_y * h * sy * (1.0 - sy)
    gl_s = d_flux * wk

    lp_pos = -(jax.nn.softplus(ux) + jax.nn.softplus(-ux)
               + jax.nn.softplus(uy) + jax.nn.softplus(-uy))
    zf = (s - prior.logf_mean) / prior.logf_sigma
    if with_u:
        lp_flux = (-0.5 * zf * zf - math.log(prior.logf_sigma)
                   - 0.5 * math.log(2 * math.pi))
        lp = jnp.sum((lp_pos + lp_flux) * mask_kt, axis=0)
    else:
        lp = jnp.zeros((t,), jnp.float32)

    gp_ux = (1.0 - 2.0 * sx) * mask_kt
    gp_uy = (1.0 - 2.0 * sy) * mask_kt
    gp_s = -zf / prior.logf_sigma * mask_kt

    grad = jnp.concatenate(
        [
            -(gl_ux * mask_kt + gp_ux),
            -(gl_uy * mask_kt + gp_uy),
            -(gl_s + gp_s),          # gl_s already carries wk = f*mask
        ],
        axis=0,
    )
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
    eps = eps_ref[:]
    inv_mass = invm_ref[:]
    mask_row = mask_ref[:]
    theta = theta_ref[:]
    p = p_ref[:]

    if n_steps == 0:
        u, grad = _grad_eval_mxu(theta, mask_row, image, spec, prior, kmax,
                                 with_u=True)
    else:
        if grad_in_ref is not None:
            grad = grad_in_ref[:]
        else:
            _, grad = _grad_eval_mxu(theta, mask_row, image, spec, prior,
                                     kmax, with_u=False)

        def step(_, carry):
            theta, p, grad = carry
            p_half = p - 0.5 * eps * grad
            theta = theta + eps * inv_mass * p_half
            _, grad = _grad_eval_mxu(theta, mask_row, image, spec, prior,
                                     kmax, with_u=False)
            p = p_half - 0.5 * eps * grad
            return theta, p, grad

        theta, p, grad = jax.lax.fori_loop(0, n_steps - 1, step,
                                           (theta, p, grad))
        p_half = p - 0.5 * eps * grad
        theta = theta + eps * inv_mass * p_half
        u, grad = _grad_eval_mxu(theta, mask_row, image, spec, prior, kmax,
                                 with_u=True)
        p = p_half - 0.5 * eps * grad

    theta_out[:] = theta
    p_out[:] = p
    u_out[:] = u[None, :]
    grad_out[:] = grad


def mxu_fused_supported(spec: SceneSpec, kmax: int, n_chains: int,
                        tile: int = MXU_TILE) -> bool:
    """VMEM feasibility of the MXU trajectory kernel: the per-tile working
    set (4 profile sets (T,K,max(H,W)) + 2 pixel fields (T,H,W) + image)
    must fit comfortably inside ~12 MB of VMEM."""
    t = tile
    prof = 4 * t * kmax * max(spec.height, spec.width) * 4
    fields = 3 * t * spec.height * spec.width * 4
    return (
        n_chains % tile == 0
        and prof + fields + spec.height * spec.width * 4 < 12 * 2**20
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
    from .pallas_kernels import _pack, _unpack

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
        theta_t = _pack(theta, kmax)
        p_t = _pack(p, kmax)
        invm_t = _pack(inv_mass[None], kmax).reshape(d3, 1)
        eps_arr = jnp.broadcast_to(
            jnp.asarray(eps, jnp.float32).reshape(-1), (c,)
        ).reshape(1, c)

        chain_block = lambda i: (0, i)
        if mask.ndim == 2:
            mask_arr = mask.T.astype(jnp.float32)
            mask_spec = pl.BlockSpec((kmax, t), chain_block,
                                     memory_space=pltpu.VMEM)
        else:
            mask_arr = mask.reshape(kmax, 1).astype(jnp.float32)
            mask_spec = pl.BlockSpec((kmax, 1), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)
        in_specs = [
            pl.BlockSpec((spec.height, spec.width), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t), chain_block, memory_space=pltpu.VMEM),
            pl.BlockSpec((d3, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            mask_spec,
            pl.BlockSpec((d3, t), chain_block, memory_space=pltpu.VMEM),
            pl.BlockSpec((d3, t), chain_block, memory_space=pltpu.VMEM),
        ]
        operands = [image_f, eps_arr, invm_t, mask_arr, theta_t, p_t]
        if grad_in:
            in_specs.append(
                pl.BlockSpec((d3, t), chain_block, memory_space=pltpu.VMEM)
            )
            operands.append(_pack(grad, kmax))
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((d3, t), chain_block, memory_space=pltpu.VMEM),
                pl.BlockSpec((d3, t), chain_block, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, t), chain_block, memory_space=pltpu.VMEM),
                pl.BlockSpec((d3, t), chain_block, memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((d3, c), jnp.float32),
                jax.ShapeDtypeStruct((d3, c), jnp.float32),
                jax.ShapeDtypeStruct((1, c), jnp.float32),
                jax.ShapeDtypeStruct((d3, c), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 2**20,
            ),
            interpret=interpret,
        )(*operands)

        theta_new, p_new, u_new, grad_new = out
        return (
            _unpack(theta_new, kmax),
            _unpack(p_new, kmax),
            u_new[0],
            _unpack(grad_new, kmax),
        )

    return fused
