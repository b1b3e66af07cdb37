"""Pallas fused leapfrog kernel (SURVEY.md ⑮; BASELINE.json:5 "fused Pallas
kernels over thousands of chains").

Why a kernel: the XLA path lowers the per-chain scene/gradient math to
batched (32,10)@(10,32) matmuls — tiny contractions that pad the MXU and
round-trip every intermediate (lam, residual, profiles; ~17 KB/chain/step)
through HBM.  Measured on a v5e chip that path sits at ~8.1M grad-evals/s
(~0.6 TFLOP/s effective) and is flat in chain count, i.e. bandwidth/
padding-bound, not dispatch-bound.

Kernel design (chains-on-lanes):
  - grid over chain tiles of 128: every array in VMEM is (..., 128) with the
    chain as the lane dimension, so all scene math is perfectly-shaped VPU
    work — no MXU padding waste, no HBM traffic inside a trajectory;
  - the FULL L-step leapfrog trajectory runs inside one kernel invocation:
    HBM sees only theta/p in and theta/p/U/grad out per trajectory;
  - the potential/gradient math mirrors potential.make_potential_and_grad
    exactly (same unconstrained parameterization, same priors) so the MH
    accept using kernel U values is exact — tests cross-check against the
    XLA path to float tolerance;
  - parameter layout inside the kernel: packed (3K, C) rows [ux; uy; s]
    grouped by coordinate, chains last.

VMEM per tile (K=10, 32x32 scene): lam/R (H,W,128) ~0.5 MB each, per-star
outer products computed on the fly (two passes: lam build, then gradient
contractions) — ~2 MB total, comfortably inside 16 MB.
"""
from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .potential import PriorSpec
from .scene import SceneSpec

TILE = 128  # minimum chain tile (one lane group)


def fused_supported(spec: SceneSpec, kmax: int, n_chains: int) -> bool:
    """Should the fused VPU trajectory kernel be used for this workload?

    Two regimes (both measured on a v5e chip):
    - Small scenes (config 0-3: <= ~48x48 pixels): the XLA path lowers the
      per-chain scene math to tiny padded batched matmuls and HBM
      round-trips — the chains-on-lanes VPU kernel is ~3x faster (17.8M vs
      5.8M grad-evals/s at 10 stars / 32x32 / 1024 chains).
    - Crowded fields (config 4: 50 stars, 128x128): the per-chain
      contractions are genuine (128,K)@(K,128) MXU shapes and XLA reaches
      ~956k grad-evals/s at 1024 chains — ABOVE the fused-VPU roofline
      (~1.1 T FMA/s / (3*K*H*W) ~ 440k).  Large scenes route to XLA
      deliberately: this is the MXU/VPU crossover, not a kernel gap.

    The VMEM feasibility bound (three (H, W, 128) f32 fields + profile
    sets inside the scoped-vmem cap) coincides with the same ~48x48 limit,
    so one pixel-count test decides both.
    """
    return (
        spec.height * spec.width <= 48 * 48
        and n_chains % TILE == 0
        and kmax <= 16
    )


def pick_tile(n_chains: int, spec: SceneSpec, kmax: int) -> int:
    """Chain tile selection.  Measured on the config-2 workload (v5e):
    tile 128 = 13.9M grad-evals/s, tile 256 = 12.1M (slower — the larger
    working set spills VPU scheduling), tile 512+ fails Mosaic compile
    (VMEM overflow).  One lane group (128) is the sweet spot; the `tile`
    argument of make_pallas_leapfrog remains for experimentation.
    """
    del n_chains, spec, kmax
    return TILE


def _grad_eval(theta, mask_col, image, spec: SceneSpec, prior: PriorSpec, kmax: int,
               with_u: bool = True):
    """Potential + gradient for one chain tile, all VPU-shaped.

    theta:    (3K, T) packed [ux; uy; s], chains on lanes
    mask_col: (K, 1) alive mask
    image:    (H, W) counts
    returns (u (T,), grad (3K, T))
    """
    k, h, w = kmax, spec.height, spec.width
    t = theta.shape[-1]
    sig = spec.psf_sigma
    norm = 1.0 / (math.sqrt(2.0 * math.pi) * sig)

    ux, uy, s = theta[:k], theta[k : 2 * k], theta[2 * k :]
    sx = jax.nn.sigmoid(ux)                     # (K, T)
    sy = jax.nn.sigmoid(uy)
    x = spec.width * sx
    y = spec.height * sy
    f = jnp.exp(s)
    wk = f * mask_col                           # (K, T) masked flux

    cx = jax.lax.broadcasted_iota(jnp.int32, (w, t), 0).astype(jnp.float32) + 0.5
    cy = jax.lax.broadcasted_iota(jnp.int32, (h, t), 0).astype(jnp.float32) + 0.5

    # per-star 1-D profiles, (K, W, T) / (K, H, T)
    zx = (cx[None, :, :] - x[:, None, :]) / sig
    zy = (cy[None, :, :] - y[:, None, :]) / sig
    gx = jnp.exp(-0.5 * zx * zx) * norm
    gy = jnp.exp(-0.5 * zy * zy) * norm
    gyw = gy * wk[:, None, :]                   # flux-weighted row profiles

    # lam: (H, W, T) built by an unrolled star loop of rank-1 updates
    lam = jnp.full((h, w, t), spec.background, jnp.float32)
    for kk in range(k):
        lam = lam + gyw[kk][:, None, :] * gx[kk][None, :, :]

    d = jnp.broadcast_to(image[:, :, None], (h, w, t))
    resid = d / lam - 1.0
    if with_u:
        loglik = jnp.sum(d * jnp.log(lam) - lam, axis=(0, 1))  # (T,)
    else:
        loglik = jnp.zeros((t,), jnp.float32)

    # gradient contractions, star by star.  The 2-D contractions are
    # separable like the render: Rgy_k[w] = sum_h R*gy_k collapses the pixel
    # sum to 1-D, after which flux/x/y gradients are W-length dots — ~2x
    # fewer HW-sized passes than contracting each gradient directly.
    # Contract over H (the LEADING axis) first: Mosaic lowers a leading-axis
    # reduction of (H, W, T) as H plain (W, T) vector accumulations, with no
    # sublane-rotation tree — measured 14% faster than the W-first (sublane
    # reduction) form on the v5e at the config-2 shapes.
    gyz = gy * zy                                          # (K, H, T)
    dlx = []
    dly = []
    dlf = []
    for kk in range(k):
        rgy = jnp.sum(resid * gy[kk][:, None, :], axis=0)      # (W, T)
        rdgy = jnp.sum(resid * gyz[kk][:, None, :], axis=0)    # (W, T)
        gxw = gx[kk] * wk[kk][None, :]                         # (W, T)
        dlf.append(jnp.sum(gxw * rgy, axis=0))                 # (T,)
        dlx.append(jnp.sum(gxw * zx[kk] * rgy, axis=0) / sig)
        dly.append(jnp.sum(gxw * rdgy, axis=0) / sig)
    d_flux = jnp.stack(dlf)                                # (K, T)
    d_x = jnp.stack(dlx)
    d_y = jnp.stack(dly)

    # chain rule to unconstrained coords + priors (mirrors potential.py)
    gl_ux = d_x * spec.width * sx * (1.0 - sx)
    gl_uy = d_y * spec.height * sy * (1.0 - sy)
    gl_s = d_flux                                          # d lam/d s = wk*gy*gx = gk
    # (gl_s uses gk which already includes wk = f*mask: d loglik/d s exactly)

    # priors
    lp_pos = -(jax.nn.softplus(ux) + jax.nn.softplus(-ux)
               + jax.nn.softplus(uy) + jax.nn.softplus(-uy))     # (K, T)
    zf = (s - prior.logf_mean) / prior.logf_sigma
    if with_u:
        lp_flux = (-0.5 * zf * zf - math.log(prior.logf_sigma)
                   - 0.5 * math.log(2 * math.pi))
        lp = jnp.sum((lp_pos + lp_flux) * mask_col, axis=0)      # (T,)
    else:
        lp = jnp.zeros((t,), jnp.float32)

    gp_ux = (1.0 - 2.0 * sx) * mask_col
    gp_uy = (1.0 - 2.0 * sy) * mask_col
    gp_s = -zf / prior.logf_sigma * mask_col

    grad = jnp.concatenate(
        [
            -(gl_ux * mask_col + gp_ux),
            -(gl_uy * mask_col + gp_uy),
            -(gl_s * mask_col + gp_s),
        ],
        axis=0,
    )                                                            # (3K, T) = dU/dtheta
    u = -(loglik + lp)
    return u, grad


def _leapfrog_kernel(
    image_ref, eps_ref, invm_ref, mask_ref, theta_ref, p_ref, *rest,
    spec: SceneSpec, prior: PriorSpec, kmax: int, n_steps: int, grad_in: bool,
):
    if grad_in:
        grad_in_ref, theta_out, p_out, u_out, grad_out = rest
    else:
        grad_in_ref = None
        theta_out, p_out, u_out, grad_out = rest
    image = image_ref[:]
    eps = eps_ref[:]            # (1, TILE) per-chain step sizes
    inv_mass = invm_ref[:]      # (3K, 1)
    mask_col = mask_ref[:]      # (K, 1) shared or (K, T) per-chain
    theta = theta_ref[:]        # (3K, TILE)
    p = p_ref[:]

    if n_steps == 0:
        u, grad = _grad_eval(theta, mask_col, image, spec, prior, kmax, with_u=True)
    else:
        # Intermediate steps skip the log-likelihood (transcendental-heavy);
        # only the final gradient evaluation computes U for the MH accept.
        # When the caller already holds dU/dtheta at the entry point (HMC
        # chain state carries it across trajectories), reuse it and save one
        # of the L+1 gradient evaluations.
        if grad_in_ref is not None:
            grad = grad_in_ref[:]
        else:
            _, grad = _grad_eval(theta, mask_col, image, spec, prior, kmax,
                                 with_u=False)

        def step(_, carry):
            theta, p, grad = carry
            p_half = p - 0.5 * eps * grad
            theta = theta + eps * inv_mass * p_half
            _, grad = _grad_eval(theta, mask_col, image, spec, prior, kmax,
                                 with_u=False)
            p = p_half - 0.5 * eps * grad
            return theta, p, grad

        theta, p, grad = jax.lax.fori_loop(
            0, n_steps - 1, step, (theta, p, grad)
        )
        p_half = p - 0.5 * eps * grad
        theta = theta + eps * inv_mass * p_half
        u, grad = _grad_eval(theta, mask_col, image, spec, prior, kmax, with_u=True)
        p = p_half - 0.5 * eps * grad

    theta_out[:] = theta
    p_out[:] = p
    u_out[:] = u[None, :]
    grad_out[:] = grad


def _leapfrog_kernel_dyn(
    nsteps_ref, image_ref, eps_ref, invm_ref, mask_ref, theta_ref, p_ref,
    grad_in_ref, theta_out, p_out, u_out, grad_out,
    *, spec: SceneSpec, prior: PriorSpec, kmax: int,
):
    """Runtime-trip-count fused leapfrog: n_steps lives in SMEM, so one
    compiled kernel serves every trajectory length — the lockstep
    adaptive-length samplers (ChEES, chees.py) pick n_steps per iteration
    as a traced scalar and still ride the fused path (VERDICT.md round-1
    item 4).  Requires n_steps >= 1 and the entry gradient (the chain state
    carries it), so the trajectory costs exactly n_steps gradient evals."""
    n = nsteps_ref[0]
    image = image_ref[:]
    eps = eps_ref[:]            # (1, TILE)
    inv_mass = invm_ref[:]      # (3K, 1)
    mask_col = mask_ref[:]      # (K, 1) shared or (K, T) per-chain
    theta = theta_ref[:]
    p = p_ref[:]
    grad = grad_in_ref[:]

    def step(_, carry):
        theta, p, grad = carry
        p_half = p - 0.5 * eps * grad
        theta = theta + eps * inv_mass * p_half
        _, grad = _grad_eval(theta, mask_col, image, spec, prior, kmax,
                             with_u=False)
        p = p_half - 0.5 * eps * grad
        return theta, p, grad

    theta, p, grad = jax.lax.fori_loop(0, n - 1, step, (theta, p, grad))
    p_half = p - 0.5 * eps * grad
    theta = theta + eps * inv_mass * p_half
    u, grad = _grad_eval(theta, mask_col, image, spec, prior, kmax, with_u=True)
    p = p_half - 0.5 * eps * grad

    theta_out[:] = theta
    p_out[:] = p
    u_out[:] = u[None, :]
    grad_out[:] = grad


def make_pallas_leapfrog_dyn(
    spec: SceneSpec,
    image: jax.Array,
    prior: PriorSpec,
    kmax: int,
    interpret: bool = False,
    tile: int | None = None,
):
    """Build fused_dyn(theta (C,K,3), p (C,K,3), eps, inv_mass (K,3),
    mask (K,) or (C,K), n_steps traced scalar >= 1, grad (C,K,3)) ->
    (theta', p', u' (C,), grad' (C,K,3)).

    Same math as make_pallas_leapfrog but the trip count is a runtime SMEM
    scalar: one compile covers all trajectory lengths (ChEES adapts T every
    iteration; a static-n kernel would recompile per length)."""
    d3 = 3 * kmax
    image_f = image.astype(jnp.float32)

    def fused(theta, p, eps, inv_mass, mask, n_steps, grad):
        kernel = partial(_leapfrog_kernel_dyn, spec=spec, prior=prior, kmax=kmax)
        c = theta.shape[0]
        t = pick_tile(c, spec, kmax) if tile is None else tile
        if c % t:
            t = math.gcd(c, t)
        grid = (c // t,)
        theta_t = _pack(theta, kmax)
        p_t = _pack(p, kmax)
        invm_t = _pack(inv_mass[None], kmax).reshape(d3, 1)
        eps_arr = jnp.broadcast_to(
            jnp.asarray(eps, jnp.float32).reshape(-1), (c,)
        ).reshape(1, c)
        n_arr = jnp.asarray(n_steps, jnp.int32).reshape(1)

        chain_block = lambda i: (0, i)
        if mask.ndim == 2:
            mask_arr = mask.T.astype(jnp.float32)
            mask_spec = pl.BlockSpec((kmax, t), chain_block,
                                     memory_space=pltpu.VMEM)
        else:
            mask_arr = mask.reshape(kmax, 1).astype(jnp.float32)
            mask_spec = pl.BlockSpec((kmax, 1), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((spec.height, spec.width), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, t), chain_block, memory_space=pltpu.VMEM),
                pl.BlockSpec((d3, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                mask_spec,
                pl.BlockSpec((d3, t), chain_block, memory_space=pltpu.VMEM),
                pl.BlockSpec((d3, t), chain_block, memory_space=pltpu.VMEM),
                pl.BlockSpec((d3, t), chain_block, memory_space=pltpu.VMEM),
            ],
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
            interpret=interpret,
        )(n_arr, image_f, eps_arr, invm_t, mask_arr, theta_t, p_t,
          _pack(grad, kmax))

        theta_new, p_new, u_new, grad_new = out
        return (
            _unpack(theta_new, kmax),
            _unpack(p_new, kmax),
            u_new[0],
            _unpack(grad_new, kmax),
        )

    return fused


def _pack(theta: jax.Array, kmax: int) -> jax.Array:
    """(C, K, 3) -> (3K, C) rows [ux; uy; s]."""
    th = jnp.moveaxis(theta, 0, -1)  # (K, 3, C)
    return jnp.concatenate([th[:, 0], th[:, 1], th[:, 2]], axis=0)


def _unpack(packed: jax.Array, kmax: int) -> jax.Array:
    """(3K, C) -> (C, K, 3)."""
    ux, uy, s = packed[:kmax], packed[kmax : 2 * kmax], packed[2 * kmax :]
    return jnp.stack([ux, uy, s], axis=-1).transpose(1, 0, 2)


def make_pallas_leapfrog(
    spec: SceneSpec,
    image: jax.Array,
    prior: PriorSpec,
    kmax: int,
    n_steps: int,
    interpret: bool = False,
    tile: int | None = None,
):
    """Build fused_leapfrog(theta (C,K,3), p (C,K,3), eps, inv_mass (K,3),
    mask (K,) or (C,K), grad=None) -> (theta', p', u' (C,), grad' (C,K,3)).

    eps may be a scalar or a per-chain (C,) vector (step-size jitter);
    mask may be shared (K,) or per-chain (C,K) — the trans-dimensional MCMC
    head (transdim_mcmc.py) carries a different alive mask on every chain,
    and inside the kernel a (K, T) mask block broadcasts through the same
    VPU math as the (K, 1) shared column.

    C must be a multiple of 128.  Pass ``grad`` = dU/dtheta at the entry
    ``theta`` (HMC chain state carries it between trajectories) to make the
    trajectory cost exactly n_steps gradient evaluations per chain;
    otherwise the initial gradient is recomputed in-kernel (n_steps + 1).
    """
    d3 = 3 * kmax
    image_f = image.astype(jnp.float32)

    def fused(theta, p, eps, inv_mass, mask, grad=None):
        grad_in = grad is not None and n_steps > 0
        kernel = partial(
            _leapfrog_kernel, spec=spec, prior=prior, kmax=kmax,
            n_steps=n_steps, grad_in=grad_in,
        )
        c = theta.shape[0]
        t = pick_tile(c, spec, kmax) if tile is None else tile
        # Auto-shrink to a divisor of C so small per-device shards (e.g.
        # shard_map on a fake 8-device test mesh) still compile; production
        # chain counts are multiples of 128 and keep the full lane tile.
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
        if mask.ndim == 2:  # per-chain (C, K) -> (K, C), blocked over chains
            mask_arr = mask.T.astype(jnp.float32)
            mask_spec = pl.BlockSpec((kmax, t), chain_block,
                                     memory_space=pltpu.VMEM)
        else:               # shared (K,) column, replicated to every tile
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
