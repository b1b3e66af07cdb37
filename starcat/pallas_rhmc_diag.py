"""Fused Pallas DIAGONAL-Fisher Riemannian leapfrog (SURVEY.md ⑮
"Riemannian variant"; VERDICT round-2 item 2).

The diagonal-Fisher metric (metric.make_diag_metric_fn) is cfg4's default
SMC mutation — the crowded-field hot loop (runs/diag_bench.json: the
mutation is ~everything at that shape) — yet round 2 ran it through XLA
autodiff (223k generalized-leapfrog steps/s, scan-amortized protocol)
while the FULL-metric kernel was already fused (399k; BENCH_FULL.json).  This module fuses the diagonal path:
strictly simpler than the full kernel — no (3K,3K) Fisher, no S tensor, no
Cholesky/inverse; the metric is a (3K,) vector and every linear-algebra op
collapses to elementwise lane math.

Hamiltonian (identical to rhmc.make_rhmc_diag_functions / metric.py):

    H(θ, p) = U_β(θ) + 1/2 Σ_a log g_a(θ) + 1/2 Σ_a p_a² / g_a(θ)
    g_a     = β·F_a + info_a          (alive;  dead slots: 1)   + jitter
    F_a     = Σ_p J_a(p)² / λ(p)      (diagonal Poisson Fisher)

Closed-form derivative (what autodiff computes in the XLA path): with
a = p/g and weights wt_a = 1/2·(1/g_a − a_a²),

    ∂H/∂θ_c = ∂U_c + Σ_a wt_a ∂g_a/∂θ_c
    ∂F_a/∂θ_c = 2 Σ_p J_a H_ac R1 − Σ_p J_a² J_c R1²       (R1 = 1/λ)
    Σ_a wt_a ∂g_a/∂θ_c
      = β [ 2 Σ_{a∈star(c)} wt_a·C_ac − Σ_p q_wt(p)·J_c(p)·R1²(p) ]
        + wt_c·info′_c
    C_ac  = Σ_p J_a(p)·H_ac(p)·R1(p)      (θ-only, within-star 3×3/star)
    q_wt  = Σ_a wt_a·J_a(p)²              (one separable field per sweep)

Splitting wt = 1/(2g) − a²/2 separates a θ-only part t1 (built once per
position, reused across all Picard sweeps and by the next step) from a
cheap per-sweep part t2(a) — the same split as pallas_rhmc.py.  The C
tensor is θ-only because J_a·H_ac·R1 is separable per star: both factors
are coef·Y(h)·X(w) products of the same star's 1-D profiles, so every C
entry is coef²·(Y-product row-contraction against R1, dotted with an
X-product) — 4 leading-axis row passes + 9 W-dots per star, shared with
the Fisher-diagonal build (C_us = F_u, C_vs = F_v, C_ss = F_s exactly).

Two layouts:

- chains-on-lanes (TILE=128 chains on the lane axis, like pallas_rhmc.py)
  for small scenes (≤ ~48×48) — `make_pallas_rhmc_diag_leapfrog`;
- chains-on-sublanes with per-chain MXU dots (like pallas_mxu.py) for
  crowded fields (cfg4: 50 stars, 128×128) where the per-chain (H,W)
  fields overflow the lane layout's VMEM — `make_pallas_rhmc_diag_mxu`.

Cross-checked against the XLA head (jax.grad through metric.py) to float
tolerance in tests/test_pallas_rhmc_diag.py.

Citation note: the reference repo (empty mount, SURVEY.md §0) has no
counterpart — its RHMC is the dense NumPy loop of SURVEY.md §3.2.
"""
from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_kernels import TILE, _pack, _unpack
from .pallas_mxu import _dot
from .pallas_rhmc import (
    _Profiles,
    _contract_grad,
    _log_prior_terms,
    _profiles,
    _render,
)
from .potential import PriorSpec
from .scene import SceneSpec


class _DiagStructs(NamedTuple):
    """θ-dependent state carried across generalized-leapfrog steps.

    g and every (3, K, T) block use type-major layout [u; v; s] matching
    the packed (3K, T) state; ctens[ta, tc] holds the within-star
    C_{(ta,i),(tc,i)} scalars for all stars i."""

    pr: _Profiles
    r1: jax.Array      # (H, W, T) 1/λ
    r2: jax.Array      # (H, W, T) 1/λ² (used by every Picard sweep's cq)
    sq: tuple          # (gxsq, gx1sq (K,W,T), gysq, gy1sq (K,H,T),
                       #  cu, cv, cs (K,T)) — squared profiles/coefs cached
                       #  once per θ; the q field rebuilds per sweep
    g: jax.Array       # (3, K, T) diagonal metric
    u: jax.Array       # (T,) U_β(θ)
    t1: jax.Array      # (3, K, T) θ-only part of dH/dθ
    ctens: jax.Array   # (3, 3, K, T) C[a_type, c_type, star]
    infod: jax.Array   # (3, K, T) d info_a / dθ_a


def _info_terms(theta_blk, mask, prior: PriorSpec):
    """(info (3,K,T), info′ (3,K,T)) — mirrors metric.prior_information."""
    su = jax.nn.sigmoid(theta_blk[0])
    sv = jax.nn.sigmoid(theta_blk[1])
    info_u = 2.0 * su * (1.0 - su) * mask
    info_v = 2.0 * sv * (1.0 - sv) * mask
    info_s = mask / (prior.logf_sigma ** 2)
    infod_u = info_u * (1.0 - 2.0 * su)
    infod_v = info_v * (1.0 - 2.0 * sv)
    info = jnp.stack([info_u, info_v, info_s])
    infod = jnp.stack([infod_u, infod_v, jnp.zeros_like(info_s)])
    return info, infod


def _diag_fisher(pr: _Profiles, r1, kmax: int, with_c: bool):
    """Diagonal Fisher F (3, K, T) and, if with_c, the C tensor (3,3,K,T).

    Per star: 4 leading-axis row contractions ry[·] = Σ_h Y²-product · R1
    (2 when with_c=False) feed both F and all 9 C entries as W-length dots
    — the same ordered-star pattern as pallas_rhmc._fisher_and_hessian but
    with NO cross-star terms (the diagonal couples a to c only within a
    star through the scene Hessian; cross-star coupling enters only via
    the q_wt field, handled per sweep)."""
    k = kmax
    fu, fv, fs = [], [], []
    c_rows = [[[] for _ in range(3)] for _ in range(3)] if with_c else None
    for i in range(k):
        gy2 = pr.gy[i] * pr.gy[i]                     # (H, T)
        gy12 = pr.gy1[i] * pr.gy1[i]
        ry_a = jnp.sum(r1 * gy2[:, None, :], axis=0)  # (W, T) Σ_h gy²·R1
        ry_b = jnp.sum(r1 * gy12[:, None, :], axis=0)
        gx2 = pr.gx[i] * pr.gx[i]                     # (W, T)
        gx12 = pr.gx1[i] * pr.gx1[i]

        d1 = jnp.sum(gx12 * ry_a, axis=0)             # (T,)
        d6 = jnp.sum(gx2 * ry_b, axis=0)
        d9 = jnp.sum(gx2 * ry_a, axis=0)
        f_u = pr.wcx[i] ** 2 * d1
        f_v = pr.wcy[i] ** 2 * d6
        f_s = pr.w[i] ** 2 * d9
        fu.append(f_u)
        fv.append(f_v)
        fs.append(f_s)

        if with_c:
            ry_c = jnp.sum(r1 * (pr.gy1[i] * pr.gy[i])[:, None, :], axis=0)
            ry_d = jnp.sum(r1 * (pr.gy2[i] * pr.gy1[i])[:, None, :], axis=0)
            gxx1 = pr.gx[i] * pr.gx1[i]
            d2 = jnp.sum(pr.gx2[i] * pr.gx1[i] * ry_a, axis=0)
            d3 = jnp.sum(gxx1 * ry_b, axis=0)
            d4 = jnp.sum(gxx1 * ry_a, axis=0)
            d5 = jnp.sum(gx12 * ry_c, axis=0)
            d7 = jnp.sum(gx2 * ry_d, axis=0)
            d8 = jnp.sum(gx2 * ry_c, axis=0)
            # C[a][c]: Σ_p J_a·H_ac·R1 (derivation in the module docstring)
            c_rows[0][0].append(pr.wcx[i] * (pr.wcx2[i] * d1 + pr.wcxx[i] * d2))
            c_rows[1][0].append(pr.wcy[i] * pr.wcxcy[i] * d3)
            c_rows[2][0].append(pr.w[i] * pr.wcx[i] * d4)
            c_rows[0][1].append(pr.wcx[i] * pr.wcxcy[i] * d5)
            c_rows[1][1].append(pr.wcy[i] * (pr.wcy2[i] * d6 + pr.wcyy[i] * d7))
            c_rows[2][1].append(pr.w[i] * pr.wcy[i] * d8)
            c_rows[0][2].append(f_u)                  # C_us = F_u exactly
            c_rows[1][2].append(f_v)
            c_rows[2][2].append(f_s)

    fisher = jnp.stack([jnp.stack(fu), jnp.stack(fv), jnp.stack(fs)])
    ctens = None
    if with_c:
        ctens = jnp.stack(
            [jnp.stack([jnp.stack(c_rows[ta][tc]) for tc in range(3)])
             for ta in range(3)]
        )                                             # (3, 3, K, T)
    return fisher, ctens


def _diag_metric(fisher, theta_blk, mask, prior: PriorSpec, beta,
                 jitter: float):
    """g = β·F + info (alive) | 1 (dead), + jitter — returns (g, info′),
    both (3, K, T); mirrors metric.make_diag_metric_fn exactly."""
    info, infod = _info_terms(theta_blk, mask, prior)
    m3 = mask[None]                                   # (1, K, T)
    g = (beta * fisher + info) * m3 + (1.0 - m3) + jitter
    return g, infod


def _q_field_diag(wt, sq, kmax: int):
    """q_wt(p) = Σ_a wt_a·J_a(p)² as (H, W, T) — J_a² is separable per
    star, so 2 rank-1 accumulations per star (gy² and gy1² rows).  sq is
    the per-θ cache of squared profiles/coefs (built once, reused by all
    Picard sweeps of a step — round-3 opt)."""
    gxsq, gx1sq, gysq, gy1sq, cu, cv, cs = sq
    h = gysq.shape[1]
    wdt = gxsq.shape[1]
    t = cu.shape[-1]
    q = jnp.zeros((h, wdt, t), jnp.float32)
    for i in range(kmax):
        au = wt[0, i] * cu[i]                         # (T,)
        av = wt[1, i] * cv[i]
        as_ = wt[2, i] * cs[i]
        tx = au[None] * gx1sq[i] + as_[None] * gxsq[i]  # (W, T)
        q = q + gysq[i][:, None, :] * tx[None, :, :]
        tx2 = av[None] * gxsq[i]
        q = q + gy1sq[i][:, None, :] * tx2[None, :, :]
    return q


def _wt_terms(st: _DiagStructs, wt, kmax: int, beta):
    """Σ_a wt_a ∂g_a/∂θ_c for weight vector wt (3, K, T) — the shared body
    of t1 (wt = 1/2g) and the per-sweep t2 (wt = −a²/2)."""
    qf = _q_field_diag(wt, st.sq, kmax)
    cq = _contract_grad(qf * st.r2, st.pr, kmax)               # (3, K, T)
    cterm = jnp.stack([
        wt[0] * st.ctens[0, tc] + wt[1] * st.ctens[1, tc]
        + wt[2] * st.ctens[2, tc]
        for tc in range(3)
    ])                                                         # (3, K, T)
    return beta * (2.0 * cterm - cq) + wt * st.infod


def _build_structs_diag(theta_blk, mask, image, spec: SceneSpec,
                        prior: PriorSpec, kmax: int, beta,
                        jitter: float) -> _DiagStructs:
    """Everything θ-dependent: profiles, λ fields, diag metric, U_β, the C
    tensor and the θ-only derivative part t1."""
    pr = _profiles(theta_blk, mask, spec, kmax)
    lam = _render(pr, spec, kmax)
    r1 = 1.0 / lam
    d = jnp.broadcast_to(image[:, :, None], lam.shape)

    loglik = jnp.sum(d * jnp.log(lam) - lam, axis=(0, 1))      # (T,)
    lp, glp = _log_prior_terms(theta_blk, mask, prior)
    u_pot = -(beta * loglik + lp)

    rho0 = beta * (d * r1 - 1.0)
    grad_u = -(_contract_grad(rho0, pr, kmax) + glp)           # (3, K, T)

    fisher, ctens = _diag_fisher(pr, r1, kmax, with_c=True)
    g, infod = _diag_metric(fisher, theta_blk, mask, prior, beta, jitter)

    sq = (pr.gx * pr.gx, pr.gx1 * pr.gx1, pr.gy * pr.gy, pr.gy1 * pr.gy1,
          pr.wcx * pr.wcx, pr.wcy * pr.wcy, pr.w * pr.w)
    st = _DiagStructs(pr, r1, r1 * r1, sq, g, u_pot, grad_u, ctens, infod)
    t1 = grad_u + _wt_terms(st, 0.5 / g, kmax, beta)
    return st._replace(t1=t1)


def _dh_dtheta_diag(st: _DiagStructs, p_blk, kmax: int, beta):
    """dH/dθ at the structs' θ, momentum p (3, K, T) — t1 + t2(a)."""
    a = p_blk / st.g
    return st.t1 + _wt_terms(st, -0.5 * a * a, kmax, beta)


def _diag_solve(theta_blk, mask, image, spec, prior, kmax, beta, jitter,
                p_blk):
    """G(θ)⁻¹p = p/g(θ) via a fresh diag-metric build (θ-fixed-point inner
    evaluation: no C tensor, no q field — 2 row passes + 3 dots/star)."""
    del image
    pr = _profiles(theta_blk, mask, spec, kmax)
    lam = _render(pr, spec, kmax)
    fisher, _ = _diag_fisher(pr, 1.0 / lam, kmax, with_c=False)
    g, _ = _diag_metric(fisher, theta_blk, mask, prior, beta, jitter)
    return p_blk / g


def rhmc_diag_trajectory_tile(
    theta, xi, eps, mask, image, spec: SceneSpec, prior: PriorSpec,
    kmax: int, n_steps: int, fixed_point_iters: int, beta, jitter: float,
):
    """Pure-JAX tile trajectory (runs identically inside the Pallas kernel
    and standalone in tests).

    theta, xi : (3K, T) packed [u; v; s];  eps (1, T);  mask (K, T)
    Returns (theta' (3K, T), p' (3K, T), h0 (T,), h1 (T,), u1 (T,),
    resid (T,)) — resid is the per-chain max relative last-Picard-sweep
    delta (the solver-convergence statistic of
    integrators.riemannian_leapfrog.solver_resid).

    Momentum refresh in-kernel: p0 = √g(θ0)·ξ·mask.  Step and Picard-sweep
    semantics mirror integrators.riemannian_leapfrog exactly (same carries,
    same sweep counts) so the XLA and fused heads are step-for-step
    comparable.
    """
    mask3 = jnp.stack([mask] * 3)                              # (3, K, T)

    def blk(flat):
        return flat.reshape(3, kmax, -1)

    st0 = _build_structs_diag(blk(theta), mask, image, spec, prior, kmax,
                              beta, jitter)
    p0 = jnp.sqrt(st0.g) * blk(xi) * mask3
    h_of = lambda st, p: (st.u + 0.5 * jnp.sum(jnp.log(st.g), axis=(0, 1))
                          + 0.5 * jnp.sum(p * p / st.g, axis=(0, 1)))
    h0 = h_of(st0, p0)
    eps_b = eps[0][None, None, :]                              # (1, 1, T)

    def _delta(x_new, x_old):
        # per-chain relative sup-norm Picard delta over the (3, K) axes
        return (jnp.max(jnp.abs(x_new - x_old), axis=(0, 1))
                / (1.0 + jnp.max(jnp.abs(x_new), axis=(0, 1))))

    def step(_, carry):
        theta_b, p_b, st, resid = carry

        # implicit momentum half-step: p_h = p − ε/2 dH/dθ(θ, p_h)
        def p_sweep(_, c):
            ph, _ = c
            ph_new = p_b - 0.5 * eps_b * _dh_dtheta_diag(st, ph, kmax, beta)
            return ph_new, _delta(ph_new, ph)

        p_half, d1 = jax.lax.fori_loop(
            0, fixed_point_iters, p_sweep, (p_b, jnp.zeros(p_b.shape[-1]))
        )

        # implicit position step: θ′ = θ + ε/2 [G(θ)⁻¹ + G(θ′)⁻¹] p_h
        v0 = p_half / st.g
        base = theta_b + 0.5 * eps_b * v0

        def t_sweep(_, c):
            th, _ = c
            vk = _diag_solve(th, mask, image, spec, prior, kmax, beta,
                             jitter, p_half)
            th_new = base + 0.5 * eps_b * vk
            return th_new, _delta(th_new, th)

        theta_new, d2 = jax.lax.fori_loop(
            0, fixed_point_iters, t_sweep,
            (theta_b + eps_b * v0, jnp.zeros(theta_b.shape[-1])),
        )

        # rebuild θ-structs once; reused by the final momentum half-step,
        # h1, AND the next step's momentum fixed point.
        st_new = _build_structs_diag(theta_new, mask, image, spec, prior,
                                     kmax, beta, jitter)
        p_new = p_half - 0.5 * eps_b * _dh_dtheta_diag(st_new, p_half,
                                                       kmax, beta)
        resid = jnp.maximum(resid, jnp.maximum(d1, d2))
        return theta_new, p_new, st_new, resid

    theta_f, p_f, st_f, resid = jax.lax.fori_loop(
        0, n_steps, step, (blk(theta), p0, st0, jnp.zeros(theta.shape[-1]))
    )
    h1 = h_of(st_f, p_f)
    d3 = 3 * kmax
    return (theta_f.reshape(d3, -1), p_f.reshape(d3, -1), h0, h1, st_f.u,
            resid)


def _rhmc_diag_kernel(
    image_ref, eps_ref, beta_ref, mask_ref, theta_ref, xi_ref,
    theta_out, p_out, h0_out, h1_out, u_out, resid_out,
    *, spec: SceneSpec, prior: PriorSpec, kmax: int, n_steps: int,
    fixed_point_iters: int, jitter: float,
):
    th1, p1, h0, h1, u1, resid = rhmc_diag_trajectory_tile(
        theta_ref[:], xi_ref[:], eps_ref[:], mask_ref[:], image_ref[:],
        spec, prior, kmax, n_steps, fixed_point_iters, beta_ref[0, 0],
        jitter,
    )
    theta_out[:] = th1
    p_out[:] = p1
    h0_out[:] = h0[None, :]
    h1_out[:] = h1[None, :]
    u_out[:] = u1[None, :]
    resid_out[:] = resid[None, :]


def make_pallas_rhmc_diag_leapfrog(
    spec: SceneSpec,
    image: jax.Array,
    prior: PriorSpec,
    kmax: int,
    n_steps: int,
    fixed_point_iters: int = 6,
    jitter: float = 1e-3,
    interpret: bool = False,
    tile: int | None = None,
):
    """Build fused_rhmc_diag(theta (C,K,3), xi (C,K,3), eps, mask, beta) ->
    (theta' (C,K,3), p' (C,K,3), h0 (C,), h1 (C,), u1 (C,), resid (C,)).

    Same call contract as pallas_rhmc.make_pallas_rhmc_leapfrog: eps scalar
    or (C,); mask (K,) shared or (C,K) per-chain (trans-d SMC); beta scalar
    likelihood temperature.  C % 128 == 0 for the full lane tile.
    """
    d3 = 3 * kmax
    image_f = image.astype(jnp.float32)
    t = TILE if tile is None else tile

    kernel = partial(
        _rhmc_diag_kernel, spec=spec, prior=prior, kmax=kmax,
        n_steps=n_steps, fixed_point_iters=fixed_point_iters, jitter=jitter,
    )

    def fused(theta, xi, eps, mask, beta=1.0):
        c = theta.shape[0]
        tt = t if c % t == 0 else math.gcd(c, t)
        grid = (c // tt,)
        theta_t = _pack(theta, kmax)
        xi_t = _pack(xi, kmax)
        mask_t = jnp.broadcast_to(
            jnp.asarray(mask, jnp.float32).reshape(-1, kmax).T, (kmax, c)
        ) if jnp.ndim(mask) <= 1 else jnp.asarray(mask, jnp.float32).T
        eps_arr = jnp.broadcast_to(
            jnp.asarray(eps, jnp.float32).reshape(-1), (c,)
        ).reshape(1, c)
        beta_arr = jnp.asarray(beta, jnp.float32).reshape(1, 1)

        chain_block = lambda i: (0, i)
        out = pl.pallas_call(
            kernel,
            grid=grid,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
            in_specs=[
                pl.BlockSpec((spec.height, spec.width), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tt), chain_block, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((kmax, tt), chain_block,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((d3, tt), chain_block, memory_space=pltpu.VMEM),
                pl.BlockSpec((d3, tt), chain_block, memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((d3, tt), chain_block, memory_space=pltpu.VMEM),
                pl.BlockSpec((d3, tt), chain_block, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tt), chain_block, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tt), chain_block, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tt), chain_block, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tt), chain_block, memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((d3, c), jnp.float32),
                jax.ShapeDtypeStruct((d3, c), jnp.float32),
                jax.ShapeDtypeStruct((1, c), jnp.float32),
                jax.ShapeDtypeStruct((1, c), jnp.float32),
                jax.ShapeDtypeStruct((1, c), jnp.float32),
                jax.ShapeDtypeStruct((1, c), jnp.float32),
            ],
            interpret=interpret,
        )(image_f, eps_arr, beta_arr, mask_t, theta_t, xi_t)

        theta_new, p_new, h0, h1, u1, resid = out
        return (
            _unpack(theta_new, kmax), _unpack(p_new, kmax),
            h0[0], h1[0], u1[0], resid[0],
        )

    return fused


def diag_fused_supported(spec: SceneSpec, kmax: int, n_chains: int,
                         tile: int = TILE) -> bool:
    """VMEM feasibility of the chains-on-lanes diag trajectory: per-tile
    working set is 3 (H,W,T) fields (λ/R1/q transients), 6 (K,max(H,W),T)
    profiles and the small (3K,T)/(3,3,K,T) state — must fit well inside
    the 64 MB scoped-vmem cap (crowded fields use the MXU variant)."""
    t = tile if n_chains % tile == 0 else math.gcd(n_chains, tile)
    if t < 64:
        # Mosaic tile rule (docs/DESIGN.md): only full-lane (128) and
        # half-lane (64, a full block on a 64-chain array) tiles are
        # verified to compile; a gcd-shrunk sub-64 tile is not a full
        # block and fails lowering — route those chain counts to the
        # MXU layout or XLA instead (ADVICE round 3, medium).
        return False
    fields = 3 * spec.height * spec.width * t * 4
    prof = 6 * kmax * max(spec.height, spec.width) * t * 4
    return fields + prof < 24 * 2 ** 20


def diag_mxu_supported(spec: SceneSpec, kmax: int, n_chains: int,
                       tile: int = 8) -> bool:
    """VMEM feasibility of the chains-on-sublanes MXU diag trajectory
    (make_pallas_rhmc_diag_mxu): per-tile working set is ~10 profile sets
    (T, K, max(H,W)) — 6 Gaussian profiles + 4 squared/cached — plus 4
    pixel fields (T, H, W) (λ, R1, R2, q) and the image; must fit well
    inside VMEM (same 12 MB budget as pallas_mxu.mxu_fused_supported)."""
    prof = 10 * tile * kmax * max(spec.height, spec.width) * 4
    fields = 4 * tile * spec.height * spec.width * 4
    return (
        n_chains % tile == 0
        and prof + fields + spec.height * spec.width * 4 < 12 * 2**20
    )


# ---------------------------------------------------------------------------
# Chains-on-sublanes MXU variant for CROWDED-FIELD scenes (cfg4: 50 stars,
# 128×128) — the lane layout's (H, W, T) fields overflow VMEM there, while
# the per-chain contractions become genuine MXU shapes (pallas_mxu.py made
# the same argument for the plain leapfrog).  Same math as the lane kernel;
# operands are packed (C, 3K) rows [ux | uy | s] with a (tile, 3K) block and
# per-chain 2-D dots statically unrolled over the tile (Mosaic has no
# batched-dot lowering).  Every bilinear/d-dot collapses to
#
#     M = R1 @ [gx1² | gx·gx1 | gx² | gx2·gx1]      (H, W) @ (W, 4K)  MXU
#     d_i = Σ_h Y-product · M-slice                  sublane reductions
#
# and the per-sweep q-field / contraction are one (H, 2K) @ (2K, W) and one
# (H, W) @ (W, 2K) dot per chain.
#
# Mosaic layout rules obeyed throughout (learned the hard way): per-chain
# work keeps to 2-D dots and elementwise ops; ALL row algebra (coefs, info,
# metric/ctens assembly, chain rule, priors) runs at TILE level on (T, K)
# blocks whose axis-1 concatenation Mosaic supports (the pallas_mxu grad
# pattern) — lane-concat of (1, K) rows at mismatched offsets does not
# lower ("result/input offset mismatch on non-concat dimension").
# ---------------------------------------------------------------------------

MXU_DIAG_TILE = 8


class _ChainStacks(NamedTuple):
    """θ-dependent per-tile state for the MXU layout (chain-major stacks)."""

    yp_a: jax.Array    # (T, H, K) gy²
    yp_b: jax.Array    # (T, H, K) gy′²
    gyT: jax.Array     # (T, H, K)
    dgyT: jax.Array    # (T, H, K)
    gxT: jax.Array     # (T, W, K)
    dgxT: jax.Array    # (T, W, K)
    gx1sq: jax.Array   # (T, K, W) gx′² (row orientation, q-field rhs)
    gxsq: jax.Array    # (T, K, W) gx²
    r1: jax.Array      # (T, H, W) 1/λ
    w: jax.Array       # (T, K) masked flux
    wcx: jax.Array     # (T, K) w·dx/du
    wcy: jax.Array     # (T, K) w·dy/dv
    g: jax.Array       # (T, 3K) diagonal metric
    u: jax.Array       # (T, 1) U_β
    t1: jax.Array      # (T, 3K) θ-only part of dH/dθ
    ctens: jax.Array   # (T, 9K) C[ta*3+tc] blocks of K
    infod: jax.Array   # (T, 3K)


def _chain_profiles_mxu(theta_c, spec: SceneSpec, kmax: int):
    """One chain's separable profiles in every orientation its consumers
    need (pallas_mxu's native-orientation rule: no relayout between dots).

    theta_c: (1, 3K) row [ux | uy | s].  Returns a dict of 2-D arrays.
    """
    k, h, w = kmax, spec.height, spec.width
    sig = spec.psf_sigma
    norm = 1.0 / (math.sqrt(2.0 * math.pi) * sig)
    x = w * jax.nn.sigmoid(theta_c[:, :k])               # (1, K) offset 0
    y = h * jax.nn.sigmoid(theta_c[:, k:2 * k])
    cx = jax.lax.broadcasted_iota(jnp.int32, (k, w), 1).astype(jnp.float32) + 0.5
    cxT = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0).astype(jnp.float32) + 0.5
    cyT = jax.lax.broadcasted_iota(jnp.int32, (h, 1), 0).astype(jnp.float32) + 0.5

    zx = (cx - x.T) / sig                                # (K, W)
    gx = jnp.exp(-0.5 * zx * zx) * norm
    gx1 = gx * zx / sig
    zxT = (cxT - x) / sig                                # (W, K) broadcast
    gxT = jnp.exp(-0.5 * zxT * zxT) * norm
    dgxT = gxT * zxT / sig
    d2gxT = gxT * (zxT * zxT - 1.0) / (sig * sig)
    zyT = (cyT - y) / sig                                # (H, K) broadcast
    gyT = jnp.exp(-0.5 * zyT * zyT) * norm
    dgyT = gyT * zyT / sig
    d2gyT = gyT * (zyT * zyT - 1.0) / (sig * sig)

    return dict(gx=gx, gx1=gx1, gxT=gxT, dgxT=dgxT, d2gxT=d2gxT,
                gyT=gyT, dgyT=dgyT, d2gyT=d2gyT)


def _tile_coefs_mxu(theta, mask_tk, spec: SceneSpec, kmax: int):
    """Tile-level coefficient blocks, all (T, K)."""
    k = kmax
    sx = jax.nn.sigmoid(theta[:, :k])
    sy = jax.nn.sigmoid(theta[:, k:2 * k])
    wk = jnp.exp(theta[:, 2 * k:]) * mask_tk
    cxd = spec.width * sx * (1.0 - sx)
    cyd = spec.height * sy * (1.0 - sy)
    cx2 = cxd * (1.0 - 2.0 * sx)
    cy2 = cyd * (1.0 - 2.0 * sy)
    return dict(
        sx=sx, sy=sy, w=wk, wcx=wk * cxd, wcy=wk * cyd, wcx2=wk * cx2,
        wcy2=wk * cy2, wcxx=wk * cxd * cxd, wcyy=wk * cyd * cyd,
        wcxcy=wk * cxd * cyd,
    )


def _tile_info_mxu(cf, mask_tk, prior: PriorSpec):
    """(info (T,3K), info′ (T,3K)) — mirrors metric.prior_information."""
    info_u = 2.0 * cf["sx"] * (1.0 - cf["sx"]) * mask_tk
    info_v = 2.0 * cf["sy"] * (1.0 - cf["sy"]) * mask_tk
    info_s = mask_tk / (prior.logf_sigma ** 2)
    info = jnp.concatenate([info_u, info_v, info_s], axis=1)
    infod = jnp.concatenate(
        [info_u * (1.0 - 2.0 * cf["sx"]), info_v * (1.0 - 2.0 * cf["sy"]),
         jnp.zeros_like(info_s)], axis=1)
    return info, infod


def _chain_q_field_mxu(alpha, bta, gma, yp_a, yp_b, gx1sq, gxsq):
    """q_wt(p) (H, W) for one chain: fold the per-star scalings into the
    Y side (no row transposes), then one (H, 2K) @ (2K, W) MXU dot.

        q = (yp_a·α) @ gx1² + (yp_a·γ + yp_b·β) @ gx²

    alpha/bta/gma: (1, K) rows; yp_*: (H, K); gx*sq: (K, W)."""
    lhs = jnp.concatenate([yp_a * alpha, yp_a * gma + yp_b * bta], axis=1)
    rhs = jnp.concatenate([gx1sq, gxsq], axis=0)
    return _dot(lhs, rhs)                                # (H, W)


def _chain_contract_sums(rho, gxT, dgxT, gyT, dgyT, kmax: int):
    """Raw contraction sums for one chain — (su_u, su_v, su_s), each (1, K),
    WITHOUT coefficient multiplies (those happen at tile level):

        su_u = Σ_h gy·(ρ@gx′),  su_v = Σ_h gy′·(ρ@gx),  su_s = Σ_h gy·(ρ@gx)
    """
    k = kmax
    rb = _dot(rho, jnp.concatenate([gxT, dgxT], axis=1))  # (H, 2K)
    rgx = rb[:, :k]
    rdgx = rb[:, k:]
    su_u = jnp.sum(gyT * rdgx, axis=0)[None]
    su_v = jnp.sum(dgyT * rgx, axis=0)[None]
    su_s = jnp.sum(gyT * rgx, axis=0)[None]
    return su_u, su_v, su_s


def _tile_wt_combine(wt, ctens, cq, infod, beta, kmax: int):
    """Σ_a wt_a ∂g_a/∂θ_c at tile level: β(2·cterm − cq) + wt·info′.

    wt (T, 3K); ctens (T, 9K) with C[ta*3+tc] K-blocks; cq (T, 3K)."""
    k = kmax
    wu, wv, ws = wt[:, :k], wt[:, k:2 * k], wt[:, 2 * k:]
    cterm = jnp.concatenate([
        wu * ctens[:, 0 * k:1 * k] + wv * ctens[:, 3 * k:4 * k]
        + ws * ctens[:, 6 * k:7 * k],
        wu * ctens[:, 1 * k:2 * k] + wv * ctens[:, 4 * k:5 * k]
        + ws * ctens[:, 7 * k:8 * k],
        wu * ctens[:, 2 * k:3 * k] + wv * ctens[:, 5 * k:6 * k]
        + ws * ctens[:, 8 * k:9 * k],
    ], axis=1)
    return beta * (2.0 * cterm - cq) + wt * infod


def _tile_cq(st: _ChainStacks, wt, beta, kmax: int):
    """The q-field contraction Σ_p q_wt·J_c·R1² for every chain — per-chain
    dots, tile-level coefficient algebra.  Returns (T, 3K)."""
    k = kmax
    t = wt.shape[0]
    alpha = wt[:, :k] * st.wcx * st.wcx                  # (T, K)
    bta = wt[:, k:2 * k] * st.wcy * st.wcy
    gma = wt[:, 2 * k:] * st.w * st.w
    sus = []
    for c in range(t):
        qf = _chain_q_field_mxu(
            alpha[c:c + 1], bta[c:c + 1], gma[c:c + 1],
            st.yp_a[c], st.yp_b[c], st.gx1sq[c], st.gxsq[c])
        sus.append(_chain_contract_sums(
            qf * st.r1[c] * st.r1[c], st.gxT[c], st.dgxT[c], st.gyT[c],
            st.dgyT[c], kmax))
    su_u = jnp.concatenate([s[0] for s in sus], axis=0)  # (T, K)
    su_v = jnp.concatenate([s[1] for s in sus], axis=0)
    su_s = jnp.concatenate([s[2] for s in sus], axis=0)
    return jnp.concatenate(
        [st.wcx * su_u, st.wcy * su_v, st.w * su_s], axis=1)


def _build_stacks_mxu(theta, mask_tk, image, spec: SceneSpec,
                      prior: PriorSpec, kmax: int, beta,
                      jitter: float) -> _ChainStacks:
    """Everything θ-dependent for a chain tile: per-chain dots statically
    unrolled (theta (T, 3K), mask_tk (T, K)), row algebra at tile level."""
    k = kmax
    t = theta.shape[0]
    cf = _tile_coefs_mxu(theta, mask_tk, spec, kmax)

    prof = {n: [] for n in ("yp_a", "yp_b", "gyT", "dgyT", "gxT", "dgxT",
                            "gx1sq", "gxsq", "r1")}
    drows = {n: [] for n in ("d1", "d2", "d3", "d4", "d5", "d6", "d7",
                             "d8", "d9")}
    su_rows = []
    ll_rows = []
    for c in range(t):
        pr = _chain_profiles_mxu(theta[c:c + 1], spec, kmax)
        lam = _dot(pr["gyT"] * cf["w"][c:c + 1], pr["gx"]) + spec.background
        r1 = 1.0 / lam
        yp_a = pr["gyT"] * pr["gyT"]
        yp_b = pr["dgyT"] * pr["dgyT"]
        yp_c = pr["gyT"] * pr["dgyT"]
        yp_d = pr["d2gyT"] * pr["dgyT"]

        # the 9 per-star bilinears from ONE (H, W) @ (W, 4K) dot
        xcat = jnp.concatenate(
            [pr["dgxT"] * pr["dgxT"], pr["gxT"] * pr["dgxT"],
             pr["gxT"] * pr["gxT"], pr["d2gxT"] * pr["dgxT"]], axis=1)
        mdot = _dot(r1, xcat)                            # (H, 4K)
        m1, m2 = mdot[:, :k], mdot[:, k:2 * k]
        m3, m4 = mdot[:, 2 * k:3 * k], mdot[:, 3 * k:]
        for n, v in (("d1", jnp.sum(yp_a * m1, axis=0)[None]),
                     ("d2", jnp.sum(yp_a * m4, axis=0)[None]),
                     ("d3", jnp.sum(yp_b * m2, axis=0)[None]),
                     ("d4", jnp.sum(yp_a * m2, axis=0)[None]),
                     ("d5", jnp.sum(yp_c * m1, axis=0)[None]),
                     ("d6", jnp.sum(yp_b * m3, axis=0)[None]),
                     ("d7", jnp.sum(yp_d * m3, axis=0)[None]),
                     ("d8", jnp.sum(yp_c * m3, axis=0)[None]),
                     ("d9", jnp.sum(yp_a * m3, axis=0)[None])):
            drows[n].append(v)

        rho0 = beta * (image * r1 - 1.0)
        su_rows.append(_chain_contract_sums(
            rho0, pr["gxT"], pr["dgxT"], pr["gyT"], pr["dgyT"], kmax))
        ll_rows.append(jnp.sum(image * jnp.log(lam) - lam).reshape(1, 1))

        for n, v in (("yp_a", yp_a), ("yp_b", yp_b), ("gyT", pr["gyT"]),
                     ("dgyT", pr["dgyT"]), ("gxT", pr["gxT"]),
                     ("dgxT", pr["dgxT"]), ("gx1sq", pr["gx1"] * pr["gx1"]),
                     ("gxsq", pr["gx"] * pr["gx"]), ("r1", r1)):
            prof[n].append(v[None])

    d = {n: jnp.concatenate(v, axis=0) for n, v in drows.items()}  # (T, K)
    stacks = {n: jnp.concatenate(v, axis=0) for n, v in prof.items()}

    # --- tile-level assembly -------------------------------------------
    f_u = cf["wcx"] * cf["wcx"] * d["d1"]
    f_v = cf["wcy"] * cf["wcy"] * d["d6"]
    f_s = cf["w"] * cf["w"] * d["d9"]
    fisher = jnp.concatenate([f_u, f_v, f_s], axis=1)    # (T, 3K)
    info, infod = _tile_info_mxu(cf, mask_tk, prior)
    m3k = jnp.concatenate([mask_tk] * 3, axis=1)
    g = (beta * fisher + info) * m3k + (1.0 - m3k) + jitter

    # C[ta*3+tc] blocks (module-docstring derivation; C_·s = F exactly)
    ctens = jnp.concatenate([
        cf["wcx"] * (cf["wcx2"] * d["d1"] + cf["wcxx"] * d["d2"]),  # C_uu
        cf["wcx"] * cf["wcxcy"] * d["d5"],                          # C_uv
        f_u,                                                        # C_us
        cf["wcy"] * cf["wcxcy"] * d["d3"],                          # C_vu
        cf["wcy"] * (cf["wcy2"] * d["d6"] + cf["wcyy"] * d["d7"]),  # C_vv
        f_v,                                                        # C_vs
        cf["w"] * cf["wcx"] * d["d4"],                              # C_su
        cf["w"] * cf["wcy"] * d["d8"],                              # C_sv
        f_s,                                                        # C_ss
    ], axis=1)                                           # (T, 9K)

    # U_β and ∇U_β (identical math to pallas_mxu._grad_eval_mxu)
    ux, uy, s_ = theta[:, :k], theta[:, k:2 * k], theta[:, 2 * k:]
    lp_pos = -(jax.nn.softplus(ux) + jax.nn.softplus(-ux)
               + jax.nn.softplus(uy) + jax.nn.softplus(-uy))
    zf = (s_ - prior.logf_mean) / prior.logf_sigma
    lp_flux = (-0.5 * zf * zf - math.log(prior.logf_sigma)
               - 0.5 * math.log(2.0 * math.pi))
    lp = jnp.sum((lp_pos + lp_flux) * mask_tk, axis=1, keepdims=True)
    loglik = jnp.concatenate(ll_rows, axis=0)            # (T, 1)
    u_pot = -(beta * loglik + lp)

    su_u = jnp.concatenate([s[0] for s in su_rows], axis=0)
    su_v = jnp.concatenate([s[1] for s in su_rows], axis=0)
    su_s = jnp.concatenate([s[2] for s in su_rows], axis=0)
    glp = jnp.concatenate([
        (1.0 - 2.0 * cf["sx"]) * mask_tk,
        (1.0 - 2.0 * cf["sy"]) * mask_tk,
        -zf / prior.logf_sigma * mask_tk,
    ], axis=1)
    grad_u = -(jnp.concatenate(
        [cf["wcx"] * su_u, cf["wcy"] * su_v, cf["w"] * su_s], axis=1) + glp)

    st = _ChainStacks(
        yp_a=stacks["yp_a"], yp_b=stacks["yp_b"], gyT=stacks["gyT"],
        dgyT=stacks["dgyT"], gxT=stacks["gxT"], dgxT=stacks["dgxT"],
        gx1sq=stacks["gx1sq"], gxsq=stacks["gxsq"], r1=stacks["r1"],
        w=cf["w"], wcx=cf["wcx"], wcy=cf["wcy"], g=g, u=u_pot,
        t1=grad_u, ctens=ctens, infod=infod,
    )
    wt0 = 0.5 / g
    cq0 = _tile_cq(st, wt0, beta, kmax)
    t1 = grad_u + _tile_wt_combine(wt0, ctens, cq0, infod, beta, kmax)
    return st._replace(t1=t1)


def _dh_dtheta_mxu(st: _ChainStacks, p, kmax: int, beta):
    """dH/dθ (T, 3K) at the stacks' θ — t1 + t2(a)."""
    a = p / st.g
    wt = -0.5 * a * a
    cq = _tile_cq(st, wt, beta, kmax)
    return st.t1 + _tile_wt_combine(wt, st.ctens, cq, st.infod, beta, kmax)


def _diag_metric_mxu(theta, mask_tk, spec, prior, kmax: int, beta,
                     jitter: float):
    """Fresh diag metric g (T, 3K) at trial θ (θ-fixed-point inner eval):
    per chain one λ dot + one (H,W)@(W,2K) dot + 3 sublane sums."""
    k = kmax
    cf = _tile_coefs_mxu(theta, mask_tk, spec, kmax)
    d1r, d6r, d9r = [], [], []
    for c in range(theta.shape[0]):
        pr = _chain_profiles_mxu(theta[c:c + 1], spec, kmax)
        lam = _dot(pr["gyT"] * cf["w"][c:c + 1], pr["gx"]) + spec.background
        r1 = 1.0 / lam
        xcat = jnp.concatenate(
            [pr["dgxT"] * pr["dgxT"], pr["gxT"] * pr["gxT"]], axis=1)
        mdot = _dot(r1, xcat)                            # (H, 2K)
        yp_a = pr["gyT"] * pr["gyT"]
        yp_b = pr["dgyT"] * pr["dgyT"]
        d1r.append(jnp.sum(yp_a * mdot[:, :k], axis=0)[None])
        d6r.append(jnp.sum(yp_b * mdot[:, k:], axis=0)[None])
        d9r.append(jnp.sum(yp_a * mdot[:, k:], axis=0)[None])
    d1 = jnp.concatenate(d1r, axis=0)                    # (T, K)
    d6 = jnp.concatenate(d6r, axis=0)
    d9 = jnp.concatenate(d9r, axis=0)
    fisher = jnp.concatenate(
        [cf["wcx"] * cf["wcx"] * d1, cf["wcy"] * cf["wcy"] * d6,
         cf["w"] * cf["w"] * d9], axis=1)
    info, _ = _tile_info_mxu(cf, mask_tk, prior)
    m3k = jnp.concatenate([mask_tk] * 3, axis=1)
    return (beta * fisher + info) * m3k + (1.0 - m3k) + jitter


def rhmc_diag_trajectory_mxu(
    theta, xi, eps, mask_tk, image, spec: SceneSpec, prior: PriorSpec,
    kmax: int, n_steps: int, fixed_point_iters: int, beta, jitter: float,
):
    """Pure-JAX MXU-layout tile trajectory (chains on sublanes).

    theta, xi : (T, 3K) rows [ux | uy | s]; eps (T, 1); mask_tk (T, K).
    Returns (theta' (T, 3K), p' (T, 3K), h0 (T,), h1 (T,), u1 (T,),
    resid (T,)).  Same generalized-leapfrog semantics as the lane variant
    (integrators.riemannian_leapfrog).
    """
    mask3 = jnp.concatenate([mask_tk] * 3, axis=1)       # (T, 3K)

    st0 = _build_stacks_mxu(theta, mask_tk, image, spec, prior, kmax,
                            beta, jitter)
    p0 = jnp.sqrt(st0.g) * xi * mask3
    h_of = lambda st, p: (st.u[:, 0] + 0.5 * jnp.sum(jnp.log(st.g), axis=1)
                          + 0.5 * jnp.sum(p * p / st.g, axis=1))
    h0 = h_of(st0, p0)

    def _delta(x_new, x_old):
        # per-chain relative sup-norm Picard delta over the 3K (lane) axis
        return (jnp.max(jnp.abs(x_new - x_old), axis=1)
                / (1.0 + jnp.max(jnp.abs(x_new), axis=1)))

    def step(_, carry):
        theta_r, p_r, st, resid = carry

        def p_sweep(_, c):
            ph, _ = c
            ph_new = p_r - 0.5 * eps * _dh_dtheta_mxu(st, ph, kmax, beta)
            return ph_new, _delta(ph_new, ph)

        p_half, d1 = jax.lax.fori_loop(
            0, fixed_point_iters, p_sweep, (p_r, jnp.zeros(p_r.shape[0]))
        )

        v0 = p_half / st.g
        base = theta_r + 0.5 * eps * v0

        def t_sweep(_, c):
            th, _ = c
            gk = _diag_metric_mxu(th, mask_tk, spec, prior, kmax, beta,
                                  jitter)
            th_new = base + 0.5 * eps * (p_half / gk)
            return th_new, _delta(th_new, th)

        theta_new, d2 = jax.lax.fori_loop(
            0, fixed_point_iters, t_sweep,
            (theta_r + eps * v0, jnp.zeros(theta_r.shape[0])),
        )

        st_new = _build_stacks_mxu(theta_new, mask_tk, image, spec, prior,
                                   kmax, beta, jitter)
        p_new = p_half - 0.5 * eps * _dh_dtheta_mxu(st_new, p_half, kmax,
                                                    beta)
        resid = jnp.maximum(resid, jnp.maximum(d1, d2))
        return theta_new, p_new, st_new, resid

    theta_f, p_f, st_f, resid = jax.lax.fori_loop(
        0, n_steps, step, (theta, p0, st0, jnp.zeros(theta.shape[0]))
    )
    h1 = h_of(st_f, p_f)
    return theta_f, p_f, h0, h1, st_f.u[:, 0], resid


def _rhmc_diag_mxu_kernel(
    image_ref, eps_ref, beta_ref, mask_ref, theta_ref, xi_ref,
    theta_out, p_out, h0_out, h1_out, u_out, resid_out,
    *, spec: SceneSpec, prior: PriorSpec, kmax: int, n_steps: int,
    fixed_point_iters: int, jitter: float,
):
    mask_tk = jnp.broadcast_to(mask_ref[:], (theta_ref.shape[0], kmax))
    th1, p1, h0, h1, u1, resid = rhmc_diag_trajectory_mxu(
        theta_ref[:], xi_ref[:], eps_ref[:], mask_tk, image_ref[:],
        spec, prior, kmax, n_steps, fixed_point_iters, beta_ref[0, 0],
        jitter,
    )
    theta_out[:] = th1
    p_out[:] = p1
    h0_out[:] = h0[:, None]
    h1_out[:] = h1[:, None]
    u_out[:] = u1[:, None]
    resid_out[:] = resid[:, None]


def make_pallas_rhmc_diag_mxu(
    spec: SceneSpec,
    image: jax.Array,
    prior: PriorSpec,
    kmax: int,
    n_steps: int,
    fixed_point_iters: int = 6,
    jitter: float = 1e-3,
    interpret: bool = False,
    tile: int = MXU_DIAG_TILE,
):
    """Crowded-field fused diag-Riemannian trajectory: same call contract
    as make_pallas_rhmc_diag_leapfrog — fused(theta (C,K,3), xi, eps, mask,
    beta) -> (theta', p', h0, h1, u1, resid).  C % tile == 0 (auto-shrunk
    gcd)."""
    from .pallas_mxu import _pack_rows, _unpack_rows

    d3 = 3 * kmax
    image_f = image.astype(jnp.float32)

    kernel = partial(
        _rhmc_diag_mxu_kernel, spec=spec, prior=prior, kmax=kmax,
        n_steps=n_steps, fixed_point_iters=fixed_point_iters, jitter=jitter,
    )

    def fused(theta, xi, eps, mask, beta=1.0):
        c = theta.shape[0]
        t = tile if c % tile == 0 else math.gcd(c, tile)
        grid = (c // t,)
        theta_t = _pack_rows(theta, kmax)                # (C, 3K)
        xi_t = _pack_rows(xi, kmax)
        eps_arr = jnp.broadcast_to(
            jnp.asarray(eps, jnp.float32).reshape(-1), (c,)
        ).reshape(c, 1)
        beta_arr = jnp.asarray(beta, jnp.float32).reshape(1, 1)

        chain_block = lambda i: (i, 0)
        if jnp.ndim(mask) == 2:   # per-chain (C, K)
            mask_arr = jnp.asarray(mask, jnp.float32)
            mask_spec = pl.BlockSpec((t, kmax), chain_block,
                                     memory_space=pltpu.VMEM)
        else:                     # shared (1, K), replicated to every tile
            mask_arr = jnp.asarray(mask, jnp.float32).reshape(1, kmax)
            mask_spec = pl.BlockSpec((1, kmax), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel,
            grid=grid,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 2 ** 20,
            ),
            in_specs=[
                pl.BlockSpec((spec.height, spec.width), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((t, 1), chain_block, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                mask_spec,
                pl.BlockSpec((t, d3), chain_block, memory_space=pltpu.VMEM),
                pl.BlockSpec((t, d3), chain_block, memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((t, d3), chain_block, memory_space=pltpu.VMEM),
                pl.BlockSpec((t, d3), chain_block, memory_space=pltpu.VMEM),
                pl.BlockSpec((t, 1), chain_block, memory_space=pltpu.VMEM),
                pl.BlockSpec((t, 1), chain_block, memory_space=pltpu.VMEM),
                pl.BlockSpec((t, 1), chain_block, memory_space=pltpu.VMEM),
                pl.BlockSpec((t, 1), chain_block, memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((c, d3), jnp.float32),
                jax.ShapeDtypeStruct((c, d3), jnp.float32),
                jax.ShapeDtypeStruct((c, 1), jnp.float32),
                jax.ShapeDtypeStruct((c, 1), jnp.float32),
                jax.ShapeDtypeStruct((c, 1), jnp.float32),
                jax.ShapeDtypeStruct((c, 1), jnp.float32),
            ],
            interpret=interpret,
        )(image_f, eps_arr, beta_arr, mask_arr, theta_t, xi_t)

        theta_new, p_new, h0, h1, u1, resid = out
        return (
            _unpack_rows(theta_new, kmax), _unpack_rows(p_new, kmax),
            h0[:, 0], h1[:, 0], u1[:, 0], resid[:, 0],
        )

    return fused
