"""Fused Pallas RIEMANNIAN leapfrog kernel (SURVEY.md ⑮ "Riemannian
variant", `pallas_rhmc_leapfrog`; BASELINE.json:5 "fused Pallas kernels over
thousands of chains").

The RHMC mutation is the dominant hot loop of the trans-dimensional SMC
configs (SURVEY.md §3.4) and of config 1.  The XLA path (rhmc.py) obtains
dH/dtheta by autodiff through the metric build + Cholesky; each generalized-
leapfrog step round-trips the (3K, H*W) Jacobian and every Picard-sweep
intermediate through HBM.  Measured on the v5e chip that path runs at
~11.4k Riemannian-leapfrog-steps/s for 1024 chains on the config-1/2
workload (10 stars, 32x32).  This kernel keeps the ENTIRE L-step implicit
trajectory VMEM-resident with chains tiled onto the VPU lanes
(chains-on-lanes, like pallas_kernels.py) and replaces autodiff with the
closed-form metric derivative below.

Hamiltonian (identical to rhmc.py / metric.py, same β-tempering as smc.py):

    H(θ, p) = U_β(θ) + 1/2 log det G(θ) + 1/2 pᵀ G(θ)⁻¹ p
    U_β     = -(β·loglik + logprior)
    G(θ)    = β·F(θ) + diag(info(θ)) + diag(1 - m) + jitter·I
    F_ab    = Σ_p J_a(p) J_b(p) / λ(p)          (Poisson Fisher)

Closed-form derivative (the piece autodiff computes in the XLA path): with
a = G⁻¹p, M = G⁻¹ - a aᵀ, R1 = 1/λ, R2 = 1/λ², and the scene Hessian
H_ac = ∂²λ/∂θ_a∂θ_c (nonzero only for a, c in the same star),

    ∂H/∂θ_c = ∂U/∂θ_c + 1/2 Σ_ab M_ab ∂G_ab/∂θ_c
    Σ_ab M_ab ∂F_ab/∂θ_c = 2 Σ_{a∈star(c)} Σ_b M_ab S_acb − Σ_p q_M(p) J_c(p) R2(p)
    S_acb = Σ_p H_ac(p) J_b(p) R1(p),     q_M(p) = Σ_ab M_ab J_a(p) J_b(p)

Splitting M = G⁻¹ − aaᵀ separates a θ-only part t1 (computed once per
position, reused across all Picard sweeps of the momentum fixed point and
by the next step) from a cheap per-sweep part t2(a):

    t1_c    = ∂U_c + β Σ_ab G⁻¹_ab S_acb − (β/2) Σ_p q_{G⁻¹} J_c R2
              + 1/2 G⁻¹_cc info'_c
    t2_c(a) = −β Σ_ab a_a a_b S_acb + (β/2) Σ_p φ(p)² J_c R2 − 1/2 a_c² info'_c
    φ(p)    = Σ_b a_b J_b(p)            (one separable field build per sweep)

Everything is separable: J_a = Y_a(h)·X_a(w) with X ∈ {gx, gx′, gx″},
Y ∈ {gy, gy′, gy″}, so all pixel contractions collapse to 1-D profile
passes exactly as in potential.py / pallas_kernels.py.  The Cholesky of the
per-chain (3K, 3K) metric, its inverse and the triangular solves are
unrolled over the (static) 3K dimension with every operation a full-width
(…, TILE) lane vector op — the per-chain linear algebra that XLA serializes
into tiny batched kernels becomes straight-line VPU code.

Shapes inside a tile (T = 128 chains on lanes): θ, p packed (3K, T) rows
[ux; uy; s]; metric objects (3K, 3K, T); the Hessian-contraction tensor S
stored as (6·3, K, K, T) with combo index m ∈ [(uu),(uv),(us),(vv),(vs),
(ss)] and row d = m·3 + tb.

Cross-checked against the XLA head (jax.grad through metric.py + Cholesky)
to float tolerance in tests/test_pallas_rhmc.py.
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
from .potential import PriorSpec
from .scene import SceneSpec

# combo order for the symmetric within-star (a, c) Hessian index:
#   0:(u,u) 1:(u,v) 2:(u,s) 3:(v,v) 4:(v,s) 5:(s,s)
_COMBO = ((0, 1, 2), (1, 3, 4), (2, 4, 5))  # _COMBO[ta][tc] -> m


class _Profiles(NamedTuple):
    """Per-star separable profiles and coefficient vectors for one tile."""

    gx: jax.Array   # (K, W, T) unit-normalized 1-D PSF
    gx1: jax.Array  # (K, W, T) ∂gx/∂x
    gx2: jax.Array  # (K, W, T) ∂²gx/∂x²
    gy: jax.Array   # (K, H, T)
    gy1: jax.Array  # (K, H, T)
    gy2: jax.Array  # (K, H, T)
    w: jax.Array    # (K, T) masked flux f·m
    wcx: jax.Array  # (K, T) w · dx/du
    wcy: jax.Array  # (K, T) w · dy/dv
    wcx2: jax.Array  # (K, T) w · d²x/du²
    wcy2: jax.Array  # (K, T) w · d²y/dv²
    wcxx: jax.Array  # (K, T) w · (dx/du)²
    wcyy: jax.Array  # (K, T) w · (dy/dv)²
    wcxcy: jax.Array  # (K, T) w · (dx/du)(dy/dv)


# J_a = coef · Y · X per parameter type (u, v, s); names into _Profiles.
_J_COEF = ("wcx", "wcy", "w")
_J_Y = ("gy", "gy1", "gy")
_J_X = ("gx1", "gx", "gx")

# H_ac = Σ terms coef · Y · X per combo m (derivation in the module docstring).
_H_TERMS = (
    (("wcx2", "gy", "gx1"), ("wcxx", "gy", "gx2")),   # (u,u)
    (("wcxcy", "gy1", "gx1"),),                        # (u,v)
    (("wcx", "gy", "gx1"),),                           # (u,s)  = J_u
    (("wcy2", "gy1", "gx"), ("wcyy", "gy2", "gx")),    # (v,v)
    (("wcy", "gy1", "gx"),),                           # (v,s)  = J_v
    (("w", "gy", "gx"),),                              # (s,s)  = J_s
)


def _profiles(theta_blk, mask, spec: SceneSpec, kmax: int) -> _Profiles:
    """theta_blk (3, K, T) [u; v; s], mask (K, T) -> profile set."""
    k = kmax
    t = theta_blk.shape[-1]
    sig = spec.psf_sigma
    norm = 1.0 / (math.sqrt(2.0 * math.pi) * sig)

    u, v, s = theta_blk[0], theta_blk[1], theta_blk[2]       # (K, T)
    su = jax.nn.sigmoid(u)
    sv = jax.nn.sigmoid(v)
    x = spec.width * su
    y = spec.height * sv
    cx = spec.width * su * (1.0 - su)            # dx/du
    cy = spec.height * sv * (1.0 - sv)
    cx2 = cx * (1.0 - 2.0 * su)                  # d²x/du²
    cy2 = cy * (1.0 - 2.0 * sv)
    w = jnp.exp(s) * mask

    pxw = jax.lax.broadcasted_iota(jnp.int32, (spec.width, t), 0).astype(jnp.float32) + 0.5
    pxh = jax.lax.broadcasted_iota(jnp.int32, (spec.height, t), 0).astype(jnp.float32) + 0.5
    zx = (pxw[None] - x[:, None, :]) / sig                   # (K, W, T)
    zy = (pxh[None] - y[:, None, :]) / sig
    gx = jnp.exp(-0.5 * zx * zx) * norm
    gy = jnp.exp(-0.5 * zy * zy) * norm
    gx1 = gx * zx / sig
    gy1 = gy * zy / sig
    gx2 = gx * (zx * zx - 1.0) / (sig * sig)
    gy2 = gy * (zy * zy - 1.0) / (sig * sig)

    return _Profiles(
        gx, gx1, gx2, gy, gy1, gy2,
        w, w * cx, w * cy, w * cx2, w * cy2,
        w * cx * cx, w * cy * cy, w * cx * cy,
    )


def _render(pr: _Profiles, spec: SceneSpec, kmax: int):
    """λ (H, W, T) from the profile set — K rank-1 accumulations."""
    h, wdt = spec.height, spec.width
    t = pr.w.shape[-1]
    lam = jnp.full((h, wdt, t), spec.background, jnp.float32)
    for i in range(kmax):
        lam = lam + (pr.gy[i] * pr.w[i][None, :])[:, None, :] * pr.gx[i][None, :, :]
    return lam


def _contract_grad(rho, pr: _Profiles, kmax: int):
    """Σ_p ρ(p)·J_c(p) for every c, returned as (3, K, T).

    Same 2-pass-per-star separable contraction as pallas_kernels._grad_eval:
    rg = Σ_w ρ·gx, rg1 = Σ_w ρ·gx′, then H-length dots.
    """
    cu, cv, cs = [], [], []
    for i in range(kmax):
        rg = jnp.sum(rho * pr.gy[i][:, None, :], axis=0)    # (W, T) Σ_h ρ·gy
        rg1 = jnp.sum(rho * pr.gy1[i][:, None, :], axis=0)  # leading-axis
        cu.append(pr.wcx[i] * jnp.sum(pr.gx1[i] * rg, axis=0))
        cv.append(pr.wcy[i] * jnp.sum(pr.gx[i] * rg1, axis=0))
        cs.append(pr.w[i] * jnp.sum(pr.gx[i] * rg, axis=0))
    return jnp.stack([jnp.stack(cu), jnp.stack(cv), jnp.stack(cs)])


def _phi_field(a_blk, pr: _Profiles, kmax: int):
    """φ(p) = Σ_b a_b J_b(p) as (H, W, T) — 2 rank-1 accumulations/star."""
    au, av, as_ = a_blk[0], a_blk[1], a_blk[2]               # (K, T)
    h = pr.gy.shape[1]
    wdt = pr.gx.shape[1]
    t = au.shape[-1]
    phi = jnp.zeros((h, wdt, t), jnp.float32)
    for i in range(kmax):
        tx = (au[i] * pr.wcx[i])[None, :] * pr.gx1[i] + (as_[i] * pr.w[i])[None, :] * pr.gx[i]
        phi = phi + pr.gy[i][:, None, :] * tx[None, :, :]
        tx2 = (av[i] * pr.wcy[i])[None, :] * pr.gx[i]
        phi = phi + pr.gy1[i][:, None, :] * tx2[None, :, :]
    return phi


def _fisher_and_hessian(pr: _Profiles, r1, kmax: int, with_s: bool):
    """Fisher F (3K, 3K, T) and, if with_s, the S tensor (18, K, K, T).

    Ordered star loop (i = H/J-row star, all j at once): for each i the six
    TxR row-contractions TxR[xa_i, xb_j](j, h, T) = Σ_w xa_i·xb_j·R1 feed
    both the F blocks (xa ∈ {gx, gx′}) and the S entries (xa ∈ {gx, gx′,
    gx″}); all remaining work is H-length dots vectorized over j.
    """
    k = kmax
    xs = {"gx": pr.gx, "gx1": pr.gx1, "gx2": pr.gx2}
    ys = {"gy": pr.gy, "gy1": pr.gy1, "gy2": pr.gy2}
    coefs = {
        "w": pr.w, "wcx": pr.wcx, "wcy": pr.wcy, "wcx2": pr.wcx2,
        "wcy2": pr.wcy2, "wcxx": pr.wcxx, "wcyy": pr.wcyy, "wcxcy": pr.wcxcy,
    }

    # F blocks as [ta][tb] lists of (K, K, T); S rows as [m][tb].
    f_blocks = [[[] for _ in range(3)] for _ in range(3)]
    s_rows = [[[] for _ in range(3)] for _ in range(6)] if with_s else None

    for i in range(k):
        # TyR[(ya, yb)] : (K_j, W, T) = Σ_h ya_i·yb_j·R1 for ya of star i
        # against yb of all j.  Contracting over H — the LEADING axis —
        # lowers as plain (W, T) vector accumulations with no sublane-
        # rotation tree (these K² big passes dominate the metric build; the
        # W-first form measured ~14% slower on the plain-leapfrog kernel).
        tyr = {}
        ya_names = ("gy", "gy1", "gy2") if with_s else ("gy", "gy1")
        for na in ya_names:
            for nb in ("gy", "gy1"):
                prods = ys[na][i][None, :, :] * ys[nb]       # (K, H, T)
                tyr[(na, nb)] = jnp.stack(
                    [jnp.sum(r1 * prods[j][:, None, :], axis=0) for j in range(k)]
                )                                            # (K, W, T)

        # Fisher rows for star i: F[(ta,i),(tb,:)] — vectorized over j.
        for ta in range(3):
            ca, ya, xa = _J_COEF[ta], _J_Y[ta], _J_X[ta]
            for tb in range(3):
                cb, yb, xb = _J_COEF[tb], _J_Y[tb], _J_X[tb]
                wsum = jnp.sum(
                    xs[xa][i][None, :, :] * xs[xb] * tyr[(ya, yb)], axis=1
                )                                            # (K, T)
                f_blocks[ta][tb].append(coefs[ca][i][None, :] * coefs[cb] * wsum)

        if with_s:
            # S[m, tb, i, :] = Σ_terms coefH_i · cJ_tb · Σ_w XH_i·XJ·TyR
            for m in range(6):
                for tb in range(3):
                    cb, yb, xb = _J_COEF[tb], _J_Y[tb], _J_X[tb]
                    acc = None
                    for (ch, yh, xh) in _H_TERMS[m]:
                        wsum = jnp.sum(
                            xs[xh][i][None, :, :] * xs[xb] * tyr[(yh, yb)], axis=1
                        )
                        term = coefs[ch][i][None, :] * coefs[cb] * wsum
                        acc = term if acc is None else acc + term
                    s_rows[m][tb].append(acc)                # (K, T)

    # assemble F (3K, 3K, T): block-rows concatenated, no 5-D transposes.
    rows = []
    for ta in range(3):
        row = jnp.concatenate(
            [jnp.stack(f_blocks[ta][tb]) for tb in range(3)], axis=1
        )                                                    # (K, 3K, T)
        rows.append(row)
    fisher = jnp.concatenate(rows, axis=0)                   # (3K, 3K, T)

    s_tensor = None
    if with_s:
        s_tensor = jnp.stack(
            [jnp.stack(s_rows[m][tb]) for m in range(6) for tb in range(3)]
        )                                                    # (18, K, K, T)
    return fisher, s_tensor


def _metric_from_fisher(fisher, pr: _Profiles, mask, prior: PriorSpec,
                        beta, jitter: float, theta_blk):
    """G = β·F + diag(info) + diag(1−m) + jitter·I, plus info′ (3, K, T)."""
    d = fisher.shape[0]
    k = mask.shape[0]
    su = jax.nn.sigmoid(theta_blk[0])
    sv = jax.nn.sigmoid(theta_blk[1])
    info_u = 2.0 * su * (1.0 - su) * mask                    # (K, T)
    info_v = 2.0 * sv * (1.0 - sv) * mask
    info_s = mask / (prior.logf_sigma ** 2)
    infod_u = info_u * (1.0 - 2.0 * su)                      # d info_u / du
    infod_v = info_v * (1.0 - 2.0 * sv)
    diag = jnp.concatenate(
        [info_u + (1.0 - mask), info_v + (1.0 - mask), info_s + (1.0 - mask)]
    )                                                        # (3K, T)
    rows = jax.lax.broadcasted_iota(jnp.int32, (d, d), 0)
    eye = (rows == rows.T).astype(jnp.float32)[:, :, None]   # (D, D, 1)
    g = beta * fisher + eye * (diag + jitter)[:, None, :]
    infod = jnp.stack([infod_u, infod_v, jnp.zeros_like(info_s)])
    return g, infod


def _cholesky(g):
    """Right-looking Cholesky of (D, D, T), unrolled over D; every op is a
    full-width lane vector op.  Non-PD inputs propagate NaN (the divergence
    path — MH rejects, mirroring jnp.linalg.cholesky in the XLA head)."""
    d = g.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (d, 1), 0)
    a = g
    cols = []
    for j in range(d):
        dinv = jax.lax.rsqrt(a[j, j])                        # (T,)
        col = jnp.where(rows >= j, a[:, j] * dinv[None, :], 0.0)  # (D, T)
        cols.append(col)
        a = a - col[:, None, :] * col[None, :, :]
    # L[:, j] = cols[j]
    return jnp.stack(cols, axis=1)                           # (D, D, T)


def _lower_inverse(lmat):
    """L⁻¹ by forward substitution on identity RHS, unrolled.

    Mosaic-friendly form: every step reads a FULL row/column (no partial
    sublane slices, which Mosaic refuses to reduce over); correctness relies
    on L being exactly lower-triangular and unsolved rows of X being zero.
    """
    d = lmat.shape[0]
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (d, 1), 0)
    x = jnp.zeros_like(lmat)                                 # (D, D, T)
    for r in range(d):
        e_r = (rows_i == r).astype(jnp.float32)              # (D, 1)
        # Σ_k L[r,k]·X[k]: k > r has L[r,k] = 0; k = r has X[r] = 0 (unset).
        acc = e_r - jnp.sum(lmat[r][:, None, :] * x, axis=0)
        x = x + e_r[:, :, None] * (acc / lmat[r, r][None, :])[None, :, :]
    return x                                                 # L⁻¹


def _matvec(m, b):
    """(D, D, T) @ (D, T) -> (D, T)."""
    return jnp.sum(m * b[None, :, :], axis=1)


def _matvec_t(m, b):
    """(D, D, T)ᵀ @ (D, T) -> (D, T): Σ_k m[k, :, :]·b[k] — the reduction
    runs over the leading (untiled) dim, which Mosaic lowers as plain adds
    (a middle-dim slice like m[:, r] cannot be reduced: sublane offset)."""
    return jnp.sum(m * b[:, None, :], axis=0)


def _q_field(ginv, pr: _Profiles, kmax: int):
    """q_{G⁻¹}(p) = Σ_ab G⁻¹_ab J_a(p) J_b(p), accumulated per (i, x-combo)
    with the h-coefficients vectorized over j."""
    k = kmax
    h = pr.gy.shape[1]
    wdt = pr.gx.shape[1]
    t = pr.w.shape[-1]
    xs = {"gx": pr.gx, "gx1": pr.gx1}
    ys = {"gy": pr.gy, "gy1": pr.gy1}
    coefs = {"w": pr.w, "wcx": pr.wcx, "wcy": pr.wcy}
    # x-combo -> list of (ta, tb) whose J profiles produce that product
    combos = {
        ("gx1", "gx1"): ((0, 0),),
        ("gx1", "gx"): ((0, 1), (0, 2)),
        ("gx", "gx1"): ((1, 0), (2, 0)),
        ("gx", "gx"): ((1, 1), (1, 2), (2, 1), (2, 2)),
    }
    q = jnp.zeros((h, wdt, t), jnp.float32)
    for i in range(k):
        for (na, nb), pairs in combos.items():
            cy_all = None                                    # (K_j, H, T)
            for ta, tb in pairs:
                grow = ginv[ta * k + i, tb * k:(tb + 1) * k]  # (K_j, T)
                coef = (coefs[_J_COEF[ta]][i][None, :]
                        * coefs[_J_COEF[tb]] * grow)         # (K_j, T)
                term = (coef[:, None, :]
                        * ys[_J_Y[ta]][i][None, :, :] * ys[_J_Y[tb]])
                cy_all = term if cy_all is None else cy_all + term
            prods = xs[na][i][None, :, :] * xs[nb]           # (K_j, W, T)
            for j in range(k):
                q = q + cy_all[j][:, None, :] * prods[j][None, :, :]
    return q


def _s_contract_matrix(s_tensor, ginv, kmax: int):
    """Σ_{a∈star(c)} Σ_b G⁻¹_ab S_acb for every c, as (3, K, T)."""
    k = kmax
    out = []
    for tc in range(3):
        acc = None
        for ta in range(3):
            m = _COMBO[ta][tc]
            for tb in range(3):
                gblock = ginv.reshape(3, k, 3 * k, -1)[ta][:, tb * k:(tb + 1) * k, :]
                # gblock (K_i, K_j, T); S row (K_i, K_j, T)
                term = jnp.sum(gblock * s_tensor[m * 3 + tb], axis=1)  # (K_i, T)
                acc = term if acc is None else acc + term
        out.append(acc)
    return jnp.stack(out)                                    # (3, K, T)


def _psi_contract(pr: _Profiles, a_blk, field, kmax: int):
    """Σ_{a∈star(c)} Σ_b a_a a_b S_acb for every c, as (3, K, T), computed
    WITHOUT the S tensor:  Σ_p ψ_c(p)·field(p) with ψ_c = Σ_a a_a H_ac and
    field = φ·R1.  Per star: 3 row-contractions (gx, gx′, gx″ against the
    field) and cheap H-length dots for the Hessian terms."""
    au, av, as_ = a_blk[0], a_blk[1], a_blk[2]               # (K, T)
    cu, cv, cs = [], [], []
    for i in range(kmax):
        # leading-axis (H) contractions — see _fisher_and_hessian note
        rg = jnp.sum(field * pr.gy[i][:, None, :], axis=0)   # (W, T)
        rg1 = jnp.sum(field * pr.gy1[i][:, None, :], axis=0)
        rg2 = jnp.sum(field * pr.gy2[i][:, None, :], axis=0)

        def wdot(x, r):
            return jnp.sum(x[i] * r, axis=0)                 # (T,)

        huu = pr.wcx2[i] * wdot(pr.gx1, rg) + pr.wcxx[i] * wdot(pr.gx2, rg)
        huv = pr.wcxcy[i] * wdot(pr.gx1, rg1)
        hus = pr.wcx[i] * wdot(pr.gx1, rg)
        hvv = pr.wcy2[i] * wdot(pr.gx, rg1) + pr.wcyy[i] * wdot(pr.gx, rg2)
        hvs = pr.wcy[i] * wdot(pr.gx, rg1)
        hss = pr.w[i] * wdot(pr.gx, rg)
        cu.append(au[i] * huu + av[i] * huv + as_[i] * hus)
        cv.append(au[i] * huv + av[i] * hvv + as_[i] * hvs)
        cs.append(au[i] * hus + av[i] * hvs + as_[i] * hss)
    return jnp.stack([jnp.stack(cu), jnp.stack(cv), jnp.stack(cs)])


class _Structs(NamedTuple):
    """θ-dependent state carried across leapfrog steps (all per-tile).

    VMEM budget note: the S tensor (1.5 MB padded), the Cholesky factor and
    1/λ² are deliberately NOT carried.  S is only needed for the θ-only t1
    (build-time transient); the per-sweep S-contraction is recovered from
    the separable profiles instead:

        Σ_{a,b} a_a a_b S_acb = Σ_p ψ_c(p)·φ(p)·R1(p),  ψ_c = Σ_a a_a H_ac

    (see _psi_contract) — 3 extra row-contractions per star per sweep."""

    pr: _Profiles
    r1: jax.Array       # (H, W, T) 1/λ
    ginv: jax.Array     # (3K, 3K, T)
    logdet: jax.Array   # (T,)
    u: jax.Array        # (T,) U_β(θ)
    t1: jax.Array       # (3, K, T) θ-only part of dH/dθ
    infod: jax.Array    # (3, K, T)


def _log_prior_terms(theta_blk, mask, prior: PriorSpec):
    """(logprior (T,), grad logprior (3, K, T)) — mirrors potential.py."""
    u, v, s = theta_blk[0], theta_blk[1], theta_blk[2]
    lp_pos = -(jax.nn.softplus(u) + jax.nn.softplus(-u)
               + jax.nn.softplus(v) + jax.nn.softplus(-v))   # (K, T)
    zf = (s - prior.logf_mean) / prior.logf_sigma
    lp_flux = (-0.5 * zf * zf - math.log(prior.logf_sigma)
               - 0.5 * math.log(2.0 * math.pi))
    lp = jnp.sum((lp_pos + lp_flux) * mask, axis=0)          # (T,)
    g_u = (1.0 - 2.0 * jax.nn.sigmoid(u)) * mask
    g_v = (1.0 - 2.0 * jax.nn.sigmoid(v)) * mask
    g_s = -zf / prior.logf_sigma * mask
    return lp, jnp.stack([g_u, g_v, g_s])


def _build_structs(theta_blk, mask, image, spec: SceneSpec, prior: PriorSpec,
                   kmax: int, beta, jitter: float) -> _Structs:
    """Everything θ-dependent: profiles, λ fields, G⁻¹/chol/logdet, U_β,
    the S tensor and the θ-only derivative part t1."""
    pr = _profiles(theta_blk, mask, spec, kmax)
    lam = _render(pr, spec, kmax)
    r1 = 1.0 / lam
    d = jnp.broadcast_to(image[:, :, None], lam.shape)

    loglik = jnp.sum(d * jnp.log(lam) - lam, axis=(0, 1))    # (T,)
    lp, glp = _log_prior_terms(theta_blk, mask, prior)
    u_pot = -(beta * loglik + lp)

    rho0 = beta * (d * r1 - 1.0)
    grad_u = -(_contract_grad(rho0, pr, kmax) + glp)         # (3, K, T)

    fisher, s_tensor = _fisher_and_hessian(pr, r1, kmax, with_s=True)
    g, infod = _metric_from_fisher(fisher, pr, mask, prior, beta, jitter, theta_blk)
    chol = _cholesky(g)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.stack([chol[j, j] for j in range(g.shape[0])])), axis=0)
    linv = _lower_inverse(chol)
    ginv = jnp.zeros_like(g)
    for kk in range(g.shape[0]):
        ginv = ginv + linv[kk][:, None, :] * linv[kk][None, :, :]

    q = _q_field(ginv, pr, kmax)
    cq = _contract_grad(q * r1 * r1, pr, kmax)               # (3, K, T)
    sg = _s_contract_matrix(s_tensor, ginv, kmax)
    k = kmax
    ginv_diag = jnp.stack(
        [jnp.stack([ginv[tc * k + i, tc * k + i] for i in range(k)]) for tc in range(3)]
    )                                                        # (3, K, T)
    t1 = grad_u + beta * sg - 0.5 * beta * cq + 0.5 * ginv_diag * infod

    return _Structs(pr, r1, ginv, logdet, u_pot, t1, infod), chol


def _dh_dtheta(st: _Structs, p_blk, kmax: int, beta):
    """dH/dθ at the structs' θ, momentum p (3, K, T) — t1 + t2(a)."""
    d = 3 * kmax
    a = _matvec(st.ginv, p_blk.reshape(d, -1)).reshape(3, kmax, -1)
    phi = _phi_field(a, st.pr, kmax)
    ct = _contract_grad(phi * phi * st.r1 * st.r1, st.pr, kmax)
    sv = _psi_contract(st.pr, a, phi * st.r1, kmax)
    t2 = -beta * sv + 0.5 * beta * ct - 0.5 * (a * a) * st.infod
    return st.t1 + t2


def _fisher_only_solve(theta_blk, mask, image, spec, prior, kmax, beta,
                       jitter, p_flat):
    """G(θ)⁻¹ p via fresh metric build + triangular solves (θ-fixed-point
    inner evaluation: no S/q/t1 needed)."""
    pr = _profiles(theta_blk, mask, spec, kmax)
    lam = _render(pr, spec, kmax)
    fisher, _ = _fisher_and_hessian(pr, 1.0 / lam, kmax, with_s=False)
    g, _ = _metric_from_fisher(fisher, pr, mask, prior, beta, jitter, theta_blk)
    chol = _cholesky(g)
    linv = _lower_inverse(chol)
    # G⁻¹p = L⁻ᵀ (L⁻¹ p)
    return _matvec_t(linv, _matvec(linv, p_flat))


def rhmc_trajectory_tile(
    theta, xi, eps, mask, image, spec: SceneSpec, prior: PriorSpec,
    kmax: int, n_steps: int, fixed_point_iters: int, beta, jitter: float,
):
    """Pure-JAX tile trajectory (runs identically inside the Pallas kernel
    and standalone in tests).

    theta, xi : (3K, T) packed [u; v; s];  eps (1, T);  mask (K, T)
    Returns (theta' (3K, T), p' (3K, T), h0 (T,), h1 (T,), u1 (T,),
    resid (T,)) — resid is the per-chain max relative last-Picard-sweep
    delta (same statistic as integrators.riemannian_leapfrog.solver_resid,
    reduced over the leading param axis).

    Momentum refresh happens in-kernel: p0 = (L(θ0)·ξ)·mask so the Cholesky
    of the initial metric is computed exactly once (mirrors rhmc.rhmc_step).
    The generalized-leapfrog step and Picard sweep counts mirror
    integrators.riemannian_leapfrog.
    """
    d = 3 * kmax
    mask_p = jnp.concatenate([mask] * 3, axis=0)             # (3K, T)

    def blk(flat):
        return flat.reshape(3, kmax, -1)

    st0, chol0 = _build_structs(blk(theta), mask, image, spec, prior, kmax, beta, jitter)
    p0 = _matvec(chol0, xi) * mask_p
    a0 = _matvec(st0.ginv, p0)
    h0 = st0.u + 0.5 * st0.logdet + 0.5 * jnp.sum(p0 * a0, axis=0)

    def _delta(x_new, x_old):
        # per-chain relative sup-norm Picard delta (leading-axis max
        # reductions lower fine in Mosaic, like the h0 sum above)
        return (jnp.max(jnp.abs(x_new - x_old), axis=0)
                / (1.0 + jnp.max(jnp.abs(x_new), axis=0)))

    def step(_, carry):
        theta_f, p_f, st, resid = carry

        # implicit momentum half-step: p_h = p − ε/2 dH/dθ(θ, p_h)
        def p_sweep(_, c):
            ph, _ = c
            ph_new = p_f - 0.5 * eps * _dh_dtheta(st, blk(ph), kmax, beta).reshape(d, -1)
            return ph_new, _delta(ph_new, ph)

        p_half, d1 = jax.lax.fori_loop(
            0, fixed_point_iters, p_sweep, (p_f, jnp.zeros(p_f.shape[1:]))
        )

        # implicit position step: θ′ = θ + ε/2 [G(θ)⁻¹ + G(θ′)⁻¹] p_h
        v0 = _matvec(st.ginv, p_half)
        base = theta_f + 0.5 * eps * v0

        def t_sweep(_, c):
            th, _ = c
            vk = _fisher_only_solve(
                blk(th), mask, image, spec, prior, kmax, beta, jitter, p_half
            )
            th_new = base + 0.5 * eps * vk
            return th_new, _delta(th_new, th)

        theta_new, d2 = jax.lax.fori_loop(
            0, fixed_point_iters, t_sweep,
            (theta_f + eps * v0, jnp.zeros(theta_f.shape[1:])),
        )

        # rebuild θ-structs once; reused by the final momentum half-step,
        # h1, AND the next step's momentum fixed point.
        st_new, _ = _build_structs(
            blk(theta_new), mask, image, spec, prior, kmax, beta, jitter
        )
        p_new = p_half - 0.5 * eps * _dh_dtheta(
            st_new, blk(p_half), kmax, beta
        ).reshape(d, -1)
        resid = jnp.maximum(resid, jnp.maximum(d1, d2))
        return theta_new, p_new, st_new, resid

    theta_f, p_f, st_f, resid = jax.lax.fori_loop(
        0, n_steps, step, (theta, p0, st0, jnp.zeros(theta.shape[1:]))
    )
    a1 = _matvec(st_f.ginv, p_f)
    h1 = st_f.u + 0.5 * st_f.logdet + 0.5 * jnp.sum(p_f * a1, axis=0)
    u1 = st_f.u
    return theta_f, p_f, h0, h1, u1, resid


def _rhmc_kernel(
    image_ref, eps_ref, beta_ref, mask_ref, theta_ref, xi_ref,
    theta_out, p_out, h0_out, h1_out, u_out, resid_out,
    *, spec: SceneSpec, prior: PriorSpec, kmax: int, n_steps: int,
    fixed_point_iters: int, jitter: float,
):
    theta = theta_ref[:]
    xi = xi_ref[:]
    eps = eps_ref[:]
    mask = mask_ref[:]
    beta = beta_ref[0, 0]
    th1, p1, h0, h1, u1, resid = rhmc_trajectory_tile(
        theta, xi, eps, mask, image_ref[:], spec, prior, kmax,
        n_steps, fixed_point_iters, beta, jitter,
    )
    theta_out[:] = th1
    p_out[:] = p1
    h0_out[:] = h0[None, :]
    h1_out[:] = h1[None, :]
    u_out[:] = u1[None, :]
    resid_out[:] = resid[None, :]


def make_pallas_rhmc_leapfrog(
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
    """Build fused_rhmc(theta (C,K,3), xi (C,K,3), eps, mask, beta) ->
    (theta' (C,K,3), p' (C,K,3), h0 (C,), h1 (C,), u1 (C,), resid (C,)).

    eps: scalar or (C,); mask: (K,) shared or (C,K) per-chain (trans-d SMC);
    beta: scalar likelihood temperature (1.0 = posterior).  C % 128 == 0.
    xi ~ N(0, I); the kernel refreshes p0 = chol(G(θ))·ξ internally.
    """
    d3 = 3 * kmax
    image_f = image.astype(jnp.float32)
    t = TILE if tile is None else tile

    kernel = partial(
        _rhmc_kernel, spec=spec, prior=prior, kmax=kmax, n_steps=n_steps,
        fixed_point_iters=fixed_point_iters, jitter=jitter,
    )

    def fused(theta, xi, eps, mask, beta=1.0):
        c = theta.shape[0]
        # Auto-shrink the chain tile to a divisor of C (gcd keeps the full
        # 128-lane tile for production shapes; small per-device shards under
        # shard_map — e.g. tests on a fake 8-device mesh — still compile).
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
                # the fused trajectory's peak working set (profiles + metric
                # objects + (H,W,T) fields across the fori_loop carry)
                # overshoots Mosaic's 16 MB default scoped-vmem soft cap by
                # <1 MB at the config-1/2 shapes; raise it (v5e headroom)
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
            in_specs=[
                pl.BlockSpec((spec.height, spec.width), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tt), chain_block, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((kmax, tt), chain_block, memory_space=pltpu.VMEM),
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
