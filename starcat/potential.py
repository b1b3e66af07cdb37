"""Poisson potential, priors and analytic gradients (SURVEY.md ②③).

All sampler heads share one potential function (BASELINE.json:5 "NUTS, ADVI
and SMC heads sharing the same potential function"):

    U(theta) = -[ log p(D | theta) + log p(theta) ]

with the Poisson log-likelihood over pixels

    log p(D | lam) = sum_p [ D_p * log(lam_p) - lam_p ]        (+ const)

Parameterization (unconstrained, so every head integrates over R^d):
  theta is a (K, 3) array of per-star unconstrained params (ux, uy, s) with

    x = W * sigmoid(ux)      uniform-position prior  =>  p(ux) = sig'(ux)
    y = H * sigmoid(uy)      (log p = -softplus(ux) - softplus(-ux))
    f = exp(s)               log-normal flux prior: s ~ N(logf_mean, logf_sigma^2)

The sigmoid transform makes U smooth and bounded-domain-free — the NumPy
oracle (oracle/numpy_sampler.py) samples the *same* unconstrained density,
so posterior moments of (x, y, f) are directly comparable (SURVEY.md §3.6).

Dead catalog slots (mask == 0) contribute exactly zero to lam, U and grad U
(SURVEY.md §7.3 masked-catalog invariant; tested in tests/test_potential.py).

Analytic gradients: grad log L reduces to two matmuls against the Poisson
residual R = D/lam - 1 (SURVEY.md ③ "analytic gradients"):

    dlogL/dflux_k = mask_k *          gy_k^T R gx_k
    dlogL/dx_k    = w_k    *          gy_k^T R gx'_k
    dlogL/dy_k    = w_k    *          gy'_k^T R gx_k

`potential_and_grad` is the analytic closed form; tests cross-check it
against `jax.grad` and finite differences (SURVEY.md §4.2).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .scene import (
    SceneSpec,
    gaussian_profile_1d,
    gaussian_profile_1d_grad,
    pixel_centers,
)


class PriorSpec(NamedTuple):
    """Static prior hyperparameters.

    Positions are uniform over the image.  Flux is log-normal:
    log f ~ N(logf_mean, logf_sigma^2) — smooth and unbounded in the
    sampling space (the "log-flux prior" of SURVEY.md ②).
    """

    logf_mean: float = 2.0
    logf_sigma: float = 1.0


# ---------------------------------------------------------------------------
# Transforms
# ---------------------------------------------------------------------------

def constrain(theta: jax.Array, spec: SceneSpec):
    """Unconstrained (K,3) -> physical (x, y, flux), each (K,)."""
    x = spec.width * jax.nn.sigmoid(theta[..., 0])
    y = spec.height * jax.nn.sigmoid(theta[..., 1])
    f = jnp.exp(theta[..., 2])
    return x, y, f


def unconstrain(x: jax.Array, y: jax.Array, flux: jax.Array, spec: SceneSpec) -> jax.Array:
    """Physical -> unconstrained (K, 3).  Inverse of :func:`constrain`."""
    ux = jax.scipy.special.logit(x / spec.width)
    uy = jax.scipy.special.logit(y / spec.height)
    s = jnp.log(flux)
    return jnp.stack([ux, uy, s], axis=-1)


# ---------------------------------------------------------------------------
# Log prior (unconstrained space, per-star, masked)
# ---------------------------------------------------------------------------

def log_prior(theta: jax.Array, mask: jax.Array, prior: PriorSpec) -> jax.Array:
    """Masked log prior density of the unconstrained params.  Scalar.

    Per alive star:
      position: uniform on the image, pushed through the sigmoid ->
                density sig'(u) = sigmoid(u) * (1 - sigmoid(u)), i.e.
                log p(u) = -softplus(u) - softplus(-u)   (each of ux, uy)
      flux:     s ~ N(logf_mean, logf_sigma^2) evaluated directly in s.
    """
    u_pos = theta[..., :2]
    lp_pos = -(jax.nn.softplus(u_pos) + jax.nn.softplus(-u_pos)).sum(-1)  # (K,)
    s = theta[..., 2]
    z = (s - prior.logf_mean) / prior.logf_sigma
    lp_flux = -0.5 * z * z - jnp.log(prior.logf_sigma) - 0.5 * jnp.log(2.0 * jnp.pi)
    return jnp.sum(mask * (lp_pos + lp_flux))


def log_prior_grad(theta: jax.Array, mask: jax.Array, prior: PriorSpec) -> jax.Array:
    """Analytic d log_prior / d theta, shape (K, 3)."""
    u_pos = theta[..., :2]
    # d/du [-softplus(u) - softplus(-u)] = sigmoid(-u) - sigmoid(u) = 1 - 2*sigmoid(u)
    g_pos = 1.0 - 2.0 * jax.nn.sigmoid(u_pos)
    s = theta[..., 2]
    g_flux = -(s - prior.logf_mean) / (prior.logf_sigma**2)
    g = jnp.concatenate([g_pos, g_flux[..., None]], axis=-1)
    return g * mask[..., None]


def sample_prior(key: jax.Array, k: int, prior: PriorSpec, dtype=jnp.float32) -> jax.Array:
    """Draw k stars' unconstrained params from the prior, shape (k, 3)."""
    kp, kf = jax.random.split(key)
    u = jax.random.uniform(kp, (k, 2), dtype=dtype, minval=1e-6, maxval=1.0 - 1e-6)
    upos = jax.scipy.special.logit(u)
    s = prior.logf_mean + prior.logf_sigma * jax.random.normal(kf, (k,), dtype=dtype)
    return jnp.concatenate([upos, s[:, None]], axis=-1)


# ---------------------------------------------------------------------------
# Likelihood and potential
# ---------------------------------------------------------------------------

def _profiles_and_lam(theta: jax.Array, mask: jax.Array, spec: SceneSpec, image: jax.Array):
    x, y, f = constrain(theta, spec)
    cx = pixel_centers(spec.width, theta.dtype)
    cy = pixel_centers(spec.height, theta.dtype)
    gx = gaussian_profile_1d(x, cx, spec.psf_sigma)  # (K, W)
    gy = gaussian_profile_1d(y, cy, spec.psf_sigma)  # (K, H)
    w = f * mask
    lam = spec.background + jnp.einsum("kh,kw->hw", gy * w[:, None], gx, precision="highest")
    return x, y, f, gx, gy, w, lam


def log_likelihood(theta: jax.Array, mask: jax.Array, spec: SceneSpec, image: jax.Array) -> jax.Array:
    """Poisson log-likelihood sum_p [D_p log lam_p - lam_p] (scalar)."""
    *_, lam = _profiles_and_lam(theta, mask, spec, image)
    return jnp.sum(image * jnp.log(lam) - lam)


def make_potential(spec: SceneSpec, image: jax.Array, prior: PriorSpec):
    """Return U(theta, mask) = -(log L + log prior); closure shared by all heads."""

    def potential(theta: jax.Array, mask: jax.Array) -> jax.Array:
        return -(log_likelihood(theta, mask, spec, image) + log_prior(theta, mask, prior))

    return potential


def make_tempered_potential_and_grad(spec: SceneSpec, image: jax.Array, prior: PriorSpec):
    """Analytic (U_beta, dU_beta/dtheta) for the likelihood-tempered target

        U_beta(theta) = -[ beta * log L(theta) + log prior(theta) ]

    used by the SMC head (SURVEY.md ⑬): fn(theta, mask, beta).
    beta may be a traced scalar (the SMC temperature)."""
    pg = make_potential_and_grad(spec, image, prior)
    # U = -(ll + lp); recover the likelihood part by subtracting the prior part.

    def tempered(theta: jax.Array, mask: jax.Array, beta: jax.Array):
        u_full, g_full = pg(theta, mask)
        lp = log_prior(theta, mask, prior)
        glp = log_prior_grad(theta, mask, prior)
        ll = -(u_full) - lp
        gll = -g_full - glp
        return -(beta * ll + lp), -(beta * gll + glp)

    return tempered


def make_potential_and_grad(spec: SceneSpec, image: jax.Array, prior: PriorSpec):
    """Analytic (U, dU/dtheta) in closed form (SURVEY.md ③).

    Matmul-shaped: one render plus two residual contractions.  Matches
    jax.grad(potential) to float tolerance (tests/test_potential.py) and is
    the form the Pallas fused kernel implements.
    """
    sig2 = spec.psf_sigma * spec.psf_sigma

    def potential_and_grad(theta: jax.Array, mask: jax.Array):
        x, y, f, gx, gy, w, lam = _profiles_and_lam(theta, mask, spec, image)
        loglik = jnp.sum(image * jnp.log(lam) - lam)
        lp = log_prior(theta, mask, PriorSpec(*prior))
        resid = image / lam - 1.0  # (H, W)

        # Contractions: M = R @ gx^T -> (H, K); likewise with d/dcenter profiles.
        rgx = jnp.einsum("hw,kw->hk", resid, gx, precision="highest")                    # (H, K)
        d_flux = jnp.einsum("kh,hk->k", gy, rgx, precision="highest")            # gy_k^T R gx_k
        cx = pixel_centers(spec.width, theta.dtype)
        cy = pixel_centers(spec.height, theta.dtype)
        dgx = gx * (cx[None, :] - x[:, None]) / sig2        # (K, W)
        dgy = gy * (cy[None, :] - y[:, None]) / sig2        # (K, H)
        d_x = jnp.einsum("kh,hw,kw->k", gy, resid, dgx, precision="highest") * w
        d_y = jnp.einsum("kh,hk->k", dgy, rgx, precision="highest") * w

        # Chain rule to unconstrained coords.
        sx = jax.nn.sigmoid(theta[..., 0])
        sy = jax.nn.sigmoid(theta[..., 1])
        gl_ux = d_x * spec.width * sx * (1.0 - sx)
        gl_uy = d_y * spec.height * sy * (1.0 - sy)
        gl_s = d_flux * mask * f              # df/ds = f; flux grad carries mask
        grad_loglik = jnp.stack([gl_ux, gl_uy, gl_s], axis=-1) * mask[:, None]
        grad_logpost = grad_loglik + log_prior_grad(theta, mask, prior)
        return -(loglik + lp), -grad_logpost

    return potential_and_grad
