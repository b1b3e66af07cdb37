"""Symplectic integrators (SURVEY.md ⑤⑥): velocity-Verlet leapfrog and the
generalized (implicit) Riemannian leapfrog.

Both integrators are expressed as ``lax.scan`` bodies with static trip
counts — no data-dependent Python control flow — so they jit, vmap over
thousands of chains, and shard over device meshes unchanged (SURVEY.md §7.3
"RHMC integrator inside vmap/jit": the implicit fixed-point iterations run a
FIXED number of sweeps; divergences are detected by energy error and
rejected by the MH step, never allowed to NaN the batch).

The gradient callable has signature grad_fn(theta) -> (U, dU/dtheta) so one
closure (potential.make_potential_and_grad, or jax.value_and_grad of the
potential) serves every head.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class LeapfrogResult(NamedTuple):
    theta: jax.Array
    p: jax.Array
    u: jax.Array      # potential at final theta
    grad: jax.Array   # gradient at final theta


def leapfrog(
    grad_fn: Callable,
    theta: jax.Array,
    p: jax.Array,
    u: jax.Array,
    grad: jax.Array,
    eps: jax.Array,
    n_steps: int,
    inv_mass: jax.Array,
) -> LeapfrogResult:
    """n_steps of velocity-Verlet with diagonal (inverse) mass matrix.

    Reuses the cached gradient at the initial point, so the cost is exactly
    ``n_steps`` fresh gradient evaluations (the hot-loop unit the benchmark
    counts, BASELINE.json:2 "leapfrog grad-evals/sec/chip").
    """

    def step(carry, _):
        theta, p, _, grad = carry
        p_half = p - 0.5 * eps * grad
        theta_new = theta + eps * inv_mass * p_half
        u_new, grad_new = grad_fn(theta_new)
        p_new = p_half - 0.5 * eps * grad_new
        return (theta_new, p_new, u_new, grad_new), None

    (theta, p, u, grad), _ = jax.lax.scan(
        step, (theta, p, u, grad), None, length=n_steps
    )
    return LeapfrogResult(theta, p, u, grad)


def kinetic_energy(p: jax.Array, inv_mass: jax.Array) -> jax.Array:
    return 0.5 * jnp.sum(inv_mass * p * p)


# ---------------------------------------------------------------------------
# Generalized (implicit) Riemannian leapfrog — Girolami & Calderhead 2011,
# with fixed-sweep fixed-point solves (SURVEY.md ⑥; P:7, P:9).
# ---------------------------------------------------------------------------

class RiemannianLeapfrogResult(NamedTuple):
    theta: jax.Array
    p: jax.Array


def riemannian_leapfrog(
    dH_dtheta: Callable,  # (theta, p) -> dH/dtheta   (includes U, logdet, quad terms)
    dH_dp: Callable,      # (theta, p) -> dH/dp = G(theta)^{-1} p
    theta: jax.Array,
    p: jax.Array,
    eps: jax.Array,
    n_steps: int,
    fixed_point_iters: int = 6,
) -> RiemannianLeapfrogResult:
    """Generalized leapfrog for the non-separable Riemannian Hamiltonian

        H(theta, p) = U(theta) + 1/2 log det G(theta) + 1/2 p^T G(theta)^-1 p

    Each step solves two implicit equations by ``fixed_point_iters`` Picard
    sweeps (static count — vmap/jit-safe):

        p_half    = p      - eps/2 * dH/dtheta(theta,  p_half)
        theta_new = theta  + eps/2 * [dH/dp(theta, p_half) + dH/dp(theta_new, p_half)]
        p_new     = p_half - eps/2 * dH/dtheta(theta_new, p_half)
    """

    def fp(f, x0):
        def body(_, x):
            return f(x)
        return jax.lax.fori_loop(0, fixed_point_iters, body, x0)

    def step(carry, _):
        theta, p = carry
        p_half = fp(lambda ph: p - 0.5 * eps * dH_dtheta(theta, ph), p)
        v0 = dH_dp(theta, p_half)
        theta_new = fp(
            lambda th: theta + 0.5 * eps * (v0 + dH_dp(th, p_half)),
            theta + eps * v0,
        )
        p_new = p_half - 0.5 * eps * dH_dtheta(theta_new, p_half)
        return (theta_new, p_new), None

    (theta, p), _ = jax.lax.scan(step, (theta, p), None, length=n_steps)
    return RiemannianLeapfrogResult(theta, p)


class ExplicitRiemannianResult(NamedTuple):
    theta: jax.Array
    p: jax.Array
    theta_tilde: jax.Array
    p_tilde: jax.Array


def explicit_riemannian_leapfrog(
    dH_dtheta: Callable,
    dH_dp: Callable,
    theta: jax.Array,
    p: jax.Array,
    eps: jax.Array,
    n_steps: int,
    omega: float = 10.0,
) -> ExplicitRiemannianResult:
    """Explicit symplectic integrator for non-separable Hamiltonians —
    Tao (2016) phase-space doubling as applied to RMHMC by Cobb et al. 2019
    (PAPERS.md "Introducing an Explicit Symplectic Integration Scheme for
    Riemannian Manifold HMC"; SURVEY.md ⑥ recommends it as primary).

    Extended Hamiltonian on the doubled space (copies start identical):

        Hbar = H(theta, p~) + H(theta~, p) + omega/2 (|dθ|^2 + |dp|^2)

    One step is the Strang splitting  A(e/2) B(e/2) C(e) B(e/2) A(e/2):
      A: p      -= e/2 dH/dθ(θ, p~);   θ~ += e/2 dH/dp(θ, p~)
      B: θ      += e/2 dH/dp(θ~, p);   p~ -= e/2 dH/dθ(θ~, p)
      C: exact rotation of (θ-θ~, p-p~) by angle 2*omega*e
    Every sub-map is explicit — no fixed-point iterations, hence no
    solver-divergence failures (the implicit scheme's failure mode) and
    only 4 metric/gradient evaluations per step.
    """

    def a_half(q, pq, qt, pt, e):
        g = dH_dtheta(q, pt)
        v = dH_dp(q, pt)
        return q, pq - e * g, qt + e * v, pt

    def b_half(q, pq, qt, pt, e):
        g = dH_dtheta(qt, pq)
        v = dH_dp(qt, pq)
        return q + e * v, pq, qt, pt - e * g

    def c_full(q, pq, qt, pt, e):
        ang = 2.0 * omega * e
        c, s = jnp.cos(ang), jnp.sin(ang)
        dq, dp = q - qt, pq - pt
        sq, sp = q + qt, pq + pt
        dq2 = c * dq + s * dp
        dp2 = -s * dq + c * dp
        return (
            0.5 * (sq + dq2), 0.5 * (sp + dp2),
            0.5 * (sq - dq2), 0.5 * (sp - dp2),
        )

    def step(carry, _):
        q, pq, qt, pt = carry
        q, pq, qt, pt = a_half(q, pq, qt, pt, 0.5 * eps)
        q, pq, qt, pt = b_half(q, pq, qt, pt, 0.5 * eps)
        q, pq, qt, pt = c_full(q, pq, qt, pt, eps)
        q, pq, qt, pt = b_half(q, pq, qt, pt, 0.5 * eps)
        q, pq, qt, pt = a_half(q, pq, qt, pt, 0.5 * eps)
        return (q, pq, qt, pt), None

    (q, pq, qt, pt), _ = jax.lax.scan(
        step, (theta, p, theta, p), None, length=n_steps
    )
    return ExplicitRiemannianResult(q, pq, qt, pt)
