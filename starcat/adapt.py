"""Warmup adaptation (SURVEY.md ⑩): dual-averaging step size + diagonal
mass-matrix estimation, with cross-chain pooling.

Dual averaging follows Hoffman & Gelman (2014) §3.2 (the scheme
BASELINE.json:9 mandates for NUTS: "dual-averaging step-size adaptation").
Mass adaptation is a pooled Welford estimate of the posterior variance over
all chains × warmup draws, regularized toward a small diagonal (Stan-style
shrinkage).

Pooling across chains is a plain ``jnp.mean`` over the chain axis — under a
``NamedSharding`` that shards chains over the device mesh, XLA lowers this
to a psum-based collective automatically (SURVEY.md §5.8: pooled adaptation
is one of the only two cross-chain communication points).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class DualAveragingState(NamedTuple):
    log_eps: jax.Array      # current step size (log)
    log_eps_bar: jax.Array  # averaged iterate (use after warmup)
    h_bar: jax.Array        # running MH-error statistic
    mu: jax.Array           # shrinkage target log(10 * eps0)
    t: jax.Array            # iteration counter (float)


def da_init(eps0: float) -> DualAveragingState:
    z = jnp.asarray(0.0, jnp.float32)
    return DualAveragingState(
        log_eps=jnp.log(jnp.asarray(eps0, jnp.float32)),
        log_eps_bar=z,
        h_bar=z,
        mu=jnp.log(10.0 * jnp.asarray(eps0, jnp.float32)),
        t=z,
    )


def da_update(
    state: DualAveragingState,
    accept_prob: jax.Array,
    target: float = 0.8,
    gamma: float = 0.05,
    t0: float = 10.0,
    kappa: float = 0.75,
) -> DualAveragingState:
    """One dual-averaging update from the (pooled) acceptance probability."""
    t = state.t + 1.0
    eta_h = 1.0 / (t + t0)
    h_bar = (1.0 - eta_h) * state.h_bar + eta_h * (target - accept_prob)
    log_eps = state.mu - jnp.sqrt(t) / gamma * h_bar
    eta = t ** (-kappa)
    log_eps_bar = eta * log_eps + (1.0 - eta) * state.log_eps_bar
    return DualAveragingState(log_eps, log_eps_bar, h_bar, state.mu, t)


def da_restart(state: DualAveragingState) -> DualAveragingState:
    """Reset the averaging (used when the mass matrix changes mid-warmup),
    keeping the current step size as the new starting point."""
    eps0 = jnp.exp(state.log_eps_bar)
    z = jnp.zeros_like(state.h_bar)
    return DualAveragingState(
        log_eps=jnp.log(eps0),
        log_eps_bar=z,
        h_bar=z,
        mu=jnp.log(10.0 * eps0),
        t=z,
    )


class WelfordState(NamedTuple):
    mean: jax.Array   # running mean, param-shaped
    m2: jax.Array     # sum of squared deviations
    count: jax.Array  # scalar float


def welford_init(shape) -> WelfordState:
    return WelfordState(
        mean=jnp.zeros(shape, jnp.float32),
        m2=jnp.zeros(shape, jnp.float32),
        count=jnp.asarray(0.0, jnp.float32),
    )


def welford_update_batch(state: WelfordState, x: jax.Array) -> WelfordState:
    """Merge a batch of samples x with leading batch axis (the chain axis).

    Chan et al. parallel-variance merge: pooled over chains in one update,
    so the same code runs vmapped/sharded (batch mean/var lower to
    collectives under sharding).
    """
    nb = jnp.asarray(x.shape[0], jnp.float32)
    mb = x.mean(axis=0)
    m2b = ((x - mb) ** 2).sum(axis=0)
    delta = mb - state.mean
    tot = state.count + nb
    mean = state.mean + delta * (nb / jnp.maximum(tot, 1.0))
    m2 = state.m2 + m2b + delta**2 * (state.count * nb / jnp.maximum(tot, 1.0))
    return WelfordState(mean, m2, tot)


def welford_variance(state: WelfordState, reg: float = 1e-3) -> jax.Array:
    """Regularized variance estimate -> inverse mass matrix diagonal.

    Stan-style shrinkage toward a small identity: keeps the mass PD when
    warmup is short or a coordinate barely moved.
    """
    n = jnp.maximum(state.count, 2.0)
    var = state.m2 / (n - 1.0)
    w = n / (n + 5.0)
    return w * var + (1.0 - w) * reg
