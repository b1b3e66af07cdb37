"""HMC head (SURVEY.md ⑦⑫): vmapped chains, pooled warmup adaptation.

Design (SURVEY.md §3.3): the per-chain transition kernel is written for a
single chain and ``vmap``-ed over the chain axis; the whole warmup/sampling
loop is a ``lax.scan`` inside one ``jit``, so control crosses the
host→device boundary once per phase.  Chain-axis reductions (pooled
acceptance statistics for dual averaging, pooled Welford moments for the
mass matrix) are plain means over the chain axis, which XLA lowers to
collectives when the chain axis is sharded over a mesh (parallel/dist.py).

Warmup schedule (three compiled phases, Stan-like):
  phase 1 (15%):  step-size adaptation only, unit mass
  phase 2 (60%):  step-size adaptation + pooled Welford variance accumulation
  phase 3 (25%):  mass set from phase 2, dual averaging restarted
Sampling runs at eps = exp(log_eps_bar) with the adapted mass.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from .adapt import (
    DualAveragingState,
    WelfordState,
    da_init,
    da_restart,
    da_update,
    welford_init,
    welford_update_batch,
    welford_variance,
)
from .integrators import leapfrog


class HMCConfig(NamedTuple):
    step_size: float = 0.1
    n_leapfrog: int = 20
    target_accept: float = 0.8
    divergence_threshold: float = 1000.0


class ChainState(NamedTuple):
    theta: jax.Array  # (K, 3) unconstrained params
    u: jax.Array      # potential at theta
    grad: jax.Array   # dU/dtheta
    key: jax.Array    # per-chain PRNG key


class StepInfo(NamedTuple):
    accept_prob: jax.Array
    accepted: jax.Array
    diverged: jax.Array
    energy_error: jax.Array


def init_chain_state(key: jax.Array, theta0: jax.Array, grad_fn: Callable) -> ChainState:
    u, g = grad_fn(theta0)
    return ChainState(theta0, u, g, key)


def hmc_step(
    state: ChainState,
    grad_fn: Callable,
    eps: jax.Array,
    inv_mass: jax.Array,
    n_leapfrog: int,
    mask: jax.Array,
    divergence_threshold: float = 1000.0,
):
    """One HMC transition for a single chain (vmap over chains outside).

    ``mask`` freezes dead catalog slots: their momentum is zeroed so
    masked coordinates never move (SURVEY.md §7.3).
    """
    key, k_mom, k_acc, k_jit = jax.random.split(state.key, 4)
    mask3 = mask[..., None]

    # Per-chain step-size jitter (+-20%) breaks the near-periodic resonance
    # of fixed-length trajectories on well-conditioned targets (without it,
    # R-hat stalls ~1.2 on the single-star scene even at accept ~0.9).
    eps = eps * (0.8 + 0.4 * jax.random.uniform(k_jit))

    p0 = jax.random.normal(k_mom, state.theta.shape, state.theta.dtype)
    p0 = p0 / jnp.sqrt(inv_mass) * mask3
    h0 = state.u + 0.5 * jnp.sum(inv_mass * p0 * p0)

    res = leapfrog(
        grad_fn, state.theta, p0, state.u, state.grad, eps, n_leapfrog, inv_mass
    )
    h1 = res.u + 0.5 * jnp.sum(inv_mass * res.p * res.p)
    energy_error = h1 - h0
    # NaN-safe: divergent / non-finite trajectories are rejected, not propagated.
    energy_error = jnp.where(jnp.isfinite(energy_error), energy_error, jnp.inf)
    accept_prob = jnp.exp(jnp.minimum(0.0, -energy_error))
    diverged = energy_error > divergence_threshold

    accept = jax.random.uniform(k_acc) < accept_prob
    theta = jnp.where(accept, res.theta, state.theta)
    u = jnp.where(accept, res.u, state.u)
    grad = jnp.where(accept, res.grad, state.grad)

    new_state = ChainState(theta, u, grad, key)
    info = StepInfo(accept_prob, accept, diverged, energy_error)
    return new_state, info


def _batch_step(states, grad_fn, eps, inv_mass, n_leapfrog, mask, div_thresh):
    return jax.vmap(
        lambda s: hmc_step(s, grad_fn, eps, inv_mass, n_leapfrog, mask, div_thresh)
    )(states)


class WarmupResult(NamedTuple):
    states: ChainState
    step_size: jax.Array
    inv_mass: jax.Array
    mean_accept: jax.Array


@partial(jax.jit, static_argnames=("grad_fn", "n_leapfrog", "n_warmup", "adapt_mass"))
def warmup(
    states: ChainState,
    grad_fn: Callable,
    mask: jax.Array,
    n_warmup: int,
    step_size: float = 0.1,
    n_leapfrog: int = 20,
    target_accept: float = 0.8,
    adapt_mass: bool = True,
    divergence_threshold: float = 1000.0,
) -> WarmupResult:
    """Three-phase pooled warmup; returns adapted states, eps, inv_mass."""
    n1 = max(n_warmup * 15 // 100, 1)
    n3 = max(n_warmup * 25 // 100, 1)
    n2 = max(n_warmup - n1 - n3, 1)
    param_shape = states.theta.shape[1:]

    def make_phase(accumulate: bool, n_steps: int):
        def body(carry, _):
            st, da, wf, inv_mass = carry
            eps = jnp.exp(da.log_eps)
            st, info = _batch_step(
                st, grad_fn, eps, inv_mass, n_leapfrog, mask, divergence_threshold
            )
            # pooled over chains -> collective under sharding
            da = da_update(da, jnp.mean(info.accept_prob), target=target_accept)
            if accumulate:
                wf = welford_update_batch(wf, st.theta)
            return (st, da, wf, inv_mass), None

        def run(st, da, wf, inv_mass):
            (st, da, wf, inv_mass), _ = jax.lax.scan(
                body, (st, da, wf, inv_mass), None, length=n_steps
            )
            return st, da, wf, inv_mass

        return run

    da = da_init(step_size)
    wf = welford_init(param_shape)
    inv_mass = jnp.ones(param_shape, jnp.float32)

    st, da, wf, inv_mass = make_phase(False, n1)(states, da, wf, inv_mass)
    st, da, wf, inv_mass = make_phase(adapt_mass, n2)(st, da, wf, inv_mass)
    if adapt_mass:
        inv_mass = welford_variance(wf)
        da = da_restart(da)
    st, da, wf, inv_mass = make_phase(False, n3)(st, da, wf, inv_mass)

    eps = jnp.exp(da.log_eps_bar)
    return WarmupResult(st, eps, inv_mass, jnp.asarray(0.0))


class SampleResult(NamedTuple):
    thetas: jax.Array        # (n_chains, n_samples, K, 3)
    accept_prob: jax.Array   # (n_chains, n_samples)
    diverged: jax.Array      # (n_chains, n_samples)
    final_states: ChainState


@partial(jax.jit, static_argnames=("grad_fn", "n_leapfrog", "n_samples"))
def sample(
    states: ChainState,
    grad_fn: Callable,
    mask: jax.Array,
    n_samples: int,
    step_size: jax.Array,
    inv_mass: jax.Array,
    n_leapfrog: int = 20,
    divergence_threshold: float = 1000.0,
) -> SampleResult:
    """Post-warmup sampling: fixed eps/mass, collects draws on-device."""

    def body(st, _):
        st, info = _batch_step(
            st, grad_fn, step_size, inv_mass, n_leapfrog, mask, divergence_threshold
        )
        return st, (st.theta, info.accept_prob, info.diverged)

    st, (thetas, aprob, div) = jax.lax.scan(body, states, None, length=n_samples)
    # (n_samples, C, ...) -> (C, n_samples, ...)
    thetas = jnp.moveaxis(thetas, 0, 1)
    return SampleResult(thetas, aprob.T, div.T, st)


def run_hmc(
    key: jax.Array,
    grad_fn: Callable,
    theta0: jax.Array,  # (n_chains, K, 3)
    mask: jax.Array,    # (K,)
    n_samples: int,
    n_warmup: int,
    config: HMCConfig = HMCConfig(),
    adapt_mass: bool = True,
):
    """Convenience driver: init -> warmup -> sample (SURVEY.md §3.3)."""
    n_chains = theta0.shape[0]
    keys = jax.random.split(key, n_chains)
    states = jax.vmap(lambda k, t: init_chain_state(k, t, grad_fn))(keys, theta0)
    wr = warmup(
        states,
        grad_fn,
        mask,
        n_warmup,
        step_size=config.step_size,
        n_leapfrog=config.n_leapfrog,
        target_accept=config.target_accept,
        adapt_mass=adapt_mass,
        divergence_threshold=config.divergence_threshold,
    )
    return sample(
        wr.states,
        grad_fn,
        mask,
        n_samples,
        wr.step_size,
        wr.inv_mass,
        n_leapfrog=config.n_leapfrog,
        divergence_threshold=config.divergence_threshold,
    ), wr
