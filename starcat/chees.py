"""ChEES-HMC head: jittered HMC with adaptive trajectory length.

Hoffman, Radul & Sountsov (2021) "An Adaptive-MCMC Scheme for Setting
Trajectory Lengths in Hamiltonian Monte Carlo" (the ChEES criterion; see
also PAPERS.md "Incorporating the ChEES Criterion into SMC").  SURVEY.md
§7.3 flags it as the TPU-friendlier alternative to NUTS: every chain runs
the SAME number of leapfrog steps per iteration (no per-chain tree
control flow), so chains stay in lockstep on the VPU/MXU and the batch
wastes no work on ragged trajectories.

Criterion: maximize  ChEES(T) = E[ (|θ' − μ'|² − |θ − μ|²)² ] / 4  over
trajectory length T, by Adam ascent on log T using the per-iteration
gradient estimator

    g = Σ_c a_c Δ_c (θ'_c − μ')·v'_c / Σ_c a_c,     d/dlogT ≈ g · t

with a_c the MH acceptance probabilities, v' the final velocities, and the
trajectory jittered as t = u_i T with u_i the base-2 Halton sequence
(shared across chains each iteration).  Chain-pooled means μ, μ' lower to
collectives when the chain axis is sharded (SURVEY.md §5.8).

Step size adapts by dual averaging, diagonal mass by pooled Welford — the
same three-phase schedule as driver.warmup, implemented here inline since
the trajectory-length state is ChEES-specific.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from .adapt import (
    da_init,
    da_restart,
    da_update,
    welford_init,
    welford_update_batch,
    welford_variance,
)
from .driver import ChainState, SampleResult, init_chain_states


class ChEESConfig(NamedTuple):
    step_size: float = 0.1
    traj_length: float = 1.0        # initial trajectory length T
    target_accept: float = 0.75
    adam_lr: float = 0.025
    max_leapfrog: int = 1024        # hard cap on steps per iteration
    divergence_threshold: float = 1000.0


class ChEESInfo(NamedTuple):
    accept_prob: jax.Array
    diverged: jax.Array
    n_leapfrog: jax.Array
    traj_length: jax.Array


def _halton2(i: jax.Array) -> jax.Array:
    """Base-2 radical inverse of i (16 bits) in (0, 1)."""
    bits = jnp.arange(16)
    digits = (i[..., None] >> bits) & 1
    return jnp.sum(digits * 0.5 ** (bits + 1.0), axis=-1) + 2.0**-17


def _batched_leapfrog(grad_fn, theta, p, u, grad, eps, n_steps, inv_mass):
    """All chains advance n_steps (traced scalar) in lockstep."""

    def body(i, carry):
        theta, p, u, grad = carry
        p_half = p - 0.5 * eps * grad
        theta = theta + eps * inv_mass * p_half
        u, grad = jax.vmap(grad_fn)(theta)
        p = p_half - 0.5 * eps * grad
        return theta, p, u, grad

    return jax.lax.fori_loop(0, n_steps, body, (theta, p, u, grad))


def _chees_iteration(
    states: ChainState, grad_fn, eps, inv_mass, mask, u_jit, traj_length,
    max_leapfrog: int, div_threshold: float, leapfrog_impl=None,
):
    """One jittered-HMC sweep over all chains; returns ChEES grad wrt logT.

    leapfrog_impl: optional fused trajectory implementation with signature
    (theta, p, u, grad, eps, n_steps, inv_mass, mask) -> (theta, p, u, grad)
    — the runtime-trip-count Pallas kernel (make_fused_leapfrog_impl); the
    default is the XLA lockstep loop.
    """
    n_chains = states.theta.shape[0]
    mask3 = mask[..., None]
    keys = jax.vmap(lambda k: jax.random.split(k, 3))(states.key)
    key, k_mom, k_acc = keys[:, 0], keys[:, 1], keys[:, 2]

    t = u_jit * traj_length
    n_steps = jnp.clip(jnp.ceil(t / eps).astype(jnp.int32), 1, max_leapfrog)

    p0 = jax.vmap(lambda k, th: jax.random.normal(k, th.shape, th.dtype))(
        k_mom, states.theta
    )
    p0 = p0 / jnp.sqrt(inv_mass) * mask3
    h0 = states.u + 0.5 * jnp.sum(inv_mass * p0 * p0, axis=(1, 2))

    if leapfrog_impl is None:
        theta_n, p_n, u_n, grad_n = _batched_leapfrog(
            grad_fn, states.theta, p0, states.u, states.grad, eps, n_steps,
            inv_mass
        )
    else:
        theta_n, p_n, u_n, grad_n = leapfrog_impl(
            states.theta, p0, states.u, states.grad, eps, n_steps, inv_mass,
            mask
        )
    h1 = u_n + 0.5 * jnp.sum(inv_mass * p_n * p_n, axis=(1, 2))
    e_err = jnp.where(jnp.isfinite(h1 - h0), h1 - h0, jnp.inf)
    accept_prob = jnp.exp(jnp.minimum(0.0, -e_err))
    diverged = e_err > div_threshold

    accept = jax.vmap(jax.random.uniform)(k_acc) < accept_prob
    acc3 = accept[:, None, None]
    theta = jnp.where(acc3, theta_n, states.theta)
    u = jnp.where(accept, u_n, states.u)
    grad = jnp.where(acc3, grad_n, states.grad)

    # ChEES gradient estimator (pooled means -> collectives when sharded)
    mu0 = jnp.mean(states.theta, axis=0, keepdims=True)
    mu1 = jnp.mean(theta_n, axis=0, keepdims=True)
    dsq = (jnp.sum((theta_n - mu1) ** 2, axis=(1, 2))
           - jnp.sum((states.theta - mu0) ** 2, axis=(1, 2)))
    v_n = inv_mass * p_n
    proj = jnp.sum((theta_n - mu1) * v_n, axis=(1, 2))
    w = accept_prob
    g_t = jnp.sum(w * dsq * proj) / jnp.maximum(jnp.sum(w), 1e-6)
    g_logT = g_t * t  # chain rule through t = u_jit * T

    new_states = ChainState(theta, u, grad, key)
    info = ChEESInfo(accept_prob, diverged, n_steps, traj_length)
    return new_states, info, g_logT


class _AdamState(NamedTuple):
    m: jax.Array
    v: jax.Array
    t: jax.Array


def _adam_update(st: _AdamState, g, lr, b1=0.9, b2=0.999, eps=1e-8):
    t = st.t + 1.0
    m = b1 * st.m + (1 - b1) * g
    v = b2 * st.v + (1 - b2) * g * g
    mh = m / (1 - b1**t)
    vh = v / (1 - b2**t)
    return _AdamState(m, v, t), lr * mh / (jnp.sqrt(vh) + eps)


def make_fused_leapfrog_impl(spec, image, prior, kmax: int,
                             interpret: bool = False):
    """Trajectory impl for _chees_iteration on the runtime-trip-count fused
    Pallas kernel (pallas_kernels.make_pallas_leapfrog_dyn): the adapted
    n_steps is a traced scalar in SMEM, so ChEES keeps one compiled kernel
    across all trajectory lengths.  n_chains % 128 == 0 (lane tile)."""
    from .pallas_kernels import make_pallas_leapfrog_dyn

    fused = make_pallas_leapfrog_dyn(spec, image, prior, kmax,
                                     interpret=interpret)

    def impl(theta, p, u, grad, eps, n_steps, inv_mass, mask):
        return fused(theta, p, eps, inv_mass, mask, n_steps, grad)

    return impl


@partial(jax.jit, static_argnames=("grad_fn", "n_warmup", "n_samples",
                                   "config", "leapfrog_impl"))
def _run_chees_jit(
    states: ChainState,
    grad_fn: Callable,
    mask: jax.Array,
    n_warmup: int,
    n_samples: int,
    config: ChEESConfig,
    leapfrog_impl=None,
):
    param_shape = states.theta.shape[1:]
    n1 = max(n_warmup * 15 // 100, 1)
    n3 = max(n_warmup * 25 // 100, 1)
    n2 = max(n_warmup - n1 - n3, 1)

    def warm_phase(accumulate: bool, n_steps: int, offset: int):
        def body(carry, i):
            st, da, wf, inv_mass, log_T, adam = carry
            eps = jnp.exp(da.log_eps)
            st, info, g_logT = _chees_iteration(
                st, grad_fn, eps, inv_mass, mask, _halton2(i), jnp.exp(log_T),
                config.max_leapfrog, config.divergence_threshold,
                leapfrog_impl,
            )
            da = da_update(da, jnp.mean(info.accept_prob), target=config.target_accept)
            adam, delta = _adam_update(adam, g_logT, config.adam_lr)
            log_T = log_T + delta  # ascent
            if accumulate:
                wf = welford_update_batch(wf, st.theta)
            return (st, da, wf, inv_mass, log_T, adam), None

        def run(st, da, wf, inv_mass, log_T, adam):
            (st, da, wf, inv_mass, log_T, adam), _ = jax.lax.scan(
                body, (st, da, wf, inv_mass, log_T, adam),
                jnp.arange(offset, offset + n_steps),
            )
            return st, da, wf, inv_mass, log_T, adam

        return run

    da = da_init(config.step_size)
    wf = welford_init(param_shape)
    inv_mass = jnp.ones(param_shape, jnp.float32)
    log_T = jnp.log(jnp.asarray(config.traj_length, jnp.float32))
    adam = _AdamState(jnp.zeros(()), jnp.zeros(()), jnp.zeros(()))

    st, da, wf, inv_mass, log_T, adam = warm_phase(False, n1, 0)(
        states, da, wf, inv_mass, log_T, adam
    )
    st, da, wf, inv_mass, log_T, adam = warm_phase(True, n2, n1)(
        st, da, wf, inv_mass, log_T, adam
    )
    inv_mass = welford_variance(wf)
    da = da_restart(da)
    st, da, wf, inv_mass, log_T, adam = warm_phase(False, n3, n1 + n2)(
        st, da, wf, inv_mass, log_T, adam
    )

    eps = jnp.exp(da.log_eps_bar)
    traj = jnp.exp(log_T)

    def sample_body(carry, i):
        st = carry
        st, info, _ = _chees_iteration(
            st, grad_fn, eps, inv_mass, mask, _halton2(i), traj,
            config.max_leapfrog, config.divergence_threshold,
            leapfrog_impl,
        )
        return st, (st.theta, info.accept_prob, info.diverged)

    st, (thetas, aprob, div) = jax.lax.scan(
        sample_body, st, jnp.arange(n_warmup, n_warmup + n_samples)
    )
    res = SampleResult(jnp.moveaxis(thetas, 0, 1), aprob.T, div.T, st)
    return res, eps, inv_mass, traj


@partial(jax.jit, static_argnames=("grad_fn", "n_samples", "config",
                                   "leapfrog_impl"))
def chees_sample(
    states: ChainState,
    grad_fn: Callable,
    mask: jax.Array,
    n_samples: int,
    eps: jax.Array,
    inv_mass: jax.Array,
    traj: jax.Array,
    config: ChEESConfig = ChEESConfig(),
    leapfrog_impl=None,
) -> SampleResult:
    """Sampling-only leg at fixed adapted (eps, inv_mass, T) — continuation
    from run_chees's final state (also the bench's timed leg)."""

    def body(st, i):
        st, info, _ = _chees_iteration(
            st, grad_fn, eps, inv_mass, mask, _halton2(i), traj,
            config.max_leapfrog, config.divergence_threshold, leapfrog_impl,
        )
        return st, (st.theta, info.accept_prob, info.diverged)

    st, (thetas, aprob, div) = jax.lax.scan(
        body, states, jnp.arange(n_samples)
    )
    return SampleResult(jnp.moveaxis(thetas, 0, 1), aprob.T, div.T, st)


def run_chees(
    key: jax.Array,
    grad_fn: Callable,
    theta0: jax.Array,  # (n_chains, K, 3)
    mask: jax.Array,
    n_samples: int,
    n_warmup: int,
    config: ChEESConfig = ChEESConfig(),
    leapfrog_impl=None,
):
    """init -> warmup (eps/mass/T adaptation) -> jittered sampling.

    leapfrog_impl: pass make_fused_leapfrog_impl(...) to run trajectories
    on the runtime-trip-count fused Pallas kernel (TPU fast path)."""
    states = init_chain_states(key, theta0, grad_fn)
    res, eps, inv_mass, traj = _run_chees_jit(
        states, grad_fn, mask, n_warmup, n_samples, config, leapfrog_impl
    )
    return res, {"step_size": eps, "inv_mass": inv_mass, "traj_length": traj}
