"""NUTS head (SURVEY.md ⑨; BASELINE.json:9): iterative, jit/vmap-safe
No-U-Turn sampler with fixed max depth and multinomial trajectory sampling.

Recursion-free design (SURVEY.md §7.3 "NUTS without recursion"):
the doubling loop and the subtree build are ``lax.while_loop``s with
data-dependent termination but statically bounded state.  U-turn checks
inside a subtree use the O(max_depth) *checkpoint* scheme: a leaf with
index i (0-based, in generation order) ends one balanced subtree of size
2^k for every k <= t(i), where t(i) is the number of trailing one-bits of
i; the partner leaf i - 2^k + 1 of each such subtree is an even-index leaf
previously stored at checkpoint slot popcount(i) - k.  Hence:

    even i : store (theta, v) at slot popcount(i)
    odd  i : check u-turn against slots [popcount(i) - t(i), popcount(i>>1)]

(the slot range is contiguous — derivation in the subtree builder below;
verified against a recursive reference in tests/test_nuts.py).

Trajectory sampling is progressive multinomial within a subtree and biased
progressive (min(1, W_new/W_old)) across doublings, Betancourt (2017).
Time-orientation: backward subtrees (eps < 0) generate leaves in reverse
time order, so u-turn inner products are sign-corrected to time order.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from .driver import ChainState, run_mcmc


class NUTSConfig(NamedTuple):
    step_size: float = 0.1
    max_depth: int = 8
    target_accept: float = 0.8
    divergence_threshold: float = 1000.0


class _Z(NamedTuple):
    """One phase-space point with cached potential/gradient."""

    theta: jax.Array
    p: jax.Array
    u: jax.Array
    grad: jax.Array


class NUTSInfo(NamedTuple):
    accept_prob: jax.Array   # mean MH statistic over visited leaves (for DA)
    diverged: jax.Array
    depth: jax.Array         # tree depth reached
    n_leaves: jax.Array      # leapfrog steps taken


def _energy(z: _Z, inv_mass) -> jax.Array:
    return z.u + 0.5 * jnp.sum(inv_mass * z.p * z.p)


def _leapfrog_one(grad_fn, z: _Z, eps, inv_mass) -> _Z:
    p_half = z.p - 0.5 * eps * z.grad
    theta = z.theta + eps * inv_mass * p_half
    u, g = grad_fn(theta)
    p = p_half - 0.5 * eps * g
    return _Z(theta, p, u, g)


def _select(pred, a, b):
    return jax.tree.map(lambda x, y: jnp.where(pred, x, y), a, b)


def _popcount(i):
    return jax.lax.population_count(i)


class _SubtreeResult(NamedTuple):
    z_edge: _Z
    z_prop: _Z
    log_sum_w: jax.Array
    sum_acc: jax.Array
    n_leaves: jax.Array
    turning: jax.Array
    diverging: jax.Array


def _build_subtree(
    key, z_start: _Z, depth, eps_signed, inv_mass, h0, grad_fn,
    max_depth: int, div_threshold: float,
):
    """Build 2^depth new leaves from z_start in direction sign(eps_signed)."""
    n_leaf = jnp.left_shift(1, depth)
    sign = jnp.sign(eps_signed)
    shape = z_start.theta.shape
    neg_inf = jnp.asarray(-jnp.inf, jnp.float32)

    ckpt_theta0 = jnp.zeros((max_depth,) + shape, z_start.theta.dtype)
    ckpt_v0 = jnp.zeros_like(ckpt_theta0)

    def cond(c):
        i, turning, diverging = c[0], c[-2], c[-1]
        return (i < n_leaf) & ~turning & ~diverging

    def body(c):
        (i, key, z, z_prop, log_sum_w, sum_acc, ckpt_theta, ckpt_v,
         turning, diverging) = c
        z_new = _leapfrog_one(grad_fn, z, eps_signed, inv_mass)
        h = _energy(z_new, inv_mass)
        delta = jnp.where(jnp.isfinite(h), h - h0, jnp.inf)
        diverging = delta > div_threshold
        log_w = -delta  # = h0 - h, -inf for divergent/NaN leaves
        log_sum_w_new = jnp.logaddexp(log_sum_w, log_w)
        key, ku = jax.random.split(key)
        take = jnp.log(jax.random.uniform(ku)) < (log_w - log_sum_w_new)
        z_prop = _select(take, z_new, z_prop)
        sum_acc = sum_acc + jnp.exp(jnp.minimum(0.0, log_w))

        v_new = inv_mass * z_new.p
        # checkpoint store (even i)
        is_even = (i & 1) == 0
        slot = _popcount(i)
        ckpt_theta = jnp.where(is_even, ckpt_theta.at[slot].set(z_new.theta), ckpt_theta)
        ckpt_v = jnp.where(is_even, ckpt_v.at[slot].set(v_new), ckpt_v)

        # u-turn checks (odd i): slots [popcount(i)-t, popcount(i>>1)]
        t = _popcount(((i + 1) & -(i + 1)) - 1)  # trailing ones of i
        idx_min = _popcount(i) - t
        idx_max = _popcount(i >> 1)

        def check(s, turn):
            active = (s >= idx_min) & (s <= idx_max) & (t > 0)
            dtheta = sign * (z_new.theta - ckpt_theta[s])  # time-ordered
            turn_s = (jnp.sum(dtheta * ckpt_v[s]) < 0) | (jnp.sum(dtheta * v_new) < 0)
            return turn | (active & turn_s)

        turning = jax.lax.fori_loop(0, max_depth, check, turning)
        return (i + 1, key, z_new, z_prop, log_sum_w_new, sum_acc,
                ckpt_theta, ckpt_v, turning, diverging)

    init = (
        jnp.asarray(0, jnp.int32), key, z_start, z_start, neg_inf,
        jnp.asarray(0.0, jnp.float32), ckpt_theta0, ckpt_v0,
        jnp.asarray(False), jnp.asarray(False),
    )
    (i, _, z_edge, z_prop, log_sum_w, sum_acc, _, _, turning, diverging) = (
        jax.lax.while_loop(cond, body, init)
    )
    return _SubtreeResult(z_edge, z_prop, log_sum_w, sum_acc, i, turning, diverging)


def nuts_step(
    state: ChainState,
    grad_fn: Callable,
    eps: jax.Array,
    inv_mass: jax.Array,
    mask: jax.Array,
    max_depth: int = 8,
    divergence_threshold: float = 1000.0,
):
    """One NUTS transition for a single chain (vmap over chains in driver)."""
    key, k_mom = jax.random.split(state.key)
    mask3 = mask[..., None]
    p0 = jax.random.normal(k_mom, state.theta.shape, state.theta.dtype)
    p0 = p0 / jnp.sqrt(inv_mass) * mask3
    z0 = _Z(state.theta, p0, state.u, state.grad)
    h0 = _energy(z0, inv_mass)

    def cond(c):
        return (c["depth"] < max_depth) & ~c["turning"] & ~c["diverging"]

    def body(c):
        key, kd, ks, km = jax.random.split(c["key"], 4)
        going_right = jax.random.bernoulli(kd)
        z_edge = _select(going_right, c["z_plus"], c["z_minus"])
        eps_signed = jnp.where(going_right, eps, -eps)
        sub = _build_subtree(
            ks, z_edge, c["depth"], eps_signed, inv_mass, h0, grad_fn,
            max_depth, divergence_threshold,
        )
        ok = ~sub.turning & ~sub.diverging

        z_plus = _select(going_right & ok, sub.z_edge, c["z_plus"])
        z_minus = _select((~going_right) & ok, sub.z_edge, c["z_minus"])

        # biased progressive merge: accept subtree proposal w.p. min(1, W_new/W_old)
        take = ok & (jnp.log(jax.random.uniform(km)) < (sub.log_sum_w - c["log_sum_w"]))
        z_prop = _select(take, sub.z_prop, c["z_prop"])
        log_sum_w = jnp.where(ok, jnp.logaddexp(c["log_sum_w"], sub.log_sum_w), c["log_sum_w"])

        # full-trajectory u-turn check (time-ordered endpoints)
        dtheta = z_plus.theta - z_minus.theta
        turn_full = (jnp.sum(dtheta * inv_mass * z_minus.p) < 0) | (
            jnp.sum(dtheta * inv_mass * z_plus.p) < 0
        )
        return {
            "key": key,
            "z_minus": z_minus,
            "z_plus": z_plus,
            "z_prop": z_prop,
            "log_sum_w": log_sum_w,
            "depth": c["depth"] + 1,
            "turning": sub.turning | (ok & turn_full),
            "diverging": sub.diverging,
            "sum_acc": c["sum_acc"] + sub.sum_acc,
            "n_leaves": c["n_leaves"] + sub.n_leaves,
        }

    init = {
        "key": key,
        "z_minus": z0,
        "z_plus": z0,
        "z_prop": z0,
        "log_sum_w": jnp.asarray(0.0, jnp.float32),
        "depth": jnp.asarray(0, jnp.int32),
        "turning": jnp.asarray(False),
        "diverging": jnp.asarray(False),
        "sum_acc": jnp.asarray(0.0, jnp.float32),
        "n_leaves": jnp.asarray(0, jnp.int32),
    }
    c = jax.lax.while_loop(cond, body, init)

    zp = c["z_prop"]
    new_state = ChainState(zp.theta, zp.u, zp.grad, key)
    info = NUTSInfo(
        accept_prob=c["sum_acc"] / jnp.maximum(c["n_leaves"], 1).astype(jnp.float32),
        diverged=c["diverging"],
        depth=c["depth"],
        n_leaves=c["n_leaves"],
    )
    return new_state, info


def make_nuts_kernel(grad_fn: Callable, mask: jax.Array, config: NUTSConfig = NUTSConfig()):
    """Kernel factory with the driver.py signature (state, eps, inv_mass)."""

    def kernel(state, eps, inv_mass):
        return nuts_step(
            state, grad_fn, eps, inv_mass, mask,
            max_depth=config.max_depth,
            divergence_threshold=config.divergence_threshold,
        )

    return kernel


def run_nuts(
    key: jax.Array,
    grad_fn: Callable,
    theta0: jax.Array,  # (n_chains, K, 3)
    mask: jax.Array,    # (K,)
    n_samples: int,
    n_warmup: int,
    config: NUTSConfig = NUTSConfig(),
    adapt_mass: bool = True,
    block_size: int | None = None,
    checkpoint_path: str | None = None,
    resume: bool = False,
    logger=None,
    thin: int = 1,
):
    """1024-chain-ready NUTS driver (config 2, BASELINE.json:9)."""
    kernel = make_nuts_kernel(grad_fn, mask, config)
    return run_mcmc(
        key, kernel, grad_fn, theta0, n_samples, n_warmup,
        step_size=config.step_size, target_accept=config.target_accept,
        adapt_mass=adapt_mass, block_size=block_size,
        checkpoint_path=checkpoint_path, resume=resume, logger=logger,
        thin=thin,
    )
