"""Distributed runtime / comms backend (SURVEY.md ⑭, §5.8).

The reference has no parallelism at all (single-process NumPy — SURVEY.md
§0/§2).  The TPU-native scaling layer is GSPMD: one logical program, a named
device mesh, sharding annotations, and XLA-inserted collectives.  Intra-
slice traffic rides ICI; cross-host setup and multi-slice collectives ride
DCN — all reached exclusively through jax.lax collectives inside jit
(psum/all_gather), exactly the primitives BASELINE.json:5 names.

Usage:
    init_distributed()                       # per-host, multi-host runs only
    mesh = make_mesh("chains")               # 1-D mesh over all devices
    theta = shard_chains(theta, mesh)        # chain/particle axis sharded
    ... jit-ed sampler runs unchanged; chain-axis means/logsumexps become
    psum collectives; resampling gathers become all-to-alls.

Chains/particles are embarrassingly parallel; the only communication is
pooled warmup adaptation (one scalar mean per iteration) and SMC
resampling (one logsumexp + one gather per temperature step), which is why
>=95% scaling efficiency is the acceptance target (BASELINE.json:5).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Initialize jax.distributed for a multi-host run (no-op if single)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(axis_name: str = "chains", n_devices: int | None = None) -> Mesh:
    """1-D mesh over (the first n of) all visible devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def chain_sharding(mesh: Mesh, ndim: int, axis_name: str = "chains") -> NamedSharding:
    """NamedSharding that splits the leading (chain/particle) axis."""
    return NamedSharding(mesh, P(axis_name, *([None] * (ndim - 1))))


def shard_chains(tree, mesh: Mesh, axis_name: str = "chains"):
    """device_put every leaf with its leading axis sharded over the mesh."""
    return jax.tree.map(
        lambda x: jax.device_put(x, chain_sharding(mesh, x.ndim, axis_name)), tree
    )


def constrain_chains(tree, mesh: Mesh, axis_name: str = "chains"):
    """with_sharding_constraint version for use inside jit."""
    return jax.tree.map(
        lambda x: jax.lax.with_sharding_constraint(
            x, chain_sharding(mesh, x.ndim, axis_name)
        ),
        tree,
    )
