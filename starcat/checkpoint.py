"""Checkpoint / resume (SURVEY.md ㉑, §5.4): orbax-checkpoint over the
sampler-state pytree (positions, PRNG keys, adaptation state, SMC weights/
temperature), multi-host-aware via orbax's sharded-array handling.

MCMC is trivially restartable: a checkpoint plus re-`initialize` on a
replacement slice gives checkpoint-restart recovery (SURVEY.md §5.3) —
there is no elastic membership on TPU pod slices.
"""
from __future__ import annotations

import os
from typing import Any

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_state(path: str, state: Any) -> None:
    """Save a sampler-state pytree (ChainState, SMCState, ...) to `path`.

    PRNG key arrays are stored as raw uint32 key data so restore round-trips
    through orbax's array handlers.
    """
    path = os.path.abspath(os.fspath(path))
    state = jax.tree.map(_key_to_data, state)
    ckpt = _checkpointer()
    ckpt.save(path, state, force=True)
    ckpt.wait_until_finished()


def restore_state(path: str, like: Any) -> Any:
    """Restore a pytree saved by save_state; `like` supplies the structure
    (a state with the same shapes/dtypes, e.g. a freshly-initialized one).

    Sharding-aware (SURVEY.md §5.4 "multi-host-aware save of sharded
    arrays"): every restored leaf is device_put to the corresponding `like`
    leaf's sharding, so restoring into a NamedSharding-sharded template
    (dist.shard_chains over a mesh) yields a state that resumes directly
    on the mesh — orbax otherwise returns single-device-committed arrays,
    which jit refuses to mix with sharded ones."""
    path = os.path.abspath(os.fspath(path))
    like_data = jax.tree.map(_key_to_data, like)
    restored = _checkpointer().restore(path, like_data)
    out = _rewrap_like(like, restored)
    return jax.tree.map(
        lambda l, r: (jax.device_put(r, l.sharding)
                      if isinstance(l, jax.Array) else r),
        like, out,
    )


def _is_key(x):
    return isinstance(x, jax.Array) and jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key)


def _key_to_data(x):
    return jax.random.key_data(x) if _is_key(x) else x


def _rewrap_like(like, restored):
    flat_like, treedef = jax.tree.flatten(like)
    flat_rest = treedef.flatten_up_to(restored)
    out = [
        jax.random.wrap_key_data(r) if _is_key(l) else r
        for l, r in zip(flat_like, flat_rest)
    ]
    return jax.tree.unflatten(treedef, out)
