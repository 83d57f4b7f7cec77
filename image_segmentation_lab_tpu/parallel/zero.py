"""ZeRO-1: optimizer-state sharding over the data axis.

Beyond-reference capability (Rajbhandari et al., SC 2020 — public
recipe): in plain data parallelism every chip holds a full copy of the
optimizer state (for Adam, 2x the parameter memory).  ZeRO stage 1
shards that state across the data-parallel workers; expressed the TPU
way, it is *one sharding annotation*: each optimizer-state leaf is
partitioned over ``data`` along its largest dimension, and GSPMD
rewrites the update into reduce-scatter(grads) -> sharded optimizer
math -> all-gather(new params) — the exact ZeRO-1 communication
schedule, derived from the sharding instead of hand-written.

Params and batch stay exactly as in ``make_sharded_train_step`` (batch
over ``data``, params replicated), so numerics are identical to plain
DP up to f32 reduction order (pinned by
``tests/test_zero.py``).  Leaves too small to shard (first dim not
divisible by the axis size, or scalars like Adam's step count) stay
replicated — memory-irrelevant by definition.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import batch_sharding, replicated


def _leaf_zero_sharding(leaf, mesh: Mesh, axis: str):
    nd = getattr(leaf, "ndim", 0)
    if nd == 0:
        return replicated(mesh)
    n = mesh.shape[axis]
    shape = leaf.shape
    # shard the largest divisible dimension; replicate if none divides
    order = sorted(range(nd), key=lambda i: -shape[i])
    for dim in order:
        if shape[dim] % n == 0 and shape[dim] >= n:
            spec = [None] * nd
            spec[dim] = axis
            return NamedSharding(mesh, P(*spec))
    return replicated(mesh)


def zero1_state_shardings(state, mesh: Mesh, axis: str = "data"):
    """Sharding pytree for a TrainState: opt_state leaves sharded over
    ``axis``, everything else replicated."""
    rep_tree = jax.tree_util.tree_map(lambda _: replicated(mesh), state)
    opt_sh = jax.tree_util.tree_map(
        lambda x: _leaf_zero_sharding(x, mesh, axis), state.opt_state)
    return rep_tree.replace(opt_state=opt_sh)


def shard_state_zero1(state, mesh: Mesh, axis: str = "data"):
    return jax.device_put(state, zero1_state_shardings(state, mesh, axis))


def make_zero1_train_step(model, tx, mesh: Mesh, state,
                          axis: str = "data", donate: bool = True):
    """Data-parallel train step with ZeRO-1 optimizer-state sharding.

    ``state`` supplies the sharding structure; input AND output state pin
    the optimizer shards so they never collapse back to replicated.
    """
    from ..train_state import build_train_step_fn

    rep = replicated(mesh)
    data = batch_sharding(mesh, axis)
    state_sh = zero1_state_shardings(state, mesh, axis)
    return jax.jit(build_train_step_fn(model, tx, None),
                   in_shardings=(state_sh, data, data, rep),
                   out_shardings=(state_sh, rep),
                   donate_argnums=(0,) if donate else ())


def zero1_memory_fraction(state, mesh: Mesh, axis: str = "data") -> float:
    """Fraction of optimizer-state bytes that remain per chip (diagnostic;
    1/n_shards in the limit of all-shardable leaves)."""
    n = mesh.shape[axis]
    total, local = 0, 0
    for leaf in jax.tree_util.tree_leaves(state.opt_state):
        size = int(np.prod(getattr(leaf, "shape", ()) or (1,)))
        total += size
        sh = _leaf_zero_sharding(leaf, mesh, axis)
        local += size if sh.spec == P() else size // n
    return local / max(total, 1)
