"""FSDP / ZeRO-3: parameter + optimizer-state sharding over the data axis.

Beyond-reference capability extending ``parallel/zero.py`` (ZeRO-1) to
the full ZeRO-3 recipe (Rajbhandari et al., SC 2020; "fully sharded
data parallel"): every parameter leaf — not just the optimizer moments
— is partitioned over the ``data`` axis along its largest divisible
dimension.  Expressed the TPU way this is again *one sharding
annotation per leaf*: GSPMD derives the FSDP communication schedule
from it — all-gather each parameter just before its layer consumes it,
reduce-scatter its gradient right after the backward visits it, and run
the optimizer math on the local shard only.  No hand-written bucketing,
prefetching, or gradient hooks: the XLA scheduler overlaps the
per-layer all-gathers with compute because they are ordinary collective
ops in one fused program.

Per-chip memory for params + moments approaches 1/n; batch stats and
leaves whose dims don't divide the axis stay replicated (negligible by
construction).  Numerics are identical to plain DP up to f32 reduction
order (pinned in ``tests/test_fsdp.py``).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import batch_sharding, replicated
from .zero import _leaf_zero_sharding


def fsdp_state_shardings(state, mesh: Mesh, axis: str = "data"):
    """Sharding pytree for a TrainState: params AND opt_state sharded
    over ``axis``; frozen params join in (they are still memory);
    batch stats and the step counter stay replicated."""
    shard = lambda tree: jax.tree_util.tree_map(
        lambda x: _leaf_zero_sharding(x, mesh, axis), tree)
    rep_tree = jax.tree_util.tree_map(lambda _: replicated(mesh), state)
    return rep_tree.replace(params=shard(state.params),
                            frozen_params=shard(state.frozen_params),
                            opt_state=shard(state.opt_state))


def shard_state_fsdp(state, mesh: Mesh, axis: str = "data"):
    return jax.device_put(state, fsdp_state_shardings(state, mesh, axis))


def make_fsdp_train_step(model, tx, mesh: Mesh, state,
                         axis: str = "data", donate: bool = True):
    """Fully-sharded data-parallel train step.

    ``state`` supplies the sharding structure; input AND output state
    pin the parameter shards so they never collapse back to replicated
    between steps.
    """
    from ..train_state import build_train_step_fn

    rep = replicated(mesh)
    data = batch_sharding(mesh, axis)
    state_sh = fsdp_state_shardings(state, mesh, axis)
    return jax.jit(build_train_step_fn(model, tx, None),
                   in_shardings=(state_sh, data, data, rep),
                   out_shardings=(state_sh, rep),
                   donate_argnums=(0,) if donate else ())


def make_fsdp_eval_step(model, mesh: Mesh, state, axis: str = "data"):
    """Whole-image eval logits with FSDP-sharded params (weights gather
    per layer; activations stay batch-sharded)."""
    rep = replicated(mesh)
    data = batch_sharding(mesh, axis)
    state_sh = fsdp_state_shardings(state, mesh, axis)

    def eval_fn(state, img):
        return model.apply(state.variables(), img, method="encode_decode")

    return jax.jit(eval_fn,
                   in_shardings=(state_sh, data), out_shardings=data)


def fsdp_memory_fraction(state, mesh: Mesh, axis: str = "data") -> float:
    """Fraction of (param + moment) bytes resident per chip."""
    n = mesh.shape[axis]
    total, local = 0, 0
    for tree in (state.params, state.frozen_params, state.opt_state):
        for leaf in jax.tree_util.tree_leaves(tree):
            size = int(np.prod(getattr(leaf, "shape", ()) or (1,)))
            total += size
            sh = _leaf_zero_sharding(leaf, mesh, axis)
            local += size if sh.spec == P() else size // n
    return local / max(total, 1)
