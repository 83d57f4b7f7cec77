"""Tensor (model) parallelism for the transformer families.

Beyond-reference capability (the reference's only parallelism is DDP
data parallelism, SURVEY.md §2.9): Megatron-style intra-layer model
parallelism (Shoeybi et al., 2019 — public recipe), expressed the TPU
way: **sharding annotations + GSPMD**, not hand-written collectives.

The recipe: on a ``('data', 'model')`` mesh, column-shard each block's
input projections (qkv / MiT's q+kv / fc1 — output dim over ``model``,
biases alike) and row-shard the output projections (attn proj / fc2 —
input dim over ``model``, biases replicated).  XLA's SPMD partitioner
propagates: the per-head attention math runs entirely local to each
model shard, and the row-parallel matmuls produce partial sums that
GSPMD turns into one psum per block over ICI — exactly the two
all-reduces per layer of the hand-written Megatron implementation,
derived automatically from the parameter shardings.  LayerNorms,
embeddings and every CNN/head parameter stay replicated; batch stays
sharded over ``data``.  Numerics are identical to single-device
execution up to f32 reduction order (pinned by
``tests/test_tensor_parallel.py``).

Rules are path-regex → role ('col' | 'row'); the specs adapt to the
leaf's rank, so the same rules cover ViT/Swin Linears ((in, out)
``weight``) and MiT's 1x1-conv projections ((kh, kw, in, out)).  They
are applied to the WHOLE TrainState with one path walk — optimizer
moments mirror the parameter tree structure, so momentum/Adam state
shards like its parameter automatically.

Head-count note: sharding is correct for any ``model`` axis size (GSPMD
reshards across misaligned slice boundaries); it is *communication-
optimal* when the axis size divides the head count (per-head score
blocks never cross shards) — prefer 2/3/6 for the 6-head ViT-S.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import batch_sharding, replicated

# (tail regex over the '/'-joined param path, role)
# col = output-dim sharded (bias sharded); row = input-dim sharded
# (bias replicated — it adds after the psum)
TRANSFORMER_TP_RULES: Tuple[Tuple[str, str], ...] = (
    (r"attn/qkv/(weight|bias)$", "col"),      # ViT / Swin fused qkv
    (r"attn/(q|kv)/(weight|bias)$", "col"),   # MiT split projections
    (r"attn/proj/weight$", "row"),
    (r"(^|/)fc1/(weight|bias)$", "col"),      # MLP in-projection
    (r"(^|/)fc2/weight$", "row"),             # MLP out-projection
)


def _path_str(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "name"):
            parts.append(str(k.name))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def _leaf_sharding(path, leaf, mesh: Mesh, rules, model_axis: str):
    nd = getattr(leaf, "ndim", 0)
    pstr = _path_str(path)
    for rx, role in rules:
        if re.search(rx, pstr):
            if role == "col":
                if nd == 1:                     # bias: one sharded dim
                    return NamedSharding(mesh, P(model_axis))
                spec = [None] * nd
                spec[-1] = model_axis
                return NamedSharding(mesh, P(*spec))
            if role == "row" and nd >= 2:
                spec = [None] * nd
                spec[-2] = model_axis
                return NamedSharding(mesh, P(*spec))
            break
    return replicated(mesh)


def tp_shardings(tree, mesh: Mesh,
                 rules: Sequence[Tuple[str, str]] = TRANSFORMER_TP_RULES,
                 model_axis: str = "model"):
    """Sharding pytree for ``tree`` (a TrainState, variables dict, or any
    param-bearing pytree) under the TP rules; everything unmatched is
    replicated."""
    return jax.tree_util.tree_map_with_path(
        lambda p, x: _leaf_sharding(p, x, mesh, rules, model_axis), tree)


def shard_state_tp(state, mesh: Mesh,
                   rules: Sequence[Tuple[str, str]] = TRANSFORMER_TP_RULES,
                   model_axis: str = "model"):
    """device_put a TrainState (or variables dict) with TP shardings."""
    return jax.device_put(state, tp_shardings(state, mesh, rules,
                                              model_axis))


def make_tp_train_step(model, tx, mesh: Mesh, state,
                       rules: Sequence[Tuple[str, str]] =
                       TRANSFORMER_TP_RULES,
                       data_axis: str = "data", model_axis: str = "model",
                       donate: bool = True):
    """2-D (data x model) train step: batch over ``data_axis``, the
    transformer projections over ``model_axis`` per ``rules``.

    ``state`` (an unsharded or TP-sharded TrainState) supplies the
    sharding pytree structure; the returned jitted step pins both input
    AND output state to the TP layout, so weights never silently
    collapse to replicated between steps.
    """
    # flash attention stays ENABLED here (round 5): the dispatcher folds
    # heads MAJOR into the kernel's batch dim (ops/attention.py), so the
    # 'model'-sharded head axis merges into a dim-0 sharding the
    # kernel's custom_partitioning rule runs shard-local — no
    # all-gather (pinned by tests/test_tensor_parallel.py +
    # test_parallel_hlo.py).  The einsum fallback costs SETR ViT-S
    # train −26% end-to-end (docs/PERF.md round 5), which is what this
    # buys back.
    from ..train_state import build_train_step_fn

    rep = replicated(mesh)
    data = batch_sharding(mesh, data_axis)
    state_sh = tp_shardings(state, mesh, rules, model_axis)
    return jax.jit(build_train_step_fn(model, tx, None),
                   in_shardings=(state_sh, data, data, rep),
                   out_shardings=(state_sh, rep),
                   donate_argnums=(0,) if donate else ())


def make_tp_eval_step(model, mesh: Mesh, variables,
                      rules: Sequence[Tuple[str, str]] =
                      TRANSFORMER_TP_RULES,
                      data_axis: str = "data", model_axis: str = "model"):
    """(data x model) inference step; ``variables`` supplies the
    sharding pytree structure (shard the actual dict with
    ``shard_state_tp`` before calling the step)."""
    # flash stays enabled — heads fold MAJOR into the kernel batch dim
    # (see make_tp_train_step)
    data = batch_sharding(mesh, data_axis)
    var_sh = tp_shardings(variables, mesh, rules, model_axis)

    def eval_step(variables, img):
        return model.apply(variables, img, method="inference")

    return jax.jit(eval_step, in_shardings=(var_sh, data),
                   out_shardings=data)
