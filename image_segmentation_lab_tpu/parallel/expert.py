"""Expert parallelism for Mixture-of-Experts FFNs.

Beyond-reference capability completing the parallelism matrix
(dp / spatial / tp / pp / **ep**): the stacked expert weights of every
``MoEFFN`` (``w1 (E, C, H)``, ``b1 (E, H)``, ``w2 (E, H, C)``,
``b2 (E, C)`` — ``models/utils/moe.py``) are sharded over an
``('data', 'expert')`` mesh along their leading expert axis.  GSPMD
propagates the sharding through the dispatch/combine einsums: each chip
computes only its experts' (E/n, cap) token slabs, and the combine
einsum's contraction over E becomes the expected psum over the expert
axis — the all-to-all-free formulation of expert parallelism for the
dense one-hot dispatch (communication = one psum of the (N, L, C)
output, ideal for segmentation-scale token counts).

Router weights, attention, norms and every non-MoE parameter stay
replicated over 'expert' (and the batch stays sharded over 'data'),
so numerics match single-device execution up to f32 reduction order
(pinned by ``tests/test_moe.py``).
"""

from __future__ import annotations

import re
from typing import Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import batch_sharding, replicated

# tail regex over the '/'-joined param path → leading-axis shard
MOE_EP_RULES: Tuple[str, ...] = (
    r"(^|/)moe/(w1|w2|b1|b2)$",
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


def _leaf_sharding(path, leaf, mesh: Mesh, rules, expert_axis: str):
    nd = getattr(leaf, "ndim", 0)
    if nd >= 1:
        pstr = _path_str(path)
        for rx in rules:
            if re.search(rx, pstr):
                n = mesh.shape[expert_axis]
                if leaf.shape[0] % n == 0:
                    spec = [None] * nd
                    spec[0] = expert_axis
                    return NamedSharding(mesh, P(*spec))
                break
    return replicated(mesh)


def ep_shardings(tree, mesh: Mesh,
                 rules: Sequence[str] = MOE_EP_RULES,
                 expert_axis: str = "expert"):
    """Sharding pytree: MoE expert stacks over ``expert_axis``, everything
    else replicated.  Works on a TrainState or a variables dict (optimizer
    moments mirror their parameters through the tree structure)."""
    return jax.tree_util.tree_map_with_path(
        lambda p, x: _leaf_sharding(p, x, mesh, rules, expert_axis), tree)


def shard_state_ep(state, mesh: Mesh,
                   rules: Sequence[str] = MOE_EP_RULES,
                   expert_axis: str = "expert"):
    return jax.device_put(state, ep_shardings(state, mesh, rules,
                                              expert_axis))


def make_ep_train_step(model, tx, mesh: Mesh, state,
                       rules: Sequence[str] = MOE_EP_RULES,
                       data_axis: str = "data", expert_axis: str = "expert",
                       donate: bool = True):
    """2-D (data x expert) train step: batch over ``data_axis``, MoE
    expert stacks over ``expert_axis``; in/out shardings pin the layout
    across steps."""
    from ..train_state import build_train_step_fn

    rep = replicated(mesh)
    data = batch_sharding(mesh, data_axis)
    state_sh = ep_shardings(state, mesh, rules, expert_axis)
    return jax.jit(build_train_step_fn(model, tx, None),
                   in_shardings=(state_sh, data, data, rep),
                   out_shardings=(state_sh, rep),
                   donate_argnums=(0,) if donate else ())


def make_ep_eval_step(model, mesh: Mesh, variables,
                      rules: Sequence[str] = MOE_EP_RULES,
                      data_axis: str = "data", expert_axis: str = "expert"):
    data = batch_sharding(mesh, data_axis)
    var_sh = ep_shardings(variables, mesh, rules, expert_axis)

    def eval_step(variables, img):
        return model.apply(variables, img, method="inference")

    return jax.jit(eval_step,
                   in_shardings=(var_sh, data), out_shardings=data)
