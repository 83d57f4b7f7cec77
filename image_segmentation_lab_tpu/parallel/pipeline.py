"""Pipeline (inter-layer) parallelism: GPipe over a device mesh axis.

Beyond-reference capability completing the parallelism matrix (data /
spatial / tensor / pipeline): the classic GPipe schedule (Huang et al.,
NeurIPS 2019 — public algorithm) expressed the TPU way with
``shard_map`` + ``lax.ppermute`` over a ``('pipe',)`` mesh axis.

The natural target in this zoo is the isotropic transformer trunk (ViT:
L identical blocks over a constant-shape token stream).  Stage i holds
L/S consecutive blocks' parameters (stacked, leading axis sharded over
``pipe``); a microbatched input stream flows left-to-right, one
``ppermute`` neighbor shift per tick, M + S - 1 ticks total — the
bubble fraction is (S-1)/(M+S-1), amortized by more microbatches.

Differentiability: the schedule is a ``lax.scan`` over ticks (not a
while loop), and ``ppermute`` transposes to the reverse shift under AD,
so ``jax.grad`` through ``gpipe`` yields exactly the reverse pipeline
schedule — no hand-written backward pass.  Parity with the sequential
forward AND gradients is pinned on the virtual CPU mesh
(``tests/test_pipeline_parallel.py``).

Capacity math: per-chip parameter memory scales 1/S with pipeline depth
— together with the tensor axis (`parallel/tensor.py`) this is the
standard 3-D (data x tensor x pipe) layout for models beyond one chip's
HBM.  On real hardware the ppermute rides ICI neighbor links.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def stack_stage_params(per_block_params: Sequence, n_stages: int):
    """Stack L structurally-identical per-block param trees into one tree
    with leading axes (n_stages, L // n_stages)."""
    L = len(per_block_params)
    assert L % n_stages == 0, (
        f"{L} blocks do not divide into {n_stages} pipeline stages")
    k = L // n_stages
    stacked = jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves), *per_block_params)
    return jax.tree_util.tree_map(
        lambda x: x.reshape(n_stages, k, *x.shape[1:]), stacked)


def gpipe(block_fn: Callable, stage_params, xs: jnp.ndarray, mesh: Mesh,
          axis: str = "pipe"):
    """Run the S-stage pipeline over microbatches.

    ``block_fn(params, x) -> x``: one block; ``stage_params``: tree with
    leading axes (S, k) — stage i applies its k blocks in order.
    ``xs``: (M, microbatch, ...) replicated input stream.  Returns the
    (M, microbatch, ...) outputs of the full chain, replicated.
    """
    S = mesh.shape[axis]
    M = xs.shape[0]
    T = M + S - 1

    def stage_fn(params_k, x):
        return jax.lax.scan(lambda h, p: (block_fn(p, h), None),
                            x, params_k)[0]

    def local(params, xs):
        params_k = jax.tree_util.tree_map(lambda p: p[0], params)  # (k,...)
        stage = jax.lax.axis_index(axis)
        # the carries become device-varying after the first tick; mark the
        # (replicated-zero) initial values as varying so scan's carry type
        # is stable (shard_map vma typing)
        buf0 = jax.lax.pcast(jnp.zeros_like(xs[0]), (axis,), to="varying")
        outs0 = jax.lax.pcast(jnp.zeros_like(xs), (axis,), to="varying")
        shift = [(i, i + 1) for i in range(S - 1)]

        def tick(carry, t):
            buf_in, outs = carry
            inp = jnp.where(stage == 0,
                            xs[jnp.clip(t, 0, M - 1)], buf_in)
            act = stage_fn(params_k, inp)
            nxt = jax.lax.ppermute(act, axis, shift) if S > 1 else act
            out_idx = t - (S - 1)
            take = (stage == S - 1) & (out_idx >= 0)
            upd = outs.at[jnp.clip(out_idx, 0, M - 1)].set(act)
            outs = jax.tree_util.tree_map(
                lambda a, b: jnp.where(take, a, b), upd, outs)
            return (nxt, outs), None

        (_, outs), _ = jax.lax.scan(tick, (buf0, outs0), jnp.arange(T))
        # only the last stage holds real outputs; psum broadcasts them
        outs = outs * (stage == S - 1).astype(outs.dtype)
        return jax.lax.psum(outs, axis)

    return jax.shard_map(local, mesh=mesh,
                     in_specs=(P(axis), P()), out_specs=P())(
        stage_params, xs)


def microbatch(x: jnp.ndarray, n_micro: int) -> jnp.ndarray:
    """(B, ...) -> (n_micro, B // n_micro, ...)."""
    B = x.shape[0]
    assert B % n_micro == 0, (B, n_micro)
    return x.reshape(n_micro, B // n_micro, *x.shape[1:])
