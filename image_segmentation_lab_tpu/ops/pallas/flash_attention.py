"""Fused multi-head attention (flash attention) as a Pallas TPU kernel.

The transformer backbones (ViT `models/backbones/vit.py`, MiT
`models/backbones/mit.py`) compute full softmax attention as two batched
MXU einsums with an explicit f32 score tensor between them.  At
segmentation resolutions that tensor is the bandwidth hot spot: SETR
ViT-S/16 at 640² attends over L=1601 tokens, so each layer materializes
6 heads x 1601² f32 scores (~61 MB/img) to HBM, reads them back for the
softmax, writes the probabilities, and reads them again for the PV
matmul — ~250 MB of HBM round trips per image per layer against ~4
GFLOP of matmul work, i.e. attention runs bandwidth-bound while the MXU
idles.  XLA cannot fuse matmul->softmax->matmul into one TPU kernel;
Pallas can.

This kernel streams K/V blocks through VMEM with the classic online
softmax recurrence (Dao et al., FlashAttention, NeurIPS 2022 — public
algorithm), keeping a running row-max ``m``, row-sum ``l`` and an f32
output accumulator in VMEM scratch.  The score tile never leaves VMEM.
The backward pass (also fused, via ``jax.custom_vjp``) recomputes score
tiles from Q/K and the saved logsumexp instead of storing probabilities
— the standard flash backward with ``delta = rowsum(dO * O)``.

Numerics match the einsum path's contract (scores and softmax in f32 via
``preferred_element_type``, probabilities cast to the value dtype for
the PV matmul) up to f32 reduction-order differences; golden tests pin
both forward and gradients against the naive reference in
``tests/test_flash_attention.py``.

Layout: ``q (B, Lq, d)``, ``k/v (B, Lk, d)`` with ``B = batch x heads``
folded — each grid step's matmuls are (block_q x d)(d x block_k) and
(block_q x block_k)(block_k x d) MXU passes with d on the lane axis.
``Lq != Lk`` is supported (MiT's spatially-reduced KV).  Ragged lengths
are padded to the block grid; padded KV columns are masked to -1e30
before the online max, padded Q rows cost compute but their outputs are
sliced away (and contribute zero gradient — their upstream ``dO`` is
zero-padded).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
_NEG_INF = -1e30  # finite: keeps fully-masked tiles NaN-free


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_ref, l_ref, acc_ref,
                *, scale: float, kv_len: int, block_k: int):
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]                                   # (bq, d)
    k = k_ref[0]                                   # (bk, d)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # (bq, bk) f32

    if kv_len % block_k:  # static: mask the ragged tail block
        kv_idx = j * block_k + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 1)
        s = jnp.where(kv_idx < kv_len, s, _NEG_INF)

    m_prev = m_ref[:, :1]                          # (bq, 1)
    l_prev = l_ref[:, :1]
    m_cur = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_cur)                # (bq, 1)
    p = jnp.exp(s - m_cur)                         # (bq, bk) f32
    l_cur = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
    m_ref[:] = jnp.broadcast_to(m_cur, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_cur, l_ref.shape)
    # PV rides the MXU in the value dtype (einsum-path contract:
    # probabilities are cast to v.dtype), accumulating in f32
    pv = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)        # (bq, d) f32
    acc_ref[:] = acc_ref[:] * alpha + pv

    @pl.when(j == nk - 1)
    def _():
        l_fin = jnp.maximum(l_ref[:, :1], 1e-30)
        o_ref[0] = (acc_ref[:] / l_fin).astype(o_ref.dtype)
        lse_ref[0, 0] = (m_ref[:, :1] + jnp.log(l_fin))[:, 0]


def _flash_forward(q, k, v, scale, block_q, block_k, interpret):
    B, Lq, d = q.shape
    Lk = k.shape[1]
    Lqp, Lkp = _ceil_to(Lq, block_q), _ceil_to(Lk, block_k)
    if Lqp != Lq:
        q = jnp.pad(q, ((0, 0), (0, Lqp - Lq), (0, 0)))
    if Lkp != Lk:
        k = jnp.pad(k, ((0, 0), (0, Lkp - Lk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, Lkp - Lk), (0, 0)))
    grid = (B, Lqp // block_q, Lkp // block_k)
    o, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, kv_len=Lk,
                          block_k=block_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            # (B, 1, Lqp): the singleton axis keeps the trailing block
            # dims (1, block_q) legal under the (8, 128) tiling rule
            pl.BlockSpec((1, 1, block_q), lambda b, i, j: (b, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Lqp, d), q.dtype),
            jax.ShapeDtypeStruct((B, 1, Lqp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, LANE), jnp.float32),   # running max m
            pltpu.VMEM((block_q, LANE), jnp.float32),   # running sum l
            pltpu.VMEM((block_q, d), jnp.float32),      # output accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(q, k, v)
    return o[:, :Lq], lse


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
                   acc_ref, *, scale: float, kv_len: int, block_k: int):
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q, k, v, do = q_ref[0], k_ref[0], v_ref[0], do_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale          # (bq, bk)
    if kv_len % block_k:
        kv_idx = j * block_k + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 1)
        s = jnp.where(kv_idx < kv_len, s, _NEG_INF)
    p = jnp.exp(s - lse_ref[0, 0][:, None])                     # (bq, bk)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (bq, bk)
    ds = p * (dp - delta_ref[0, 0][:, None]) * scale            # f32
    acc_ref[:] += jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (bq, d)

    @pl.when(j == nk - 1)
    def _():
        dq_ref[0] = acc_ref[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, dk_acc, dv_acc,
                    *, scale: float, kv_len: int, block_k: int):
    i = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(i == 0)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q, k, v, do = q_ref[0], k_ref[0], v_ref[0], do_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale          # (bq, bk)
    if kv_len % block_k:
        j = pl.program_id(1)
        kv_idx = j * block_k + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 1)
        s = jnp.where(kv_idx < kv_len, s, _NEG_INF)
    p = jnp.exp(s - lse_ref[0, 0][:, None])                     # (bq, bk)
    # dV += P^T dO — padded q rows have dO == 0, so they contribute zero
    dv_acc[:] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (bk, d)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (bq, bk)
    ds = p * (dp - delta_ref[0, 0][:, None]) * scale
    dk_acc[:] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (bk, d)

    @pl.when(i == nq - 1)
    def _():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _flash_backward(q, k, v, o, lse, do, scale, block_q, block_k, interpret):
    B, Lq, d = q.shape
    Lk = k.shape[1]
    Lqp, Lkp = _ceil_to(Lq, block_q), _ceil_to(Lk, block_k)
    # delta_i = sum_d dO_i * O_i, the shared backward row term; carried
    # (B, 1, Lqp) like lse so the row blocks are (1, 1, block_q)
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1)[:, None, :]
    if Lqp != Lq:
        q = jnp.pad(q, ((0, 0), (0, Lqp - Lq), (0, 0)))
        do = jnp.pad(do, ((0, 0), (0, Lqp - Lq), (0, 0)))
        delta = jnp.pad(delta, ((0, 0), (0, 0), (0, Lqp - Lq)))
        # lse is already (B, 1, Lqp) from the forward
    if Lkp != Lk:
        k = jnp.pad(k, ((0, 0), (0, Lkp - Lk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, Lkp - Lk), (0, 0)))
    nq, nk = Lqp // block_q, Lkp // block_k

    q_spec_i = pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                            memory_space=pltpu.VMEM)
    k_spec_j = pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0),
                            memory_space=pltpu.VMEM)
    row_spec_i = pl.BlockSpec((1, 1, block_q), lambda b, i, j: (b, 0, i),
                              memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, kv_len=Lk,
                          block_k=block_k),
        grid=(B, nq, nk),
        in_specs=[q_spec_i, k_spec_j, k_spec_j, q_spec_i, row_spec_i,
                  row_spec_i],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Lqp, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(q, k, v, do, lse, delta)

    # dk/dv: kv blocks are the revisited output, q streams innermost
    q_spec_inner = pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0),
                                memory_space=pltpu.VMEM)
    k_spec_outer = pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0),
                                memory_space=pltpu.VMEM)
    row_spec_inner = pl.BlockSpec((1, 1, block_q), lambda b, j, i: (b, 0, i),
                                  memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, kv_len=Lk,
                          block_k=block_k),
        grid=(B, nk, nq),
        in_specs=[q_spec_inner, k_spec_outer, k_spec_outer, q_spec_inner,
                  row_spec_inner, row_spec_inner],
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((B, Lkp, d), k.dtype),
                   jax.ShapeDtypeStruct((B, Lkp, d), v.dtype)],
        scratch_shapes=[pltpu.VMEM((block_k, d), jnp.float32),
                        pltpu.VMEM((block_k, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(q, k, v, do, lse, delta)
    return dq[:, :Lq], dk[:, :Lk], dv[:, :Lk]


# ---------------------------------------------------------------------------
# SPMD partitioning (GSPMD / Shardy): batch-parallel custom rule
# ---------------------------------------------------------------------------
#
# A Mosaic kernel has no automatic SPMD partitioning — inside a
# multi-device jit the partitioner would fail at lowering.  But this
# kernel is embarrassingly parallel over its folded (batch x heads) dim:
# grid axis 0 is "parallel" and no block ever reads across it.  These
# ``custom_partitioning`` wrappers state exactly that contract — dim 0
# may be sharded arbitrarily, every other dim must be replicated — so
# batch-sharded programs (DP / FSDP / ZeRO / EP / spatial) run one
# independent kernel per shard with ZERO attention communication, and
# any operand sharded along a non-batch dim is first reshard-gathered by
# the partitioner (correct, never wrong — just not communication-free;
# tensor-parallel keeps the einsum path instead, see parallel/tensor.py).
# The ``sharding_rule`` carries the same statement to the Shardy
# propagator (factor ``b`` passes through; all others need replication).
# Forward and backward are wrapped separately because they sit inside a
# ``custom_vjp`` (autodiff never sees the partitioned calls).

from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec


def _dim0_axes(arg_shapes):
    """Mesh axes sharding dim 0 of the first operand that has any."""
    for s in arg_shapes:
        spec = getattr(s.sharding, "spec", None)
        if spec is not None and len(spec) and spec[0] is not None:
            return spec[0]
    return None


def _shard0(mesh, axes, rank):
    """NamedSharding: dim 0 over ``axes``, all other dims replicated."""
    return NamedSharding(mesh, PartitionSpec(axes, *([None] * (rank - 1))))


def _make_batch_partition(impl):
    """(partition, infer) callbacks declaring dim-0-only sharding for
    ``impl``; static kernel params arrive prepended by jax."""

    def partition(scale, block_q, block_k, interpret, mesh, arg_shapes,
                  result_shape):
        axes = _dim0_axes(arg_shapes)
        arg_sh = tuple(_shard0(mesh, axes, len(s.shape)) for s in arg_shapes)
        res_sh = jax.tree_util.tree_map(
            lambda s: _shard0(mesh, axes, len(s.shape)), result_shape)

        def lower_fn(*args):  # traced with the per-shard shapes
            return impl(*args, scale, block_q, block_k, interpret)

        return mesh, lower_fn, res_sh, arg_sh

    def infer(scale, block_q, block_k, interpret, mesh, arg_shapes,
              result_shape):
        axes = _dim0_axes(arg_shapes)
        return jax.tree_util.tree_map(
            lambda s: _shard0(mesh, axes, len(s.shape)), result_shape)

    return partition, infer


@functools.partial(custom_partitioning, static_argnums=(3, 4, 5, 6))
def _flash_fwd_spmd(q, k, v, scale, block_q, block_k, interpret):
    return _flash_forward(q, k, v, scale, block_q, block_k, interpret)


_p, _i = _make_batch_partition(_flash_forward)
_flash_fwd_spmd.def_partition(
    partition=_p, infer_sharding_from_operands=_i,
    # lse keeps its PADDED length (same on every shard: Lq is replicated)
    sharding_rule="b q d, b k d, b k d -> b q d, b u qp",
    # NB: must be listed in first-appearance order (the Shardy verifier
    # rejects unsorted special-factor indices)
    need_replication_factors=("q", "d", "k", "u", "qp"))


@functools.partial(custom_partitioning, static_argnums=(6, 7, 8, 9))
def _flash_bwd_spmd(q, k, v, o, lse, do, scale, block_q, block_k, interpret):
    return _flash_backward(q, k, v, o, lse, do, scale, block_q, block_k,
                           interpret)


_p, _i = _make_batch_partition(_flash_backward)
_flash_bwd_spmd.def_partition(
    partition=_p, infer_sharding_from_operands=_i,
    sharding_rule=("b q d, b k d, b k d, b q d, b u qp, b q d "
                   "-> b q d, b k d, b k d"),
    need_replication_factors=("q", "d", "k", "u", "qp"))
del _p, _i


# ---------------------------------------------------------------------------
# custom-vjp wrapper
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def flash_attention(q, k, v, scale: float, block_q: int = 256,
                    block_k: int = 256, interpret: bool = False):
    """softmax(q k^T * scale) v, fused; q (B, Lq, d), k/v (B, Lk, d)."""
    o, _ = _flash_fwd_spmd(q, k, v, scale, block_q, block_k, interpret)
    return o


def _fwd_rule(q, k, v, scale, block_q, block_k, interpret):
    o, lse = _flash_fwd_spmd(q, k, v, scale, block_q, block_k, interpret)
    return o, (q, k, v, o, lse)


def _bwd_rule(scale, block_q, block_k, interpret, res, do):
    q, k, v, o, lse = res
    return _flash_bwd_spmd(q, k, v, o, lse, do, scale, block_q, block_k,
                           interpret)


flash_attention.defvjp(_fwd_rule, _bwd_rule)
