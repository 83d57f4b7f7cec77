"""Context (sequence) parallelism: ring attention over a mesh axis.

Beyond-reference capability completing the parallelism matrix (data /
spatial / slide / tensor / pipeline / ZeRO / FSDP / expert / **context**):
exact attention over a token stream sharded across chips, the Ring
Attention construction (Liu et al., 2023 — public algorithm) expressed
the TPU way with ``shard_map`` + ``lax.ppermute`` over a ``('seq',)``
mesh axis.

Why it exists: the spatial axis (`parallel/mesh.py`) scales *conv*
activation memory by sharding image height, but a transformer backbone's
quadratic score tensor still materializes per chip.  Ring attention
shards the token dim L over S chips — each chip keeps its L/S query
block resident and streams the K/V blocks around the ring (one
``ppermute`` neighbor shift per step, riding ICI), merging each incoming
block into a running online-softmax state (the same recurrence as the
fused flash kernel, `ops/pallas/flash_attention.py`, applied across
chips instead of across VMEM tiles).  Per-chip score memory drops from
O(L²) to O(L²/S²) per step and communication is the K/V stream itself —
compute/communication overlap is XLA's job (the ppermute for step s+1
is independent of step s's einsums).

Numerics match the einsum path (`ops/attention.py`): scores accumulated
in f32, softmax in f32, PV products accumulated in f32, one cast at the
end.  The whole schedule is a ``lax.scan`` whose per-step ops are jnp +
``ppermute``, so ``jax.grad`` derives the reverse ring (ppermute
transposes to the inverse shift) — no hand-written backward.  Forward
AND gradient parity with single-device full attention is pinned on the
virtual CPU mesh (``tests/test_ring_attention.py``).

The reference has no distributed attention of any kind (SURVEY.md §2.9:
its parallelism inventory is latent DP only); this module is the
"long-context" analog the task brief calls sequence parallelism.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def ring_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   scale: float, mesh: Mesh, axis: str = "seq",
                   batch_axis: str | None = None) -> jnp.ndarray:
    """softmax(q k^T * scale) v with the token dim sharded over ``axis``.

    q/k/v: (N, L, h, d) global arrays (the attention contract of
    ``ops/attention.py``); L must divide by the ``axis`` mesh size.
    ``batch_axis`` optionally shards N over a second mesh axis (the
    standard ('data','seq') 2-D layout).  Returns (N, L, h, d) with the
    same sharding as q.
    """
    S = mesh.shape[axis]
    assert q.shape[1] % S == 0, (q.shape, S)
    assert k.shape[1] % S == 0, (k.shape, S)
    spec = P(batch_axis, axis)

    def local(q, k, v):
        # local shapes: q (n, Lq/S, h, d); k/v (n, Lk/S, h, d)
        n, lq, h, d = q.shape
        qf = q.astype(jnp.float32)
        # the accumulators become device-varying after the first merge;
        # mark the (replicated-zero) initial values as varying so scan's
        # carry type is stable (shard_map vma typing, as in gpipe)
        vary = tuple(a for a in (batch_axis, axis) if a is not None)
        m0 = jax.lax.pcast(jnp.full((n, h, lq), -jnp.inf, jnp.float32),
                           vary, to="varying")
        l0 = jax.lax.pcast(jnp.zeros((n, h, lq), jnp.float32),
                           vary, to="varying")
        o0 = jax.lax.pcast(jnp.zeros((n, h, lq, d), jnp.float32),
                           vary, to="varying")
        ring = [(i, (i + 1) % S) for i in range(S)]

        def step(carry, _):
            k_blk, v_blk, m, l, o = carry
            s = jnp.einsum("nlhd,nshd->nhls", qf,
                           k_blk.astype(jnp.float32)) * scale
            m_new = jnp.maximum(m, s.max(axis=-1))
            p = jnp.exp(s - m_new[..., None])
            corr = jnp.exp(m - m_new)
            l = l * corr + p.sum(axis=-1)
            o = o * corr[..., None] + jnp.einsum(
                "nhls,nshd->nhld", p, v_blk.astype(jnp.float32))
            if S > 1:
                k_blk = jax.lax.ppermute(k_blk, axis, ring)
                v_blk = jax.lax.ppermute(v_blk, axis, ring)
            return (k_blk, v_blk, m_new, l, o), None

        (_, _, _, l, o), _ = jax.lax.scan(
            step, (k, v, m0, l0, o0), None, length=S)
        out = o / l[..., None]
        return jnp.swapaxes(out, 1, 2).astype(q.dtype)

    return jax.shard_map(local, mesh=mesh, in_specs=(spec, spec, spec),
                         out_specs=spec)(q, k, v)
