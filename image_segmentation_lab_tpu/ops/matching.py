"""Bipartite assignment on device: the auction algorithm.

Mask-classification heads (MaskFormer) need a minimum-cost matching of
ground-truth segments to predicted queries inside the jitted train step.
The classical solver (scipy's Jonker-Volgenant, what torch stacks call
on host) is a data-dependent sequential algorithm; the TPU-native
formulation here is Bertsekas' **auction algorithm** (public algorithm,
1979/1992 survey): unassigned rows bid for their best column with an
increment of (best − second-best + eps); columns always go to the
highest bidder.  Every round is a fixed-shape batch of max/argmax VPU
ops over the (T, Q) benefit matrix inside one ``lax.while_loop`` — no
host callback, no dynamic shapes, vmappable over the batch.

Guarantees: terminates for any eps > 0; the result is within ``T*eps``
of the optimal cost (exactly optimal when costs are integer multiples
of something > T*eps — the classical bound).  For the MaskFormer use
(T ≤ num_classes targets vs Q ≈ 100 queries, O(1)-scale float costs)
``eps=1e-4`` makes suboptimality noise relative to the loss; matching
vs ``scipy.optimize.linear_sum_assignment`` is pinned in
``tests/test_maskformer.py``.  The assignment is discrete — callers use
it under ``stop_gradient`` semantics by construction (indices).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG = -1e30


def auction_assignment(cost: jnp.ndarray, valid_rows: jnp.ndarray = None,
                       eps: float = 1e-4, max_iters: int = 5000):
    """Min-cost assignment of T rows to Q columns (T <= Q).

    cost (T, Q) f32; valid_rows (T,) bool — padded rows never bid.
    Returns (col_of_row (T,) int32 — −1 for invalid rows, owner (Q,)
    int32 — row owning each column or −1).

    A valid row exits with −1 only if ``max_iters`` is exhausted first
    (pathological near-tie bidding wars; the loop exits early on
    convergence, so a generous bound is cheap) — callers must gate
    index uses on ``col >= 0`` because negative indices WRAP in jax
    gathers/scatters.
    """
    T, Q = cost.shape
    assert T <= Q, (T, Q)
    benefit = -cost.astype(jnp.float32)
    if valid_rows is None:
        valid_rows = jnp.ones((T,), bool)

    def assigned(owner):
        # row i is assigned iff it owns some column
        return (owner[None, :] == jnp.arange(T)[:, None]).any(axis=1)

    def cond(carry):
        prices, owner, it = carry
        return (it < max_iters) & jnp.any(valid_rows & ~assigned(owner))

    def body(carry):
        prices, owner, it = carry
        values = benefit - prices[None, :]                  # (T, Q)
        bidding = valid_rows & ~assigned(owner)
        best_j = jnp.argmax(values, axis=1)                 # (T,)
        best_v = jnp.max(values, axis=1)
        second = jnp.max(
            jnp.where(jax.nn.one_hot(best_j, Q, dtype=bool), NEG, values),
            axis=1)
        bid = prices[best_j] + best_v - second + eps        # (T,)

        # each column takes its highest bidder (Jacobi round)
        offers = jnp.where(
            bidding[:, None] & jax.nn.one_hot(best_j, Q, dtype=bool),
            bid[:, None], NEG)                              # (T, Q)
        top_bid = jnp.max(offers, axis=0)                   # (Q,)
        top_row = jnp.argmax(offers, axis=0)
        has_bid = top_bid > NEG / 2
        prices = jnp.where(has_bid, top_bid, prices)
        owner = jnp.where(has_bid, top_row, owner)
        return prices, owner, it + 1

    prices0 = jnp.zeros((Q,), jnp.float32)
    owner0 = jnp.full((Q,), -1, jnp.int32)
    _, owner, _ = jax.lax.while_loop(cond, body, (prices0, owner0, 0))

    mine = owner[None, :] == jnp.arange(T)[:, None]         # (T, Q)
    col_of_row = jnp.where(mine.any(axis=1),
                           jnp.argmax(mine, axis=1), -1).astype(jnp.int32)
    return col_of_row, owner.astype(jnp.int32)
