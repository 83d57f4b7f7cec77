"""Seeding.

Parity target: reference ``core/initialize/seed_init.py:19-67``:
``init_random_seed`` (random seed, broadcast so all ranks agree) and
``set_random_seed`` (python/np/framework RNGs + determinism flag).

JAX redesign: JAX randomness is functional (explicit PRNG keys), so
"seeding the framework" means establishing the root key from which the train
loop derives per-step keys.  A module-level root key is kept for
convenience APIs (``next_rng_key``); XLA is deterministic by construction, so
the reference's cudnn-determinism toggle is a no-op documented here.
"""

from __future__ import annotations

import os
import random
from typing import Optional

import jax
import numpy as np

_root_key = None


def init_random_seed(seed: Optional[int] = None, device=None) -> int:
    """Pick a seed (random if None) and make it identical on all processes
    (the reference broadcasts over torch.distributed, seed_init.py:39-48)."""
    if seed is not None:
        return int(seed)
    seed = int.from_bytes(os.urandom(4), "little") % (2 ** 31)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        seed = int(multihost_utils.broadcast_one_to_all(np.int64(seed)))
    return seed


def set_random_seed(seed: int, deterministic: bool = False) -> jax.Array:
    """Seed python/np RNGs and establish the JAX root key.

    ``deterministic`` is accepted for CLI/schedule parity; XLA compilation is
    already bit-deterministic for a fixed seed and topology.
    """
    global _root_key
    random.seed(seed)
    np.random.seed(seed)
    _root_key = jax.random.PRNGKey(seed)
    return _root_key


def get_root_key() -> jax.Array:
    global _root_key
    if _root_key is None:
        _root_key = jax.random.PRNGKey(0)
    return _root_key


def next_rng_key() -> jax.Array:
    """Split a fresh key off the root (host-side convenience)."""
    global _root_key
    _root_key, sub = jax.random.split(get_root_key())
    return sub
