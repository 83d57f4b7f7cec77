"""Multi-head attention dispatch: fused Pallas flash kernel vs XLA einsums.

Both transformer attention sites (ViT `models/backbones/vit.py`, MiT
`models/backbones/mit.py`) share one contract: ``q (N, Lq, h, d)``,
``k/v (N, Lk, h, d)`` -> ``out (N, Lq, h, d)``, scores accumulated in
f32, softmax in f32, probabilities cast to the value dtype for the PV
matmul.  ``multihead_attention`` computes exactly that, picking the
execution path:

* **einsum** (XLA): two batched MXU einsums with an explicit f32 score
  tensor — optimal for small score tensors (Swin's 49-token windows,
  low-res ViT) where the HBM round trip is noise.
* **flash** (`ops/pallas/flash_attention.py`): the fused kernel — wins
  when the score tensor is large enough that its HBM traffic dominates
  (measured: SETR ViT-S 640², docs/PERF.md).

``force=None`` auto-selects: flash on TPU when ``Lq*Lk`` crosses
``_FLASH_MIN_SCORES`` (the score tensor stops fitting the ~16 MB VMEM
budget and starts paying HBM round trips) and the head dim tiles the
lane axis cleanly.  ``ISLT_NO_FLASH_ATTN=1`` disables the kernel
globally (same convention as ``ISLT_NO_SLAB_CONV``).

Attention-probability dropout cannot run inside the fused kernel (the
probabilities never materialize); callers keep the einsum path when
attention dropout is active, so training numerics with
``attn_drop_rate > 0`` are unchanged.
"""

from __future__ import annotations

import contextlib
import os

import jax
import jax.numpy as jnp

from .pallas.flash_attention import flash_attention

# below this score-tensor size the einsum path's HBM round trip is cheap
# and kernel launch/padding overhead dominates (1M f32 scores = 4 MB)
_FLASH_MIN_SCORES = 1 << 20

# trace-time disable depth — see no_flash()
_flash_disabled = 0


@contextlib.contextmanager
def no_flash():
    """Disable the flash kernel for code traced inside this context.

    The kernel IS multi-device safe — its ``custom_partitioning`` rule
    (``ops/pallas/flash_attention.py``) runs one independent kernel per
    shard whenever the folded (batch x heads) dim is the sharded one, so
    batch-sharded programs (DP / ZeRO / FSDP / EP / window-sharded
    slide) keep it.  This context remains for the programs where the
    rule's dim-0-only contract would FORCE replication of a
    deliberately sharded dim — the partitioner would insert an
    all-gather of tokens (spatial sharding: L derives from the
    H-sharded image) or heads (tensor parallelism: qkv output dim over
    'model') before every attention, trading the kernel's HBM win for
    ICI traffic and per-chip memory.  Those builders trace under this
    context and keep the einsum path, which GSPMD shards natively.  The
    path choice happens at trace time, so a Python-level flag is
    sufficient.
    """
    global _flash_disabled
    _flash_disabled += 1
    try:
        yield
    finally:
        _flash_disabled -= 1


def without_flash(fn):
    """Wrap ``fn`` so its body traces under ``no_flash()`` — for step
    functions destined for a multi-device jit (the context must be live
    at trace time, which is call time for a jitted function)."""
    def wrapped(*args, **kwargs):
        with no_flash():
            return fn(*args, **kwargs)
    return wrapped


def _use_flash(Lq: int, Lk: int, d: int, train: bool) -> bool:
    if _flash_disabled or os.environ.get("ISLT_NO_FLASH_ATTN"):
        return False
    if jax.default_backend() != "tpu":
        return False
    if Lq * Lk < _FLASH_MIN_SCORES or d > 256:
        return False
    # Measured on v5e (docs/PERF.md): under grad the fused backward wins
    # in every large regime (SETR train +26%, SegFormer train +5% — no
    # probability tensor to write/read); forward-only it needs a long KV
    # side too (SETR eval Lk=1601 +5.5%, but MiT's sr-reduced Lk=400
    # loses 2% to the einsum path's single softmax pass)
    return train or Lk >= 1024


def multihead_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                        scale: float, force: str | None = None,
                        train: bool = False, block_q: int = 256,
                        block_k: int = 256) -> jnp.ndarray:
    """softmax(q k^T * scale) v over heads.

    q: (N, Lq, h, d); k, v: (N, Lk, h, d) -> (N, Lq, h, d).
    ``force``: None (auto) | 'einsum' | 'flash' | 'interpret' (flash in
    interpreter mode, for CPU tests).  ``train`` hints that a backward
    pass will run (widens the flash-win regime — see ``_use_flash``).
    """
    N, Lq, h, d = q.shape
    Lk = k.shape[1]
    if force is None:
        if _flash_disabled:  # sharded-jit safety trumps the test knob
            force = "einsum"
        else:
            force = os.environ.get("ISLT_FLASH_ATTN_FORCE") or (
                "flash" if _use_flash(Lq, Lk, d, train) else "einsum")

    if force == "einsum":
        scores = jnp.einsum("nlhd,nshd->nhls", q, k,
                            preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(scores * scale, axis=-1)
        return jnp.einsum("nhls,nshd->nlhd", attn.astype(v.dtype), v)

    assert force in ("flash", "interpret"), force
    # fold heads into the kernel batch; XLA fuses these transposes into
    # the surrounding projection copies
    qf = jnp.swapaxes(q, 1, 2).reshape(N * h, Lq, d)
    kf = jnp.swapaxes(k, 1, 2).reshape(N * h, Lk, d)
    vf = jnp.swapaxes(v, 1, 2).reshape(N * h, Lk, d)
    bq = min(block_q, -(-Lq // 16) * 16)
    # when the whole (padded) KV side fits VMEM comfortably, make it ONE
    # k block: Pallas fetches K/V once per batch row (the k index map is
    # then constant across q steps) and the online recurrence collapses
    # to a single softmax pass — measured 2x faster than 256x256
    # streaming at SETR's L=1601 (grid overhead + K/V re-DMA dominate
    # small blocks; docs/PERF.md)
    lk128 = -(-Lk // 128) * 128
    bk = lk128 if lk128 <= 2048 else min(block_k, lk128)
    # tuning knobs for A/B on new chips (docs/PERF.md records the sweep)
    bq = int(os.environ.get("ISLT_FLASH_BQ", bq))
    bk = int(os.environ.get("ISLT_FLASH_BK", bk))
    out = flash_attention(qf, kf, vf, scale, bq, bk,
                          force == "interpret")
    return jnp.swapaxes(out.reshape(N, h, Lq, d), 1, 2)
