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
    shard whenever the folded (heads x batch) dim is the sharded one,
    so batch-sharded programs (DP / ZeRO / FSDP / EP / window-sharded
    slide) keep it, and — since the fold went heads-MAJOR (round 5) —
    so does tensor parallelism: the 'model'-sharded head axis merges
    into an expressible dim-0 sharding, verified all-gather-free in
    ``tests/test_tensor_parallel.py``.  This context remains only for
    the spatial-sharding builders, where the TOKEN dim derives from the
    H-sharded image and the rule's dim-0-only contract would force an
    all-gather of tokens before every attention, trading the kernel's
    HBM win for ICI traffic and per-chip memory.  Those builders trace
    under this context and keep the einsum path, which GSPMD shards
    natively.  The path choice happens at trace time, so a Python-level
    flag is sufficient.
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
    # fold heads into the kernel batch, heads-MAJOR: (h, N, L, d) ->
    # (h*N, L, d).  XLA fuses these transposes into the surrounding
    # projection copies either way; heads leading means a
    # 'model'-sharded head axis (tensor parallelism's col-sharded qkv)
    # merges into an expressible dim-0 sharding P(('model', 'data')),
    # which the kernel's custom_partitioning rule handles with zero
    # attention communication (one kernel per head-shard).
    qf = jnp.transpose(q, (2, 0, 1, 3)).reshape(h * N, Lq, d)
    kf = jnp.transpose(k, (2, 0, 1, 3)).reshape(h * N, Lk, d)
    vf = jnp.transpose(v, (2, 0, 1, 3)).reshape(h * N, Lk, d)
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
    return jnp.transpose(out.reshape(h, N, Lq, d), (1, 2, 0, 3))


# Score-tensor element count above which the monolithic
# scores→softmax→matmul chain falls off an XLA cliff on TPU — but ONLY
# in the tiny-Lq (decoder-query) regime: measured on Mask2Former's
# masked cross-attention (N=16, h=8, Lq=100, Lk=6400 — 82M f32 score
# elements) the monolithic form runs 25 ms where the same math chunked
# over the key axis runs ~1 ms; at 20M elements (Lk=1600) both are at
# the noise floor.  Large-Lq self-attention does NOT cliff: at SETR's
# (N=8, h=6, Lq=Lk=1601 — 123M elements) the monolithic form is
# 1.45 ms and chunking LOSES (5.1 ms scan overhead + pad waste), so the
# einsum fallback elsewhere stays monolithic.  `_CHUNKED_MAX_LQ` gates
# the routing to the decoder regime.  docs/PERF.md round 4.
_CHUNKED_MIN_SCORES = 1 << 25
_CHUNKED_MAX_LQ = 1024
_CHUNK_K = 1600


def chunked_softmax_attention(q: jnp.ndarray, k: jnp.ndarray,
                              v: jnp.ndarray, scale: float,
                              blocked: jnp.ndarray | None = None,
                              chunk: int = _CHUNK_K) -> jnp.ndarray:
    """Exact softmax(q k^T * scale) v with an ONLINE softmax over key
    chunks — pure XLA (lax.scan), no Pallas, differentiable, maskable.

    q (N, Lq, h, d); k/v (N, Lk, h, d); ``blocked`` (N, Lq, Lk) bool —
    True keys get -inf score, rows that block EVERYTHING fall back to
    full attention (the Mask2Former upstream safeguard).  Lk is padded
    to a chunk multiple; pad keys are masked out.

    Why this exists: for huge score tensors XLA's monolithic
    matmul→softmax→matmul lowering collapses (25 ms where this runs
    ~1 ms at Mask2Former's 1/8-level masked cross-attention — the
    measured cliff behind ``_CHUNKED_MIN_SCORES``), and the Pallas flash
    kernel both lacks a mask operand and loses 5x to this form at tiny
    Lq (its q-block padding wastes the MXU).  The chunked scan keeps
    every intermediate at (N, h, Lq, chunk) so nothing big ever
    materializes.
    """
    N, Lq, h, d = q.shape
    Lk = k.shape[1]
    nch = -(-Lk // chunk)
    pad = nch * chunk - Lk
    if blocked is not None:
        # fully-blocked rows attend everywhere (upstream safeguard) —
        # resolved ONCE, before chunking
        blocked = blocked & ~jnp.all(blocked, axis=-1, keepdims=True)
    if pad:
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
        if blocked is None:
            blocked = jnp.zeros((N, Lq, Lk), bool)
        blocked = jnp.pad(blocked, ((0, 0), (0, 0), (0, pad)),
                          constant_values=True)
    kc = k.reshape(N, nch, chunk, h, d)
    vc = v.reshape(N, nch, chunk, h, d)
    bc = (blocked.reshape(N, Lq, nch, chunk)
          if blocked is not None else None)

    def body(carry, ci):
        m, s_sum, o = carry
        kk = jax.lax.dynamic_index_in_dim(kc, ci, 1, keepdims=False)
        vv = jax.lax.dynamic_index_in_dim(vc, ci, 1, keepdims=False)
        sc = jnp.einsum("nlhd,nshd->nhls", q, kk,
                        preferred_element_type=jnp.float32) * scale
        if bc is not None:
            bb = jax.lax.dynamic_index_in_dim(bc, ci, 2, keepdims=False)
            sc = jnp.where(bb[:, None], -1e30, sc)   # (N,1,Lq,chunk)
        m_new = jnp.maximum(m, sc.max(-1))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(sc - m_new[..., None])
        s_new = s_sum * alpha + p.sum(-1)
        o_new = o * alpha[..., None] + jnp.einsum(
            "nhls,nshd->nhld", p.astype(vv.dtype), vv)
        return (m_new, s_new, o_new), None

    m0 = jnp.full((N, h, Lq), -jnp.inf, jnp.float32)
    s0 = jnp.zeros((N, h, Lq), jnp.float32)
    o0 = jnp.zeros((N, h, Lq, d), jnp.float32)
    (m, s_sum, o), _ = jax.lax.scan(body, (m0, s0, o0), jnp.arange(nch))
    out = o / jnp.maximum(s_sum, 1e-30)[..., None]
    return jnp.swapaxes(out, 1, 2).astype(v.dtype)     # (N, Lq, h, d)
