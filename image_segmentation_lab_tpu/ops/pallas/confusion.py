"""Fused argmax + confusion histograms (Pallas TPU kernel + XLA path).

Eval hot path: turning per-pixel logits into the three per-class count
vectors (intersection, prediction, label) that drive mIoU/mDice/mFscore
(reference accumulates these with four ``torch.histc`` calls per image,
metrics.py:246-265).

**Measured outcome (v5e, in-jit amortized, 32 calls/fetch):** two kernel
layouts were built and raced against the jnp/XLA lowering:

* channel-on-lanes (``_kernel`` below, pixels on sublanes / classes on
  lanes): wastes 126/128 lanes at C=2 and loses badly — 4-13 ms vs XLA's
  0.7-0.8 ms.  Kept as a tested reference for the losing layout.
* **pixel-on-lanes** (``_hist_kernel``, every lane carries a pixel; XLA
  argmax feeds a (TILE_S, 128) int32 tile stream accumulating a (3, C)
  SMEM histogram): wins in the **mid-class-count, large-input** regime —
  4×1024×2048/C=19 measures 1.41/1.51/1.59 ms vs XLA's 1.46/1.55/1.73
  across three repeated runs (3-9%), bit-identical sums (int32
  accumulation; an f32 scalar would lose exactness past 2^24 counts).
  At C=2 the same kernel **loses** (0.54-0.59 vs XLA's 0.39-0.46 ms over
  repeats): with two classes XLA's one-hot compare-reduce is a couple of
  lane-parallel passes and the kernel's fixed 3C-reduction loop can't
  beat it.  At sub-megapixel inputs both paths are <0.1 ms.

``force='auto'`` therefore picks the pixel-on-lanes kernel on TPU only in
its winning regime (≥2M pixels, 8 ≤ num_classes ≤ 32, e.g. Cityscapes
eval) and the jnp path everywhere else.  The lesson matches the TPU
playbook: the VPU win comes from putting the *reduction population* on
lanes — and from re-measuring until the regime boundaries are real
(single-run deltas on a shared chip can be pure machine noise).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
TILE_P = 512  # pixels per grid step
_OUT_ROWS = 8  # f32 min sublane tile; rows 0..2 carry inter/pred/label


def _kernel(logits_ref, gt_ref, out_ref, *, ignore_index: int,
            num_classes: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    x = logits_ref[:]                      # (TILE_P, Cp) f32
    gt = gt_ref[:, 0]                      # (TILE_P,) int32
    pred = jnp.argmax(x, axis=1).astype(jnp.int32)
    # out-of-range labels (e.g. -1 from a classes-subset remap) are ignored
    # entirely, matching the jnp path
    valid = (gt != ignore_index) & (gt >= 0) & (gt < num_classes)

    classes = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    pred_oh = (classes == pred[:, None]) & valid[:, None]
    label_oh = (classes == gt[:, None]) & valid[:, None]
    inter_oh = pred_oh & (pred == gt)[:, None]

    out_ref[0, :] += jnp.sum(inter_oh.astype(jnp.float32), axis=0)
    out_ref[1, :] += jnp.sum(pred_oh.astype(jnp.float32), axis=0)
    out_ref[2, :] += jnp.sum(label_oh.astype(jnp.float32), axis=0)


def _pallas_call(logits2d, gt2d, ignore_index: int, num_classes: int,
                 interpret: bool):
    P, Cp = logits2d.shape
    grid = P // TILE_P
    return pl.pallas_call(
        functools.partial(_kernel, ignore_index=ignore_index,
                          num_classes=num_classes),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((TILE_P, Cp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_P, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_OUT_ROWS, Cp), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((_OUT_ROWS, Cp), jnp.float32),
        interpret=interpret,
    )(logits2d, gt2d)


TILE_S = 512  # sublane rows per grid step for the pixel-on-lanes kernel


def _hist_kernel(pred_ref, gt_ref, out_ref, *, ignore_index: int,
                 num_classes: int):
    """Pixel-on-lanes fused 3-histogram: pred/gt tiles are (TILE_S, 128)
    int32 — every lane carries a pixel (vs. the channel-on-lanes layout
    above that wastes 126/128 lanes at C=2).  Scalar per-class sums
    accumulate in an SMEM (3, C) output across sequential grid steps."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        for r in range(3):
            for c in range(num_classes):
                out_ref[r, c] = 0

    pred = pred_ref[:]
    gt = gt_ref[:]
    valid = (gt != ignore_index) & (gt >= 0) & (gt < num_classes)
    eq = (pred == gt) & valid
    # int32 accumulation: an f32 scalar loses integer exactness past 2^24
    # counts (≈ one 8×1024×2048 eval batch), which would break the
    # bit-identical-with-jnp contract
    for c in range(num_classes):
        gc = (gt == c) & valid
        pc = (pred == c) & valid
        out_ref[0, c] += jnp.sum((gc & eq).astype(jnp.int32))
        out_ref[1, c] += jnp.sum(pc.astype(jnp.int32))
        out_ref[2, c] += jnp.sum(gc.astype(jnp.int32))


def _hist_pallas(pred: jnp.ndarray, gt: jnp.ndarray, num_classes: int,
                 ignore_index: int, interpret: bool = False):
    """(3, num_classes) f32 from flat int32 pred/gt."""
    P = pred.shape[0]
    lane_rows = -(-P // LANE)
    S = -(-lane_rows // TILE_S) * TILE_S
    Pp = S * LANE
    if Pp != P:
        pred = jnp.pad(pred, (0, Pp - P))
        gt = jnp.pad(gt, (0, Pp - P), constant_values=ignore_index)
    pred2d = pred.reshape(S, LANE)
    gt2d = gt.reshape(S, LANE)
    out = pl.pallas_call(
        functools.partial(_hist_kernel, ignore_index=ignore_index,
                          num_classes=num_classes),
        grid=(S // TILE_S,),
        in_specs=[
            pl.BlockSpec((TILE_S, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_S, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, num_classes), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((3, num_classes), jnp.int32),
        interpret=interpret,
    )(pred2d, gt2d)
    return out.astype(jnp.float32)


def confusion_histograms(logits: jnp.ndarray,
                         gt: jnp.ndarray,
                         num_classes: int,
                         ignore_index: int,
                         force: str = "auto") -> Tuple[jnp.ndarray, ...]:
    """(area_intersect, area_pred, area_label), each (num_classes,) f32.

    ``logits``: (..., C) scores; ``gt``: (...) int labels.  ``force`` in
    {'auto', 'pallas', 'interpret', 'jnp', 'pallas_hist',
    'interpret_hist'}.  'pallas_hist' = XLA argmax feeding the
    pixel-on-lanes Pallas histogram kernel.
    """
    C = logits.shape[-1]
    assert C >= num_classes
    if force == "auto":
        # pixel-on-lanes Pallas wins only in its measured regime: ≥2M
        # pixels AND mid class counts (wins 3-9% at C=19; loses at C=2,
        # unmeasured above C=32 where the serial 3C-reduction loop and
        # compile-time unroll would likely lose to the lane-parallel jnp
        # one-hot path) — see module doc for the repeated-run numbers
        n_pixels = int(np.prod(gt.shape))
        if (jax.default_backend() == "tpu" and n_pixels >= (1 << 21)
                and 8 <= num_classes <= 32):
            force = "pallas_hist"
        else:
            force = "jnp"

    if force in ("pallas_hist", "interpret_hist"):
        pred = jnp.argmax(logits, axis=-1).astype(jnp.int32).reshape(-1)
        out = _hist_pallas(pred, gt.astype(jnp.int32).reshape(-1),
                           num_classes, ignore_index,
                           interpret=force == "interpret_hist")
        return out[0], out[1], out[2]

    if force == "jnp":
        # out-of-range labels (classes-subset remap writes -1) are excluded
        # from every histogram, like explicitly ignored pixels
        valid = (gt != ignore_index) & (gt >= 0) & (gt < num_classes)
        pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        classes = jnp.arange(num_classes)

        def hist(values, mask):
            eq = values[..., None] == classes
            return jnp.sum(eq & mask[..., None],
                           axis=tuple(range(values.ndim))).astype(jnp.float32)

        inter = hist(pred, valid & (pred == gt))
        pred_h = hist(pred, valid)
        label_h = hist(jnp.clip(gt, 0, num_classes - 1), valid)
        return inter, pred_h, label_h

    logits2d = logits.astype(jnp.float32).reshape(-1, C)
    gt2d = gt.astype(jnp.int32).reshape(-1, 1)
    P = logits2d.shape[0]
    # keep the channel dim unpadded in HBM: Mosaic masks the partial lane
    # tile in VMEM, so HBM traffic stays C columns, not 128 (for C=2 a
    # 128-lane pad would inflate reads 64x)
    Cp = C
    # pad pixels to the tile boundary as ignored
    Pp = -(-P // TILE_P) * TILE_P
    if Pp != P:
        logits2d = jnp.pad(logits2d, ((0, Pp - P), (0, 0)))
        gt2d = jnp.pad(gt2d, ((0, Pp - P), (0, 0)),
                       constant_values=ignore_index)

    out = _pallas_call(logits2d, gt2d, ignore_index, num_classes,
                       interpret=force == "interpret")
    inter, pred_h, label_h = out[0, :C], out[1, :C], out[2, :C]
    # labels outside [0, num_classes) beyond ignore are dropped by clipping
    return (inter[:num_classes], pred_h[:num_classes], label_h[:num_classes])
