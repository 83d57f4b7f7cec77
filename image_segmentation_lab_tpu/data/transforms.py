"""On-device augmentation transforms.

The reference runs albumentations on CPU worker processes
(core/dataset/custom.py:88 loads the pipeline from YAML;
configs/augmentation/*.yaml define it).  This module re-implements every
transform those YAMLs use as **pure JAX ops over batched NHWC tensors**, so
the whole augmentation pipeline fuses into the training step's XLA program
and runs on-device (north star: "fused batched on-device preprocessing",
BASELINE.json).

Contracts:

* A transform is ``t(key, img, mask) -> (img, mask)`` on a SINGLE image
  (H,W,C float32, values 0..255 pre-Normalize) + mask (H,W float32);
  the Pipeline vmaps over the batch with per-sample keys.
* Randomness comes only from the key (distribution-level parity with
  albumentations — SURVEY.md §7 hard part (c)).
* ``p``-gating computes the transformed branch and selects with
  ``jnp.where`` — both branches run, which is the right trade on TPU (no
  divergent control flow; the VPU eats elementwise work).
* Shape-changing transforms (Resize/RandomCrop/PadIfNeeded) must have p=1.
* GlassBlur is approximated by iterated local pixel displacement with the
  same sigma/max_delta parameters (the exact albumentations algorithm is a
  sequential gather loop; the approximation matches its blur statistics).
"""

from __future__ import annotations

import math
import os
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.ops import resize_bilinear, resize_nearest

Pair = Tuple[float, float]


def _stratify_enabled() -> bool:
    """Batched stratified branch execution (see ``OneOf.batched``).
    ``ISLT_NO_STRATIFIED_ONEOF=1`` falls back to per-image selection
    (exact albumentations marginals, but every branch computes for every
    image under vmap — the A/B harness and bit-parity escape hatch)."""
    return not os.environ.get("ISLT_NO_STRATIFIED_ONEOF")


def _apportion(n: int, weights: Sequence[float]) -> List[int]:
    """Largest-remainder apportionment of ``n`` slots over ``weights``
    (deterministic, trace-time: group sizes must be static under jit).
    ``|counts[i]/n - w_i| < 1/n`` — the marginal quantization bound."""
    total = float(sum(weights))
    quotas = [n * w / total for w in weights]
    counts = [int(q) for q in quotas]
    rem = n - sum(counts)
    order = sorted(range(len(weights)), key=lambda i: quotas[i] - counts[i],
                   reverse=True)
    for i in order[:rem]:
        counts[i] += 1
    return counts


def _stratify_representable(n: int, weights: Sequence[float]) -> bool:
    """A stratified execution is only faithful when every branch with
    nonzero weight gets at least one slot — otherwise quantization would
    deterministically KILL that branch (e.g. ISONoise p=0.1 at batch 4:
    quota 0.4 → 0 slots in every batch, the augmentation silently never
    fires) or force an always-on branch.  Callers fall back to exact
    per-image selection in that case."""
    counts = _apportion(n, weights)
    return all(c > 0 for c, w in zip(counts, weights) if w > 1e-9)


def _vmap_transform(fn, key, imgs, masks):
    """vmap a single-image ``(key, img, mask) -> (img, mask)`` function
    over the batch with per-image keys; handles the no-mask case (None is
    not vmappable as an argument)."""
    keys = jax.random.split(key, imgs.shape[0])
    if masks is None:
        return jax.vmap(lambda k, i: fn(k, i, None)[0])(keys, imgs), None
    return jax.vmap(fn)(keys, imgs, masks)


def _stratified_branches(key, imgs, masks, branch_fns, weights):
    """Execute mutually-exclusive branches on static-size sub-batches.

    A random device-side permutation assigns each image to one branch;
    branch ``i`` gets a contiguous slice of ``_apportion(n, weights)[i]``
    images (static size — jit-compatible), is applied *unconditionally*
    (vmapped over its sub-batch only), and the inverse permutation restores
    batch order (evaluators match images to metadata by index).

    ``branch_fns[i] is None`` means identity.  Per-image marginals are
    ``counts[i]/n`` — within ``1/n`` of the exact weights (the price of
    static shapes); assignment is uniform over images via the permutation.
    """
    n = imgs.shape[0]
    counts = _apportion(n, weights)
    k_perm, k_apply = jax.random.split(key)
    perm = jax.random.permutation(k_perm, n)
    inv = jnp.argsort(perm)
    imgs_p = jnp.take(imgs, perm, axis=0)
    masks_p = None if masks is None else jnp.take(masks, perm, axis=0)
    out_i, out_m = [], []
    off = 0
    for bi, (fn, c) in enumerate(zip(branch_fns, counts)):
        if c == 0:
            continue
        sub_i = imgs_p[off:off + c]
        sub_m = None if masks_p is None else masks_p[off:off + c]
        if fn is None:
            oi, om = sub_i, sub_m
        else:
            oi, om = _vmap_transform(fn, jax.random.fold_in(k_apply, bi),
                                     sub_i, sub_m)
        out_i.append(oi)
        out_m.append(om)
        off += c
    imgs_o = jnp.concatenate(out_i, axis=0) if len(out_i) > 1 else out_i[0]
    imgs_o = jnp.take(imgs_o, inv, axis=0)
    if masks is None:
        return imgs_o, None
    masks_o = (jnp.concatenate(out_m, axis=0) if len(out_m) > 1
               else out_m[0])
    return imgs_o, jnp.take(masks_o, inv, axis=0)


def _uniform(key, lo, hi):
    return jax.random.uniform(key, (), jnp.float32, lo, hi)


def _apply_p(key, p, new_img, new_mask, img, mask):
    if p >= 1.0:
        return new_img, new_mask
    gate = jax.random.bernoulli(key, p)
    out_img = jnp.where(gate, new_img, img)
    out_mask = None if mask is None else jnp.where(gate, new_mask, mask)
    return out_img, out_mask


class Transform:
    """Base transform; subclasses set fields from YAML kwargs."""

    p: float = 0.5

    def __init__(self, p: float = 0.5, **kwargs):
        self.p = float(p)
        self._extra = kwargs  # unknown albumentations fields are ignored

    def output_shape(self, shape):
        return shape

    def apply(self, key, img, mask):
        raise NotImplementedError

    def __call__(self, key, img, mask):
        k_gate, k_params = jax.random.split(key)
        new_img, new_mask = self.apply(k_params, img, mask)
        if new_img.shape != img.shape:
            assert self.p >= 1.0, (
                f"{type(self).__name__} changes shape; requires p=1")
            return new_img, new_mask
        return _apply_p(k_gate, self.p, new_img, new_mask, img, mask)

    # -- batched application ------------------------------------------------
    # The Pipeline applies the root transform to the whole batch through
    # ``batched``.  The default is vmap-of-__call__ (identical semantics to
    # per-image application); containers override it to execute branches
    # stratified — computing each branch only on the sub-batch that selected
    # it instead of computing every branch for every image (under vmap,
    # lax.switch/select evaluates ALL branches per lane: the Kvasir YAML's
    # geometric OneOf paid Rotate's full gather for the 2/3 of images that
    # only flip).

    def force_apply(self, key, img, mask):
        """Apply unconditionally — a container (OneOf) picked this
        transform, so its own ``p`` gate is bypassed (albumentations'
        ``force_apply=True`` semantics).  Containers override this to
        bypass only their *own* gate, not their children's."""
        return self.apply(key, img, mask)

    def batched(self, key, imgs, masks):
        """Apply to a batch (per-image keys).  Default: vmap of __call__,
        except that a shape-preserving p<1 transform is executed
        stratified (it runs only on a ``round(n*p)``-sized random
        sub-batch) when enabled."""
        weights = [self.p, 1.0 - self.p]
        if (self.p < 1.0 and _stratify_enabled() and imgs.shape[0] > 1
                and _stratify_representable(imgs.shape[0], weights)
                and self.output_shape(imgs.shape[1:])
                == tuple(imgs.shape[1:])):
            return _stratified_branches(
                key, imgs, masks, [self.force_apply, None], weights)
        return _vmap_transform(self.__call__, key, imgs, masks)


class Compose(Transform):
    def __init__(self, transforms: List[Transform], p: float = 1.0, **kw):
        super().__init__(p=p)
        self.transforms = transforms

    def output_shape(self, shape):
        for t in self.transforms:
            shape = t.output_shape(shape)
        return shape

    def __call__(self, key, img, mask):
        out_img, out_mask = img, mask
        for i, t in enumerate(self.transforms):
            out_img, out_mask = t(jax.random.fold_in(key, i), out_img,
                                  out_mask)
        if self.p >= 1.0:
            return out_img, out_mask
        # nested Compose with p<1 skips the whole block with prob 1-p
        # (albumentations semantics); requires shape-preserving children
        assert out_img.shape == img.shape, (
            "Compose with p<1 must not change shapes")
        return _apply_p(jax.random.fold_in(key, len(self.transforms)),
                        self.p, out_img, out_mask, img, mask)

    def force_apply(self, key, img, mask):
        # bypass the Compose's own gate; children keep their own p gates
        # (albumentations Compose(force_apply=True) semantics)
        for i, t in enumerate(self.transforms):
            img, mask = t(jax.random.fold_in(key, i), img, mask)
        return img, mask

    def batched(self, key, imgs, masks):
        if self.p < 1.0:
            # rare; keep exact per-image semantics for the gated block
            return _vmap_transform(self.__call__, key, imgs, masks)
        for i, t in enumerate(self.transforms):
            imgs, masks = t.batched(jax.random.fold_in(key, i), imgs, masks)
        return imgs, masks


class OneOf(Transform):
    """Pick one child weighted by its p, then apply it unconditionally
    (albumentations OneOf semantics), all gated by the OneOf's own p."""

    def __init__(self, transforms: List[Transform], p: float = 1.0, **kw):
        super().__init__(p=p)
        self.transforms = transforms
        ps = np.asarray([t.p for t in transforms], np.float32)
        self.probs = ps / ps.sum()

    def apply(self, key, img, mask):
        k_choice, k_t = jax.random.split(key)
        idx = jax.random.choice(k_choice, len(self.transforms),
                                p=jnp.asarray(self.probs))
        branches = [
            (lambda t: lambda operands: t.force_apply(*operands))(t)
            for t in self.transforms
        ]
        return jax.lax.switch(idx, branches, (k_t, img, mask))

    def batched(self, key, imgs, masks):
        """Stratified batched OneOf: each child runs only on the sub-batch
        that selected it.  Under vmap the per-image ``lax.switch`` computes
        EVERY branch for EVERY image and selects — e.g. the Kvasir YAML's
        geometric OneOf paid Rotate's full-batch patch gather (96 ms at
        8x640^2) when only ~1/3 of images rotate.  Falls back to the exact
        per-image path when disabled or for degenerate batches."""
        fns = [t.force_apply for t in self.transforms]
        weights = [float(w) for w in self.probs]
        if self.p < 1.0:  # OneOf itself gated: identity branch
            weights = [w * self.p for w in weights] + [1.0 - self.p]
            fns = fns + [None]
        if (not _stratify_enabled() or imgs.shape[0] <= 1
                or not _stratify_representable(imgs.shape[0], weights)):
            return _vmap_transform(self.__call__, key, imgs, masks)
        for t in self.transforms:
            assert t.output_shape(imgs.shape[1:]) == tuple(imgs.shape[1:]), (
                f"OneOf child {type(t).__name__} changes shape")
        return _stratified_branches(key, imgs, masks, fns, weights)


class Resize(Transform):
    def __init__(self, height: int, width: int, interpolation: int = 1,
                 mask_interpolation: int = 0, p: float = 1.0, **kw):
        super().__init__(p=p)
        self.height, self.width = int(height), int(width)
        # 0 = nearest, 1 = bilinear; other cv2 codes (cubic/area/lanczos)
        # are not implemented — fail loudly instead of silently coercing
        assert interpolation in (0, 1) and mask_interpolation in (0, 1), (
            f"only nearest(0)/bilinear(1) interpolation is implemented, got "
            f"{interpolation}/{mask_interpolation}")
        self.interpolation = interpolation
        self.mask_interpolation = mask_interpolation

    def output_shape(self, shape):
        return (self.height, self.width) + tuple(shape[2:])

    def apply(self, key, img, mask):
        size = (self.height, self.width)
        if img.shape[:2] == size and (mask is None
                                      or mask.shape[:2] == size):
            # cv2.resize to the same size is the identity for both
            # interpolations; skip the separable interp matmuls (the
            # loader pre-resizes, so the fused pipeline always hits this)
            return img, mask
        img4 = img[None]
        img = (resize_bilinear(img4, size) if self.interpolation != 0
               else resize_nearest(img4, size))[0]
        if mask is not None:
            m4 = mask[None, ..., None]
            m4 = (resize_nearest(m4, size) if self.mask_interpolation == 0
                  else resize_bilinear(m4, size))
            mask = m4[0, ..., 0]
        return img, mask


class HorizontalFlip(Transform):
    def apply(self, key, img, mask):
        return img[:, ::-1, :], (mask[:, ::-1] if mask is not None else None)


class VerticalFlip(Transform):
    def apply(self, key, img, mask):
        return img[::-1, :, :], (mask[::-1, :] if mask is not None else None)


def _border_index(i, n, border_mode):
    """Map an out-of-range index onto [0, n) per the cv2 border mode.

    0=CONSTANT handled by the caller (mask + fill); 1=REPLICATE clamps;
    2=REFLECT (gfedcb|abcdefgh|gfedcba) has period 2n;
    4=REFLECT_101 (gfedcb|abcdefgh|gfedcb) has period 2(n-1).
    """
    if border_mode == 1:
        return jnp.clip(i, 0, n - 1)
    if border_mode == 2:
        m = jnp.mod(i, 2 * n)
        return jnp.where(m >= n, 2 * n - 1 - m, m)
    if border_mode == 4:
        if n == 1:
            return jnp.zeros_like(i)
        m = jnp.mod(i, 2 * (n - 1))
        return jnp.where(m >= n, 2 * (n - 1) - m, m)
    raise AssertionError(f"unsupported cv2 border_mode {border_mode}")


def _pad_border(img, py: int, px: int, border_mode: int, fill):
    """Extend ``img`` by (py, px) on each side per the cv2 border mode.

    Returns None when the mode can't be realized as a single jnp.pad
    (reflect pads wider than size-1 need the periodic extension, which
    chunked padding does NOT reproduce) — callers fall back to per-tap
    index mapping."""
    spatial = ((py, py), (px, px)) + (((0, 0),) if img.ndim == 3 else ())
    if border_mode == 0:
        return jnp.pad(img, spatial, constant_values=fill)
    if border_mode == 1:
        return jnp.pad(img, spatial, mode="edge")
    mode = "symmetric" if border_mode == 2 else "reflect"
    lim = 1 if mode == "symmetric" else 2  # np reflect needs size-1 ≥ pad
    if py > img.shape[0] - lim or px > img.shape[1] - lim:
        return None
    return jnp.pad(img, spatial, mode=mode)


def _gather_patches(padded, y0, x0, size: int):
    """All (size,size[,C]) patches of ``padded`` at start coords (y0, x0)
    in ONE XLA gather — the TPU-side cost of an arbitrary 2-D warp is the
    per-index slice count, so one patch gather beats 4 per-tap gathers
    (measured 174 → 36 ms for 8×640² Rotate)."""
    chan = padded.ndim == 3
    arr = padded if chan else padded[..., None]
    hp, wp = arr.shape[0], arr.shape[1]
    starts = jnp.stack([jnp.clip(y0, 0, hp - size),
                        jnp.clip(x0, 0, wp - size)], axis=-1)
    starts = starts.reshape(-1, 2)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1))
    sizes = (size, size, arr.shape[2])
    out = jax.lax.gather(
        arr, starts, dnums, sizes,
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
    out = out.reshape(y0.shape + sizes)
    return out if chan else out[..., 0]


def _affine_src_coords(H, W, inv_matrix, center):
    """(src_y, src_x) sample coordinates for the (H, W) output grid."""
    ys = jnp.arange(H, dtype=jnp.float32) - center[0]
    xs = jnp.arange(W, dtype=jnp.float32) - center[1]
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    src_y = inv_matrix[0, 0] * yy + inv_matrix[0, 1] * xx + center[0]
    src_x = inv_matrix[1, 0] * yy + inv_matrix[1, 1] * xx + center[1]
    return src_y, src_x


def _corner_pad(H, W):
    """Static per-axis pad covering the farthest source coordinate any
    rotation of the (H, W) grid can sample (its corner radius), +2 slack
    for the floor/+1 bilinear taps."""
    rad = math.hypot((H - 1) / 2.0, (W - 1) / 2.0)
    py = max(int(math.ceil(rad - (H - 1) / 2.0)) + 2, 2)
    px = max(int(math.ceil(rad - (W - 1) / 2.0)) + 2, 2)
    return py, px


def _affine_sample(img, inv_matrix, center, fill, nearest=False,
                   border_mode=0):
    """Sample img at inverse-affine-transformed coordinates (H,W grid).

    ``border_mode`` follows cv2: 0=constant(fill), 1=replicate, 2=reflect,
    4=reflect_101 (albumentations' Rotate default).

    The border is realized by STATICALLY padding the source out to the
    output grid's corner radius (the farthest any rotation can sample),
    after which all four bilinear taps of a pixel are one contiguous 2x2
    patch — fetched by a single gather (see ``_gather_patches``).  Values
    are identical to per-tap border-mapped lookups.
    """
    H, W = img.shape[0], img.shape[1]
    chan = img.ndim == 3
    src_y, src_x = _affine_src_coords(H, W, inv_matrix, center)
    py, px = _corner_pad(H, W)
    padded = _pad_border(img, py, px, border_mode, fill)
    if padded is not None:
        if nearest:
            p = _gather_patches(padded,
                                jnp.round(src_y).astype(jnp.int32) + py,
                                jnp.round(src_x).astype(jnp.int32) + px, 1)
            return p[..., 0, 0, :] if chan else p[..., 0, 0]
        y0 = jnp.floor(src_y).astype(jnp.int32)
        x0 = jnp.floor(src_x).astype(jnp.int32)
        wy = src_y - y0
        wx = src_x - x0
        p = _gather_patches(padded, y0 + py, x0 + px, 2)
        out = 0.0
        # accumulation order matches the per-tap loop below exactly
        for dy, wyy in ((0, 1 - wy), (1, wy)):
            for dx, wxx in ((0, 1 - wx), (1, wx)):
                v = p[:, :, dy, dx, :] if chan else p[:, :, dy, dx]
                w = wyy * wxx
                out = out + v * (w[..., None] if chan else w)
        return out

    # fallback for extreme aspect ratios where a reflect pad would need the
    # periodic extension: per-tap border-mapped gathers (slow path)
    def lookup(iy, ix):
        if border_mode == 0:
            inb = (iy >= 0) & (iy < H) & (ix >= 0) & (ix < W)
            v = img[jnp.clip(iy, 0, H - 1), jnp.clip(ix, 0, W - 1)]
            return jnp.where(inb[..., None] if chan else inb, v, fill)
        return img[_border_index(iy, H, border_mode),
                   _border_index(ix, W, border_mode)]

    if nearest:
        return lookup(jnp.round(src_y).astype(jnp.int32),
                      jnp.round(src_x).astype(jnp.int32))
    y0 = jnp.floor(src_y).astype(jnp.int32)
    x0 = jnp.floor(src_x).astype(jnp.int32)
    wy = src_y - y0
    wx = src_x - x0
    out = 0.0
    for dy, wyy in ((0, 1 - wy), (1, wy)):
        for dx, wxx in ((0, 1 - wx), (1, wx)):
            v = lookup(y0 + dy, x0 + dx)
            w = (wyy * wxx)
            out = out + v * (w[..., None] if chan else w)
    return out


def _affine_sample_pair(img, mask, inv_matrix, center, fill, fill_mask,
                        border_mode):
    """Bilinear-warp ``img`` and nearest-warp ``mask`` with ONE patch
    gather: the mask rides as a 4th channel (padded with its own fill) and
    its nearest tap is selected from the same 2x2 patch with exact
    ``jnp.round`` (round-half-even) semantics.  Falls back to two
    ``_affine_sample`` calls when the border pad can't be materialized.
    """
    H, W = img.shape[0], img.shape[1]
    py, px = _corner_pad(H, W)
    p_img = _pad_border(img, py, px, border_mode, fill)
    p_mask = _pad_border(mask, py, px, border_mode, fill_mask)
    if p_img is None or p_mask is None:
        # keep the mask dtype identical to the fused branch (the where
        # promotion in the fallback otherwise yields float32)
        return (_affine_sample(img, inv_matrix, center, fill,
                               border_mode=border_mode),
                _affine_sample(mask, inv_matrix, center, fill_mask,
                               nearest=True, border_mode=border_mode)
                .astype(mask.dtype))
    stacked = jnp.concatenate(
        [p_img, p_mask[..., None].astype(p_img.dtype)], axis=-1)

    src_y, src_x = _affine_src_coords(H, W, inv_matrix, center)
    y0 = jnp.floor(src_y).astype(jnp.int32)
    x0 = jnp.floor(src_x).astype(jnp.int32)
    wy = src_y - y0
    wx = src_x - x0
    p = _gather_patches(stacked, y0 + py, x0 + px, 2)

    out = 0.0
    for dy, wyy in ((0, 1 - wy), (1, wy)):
        for dx, wxx in ((0, 1 - wx), (1, wx)):
            out = out + p[:, :, dy, dx, :-1] * (wyy * wxx)[..., None]

    def round_up(frac, base):
        # jnp.round(base + frac) == base + round_up: half rounds to even
        return (frac > 0.5) | ((frac == 0.5) & (base % 2 != 0))

    sy = round_up(wy, y0).astype(jnp.int32)
    sx = round_up(wx, x0).astype(jnp.int32)
    m_out = jnp.where(sy == 0,
                      jnp.where(sx == 0, p[:, :, 0, 0, -1],
                                p[:, :, 0, 1, -1]),
                      jnp.where(sx == 0, p[:, :, 1, 0, -1],
                                p[:, :, 1, 1, -1]))
    return out, m_out.astype(mask.dtype)


class Rotate(Transform):
    # border_mode default matches albumentations 2.0.6's Rotate
    # (cv2.BORDER_CONSTANT = 0): the reference's own serialized configs
    # (configs/augmentation/*.yaml, `__version__: 2.0.6`, generated with no
    # explicit border_mode) record `border_mode: 0` — a YAML relying on the
    # library default must get constant-fill corners, not reflection
    def __init__(self, limit=(-90, 90), interpolation: int = 1,
                 border_mode: int = 0, fill: float = 0.0,
                 fill_mask: float = 0.0, mask_interpolation: int = 0,
                 p: float = 0.5, **kw):
        super().__init__(p=p)
        self.limit = (limit, -limit) if isinstance(limit, (int, float)) \
            else tuple(limit)
        # the fused patch-gather warp implements bilinear image taps +
        # nearest mask taps (the albumentations defaults) — fail loudly on
        # other cv2 codes instead of silently warping differently
        assert interpolation == 1 and mask_interpolation == 0, (
            f"only interpolation=1 (bilinear) with mask_interpolation=0 "
            f"(nearest) is implemented, got {interpolation}/"
            f"{mask_interpolation}")
        assert border_mode in (0, 1, 2, 4), (
            f"unsupported cv2 border_mode {border_mode}")
        self.border_mode = int(border_mode)
        self.fill = fill
        self.fill_mask = fill_mask

    def apply(self, key, img, mask):
        lo, hi = min(self.limit), max(self.limit)
        angle = _uniform(key, lo, hi) * math.pi / 180.0
        c, s = jnp.cos(angle), jnp.sin(angle)
        # cv2/albumentations: positive angle = counter-clockwise in image
        # coords (y down); sampling at R(+angle) of the output grid realizes
        # the CCW forward map (verified against cv2.getRotationMatrix2D)
        inv = jnp.array([[c, s], [-s, c]])
        center = ((img.shape[0] - 1) / 2.0, (img.shape[1] - 1) / 2.0)
        if mask is not None:
            return _affine_sample_pair(img, mask, inv, center, self.fill,
                                       self.fill_mask, self.border_mode)
        return _affine_sample(img, inv, center, self.fill,
                              border_mode=self.border_mode), None


class RandomCrop(Transform):
    def __init__(self, height: int, width: int, p: float = 1.0, **kw):
        super().__init__(p=p)
        self.height, self.width = int(height), int(width)

    def output_shape(self, shape):
        return (self.height, self.width) + tuple(shape[2:])

    def apply(self, key, img, mask):
        H, W = img.shape[0], img.shape[1]
        ky, kx = jax.random.split(key)
        y0 = jax.random.randint(ky, (), 0, max(H - self.height, 0) + 1)
        x0 = jax.random.randint(kx, (), 0, max(W - self.width, 0) + 1)
        img = jax.lax.dynamic_slice(
            img, (y0, x0, 0), (self.height, self.width, img.shape[2]))
        if mask is not None:
            mask = jax.lax.dynamic_slice(mask, (y0, x0),
                                         (self.height, self.width))
        return img, mask


_CV2_BORDER_TO_JNP = {0: "constant", 1: "edge", 2: "symmetric",
                      4: "reflect"}


class PadIfNeeded(Transform):
    """albumentations defaults: border_mode=4 (BORDER_REFLECT_101) and
    mask padding 0, not ignore."""

    def __init__(self, min_height: int, min_width: int, fill: float = 0.0,
                 fill_mask: float = 0.0, border_mode: int = 4,
                 p: float = 1.0, **kw):
        super().__init__(p=p)
        self.min_height, self.min_width = int(min_height), int(min_width)
        self.fill, self.fill_mask = fill, fill_mask
        assert border_mode in _CV2_BORDER_TO_JNP, (
            f"unsupported cv2 border_mode {border_mode}")
        self.mode = _CV2_BORDER_TO_JNP[border_mode]

    def output_shape(self, shape):
        return (max(shape[0], self.min_height),
                max(shape[1], self.min_width)) + tuple(shape[2:])

    def apply(self, key, img, mask):
        ph = max(self.min_height - img.shape[0], 0)
        pw = max(self.min_width - img.shape[1], 0)
        pads_img = ((ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2), (0, 0))
        pads_mask = pads_img[:2]
        if self.mode == "constant":
            img = jnp.pad(img, pads_img, constant_values=self.fill)
            if mask is not None:
                mask = jnp.pad(mask, pads_mask,
                               constant_values=self.fill_mask)
        else:
            img = jnp.pad(img, pads_img, mode=self.mode)
            if mask is not None:
                mask = jnp.pad(mask, pads_mask, mode=self.mode)
        return img, mask


_SHIFT_SUM_MAX_TAPS = 512


def _depthwise_blur(img, kernel2d):
    """Apply a (K,K) kernel per-channel on an (H,W,C) image.

    Borders use reflect-101 padding (cv2's BORDER_DEFAULT, which
    albumentations' blurs inherit) — zero padding would darken edges.

    For small kernels (every aug blur: K ≤ 21, ≤ 441 taps) the correlation
    is computed as a shifted-add — one full-array FMA per tap over the
    statically-sliced reflect-padded source.  A 3-channel depthwise conv
    runs the VPU at 3/128 lane utilization (docs/PERF.md cost model); the
    shifted-add form uses full lanes, the same pattern that took
    GlassBlur's displacement from 95 to 5 ms.  Same taps, same padding —
    only the accumulation order differs from the conv.
    """
    kh, kw = kernel2d.shape
    ph, pw = kh // 2, kw // 2
    x = jnp.pad(img, ((ph, ph), (pw, pw), (0, 0)), mode="reflect")
    if kh * kw <= _SHIFT_SUM_MAX_TAPS:
        H, W, C = img.shape
        out = jnp.zeros_like(img)
        for dy in range(kh):
            for dx in range(kw):
                tap = jax.lax.slice(x, (dy, dx, 0), (dy + H, dx + W, C))
                out = out + kernel2d[dy, dx] * tap
        return out
    x = x[None]
    k = kernel2d[:, :, None, None]  # HWIO with I=1
    out = jax.lax.conv_general_dilated(
        x, jnp.tile(k, (1, 1, 1, x.shape[-1])),
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=jax.lax.conv_dimension_numbers(
            x.shape, (kh, kw, 1, x.shape[-1]), ("NHWC", "HWIO", "NHWC")),
        feature_group_count=x.shape[-1])
    return out[0]


def _masked_box_kernel(key, kmax: int, kmin: int, kmax_lim: int):
    """Random odd-size box kernel embedded in a static (kmax,kmax) grid."""
    # random odd size in [kmin, kmax_lim]
    n_sizes = (kmax_lim - kmin) // 2 + 1
    size = kmin + 2 * jax.random.randint(key, (), 0, n_sizes)
    r = (size - 1) // 2
    c = kmax // 2
    ii = jnp.abs(jnp.arange(kmax) - c)
    inside = (ii[:, None] <= r) & (ii[None, :] <= r)
    kernel = inside.astype(jnp.float32)
    return kernel / jnp.sum(kernel)


class Blur(Transform):
    def __init__(self, blur_limit=(3, 7), p: float = 0.5, **kw):
        super().__init__(p=p)
        lim = ((3, blur_limit) if isinstance(blur_limit, (int, float))
               else tuple(int(v) for v in blur_limit))
        self.kmin = max(int(lim[0]) | 1, 3)
        self.kmax = int(lim[1]) | 1

    def apply(self, key, img, mask):
        kernel = _masked_box_kernel(key, self.kmax, self.kmin, self.kmax)
        return _depthwise_blur(img, kernel), mask


class GaussianBlur(Transform):
    """albumentations semantics: sample an odd ksize from ``blur_limit``;
    when ``sigma_limit`` is 0, sigma follows cv2's getGaussianKernel
    formula ``0.3*((ksize-1)*0.5 - 1) + 0.8``, else uniform from the
    limit.  The sampled kernel is embedded in a static (kmax,kmax) grid
    (jit-friendly) by zeroing taps beyond its radius."""

    def __init__(self, blur_limit=(3, 7), sigma_limit=(0.0, 0.0),
                 p: float = 0.5, **kw):
        super().__init__(p=p)
        lim = ((3, blur_limit) if isinstance(blur_limit, (int, float))
               else tuple(int(v) for v in blur_limit))
        self.kmin = max(int(lim[0]) | 1, 3)
        self.kmax = int(lim[1]) | 1
        if self.kmax < self.kmin:
            # albumentations' blur_limit=0 means "derive ksize from sigma"
            # — not implemented; reject at construction instead of an
            # obscure trace-time crash (empty kernel table / randint(0,0))
            raise ValueError(
                f"GaussianBlur blur_limit={blur_limit} resolves to an "
                f"empty kernel-size range [{self.kmin}, {self.kmax}]; "
                f"sigma-derived kernel sizes (blur_limit=0) are not "
                f"implemented — give an explicit odd range like (3, 7)")
        self.sigma_limit = ((0.0, sigma_limit) if isinstance(
            sigma_limit, (int, float)) else tuple(sigma_limit))

    # cv2 getGaussianKernel(ksize, sigma<=0) returns these fixed binomial
    # kernels for ksize<=7; the 0.3*((k-1)*0.5-1)+0.8 formula is only
    # used beyond that
    _CV2_SMALL_GAUSS = {
        1: [1.0],
        3: [0.25, 0.5, 0.25],
        5: [0.0625, 0.25, 0.375, 0.25, 0.0625],
        7: [0.03125, 0.109375, 0.21875, 0.28125, 0.21875, 0.109375,
            0.03125]}

    def _sigma0_row(self, ksize: int) -> np.ndarray:
        if ksize in self._CV2_SMALL_GAUSS:
            v = np.asarray(self._CV2_SMALL_GAUSS[ksize], np.float32)
        else:
            sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
            x = np.arange(ksize) - (ksize - 1) / 2.0
            v = np.exp(-0.5 * (x / sigma) ** 2).astype(np.float32)
            v /= v.sum()
        pad = (self.kmax - ksize) // 2
        return np.pad(v, (pad, pad))

    def apply(self, key, img, mask):
        k_size, k_sigma = jax.random.split(key)
        n_sizes = (self.kmax - self.kmin) // 2 + 1
        idx = jax.random.randint(k_size, (), 0, n_sizes)
        size = self.kmin + 2 * idx
        lo, hi = self.sigma_limit
        if hi <= 0:
            table = jnp.asarray(np.stack(
                [self._sigma0_row(s)
                 for s in range(self.kmin, self.kmax + 1, 2)]))
            g = table[idx]
            kernel = g[:, None] * g[None, :]
        else:
            sigma = _uniform(k_sigma, lo, hi)
            c = self.kmax // 2
            r = (size - 1) // 2
            xs = (jnp.arange(self.kmax) - c).astype(jnp.float32)
            g = jnp.where(jnp.abs(jnp.arange(self.kmax) - c) <= r,
                          jnp.exp(-0.5 * (xs / sigma) ** 2), 0.0)
            kernel = g[:, None] * g[None, :]
            kernel = kernel / jnp.sum(kernel)
        return _depthwise_blur(img, kernel), mask


class MotionBlur(Transform):
    """Line kernel at a random angle (albumentations MotionBlur), with
    the ``direction`` intensity ramp (weight 1 + direction·t along the
    line, t ∈ [-1,1]) and ``allow_shifted`` off-center line placement
    (line center uniformly offset within the kernel while keeping the
    full line inside the grid)."""

    def __init__(self, blur_limit=(3, 7), allow_shifted: bool = True,
                 direction_range=(-1.0, 1.0), p: float = 0.5, **kw):
        super().__init__(p=p)
        lim = ((3, blur_limit) if isinstance(blur_limit, (int, float))
               else tuple(int(v) for v in blur_limit))
        self.kmin = max(int(lim[0]) | 1, 3)
        self.kmax = int(lim[1]) | 1
        self.allow_shifted = bool(allow_shifted)
        self.direction_range = tuple(direction_range)

    def apply(self, key, img, mask):
        k_size, k_angle, k_dir, k_shift = jax.random.split(key, 4)
        n_sizes = (self.kmax - self.kmin) // 2 + 1
        size = self.kmin + 2 * jax.random.randint(k_size, (), 0, n_sizes)
        r = (size - 1) / 2.0
        angle = _uniform(k_angle, 0.0, math.pi)
        direction = _uniform(k_dir, *self.direction_range)
        c = self.kmax // 2
        cy = cx = jnp.float32(c)
        if self.allow_shifted:
            # offset the line center but keep both endpoints in-grid
            my = jnp.maximum(c - r * jnp.abs(jnp.sin(angle)), 0.0)
            mx = jnp.maximum(c - r * jnp.abs(jnp.cos(angle)), 0.0)
            sy, sx = jax.random.uniform(k_shift, (2,), jnp.float32, -1.0, 1.0)
            cy, cx = cy + sy * my, cx + sx * mx
        yy = jnp.arange(self.kmax)[:, None] - cy
        xx = jnp.arange(self.kmax)[None, :] - cx
        # perpendicular / signed along-line coordinates of each tap
        d_perp = jnp.abs(-jnp.sin(angle) * xx + jnp.cos(angle) * yy)
        t = jnp.cos(angle) * xx + jnp.sin(angle) * yy
        on_line = (d_perp <= 0.5) & (jnp.abs(t) <= r)
        ramp = jnp.maximum(1.0 + direction * t / jnp.maximum(r, 1.0), 0.0)
        kernel = jnp.where(on_line, ramp, 0.0)
        kernel = kernel / jnp.maximum(jnp.sum(kernel), 1e-6)
        return _depthwise_blur(img, kernel), mask


class Defocus(Transform):
    """Disk kernel + alias blur (albumentations Defocus)."""

    def __init__(self, radius=(3, 10), alias_blur=(0.1, 0.5), p: float = 0.5,
                 **kw):
        super().__init__(p=p)
        self.radius = (radius, radius) if isinstance(radius, int) else tuple(radius)
        self.alias_blur = tuple(alias_blur)
        self.kmax = 2 * int(self.radius[1]) + 1

    def apply(self, key, img, mask):
        k_r, k_a = jax.random.split(key)
        r = jax.random.randint(k_r, (), self.radius[0], self.radius[1] + 1)
        sigma = _uniform(k_a, *self.alias_blur)
        c = self.kmax // 2
        yy = jnp.arange(self.kmax)[:, None] - c
        xx = jnp.arange(self.kmax)[None, :] - c
        disk = (yy ** 2 + xx ** 2 <= r ** 2).astype(jnp.float32)
        # alias blur: small gaussian smoothing of the disk
        xs = (jnp.arange(5) - 2).astype(jnp.float32)
        g = jnp.exp(-0.5 * (xs / jnp.maximum(sigma, 1e-3)) ** 2)
        g2 = (g[:, None] * g[None, :])
        g2 = g2 / g2.sum()
        disk = _depthwise_blur(disk[:, :, None], g2)[:, :, 0]
        kernel = disk / jnp.maximum(disk.sum(), 1e-6)
        return _depthwise_blur(img, kernel), mask


class GlassBlur(Transform):
    """imagecorruptions-style glass blur: gaussian(sigma) → ``iterations``
    rounds of random local pixel displacement within ``max_delta`` →
    gaussian(sigma).  The gaussian kernel uses scipy's truncate=4 radius.
    Approximation vs albumentations: the displacement is a parallel
    gather rather than the sequential in-place pixel swap (same local
    shuffle statistics, jit-friendly)."""

    def __init__(self, sigma: float = 0.7, max_delta: int = 4,
                 iterations: int = 2, p: float = 0.5, mode: str = "fast",
                 **kw):
        super().__init__(p=p)
        self.sigma = sigma
        self.max_delta = int(max_delta)
        self.iterations = int(iterations)

    def _gauss_kernel(self):
        # scipy gaussian_filter default truncate=4.0: radius = 4σ + 0.5
        r = max(int(4.0 * self.sigma + 0.5), 1)
        xs = jnp.arange(-r, r + 1, dtype=jnp.float32)
        g = jnp.exp(-0.5 * (xs / self.sigma) ** 2)
        return g / g.sum()

    def _blur(self, img):
        """Separable gaussian: two 1-D depthwise convs.  scipy's
        gaussian_filter is itself separable, so this matches the
        reference numerics; the dense (2r+1)² kernel at σ=2.5 (21×21) was
        the pipeline's #2 cost (3-lane depthwise conv, 441 taps → 42)."""
        g = self._gauss_kernel()
        return _depthwise_blur(_depthwise_blur(img, g[:, None]),
                               g[None, :])

    def apply(self, key, img, mask):
        H, W = img.shape[0], img.shape[1]
        d = self.max_delta
        # imagecorruptions glass_blur: gaussian FIRST, then displacement
        # rounds, then a final gaussian
        out = self._blur(img)
        for i in range(self.iterations):
            k = jax.random.fold_in(key, i)
            # np.random.randint has an exclusive high bound: [-d, d)
            dy, dx = jax.random.randint(k, (2, H, W), -d, d)
            if (2 * d) ** 2 <= 100:
                # the displacement is bounded, so the per-pixel gather
                # (slow on TPU: arbitrary 2-D gather, measured 95 ms at
                # 8x640^2) is a select-sum over the (2d)^2 statically
                # shifted copies — pure VPU work (5 ms), identical values.
                # Edge clamping == 'edge' padding + static slicing.
                pe = jnp.pad(out, ((d, d), (d, d), (0, 0)), mode="edge")
                code = (dy + d) * (2 * d) + (dx + d)
                acc = jnp.zeros_like(out)
                for a in range(-d, d):
                    for b in range(-d, d):
                        m = code == (a + d) * (2 * d) + (b + d)
                        acc = acc + jnp.where(
                            m[..., None],
                            jax.lax.slice(
                                pe, (d + a, d + b, 0),
                                (d + a + H, d + b + W, pe.shape[2])),
                            0.0)
                out = acc
            else:
                # large max_delta: the unrolled select-sum graph would be
                # O(d^2) ops; the single gather is the better trade
                iy = jnp.clip(jnp.arange(H)[:, None] + dy, 0, H - 1)
                ix = jnp.clip(jnp.arange(W)[None, :] + dx, 0, W - 1)
                out = out[iy, ix]
        return self._blur(out), mask


class RandomBrightnessContrast(Transform):
    def __init__(self, brightness_limit=(-0.2, 0.2),
                 contrast_limit=(-0.2, 0.2), brightness_by_max: bool = True,
                 p: float = 0.5, **kw):
        super().__init__(p=p)
        self.brightness_limit = tuple(brightness_limit) if isinstance(
            brightness_limit, (list, tuple)) else (-brightness_limit,
                                                   brightness_limit)
        self.contrast_limit = tuple(contrast_limit) if isinstance(
            contrast_limit, (list, tuple)) else (-contrast_limit,
                                                 contrast_limit)
        self.brightness_by_max = brightness_by_max

    def apply(self, key, img, mask):
        kb, kc = jax.random.split(key)
        alpha = 1.0 + _uniform(kc, *self.contrast_limit)
        beta = _uniform(kb, *self.brightness_limit)
        # albumentations' uint8 LUT uses the ORIGINAL image mean when
        # brightness_by_max=False — compute it before contrast scaling
        mean_val = jnp.mean(img)
        img = img * alpha
        if self.brightness_by_max:
            img = img + beta * 255.0
        else:
            img = img + beta * mean_val
        return jnp.clip(img, 0.0, 255.0), mask


class RandomGamma(Transform):
    def __init__(self, gamma_limit=(80, 120), p: float = 0.5, **kw):
        super().__init__(p=p)
        self.gamma_limit = tuple(gamma_limit)

    def apply(self, key, img, mask):
        gamma = _uniform(key, *self.gamma_limit) / 100.0
        img = 255.0 * (jnp.maximum(img / 255.0, 1e-8) ** gamma)
        return jnp.clip(img, 0.0, 255.0), mask


def _rgb_to_hsv(img):
    """Vectorized RGB→HSV over (..., 3) arrays in [0,1]; H in degrees."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    mx = jnp.max(img, axis=-1)
    mn = jnp.min(img, axis=-1)
    d = mx - mn
    safe_d = jnp.maximum(d, 1e-8)
    h = jnp.where(mx == r, ((g - b) / safe_d) % 6.0,
                  jnp.where(mx == g, (b - r) / safe_d + 2.0,
                            (r - g) / safe_d + 4.0))
    h = jnp.where(d == 0, 0.0, h) * 60.0
    s = jnp.where(mx == 0, 0.0, d / jnp.maximum(mx, 1e-8))
    return jnp.stack([h, s, mx], axis=-1)


def _hsv_to_rgb(hsv):
    """Vectorized HSV→RGB (H in degrees)."""
    h = (hsv[..., 0] % 360.0) / 60.0
    s, v = hsv[..., 1], hsv[..., 2]
    c = v * s
    x = c * (1 - jnp.abs(h % 2 - 1))
    m = v - c
    idx = jnp.floor(h).astype(jnp.int32) % 6
    z = jnp.zeros_like(c)
    conds = [idx == k for k in range(6)]
    r = jnp.select(conds, [c, x, z, z, x, c])
    g = jnp.select(conds, [x, c, c, x, z, z])
    b = jnp.select(conds, [z, z, x, c, c, x])
    return jnp.stack([r + m, g + m, b + m], axis=-1)


class HueSaturationValue(Transform):
    def __init__(self, hue_shift_limit=(-20, 20), sat_shift_limit=(-30, 30),
                 val_shift_limit=(-20, 20), p: float = 0.5, **kw):
        super().__init__(p=p)
        def _pair(v):
            return tuple(v) if isinstance(v, (list, tuple)) else (-v, v)
        self.hue_shift_limit = _pair(hue_shift_limit)
        self.sat_shift_limit = _pair(sat_shift_limit)
        self.val_shift_limit = _pair(val_shift_limit)

    def apply(self, key, img, mask):
        kh, ks, kv = jax.random.split(key, 3)
        hshift = _uniform(kh, *self.hue_shift_limit)      # degrees-ish (cv2 ~2°)
        sshift = _uniform(ks, *self.sat_shift_limit)
        vshift = _uniform(kv, *self.val_shift_limit)
        hsv = _rgb_to_hsv(img / 255.0)
        h = (hsv[..., 0] + hshift * 2.0) % 360.0  # cv2 hue unit = 2 degrees
        s = jnp.clip(hsv[..., 1] + sshift / 255.0, 0.0, 1.0)
        v = jnp.clip(hsv[..., 2] + vshift / 255.0, 0.0, 1.0)
        out = _hsv_to_rgb(jnp.stack([h, s, v], axis=-1)) * 255.0
        return jnp.clip(out, 0.0, 255.0), mask


def _rgb_to_hls(img):
    """Vectorized RGB→HLS over (..., 3) arrays in [0,1]; H in degrees."""
    mx = jnp.max(img, axis=-1)
    mn = jnp.min(img, axis=-1)
    d = mx - mn
    light = (mx + mn) / 2.0
    h = _rgb_to_hsv(img)[..., 0]  # hue is identical in HSV and HLS
    denom = 1.0 - jnp.abs(2.0 * light - 1.0)
    s = jnp.where(d == 0, 0.0, d / jnp.maximum(denom, 1e-8))
    return jnp.stack([h, light, s], axis=-1)


def _hls_to_rgb(hls):
    """Vectorized HLS→RGB (H in degrees)."""
    h = (hls[..., 0] % 360.0) / 60.0
    light, s = hls[..., 1], hls[..., 2]
    c = (1.0 - jnp.abs(2.0 * light - 1.0)) * s
    x = c * (1 - jnp.abs(h % 2 - 1))
    m = light - c / 2.0
    idx = jnp.floor(h).astype(jnp.int32) % 6
    z = jnp.zeros_like(c)
    conds = [idx == k for k in range(6)]
    r = jnp.select(conds, [c, x, z, z, x, c])
    g = jnp.select(conds, [x, c, c, x, z, z])
    b = jnp.select(conds, [z, z, x, c, c, x])
    return jnp.stack([r + m, g + m, b + m], axis=-1)


class ISONoise(Transform):
    """Camera sensor noise (albumentations iso_noise semantics): strictly
    positive Poisson noise — λ = std(HLS lightness)·intensity·255 — added
    to the lightness scaled by (1 − L), plus a gaussian hue shift of
    std = color_shift·intensity·360 degrees.  The Poisson draw is
    approximated by Normal(λ, √λ) clipped at 0 (jit-friendly; λ is tens
    at typical intensities, where the approximation is tight)."""

    def __init__(self, color_shift=(0.01, 0.05), intensity=(0.1, 0.5),
                 p: float = 0.5, **kw):
        super().__init__(p=p)
        self.color_shift = tuple(color_shift)
        self.intensity = tuple(intensity)

    def apply(self, key, img, mask):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        intensity = _uniform(k1, *self.intensity)
        color_shift = _uniform(k2, *self.color_shift)
        hls = _rgb_to_hls(img / 255.0)
        light = hls[..., 1]
        lam = jnp.std(light) * intensity * 255.0
        lum_noise = jnp.maximum(
            lam + jnp.sqrt(jnp.maximum(lam, 0.0))
            * jax.random.normal(k3, light.shape), 0.0)
        hue_noise = (jax.random.normal(k4, light.shape)
                     * color_shift * intensity * 360.0)
        h = (hls[..., 0] + hue_noise) % 360.0
        light = jnp.clip(light + (lum_noise / 255.0) * (1.0 - light),
                         0.0, 1.0)
        out = _hls_to_rgb(jnp.stack([h, light, hls[..., 2]], axis=-1))
        return jnp.clip(out * 255.0, 0.0, 255.0), mask


class Normalize(Transform):
    def __init__(self, mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225),
                 max_pixel_value: float = 255.0, p: float = 1.0, **kw):
        super().__init__(p=p)
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)
        self.max_pixel_value = max_pixel_value

    def apply(self, key, img, mask):
        mean = jnp.asarray(self.mean) * self.max_pixel_value
        std = jnp.asarray(self.std) * self.max_pixel_value
        return (img - mean) / std, mask


class ToTensorV2(Transform):
    """Layout no-op: the reference converts HWC→CHW for torch; the TPU build
    keeps channels-last (NHWC) end to end."""

    def __init__(self, p: float = 1.0, transpose_mask: bool = False, **kw):
        super().__init__(p=p)

    def apply(self, key, img, mask):
        return img, mask

    def __call__(self, key, img, mask):
        return img, mask


TRANSFORMS: Dict[str, Any] = {
    "Compose": Compose,
    "OneOf": OneOf,
    "Resize": Resize,
    "Rotate": Rotate,
    "HorizontalFlip": HorizontalFlip,
    "VerticalFlip": VerticalFlip,
    "RandomCrop": RandomCrop,
    "PadIfNeeded": PadIfNeeded,
    "Blur": Blur,
    "GaussianBlur": GaussianBlur,
    "MotionBlur": MotionBlur,
    "Defocus": Defocus,
    "GlassBlur": GlassBlur,
    "RandomBrightnessContrast": RandomBrightnessContrast,
    "RandomGamma": RandomGamma,
    "HueSaturationValue": HueSaturationValue,
    "ISONoise": ISONoise,
    "Normalize": Normalize,
    "ToTensorV2": ToTensorV2,
}
