"""Augmentation pipeline: albumentations-YAML → compiled batched transform.

The reference authors pipelines with ``A.save(..., data_format='yaml')``
(tools/create_augmentation_setting_file.py:90-92) and loads them with
``A.load`` (core/dataset/custom.py:88).  This module reads the **same YAML
files unchanged** (``__version__`` + ``transform`` tree of
``__class_fullname__`` nodes) and lowers them to the on-device transforms in
``data/transforms.py``.  The whole pipeline is one jitted function over the
batch: per-sample PRNG keys replace albumentations' global numpy RNG
(distribution-level randomness parity).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from .transforms import TRANSFORMS, Compose, Transform


def _build_node(node: Dict[str, Any]) -> Transform:
    node = dict(node)
    name = node.pop("__class_fullname__")
    # albumentations may serialize full dotted paths
    name = name.split(".")[-1]
    if name not in TRANSFORMS:
        raise KeyError(
            f"Transform '{name}' from the augmentation YAML has no on-device "
            f"implementation. Available: {sorted(TRANSFORMS)}")
    cls = TRANSFORMS[name]
    children = node.pop("transforms", None)
    if children is not None:
        built = [_build_node(c) for c in children]
        return cls(built, **_clean(node))
    return cls(**_clean(node))


def _clean(node: Dict[str, Any]) -> Dict[str, Any]:
    """Drop albumentations bookkeeping keys."""
    node.pop("bbox_params", None)
    node.pop("keypoint_params", None)
    node.pop("additional_targets", None)
    node.pop("is_check_shapes", None)
    return node


class Pipeline:
    """Batched, jittable augmentation pipeline."""

    def __init__(self, root: Transform):
        self.root = root
        self._jitted = None
        self._jitted_nomask = None

    @classmethod
    def from_yaml(cls, path) -> "Pipeline":
        with open(path) as f:
            spec = yaml.safe_load(f)
        if "transform" not in spec:
            raise ValueError(f"Not an albumentations YAML: {path}")
        return cls(_build_node(spec["transform"]))

    @classmethod
    def from_dict(cls, spec: Dict[str, Any]) -> "Pipeline":
        return cls(_build_node(spec["transform"] if "transform" in spec
                               else spec))

    def output_shape(self, in_shape: Tuple[int, ...]) -> Tuple[int, ...]:
        return self.root.output_shape(in_shape)

    def batched_apply(self, key, images, masks=None):
        """The un-jitted batch transform: float32 cast → root.batched →
        int32 mask cast.  Shared by __call__ (standalone, self-jitted) and
        the fused train step (``train_state.build_train_step_fn``), so the
        two can never drift.  ``root.batched`` runs OneOf/p<1 branches
        stratified over static sub-batches (see ``transforms.Transform
        .batched``) instead of computing every branch for every image."""
        images = jnp.asarray(images).astype(jnp.float32)
        has_mask = masks is not None
        if has_mask:
            masks = jnp.asarray(masks).astype(jnp.float32)
        images, masks = self.root.batched(key, images, masks)
        return images, (masks.astype(jnp.int32) if has_mask else None)

    def __call__(self, key, images, masks=None):
        """Apply to a batch: images (N,H,W,C), masks (N,H,W) or None.

        Returns float32 images (normalized if the YAML ends in Normalize)
        and masks cast back to int32.
        """
        images = jnp.asarray(images)
        if masks is not None:
            masks = jnp.asarray(masks)
            if self._jitted is None:
                self._jitted = jax.jit(self.batched_apply)
            return self._jitted(key, images, masks)
        if self._jitted_nomask is None:
            self._jitted_nomask = jax.jit(
                lambda k, i: self.batched_apply(k, i, None)[0])
        return self._jitted_nomask(key, images), None
