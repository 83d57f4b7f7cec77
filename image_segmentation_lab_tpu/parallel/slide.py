"""Multi-chip sliding-window inference (spatial scaling over the mesh).

The reference has no spatial parallelism; SURVEY.md §2.9 identifies the
TPU-native analog of "sequence parallelism" for this workload: for very
large inputs, shard the **window batch** of slide inference across the mesh.
Each chip decodes a disjoint subset of crops; the overlap-stitch runs on the
replicated gathered logits.  The model stays replicated (it is small), the
dominant conv work scales linearly with chips, and the only collective is
one all-gather of window logits over ICI.

Window gathering/stitching is the exact same code as single-chip slide
inference (``encoder_decoder.gather_windows``/``stitch_windows``); this
module only adds the pad-to-shards / shard / all-gather steps.
"""

from __future__ import annotations

from collections.abc import Mapping

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models.segmentors.encoder_decoder import (gather_windows,
                                                 slide_window_origins,
                                                 stitch_windows)
from .mesh import replicated


def _head_cfg(model) -> Mapping:
    dh = getattr(model, "decode_head", None)
    if isinstance(dh, (list, tuple)) and dh:
        dh = dh[-1]  # cascade: the last stage head decides the output
    return dh if isinstance(dh, Mapping) else {}


def make_multichip_slide_inference(model, mesh, axis: str = "data"):
    """Build a jitted fn(variables, img) → probabilities with the window
    batch sharded over ``axis``.

    ``model.test_cfg`` must define ``crop_size``/``stride``; the number of
    windows × batch is padded to a multiple of the mesh axis size.
    """
    n_shards = mesh.shape[axis]
    binary = _head_cfg(model).get("out_channels") == 1

    def fn(variables, img):
        test_cfg = dict(model.test_cfg or {})
        h_stride, w_stride = test_cfg["stride"]
        h_crop, w_crop = test_cfg["crop_size"]
        N, h_img, w_img, C = img.shape
        origins, h_crop, w_crop = slide_window_origins(
            h_img, w_img, h_crop, w_crop, h_stride, w_stride)

        crop_batch = gather_windows(img, origins, h_crop, w_crop)
        n_real = crop_batch.shape[0]
        pad = (-n_real) % n_shards
        if pad:
            crop_batch = jnp.concatenate(
                [crop_batch, jnp.zeros((pad, h_crop, w_crop, C),
                                       crop_batch.dtype)], axis=0)
        crop_batch = jax.lax.with_sharding_constraint(
            crop_batch, NamedSharding(mesh, P(axis)))
        crop_logits = model.apply(variables, crop_batch,
                                  method="encode_decode")
        crop_logits = jax.lax.with_sharding_constraint(
            crop_logits, NamedSharding(mesh, P()))  # all-gather over ICI
        crop_logits = crop_logits[:n_real]

        preds = stitch_windows(crop_logits, origins, h_crop, w_crop,
                               N, h_img, w_img)
        if binary:
            return jax.nn.sigmoid(preds)
        return jax.nn.softmax(preds, axis=-1)

    return jax.jit(fn,
                   in_shardings=(replicated(mesh), replicated(mesh)),
                   out_shardings=replicated(mesh))
