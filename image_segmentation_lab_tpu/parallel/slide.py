"""Multi-chip sliding-window inference (spatial scaling over the mesh).

The reference has no spatial parallelism; SURVEY.md §2.9 identifies the
TPU-native analog of "sequence parallelism" for this workload: for very
large inputs, shard the **window batch** of slide inference across the mesh.
Each chip decodes a disjoint subset of crops; the overlap-stitch scatter-add
runs on the replicated gathered logits.  This keeps the model replicated
(it is small) and scales the dominant conv work linearly with chips; the
only collective is one all-gather of window logits over ICI.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models.segmentors.encoder_decoder import slide_window_origins
from ..utils.ops import resize
from .mesh import batch_sharding, replicated


def make_multichip_slide_inference(model, mesh, axis: str = "data"):
    """Build a jitted fn(variables, img) → probabilities with the window
    batch sharded over ``axis``.

    ``model.test_cfg`` must define ``crop_size``/``stride``; the number of
    windows × batch is padded to a multiple of the mesh axis size.
    """
    n_shards = mesh.shape[axis]

    def fn(variables, img):
        test_cfg = dict(model.test_cfg or {})
        h_stride, w_stride = test_cfg["stride"]
        h_crop, w_crop = test_cfg["crop_size"]
        N, h_img, w_img, C = img.shape
        origins, h_crop, w_crop = slide_window_origins(
            h_img, w_img, h_crop, w_crop, h_stride, w_stride)

        crops = [jax.lax.dynamic_slice(img, (0, y1, x1, 0),
                                       (N, h_crop, w_crop, C))
                 for (y1, x1) in origins]
        crop_batch = jnp.concatenate(crops, axis=0)
        n_real = crop_batch.shape[0]
        pad = (-n_real) % n_shards
        if pad:
            crop_batch = jnp.concatenate(
                [crop_batch, jnp.zeros((pad, h_crop, w_crop, C),
                                       crop_batch.dtype)], axis=0)
        # shard the window batch over the mesh axis
        crop_batch = jax.lax.with_sharding_constraint(
            crop_batch, NamedSharding(mesh, P(axis)))
        crop_logits = model.apply(variables, crop_batch,
                                  method="encode_decode")
        crop_logits = jax.lax.with_sharding_constraint(
            crop_logits, NamedSharding(mesh, P()))  # all-gather over ICI
        crop_logits = crop_logits[:n_real]

        out_ch = crop_logits.shape[-1]
        preds = jnp.zeros((N, h_img, w_img, out_ch), crop_logits.dtype)
        count = np.zeros((1, h_img, w_img, 1), np.float32)
        for i, (y1, x1) in enumerate(origins):
            logit = crop_logits[i * N:(i + 1) * N]
            preds = preds.at[:, y1:y1 + h_crop, x1:x1 + w_crop, :].add(logit)
            count[:, y1:y1 + h_crop, x1:x1 + w_crop, :] += 1
        assert (count == 0).sum() == 0
        preds = preds * jnp.asarray(1.0 / count)
        from collections.abc import Mapping
        head_cfg = (model.decode_head
                    if isinstance(model.decode_head, Mapping) else {})
        if head_cfg.get("out_channels") == 1:
            return jax.nn.sigmoid(preds)
        return jax.nn.softmax(preds, axis=-1)

    return jax.jit(fn, in_shardings=(replicated(mesh), replicated(mesh)),
                   out_shardings=replicated(mesh))
