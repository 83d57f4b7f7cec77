"""PointRend point head (Kirillov et al., CVPR 2020; mmseg ``PointHead``
semantics), re-derived for static-shape TPU execution.

Runs as stage 2 of a ``CascadeEncoderDecoder`` after a coarse head
(``takes_prev_logits``): a shared MLP refines the segmentation at a
sparse set of the most uncertain points instead of every pixel.

TPU redesign notes — every step is static-shape, compiler-friendly:

* **Training** samples ``num_points`` per image by the paper's
  biased scheme (oversample x3 random candidates -> keep the top 75%
  most uncertain -> fill with fresh random points).  ``jax.lax.top_k``
  over the candidate axis replaces torch's topk+gather; randomness rides
  the train step's ``dropout`` RNG stream, so steps stay reproducible
  under the fused RNG plan.  The loss is computed on the (N, P) point
  set directly — the framework's loss callables are rank-agnostic.
* **Inference** runs the subdivision loop: 2x-upsample the coarse
  logits, pick the ``subdivision_num_points`` most uncertain pixels
  (static k = min(H*W, cfg)), evaluate the MLP at just those points,
  and scatter the refinements back (one ``.at[].set`` per step over
  (N, P) flat indices).  The loop is a Python ``for`` over
  ``subdivision_steps`` — unrolled at trace time, each iteration its
  own static shape.
* The MLP is Linear layers over the channel-last point features
  ((N, P, C) with C on lanes — mmseg's equivalent Conv1d layout
  transposed), with the coarse logits concatenated at the input and,
  with ``coarse_pred_each_layer``, after every layer.

The fine-grained features come from the FPN's finest level(s)
(``in_index``), bilinearly point-sampled (``ops/point_sample.py``,
grid_sample-zeros semantics).
"""

from __future__ import annotations

from typing import Sequence, Union

import jax
import jax.numpy as jnp

from ...core.registry_hub import DECODEHEAD
from ...ops.point_sample import calculate_uncertainty, point_sample
from ..basic.convolution import Linear
from ..losses import accuracy
from .decode_head import BaseDecodeHead


@DECODEHEAD.register()
class PointHead(BaseDecodeHead):
    num_fcs: int = 3
    coarse_pred_each_layer: bool = True
    # training-time point selection (paper defaults)
    num_points: int = 2048
    oversample_ratio: int = 3
    importance_sample_ratio: float = 0.75
    # inference-time subdivision (paper defaults)
    subdivision_steps: int = 2
    subdivision_num_points: int = 8196
    scale_factor: int = 2

    takes_prev_logits = True          # CascadeEncoderDecoder contract

    def setup(self):
        super().setup()
        K = self.resolved_out_channels()
        in_ch = (sum(self.in_channels)
                 if isinstance(self.in_channels, (list, tuple))
                 else self.in_channels)
        fcs = []
        fc_in = in_ch + K
        for _ in range(self.num_fcs):
            fcs.append(Linear(fc_in, self.channels))
            fc_in = self.channels + (K if self.coarse_pred_each_layer else 0)
        self.fcs = fcs
        self.fc_seg = Linear(fc_in, K)

    # ---- MLP over (N, P, C) point features -------------------------------
    def _point_forward(self, fine, coarse, train: bool):
        x = jnp.concatenate([fine, coarse], axis=-1)
        for fc in self.fcs:
            x = jax.nn.relu(fc(x))
            if self.coarse_pred_each_layer:
                x = jnp.concatenate([x, coarse], axis=-1)
        if self.dropout is not None:
            # Dropout2d over a point set: (N, P, C) -> (N, P, 1, C) so the
            # channel-slice semantics match the dense head's classifier
            x = self.dropout(x[:, :, None, :], train=train)[:, :, 0, :]
        return self.fc_seg(x)

    def _fine_feats(self, inputs, points):
        idx = (self.in_index if isinstance(self.in_index, (list, tuple))
               else [self.in_index])
        feats = [point_sample(inputs[i], points,
                              align_corners=self.align_corners)
                 for i in idx]
        return jnp.concatenate(feats, axis=-1) if len(feats) > 1 else feats[0]

    # ---- training --------------------------------------------------------
    def _sample_train_points(self, prev_logits, rng):
        """Biased point selection (mmseg get_points_train)."""
        N = prev_logits.shape[0]
        P, over = self.num_points, self.oversample_ratio
        n_unc = int(self.importance_sample_ratio * P)
        n_rand = P - n_unc
        r1, r2 = jax.random.split(rng)
        cand = jax.random.uniform(r1, (N, P * over, 2), jnp.float32)
        unc = calculate_uncertainty(
            point_sample(prev_logits, cand,
                         align_corners=self.align_corners))
        _, top_idx = jax.lax.top_k(unc, n_unc)                 # (N, n_unc)
        picked = jnp.take_along_axis(cand, top_idx[..., None], axis=1)
        if n_rand:
            picked = jnp.concatenate(
                [picked, jax.random.uniform(r2, (N, n_rand, 2),
                                            jnp.float32)], axis=1)
        return picked

    def __call__(self, inputs, train: bool = False, prev_logits=None):
        assert prev_logits is not None, \
            "PointHead must run as a cascade stage (needs coarse logits)"
        if train:
            points = self._sample_train_points(
                prev_logits, self.make_rng("dropout"))
            fine = self._fine_feats(inputs, points)
            coarse = point_sample(prev_logits, points,
                                  align_corners=self.align_corners)
            logits = self._point_forward(fine, coarse, train)
            return {"point_logits": logits, "points": points}
        return self._subdivision_inference(inputs, prev_logits)

    def losses(self, raw, seg_label, meta_infos=None, rescale: bool = False):
        """Point-set loss: nearest-sample the labels at the chosen points
        (mmseg PointHead.losses) and run the loss stack on (N, P)."""
        if not isinstance(raw, dict):  # dense logits (aux/test path)
            return super().losses(raw, seg_label, meta_infos, rescale)
        logits, points = raw["point_logits"], raw["points"]
        labels = point_sample(
            seg_label[..., None].astype(jnp.float32), points,
            align_corners=self.align_corners,
            mode="nearest")[..., 0].astype(jnp.int32)
        loss = {}
        for loss_decode in self.losses_decode:
            name = loss_decode.loss_name.replace("loss_", "loss_point_")
            value = loss_decode(logits, labels, ignore_index=self.ignore_index)
            loss[name] = loss.get(name, 0) + value
        loss["acc_point"] = accuracy(logits, labels,
                                     ignore_index=self.ignore_index)
        return logits, loss

    # ---- inference -------------------------------------------------------
    def _subdivision_inference(self, inputs, prev_logits):
        from ...utils.ops import resize

        refined = prev_logits
        for _ in range(self.subdivision_steps):
            N, H, W, K = refined.shape
            H, W = H * self.scale_factor, W * self.scale_factor
            refined = resize(refined, size=(H, W), mode="bilinear",
                             align_corners=self.align_corners)
            P = min(H * W, self.subdivision_num_points)
            unc = calculate_uncertainty(refined).reshape(N, H * W)
            _, idx = jax.lax.top_k(unc, P)                     # (N, P)
            # pixel centers of the chosen cells, (x, y) normalized
            points = jnp.stack(
                [(idx % W + 0.5) / W, (idx // W + 0.5) / H],
                axis=-1).astype(jnp.float32)
            fine = self._fine_feats(inputs, points)
            coarse = point_sample(prev_logits, points,
                                  align_corners=self.align_corners)
            point_logits = self._point_forward(fine, coarse, train=False)
            flat = refined.reshape(N, H * W, K)
            flat = jax.vmap(lambda m, i, v: m.at[i].set(v))(
                flat, idx, point_logits.astype(flat.dtype))
            refined = flat.reshape(N, H, W, K)
        return refined

    def forward_test(self, inputs, train: bool = False):
        raise RuntimeError(
            "PointHead cannot run standalone; CascadeEncoderDecoder calls "
            "it with prev_logits")
