"""LightHamHead (SegNeXt — Guo et al., NeurIPS 2022; mmseg
``LightHamHead`` + HamNet NMF2D semantics).

Beyond-reference family.  The Hamburger module low-rank-factorizes the
squeezed multi-level features with non-negative matrix factorization:
R random bases are refined by multiplicative-update steps (all batched
MXU matmuls over the (D, N)·(D, R)·(N, R) triple), and the features are
reconstructed as ``bases @ coefʰ``.  mmseg runs the refinement under
``torch.no_grad`` and differentiates only the final coefficient step —
mirrored here with ``stop_gradient``, which also keeps the unrolled
update loop out of the backward graph.  Base initialization uses a flax
RNG when one is provided ('nmf', falling back to 'dropout') and a fixed
key otherwise: the reference draws fresh ``torch.rand`` bases every
call, but after 6-7 multiplicative updates the factorization is
init-insensitive; a fixed eval key makes inference deterministic.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.registry_hub import DECODEHEAD
from ...utils.ops import resize
from ..common.conv_module import ConvModule
from .decode_head import BaseDecodeHead

_EPS = 1e-6


def _nmf_multiplicative_step(x, bases, coef):
    """One NMF multiplicative-update step (mmseg ``NMF2D.local_step``).

    x: (B, D, N) non-negative; bases: (B, D, R); coef: (B, N, R).
    """
    numerator = jnp.einsum("bdn,bdr->bnr", x, bases)
    denominator = coef @ (jnp.einsum("bdr,bds->brs", bases, bases))
    coef = coef * numerator / (denominator + _EPS)
    numerator = jnp.einsum("bdn,bnr->bdr", x, coef)
    denominator = bases @ (jnp.einsum("bnr,bns->brs", coef, coef))
    bases = bases * numerator / (denominator + _EPS)
    return bases, coef


def _nmf_coef_step(x, bases, coef):
    """The differentiable final coefficient update (``compute_coef``)."""
    numerator = jnp.einsum("bdn,bdr->bnr", x, bases)
    denominator = coef @ (jnp.einsum("bdr,bds->brs", bases, bases))
    return coef * numerator / (denominator + _EPS)


class NMF2D(nn.Module):
    """mmseg ``NMF2D`` (ham_kwargs keys: MD_S/MD_R/TRAIN_STEPS/EVAL_STEPS/
    INV_T/RAND_INIT — SPATIAL=True layouts only, as every config uses)."""

    ham_kwargs: Optional[Dict] = None

    def setup(self):
        kw = dict(self.ham_kwargs or {})
        assert kw.pop("SPATIAL", True), "only SPATIAL=True is supported"
        self.S = kw.pop("MD_S", 1)
        self.R = kw.pop("MD_R", 64)
        self.train_steps = kw.pop("TRAIN_STEPS", 6)
        self.eval_steps = kw.pop("EVAL_STEPS", 7)
        self.inv_t = kw.pop("INV_T", 100)
        kw.pop("ETA", None)                 # only used by online bases
        kw.pop("MD_D", None)                # D is derived from C // S
        assert kw.pop("RAND_INIT", True), \
            "online (RAND_INIT=False) bases are not supported"
        assert not kw, f"unknown ham_kwargs {sorted(kw)}"

    def _rng(self):
        if self.has_rng("nmf"):
            return self.make_rng("nmf")
        if self.has_rng("dropout"):
            return self.make_rng("dropout")
        return jax.random.PRNGKey(0)

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        N_, H, W, C = x.shape
        D, N = C // self.S, H * W
        B = N_ * self.S
        # (B*S, D, N): NHWC → channel-major view of the spatial matrix
        xm = x.reshape(N_, N, self.S, D).transpose(0, 2, 3, 1) \
              .reshape(B, D, N).astype(jnp.float32)

        bases = jax.random.uniform(self._rng(), (B, D, self.R),
                                   jnp.float32)
        bases = bases / (jnp.linalg.norm(bases, axis=1, keepdims=True)
                         + 1e-12)

        coef = nn.softmax(self.inv_t *
                          jnp.einsum("bdn,bdr->bnr", xm, bases), axis=-1)
        steps = self.train_steps if train else self.eval_steps
        for _ in range(steps):
            bases, coef = _nmf_multiplicative_step(xm, bases, coef)
        # mmseg refines under no_grad and differentiates one coef step
        bases = jax.lax.stop_gradient(bases)
        coef = _nmf_coef_step(xm, bases, jax.lax.stop_gradient(coef))
        out = jnp.einsum("bdr,bnr->bdn", bases, coef)
        out = out.reshape(N_, self.S, D, N).transpose(0, 3, 1, 2) \
                 .reshape(N_, H, W, C)
        return out.astype(x.dtype)


class Hamburger(nn.Module):
    """ham_in → ReLU → NMF2D → ham_out, ReLU residual (mmseg)."""

    ham_channels: int
    ham_kwargs: Optional[Dict] = None
    norm_cfg: Optional[Dict] = None

    def setup(self):
        self.ham_in = ConvModule(self.ham_channels, self.ham_channels, 1,
                                 norm_cfg=None, act_cfg=None)
        self.ham = NMF2D(self.ham_kwargs)
        self.ham_out = ConvModule(self.ham_channels, self.ham_channels, 1,
                                  norm_cfg=self.norm_cfg, act_cfg=None)

    def __call__(self, x, train: bool = False):
        enjoy = nn.relu(self.ham_in(x, train=train))
        enjoy = self.ham(enjoy, train=train)
        enjoy = self.ham_out(enjoy, train=train)
        return nn.relu(x + enjoy)


@DECODEHEAD.register()
class LightHamHead(BaseDecodeHead):
    """mmseg ``LightHamHead``: squeeze → Hamburger → align → classify.

    Uses ``input_transform='multiple_select'``; the selected levels are
    resized to the first one's size and concatenated.
    """

    ham_channels: int = 512
    ham_kwargs: Optional[Dict] = None

    def setup(self):
        super().setup()
        assert self.input_transform == "multiple_select"
        self.squeeze = ConvModule(sum(self.in_channels), self.ham_channels,
                                  1, conv_cfg=self.conv_cfg,
                                  norm_cfg=self.norm_cfg,
                                  act_cfg=self._act_cfg())
        self.hamburger = Hamburger(self.ham_channels, self.ham_kwargs,
                                   norm_cfg=self.norm_cfg)
        self.align = ConvModule(self.ham_channels, self.channels, 1,
                                conv_cfg=self.conv_cfg,
                                norm_cfg=self.norm_cfg,
                                act_cfg=self._act_cfg())

    def __call__(self, inputs, train: bool = False):
        feats = self._transform_inputs(inputs)
        feats = [feats[0]] + [
            resize(f, size=feats[0].shape[1:3], mode="bilinear",
                   align_corners=self.align_corners) for f in feats[1:]]
        x = self.squeeze(jnp.concatenate(feats, axis=-1), train=train)
        x = self.hamburger(x, train=train)
        out = self.align(x, train=train)
        return self.cls_seg(out, train=train)
