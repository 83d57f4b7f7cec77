"""HRNet backbone.

Parity target: reference ``models/backbones/hrnet.py`` (652 LoC):

* ``HRModule`` multi-branch blocks + fuse layers (:24-224): up-fusion =
  1x1 conv + BN + bilinear upsample (align_corners=False), down-fusion =
  chains of stride-2 3x3 conv+BN(+ReLU except last), forward = per-branch
  blocks → cross-resolution fuse-sum → ReLU;
* stem = two stride-2 3x3 convs (:360-384); stage1 = Bottleneck layer;
  transition layers insert/convert branches (:444-489);
* stages built from the ``extra`` dict (:539-578) with ``multiscale_output``
  applied to the last module only;
* ``frozen_stages``/``norm_eval`` → frozen-param collection + BN force_eval
  (:609-641); kaiming-conv/constant-norm init + optional zero-init-residual.

Blocks are the shared BasicBlock/Bottleneck from ``resnet.py``.  TPU note:
the parallel branches are independent conv chains over different
resolutions — XLA schedules them concurrently; fuse layers are 1x1 convs
(MXU) plus resize gathers.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...core.registry_hub import BACKBONE
from ...utils.ops import resize
from ..builder import build_conv_layer, build_norm_layer
from .resnet import BasicBlock, Bottleneck, _KAIMING, _norm_cfg


class _ConvBN(nn.Module):
    """conv3x3/1x1 + BN (+ optional ReLU) fuse/transition unit."""

    in_channels: int
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    with_relu: bool = False
    conv_cfg: Optional[Dict] = None
    norm_cfg: Optional[Dict] = None
    trainable: bool = True
    norm_force_eval: bool = False

    def setup(self):
        ncfg = _norm_cfg(self.norm_cfg, self.trainable, self.norm_force_eval)
        self.conv = build_conv_layer(
            self.conv_cfg, self.in_channels, self.out_channels,
            self.kernel_size, stride=self.stride,
            padding=self.kernel_size // 2, bias=False,
            trainable=self.trainable, weight_init=_KAIMING)
        self.bn = build_norm_layer(ncfg, self.out_channels)[1]

    def __call__(self, x, train: bool = False):
        x = self.bn(self.conv(x, train=train), train=train)
        return nn.relu(x) if self.with_relu else x


class _BlockChain(nn.Module):
    """A branch: ``num_blocks`` residual blocks."""

    block: type
    in_channels: int
    channels: int
    num_blocks: int
    stride: int = 1
    conv_cfg: Optional[Dict] = None
    norm_cfg: Optional[Dict] = None
    with_cp: bool = False
    block_kwargs: Optional[Dict[str, Any]] = None

    def setup(self):
        block_cls = (nn.remat(self.block, static_argnums=(2,))
                     if self.with_cp else self.block)
        kw = dict(self.block_kwargs or {})
        blocks = []
        inplanes = self.in_channels
        for i in range(self.num_blocks):
            blocks.append(block_cls(
                inplanes=inplanes, planes=self.channels,
                stride=self.stride if i == 0 else 1,
                conv_cfg=self.conv_cfg, norm_cfg=self.norm_cfg, **kw))
            inplanes = self.channels * self.block.expansion
        self.blocks = blocks

    def __call__(self, x, train: bool = False):
        for b in self.blocks:
            x = b(x, train)  # positional: remat static_argnums
        return x


class HRModule(nn.Module):
    """(reference hrnet.py:24-224)."""

    num_branches: int
    block: type
    num_blocks: Sequence[int]
    in_channels: Sequence[int]
    num_channels: Sequence[int]
    multiscale_output: bool = True
    with_cp: bool = False
    conv_cfg: Optional[Dict] = None
    norm_cfg: Optional[Dict] = None
    block_kwargs: Optional[Dict[str, Any]] = None

    def setup(self):
        assert self.num_branches == len(self.num_blocks) \
            == len(self.num_channels) == len(self.in_channels)
        kw = self.block_kwargs or {}
        self.branches = [
            _BlockChain(block=self.block, in_channels=self.in_channels[i],
                        channels=self.num_channels[i],
                        num_blocks=self.num_blocks[i],
                        conv_cfg=self.conv_cfg, norm_cfg=self.norm_cfg,
                        with_cp=self.with_cp, block_kwargs=kw)
            for i in range(self.num_branches)
        ]
        out_channels = [c * self.block.expansion for c in self.num_channels]
        trainable = kw.get("trainable", True)
        force_eval = kw.get("norm_force_eval", False)

        num_out = self.num_branches if self.multiscale_output else 1
        fuse_layers = []
        for i in range(num_out):
            row = []
            for j in range(self.num_branches):
                if j > i:
                    row.append(_ConvBN(out_channels[j], out_channels[i], 1,
                                       conv_cfg=self.conv_cfg,
                                       norm_cfg=self.norm_cfg,
                                       trainable=trainable,
                                       norm_force_eval=force_eval))
                elif j == i:
                    row.append(None)
                else:
                    chain = []
                    for k in range(i - j):
                        last = k == i - j - 1
                        chain.append(_ConvBN(
                            out_channels[j],
                            out_channels[i] if last else out_channels[j],
                            3, stride=2, with_relu=not last,
                            conv_cfg=self.conv_cfg, norm_cfg=self.norm_cfg,
                            trainable=trainable, norm_force_eval=force_eval))
                    row.append(chain)
            fuse_layers.append(row)
        self.fuse_layers = fuse_layers

    def __call__(self, xs, train: bool = False):
        if self.num_branches == 1:
            return [self.branches[0](xs[0], train=train)]
        xs = [branch(x, train=train) for branch, x in zip(self.branches, xs)]
        outs = []
        for i, row in enumerate(self.fuse_layers):
            y = 0
            for j, fuse in enumerate(row):
                if i == j:
                    y = y + xs[j]
                elif j > i:
                    up = fuse(xs[j], train=train)
                    y = y + resize(up, size=xs[i].shape[1:3],
                                   mode="bilinear", align_corners=False)
                else:
                    z = xs[j]
                    for conv in fuse:
                        z = conv(z, train=train)
                    y = y + z
            outs.append(nn.relu(y))
        return outs


@BACKBONE.register()
class HRNet(nn.Module):
    """(reference hrnet.py:227-641; ``extra`` dict format identical)."""

    blocks_dict = {"BASIC": BasicBlock, "BOTTLENECK": Bottleneck}

    extra: Dict = None
    in_channels: int = 3
    conv_cfg: Optional[Dict] = None
    norm_cfg: Optional[Dict] = None
    norm_eval: bool = False
    with_cp: bool = False
    frozen_stages: int = -1
    zero_init_residual: bool = False
    multiscale_output: bool = True
    pretrained: Optional[str] = None
    init_cfg: Optional[Any] = None

    def setup(self):
        extra = {k: dict(v) for k, v in dict(self.extra).items()}
        assert all(f"stage{i}" in extra for i in (1, 2, 3, 4))
        for i in range(4):
            cfg = extra[f"stage{i + 1}"]
            assert len(cfg["num_blocks"]) == cfg["num_branches"]
            assert len(cfg["num_channels"]) == cfg["num_branches"]
        norm_cfg = self.norm_cfg or dict(type="BN", requires_grad=True)

        def stage_kwargs(stage_idx):
            trainable = stage_idx > self.frozen_stages
            return dict(trainable=trainable,
                        norm_force_eval=self.norm_eval or not trainable,
                        # default-init only, like the reference (see
                        # resnet.py:443-463 for the shared convention)
                        zero_init_residual=(self.zero_init_residual
                                            and self.pretrained is None
                                            and self.init_cfg is None))

        stem_trainable = self.frozen_stages < 0
        stem_ncfg = _norm_cfg(norm_cfg, stem_trainable,
                              self.norm_eval or not stem_trainable)
        self.conv1 = build_conv_layer(self.conv_cfg, self.in_channels, 64, 3,
                                      stride=2, padding=1, bias=False,
                                      trainable=stem_trainable,
                                      weight_init=_KAIMING)
        self.bn1 = build_norm_layer(stem_ncfg, 64, postfix=1)[1]
        self.conv2 = build_conv_layer(self.conv_cfg, 64, 64, 3, stride=2,
                                      padding=1, bias=False,
                                      trainable=stem_trainable,
                                      weight_init=_KAIMING)
        self.bn2 = build_norm_layer(stem_ncfg, 64, postfix=2)[1]

        # stage 1
        s1 = extra["stage1"]
        block1 = self.blocks_dict[s1["block"]]
        s1_channels = s1["num_channels"][0]
        self.layer1 = _BlockChain(
            block=block1, in_channels=64, channels=s1_channels,
            num_blocks=s1["num_blocks"][0], conv_cfg=self.conv_cfg,
            norm_cfg=norm_cfg, with_cp=self.with_cp,
            block_kwargs=stage_kwargs(1))
        pre_channels = [s1_channels * block1.expansion]

        stages = []
        transitions = []
        self._stage_cfgs = [extra[f"stage{i}"] for i in (2, 3, 4)]
        for si, scfg in zip((2, 3, 4), self._stage_cfgs):
            block = self.blocks_dict[scfg["block"]]
            cur_channels = [c * block.expansion for c in scfg["num_channels"]]
            kw = stage_kwargs(si)
            # reference _freeze_stages (hrnet.py:590-604) freezes
            # transition{i} together with stage i (its producer), not with
            # the stage it feeds: transition{si-1} frozen when
            # si-1 <= frozen_stages
            transitions.append(self._make_transition(
                pre_channels, cur_channels, norm_cfg, stage_kwargs(si - 1)))
            modules = []
            for m in range(scfg["num_modules"]):
                last = m == scfg["num_modules"] - 1
                ms_out = True
                if si == 4 and last and not self.multiscale_output:
                    ms_out = False
                modules.append(HRModule(
                    num_branches=scfg["num_branches"], block=block,
                    num_blocks=tuple(scfg["num_blocks"]),
                    in_channels=tuple(cur_channels),
                    num_channels=tuple(scfg["num_channels"]),
                    multiscale_output=ms_out, with_cp=self.with_cp,
                    conv_cfg=self.conv_cfg, norm_cfg=norm_cfg,
                    block_kwargs=kw))
            stages.append(modules)
            pre_channels = cur_channels
        self.transitions = transitions
        self.stages = stages

    def _make_transition(self, pre, cur, norm_cfg, kw):
        """(reference hrnet.py:444-489)."""
        layers = []
        for i in range(len(cur)):
            if i < len(pre):
                if cur[i] != pre[i]:
                    layers.append(_ConvBN(pre[i], cur[i], 3, with_relu=True,
                                          conv_cfg=self.conv_cfg,
                                          norm_cfg=norm_cfg,
                                          trainable=kw["trainable"],
                                          norm_force_eval=kw["norm_force_eval"]))
                else:
                    layers.append(None)
            else:
                chain = []
                for j in range(i + 1 - len(pre)):
                    in_ch = pre[-1]
                    out_ch = cur[i] if j == i - len(pre) else in_ch
                    chain.append(_ConvBN(in_ch, out_ch, 3, stride=2,
                                         with_relu=True,
                                         conv_cfg=self.conv_cfg,
                                         norm_cfg=norm_cfg,
                                         trainable=kw["trainable"],
                                         norm_force_eval=kw["norm_force_eval"]))
                layers.append(chain)
        return layers

    def __call__(self, x, train: bool = False):
        x = nn.relu(self.bn1(self.conv1(x, train=train), train=train))
        x = nn.relu(self.bn2(self.conv2(x, train=train), train=train))
        x = self.layer1(x, train=train)

        y_list = [x]
        for scfg, transition, modules in zip(self._stage_cfgs,
                                             self.transitions, self.stages):
            x_list = []
            for i in range(scfg["num_branches"]):
                t = transition[i]
                if t is None:
                    x_list.append(y_list[i])
                else:
                    # reference applies non-identity transitions to the
                    # *last* branch (hrnet.py:616-629)
                    src = y_list[-1]
                    if isinstance(t, (list, tuple)):
                        for conv in t:
                            src = conv(src, train=train)
                        x_list.append(src)
                    else:
                        x_list.append(t(src, train=train))
            for module in modules:
                x_list = module(x_list, train=train)
            y_list = x_list
        return tuple(y_list)
