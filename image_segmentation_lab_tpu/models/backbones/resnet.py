"""ResNet / ResNetV1c / ResNetV1d backbones.

Parity target: reference ``models/backbones/resnet.py`` (718 LoC):

* ``BasicBlock`` (expansion 1, :24-105) and ``Bottleneck`` (expansion 4,
  pytorch/caffe stride placement, :108-316);
* arch_settings for depths 18/34/50/101/152 (:397-403);
* 7x7 stem vs ``deep_stem`` 3×3x3 stem (:600-642); maxpool 3/2/1;
* per-stage strides/dilations, ``multi_grid`` on the last stage,
  ``contract_dilation`` (:499-530);
* ``frozen_stages`` (:644-661) → frozen param collection + pinned BN stats;
* ``norm_eval`` (:680-689) → BN ``force_eval``;
* default init kaiming(fan_out)-conv / constant-norm with
  ``zero_init_residual`` zeroing the last norm gamma of each block
  (:443-463) — applied at construction time via initializer overrides;
* ``with_cp`` → ``nn.remat``; outputs a tuple of stage features selected by
  ``out_indices`` (:663-678).

V1c = deep_stem (:692-704); V1d = deep_stem + avg_down (:707-718).
TPU notes: channels-last throughout; the stem + 4 stages compile to one XLA
program of MXU convs; frozen stages are structural (no optimizer masking).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ...core.initialize.init_functions import constant_, kaiming_
from ...core.registry_hub import BACKBONE
from ...ops.pooling import avg_pool2d, max_pool2d
from ..builder import build_conv_layer, build_norm_layer, build_plugin_layer
from ..utils.res_layer import ResLayer

_KAIMING = kaiming_(mode="fan_out", nonlinearity="relu")


def _norm_cfg(norm_cfg, trainable, force_eval, **extra):
    cfg = dict(norm_cfg or dict(type="BN"))
    if not trainable:
        cfg["requires_grad"] = False
    is_bn = ("Batch" in str(cfg.get("type", ""))
             or cfg.get("type") in ("BN", "SyncBN"))
    if force_eval and is_bn:
        cfg["force_eval"] = True
    cfg.update(extra)
    return cfg


class BasicBlock(nn.Module):
    """ResNet basic block (reference resnet.py:24-105)."""

    expansion = 1

    inplanes: int
    planes: int
    stride: int = 1
    dilation: int = 1
    avg_down: bool = False
    style: str = "pytorch"
    conv_cfg: Optional[Dict] = None
    norm_cfg: Optional[Dict] = None
    plugins: Optional[list] = None
    trainable: bool = True
    norm_force_eval: bool = False
    zero_init_residual: bool = False

    def setup(self):
        assert self.plugins is None, "plugins not supported in BasicBlock"
        ncfg = _norm_cfg(self.norm_cfg, self.trainable, self.norm_force_eval)
        self.conv1 = build_conv_layer(
            self.conv_cfg, self.inplanes, self.planes, 3, stride=self.stride,
            padding=self.dilation, dilation=self.dilation, bias=False,
            trainable=self.trainable, weight_init=_KAIMING)
        self.bn1 = build_norm_layer(ncfg, self.planes, postfix=1)[1]
        self.conv2 = build_conv_layer(
            self.conv_cfg, self.planes, self.planes, 3, padding=1, bias=False,
            trainable=self.trainable, weight_init=_KAIMING)
        ncfg2 = dict(ncfg)
        if self.zero_init_residual:
            ncfg2["weight_init"] = constant_(0.0)
        self.bn2 = build_norm_layer(ncfg2, self.planes, postfix=2)[1]
        self.has_downsample = (self.stride != 1
                               or self.inplanes != self.planes * self.expansion)
        if self.has_downsample:
            conv_stride = 1 if (self.avg_down and self.stride != 1) else self.stride
            self.downsample_conv = build_conv_layer(
                self.conv_cfg, self.inplanes, self.planes * self.expansion, 1,
                stride=conv_stride, bias=False, trainable=self.trainable,
                weight_init=_KAIMING)
            self.downsample_bn = build_norm_layer(
                ncfg, self.planes * self.expansion)[1]

    def __call__(self, x, train: bool = False):
        identity = x
        out = nn.relu(self.bn1(self.conv1(x, train=train), train=train))
        out = self.bn2(self.conv2(out, train=train), train=train)
        if self.has_downsample:
            if self.avg_down and self.stride != 1:
                identity = avg_pool2d(identity, self.stride, self.stride,
                                      ceil_mode=True, count_include_pad=False)
            identity = self.downsample_bn(
                self.downsample_conv(identity, train=train), train=train)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    """ResNet bottleneck (reference resnet.py:108-316).

    ``style='pytorch'`` puts the stride on the 3x3 conv; ``'caffe'`` on the
    first 1x1.  Plugin hooks after conv1/2/3 are honored via PLUGINS.

    ``groups``/``base_width`` widen conv1/conv2 to the ResNeXt aggregated-
    transform width ``floor(planes * base_width / base_channels) * groups``
    and run conv2 grouped — exactly where mmseg's ResNeXt Bottleneck
    overrides this block; ``groups=1`` (default) keeps plain-ResNet widths.
    """

    expansion = 4

    inplanes: int
    planes: int
    stride: int = 1
    dilation: int = 1
    avg_down: bool = False
    style: str = "pytorch"
    conv_cfg: Optional[Dict] = None
    norm_cfg: Optional[Dict] = None
    plugins: Optional[list] = None
    trainable: bool = True
    norm_force_eval: bool = False
    zero_init_residual: bool = False
    groups: int = 1
    base_width: int = 4
    base_channels: int = 64

    def setup(self):
        assert self.style in ("pytorch", "caffe")
        ncfg = _norm_cfg(self.norm_cfg, self.trainable, self.norm_force_eval)
        conv1_stride = 1 if self.style == "pytorch" else self.stride
        conv2_stride = self.stride if self.style == "pytorch" else 1
        if self.groups == 1:
            width = self.planes
        else:
            width = (self.planes * self.base_width
                     // self.base_channels) * self.groups

        self.conv1 = build_conv_layer(
            self.conv_cfg, self.inplanes, width, 1, stride=conv1_stride,
            bias=False, trainable=self.trainable, weight_init=_KAIMING)
        self.bn1 = build_norm_layer(ncfg, width, postfix=1)[1]
        self.conv2 = build_conv_layer(
            self.conv_cfg, width, width, 3, stride=conv2_stride,
            padding=self.dilation, dilation=self.dilation,
            groups=self.groups, bias=False,
            trainable=self.trainable, weight_init=_KAIMING)
        self.bn2 = build_norm_layer(ncfg, width, postfix=2)[1]
        self.conv3 = build_conv_layer(
            self.conv_cfg, width, self.planes * self.expansion, 1,
            bias=False, trainable=self.trainable, weight_init=_KAIMING)
        ncfg3 = dict(ncfg)
        if self.zero_init_residual:
            ncfg3["weight_init"] = constant_(0.0)
        self.bn3 = build_norm_layer(ncfg3, self.planes * self.expansion,
                                    postfix=3)[1]

        if self.plugins:
            allowed = {"after_conv1", "after_conv2", "after_conv3"}
            assert all(p["position"] in allowed for p in self.plugins)
            for pos, ch in (("after_conv1", width),
                            ("after_conv2", width),
                            ("after_conv3", self.planes * self.expansion)):
                mods = [build_plugin_layer(p["cfg"], in_channels=ch)[1]
                        for p in self.plugins if p["position"] == pos]
                setattr(self, f"{pos}_plugins", mods)
        self.has_downsample = (self.stride != 1
                               or self.inplanes != self.planes * self.expansion)
        if self.has_downsample:
            conv_stride = 1 if (self.avg_down and self.stride != 1) else self.stride
            self.downsample_conv = build_conv_layer(
                self.conv_cfg, self.inplanes, self.planes * self.expansion, 1,
                stride=conv_stride, bias=False, trainable=self.trainable,
                weight_init=_KAIMING)
            self.downsample_bn = build_norm_layer(
                ncfg, self.planes * self.expansion)[1]

    def _plugins(self, x, pos, train):
        if self.plugins:
            for m in getattr(self, f"{pos}_plugins", ()):
                x = m(x, train=train)
        return x

    def __call__(self, x, train: bool = False):
        identity = x
        out = nn.relu(self.bn1(self.conv1(x, train=train), train=train))
        out = self._plugins(out, "after_conv1", train)
        out = nn.relu(self.bn2(self.conv2(out, train=train), train=train))
        out = self._plugins(out, "after_conv2", train)
        out = self.bn3(self.conv3(out, train=train), train=train)
        out = self._plugins(out, "after_conv3", train)
        if self.has_downsample:
            if self.avg_down and self.stride != 1:
                identity = avg_pool2d(identity, self.stride, self.stride,
                                      ceil_mode=True, count_include_pad=False)
            identity = self.downsample_bn(
                self.downsample_conv(identity, train=train), train=train)
        return nn.relu(out + identity)


@BACKBONE.register()
class ResNet(nn.Module):
    """ResNet backbone (reference resnet.py:319-689); see module docstring."""

    arch_settings = {
        18: (BasicBlock, (2, 2, 2, 2)),
        34: (BasicBlock, (3, 4, 6, 3)),
        50: (Bottleneck, (3, 4, 6, 3)),
        101: (Bottleneck, (3, 4, 23, 3)),
        152: (Bottleneck, (3, 8, 36, 3)),
    }

    depth: int = 50
    in_channels: int = 3
    stem_channels: int = 64
    base_channels: int = 64
    num_stages: int = 4
    strides: Sequence[int] = (1, 2, 2, 2)
    dilations: Sequence[int] = (1, 1, 1, 1)
    out_indices: Sequence[int] = (0, 1, 2, 3)
    style: str = "pytorch"
    deep_stem: bool = False
    avg_down: bool = False
    frozen_stages: int = -1
    conv_cfg: Optional[Dict] = None
    norm_cfg: Optional[Dict] = None
    norm_eval: bool = False
    dcn: Optional[Dict] = None
    stage_with_dcn: Sequence[bool] = (False, False, False, False)
    plugins: Optional[list] = None
    multi_grid: Optional[Sequence[int]] = None
    contract_dilation: bool = False
    with_cp: bool = False
    zero_init_residual: bool = True
    pretrained: Optional[str] = None
    init_cfg: Optional[Any] = None
    # ICNet keeps corner information with a ceil-mode stem maxpool
    # (reference icnet.py:83-85 mutates backbone.maxpool post-build;
    # here it is a declarative flag)
    maxpool_ceil_mode: bool = False

    def setup(self):
        if self.depth not in self.arch_settings:
            raise KeyError(f"invalid depth {self.depth} for resnet")
        if self.dcn is not None:
            raise NotImplementedError(
                "DCN is not supported (no deformable conv is registered in "
                "the reference either — resnet.py:188-207 is dead code there)")
        assert 1 <= self.num_stages <= 4
        assert len(self.strides) == len(self.dilations) == self.num_stages
        assert max(self.out_indices) < self.num_stages
        block, stage_blocks = self.arch_settings[self.depth]
        stage_blocks = stage_blocks[:self.num_stages]
        norm_cfg = self.norm_cfg or dict(type="BN", requires_grad=True)

        stem_trainable = self.frozen_stages < 0
        stem_ncfg = _norm_cfg(norm_cfg, stem_trainable,
                              self.norm_eval or not stem_trainable)
        if self.deep_stem:
            c = self.stem_channels
            stem = []
            for i, (cin, cout, s) in enumerate(
                    [(self.in_channels, c // 2, 2), (c // 2, c // 2, 1),
                     (c // 2, c, 1)]):
                stem.append(build_conv_layer(
                    self.conv_cfg, cin, cout, 3, stride=s, padding=1,
                    bias=False, trainable=stem_trainable,
                    weight_init=_KAIMING))
                stem.append(build_norm_layer(stem_ncfg, cout)[1])
            self.stem = stem
        else:
            self.conv1 = build_conv_layer(
                self.conv_cfg, self.in_channels, self.stem_channels, 7,
                stride=2, padding=3, bias=False, trainable=stem_trainable,
                weight_init=_KAIMING)
            self.bn1 = build_norm_layer(stem_ncfg, self.stem_channels,
                                        postfix=1)[1]

        layers = []
        inplanes = self.stem_channels
        for i, num_blocks in enumerate(stage_blocks):
            stage_trainable = i + 1 > self.frozen_stages
            planes = self.base_channels * 2 ** i
            layers.append(ResLayer(
                block=block,
                inplanes=inplanes,
                planes=planes,
                num_blocks=num_blocks,
                stride=self.strides[i],
                dilation=self.dilations[i],
                avg_down=self.avg_down,
                conv_cfg=self.conv_cfg,
                norm_cfg=norm_cfg,
                multi_grid=(self.multi_grid
                            if i == len(stage_blocks) - 1 else None),
                contract_dilation=self.contract_dilation,
                with_cp=self.with_cp,
                block_kwargs=dict(
                    style=self.style,
                    plugins=(self._stage_plugins(i)
                             if self.plugins is not None else None),
                    trainable=stage_trainable,
                    norm_force_eval=self.norm_eval or not stage_trainable,
                    # the reference zero-inits the residual norm ONLY under
                    # its default init (resnet.py:443-463: pretrained and
                    # init_cfg both None) — a custom init_cfg or pretrained
                    # load must leave the gammas at 1
                    zero_init_residual=(self.zero_init_residual
                                        and self.pretrained is None
                                        and self.init_cfg is None),
                    **self._extra_block_kwargs()),
                name=f"layer{i + 1}"))
            inplanes = planes * block.expansion
        self.res_layers = layers
        self.feat_dim = block.expansion * self.base_channels * 2 ** (
            len(stage_blocks) - 1)

    def _extra_block_kwargs(self):
        """Extra per-block kwargs for subclasses (Res2Net/ResNeSt)."""
        return {}

    def _stage_plugins(self, stage_idx):
        """Filter plugins for one stage (reference resnet.py:538-586)."""
        out = []
        for plugin in self.plugins:
            plugin = dict(plugin)
            stages = plugin.pop("stages", None)
            assert stages is None or len(stages) == self.num_stages
            if stages is None or stages[stage_idx]:
                out.append(plugin)
        return out or None

    def forward_stem(self, x, train: bool = False):
        """Stem convs + maxpool; callable standalone (ICNet reuses it —
        reference icnet.py:153-162)."""
        if self.deep_stem:
            for i in range(0, len(self.stem), 2):
                x = nn.relu(self.stem[i + 1](self.stem[i](x, train=train),
                                             train=train))
        else:
            x = nn.relu(self.bn1(self.conv1(x, train=train), train=train))
        return max_pool2d(x, 3, stride=2, padding=1,
                          ceil_mode=self.maxpool_ceil_mode)

    def forward_layer(self, i, x, train: bool = False):
        """Run stage ``i`` (0-based) alone (ICNet splits the stages)."""
        return self.res_layers[i](x, train=train)

    def __call__(self, x, train: bool = False):
        x = self.forward_stem(x, train=train)
        outs = []
        for i, layer in enumerate(self.res_layers):
            x = layer(x, train=train)
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)


@BACKBONE.register()
class ResNetV1c(ResNet):
    """ResNet with 3×3x3 deep stem (reference resnet.py:692-704)."""

    deep_stem: bool = True
    avg_down: bool = False


@BACKBONE.register()
class ResNetV1d(ResNet):
    """Deep stem + avg-down downsampling (reference resnet.py:707-718)."""

    deep_stem: bool = True
    avg_down: bool = True
