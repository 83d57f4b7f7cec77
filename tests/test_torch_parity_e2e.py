"""End-to-end numerical parity vs a torch twin.

Builds the same small encoder-decoder in torch.nn and in this framework,
copies weights across layouts, and requires the final seg logits to agree to
fp32 tolerance through conv stacks, BN (train and eval), maxpool, residual
adds, 1x1 classification and bilinear upsampling — the full inference
compute chain that mIoU parity rests on.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as TF

from image_segmentation_lab_tpu.models.builder import build_segmentor


class TorchBasicBlock(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.down = None
        if stride != 1 or cin != cout:
            self.down = nn.Sequential(nn.Conv2d(cin, cout, 1, stride,
                                                bias=False),
                                      nn.BatchNorm2d(cout))

    def forward(self, x):
        idt = x if self.down is None else self.down(x)
        out = TF.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return TF.relu(out + idt)


class TorchTwin(nn.Module):
    """ResNet-18-style 2-stage encoder + FCN head, mirroring small_cfg."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.layer1 = nn.Sequential(TorchBasicBlock(64, 64),
                                    TorchBasicBlock(64, 64))
        self.layer2 = nn.Sequential(TorchBasicBlock(64, 128, 2),
                                    TorchBasicBlock(128, 128))
        self.head_conv = nn.Conv2d(128, 16, 3, 1, 1, bias=False)
        self.head_bn = nn.BatchNorm2d(16)
        self.conv_seg = nn.Conv2d(16, 2, 1)

    def forward(self, x):
        size = x.shape[2:]
        x = TF.max_pool2d(TF.relu(self.bn1(self.conv1(x))), 3, 2, 1)
        x = self.layer2(self.layer1(x))
        x = TF.relu(self.head_bn(self.head_conv(x)))
        x = self.conv_seg(x)
        return TF.interpolate(x, size=size, mode="bilinear",
                              align_corners=False)


def jax_cfg():
    return dict(
        type="EncoderDecoder",
        backbone=dict(type="ResNet", depth=18, num_stages=2,
                      strides=(1, 2), dilations=(1, 1), out_indices=(0, 1),
                      norm_cfg=dict(type="BN", requires_grad=True)),
        decode_head=dict(type="FCNHead", in_channels=128, in_index=1,
                         channels=16, num_convs=1, concat_input=False,
                         num_classes=2, dropout_ratio=0,
                         norm_cfg=dict(type="BN", requires_grad=True),
                         align_corners=False,
                         loss_decode=dict(type="CrossEntropyLoss")),
        test_cfg=dict(mode="whole"))


def copy_weights(torch_model, variables):
    """Copy torch weights into the JAX variable tree (OIHW → HWIO)."""
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables["batch_stats"])

    def conv_w(t):
        return jnp.asarray(t.detach().numpy().transpose(2, 3, 1, 0))

    def set_block(jp, js, tb):
        jp["conv1"]["weight"] = conv_w(tb.conv1.weight)
        jp["conv2"]["weight"] = conv_w(tb.conv2.weight)
        for name, bn in (("bn1", tb.bn1), ("bn2", tb.bn2)):
            jp[name]["weight"] = jnp.asarray(bn.weight.detach().numpy())
            jp[name]["bias"] = jnp.asarray(bn.bias.detach().numpy())
            js[name]["running_mean"] = jnp.asarray(bn.running_mean.numpy())
            js[name]["running_var"] = jnp.asarray(bn.running_var.numpy())
        if tb.down is not None:
            jp["downsample_conv"]["weight"] = conv_w(tb.down[0].weight)
            jp["downsample_bn"]["weight"] = jnp.asarray(
                tb.down[1].weight.detach().numpy())
            jp["downsample_bn"]["bias"] = jnp.asarray(
                tb.down[1].bias.detach().numpy())
            js["downsample_bn"]["running_mean"] = jnp.asarray(
                tb.down[1].running_mean.numpy())
            js["downsample_bn"]["running_var"] = jnp.asarray(
                tb.down[1].running_var.numpy())

    bb_p, bb_s = params["backbone"], stats["backbone"]
    bb_p["conv1"]["weight"] = conv_w(torch_model.conv1.weight)
    bb_p["bn1"]["weight"] = jnp.asarray(torch_model.bn1.weight.detach().numpy())
    bb_p["bn1"]["bias"] = jnp.asarray(torch_model.bn1.bias.detach().numpy())
    bb_s["bn1"]["running_mean"] = jnp.asarray(
        torch_model.bn1.running_mean.numpy())
    bb_s["bn1"]["running_var"] = jnp.asarray(
        torch_model.bn1.running_var.numpy())
    for li, layer in (("layer1", torch_model.layer1),
                      ("layer2", torch_model.layer2)):
        for bi, tb in enumerate(layer):
            set_block(bb_p[li][f"blocks_{bi}"], bb_s[li][f"blocks_{bi}"], tb)

    h_p, h_s = params["decode_head"], stats["decode_head"]
    h_p["convs_0"]["conv"]["weight"] = conv_w(torch_model.head_conv.weight)
    h_p["convs_0"]["bn"]["weight"] = jnp.asarray(
        torch_model.head_bn.weight.detach().numpy())
    h_p["convs_0"]["bn"]["bias"] = jnp.asarray(
        torch_model.head_bn.bias.detach().numpy())
    h_s["convs_0"]["bn"]["running_mean"] = jnp.asarray(
        torch_model.head_bn.running_mean.numpy())
    h_s["convs_0"]["bn"]["running_var"] = jnp.asarray(
        torch_model.head_bn.running_var.numpy())
    h_p["conv_seg"]["weight"] = conv_w(torch_model.conv_seg.weight)
    h_p["conv_seg"]["bias"] = jnp.asarray(
        torch_model.conv_seg.bias.detach().numpy())
    return {"params": params, "batch_stats": stats}


def test_end_to_end_logits_match_torch(rng):
    torch.manual_seed(0)
    tm = TorchTwin()
    # randomize running stats so eval-mode BN is non-trivial
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)
    tm.eval()

    model = build_segmentor(jax_cfg())
    x = rng.randn(2, 64, 64, 3).astype(np.float32)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           jnp.asarray(x), method="encode_decode")
    variables = copy_weights(tm, variables)

    out = model.apply(variables, jnp.asarray(x), method="encode_decode")
    with torch.no_grad():
        ref = tm(torch.tensor(np.transpose(x, (0, 3, 1, 2))))
    ref = np.transpose(ref.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-4)
    # identical hard predictions → identical confusion matrices → same mIoU
    np.testing.assert_array_equal(np.asarray(out).argmax(-1), ref.argmax(-1))


class TorchBottleneck(nn.Module):
    expansion = 4

    def __init__(self, cin, planes, stride=1, dilation=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, planes, 1, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, dilation,
                               dilation=dilation, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.down = None
        if stride != 1 or cin != planes * 4:
            self.down = nn.Sequential(
                nn.Conv2d(cin, planes * 4, 1, stride, bias=False),
                nn.BatchNorm2d(planes * 4))

    def forward(self, x):
        idt = x if self.down is None else self.down(x)
        out = TF.relu(self.bn1(self.conv1(x)))
        out = TF.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return TF.relu(out + idt)


class TorchASPPTwin(nn.Module):
    """Stem + one dilated Bottleneck stage + ASPP head (flagship shape)."""

    def __init__(self, dilations=(1, 6), channels=32):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        # 3 blocks: must match ResNet depth=50 stage-1 (3 Bottlenecks) so
        # every block's weights are copied — with only 2, the uncopied third
        # would be a zero-init-residual identity and silently under-test
        self.layer1 = nn.Sequential(TorchBottleneck(64, 32, 1, 2),
                                    TorchBottleneck(128, 32, 1, 2),
                                    TorchBottleneck(128, 32, 1, 2))
        self.branches = nn.ModuleList()
        for d in dilations:
            if d == 1:
                conv = nn.Conv2d(128, channels, 1, bias=False)
            else:
                conv = nn.Conv2d(128, channels, 3, padding=d, dilation=d,
                                 bias=False)
            self.branches.append(nn.Sequential(conv,
                                               nn.BatchNorm2d(channels),
                                               nn.ReLU()))
        self.image_pool = nn.Sequential(nn.Conv2d(128, channels, 1,
                                                  bias=False),
                                        nn.BatchNorm2d(channels), nn.ReLU())
        n = len(dilations) + 1
        self.bottleneck = nn.Sequential(
            nn.Conv2d(n * channels, channels, 3, padding=1, bias=False),
            nn.BatchNorm2d(channels), nn.ReLU())
        self.conv_seg = nn.Conv2d(channels, 2, 1)

    def forward(self, x):
        size = x.shape[2:]
        x = TF.max_pool2d(TF.relu(self.bn1(self.conv1(x))), 3, 2, 1)
        x = self.layer1(x)
        pooled = self.image_pool(TF.adaptive_avg_pool2d(x, 1))
        outs = [TF.interpolate(pooled, size=x.shape[2:], mode="bilinear",
                               align_corners=False)]
        outs += [b(x) for b in self.branches]
        x = self.bottleneck(torch.cat(outs, dim=1))
        x = self.conv_seg(x)
        return TF.interpolate(x, size=size, mode="bilinear",
                              align_corners=False)


def aspp_jax_cfg():
    return dict(
        type="EncoderDecoder",
        backbone=dict(type="ResNet", depth=50, num_stages=1, strides=(1,),
                      dilations=(2,), out_indices=(0,), base_channels=32,
                      norm_cfg=dict(type="BN", requires_grad=True)),
        decode_head=dict(type="ASPPHead", in_channels=128, in_index=0,
                         channels=32, dilations=(1, 6), num_classes=2,
                         dropout_ratio=0,
                         norm_cfg=dict(type="BN", requires_grad=True),
                         align_corners=False,
                         loss_decode=dict(type="CrossEntropyLoss")),
        test_cfg=dict(mode="whole"))


def copy_aspp_weights(tm, variables):
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables["batch_stats"])

    def conv_w(t):
        return jnp.asarray(t.detach().numpy().transpose(2, 3, 1, 0))

    def copy_bn(dst_p, dst_s, bn):
        dst_p["weight"] = jnp.asarray(bn.weight.detach().numpy())
        dst_p["bias"] = jnp.asarray(bn.bias.detach().numpy())
        dst_s["running_mean"] = jnp.asarray(bn.running_mean.numpy())
        dst_s["running_var"] = jnp.asarray(bn.running_var.numpy())

    bb_p, bb_s = params["backbone"], stats["backbone"]
    bb_p["conv1"]["weight"] = conv_w(tm.conv1.weight)
    copy_bn(bb_p["bn1"], bb_s["bn1"], tm.bn1)
    for bi, tb in enumerate(tm.layer1):
        jp, js = bb_p["layer1"][f"blocks_{bi}"], bb_s["layer1"][f"blocks_{bi}"]
        for name in ("conv1", "conv2", "conv3"):
            jp[name]["weight"] = conv_w(getattr(tb, name).weight)
        for name in ("bn1", "bn2", "bn3"):
            copy_bn(jp[name], js[name], getattr(tb, name))
        if tb.down is not None:
            jp["downsample_conv"]["weight"] = conv_w(tb.down[0].weight)
            copy_bn(jp["downsample_bn"], js["downsample_bn"], tb.down[1])

    h_p, h_s = params["decode_head"], stats["decode_head"]
    for i, branch in enumerate(tm.branches):
        jp = h_p["aspp_modules"][f"branches_{i}"]
        js = h_s["aspp_modules"][f"branches_{i}"]
        jp["conv"]["weight"] = conv_w(branch[0].weight)
        copy_bn(jp["bn"], js["bn"], branch[1])
    h_p["image_pool_conv"]["conv"]["weight"] = conv_w(tm.image_pool[0].weight)
    copy_bn(h_p["image_pool_conv"]["bn"], h_s["image_pool_conv"]["bn"],
            tm.image_pool[1])
    h_p["bottleneck"]["conv"]["weight"] = conv_w(tm.bottleneck[0].weight)
    copy_bn(h_p["bottleneck"]["bn"], h_s["bottleneck"]["bn"],
            tm.bottleneck[1])
    h_p["conv_seg"]["weight"] = conv_w(tm.conv_seg.weight)
    h_p["conv_seg"]["bias"] = jnp.asarray(tm.conv_seg.bias.detach().numpy())
    return {"params": params, "batch_stats": stats}


def test_dilated_bottleneck_aspp_matches_torch(rng):
    """Flagship-shaped parity: dilated Bottlenecks + ASPP (+ image pool)."""
    torch.manual_seed(1)
    tm = TorchASPPTwin()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)
    tm.eval()
    model = build_segmentor(aspp_jax_cfg())
    x = rng.randn(2, 64, 64, 3).astype(np.float32)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           jnp.asarray(x), method="encode_decode")
    variables = copy_aspp_weights(tm, variables)
    out = model.apply(variables, jnp.asarray(x), method="encode_decode")
    with torch.no_grad():
        ref = tm(torch.tensor(np.transpose(x, (0, 3, 1, 2))))
    ref = np.transpose(ref.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(out).argmax(-1), ref.argmax(-1))
