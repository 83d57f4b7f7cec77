"""K-Net (beyond-reference): KernelUpdator torch-golden, hard-gated mask
pooling property, stage plumbing, full train/eval + config."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as TF

from image_segmentation_lab_tpu.models.decode_heads.knet_head import (
    KernelUpdateHead, KernelUpdator)

from test_zoo_torch_parity import P, randomize

torch.set_grad_enabled(False)


def _tlin(x, p, path, bias=True):
    w = torch.from_numpy(np.asarray(P(p, path + "/weight")))
    b = torch.from_numpy(np.asarray(P(p, path + "/bias"))) if bias else None
    return TF.linear(x, w.t(), b)


def _tln(x, p, path):
    w = torch.from_numpy(np.asarray(P(p, path + "/weight")))
    b = torch.from_numpy(np.asarray(P(p, path + "/bias")))
    return TF.layer_norm(x, w.shape, w, b, eps=1e-5)


def t_kernel_updator(p, upd, inp, F):
    params = _tlin(upd, p, "dynamic_layer")
    param_in, param_out = params[..., :F], params[..., F:]
    inputs = _tlin(inp, p, "input_layer")
    input_in, input_out = inputs[..., :F], inputs[..., F:]
    gate = input_in * param_in
    input_gate = torch.sigmoid(_tln(_tlin(gate, p, "input_gate"), p,
                                    "input_norm_in"))
    update_gate = torch.sigmoid(_tln(_tlin(gate, p, "update_gate"), p,
                                     "norm_in"))
    param_out = _tln(param_out, p, "norm_out")
    input_out = _tln(input_out, p, "input_norm_out")
    feats = update_gate * param_out + input_gate * input_out
    return TF.relu(_tln(_tlin(feats, p, "fc_layer"), p, "fc_norm"))


def test_kernel_updator_matches_torch(rng):
    C = 16
    m = KernelUpdator(C, C)
    upd = rng.randn(2, 5, C).astype(np.float32)
    inp = rng.randn(2, 5, C).astype(np.float32)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(upd),
                       jnp.asarray(inp))
    variables = randomize(variables, seed=231)
    out = m.apply(variables, jnp.asarray(upd), jnp.asarray(inp),
                  mutable=False)
    ref = t_kernel_updator(variables["params"], torch.from_numpy(upd),
                           torch.from_numpy(inp), C)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(),
                               rtol=2e-3, atol=2e-4)


def t_update_head(p, x, kernels, masks, heads):
    """Full KernelUpdateHead stage twin: hard-gated pooling → updator →
    kernel MHSA → FFN → mask fcs → dynamic 1x1 conv."""
    import math
    N, C, H, W = x.shape
    K = kernels.shape[1]
    sig = torch.sigmoid(masks)                        # (N, K, H, W)
    sig = sig * (sig > 0.5)
    x_feat = torch.einsum("nkhw,nchw->nkc", sig, x)
    obj = t_kernel_updator(p["kernel_update_conv"], x_feat, kernels, C)

    qkv = _tlin(obj, p["attention"], "qkv")
    d = C // heads
    q, k, v = [t.reshape(N, K, heads, d).permute(0, 2, 1, 3)
               for t in qkv.chunk(3, dim=-1)]
    attn = ((q @ k.transpose(-2, -1)) / math.sqrt(d)).softmax(-1)
    y = (attn @ v).permute(0, 2, 1, 3).reshape(N, K, C)
    y = _tlin(y, p["attention"], "proj")
    obj = _tln(obj + y, p, "attention_norm")
    y = _tlin(TF.gelu(_tlin(obj, p, "ffn_fc1")), p, "ffn_fc2")
    obj = _tln(obj + y, p, "ffn_norm")

    mask_feat = TF.relu(_tln(_tlin(obj, p, "mask_fc0", bias=False), p,
                             "mask_norm0"))
    new_kernels = _tlin(mask_feat, p, "fc_mask")
    new_masks = torch.einsum("nchw,nkc->nkhw", x, new_kernels)
    return new_masks, new_kernels


def test_update_head_full_stage_matches_torch(rng):
    C, K, heads = 16, 3, 2
    m = KernelUpdateHead(num_classes=K, in_channels=C, num_heads=heads,
                         feedforward_channels=32)
    x = rng.randn(2, 6, 6, C).astype(np.float32)
    kernels = rng.randn(2, K, C).astype(np.float32)
    masks = rng.randn(2, 6, 6, K).astype(np.float32)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x),
                       jnp.asarray(kernels), jnp.asarray(masks))
    variables = randomize(variables, seed=232)
    new_masks, new_kernels = m.apply(variables, jnp.asarray(x),
                                     jnp.asarray(kernels),
                                     jnp.asarray(masks), mutable=False)
    ref_masks, ref_kernels = t_update_head(
        variables["params"], torch.from_numpy(x.transpose(0, 3, 1, 2)),
        torch.from_numpy(kernels),
        torch.from_numpy(masks.transpose(0, 3, 1, 2)), heads)
    np.testing.assert_allclose(np.asarray(new_kernels),
                               ref_kernels.numpy(), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(new_masks).transpose(0, 3, 1, 2),   # NHWK → NKHW
        ref_masks.numpy(), rtol=2e-3, atol=2e-4)


def test_update_head_hard_gates_mask_pooling(rng):
    """Pixels with sigmoid(mask) <= 0.5 must not contribute to the
    group feature: flipping their feature values leaves outputs
    unchanged."""
    C = 16
    m = KernelUpdateHead(num_classes=3, in_channels=C, num_heads=2,
                         feedforward_channels=32)
    x = rng.randn(1, 6, 6, C).astype(np.float32)
    kernels = rng.randn(1, 3, C).astype(np.float32)
    # mask logits strongly negative on the left half: sigmoid < 0.5
    masks = np.full((1, 6, 6, 3), -8.0, np.float32)
    masks[:, :, 3:, :] = 6.0
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x),
                       jnp.asarray(kernels), jnp.asarray(masks))
    out1, k1 = m.apply(variables, jnp.asarray(x), jnp.asarray(kernels),
                       jnp.asarray(masks), mutable=False)
    x2 = x.copy()
    x2[:, :, :3, :] *= -7.0   # only gated-off pixels change
    out2, k2 = m.apply(variables, jnp.asarray(x2), jnp.asarray(kernels),
                       jnp.asarray(masks), mutable=False)
    np.testing.assert_allclose(np.asarray(k1), np.asarray(k2), atol=1e-6)
    # new masks = feats @ kernels: they DO see the flipped pixels, but
    # only through the unchanged kernels
    np.testing.assert_allclose(
        np.asarray(out2)[:, :, 3:], np.asarray(out1)[:, :, 3:], atol=1e-5)


def test_knet_trains_and_infers(rng):
    from image_segmentation_lab_tpu.core.builder import build_optimizer
    from image_segmentation_lab_tpu.models.builder import build_segmentor
    from image_segmentation_lab_tpu.train_state import (create_train_state,
                                                        make_train_step)
    norm = dict(type="BN")
    cfg = dict(
        type="EncoderDecoder",
        backbone=dict(type="ResNetV1c", depth=18, num_stages=4,
                      out_indices=(0, 1, 2, 3), dilations=(1, 1, 1, 1),
                      strides=(1, 2, 2, 2), norm_cfg=norm,
                      base_channels=8, stem_channels=8),
        decode_head=dict(
            type="IterativeDecodeHead", num_stages=2, num_classes=3,
            kernel_generate_head=dict(
                type="FCNHead", in_channels=64, in_index=3, channels=16,
                num_convs=1, concat_input=False, num_classes=3,
                norm_cfg=norm, dropout_ratio=0.0),
            kernel_update_head=dict(num_heads=2, feedforward_channels=32),
            loss_decode=dict(type="CrossEntropyLoss")),
        test_cfg=dict(mode="whole"))
    model = build_segmentor(cfg)
    img = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
    gt = jnp.asarray(rng.randint(0, 3, size=(2, 32, 32)).astype(np.int32))
    tx = build_optimizer(dict(type="SGD", lr=0.01, momentum=0.9))
    state = create_train_state(model, jax.random.PRNGKey(0), img, gt, tx)
    step = make_train_step(model, tx)
    state, log_vars = step(state, img, gt, jax.random.PRNGKey(1))
    # deep supervision: stage-0 (generate head) + 2 update stages
    for key in ("decode.s0.loss_ce", "decode.s1.loss_ce",
                "decode.s2.loss_ce"):
        assert np.isfinite(float(log_vars[key])), key
    # the update stages' parameters receive gradients (kernels flow)
    probs = model.apply(state.variables(), img[:1], method="inference")
    assert probs.shape == (1, 32, 32, 3)


def test_knet_config_builds():
    from image_segmentation_lab_tpu.core.fileio.parse import \
        parse_and_backup_config
    from image_segmentation_lab_tpu.models.builder import build_segmentor
    cfg = parse_and_backup_config("configs/network/knet/knet_s3_upernet_r50.py")
    model = cfg["model"]
    # shrink for CI: ResNet-18-width trunk, slim heads
    model["backbone"].update(depth=18, base_channels=8, stem_channels=8)
    model["decode_head"]["kernel_generate_head"].update(
        in_channels=[8, 16, 32, 64], channels=16)
    model["decode_head"]["kernel_update_head"].update(
        num_heads=2, feedforward_channels=32)
    model["auxiliary_head"].update(in_channels=32, channels=8)
    seg = build_segmentor(model)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = seg.init(jax.random.PRNGKey(0), x, method="encode_decode")
    out = seg.apply(variables, x, method="encode_decode", mutable=False)
    assert out.shape == (1, 64, 64, 2)
