"""End-to-end tests of EncoderDecoder built from reference-style configs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_segmentation_lab_tpu.models.builder import build_segmentor
from image_segmentation_lab_tpu.train_state import (create_train_state,
                                                    make_train_step,
                                                    parse_losses)
from image_segmentation_lab_tpu.core.builder import build_optimizer


def small_cfg(test_cfg=None, aux=True, out_channels=None):
    head = dict(type="FCNHead", in_channels=128, in_index=1, channels=32,
                num_convs=1, concat_input=False, num_classes=2,
                norm_cfg=dict(type="BN", requires_grad=True),
                align_corners=False,
                loss_decode=dict(type="CrossEntropyLoss", use_sigmoid=False,
                                 loss_weight=1.0))
    if out_channels is not None:
        head["out_channels"] = out_channels
        head["loss_decode"] = dict(type="CrossEntropyLoss", use_sigmoid=True,
                                   loss_weight=1.0)
    cfg = dict(
        type="EncoderDecoder",
        backbone=dict(type="ResNet", depth=18, num_stages=2,
                      strides=(1, 2), dilations=(1, 1), out_indices=(0, 1),
                      norm_cfg=dict(type="BN", requires_grad=True)),
        decode_head=head,
        test_cfg=test_cfg or dict(mode="whole"))
    if aux:
        cfg["auxiliary_head"] = dict(
            type="FCNHead", in_channels=64, in_index=0, channels=16,
            num_convs=1, concat_input=False, num_classes=2,
            norm_cfg=dict(type="BN", requires_grad=True),
            loss_decode=dict(type="CrossEntropyLoss", loss_weight=0.4))
    return cfg


@pytest.fixture(scope="module")
def built():
    model = build_segmentor(small_cfg())
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    gt = jnp.zeros((2, 32, 32), jnp.int32)
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, x, gt, img_metas={}, rescale=False,
                           return_loss=True, train=True)
    return model, variables


def test_forward_train_losses(built):
    model, variables = built
    x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 32, 3), jnp.float32)
    gt = jnp.asarray(np.random.RandomState(1).randint(0, 2, (2, 32, 32)))
    (seg_logits, losses), _ = model.apply(
        variables, x, gt, img_metas={}, rescale=False, return_loss=True,
        train=True, rngs={"dropout": jax.random.PRNGKey(2)},
        mutable=["batch_stats"])
    assert set(losses) == {"decode.loss_ce", "decode.acc_seg",
                           "aux.loss_ce", "aux.acc_seg"}
    assert seg_logits["decode"].shape == (2, 32, 32, 2)
    total, log_vars = parse_losses(losses)
    assert float(total) > 0
    assert "loss" in log_vars


def test_whole_vs_slide_consistency(built):
    """With crop >= image, slide inference must equal whole inference."""
    model, variables = built
    x = jnp.asarray(np.random.RandomState(2).randn(1, 32, 32, 3), jnp.float32)
    whole = model.apply(variables, x, method="whole_inference")
    slide_model = build_segmentor(small_cfg(
        test_cfg=dict(mode="slide", crop_size=(32, 32), stride=(32, 32))))
    slide = slide_model.apply(variables, x, method="slide_inference")
    np.testing.assert_allclose(np.asarray(whole), np.asarray(slide),
                               rtol=1e-5, atol=1e-5)


def test_slide_overlap_counts(built):
    """Overlapping windows average: constant input → constant output."""
    model, variables = built
    slide_model = build_segmentor(small_cfg(
        test_cfg=dict(mode="slide", crop_size=(24, 24), stride=(16, 16))))
    x = jnp.ones((1, 40, 40, 3), jnp.float32)
    out = slide_model.apply(variables, x, method="slide_inference")
    assert out.shape == (1, 40, 40, 2)
    # constant input → every window produces identical interior logits;
    # probabilities must sum to 1 after softmax in inference()
    probs = slide_model.apply(variables, x, method="inference")
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, rtol=1e-5)


def test_predict_binary_threshold():
    model = build_segmentor(small_cfg(aux=False, out_channels=1))
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    gt = jnp.zeros((1, 32, 32), jnp.int32)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, x, gt, img_metas={}, rescale=False,
                           return_loss=True, train=True)
    pred = model.apply(variables, x, method="predict")
    assert pred.shape == (1, 32, 32)
    assert pred.dtype == jnp.int32


def test_train_step_reduces_loss():
    """A few SGD steps on a fixed batch must reduce the loss."""
    model = build_segmentor(small_cfg(aux=False))
    tx = build_optimizer(dict(type="SGD", lr=0.1, momentum=0.9))
    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 32, 3), jnp.float32)
    gt = (jnp.arange(32)[None, :, None] < 16).astype(jnp.int32) * jnp.ones(
        (2, 32, 32), jnp.int32)
    state = create_train_state(model, rng, x, gt, tx)
    step = make_train_step(model, tx, donate=False)
    first = None
    for i in range(8):
        state, log_vars = step(state, x, gt, jax.random.fold_in(rng, i))
        if first is None:
            first = float(log_vars["loss"])
    last = float(log_vars["loss"])
    assert last < first, (first, last)
    assert int(state.step) == 8


def test_tta_aug_test_logits(built):
    model, variables = built
    x1 = jnp.asarray(np.random.RandomState(3).randn(1, 32, 32, 3), jnp.float32)
    x2 = x1[:, :, ::-1, :]  # hflip aug
    avg = model.apply(variables, [x1, x2], method="aug_test_logits",
                      ori_img_sizes=None, rescale=True)
    a = model.apply(variables, x1, method="inference")
    b = model.apply(variables, x2, method="inference")
    np.testing.assert_allclose(np.asarray(avg), np.asarray((a + b) / 2),
                               rtol=1e-6)


def test_batch_test_covers_all_images(built):
    """Reference skipped image 0 (SURVEY §8.7); we must not."""
    model, variables = built
    imgs = [jnp.ones((1, 32, 32, 3)), jnp.zeros((1, 32, 32, 3))]
    outs = model.apply(variables, imgs, img_metas=None, return_loss=False,
                       rescale=False)
    assert len(outs) == 2


def test_binary_eval_step_honors_threshold():
    """out_channels==1 eval must threshold, not channel-argmax (which would
    always predict class 0 — latent reference defect)."""
    from image_segmentation_lab_tpu.train_state import (TrainState,
                                                        make_eval_step)
    model = build_segmentor(small_cfg(aux=False, out_channels=1))
    x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 32, 3), jnp.float32)
    gt = jnp.zeros((2, 32, 32), jnp.int32)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, x, gt, img_metas={}, rescale=False,
                           return_loss=True, train=True)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       frozen_params=variables.get("frozen_params", {}),
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=None)
    eval_step = make_eval_step(model)
    seg_logits, _ = eval_step(state, x, gt)
    out = np.asarray(seg_logits["decode"])
    assert out.shape[-1] == 2  # threshold channel + logit channel
    # argmax equals sigmoid(x) > 0.3 (default threshold)
    raw = out[..., 1]
    expect = (1 / (1 + np.exp(-raw))) > 0.3
    np.testing.assert_array_equal(out.argmax(-1).astype(bool), expect)


def test_make_tta_step_flip_back_and_scales(built):
    """The production TTA path (val.py --tta): flip-back + multi-scale
    averaging must equal the manually composed expectation."""
    from image_segmentation_lab_tpu.train_state import make_tta_step
    from image_segmentation_lab_tpu.utils.ops import resize
    model, variables = built
    x = jnp.asarray(np.random.RandomState(9).randn(1, 32, 32, 3), jnp.float32)
    scales = (1.0, 0.5)
    out = make_tta_step(model, scales)(variables, x)

    acc = 0.0
    for s in scales:
        scaled = resize(x, size=(int(32 * s), int(32 * s)), mode="bilinear",
                        align_corners=False)
        p = model.apply(variables, scaled, method="inference")
        pf = model.apply(variables, scaled[:, :, ::-1, :], method="inference")
        acc = acc + resize(p, size=(32, 32), mode="bilinear",
                           align_corners=False)
        acc = acc + resize(pf[:, :, ::-1, :], size=(32, 32), mode="bilinear",
                           align_corners=False)
    expected = acc / 4
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               rtol=1e-5, atol=1e-6)
    # regression guard: dropping the un-flip would change the result
    assert float(jnp.abs(out - model.apply(
        variables, x, method="inference")).max()) > 1e-4
