"""Coverage for ConvModule variants, reusable blocks, and fileio utils."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_segmentation_lab_tpu.models.common import (Conv2dAdaptivePadding,
                                                      ConvModule)
from image_segmentation_lab_tpu.models.utils import (
    DepthwiseSeparableConvModule, InvertedResidual, InvertedResidualV3,
    SELayer)
from image_segmentation_lab_tpu.utils import Upsample, add_prefix, resize
from image_segmentation_lab_tpu.utils.math_utils import make_divisible


def init_run(m, x, train=False):
    v = m.init({"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1)}, x)
    return m.apply(v, x, train=train,
                   rngs={"dropout": jax.random.PRNGKey(2)},
                   mutable=["batch_stats"])[0], v


def test_conv_module_orders(rng):
    x = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    for order in (("conv", "norm", "act"), ("norm", "conv", "act"),
                  ("act", "conv", "norm")):
        m = ConvModule(4, 6, 3, padding=1,
                       norm_cfg=dict(type="BN", requires_grad=True),
                       order=order)
        out, v = init_run(m, x)
        assert out.shape == (1, 8, 8, 6)
        # norm channel selection: before conv → in_channels
        bn_w = v["params"]["bn"]["weight"]
        expected_c = 6 if order.index("norm") > order.index("conv") else 4
        assert bn_w.shape == (expected_c,)


def test_conv_module_bias_auto(rng):
    x = jnp.asarray(rng.randn(1, 4, 4, 3).astype(np.float32))
    with_norm = ConvModule(3, 5, 1, norm_cfg=dict(type="BN"))
    _, v = init_run(with_norm, x)
    assert "bias" not in v["params"]["conv"]
    without_norm = ConvModule(3, 5, 1)
    _, v = init_run(without_norm, x)
    assert "bias" in v["params"]["conv"]


def test_conv_module_explicit_padding(rng):
    x = jnp.asarray(rng.randn(1, 6, 6, 3).astype(np.float32))
    m = ConvModule(3, 4, 3, padding=1, padding_mode="reflect")
    out, _ = init_run(m, x)
    assert out.shape == (1, 6, 6, 4)
    with pytest.raises(NotImplementedError):
        init_run(ConvModule(3, 4, 3, padding=1, padding_mode="circular"), x)


def test_depthwise_separable_conv_module(rng):
    x = jnp.asarray(rng.randn(1, 8, 8, 6).astype(np.float32))
    m = DepthwiseSeparableConvModule(6, 10, 3, padding=1,
                                     norm_cfg=dict(type="BN"),
                                     dw_act_cfg=None)
    out, v = init_run(m, x)
    assert out.shape == (1, 8, 8, 10)
    # depthwise kernel has in/groups == 1
    dw = v["params"]["depthwise_conv"]["conv"]["weight"]
    assert dw.shape == (3, 3, 1, 6)
    pw = v["params"]["pointwise_conv"]["conv"]["weight"]
    assert pw.shape == (1, 1, 6, 10)


def test_se_layer_scales_channels(rng):
    x = jnp.asarray(np.abs(rng.randn(1, 6, 6, 16)).astype(np.float32))
    m = SELayer(channels=16, ratio=4)
    out, _ = init_run(m, x)
    assert out.shape == x.shape
    # sigmoid gate ∈ (0,1) → output strictly smaller in magnitude
    assert float(jnp.abs(out).sum()) < float(jnp.abs(x).sum())


def test_inverted_residual_shapes(rng):
    x = jnp.asarray(rng.randn(1, 8, 8, 16).astype(np.float32))
    res = InvertedResidual(16, 16, stride=1, expand_ratio=6)
    out, _ = init_run(res, x)
    assert out.shape == x.shape  # residual connect
    down = InvertedResidual(16, 24, stride=2, expand_ratio=6)
    out, _ = init_run(down, x)
    assert out.shape == (1, 4, 4, 24)
    v3 = InvertedResidualV3(16, 16, mid_channels=32, kernel_size=5, stride=1,
                            se_cfg=dict(channels=32, ratio=4))
    out, _ = init_run(v3, x)
    assert out.shape == x.shape


def test_adaptive_padding_conv_odd_sizes(rng):
    x = jnp.asarray(rng.randn(1, 7, 9, 3).astype(np.float32))
    m = Conv2dAdaptivePadding(3, 4, 3, stride=2)
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out.shape == (1, 4, 5, 4)  # ceil(7/2), ceil(9/2)


def test_upsample_module_and_add_prefix(rng):
    x = jnp.asarray(rng.randn(1, 4, 4, 2).astype(np.float32))
    up = Upsample(scale_factor=2, mode="bilinear", align_corners=False)
    assert up(x).shape == (1, 8, 8, 2)
    up2 = Upsample(size=(5, 7), mode="nearest")
    assert up2(x).shape == (1, 5, 7, 2)
    assert add_prefix({"loss_ce": 1}, "decode") == {"decode.loss_ce": 1}


def test_make_divisible():
    assert make_divisible(32, 8) == 32
    assert make_divisible(33, 8) == 32
    assert make_divisible(36, 8) == 40
    assert make_divisible(7, 8) == 8
    # min_ratio guard: never lose >10%
    assert make_divisible(10, 8) >= 0.9 * 10


def test_fileio_utils(tmp_path):
    from image_segmentation_lab_tpu.core.fileio import (dump, increment_path,
                                                        is_list_of, load,
                                                        list_from_file,
                                                        scandir)
    # io roundtrip by extension
    for ext in ("json", "yaml", "pkl"):
        p = tmp_path / f"x.{ext}"
        dump({"a": [1, 2]}, p)
        assert load(p) == {"a": [1, 2]}
    # text list
    (tmp_path / "split.txt").write_text("img_1\nimg_2\n")
    assert list_from_file(tmp_path / "split.txt", prefix="p/") == [
        "p/img_1", "p/img_2"]
    assert is_list_of([1, 2], int) and not is_list_of((1, 2), int)
    # run dir allocation: exp → exp2 → exp3
    a = increment_path(tmp_path, "proj", "exp")
    b = increment_path(tmp_path, "proj", "exp")
    c = increment_path(tmp_path, "proj", "exp")
    assert a.name == "exp" and b.name == "exp2" and c.name == "exp3"
    # scandir delegates to the backend
    (tmp_path / "proj" / "f.txt").write_text("x")
    assert "f.txt" in list(scandir(tmp_path / "proj", suffix=".txt"))


def test_class_names_lookup():
    from image_segmentation_lab_tpu.core.evaluation import (get_classes,
                                                            get_palette)
    assert len(get_classes("cityscapes")) == 19
    assert len(get_palette("ade20k")) == 150
    assert get_classes("voc")[0] == "background"
    with pytest.raises(ValueError, match="Unrecognized"):
        get_classes("not_a_dataset")
