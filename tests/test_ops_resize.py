"""Bit-parity of resize with torch.nn.functional.interpolate."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from image_segmentation_lab_tpu.utils.ops import resize


@pytest.mark.parametrize("in_hw,out_hw", [
    ((8, 8), (16, 16)), ((17, 13), (64, 64)), ((32, 32), (7, 5)),
    ((5, 5), (5, 5)), ((1, 1), (4, 4)),
])
@pytest.mark.parametrize("align_corners", [False, True])
def test_bilinear_parity(rng, in_hw, out_hw, align_corners):
    x = rng.randn(2, *in_hw, 3).astype(np.float32)
    out = resize(jnp.asarray(x), size=out_hw, mode="bilinear",
                 align_corners=align_corners, warning=False)
    ref = TF.interpolate(torch.tensor(np.transpose(x, (0, 3, 1, 2))),
                         size=out_hw, mode="bilinear",
                         align_corners=align_corners)
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 3, 1, 2)),
                               ref.numpy(), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", [
    ((8, 8), (16, 16)), ((17, 13), (40, 50)), ((32, 32), (7, 5)),
])
def test_nearest_parity(rng, in_hw, out_hw):
    x = rng.randn(1, *in_hw, 2).astype(np.float32)
    out = resize(jnp.asarray(x), size=out_hw, mode="nearest")
    ref = TF.interpolate(torch.tensor(np.transpose(x, (0, 3, 1, 2))),
                         size=out_hw, mode="nearest")
    np.testing.assert_array_equal(
        np.transpose(np.asarray(out), (0, 3, 1, 2)), ref.numpy())


@pytest.mark.parametrize("align_corners", [False, True])
def test_matmul_path_matches_gather(rng, align_corners):
    from image_segmentation_lab_tpu.utils.ops import resize_bilinear
    x = jnp.asarray(rng.randn(2, 17, 13, 8).astype(np.float32))
    a = resize_bilinear(x, (40, 50), align_corners, method="gather")
    b = resize_bilinear(x, (40, 50), align_corners, method="matmul")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)
    a = resize_bilinear(x, (5, 7), align_corners, method="gather")
    b = resize_bilinear(x, (5, 7), align_corners, method="matmul")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("in_hw,sf", [((17, 17), 0.5), ((15, 21), 0.5),
                                      ((11, 13), 2.0), ((17, 9), 0.25)])
def test_scale_factor_uses_user_scale_like_torch(rng, in_hw, sf):
    """F.interpolate(scale_factor=s) maps coordinates with step 1/s, NOT the
    realized size ratio — they differ whenever in*s is fractional (e.g.
    17 → 8 at s=0.5 steps by 2.0, not 17/8).  ICNet's 0.5x cascade hits
    this on every odd feature size (reference icnet.py:152-165)."""
    x = rng.randn(1, *in_hw, 3).astype(np.float32)
    out = resize(jnp.asarray(x), scale_factor=sf, mode="bilinear",
                 align_corners=False)
    ref = TF.interpolate(torch.tensor(np.transpose(x, (0, 3, 1, 2))),
                         scale_factor=sf, mode="bilinear",
                         align_corners=False)
    np.testing.assert_allclose(
        np.transpose(np.asarray(out), (0, 3, 1, 2)), ref.numpy(),
        rtol=1e-5, atol=1e-5)
    outn = resize(jnp.asarray(x), scale_factor=sf, mode="nearest")
    refn = TF.interpolate(torch.tensor(np.transpose(x, (0, 3, 1, 2))),
                          scale_factor=sf, mode="nearest")
    np.testing.assert_array_equal(
        np.transpose(np.asarray(outn), (0, 3, 1, 2)), refn.numpy())


@pytest.mark.parametrize("in_hw,out_hw", [((7, 9), (20, 24)),
                                          ((16, 16), (40, 40)),
                                          ((21, 17), (8, 6)),
                                          ((5, 5), (5, 9))])
@pytest.mark.parametrize("align_corners", [False, True])
def test_bicubic_parity(rng, in_hw, out_hw, align_corners):
    """Torch upsample_bicubic2d golden: a=-0.75 cubic convolution,
    replicated border taps, and the cubic-specific unclamped source
    coordinate (negative src keeps its weights instead of clamping to 0)."""
    from image_segmentation_lab_tpu.utils.ops import resize_bicubic
    x = rng.randn(2, *in_hw, 3).astype(np.float32)
    ref = TF.interpolate(torch.tensor(np.transpose(x, (0, 3, 1, 2))),
                         size=out_hw, mode="bicubic",
                         align_corners=align_corners)
    for method in ("gather", "matmul"):
        out = resize_bicubic(jnp.asarray(x), out_hw, align_corners,
                             method=method)
        np.testing.assert_allclose(
            np.transpose(np.asarray(out), (0, 3, 1, 2)), ref.numpy(),
            rtol=1e-4, atol=1e-4, err_msg=method)


def test_bicubic_scale_factor_and_dispatch(rng):
    x = rng.randn(1, 17, 11, 4).astype(np.float32)
    out = resize(jnp.asarray(x), scale_factor=0.5, mode="bicubic",
                 align_corners=False)
    ref = TF.interpolate(torch.tensor(np.transpose(x, (0, 3, 1, 2))),
                         scale_factor=0.5, mode="bicubic",
                         align_corners=False)
    np.testing.assert_allclose(
        np.transpose(np.asarray(out), (0, 3, 1, 2)), ref.numpy(),
        rtol=1e-4, atol=1e-4)


def test_bf16_matmul_fast_path_close_to_f32(rng):
    """The bf16 MXU fast path (round 5, docs/PERF.md: 3.2x on TPU) may
    differ from the f32 matmul route only by the bf16 handoff between
    the two passes and the weight cast — a couple of bf16 ulps."""
    from image_segmentation_lab_tpu.utils.ops import resize_bilinear
    x32 = rng.randn(2, 13, 17, 8).astype(np.float32)
    xb = jnp.asarray(x32).astype(jnp.bfloat16)
    for align, out_hw in [(False, (26, 34)), (True, (26, 34)),
                          (False, (20, 9))]:
        ref = resize_bilinear(xb.astype(jnp.float32), out_hw, align,
                              method="matmul")
        got = resize_bilinear(xb, out_hw, align, method="matmul")
        assert got.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref, np.float32),
                                   rtol=2e-2, atol=2e-2,
                                   err_msg=f"{align} {out_hw}")


def test_bilinear_commutes_with_1x1_conv(rng):
    """up(conv1x1(x)) == conv1x1(up(x)): the identity behind the SETR
    head's classifier/upsample fold (setr_up_head.py round 5) — bilinear
    rows sum to 1, so the bias commutes too."""
    import jax
    from image_segmentation_lab_tpu.utils.ops import resize_bilinear
    x = jnp.asarray(rng.randn(2, 9, 11, 6).astype(np.float32))
    w = jnp.asarray(rng.randn(1, 1, 6, 3).astype(np.float32))
    b = jnp.asarray(rng.randn(3).astype(np.float32))
    conv = lambda t: jax.lax.conv_general_dilated(
        t, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    for align in (False, True):
        for method in ("gather", "matmul"):
            a = resize_bilinear(conv(x), (18, 22), align, method=method)
            c = conv(resize_bilinear(x, (18, 22), align, method=method))
            np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                       rtol=1e-5, atol=1e-5,
                                       err_msg=f"{align} {method}")
