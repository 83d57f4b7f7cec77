"""Pallas kernel tests (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from image_segmentation_lab_tpu.ops.pallas.confusion import \
    confusion_histograms


@pytest.mark.parametrize("num_classes,ignore", [(2, 255), (19, 255), (3, -1)])
def test_confusion_kernel_matches_jnp(rng, num_classes, ignore):
    logits = jnp.asarray(
        rng.randn(2, 33, 17, num_classes).astype(np.float32))
    gt = rng.randint(0, num_classes, (2, 33, 17))
    gt[0, :5] = ignore
    gt = jnp.asarray(gt)

    ref = confusion_histograms(logits, gt, num_classes, ignore, force="jnp")
    out = confusion_histograms(logits, gt, num_classes, ignore,
                               force="interpret")
    for a, b, name in zip(out, ref, ("inter", "pred", "label")):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)
    # sanity: totals
    valid = int(np.sum(np.asarray(gt) != ignore))
    assert int(np.asarray(out[2]).sum()) == valid
    assert int(np.asarray(out[1]).sum()) == valid


def test_confusion_kernel_all_ignored(rng):
    logits = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    gt = jnp.full((1, 8, 8), 255)
    out = confusion_histograms(logits, gt, 4, 255, force="interpret")
    for arr in out:
        assert float(np.asarray(arr).sum()) == 0.0


def test_negative_labels_excluded_everywhere(rng):
    """classes-subset remap writes -1; it must be ignored in all histograms."""
    logits = jnp.asarray(rng.randn(1, 8, 8, 3).astype(np.float32))
    gt = rng.randint(0, 3, (1, 8, 8))
    gt[0, :2] = -1
    gt = jnp.asarray(gt)
    for force in ("jnp", "interpret"):
        inter, pred_h, label_h = confusion_histograms(logits, gt, 3, 255,
                                                      force=force)
        valid = int(np.sum(np.asarray(gt) >= 0))
        assert int(np.asarray(pred_h).sum()) == valid, force
        assert int(np.asarray(label_h).sum()) == valid, force


@pytest.mark.parametrize("num_classes,ignore", [(2, 255), (19, 255),
                                                (3, -1)])
def test_pixel_on_lanes_hist_matches_jnp(rng, num_classes, ignore):
    """The pixel-on-lanes rewrite (XLA argmax → Pallas (3,C) SMEM
    histogram) must be bit-identical to the jnp path."""
    logits = jnp.asarray(
        rng.randn(2, 41, 23, num_classes).astype(np.float32))
    gt = rng.randint(0, num_classes, (2, 41, 23))
    gt[0, :7] = ignore
    gt[1, 3, :4] = num_classes + 3  # out-of-range → dropped everywhere
    gt = jnp.asarray(gt)
    ref = confusion_histograms(logits, gt, num_classes, ignore, force="jnp")
    out = confusion_histograms(logits, gt, num_classes, ignore,
                               force="interpret_hist")
    for a, b, name in zip(out, ref, ("inter", "pred", "label")):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)
