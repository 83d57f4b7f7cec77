"""OHEM pixel-sampler parity with mmseg's batch-level selection.

The reference declares the SAMPLER registry + decode-head hook but ships no
implementation (SURVEY.md §8.2); mmseg's OHEMPixelSampler is the agreed
semantics: selection over the whole flattened batch with
``batch_kept = min_kept * N`` (not per image).
"""

from types import SimpleNamespace

import jax.numpy as jnp
import numpy as np

from image_segmentation_lab_tpu.core.sampler import OHEMPixelSampler

HEAD = SimpleNamespace(ignore_index=255)


def _softmax(x):
    e = np.exp(x - x.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def _mmseg_ohem(logit, label, min_kept, thresh=None, ignore=255):
    """numpy re-derivation of mmseg OHEMPixelSampler.sample."""
    N = label.shape[0]
    C = logit.shape[-1]
    batch_kept = min_kept * N
    flat_logit = logit.reshape(-1, C)
    flat_label = label.reshape(-1)
    valid = flat_label != ignore
    weight = np.zeros(flat_label.shape, np.float32)
    safe = np.where(valid, flat_label, 0)
    if thresh is not None:
        gt_prob = _softmax(flat_logit)[np.arange(flat_label.size), safe]
        sort_prob = np.sort(gt_prob[valid])
        min_threshold = (sort_prob[min(batch_kept, sort_prob.size - 1)]
                         if sort_prob.size else 0.0)
        threshold = max(min_threshold, thresh)
        weight[valid & (gt_prob < threshold)] = 1.0
    else:
        logp = np.log(_softmax(flat_logit))
        loss = -logp[np.arange(flat_label.size), safe]
        vidx = np.where(valid)[0]
        order = np.argsort(-loss[vidx], kind="stable")
        weight[vidx[order[:batch_kept]]] = 1.0
    return weight.reshape(label.shape)


def test_ohem_thresh_path_matches_mmseg_batch_semantics(rng):
    logit = rng.randn(3, 8, 8, 4).astype(np.float32)
    label = rng.randint(0, 4, (3, 8, 8))
    label[0, :2] = 255  # some ignored pixels
    # make image 2 uniformly hard so it should dominate the batch budget
    logit[2] = -3.0 * np.eye(4, dtype=np.float32)[label[2]] + logit[2] * 0.1
    s = OHEMPixelSampler(thresh=0.7, min_kept=10)
    out = np.asarray(s.sample(HEAD, jnp.asarray(logit), jnp.asarray(label)))
    ref = _mmseg_ohem(logit, label, min_kept=10, thresh=0.7)
    np.testing.assert_array_equal(out, ref)


def test_ohem_loss_path_batch_level_topk(rng):
    logit = rng.randn(2, 6, 6, 3).astype(np.float32)
    label = rng.randint(0, 3, (2, 6, 6))
    label[1, 0, :3] = 255
    s = OHEMPixelSampler(thresh=None, min_kept=5)
    out = np.asarray(s.sample(HEAD, jnp.asarray(logit), jnp.asarray(label)))
    ref = _mmseg_ohem(logit, label, min_kept=5)
    # random float losses → no ties, mask-topk == sort-topk exactly
    np.testing.assert_array_equal(out, ref)
    assert out.sum() == 10  # batch_kept = min_kept * N


def test_ohem_budget_can_concentrate_in_one_image(rng):
    """Batch-level selection: when one image holds all the hard pixels it
    consumes the whole budget (a per-image sampler would split it)."""
    N, H, W, C = 2, 4, 4, 3
    logit = np.zeros((N, H, W, C), np.float32)
    label = np.zeros((N, H, W), np.int64)
    logit[0, ..., 0] = 5.0   # image 0: confidently correct (label 0)
    logit[1, ..., 1] = 5.0   # image 1: confidently wrong
    s = OHEMPixelSampler(thresh=None, min_kept=8)
    out = np.asarray(s.sample(HEAD, jnp.asarray(logit), jnp.asarray(label)))
    assert out[1].sum() == 16 and out[0].sum() == 0


def test_ohem_fewer_valid_than_budget_keeps_all_valid():
    logit = np.random.RandomState(0).randn(1, 4, 4, 2).astype(np.float32)
    label = np.full((1, 4, 4), 255, np.int64)
    label[0, 0, :2] = 1
    s = OHEMPixelSampler(thresh=None, min_kept=100)
    out = np.asarray(s.sample(HEAD, jnp.asarray(logit), jnp.asarray(label)))
    np.testing.assert_array_equal(out, (label != 255).astype(np.float32))
