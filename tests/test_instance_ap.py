"""COCO-style instance mask mAP (``core/evaluation/instance_ap.py``):
hand-computed goldens for the matching rule, the 101-point AP, the IoU
threshold sweep, greedy score-order matching, multi-image pooling and
the no-gt class exclusion (VERDICT r4 item 6)."""

import numpy as np

from image_segmentation_lab_tpu.core.evaluation import (InstanceAPEvaluator,
                                                        IOU_THRESHOLDS,
                                                        mask_iou)


def _rect(h, w, r0, r1, c0, c1):
    m = np.zeros((h, w), bool)
    m[r0:r1, c0:c1] = True
    return m


def test_mask_iou_golden():
    a = _rect(10, 20, 0, 10, 0, 10)          # 100 px
    b = _rect(10, 20, 0, 10, 2, 12)          # 100 px, inter 80
    assert mask_iou(a, a) == 1.0
    assert mask_iou(a, b) == 80 / 120
    assert mask_iou(a, ~a) == 0.0
    assert mask_iou(np.zeros((4, 4), bool), np.zeros((4, 4), bool)) == 0.0


def test_perfect_prediction_is_map_1():
    ev = InstanceAPEvaluator(num_classes=2)
    gt = _rect(16, 16, 2, 12, 2, 12)
    ev.process([(1, 0.9, gt.copy())], [(1, gt)])
    out = ev.compute()
    assert out["mAP"] == 1.0 and out["AP50"] == 1.0 and out["AP75"] == 1.0
    # class 0 has no gt anywhere -> excluded (None), not averaged as 0
    assert out["per_class_AP"] == [None, 1.0]
    assert out["num_gt"] == [0, 1]


def test_extra_false_positive_after_perfect_tp_keeps_ap_1():
    """TP at rank 1 reaches recall 1.0 with precision 1.0; the later FP
    cannot lower any max-precision-at-recall>=r value."""
    ev = InstanceAPEvaluator(num_classes=1)
    gt = _rect(16, 16, 0, 8, 0, 8)
    fp = _rect(16, 16, 10, 14, 10, 14)       # disjoint
    ev.process([(0, 0.9, gt.copy()), (0, 0.8, fp)], [(0, gt)])
    assert ev.compute()["mAP"] == 1.0


def test_iou_threshold_sweep_hand_golden():
    """One pred at IoU exactly 80/120 = 0.667 vs its gt: TP for the 4
    thresholds .50/.55/.60/.65, FP above -> mAP = 4/10, AP50=1, AP75=0."""
    ev = InstanceAPEvaluator(num_classes=1)
    gt = _rect(10, 20, 0, 10, 0, 10)
    pred = _rect(10, 20, 0, 10, 2, 12)
    ev.process([(0, 0.9, pred)], [(0, gt)])
    out = ev.compute()
    assert abs(out["mAP"] - 0.4) < 1e-9
    assert out["AP50"] == 1.0 and out["AP75"] == 0.0


def test_greedy_matches_by_score_order():
    """Higher-score pred takes the gt first (COCO): A (score .9,
    IoU 15/26 = .577) matches at thr <= .55 leaving B (score .8,
    IoU 1.0) as FP -> AP 1.0 there (A is ranked first); at thr >= .60
    A is FP and B TP -> pooled PR is [FP(.9), TP(.8)] -> precision
    envelope 0.5 everywhere -> AP 0.5.  mAP = (2*1 + 8*.5)/10 = 0.6."""
    ev = InstanceAPEvaluator(num_classes=1)
    gt = _rect(1, 40, 0, 1, 0, 20)           # 20 px row
    a = _rect(1, 40, 0, 1, 5, 26)            # inter 15, union 26
    b = gt.copy()                            # IoU 1.0
    assert abs(mask_iou(a, gt) - 15 / 26) < 1e-12
    ev.process([(0, 0.9, a), (0, 0.8, b)], [(0, gt)])
    out = ev.compute()
    assert abs(out["mAP"] - 0.6) < 1e-9
    assert out["AP50"] == 1.0 and out["AP75"] == 0.5


def test_missed_gt_halves_recall():
    """Two gt segments, one matched perfectly, one missed: recall caps
    at 0.5 -> 101-point AP = (51 grid points at precision 1) / 101."""
    ev = InstanceAPEvaluator(num_classes=1)
    g1 = _rect(16, 16, 0, 4, 0, 4)
    g2 = _rect(16, 16, 8, 12, 8, 12)
    ev.process([(0, 0.9, g1.copy())], [(0, g1), (0, g2)])
    out = ev.compute()
    assert abs(out["mAP"] - 51 / 101) < 1e-9


def test_pools_across_images():
    """Same class over two images: image A a perfect TP (score .9),
    image B a disjoint FP (score .95) and a missed gt.  Pooled ranking
    is [FP(.95), TP(.9)] over num_gt=2: precision after rank2 = .5,
    recall = .5 -> AP = 51/101 * 0.5."""
    ev = InstanceAPEvaluator(num_classes=1)
    gt = _rect(8, 8, 0, 4, 0, 4)
    ev.process([(0, 0.9, gt.copy())], [(0, gt)])
    ev.process([(0, 0.95, _rect(8, 8, 4, 8, 4, 8))], [(0, gt)])
    out = ev.compute()
    assert abs(out["mAP"] - 0.5 * 51 / 101) < 1e-9


def test_class_with_preds_but_no_gt_is_excluded():
    ev = InstanceAPEvaluator(num_classes=2)
    gt = _rect(8, 8, 0, 4, 0, 4)
    ev.process([(0, 0.9, gt.copy()), (1, 0.8, gt.copy())], [(0, gt)])
    out = ev.compute()
    assert out["per_class_AP"] == [1.0, None]
    assert out["mAP"] == 1.0
    assert len(IOU_THRESHOLDS) == 10
