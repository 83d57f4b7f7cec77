"""Panoptic Quality metric + the panoptic product surface (VERDICT r3
item 6): hand-computed PQ goldens for the evaluator (the panopticapi
recipe — void-aware unions, the mostly-void FP exemption, per-class
averaging), the encoders' ``panoptic`` method, and the ``val.py
--panoptic`` CLI end-to-end on synthetic data.

Beyond-reference capability extending the evaluator role
(/root/reference/core/evaluation/metrics.py:126-208 is semantic-only).
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_segmentation_lab_tpu.core.evaluation import (
    INSTANCE_OFFSET, PanopticEvaluator, panoptic_quality,
    queries_to_panoptic, semantic_to_panoptic)

REPO = Path(__file__).resolve().parents[1]


def _pan(cols, width=8, rows=4):
    """Build a (rows, width) panoptic map from {id: [cols]} spans."""
    pan = np.full((rows, width), -1, np.int64)
    for seg_id, cs in cols.items():
        for c in cs:
            pan[:, c] = seg_id
    return pan


# ------------------------------------------------------------- goldens

def test_pq_hand_golden_two_matches():
    """Two TPs with hand-computed IoUs 0.8 and 0.75.

    GT: class0 cols0-3 (16px), class1 cols4-7 (16px).
    Pred: class0 cols0-4 (20px) -> inter 16, union 20, IoU .8;
          class1 cols5-7 (12px) -> inter 12, union 16, IoU .75.
    Per class PQ = IoU (RQ=1); dataset PQ = SQ = (80+75)/2 = 77.5.
    """
    gt = _pan({1: range(0, 4), 1 * INSTANCE_OFFSET + 1: range(4, 8)})
    pred = _pan({7: range(0, 5), 1 * INSTANCE_OFFSET + 3: range(5, 8)})
    m = panoptic_quality(pred, gt, num_classes=2)
    assert m["PQ"] == pytest.approx(77.5)
    assert m["SQ"] == pytest.approx(77.5)
    assert m["RQ"] == pytest.approx(100.0)
    assert m["per_class"]["PQ"] == pytest.approx([80.0, 75.0])
    assert m["per_class"]["TP"] == [1, 1]
    assert m["per_class"]["FP"] == [0, 0]
    assert m["per_class"]["FN"] == [0, 0]


def test_pq_hand_golden_fp_fn_and_void_exemption():
    """GT: class0 cols0-3, void cols4-5, class1 cols6-7.
    Pred: class1 cols0-3 (no overlap with GT class1 -> FP; GT class0
    unmatched -> FN), class0 cols4-5 (entirely on GT void -> exempt,
    NOT an FP), class1 cols6-7 (IoU 1.0 -> TP).

    class0: TP0 FP0 FN1 -> PQ 0;  class1: TP1(IoU 1) FP1 -> PQ 1/1.5.
    Dataset: PQ (0+66.67)/2, SQ (0+100)/2, RQ (0+66.67)/2.
    """
    gt = _pan({1: range(0, 4), 1 * INSTANCE_OFFSET + 1: range(6, 8)})
    pred = _pan({1 * INSTANCE_OFFSET + 1: range(0, 4),
                 2: range(4, 6),
                 1 * INSTANCE_OFFSET + 2: range(6, 8)})
    m = panoptic_quality(pred, gt, num_classes=2)
    assert m["per_class"]["TP"] == [0, 1]
    assert m["per_class"]["FP"] == [0, 1], "void-covered pred is exempt"
    assert m["per_class"]["FN"] == [1, 0]
    assert m["PQ"] == pytest.approx((0 + 100 / 1.5) / 2, abs=0.01)
    assert m["SQ"] == pytest.approx(50.0)
    assert m["RQ"] == pytest.approx((0 + 100 / 1.5) / 2, abs=0.01)


def test_pq_void_aware_union():
    """A pred segment spilling ONLY onto GT void keeps IoU 1.0: union
    = |p|+|g|-|inter|-|p∩void| (panopticapi).  GT: class0 cols0-3,
    void cols4-7; pred: class0 everywhere."""
    gt = _pan({1: range(0, 4)})
    pred = _pan({1: range(0, 8)})
    m = panoptic_quality(pred, gt, num_classes=1)
    assert m["per_class"]["TP"] == [1]
    assert m["PQ"] == pytest.approx(100.0)


def test_pq_merged_instances_score_zero():
    """Two GT instances of one class merged into one pred segment:
    IoU vs each is exactly 0.5 (NOT > 0.5) -> no match; 2 FN + 1 FP."""
    gt = _pan({1: range(0, 4), 2: range(4, 8)})
    pred = _pan({5: range(0, 8)})
    m = panoptic_quality(pred, gt, num_classes=1)
    assert m["per_class"]["TP"] == [0]
    assert m["per_class"]["FN"] == [2]
    assert m["per_class"]["FP"] == [1]
    assert m["PQ"] == 0.0


def test_pq_perfect_prediction():
    gt = _pan({1: range(0, 3), INSTANCE_OFFSET + 4: range(3, 8)})
    m = panoptic_quality(gt.copy(), gt, num_classes=2)
    assert (m["PQ"], m["SQ"], m["RQ"]) == (100.0, 100.0, 100.0)


def test_pq_absent_classes_excluded_from_average():
    """Classes with TP+FP+FN == 0 don't drag the dataset average."""
    gt = _pan({1: range(0, 8)})
    m = panoptic_quality(gt.copy(), gt, num_classes=5)
    assert m["PQ"] == pytest.approx(100.0)


def test_batched_process_keeps_images_separate():
    """Segment ids are unique per image: a (2,H,W) batch must count 2
    TPs per segment, never merge same-id segments across images."""
    gt = _pan({1: range(0, 4), INSTANCE_OFFSET + 1: range(4, 8)})
    ev = PanopticEvaluator(num_classes=2)
    ev.process(np.stack([gt, gt]), np.stack([gt, gt]))
    m = ev.compute()
    assert m["per_class"]["TP"] == [2, 2]
    assert m["PQ"] == pytest.approx(100.0)


# -------------------------------------------------------- conversions

def test_semantic_to_panoptic_roundtrip():
    sem = np.array([[0, 1], [255, 2]])
    pan = semantic_to_panoptic(sem, ignore_index=255)
    assert pan[0, 0] == 1                       # class0 id stays positive
    assert pan[0, 1] == INSTANCE_OFFSET + 1
    assert pan[1, 0] == -1                      # ignore -> void
    assert pan[1, 1] == 2 * INSTANCE_OFFSET + 1


def test_queries_to_panoptic_encoding():
    qid = np.array([[0, 1], [-1, 2]])
    labels = np.array([2, 0, 2])
    keep = np.array([True, True, True])
    pan = queries_to_panoptic(qid, labels, keep)
    assert pan[0, 0] == 2 * INSTANCE_OFFSET + 1   # query 0, class 2
    assert pan[0, 1] == 0 * INSTANCE_OFFSET + 2   # query 1, class 0
    assert pan[1, 0] == -1                        # void stays void
    assert pan[1, 1] == 2 * INSTANCE_OFFSET + 3   # same class, distinct id
    # same-class queries 0 and 2 produced DIFFERENT segment ids
    assert pan[0, 0] != pan[1, 1]


# ------------------------------------------------- segmentor surface

def _tiny_maskformer_cfg(num_classes=3):
    norm = dict(type="BN")
    return dict(
        type="EncoderDecoder",
        backbone=dict(type="ResNetV1c", depth=18, num_stages=4,
                      out_indices=(0, 1, 2, 3), dilations=(1, 1, 1, 1),
                      strides=(1, 2, 2, 2), norm_cfg=norm,
                      base_channels=8, stem_channels=8),
        decode_head=dict(type="MaskFormerHead",
                         in_channels=[8, 16, 32, 64],
                         in_index=(0, 1, 2, 3),
                         input_transform="multiple_select",
                         channels=16, feat_channels=16, num_queries=8,
                         num_decoder_layers=2, num_heads=2,
                         feedforward_channels=32, dropout_ratio=0.0,
                         num_classes=num_classes),
        test_cfg=dict(mode="whole"))


def test_encoder_decoder_panoptic_method():
    from image_segmentation_lab_tpu.models.builder import build_segmentor
    model = build_segmentor(_tiny_maskformer_cfg())
    x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 32, 3),
                    jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, method="encode_decode")
    qid, labels, keep = model.apply(variables, x, method="panoptic",
                                    object_mask_threshold=0.0)
    assert qid.shape == (2, 32, 32), "id map upsampled to input size"
    assert labels.shape == (2, 8) and keep.shape == (2, 8)
    qid = np.asarray(qid)
    assert qid.min() >= -1 and qid.max() < 8
    assert np.asarray(labels).max() < 3
    # the triple feeds the evaluator end-to-end
    pan = queries_to_panoptic(qid[0], np.asarray(labels)[0],
                              np.asarray(keep)[0])
    m = panoptic_quality(pan, pan, num_classes=3)
    assert m["PQ"] == pytest.approx(100.0) or m["PQ"] == 0.0  # 0 if all void


def test_encoder_decoder_panoptic_rejects_dense_heads():
    from image_segmentation_lab_tpu.models.builder import build_segmentor
    norm = dict(type="BN")
    model = build_segmentor(dict(
        type="EncoderDecoder",
        backbone=dict(type="ResNetV1c", depth=18, num_stages=4,
                      out_indices=(3,), dilations=(1, 1, 1, 1),
                      strides=(1, 2, 2, 2), norm_cfg=norm,
                      base_channels=8, stem_channels=8),
        decode_head=dict(type="FCNHead", in_channels=64, in_index=0,
                         channels=16, num_convs=1, concat_input=False,
                         dropout_ratio=0.0, num_classes=3, norm_cfg=norm),
        test_cfg=dict(mode="whole")))
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, method="encode_decode")
    with pytest.raises(AttributeError, match="dense decode head"):
        model.apply(variables, x, method="panoptic")


# ------------------------------------------------------------ val CLI

PIPELINE_YAML = """\
__version__: 2.0.6
transform:
  __class_fullname__: Compose
  p: 1.0
  transforms:
  - __class_fullname__: Resize
    height: 32
    width: 32
    interpolation: 1
    mask_interpolation: 0
    p: 1.0
  - __class_fullname__: Normalize
    max_pixel_value: 255.0
    mean: [0.485, 0.456, 0.406]
    std: [0.229, 0.224, 0.225]
    p: 1.0
  - __class_fullname__: ToTensorV2
    p: 1.0
"""

DATASET_CFG = """
_pipe = {pipe!r}
dataset = dict(
    train=dict(type='SyntheticDataset', length=8, image_size=(32, 32),
               pipeline=_pipe),
    val=dict(type='SyntheticDataset', length=8, image_size=(32, 32),
             seed=1, return_ori_seg_gt=True, pipeline=_pipe),
    test=dict(type='SyntheticDataset', length=8, image_size=(32, 32),
              seed=2, pipeline=_pipe))
"""

SCHEDULE_CFG = """
seed = 0
deterministic = True
epochs = 1
train_batch_size = 8
val_batch_size = 8
num_workers = 0
optimizer = dict(type='SGD', lr=0.05, momentum=0.9)
amp = False
"""


@pytest.mark.filterwarnings("ignore")
def test_val_cli_panoptic(tmp_path):
    """train 1 epoch -> `val.py --panoptic`: PQ/SQ/RQ in stdout and
    results.json, one id2rgb PNG per val image under <run>/panoptic/."""
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    pipe = tmp_path / "pipe.yaml"
    pipe.write_text(PIPELINE_YAML)
    ds_cfg = tmp_path / "ds.py"
    ds_cfg.write_text(DATASET_CFG.format(pipe=str(pipe)))
    sched = tmp_path / "sched.py"
    sched.write_text(SCHEDULE_CFG)
    net_cfg = "configs/network/fcn/fcn_r18_synthetic.py"
    work = tmp_path / "runs"

    def _run(argv, timeout=1200):
        r = subprocess.run([sys.executable, *argv], cwd=REPO, env=env,
                           capture_output=True, text=True, timeout=timeout)
        assert r.returncode == 0, (r.stdout[-4000:], r.stderr[-4000:])
        return r

    _run(["train.py", "--network-cfg", net_cfg, "--dataset-cfg", str(ds_cfg),
          "--schedule-cfg", str(sched), "--work-dir", str(work),
          "--device", "cpu"])
    best = work / "train" / "exp" / "weights" / "best.pth"
    assert best.exists()

    r = _run(["val.py", "--network-cfg", net_cfg, "--dataset-cfg",
              str(ds_cfg), "--checkpoint", str(best), "--work-dir",
              str(work), "--device", "cpu", "--batch-size", "4",
              "--num-workers", "0", "--panoptic"])
    assert "panoptic (all-stuff):" in r.stdout, r.stdout[-2000:]

    run_dir = work / "val" / "exp"
    payload = json.loads((run_dir / "results.json").read_text())
    pan = payload["panoptic"]
    for k in ("PQ", "SQ", "RQ"):
        assert 0.0 <= pan[k] <= 100.0
    assert len(pan["per_class"]["PQ"]) == 2

    pngs = sorted((run_dir / "panoptic").glob("*.png"))
    assert len(pngs) == 8, [p.name for p in pngs]
    # id2rgb decodes back to valid panoptic ids (0=void or class*1000+1)
    import cv2
    rgb = cv2.imread(str(pngs[0]))[..., ::-1].astype(np.int64)
    ids = rgb[..., 0] + (rgb[..., 1] << 8) + (rgb[..., 2] << 16)
    assert set(np.unique(ids)) <= {0, 1, INSTANCE_OFFSET + 1}


# --------------------------------------------------- TTA composition

def test_panoptic_tta_probs_flip_and_identity_average():
    """The `val.py --panoptic --tta` composition contract (round 5):
    (a) `panoptic_tta_probs` un-flips mask probabilities back to the
    un-augmented frame — flip=True equals the mirrored flip=False
    output of the same input; (b) averaging identical views and running
    `panoptic_from_probs` reproduces `method='panoptic'` exactly (the
    refactor equivalence + the averaging contract)."""
    from image_segmentation_lab_tpu.models.builder import build_segmentor
    from image_segmentation_lab_tpu.models.decode_heads.maskformer_head \
        import panoptic_from_probs

    model = build_segmentor(_tiny_maskformer_cfg())
    x = jnp.asarray(np.random.RandomState(3).randn(2, 32, 32, 3),
                    jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, method="encode_decode")

    p1, m1 = model.apply(variables, x, out_size=(32, 32), flip=False,
                         method="panoptic_tta_probs")
    p2, m2 = model.apply(variables, x, out_size=(32, 32), flip=True,
                         method="panoptic_tta_probs")
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    np.testing.assert_array_equal(np.asarray(m1),
                                  np.asarray(m2)[..., ::-1])
    assert m1.shape[2:4] == (32, 32), "resized to out_size"

    # identical-view average == single-view panoptic method
    avg_p = (p1 + p1) / 2
    avg_m = (m1 + m1) / 2
    qid_t, lab_t, keep_t = panoptic_from_probs(
        avg_p, avg_m, object_mask_threshold=0.0, overlap_threshold=0.8)
    qid, lab, keep = model.apply(variables, x, method="panoptic",
                                 object_mask_threshold=0.0)
    np.testing.assert_array_equal(np.asarray(qid_t), np.asarray(qid))
    np.testing.assert_array_equal(np.asarray(lab_t), np.asarray(lab))
    np.testing.assert_array_equal(np.asarray(keep_t), np.asarray(keep))


def test_panoptic_tta_probs_rejects_dense_heads():
    from image_segmentation_lab_tpu.models.builder import build_segmentor
    norm = dict(type="BN")
    model = build_segmentor(dict(
        type="EncoderDecoder",
        backbone=dict(type="ResNetV1c", depth=18, num_stages=4,
                      out_indices=(3,), dilations=(1, 1, 1, 1),
                      strides=(1, 2, 2, 2), norm_cfg=norm,
                      base_channels=8, stem_channels=8),
        decode_head=dict(type="FCNHead", in_channels=64, in_index=0,
                         channels=16, num_convs=1, concat_input=False,
                         dropout_ratio=0.0, num_classes=3, norm_cfg=norm),
        test_cfg=dict(mode="whole")))
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, method="encode_decode")
    with pytest.raises(AttributeError, match="dense decode head"):
        model.apply(variables, x, method="panoptic_tta_probs")


@pytest.mark.filterwarnings("ignore")
def test_val_cli_panoptic_tta_mask_classification(tmp_path):
    """`val.py --panoptic --tta` on a mask-classification head: the
    TTA-averaged query probabilities feed ONE panoptic competition —
    the run completes, prints PQ and writes the id maps."""
    import pickle

    import flax

    from test_instances import DATASET_CFG as INST_DATASET_CFG
    from test_instances import MASKFORMER_CFG
    from test_instances import PIPELINE_YAML as INST_PIPE

    from image_segmentation_lab_tpu.models.builder import build_segmentor

    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    net_cfg = tmp_path / "maskformer_tiny.py"
    net_cfg.write_text(MASKFORMER_CFG)
    pipe = tmp_path / "pipe.yaml"
    pipe.write_text(INST_PIPE)
    ds_cfg = tmp_path / "ds.py"
    ds_cfg.write_text(INST_DATASET_CFG.format(pipe=str(pipe)))

    ns = {}
    exec(MASKFORMER_CFG, ns)
    model = build_segmentor(ns["model"])
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                   method="encode_decode")
    sd = {}
    for coll in v:
        for k, le in flax.traverse_util.flatten_dict(v[coll]).items():
            sd[".".join(k)] = np.asarray(le)
    ckpt = tmp_path / "init.pth"
    with open(ckpt, "wb") as f:
        pickle.dump({"metadata": {"epoch": 0}, "state_dict": sd}, f)

    r = subprocess.run(
        [sys.executable, "val.py", "--network-cfg", str(net_cfg),
         "--dataset-cfg", str(ds_cfg), "--checkpoint", str(ckpt),
         "--work-dir", str(tmp_path / "runs"), "--device", "cpu",
         "--batch-size", "2", "--num-workers", "0", "--panoptic",
         "--tta", "--tta-scales", "0.75", "1.0"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, (r.stdout[-4000:], r.stderr[-4000:])
    assert "panoptic (mask-cls):" in r.stdout, r.stdout[-2000:]
    run_dir = tmp_path / "runs" / "val" / "exp"
    payload = json.loads((run_dir / "results.json").read_text())
    assert 0.0 <= payload["panoptic"]["PQ"] <= 100.0
    assert len(list((run_dir / "panoptic").glob("*.png"))) == 4
