"""Full-cycle integration at the real Kvasir resolution (VERDICT r1 #8).

train.py (2 epochs @640², Kvasir YAML pipeline, ignore_index=-1) →
best.pth → val.py (whole) → val.py --tta, with the no-TTA metrics
cross-checked against an **independent** numpy golden: the test reloads the
checkpoint, runs encode_decode per val image itself, and recomputes
mIoU/aAcc from scratch.  Mirrors the reference's primary workload
(/root/reference/train.py:119-161) and the empty val.py promise (§8.1).
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]

DATASET_CFG = """
dataset = dict(
    train=dict(type='SyntheticDataset', length=8, image_size=(640, 640),
               ignore_index=-1,
               pipeline='configs/augmentation/kvasir_train_transform.yaml'),
    val=dict(type='SyntheticDataset', length=4, image_size=(640, 640),
             seed=1, return_ori_seg_gt=True, ignore_index=-1,
             pipeline='configs/augmentation/kvasir_val_transform.yaml'),
    test=dict(type='SyntheticDataset', length=4, image_size=(640, 640),
              seed=2, ignore_index=-1,
              pipeline='configs/augmentation/kvasir_val_transform.yaml'))
"""

SCHEDULE_CFG = """
seed = 0
deterministic = True
epochs = 2
train_batch_size = 4
val_batch_size = 4
num_workers = 0
optimizer = dict(type='SGD', lr=0.05, momentum=0.9, weight_decay=0.0005)
lr_config = dict(type='StepLR', step_size=1, gamma=0.5)
amp = False
"""


def _run(args, env, timeout=1500):
    r = subprocess.run([sys.executable, *args], cwd=REPO, env=env,
                       capture_output=True, text=True, timeout=timeout)
    assert r.returncode == 0, (r.stdout[-4000:], r.stderr[-4000:])
    return r


def _np_iou(pred, gt, num_classes, ignore):
    valid = gt != ignore
    p, g = pred[valid], gt[valid]
    ious = []
    for c in range(num_classes):
        inter = ((p == c) & (g == c)).sum()
        union = ((p == c) | (g == c)).sum()
        ious.append(inter / union if union else np.nan)
    return np.array(ious), (p == g).mean()


@pytest.mark.filterwarnings("ignore")
def test_full_cycle_train_val_tta_640(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    ds_cfg = tmp_path / "kvasir_shaped_640.py"
    ds_cfg.write_text(DATASET_CFG)
    sched_cfg = tmp_path / "schedule_640.py"
    sched_cfg.write_text(SCHEDULE_CFG)
    net_cfg = "configs/network/fcn/fcn_r18_synthetic.py"
    work = tmp_path / "runs"

    _run(["train.py", "--network-cfg", net_cfg,
          "--dataset-cfg", str(ds_cfg), "--schedule-cfg", str(sched_cfg),
          "--work-dir", str(work), "--device", "cpu"], env)
    best = work / "train" / "exp" / "weights" / "best.pth"
    last = work / "train" / "exp" / "weights" / "last.pth"
    assert best.exists() and last.exists()

    r = _run(["val.py", "--network-cfg", net_cfg,
              "--dataset-cfg", str(ds_cfg), "--checkpoint", str(best),
              "--work-dir", str(work), "--device", "cpu",
              "--num-workers", "0"], env)
    res_file = work / "val" / "exp" / "results.json"
    payload = json.loads(res_file.read_text())
    miou = payload["metrics"]["decode"]["mIoU"]
    aacc = payload["metrics"]["decode"]["aAcc"]
    assert 0.0 <= miou <= 100.0 and 0.0 <= aacc <= 100.0

    # --tta (multi-scale + flip averaged probabilities) must run and stay
    # in the same regime as the plain pass
    r = _run(["val.py", "--network-cfg", net_cfg,
              "--dataset-cfg", str(ds_cfg), "--checkpoint", str(best),
              "--work-dir", str(work), "--device", "cpu",
              "--num-workers", "0", "--tta",
              "--tta-scales", "0.75", "1.0"], env)
    tta_file = work / "val" / "exp2" / "results.json"
    tta_miou = json.loads(tta_file.read_text())["metrics"]["decode"]["mIoU"]
    assert 0.0 <= tta_miou <= 100.0
    assert abs(tta_miou - miou) < 25.0, (tta_miou, miou)

    # ---- independent golden: recompute the no-TTA metrics from scratch
    import jax
    import jax.numpy as jnp

    from image_segmentation_lab_tpu.core import DATASET, build_from_cfg
    from image_segmentation_lab_tpu.core.dataset import DataLoader
    from image_segmentation_lab_tpu.core.fileio import parse_and_backup_config
    from image_segmentation_lab_tpu.core.initialize import load_checkpoint
    from image_segmentation_lab_tpu.models.builder import build_segmentor

    network_cfg = parse_and_backup_config(Path(net_cfg))["model"]
    model = build_segmentor(network_cfg)
    ns = {}
    exec(DATASET_CFG, ns)
    dataset = build_from_cfg(dict(ns["dataset"]["val"]), DATASET)
    hw = dataset.input_size_hw
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, *hw, 3), jnp.float32), jnp.zeros((1, *hw), jnp.int32),
        img_metas={}, rescale=False, return_loss=True, train=True)
    variables, _ = load_checkpoint(variables, best)
    infer_vars = {k: variables[k] for k in
                  ("params", "frozen_params", "batch_stats")
                  if k in variables}

    loader = DataLoader(dataset, batch_size=4, shuffle=False, num_workers=0,
                        collate_fn=dataset.collate_fn)
    inter = np.zeros(2)
    union = np.zeros(2)
    correct = total = 0
    for batch_idx, (img, gt, infos) in enumerate(loader):
        if dataset.device_pipeline is not None:
            # same key schedule as validate_one_epoch (epoch 0); the val
            # pipeline is deterministic (resize+normalize) anyway
            rng = jax.random.PRNGKey(batch_idx)
            img, _ = dataset.device_pipeline(rng, img, gt)
        else:
            img = jnp.asarray(img, jnp.float32)
        logits = model.apply(infer_vars, img, method="encode_decode")
        ori = np.asarray(infos["ori_gt"])
        if logits.shape[1:3] != ori.shape[1:3]:
            from image_segmentation_lab_tpu.utils.ops import resize
            logits = resize(logits, size=ori.shape[1:3], mode="bilinear",
                            align_corners=False)
        pred = np.asarray(jnp.argmax(logits, -1))
        valid = ori != -1
        for c in range(2):
            inter[c] += ((pred == c) & (ori == c) & valid).sum()
            union[c] += (((pred == c) | (ori == c)) & valid).sum()
        correct += (pred[valid] == ori[valid]).sum()
        total += valid.sum()
    golden_miou = round(float(np.mean(inter / union)) * 100, 2)
    golden_aacc = round(float(correct / total) * 100, 2)
    assert abs(golden_miou - miou) < 0.05, (golden_miou, miou)
    assert abs(golden_aacc - aacc) < 0.05, (golden_aacc, aacc)
