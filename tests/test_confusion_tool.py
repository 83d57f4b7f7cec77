"""Confusion-matrix tool: evaluator numerics golden + CLI end-to-end."""

import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "tools" / "analysis_tools"))


def test_matrix_evaluator_matches_numpy(rng):
    from confusion_matrix import MatrixEvaluator
    K = 4
    ev = MatrixEvaluator(num_classes=K, ignore_index=255)
    for b in range(3):
        logits = rng.randn(2, 9, 9, K).astype(np.float32)
        gt = rng.randint(0, K, size=(2, 9, 9)).astype(np.int32)
        gt[0, :2, :2] = 255
        ev.process(b, {"decode": jnp.asarray(logits)}, {"ori_gt": gt})
    got = ev.compute_metrics()["confusion"]
    assert got.shape == (K, K)
    assert int(got.sum()) == 3 * 2 * 9 * 9 - 3 * 4  # ignored pixels excluded
    # exact golden on a hand-built batch: predict class 2 everywhere
    logits = np.zeros((1, 3, 3, K), np.float32)
    logits[..., 2] = 5.0                       # predict class 2 everywhere
    gt = np.asarray([[[0, 1, 2], [3, 255, 0], [1, 2, 3]]], np.int32)
    ev3 = MatrixEvaluator(num_classes=K, ignore_index=255)
    ev3.process(0, {"decode": jnp.asarray(logits)}, {"ori_gt": gt})
    m = ev3.compute_metrics()["confusion"]
    want = np.zeros((K, K), np.int64)
    for c, n in ((0, 2), (1, 2), (2, 2), (3, 2)):
        want[c, 2] = n
    np.testing.assert_array_equal(m, want)


def test_confusion_tool_cli(tmp_path):
    """Synthesize a checkpoint (no training needed) and run the CLI."""
    import os
    code = f"""
import os
os.environ['JAX_PLATFORMS'] = 'cpu'
import jax
jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp
import image_segmentation_lab_tpu
from image_segmentation_lab_tpu.core.builder import build_optimizer
from image_segmentation_lab_tpu.core.fileio import (parse_and_backup_config,
                                                    require_config_key)
from image_segmentation_lab_tpu.models.builder import build_segmentor
from image_segmentation_lab_tpu.train_state import create_train_state
from image_segmentation_lab_tpu.utils.train_utils import save_model
cfg = require_config_key(parse_and_backup_config(
    'configs/network/fcn/fcn_r18_synthetic.py'), 'model', 'net')
model = build_segmentor(cfg)
tx = build_optimizer(dict(type='SGD', lr=0.01))
state = create_train_state(model, jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)),
                           jnp.zeros((1, 64, 64), jnp.int32), tx)
save_model(state, dict(epoch=0), r'{tmp_path}/ckpt.pth')
"""
    env = {**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": str(REPO)}
    r = subprocess.run([sys.executable, "-c", code], cwd=str(REPO), env=env,
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    r = subprocess.run(
        [sys.executable, "tools/analysis_tools/confusion_matrix.py",
         "--network-cfg", "configs/network/fcn/fcn_r18_synthetic.py",
         "--dataset-cfg", "configs/dataset/synthetic.py",
         "--checkpoint", str(tmp_path / "ckpt.pth"),
         "--device", "cpu", "--out-dir", str(tmp_path / "out")],
        cwd=str(REPO), env=env, capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, r.stderr[-2000:]
    csv = (tmp_path / "out" / "confusion_matrix.csv").read_text()
    assert csv.startswith("gt\\pred,background,object")
    rows = csv.strip().splitlines()[1:]
    total = sum(int(v) for row in rows for v in row.split(",")[1:])
    assert total > 0
