"""train.py's parallelism flags end-to-end on the 8-virtual-device mesh
(VERDICT r3 item 2: the matrix must be reachable from the product CLI,
not just the library builders).

A tiny SegFormer (transformer — the family the model-parallel modes
exist for) trains one epoch under each CLI mode; plain DP is the
reference and --tp-shards/--fsdp/--zero1 must reproduce its epoch-0
train loss (identical global batch and rng plan; numerics differ only
by f32 reduction order).  Mirrors the reference's CLI-is-the-product
contract (/root/reference/train.py:26-59).
"""

import os
import re
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]

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
             seed=1, pipeline=_pipe),
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
optimizer = dict(type='AdamW', lr=0.001, weight_decay=0.01)
amp = False
"""

NET_CFG = "configs/network/segformer/segformer_mit_tiny_synthetic.py"


def _run_train(tmp_path, name, extra_flags, n_devices=8):
    env = dict(
        os.environ, JAX_PLATFORMS="cpu",
        XLA_FLAGS=f"--xla_force_host_platform_device_count={n_devices}")
    ds_cfg = tmp_path / "ds.py"
    if not ds_cfg.exists():
        pipe = tmp_path / "pipe.yaml"
        pipe.write_text(PIPELINE_YAML)
        ds_cfg.write_text(DATASET_CFG.format(pipe=str(pipe)))
        (tmp_path / "sched.py").write_text(SCHEDULE_CFG)
    r = subprocess.run(
        [sys.executable, "train.py", "--network-cfg", NET_CFG,
         "--dataset-cfg", str(ds_cfg),
         "--schedule-cfg", str(tmp_path / "sched.py"),
         "--work-dir", str(tmp_path / "runs"), "--name", name,
         "--device", "cpu", *extra_flags],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1500)
    return r


def _epoch0_loss(stdout: str) -> float:
    m = re.search(r"^epoch 0: .*?loss=([0-9.]+)", stdout, re.M)
    assert m, stdout[-3000:]
    return float(m.group(1))


@pytest.fixture(scope="module")
def dp_loss(tmp_path_factory):
    """Plain-DP reference run (the 8-device default path)."""
    tmp = tmp_path_factory.mktemp("cli_parallel")
    r = _run_train(tmp, "dp", [])
    assert r.returncode == 0, (r.stdout[-3000:], r.stderr[-3000:])
    assert "data-parallel over 8 devices" in r.stdout
    return tmp, _epoch0_loss(r.stdout)


def test_cli_tp_matches_dp(dp_loss):
    tmp, ref = dp_loss
    r = _run_train(tmp, "tp", ["--tp-shards", "2"])
    assert r.returncode == 0, (r.stdout[-3000:], r.stderr[-3000:])
    assert "data×model (tensor) parallel over 8 devices" in r.stdout
    assert abs(_epoch0_loss(r.stdout) - ref) < 2e-4, (r.stdout[-1500:], ref)
    best = tmp / "runs" / "train" / "tp" / "weights" / "best.pth"
    assert best.exists()


def test_cli_fsdp_matches_dp(dp_loss):
    tmp, ref = dp_loss
    r = _run_train(tmp, "fsdp", ["--fsdp"])
    assert r.returncode == 0, (r.stdout[-3000:], r.stderr[-3000:])
    assert "FSDP (ZeRO-3) over 8 devices" in r.stdout
    assert abs(_epoch0_loss(r.stdout) - ref) < 2e-4, (r.stdout[-1500:], ref)


def test_cli_zero1_matches_dp(dp_loss):
    tmp, ref = dp_loss
    r = _run_train(tmp, "zero1", ["--zero1"])
    assert r.returncode == 0, (r.stdout[-3000:], r.stderr[-3000:])
    assert "ZeRO-1 over 8 devices" in r.stdout
    assert abs(_epoch0_loss(r.stdout) - ref) < 2e-4, (r.stdout[-1500:], ref)


def test_cli_mode_combination_rejected(tmp_path):
    r = _run_train(tmp_path, "bad", ["--fsdp", "--zero1"])
    assert r.returncode != 0
    assert "cannot be combined" in (r.stdout + r.stderr)


def test_cli_tp_single_device_rejected(tmp_path):
    r = _run_train(tmp_path, "bad1", ["--tp-shards", "2"], n_devices=1)
    assert r.returncode != 0
    assert "needs more than one device" in (r.stdout + r.stderr)
