"""Every shipped network config must build and run a forward pass."""

import glob
from pathlib import Path

import jax
import jax.numpy as jnp
import pytest

from image_segmentation_lab_tpu.core.fileio import load_python_config
from image_segmentation_lab_tpu.models.builder import build_segmentor

REPO = Path(__file__).resolve().parents[1]
NETWORK_CONFIGS = sorted(glob.glob(str(REPO / "configs/network/**/*.py"),
                                   recursive=True))
assert NETWORK_CONFIGS, "network config glob found nothing"


@pytest.mark.parametrize("path", NETWORK_CONFIGS)
def test_network_config_builds_and_runs(path):
    cfg = load_python_config(path)["model"]
    model = build_segmentor(cfg)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           x, method="encode_decode")
    out = model.apply(variables, x, method="encode_decode")
    assert out.shape[0] == 1 and out.shape[1:3] == (64, 64)


def test_schedule_and_dataset_configs_parse():
    schedules = glob.glob(str(REPO / "configs/schedule/*.py"))
    datasets = glob.glob(str(REPO / "configs/dataset/*.py"))
    assert schedules and datasets
    for path in schedules:
        cfg = load_python_config(path)
        assert "optimizer" in cfg
    for path in datasets:
        cfg = load_python_config(path)
        assert set(cfg["dataset"]) >= {"train", "val"}


def test_kvasirsegtest_config_drives_test_mode(tmp_path):
    """configs/dataset/KvasirSEGtest.py (reference file of the same path)
    parses and its test split drives test_mode=True dataset scanning."""
    import cv2
    import numpy as np

    from image_segmentation_lab_tpu.core.builder import (DATASET,
                                                         build_from_cfg)

    cfg = load_python_config(str(REPO / "configs/dataset/KvasirSEGtest.py"))
    ds_cfg = cfg["dataset"]
    assert set(ds_cfg) == {"train", "val", "test"}
    assert ds_cfg["train"]["pipeline"].endswith(
        "defautlt_training_transform.yaml")  # [sic] reference name
    assert ds_cfg["val"]["return_ori_seg_gt"] is True

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    for name in ("a", "b"):
        cv2.imwrite(str(img_dir / f"{name}.jpg"),
                    np.zeros((20, 24, 3), np.uint8))
    test_cfg = dict(ds_cfg["test"], data_root=str(tmp_path),
                    test_mode=True)
    ds = build_from_cfg(test_cfg, DATASET)
    assert ds.test_mode and len(ds) == 2
    img, mask, infos = ds[0]
    assert mask is None  # test mode: no annotation loaded
    assert img.shape[-3:-1] == (640, 640)  # 640 resize from the YAML
    assert infos["ori_img_size_each"] == (20, 24)
