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
