"""Full confusion-matrix dump for a trained checkpoint.

The ecosystem's ``tools/confusion_matrix.py`` analog (the reference lab
has no counterpart; its evaluator keeps only per-class areas,
``/root/reference/core/evaluation/metrics.py:210-270``).  Runs the val
(or test) split exactly like ``val.py`` and accumulates the dense
``(num_classes, num_classes)`` matrix ON DEVICE — one
``jnp.bincount(K * gt + pred)`` per batch, so host traffic is a single
K×K array at the end — then writes ``confusion_matrix.csv`` (+ a
row-normalized ``confusion_matrix.png`` heatmap when cv2 is present)
and prints the row-normalized table.

Usage:
  python tools/analysis_tools/confusion_matrix.py --network-cfg ... \
      --dataset-cfg ... --checkpoint <run>/weights/best.pth [--split test]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[2]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def parse_args():
    parser = argparse.ArgumentParser(
        description="Confusion matrix of a segmentor checkpoint")
    parser.add_argument("--network-cfg", type=Path, required=True)
    parser.add_argument("--dataset-cfg", type=Path, required=True)
    parser.add_argument("--checkpoint", type=Path, required=True)
    parser.add_argument("--split", default="val", choices=["val", "test"])
    parser.add_argument("--out-dir", type=Path, default=Path("runs/confusion"))
    parser.add_argument("--device", default="")
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--num-workers", type=int, default=4)
    parser.add_argument("--amp", action="store_true")
    return parser.parse_args()


class MatrixEvaluator:
    """validate_one_epoch-compatible evaluator accumulating the dense
    matrix (rows = ground truth, cols = prediction)."""

    def __init__(self, num_classes: int, ignore_index: int):
        import jax
        import jax.numpy as jnp
        self.num_classes = num_classes
        self.matrix = None

        k = num_classes

        @jax.jit
        def batch_matrix(logits, gt):
            pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            gt = gt.astype(jnp.int32)
            valid = (gt != ignore_index) & (gt >= 0) & (gt < k)
            flat = jnp.where(valid, k * gt + pred, k * k)
            counts = jnp.bincount(flat.reshape(-1), length=k * k + 1)
            return counts[:-1].reshape(k, k)

        self._batch_matrix = batch_matrix

    def process(self, batch_idx, seg_logits, infos):
        import jax.numpy as jnp
        import numpy as np
        logits = seg_logits["decode"] if isinstance(seg_logits, dict) \
            else seg_logits
        if isinstance(logits, list):          # ragged per-image rescale
            m = sum(self._batch_matrix(l, jnp.asarray(g)[None])
                    for l, g in zip(logits, infos["ori_gt"]))
        else:
            gt = jnp.asarray(np.asarray(infos["ori_gt"]))
            m = self._batch_matrix(logits, gt)
        self.matrix = m if self.matrix is None else self.matrix + m

    def compute_metrics(self):
        import jax
        import numpy as np
        return {"confusion": np.asarray(
            jax.device_get(self.matrix), np.int64)}


def main():
    args = parse_args()
    import os
    if str(args.device).lower() == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if str(args.device).lower() == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    import image_segmentation_lab_tpu  # noqa: F401
    from image_segmentation_lab_tpu.core import DATASET, build_from_cfg
    from image_segmentation_lab_tpu.core.dataset import DataLoader
    from image_segmentation_lab_tpu.core.fileio import (
        mkdir_or_exist, parse_and_backup_config, require_config_key)
    from image_segmentation_lab_tpu.core.initialize import load_checkpoint
    from image_segmentation_lab_tpu.core.mixed_precision import amp_policy
    from image_segmentation_lab_tpu.models.builder import build_segmentor
    from image_segmentation_lab_tpu.train_state import (TrainState,
                                                        make_eval_step)
    from image_segmentation_lab_tpu.utils.jit_init import jit_init_off_cpu
    from image_segmentation_lab_tpu.utils.train_utils import \
        validate_one_epoch

    amp_policy(bool(args.amp))
    network_cfg = require_config_key(
        parse_and_backup_config(args.network_cfg), "model", args.network_cfg)
    dataset_cfg = require_config_key(
        parse_and_backup_config(args.dataset_cfg), "dataset",
        args.dataset_cfg)
    split_cfg = dict(dataset_cfg[args.split])
    split_cfg.setdefault("return_ori_seg_gt", True)

    model = build_segmentor(network_cfg)
    dataset = build_from_cfg(split_cfg, DATASET)
    loader = DataLoader(dataset, batch_size=args.batch_size, shuffle=False,
                        num_workers=args.num_workers,
                        collate_fn=dataset.collate_fn)
    hw = dataset.input_size_hw or (256, 256)
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1)}
    variables = jit_init_off_cpu(
        lambda r, i, g: model.init(r, i, g, img_metas={}, rescale=False,
                                   return_loss=True, train=True))(
        rngs, jnp.zeros((1, *hw, 3), jnp.float32),
        jnp.zeros((1, *hw), jnp.int32))
    variables, _ = load_checkpoint(variables, args.checkpoint)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables.get("params", {}),
                       frozen_params=variables.get("frozen_params", {}),
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=None)

    uniform = (dataset.ori_img_size
               if getattr(dataset, "return_ori_seg_gt", False) else None)
    eval_step = make_eval_step(model, rescale_size=uniform)
    evaluator = MatrixEvaluator(
        dataset.num_classes,
        dataset.ignore_index if dataset.ignore_index is not None else 255)
    _, metrics = validate_one_epoch(0, eval_step, state, loader, evaluator,
                                    pipeline=dataset.device_pipeline)
    matrix = metrics["confusion"]

    mkdir_or_exist(args.out_dir)
    names = list(dataset.CLASSES)
    csv_path = args.out_dir / "confusion_matrix.csv"
    with open(csv_path, "w") as f:
        f.write("gt\\pred," + ",".join(names) + "\n")
        for name, row in zip(names, matrix):
            f.write(name + "," + ",".join(str(int(v)) for v in row) + "\n")
    print(f"confusion matrix (rows = gt, cols = pred) → {csv_path}")

    norm = matrix / np.maximum(matrix.sum(axis=1, keepdims=True), 1)
    width = max(len(n) for n in names) + 2
    header = " " * width + "".join(f"{n:>{width}}" for n in names)
    print(header)
    for name, row in zip(names, norm):
        print(f"{name:>{width}}" +
              "".join(f"{v:>{width}.3f}" for v in row))

    try:
        import cv2
        cell = max(32, 512 // len(names))
        img = (np.kron(norm, np.ones((cell, cell))) * 255).astype(np.uint8)
        img = cv2.applyColorMap(img, cv2.COLORMAP_VIRIDIS)
        png_path = str(args.out_dir / "confusion_matrix.png")
        cv2.imwrite(png_path, img)
        print(f"heatmap → {png_path}")
    except ImportError:
        pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
