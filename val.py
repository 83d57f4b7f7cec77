"""Validation / test entry point.

The reference ships ``val.py`` as an **empty file** (SURVEY.md §8.1); this
implements the intended capability with the same config/CLI conventions as
``train.py``: build the segmentor from the network config, load a checkpoint,
run the dataset's val (or test) split through the compiled eval step, and
report confusion-matrix metrics (mIoU/mDice/mFscore) with per-class tables.
Results are also dumped as JSON into the run directory.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def parse_args():
    parser = argparse.ArgumentParser(description="Evaluate a segmentor (TPU)")
    parser.add_argument("--network-cfg", type=Path, required=True)
    parser.add_argument("--dataset-cfg", type=Path, required=True)
    parser.add_argument("--checkpoint", type=Path, required=True)
    parser.add_argument("--split", default="val", choices=["val", "test"])
    parser.add_argument("--work-dir", type=Path, default=Path("runs"))
    parser.add_argument("--project", default="val")
    parser.add_argument("--name", default="exp")
    parser.add_argument("--device", default="")
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--num-workers", type=int, default=4)
    parser.add_argument("--amp", action="store_true",
                        help="bf16 compute policy for inference")
    parser.add_argument("--tta", action="store_true",
                        help="multi-scale + horizontal-flip test-time "
                             "augmentation (averaged probabilities)")
    parser.add_argument("--tta-scales", type=float, nargs="+",
                        default=[0.75, 1.0, 1.25])
    parser.add_argument("--save-pred", action="store_true",
                        help="write one palette-indexed prediction PNG per "
                             "image (mmseg submission format) under "
                             "<run>/predictions/")
    return parser.parse_args()


def main():
    args = parse_args()
    if str(args.device).lower() == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    if str(args.device).lower() == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from image_segmentation_lab_tpu.utils.compile_cache import \
        enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np

    import image_segmentation_lab_tpu  # noqa: F401
    from image_segmentation_lab_tpu.core import DATASET, build_from_cfg
    from image_segmentation_lab_tpu.core.dataset import DataLoader
    from image_segmentation_lab_tpu.core.evaluation import SegEvaluator
    from image_segmentation_lab_tpu.core.fileio import (
        increment_path, parse_and_backup_config, require_config_key)
    from image_segmentation_lab_tpu.core.initialize import load_checkpoint
    from image_segmentation_lab_tpu.core.mixed_precision import amp_policy
    from image_segmentation_lab_tpu.models.builder import build_segmentor
    from image_segmentation_lab_tpu.train_state import (TrainState,
                                                        make_eval_step)
    from image_segmentation_lab_tpu.utils.train_utils import validate_one_epoch

    save_dir = increment_path(args.work_dir, args.project, args.name)
    amp_policy(bool(args.amp))

    network_cfg = require_config_key(parse_and_backup_config(args.network_cfg),
                           "model", args.network_cfg)
    dataset_cfg = require_config_key(parse_and_backup_config(args.dataset_cfg),
                           "dataset", args.dataset_cfg)
    split_cfg = dict(dataset_cfg[args.split])
    # evaluation needs ground truth at original resolution
    split_cfg.setdefault("return_ori_seg_gt", True)

    model = build_segmentor(network_cfg)
    dataset = build_from_cfg(split_cfg, DATASET)
    loader = DataLoader(dataset, batch_size=args.batch_size, shuffle=False,
                        num_workers=args.num_workers,
                        collate_fn=dataset.collate_fn)

    hw = dataset.input_size_hw or (256, 256)
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1)}
    # jitted init off-CPU: eager flax init pays a tunnel round trip per op
    # on remote TPUs (~4x slower for the flagship — utils/jit_init.py)
    from image_segmentation_lab_tpu.utils.jit_init import jit_init_off_cpu
    variables = jit_init_off_cpu(
        lambda r, i, g: model.init(r, i, g, img_metas={}, rescale=False,
                                   return_loss=True, train=True))(
        rngs, jnp.zeros((1, *hw, 3), jnp.float32),
        jnp.zeros((1, *hw), jnp.int32))
    variables, ckpt = load_checkpoint(variables, args.checkpoint)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables.get("params", {}),
                       frozen_params=variables.get("frozen_params", {}),
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=None)

    # (val.py forces return_ori_seg_gt above, so ori-size rescale is safe
    # whenever the dataset declares a uniform original size)
    uniform = (dataset.ori_img_size
               if getattr(dataset, "return_ori_seg_gt", False) else None)
    eval_step = make_eval_step(model, rescale_size=uniform)
    if args.tta:
        from image_segmentation_lab_tpu.utils.ops import resize
        from image_segmentation_lab_tpu.train_state import (binarize_channels,
                                                            head_threshold,
                                                            make_tta_step)
        tta_step = make_tta_step(model, tuple(args.tta_scales))
        thr = head_threshold(model)

        class TTAStep:
            def __call__(self, state, img, gt):
                probs = tta_step(state.variables(), img)
                if dataset.ori_img_size:
                    probs = resize(probs, size=tuple(dataset.ori_img_size),
                                   mode="bilinear", align_corners=False)
                probs = binarize_channels(probs, thr, is_probs=True)
                return {"decode": probs}, {}

        eval_step = TTAStep()
    evaluator = SegEvaluator(
        epoch=int(ckpt.get("metadata", {}).get("epoch", 0)),
        num_classes=dataset.num_classes,
        class_names=dataset.CLASSES,
        palette=dataset.PALETTE,
        ignore_index=(dataset.ignore_index
                      if dataset.ignore_index is not None else 255),
        output_dir=str(save_dir / "pred_results"),
        save_pred_dir=(str(save_dir / "predictions")
                       if args.save_pred else None))
    val_vars, metrics = validate_one_epoch(
        0, eval_step, state, loader, evaluator,
        pipeline=dataset.device_pipeline)

    print("val loss vars: " +
          " ".join(f"{k}={v:.4f}" for k, v in val_vars.items()))
    payload = {"checkpoint": str(args.checkpoint),
               "losses": val_vars,
               "metrics": {h: {k: (float(v) if np.isscalar(v) or
                                   getattr(v, "ndim", 1) == 0
                                   else np.asarray(v).tolist())
                               for k, v in m.items()}
                           for h, m in metrics.items()}}
    out_file = save_dir / "results.json"
    with open(out_file, "w") as f:
        json.dump(payload, f, indent=2, default=float)
    print(f"results written to {out_file}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
