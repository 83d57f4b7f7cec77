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
    parser.add_argument("--panoptic", action="store_true",
                        help="additionally run panoptic evaluation: emit "
                             "per-image panoptic id maps (panopticapi "
                             "id2rgb PNGs under <run>/panoptic/) and report "
                             "PQ/SQ/RQ.  Mask-classification heads "
                             "(MaskFormer/Mask2Former) use their query-"
                             "competition panoptic post-processing; dense "
                             "heads score all-stuff panoptic (one segment "
                             "per class, the standard semantic→panoptic "
                             "conversion)")
    parser.add_argument("--instances", action="store_true",
                        help="additionally export per-image instance "
                             "results from mask-classification heads as "
                             "COCO-style uncompressed-RLE JSON "
                             "(<run>/instances.json); rejects dense heads")
    parser.add_argument("--score-threshold", type=float, default=0.0,
                        help="instances: zero out queries below this "
                             "class-confidence")
    parser.add_argument("--score", action="store_true",
                        help="with --instances: also score the exported "
                             "instances with COCO-style mask mAP "
                             "(IoU .50:.05:.95, 101-point AP) against "
                             "per-class gt segments (semantic gt carries "
                             "no instance ids, so each class present in "
                             "an image forms one gt segment — the same "
                             "all-stuff convention the panoptic path "
                             "uses for dense heads)")
    parser.add_argument("--object-mask-threshold", type=float, default=0.8,
                        help="panoptic: min query confidence to keep a "
                             "segment (mask-classification heads)")
    parser.add_argument("--overlap-threshold", type=float, default=0.8,
                        help="panoptic: min retained fraction of a query's "
                             "own mask after per-pixel competition")
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

    pan_metrics = None
    if args.panoptic:
        from image_segmentation_lab_tpu.core.evaluation import (
            PanopticEvaluator, queries_to_panoptic, semantic_to_panoptic)
        ignore = (dataset.ignore_index
                  if dataset.ignore_index is not None else 255)
        pan_eval = PanopticEvaluator(dataset.num_classes)
        pan_dir = save_dir / "panoptic"
        pan_dir.mkdir(parents=True, exist_ok=True)

        # mask-classification heads carry their own panoptic
        # post-processing; everything else scores all-stuff panoptic
        try:
            mask_path = hasattr(model.bind(variables).decode_head_module,
                                "panoptic_map")
        except AttributeError:
            mask_path = False
        if mask_path and args.tta:
            # TTA/panoptic composition (mask-classification heads):
            # per-query class + mask probabilities are averaged over
            # the same multi-scale + hflip views as semantic TTA
            # (queries are deterministic slots, so per-query averaging
            # is well-defined), then ONE panoptic competition runs on
            # the averages.  Dense heads already compose below: their
            # all-stuff path consumes eval_step, which IS the TTA step.
            from image_segmentation_lab_tpu.models.decode_heads.\
                maskformer_head import panoptic_from_probs
            from image_segmentation_lab_tpu.utils.ops import resize as _rs

            @jax.jit
            def pan_step(v, img):
                H, W = img.shape[1:3]
                acc_p, acc_m, n = 0.0, 0.0, 0
                for s in args.tta_scales:
                    scaled = _rs(img, size=(int(H * s), int(W * s)),
                                 mode="bilinear", align_corners=False)
                    for flip in (False, True):
                        x = scaled[:, :, ::-1, :] if flip else scaled
                        p, m = model.apply(v, x, out_size=(H, W),
                                           flip=flip,
                                           method="panoptic_tta_probs")
                        acc_p, acc_m, n = acc_p + p, acc_m + m, n + 1
                return panoptic_from_probs(
                    acc_p / n, acc_m / n,
                    object_mask_threshold=args.object_mask_threshold,
                    overlap_threshold=args.overlap_threshold)
        elif mask_path:
            pan_step = jax.jit(lambda v, img: model.apply(
                v, img,
                object_mask_threshold=args.object_mask_threshold,
                overlap_threshold=args.overlap_threshold,
                method="panoptic"))

        def _nearest(arr, shape):
            ys = np.arange(shape[0]) * arr.shape[0] // shape[0]
            xs = np.arange(shape[1]) * arr.shape[1] // shape[1]
            return arr[ys][:, xs]

        def _write_id2rgb(pan, path):
            # panopticapi id2rgb encoding; void (<0) stores id 0
            import cv2
            ids = np.where(pan < 0, 0, pan).astype(np.int64)
            rgb = np.stack([ids % 256, (ids >> 8) % 256, (ids >> 16) % 256],
                           axis=-1).astype(np.uint8)
            cv2.imwrite(str(path), rgb[..., ::-1])  # cv2 expects BGR

        n_done = 0
        for batch_idx, (images, labels, infos) in enumerate(loader):
            if dataset.device_pipeline is not None:
                rng = jax.random.PRNGKey(batch_idx)
                images, labels = dataset.device_pipeline(rng, images, labels)
            else:
                images = jnp.asarray(images, jnp.float32)
                labels = jnp.asarray(labels)
            labels = labels.astype(jnp.int32)
            gts = infos.get("ori_gt")
            if gts is None:
                gts = np.asarray(jax.device_get(labels))
            files = infos.get("img_file_path")

            if mask_path:
                qid, qlabels, keep = pan_step(variables, images)
                qid = np.asarray(jax.device_get(qid))
                qlabels = np.asarray(jax.device_get(qlabels))
                keep = np.asarray(jax.device_get(keep))
            else:
                seg_logits, _ = eval_step(state, images, labels)
                value = seg_logits["decode"]
                if isinstance(value, dict):  # aux ModuleList case
                    value = value[sorted(value)[0]]
                if not isinstance(value, (list, tuple)):
                    preds_b = np.asarray(jax.device_get(
                        jnp.argmax(jnp.asarray(value), axis=-1)))

            for i in range(int(images.shape[0])):
                gt = np.asarray(gts[i]).astype(np.int64)
                if mask_path:
                    q = qid[i]
                    if q.shape != gt.shape:
                        q = _nearest(q, gt.shape)
                    pred_pan = queries_to_panoptic(q, qlabels[i], keep[i])
                else:
                    if isinstance(value, (list, tuple)):
                        logit = np.asarray(jax.device_get(value[i]))
                        if logit.ndim == 4:
                            logit = logit[0]
                        pred = logit.argmax(-1)
                    else:
                        pred = preds_b[i]
                    if pred.shape != gt.shape:
                        pred = _nearest(pred, gt.shape)
                    pred_pan = semantic_to_panoptic(pred, ignore)
                pan_eval.process(pred_pan, semantic_to_panoptic(gt, ignore))
                stem = (Path(str(files[i])).stem
                        if files is not None and i < len(files)
                        else f"{n_done:06d}")
                _write_id2rgb(pred_pan, pan_dir / f"{stem}.png")
                n_done += 1

        pan_metrics = pan_eval.compute()
        from image_segmentation_lab_tpu.core.evaluation import AsciiTable
        per = pan_metrics["per_class"]
        names = [(dataset.CLASSES[c] if dataset.CLASSES
                  and c < len(dataset.CLASSES) else str(c))
                 for c in range(dataset.num_classes)]
        table = AsciiTable()
        table.add_column("class", names)
        for col in ("PQ", "SQ", "RQ"):
            table.add_column(col, [f"{v:.2f}" for v in per[col]])
        for col in ("TP", "FP", "FN"):
            table.add_column(col, per[col])
        print(table.get_string())
        print(f"panoptic ({'mask-cls' if mask_path else 'all-stuff'}): "
              f"PQ={pan_metrics['PQ']:.2f} SQ={pan_metrics['SQ']:.2f} "
              f"RQ={pan_metrics['RQ']:.2f}  "
              f"({n_done} maps -> {pan_dir})")

    inst_metrics = None
    if args.instances:
        from image_segmentation_lab_tpu.core.evaluation import (
            InstanceAPEvaluator, instances_to_json)
        inst_step = jax.jit(lambda v, img: model.apply(
            v, img, score_threshold=args.score_threshold,
            method="instances"))
        inst_eval = (InstanceAPEvaluator(len(dataset.CLASSES))
                     if args.score else None)
        inst_ignore = (dataset.ignore_index
                       if dataset.ignore_index is not None else 255)
        records = []
        for batch_idx, (images, labels, infos) in enumerate(loader):
            if dataset.device_pipeline is not None:
                rng = jax.random.PRNGKey(batch_idx)
                images, labels = dataset.device_pipeline(rng, images, labels)
            else:
                images = jnp.asarray(images, jnp.float32)
            files = infos.get("img_file_path")
            ilabels, scores, masks = (np.asarray(jax.device_get(a))
                                      for a in inst_step(variables, images))
            gt_np = np.asarray(labels)
            for i in range(int(images.shape[0])):
                name = (str(files[i]) if files is not None and i < len(files)
                        else f"{len(records):06d}")
                records.append({
                    "image": name,
                    "instances": instances_to_json(ilabels[i], scores[i],
                                                   masks[i])})
                if inst_eval is not None:
                    # semantic gt: one all-stuff segment per class present
                    gt = gt_np[i]
                    gts = [(c, gt == c)
                           for c in np.unique(gt)
                           if c != inst_ignore and 0 <= c]
                    preds = [(int(ilabels[i, q]), float(scores[i, q]),
                              masks[i, q])
                             for q in range(scores.shape[1])
                             if scores[i, q] > 0]
                    inst_eval.process(preds, gts)
        inst_file = save_dir / "instances.json"
        with open(inst_file, "w") as f:
            json.dump(records, f)
        n_inst = sum(len(r["instances"]) for r in records)
        print(f"instances: {n_inst} over {len(records)} images "
              f"-> {inst_file}")
        if inst_eval is not None:
            inst_metrics = inst_eval.compute()
            per_cls = " ".join(
                f"{dataset.CLASSES[c]}={ap:.3f}"
                for c, ap in enumerate(inst_metrics["per_class_AP"])
                if ap is not None)
            print(f"instance AP: mAP={inst_metrics['mAP']:.4f} "
                  f"AP50={inst_metrics['AP50']:.4f} "
                  f"AP75={inst_metrics['AP75']:.4f}  [{per_cls}]")

    print("val loss vars: " +
          " ".join(f"{k}={v:.4f}" for k, v in val_vars.items()))
    payload = {"checkpoint": str(args.checkpoint),
               "losses": val_vars,
               **({"panoptic": pan_metrics} if pan_metrics else {}),
               **({"instance_ap": inst_metrics} if inst_metrics else {}),
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
