"""Grad-CAM visualization CLI.

Parity target: reference ``tools/analysis_tools/cam_visualization.py:60-142``
(init_model → inference_model → GradCAM on a backbone stage →
overlay save), re-implemented on jax.grad (see
``image_segmentation_lab_tpu/core/inference/cam.py``).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[2]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def parse_args():
    parser = argparse.ArgumentParser(description="Grad-CAM for a segmentor")
    parser.add_argument("--img", required=True, help="input image path")
    parser.add_argument("--network-cfg", type=Path, required=True)
    parser.add_argument("--checkpoint", type=Path, default=None)
    parser.add_argument("--pipeline", type=Path,
                        default=Path("configs/augmentation/defautlt_val_transform.yaml"))
    parser.add_argument("--category", type=int, default=1,
                        help="class index to explain")
    parser.add_argument("--feature-index", type=int, default=-1,
                        help="backbone stage to attribute (reference uses "
                             "backbone.layer4)")
    parser.add_argument("--out-file", default="cam.jpg")
    parser.add_argument("--device", default="")
    return parser.parse_args()


def main():
    args = parse_args()
    import os
    if str(args.device).lower() == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if str(args.device).lower() == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    import image_segmentation_lab_tpu  # noqa: F401
    from image_segmentation_lab_tpu.core.fileio import imread, imwrite
    from image_segmentation_lab_tpu.core.inference import (inference_model,
                                                           init_model)
    from image_segmentation_lab_tpu.core.inference.cam import (
        SemanticSegmentationTarget, grad_cam, show_cam_on_image)
    from image_segmentation_lab_tpu.data.pipeline import Pipeline

    inf = init_model(args.network_cfg, args.checkpoint)
    pred = inference_model(inf, args.img, args.pipeline)
    mask = (pred == args.category).astype(np.float32)
    print(f"category {args.category}: {int(mask.sum())} pixels predicted")

    # CAM operates on the pipeline-sized image
    raw = imread(args.img, channel_order="rgb")
    pipe = Pipeline.from_yaml(args.pipeline)
    net_img, _ = pipe(jax.random.PRNGKey(0),
                      raw[None].astype(np.float32))
    net_img = np.asarray(net_img[0])
    # mask at network resolution
    from image_segmentation_lab_tpu.core.evaluation.metrics import \
        resize_logits_np
    mask_net = resize_logits_np(mask[..., None].astype(np.float32),
                                net_img.shape[:2])[..., 0] > 0.5

    cam = grad_cam(inf, net_img,
                   SemanticSegmentationTarget(args.category,
                                              mask_net.astype(np.float32)),
                   feature_index=args.feature_index)
    vis_base = resize_logits_np(raw.astype(np.float32), cam.shape[:2])
    overlay = show_cam_on_image(vis_base.astype(np.uint8), cam)
    imwrite(overlay[..., ::-1], args.out_file)
    print(f"CAM written to {args.out_file}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
