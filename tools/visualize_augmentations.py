"""Preview an augmentation pipeline.

Runs N random draws of an augmentation YAML over one image (+ optional
mask) on device and writes a tiled grid — the authoring companion to
``create_augmentation_setting_file.py`` (images are denormalized using the
pipeline's own Normalize stats for display).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--img", required=True)
    parser.add_argument("--mask", default=None)
    parser.add_argument("--pipeline", type=Path, required=True)
    parser.add_argument("--n", type=int, default=9)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--out-file", default="augmentations.jpg")
    parser.add_argument("--device", default="cpu")
    args = parser.parse_args()

    import os
    if str(args.device).lower() == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if str(args.device).lower() == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from image_segmentation_lab_tpu.core.fileio import imread, imwrite
    from image_segmentation_lab_tpu.data.pipeline import Pipeline
    from image_segmentation_lab_tpu.data.transforms import Normalize

    pipe = Pipeline.from_yaml(args.pipeline)

    # find the Normalize stats (recursively — it may sit in a nested
    # Compose/OneOf) for display denormalization
    def find_normalize(t):
        if isinstance(t, Normalize):
            return t
        for child in getattr(t, "transforms", []):
            found = find_normalize(child)
            if found is not None:
                return found
        return None

    norm = find_normalize(pipe.root)
    if norm is not None:
        mean = norm.mean * norm.max_pixel_value
        std = norm.std * norm.max_pixel_value
    else:
        mean, std = np.zeros(3), np.ones(3)

    img = imread(args.img, channel_order="rgb")
    imgs = np.stack([img] * args.n)
    masks = None
    if args.mask:
        mask = imread(args.mask, flag="grayscale")
        masks = np.stack([mask] * args.n)

    out, om = pipe(jax.random.PRNGKey(args.seed), imgs, masks)
    out = np.asarray(out)
    # denormalize back to displayable pixels
    out = np.clip(out * std + mean, 0, 255).astype(np.uint8)
    if om is not None:
        # tint augmented mask in red at 35%
        m = np.asarray(om)[..., None] > 0
        out = np.where(m, (0.65 * out + 0.35 * np.array([255, 0, 0]))
                       .astype(np.uint8), out)

    cols = int(np.ceil(np.sqrt(args.n)))
    rows = int(np.ceil(args.n / cols))
    h, w = out.shape[1:3]
    canvas = np.zeros((rows * h, cols * w, 3), np.uint8)
    for i in range(args.n):
        r, c = divmod(i, cols)
        canvas[r * h:(r + 1) * h, c * w:(c + 1) * w] = out[i]
    imwrite(canvas[..., ::-1], args.out_file)
    print(f"wrote {args.n} augmentation draws to {args.out_file}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
