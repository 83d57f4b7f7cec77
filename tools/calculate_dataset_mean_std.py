"""Compute dataset channel mean/std.

Parity target: reference ``tools/calculate_dataset_mean_std.py:7-61``:
recursive image glob, E[X] / E[X²] accumulation.  Values are printed in
[0, 1] RGB order, ready for a Normalize transform.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

IMG_SUFFIXES = {".jpg", ".jpeg", ".png", ".bmp", ".tif", ".tiff"}


def calculate_mean_std(img_dir: Path, limit: int = 0):
    from image_segmentation_lab_tpu.core.fileio import imread

    total = np.zeros(3, np.float64)
    total_sq = np.zeros(3, np.float64)
    count = 0
    n_images = 0
    for path in sorted(img_dir.rglob("*")):
        if path.suffix.lower() not in IMG_SUFFIXES or not path.is_file():
            continue
        img = imread(str(path), channel_order="rgb").astype(np.float64) / 255.0
        total += img.sum(axis=(0, 1))
        total_sq += (img ** 2).sum(axis=(0, 1))
        count += img.shape[0] * img.shape[1]
        n_images += 1
        if limit and n_images >= limit:
            break
    if count == 0:
        raise RuntimeError(f"no images found under {img_dir}")
    mean = total / count
    std = np.sqrt(total_sq / count - mean ** 2)
    return mean, std, n_images


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("img_dir", type=Path)
    parser.add_argument("--limit", type=int, default=0,
                        help="stop after N images (0 = all)")
    args = parser.parse_args()
    mean, std, n = calculate_mean_std(args.img_dir, args.limit)
    print(f"images: {n}")
    print(f"mean (RGB, 0-1): {np.round(mean, 4).tolist()}")
    print(f"std  (RGB, 0-1): {np.round(std, 4).tolist()}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
