"""Author augmentation YAML files.

Parity target: reference ``tools/create_augmentation_setting_file.py:15-98``:
defines default train/val pipelines in code and serializes them to the
albumentations YAML format our ``data.Pipeline`` loads.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import yaml

REPO_ROOT = Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def t(name, **kwargs):
    return {"__class_fullname__": name, **kwargs}


def default_train_pipeline(height=640, width=640,
                           mean=(0.485, 0.456, 0.406),
                           std=(0.229, 0.224, 0.225)):
    return {
        "__version__": "2.0.6",
        "transform": t(
            "Compose", p=1.0, transforms=[
                t("Resize", height=height, width=width, interpolation=1,
                  mask_interpolation=0, p=1.0),
                t("OneOf", p=1, transforms=[
                    t("Rotate", limit=[-90.0, 90.0], border_mode=0, fill=0.0,
                      fill_mask=0.0, p=0.5),
                    t("HorizontalFlip", p=0.5),
                    t("VerticalFlip", p=0.5)]),
                t("OneOf", p=1, transforms=[
                    t("MotionBlur", blur_limit=[3, 13], p=0.5),
                    t("GlassBlur", iterations=2, max_delta=4, sigma=2.5,
                      p=0.5),
                    t("Blur", blur_limit=[3, 7], p=0.5),
                    t("Defocus", radius=[3, 10], alias_blur=[0.1, 0.5],
                      p=0.5)]),
                t("OneOf", p=1, transforms=[
                    t("RandomBrightnessContrast",
                      brightness_limit=[-0.2, 0.2],
                      contrast_limit=[-0.2, 0.2], p=0.5),
                    t("RandomGamma", gamma_limit=[60.0, 140.0], p=0.5),
                    t("HueSaturationValue", hue_shift_limit=[-5.0, 5.0],
                      sat_shift_limit=[-10.0, 10.0],
                      val_shift_limit=[-10.0, 10.0], p=0.5)]),
                t("ISONoise", color_shift=[0.05, 0.2], intensity=[0.1, 0.5],
                  p=0.1),
                t("Normalize", max_pixel_value=255.0, mean=list(mean),
                  std=list(std), p=1.0),
                t("ToTensorV2", p=1.0),
            ]),
    }


def default_val_pipeline(height=640, width=640,
                         mean=(0.485, 0.456, 0.406),
                         std=(0.229, 0.224, 0.225)):
    return {
        "__version__": "2.0.6",
        "transform": t(
            "Compose", p=1.0, transforms=[
                t("Resize", height=height, width=width, interpolation=1,
                  mask_interpolation=0, p=1.0),
                t("Normalize", max_pixel_value=255.0, mean=list(mean),
                  std=list(std), p=1.0),
                t("ToTensorV2", p=1.0),
            ]),
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out-dir", type=Path,
                        default=Path("configs/augmentation"))
    parser.add_argument("--height", type=int, default=640)
    parser.add_argument("--width", type=int, default=640)
    parser.add_argument("--prefix", default="generated")
    args = parser.parse_args()

    args.out_dir.mkdir(parents=True, exist_ok=True)
    for split, builder in (("training", default_train_pipeline),
                           ("val", default_val_pipeline)):
        spec = builder(args.height, args.width)
        path = args.out_dir / f"{args.prefix}_{split}_transform.yaml"
        with open(path, "w") as f:
            yaml.safe_dump(spec, f, sort_keys=False)
        # validate: the on-device pipeline must be able to load it
        from image_segmentation_lab_tpu.data.pipeline import Pipeline
        Pipeline.from_yaml(path)
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
