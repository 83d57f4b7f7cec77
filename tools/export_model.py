"""Export a trained segmentor as a self-contained StableHLO serving artifact.

Beyond-reference tool (the reference serves by rebuilding the Python model
from config + checkpoint, ``/root/reference/core/inference/infer.py:35-90``):

    python tools/export_model.py \
        --network-cfg configs/network/fcn/fcn_r18_synthetic.py \
        --checkpoint runs/train/exp/weights/best.pth \
        --out model.stablehlo --input-size 512 512 [--batch any] \
        [--platforms tpu cpu] [--validate]

The artifact bundles the compiled inference program (whole or slide mode,
as the network config's ``test_cfg`` says) WITH the weights; a serving
process loads it via ``core.inference.export.serve_fn`` — no model code,
config or checkpoint needed.  ``--batch any`` exports a symbolic batch
dimension (whole mode only).  ``--validate`` round-trips the written file
and checks it against the live model on a random input.
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def parse_args():
    p = argparse.ArgumentParser(
        description="Export a segmentor to a StableHLO serving artifact")
    p.add_argument("--network-cfg", type=Path, required=True)
    p.add_argument("--checkpoint", type=Path, default=None,
                   help="trained weights; omit for randomly initialized "
                        "(smoke) exports")
    p.add_argument("--out", type=Path, required=True)
    p.add_argument("--input-size", type=int, nargs=2, default=[512, 512],
                   metavar=("H", "W"))
    p.add_argument("--batch", default="1",
                   help="batch size, or 'any' for a batch-polymorphic "
                        "artifact (whole mode only)")
    p.add_argument("--platforms", nargs="+", default=["tpu", "cpu"])
    p.add_argument("--device", default="",
                   help="'cpu' forces the CPU backend for the export run")
    p.add_argument("--validate", action="store_true",
                   help="reload the written artifact and compare against "
                        "the live model on a random input")
    p.add_argument("--method", default="inference",
                   choices=["inference", "panoptic"],
                   help="program to export: the evaluator's whole/slide "
                        "probability path, or the mask-classification "
                        "panoptic post-processing (query_id/labels/keep "
                        "triple — MaskFormer/Mask2Former heads only)")
    return p.parse_args()


def main():
    args = parse_args()
    if str(args.device).lower() == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")

    from image_segmentation_lab_tpu.core.inference import init_model
    from image_segmentation_lab_tpu.core.inference.export import (
        export_inference, save_exported, serve_fn)

    bundle = init_model(args.network_cfg,
                        str(args.checkpoint) if args.checkpoint else None)
    batch = None if str(args.batch).lower() == "any" else int(args.batch)
    exported = export_inference(bundle.model, bundle.variables,
                                input_hw=tuple(args.input_size),
                                batch=batch,
                                platforms=tuple(args.platforms),
                                method=args.method)
    path = save_exported(exported, args.out)
    size_mb = path.stat().st_size / 1e6
    print(f"exported {args.network_cfg.name} [{args.method}, "
          f"{args.input_size[0]}x{args.input_size[1]}, batch="
          f"{'any' if batch is None else batch}, "
          f"platforms={','.join(args.platforms)}] → {path} ({size_mb:.1f} MB)")

    if args.validate:
        import jax
        import numpy as np
        fn = serve_fn(path)
        b = 2 if batch is None else batch
        x = np.random.RandomState(0).rand(
            b, args.input_size[0], args.input_size[1], 3).astype("float32")
        got = jax.tree.leaves(fn(x))
        want = jax.tree.leaves(bundle.model.apply(bundle.variables, x,
                                                  method=args.method))
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=1e-5, atol=1e-6)
        print(f"validate OK — artifact output matches the live model "
              f"({len(got)} output leaves, first shape "
              f"{np.asarray(got[0]).shape})")


if __name__ == "__main__":
    main()
