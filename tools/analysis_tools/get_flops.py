"""FLOPs / parameter counter for a network config (mmseg-ecosystem
``tools/analysis_tools/get_flops.py`` analog, XLA-native).

Instead of a torch module-hook estimator, the compiled program itself is
queried: the requested surface is jitted, lowered, compiled, and XLA's
``cost_analysis()`` reports the FLOPs and HBM bytes the program actually
executes — convs, attention einsums, resizes, fused epilogues and all,
after constant folding and DCE.  That makes the number the true compute
cost of THIS framework's program, not a paper estimate (e.g. a slide
test_cfg reports the full grid's cost including window overlap).

Reference analog: none (the reference lab ships no FLOP counter; its
ecosystem's get_flops.py uses mmcv hooks).

Usage:
    python tools/analysis_tools/get_flops.py \
        --network-cfg configs/network/fcn/fcn_r18_synthetic.py \
        [--height 512 --width 512 --batch 1] \
        [--method encode_decode|inference|extract_feat] [--device cpu]

Prints parameter counts (trainable + frozen, with a per-submodule
breakdown) and the surface's FLOPs / bytes accessed, plus per-image
derived numbers.
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[2]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def tree_size(tree) -> int:
    import jax
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))


def cost_analysis(fn, *args):
    """XLA cost analysis of ``jit(fn)(*args)`` as a flat dict (handles
    the list-of-dicts form older jax versions return)."""
    import jax
    cost = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0] if cost else {}
    return dict(cost or {})


def _human(n: float, unit: str = "") -> str:
    for div, suffix in ((1e12, "T"), (1e9, "G"), (1e6, "M"), (1e3, "k")):
        if abs(n) >= div:
            return f"{n / div:.3f} {suffix}{unit}"
    return f"{n:.0f} {unit}"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--network-cfg", required=True)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--method", default="encode_decode",
                    choices=["encode_decode", "inference", "extract_feat"])
    ap.add_argument("--device", choices=["default", "cpu"],
                    default="default")
    args = ap.parse_args()

    if args.device == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from image_segmentation_lab_tpu.core.fileio.parse import \
        load_python_config
    from image_segmentation_lab_tpu.models.builder import build_segmentor
    from image_segmentation_lab_tpu.utils.jit_init import jit_init_off_cpu

    cfg = load_python_config(args.network_cfg)
    model = build_segmentor(cfg["model"] if "model" in cfg else cfg)
    B, H, W = args.batch, args.height, args.width
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1)}
    img1 = jnp.zeros((1, H, W, 3), jnp.float32)
    variables = jit_init_off_cpu(
        lambda r, x: model.init(r, x, method="inference"))(rngs, img1)

    params = variables.get("params", {})
    frozen = variables.get("frozen_params", {})
    total = tree_size(params) + tree_size(frozen)
    print(f"# {type(model).__name__} from {args.network_cfg}")
    print(f"input: {B}x{H}x{W}x3, surface: {args.method}")
    print(f"\nparams: {_human(total)} "
          f"({_human(tree_size(params))} trainable, "
          f"{_human(tree_size(frozen))} frozen)")
    for top in sorted(set(params) | set(frozen)):
        n = tree_size(params.get(top, {})) + tree_size(frozen.get(top, {}))
        print(f"  {top:<18s} {_human(n)}")

    x = jnp.zeros((B, H, W, 3), jnp.float32)
    cost = cost_analysis(
        lambda v, xx: model.apply(v, xx, method=args.method), variables, x)
    flops = float(cost.get("flops", 0.0))
    nbytes = float(cost.get("bytes accessed", 0.0))
    print(f"\n{args.method} cost (XLA cost_analysis on "
          f"{jax.devices()[0].platform}):")
    print(f"  flops:          {_human(flops, 'FLOP')}"
          f"  ({_human(flops / B, 'FLOP')}/img)")
    if nbytes:
        print(f"  bytes accessed: {_human(nbytes, 'B')}"
              f"  (arithmetic intensity {flops / nbytes:.1f} FLOP/B)")


if __name__ == "__main__":
    main()
