"""Per-stage amortized timing of a segmentor on the current JAX device.

The measurement method is the one validated in ``docs/PERF.md``: K
forward passes run inside ONE jitted ``lax.fori_loop`` (each iteration's
input is perturbed by the running scalar so XLA cannot CSE the loop away)
and a single scalar is fetched to host; the measured no-op round-trip is
subtracted.  On a remote/tunneled TPU this is the only sound method —
``block_until_ready`` returns before remote execution finishes, and a
per-call scalar fetch pays a ~30 ms round trip.

Reference analog: none (the reference has no profiler; its timings come
from tqdm epoch rates, ``/root/reference/utils/train_utils.py:77-103``).

Usage:
    python tools/analysis_tools/profile_model.py \
        --network-cfg configs/network/deeplabv3/deeplabv3_r50-d8.py \
        [--height 512 --width 512 --batch 8 --iters 8 --device cpu]

Prints one line per surface: backbone-through-stage-i, encode_decode,
and full inference (whole or slide per the config's test_cfg).

Each surface compiles its own program (XLA dead-code-eliminates the
unused later stages, so stage deltas are true stage costs).  Pick
``--iters`` so that iters x per-surface-time well exceeds the round trip
(~30-45 ms on a tunnel) — with small models/batches and few iters the
per-stage deltas drown in round-trip variance.  First run
on a big model pays one compile per line (~30 s each on a co-located
host, worse over a tunnel); the persistent compile cache makes repeat
runs fast.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[2]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def amortized_ms(fn, x, iters: int, repeats: int = 3) -> float:
    """Per-call milliseconds of ``fn(x)``, amortized (see module doc)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    @jax.jit
    def run(x):
        def body(i, acc):
            out = fn(x + (acc * 1e-30).astype(x.dtype))
            return acc + jnp.sum(out).astype(jnp.float32) * 1e-30 + 1.0
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    noop = jax.jit(lambda x: jnp.sum(x).astype(jnp.float32))

    def timed(call, reps):
        call()
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            call()
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t = timed(lambda: float(run(x)), repeats)
    rtt = timed(lambda: float(noop(x)), repeats)
    return (t - rtt) / iters * 1e3


def _fmt(ms: float, batch: int) -> str:
    """A measurement at or below the round-trip noise floor prints as such
    instead of an absurd (or divide-by-zero) rate."""
    if ms < 0.05:
        return f"{ms:9.2f} ms (below round-trip noise floor)"
    return f"{ms:9.2f} ms ({batch / ms * 1e3:8.1f} img/s)"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--network-cfg", required=True)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--device", choices=["default", "cpu"], default="default")
    ap.add_argument("--no-amp", action="store_true",
                    help="fp32 instead of the default bf16 compute")
    args = ap.parse_args()

    if args.device == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from image_segmentation_lab_tpu.core.fileio.parse import \
        load_python_config
    from image_segmentation_lab_tpu.core.mixed_precision import set_policy
    from image_segmentation_lab_tpu.models.builder import build_segmentor
    from image_segmentation_lab_tpu.utils.compile_cache import \
        enable_compile_cache
    from image_segmentation_lab_tpu.utils.jit_init import jit_init_off_cpu

    enable_compile_cache()
    set_policy("fp32" if args.no_amp else "bf16")

    cfg = load_python_config(args.network_cfg)
    model = build_segmentor(cfg["model"] if "model" in cfg else cfg)
    B, H, W = args.batch, args.height, args.width
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1)}
    img1 = jnp.zeros((1, H, W, 3), jnp.float32)
    variables = jit_init_off_cpu(
        lambda r, x: model.init(r, x, method="inference"))(rngs, img1)

    x = jax.jit(lambda k: jax.random.normal(k, (B, H, W, 3), jnp.float32))(
        jax.random.PRNGKey(0))
    jax.block_until_ready(x)
    dev = jax.devices()[0]
    print(f"# {type(model).__name__} {H}x{W} batch {B} on {dev} "
          f"({'fp32' if args.no_amp else 'bf16'}), {args.iters} in-jit "
          f"iterations x {args.repeats} repeats", flush=True)

    feats = model.apply(variables, img1, method="extract_feat")
    n_stages = len(feats) if isinstance(feats, (list, tuple)) else 1
    for idx in range(n_stages):
        ms = amortized_ms(
            lambda xx, idx=idx: model.apply(variables, xx,
                                            method="extract_feat")[idx],
            x, args.iters, args.repeats)
        print(f"backbone through stage {idx:<2d} {_fmt(ms, B)}",
              flush=True)

    for name, method in (("encode_decode", "encode_decode"),
                         ("inference (per test_cfg)", "inference")):
        ms = amortized_ms(
            lambda xx, m=method: model.apply(variables, xx, method=m),
            x, args.iters, args.repeats)
        print(f"{name:<26s} {_fmt(ms, B)}", flush=True)


if __name__ == "__main__":
    main()
