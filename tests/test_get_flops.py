"""FLOPs/params tool: cost-analysis sanity vs analytic conv FLOPs,
exact param counting, CLI end-to-end."""

import os
import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "tools" / "analysis_tools"))


def test_cost_analysis_matches_analytic_conv_flops():
    """A single dense VALID conv's XLA flop count equals the textbook
    2*N*OH*OW*Cout*Cin*kh*kw (multiply+add) exactly on the CPU backend.
    (SAME-padding convs count slightly lower: XLA excludes the MACs that
    read padding — the tool reports executed FLOPs by design.)"""
    from get_flops import cost_analysis
    import jax.lax as lax

    N, H, W, Ci, Co, k = 2, 16, 16, 8, 32, 3
    x = jnp.zeros((N, H, W, Ci), jnp.float32)
    w = jnp.zeros((k, k, Ci, Co), jnp.float32)

    def conv(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    cost = cost_analysis(conv, x, w)
    want = 2 * N * (H - k + 1) * (W - k + 1) * Co * Ci * k * k
    assert float(cost["flops"]) == want, (cost["flops"], want)


def test_tree_size_counts_every_leaf():
    from get_flops import tree_size
    tree = {"a": jnp.zeros((3, 4)), "b": {"c": jnp.zeros((5,)),
                                          "d": jnp.zeros((2, 2, 2))}}
    assert tree_size(tree) == 12 + 5 + 8


def test_get_flops_cli(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, str(REPO / "tools/analysis_tools/get_flops.py"),
         "--network-cfg", "configs/network/fcn/fcn_r18_synthetic.py",
         "--height", "64", "--width", "64", "--batch", "1",
         "--device", "cpu"],
        cwd=str(REPO), env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    out = r.stdout
    # ResNet-18 backbone is the well-known 11.18 M parameters
    assert "backbone           11.177 M" in out, out
    assert "trainable" in out and "flops:" in out
    # FLOPs at 64^2 must exceed the stem conv's analytic floor and stay
    # within an order of magnitude of the hand-estimated total (~0.3 G)
    import re
    m = re.search(r"flops:\s+([\d.]+) ([TGMk]?)FLOP", out)
    assert m, out
    mult = {"T": 1e12, "G": 1e9, "M": 1e6, "k": 1e3, "": 1.0}[m.group(2)]
    flops = float(m.group(1)) * mult
    stem_floor = 2 * 32 * 32 * 64 * 3 * 49      # 7x7 s2 stem at 64^2
    assert stem_floor < flops < 3e9, flops
