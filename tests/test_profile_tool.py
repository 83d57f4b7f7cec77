"""Smoke test of the per-stage profiler tool (CPU, tiny model)."""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_profile_model_prints_stage_lines():
    r = subprocess.run(
        [sys.executable, "tools/analysis_tools/profile_model.py",
         "--network-cfg", "configs/network/fcn/fcn_r18_synthetic.py",
         "--height", "64", "--width", "64", "--batch", "1",
         "--iters", "1", "--repeats", "1", "--device", "cpu"],
        cwd=REPO, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    out = r.stdout
    assert "backbone through stage 0" in out
    assert "encode_decode" in out
    assert "inference (per test_cfg)" in out
    assert "img/s" in out
