"""EMA parameter averaging (beyond-reference training utility):
recursion golden, wrapper semantics, CLI flag end-to-end."""

import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from image_segmentation_lab_tpu.utils.ema import wrap_train_step_with_ema

REPO = Path(__file__).resolve().parents[1]


def test_ema_matches_manual_recursion(rng):
    params = {"w": jnp.asarray(rng.randn(4, 3).astype(np.float32))}
    decay = 0.9

    class S:
        pass

    steps = [jnp.asarray(rng.randn(4, 3).astype(np.float32))
             for _ in range(5)]

    def fake_step(state, img, gt, r):
        s = S()
        s.params = {"w": steps[int(img)]}
        return s, {"loss": jnp.zeros(())}

    wrapped, ema_fn = wrap_train_step_with_ema(fake_step, params, decay)
    state = None
    for i in range(5):
        state, _ = wrapped(state, i, None, None)
    want = np.asarray(params["w"])
    for s in steps:
        want = want * decay + np.asarray(s) * (1 - decay)
    np.testing.assert_allclose(np.asarray(ema_fn()["w"]), want,
                               rtol=1e-6, atol=1e-7)
    # the live step output is untouched
    assert np.allclose(np.asarray(state.params["w"]), np.asarray(steps[-1]))


def test_ema_init_seed_continues_average(rng):
    """Seeding a fresh wrapper with the checkpointed EMA tree continues
    the recursion exactly as if training never stopped (resume path)."""
    params = {"w": jnp.asarray(rng.randn(4, 3).astype(np.float32))}
    decay = 0.8

    class S:
        pass

    steps = [jnp.asarray(rng.randn(4, 3).astype(np.float32))
             for _ in range(6)]

    def fake_step(state, img, gt, r):
        s = S()
        s.params = {"w": steps[int(img)]}
        return s, {"loss": jnp.zeros(())}

    # uninterrupted run over all 6 steps
    wrapped, ema_fn = wrap_train_step_with_ema(fake_step, params, decay)
    for i in range(6):
        wrapped(None, i, None, None)
    want = np.asarray(ema_fn()["w"])

    # interrupted at step 3: checkpoint the EMA, rebuild the wrapper
    # seeded from it (ema_init), run the remaining steps
    wrapped, ema_fn = wrap_train_step_with_ema(fake_step, params, decay)
    for i in range(3):
        wrapped(None, i, None, None)
    ckpt_ema = jax.device_get(ema_fn())  # host numpy, as last.pth stores it
    wrapped, ema_fn = wrap_train_step_with_ema(
        fake_step, {"w": steps[2]}, decay, ema_init=ckpt_ema)
    for i in range(3, 6):
        wrapped(None, i, None, None)
    np.testing.assert_allclose(np.asarray(ema_fn()["w"]), want,
                               rtol=1e-6, atol=1e-7)


def test_ema_cli_flag_runs_and_saves(tmp_path):
    """One synthetic epoch with --ema-decay: best.pth carries the
    smoothed weights (differs from last.pth's raw weights)."""
    env = dict(JAX_PLATFORMS="cpu", PYTHONPATH=str(REPO))
    import os
    env = {**os.environ, **env}
    r = subprocess.run(
        [sys.executable, str(REPO / "train.py"),
         "--network-cfg", "configs/network/fcn/fcn_r18_synthetic.py",
         "--dataset-cfg", "configs/dataset/synthetic.py",
         "--schedule-cfg", "configs/schedule/synthetic_schedule.py",
         "--work-dir", str(tmp_path), "--device", "cpu",
         "--ema-decay", "0.5"],
        cwd=str(REPO), env=env, capture_output=True, text=True,
        timeout=3000)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "EMA enabled" in r.stdout
    weights = tmp_path / "train" / "exp" / "weights"
    from image_segmentation_lab_tpu.core.initialize.checkpoint import \
        _load_file
    last_ckpt = _load_file(weights / "last.pth")
    best = _load_file(weights / "best.pth")["state_dict"]
    last = last_ckpt["state_dict"]
    flat_b = jax.tree_util.tree_leaves(best)
    flat_l = jax.tree_util.tree_leaves(last)
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(flat_b, flat_l)), \
        "best.pth should hold EMA-smoothed (different) weights"
    # the smoothed tree rides last.pth's train_state so resume continues
    # the average (utils/ema.py module doc)
    assert "ema_params" in last_ckpt["train_state"]
    ema = last_ckpt["train_state"]["ema_params"]
    assert jax.tree_util.tree_structure(ema) is not None

    # second invocation resuming from last.pth re-seeds the EMA wrapper
    r2 = subprocess.run(
        [sys.executable, str(REPO / "train.py"),
         "--network-cfg", "configs/network/fcn/fcn_r18_synthetic.py",
         "--dataset-cfg", "configs/dataset/synthetic.py",
         "--schedule-cfg", "configs/schedule/synthetic_schedule.py",
         "--work-dir", str(tmp_path), "--device", "cpu",
         "--ema-decay", "0.5",
         "--resume-from", str(weights / "last.pth")],
        cwd=str(REPO), env=env, capture_output=True, text=True,
        timeout=3000)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "resumed EMA state" in r2.stdout
