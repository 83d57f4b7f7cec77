"""paramwise_cfg parity vs torch param groups.

The reference optimizes one flat parameter list; mmseg-style configs drive
fine-tuning through per-parameter options (custom_keys lr_mult/decay_mult,
bias/norm decay mults, BEiT layer decay).  These tests build the same
grouped optimizer with torch.optim param groups and compare the parameter
trajectories leaf for leaf against `core/optimizers/paramwise.py`'s
trace-time-folded multipliers.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import torch

from image_segmentation_lab_tpu.core.builder import build_optimizer
from image_segmentation_lab_tpu.core.optimizers import ParamwiseRules


def _tree(rng):
    return {
        "backbone": {
            "patch_embed": {"kernel": rng.randn(3, 4).astype(np.float32)},
            "block0": {"attn": {"kernel": rng.randn(4, 4).astype(np.float32),
                                "bias": rng.randn(4).astype(np.float32)},
                       "norm1": {"scale": rng.randn(4).astype(np.float32)}},
            "block1": {"mlp": {"kernel": rng.randn(4, 4).astype(np.float32)}},
        },
        "decode_head": {"conv_seg": {
            "kernel": rng.randn(4, 2).astype(np.float32)}},
    }


def _run_optax(cfg, p0, grad_seqs):
    tx = build_optimizer(dict(cfg))
    params = jax.tree.map(jnp.asarray, p0)
    state = tx.init(params)
    for g in grad_seqs:
        updates, state = tx.update(jax.tree.map(jnp.asarray, g), state,
                                   params)
        params = optax.apply_updates(params, updates)
    return params


def _run_torch(make_opt, groups, grad_seqs_by_path):
    tensors = {path: torch.nn.Parameter(torch.tensor(arr.copy()))
               for path, arr in groups["leaves"].items()}
    param_groups = []
    for opts, paths in groups["groups"]:
        param_groups.append({"params": [tensors[p] for p in paths], **opts})
    opt = make_opt(param_groups)
    for step_grads in grad_seqs_by_path:
        opt.zero_grad()
        for path, g in step_grads.items():
            tensors[path].grad = torch.tensor(g)
        opt.step()
    return {p: t.detach().numpy() for p, t in tensors.items()}


def _flat(tree):
    out = {}
    for kp, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        out["/".join(str(getattr(p, "key", p)) for p in kp)] = leaf
    return out


def _compare(cfg, make_torch_groups, steps=5, atol=1e-6):
    rng = np.random.RandomState(0)
    p0 = _tree(rng)
    flat0 = _flat(p0)
    grad_seqs = []
    for _ in range(steps):
        g = jax.tree.map(
            lambda a: rng.randn(*a.shape).astype(np.float32), p0)
        grad_seqs.append(g)

    got = _flat(_run_optax(cfg, p0, grad_seqs))
    want = _run_torch(
        make_torch_groups["opt"], make_torch_groups["grouping"](flat0),
        [_flat(g) for g in grad_seqs])
    for path in flat0:
        np.testing.assert_allclose(np.asarray(got[path]), want[path],
                                   atol=atol, rtol=1e-5, err_msg=path)


def test_custom_keys_lr_and_decay_mult_match_torch_groups():
    """custom_keys: decode_head gets 10x lr; norms get no decay — the mmseg
    Segmenter/SETR recipe."""
    lr, wd = 1e-3, 0.05
    cfg = dict(type="AdamW", lr=lr, weight_decay=wd,
               paramwise_cfg=dict(custom_keys={
                   "decode_head": dict(lr_mult=10.0),
                   "norm": dict(decay_mult=0.0)}))

    def grouping(flat0):
        head = [p for p in flat0 if "decode_head" in p]
        norm = [p for p in flat0 if "norm" in p and "decode_head" not in p]
        rest = [p for p in flat0 if p not in head + norm]
        return {"leaves": flat0, "groups": [
            ({"lr": lr * 10.0}, head),
            ({"weight_decay": 0.0}, norm),
            ({}, rest)]}

    _compare(cfg, {
        "opt": lambda gs: torch.optim.AdamW(gs, lr=lr, weight_decay=wd),
        "grouping": grouping})


def test_custom_keys_coupled_sgd_matches_torch_groups():
    lr, wd = 0.05, 5e-4
    cfg = dict(type="SGD", lr=lr, momentum=0.9, weight_decay=wd,
               paramwise_cfg=dict(custom_keys={
                   "backbone": dict(lr_mult=0.1)},
                   bias_decay_mult=0.0))

    def grouping(flat0):
        bias = [p for p in flat0 if p.endswith("/bias")]
        bb = [p for p in flat0 if "backbone" in p and p not in bias]
        bb_bias = [p for p in bias if "backbone" in p]
        rest = [p for p in flat0 if p not in bb + bias]
        return {"leaves": flat0, "groups": [
            ({"lr": lr * 0.1}, bb),
            ({"lr": lr * 0.1, "weight_decay": 0.0}, bb_bias),
            ({"weight_decay": 0.0}, [p for p in bias if p not in bb_bias]),
            ({}, rest)]}

    _compare(cfg, {
        "opt": lambda gs: torch.optim.SGD(gs, lr=lr, momentum=0.9,
                                          weight_decay=wd),
        "grouping": grouping})


def test_layer_decay_matches_torch_groups():
    """BEiT-style layer decay: rate^(L+1-layer_id), embeddings/1-D params
    decay-free (mmseg LearningRateDecayOptimizerConstructor rule)."""
    lr, wd, rate, L = 1e-3, 0.05, 0.65, 2
    cfg = dict(type="AdamW", lr=lr, weight_decay=wd,
               paramwise_cfg=dict(num_layers=L, layer_decay_rate=rate))

    def layer_id(path):
        if "patch_embed" in path:
            return 0
        if "block0" in path:
            return 1
        if "block1" in path:
            return 2
        return L + 1

    def grouping(flat0):
        groups = []
        for path, arr in flat0.items():
            mult = rate ** (L + 1 - layer_id(path))
            no_decay = arr.ndim <= 1 or "patch_embed" in path
            groups.append(({"lr": lr * mult,
                            "weight_decay": 0.0 if no_decay else wd},
                           [path]))
        return {"leaves": flat0, "groups": groups}

    _compare(cfg, {
        "opt": lambda gs: torch.optim.AdamW(gs, lr=lr, weight_decay=wd),
        "grouping": grouping})


def test_layer_decay_respects_patch_embed_rule():
    """The trace-time rules resolve the documented layer ids and no-decay
    set (unit check on ParamwiseRules itself)."""
    r = ParamwiseRules(dict(num_layers=12, layer_decay_rate=0.9,
                            custom_keys={"decode_head": dict(lr_mult=2.0)}),
                       base_wd=0.05)
    lr0, wd0 = r.mults("backbone/patch_embed/kernel", 2)
    assert np.isclose(lr0, 0.9 ** 13)
    assert wd0 == 0.0  # embeddings are decay-free under layer decay
    lr5, _ = r.mults("backbone/block4/attn/kernel", 2)
    assert np.isclose(lr5, 0.9 ** (13 - 5))
    lrh, wdh = r.mults("decode_head/conv_seg/kernel", 2)
    assert np.isclose(lrh, 2.0 * 0.9 ** 0)
    assert wdh == 1.0
    _, wdb = r.mults("backbone/block4/attn/bias", 1)
    assert wdb == 0.0  # 1-D rule


def test_paramwise_schedule_lr_still_works():
    """lr may be an optax schedule; multipliers compose on top of it."""
    sched = optax.piecewise_constant_schedule(0.1, {2: 0.1})
    cfg = dict(type="AdamW", lr=sched, weight_decay=0.0,
               paramwise_cfg=dict(custom_keys={
                   "decode_head": dict(lr_mult=10.0)}))
    tx = build_optimizer(dict(cfg))
    rng = np.random.RandomState(1)
    p0 = _tree(rng)
    params = jax.tree.map(jnp.asarray, p0)
    state = tx.init(params)
    g = jax.tree.map(lambda a: jnp.ones_like(a), params)
    updates, state = tx.update(g, state, params)
    flat = _flat(updates)
    # identical unit grads → head update must be exactly 10x the body's
    head = np.asarray(flat["decode_head/conv_seg/kernel"])
    body = np.asarray(flat["backbone/block1/mlp/kernel"])
    np.testing.assert_allclose(head[:, :2], 10.0 * body[:4, :2], rtol=1e-6)


def test_beit_finetune_schedule_config_builds_and_steps():
    """The shipped BEiT fine-tune schedule (layer decay + head lr_mult)
    composes with the WarmScheduler lr exactly as train.py wires it
    (train.py:160-177)."""
    from image_segmentation_lab_tpu.core.builder import (LR_SCHEDULER,
                                                         build_from_cfg)
    from image_segmentation_lab_tpu.core.fileio import load_python_config

    cfg = load_python_config("configs/schedule/beit_finetune_schedule.py")
    opt_cfg = dict(cfg["optimizer"])
    base_lr = opt_cfg.pop("lr")
    scheduler = build_from_cfg(cfg["lr_config"], LR_SCHEDULER)
    lr = scheduler.schedule(base_lr, steps_per_epoch=10)
    tx = build_optimizer({**opt_cfg, "lr": lr})

    rng = np.random.RandomState(2)
    params = jax.tree.map(jnp.asarray, _tree(rng))
    state = tx.init(params)
    g = jax.tree.map(jnp.ones_like, params)
    updates, state = tx.update(g, state, params)
    flat = _flat(updates)
    head = np.asarray(flat["decode_head/conv_seg/kernel"])
    emb = np.asarray(flat["backbone/patch_embed/kernel"])
    # head rides lr_mult=10; patch embed sits 13 decay steps below it
    ratio = np.abs(head).mean() / np.abs(emb).mean()
    assert ratio > 10.0 / (0.9 ** 13) * 0.5, ratio
    assert np.isfinite(np.asarray(flat["backbone/block0/attn/kernel"])).all()
