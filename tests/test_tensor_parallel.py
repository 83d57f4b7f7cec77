"""Tensor (model) parallelism parity tests on the virtual CPU mesh.

Contract (parallel/tensor.py): a (data x model) TP train/eval step on a
transformer model must reproduce single-device numerics up to f32
reduction order — GSPMD derives the Megatron collectives purely from
the parameter shardings.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from image_segmentation_lab_tpu.core.builder import build_optimizer
from image_segmentation_lab_tpu.models.builder import build_segmentor
from image_segmentation_lab_tpu.parallel import (get_mesh, make_tp_eval_step,
                                                 make_tp_train_step,
                                                 shard_batch,
                                                 shard_state_tp,
                                                 tp_shardings)
from image_segmentation_lab_tpu.train_state import (create_train_state,
                                                    make_train_step)

pytestmark = pytest.mark.skipif(jax.device_count() < 4,
                                reason="needs >=4 virtual devices")


def _tiny_setr_cfg():
    """ViT encoder + conv head, small enough for a CPU mesh test."""
    norm = dict(type="SyncBatchNorm", requires_grad=True)
    return dict(
        type="EncoderDecoder",
        backbone=dict(type="VisionTransformer", arch="tiny", embed_dims=32,
                      num_layers=2, num_heads=2, patch_size=8,
                      pretrain_img_size=32, out_indices=(0, 1),
                      final_norm=True),
        decode_head=dict(type="FCNHead", in_channels=32, in_index=1,
                         channels=16, num_convs=1, concat_input=False,
                         num_classes=2, norm_cfg=norm,
                         loss_decode=dict(type="CrossEntropyLoss")),
        test_cfg=dict(mode="whole"))


@pytest.fixture(scope="module")
def setup():
    model = build_segmentor(_tiny_setr_cfg())
    tx = build_optimizer(dict(type="SGD", lr=0.05, momentum=0.9))
    rng = jax.random.PRNGKey(0)
    r = np.random.RandomState(0)
    img = jnp.asarray(r.randn(4, 32, 32, 3).astype(np.float32))
    gt = jnp.asarray(r.randint(0, 2, (4, 32, 32)).astype(np.int32))
    state = create_train_state(model, rng, img[:1], gt[:1], tx)
    return model, tx, img, gt, state


def test_tp_rules_shard_expected_params(setup):
    model, tx, img, gt, state = setup
    mesh = get_mesh(4, axis_names=("data", "model"), shape=(2, 2))
    sh = tp_shardings(state, mesh)
    qkv = sh.params["backbone"]["block0"]["attn"]["qkv"]["weight"]
    proj = sh.params["backbone"]["block0"]["attn"]["proj"]["weight"]
    fc1b = sh.params["backbone"]["block0"]["fc1"]["bias"]
    head = sh.params["decode_head"]["convs_0"]["conv"]["weight"]
    assert qkv.spec == P(None, "model")
    assert proj.spec == P("model", None)
    assert fc1b.spec == P("model")
    assert head.spec == P()
    # optimizer momentum mirrors the parameter layout
    flat = jax.tree_util.tree_flatten_with_path(sh.opt_state)[0]
    momentum_specs = {jax.tree_util.keystr(p): s.spec for p, s in flat
                      if "qkv" in jax.tree_util.keystr(p)}
    assert any(s == P(None, "model") for s in momentum_specs.values()), \
        momentum_specs


def test_tp_train_step_matches_single_device(setup):
    model, tx, img, gt, state = setup
    single = make_train_step(model, tx, donate=False)
    s1, lv1 = single(state, img, gt, jax.random.PRNGKey(7))

    mesh = get_mesh(4, axis_names=("data", "model"), shape=(2, 2))
    tp_state = shard_state_tp(state, mesh)
    step = make_tp_train_step(model, tx, mesh, state, donate=False)
    simg, sgt = shard_batch((img, gt), mesh)
    s2, lv2 = step(tp_state, simg, sgt, jax.random.PRNGKey(7))

    np.testing.assert_allclose(float(lv1["loss"]), float(lv2["loss"]),
                               rtol=1e-5)
    # updated params match, incl. the TP-sharded qkv and the replicated
    # head, after gathering
    for path in (("backbone", "block0", "attn", "qkv", "weight"),
                 ("backbone", "block0", "fc2", "weight"),
                 ("decode_head", "convs_0", "conv", "weight")):
        a, b = s1.params, s2.params
        for k in path:
            a, b = a[k], b[k]
        np.testing.assert_allclose(np.asarray(a), np.asarray(jax.device_get(b)),
                                   atol=1e-5, rtol=1e-4,
                                   err_msg="/".join(path))


def test_tp_eval_step_matches_single_device(setup):
    model, _, img, _, state = setup
    variables = state.variables()
    ref = model.apply(variables, img, method="inference")

    mesh = get_mesh(4, axis_names=("data", "model"), shape=(2, 2))
    tp_vars = shard_state_tp(variables, mesh)
    step = make_tp_eval_step(model, mesh, variables)
    simg = shard_batch(img, mesh)
    out = step(tp_vars, simg)
    np.testing.assert_allclose(np.asarray(jax.device_get(out)),
                               np.asarray(ref), atol=1e-5, rtol=1e-4)


def test_tp_pure_model_mesh(setup):
    """1-D ('model',)-only mesh (no data axis): batch replicated, weights
    sharded — the pure-TP layout for models too big for one chip."""
    model, tx, img, gt, state = setup
    single = make_train_step(model, tx, donate=False)
    s1, lv1 = single(state, img, gt, jax.random.PRNGKey(3))

    mesh = get_mesh(2, axis_names=("model",))
    tp_state = shard_state_tp(state, mesh)
    step = make_tp_train_step(model, tx, mesh, state, data_axis=None,
                              donate=False)
    s2, lv2 = step(tp_state, img, gt, jax.random.PRNGKey(3))
    np.testing.assert_allclose(float(lv1["loss"]), float(lv2["loss"]),
                               rtol=1e-5)


def test_tp_flash_attention_shard_local_no_gather(setup, monkeypatch):
    """Flash attention under TP (round 5): the heads-MAJOR fold in
    ops/attention.py merges the 'model'-sharded head axis into the
    kernel batch dim, so the custom_partitioning rule runs one kernel
    per head-shard.  The TP train step with the (interpret) flash path
    must (a) reproduce the single-device einsum loss and (b) compile
    with ZERO all-gathers — the communication structure that justified
    dropping the einsum fallback (SETR train was paying −26% for it,
    docs/PERF.md round 5)."""
    model, tx, img, gt, state = setup
    single = make_train_step(model, tx, donate=False)
    _, lv1 = single(state, img, gt, jax.random.PRNGKey(7))

    monkeypatch.setenv("ISLT_FLASH_ATTN_FORCE", "interpret")
    mesh = get_mesh(4, axis_names=("data", "model"), shape=(2, 2))
    tp_state = shard_state_tp(state, mesh)
    step = make_tp_train_step(model, tx, mesh, state, donate=False)
    simg, sgt = shard_batch((img, gt), mesh)
    _, lv2 = step(tp_state, simg, sgt, jax.random.PRNGKey(7))
    np.testing.assert_allclose(float(lv1["loss"]), float(lv2["loss"]),
                               rtol=1e-5)
    hlo = step.lower(tp_state, simg, sgt,
                     jax.random.PRNGKey(7)).compile().as_text()
    assert "all-gather" not in hlo, \
        "flash under TP resharded (heads fold must stay dim-0 sharded)"
