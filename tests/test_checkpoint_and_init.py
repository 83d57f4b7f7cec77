"""Checkpoint roundtrip, weight-init system, fp16 shims, schedulers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_segmentation_lab_tpu.core.initialize import (
    initialize, load_checkpoint, load_checkpoint_with_prefix, save_checkpoint,
    state_dict_from_variables)
from image_segmentation_lab_tpu.models.builder import build_segmentor


@pytest.fixture(scope="module")
def small_model():
    cfg = dict(type="EncoderDecoder",
               backbone=dict(type="ResNet", depth=18, num_stages=2,
                             strides=(1, 2), dilations=(1, 1),
                             out_indices=(0, 1),
                             norm_cfg=dict(type="BN", requires_grad=True)),
               decode_head=dict(type="FCNHead", in_channels=128, in_index=1,
                                channels=16, num_convs=1, concat_input=False,
                                num_classes=2,
                                norm_cfg=dict(type="BN", requires_grad=True),
                                loss_decode=dict(type="CrossEntropyLoss")))
    model = build_segmentor(cfg)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           x, method="encode_decode")
    return model, variables


def test_checkpoint_roundtrip(tmp_path, small_model):
    model, variables = small_model
    path = tmp_path / "ckpt.pth"
    save_checkpoint(variables, path, metadata={"epoch": 3, "seed": 42})
    sd = state_dict_from_variables(variables)
    assert any(k.startswith("backbone.") for k in sd)
    assert any("running_mean" in k for k in sd)

    # perturb then reload → must restore exactly
    zeroed = jax.tree_util.tree_map(jnp.zeros_like, variables)
    restored, ckpt = load_checkpoint(zeroed, path, logger=None)
    assert ckpt["metadata"]["epoch"] == 3
    from helpers import assert_trees_equal
    assert_trees_equal(restored, variables)


def test_checkpoint_prefix_load(tmp_path, small_model):
    model, variables = small_model
    path = tmp_path / "ckpt.pth"
    save_checkpoint(variables, path)
    sub = load_checkpoint_with_prefix("backbone", path)
    assert all(not k.startswith("backbone.") for k in sub)
    assert any(k.startswith("layer1") for k in sub)
    with pytest.raises(AssertionError):
        load_checkpoint_with_prefix("nonexistent", path)


def test_revise_keys(tmp_path, small_model):
    model, variables = small_model
    path = tmp_path / "ckpt.pth"
    sd = {"module." + k: v
          for k, v in state_dict_from_variables(variables).items()}
    import pickle
    with open(path, "wb") as f:
        pickle.dump({"metadata": {}, "state_dict": sd}, f)
    restored, _ = load_checkpoint(
        jax.tree_util.tree_map(jnp.zeros_like, variables), path, logger=None)
    leaves = jax.tree_util.tree_leaves(restored["params"])
    assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)


def test_initialize_system(small_model):
    model, variables = small_model
    params = variables["params"]
    new = initialize(params, dict(type="Constant", val=0.5, layer="Conv2d"),
                     jax.random.PRNGKey(0))
    conv_w = new["backbone"]["conv1"]["weight"]
    np.testing.assert_allclose(np.asarray(conv_w), 0.5)
    # norm weights untouched (layer filter)
    np.testing.assert_allclose(
        np.asarray(new["backbone"]["bn1"]["weight"]), 1.0)

    # override: re-init only conv_seg with Normal
    new2 = initialize(params, dict(type="Kaiming", layer="Conv2d",
                                   override=dict(type="Normal", std=0.001,
                                                 name="conv_seg")),
                      jax.random.PRNGKey(1))
    seg_w = np.asarray(new2["decode_head"]["conv_seg"]["weight"])
    assert np.abs(seg_w).std() < 0.01  # tiny std from the override
    with pytest.raises(RuntimeError):
        initialize(params, dict(type="Constant", val=1,
                                override=dict(name="nope_sub")),
                   jax.random.PRNGKey(0))


def test_pretrained_init(tmp_path, small_model):
    model, variables = small_model
    path = tmp_path / "pre.pth"
    save_checkpoint(variables, path)
    zero_params = jax.tree_util.tree_map(jnp.zeros_like, variables["params"])
    new = initialize(zero_params,
                     dict(type="Pretrained", checkpoint=str(path)),
                     jax.random.PRNGKey(0))
    np.testing.assert_array_equal(
        np.asarray(new["backbone"]["conv1"]["weight"]),
        np.asarray(variables["params"]["backbone"]["conv1"]["weight"]))


def test_fp16_shims():
    from image_segmentation_lab_tpu.core.mixed_precision import policy_scope
    from image_segmentation_lab_tpu.core.mixed_precision.fp16_utils import (
        LossScaler, auto_fp16, force_fp32)

    @auto_fp16(apply_to=("x",))
    def f(x, y):
        return x.dtype, y.dtype

    @force_fp32()
    def g(x):
        return x.dtype

    with policy_scope("bf16"):
        xd, yd = f(jnp.zeros(3), jnp.zeros(3))
        assert xd == jnp.bfloat16 and yd == jnp.float32
        assert g(jnp.zeros(3, jnp.bfloat16)) == jnp.float32
    scaler = LossScaler()
    assert not scaler.has_overflow(None) and scaler.loss_scale == 1.0


def test_kaiming_distribution():
    from image_segmentation_lab_tpu.core.initialize.init_functions import \
        kaiming_
    init = kaiming_(mode="fan_out", nonlinearity="relu")
    w = init(jax.random.PRNGKey(0), (3, 3, 64, 128), jnp.float32)
    expected_std = float(np.sqrt(2.0 / (3 * 3 * 128)))
    assert abs(float(w.std()) - expected_std) / expected_std < 0.05


def test_warm_scheduler():
    from image_segmentation_lab_tpu.core.optimizers import WarmScheduler
    s = WarmScheduler(warmup_epochs=5, mode="linear", warmup_ratio=0.1,
                      after=dict(type="StepLR", step_size=10, gamma=0.1))
    lrs = [float(s.lr_at_epoch(e, 1.0)) for e in (0, 2, 4, 5, 14, 15)]
    assert lrs[0] < lrs[1] < lrs[2]          # ramping up
    assert abs(lrs[3] - 1.0) < 1e-6          # full lr after warmup
    assert abs(lrs[4] - 1.0) < 1e-6 and abs(lrs[5] - 0.1) < 1e-6


def test_initialize_from_network_cfg(tmp_path, small_model):
    from image_segmentation_lab_tpu.core.initialize import (
        initialize_from_network_cfg, save_checkpoint)
    model, variables = small_model
    path = tmp_path / "pre.pth"
    save_checkpoint(variables, path)
    cfg = dict(backbone=dict(init_cfg=dict(type="Pretrained",
                                           checkpoint=str(path),
                                           prefix="backbone")))
    zero = jax.tree_util.tree_map(jnp.zeros_like, variables["params"])
    out = initialize_from_network_cfg(zero, cfg, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(
        np.asarray(out["backbone"]["conv1"]["weight"]),
        np.asarray(variables["params"]["backbone"]["conv1"]["weight"]))
    # head stayed zero (only backbone subtree touched)
    assert float(jnp.abs(jax.tree_util.tree_leaves(
        out["decode_head"])[0]).sum()) == 0.0
    with pytest.raises(FileNotFoundError, match="convert_torch_checkpoint"):
        initialize_from_network_cfg(zero,
                                    dict(pretrained="torchvision://r50"),
                                    jax.random.PRNGKey(0))


def test_orbax_backend_roundtrip(tmp_path, small_model):
    model, variables = small_model
    path = tmp_path / "orbax_ckpt"
    save_checkpoint(variables, path, metadata={"epoch": 7},
                    backend="orbax")
    assert path.is_dir()
    zeroed = jax.tree_util.tree_map(jnp.zeros_like, variables)
    restored, ckpt = load_checkpoint(zeroed, path, logger=None)
    assert int(ckpt["metadata"]["epoch"]) == 7
    from helpers import assert_trees_equal
    assert_trees_equal(restored, variables)


def test_orbax_async_backend_roundtrip(tmp_path, small_model):
    from image_segmentation_lab_tpu.core.initialize import wait_for_async_save
    model, variables = small_model
    path = tmp_path / "orbax_async_ckpt"
    # two back-to-back saves: the second must wait for (and supersede) the
    # first without corrupting the directory
    save_checkpoint(variables, path, metadata={"epoch": 1},
                    train_state={"step": 10}, backend="orbax_async")
    save_checkpoint(variables, path, metadata={"epoch": 2},
                    train_state={"step": 20}, backend="orbax_async")
    wait_for_async_save()
    assert path.is_dir()
    assert not path.with_name(path.name + ".tmp_orbax").exists()
    zeroed = jax.tree_util.tree_map(jnp.zeros_like, variables)
    restored, ckpt = load_checkpoint(zeroed, path, logger=None)
    assert int(ckpt["metadata"]["epoch"]) == 2
    assert int(ckpt["train_state"]["step"]) == 20
    from helpers import assert_trees_equal
    assert_trees_equal(restored, variables)


def test_init_info_tracking(small_model):
    from image_segmentation_lab_tpu.core.initialize import (
        get_init_info, initialize, reset_init_info)
    model, variables = small_model
    reset_init_info()
    initialize(variables["params"],
               {"type": "Kaiming", "layer": "Conv2d"}, jax.random.PRNGKey(0))
    info = get_init_info()
    assert info, "conv weights should be tracked"
    assert all("KaimingInit" in v for v in info.values())
    # only conv weights + their biases were touched
    assert all(k.endswith((".weight", ".bias", "weight", "bias"))
               for k in info)
    lines = []
    from image_segmentation_lab_tpu.core.initialize import dump_init_info
    dump_init_info(logger=lines.append)
    assert len(lines) == len(info)
    reset_init_info()
    assert not get_init_info()


def test_warm_scheduler_reference_args():
    """Reference lr_update.py:40-79 argument names and exact trajectory."""
    from image_segmentation_lab_tpu.core.optimizers import WarmScheduler
    base = 0.1
    s = WarmScheduler(warmup_iters=4, mode="exponential", start_ratio=0.01)
    for e in range(4):
        start = base * 0.01
        expected = start * (base / start) ** (e / 4)
        assert abs(float(s.lr_at_epoch(e, base)) - expected) < 1e-7
    assert abs(float(s.lr_at_epoch(4, base)) - base) < 1e-7
    s2 = WarmScheduler(warmup_iters=2, mode="linear",
                       start_lr=0.002, end_lr=0.01)
    assert abs(float(s2.lr_at_epoch(0, base)) - 0.002) < 1e-7
    assert abs(float(s2.lr_at_epoch(1, base)) - 0.006) < 1e-7
    # once iters >= warmup_iters the reference returns base_lrs, even when
    # end_lr != base lr (lr_update.py:74-79)
    assert abs(float(s2.lr_at_epoch(2, base)) - base) < 1e-7
    assert abs(float(s2.lr_at_epoch(9, base)) - base) < 1e-7


def test_schedulers_match_torch():
    """Epoch-for-epoch lr parity with torch.optim.lr_scheduler (which the
    reference registers directly, lr_update.py:20-37)."""
    import torch
    from image_segmentation_lab_tpu.core.optimizers import (
        ExponentialLR, LambdaLR, PolynomialLR, StepLR)
    base = 0.1
    cases = [
        (StepLR(step_size=3, gamma=0.5),
         lambda o: torch.optim.lr_scheduler.StepLR(o, step_size=3,
                                                   gamma=0.5)),
        (PolynomialLR(total_iters=8, power=0.9),
         lambda o: torch.optim.lr_scheduler.PolynomialLR(o, total_iters=8,
                                                         power=0.9)),
        (ExponentialLR(gamma=0.9),
         lambda o: torch.optim.lr_scheduler.ExponentialLR(o, gamma=0.9)),
        (LambdaLR(lr_lambda=lambda e: 1.0 / (1 + e)),
         lambda o: torch.optim.lr_scheduler.LambdaLR(
             o, lr_lambda=lambda e: 1.0 / (1 + e))),
    ]
    for ours, make_torch in cases:
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.SGD([p], lr=base)
        sch = make_torch(opt)
        for epoch in range(12):
            torch_lr = opt.param_groups[0]["lr"]
            ours_lr = float(ours.lr_at_epoch(epoch, base))
            assert abs(torch_lr - ours_lr) < 1e-7, (
                f"{type(ours).__name__} epoch {epoch}: "
                f"torch {torch_lr} vs ours {ours_lr}")
            opt.step()
            sch.step()


def test_override_bare_name_targets_top_level_not_nested():
    """Reference override semantics (weight_init.py:486+): the name is a
    DIRECT attribute of the module being initialized — 'conv1' on a
    backbone tree must re-init the stem conv only, not every block's
    conv1."""
    from image_segmentation_lab_tpu.core.initialize.weight_init import \
        initialize
    params = {
        "conv1": {"weight": jnp.ones((3, 3, 3, 8))},
        "layer1": {"blocks_0": {"conv1": {"weight": jnp.ones((1, 1, 8, 8))}}},
    }
    new = initialize(params, dict(type="Kaiming", layer="Conv2d",
                                  override=dict(type="Constant", val=0.0,
                                                name="conv1")),
                     jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(new["conv1"]["weight"]), 0.0)
    nested = np.asarray(new["layer1"]["blocks_0"]["conv1"]["weight"])
    assert np.abs(nested).max() > 0  # Kaiming-initialized, NOT zeroed


def test_override_ambiguous_deep_name_raises():
    from image_segmentation_lab_tpu.core.initialize.weight_init import \
        initialize
    params = {
        "decode_head": {"conv_seg": {"weight": jnp.ones((1, 1, 8, 2))}},
        "auxiliary_head": {"conv_seg": {"weight": jnp.ones((1, 1, 4, 2))}},
    }
    with pytest.raises(ValueError, match="ambiguous"):
        initialize(params, dict(type="Kaiming", layer="Conv2d",
                                override=dict(type="Constant", val=0.0,
                                              name="conv_seg")),
                   jax.random.PRNGKey(0))


def test_override_dotted_name_disambiguates():
    from image_segmentation_lab_tpu.core.initialize.weight_init import \
        initialize
    params = {
        "decode_head": {"conv_seg": {"weight": jnp.ones((1, 1, 8, 2))}},
        "auxiliary_head": {"conv_seg": {"weight": jnp.ones((1, 1, 4, 2))}},
    }
    new = initialize(params, dict(type="Kaiming", layer="Conv2d",
                                  override=dict(type="Constant", val=0.0,
                                                name="decode_head.conv_seg")),
                     jax.random.PRNGKey(0))
    np.testing.assert_allclose(
        np.asarray(new["decode_head"]["conv_seg"]["weight"]), 0.0)
    assert np.abs(np.asarray(
        new["auxiliary_head"]["conv_seg"]["weight"])).max() > 0
