"""FPN neck, determinism, and remat-checkpointing coverage."""

import jax
import jax.numpy as jnp
import numpy as np

from image_segmentation_lab_tpu.core.builder import build_optimizer
from image_segmentation_lab_tpu.models.builder import build_segmentor
from image_segmentation_lab_tpu.train_state import (create_train_state,
                                                    make_train_step)


def test_fpn_neck_in_encoder_decoder():
    cfg = dict(
        type="EncoderDecoder",
        backbone=dict(type="ResNet", depth=18, num_stages=3,
                      strides=(1, 2, 2), dilations=(1, 1, 1),
                      out_indices=(0, 1, 2),
                      norm_cfg=dict(type="BN", requires_grad=True)),
        neck=dict(type="FPN", in_channels=[64, 128, 256], out_channels=32),
        decode_head=dict(type="FCNHead", in_channels=32, in_index=0,
                         channels=16, num_convs=1, concat_input=False,
                         num_classes=2,
                         norm_cfg=dict(type="BN", requires_grad=True),
                         loss_decode=dict(type="CrossEntropyLoss")),
        test_cfg=dict(mode="whole"))
    model = build_segmentor(cfg)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           x, method="encode_decode")
    assert "neck" in variables["params"]
    out = model.apply(variables, x, method="encode_decode")
    assert out.shape == (1, 64, 64, 2)


def _two_step_params(with_cp=False, seed=0):
    cfg = dict(
        type="EncoderDecoder",
        backbone=dict(type="ResNet", depth=18, num_stages=2,
                      strides=(1, 2), dilations=(1, 1), out_indices=(0, 1),
                      with_cp=with_cp,
                      norm_cfg=dict(type="BN", requires_grad=True)),
        decode_head=dict(type="FCNHead", in_channels=128, in_index=1,
                         channels=16, num_convs=1, concat_input=False,
                         num_classes=2, dropout_ratio=0.1,
                         norm_cfg=dict(type="BN", requires_grad=True),
                         loss_decode=dict(type="CrossEntropyLoss")))
    model = build_segmentor(cfg)
    tx = build_optimizer(dict(type="SGD", lr=0.05, momentum=0.9))
    rng = jax.random.PRNGKey(seed)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 32, 32, 3), jnp.float32)
    gt = jnp.asarray(np.random.RandomState(2).randint(0, 2, (2, 32, 32)))
    state = create_train_state(model, rng, x, gt, tx)
    step = make_train_step(model, tx, donate=False)
    for i in range(2):
        state, lv = step(state, x, gt, jax.random.fold_in(rng, i))
    return state.params, float(lv["loss"])


def test_training_is_deterministic():
    p1, l1 = _two_step_params(seed=3)
    p2, l2 = _two_step_params(seed=3)
    assert l1 == l2
    from helpers import assert_trees_equal
    assert_trees_equal(p1, p2)


def test_remat_matches_plain_gradients():
    """with_cp (nn.remat) must not change the training math."""
    p_plain, l_plain = _two_step_params(with_cp=False, seed=5)
    p_cp, l_cp = _two_step_params(with_cp=True, seed=5)
    np.testing.assert_allclose(l_plain, l_cp, rtol=1e-6)
    from helpers import assert_trees_equal
    assert_trees_equal(p_plain, p_cp, rtol=1e-5, atol=1e-6)


def test_fused_aug_train_step_matches_external_aug():
    """Aug fused into the step == external pipeline + step (same rng plan)."""
    from image_segmentation_lab_tpu.data.pipeline import Pipeline
    pipe = Pipeline.from_dict({"transform": {
        "__class_fullname__": "Compose", "p": 1.0, "transforms": [
            {"__class_fullname__": "HorizontalFlip", "p": 0.5},
            {"__class_fullname__": "Normalize", "p": 1.0,
             "mean": [0.5, 0.5, 0.5], "std": [0.25, 0.25, 0.25]}]}})
    cfg = dict(
        type="EncoderDecoder",
        backbone=dict(type="ResNet", depth=18, num_stages=2,
                      strides=(1, 2), dilations=(1, 1), out_indices=(0, 1),
                      norm_cfg=dict(type="BN", requires_grad=True)),
        decode_head=dict(type="FCNHead", in_channels=128, in_index=1,
                         channels=16, num_convs=1, concat_input=False,
                         num_classes=2, dropout_ratio=0,
                         norm_cfg=dict(type="BN", requires_grad=True),
                         loss_decode=dict(type="CrossEntropyLoss")))
    model = build_segmentor(cfg)
    tx = build_optimizer(dict(type="SGD", lr=0.05))
    rng = jax.random.PRNGKey(0)
    img8 = np.random.RandomState(0).randint(0, 255, (4, 32, 32, 3)).astype(
        np.uint8)
    gt = np.random.RandomState(1).randint(0, 2, (4, 32, 32))
    state0 = create_train_state(
        model, rng, jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 32, 32),
                                                         jnp.int32), tx)

    # fused path
    fused = make_train_step(model, tx, donate=False, pipeline=pipe)
    step_rng = jax.random.PRNGKey(42)
    s1, lv1 = fused(state0, jnp.asarray(img8),
                    jnp.asarray(gt, jnp.int32), step_rng)

    # external path replicating the fused rng plan
    aug_rng, dropout_rng = jax.random.split(step_rng)
    aug_img, aug_gt = pipe(aug_rng, img8, gt)
    plain = make_train_step(model, tx, donate=False)
    s2, lv2 = plain(state0, aug_img, aug_gt.astype(jnp.int32), dropout_rng)

    np.testing.assert_allclose(float(lv1["loss"]), float(lv2["loss"]),
                               rtol=1e-6)
    from helpers import assert_trees_equal
    assert_trees_equal(s1.params, s2.params, rtol=1e-5, atol=1e-6)


def test_multilevel_neck_matches_torch():
    """MultiLevelNeck (mmseg MLN): 1x1 lateral -> bilinear rescale
    (align_corners=False, scale used directly in the coordinate map) ->
    3x3 refine, golden against a torch-functional twin."""
    import torch
    import torch.nn.functional as TF

    from image_segmentation_lab_tpu.models.necks import MultiLevelNeck
    from test_zoo_torch_parity import P, randomize, tconv

    rs = np.random.RandomState(11)
    scales = [4, 2, 1, 0.5]
    m = MultiLevelNeck(in_channels=[6, 6, 6, 6], out_channels=8,
                       scales=scales)
    xs = [rs.randn(2, 5, 7, 6).astype(np.float32) for _ in range(4)]
    variables = m.init(jax.random.PRNGKey(0), [jnp.asarray(x) for x in xs])
    variables = randomize(variables, seed=12)
    outs = m.apply(variables, [jnp.asarray(x) for x in xs], mutable=False)

    p = variables["params"]
    with torch.no_grad():
        for i, (x, s, got) in enumerate(zip(xs, scales, outs)):
            t = torch.from_numpy(x.transpose(0, 3, 1, 2))
            t = tconv(t, P(p, f"lateral_convs_{i}/conv/weight"),
                      bias=np.asarray(P(p, f"lateral_convs_{i}/conv/bias")))
            if s != 1:
                t = TF.interpolate(t, scale_factor=s, mode="bilinear",
                                   align_corners=False)
            t = tconv(t, P(p, f"convs_{i}/conv/weight"), padding=1,
                      bias=np.asarray(P(p, f"convs_{i}/conv/bias")))
            assert got.shape[1:3] == tuple(t.shape[2:]), (i, got.shape,
                                                          t.shape)
            np.testing.assert_allclose(
                np.asarray(got).transpose(0, 3, 1, 2), t.numpy(),
                rtol=2e-3, atol=2e-4)


def test_multilevel_neck_single_tap_broadcast():
    """One input tap is broadcast across every scale (upstream
    single-output-backbone mode)."""
    from image_segmentation_lab_tpu.models.necks import MultiLevelNeck

    m = MultiLevelNeck(in_channels=[4], out_channels=4,
                       scales=[2, 1, 0.5])
    x = [jnp.ones((1, 8, 8, 4), jnp.float32)]
    variables = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(variables, x, mutable=False)
    assert [o.shape[1] for o in outs] == [16, 8, 4]
