"""EncNet Encoding layer / EncModule / EncHead: torch-golden numerics +
se-loss contract (models/decode_heads/enc_head.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as TF

from image_segmentation_lab_tpu.core.registry_hub import DECODEHEAD
from image_segmentation_lab_tpu.models.builder import build_module_from_cfg
from image_segmentation_lab_tpu.models.decode_heads.enc_head import Encoding

from test_zoo_torch_parity import _t

torch.set_grad_enabled(False)


def t_encoding(x_nlc, codewords, scale):
    """mmcv Encoding semantics: softmax(-s_k ||x_i - c_k||^2) residual sum."""
    cw = torch.from_numpy(np.asarray(codewords))
    s = torch.from_numpy(np.asarray(scale))
    expanded = x_nlc.unsqueeze(2) - cw.view(1, 1, *cw.shape)   # (N,L,K,C)
    dist = s.view(1, 1, -1) * expanded.pow(2).sum(-1)          # (N,L,K)
    assign = TF.softmax(dist, dim=2)
    return (assign.unsqueeze(-1) * expanded).sum(1)            # (N,K,C)


def test_encoding_matches_torch(rng):
    m = Encoding(12, 5)
    x = rng.randn(2, 30, 12).astype(np.float32)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = m.apply(variables, jnp.asarray(x))
    ref = t_encoding(_t(x), variables["params"]["codewords"],
                     variables["params"]["scale"])
    np.testing.assert_allclose(np.asarray(out), ref.numpy(),
                               atol=3e-5, rtol=1e-4)
    # codeword/scale init ranges (paper): scale in (-1, 0)
    sc = np.asarray(variables["params"]["scale"])
    assert (sc <= 0).all() and (sc >= -1).all()


ENC_HEAD = dict(type="EncHead", in_channels=[12, 16], in_index=[0, 1],
                input_transform="multiple_select", channels=8, num_codes=4,
                use_se_loss=True, add_lateral=True, dropout_ratio=0.0,
                num_classes=3, norm_cfg=dict(type="BN"),
                loss_decode=dict(type="CrossEntropyLoss"),
                loss_se_decode=dict(type="CrossEntropyLoss",
                                    use_sigmoid=True, loss_weight=0.2))


def test_enc_head_train_and_test_paths(rng):
    head = build_module_from_cfg(ENC_HEAD, DECODEHEAD)
    x = [jnp.asarray(rng.randn(2, 8, 8, 12).astype(np.float32)),
         jnp.asarray(rng.randn(2, 4, 4, 16).astype(np.float32))]
    gt = jnp.asarray(rng.randint(0, 3, (2, 8, 8)).astype(np.int32))
    variables = head.init({"params": jax.random.PRNGKey(0),
                           "dropout": jax.random.PRNGKey(1)},
                          x, gt, method="forward_train", train=True)
    (_, losses), _ = head.apply(variables, x, gt, method="forward_train",
                                train=True, mutable=["batch_stats"])
    assert {"loss_ce", "loss_se", "acc_seg"} <= set(losses)
    assert np.isfinite(float(losses["loss_se"]))

    seg = head.apply(variables, x, method="forward_test")
    assert seg.shape == (2, 4, 4, 3)  # last-feature resolution


def test_enc_head_se_presence_target(rng):
    """The se loss must target per-image class presence: an image with a
    single class present yields a lower se loss when the se logits favor
    exactly that class."""
    head = build_module_from_cfg(ENC_HEAD, DECODEHEAD)
    x = [jnp.zeros((1, 4, 4, 12)), jnp.zeros((1, 2, 2, 16))]
    gt_one = jnp.full((1, 4, 4), 2, jnp.int32)     # only class 2 present
    variables = head.init({"params": jax.random.PRNGKey(0),
                           "dropout": jax.random.PRNGKey(1)},
                          x, gt_one, method="forward_train", train=True)
    (_, l1), _ = head.apply(variables, x, gt_one, method="forward_train",
                            train=True, mutable=["batch_stats"])
    gt_all = jnp.asarray(rng.randint(0, 3, (1, 4, 4)).astype(np.int32))
    (_, l2), _ = head.apply(variables, x, gt_all, method="forward_train",
                            train=True, mutable=["batch_stats"])
    assert float(l1["loss_se"]) != float(l2["loss_se"])
