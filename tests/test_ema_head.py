"""EMANet EMA module/head: torch-golden EM iterations, moving-average
buffer semantics (models/decode_heads/ema_head.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as TF

from image_segmentation_lab_tpu.core.registry_hub import DECODEHEAD
from image_segmentation_lab_tpu.models.builder import build_module_from_cfg
from image_segmentation_lab_tpu.models.decode_heads.ema_head import EMAModule

torch.set_grad_enabled(False)


def t_ema(feats_nchw, bases0, num_stages):
    N, C, H, W = feats_nchw.shape
    feats = feats_nchw.view(N, C, H * W)
    bases = torch.from_numpy(np.asarray(bases0)).expand(N, -1, -1)
    for _ in range(num_stages):
        attention = torch.einsum("bcn,bck->bnk", feats, bases)
        attention = TF.softmax(attention, dim=2)
        attention_normed = attention / attention.sum(dim=1,
                                                     keepdim=True).clamp(1e-12)
        bases = torch.einsum("bcn,bnk->bck", feats, attention_normed)
        bases = TF.normalize(bases, dim=1, p=2)
    recon = torch.einsum("bck,bnk->bcn", bases, attention)
    return recon.view(N, C, H, W), bases


def test_ema_module_matches_torch(rng):
    m = EMAModule(12, num_bases=5, num_stages=3, momentum=0.1)
    x = rng.randn(2, 4, 6, 12).astype(np.float32)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    bases0 = variables["batch_stats"]["bases"]
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(bases0), axis=1), 1.0, atol=1e-5)

    out = m.apply(variables, jnp.asarray(x))
    ref, _ = t_ema(torch.from_numpy(x.transpose(0, 3, 1, 2)), bases0, 3)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2),
                               ref.numpy(), atol=3e-5, rtol=1e-4)


def test_ema_buffer_updates_only_in_train(rng):
    m = EMAModule(8, num_bases=4, num_stages=2, momentum=0.5)
    x = jnp.asarray(rng.randn(2, 4, 4, 8).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x)
    bases0 = np.asarray(variables["batch_stats"]["bases"])

    # eval: no mutation requested, buffer untouched
    _ = m.apply(variables, x)
    # train: buffer moves toward the batch bases with momentum 0.5
    _, mutated = m.apply(variables, x, True, mutable=["batch_stats"])
    bases1 = np.asarray(mutated["batch_stats"]["bases"])
    assert np.abs(bases1 - bases0).max() > 1e-4
    _, batch_bases = t_ema(torch.from_numpy(
        np.asarray(x).transpose(0, 3, 1, 2)), bases0, 2)
    expected = 0.5 * bases0 + 0.5 * TF.normalize(
        batch_bases.mean(0, keepdim=True), dim=1, p=2).numpy()
    np.testing.assert_allclose(bases1, expected, atol=3e-5, rtol=1e-4)


def test_ema_head_builds_and_runs(rng):
    head = build_module_from_cfg(
        dict(type="EMAHead", in_channels=16, in_index=0, channels=8,
             ema_channels=12, num_bases=4, num_stages=2, dropout_ratio=0.0,
             num_classes=3, norm_cfg=dict(type="BN"),
             loss_decode=dict(type="CrossEntropyLoss")), DECODEHEAD)
    x = [jnp.asarray(rng.randn(2, 6, 8, 16).astype(np.float32))]
    variables = head.init({"params": jax.random.PRNGKey(0),
                           "dropout": jax.random.PRNGKey(1)}, x)
    out = head.apply(variables, x)
    assert out.shape == (2, 6, 8, 3)
    assert np.isfinite(np.asarray(out)).all()
    assert "bases" in variables["batch_stats"]["ema_module"]
