"""DPTHead: torch-golden numerics (beyond-reference family).

Twins re-derive mmseg's ReassembleBlocks (readout modes, deconv/conv
rescaling), PreActResidualConvUnit and FeatureFusionBlock chain with
the SAME weights pulled from the jax tree.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from image_segmentation_lab_tpu.core.registry_hub import DECODEHEAD
from image_segmentation_lab_tpu.models.builder import build_module_from_cfg
from image_segmentation_lab_tpu.models.decode_heads.dpt_head import \
    ReassembleBlocks

from test_zoo_torch_parity import P, _t, randomize, tconv

torch.set_grad_enabled(False)


def _tw(w):
    return _t(np.asarray(w).transpose(3, 2, 0, 1))


def t_reassemble(params, pairs, readout):
    outs = []
    for i, (x, cls) in enumerate(pairs):
        n, c, h, w = x.shape
        if readout == "project":
            t = x.flatten(2).permute(0, 2, 1)
            r = cls.unsqueeze(1).expand_as(t)
            p = params[f"readout_projects_{i}"]
            t = torch.cat([t, r], -1) @ _t(p["weight"]) + _t(p["bias"])
            x = TF.gelu(t).permute(0, 2, 1).reshape(n, c, h, w)
        elif readout == "add":
            x = x + cls[:, :, None, None]
        pj = params[f"projects_{i}"]["conv"]
        x = tconv(x, pj["weight"], bias=np.asarray(pj["bias"]))
        if i in (0, 1):
            rl = params[f"resize_layers_{i}"]
            wdec = _t(np.asarray(rl["weight"]).transpose(3, 2, 0, 1))
            x = TF.conv_transpose2d(x, wdec, _t(rl["bias"]),
                                    stride=4 if i == 0 else 2)
        elif i == 3:
            rl = params["resize_layers_3"]
            x = tconv(x, rl["weight"], stride=2, padding=1,
                      bias=np.asarray(rl["bias"]))
        outs.append(x)
    return outs


@pytest.mark.parametrize("readout", ["ignore", "add", "project"])
def test_reassemble_blocks_match_torch(rng, readout):
    m = ReassembleBlocks(12, (4, 6, 8, 12), readout, 16)
    pairs = [(rng.randn(2, 4, 4, 12).astype(np.float32),
              rng.randn(2, 12).astype(np.float32)) for _ in range(4)]
    jp = [(jnp.asarray(a), jnp.asarray(b)) for a, b in pairs]
    variables = m.init(jax.random.PRNGKey(0), jp)
    variables = randomize(variables, seed=151)
    outs = m.apply(variables, jp)
    refs = t_reassemble(variables["params"],
                        [(_t(a.transpose(0, 3, 1, 2)), _t(b))
                         for a, b in pairs], readout)
    assert [tuple(o.shape[1:3]) for o in outs] == [(16, 16), (8, 8),
                                                   (4, 4), (2, 2)]
    for o, r in zip(outs, refs):
        np.testing.assert_allclose(np.asarray(o).transpose(0, 3, 1, 2),
                                   r.numpy(), atol=5e-5, rtol=1e-4)


DPT_HEAD = dict(type="DPTHead", in_channels=(12, 12, 12, 12),
                in_index=(0, 1, 2, 3), input_transform="multiple_select",
                channels=8, embed_dims=12,
                post_process_channels=(4, 6, 8, 12),
                readout_type="ignore", dropout_ratio=0.0, num_classes=3,
                norm_cfg=None, align_corners=False,
                loss_decode=dict(type="CrossEntropyLoss"))


def t_unit(f, p):
    h = TF.conv2d(TF.relu(f), _tw(P(p, "conv1/conv/weight")), padding=1)
    h = TF.conv2d(TF.relu(h), _tw(P(p, "conv2/conv/weight")), padding=1)
    return f + h


def t_fuse(p, f, skip=None):
    if skip is not None:
        if skip.shape != f.shape:
            skip = TF.interpolate(skip, size=f.shape[2:], mode="bilinear",
                                  align_corners=False)
        f = f + t_unit(skip, p["res_conv_unit1"])
    f = t_unit(f, p["res_conv_unit2"])
    f = TF.interpolate(f, scale_factor=2, mode="bilinear",
                       align_corners=False)
    pj = p["project"]["conv"]
    return tconv(f, pj["weight"], bias=np.asarray(pj["bias"]))


def test_dpt_head_matches_torch(rng):
    head = build_module_from_cfg(DPT_HEAD, DECODEHEAD)
    pairs = [(rng.randn(2, 4, 4, 12).astype(np.float32),
              rng.randn(2, 12).astype(np.float32)) for _ in range(4)]
    jp = [(jnp.asarray(a), jnp.asarray(b)) for a, b in pairs]
    variables = head.init({"params": jax.random.PRNGKey(0),
                           "dropout": jax.random.PRNGKey(1)}, jp)
    variables = randomize(variables, seed=152)
    out = head.apply(variables, jp)
    p = variables["params"]
    x = t_reassemble(p["reassemble_blocks"],
                     [(_t(a.transpose(0, 3, 1, 2)), _t(b))
                      for a, b in pairs], "ignore")
    x = [TF.conv2d(f, _tw(P(p, f"convs_{i}/conv/weight")), padding=1)
         for i, f in enumerate(x)]
    h = t_fuse(p["fusion_blocks_0"], x[-1])
    for i in range(1, 4):
        h = t_fuse(p[f"fusion_blocks_{i}"], h, x[-(i + 1)])
    pj = p["project"]["conv"]
    h = TF.relu(tconv(h, pj["weight"], padding=1,
                      bias=np.asarray(pj["bias"])))
    ref = tconv(h, p["conv_seg"]["weight"],
                bias=np.asarray(p["conv_seg"]["bias"]))
    assert out.shape == (2, 32, 32, 3)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2),
                               ref.numpy(), atol=1e-4, rtol=3e-4)
