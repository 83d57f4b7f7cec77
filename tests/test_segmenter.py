"""Segmenter mask-transformer head: torch-golden numerics
(models/decode_heads/segmenter_mask_head.py, beyond-reference family).

The torch twin re-derives the head from the paper (Strudel et al., ICCV
2021; mmseg SegmenterMaskTransformerHead conventions): proj_dec linear,
K class embeddings joined to the sequence, shared ViT blocks,
decoder norm, raw (C, C) projection matrices, L2 normalization, patch x
class similarity, LayerNorm over the K mask logits — with the SAME
weights pulled from the jax tree, so the wiring is what is under test.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from image_segmentation_lab_tpu.core.registry_hub import DECODEHEAD
from image_segmentation_lab_tpu.models.builder import build_module_from_cfg

from test_swin import t_linear, t_ln
from test_vit import t_vit_block
from test_zoo_torch_parity import _t, randomize

torch.set_grad_enabled(False)

HEAD = dict(type="SegmenterMaskTransformerHead", in_channels=16, channels=16,
            in_index=0, num_layers=2, num_heads=2, mlp_ratio=4,
            dropout_ratio=0.0, num_classes=3, drop_path_rate=0.0,
            align_corners=False,
            loss_decode=dict(type="CrossEntropyLoss"))


def t_segmenter_head(params, x_nhwc, num_classes, num_heads):
    N, H, W, Cin = x_nhwc.shape
    tokens = _t(x_nhwc).reshape(N, H * W, Cin)
    tokens = t_linear(tokens, params["proj_dec"])
    C = tokens.shape[-1]
    cls = _t(params["cls_emb"]).expand(N, num_classes, C)
    tokens = torch.cat([tokens, cls], dim=1)
    for i in range(2):
        tokens = t_vit_block(tokens, params[f"layer{i}"], num_heads)
    tokens = t_ln(tokens, params["decoder_norm"])
    patches, cls_tok = tokens[:, :-num_classes], tokens[:, -num_classes:]
    patches = patches @ _t(params["proj_patch"])
    cls_tok = cls_tok @ _t(params["proj_classes"])
    patches = patches / patches.norm(dim=-1, keepdim=True)
    cls_tok = cls_tok / cls_tok.norm(dim=-1, keepdim=True)
    masks = patches @ cls_tok.transpose(1, 2)            # (N, L, K)
    masks = t_ln(masks, params["mask_norm"])
    return masks.reshape(N, H, W, num_classes)


def test_segmenter_head_matches_torch(rng):
    head = build_module_from_cfg(HEAD, DECODEHEAD)
    x = rng.randn(2, 4, 5, 16).astype(np.float32)
    variables = head.init({"params": jax.random.PRNGKey(0),
                           "dropout": jax.random.PRNGKey(1)},
                          [jnp.asarray(x)])
    variables = randomize(variables, seed=7)
    out = head.apply(variables, [jnp.asarray(x)])
    ref = t_segmenter_head(variables["params"], x, 3, 2)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(),
                               atol=2e-5, rtol=1e-4)
    # argmax-level identity
    assert (np.argmax(np.asarray(out), -1)
            == ref.numpy().argmax(-1)).mean() > 0.99


def test_segmenter_head_no_conv_seg_params(rng):
    """The similarity IS the classifier: the base head's conv_seg must
    not materialize parameters (flax lazy init), keeping checkpoints
    free of dead weights."""
    head = build_module_from_cfg(HEAD, DECODEHEAD)
    variables = head.init({"params": jax.random.PRNGKey(0),
                           "dropout": jax.random.PRNGKey(1)},
                          [jnp.zeros((1, 4, 4, 16))])
    assert "conv_seg" not in variables["params"]


def test_segmenter_head_bare_input(rng):
    """Single-tap backbones hand the head a bare feature map."""
    head = build_module_from_cfg(HEAD, DECODEHEAD)
    x = jnp.asarray(rng.randn(1, 4, 4, 16).astype(np.float32))
    variables = head.init({"params": jax.random.PRNGKey(0),
                           "dropout": jax.random.PRNGKey(1)}, x)
    out_bare = head.apply(variables, x)
    out_list = head.apply(variables, [x])
    np.testing.assert_array_equal(np.asarray(out_bare), np.asarray(out_list))
