"""Mask2Former (beyond-reference): masked-attention semantics, round-
robin scale plumbing, train/eval + config."""

import jax
import jax.numpy as jnp
import numpy as np

from image_segmentation_lab_tpu.models.decode_heads.maskformer_head import \
    CrossAttention


def test_masked_cross_attention_blocks_keys(rng):
    """Blocked keys get zero attention; a fully-blocked row falls back
    to full attention (upstream safeguard)."""
    C, h = 8, 2
    m = CrossAttention(C, h)
    q = jnp.asarray(rng.randn(1, 3, C).astype(np.float32))
    kv = rng.randn(1, 5, C).astype(np.float32)
    variables = m.init(jax.random.PRNGKey(0), q, jnp.asarray(kv),
                       jnp.asarray(kv))
    blocked = np.zeros((1, 3, 5), bool)
    blocked[0, 0, 2:] = True      # query 0 sees keys {0,1} only
    blocked[0, 1, :] = True       # query 1 blocks everything → full
    out = m.apply(variables, q, jnp.asarray(kv), jnp.asarray(kv),
                  blocked=jnp.asarray(blocked), mutable=False)
    # query 0: perturbing blocked keys must not change its output
    kv2 = kv.copy()
    kv2[0, 2:] += 11.0
    out2 = m.apply(variables, q, jnp.asarray(kv2), jnp.asarray(kv2),
                   blocked=jnp.asarray(blocked), mutable=False)
    np.testing.assert_allclose(np.asarray(out[0, 0]), np.asarray(out2[0, 0]),
                               atol=1e-5)
    # query 1 (fully blocked) equals unmasked attention
    full = m.apply(variables, q, jnp.asarray(kv), jnp.asarray(kv),
                   mutable=False)
    np.testing.assert_allclose(np.asarray(out[0, 1]), np.asarray(full[0, 1]),
                               atol=1e-5)
    # query 2 (nothing blocked) equals unmasked attention
    np.testing.assert_allclose(np.asarray(out[0, 2]), np.asarray(full[0, 2]),
                               atol=1e-5)


def t_cross_attn(p, q_in, k_in, v_in, heads, blocked=None):
    import torch
    import torch.nn.functional as TF
    from test_zoo_torch_parity import P as getp
    import math

    def lin(x, path):
        w = torch.from_numpy(np.asarray(getp(p, path + "/weight")))
        b = torch.from_numpy(np.asarray(getp(p, path + "/bias")))
        return TF.linear(x, w.t(), b)

    N, Lq, C = q_in.shape
    Lk = k_in.shape[1]
    d = C // heads
    q = lin(q_in, "q_proj").reshape(N, Lq, heads, d).permute(0, 2, 1, 3)
    k = lin(k_in, "k_proj").reshape(N, Lk, heads, d).permute(0, 2, 1, 3)
    v = lin(v_in, "v_proj").reshape(N, Lk, heads, d).permute(0, 2, 1, 3)
    scores = q @ k.transpose(-2, -1) / math.sqrt(d)
    if blocked is not None:
        keep = ~blocked | blocked.all(-1, keepdim=True)
        scores = scores.masked_fill(~keep.unsqueeze(1), -1e30)
    attn = scores.softmax(-1)
    out = (attn @ v).permute(0, 2, 1, 3).reshape(N, Lq, C)
    return lin(out, "out_proj")


def test_mask2former_decoder_layer_matches_torch(rng):
    """Torch twin of the post-norm cross-first decoder layer incl. the
    masked attention."""
    import torch
    import torch.nn.functional as TF
    from test_zoo_torch_parity import P as getp, randomize
    from image_segmentation_lab_tpu.models.decode_heads.mask2former_head \
        import Mask2FormerDecoderLayer

    torch.set_grad_enabled(False)
    C, heads, Q, L = 16, 2, 5, 12
    m = Mask2FormerDecoderLayer(C, heads, 32)
    x = rng.randn(2, Q, C).astype(np.float32)
    mem = rng.randn(2, L, C).astype(np.float32)
    qpos = rng.randn(1, Q, C).astype(np.float32)
    mpos = rng.randn(1, L, C).astype(np.float32)
    blocked = rng.rand(2, Q, L) > 0.5
    blocked[0, 1] = True      # one fully-blocked row exercises the fallback
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x),
                       jnp.asarray(mem), jnp.asarray(qpos),
                       jnp.asarray(mpos), jnp.asarray(blocked))
    variables = randomize(variables, seed=241)
    out = m.apply(variables, jnp.asarray(x), jnp.asarray(mem),
                  jnp.asarray(qpos), jnp.asarray(mpos),
                  jnp.asarray(blocked), mutable=False)

    p = variables["params"]

    def ln(x, path):
        w = torch.from_numpy(np.asarray(getp(p, path + "/weight")))
        b = torch.from_numpy(np.asarray(getp(p, path + "/bias")))
        return TF.layer_norm(x, w.shape, w, b, eps=1e-5)

    tx = torch.from_numpy(x)
    tmem = torch.from_numpy(mem)
    tqp = torch.from_numpy(qpos)
    tmp = torch.from_numpy(mpos)
    tb = torch.from_numpy(blocked)
    y = t_cross_attn(p["cross_attn"], tx + tqp, tmem + tmp, tmem, heads,
                     blocked=tb)
    tx = ln(tx + y, "norm1")
    y = t_cross_attn(p["self_attn"], tx + tqp, tx + tqp, tx, heads)
    tx = ln(tx + y, "norm2")

    def lin(x, path):
        w = torch.from_numpy(np.asarray(getp(p, path + "/weight")))
        b = torch.from_numpy(np.asarray(getp(p, path + "/bias")))
        return TF.linear(x, w.t(), b)

    y = lin(TF.relu(lin(tx, "ffn_fc1")), "ffn_fc2")
    want = ln(tx + y, "norm3")
    np.testing.assert_allclose(np.asarray(out), want.numpy(),
                               rtol=2e-3, atol=2e-4)


def test_maskformer_detr_layer_matches_torch(rng):
    """Torch twin of the original (self-attention-first, unmasked) DETR
    decoder layer used by MaskFormerHead."""
    import torch
    import torch.nn.functional as TF
    from test_zoo_torch_parity import P as getp, randomize
    from image_segmentation_lab_tpu.models.decode_heads.maskformer_head \
        import DETRDecoderLayer

    torch.set_grad_enabled(False)
    C, heads, Q, L = 16, 2, 5, 12
    m = DETRDecoderLayer(C, heads, 32)
    x = rng.randn(2, Q, C).astype(np.float32)
    mem = rng.randn(2, L, C).astype(np.float32)
    qpos = rng.randn(1, Q, C).astype(np.float32)
    mpos = rng.randn(1, L, C).astype(np.float32)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x),
                       jnp.asarray(mem), jnp.asarray(qpos),
                       jnp.asarray(mpos))
    variables = randomize(variables, seed=242)
    out = m.apply(variables, jnp.asarray(x), jnp.asarray(mem),
                  jnp.asarray(qpos), jnp.asarray(mpos), mutable=False)
    p = variables["params"]

    def ln(x, path):
        w = torch.from_numpy(np.asarray(getp(p, path + "/weight")))
        b = torch.from_numpy(np.asarray(getp(p, path + "/bias")))
        return TF.layer_norm(x, w.shape, w, b, eps=1e-5)

    def lin(x, path):
        w = torch.from_numpy(np.asarray(getp(p, path + "/weight")))
        b = torch.from_numpy(np.asarray(getp(p, path + "/bias")))
        return TF.linear(x, w.t(), b)

    tx = torch.from_numpy(x)
    tmem = torch.from_numpy(mem)
    tqp = torch.from_numpy(qpos)
    tmp = torch.from_numpy(mpos)
    y = t_cross_attn(p["self_attn"], tx + tqp, tx + tqp, tx, heads)
    tx = ln(tx + y, "norm1")
    y = t_cross_attn(p["cross_attn"], tx + tqp, tmem + tmp, tmem, heads)
    tx = ln(tx + y, "norm2")
    y = lin(TF.relu(lin(tx, "ffn_fc1")), "ffn_fc2")
    want = ln(tx + y, "norm3")
    np.testing.assert_allclose(np.asarray(out), want.numpy(),
                               rtol=2e-3, atol=2e-4)


def _tiny_cfg():
    norm = dict(type="BN")
    return dict(
        type="EncoderDecoder",
        backbone=dict(type="ResNetV1c", depth=18, num_stages=4,
                      out_indices=(0, 1, 2, 3), dilations=(1, 1, 1, 1),
                      strides=(1, 2, 2, 2), norm_cfg=norm,
                      base_channels=8, stem_channels=8),
        decode_head=dict(type="Mask2FormerHead",
                         in_channels=[8, 16, 32, 64],
                         in_index=(0, 1, 2, 3),
                         input_transform="multiple_select",
                         channels=16, feat_channels=16, num_queries=8,
                         num_decoder_layers=3, num_heads=2, num_scales=3,
                         feedforward_channels=32, dropout_ratio=0.0,
                         num_classes=3),
        test_cfg=dict(mode="whole"))


def test_mask2former_trains_and_infers(rng):
    from image_segmentation_lab_tpu.core.builder import build_optimizer
    from image_segmentation_lab_tpu.models.builder import build_segmentor
    from image_segmentation_lab_tpu.train_state import (create_train_state,
                                                        make_train_step)
    model = build_segmentor(_tiny_cfg())
    img = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
    gt = jnp.asarray(rng.randint(0, 3, size=(2, 32, 32)).astype(np.int32))
    tx = build_optimizer(dict(type="AdamW", lr=1e-3))
    state = create_train_state(model, jax.random.PRNGKey(0), img, gt, tx)
    step = make_train_step(model, tx)
    state, log_vars = step(state, img, gt, jax.random.PRNGKey(1))
    # 3 layers + the pre-decoder prediction = aux d0..d2 + final
    for key in ("decode.loss_cls", "decode.d0.loss_cls",
                "decode.d2.loss_mask"):
        assert np.isfinite(float(log_vars[key])), (key, sorted(log_vars))
    probs = model.apply(state.variables(), img[:1], method="inference")
    assert probs.shape == (1, 32, 32, 3)
    # no dead DETR-layer or memory-proj params in the subclass
    params = state.params["decode_head"]
    assert "memory_proj" not in params
    assert "query_feat" in params and "level_embed" in params


def test_mask2former_dp_training_matches_single_device(rng):
    """The matcher's vmapped lax.while_loop and the masked attention
    must partition over the data mesh: 8-device DP == single-device
    (matching is per-image, so sharding the batch cannot change it)."""
    import pytest
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    from image_segmentation_lab_tpu.core.builder import build_optimizer
    from image_segmentation_lab_tpu.models.builder import build_segmentor
    from image_segmentation_lab_tpu.parallel import (get_mesh,
                                                     make_sharded_train_step,
                                                     replicate, shard_batch)
    from image_segmentation_lab_tpu.train_state import (create_train_state,
                                                        make_train_step)
    model = build_segmentor(_tiny_cfg())
    tx = build_optimizer(dict(type="SGD", lr=0.1, momentum=0.9))
    key = jax.random.PRNGKey(0)
    x = jnp.asarray(rng.randn(8, 32, 32, 3).astype(np.float32))
    gt = jnp.asarray(rng.randint(0, 3, size=(8, 32, 32)).astype(np.int32))

    state1 = create_train_state(model, key, x[:1], gt[:1], tx)
    step1 = make_train_step(model, tx, donate=False)
    mesh = get_mesh(8)
    state8 = replicate(create_train_state(model, key, x[:1], gt[:1], tx),
                       mesh)
    step8 = make_sharded_train_step(model, tx, mesh, donate=False)
    xs, gts = shard_batch((x, gt), mesh)
    k = jax.random.fold_in(key, 1)
    state1, lv1 = step1(state1, x, gt, k)
    state8, lv8 = step8(state8, xs, gts, k)
    for key_ in ("loss", "decode.loss_cls", "decode.loss_mask",
                 "decode.loss_dice"):
        np.testing.assert_allclose(float(lv1[key_]), float(lv8[key_]),
                                   rtol=2e-5, atol=1e-6)


def test_mask2former_config_builds():
    from image_segmentation_lab_tpu.core.fileio.parse import \
        parse_and_backup_config
    from image_segmentation_lab_tpu.models.builder import build_segmentor
    cfg = parse_and_backup_config(
        "configs/network/maskformer/mask2former_r50.py")
    model = cfg["model"]
    model["backbone"].update(depth=18, base_channels=8, stem_channels=8)
    model["decode_head"].update(in_channels=[8, 16, 32, 64], channels=16,
                                feat_channels=16, num_queries=8,
                                num_decoder_layers=3, num_heads=2,
                                feedforward_channels=32)
    seg = build_segmentor(model)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = seg.init(jax.random.PRNGKey(0), x, method="encode_decode")
    out = seg.apply(variables, x, method="encode_decode", mutable=False)
    assert out.shape == (1, 64, 64, 2)


def test_attn_mask_level_einsum_commutes_with_resize(rng):
    """The round-4 restructure computes attention masks from
    level-resized mask FEATURES instead of resizing each layer's mask
    LOGITS (upstream's form).  Bilinear resize is linear in the channel
    dot product, so the two are mathematically identical — pinned here
    so the equivalence argument stays tested."""
    from image_segmentation_lab_tpu.utils.ops import resize
    N, Q, H, W, C = 2, 5, 16, 16, 8
    emb = jnp.asarray(rng.randn(N, Q, C).astype(np.float32))
    feat = jnp.asarray(rng.randn(N, H, W, C).astype(np.float32))
    full = jnp.einsum("nqc,nhwc->nqhw", emb, feat)
    resized_logits = resize(jnp.transpose(full, (0, 2, 3, 1)), size=(4, 4),
                            mode="bilinear", align_corners=False)
    level_feat = resize(feat, size=(4, 4), mode="bilinear",
                        align_corners=False)
    level_logits = jnp.einsum("nqc,nhwc->nqhw", emb, level_feat)
    np.testing.assert_allclose(np.asarray(resized_logits),
                               np.asarray(jnp.transpose(level_logits,
                                                        (0, 2, 3, 1))),
                               rtol=1e-5, atol=1e-5)
