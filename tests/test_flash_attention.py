"""Flash-attention kernel tests (interpret mode on CPU).

Golden contract: the fused kernel must reproduce the einsum attention
path (f32 scores/softmax, probabilities cast to the value dtype — the
exact semantics of models/backbones/vit.py::MultiheadAttention) for
both forward values and gradients, including ragged lengths and the
MiT Lq != Lk spatial-reduction case.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_segmentation_lab_tpu.ops.attention import (_use_flash,
                                                      multihead_attention)
from image_segmentation_lab_tpu.ops.pallas.flash_attention import \
    flash_attention


def _naive(q, k, v, scale):
    s = jnp.einsum("bld,bsd->bls", q, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s * scale, axis=-1)
    return jnp.einsum("bls,bsd->bld", p.astype(v.dtype), v)


@pytest.mark.parametrize("B,Lq,Lk,d", [
    (2, 64, 64, 32),      # exact block fit
    (3, 130, 130, 64),    # ragged both ways (cls-token-style odd length)
    (2, 100, 37, 64),     # Lq != Lk (MiT spatial reduction)
    (1, 300, 300, 48),    # multi-block both axes, non-lane head dim
])
def test_flash_matches_naive_fwd_and_grad(rng, B, Lq, Lk, d):
    q = jnp.asarray(rng.randn(B, Lq, d).astype(np.float32))
    k = jnp.asarray(rng.randn(B, Lk, d).astype(np.float32))
    v = jnp.asarray(rng.randn(B, Lk, d).astype(np.float32))
    scale = 1.0 / np.sqrt(d)

    ref = _naive(q, k, v, scale)
    out = flash_attention(q, k, v, scale, 64, 64, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6, rtol=1e-5)

    # gradients through a scalar loss touching every output element
    gr = jax.grad(lambda *a: (_naive(*a, scale) ** 2).sum(),
                  argnums=(0, 1, 2))(q, k, v)
    gf = jax.grad(lambda *a: (flash_attention(*a, scale, 64, 64, True)
                              ** 2).sum(), argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gr, ("dq", "dk", "dv")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-4, err_msg=name)


def test_flash_bf16_matches_einsum_bf16(rng):
    """bf16 inputs: both paths cast probabilities to bf16 for PV; the
    fused kernel must stay within bf16 resolution of the einsum path."""
    B, L, d = 2, 96, 64
    q = jnp.asarray(rng.randn(B, L, d), jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, L, d), jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, L, d), jnp.bfloat16)
    scale = 1.0 / np.sqrt(d)
    ref = _naive(q, k, v, scale).astype(jnp.float32)
    out = flash_attention(q, k, v, scale, 64, 64, True).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)


def test_dispatcher_paths_agree(rng):
    """(N, L, h, d) dispatcher: interpret-flash == einsum."""
    N, Lq, Lk, h, d = 2, 70, 33, 3, 32
    q = jnp.asarray(rng.randn(N, Lq, h, d).astype(np.float32))
    k = jnp.asarray(rng.randn(N, Lk, h, d).astype(np.float32))
    v = jnp.asarray(rng.randn(N, Lk, h, d).astype(np.float32))
    scale = 1.0 / np.sqrt(d)
    ref = multihead_attention(q, k, v, scale, force="einsum")
    out = multihead_attention(q, k, v, scale, force="interpret",
                              block_q=64, block_k=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6, rtol=1e-5)


def test_auto_policy_cpu_is_einsum():
    """On CPU the auto policy must never pick the TPU kernel."""
    assert jax.default_backend() == "cpu"
    assert not _use_flash(4096, 4096, 64, True)
    assert not _use_flash(4096, 4096, 64, False)


def test_vit_attention_module_flash_parity(rng, monkeypatch):
    """ViT MultiheadAttention end-to-end: forcing the (interpret) flash
    path through the env knob reproduces the einsum path bit-for-bit up
    to f32 reduction order."""
    from image_segmentation_lab_tpu.models.backbones.vit import \
        MultiheadAttention
    m = MultiheadAttention(64, 4)
    x = jnp.asarray(rng.randn(2, 33, 64).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x)
    ref = m.apply(variables, x)
    monkeypatch.setenv("ISLT_FLASH_ATTN_FORCE", "interpret")
    out = m.apply(variables, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6, rtol=1e-5)


def test_mit_attention_module_flash_parity(rng, monkeypatch):
    """MiT EfficientMultiheadAttention (sr_ratio=2, Lq != Lk) parity."""
    from image_segmentation_lab_tpu.models.backbones.mit import \
        EfficientMultiheadAttention
    m = EfficientMultiheadAttention(32, 2, sr_ratio=2)
    x = jnp.asarray(rng.randn(2, 9, 7, 32).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x)
    ref = m.apply(variables, x)
    monkeypatch.setenv("ISLT_FLASH_ATTN_FORCE", "interpret")
    out = m.apply(variables, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6, rtol=1e-5)


def test_attn_dropout_keeps_einsum_path(rng, monkeypatch):
    """attn_drop_rate > 0 under train must not enter the fused kernel
    (probabilities never materialize there) — forcing an invalid kernel
    path via env would raise; the dropout branch must shield it."""
    from image_segmentation_lab_tpu.models.backbones.vit import \
        MultiheadAttention
    m = MultiheadAttention(32, 2, attn_drop_rate=0.5)
    x = jnp.asarray(rng.randn(1, 10, 32).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x)
    monkeypatch.setenv("ISLT_FLASH_ATTN_FORCE", "boom")  # would KeyError
    out = m.apply(variables, x, True,
                  rngs={"dropout": jax.random.PRNGKey(1)})
    assert np.isfinite(np.asarray(out)).all()


def test_no_flash_context_forces_einsum(rng, monkeypatch):
    """Sharded step builders trace under no_flash(): even with the env
    knob forcing the kernel, the dispatcher must take the einsum path
    (a Mosaic kernel cannot be partitioned inside a multi-device jit)."""
    from image_segmentation_lab_tpu.ops import attention

    def boom(*a, **k):
        raise AssertionError("flash kernel entered under no_flash()")

    monkeypatch.setattr(attention, "flash_attention", boom)
    monkeypatch.setenv("ISLT_FLASH_ATTN_FORCE", "interpret")
    q = jnp.asarray(rng.randn(1, 16, 2, 8).astype(np.float32))
    with attention.no_flash():
        out = attention.multihead_attention(q, q, q, 0.5)
    assert out.shape == q.shape


# ---------------------------------------------------------------------------
# SPMD: the kernel's custom_partitioning rule (batch-sharded multi-device)
# ---------------------------------------------------------------------------


def test_flash_spmd_batch_sharded_fwd_grad_no_gather(rng):
    """Batch-sharded jit over the 8-device mesh: the custom_partitioning
    rule must run one kernel per shard — values AND gradients match the
    einsum path, and the compiled HLO contains no all-gather (the whole
    point: zero attention communication under DP/FSDP/ZeRO/EP)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from image_segmentation_lab_tpu.parallel import get_mesh

    mesh = get_mesh(8)
    data = NamedSharding(mesh, P("data"))
    B, Lq, Lk, d = 16, 70, 37, 32
    q = jax.device_put(jnp.asarray(rng.randn(B, Lq, d), jnp.float32), data)
    k = jax.device_put(jnp.asarray(rng.randn(B, Lk, d), jnp.float32), data)
    v = jax.device_put(jnp.asarray(rng.randn(B, Lk, d), jnp.float32), data)
    scale = 1.0 / np.sqrt(d)

    def loss_flash(q, k, v):
        return (flash_attention(q, k, v, scale, 32, 32, True) ** 2).sum()

    def loss_ref(q, k, v):
        return (_naive(q, k, v, scale) ** 2).sum()

    gf = jax.jit(jax.value_and_grad(loss_flash, argnums=(0, 1, 2)),
                 in_shardings=(data, data, data))
    lf, gradsf = gf(q, k, v)
    lr, gradsr = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(
        *map(jax.device_get, (q, k, v)))
    np.testing.assert_allclose(float(lf), float(lr), rtol=1e-5)
    for a, b, name in zip(gradsf, gradsr, ("dq", "dk", "dv")):
        np.testing.assert_allclose(np.asarray(jax.device_get(a)),
                                   np.asarray(b), atol=2e-5, rtol=1e-4,
                                   err_msg=name)
    hlo = gf.lower(q, k, v).compile().as_text()
    assert "all-gather" not in hlo, "partition rule resharded the batch dim"


def test_flash_spmd_single_device_jit_unchanged(rng):
    """The custom_partitioning wrapper must be a no-op in a plain
    (unsharded) jit — the single-chip bench path."""
    B, L, d = 2, 70, 32
    q = jnp.asarray(rng.randn(B, L, d), jnp.float32)
    k = jnp.asarray(rng.randn(B, L, d), jnp.float32)
    v = jnp.asarray(rng.randn(B, L, d), jnp.float32)
    scale = 1.0 / np.sqrt(d)
    out = jax.jit(lambda q, k, v: flash_attention(q, k, v, scale, 32, 32,
                                                  True))(q, k, v)
    ref = _naive(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6, rtol=1e-5)


# ------------------------------------------- chunked online softmax

def _reference_attention(q, k, v, scale, blocked=None):
    s = jnp.einsum("nlhd,nshd->nhls", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    if blocked is not None:
        keep = ~blocked | jnp.all(blocked, axis=-1, keepdims=True)
        s = jnp.where(keep[:, None], s, -1e30)
    p = jax.nn.softmax(s, -1)
    return jnp.einsum("nhls,nshd->nlhd", p, v.astype(jnp.float32))


def test_chunked_attention_matches_monolithic():
    from image_segmentation_lab_tpu.ops.attention import \
        chunked_softmax_attention
    r = np.random.RandomState(0)
    N, Lq, Lk, h, d = 2, 5, 23, 2, 8     # Lk NOT a chunk multiple
    q = jnp.asarray(r.randn(N, Lq, h, d).astype(np.float32))
    k = jnp.asarray(r.randn(N, Lk, h, d).astype(np.float32))
    v = jnp.asarray(r.randn(N, Lk, h, d).astype(np.float32))
    got = chunked_softmax_attention(q, k, v, 0.35, chunk=7)
    want = _reference_attention(q, k, v, 0.35)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_chunked_attention_masked_and_fully_blocked_fallback():
    from image_segmentation_lab_tpu.ops.attention import \
        chunked_softmax_attention
    r = np.random.RandomState(1)
    N, Lq, Lk, h, d = 2, 4, 20, 2, 8
    q = jnp.asarray(r.randn(N, Lq, h, d).astype(np.float32))
    k = jnp.asarray(r.randn(N, Lk, h, d).astype(np.float32))
    v = jnp.asarray(r.randn(N, Lk, h, d).astype(np.float32))
    blocked = r.rand(N, Lq, Lk) > 0.5
    blocked[0, 1, :] = True    # fully-blocked row -> full attention
    blocked = jnp.asarray(blocked)
    got = chunked_softmax_attention(q, k, v, 0.5, blocked=blocked, chunk=8)
    want = _reference_attention(q, k, v, 0.5, blocked=blocked)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_chunked_attention_gradients_match():
    from image_segmentation_lab_tpu.ops.attention import \
        chunked_softmax_attention
    r = np.random.RandomState(2)
    N, Lq, Lk, h, d = 1, 3, 10, 2, 4
    q = jnp.asarray(r.randn(N, Lq, h, d).astype(np.float32))
    k = jnp.asarray(r.randn(N, Lk, h, d).astype(np.float32))
    v = jnp.asarray(r.randn(N, Lk, h, d).astype(np.float32))
    blocked = jnp.asarray(r.rand(N, Lq, Lk) > 0.6)

    def loss_chunked(q, k, v):
        return (chunked_softmax_attention(q, k, v, 0.5, blocked=blocked,
                                          chunk=4) ** 2).sum()

    def loss_ref(q, k, v):
        return (_reference_attention(q, k, v, 0.5, blocked=blocked)
                ** 2).sum()

    g1 = jax.grad(loss_chunked, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_cross_attention_routes_large_scores_to_chunked(monkeypatch):
    """Above the cliff threshold CrossAttention must produce the same
    output through the chunked path (threshold lowered so tiny test
    shapes cross it)."""
    import image_segmentation_lab_tpu.models.decode_heads.maskformer_head \
        as mf
    from image_segmentation_lab_tpu.models.decode_heads.maskformer_head \
        import CrossAttention
    r = np.random.RandomState(3)
    N, Lq, Lk, C, h = 2, 6, 40, 16, 2
    att = CrossAttention(C, h)
    qx = jnp.asarray(r.randn(N, Lq, C).astype(np.float32))
    kx = jnp.asarray(r.randn(N, Lk, C).astype(np.float32))
    blocked = jnp.asarray(r.rand(N, Lq, Lk) > 0.5)
    vars_ = att.init(jax.random.PRNGKey(0), qx, kx, kx, blocked=blocked)
    want = att.apply(vars_, qx, kx, kx, blocked=blocked)
    monkeypatch.setattr(mf, "_CHUNKED_MIN_SCORES", 1)
    got = att.apply(vars_, qx, kx, kx, blocked=blocked)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
