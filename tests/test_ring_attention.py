"""Ring-attention context parallelism (parallel/ring.py): forward and
gradient parity with single-device full attention on the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_segmentation_lab_tpu.ops.attention import multihead_attention
from image_segmentation_lab_tpu.parallel import get_mesh
from image_segmentation_lab_tpu.parallel.ring import ring_attention

pytestmark = pytest.mark.skipif(jax.device_count() < 8,
                                reason="needs >=8 virtual devices")

N, L, H, D = 2, 32, 2, 8
SCALE = D ** -0.5


@pytest.fixture(scope="module")
def qkv():
    r = np.random.RandomState(0)
    return tuple(jnp.asarray(r.randn(N, L, H, D).astype(np.float32))
                 for _ in range(3))


def test_ring_forward_matches_full(qkv):
    q, k, v = qkv
    ref = multihead_attention(q, k, v, SCALE, force="einsum")
    mesh = get_mesh(8, axis_names=("seq",))
    out = ring_attention(q, k, v, SCALE, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6, rtol=1e-5)


def test_ring_forward_2d_data_seq_mesh(qkv):
    q, k, v = qkv
    ref = multihead_attention(q, k, v, SCALE, force="einsum")
    mesh = get_mesh(8, axis_names=("data", "seq"), shape=(2, 4))
    out = ring_attention(q, k, v, SCALE, mesh, batch_axis="data")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6, rtol=1e-5)


def test_ring_gradients_match_full(qkv):
    q, k, v = qkv
    mesh = get_mesh(8, axis_names=("seq",))
    # fixed cotangent so the two losses are identical functions
    w = jnp.asarray(np.random.RandomState(1)
                    .randn(N, L, H, D).astype(np.float32))

    def ring_loss(q, k, v):
        return (ring_attention(q, k, v, SCALE, mesh) * w).sum()

    def full_loss(q, k, v):
        return (multihead_attention(q, k, v, SCALE, force="einsum") * w).sum()

    g_ring = jax.grad(ring_loss, argnums=(0, 1, 2))(q, k, v)
    g_full = jax.grad(full_loss, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ring, g_full):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_ring_single_shard_degenerates_to_full(qkv):
    """S=1 ring (no ppermute) is exactly the flash recurrence run once."""
    q, k, v = qkv
    ref = multihead_attention(q, k, v, SCALE, force="einsum")
    mesh = get_mesh(1, axis_names=("seq",))
    out = ring_attention(q, k, v, SCALE, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6, rtol=1e-5)


def test_ring_bf16_inputs_keep_dtype(qkv):
    q, k, v = (x.astype(jnp.bfloat16) for x in qkv)
    mesh = get_mesh(8, axis_names=("seq",))
    out = ring_attention(q, k, v, SCALE, mesh)
    assert out.dtype == jnp.bfloat16
    ref = multihead_attention(q, k, v, SCALE, force="einsum")
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=3e-2, rtol=3e-2)


def test_ring_requires_divisible_length(qkv):
    q, k, v = qkv
    mesh = get_mesh(8, axis_names=("seq",))
    with pytest.raises(AssertionError):
        ring_attention(q[:, :30], k[:, :30], v[:, :30], SCALE, mesh)
