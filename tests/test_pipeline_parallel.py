"""GPipe pipeline parallelism (parallel/pipeline.py): forward and
gradient parity with sequential execution on the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_segmentation_lab_tpu.models.backbones.vit import ViTBlock
from image_segmentation_lab_tpu.parallel import get_mesh
from image_segmentation_lab_tpu.parallel.pipeline import (gpipe, microbatch,
                                                          stack_stage_params)

pytestmark = pytest.mark.skipif(jax.device_count() < 4,
                                reason="needs >=4 virtual devices")

DIMS, HEADS, L = 16, 2, 8


@pytest.fixture(scope="module")
def trunk():
    block = ViTBlock(DIMS, HEADS)
    x0 = jnp.zeros((2, 6, DIMS))
    params = [block.init(jax.random.PRNGKey(i), x0)["params"]
              for i in range(L)]
    x = jnp.asarray(np.random.RandomState(0)
                    .randn(8, 6, DIMS).astype(np.float32))

    def block_fn(p, h):
        return block.apply({"params": p}, h)

    def sequential(params, x):
        for p in params:
            x = block_fn(p, x)
        return x

    return block_fn, params, x, sequential


@pytest.mark.parametrize("n_stages,n_micro", [(4, 4), (2, 8), (1, 2)])
def test_gpipe_forward_matches_sequential(trunk, n_stages, n_micro):
    block_fn, params, x, sequential = trunk
    ref = sequential(params, x)
    mesh = get_mesh(n_stages, axis_names=("pipe",))
    stacked = stack_stage_params(params, n_stages)
    xs = microbatch(x, n_micro)
    out = gpipe(block_fn, stacked, xs, mesh)
    np.testing.assert_allclose(
        np.asarray(out.reshape(x.shape)), np.asarray(ref),
        atol=2e-5, rtol=1e-4)


def test_gpipe_gradients_match_sequential(trunk):
    block_fn, params, x, sequential = trunk
    mesh = get_mesh(4, axis_names=("pipe",))
    stacked = stack_stage_params(params, 4)
    xs = microbatch(x, 4)

    def pp_loss(sp):
        return (gpipe(block_fn, sp, xs, mesh) ** 2).sum()

    def seq_loss(ps):
        return (sequential(ps, x) ** 2).sum()

    g_pp = jax.grad(pp_loss)(stacked)
    g_seq = stack_stage_params(jax.grad(seq_loss)(params), 4)
    flat_pp = jax.tree_util.tree_leaves(g_pp)
    flat_seq = jax.tree_util.tree_leaves(g_seq)
    assert len(flat_pp) == len(flat_seq)
    for a, b in zip(flat_pp, flat_seq):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-3)


def test_stack_stage_params_requires_divisibility(trunk):
    _, params, _, _ = trunk
    with pytest.raises(AssertionError):
        stack_stage_params(params, 3)
    with pytest.raises(AssertionError):
        microbatch(jnp.zeros((6, 2)), 4)
