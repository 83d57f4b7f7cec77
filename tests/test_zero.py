"""ZeRO-1 optimizer-state sharding (parallel/zero.py): parity with plain
DP and real per-chip memory reduction, on the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from image_segmentation_lab_tpu.core.builder import build_optimizer
from image_segmentation_lab_tpu.models.builder import build_segmentor
from image_segmentation_lab_tpu.parallel import get_mesh, shard_batch
from image_segmentation_lab_tpu.parallel.zero import (make_zero1_train_step,
                                                      shard_state_zero1,
                                                      zero1_memory_fraction,
                                                      zero1_state_shardings)
from image_segmentation_lab_tpu.train_state import (create_train_state,
                                                    make_train_step)

pytestmark = pytest.mark.skipif(jax.device_count() < 4,
                                reason="needs >=4 virtual devices")


@pytest.fixture(scope="module")
def setup():
    norm = dict(type="SyncBatchNorm", requires_grad=True)
    cfg = dict(
        type="EncoderDecoder",
        backbone=dict(type="ResNetV1c", depth=18, num_stages=4,
                      out_indices=(0, 1, 2, 3), dilations=(1, 1, 2, 4),
                      strides=(1, 2, 1, 1), norm_cfg=norm,
                      base_channels=8, stem_channels=8),
        decode_head=dict(type="FCNHead", in_channels=64, in_index=3,
                         channels=16, num_convs=1, concat_input=False,
                         num_classes=2, norm_cfg=norm,
                         loss_decode=dict(type="CrossEntropyLoss")))
    model = build_segmentor(cfg)
    tx = build_optimizer(dict(type="AdamW", lr=1e-3, weight_decay=0.01))
    r = np.random.RandomState(0)
    img = jnp.asarray(r.randn(4, 32, 32, 3).astype(np.float32))
    gt = jnp.asarray(r.randint(0, 2, (4, 32, 32)).astype(np.int32))
    state = create_train_state(model, jax.random.PRNGKey(0), img[:1],
                               gt[:1], tx)
    return model, tx, img, gt, state


def test_zero1_shards_adam_moments(setup):
    model, tx, img, gt, state = setup
    mesh = get_mesh(4, axis_names=("data",))
    sh = zero1_state_shardings(state, mesh)
    specs = [s.spec for s in jax.tree_util.tree_leaves(sh.opt_state)]
    sharded = [s for s in specs if s != P()]
    assert sharded, "no optimizer leaf got sharded"
    # params stay replicated
    assert all(s.spec == P()
               for s in jax.tree_util.tree_leaves(sh.params))
    frac = zero1_memory_fraction(state, mesh)
    assert frac < 0.5, frac   # most moment bytes are sharded 4-way


def test_zero1_step_matches_plain_dp(setup):
    model, tx, img, gt, state = setup
    single = make_train_step(model, tx, donate=False)
    s1, lv1 = single(state, img, gt, jax.random.PRNGKey(5))

    mesh = get_mesh(4, axis_names=("data",))
    zstate = shard_state_zero1(state, mesh)
    step = make_zero1_train_step(model, tx, mesh, state, donate=False)
    simg, sgt = shard_batch((img, gt), mesh)
    s2, lv2 = step(zstate, simg, sgt, jax.random.PRNGKey(5))

    np.testing.assert_allclose(float(lv1["loss"]), float(lv2["loss"]),
                               rtol=1e-5)
    a = s1.params["decode_head"]["convs_0"]["conv"]["weight"]
    b = s2.params["decode_head"]["convs_0"]["conv"]["weight"]
    np.testing.assert_allclose(np.asarray(a),
                               np.asarray(jax.device_get(b)),
                               atol=1e-5, rtol=1e-4)
    # a second step keeps the sharded layout (out_shardings pin)
    s3, _ = step(s2, simg, sgt, jax.random.PRNGKey(6))
    leaf = jax.tree_util.tree_leaves(s3.opt_state)[1]
    assert not leaf.sharding.is_fully_replicated or leaf.ndim == 0
