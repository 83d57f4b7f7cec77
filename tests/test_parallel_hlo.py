"""Pin the COMMUNICATION STRUCTURE of every parallel mode in compiled HLO.

The parity tests (`test_parallel.py`, `test_tensor_parallel.py`,
`test_fsdp.py`, `test_zero.py`, `test_moe.py`) prove loss/param equality
with single-device execution — but loss parity also passes under full
replication.  On a machine with no real multi-chip hardware, the
compiled HLO is the only ground truth for what a sharding annotation
actually bought (VERDICT r4 item 3), so this file asserts, per mode:

* the expected collectives are present (TP's two per-block psums over
  the model axis, spatial's halo collective-permutes, FSDP's per-layer
  parameter all-gathers, ZeRO-1's post-update param all-gathers, EP's
  expert-axis combine psum, GPipe/ring's ppermutes), with their replica
  groups on the RIGHT mesh axis;
* forbidden collectives are absent (DP moves no tensors besides
  reductions; TP never all-gathers activations — the einsum path's
  whole point, ops/attention.py:48-66);
* parameter buffers are PHYSICALLY sharded: the ENTRY computation of
  the per-device program must show the divided shapes (a silently
  replicated layout shows full shapes here no matter what the
  annotations said).

Backend note: XLA:CPU lowers GSPMD reduce-scatters to all-reduce +
slice, so FSDP/ZeRO signatures are asserted via their all-gather
structure (vs plain DP's zero all-gathers on the same model/optimizer),
not via a literal reduce-scatter op.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_segmentation_lab_tpu.core.builder import build_optimizer
from image_segmentation_lab_tpu.models.builder import build_segmentor
from image_segmentation_lab_tpu.parallel import (
    get_mesh, make_ep_train_step, make_fsdp_train_step,
    make_sharded_train_step, make_spatial_sharded_train_step,
    make_tp_train_step, make_zero1_train_step)
from image_segmentation_lab_tpu.parallel.fsdp import fsdp_state_shardings
from image_segmentation_lab_tpu.parallel.zero import zero1_state_shardings
from image_segmentation_lab_tpu.train_state import create_train_state

pytestmark = pytest.mark.skipif(jax.device_count() < 8,
                                reason="needs 8 virtual devices")

COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
               "collective-permute", "all-to-all")


# --------------------------------------------------------------- helpers
def compiled_text(jitted, *args):
    return jitted.lower(*args).compile().as_text()


def collective_lines(txt, kind):
    """HLO lines computing a ``kind`` collective (start-form included)."""
    rx = re.compile(rf"= \S+ {kind}(?:-start)?\(")
    return [l.strip() for l in txt.splitlines() if rx.search(l)]


def counts(txt):
    return {c: len(collective_lines(txt, c)) for c in COLLECTIVES}


def parse_groups(line):
    """Replica groups of one collective line as a set of frozensets.

    Handles the iota form ``[G,S]<=[n]`` / ``[G,S]<=[a,b]T(p)`` and the
    explicit ``{{0,1},{2,3}}`` form.
    """
    m = re.search(r"replica_groups=\[(\d+),(\d+)\]<=\[([\d,]+)\]"
                  r"(?:T\(([\d,]+)\))?", line)
    if m:
        g, s = int(m.group(1)), int(m.group(2))
        src = [int(x) for x in m.group(3).split(",")]
        ids = np.arange(int(np.prod(src))).reshape(src)
        if m.group(4):
            ids = ids.transpose([int(x) for x in m.group(4).split(",")])
        ids = ids.reshape(g, s)
        return {frozenset(int(x) for x in row) for row in ids}
    m = re.search(r"replica_groups=\{(\{[^=]*\})\}", line)
    if m:
        return {frozenset(int(x) for x in grp.split(","))
                for grp in re.findall(r"\{([\d,]+)\}", m.group(1))}
    return None


def axis_groups(mesh, axis):
    """Expected replica groups for a reduction over ``axis``."""
    ids = np.array([[d.id for d in row] for row in
                    np.atleast_2d(mesh.devices)]).reshape(mesh.devices.shape)
    moved = np.moveaxis(ids, list(mesh.axis_names).index(axis), -1)
    return {frozenset(int(x) for x in row)
            for row in moved.reshape(-1, mesh.shape[axis])}


def permute_pairs(line):
    m = re.search(r"source_target_pairs=(\{(?:\{\d+,\d+\},?)+\})", line)
    if not m:
        return set()
    return {tuple(int(x) for x in p.split(","))
            for p in re.findall(r"\{(\d+,\d+)\}", m.group(1))}


def entry_param_shapes(txt):
    """Per-device buffer shapes of the ENTRY computation parameters."""
    m = re.search(r"ENTRY [^\n]*\((.*?)\) ->", txt, re.S)
    assert m, "no ENTRY computation found"
    return re.findall(r"(?:f32|bf16|s32|u32|pred)\[[\d,]*\]", m.group(1))


# ------------------------------------------------------------- fixtures
def cnn_cfg():
    norm = dict(type="SyncBatchNorm", requires_grad=True)
    return dict(
        type="EncoderDecoder",
        backbone=dict(type="ResNet", depth=18, num_stages=2,
                      strides=(1, 2), dilations=(1, 1), out_indices=(0, 1),
                      norm_cfg=norm),
        decode_head=dict(type="FCNHead", in_channels=128, in_index=1,
                         channels=16, num_convs=1, concat_input=False,
                         num_classes=2, dropout_ratio=0, norm_cfg=norm,
                         loss_decode=dict(type="CrossEntropyLoss")),
        test_cfg=dict(mode="whole"))


def vit_cfg():
    return dict(
        type="EncoderDecoder",
        backbone=dict(type="VisionTransformer", arch="tiny", embed_dims=32,
                      num_layers=2, num_heads=2, patch_size=8,
                      pretrain_img_size=32, out_indices=(0, 1),
                      final_norm=True),
        decode_head=dict(type="FCNHead", in_channels=32, in_index=1,
                         channels=16, num_convs=1, concat_input=False,
                         num_classes=2, norm_cfg=dict(type="BN"),
                         loss_decode=dict(type="CrossEntropyLoss")),
        test_cfg=dict(mode="whole"))


@pytest.fixture(scope="module")
def cnn_setup():
    model = build_segmentor(cnn_cfg())
    tx = build_optimizer(dict(type="SGD", lr=0.1, momentum=0.9))
    r = np.random.RandomState(0)
    img = jnp.asarray(r.randn(8, 32, 32, 3).astype(np.float32))
    gt = jnp.asarray(r.randint(0, 2, (8, 32, 32)).astype(np.int32))
    state = create_train_state(model, jax.random.PRNGKey(0), img[:1],
                               gt[:1], tx)
    return model, tx, img, gt, state


@pytest.fixture(scope="module")
def dp_text(cnn_setup):
    model, tx, img, gt, state = cnn_setup
    mesh = get_mesh(8)
    step = make_sharded_train_step(model, tx, mesh, donate=False)
    return compiled_text(step, state, img, gt, jax.random.PRNGKey(0))


# ----------------------------------------------------------------- tests
def test_dp_signature(dp_text, cnn_setup):
    """DP: gradient/SyncBN all-reduces ONLY — no gathers, no permutes —
    and the batch physically split 8 ways (per-device batch dim 1)."""
    c = counts(dp_text)
    assert c["all-reduce"] > 0
    assert c["all-gather"] == 0
    assert c["collective-permute"] == 0
    assert c["all-to-all"] == 0
    # the image input buffer is the 1/8 shard, not the full batch
    assert "f32[1,32,32,3]" in entry_param_shapes(dp_text)


def test_spatial_halo_signature(cnn_setup):
    """data×space: the conv halo exchanges appear as collective-permutes
    BETWEEN space-axis neighbors, in both directions (top + bottom
    halos); reductions still present (SyncBN/loss psums)."""
    model, tx, img, gt, state = cnn_setup
    mesh = get_mesh(8, axis_names=("data", "space"), shape=(4, 2))
    step = make_spatial_sharded_train_step(model, tx, mesh, donate=False)
    txt = compiled_text(step, state, img, gt, jax.random.PRNGKey(0))
    lines = collective_lines(txt, "collective-permute")
    assert lines, "no halo exchanges — H is not really sharded"
    # space-axis neighbors on the (4,2) mesh: (0,1),(2,3),(4,5),(6,7)
    space_pairs = {(0, 1), (2, 3), (4, 5), (6, 7)}
    fwd = set()
    bwd = set()
    for l in lines:
        for (s, t) in permute_pairs(l):
            assert {tuple(sorted((s, t)))} <= {
                tuple(sorted(p)) for p in space_pairs}, (
                f"halo permute crosses a non-space edge: {(s, t)}")
            (fwd if s < t else bwd).add((s, t))
    assert fwd and bwd, "halos must flow both directions (top+bottom rows)"
    assert counts(txt)["all-reduce"] > 0
    # per-device image buffer: batch 8/4, height 32/2
    assert "f32[2,16,32,3]" in entry_param_shapes(txt)


def test_tp_megatron_signature():
    """TP: exactly two activation psums per block per direction over the
    MODEL axis (Megatron's schedule, parallel/tensor.py docstring), ZERO
    all-gathers (the einsum path never gathers tokens or heads), and the
    projection buffers physically halved."""
    model = build_segmentor(vit_cfg())
    tx = build_optimizer(dict(type="SGD", lr=0.05, momentum=0.9))
    r = np.random.RandomState(0)
    img = jnp.asarray(r.randn(8, 32, 32, 3).astype(np.float32))
    gt = jnp.asarray(r.randint(0, 2, (8, 32, 32)).astype(np.int32))
    state = create_train_state(model, jax.random.PRNGKey(0), img[:1],
                               gt[:1], tx)
    mesh = get_mesh(4, axis_names=("data", "model"), shape=(2, 2))
    step = make_tp_train_step(model, tx, mesh, state, donate=False)
    txt = compiled_text(step, state, img, gt, jax.random.PRNGKey(0))

    assert counts(txt)["all-gather"] == 0, \
        "TP must not all-gather activations (or params)"

    model_groups = axis_groups(mesh, "model")
    # activation psums: (batch-shard 4, 17 tokens, 32 channels) over the
    # model axis — 2 per block forward (attn out-proj + fc2 partial sums)
    # and 2 per block in the transpose (backward) pass
    act = [l for l in collective_lines(txt, "all-reduce")
           if "f32[4,17,32]" in l and parse_groups(l) == model_groups]
    n_blocks = 2
    fwd = [l for l in act if "transpose" not in l]
    bwd = [l for l in act if "transpose" in l]
    assert len(fwd) == 2 * n_blocks, \
        f"expected 2 forward psums/block, got {len(fwd)}: {fwd}"
    assert len(bwd) == 2 * n_blocks, \
        f"expected 2 backward psums/block, got {len(bwd)}"

    # physically sharded projections: qkv (32,96)->(32,48) col,
    # fc2 (64,32)->(32,32) row, attn proj (32,32)->(16,32) row
    shapes = entry_param_shapes(txt)
    assert "f32[32,48]" in shapes, "qkv weight buffer is not model-sharded"
    assert "f32[16,32]" in shapes, "attn proj buffer is not row-sharded"
    # grad reduces for replicated params ride the DATA axis
    data_groups = axis_groups(mesh, "data")
    assert any(parse_groups(l) == data_groups
               for l in collective_lines(txt, "all-reduce")), \
        "no data-axis gradient all-reduce found"


def test_fsdp_gather_signature(cnn_setup, dp_text):
    """FSDP: every sharded parameter leaf is all-gathered at its use
    point (>= one all-gather per sharded param leaf, fwd; plain DP on
    the same model has ZERO), buffers physically sharded.  XLA:CPU
    lowers the grad reduce-scatters to all-reduce+slice, so the gather
    structure (vs DP) is the asserted signature."""
    model, tx, img, gt, state = cnn_setup
    mesh = get_mesh(8)
    step = make_fsdp_train_step(model, tx, mesh, state, donate=False)
    txt = compiled_text(step, state, img, gt, jax.random.PRNGKey(0))

    from jax.sharding import PartitionSpec as P
    sh = fsdp_state_shardings(state, mesh)
    n_sharded = sum(1 for s in jax.tree_util.tree_leaves(sh.params)
                    if s.spec != P())
    assert n_sharded > 10  # R18-2stage: every conv kernel + BN vectors
    c = counts(txt)
    assert c["all-gather"] >= n_sharded, (
        f"{c['all-gather']} all-gathers for {n_sharded} sharded param "
        "leaves — params are not being gathered per-use (replicated?)")
    assert counts(dp_text)["all-gather"] == 0  # the distinguishing null
    # spot-check a physically sharded kernel buffer: stage-2 3x3 conv
    # (3,3,128,128) shards its largest dim /8 -> (3,3,16,128)
    assert "f32[3,3,16,128]" in entry_param_shapes(txt)
    assert "f32[3,3,128,128]" not in entry_param_shapes(txt)


def test_zero1_gather_signature(cnn_setup, dp_text):
    """ZeRO-1: the optimizer math runs on shards — the updated params
    come back via all-gathers (>= one per sharded moment leaf); plain DP
    with the same optimizer has zero.  Param/input buffers stay
    replicated (full shapes) — only the MOMENTS shard."""
    model, tx, img, gt, state = cnn_setup
    mesh = get_mesh(8)
    step = make_zero1_train_step(model, tx, mesh, state, donate=False)
    txt = compiled_text(step, state, img, gt, jax.random.PRNGKey(0))

    from jax.sharding import PartitionSpec as P
    sh = zero1_state_shardings(state, mesh)
    n_sharded = sum(1 for s in jax.tree_util.tree_leaves(sh.opt_state)
                    if s.spec != P())
    assert n_sharded > 10
    assert counts(txt)["all-gather"] >= n_sharded, \
        "updated params are not all-gathered from optimizer shards"
    assert counts(dp_text)["all-gather"] == 0
    shapes = entry_param_shapes(txt)
    # params replicated (full kernel present), moment sharded (1/8 buffer)
    assert "f32[3,3,128,128]" in shapes
    assert "f32[3,3,16,128]" in shapes


def test_ep_expert_axis_psum():
    """EP: the combine einsum's contraction over experts becomes a psum
    over the EXPERT axis (the all-to-all-free dense-dispatch
    formulation, parallel/expert.py), and the expert stacks are
    physically split along dim 0."""
    cfg = dict(
        type="EncoderDecoder",
        backbone=dict(type="VisionTransformer", arch="tiny", embed_dims=16,
                      num_layers=2, num_heads=2, patch_size=8,
                      pretrain_img_size=32, out_indices=(1,),
                      final_norm=True, num_experts=4, moe_layers=(1,)),
        decode_head=dict(type="FCNHead", in_channels=16, in_index=0,
                         channels=8, num_convs=1, concat_input=False,
                         num_classes=2, norm_cfg=dict(type="BN"),
                         loss_decode=dict(type="CrossEntropyLoss")))
    model = build_segmentor(cfg)
    tx = build_optimizer(dict(type="AdamW", lr=1e-3, weight_decay=0.01))
    r = np.random.RandomState(0)
    img = jnp.asarray(r.randn(4, 32, 32, 3).astype(np.float32))
    gt = jnp.asarray(r.randint(0, 2, (4, 32, 32)).astype(np.int32))
    state = create_train_state(model, jax.random.PRNGKey(0), img[:1],
                               gt[:1], tx)
    mesh = get_mesh(4, axis_names=("data", "expert"), shape=(2, 2))
    step = make_ep_train_step(model, tx, mesh, state, donate=False)
    txt = compiled_text(step, state, img, gt, jax.random.PRNGKey(0))

    expert_groups = axis_groups(mesh, "expert")
    assert any(parse_groups(l) == expert_groups
               for l in collective_lines(txt, "all-reduce")), \
        "no expert-axis psum — the combine contraction is not sharded"
    # the expert stack buffers are physically split along dim 0 (E/2)
    w1 = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map_with_path(
            lambda p, x: x if "w1" in "/".join(str(k) for k in p) else None,
            state.params, is_leaf=lambda x: x is None))
    w1_shape = [x.shape for x in w1 if x is not None][0]
    sharded = "f32[" + ",".join(
        str(d) for d in (w1_shape[0] // 2,) + tuple(w1_shape[1:])) + "]"
    full = "f32[" + ",".join(str(d) for d in w1_shape) + "]"
    shapes = entry_param_shapes(txt)
    assert sharded in shapes, (sharded, shapes)
    assert full not in shapes


def test_gpipe_ppermute_chain():
    """GPipe: the tick loop shifts activations stage i -> i+1 via
    ppermute (the left-to-right pipeline edge set) and broadcasts the
    last stage's outputs with one psum."""
    from image_segmentation_lab_tpu.parallel.pipeline import (
        gpipe, microbatch, stack_stage_params)
    mesh = get_mesh(4, axis_names=("pipe",))
    r = np.random.RandomState(0)
    blocks = [dict(w=jnp.asarray(r.randn(8, 8).astype(np.float32)))
              for _ in range(4)]
    sp = stack_stage_params(blocks, 4)
    xs = microbatch(jnp.asarray(r.randn(8, 8).astype(np.float32)), 4)
    f = jax.jit(lambda p, x: gpipe(
        lambda pp, h: jnp.tanh(h @ pp["w"]), p, x, mesh))
    txt = compiled_text(f, sp, xs)
    lines = collective_lines(txt, "collective-permute")
    assert lines
    pairs = set().union(*(permute_pairs(l) for l in lines))
    assert pairs == {(0, 1), (1, 2), (2, 3)}, pairs  # no wraparound
    assert counts(txt)["all-reduce"] >= 1  # last-stage psum broadcast


def test_ring_attention_ring_permutes():
    """Ring attention: K and V stream around the FULL ring (wraparound
    edge included) — one ppermute each; no all-gather of the token dim
    (the entire point of the construction)."""
    from image_segmentation_lab_tpu.parallel.ring import ring_attention
    mesh = get_mesh(4, axis_names=("seq",))
    r = np.random.RandomState(0)
    q = jnp.asarray(r.randn(2, 16, 2, 4).astype(np.float32))
    f = jax.jit(lambda q, k, v: ring_attention(q, k, v, 0.5, mesh))
    txt = compiled_text(f, q, q, q)
    lines = collective_lines(txt, "collective-permute")
    assert len(lines) == 2, "expected exactly K-stream + V-stream shifts"
    ring = {(0, 1), (1, 2), (2, 3), (3, 0)}
    for l in lines:
        assert permute_pairs(l) == ring, permute_pairs(l)
    assert counts(txt)["all-gather"] == 0
    # per-device q buffer holds L/4 = 4 tokens
    assert "f32[2,4,2,4]" in entry_param_shapes(txt)
