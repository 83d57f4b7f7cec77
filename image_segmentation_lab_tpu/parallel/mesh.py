"""Device mesh + sharded training utilities.

TPU-native replacement for the reference's torch.distributed layer
(core/mixed_precision/dist_utils.py — NCCL process groups, DDP wrapping,
coalesced allreduce: SURVEY.md §2.9).  Here parallelism is declarative:

* ``get_mesh()`` builds a ``jax.sharding.Mesh`` over the local devices —
  default a 1-D ``('data',)`` mesh (data parallelism over ICI, the only
  parallelism the reference's CNNs need; batch dim >> model size);
* ``shard_batch`` places host batches with the leading axis split over
  ``data``; ``replicate`` fully replicates a pytree (params/state);
* ``make_sharded_train_step`` jits the train step with those shardings.
  XLA inserts the gradient all-reduce automatically, and because BatchNorm
  statistics are means over the (globally sharded) batch axis, cross-replica
  SyncBN falls out with no extra code — the collectives ride ICI.

The reference's hand-written allreduce bucketing (dist_utils.py:169-188) is
intentionally dropped: XLA fuses and schedules collectives itself.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(n_devices: Optional[int] = None,
             axis_names: Sequence[str] = ("data",),
             shape: Optional[Tuple[int, ...]] = None) -> Mesh:
    """Build a mesh over local devices.

    1-D ``('data',)`` by default; pass ``shape``/``axis_names`` for
    multi-axis layouts (e.g. ``(('data','space'), (4,2))`` for spatially
    sharded slide inference).
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if shape is None:
        shape = (len(devices),)
    assert int(np.prod(shape)) == len(devices), (shape, len(devices))
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Device_put arrays with the leading dim split over the mesh axis."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, replicated(mesh))


def make_sharded_train_step(model, tx, mesh: Mesh, axis: str = "data",
                            donate: bool = True, pipeline=None,
                            aug_shard_local: bool = False):
    """Data-parallel train step over ``mesh``.

    Exactly the shared ``train_state.build_train_step_fn`` body; the
    shardings turn it into an SPMD program: batch split over ``axis``, state
    replicated, gradients all-reduced by XLA.

    With a fused ``pipeline``, two placements for its stratified-OneOf
    batch permutations:

    * default (``aug_shard_local=False``): the permutation is GLOBAL — the
      aug stream is bit-identical to the single-device fused step (the
      DP==single invariant the tests pin), at the cost of GSPMD resharding
      the image batch across chips for each stratified node (~batch-size
      bytes of ICI traffic per node per step);
    * ``aug_shard_local=True``: the pipeline runs under ``shard_map``, each
      chip stratifying its LOCAL sub-batch with a shard-decorrelated key —
      zero aug communication, same per-image marginals (quantized on the
      per-chip batch), but a different (equally valid) random stream than
      single-device execution.  Use for production multi-chip throughput.
    """
    from ..train_state import build_train_step_fn

    rep = replicated(mesh)
    data = batch_sharding(mesh, axis)
    if pipeline is not None and aug_shard_local:
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec

        base_step = build_train_step_fn(model, tx, None)
        pspec = PartitionSpec(axis)

        def aug_local(key, img, gt):
            # decorrelate the per-chip aug streams
            key = jax.random.fold_in(key, jax.lax.axis_index(axis))
            return pipeline.batched_apply(key, img, gt)

        aug = shard_map(aug_local, mesh=mesh,
                        in_specs=(PartitionSpec(), pspec, pspec),
                        out_specs=(pspec, pspec))

        def train_step(state, img, gt, rng):
            aug_rng, step_rng = jax.random.split(rng)
            img, gt = aug(aug_rng, img, gt)
            return base_step(state, img, gt, step_rng)
    else:
        train_step = build_train_step_fn(model, tx, pipeline)
    # the flash-attention kernel stays ENABLED here: its
    # custom_partitioning rule runs one kernel per batch shard with zero
    # attention communication (ops/pallas/flash_attention.py)
    return jax.jit(
        train_step,
        in_shardings=(rep, data, data, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,) if donate else ())


def spatial_sharding(mesh: Mesh, data_axis: str = "data",
                     space_axis: str = "space") -> NamedSharding:
    """(N, H, ...) arrays split over BOTH mesh axes: batch over
    ``data_axis``, image rows over ``space_axis``."""
    return NamedSharding(mesh, P(data_axis, space_axis))


def shard_batch_spatial(batch, mesh: Mesh, data_axis: str = "data",
                        space_axis: str = "space"):
    """Device_put (img, gt, ...) with dim 0 split over ``data_axis`` and
    dim 1 (image height) split over ``space_axis``."""
    sharding = spatial_sharding(mesh, data_axis, space_axis)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def make_spatial_sharded_train_step(model, tx, mesh: Mesh,
                                    data_axis: str = "data",
                                    space_axis: str = "space",
                                    donate: bool = True):
    """2-D (data × space) SPMD train step: batch over ``data_axis`` AND
    image height over ``space_axis``.

    Beyond-reference capability (the reference's DDP shards batches only,
    SURVEY.md §2.9): with H sharded, each chip holds ``1/space`` of every
    activation map, so per-chip activation memory scales down with the mesh
    — training resolutions whose activations exceed one chip's HBM becomes
    possible.  No hand-written halo code: XLA's SPMD partitioner inserts
    the conv halo exchanges (collective-permutes of the kernel-overlap rows
    over ICI) and turns every spatial reduction — BatchNorm's (N,H,W)
    statistics, global pooling, the loss mean — into partial sums + psum,
    so SyncBN and loss semantics are *identical* to single-device
    execution (pinned by ``tests/test_parallel.py``).

    The fused aug pipeline is deliberately not accepted here: its geometric
    transforms gather pixels across the full H extent, which under an
    H-sharding degenerates into per-op reshards.  Augment on the host or
    use the 1-D DP step (``make_sharded_train_step``) when fusing aug.
    """
    from ..ops.attention import without_flash
    from ..train_state import build_train_step_fn

    rep = replicated(mesh)
    data = spatial_sharding(mesh, data_axis, space_axis)
    # einsum attention here: under an H-sharding the token dim is the
    # sharded one, and the flash kernel's dim-0-only partition rule
    # would all-gather it (see ops/attention.py::no_flash)
    return jax.jit(
        without_flash(build_train_step_fn(model, tx, None)),
        in_shardings=(rep, data, data, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,) if donate else ())


def make_spatial_sharded_eval_step(model, mesh: Mesh,
                                   data_axis: str = "data",
                                   space_axis: str = "space"):
    """2-D (data × space) inference: probabilities for a batch sharded over
    both axes (whole-image mode; the window-sharded slide path in
    ``parallel/slide.py`` covers slide mode)."""
    rep = replicated(mesh)
    data = spatial_sharding(mesh, data_axis, space_axis)

    # einsum attention: the H-sharding makes tokens the sharded dim
    # (see ops/attention.py::no_flash)
    from ..ops.attention import without_flash

    def eval_step(variables, img):
        return model.apply(variables, img, method="inference")

    return jax.jit(without_flash(eval_step), in_shardings=(rep, data),
                   out_shardings=data)


def make_sharded_eval_step(model, mesh: Mesh, axis: str = "data"):
    """Data-parallel inference step: probabilities for a sharded batch."""
    rep = replicated(mesh)
    data = batch_sharding(mesh, axis)

    def eval_step(variables, img):
        return model.apply(variables, img, method="inference")

    return jax.jit(eval_step, in_shardings=(rep, data),
                   out_shardings=data)


def make_sharded_metric_eval_step(model, mesh: Mesh, num_classes: int,
                                  ignore_index: int = 255,
                                  axis: str = "data"):
    """Data-parallel eval with cross-device confusion-matrix accumulation.

    Each chip scores its batch shard and histograms it on device; the
    per-class (intersect, pred-area, label-area) vectors are summed across
    the mesh — the replicated out-sharding makes XLA insert the psum.  The
    multi-chip analog of the reference's eval loop + ``SegEvaluator``
    accumulation (reference utils/train_utils.py:106-137).
    """
    from ..ops.pallas.confusion import confusion_histograms

    rep = replicated(mesh)
    data = batch_sharding(mesh, axis)

    def eval_step(variables, img, gt):
        probs = model.apply(variables, img, method="inference")
        # force the jnp one-hot path: a Mosaic (Pallas) kernel cannot be
        # automatically partitioned inside a multi-device jit (jax raises
        # NotImplementedError at lowering, tpu_custom_call.py) — and the
        # auto regime would pick Pallas exactly in the large-input
        # multi-chip case this step exists for.  The jnp per-shard
        # partial sums + psum are what SPMD wants anyway.
        return confusion_histograms(probs, gt, num_classes, ignore_index,
                                    force="jnp")

    return jax.jit(eval_step, in_shardings=(rep, data, data),
                   out_shardings=rep)
