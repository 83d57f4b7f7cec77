"""Training entry point.

CLI + config-format parity with reference ``train.py:26-167``: the same three
python-module configs (network/dataset/schedule), the same flags, the same
run-directory layout (``work_dir/project/exp{N}/{weights,config}``), the same
``last.pth``/``best.pth`` checkpoints with metadata, and the same composite
``fits`` model-selection score (train.py:145-146).

Flags the reference parses but never uses (``--device --load-from
--resume-from --auto-resume --no-validate --deterministic`` — SURVEY.md
§8.10) are honored here.  The loop body is TPU-native: one jitted train step
(bf16 policy instead of GradScaler), on-device augmentation, on-device
confusion-matrix eval.
"""

from __future__ import annotations

import argparse
import os
import sys
from datetime import datetime
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def parse_args():
    parser = argparse.ArgumentParser(description="Train a segmentor (TPU)")
    parser.add_argument("--network-cfg", type=Path,
                        default=Path("configs/network/deeplabv3/deeplabv3_r50-d8.py"))
    parser.add_argument("--dataset-cfg", type=Path,
                        default=Path("configs/dataset/KvasirSEG.py"))
    parser.add_argument("--schedule-cfg", type=Path,
                        default=Path("configs/schedule/kvasir_training_schedule.py"))
    parser.add_argument("--work-dir", type=Path, default=Path("runs"))
    parser.add_argument("--project", default="train")
    parser.add_argument("--name", default="exp")
    parser.add_argument("--device", default="",
                        help="'' = default platform (TPU if present), 'cpu'")
    parser.add_argument("--load-from", type=Path, default=None,
                        help="checkpoint to load weights from")
    parser.add_argument("--resume-from", type=Path, default=None,
                        help="checkpoint to resume training from")
    parser.add_argument("--auto-resume", action="store_true",
                        help="resume from last.pth in the run dir if present")
    parser.add_argument("--no-validate", action="store_true")
    parser.add_argument("--deterministic", action="store_true")
    parser.add_argument("--epochs", type=int, default=None,
                        help="override schedule epochs")
    parser.add_argument("--profile-dir", type=Path, default=None,
                        help="write a jax.profiler trace of epoch 0 here")
    parser.add_argument("--ema-decay", type=float, default=None,
                        help="maintain an EMA of the parameters (e.g. "
                             "0.999); validation and best.pth use the "
                             "smoothed weights, last.pth keeps the raw "
                             "weights (resume restarts the EMA)")
    parser.add_argument("--ckpt-backend", default="pickle",
                        choices=["pickle", "orbax", "orbax_async"],
                        help="checkpoint format; orbax_async overlaps "
                             "the write with the next epoch")
    parser.add_argument("--space-shards", type=int, default=1,
                        help="shard image height over a second mesh axis "
                             "('space') in addition to data parallelism: "
                             "a (devices/N, N) data×space mesh; per-chip "
                             "activation memory scales down with N "
                             "(augmentation then runs as its own "
                             "batch-sharded program ahead of the step)")
    parser.add_argument("--aug-shard-local", action="store_true",
                        help="multi-device only: run the fused aug "
                             "pipeline per-chip under shard_map (zero aug "
                             "ICI traffic; different-but-equivalent random "
                             "stream vs single-device)")
    parser.add_argument("--tp-shards", type=int, default=1,
                        help="Megatron-style tensor parallelism for the "
                             "transformer families: shard the qkv/fc "
                             "projections over a second mesh axis "
                             "('model') — a (devices/N, N) data×model "
                             "mesh; per-chip transformer weights and "
                             "activations scale down with N")
    parser.add_argument("--fsdp", action="store_true",
                        help="fully-sharded data parallelism (ZeRO-3): "
                             "every parameter and optimizer moment is "
                             "sharded over the data axis; per-chip param"
                             "+moment memory approaches 1/devices")
    parser.add_argument("--zero1", action="store_true",
                        help="ZeRO-1: shard the optimizer moments over "
                             "the data axis (params stay replicated); "
                             "for Adam this cuts per-chip state memory "
                             "~3x on large models")
    parser.add_argument("--local_rank", type=int, default=0)
    return parser.parse_args()


def main():
    args = parse_args()
    if str(args.device).lower() == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    if str(args.device).lower() == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from image_segmentation_lab_tpu.utils.compile_cache import \
        enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np

    import image_segmentation_lab_tpu  # noqa: F401
    from image_segmentation_lab_tpu.core import (DATASET, LR_SCHEDULER,
                                                 build_from_cfg,
                                                 build_optimizer)
    from image_segmentation_lab_tpu.core.dataset import DataLoader
    from image_segmentation_lab_tpu.core.evaluation import SegEvaluator
    from image_segmentation_lab_tpu.core.fileio import (
        increment_path, parse_and_backup_config, require_config_key)
    from image_segmentation_lab_tpu.core.initialize import (
        init_random_seed, load_checkpoint, set_random_seed)
    from image_segmentation_lab_tpu.core.mixed_precision import amp_policy
    from image_segmentation_lab_tpu.models.builder import build_segmentor
    from image_segmentation_lab_tpu.train_state import (create_train_state,
                                                        make_eval_step,
                                                        make_train_step)
    from image_segmentation_lab_tpu.utils.train_utils import (
        pth_metadata, save_model, train_one_epoch, validate_one_epoch)
    from tools.logger.metadata import get_environment_info

    # Step 1: run directory ------------------------------------------------
    save_dir = increment_path(work_dir=args.work_dir, project=args.project,
                              name=args.name)
    weights_dir, config_dir = save_dir / "weights", save_dir / "config"
    weights_dir.mkdir(parents=True, exist_ok=True)
    config_dir.mkdir(parents=True, exist_ok=True)
    last_pth, best_pth = weights_dir / "last.pth", weights_dir / "best.pth"

    # Step 2: configs ------------------------------------------------------
    metadata = dict(time=datetime.now().strftime("%Y-%m-%d %H:%M:%S"))
    metadata.update(get_environment_info())
    network_cfg = require_config_key(parse_and_backup_config(
        args.network_cfg, config_dir, metadata), "model", args.network_cfg)
    dataset_cfg = require_config_key(parse_and_backup_config(
        args.dataset_cfg, config_dir, metadata), "dataset", args.dataset_cfg)
    schedule_cfg = parse_and_backup_config(args.schedule_cfg, config_dir,
                                           metadata)

    # Step 3: seed + precision policy -------------------------------------
    seed = init_random_seed(seed=schedule_cfg.get("seed", 0),
                            device=args.device)
    metadata.update(seed=seed)
    root_key = set_random_seed(
        seed, deterministic=(args.deterministic
                             or schedule_cfg.get("deterministic", False)))
    amp_policy(bool(schedule_cfg.get("amp", False)))

    # Step 4: model --------------------------------------------------------
    model = build_segmentor(network_cfg)
    print(model)

    # Step 5: data ---------------------------------------------------------
    train_dataset = build_from_cfg(dataset_cfg["train"], DATASET)
    train_loader = DataLoader(train_dataset,
                              batch_size=schedule_cfg.get("train_batch_size", 8),
                              shuffle=schedule_cfg.get("shuffle", True),
                              num_workers=schedule_cfg.get("num_workers", 4),
                              collate_fn=train_dataset.collate_fn,
                              drop_last=True, seed=seed)
    val_dataset = build_from_cfg(dataset_cfg["val"], DATASET)
    val_loader = DataLoader(val_dataset,
                            batch_size=schedule_cfg.get("val_batch_size", 4),
                            shuffle=False,
                            num_workers=schedule_cfg.get("num_workers", 4),
                            collate_fn=val_dataset.collate_fn)
    metadata.update(CLASSES=train_dataset.CLASSES,
                    PALETTE=np.asarray(train_dataset.PALETTE).tolist())

    # Step 6: optimizer + compiled schedule --------------------------------
    epochs = args.epochs or schedule_cfg.get("epochs", 50)
    steps_per_epoch = max(len(train_loader), 1)
    optimizer_cfg = dict(schedule_cfg.get("optimizer",
                                          dict(type="SGD", lr=0.01)))
    if "lr" not in optimizer_cfg:
        raise SystemExit(
            f"schedule config {args.schedule_cfg}: the optimizer dict must "
            f"set `lr` (the LR schedule is compiled from it); got "
            f"{optimizer_cfg}")
    base_lr = optimizer_cfg.pop("lr")
    lr_cfg = schedule_cfg.get("lr_config")
    if lr_cfg:
        scheduler = build_from_cfg(lr_cfg, LR_SCHEDULER)
        lr = scheduler.schedule(base_lr, steps_per_epoch)
    else:
        scheduler, lr = None, base_lr
    tx = build_optimizer({**optimizer_cfg, "lr": lr})

    # Step 7: train state (+ load/resume) ----------------------------------
    hw = train_dataset.input_size_hw or (256, 256)
    sample_img = jnp.zeros((1, *hw, 3), jnp.float32)
    sample_gt = jnp.zeros((1, *hw), jnp.int32)
    state = create_train_state(model, root_key, sample_img, sample_gt, tx)
    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree_util.tree_leaves(state.params))
    print(f"model parameters: {n_params / 1e6:.2f}M")

    start_epoch = 0
    pretrained = network_cfg.get("pretrained")
    if pretrained:
        if "://" in str(pretrained) or not Path(str(pretrained)).is_file():
            raise SystemExit(
                f"pretrained='{pretrained}' is not a local checkpoint file. "
                f"Remote locators can't be downloaded here — convert the "
                f"torch checkpoint with tools/convert_torch_checkpoint.py "
                f"and point `pretrained` at the result.")
        variables, _ = load_checkpoint(state.variables(), pretrained)
        state = state.replace(params=variables.get("params", state.params),
                              frozen_params=variables.get(
                                  "frozen_params", state.frozen_params),
                              batch_stats=variables.get(
                                  "batch_stats", state.batch_stats))
    # config-driven init_cfg hooks (model- and backbone-level, incl.
    # Pretrained subtree loads) — the reference applies these in its
    # init_weights cascade; here they transform the params pytree once
    from image_segmentation_lab_tpu.core.initialize import (
        dump_init_info, get_init_info, initialize_from_network_cfg)
    init_cfg_view = dict(network_cfg)
    init_cfg_view.pop("pretrained", None)  # handled above as a full load
    state = state.replace(params=initialize_from_network_cfg(
        state.params, init_cfg_view, jax.random.fold_in(root_key, 7)))
    if get_init_info():  # per-param init provenance, as the reference's
        with open(save_dir / "init_info.log", "w") as f:  # init_weights dump
            dump_init_info(logger=lambda line: f.write(line + "\n"))
    resume_path = args.resume_from
    prior_best_pth = None
    resume_ema = None
    if args.auto_resume and resume_path is None:
        # each invocation allocates a fresh exp dir, so auto-resume looks
        # for the newest prior run of the same name with a last.pth
        import re as _re
        base = Path(args.work_dir) / args.project
        # increment_path only ever creates name, name2, name3, … — anchor
        # the match so 'exp' never resumes from a sibling 'exp_ablation'
        pat = _re.compile(_re.escape(args.name) + r"\d*$")
        candidates = sorted(
            (p for p in base.glob(f"{args.name}*") if pat.match(p.name)),
            key=lambda p: p.stat().st_mtime,
            reverse=True) if base.exists() else []
        for cand in candidates:
            # orbax backends save last.pth as a *directory* — accept both
            if cand != save_dir and (cand / "weights" / "last.pth").exists():
                resume_path = cand / "weights" / "last.pth"
                prior_best_pth = cand / "weights" / "best.pth"
                break
    if args.load_from is not None:
        variables, _ = load_checkpoint(state.variables(), args.load_from)
        state = state.replace(params=variables["params"],
                              frozen_params=variables.get("frozen_params", {}),
                              batch_stats=variables.get("batch_stats", {}))
    elif resume_path is not None and Path(resume_path).exists():
        variables, ckpt = load_checkpoint(state.variables(), resume_path)
        state = state.replace(params=variables["params"],
                              frozen_params=variables.get("frozen_params", {}),
                              batch_stats=variables.get("batch_stats", {}))
        ts = ckpt.get("train_state")
        if ts is not None:  # pickled pytree keeps the optax state structure
            state = state.replace(step=jnp.asarray(int(ts["step"])),
                                  opt_state=ts["opt_state"])
            resume_ema = ts.get("ema_params")  # continue the average
        start_epoch = int(ckpt.get("metadata", {}).get("epoch", -1)) + 1
        print(f"resumed from {resume_path} at epoch {start_epoch}")

    # Step 8: epoch loop ---------------------------------------------------
    # data parallelism: with >1 device the train step is pjit-sharded over a
    # ('data',) mesh — state replicated, batch split, gradient allreduce and
    # cross-replica BN statistics inserted by XLA (SURVEY.md §2.9)
    n_devices = jax.device_count()
    aug_pipeline = train_dataset.device_pipeline  # fused into the step
    modes_on = [name for name, on in (
        ("--space-shards", args.space_shards > 1),
        ("--tp-shards", args.tp_shards > 1),
        ("--fsdp", args.fsdp), ("--zero1", args.zero1)) if on]
    if len(modes_on) > 1:
        raise SystemExit(f"{' and '.join(modes_on)} cannot be combined — "
                         "pick one parallelism layout (each already "
                         "composes with data parallelism)")
    if modes_on and n_devices == 1:
        raise SystemExit(
            f"{modes_on[0]} needs more than one device (found 1) — the "
            "partitioning would silently be a no-op")
    if modes_on and modes_on[0] != "--space-shards" and args.aug_shard_local:
        raise SystemExit(
            f"--aug-shard-local is not supported with {modes_on[0]}: "
            "augmentation there runs as its own batch-sharded program "
            "ahead of the partitioned step")
    if args.space_shards > 1 and args.aug_shard_local:
        raise SystemExit(
            "--aug-shard-local is not supported with --space-shards: "
            "augmentation there runs as its own batch-sharded program "
            "ahead of the spatially partitioned step")
    # eval-path layout descriptors, overridden per branch below
    eval_state_shardings = None
    eval_no_flash = False
    if n_devices > 1 and args.space_shards > 1:
        # 2-D (data × space) mesh: batch over 'data' AND image height over
        # 'space' — per-chip activation memory scales down with the space
        # axis (XLA inserts the conv halo exchanges; parity pinned by
        # tests/test_parallel.py).  The aug pipeline cannot fuse into an
        # H-sharded step (its geometric gathers span the full height), so
        # it runs as its own batch-sharded program first, with the SAME
        # rng plan as the fused step (split → aug, dropout — the
        # fused==external equivalence of tests/test_neck_and_training.py).
        from image_segmentation_lab_tpu.parallel import (
            batch_sharding, get_mesh, make_spatial_sharded_train_step,
            replicate, replicated, shard_batch, shard_batch_spatial)
        if n_devices % args.space_shards:
            raise SystemExit(
                f"--space-shards {args.space_shards} must divide the "
                f"device count {n_devices}")
        data_shards = n_devices // args.space_shards
        mesh = get_mesh(axis_names=("data", "space"),
                        shape=(data_shards, args.space_shards))
        state = replicate(state, mesh)
        _step = make_spatial_sharded_train_step(model, tx, mesh)
        _aug = None
        if aug_pipeline is not None:
            _aug = jax.jit(
                aug_pipeline.batched_apply,
                in_shardings=(replicated(mesh), batch_sharding(mesh),
                              batch_sharding(mesh)),
                out_shardings=(batch_sharding(mesh), batch_sharding(mesh)))

        def train_step(state, img, gt, rng):
            # fail fast with a clear message instead of jax's device_put
            # divisibility error mid-step
            if img.shape[0] % data_shards or img.shape[1] % args.space_shards:
                raise SystemExit(
                    f"--space-shards {args.space_shards}: batch "
                    f"{img.shape[0]} must divide by {data_shards} (the "
                    f"data axis) and image height {img.shape[1]} by "
                    f"{args.space_shards} — adjust train_batch_size or "
                    "the pipeline's target size")
            if _aug is not None:
                aug_rng, rng = jax.random.split(rng)
                img, gt = shard_batch((img, gt), mesh)
                img, gt = _aug(aug_rng, img, gt)
            img, gt = shard_batch_spatial((img, gt), mesh)
            return _step(state, img, gt, rng)

        print(f"2-D data×space parallel over {n_devices} devices "
              f"(space={args.space_shards}): {mesh}")
    elif n_devices > 1 and args.tp_shards > 1:
        # 2-D (data × model) mesh: Megatron-style tensor parallelism for
        # the transformer projections (parallel/tensor.py) composed with
        # data parallelism over the remaining devices.  Attention keeps
        # the einsum path (heads are model-sharded; see
        # ops/attention.py::no_flash).  The fused aug pipeline runs as
        # its own batch-sharded program ahead of the step, same rng plan
        # as the fused step.
        from image_segmentation_lab_tpu.parallel import (
            batch_sharding, get_mesh, make_tp_train_step, replicated,
            shard_batch, shard_state_tp, tp_shardings)
        if n_devices % args.tp_shards:
            raise SystemExit(
                f"--tp-shards {args.tp_shards} must divide the device "
                f"count {n_devices}")
        data_shards = n_devices // args.tp_shards
        mesh = get_mesh(axis_names=("data", "model"),
                        shape=(data_shards, args.tp_shards))
        eval_state_shardings = tp_shardings(state, mesh)
        eval_no_flash = True
        state = shard_state_tp(state, mesh)
        _step = make_tp_train_step(model, tx, mesh, state)
        _aug = None
        if aug_pipeline is not None:
            _aug = jax.jit(
                aug_pipeline.batched_apply,
                in_shardings=(replicated(mesh), batch_sharding(mesh),
                              batch_sharding(mesh)),
                out_shardings=(batch_sharding(mesh), batch_sharding(mesh)))

        def train_step(state, img, gt, rng):
            if img.shape[0] % data_shards:
                raise SystemExit(
                    f"--tp-shards {args.tp_shards}: batch {img.shape[0]} "
                    f"must divide by {data_shards} (the data axis) — "
                    "adjust train_batch_size")
            if _aug is not None:
                aug_rng, rng = jax.random.split(rng)
                img, gt = shard_batch((img, gt), mesh)
                img, gt = _aug(aug_rng, img, gt)
            img, gt = shard_batch((img, gt), mesh)
            return _step(state, img, gt, rng)

        print(f"2-D data×model (tensor) parallel over {n_devices} devices "
              f"(tp={args.tp_shards}): {mesh}")
    elif n_devices > 1 and (args.fsdp or args.zero1):
        # parameter/optimizer-state sharding over the data axis:
        # --fsdp = ZeRO-3 (params + moments, parallel/fsdp.py),
        # --zero1 = moments only (parallel/zero.py).  Batch stays
        # data-sharded; numerics match plain DP up to f32 reduction
        # order.  The flash-attention kernel stays enabled (activations
        # are batch-sharded).  Fused aug runs ahead of the step.
        from image_segmentation_lab_tpu.parallel import (
            batch_sharding, fsdp_state_shardings, get_mesh,
            make_fsdp_train_step, make_zero1_train_step, replicated,
            shard_batch, shard_state_fsdp, shard_state_zero1,
            zero1_state_shardings)
        mesh = get_mesh()
        if args.fsdp:
            eval_state_shardings = fsdp_state_shardings(state, mesh)
            _step = make_fsdp_train_step(model, tx, mesh, state)
            state = shard_state_fsdp(state, mesh)
        else:
            eval_state_shardings = zero1_state_shardings(state, mesh)
            _step = make_zero1_train_step(model, tx, mesh, state)
            state = shard_state_zero1(state, mesh)
        _aug = None
        if aug_pipeline is not None:
            _aug = jax.jit(
                aug_pipeline.batched_apply,
                in_shardings=(replicated(mesh), batch_sharding(mesh),
                              batch_sharding(mesh)),
                out_shardings=(batch_sharding(mesh), batch_sharding(mesh)))

        def train_step(state, img, gt, rng):
            if img.shape[0] % n_devices:
                raise SystemExit(
                    f"{'--fsdp' if args.fsdp else '--zero1'}: batch "
                    f"{img.shape[0]} must divide by the device count "
                    f"{n_devices} — adjust train_batch_size")
            if _aug is not None:
                aug_rng, rng = jax.random.split(rng)
                img, gt = shard_batch((img, gt), mesh)
                img, gt = _aug(aug_rng, img, gt)
            img, gt = shard_batch((img, gt), mesh)
            return _step(state, img, gt, rng)

        print(f"{'FSDP (ZeRO-3)' if args.fsdp else 'ZeRO-1'} over "
              f"{n_devices} devices: {mesh}")
    elif n_devices > 1:
        from image_segmentation_lab_tpu.parallel import (
            get_mesh, make_sharded_train_step, replicate, shard_batch)
        mesh = get_mesh()
        state = replicate(state, mesh)
        _step = make_sharded_train_step(model, tx, mesh,
                                        pipeline=aug_pipeline,
                                        aug_shard_local=args.aug_shard_local)

        def train_step(state, img, gt, rng):
            img, gt = shard_batch((img, gt), mesh)
            return _step(state, img, gt, rng)

        print(f"data-parallel over {n_devices} devices: {mesh}")
    else:
        train_step = make_train_step(model, tx, pipeline=aug_pipeline)

    ema_params_fn = None
    if args.ema_decay is not None:
        from image_segmentation_lab_tpu.utils.ema import \
            wrap_train_step_with_ema
        train_step, ema_params_fn = wrap_train_step_with_ema(
            train_step, state.params, args.ema_decay, ema_init=resume_ema)
        print(f"EMA enabled (decay={args.ema_decay})"
              + (" — resumed EMA state" if resume_ema is not None else ""))
    # rescale eval logits to the uniform original size ONLY when the dataset
    # supplies original-resolution ground truth — otherwise metrics compare
    # at pipeline resolution against pipeline labels
    uniform_val = (val_dataset.ori_img_size
                   if getattr(val_dataset, "return_ori_seg_gt", False)
                   else None)
    if n_devices > 1:
        # data-parallel validation (each chip scores its batch shard);
        # with --space-shards the eval batch is sharded over BOTH axes so
        # per-chip eval activations scale down like the train step's;
        # with --tp-shards/--fsdp/--zero1 the state keeps its sharded
        # layout (eval_state_shardings); ragged tail batches fall back
        # to an unpinned step
        eval_sp = max(args.space_shards, 1)
        eval_axes = ("data", "space") if eval_sp > 1 else ("data",)
        eval_data_shards = n_devices // eval_sp // max(args.tp_shards, 1)
        _sharded_eval = make_eval_step(model, rescale_size=uniform_val,
                                       mesh=mesh, batch_axes=eval_axes,
                                       state_shardings=eval_state_shardings)
        _plain_eval = make_eval_step(model, rescale_size=uniform_val)
        if eval_no_flash:  # TP: heads are model-sharded — einsum attention
            from image_segmentation_lab_tpu.ops.attention import \
                without_flash
            _sharded_eval = without_flash(_sharded_eval)
            _plain_eval = without_flash(_plain_eval)

        def eval_step(state, img, gt):
            if (img.shape[0] % eval_data_shards == 0
                    and img.shape[1] % eval_sp == 0):
                return _sharded_eval(state, img, gt)
            return _plain_eval(state, img, gt)
    else:
        eval_step = make_eval_step(model, rescale_size=uniform_val)
    best_fits = float("inf")
    # resuming must not let a worse epoch clobber the prior run's best
    seed_best = prior_best_pth if prior_best_pth is not None else (
        Path(resume_path).parent / "best.pth" if resume_path else None)
    if seed_best is not None and Path(seed_best).exists():
        seed_best = Path(seed_best)
        meta_sidecar = seed_best / "metadata.pkl"  # orbax dir layout
        if meta_sidecar.is_file():  # skip restoring the arrays for one float
            import pickle
            with open(meta_sidecar, "rb") as f:
                meta = pickle.load(f)
        else:
            # _load_file reads both pickle checkpoints and orbax directories
            from image_segmentation_lab_tpu.core.initialize.checkpoint import \
                _load_file
            meta = _load_file(seed_best).get("metadata", {})
        best_fits = float(meta.get("fits", float("inf")))
        print(f"prior best fits={best_fits:.4f} (from {seed_best})")

    for epoch in range(start_epoch, epochs):
        profiling = args.profile_dir is not None and epoch == start_epoch
        if profiling:
            jax.profiler.start_trace(str(args.profile_dir))
        state, train_vars = train_one_epoch(
            epoch, train_step, state, train_loader,
            fused_aug=True,
            # epoch keys live under a dedicated fold so they can never
            # collide with the init-time folds of root_key (fold_in(·, 7)
            # for init_cfg, fold_in(·, 1) for init dropout)
            base_rng=jax.random.fold_in(
                jax.random.fold_in(root_key, 0x7261696e), epoch))
        if profiling:
            jax.tree_util.tree_map(
                lambda x: x.block_until_ready(), state.params)
            jax.profiler.stop_trace()
            print(f"profiler trace written to {args.profile_dir}")
        lr_now = (scheduler.lr_at_epoch(epoch, base_lr) if scheduler
                  else base_lr)
        print(f"epoch {epoch}: " +
              " ".join(f"{k}={v:.4f}" for k, v in train_vars.items()) +
              f" lr={float(lr_now):.6f}")

        val_vars, val_metrics = {}, {}
        fits = train_vars.get("loss", 0.0)
        # validation + model selection run on the smoothed weights when
        # EMA is on; last.pth below keeps the raw weights for resume
        eval_state = (state.replace(params=ema_params_fn())
                      if ema_params_fn else state)
        if not args.no_validate:
            evaluator = SegEvaluator(
                epoch,
                num_classes=val_dataset.num_classes,
                class_names=val_dataset.CLASSES,
                palette=val_dataset.PALETTE,
                ignore_index=(val_dataset.ignore_index
                              if val_dataset.ignore_index is not None else 255),
                output_dir=str(save_dir / "pred_results"))
            val_vars, val_metrics = validate_one_epoch(
                epoch, eval_step, eval_state, val_loader, evaluator,
                pipeline=val_dataset.device_pipeline)
            print(f"epoch {epoch} val: " +
                  " ".join(f"{k}={v:.4f}" for k, v in val_vars.items()))
            # composite model-selection score (reference train.py:145-146),
            # made head-optional (SURVEY.md §8.11)
            fits = train_vars.get("loss", 0.0) + val_vars.get("loss", 0.0)
            for head in ("decode", "aux"):
                miou = val_metrics.get(head, {}).get("mIoU")
                if miou is not None:
                    fits += 1.0 - float(miou) / 100.0

        meta = pth_metadata(metadata, epoch, fits, train_vars, val_vars,
                            val_metrics)
        save_model(state, meta, last_pth, include_train_state=True,
                   backend=args.ckpt_backend,
                   ema_params=ema_params_fn() if ema_params_fn else None)
        if fits < best_fits:
            best_fits = fits
            save_model(eval_state, meta, best_pth, include_train_state=True,
                       backend=args.ckpt_backend)
            print(f"epoch {epoch}: new best fits={fits:.4f} → {best_pth}")
    if args.ckpt_backend == "orbax_async":
        from image_segmentation_lab_tpu.core.initialize import \
            wait_for_async_save
        wait_for_async_save()
    print(f"done. best fits={best_fits:.4f}; checkpoints in {weights_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
