"""Checkpoint save/load.

Parity target: reference ``core/initialize/checkpoint.py:10-223`` and
``utils/train_utils.py:140-165``: checkpoints are a single file holding
``{'metadata': {...}, 'state_dict': {dotted.name: array}}``; loading reports
missing/unexpected keys, applies ``revise_keys`` regex renames (default
strips a leading ``module.``), and supports prefix-filtered partial loads.

TPU-native redesign: the "state_dict" flattens **all** linen variable
collections (``params``, ``frozen_params``, ``batch_stats``) into dotted
paths of numpy arrays, so a checkpoint is framework-agnostic plain data.
For full resume the train step's optimizer state is stored under an
additional ``train_state`` key (the reference never wired resume —
SURVEY.md §8.10 — this implements the intended capability).
"""

from __future__ import annotations

import pickle
import re
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np


def state_dict_from_variables(variables) -> Dict[str, np.ndarray]:
    """Flatten variable collections into a dotted-name → numpy dict."""
    out: Dict[str, np.ndarray] = {}
    for col, tree in variables.items():
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        for path, leaf in flat:
            keys = [str(getattr(p, "key", p)) for p in path]
            name = ".".join(keys)
            if name in out:
                raise KeyError(f"duplicate state_dict key {name} (collection {col})")
            out[name] = np.asarray(jax.device_get(leaf))
    return out


def load_state_dict(variables, state_dict: Dict[str, np.ndarray],
                    strict: bool = False, logger=print):
    """Copy ``state_dict`` arrays into a variables pytree.

    Returns ``(new_variables, missing_keys, unexpected_keys)`` and prints a
    report like reference checkpoint.py:10-77 (rank-0 only).
    """
    remaining = dict(state_dict)
    missing: List[str] = []
    mismatched: List[str] = []

    def _fill(col_tree):
        flat = jax.tree_util.tree_flatten_with_path(col_tree)[0]
        treedef = jax.tree_util.tree_structure(col_tree)
        leaves = []
        for path, leaf in flat:
            name = ".".join(str(getattr(p, "key", p)) for p in path)
            if name in remaining:
                arr = remaining.pop(name)
                if tuple(arr.shape) != tuple(leaf.shape):
                    mismatched.append(
                        f"{name}: checkpoint {tuple(arr.shape)} vs model {tuple(leaf.shape)}")
                    leaves.append(leaf)
                else:
                    leaves.append(np.asarray(arr).astype(leaf.dtype))
            else:
                missing.append(name)
                leaves.append(leaf)
        return jax.tree_util.tree_unflatten(treedef, leaves)

    new_vars = {col: _fill(tree) for col, tree in variables.items()}
    unexpected = sorted(remaining)
    if jax.process_index() == 0 and logger is not None:
        if unexpected:
            logger(f"unexpected key in source state_dict: {', '.join(unexpected)}\n")
        if missing:
            logger(f"missing keys in source state_dict: {', '.join(missing)}\n")
        if mismatched:
            logger("size mismatched keys: " + ", ".join(mismatched) + "\n")
    if strict and (missing or unexpected or mismatched):
        raise RuntimeError(
            f"Error(s) in loading state_dict: missing={missing}, "
            f"unexpected={unexpected}, mismatched={mismatched}")
    return new_vars, missing, unexpected


def _load_file(filename) -> Dict[str, Any]:
    filename = Path(filename)
    if filename.is_dir():  # orbax checkpoint directory (see save_checkpoint)
        import orbax.checkpoint as ocp
        with ocp.StandardCheckpointer() as ckptr:
            payload = dict(ckptr.restore(filename.resolve()))
        for name in ("metadata", "train_state"):
            sidecar = filename / f"{name}.pkl"
            if sidecar.is_file():
                with open(sidecar, "rb") as f:
                    payload[name] = pickle.load(f)
        payload.setdefault("metadata", {})
        return payload
    if not filename.is_file():
        raise FileNotFoundError(f"checkpoint file not found: {filename}")
    with open(filename, "rb") as f:
        return pickle.load(f)


def load_checkpoint(variables,
                    filename,
                    strict: bool = False,
                    revise_keys=((r"^module\.", ""),),
                    logger=print) -> Tuple[Any, Dict[str, Any]]:
    """Load a checkpoint file into a variables pytree.

    Mirrors reference checkpoint.py:97-139: applies ``revise_keys``
    regex-substitutions to every state_dict key before matching.
    Returns ``(new_variables, checkpoint_dict)``.
    """
    ckpt = _load_file(filename)
    state_dict = ckpt.get("state_dict", ckpt)
    for pattern, replacement in revise_keys:
        state_dict = {re.sub(pattern, replacement, k): v
                      for k, v in state_dict.items()}
    new_vars, _, _ = load_state_dict(variables, state_dict, strict, logger)
    return new_vars, ckpt


def load_checkpoint_with_prefix(prefix: str, filename,
                                map_location=None) -> Dict[str, np.ndarray]:
    """Return the sub-state_dict under ``prefix`` with the prefix stripped
    (reference checkpoint.py:142-170)."""
    ckpt = _load_file(filename)
    state_dict = ckpt.get("state_dict", ckpt)
    if not prefix.endswith("."):
        prefix += "."
    out = {k[len(prefix):]: v for k, v in state_dict.items()
           if k.startswith(prefix)}
    assert out, f"{prefix} is not in the checkpoint"
    return out


def load_checkpoint_to_params(params, filename, prefix: Optional[str] = None):
    """PretrainedInit back-end: fill ``params`` (a bare collection tree) from
    a checkpoint, optionally from the sub-tree under ``prefix``."""
    if prefix:
        state_dict = load_checkpoint_with_prefix(prefix, filename)
    else:
        ckpt = _load_file(filename)
        state_dict = ckpt.get("state_dict", ckpt)
    wrapped = {"params": params}
    new_vars, _, _ = load_state_dict(wrapped, state_dict, strict=False)
    return new_vars["params"]


def weights_to_cpu(tree):
    """Device → host copy of a pytree (reference checkpoint.py:173-223)."""
    return jax.tree_util.tree_map(lambda x: np.asarray(jax.device_get(x)), tree)


def apply_to(tree, predicate, transform):
    """Recursively transform leaves matching ``predicate``
    (reference checkpoint.py:173-199)."""
    return jax.tree_util.tree_map(
        lambda x: transform(x) if predicate(x) else x, tree)


# at most one async save in flight; the completion thread owns the
# sidecar writes and the atomic swap
_ASYNC = {"ckptr": None, "thread": None}


def wait_for_async_save() -> None:
    """Block until a pending ``backend='orbax_async'`` save (if any) has
    fully landed on disk (orbax write + sidecars + atomic swap)."""
    t = _ASYNC.get("thread")
    if t is not None:
        t.join()
        _ASYNC["thread"] = None


def _finalize_orbax_dir(payload, tmp: Path, path: Path) -> None:
    """Write sidecars into the finished orbax dir, then swap into place."""
    import shutil

    # metadata and the optax train_state keep their python structure in
    # sidecar pickles — StandardCheckpointer can't hold strings or
    # NamedTuple treedefs
    with open(tmp / "metadata.pkl", "wb") as f:
        pickle.dump(payload["metadata"], f, protocol=4)
    if "train_state" in payload:
        with open(tmp / "train_state.pkl", "wb") as f:
            pickle.dump(payload["train_state"], f, protocol=4)
    # near-atomic swap (a bare rmtree-then-save could lose both copies)
    old = path.with_name(path.name + ".old_orbax")
    if path.is_dir():
        path.rename(old)
    elif path.exists():
        path.unlink()
    tmp.rename(path)
    if old.exists():
        shutil.rmtree(old)


def save_checkpoint(variables,
                    filename,
                    metadata: Optional[Dict[str, Any]] = None,
                    train_state: Optional[Dict[str, Any]] = None,
                    backend: str = "pickle") -> None:
    """Write ``{'metadata', 'state_dict'[, 'train_state']}`` to ``filename``.

    The reference's ``save_model`` (train_utils.py:160-165) shape, plus the
    optional ``train_state`` blob (opt state / step / schedule position) that
    makes ``--resume-from`` actually work.

    ``backend='pickle'`` (default) writes one portable file;
    ``backend='orbax'`` writes an orbax directory — the right choice for
    multi-host / very large states (sharded, atomic);
    ``backend='orbax_async'`` additionally overlaps the disk write with
    training: the state is snapshotted to host synchronously, the write +
    atomic swap happen on a background thread.  Call
    ``wait_for_async_save()`` before reading the path or exiting.
    """
    payload: Dict[str, Any] = {
        "metadata": metadata or {},
        "state_dict": state_dict_from_variables(variables),
    }
    if train_state is not None:
        payload["train_state"] = weights_to_cpu(train_state)
    if backend in ("orbax", "orbax_async"):
        import shutil

        import orbax.checkpoint as ocp
        wait_for_async_save()  # one in flight; also protects tmp dir reuse
        path = Path(filename).resolve()
        path.parent.mkdir(parents=True, exist_ok=True)
        tmp = path.with_name(path.name + ".tmp_orbax")
        old = path.with_name(path.name + ".old_orbax")
        for p in (tmp, old):
            if p.is_dir():
                shutil.rmtree(p)
            elif p.exists():
                p.unlink()
        if backend == "orbax_async":
            import threading
            if _ASYNC["ckptr"] is None:
                _ASYNC["ckptr"] = ocp.AsyncCheckpointer(
                    ocp.StandardCheckpointHandler())
            ckptr = _ASYNC["ckptr"]
            # returns once the state is staged on host; disk I/O proceeds
            # in orbax's background executor
            ckptr.save(tmp, args=ocp.args.StandardSave(
                {"state_dict": payload["state_dict"]}))

            def _finish():
                ckptr.wait_until_finished()
                _finalize_orbax_dir(payload, tmp, path)

            t = threading.Thread(target=_finish, daemon=True,
                                 name="orbax-async-finalize")
            t.start()
            _ASYNC["thread"] = t
            return
        # arrays go through orbax (sharded/typed)
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(tmp, {"state_dict": payload["state_dict"]})
        _finalize_orbax_dir(payload, tmp, path)
        return
    assert backend == "pickle", f"unknown checkpoint backend {backend}"
    Path(filename).parent.mkdir(parents=True, exist_ok=True)
    tmp = str(filename) + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=4)
    Path(tmp).replace(filename)
