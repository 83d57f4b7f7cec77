"""Config parsing.

The reference's config system (core/fileio/parse.py:154-175) treats config
files as *executable Python modules*: the module is imported and every
top-level name that is not a dunder / module / function becomes a config key.
This re-implementation keeps that exact contract (so reference configs run
unchanged) while loading via ``importlib.util.spec_from_file_location``
instead of mutating ``sys.path``.

Also provides ``list_from_file``/``dict_from_file`` (parse.py:19-110), the
``is_seq_of`` family (parse.py:216-263) and a JAX-flavored ``select_device``
(the reference's CUDA_VISIBLE_DEVICES wrangler, parse.py:113-151).
"""

from __future__ import annotations

import importlib.util
import os
import shutil
import sys
import types
import uuid
from pathlib import Path
from typing import Any, Dict, Optional, Sequence


def load_python_config(filename) -> Dict[str, Any]:
    """Import ``filename`` as a python module and scrape its top-level dict."""
    filename = Path(filename)
    if not filename.is_file():
        raise FileNotFoundError(f"Config file not found: {filename}")
    # unique module name so repeated loads of same-named files don't collide
    mod_name = f"_isl_cfg_{filename.stem}_{uuid.uuid4().hex[:8]}"
    spec = importlib.util.spec_from_file_location(mod_name, str(filename))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[mod_name] = mod
    try:
        spec.loader.exec_module(mod)
    finally:
        sys.modules.pop(mod_name, None)
    return {
        name: value
        for name, value in vars(mod).items()
        if not name.startswith("__")
        and not isinstance(value, (types.ModuleType, types.FunctionType))
    }


def parse_and_backup_config(filename,
                            backup_dir=None,
                            metadata: Optional[dict] = None) -> Dict[str, Any]:
    """Parse a python config module, optionally backing it up.

    Mirrors reference core/fileio/parse.py:154-175: copies the file into
    ``backup_dir`` and records ``<first-dir>_config`` in ``metadata``
    (e.g. ``configs/network/... → network_config`` when invoked from the repo
    root; falls back to the parent directory name).
    """
    filename = Path(filename)
    if backup_dir is not None:
        backup_dir = Path(backup_dir)
        backup_dir.mkdir(parents=True, exist_ok=True)
        backup_file = backup_dir / filename.name
        shutil.copy(str(filename), str(backup_dir))
        # metadata key = the config kind: the directory right after
        # `configs/` when present (works for absolute paths too), else the
        # parent directory name
        parts = filename.parts
        if "configs" in parts[:-1]:
            kind = parts[parts.index("configs") + 1]
            if kind == filename.name:  # config directly under configs/
                kind = filename.parent.name
        else:
            kind = filename.parent.name
        if isinstance(metadata, dict):
            metadata[kind + "_config"] = str(backup_file)
    return load_python_config(filename)


def require_config_key(cfg: Dict[str, Any], key: str, path) -> Any:
    """Pop ``cfg[key]`` or exit with a message naming the file (shared by
    the train/val CLIs)."""
    if key not in cfg:
        raise SystemExit(
            f"config {path} has no top-level `{key} = dict(...)` — is it "
            f"the right kind of config for this flag?")
    return cfg.pop(key)


def list_from_file(filename,
                   prefix: str = "",
                   offset: int = 0,
                   max_num: int = 0,
                   encoding: str = "utf-8") -> list:
    """Load a text file line-by-line into a list (parse.py:19-63)."""
    item_list = []
    with open(filename, "r", encoding=encoding) as f:
        for _ in range(offset):
            f.readline()
        for line in f:
            if 0 < max_num <= len(item_list):
                break
            item_list.append(prefix + line.rstrip("\n\r"))
    return item_list


def dict_from_file(filename,
                   key_type: type = str,
                   encoding: str = "utf-8") -> dict:
    """Load a text file into a dict; first token is the key (parse.py:66-110)."""
    mapping = {}
    with open(filename, "r", encoding=encoding) as f:
        for line in f:
            items = line.rstrip("\n\r").split()
            assert len(items) >= 2
            key = key_type(items[0])
            val = items[1:] if len(items) > 2 else items[1]
            mapping[key] = val
    return mapping


def is_seq_of(seq, expected_type, seq_type=None) -> bool:
    """Check that ``seq`` is a sequence whose items are all ``expected_type``."""
    exp_seq_type = (Sequence if seq_type is None else seq_type)
    if not isinstance(seq, exp_seq_type):
        return False
    return all(isinstance(item, expected_type) for item in seq)


def is_list_of(seq, expected_type) -> bool:
    return is_seq_of(seq, expected_type, seq_type=list)


def is_tuple_of(seq, expected_type) -> bool:
    return is_seq_of(seq, expected_type, seq_type=tuple)


def select_device(device: str = "", batch_size: int = 0, newline: bool = True):
    """Resolve the JAX platform from a ``--device`` CLI string.

    TPU-native analog of the reference's CUDA device selector
    (core/fileio/parse.py:113-151): ``''`` → default platform (TPU when
    present), ``'cpu'`` → host CPU.  Returns the list of selected
    ``jax.Device`` objects and prints a banner.
    """
    import jax
    import platform as _platform

    s = f"Python-{_platform.python_version()} jax-{jax.__version__} "
    device = str(device).strip().lower().replace("none", "")
    if device == "cpu":
        # jax snapshots JAX_PLATFORMS at import, so the env var alone
        # cannot force CPU once jax is loaded; jax_platforms CAN still be
        # updated until the backend initializes.  If a non-CPU backend is
        # already live, fall through to jax.devices('cpu') — the CPU
        # platform coexists with accelerator platforms.
        os.environ["JAX_PLATFORMS"] = "cpu"
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass  # backend already initialized; try the cpu platform below
        try:
            devices = jax.devices("cpu")
        except RuntimeError as e:
            raise RuntimeError(
                "select_device('cpu') was called after jax initialized a "
                "non-CPU backend with the cpu platform excluded "
                "(JAX_PLATFORMS snapshot). Set JAX_PLATFORMS=cpu before "
                "importing jax, or call select_device earlier.") from e
        s += "CPU\n"
    else:
        devices = jax.devices()
        n = len(devices)
        if n > 1 and batch_size > 0:
            assert batch_size % n == 0, (
                f"batch-size {batch_size} not multiple of device count {n}")
        space = " " * (len(s) + 1)
        for i, d in enumerate(devices):
            s += f"{'' if i == 0 else space}{d.platform.upper()}:{i} ({d.device_kind})\n"
    if not newline:
        s = s.rstrip()
    print(s)
    return devices
