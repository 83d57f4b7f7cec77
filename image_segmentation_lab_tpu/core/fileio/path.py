"""Filesystem path helpers.

Behavioral parity with reference ``core/fileio/path.py:7-55``:
``mkdir_or_exist`` and the ``increment_path`` run-directory allocator that
yields ``work_dir/project/exp``, then ``exp2``, ``exp3``, ... on collision.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Union


def mkdir_or_exist(dir_name: Union[str, Path], mode: int = 0o777) -> None:
    if dir_name == "":
        return
    os.makedirs(os.path.expanduser(dir_name), mode=mode, exist_ok=True)


def is_filepath(x) -> bool:
    return isinstance(x, (str, Path))


def fopen(filepath, *args, **kwargs):
    if is_filepath(filepath):
        return open(filepath, *args, **kwargs)
    raise ValueError("`filepath` should be a string or a Path")


def check_file_exist(filename: str, msg_tmpl: str = 'file "{}" does not exist'):
    if not os.path.isfile(filename):
        raise FileNotFoundError(msg_tmpl.format(filename))


def increment_path(work_dir: Union[str, Path],
                   project: str = "runs",
                   name: str = "exp",
                   exist_ok: bool = False,
                   mkdir: bool = True) -> Path:
    """Allocate the next free run directory ``work_dir/project/name{,2,3...}``.

    Mirrors reference core/fileio/path.py:18-55: the first run gets the bare
    ``name``; subsequent runs get ``name2``, ``name3``, ...
    """
    base = Path(work_dir) / project
    path = base / name
    if path.exists() and not exist_ok:
        n = 2
        while (base / f"{name}{n}").exists():
            n += 1
        path = base / f"{name}{n}"
    if mkdir:
        path.mkdir(parents=True, exist_ok=True)
    return path


def scandir(dir_path, suffix=None, recursive: bool = False):
    """Yield relative file paths under ``dir_path`` filtered by ``suffix``
    (thin alias of ``HardDiskBackend.list_dir_or_file`` so the two scans
    cannot drift)."""
    from .backend import HardDiskBackend
    if isinstance(suffix, (list,)):
        suffix = tuple(suffix)
    yield from HardDiskBackend().list_dir_or_file(
        dir_path, list_dir=False, suffix=suffix, recursive=recursive)
