"""Storage backend abstraction.

Parity with reference ``core/fileio/backend.py:9-211`` (``HardDiskBackend``):
byte/text get-put and recursive directory listing with suffix filtering, used
by dataset annotation scanning (core/dataset/custom.py:132-172).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Iterator, Optional, Tuple, Union


class HardDiskBackend:
    """Local-filesystem backend."""

    name = "HardDiskBackend"

    def get(self, filepath: Union[str, Path]) -> bytes:
        with open(filepath, "rb") as f:
            return f.read()

    def get_text(self, filepath: Union[str, Path], encoding: str = "utf-8") -> str:
        with open(filepath, "r", encoding=encoding) as f:
            return f.read()

    def put(self, obj: bytes, filepath: Union[str, Path]) -> None:
        Path(filepath).parent.mkdir(parents=True, exist_ok=True)
        with open(filepath, "wb") as f:
            f.write(obj)

    def put_text(self, obj: str, filepath: Union[str, Path],
                 encoding: str = "utf-8") -> None:
        Path(filepath).parent.mkdir(parents=True, exist_ok=True)
        with open(filepath, "w", encoding=encoding) as f:
            f.write(obj)

    def exists(self, filepath) -> bool:
        return os.path.exists(str(filepath))

    def isdir(self, filepath) -> bool:
        return os.path.isdir(str(filepath))

    def isfile(self, filepath) -> bool:
        return os.path.isfile(str(filepath))

    def join_path(self, filepath, *filepaths) -> str:
        return os.path.join(str(filepath), *map(str, filepaths))

    def list_dir_or_file(self,
                         dir_path: Union[str, Path],
                         list_dir: bool = True,
                         list_file: bool = True,
                         suffix: Optional[Union[str, Tuple[str, ...]]] = None,
                         recursive: bool = False) -> Iterator[str]:
        """Yield relative paths under ``dir_path``.

        Matches the reference semantics (backend.py:139-211): ``suffix`` only
        filters files; results are relative to ``dir_path``.
        """
        if list_dir and suffix is not None:
            raise TypeError("`suffix` should be None when `list_dir` is True")
        if suffix is not None and not isinstance(suffix, (str, tuple)):
            raise TypeError("`suffix` must be a string or tuple of strings")
        root = str(dir_path)

        def _walk(d):
            for entry in sorted(os.scandir(d), key=lambda e: e.name):
                if not entry.name.startswith(".") and entry.is_file():
                    rel = os.path.relpath(entry.path, root)
                    if (suffix is None or rel.endswith(suffix)) and list_file:
                        yield rel
                elif os.path.isdir(entry.path):
                    if list_dir:
                        yield os.path.relpath(entry.path, root)
                    if recursive:
                        yield from _walk(entry.path)

        return _walk(root)
