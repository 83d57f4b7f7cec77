"""Serialization front-end: ``load``/``dump`` dispatched by file extension.

Parity target: reference ``core/fileio/io.py:25-165`` + the handler classes in
``core/fileio/handlers/`` (json/yaml/pickle with a registration hook).
"""

from __future__ import annotations

import json
import pickle
from pathlib import Path
from typing import Any, Dict

import numpy as np
import yaml


class BaseFileHandler:
    str_like = True

    def load_from_fileobj(self, file, **kwargs):
        raise NotImplementedError

    def dump_to_fileobj(self, obj, file, **kwargs):
        raise NotImplementedError

    def dump_to_str(self, obj, **kwargs):
        raise NotImplementedError

    def load_from_path(self, filepath, mode="r", **kwargs):
        with open(filepath, mode) as f:
            return self.load_from_fileobj(f, **kwargs)

    def dump_to_path(self, obj, filepath, mode="w", **kwargs):
        with open(filepath, mode) as f:
            self.dump_to_fileobj(obj, f, **kwargs)


def _np_default(obj):
    """numpy-aware json fallback (reference JsonHandler set_default)."""
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    raise TypeError(f"{type(obj)} is unsupported for json dump")


class JsonHandler(BaseFileHandler):
    def load_from_fileobj(self, file, **kwargs):
        return json.load(file, **kwargs)

    def dump_to_fileobj(self, obj, file, **kwargs):
        kwargs.setdefault("default", _np_default)
        json.dump(obj, file, **kwargs)

    def dump_to_str(self, obj, **kwargs):
        kwargs.setdefault("default", _np_default)
        return json.dumps(obj, **kwargs)


class YamlHandler(BaseFileHandler):
    def load_from_fileobj(self, file, **kwargs):
        kwargs.setdefault("Loader", yaml.SafeLoader)
        return yaml.load(file, **kwargs)

    def dump_to_fileobj(self, obj, file, **kwargs):
        kwargs.setdefault("default_flow_style", False)
        yaml.dump(obj, file, **kwargs)

    def dump_to_str(self, obj, **kwargs):
        kwargs.setdefault("default_flow_style", False)
        return yaml.dump(obj, **kwargs)


class PickleHandler(BaseFileHandler):
    str_like = False

    def load_from_fileobj(self, file, **kwargs):
        return pickle.load(file, **kwargs)

    def dump_to_fileobj(self, obj, file, **kwargs):
        kwargs.setdefault("protocol", 2)
        pickle.dump(obj, file, **kwargs)

    def dump_to_str(self, obj, **kwargs):
        kwargs.setdefault("protocol", 2)
        return pickle.dumps(obj, **kwargs)

    def load_from_path(self, filepath, **kwargs):
        return super().load_from_path(filepath, mode="rb", **kwargs)

    def dump_to_path(self, obj, filepath, **kwargs):
        super().dump_to_path(obj, filepath, mode="wb", **kwargs)


file_handlers: Dict[str, BaseFileHandler] = {
    "json": JsonHandler(),
    "yaml": YamlHandler(),
    "yml": YamlHandler(),
    "pickle": PickleHandler(),
    "pkl": PickleHandler(),
}


def register_handler(handler: BaseFileHandler, file_formats) -> None:
    if isinstance(file_formats, str):
        file_formats = [file_formats]
    for fmt in file_formats:
        file_handlers[fmt] = handler


def _ext(file) -> str:
    return str(file).split(".")[-1].lower()


def load(file, file_format: str = None, **kwargs) -> Any:
    """Load json/yaml/pickle from a path or file object by extension."""
    if file_format is None:
        if isinstance(file, (str, Path)):
            file_format = _ext(file)
        else:
            raise ValueError("file_format must be given for file objects")
    if file_format not in file_handlers:
        raise TypeError(f"Unsupported format: {file_format}")
    handler = file_handlers[file_format]
    if isinstance(file, (str, Path)):
        return handler.load_from_path(file, **kwargs)
    return handler.load_from_fileobj(file, **kwargs)


def dump(obj: Any, file=None, file_format: str = None, **kwargs):
    """Dump to str (file=None), path, or file object."""
    if file_format is None:
        if isinstance(file, (str, Path)):
            file_format = _ext(file)
        elif file is None:
            raise ValueError("file_format must be given when file is None")
        else:
            raise ValueError("file_format must be given for file objects")
    if file_format not in file_handlers:
        raise TypeError(f"Unsupported format: {file_format}")
    handler = file_handlers[file_format]
    if file is None:
        return handler.dump_to_str(obj, **kwargs)
    if isinstance(file, (str, Path)):
        handler.dump_to_path(obj, file, **kwargs)
    else:
        handler.dump_to_fileobj(obj, file, **kwargs)
