"""Registry kernel.

TPU-native re-design of the reference registry system
(``registry/register.py:1-45`` in HanHan-TR/Image_Segmentation_lab): every
registry is an independent namespace mapping string type-names to factories
(classes or callables).  The reference manufactures registry *classes* through
a metaclass; here a registry is a plain instance — simpler, picklable, and
identical in observable behavior:

* ``register(name=None)`` decorator, duplicate names are an error
  (reference registry/register.py:12-20);
* ``get(name)`` raises ``KeyError`` with the registry name on miss
  (reference registry/register.py:22-28);
* ``RegisterManager.create_registry(name)`` returns a cached per-name registry
  (reference registry/register.py:31-45).

Additionally each registry supports ``alias`` registration (the reference left
short norm names like ``BN``/``SyncBN``/``GN`` unregistered even though its
configs use them — SURVEY.md §8.4; aliases close that gap declaratively).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterator, Optional


class Register:
    """A single string→factory registry namespace."""

    def __init__(self, name: str):
        self._name = name
        self._storage: Dict[str, Any] = {}

    @property
    def name(self) -> str:
        return self._name

    def register(self, name: Optional[str] = None, *, aliases: tuple = ()) -> Callable:
        """Decorator registering ``obj`` under ``name`` (default: its __name__).

        Raises ``KeyError`` on duplicate registration, mirroring the
        reference's duplicate-key error (registry/register.py:14-17).
        """

        def decorator(obj: Any) -> Any:
            key = name if name is not None else obj.__name__
            keys = (key, *aliases)
            # validate every key before storing any: a duplicate must not
            # leave the registry partially mutated
            for k in keys:
                if k in self._storage:
                    raise KeyError(
                        f"'{k}' is already registered in registry '{self._name}'")
            for k in keys:
                self._storage[k] = obj
            return obj

        return decorator

    def add_alias(self, alias: str, existing: str) -> None:
        """Register ``alias`` pointing at the factory of ``existing``."""
        if alias in self._storage:
            raise KeyError(
                f"'{alias}' is already registered in registry '{self._name}'")
        self._storage[alias] = self._storage[existing]

    def get(self, name: str) -> Any:
        try:
            return self._storage[name]
        except KeyError:
            raise KeyError(
                f"'{name}' is not registered in registry '{self._name}'. "
                f"Available: {sorted(self._storage)}") from None

    def __contains__(self, name: str) -> bool:
        return name in self._storage

    def __iter__(self) -> Iterator[str]:
        return iter(self._storage)

    def __len__(self) -> int:
        return len(self._storage)

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"Register(name={self._name!r}, entries={sorted(self._storage)})"


class RegisterManager:
    """Factory/cache of named registries (reference registry/register.py:31-45)."""

    _registries: Dict[str, Register] = {}

    @classmethod
    def create_registry(cls, name: str) -> Register:
        if name not in cls._registries:
            cls._registries[name] = Register(name)
        return cls._registries[name]

    @classmethod
    def get_registry(cls, name: str) -> Register:
        return cls._registries[name]
