"""Configuration dataclass wrapper.

TPU-native counterpart of the reference ``@configclass`` decorator
(``/root/reference/source/isaaclab/isaaclab/utils/configclass.py:31``): a
dataclass wrapper with inheritance-safe mutable defaults, ``to_dict`` /
``from_dict`` / ``replace`` / ``validate`` helpers, and MISSING sentinel
support. Configs here are *static* (hashable-by-identity trace-time inputs):
they never hold device arrays — arrays live in state pytrees.
"""

from __future__ import annotations

import copy
import dataclasses
import types
from dataclasses import MISSING, Field, dataclass, field
from typing import Any, Callable

_CONFIGCLASS_FLAG = "__configclass__"


def _dict_to_obj(obj: Any, data: dict) -> None:
    for key, value in data.items():
        if not hasattr(obj, key):
            raise KeyError(f"Config {type(obj).__name__} has no attribute '{key}'")
        current = getattr(obj, key)
        if is_configclass(current) and isinstance(value, dict):
            _dict_to_obj(current, value)
        else:
            setattr(obj, key, value)


def _obj_to_dict(obj: Any) -> Any:
    if is_configclass(obj):
        return {
            f.name: _obj_to_dict(getattr(obj, f.name))
            for f in dataclasses.fields(obj)
        }
    if isinstance(obj, dict):
        return {k: _obj_to_dict(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return type(obj)(_obj_to_dict(v) for v in obj)
    return obj


def is_configclass(obj: Any) -> bool:
    """True if ``obj`` (or its class) was produced by ``@configclass``."""
    cls = obj if isinstance(obj, type) else type(obj)
    return getattr(cls, _CONFIGCLASS_FLAG, False)


def configclass(cls=None, **kwargs):
    """Decorator: make ``cls`` a mutable dataclass with config utilities.

    Unlike plain dataclasses, class-attribute defaults that are mutable
    (lists, dicts, nested configclass instances) are deep-copied per instance,
    mirroring the reference's inheritance-safe default handling
    (reference configclass.py:110-180).
    """

    def wrap(cls):
        # Inject annotations for unannotated value attributes (reference
        # configclass.py _add_annotation_types): `x = SomeCfg(...)` without a
        # type hint must still become a dataclass field.
        annotations = dict(cls.__dict__.get("__annotations__", {}))
        inherited = {}
        for base in reversed(cls.__mro__[1:]):
            inherited.update(getattr(base, "__annotations__", {}))
        for key, value in list(cls.__dict__.items()):
            if key.startswith("_") or key in annotations:
                continue
            if isinstance(value, (types.FunctionType, property, classmethod, staticmethod, type)):
                continue
            if callable(value) and not is_configclass(value):
                continue
            # unannotated subclass overrides of inherited fields must be
            # re-annotated so the dataclass picks up the NEW default
            annotations[key] = inherited.get(key, type(value))
        cls.__annotations__ = annotations
        for name in annotations:
            if name.startswith("__"):
                continue
            default = cls.__dict__.get(name, MISSING)
            if default is MISSING:
                # MISSING-as-value: give the field a sentinel default so field
                # ordering is unconstrained; validate() flags unset values
                # (reference configclass.py MISSING handling).
                setattr(cls, name, field(default_factory=_MissingFactory()))
                continue
            if isinstance(default, Field):
                continue
            if callable(default) and not isinstance(default, type):
                continue
            if isinstance(default, (list, dict, set)) or is_configclass(default) or isinstance(default, type):
                if isinstance(default, type):
                    continue  # class reference defaults are fine as-is
                setattr(
                    cls,
                    name,
                    field(default_factory=_DeepCopyFactory(default)),
                )
        cls = dataclass(cls, **kwargs)
        setattr(cls, _CONFIGCLASS_FLAG, True)
        cls.to_dict = _obj_to_dict
        cls.from_dict = _from_dict
        cls.replace = _replace
        cls.copy = _copy
        cls.validate = _validate
        return cls

    if cls is None:
        return wrap
    return wrap(cls)


class _MissingFactory:
    """Default factory yielding the dataclasses.MISSING sentinel."""

    def __call__(self):
        return MISSING


class _DeepCopyFactory:
    """Default factory that deep-copies a prototype value per instance."""

    def __init__(self, prototype):
        self.prototype = prototype

    def __call__(self):
        return copy.deepcopy(self.prototype)


def _from_dict(self, data: dict):
    """In-place update from a (possibly nested) dict."""
    _dict_to_obj(self, data)
    return self


def _replace(self, **changes):
    """Return a deep copy with the given top-level fields replaced."""
    new = copy.deepcopy(self)
    for key, value in changes.items():
        if not hasattr(new, key):
            raise KeyError(f"Config {type(new).__name__} has no attribute '{key}'")
        setattr(new, key, value)
    return new


def _copy(self):
    return copy.deepcopy(self)


def _validate(self, prefix: str = ""):
    """Raise if any field is still dataclasses.MISSING."""
    missing = []

    def scan(obj, path):
        for f in dataclasses.fields(obj):
            value = getattr(obj, f.name, MISSING)
            p = f"{path}.{f.name}" if path else f.name
            if value is MISSING:
                missing.append(p)
            elif is_configclass(value):
                scan(value, p)

    scan(self, prefix)
    if missing:
        raise TypeError(
            f"Missing values for fields: {missing} in {type(self).__name__}"
        )
    return True
