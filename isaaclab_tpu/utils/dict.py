"""Dictionary utilities (reference ``utils/dict.py``)."""

from __future__ import annotations

import collections.abc
import hashlib
import json
from typing import Any, Iterable, Mapping


def class_to_dict(obj: Any) -> dict:
    """Recursively convert an object's public attributes to a dict
    (reference dict.py:class_to_dict)."""
    if isinstance(obj, dict):
        return {k: class_to_dict(v) for k, v in obj.items()}
    if hasattr(obj, "to_dict") and callable(obj.to_dict):
        return obj.to_dict()
    if not hasattr(obj, "__dict__"):
        return obj
    out = {}
    for key, value in obj.__dict__.items():
        if key.startswith("_"):
            continue
        if isinstance(value, (list, tuple)):
            out[key] = type(value)(class_to_dict(v) for v in value)
        elif isinstance(value, dict) or hasattr(value, "__dict__"):
            out[key] = class_to_dict(value)
        else:
            out[key] = value
    return out


def update_class_from_dict(obj: Any, data: Mapping, _ns: str = "") -> None:
    """In-place update of object attributes from a nested dict
    (reference dict.py:update_class_from_dict)."""
    for key, value in data.items():
        if not hasattr(obj, key):
            raise KeyError(f"{_ns}.{key} not found in {type(obj).__name__}")
        attr = getattr(obj, key)
        if isinstance(value, Mapping) and not isinstance(attr, Mapping):
            update_class_from_dict(attr, value, _ns=f"{_ns}.{key}")
        else:
            setattr(obj, key, value)


def dict_to_md5_hash(data: Mapping) -> str:
    """Stable MD5 of a nested dict (reference dict.py:dict_to_md5_hash)."""
    encoded = json.dumps(data, sort_keys=True, default=str).encode()
    return hashlib.md5(encoded).hexdigest()


def convert_dict_to_backend(data: Mapping, backend: str = "numpy") -> dict:
    """Convert array leaves between jax/numpy (reference dict.py:convert_dict_to_backend)."""
    import jax.numpy as jnp
    import numpy as np

    def convert(v):
        if isinstance(v, Mapping):
            return {k: convert(x) for k, x in v.items()}
        if backend == "numpy" and hasattr(v, "__array__"):
            return np.asarray(v)
        if backend == "jax" and isinstance(v, (np.ndarray, list, float, int)):
            return jnp.asarray(v)
        return v

    return {k: convert(v) for k, v in data.items()}


def update_dict(orig: dict, new: Mapping) -> dict:
    """Recursive dict update (reference dict.py:update_dict)."""
    for key, value in new.items():
        if isinstance(value, collections.abc.Mapping):
            orig[key] = update_dict(orig.get(key, {}), value)
        else:
            orig[key] = value
    return orig


def replace_slices_with_strings(data: dict) -> dict:
    """Make a dict YAML-safe by stringifying slices (reference dict.py)."""
    out = {}
    for k, v in data.items():
        if isinstance(v, dict):
            out[k] = replace_slices_with_strings(v)
        elif isinstance(v, slice):
            out[k] = f"slice({v.start},{v.stop},{v.step})"
        else:
            out[k] = v
    return out


def replace_strings_with_slices(data: dict) -> dict:
    """Inverse of :func:`replace_slices_with_strings`."""
    out = {}
    for k, v in data.items():
        if isinstance(v, dict):
            out[k] = replace_strings_with_slices(v)
        elif isinstance(v, str) and v.startswith("slice("):
            parts = v[6:-1].split(",")
            vals = [None if p == "None" else int(p) for p in parts]
            out[k] = slice(*vals)
        else:
            out[k] = v
    return out


def print_dict(data: Mapping, nesting: int = 0):
    """Pretty-print a nested dict (reference dict.py:print_dict)."""
    for key, value in data.items():
        if isinstance(value, Mapping):
            print("  " * nesting + f"{key}:")
            print_dict(value, nesting + 1)
        else:
            print("  " * nesting + f"{key}: {value}")
