"""String / regex utilities.

TPU-native counterpart of the reference string helpers
(``/root/reference/source/isaaclab/isaaclab/utils/string.py``). These run
host-side at env-build time: regex-based name resolution is the backbone of
all ``find_bodies``/``find_joints`` APIs; the resolved integer indices become
static gather indices baked into the jitted program.
"""

from __future__ import annotations

import importlib
import re
from collections.abc import Callable, Sequence


def to_camel_case(snake_str: str, to: str = "cC") -> str:
    """snake_case -> camelCase ("cC") or CamelCase ("CC"). Reference string.py:20."""
    components = snake_str.split("_")
    if to == "CC":
        return "".join(x.title() for x in components)
    if to == "cC":
        return components[0] + "".join(x.title() for x in components[1:])
    raise ValueError(f"Invalid conversion target: {to}")


def to_snake_case(camel_str: str) -> str:
    """CamelCase -> snake_case. Reference string.py:48."""
    camel_str = re.sub("(.)([A-Z][a-z]+)", r"\1_\2", camel_str)
    return re.sub("([a-z0-9])([A-Z])", r"\1_\2", camel_str).lower()


def string_to_slice(s: str) -> slice:
    """Parse a string like ``"1:5:2"`` into a slice. Reference string.py:61."""
    parts = s.split(":")
    if len(parts) > 3:
        raise ValueError(f"Invalid slice string: {s}")
    vals = [int(p) if p else None for p in parts]
    while len(vals) < 3:
        vals.append(None)
    return slice(*vals)


def is_lambda_expression(name: str) -> bool:
    """True if the string compiles to a lambda. Reference string.py:92."""
    try:
        ast = compile(name, "<string>", "eval")
        return name.strip().startswith("lambda")
    except SyntaxError:
        return False


def callable_to_string(value: Callable) -> str:
    """Serialize a callable to an importable dotted string. Reference string.py:108."""
    if not callable(value):
        raise ValueError(f"Value {value} is not callable.")
    if value.__name__ == "<lambda>":
        import inspect

        return inspect.getsource(value).strip()
    return f"{value.__module__}:{value.__name__}"


def string_to_callable(name: str) -> Callable:
    """Resolve ``module.sub:attr`` (or a lambda source) to a callable.
    Reference string.py:138."""
    try:
        if is_lambda_expression(name):
            return eval(name)  # noqa: S307 - trusted config input
        mod_name, _, attr_name = name.partition(":")
        mod = importlib.import_module(mod_name)
        fn = getattr(mod, attr_name)
        if not callable(fn):
            raise AttributeError(f"'{name}' is not callable.")
        return fn
    except (ValueError, ModuleNotFoundError, AttributeError) as e:
        raise ValueError(f"Could not resolve callable from string '{name}': {e}")


def resolve_matching_names(
    keys: str | Sequence[str],
    list_of_strings: Sequence[str],
    preserve_order: bool = False,
) -> tuple[list[int], list[str]]:
    """Match regex key(s) against a name list -> (indices, names).

    Reference string.py:178. Every key must match at least one name; raises
    otherwise. By default output is ordered by position in ``list_of_strings``;
    with ``preserve_order`` it follows the order of ``keys``.
    """
    if isinstance(keys, str):
        keys = [keys]
    index_list: list[int] = []
    names_list: list[str] = []
    keys_used = [False] * len(keys)

    if preserve_order:
        for ki, k in enumerate(keys):
            for i, s in enumerate(list_of_strings):
                if re.fullmatch(k, s) and i not in index_list:
                    index_list.append(i)
                    names_list.append(s)
                    keys_used[ki] = True
    else:
        for i, s in enumerate(list_of_strings):
            for ki, k in enumerate(keys):
                if re.fullmatch(k, s):
                    if i not in index_list:
                        index_list.append(i)
                        names_list.append(s)
                    keys_used[ki] = True
                    break

    if not all(keys_used):
        unused = [k for k, used in zip(keys, keys_used) if not used]
        raise ValueError(
            f"Not all regular expressions are matched! Unmatched: {unused} "
            f"against {list(list_of_strings)}"
        )
    return index_list, names_list


def resolve_matching_names_values(
    data: dict[str, object],
    list_of_strings: Sequence[str],
    preserve_order: bool = False,
) -> tuple[list[int], list[str], list[object]]:
    """Like :func:`resolve_matching_names` but maps dict values onto matches.
    Reference string.py:274. Raises on duplicate matches across keys."""
    index_list: list[int] = []
    names_list: list[str] = []
    values_list: list[object] = []
    keys_used = {k: False for k in data}

    order = (
        [(k, s, i) for k in data for i, s in enumerate(list_of_strings)]
        if preserve_order
        else [(k, s, i) for i, s in enumerate(list_of_strings) for k in data]
    )
    for k, s, i in order:
        if re.fullmatch(k, s):
            if i in index_list:
                if values_list[index_list.index(i)] is not data[k]:
                    raise ValueError(
                        f"Name '{s}' matched by multiple keys with different values."
                    )
                keys_used[k] = True
                continue
            index_list.append(i)
            names_list.append(s)
            values_list.append(data[k])
            keys_used[k] = True

    if not all(keys_used.values()):
        unused = [k for k, used in keys_used.items() if not used]
        raise ValueError(
            f"Not all regular expressions are matched! Unmatched: {unused} "
            f"against {list(list_of_strings)}"
        )
    return index_list, names_list, values_list
