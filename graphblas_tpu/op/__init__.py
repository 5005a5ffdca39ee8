"""``graphblas_tpu.op``: combined operator namespace.

Reference namespace: /root/reference/graphblas/op/__init__.py — resolves any
operator name by searching unary, binary, monoid, semiring (binary shadows
monoid for shared names like ``plus``, matching the reference).
"""

import sys

from ..core.operator.utils import op_from_string as from_string

_SEARCH_ORDER = ("unary", "binary", "monoid", "semiring", "indexunary", "select", "agg")


def __getattr__(name):
    import importlib

    for kind in _SEARCH_ORDER:
        module = importlib.import_module(f"graphblas_tpu.{kind}")
        value = getattr(module, name, None)
        if value is not None:
            setattr(sys.modules[__name__], name, value)
            return value
    raise AttributeError(f"module 'graphblas_tpu.op' has no attribute {name!r}")


def __dir__():
    import importlib

    names = set(globals())
    for kind in _SEARCH_ORDER:
        try:
            module = importlib.import_module(f"graphblas_tpu.{kind}")
        except ImportError:
            continue
        names.update(getattr(module, "_ops", {}))
    return sorted(names)
