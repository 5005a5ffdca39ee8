"""``graphblas_tpu.unary``: builtin and user-registered unary operators.

Reference namespace: /root/reference/graphblas/unary/__init__.py.  Positional
ops (positioni, ...) live both here and under ``unary.tx`` (the reference
moved them to ``unary.ss``).
"""

import sys
import types

from ..core import _init_jax as _init_jax

_init_jax()

from ..core.operator import unary as _core  # noqa: E402
from ..core.operator.unary import UnaryOp  # noqa: E402
from ..core.operator.utils import unary_from_string as from_string  # noqa: E402

_this = sys.modules[__name__]
_core._initialize(_this)

register_new = UnaryOp.register_new
register_anonymous = UnaryOp.register_anonymous

# tx extension namespace (reference: graphblas/unary/ss.py)
tx = types.SimpleNamespace(
    positioni=_this.positioni,
    positioni1=_this.positioni1,
    positionj=_this.positionj,
    positionj1=_this.positionj1,
)
ss = tx


def __getattr__(name):
    if name == "numpy":
        import importlib

        module = importlib.import_module("graphblas_tpu.unary.numpy")
        setattr(_this, "numpy", module)
        return module
    raise AttributeError(f"module 'graphblas_tpu.unary' has no attribute {name!r}")
