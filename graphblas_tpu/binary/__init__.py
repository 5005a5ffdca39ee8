"""``graphblas_tpu.binary``: builtin and user-registered binary operators.

Reference namespace: /root/reference/graphblas/binary/__init__.py.
"""

import sys
import types

from ..core import _init_jax as _init_jax

_init_jax()

from ..core.operator import binary as _core  # noqa: E402
from ..core.operator.binary import BinaryOp  # noqa: E402
from ..core.operator.utils import binary_from_string as from_string  # noqa: E402

_this = sys.modules[__name__]
_core._initialize(_this)

register_new = BinaryOp.register_new
register_anonymous = BinaryOp.register_anonymous

# tx extension namespace (reference moved positional + is* ops to binary.ss)
tx = types.SimpleNamespace(
    firsti=_this.firsti,
    firsti1=_this.firsti1,
    firstj=_this.firstj,
    firstj1=_this.firstj1,
    secondi=_this.secondi,
    secondi1=_this.secondi1,
    secondj=_this.secondj,
    secondj1=_this.secondj1,
)
ss = tx


def __getattr__(name):
    if name == "numpy":
        import importlib

        module = importlib.import_module("graphblas_tpu.binary.numpy")
        setattr(_this, "numpy", module)
        return module
    raise AttributeError(f"module 'graphblas_tpu.binary' has no attribute {name!r}")
