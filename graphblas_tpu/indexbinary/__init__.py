"""``graphblas_tpu.indexbinary``: index-aware binary operators
f(x, ix, jx, y, iy, jy, theta).

Reference namespace: /root/reference/graphblas/indexbinary/__init__.py
(SuiteSparse 9.4+ extension; no builtins).
"""

import sys
import types

from ..core import _init_jax as _init_jax

_init_jax()

from ..core.operator import indexbinary as _core  # noqa: E402
from ..core.operator.indexbinary import IndexBinaryOp  # noqa: E402

_this = sys.modules[__name__]
_core._initialize(_this)

register_new = IndexBinaryOp.register_new
register_anonymous = IndexBinaryOp.register_anonymous

tx = types.SimpleNamespace()
ss = tx
