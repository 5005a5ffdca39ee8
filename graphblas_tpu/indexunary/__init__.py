"""``graphblas_tpu.indexunary``: index-aware unary operators f(val, i, j, thunk).

Reference namespace: /root/reference/graphblas/indexunary/__init__.py.
"""

import sys
import types

from ..core import _init_jax as _init_jax

_init_jax()

from ..core.operator import indexunary as _core  # noqa: E402
from ..core.operator.indexunary import IndexUnaryOp  # noqa: E402
from ..core.operator.utils import indexunary_from_string as from_string  # noqa: E402

_this = sys.modules[__name__]
_core._initialize(_this)

register_new = IndexUnaryOp.register_new
register_anonymous = IndexUnaryOp.register_anonymous

tx = types.SimpleNamespace()
ss = tx
