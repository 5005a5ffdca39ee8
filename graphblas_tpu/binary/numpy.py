"""``graphblas_tpu.binary.numpy``: numpy-ufunc-named binary operators.

Reference: /root/reference/graphblas/binary/numpy.py.
"""

import sys

import numpy as np

from ..core.operator.binary import BinaryOp

_UFUNC_NAMES = [
    "add",
    "arctan2",
    "bitwise_and",
    "bitwise_or",
    "bitwise_xor",
    "copysign",
    "divide",
    "equal",
    "float_power",
    "floor_divide",
    "fmax",
    "fmin",
    "fmod",
    "gcd",
    "greater",
    "greater_equal",
    "heaviside",
    "hypot",
    "lcm",
    "ldexp",
    "left_shift",
    "less",
    "less_equal",
    "logaddexp",
    "logaddexp2",
    "logical_and",
    "logical_or",
    "logical_xor",
    "maximum",
    "minimum",
    "mod",
    "multiply",
    "nextafter",
    "not_equal",
    "power",
    "remainder",
    "right_shift",
    "subtract",
    "true_divide",
]

_MAPNUMPY = {
    "add": "plus",
    "arctan2": "atan2",
    "bitwise_and": "band",
    "bitwise_or": "bor",
    "bitwise_xor": "bxor",
    "copysign": "copysign",
    "divide": "truediv",
    "equal": "eq",
    "floor_divide": "floordiv",
    "fmax": "max",
    "fmin": "min",
    "fmod": "fmod",
    "greater": "gt",
    "greater_equal": "ge",
    "hypot": "hypot",
    "ldexp": "ldexp",
    "less": "lt",
    "less_equal": "le",
    "logical_and": "land",
    "logical_or": "lor",
    "logical_xor": "lxor",
    "maximum": "max",
    "minimum": "min",
    "multiply": "times",
    "not_equal": "ne",
    "power": "pow",
    "subtract": "minus",
    "true_divide": "truediv",
}

_this = sys.modules[__name__]


def _build(name):
    import graphblas_tpu

    if graphblas_tpu.config.get("mapnumpy") and name in _MAPNUMPY:
        import graphblas_tpu.binary as binary

        return getattr(binary, _MAPNUMPY[name])
    import jax.numpy as jnp

    fn = getattr(jnp, name, None)
    if fn is None:
        fn = getattr(np, name, None)
    if fn is None:
        raise AttributeError(name)
    if name == "ldexp":
        # jnp.ldexp requires an integer exponent; numpy's raises TypeError on
        # float exponent input.  CONTRACT DELTA (documented, ADVICE r4): this
        # op truncates a float exponent toward zero instead of raising —
        # value checks are impossible under jit tracing, and GraphBLAS
        # operands share one dtype, so float exponents are the common case.
        base = fn
        fn = lambda x, y: base(x, y.astype(np.int32))  # noqa: E731
    op = BinaryOp.register_anonymous(lambda x, y: fn(x, y), f"numpy.{name}")
    op._modname = "binary.numpy"
    return op


def __getattr__(name):
    if name in _UFUNC_NAMES:
        op = _build(name)
        setattr(_this, name, op)
        return op
    raise AttributeError(f"module 'graphblas_tpu.binary.numpy' has no attribute {name!r}")


def __dir__():
    return sorted(set(globals()) | set(_UFUNC_NAMES))
