"""Numpy-parity tests for the ``*.numpy`` operator namespaces.

Reference analogue: graphblas/tests/test_numpyops.py (463 LoC) — every
``unary.numpy.*`` / ``binary.numpy.*`` op is compared against the actual
numpy ufunc on random arrays.  Here the ops are jnp UDFs; we assert
elementwise agreement through the full DSL path (Vector.apply /
ewise_mult), not just the raw function.
"""

import numpy as np
import pytest

from graphblas_tpu import Vector, binary, dtypes, unary
from graphblas_tpu.binary import numpy as npbinary
from graphblas_tpu.unary import numpy as npunary

# ops whose numpy semantics only make sense on specific domains
_UNARY_FLOAT_ONLY = {
    "arccos", "arccosh", "arcsin", "arcsinh", "arctan", "arctanh", "cbrt",
    "cos", "cosh", "deg2rad", "degrees", "exp", "exp2", "expm1", "fabs",
    "log", "log10", "log1p", "log2", "rad2deg", "radians", "rint", "sin",
    "sinh", "spacing", "sqrt", "square", "tan", "tanh", "ceil", "floor",
    "trunc", "reciprocal", "signbit", "copysign", "nextafter",
}
_UNARY_INT_ONLY = {"invert"}
_UNARY_SKIP = {
    "conjugate",  # complex: CPU-device-routed, covered in test_misc complex tests
    "matmul",
}
_BINARY_INT_ONLY = {"bitwise_and", "bitwise_or", "bitwise_xor", "gcd", "lcm",
                    "left_shift", "right_shift"}
_BINARY_FLOAT_ONLY = {"arctan2", "copysign", "deg2rad", "divide", "float_power",
                      "fmod", "heaviside", "hypot", "ldexp", "logaddexp",
                      "logaddexp2", "nextafter", "true_divide", "rad2deg"}
_BINARY_SKIP = {"matmul", "divmod", "floor_divide", "mod", "remainder"}
# floor_divide/mod/remainder: int versions hit JAX vs numpy -0 conventions on
# negative operands; the graphblas-native floordiv is covered in test_op.


def _unary_names():
    return sorted(set(npunary._UFUNC_NAMES) - _UNARY_SKIP)


def _binary_names():
    return sorted(set(npbinary._UFUNC_NAMES) - _BINARY_SKIP)


@pytest.mark.parametrize("name", _unary_names())
def test_unary_numpy_parity(rng, name):
    ufunc = getattr(np, name)
    op = getattr(npunary, name)
    if name in _UNARY_INT_ONLY:
        data = rng.integers(-50, 50, 20, dtype=np.int64)
        dtype = dtypes.INT64
    elif name == "arccosh":
        data = rng.uniform(1.0, 9.0, 20)  # domain x >= 1
        dtype = dtypes.FP64
    elif name in _UNARY_FLOAT_ONLY:
        data = rng.uniform(0.05, 0.95, 20)  # inside every domain (log/asin/...)
        dtype = dtypes.FP64
    else:
        data = rng.uniform(-40.0, 40.0, 20)
        dtype = dtypes.FP64
    v = Vector.from_coo(np.arange(20), data, dtype, size=20)
    got = v.apply(op).new().to_coo()[1]
    expected = ufunc(data)
    if expected.dtype == np.bool_:
        np.testing.assert_array_equal(got.astype(bool), expected, err_msg=name)
    else:
        np.testing.assert_allclose(got, expected, rtol=1e-6, atol=1e-12, err_msg=name)


@pytest.mark.parametrize("name", _binary_names())
def test_binary_numpy_parity(rng, name):
    ufunc = getattr(np, name)
    op = getattr(npbinary, name)
    if name in _BINARY_INT_ONLY:
        a = rng.integers(1, 30, 20, dtype=np.int64)
        b = rng.integers(1, 5, 20, dtype=np.int64)
        dtype = dtypes.INT64
    elif name in _BINARY_FLOAT_ONLY:
        a = rng.uniform(0.1, 3.0, 20)
        b = rng.uniform(0.1, 3.0, 20)
        dtype = dtypes.FP64
        if name == "ldexp":
            b = rng.integers(0, 6, 20).astype(np.float64)
    elif name in ("power", "float_power"):
        a = rng.uniform(0.2, 4.0, 20)  # positive base: real-valued result
        b = rng.uniform(-2.0, 3.0, 20)
        dtype = dtypes.FP64
    else:
        a = rng.uniform(-5.0, 5.0, 20)
        b = rng.uniform(0.5, 5.0, 20)
        dtype = dtypes.FP64
    if name == "ldexp":
        va = Vector.from_coo(np.arange(20), a, dtype, size=20)
        vb = Vector.from_coo(np.arange(20), b.astype(np.int64), dtypes.INT64, size=20)
        expected = np.ldexp(a, b.astype(np.int64))
    else:
        va = Vector.from_coo(np.arange(20), a, dtype, size=20)
        vb = Vector.from_coo(np.arange(20), b, dtype, size=20)
        expected = ufunc(a, b)
    got = va.ewise_mult(vb, op).new().to_coo()[1]
    if expected.dtype == np.bool_:
        np.testing.assert_array_equal(got.astype(bool), expected, err_msg=name)
    else:
        np.testing.assert_allclose(got, expected, rtol=1e-6, atol=1e-12, err_msg=name)


def test_mapnumpy_aliases_builtins():
    """With mapnumpy on (default), exact-match numpy names alias builtins
    (reference: unary/numpy.py:1-80 mapnumpy aliasing)."""
    import graphblas_tpu as gb

    if not gb.config.get("mapnumpy"):
        pytest.skip("mapnumpy off in this run")
    # add === plus, multiply === times, fabs/abs === abs
    v = Vector.from_coo([0, 1], [-2.5, 3.0], dtypes.FP64, size=2)
    np.testing.assert_array_equal(
        v.apply(npunary.absolute).new().to_coo()[1],
        v.apply(unary.abs).new().to_coo()[1],
    )
    w = v.ewise_mult(v, npbinary.add).new()
    np.testing.assert_array_equal(w.to_coo()[1], (v.ewise_mult(v, binary.plus)).new().to_coo()[1])
