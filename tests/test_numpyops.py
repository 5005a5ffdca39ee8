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


# ---------------------------------------------------------------------------
# monoid.numpy / semiring.numpy (reference: graphblas/monoid/numpy.py,
# graphblas/semiring/numpy.py; tests/test_numpyops.py monoid section)
# ---------------------------------------------------------------------------

from graphblas_tpu.monoid import numpy as npmonoid  # noqa: E402
from graphblas_tpu.semiring import numpy as npsemiring  # noqa: E402

_MONOID_FLOAT_ONLY = {"logaddexp", "logaddexp2", "hypot"}
_MONOID_INT_ONLY = {"gcd"}
_MONOID_BOOL_ONLY = {"equal", "logical_and", "logical_or", "logical_xor"}
_MONOID_UFUNC = {  # names whose reducing ufunc differs from the name
    "maximum": np.maximum, "minimum": np.minimum, "fmax": np.fmax, "fmin": np.fmin,
}


def _monoid_names():
    return sorted(npmonoid._monoid_identities)


@pytest.mark.parametrize("name", _monoid_names())
def test_monoid_numpy_parity(rng, name):
    """v.reduce(monoid.numpy.<name>) == np.<name>.reduce(values)."""
    op = getattr(npmonoid, name)
    if name in _MONOID_BOOL_ONLY:
        data = rng.integers(0, 2, 20).astype(bool)
        dtype = dtypes.BOOL
    elif name in _MONOID_INT_ONLY or name.startswith("bitwise"):
        data = rng.integers(1, 60, 20, dtype=np.int64)
        dtype = dtypes.INT64
    elif name in _MONOID_FLOAT_ONLY:
        data = rng.uniform(0.1, 4.0, 20)
        dtype = dtypes.FP64
    else:
        data = rng.uniform(-5.0, 5.0, 20)
        dtype = dtypes.FP64
    ufunc = _MONOID_UFUNC.get(name, getattr(np, name))
    v = Vector.from_coo(np.arange(20), data, dtype, size=20)
    got = v.reduce(op).new().value
    expected = ufunc.reduce(data)
    if dtype is dtypes.BOOL:
        assert bool(got) == bool(expected), name
    elif dtype is dtypes.INT64:
        assert int(got) == int(expected), name
    else:
        np.testing.assert_allclose(float(got), float(expected), rtol=1e-6, err_msg=name)


@pytest.mark.parametrize(
    "name",
    ["add_multiply", "logaddexp_add", "maximum_add", "minimum_add",
     "fmax_multiply", "logical_or_logical_and", "bitwise_xor_bitwise_and"],
)
def test_semiring_numpy_vxm_parity(rng, name):
    """Numpy semirings through the full DSL mxv path vs a dense oracle."""
    sr = getattr(npsemiring, name)
    m, b = npsemiring._split(name)
    if m in _MONOID_BOOL_ONLY or m.startswith("logical"):
        a = rng.integers(0, 2, (5, 5)).astype(bool)
        x = rng.integers(0, 2, 5).astype(bool)
        dtype = dtypes.BOOL
    elif m.startswith("bitwise") or m in _MONOID_INT_ONLY:
        a = rng.integers(1, 30, (5, 5), dtype=np.int64)
        x = rng.integers(1, 30, 5, dtype=np.int64)
        dtype = dtypes.INT64
    else:
        a = rng.uniform(0.1, 3.0, (5, 5))
        x = rng.uniform(0.1, 3.0, 5)
        dtype = dtypes.FP64
    from graphblas_tpu import Matrix

    A = Matrix.from_dense(a, dtype=dtype)
    v = Vector.from_dense(x, dtype=dtype)
    got = np.asarray(v.vxm(A, sr).new()._values)
    mul_ufunc = getattr(np, b if b not in ("plus", "add") else "add")
    red_ufunc = _MONOID_UFUNC.get(m, getattr(np, m))
    expected = red_ufunc.reduce(mul_ufunc(x[:, None], a), axis=0)
    if dtype is dtypes.FP64:
        np.testing.assert_allclose(got, expected, rtol=1e-6, err_msg=name)
    else:
        np.testing.assert_array_equal(got.astype(expected.dtype), expected, err_msg=name)


def test_semiring_numpy_names_and_exclusions():
    # excluded cross-domain combos are absent (reference :28-117)
    assert "equal_gcd" not in npsemiring._semiring_names
    assert "bitwise_and_arctan2" not in npsemiring._semiring_names
    assert "hypot_bitwise_or" not in npsemiring._semiring_names
    assert "equal_subtract" not in npsemiring._semiring_names
    assert "gcd_less" not in npsemiring._semiring_names
    # present names resolve; bad names raise AttributeError
    assert "add_multiply" in dir(npsemiring)
    with pytest.raises(AttributeError):
        npsemiring.not_a_semiring
    with pytest.raises(AttributeError):
        npmonoid.not_a_monoid
    # underscore-splitting finds multi-word monoids
    assert npsemiring._split("logical_and_bitwise_or") == ("logical_and", "bitwise_or")


def test_monoid_numpy_domain_restriction():
    import graphblas_tpu as gb

    with gb.config.set(mapnumpy=False):
        npmonoid.__dict__.pop("logical_and", None)
        la = npmonoid.logical_and
        assert la.name == "numpy.logical_and"
        with pytest.raises(KeyError):
            la[dtypes.INT64]
        assert la[dtypes.BOOL].identity
    npmonoid.__dict__.pop("logical_and", None)
