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
