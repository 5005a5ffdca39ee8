"""Typing/updater resolution rules and error paths (models reference
test_resolving.py)."""

import numpy as np
import pytest

import graphblas_tpu as gb
from graphblas_tpu import Matrix, Scalar, Vector, binary, dtypes, monoid, semiring, unary


@pytest.fixture
def v():
    return Vector.from_coo([0, 1], [1, 2], dtypes.INT64, size=3)


@pytest.fixture
def A():
    return Matrix.from_coo([0, 1], [1, 0], [1, 2], dtypes.INT64, nrows=2, ncols=2)


def test_update_shape_mismatch(v):
    w = Vector(dtypes.INT64, 4)
    with pytest.raises(gb.exceptions.DimensionMismatch):
        w << v.apply(unary.one)


def test_update_rank_mismatch(v, A):
    with pytest.raises(TypeError):
        v << A.mxm(A)
    with pytest.raises(TypeError):
        A << v


def test_bare_scalar_update_rejected(v):
    with pytest.raises(TypeError):
        v << 5


def test_multiple_masks_rejected(v):
    with pytest.raises(TypeError):
        v(v.S, v.S)


def test_multiple_accum_rejected(v):
    with pytest.raises(TypeError):
        v(binary.plus, binary.times)


def test_replace_without_mask(v):
    with pytest.raises(ValueError):
        v(replace=True) << v.apply(unary.one)


def test_mxm_requires_semiring(A):
    with pytest.raises(TypeError):
        A.mxm(A, binary.plus).new()


def test_reduce_binary_without_monoid(A):
    with pytest.raises(gb.exceptions.DomainMismatch):
        A.reduce_scalar(binary.minus).new()


def test_apply_binary_without_bound(A):
    with pytest.raises(TypeError):
        A.apply(binary.plus).new()


def test_apply_both_sides_rejected(A):
    with pytest.raises(TypeError):
        A.apply(binary.plus, right=1, left=2)


def test_op_dtype_rejection(A):
    f = A.dup(dtypes.FP64)
    with pytest.raises(KeyError):
        f.apply(unary.bnot).new()  # bnot is int-only


def test_updater_call_then_update(v):
    out = Vector(dtypes.INT64, 3)
    out(accum=binary.plus).update(v.apply(unary.one))
    assert out.to_dict() == {0: 1, 1: 1}
    out(accum="plus") << v.apply(unary.one)  # accum as string
    assert out.to_dict() == {0: 2, 1: 2}


def test_autocompute_off_blocks_delegation(v):
    with gb.config.set(autocompute=False):
        expr = v.apply(unary.one)
        with pytest.raises(TypeError):
            expr.nvals
    assert v.apply(unary.one).nvals == 2


def test_expression_new_with_mask(v):
    m = Vector.from_coo([0], [True], dtypes.BOOL, size=3)
    out = v.apply(unary.one).new(mask=m.S)
    assert out.to_dict() == {0: 1}


def test_typed_op_pinning(v):
    out = v.apply(binary.plus["FP64"], right=1).new()
    assert out.dtype == dtypes.FP64


def test_scalar_thunk_dtype(v):
    out = v.select("valuegt", Scalar.from_value(1)).new()
    assert out.to_dict() == {1: 2}


def test_transposed_matrix_ops(A):
    T = A.T
    assert T.shape == (2, 2)
    assert T.nvals == 2
    C = T.mxm(A).new()  # materializes the view then multiplies
    assert C.nvals == 2
    assert T.T is A


def test_indexing_errors(A):
    with pytest.raises(TypeError):
        A[0]  # matrix needs 2-tuple
    with pytest.raises(gb.exceptions.IndexOutOfBound):
        A[5, 0]
    with pytest.raises(TypeError):
        A[[0.5, 1], 0]
    v = Vector(dtypes.INT64, 3)
    with pytest.raises(TypeError):
        v[0, 1]


def test_wait_and_chaining(v):
    assert v.wait() is v
    w = Vector(dtypes.INT64, 3)
    w.update(v.apply(unary.one))
    assert w.nvals == 2


def test_per_call_engine_opts(A):
    import graphblas_tpu as gb

    ref = A.mxm(A, "plus_times").new()
    # per-call strategy override: every lowering computes the same result
    for strat in ("auto", "mxu", "generic", "pallas"):
        got = A.mxm(A, "plus_times").new(mxm_strategy=strat)
        assert got.isequal(ref), strat
    # via updater opts
    out = Matrix(gb.dtypes.INT64, 2, 2)
    out(mxm_strategy="generic") << A.mxm(A, "plus_times")
    assert out.isequal(ref)
    # accepted-but-ignored SuiteSparse-compat opts
    assert A.mxm(A, "plus_times").new(nthreads=4, sort=True).isequal(ref)
    # unknown opts are rejected
    with pytest.raises(ValueError):
        A.mxm(A, "plus_times").new(bogus_option=1)
    # global config context still works
    with gb.tx.config.set(mxm_strategy="generic"):
        assert A.mxm(A, "plus_times").new().isequal(ref)


def test_expression_recomputes_at_use():
    """Expressions are delayed: operand mutations before materialization are
    observed (reference: expressions carry operand references and compute at
    << / .new(), docs/user_guide/fundamentals.rst)."""
    v = Vector.from_coo([0, 1], [1.0, 2.0], dtypes.FP64, size=2)
    w = Vector.from_coo([0, 1], [10.0, 20.0], dtypes.FP64, size=2)
    expr = v.ewise_add(w, binary.plus)
    v[0] = 100.0
    assert expr.new().to_coo()[1].tolist() == [110.0, 22.0]
    # each .new() recomputes from current operand state
    e2 = v.ewise_mult(w, binary.times)
    assert e2.new().to_coo()[1].tolist() == [1000.0, 40.0]
    v[0] = 5.0
    assert e2.new().to_coo()[1].tolist() == [50.0, 40.0]
