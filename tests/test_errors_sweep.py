"""Error-contract sweep: the typed exceptions every misuse must raise.

Reference: exceptions.py hierarchy + the validation sites throughout
core/{matrix,vector,base,expr}.py (DimensionMismatch, IndexOutOfBound,
EmptyObject, TypeError/ValueError contracts).
"""

import numpy as np
import pytest

import graphblas_tpu as gb  # noqa: F401
from graphblas_tpu import binary, exceptions as exc, monoid, semiring
from graphblas_tpu.core import dtypes
from graphblas_tpu.core.matrix import Matrix
from graphblas_tpu.core.scalar import Scalar
from graphblas_tpu.core.vector import Vector


def _m(nr=3, nc=4):
    return Matrix.from_coo([0, 1], [1, 2], [1.0, 2.0], nrows=nr, ncols=nc)


def _v(n=4):
    return Vector.from_coo([0, 2], [1.0, 2.0], size=n)


def test_mxm_dim_mismatch():
    with pytest.raises(exc.DimensionMismatch):
        _m(3, 4).mxm(_m(3, 4), semiring.plus_times).new()


def test_mxv_dim_mismatch():
    with pytest.raises(exc.DimensionMismatch):
        _m(3, 4).mxv(_v(3), semiring.plus_times).new()


def test_vxm_dim_mismatch():
    with pytest.raises(exc.DimensionMismatch):
        _v(3).vxm(_m(4, 3), semiring.plus_times).new()


def test_ewise_shape_mismatch():
    with pytest.raises(exc.DimensionMismatch):
        _m(3, 4).ewise_add(_m(4, 3), binary.plus).new()


def test_ewise_vector_size_mismatch():
    with pytest.raises(exc.DimensionMismatch):
        _v(4).ewise_mult(_v(5), binary.times).new()


def test_extract_index_out_of_bounds():
    with pytest.raises(exc.IndexOutOfBound):
        _m()[[0, 5], [0]].new()


def test_extract_negative_wraps():
    got = _v(4)[-4].new()
    assert float(got.value) == 1.0


def test_extract_negative_out_of_bounds():
    with pytest.raises(exc.IndexOutOfBound):
        _v(4)[[-5]].new()


def test_assign_index_out_of_bounds():
    v = _v(4)
    with pytest.raises(exc.IndexOutOfBound):
        v[[7]] = 1.0


def test_assign_shape_mismatch():
    v = _v(4)
    with pytest.raises(exc.DimensionMismatch):
        v[[0, 1]] = Vector.from_dense(np.ones(3))


def test_from_coo_out_of_bounds():
    with pytest.raises(exc.IndexOutOfBound):
        Matrix.from_coo([5], [0], [1.0], nrows=3, ncols=3)


def test_mask_shape_mismatch():
    v = _v(4)
    m = _v(5)
    with pytest.raises((exc.DimensionMismatch, TypeError, ValueError)):
        v(m.S) << _v(4).apply(binary.plus, right=1)
        v._get_value() if hasattr(v, "_get_value") else None


def test_empty_scalar_indexing():
    s = Scalar(dtypes.FP64)
    v = _v(4)
    with pytest.raises(exc.EmptyObject):
        v[s].new()


def test_bool_indexing_rejected():
    with pytest.raises(TypeError, match="[Bb]oolean"):
        _v(4)[[True, False, True, False]].new()


def test_float_indexing_rejected():
    with pytest.raises(TypeError):
        _v(4)[[0.5]].new()


def test_unknown_op_string():
    with pytest.raises(ValueError):
        _v(4).ewise_mult(_v(4), "definitely_not_an_op").new()


def test_unary_for_binary_slot():
    from graphblas_tpu import unary

    with pytest.raises(TypeError):
        _v(4).ewise_mult(_v(4), unary.sqrt).new()


def test_apply_binary_without_bind():
    with pytest.raises(TypeError):
        _v(4).apply(binary.plus).new()


def test_reduce_with_binary_nonmonoid():
    # reference raises DomainMismatch for a binaryop with no monoid
    with pytest.raises(exc.DomainMismatch):
        _v(4).reduce(binary.minus).new()


def test_resize_smaller_dims():
    m = _m(3, 4)
    m.resize(2, 2)
    assert m.shape == (2, 2)
    assert m.nvals == 1  # (0,1) survives; (1,2) clipped


def test_wrong_value_type_for_assign():
    v = _v(4)
    with pytest.raises(TypeError):
        v[[0]] = object()


def test_updater_replace_without_mask():
    v = _v(4)
    with pytest.raises((TypeError, ValueError)):
        v(replace=True) << _v(4).apply(binary.plus, right=1)


def test_kron_requires_binary():
    from graphblas_tpu import unary

    with pytest.raises(TypeError):
        _m().kronecker(_m(), unary.sqrt).new()


def test_contains_wrong_arity():
    m = _m()
    with pytest.raises((TypeError, exc.DimensionMismatch)):
        (0,) in m


def test_dup_clears_independence():
    v = _v(4)
    w = v.dup()
    w[0] = 99.0
    assert float(v[0].new().value) == 1.0
