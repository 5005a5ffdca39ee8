"""Sparse (index, value) Vector storage — huge-dimension support.

Reference: hypersparse vectors scale to 2^60 indices
(/root/reference/graphblas/core/vector.py:682+, graphblas/__init__.py:210-213).
Here Vectors above tx.config['dense_limit'] use host-canonical sorted
(index, value) arrays; every op family routes through sparse paths without
densifying, and mxv/vxm over sparse operands produce sparse outputs.
"""

import numpy as np
import pytest

import graphblas_tpu as gb
import graphblas_tpu.tx as txmod
from graphblas_tpu import binary, monoid, semiring, unary
from graphblas_tpu.core import dtypes as dtm
from graphblas_tpu.core.matrix import Matrix
from graphblas_tpu.core.vector import Vector

HUGE = 1 << 40


def _sv(idx, vals, size=HUGE, dtype=dtm.FP64):
    return Vector.from_coo(idx, vals, dtype, size=size)


def test_huge_vector_storage_and_introspection():
    v = _sv([3, 10, HUGE - 1], [1.0, 2.0, 3.0])
    assert v._sparse is not None
    assert v.size == HUGE
    assert v.nvals == 3
    assert (HUGE - 1) in v
    assert 4 not in v
    assert v.get(10) == 2.0
    assert v.get(11, default=-1) == -1
    idx, vals = v.to_coo()
    assert idx.tolist() == [3, 10, HUGE - 1]
    assert vals.tolist() == [1.0, 2.0, 3.0]


def test_huge_vector_constructor_empty_and_clear():
    v = Vector(dtm.FP32, HUGE)
    assert v._sparse is not None and v.nvals == 0
    w = _sv([5], [7.0])
    w.clear()
    assert w.nvals == 0 and w.size == HUGE


def test_huge_vector_dup_and_isequal():
    v = _sv([1, 2, 1 << 35], [1.0, 2.0, 3.0])
    w = v.dup()
    assert w._sparse is not None
    assert v.isequal(w)
    w2 = v.dup(dtype=dtm.FP32)
    assert w2.dtype is dtm.FP32
    assert not v.isequal(_sv([1, 2], [1.0, 2.0]))


def test_huge_vector_from_coo_dup_op():
    v = Vector.from_coo([5, 5, 9], [1.0, 2.0, 4.0], dtm.FP64, size=HUGE, dup_op=binary.plus)
    assert v.nvals == 2
    assert v.get(5) == 3.0


def test_sparse_vec_ewise_mult_add_union():
    a = _sv([1, 5, 9, 1 << 33], [1.0, 2.0, 3.0, 4.0])
    b = _sv([5, 9, 11], [10.0, 20.0, 30.0])
    m = a.ewise_mult(b, binary.times).new()
    assert m._sparse is not None
    assert m.to_dict() == {5: 20.0, 9: 60.0}
    s = a.ewise_add(b, binary.plus).new()
    assert s.to_dict() == {1: 1.0, 5: 12.0, 9: 23.0, 11: 30.0, 1 << 33: 4.0}
    u = a.ewise_union(b, binary.minus, left_default=0.0, right_default=100.0).new()
    assert u.to_dict() == {1: -99.0, 5: -8.0, 9: -17.0, 11: -30.0, 1 << 33: -96.0}


def test_sparse_vec_ewise_mixed_with_dense():
    a = _sv([2, 4], [1.0, 2.0], size=HUGE)
    # dense operand of the same huge size cannot exist; use a sparse pair at
    # moderate size instead: one forced-sparse, one dense
    with txmod.config.set(dense_limit=0):
        c = Vector.from_coo([0, 2], [5.0, 6.0], dtm.FP64, size=8)
    assert c._sparse is not None
    d = Vector.from_coo([2, 3], [7.0, 8.0], dtm.FP64, size=8)
    assert d._sparse is None
    out = c.ewise_add(d, binary.plus).new()
    assert out.to_dict() == {0: 5.0, 2: 13.0, 3: 8.0}


def test_sparse_vec_apply_select_reduce():
    v = _sv([1, 4, 1 << 39], [1.0, -2.0, 3.0])
    a = v.apply(unary.abs).new()
    assert a._sparse is not None
    assert a.to_dict() == {1: 1.0, 4: 2.0, 1 << 39: 3.0}
    b = v.apply(binary.times, right=10).new()
    assert b.to_dict() == {1: 10.0, 4: -20.0, 1 << 39: 30.0}
    s = v.select("value>0").new()
    assert s.to_dict() == {1: 1.0, 1 << 39: 3.0}
    r = v.reduce(monoid.plus).new()
    assert r.value == 2.0
    r2 = v.reduce(monoid.min).new()
    assert r2.value == -2.0


def test_sparse_vec_apply_indexunary():
    v = _sv([7, 1 << 38], [5.0, 6.0])
    out = v.apply("rowindex", 0).new()
    assert out.to_dict() == {7: 7, (1 << 38): 1 << 38}


def test_huge_mxv_sparse_in_sparse_out():
    # A is (HUGE x HUGE) sparse; x sparse; y = A.mxv(x) must stay sparse
    rows = np.array([0, 1 << 30, 1 << 30, HUGE - 1])
    cols = np.array([5, 7, 1 << 20, 7])
    vals = np.array([2.0, 3.0, 4.0, 5.0])
    A = Matrix.from_coo(rows, cols, vals, dtm.FP64, nrows=HUGE, ncols=HUGE)
    assert A._sparse is not None
    x = _sv([5, 7], [10.0, 100.0])
    y = A.mxv(x, semiring.plus_times).new()
    assert y._sparse is not None
    assert y.to_dict() == {0: 20.0, 1 << 30: 300.0, HUGE - 1: 500.0}


def test_huge_vxm_sparse():
    rows = np.array([3, 5])
    cols = np.array([1 << 35, 2])
    vals = np.array([2.0, 3.0])
    A = Matrix.from_coo(rows, cols, vals, dtm.FP64, nrows=HUGE, ncols=HUGE)
    x = _sv([3, 5], [1.0, 10.0])
    y = x.vxm(A, semiring.plus_times).new()
    assert y._sparse is not None
    assert y.to_dict() == {1 << 35: 2.0, 2: 30.0}


def test_huge_mxv_min_plus_and_positional():
    rows = np.array([10, 10, 20])
    cols = np.array([1, 2, 1])
    vals = np.array([5.0, 1.0, 7.0])
    A = Matrix.from_coo(rows, cols, vals, dtm.FP64, nrows=HUGE, ncols=HUGE)
    x = _sv([1, 2], [100.0, 200.0])
    y = A.mxv(x, semiring.min_plus).new()
    assert y.to_dict() == {10: 105.0, 20: 107.0}
    # positional: any_secondi -> source (column) index of some matching edge
    y2 = A.mxv(x, semiring.min_secondi).new()
    assert y2.to_dict() == {10: 1, 20: 1}


def test_small_mxv_with_sparse_vector_gives_dense_out():
    # matrix output dim small: result is dense even though x is sparse
    with txmod.config.set(dense_limit=0):
        x = Vector.from_coo([0, 2], [1.0, 2.0], dtm.FP64, size=4)
    assert x._sparse is not None
    A = Matrix.from_dense(np.arange(12, dtype=np.float64).reshape(3, 4))
    y = A.mxv(x, semiring.plus_times).new()
    assert y._sparse is None
    np.testing.assert_allclose(y.to_dense(fill_value=0), [4.0, 16.0, 28.0])


def test_forced_sparse_matches_dense_semantics():
    rng = np.random.default_rng(0)
    idx = np.sort(rng.choice(64, size=20, replace=False))
    vals = rng.random(20)
    idx2 = np.sort(rng.choice(64, size=15, replace=False))
    vals2 = rng.random(15)
    dense_a = Vector.from_coo(idx, vals, dtm.FP64, size=64)
    dense_b = Vector.from_coo(idx2, vals2, dtm.FP64, size=64)
    with txmod.config.set(dense_limit=0):
        sp_a = Vector.from_coo(idx, vals, dtm.FP64, size=64)
        sp_b = Vector.from_coo(idx2, vals2, dtm.FP64, size=64)
    assert sp_a._sparse is not None
    for how in ("mult", "add"):
        d = getattr(dense_a, f"ewise_{how}")(dense_b, binary.plus).new()
        s = getattr(sp_a, f"ewise_{how}")(sp_b, binary.plus).new()
        assert dict(zip(*[x.tolist() for x in d.to_coo()])) == pytest.approx(
            dict(zip(*[x.tolist() for x in s.to_coo()]))
        )
    dr = dense_a.reduce(monoid.plus).new().value
    sr2 = sp_a.reduce(monoid.plus).new().value
    assert sr2 == pytest.approx(dr)


def test_sparse_vector_pickle_roundtrip():
    import pickle

    v = _sv([9, 1 << 36], [1.5, 2.5])
    w = pickle.loads(pickle.dumps(v))
    assert w.size == HUGE
    assert w.to_dict() == v.to_dict()


def test_sparse_vector_repr_does_not_densify():
    v = _sv([1, 1 << 33], [1.0, 2.0])
    r = repr(v)
    assert "1099511627776" in r or "Vector" in r
    assert v._sparse is not None  # repr must not densify
