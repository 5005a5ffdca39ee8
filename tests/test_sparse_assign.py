"""Sparse-native assign / extract / delete + unmasked sparse SpGEMM.

Reference: extract planner core/matrix.py:3051-3087, assign planner
core/matrix.py:3116-3529, GrB_mxm sparse output core/matrix.py:2264-2331.
Sparse collections must run these without densifying (the FastSV hot loop is
assign/extract — VERDICT r2 missing #3), validated both at huge (2^40)
dimensions and differentially against the dense engine at small sizes.
"""

import numpy as np
import pytest

import graphblas_tpu as gb
import graphblas_tpu.tx as txmod
from graphblas_tpu import binary, semiring
from graphblas_tpu.core import dtypes as dtm
from graphblas_tpu.core.matrix import Matrix
from graphblas_tpu.core.vector import Vector

HUGE = 1 << 40


def _huge_matrix():
    rows = np.array([0, 5, 5, 1 << 30, HUGE - 1])
    cols = np.array([1, 2, 1 << 35, 3, 4])
    vals = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    return Matrix.from_coo(rows, cols, vals, dtm.FP64, nrows=HUGE, ncols=HUGE)


# ---------------------------------------------------------------------------
# extract
# ---------------------------------------------------------------------------


def test_huge_extract_submatrix():
    A = _huge_matrix()
    C = A[[0, 5, 1 << 30], [1, 2, 3]].new()
    assert C.shape == (3, 3)
    assert C.to_dicts() == {0: {0: 1.0}, 1: {1: 2.0}, 2: {2: 4.0}}


def test_huge_extract_row_and_col():
    A = _huge_matrix()
    w = A[5, :].new()
    assert w._sparse is not None
    assert w.size == HUGE
    assert w.to_dict() == {2: 2.0, (1 << 35): 3.0}
    v = A[:, 2].new()
    assert v.to_dict() == {5: 2.0}


def test_huge_extract_full_slices():
    A = _huge_matrix()
    C = A[:, :].new()
    assert C._sparse is not None
    assert C.isequal(A)


def test_huge_extract_element():
    A = _huge_matrix()
    assert A[5, 2].new().value == 2.0
    assert A[6, 2].new().is_empty
    assert A[HUGE - 1, 4].new().value == 5.0


def test_huge_vector_extract():
    v = Vector.from_coo([3, 10, 1 << 35], [1.0, 2.0, 3.0], dtm.FP64, size=HUGE)
    w = v[[10, 3, 4]].new()
    assert w.to_dict() == {0: 2.0, 1: 1.0}
    full = v[:].new()
    assert full._sparse is not None
    assert full.isequal(v)
    assert v[1 << 35].new().value == 3.0


def test_extract_duplicate_indices_matches_dense():
    rng = np.random.default_rng(1)
    r = rng.integers(0, 16, 30)
    c = rng.integers(0, 16, 30)
    v = rng.random(30)
    dense = Matrix.from_coo(r, c, v, dtm.FP64, nrows=16, ncols=16, dup_op=binary.plus)
    with txmod.config.set(dense_limit=0):
        sp = Matrix.from_coo(r, c, v, dtm.FP64, nrows=16, ncols=16, dup_op=binary.plus)
    assert sp._sparse is not None
    idx_r = [0, 3, 3, 7]
    idx_c = [1, 1, 5]
    d_out = dense[idx_r, idx_c].new()
    s_out = sp[idx_r, idx_c].new()
    assert d_out.to_dicts() == s_out.to_dicts()


# ---------------------------------------------------------------------------
# assign / delete
# ---------------------------------------------------------------------------


def test_huge_element_assign_and_delete():
    A = _huge_matrix()
    A[7, 8] = 9.5
    assert A._sparse is not None
    assert A.nvals == 6
    assert A[7, 8].new().value == 9.5
    A[5, 2] = 20.0  # overwrite existing
    assert A[5, 2].new().value == 20.0
    assert A.nvals == 6
    del A[7, 8]
    assert A.nvals == 5


def test_huge_row_assign_with_vector():
    A = _huge_matrix()
    v = Vector.from_coo([2, 1 << 20], [7.0, 8.0], dtm.FP64, size=HUGE)
    A[5, :] = v
    assert A._sparse is not None
    w = A[5, :].new()
    # region replaced: old (5, 1<<35) entry removed
    assert w.to_dict() == {2: 7.0, (1 << 20): 8.0}
    assert A.nvals == 5


def test_huge_assign_with_accum():
    A = _huge_matrix()
    v = Vector.from_coo([2, 9], [10.0, 1.0], dtm.FP64, size=HUGE)
    A(accum=binary.plus)[5, :] = v
    w = A[5, :].new()
    assert w.to_dict() == {2: 12.0, 9: 1.0, (1 << 35): 3.0}


def test_huge_scalar_region_assign():
    A = _huge_matrix()
    A[[1, 2], [3, 4]] = 5.5
    assert A.nvals == 9
    assert A[1, 3].new().value == 5.5
    assert A[2, 4].new().value == 5.5


def test_huge_scalar_fill_guard():
    A = _huge_matrix()
    with pytest.raises(gb.exceptions.OutOfMemory, match="iso"):
        A[:, 5] = 1.0


def test_huge_region_delete():
    A = _huge_matrix()
    del A[[5, 0], [1, 2, 1 << 35]]
    assert A.to_dicts() == {1 << 30: {3: 4.0}, HUGE - 1: {4: 5.0}}


def test_huge_vector_assign_delete():
    v = Vector.from_coo([3, 10], [1.0, 2.0], dtm.FP64, size=HUGE)
    v[1 << 30] = 7.0
    assert v.nvals == 3
    v[[3, 4]] = Vector.from_coo([0, 1], [8.0, 9.0], dtm.FP64, size=2)
    assert v.to_dict() == {3: 8.0, 4: 9.0, 10: 2.0, 1 << 30: 7.0}
    del v[[10, 4]]
    assert v.to_dict() == {3: 8.0, 1 << 30: 7.0}
    v(accum=binary.plus)[3] = 2.0
    assert v.get(3) == 10.0


def test_sparse_assign_matches_dense_random():
    rng = np.random.default_rng(2)
    n = 24
    r = rng.integers(0, n, 60)
    c = rng.integers(0, n, 60)
    v = rng.random(60)
    dense = Matrix.from_coo(r, c, v, dtm.FP64, nrows=n, ncols=n, dup_op=binary.plus)
    with txmod.config.set(dense_limit=0):
        sp = Matrix.from_coo(r, c, v, dtm.FP64, nrows=n, ncols=n, dup_op=binary.plus)
    rows_ix = [3, 11, 7]
    cols_ix = [0, 5]
    val = Matrix.from_coo([0, 1, 2], [0, 1, 1], [1.5, 2.5, 3.5], dtm.FP64, nrows=3, ncols=2)
    dense[rows_ix, cols_ix] = val
    sp[rows_ix, cols_ix] = val
    assert sp._sparse is not None
    assert dense.to_dicts() == sp.to_dicts()
    # accum variant
    dense(accum=binary.plus)[rows_ix, cols_ix] = val
    sp(accum=binary.plus)[rows_ix, cols_ix] = val
    for rr, row in dense.to_dicts().items():
        srow = sp.to_dicts()[rr]
        for cc2, vv in row.items():
            assert srow[cc2] == pytest.approx(vv)
    # scalar region + delete
    dense[[0, 1], [2, 3]] = 9.0
    sp[[0, 1], [2, 3]] = 9.0
    assert dense.to_dicts() == sp.to_dicts()
    del dense[3, :]
    del sp[3, :]
    assert dense.to_dicts() == sp.to_dicts()


# ---------------------------------------------------------------------------
# unmasked sparse x sparse mxm -> sparse output
# ---------------------------------------------------------------------------


def test_huge_unmasked_mxm_sparse_output():
    rows = np.array([0, 0, 1 << 30])
    cols = np.array([2, 3, 2])
    vals = np.array([1.0, 2.0, 3.0])
    A = Matrix.from_coo(rows, cols, vals, dtm.FP64, nrows=HUGE, ncols=HUGE)
    B = Matrix.from_coo([2, 3], [1 << 39, 1 << 39], [10.0, 100.0], dtm.FP64, nrows=HUGE, ncols=HUGE)
    C = A.mxm(B, semiring.plus_times).new()
    assert C._sparse is not None
    assert C.to_dicts() == {0: {1 << 39: 210.0}, 1 << 30: {1 << 39: 30.0}}


def test_unmasked_mxm_matches_dense_random():
    rng = np.random.default_rng(3)
    n = 20
    a_r = rng.integers(0, n, 50)
    a_c = rng.integers(0, n, 50)
    a_v = rng.random(50)
    b_r = rng.integers(0, n, 50)
    b_c = rng.integers(0, n, 50)
    b_v = rng.random(50)
    A_d = Matrix.from_coo(a_r, a_c, a_v, dtm.FP64, nrows=n, ncols=n, dup_op=binary.plus)
    B_d = Matrix.from_coo(b_r, b_c, b_v, dtm.FP64, nrows=n, ncols=n, dup_op=binary.plus)
    with txmod.config.set(dense_limit=0):
        A_s = Matrix.from_coo(a_r, a_c, a_v, dtm.FP64, nrows=n, ncols=n, dup_op=binary.plus)
        B_s = Matrix.from_coo(b_r, b_c, b_v, dtm.FP64, nrows=n, ncols=n, dup_op=binary.plus)
    for sr in (semiring.plus_times, semiring.min_plus, semiring.max_first):
        C_d = A_d.mxm(B_d, sr).new()
        C_s = A_s.mxm(B_s, sr).new()
        assert C_s._sparse is not None
        dd = C_d.to_dicts()
        ss = C_s.to_dicts()
        assert set(dd) == set(ss)
        for rr in dd:
            assert set(dd[rr]) == set(ss[rr])
            for cc in dd[rr]:
                assert ss[rr][cc] == pytest.approx(dd[rr][cc])


def test_unmasked_mxm_transposed_operands():
    rng = np.random.default_rng(4)
    n = 12
    a_r = rng.integers(0, n, 30)
    a_c = rng.integers(0, n, 30)
    a_v = rng.random(30)
    A_d = Matrix.from_coo(a_r, a_c, a_v, dtm.FP64, nrows=n, ncols=n, dup_op=binary.plus)
    with txmod.config.set(dense_limit=0):
        A_s = Matrix.from_coo(a_r, a_c, a_v, dtm.FP64, nrows=n, ncols=n, dup_op=binary.plus)
    C_d = A_d.T.mxm(A_d, semiring.plus_times).new()
    C_s = A_s.T.mxm(A_s, semiring.plus_times).new()
    dd, ss = C_d.to_dicts(), C_s.to_dicts()
    assert set(dd) == set(ss)
    for rr in dd:
        for cc in dd[rr]:
            assert ss[rr][cc] == pytest.approx(dd[rr][cc])


def test_unmasked_mxm_flop_guard():
    n = 1 << 30
    rows = np.arange(600)
    A = Matrix.from_coo(rows, np.zeros(600, np.int64), np.ones(600), dtm.FP64, nrows=n, ncols=n)
    B = Matrix.from_coo(np.zeros(600, np.int64), rows, np.ones(600), dtm.FP64, nrows=n, ncols=n)
    with txmod.config.set(spgemm_flop_limit=1000):
        with pytest.raises(gb.exceptions.OutOfMemory, match="flop_limit"):
            A.mxm(B, semiring.plus_times).new()


def test_unmasked_mxm_positional_semiring():
    with txmod.config.set(dense_limit=0):
        A = Matrix.from_coo([0, 1], [1, 2], [1.0, 1.0], dtm.FP64, nrows=3, ncols=3)
        B = Matrix.from_coo([1, 2], [0, 0], [1.0, 1.0], dtm.FP64, nrows=3, ncols=3)
    C = A.mxm(B, semiring.min_secondi).new()
    # secondi = k (inner index): C[0,0] via k=1, C[1,0] via k=2
    assert C.to_dicts() == {0: {0: 1}, 1: {0: 2}}
