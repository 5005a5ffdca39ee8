"""Matrix semantics vs the dict oracle.

Models the coverage style of reference graphblas/tests/test_matrix.py.
"""

import numpy as np
import pytest

import graphblas_tpu as gb
from graphblas_tpu import Matrix, Vector, binary, dtypes, monoid, semiring, unary

import oracle as orc


@pytest.fixture
def A():
    # the docs example matrix (reference README / intro notebook)
    rows = [0, 0, 1, 1, 2, 3, 3, 4, 5, 6, 6, 6]
    cols = [1, 3, 4, 6, 5, 0, 2, 5, 2, 2, 3, 4]
    vals = [2, 3, 8, 4, 1, 3, 3, 7, 1, 5, 7, 3]
    return Matrix.from_coo(rows, cols, vals, dtypes.INT64, nrows=7, ncols=7)


@pytest.fixture
def v():
    return Vector.from_coo([1, 3, 4, 6], [1, 1, 2, 3], dtypes.INT64, size=7)


def test_new_and_properties():
    m = Matrix(dtypes.FP64, 4, 5, name="m")
    assert m.nrows == 4
    assert m.ncols == 5
    assert m.shape == (4, 5)
    assert m.nvals == 0
    assert m.dtype == dtypes.FP64
    assert m.name == "m"


def test_from_coo_roundtrip(A):
    r, c, v = A.to_coo()
    B = Matrix.from_coo(r, c, v, nrows=7, ncols=7)
    assert B.isequal(A, check_dtype=True)
    assert A.nvals == 12


def test_from_coo_dup_op():
    with pytest.raises(ValueError):
        Matrix.from_coo([0, 0], [0, 0], [1, 2], nrows=1, ncols=1)
    m = Matrix.from_coo([0, 0], [0, 0], [1, 2], nrows=1, ncols=1, dup_op=binary.plus)
    assert m[0, 0].new().value == 3
    m = Matrix.from_coo([0, 0], [0, 0], [1, 2], nrows=1, ncols=1, dup_op=binary.max)
    assert m[0, 0].new().value == 2


def test_build_not_empty(A):
    with pytest.raises(gb.exceptions.OutputNotEmpty):
        A.build([0], [0], [1])
    A.build([0], [0], [9], clear=True)
    assert A.nvals == 1


def test_dup_and_clear(A):
    B = A.dup()
    assert B.isequal(A)
    B.clear()
    assert B.nvals == 0
    assert A.nvals == 12
    C = A.dup(dtypes.FP64)
    assert C.dtype == dtypes.FP64
    assert C.isclose(A)


def test_resize(A):
    d = orc.to_dict(A)
    A.resize(10, 10)
    assert A.shape == (10, 10)
    assert orc.to_dict(A) == d
    A.resize(3, 3)
    assert orc.to_dict(A) == {k: val for k, val in d.items() if k[0] < 3 and k[1] < 3}


def test_mxm_plus_times(A):
    d = orc.to_dict(A)
    expected = orc.mxm(d, d, lambda x, y: x + y, orc.simple_mul(lambda x, y: x * y))
    C = A.mxm(A, semiring.plus_times).new()
    orc.assert_equal_dicts(orc.to_dict(C), expected)


@pytest.mark.parametrize(
    "sr_name,add,mul",
    [
        ("min_plus", min, lambda x, y: x + y),
        ("max_times", max, lambda x, y: x * y),
        ("plus_plus", lambda x, y: x + y, lambda x, y: x + y),
        ("min_first", min, lambda x, y: x),
        ("min_second", min, lambda x, y: y),
        ("plus_pair", lambda x, y: x + y, lambda x, y: 1),
        ("min_max", min, max),
        ("plus_min", lambda x, y: x + y, min),
    ],
)
def test_mxm_semirings(A, sr_name, add, mul):
    d = orc.to_dict(A)
    expected = orc.mxm(d, d, add, orc.simple_mul(mul))
    C = A.mxm(A, getattr(semiring, sr_name)).new()
    orc.assert_equal_dicts(orc.to_dict(C), expected)


def test_mxm_positional(A):
    d = orc.to_dict(A)
    # min_secondi: value is the k index of b
    expected = orc.mxm(d, d, min, lambda x, y, i, k, j: k)
    C = A.mxm(A, semiring.min_secondi).new()
    orc.assert_equal_dicts(orc.to_dict(C), expected)
    # any_secondi has arbitrary choice: check pattern + value is a valid k
    C2 = A.mxm(A, semiring.any_secondi).new()
    assert set(orc.to_dict(C2)) == set(expected)
    for (i, j), k in orc.to_dict(C2).items():
        assert (i, k) in d and (k, j) in d


def test_mxm_rectangular(rng):
    da = orc.random_matrix_dict(rng, 5, 8, 0.4)
    db = orc.random_matrix_dict(rng, 8, 3, 0.4)
    A = orc.matrix_from_dict(gb, da, 5, 8)
    B = orc.matrix_from_dict(gb, db, 8, 3)
    C = A.mxm(B, semiring.plus_times).new()
    expected = orc.mxm(da, db, lambda x, y: x + y, orc.simple_mul(lambda x, y: x * y))
    orc.assert_equal_dicts(orc.to_dict(C), expected, rel=1e-10)
    with pytest.raises(gb.exceptions.DimensionMismatch):
        B.mxm(A.T.new()).new()


def test_mxm_transpose(A):
    d = orc.to_dict(A)
    dT = {(j, i): v for (i, j), v in d.items()}
    C = A.T.mxm(A, semiring.plus_times).new()
    expected = orc.mxm(dT, d, lambda x, y: x + y, orc.simple_mul(lambda x, y: x * y))
    orc.assert_equal_dicts(orc.to_dict(C), expected)
    C2 = A.mxm(A.T, semiring.plus_times).new()
    expected2 = orc.mxm(d, dT, lambda x, y: x + y, orc.simple_mul(lambda x, y: x * y))
    orc.assert_equal_dicts(orc.to_dict(C2), expected2)


def test_mxv(A, v):
    da, dv = orc.to_dict(A), orc.to_dict(v)
    dvm = {(k, 0): val for k, val in dv.items()}
    expected = {i: val for (i, _), val in orc.mxm(da, dvm, min, orc.simple_mul(lambda x, y: x + y)).items()}
    w = A.mxv(v, semiring.min_plus).new()
    orc.assert_equal_dicts(orc.to_dict(w), expected)


def test_vxm(A, v):
    da, dv = orc.to_dict(A), orc.to_dict(v)
    dvm = {(0, k): val for k, val in dv.items()}
    expected = {j: val for (_, j), val in orc.mxm(dvm, da, lambda x, y: x + y, orc.simple_mul(lambda x, y: x * y)).items()}
    w = v.vxm(A, semiring.plus_times).new()
    orc.assert_equal_dicts(orc.to_dict(w), expected)


@pytest.mark.parametrize("dtype", [dtypes.INT32, dtypes.FP32, dtypes.INT64])
def test_mxm_dtypes(rng, dtype):
    da = orc.random_matrix_dict(rng, 6, 6, 0.4, dtype.np_type, 0, 5)
    A = orc.matrix_from_dict(gb, da, 6, 6, dtype)
    C = A.mxm(A, semiring.plus_times).new()
    expected = orc.mxm(da, da, lambda x, y: x + y, orc.simple_mul(lambda x, y: x * y))
    got = orc.to_dict(C)
    assert set(got) == set(expected)
    for k in expected:
        if dtype._is_float:
            assert np.isclose(got[k], expected[k], rtol=1e-5)
        else:
            assert got[k] == expected[k]


def test_ewise_add_mult_union(A, rng):
    db = orc.random_matrix_dict(rng, 7, 7, 0.3, np.int64, 1, 5)
    B = orc.matrix_from_dict(gb, db, 7, 7, dtypes.INT64)
    da = orc.to_dict(A)
    got = A.ewise_add(B, binary.plus).new()
    orc.assert_equal_dicts(orc.to_dict(got), orc.ewise_add(da, db, lambda x, y: x + y))
    got = A.ewise_mult(B, binary.times).new()
    orc.assert_equal_dicts(orc.to_dict(got), orc.ewise_mult(da, db, lambda x, y: x * y))
    got = A.ewise_union(B, binary.minus, 100, -100).new()
    orc.assert_equal_dicts(
        orc.to_dict(got), orc.ewise_union(da, db, lambda x, y: x - y, 100, -100)
    )


def test_ewise_mult_different_return(A):
    got = A.ewise_mult(A, binary.eq).new()
    assert got.dtype == dtypes.BOOL
    d = orc.to_dict(A)
    orc.assert_equal_dicts(orc.to_dict(got), {k: True for k in d})


def test_apply(A):
    d = orc.to_dict(A)
    got = A.apply(unary.ainv).new()
    orc.assert_equal_dicts(orc.to_dict(got), {k: -v for k, v in d.items()})
    got = A.apply(binary.minus, right=1).new()
    orc.assert_equal_dicts(orc.to_dict(got), {k: v - 1 for k, v in d.items()})
    got = A.apply(binary.minus, left=1).new()
    orc.assert_equal_dicts(orc.to_dict(got), {k: 1 - v for k, v in d.items()})
    got = A.apply(unary.sqrt).new()  # int -> fp64 coercion
    assert got.dtype == dtypes.FP64
    orc.assert_equal_dicts(orc.to_dict(got), {k: float(np.sqrt(v)) for k, v in d.items()}, rel=1e-12)


def test_apply_indexunary(A):
    import graphblas_tpu.indexunary as indexunary

    d = orc.to_dict(A)
    got = A.apply(indexunary.rowindex).new()
    orc.assert_equal_dicts(orc.to_dict(got), {k: k[0] for k in d})
    got = A.apply(indexunary.colindex, thunk=2).new()
    orc.assert_equal_dicts(orc.to_dict(got), {k: k[1] + 2 for k in d})


def test_select(A):
    import graphblas_tpu.select as select

    d = orc.to_dict(A)
    got = A.select(select.tril).new()
    orc.assert_equal_dicts(orc.to_dict(got), {k: v for k, v in d.items() if k[1] <= k[0]})
    got = A.select(select.triu, 1).new()
    orc.assert_equal_dicts(orc.to_dict(got), {k: v for k, v in d.items() if k[1] >= k[0] + 1})
    got = A.select(select.valuegt, 3).new()
    orc.assert_equal_dicts(orc.to_dict(got), {k: v for k, v in d.items() if v > 3})
    got = A.select("valuele", 2).new()
    orc.assert_equal_dicts(orc.to_dict(got), {k: v for k, v in d.items() if v <= 2})


def test_reduce(A):
    d = orc.to_dict(A)
    got = A.reduce_rowwise(monoid.plus).new()
    orc.assert_equal_dicts(orc.to_dict(got), orc.reduce_rowwise(d, lambda x, y: x + y))
    got = A.reduce_columnwise(monoid.max).new()
    dT = {(j, i): v for (i, j), v in d.items()}
    orc.assert_equal_dicts(orc.to_dict(got), orc.reduce_rowwise(dT, max))
    got = A.reduce_scalar(monoid.plus).new()
    assert got.value == orc.reduce_all(d, lambda x, y: x + y)
    got = A.reduce_scalar(monoid.min).new()
    assert got.value == orc.reduce_all(d, min)
    # binary op with monoid works
    got = A.reduce_scalar(binary.plus).new()
    assert got.value == orc.reduce_all(d, lambda x, y: x + y)


def test_reduce_empty():
    m = Matrix(dtypes.INT64, 3, 3)
    s = m.reduce_scalar(monoid.plus).new()
    assert s.is_empty
    s = m.reduce_scalar(monoid.plus, allow_empty=False).new()
    assert s.value == 0


def test_kronecker(rng):
    da = orc.random_matrix_dict(rng, 3, 2, 0.6, np.int64, 1, 5)
    db = orc.random_matrix_dict(rng, 2, 3, 0.6, np.int64, 1, 5)
    A = orc.matrix_from_dict(gb, da, 3, 2, dtypes.INT64)
    B = orc.matrix_from_dict(gb, db, 2, 3, dtypes.INT64)
    got = A.kronecker(B, binary.times).new()
    expected = {}
    for (i1, j1), v1 in da.items():
        for (i2, j2), v2 in db.items():
            expected[(i1 * 2 + i2, j1 * 3 + j2)] = v1 * v2
    orc.assert_equal_dicts(orc.to_dict(got), expected)


def test_transpose(A):
    d = orc.to_dict(A)
    got = A.T.new()
    orc.assert_equal_dicts(orc.to_dict(got), {(j, i): v for (i, j), v in d.items()})
    assert A.T.T is A
    assert A.T.nrows == A.ncols


def test_extract(A):
    d = orc.to_dict(A)
    got = A[[0, 2, 4], [1, 3]].new()
    expected = {}
    for oi, i in enumerate([0, 2, 4]):
        for oj, j in enumerate([1, 3]):
            if (i, j) in d:
                expected[(oi, oj)] = d[(i, j)]
    orc.assert_equal_dicts(orc.to_dict(got), expected)
    # row and column extraction
    got = A[0, :].new()
    orc.assert_equal_dicts(orc.to_dict(got), {j: v for (i, j), v in d.items() if i == 0})
    got = A[:, 2].new()
    orc.assert_equal_dicts(orc.to_dict(got), {i: v for (i, j), v in d.items() if j == 2})
    # strided slice
    got = A[::2, :].new()
    expected = {(i // 2, j): v for (i, j), v in d.items() if i % 2 == 0}
    orc.assert_equal_dicts(orc.to_dict(got), expected)
    # negative index
    assert A[-1, 2].new().value == d[(6, 2)]
    # element
    assert A[0, 1].new().value == 2
    assert A[0, 0].new().is_empty


def test_extract_with_mask(A, v):
    d = orc.to_dict(A)
    w = Vector(dtypes.INT64, 7)
    w(v.S) << A[:, 2]
    col = {i: val for (i, j), val in d.items() if j == 2}
    expected = {i: val for i, val in col.items() if i in orc.to_dict(v)}
    orc.assert_equal_dicts(orc.to_dict(w), expected)


def test_assign_scalar(A):
    d = orc.to_dict(A)
    A[0, 0] = 99
    d[(0, 0)] = 99
    orc.assert_equal_dicts(orc.to_dict(A), d)
    A[1, :] = 5
    for j in range(7):
        d[(1, j)] = 5
    orc.assert_equal_dicts(orc.to_dict(A), d)
    A[[2, 3], [0, 1]] = 7
    for i in (2, 3):
        for j in (0, 1):
            d[(i, j)] = 7
    orc.assert_equal_dicts(orc.to_dict(A), d)


def test_assign_vector_row_col(A, v):
    d = orc.to_dict(A)
    dv = orc.to_dict(v)
    A[2, :] = v
    d = {k: val for k, val in d.items() if k[0] != 2}
    for j, val in dv.items():
        d[(2, j)] = val
    orc.assert_equal_dicts(orc.to_dict(A), d)
    A[:, 0] = v
    d = {k: val for k, val in d.items() if k[1] != 0}
    for i, val in dv.items():
        d[(i, 0)] = val
    orc.assert_equal_dicts(orc.to_dict(A), d)


def test_assign_matrix_region(A, rng):
    d = orc.to_dict(A)
    db = orc.random_matrix_dict(rng, 2, 2, 0.7, np.int64, 1, 5)
    B = orc.matrix_from_dict(gb, db, 2, 2, dtypes.INT64)
    A[[1, 4], [0, 6]] = B
    rows, cols = [1, 4], [0, 6]
    for oi, i in enumerate(rows):
        for oj, j in enumerate(cols):
            d.pop((i, j), None)
            if (oi, oj) in db:
                d[(i, j)] = db[(oi, oj)]
    orc.assert_equal_dicts(orc.to_dict(A), d)


def test_assign_with_accum(A):
    d = orc.to_dict(A)
    A(accum=binary.plus)[0, 1] = 10
    d[(0, 1)] = d[(0, 1)] + 10
    orc.assert_equal_dicts(orc.to_dict(A), d)
    A(accum=binary.plus)[0, 0] = 10
    d[(0, 0)] = 10
    orc.assert_equal_dicts(orc.to_dict(A), d)


def test_assign_empty_scalar_deletes(A):
    from graphblas_tpu import Scalar

    d = orc.to_dict(A)
    empty = Scalar(dtypes.INT64)
    A[0, 1] = empty
    del d[(0, 1)]
    orc.assert_equal_dicts(orc.to_dict(A), d)


def test_del_element(A):
    d = orc.to_dict(A)
    del A[0, 1]
    del d[(0, 1)]
    orc.assert_equal_dicts(orc.to_dict(A), d)


def test_contains_iter_get(A):
    assert (0, 1) in A
    assert (0, 0) not in A
    assert A.get(0, 1) == 2
    assert A.get(0, 0) is None
    assert A.get(0, 0, default=-1) == -1
    entries = set(iter(A))
    assert (0, 1) in entries and len(entries) == 12


def test_diag_setdiag(A):
    d = orc.to_dict(A)
    got = A.diag()
    orc.assert_equal_dicts(orc.to_dict(got), {i: v for (i, j), v in d.items() if i == j})
    got = A.diag(1)
    orc.assert_equal_dicts(orc.to_dict(got), {i: v for (i, j), v in d.items() if j == i + 1})
    A.setdiag(0)
    d2 = orc.to_dict(A)
    for i in range(7):
        assert d2[(i, i)] == 0


def test_power(A):
    d = orc.to_dict(A)
    d2 = orc.mxm(d, d, lambda x, y: x + y, orc.simple_mul(lambda x, y: x * y))
    d3 = orc.mxm(d2, d, lambda x, y: x + y, orc.simple_mul(lambda x, y: x * y))
    got = A.power(3).new()
    orc.assert_equal_dicts(orc.to_dict(got), d3)
    eye = A.power(0).new()
    orc.assert_equal_dicts(orc.to_dict(eye), {(i, i): 1 for i in range(7)})


def test_reposition(A):
    d = orc.to_dict(A)
    got = A.reposition(1, 2).new()
    expected = {
        (i + 1, j + 2): v for (i, j), v in d.items() if i + 1 < 7 and j + 2 < 7
    }
    orc.assert_equal_dicts(orc.to_dict(got), expected)
    got = A.reposition(-2, 0).new()
    expected = {(i - 2, j): v for (i, j), v in d.items() if i - 2 >= 0}
    orc.assert_equal_dicts(orc.to_dict(got), expected)


def test_from_to_csr_csc(A):
    indptr, cols, vals = A.to_csr()
    B = Matrix.from_csr(indptr, cols, vals, nrows=7, ncols=7)
    assert B.isequal(A)
    indptr, rows, vals = A.to_csc()
    B = Matrix.from_csc(indptr, rows, vals, nrows=7, ncols=7)
    assert B.isequal(A)
    cr, indptr, cols, vals = A.to_dcsr()
    B = Matrix.from_dcsr(cr, indptr, cols, vals, nrows=7, ncols=7)
    assert B.isequal(A)
    cc, indptr, rows, vals = A.to_dcsc()
    B = Matrix.from_dcsc(cc, indptr, rows, vals, nrows=7, ncols=7)
    assert B.isequal(A)


def test_from_to_dicts(A):
    d = A.to_dicts()
    B = Matrix.from_dicts(d, dtypes.INT64, nrows=7, ncols=7)
    assert B.isequal(A)
    d = A.to_dicts(order="columnwise")
    B = Matrix.from_dicts(d, dtypes.INT64, order="columnwise", nrows=7, ncols=7)
    assert B.isequal(A)


def test_from_dense_to_dense():
    arr = np.array([[1.0, 0.0], [3.0, 4.0]])
    m = Matrix.from_dense(arr)
    assert m.nvals == 4
    np.testing.assert_array_equal(m.to_dense(), arr)
    m = Matrix.from_dense(arr, missing_value=0.0)
    assert m.nvals == 3
    np.testing.assert_array_equal(m.to_dense(fill_value=-1), np.array([[1.0, -1.0], [3.0, 4.0]]))


def test_from_edgelist():
    m = Matrix.from_edgelist([(0, 1), (1, 2)], nrows=3, ncols=3)
    assert m.nvals == 2
    assert m[0, 1].new().value == 1.0
    m = Matrix.from_edgelist([(0, 1, 5.0), (1, 2, 6.0)], nrows=3, ncols=3)
    assert m[1, 2].new().value == 6.0
    edges, vals = m.to_edgelist()
    assert edges.tolist() == [[0, 1], [1, 2]]
    assert vals.tolist() == [5.0, 6.0]


def test_from_scalar():
    m = Matrix.from_scalar(7, 2, 3, dtypes.INT32)
    assert m.nvals == 6
    assert m.dtype == dtypes.INT32
    assert m[1, 2].new().value == 7


def test_isequal_isclose(A):
    B = A.dup()
    assert A.isequal(B)
    B[0, 1] = 3
    assert not A.isequal(B)
    F = A.dup(dtypes.FP64)
    F2 = F.dup()
    F2[0, 1] = float(A[0, 1].new().value) + 1e-12
    assert F.isclose(F2)
    assert not F.isclose(F2, rel_tol=1e-15)
    assert not A.isequal(B.dup(dtypes.FP32), check_dtype=True)


def test_wait_and_nvals(A):
    assert A.wait() is A
    assert A.nvals == 12
