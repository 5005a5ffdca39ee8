"""tx (SuiteSparse-extension analogue) ops run format-natively on sparse
storage — no densify (VERDICT r2 missing #5; reference:
core/ss/matrix.py:3686-4049 selectk/compactify/sort/scan/head).

Each op is differential-tested: the sparse-format result must match the
dense-format result on the same data, and huge-dimension runs must not trip
the densify guard.
"""

import numpy as np
import pytest

import graphblas_tpu as gb
import graphblas_tpu.tx as txmod
from graphblas_tpu import binary, monoid
from graphblas_tpu.core import dtypes as dtm
from graphblas_tpu.core.matrix import Matrix
from graphblas_tpu.core.vector import Vector

HUGE = 1 << 40


def _pair(seed=0, n=20, e=60):
    rng = np.random.default_rng(seed)
    r = rng.integers(0, n, e)
    c = rng.integers(0, n, e)
    v = rng.random(e).round(3)
    dense = Matrix.from_coo(r, c, v, dtm.FP64, nrows=n, ncols=n, dup_op=binary.plus)
    with txmod.config.set(dense_limit=0):
        sp = Matrix.from_coo(r, c, v, dtm.FP64, nrows=n, ncols=n, dup_op=binary.plus)
    assert sp._sparse is not None
    return dense, sp


def _vpair(seed=1, n=30, k=12):
    rng = np.random.default_rng(seed)
    idx = np.sort(rng.choice(n, k, replace=False))
    v = rng.random(k).round(3)
    dense = Vector.from_coo(idx, v, dtm.FP64, size=n)
    with txmod.config.set(dense_limit=0):
        sp = Vector.from_coo(idx, v, dtm.FP64, size=n)
    assert sp._sparse is not None
    return dense, sp


def test_tx_matrix_scan_matches_dense():
    for op in ("plus", "times", "min", "max"):
        dense, sp = _pair(seed=3)
        d = dense.tx.scan(op).to_dicts()
        s = sp.tx.scan(op)
        assert s._sparse is not None
        ss = s.to_dicts()
        assert set(d) == set(ss)
        for rr in d:
            for cc in d[rr]:
                assert ss[rr][cc] == pytest.approx(d[rr][cc]), op


def test_tx_matrix_scan_columnwise():
    dense, sp = _pair(seed=4)
    d = dense.tx.scan("plus", "columnwise").to_dicts()
    s = sp.tx.scan("plus", "columnwise").to_dicts()
    for rr in d:
        for cc in d[rr]:
            assert s[rr][cc] == pytest.approx(d[rr][cc])


@pytest.mark.parametrize("how", ["first", "last", "smallest", "largest"])
def test_tx_matrix_selectk_matches_dense(how):
    dense, sp = _pair(seed=5)
    d = dense.tx.selectk(how, 2).to_dicts()
    s = sp.tx.selectk(how, 2)
    assert s._sparse is not None
    assert s.to_dicts() == d


@pytest.mark.parametrize("how", ["first", "last", "smallest", "largest"])
def test_tx_matrix_compactify_matches_dense(how):
    dense, sp = _pair(seed=6)
    d = dense.tx.compactify(how).to_dicts()
    s = sp.tx.compactify(how)
    assert s._sparse is not None
    assert s.to_dicts() == d


def test_tx_matrix_sort_matches_dense():
    dense, sp = _pair(seed=7)
    dv, dp = dense.tx.sort("lt")
    sv, sp_ = sp.tx.sort("lt")
    assert sv._sparse is not None
    assert sv.to_dicts() == dv.to_dicts()
    assert sp_.to_dicts() == dp.to_dicts()
    dv2 = dense.tx.sort("gt", permutation=False)
    sv2 = sp.tx.sort("gt", permutation=False)
    assert sv2.to_dicts() == dv2.to_dicts()


def test_tx_matrix_flatten_reshape_matches_dense():
    dense, sp = _pair(seed=8, n=6, e=14)
    for order in ("rowwise", "columnwise"):
        df = dense.tx.flatten(order)
        sf = sp.tx.flatten(order)
        assert df.to_dict() == sf.to_dict()
        dr = dense.tx.reshape(4, 9, order).to_dicts()
        sr = sp.tx.reshape(4, 9, order)
        assert sr._sparse is not None
        assert sr.to_dicts() == dr


def test_tx_sparse_huge_ops_no_densify():
    rows = np.array([0, 0, 0, 1 << 30, 1 << 30, HUGE - 1])
    cols = np.array([5, 2, 1 << 35, 7, 3, 0])
    vals = np.array([3.0, 1.0, 2.0, 9.0, 4.0, 5.0])
    A = Matrix.from_coo(rows, cols, vals, dtm.FP64, nrows=HUGE, ncols=HUGE)
    k2 = A.tx.selectk("smallest", 2)
    assert k2.to_dicts() == {
        0: {2: 1.0, (1 << 35): 2.0},
        1 << 30: {3: 4.0, 7: 9.0},
        HUGE - 1: {0: 5.0},
    }
    comp = A.tx.compactify("smallest")
    assert comp.to_dicts() == {
        0: {0: 1.0, 1: 2.0, 2: 3.0},
        1 << 30: {0: 4.0, 1: 9.0},
        HUGE - 1: {0: 5.0},
    }
    sc = A.tx.scan("plus")
    assert sc.to_dicts()[0] == {2: 1.0, 5: 4.0, (1 << 35): 6.0}
    sv, sperm = A.tx.sort("lt")
    assert sv.to_dicts()[0] == {0: 1.0, 1: 2.0, 2: 3.0}
    assert sperm.to_dicts()[0] == {0: 2, 1: 1 << 35, 2: 5}
    # head / iterators read the COO directly
    r, c, v = A.tx.head(3)
    assert list(r) == [0, 0, 0]
    assert A.tx.is_iso is False
    assert A.tx.nbytes > 0


def test_tx_vector_sparse_ops_match_dense():
    dense, sp = _vpair()
    assert sp.tx.scan("plus").to_dict() == pytest.approx(dense.tx.scan("plus").to_dict())
    for how in ("first", "largest"):
        assert sp.tx.selectk(how, 3).to_dict() == dense.tx.selectk(how, 3).to_dict()
        assert sp.tx.compactify(how).to_dict() == dense.tx.compactify(how).to_dict()
    dv, dp = dense.tx.sort("lt")
    sv, sp_ = sp.tx.sort("lt")
    assert sv.to_dict() == dv.to_dict()
    assert sp_.to_dict() == dp.to_dict()
    assert sp.tx.is_iso == dense.tx.is_iso


def test_tx_vector_sparse_huge():
    v = Vector.from_coo([5, 1 << 33, HUGE - 2], [2.0, 1.0, 3.0], dtm.FP64, size=HUGE)
    assert v.tx.selectk("smallest", 2).to_dict() == {5: 2.0, 1 << 33: 1.0}
    assert v.tx.compactify("smallest").to_dict() == {0: 1.0, 1: 2.0, 2: 3.0}
    assert v.tx.scan("plus").to_dict() == {5: 2.0, (1 << 33): 3.0, HUGE - 2: 6.0}
    assert v.tx.is_iso is False


def test_column_variant_import_export_roundtrip():
    """bitmapc/fullc/coor/cooc import+export round-trips (reference
    column-variant zero-copy formats, core/ss/matrix.py:537-3649)."""
    import numpy as np

    from graphblas_tpu import Matrix, dtypes, tx

    rng = np.random.default_rng(9)
    A = Matrix.from_coo([0, 0, 2, 3], [1, 3, 0, 2], [1.0, 2.0, 3.0, 4.0],
                        dtypes.FP32, nrows=4, ncols=5)

    for fmt in ["coor", "cooc", "bitmapr", "bitmapc", "fullr", "fullc"]:
        blob = A.ss.export(fmt)
        assert blob["format"] == fmt
        B = tx.import_any(**dict(blob))
        if fmt.startswith("full"):
            # full formats materialize absent entries as 0
            assert np.array_equal(
                np.asarray(B.to_dense(fill_value=0)), np.asarray(A.to_dense(fill_value=0))
            )
        else:
            assert B.isequal(A), fmt

    # cooc is column-sorted
    blob = A.ss.export("cooc")
    assert blob["sorted_cols"] and not blob["sorted_rows"]
    assert list(blob["cols"]) == sorted(blob["cols"])

    # flat bitmapc buffers are column-major: element (i, j) at j*nrows + i
    blob = A.ss.export("bitmapc")
    bm = np.asarray(blob["bitmap"]).reshape(5, 4).T
    r, c, _ = A.to_coo()
    ref = np.zeros((4, 5), bool)
    ref[np.asarray(r), np.asarray(c)] = True
    assert np.array_equal(bm, ref)

    # import_any accepts csr blobs too
    B = tx.import_any(**dict(A.ss.export("csr")))
    assert B.isequal(A)
