"""IO round-trips (models reference test_io.py)."""

import io as _io

import numpy as np
import pytest

import graphblas_tpu as gb
from graphblas_tpu import Matrix, Vector, dtypes
from graphblas_tpu.io import (
    from_networkx,
    from_scipy_sparse,
    mmread,
    mmwrite,
    to_networkx,
    to_scipy_sparse,
)


@pytest.fixture
def A():
    return Matrix.from_coo([0, 0, 1, 2], [1, 2, 2, 0], [1.5, 2.0, 3.0, 4.0], nrows=3, ncols=3)


def test_scipy_roundtrip(A):
    for fmt in ["csr", "csc", "coo"]:
        s = to_scipy_sparse(A, fmt)
        assert s.format == fmt
        B = from_scipy_sparse(s)
        assert B.isequal(A)


def test_scipy_vector():
    v = Vector.from_coo([0, 2], [1.0, 2.0], size=4)
    s = to_scipy_sparse(v)
    assert s.shape == (1, 4)
    assert s.nnz == 2


def test_networkx_roundtrip(A):
    G = to_networkx(A)
    assert G.number_of_edges() == 4
    assert G[0][1]["weight"] == 1.5
    B = from_networkx(G)
    assert B.isequal(A)


def test_mmread_mmwrite(A, tmp_path):
    path = tmp_path / "test.mtx"
    mmwrite(str(path), A)
    B = mmread(str(path))
    assert B.isclose(A)


def test_serialize_roundtrip(A):
    from graphblas_tpu.tx.matrix import deserialize_matrix

    data = A.tx.serialize()
    B = deserialize_matrix(data)
    assert B.isequal(A)
    data = A.tx.serialize(compression=None)
    B = deserialize_matrix(data)
    assert B.isequal(A)


def test_serialize_vector_roundtrip():
    from graphblas_tpu.tx.vector import deserialize_vector

    v = Vector.from_coo([0, 2], [1.0, 2.0], size=4)
    data = v.tx.serialize()
    w = deserialize_vector(data)
    assert w.isequal(v)


def test_pickle_roundtrip(A):
    import pickle

    B = pickle.loads(pickle.dumps(A))
    assert B.isequal(A, check_dtype=True)
    v = Vector.from_coo([1, 2], [3, 4], size=5, name="v")
    w = pickle.loads(pickle.dumps(v))
    assert w.isequal(v, check_dtype=True)
    from graphblas_tpu import Scalar

    s = Scalar.from_value(2.5)
    t = pickle.loads(pickle.dumps(s))
    assert t == s
    empty = Scalar(dtypes.INT8)
    t = pickle.loads(pickle.dumps(empty))
    assert t.is_empty and t.dtype == dtypes.INT8


def test_export_formats(A):
    d = A.tx.export("csr")
    assert d["format"] == "csr"
    B = Matrix.from_csr(d["indptr"], d["col_indices"], d["values"], nrows=3, ncols=3)
    assert B.isequal(A)
    d = A.tx.export("densemasked")
    assert d["values"].shape == (3, 3)


def test_tx_hyper_import_export():
    from graphblas_tpu import tx

    A = Matrix.from_coo([0, 0, 5], [1, 2, 0], [1.0, 2.0, 3.0], nrows=6, ncols=3)
    d = A.tx.export("hypercsr")
    assert d["rows"].tolist() == [0, 5]
    B = tx.import_hypercsr(
        rows=d["rows"], indptr=d["indptr"], col_indices=d["col_indices"],
        values=d["values"], nrows=d["nrows"], ncols=d["ncols"],
    )
    assert B.isequal(A)
    d2 = A.tx.export("hypercsc")
    C = tx.import_hypercsc(
        cols=d2["cols"], indptr=d2["indptr"], row_indices=d2["row_indices"],
        values=d2["values"], nrows=d2["nrows"], ncols=d2["ncols"],
    )
    assert C.isequal(A)


def test_viz_draw_and_spy():
    """Smoke-test the viz helpers on the Agg backend (reference: viz.py)."""
    import matplotlib

    matplotlib.use("Agg")
    from graphblas_tpu import viz

    A = Matrix.from_coo([0, 1, 2], [1, 2, 0], [1.0, 2.0, 3.0], dtypes.FP64, nrows=3, ncols=3)
    g = viz.draw(A)
    assert g.number_of_edges() == 3
    ax = viz.spy(A, show=False)
    assert ax is not None
    import matplotlib.pyplot as plt

    plt.close("all")


def test_viz_datashade():
    """datashade renders a density canvas without the optional datashader
    stack (reference: viz.py:106); aggregations match hand-computed values."""
    import matplotlib

    matplotlib.use("Agg")
    import numpy as np

    from graphblas_tpu import Matrix, dtypes, viz
    from graphblas_tpu.viz import _canvas_aggregate

    A = Matrix.from_coo([0, 0, 9], [0, 0, 9], [1.0, 3.0, 5.0], dtypes.FP32,
                        nrows=10, ncols=10, dup_op="plus")
    # 2x2 canvas: entry (0,0)=4.0 in pixel (0,0); (9,9)=5.0 in pixel (1,1)
    cv = _canvas_aggregate(A, "count", 2, 2)
    assert cv.tolist() == [[1.0, 0.0], [0.0, 1.0]]
    cv = _canvas_aggregate(A, "sum", 2, 2)
    assert cv.tolist() == [[4.0, 0.0], [0.0, 5.0]]
    cv = _canvas_aggregate(A, "mean", 2, 2)
    assert cv.tolist() == [[4.0, 0.0], [0.0, 5.0]]
    cv = _canvas_aggregate(A, "max", 2, 2)
    assert cv.tolist() == [[4.0, 0.0], [0.0, 5.0]]
    ax = viz.datashade(A, "count", width=16, height=16, show=False)
    assert ax is not None


def test_scipy_all_formats_roundtrip():
    """from/to scipy for csr/csc/coo x matrix dtypes (reference io/_scipy.py)."""
    import scipy.sparse as sps

    from graphblas_tpu import io as gio

    rng = np.random.default_rng(3)
    dense = np.where(rng.random((6, 9)) < 0.4, rng.integers(1, 9, (6, 9)), 0)
    for fmt in ("csr", "csc", "coo"):
        s_in = sps.coo_matrix(dense).asformat(fmt)
        M = gio.from_scipy_sparse(s_in)
        assert M.shape == (6, 9)
        s_out = gio.to_scipy_sparse(M, fmt)
        assert s_out.format == fmt
        assert (s_out.toarray() == dense).all()


def test_mmwrite_mmread_pattern_and_general(tmp_path):
    from graphblas_tpu import io as gio
    from graphblas_tpu import Matrix, dtypes

    M = Matrix.from_coo([0, 2, 4], [1, 3, 0], [1.5, -2.0, 3.25], nrows=5, ncols=5)
    p = tmp_path / "m.mtx"
    gio.mmwrite(str(p), M)
    M2 = gio.mmread(str(p))
    assert M.isequal(M2, check_dtype=False)
    # bool (pattern-ish) round trip
    B = Matrix.from_coo([0, 1], [1, 0], [True, True], dtype=dtypes.BOOL, nrows=3, ncols=3)
    p2 = tmp_path / "b.mtx"
    gio.mmwrite(str(p2), B)
    B2 = gio.mmread(str(p2))
    r, c, _ = B2.to_coo()
    assert sorted(zip(r.tolist(), c.tolist())) == [(0, 1), (1, 0)]


def test_networkx_weighted_digraph():
    import networkx as nx

    from graphblas_tpu import io as gio

    g = nx.DiGraph()
    g.add_weighted_edges_from([(0, 1, 2.0), (1, 2, 3.0), (2, 0, 4.0)])
    M = gio.from_networkx(g, nodelist=[0, 1, 2])
    assert orc_to_dict(M) == {(0, 1): 2.0, (1, 2): 3.0, (2, 0): 4.0}
    g2 = gio.to_networkx(M)
    assert set(g2.edges) == set(g.edges)


def orc_to_dict(m):
    r, c, v = m.to_coo()
    return dict(zip(zip(r.tolist(), c.tolist()), v.tolist()))
