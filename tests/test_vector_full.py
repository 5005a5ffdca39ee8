"""Vector behavioral suite at reference granularity (one test per behavior,
mirroring the coverage checklist of reference graphblas/tests/test_vector.py —
independently implemented against GraphBLAS semantics + the dict oracle)."""

import pickle

import numpy as np
import pytest

import graphblas_tpu as gb
from graphblas_tpu import Matrix, Scalar, Vector, agg, binary, dtypes, indexunary, monoid, select, semiring, unary
from graphblas_tpu.exceptions import (
    DimensionMismatch,
    EmptyObject,
    IndexOutOfBound,
    InvalidValue,
    OutputNotEmpty,
)

import oracle as orc


@pytest.fixture
def v():
    return Vector.from_coo([1, 3, 4, 6], [1, 1, 2, 0], dtypes.INT64, size=7)


@pytest.fixture
def w():
    return Vector.from_coo([0, 1, 6], [5, -2, 3], dtypes.INT64, size=7)


def test_new():
    u = Vector(dtypes.INT8, 17)
    assert u.dtype == dtypes.INT8
    assert u.nvals == 0
    assert u.size == 17


def test_dup(v):
    u = v.dup()
    assert u is not v
    assert u.isequal(v)
    v[0] = 1000
    assert u[0].new().is_empty
    u2 = v.dup(dtypes.FP64)
    assert u2.dtype == dtypes.FP64
    assert u2.isclose(v)
    assert not u2.isequal(v, check_dtype=True)


def test_dup_clear(v):
    u = v.dup(clear=True)
    assert u.dtype == v.dtype
    assert u.nvals == 0
    assert u.size == v.size
    u2 = v.dup(dtypes.INT8, clear=True)
    assert u2.dtype == dtypes.INT8


def test_dup_mask(v):
    m = Vector.from_coo([1, 4], True, size=7)
    u = v.dup(mask=m.S)
    assert orc.to_dict(u) == {1: 1, 4: 2}


def test_from_coo_scalar():
    u = Vector.from_coo([0, 3], 7, size=5)
    assert u.nvals == 2
    assert orc.to_dict(u) == {0: 7, 3: 7}


def test_from_coo_dup_op():
    u = Vector.from_coo([1, 1, 2], [1, 2, 3], size=4, dup_op=binary.plus)
    assert orc.to_dict(u) == {1: 3, 2: 3}
    u = Vector.from_coo([1, 1, 2], [5, 2, 3], size=4, dup_op=binary.max)
    assert orc.to_dict(u) == {1: 5, 2: 3}


def test_from_coo_no_size_errors():
    with pytest.raises(ValueError):
        Vector.from_coo([], [])


def test_from_coo_mismatched_lengths():
    with pytest.raises(ValueError):
        Vector.from_coo([0, 1], [1.0])


def test_clear(v):
    v.clear()
    assert v.nvals == 0
    assert v.size == 7


def test_resize(v):
    d = orc.to_dict(v)
    v.resize(20)
    assert v.size == 20
    assert v.nvals == 4
    v.resize(4)
    assert orc.to_dict(v) == {k: x for k, x in d.items() if k < 4}


def test_size_nvals(v):
    assert v.size == 7
    assert v.nvals == 4
    assert len(v) == 4


def test_build(v):
    u = Vector(dtypes.INT64, 7)
    u.build([0, 5], [10, 20])
    assert orc.to_dict(u) == {0: 10, 5: 20}
    with pytest.raises(OutputNotEmpty):
        u.build([1], [2])
    u.build([1, 2], [4, 5], clear=True)
    assert orc.to_dict(u) == {1: 4, 2: 5}


def test_extract_values_dtype(v):
    _, vals = v.to_coo(dtype=dtypes.FP32)
    assert vals.dtype == np.float32
    idx, _ = v.to_coo(values=False)
    assert idx.tolist() == [1, 3, 4, 6]


def test_extract_element(v):
    assert v[1].new().value == 1
    assert v[-1].new().value == 0
    assert v[0].new().is_empty
    s = v[4].new(dtype=dtypes.FP64)
    assert s.value == 2.0 and s.dtype == dtypes.FP64


def test_set_element(v):
    v[0] = 12
    v[-2] = -5
    assert v[0].new().value == 12
    assert v[5].new().value == -5


def test_remove_element(v):
    del v[1]
    assert v[1].new().is_empty
    del v[-1]
    assert v[6].new().is_empty
    assert v.nvals == 2


def test_vxm(v):
    A = Matrix.from_coo([0, 1, 3, 4, 6], [2, 0, 1, 3, 4], [1, 2, 3, 4, 5], nrows=7, ncols=7)
    got = v.vxm(A, semiring.plus_times).new()
    da = orc.to_dict(A)
    expected = {}
    for (i, j), av in da.items():
        if i in orc.to_dict(v):
            expected[j] = expected.get(j, 0) + orc.to_dict(v)[i] * av
    orc.assert_equal_dicts(orc.to_dict(got), expected)


def test_vxm_transpose(v):
    A = Matrix.from_coo([0, 1, 3], [2, 0, 1], [1, 2, 3], nrows=7, ncols=7)
    got = v.vxm(A.T, semiring.plus_times).new()
    ref = A.mxv(v, semiring.plus_times).new()
    assert got.isequal(ref)


def test_vxm_nonsquare(v):
    A = Matrix.from_coo([1, 6], [0, 1], [10, 20], nrows=7, ncols=2)
    got = v.vxm(A, semiring.plus_times).new()
    assert got.size == 2
    assert orc.to_dict(got) == {0: 10, 1: 0}


def test_vxm_mask(v):
    A = Matrix.from_coo([1, 3, 4], [0, 1, 2], [1, 1, 1], nrows=7, ncols=7)
    m = Vector.from_coo([0, 2], True, size=7)
    out = Vector(dtypes.INT64, 7)
    out(m.V) << v.vxm(A, semiring.plus_times)
    full = v.vxm(A, semiring.plus_times).new()
    expected = {k: x for k, x in orc.to_dict(full).items() if k in (0, 2)}
    orc.assert_equal_dicts(orc.to_dict(out), expected)
    out2 = Vector(dtypes.INT64, 7)
    out2(~m.V) << v.vxm(A, semiring.plus_times)
    expected2 = {k: x for k, x in orc.to_dict(full).items() if k not in (0, 2)}
    orc.assert_equal_dicts(orc.to_dict(out2), expected2)


def test_vxm_accum(v):
    A = Matrix.from_coo([1, 3], [1, 3], [10, 10], nrows=7, ncols=7)
    d0 = orc.to_dict(v)
    prod = orc.to_dict(v.vxm(A, semiring.plus_times).new())
    v(accum=binary.plus) << v.vxm(A, semiring.plus_times)
    expected = dict(d0)
    for k, x in prod.items():
        expected[k] = expected.get(k, 0) + x
    orc.assert_equal_dicts(orc.to_dict(v), expected)


def test_ewise_mult_change_dtype(v):
    w2 = Vector.from_coo([1, 3], [2, 2], size=7)
    got = v.ewise_mult(w2, binary.cdiv).new(dtype=dtypes.FP64)
    assert got.dtype == dtypes.FP64
    assert orc.to_dict(got) == {1: 0.0, 3: 0.0}
    got2 = v.ewise_mult(w2, binary.truediv).new()
    assert got2.dtype in (dtypes.FP64, dtypes.FP32)
    assert orc.to_dict(got2) == {1: 0.5, 3: 0.5}


def test_ewise_add_boolean_ops(v, w):
    dv, dw = orc.to_dict(v), orc.to_dict(w)
    got = v.ewise_add(w, binary.lt).new()
    # non-monoid ewise_add: pass-through singletons are typecast to the
    # op's BOOL output dtype (reference semantics)
    expected = {k: bool(x) for k, x in orc.ewise_add(dv, dw, lambda a, b: a < b).items()}
    orc.assert_equal_dicts(orc.to_dict(got), expected)
    assert got.dtype == dtypes.BOOL


def test_ewise_union_defaults(v, w):
    dv, dw = orc.to_dict(v), orc.to_dict(w)
    got = v.ewise_union(w, binary.minus, 0, 0).new()
    expected = orc.ewise_union(dv, dw, lambda a, b: a - b, 0, 0)
    orc.assert_equal_dicts(orc.to_dict(got), expected)
    s_left = Scalar.from_value(7)
    got2 = v.ewise_union(w, binary.plus, s_left, 1).new()
    expected2 = orc.ewise_union(dv, dw, lambda a, b: a + b, 7, 1)
    orc.assert_equal_dicts(orc.to_dict(got2), expected2)


def test_extract(v):
    got = v[[0, 3, 6]].new()
    assert got.size == 3
    assert orc.to_dict(got) == {1: 1, 2: 0}
    got = v[1:5].new()
    assert got.size == 4
    assert orc.to_dict(got) == {0: 1, 2: 1, 3: 2}


def test_extract_array(v):
    idx = np.array([6, 5, 4])
    got = v[idx].new()
    assert orc.to_dict(got) == {0: 0, 2: 2}


def test_extract_negative_indices(v):
    got = v[[-1, -4]].new()
    assert orc.to_dict(got) == {0: 0, 1: 1}
    got = v[-3:].new()
    assert got.size == 3
    assert orc.to_dict(got) == {0: 2, 2: 0}


def test_extract_fancy_scalars(v):
    s = v[np.int32(1)].new()
    assert s.value == 1


def test_extract_input_mask(v):
    m = Vector.from_coo([1, 4], True, size=7)
    got = v[[1, 3, 4]].new(input_mask=m.S)
    assert orc.to_dict(got) == {0: 1, 2: 2}


def test_assign(v):
    u = Vector.from_coo([0, 2], [9, 9], size=3)
    v[[0, 2, 4]] = u
    d = orc.to_dict(v)
    assert d[0] == 9 and d[4] == 9
    assert 2 not in d


def test_assign_scalar(v):
    v[1:4] = 55
    assert orc.to_dict(v) == {1: 55, 2: 55, 3: 55, 4: 2, 6: 0}
    v[:] = 1
    assert v.nvals == 7


def test_assign_scalar_mask(v):
    m = Vector.from_coo([0, 1], True, size=7)
    v(m.S)[:] = 100
    d = orc.to_dict(v)
    assert d[0] == 100 and d[1] == 100
    assert d[3] == 1  # untouched outside mask


def test_subassign(v):
    w2 = Vector.from_coo([0, 1], [41, 42], size=2)
    m = Vector.from_coo([0], True, size=2)
    v[[0, 1]](m.S) << w2
    d = orc.to_dict(v)
    assert d[0] == 41
    assert d[1] == 1  # subassign mask excludes slot 1: original kept


def test_assign_list(v):
    v[[0, 1]] = [31, 32]
    d = orc.to_dict(v)
    assert d[0] == 31 and d[1] == 32
    with pytest.raises((ValueError, TypeError, DimensionMismatch)):
        v[[0, 1]] = [1, 2, 3]


def test_apply_unary(v):
    got = v.apply(unary.ainv).new()
    orc.assert_equal_dicts(orc.to_dict(got), {k: -x for k, x in orc.to_dict(v).items()})


def test_apply_binary_bound(v):
    got = v.apply(binary.minus, left=10).new()
    orc.assert_equal_dicts(orc.to_dict(got), {k: 10 - x for k, x in orc.to_dict(v).items()})
    got = v.apply(binary.minus, right=10).new()
    orc.assert_equal_dicts(orc.to_dict(got), {k: x - 10 for k, x in orc.to_dict(v).items()})


def test_apply_empty():
    e = Vector(dtypes.INT64, 5)
    got = e.apply(unary.one).new()
    assert got.nvals == 0


def test_apply_indexunary(v):
    got = v.apply(indexunary.rowindex).new()
    orc.assert_equal_dicts(orc.to_dict(got), {k: k for k in orc.to_dict(v)})
    got = v.apply("rowindex", 0).new()
    orc.assert_equal_dicts(orc.to_dict(got), {k: k for k in orc.to_dict(v)})


def test_select_bools_and_masks(v):
    got = v.select(v.apply(binary.gt, right=0)).new()
    orc.assert_equal_dicts(orc.to_dict(got), {k: x for k, x in orc.to_dict(v).items() if x > 0})
    b = Vector.from_coo([1, 4], True, size=7)
    got2 = v.select(b.S).new()
    orc.assert_equal_dicts(orc.to_dict(got2), {1: 1, 4: 2})


def test_select_strings(v):
    assert orc.to_dict(v.select("==", 1).new()) == {1: 1, 3: 1}
    assert orc.to_dict(v.select("!=", 1).new()) == {4: 2, 6: 0}
    assert orc.to_dict(v.select(">=", 1).new()) == {1: 1, 3: 1, 4: 2}
    assert orc.to_dict(v.select("index<=", 3).new()) == {1: 1, 3: 1}


def test_indexunary_udf(v):
    def plus_idx(x, i, j, thunk):
        return x + i

    op = gb.indexunary.register_anonymous(plus_idx)
    got = v.apply(op, 0).new()
    orc.assert_equal_dicts(orc.to_dict(got), {k: x + k for k, x in orc.to_dict(v).items()})


def test_reduce(v):
    assert v.reduce(monoid.plus).new().value == 4
    assert v.reduce(monoid.min).new().value == 0
    assert v.reduce(monoid.times).new().value == 0
    assert v.reduce(binary.plus).new().value == 4  # binaryop coerced to monoid


def test_reduce_empty():
    e = Vector(dtypes.INT64, 5)
    s = e.reduce(monoid.plus).new()
    assert s.is_empty
    s2 = e.reduce(monoid.plus, allow_empty=False).new()
    assert s2.value == 0


def test_reduce_agg(v):
    assert v.reduce(agg.sum).new().value == 4
    assert v.reduce(agg.mean).new().value == 1.0
    assert v.reduce(agg.count).new().value == 4
    assert v.reduce(agg.stdp).new().value == pytest.approx(np.std([1, 1, 2, 0]))


def test_reduce_agg_count_is_int(v):
    s = v.reduce(agg.count).new()
    assert "INT" in s.dtype.name


def test_reduce_agg_argminmax(v):
    assert v.reduce(agg.argmax).new().value == 4
    assert v.reduce(agg.argmin).new().value == 6


def test_reduce_agg_firstlast(v):
    assert v.reduce(agg.first).new().value == 1
    assert v.reduce(agg.last).new().value == 0
    assert v.reduce(agg.first_index).new().value == 1
    assert v.reduce(agg.last_index).new().value == 6


def test_reduce_agg_empty():
    e = Vector(dtypes.FP64, 4)
    assert e.reduce(agg.sum).new().is_empty


def test_reduce_coerce_dtype(v):
    s = v.reduce(monoid.plus).new(dtype=dtypes.FP64)
    assert s.dtype == dtypes.FP64 and s.value == 4.0


def test_simple_assignment(v):
    u = Vector(dtypes.INT64, 7)
    u << v
    assert u.isequal(v)


def test_isequal(v):
    u = v.dup()
    assert v.isequal(u)
    u[0] = 99
    assert not v.isequal(u)
    assert not v.isequal(Vector.from_coo([0], [1], size=3))
    f1 = Vector.from_coo([0], [1.0], size=2)
    f2 = Vector.from_coo([0], [1.0 + 1e-9], size=2)
    assert not f1.isequal(f2)


def test_isclose(v):
    f1 = Vector.from_coo([0], [1.0], size=2)
    f2 = Vector.from_coo([0], [1.0 + 1e-9], size=2)
    assert f1.isclose(f2)
    assert not f1.isclose(f2, rel_tol=1e-12)
    assert not f1.isclose(Vector.from_coo([0, 1], [1.0, 2.0], size=2))


def test_binary_op_infix(v, w):
    got = (v + w).new()
    orc.assert_equal_dicts(
        orc.to_dict(got), orc.ewise_add(orc.to_dict(v), orc.to_dict(w), lambda a, b: a + b)
    )
    got = (v * w).new()
    orc.assert_equal_dicts(
        orc.to_dict(got), orc.ewise_mult(orc.to_dict(v), orc.to_dict(w), lambda a, b: a * b)
    )


def test_accum_must_be_binaryop(v):
    with pytest.raises((TypeError, ValueError)):
        v(accum=semiring.plus_times) << v


def test_mask_must_be_value_or_structure(v):
    # bool collections auto-lift to value masks (reference core/base.py:169);
    # non-bool collections are rejected
    m = Vector.from_coo([0], [5], size=7)
    with pytest.raises(TypeError):
        v(mask=m) << v


def test_incompatible_shapes(v):
    u = Vector(dtypes.INT64, 5)
    with pytest.raises(DimensionMismatch):
        v.ewise_add(u, binary.plus).new()
    with pytest.raises(DimensionMismatch):
        u << v


def test_del_region(v):
    del v[1:4]
    assert orc.to_dict(v) == {4: 2, 6: 0}


def test_contains(v):
    assert 1 in v
    assert 0 not in v
    assert -1 in v  # negative index wraps to 6


def test_iter(v):
    assert list(v) == [1, 3, 4, 6]


def test_wait(v):
    v.wait()
    assert v.wait("complete") is v or v.wait("complete") is None


def test_pickle_roundtrip(v):
    u = pickle.loads(pickle.dumps(v))
    assert u.isequal(v, check_dtype=True)


def test_weakref(v):
    import weakref

    ref = weakref.ref(v)
    assert ref() is v


def test_not_to_array(v):
    with pytest.raises(TypeError):
        np.array(v)


def test_vector_index_with_scalar(v):
    s = Scalar.from_value(1, dtypes.INT64)
    assert v[s].new().value == 1
    got = v[[s, 3]].new()
    assert orc.to_dict(got) == {0: 1, 1: 1}
    with pytest.raises(TypeError):
        v[Scalar.from_value(1.5)]


def test_diag_matrix(v):
    A = gb.tx.diag(v, k=-1)
    assert A.shape == (8, 8)
    orc.assert_equal_dicts(orc.to_dict(A), {(k + 1, k): x for k, x in orc.to_dict(v).items()})


def test_nbytes(v):
    assert v.tx.nbytes > 0


def test_inner(v, w):
    s = v.inner(w, semiring.plus_times).new()
    assert s.value == 1 * (-2) + 0 * 3
    assert v.inner(w, semiring.min_plus).new().value == min(1 - 2, 0 + 3)


def test_outer(v, w):
    got = v.outer(w, binary.times).new()
    assert got.shape == (7, 7)
    dv, dw = orc.to_dict(v), orc.to_dict(w)
    orc.assert_equal_dicts(
        orc.to_dict(got), {(i, j): a * b for i, a in dv.items() for j, b in dw.items()}
    )


def test_auto_compute(v, w):
    expr = v.ewise_add(w, binary.plus)
    assert expr.nvals == 5  # autocompute on attribute access
    assert expr.size == 7
    assert expr.isequal(expr.new())


def test_expr_is_like_vector(v, w):
    expr = v.ewise_mult(w, binary.plus)
    got = expr.apply(unary.ainv).new()
    ref = expr.new().apply(unary.ainv).new()
    assert got.isequal(ref)


def test_index_expr_is_like_vector(v):
    expr = v[[0, 1, 3]]
    assert expr.size == 3
    assert expr.nvals == 2
    got = expr.reduce(monoid.plus).new()
    assert got.value == 2


def test_dup_expr(v, w):
    expr = v.ewise_add(w, binary.plus)
    u = expr.dup()
    assert u.isequal(expr.new())


def test_slice(v):
    got = v[::-1].new()
    d = orc.to_dict(v)
    orc.assert_equal_dicts(orc.to_dict(got), {6 - k: x for k, x in d.items()})
    got = v[5:0:-2].new()
    orc.assert_equal_dicts(orc.to_dict(got), {1: 1, 2: 1})


def test_concat(v, w):
    u = gb.tx.concat([v, w])
    assert u.size == 14
    d = orc.to_dict(v)
    d.update({k + 7: x for k, x in orc.to_dict(w).items()})
    orc.assert_equal_dicts(orc.to_dict(u), d)


def test_split(v):
    parts = v.tx.split(4)
    assert [p.size for p in parts] == [4, 3]
    d = orc.to_dict(v)
    orc.assert_equal_dicts(orc.to_dict(parts[0]), {k: x for k, x in d.items() if k < 4})
    orc.assert_equal_dicts(orc.to_dict(parts[1]), {k - 4: x for k, x in d.items() if k >= 4})


def test_ndim(v):
    assert v.ndim == 1


def test_sizeof(v):
    import sys

    assert sys.getsizeof(v) > 0


def test_ewise_union_scalar_exprs(v, w):
    got = v.ewise_union(w, binary.plus, Scalar.from_value(2), Scalar.from_value(3)).new()
    expected = orc.ewise_union(orc.to_dict(v), orc.to_dict(w), lambda a, b: a + b, 2, 3)
    orc.assert_equal_dicts(orc.to_dict(got), expected)


def test_delete_via_scalar(v):
    """Assigning an empty scalar deletes entries (masked delete recipe)."""
    empty = Scalar(dtypes.INT64)
    v[[1, 3]] = empty
    assert orc.to_dict(v) == {4: 2, 6: 0}


def test_reposition(v):
    got = v.reposition(2).new()
    d = orc.to_dict(v)
    orc.assert_equal_dicts(orc.to_dict(got), {k + 2: x for k, x in d.items() if k + 2 < 7})
    got = v.reposition(-2).new()
    orc.assert_equal_dicts(orc.to_dict(got), {k - 2: x for k, x in d.items() if k - 2 >= 0})


def test_to_coo_sort(v):
    idx, _ = v.to_coo(sort=True)
    assert (np.diff(idx.astype(np.int64)) > 0).all()


def test_lambda_udfs(v):
    op = gb.unary.register_anonymous(lambda x: x + 42)
    got = v.apply(op).new()
    orc.assert_equal_dicts(orc.to_dict(got), {k: x + 42 for k, x in orc.to_dict(v).items()})
    bop = gb.binary.register_anonymous(lambda x, y: x * 2 + y)
    got2 = v.ewise_mult(v, bop).new()
    orc.assert_equal_dicts(orc.to_dict(got2), {k: 3 * x for k, x in orc.to_dict(v).items()})


def test_get(v):
    assert v.get(1) == 1
    assert v.get(0) is None
    assert v.get(0, "missing") == "missing"


def test_from_dict_to_dict():
    d = {0: 1.5, 4: -2.0}
    u = Vector.from_dict(d, size=6)
    assert u.to_dict() == d
    with pytest.raises(ValueError):
        Vector.from_dict({})


def test_from_pairs_empty():
    u = Vector.from_pairs([], dtypes.FP32, size=3)
    assert u.nvals == 0 and u.size == 3


def test_to_dense_from_dense_fill(v):
    arr = v.to_dense(fill_value=-1)
    expected = np.full(7, -1, np.int64)
    for k, x in orc.to_dict(v).items():
        expected[k] = x
    np.testing.assert_array_equal(arr, expected)
    u = Vector.from_dense(arr, missing_value=-1)
    assert u.isequal(v)


def test_tx_sort(v):
    w2, p = v.tx.sort(binary.lt)
    assert orc.to_dict(w2) == {0: 0, 1: 1, 2: 1, 3: 2}
    assert orc.to_dict(p) == {0: 6, 1: 1, 2: 3, 3: 4}


def test_tx_compactify(v):
    c = v.tx.compactify("first")
    assert orc.to_dict(c) == {0: 1, 1: 1, 2: 2, 3: 0}


def test_broadcasting_vector_matrix(v):
    A = Matrix.from_coo([0, 1, 2], [1, 3, 4], [10, 20, 30], nrows=3, ncols=7)
    got = A.ewise_mult(v, binary.plus).new()  # row-broadcast
    da = orc.to_dict(A)
    dv = orc.to_dict(v)
    expected = {(i, j): x + dv[j] for (i, j), x in da.items() if j in dv}
    orc.assert_equal_dicts(orc.to_dict(got), expected)


def test_reference_edge_behaviors():
    """Assorted reference contracts: weakref-able, np.array refusal, Scalar
    indices, expression attribute delegation, delete-via-empty-scalar."""
    import weakref

    v = Vector.from_coo([0, 1, 3], [1.0, 2.0, 3.0], dtypes.FP64, size=4)
    assert weakref.ref(v)() is v
    with pytest.raises(TypeError):
        np.array(v)
    assert v[Scalar.from_value(1)].new().value == 2.0
    assert v[-1].new().value == 3.0
    expr = v.apply(unary.ainv)
    assert expr.size == 4 and expr.nvals == 3  # autocompute delegation
    assert expr.dup().to_coo()[1].tolist() == [-1.0, -2.0, -3.0]
    _, vals = v.to_coo(indices=False)
    assert vals.tolist() == [1.0, 2.0, 3.0]
    w = v.dup()
    w[0] = Scalar(dtypes.FP64)  # assigning an empty scalar deletes
    assert w.nvals == 2 and w.get(0) is None
