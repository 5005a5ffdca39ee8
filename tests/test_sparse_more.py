"""Additional sparse-format coverage: vector ops, inner/outer, diag,
compiled-loop interactions, and edge cases found while widening the
sparse surface in round 3."""

import numpy as np
import pytest

import graphblas_tpu as gb
import graphblas_tpu.tx as txmod
from graphblas_tpu import binary, monoid, semiring
from graphblas_tpu.core import dtypes as dtm
from graphblas_tpu.core.matrix import Matrix
from graphblas_tpu.core.vector import Vector

HUGE = 1 << 40


def test_sparse_vector_inner_product():
    with txmod.config.set(dense_limit=0):
        a = Vector.from_coo([0, 2, 5], [1.0, 2.0, 3.0], dtm.FP64, size=8)
    b = Vector.from_coo([2, 5, 7], [10.0, 20.0, 30.0], dtm.FP64, size=8)
    s = a.inner(b, semiring.plus_times).new()
    assert s.value == 80.0


def test_sparse_vector_ewise_with_scalar_infix():
    with txmod.config.set(dense_limit=0):
        a = Vector.from_coo([1, 3], [2.0, 4.0], dtm.FP64, size=6)
    out = a.apply(binary.plus, right=1.0).new()
    assert out.to_dict() == {1: 3.0, 3: 5.0}
    assert out._sparse is not None


def test_sparse_vector_select_strings():
    v = Vector.from_coo([1, 5, 1 << 35], [3.0, -1.0, 7.0], dtm.FP64, size=HUGE)
    assert v.select("value>=3").new().to_dict() == {1: 3.0, 1 << 35: 7.0}
    assert v.select("index<=", 100).new().to_dict() == {1: 3.0, 5: -1.0}


def test_sparse_matrix_select_tril_triu_huge():
    A = Matrix.from_coo([2, 5, 9], [5, 2, 9], [1.0, 2.0, 3.0], dtm.FP64, nrows=HUGE, ncols=HUGE)
    low = A.select("tril").new()
    assert low.to_dicts() == {5: {2: 2.0}, 9: {9: 3.0}}
    up = A.select("triu").new()
    assert up.to_dicts() == {2: {5: 1.0}, 9: {9: 3.0}}


def test_sparse_matrix_diagonal_extract():
    A = Matrix.from_coo([0, 3, 7], [0, 3, 8], [1.0, 2.0, 3.0], dtm.FP64, nrows=HUGE, ncols=HUGE)
    d = A.select("diag").new()
    assert d.to_dicts() == {0: {0: 1.0}, 3: {3: 2.0}}


def test_sparse_assign_row_then_mxv_consistency():
    """Assign into sparse storage then immediately run the mxv engine —
    plans must rebuild (pattern changed)."""
    with txmod.config.set(dense_limit=0, mxv_strategy="generic"):
        A = Matrix.from_coo([0, 1], [1, 2], [1.0, 1.0], dtm.FP32, nrows=4, ncols=4)
        x = Vector.from_dense(np.ones(4, np.float32))
        y0 = A.mxv(x, semiring.plus_times).new().to_dict()
        assert y0 == {0: 1.0, 1: 1.0}
        A[0, 3] = 5.0
        y1 = A.mxv(x, semiring.plus_times).new().to_dict()
        assert y1 == {0: 6.0, 1: 1.0}


def test_sparse_matrix_apply_after_delete():
    A = Matrix.from_coo([0, 5], [1, 2], [4.0, 9.0], dtm.FP64, nrows=HUGE, ncols=HUGE)
    del A[0, 1]
    out = A.apply(gb.unary.sqrt).new()
    assert out.to_dicts() == {5: {2: 3.0}}


def test_sparse_vector_dup_clear_mask():
    v = Vector.from_coo([3, 9], [1.0, 2.0], dtm.FP64, size=HUGE)
    w = v.dup(clear=True)
    assert w.nvals == 0 and w.size == HUGE and w._sparse is not None


def test_loop_with_matrix_state():
    A0 = Matrix.from_dense(np.eye(3))

    def body(M):
        return M.apply(binary.times, right=2.0).new(M.dtype)

    out = gb.loop(3, body, A0)
    np.testing.assert_allclose(np.diag(out.to_dense(fill_value=0)), [8.0, 8.0, 8.0])


def test_loop_masked_update_inside_body():
    mask_v = Vector.from_dense(np.array([True, False, True, False]))
    v0 = Vector.from_dense(np.ones(4))

    def body(x):
        out = x.dup()
        out(mask_v.V) << x.apply(binary.plus, right=1.0)
        return out

    out = gb.loop(2, body, v0)
    np.testing.assert_allclose(out.to_dense(), [3.0, 1.0, 3.0, 1.0])


def test_until_runner_reuse_and_iters():
    v0 = Vector.from_dense(np.ones(3))

    def cond(x):
        return (x.reduce(monoid.plus) < 20.0).new(dtm.BOOL)

    def body(x):
        return x.apply(binary.times, right=2.0).new(x.dtype)

    runner = gb.until_runner(cond, body, v0)
    out1 = runner()
    n1 = int(runner.last_iters)
    out2 = runner()
    assert int(runner.last_iters) == n1
    np.testing.assert_allclose(out1.to_dense(), out2.to_dense())
    # sums: 3,6,12,24 -> stops at 24, 3 iterations
    assert n1 == 3


def test_compiled_loop_rejects_changed_structure_input():
    v0 = Vector.from_dense(np.ones(4))
    runner = gb.loop_runner(2, lambda x: x.apply(binary.plus, right=1.0).new(x.dtype), v0)
    assert runner.mode == "hoisted"
    other = Vector.from_coo([0, 2], [1.0, 1.0], dtm.FP64, size=4)
    with pytest.raises(ValueError, match="fixed structure"):
        runner(other)


def test_dsl_cc_two_components_and_isolated():
    src = np.array([0, 1, 3, 4])
    dst = np.array([1, 2, 4, 5])
    n = 8  # 6,7 isolated
    u = np.concatenate([src, dst])
    w = np.concatenate([dst, src])
    AT = Matrix.from_coo(w, u, np.float32(1.0), dtm.FP32, nrows=n, ncols=n, dup_op=binary.first)
    from graphblas_tpu.models import dsl

    p = dsl.connected_components(AT).to_dense(fill_value=-1).astype(int)
    assert p.tolist() == [0, 0, 0, 3, 3, 3, 6, 7]
    f = dsl.fastsv(AT).to_dense(fill_value=-1).astype(int)
    assert f.tolist() == [0, 0, 0, 3, 3, 3, 6, 7]


def test_sparse_extract_after_transpose_view():
    A = Matrix.from_coo([1, 2], [5, 7], [1.0, 2.0], dtm.FP64, nrows=HUGE, ncols=HUGE)
    # T view on sparse + mxv uses the push direction (no densify)
    x = Vector.from_coo([1, 2], [10.0, 20.0], dtm.FP64, size=HUGE)
    y = A.T.mxv(x, semiring.plus_times).new()
    assert y.to_dict() == {5: 10.0, 7: 40.0}


def test_sparse_vector_reduce_empty_allow_empty():
    v = Vector(dtm.FP64, HUGE)
    s = v.reduce(monoid.plus).new()
    assert s.is_empty
    s2 = v.reduce(monoid.plus, allow_empty=False).new()
    assert s2.value == 0.0


def test_spgemm_flop_limit_config_roundtrip():
    assert txmod.config.get("spgemm_flop_limit") == 1 << 28
    with txmod.config.set(spgemm_flop_limit=64):
        assert txmod.config.get("spgemm_flop_limit") == 64


def test_from_scalar_huge_iso_guard():
    with pytest.raises(gb.exceptions.OutOfMemory, match="iso"):
        Matrix.from_scalar(1.0, 1 << 30, 1 << 30)
    # small stays fine
    M = Matrix.from_scalar(2.5, 3, 4)
    assert M.nvals == 12


def test_vxm_int_channel_matches_generic():
    rng = np.random.default_rng(11)
    n = 100
    src = rng.integers(0, n, 400)
    dst = rng.integers(0, n, 400)
    vals = rng.integers(-50, 50, 400).astype(np.int32)
    xv = rng.integers(-50, 50, n).astype(np.int32)
    outs = {}
    for strat in ("plan", "generic"):
        with txmod.config.set(dense_limit=0, mxv_strategy=strat):
            A = Matrix.from_coo(src, dst, vals, dtm.INT32, nrows=n, ncols=n, dup_op=binary.plus)
            x = Vector.from_dense(xv, dtype=dtm.INT32)
            outs[strat] = x.vxm(A, semiring.min_plus).new().to_dense(fill_value=0)
    assert np.array_equal(outs["plan"], outs["generic"])
