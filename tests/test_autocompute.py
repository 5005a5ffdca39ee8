"""Autocompute on/off behavior sweep.

Reference semantics: graphblas/core/automethods.py:14-28 — every value-bearing
attribute/method/dunder of a delayed expression goes through ``_get_value``:
with ``autocompute`` ON it materializes (once, cached) and delegates; with it
OFF it raises TypeError with a hint.  Structural attributes (dtype, shape,
nrows/ncols/size, ndim), ``.new()``, and updates (``<<``) never require
autocompute.  Sweeps every expression family x both config states.
"""

import numpy as np
import pytest

import graphblas_tpu as gb
from graphblas_tpu import agg, binary, monoid, semiring, unary
from graphblas_tpu.core import dtypes
from graphblas_tpu.core.matrix import Matrix
from graphblas_tpu.core.scalar import Scalar
from graphblas_tpu.core.vector import Vector


@pytest.fixture
def data():
    A = Matrix.from_coo([0, 0, 1, 2], [1, 2, 0, 2], [1.0, 2.0, 3.0, 4.0], nrows=3, ncols=3)
    v = Vector.from_coo([0, 2], [1.0, 2.0], size=3)
    return A, v


def _bool_v():
    return Vector.from_coo([0, 1], [True, True], size=3, dtype=dtypes.BOOL)


def _bool_m():
    return Matrix.from_coo([0, 1], [1, 0], [True, True], nrows=3, ncols=3, dtype=dtypes.BOOL)


def _matrix_exprs(A, v):
    """(name, expression, output_kind) for every delayed-expression family."""
    return [
        ("ewise_add", A.ewise_add(A, binary.plus), "matrix"),
        ("ewise_mult", A.ewise_mult(A, binary.times), "matrix"),
        ("ewise_union", A.ewise_union(A, binary.plus, 0.0, 0.0), "matrix"),
        ("mxm", A.mxm(A, semiring.plus_times), "matrix"),
        ("mxv", A.mxv(v, semiring.plus_times), "vector"),
        ("vxm", v.vxm(A, semiring.plus_times), "vector"),
        ("apply", A.apply(unary.ainv), "matrix"),
        ("apply_bound", A.apply(binary.plus, right=1), "matrix"),
        ("select", A.select("tril"), "matrix"),
        ("kronecker", A.kronecker(A, binary.times), "matrix"),
        ("reduce_rowwise", A.reduce_rowwise(monoid.plus), "vector"),
        ("reduce_scalar", A.reduce_scalar(monoid.plus), "scalar"),
        ("reduce_agg", A.reduce_scalar(agg.count), "scalar"),
        ("v_reduce", v.reduce(monoid.plus), "scalar"),
        ("extract_row", A[0, :], "vector"),
        ("extract_sub", A[[0, 1], [0, 2]], "matrix"),
        ("v_extract", v[[0, 1]], "vector"),
        # bare | / & only have default ops for BOOL (reference core/infix.py:19-45)
        ("infix_or", _bool_v() | _bool_v(), "vector"),
        ("infix_and", _bool_m() & _bool_m(), "matrix"),
        ("infix_matmul", A @ v, "vector"),
        ("infix_inner", v @ v, "scalar"),
        ("dunder_add", v + v, "vector"),
        ("dunder_neg", -v, "vector"),
    ]


_VALUE_ATTRS = {
    "matrix": ["nvals", "S", "V", "T"],
    "vector": ["nvals", "S", "V"],
    "scalar": ["value", "is_empty"],
}


def test_off_value_attrs_raise(data):
    A, v = data
    with gb.config.set(autocompute=False):
        for name, expr, kind in _matrix_exprs(A, v):
            for attr in _VALUE_ATTRS[kind]:
                if not hasattr(type(expr), attr) and attr in ("T",):
                    pass  # attr served via __getattr__; still must raise
                with pytest.raises(TypeError, match="autocompute"):
                    getattr(expr, attr)


def test_off_isequal_isclose_raise(data):
    A, v = data
    with gb.config.set(autocompute=False):
        for name, expr, kind in _matrix_exprs(A, v):
            with pytest.raises(TypeError, match="autocompute"):
                expr.isequal(expr)
            with pytest.raises(TypeError, match="autocompute"):
                expr.isclose(expr)


def test_off_container_dunders_raise(data):
    A, v = data
    with gb.config.set(autocompute=False):
        for name, expr, kind in _matrix_exprs(A, v):
            if kind == "scalar":
                continue
            with pytest.raises(TypeError, match="autocompute"):
                iter(expr)
            with pytest.raises(TypeError, match="autocompute"):
                1.0 in expr
            with pytest.raises(TypeError, match="autocompute"):
                np.asarray(expr)


def test_off_scalar_dunders_raise(data):
    A, v = data
    with gb.config.set(autocompute=False):
        for name, expr, kind in _matrix_exprs(A, v):
            if kind != "scalar":
                continue
            for conv in (float, int, bool, complex):
                with pytest.raises(TypeError, match="autocompute"):
                    conv(expr)


def test_off_structural_attrs_work(data):
    A, v = data
    with gb.config.set(autocompute=False):
        for name, expr, kind in _matrix_exprs(A, v):
            assert expr.dtype is not None, name
            if kind == "matrix":
                assert expr.ndim == 2
                assert len(expr.shape) == 2
            elif kind == "vector":
                assert expr.ndim == 1
            # repr never computes (and never raises) with autocompute off
            repr(expr)


def test_off_new_and_update_work(data):
    A, v = data
    with gb.config.set(autocompute=False):
        for name, expr, kind in _matrix_exprs(A, v):
            out = expr.new()
            assert out.dtype is not None, name
            if kind == "matrix":
                tgt = Matrix(out.dtype, *out.shape)
            elif kind == "vector":
                tgt = Vector(out.dtype, out.size)
            else:
                tgt = Scalar(out.dtype)
            tgt << expr if kind != "scalar" else tgt.update(expr)
            if kind == "scalar":
                assert tgt.isequal(out), name
            else:
                assert tgt.isequal(out), name


def test_off_infix_operand_raises(data):
    A, v = data
    with gb.config.set(autocompute=False):
        e = v.ewise_add(v, binary.plus)
        with pytest.raises(TypeError, match="autocompute"):
            e | v
        with pytest.raises(TypeError, match="autocompute"):
            v & e
        with pytest.raises(TypeError, match="autocompute"):
            A @ e


def test_off_aaoe_value_gated(data):
    A, v = data
    with gb.config.set(autocompute=False):
        el = A[0, 1]
        with pytest.raises(TypeError, match="autocompute"):
            el.value
        with pytest.raises(TypeError, match="autocompute"):
            A[0, :].nvals
        # .new() always works
        assert A[0, 1].new().value == 1.0
        # assignment through an AAOE never needs autocompute
        B = A.dup()
        B[0, 1] << 9.0
        assert B[0, 1].new().value == 9.0


def test_on_attrs_match_new(data):
    A, v = data
    with gb.config.set(autocompute=True):
        for name, expr, kind in _matrix_exprs(A, v):
            out = expr.new()
            if kind == "scalar":
                if out.is_empty:
                    continue
                assert float(expr) == pytest.approx(float(out.value)), name
            else:
                assert expr.nvals == out.nvals, name
                assert expr.isequal(out), name


def test_on_value_cached(data):
    A, v = data
    with gb.config.set(autocompute=True):
        e = A.ewise_add(A, binary.plus)
        first = e._get_value()
        assert e.nvals == first.nvals
        assert e._get_value() is first  # one materialization, reused
        ie = v | v
        with pytest.raises(TypeError):  # non-BOOL bare | has no default op
            ie.nvals
        bv = Vector.from_coo([0, 1], [True, True], size=3, dtype=dtypes.BOOL)
        be = bv | bv
        assert be.nvals == 2
        assert be._get_value() is be._get_value()


def test_on_scalar_dunders(data):
    A, v = data
    with gb.config.set(autocompute=True):
        assert float(v @ v) == pytest.approx(5.0)
        assert int(v.reduce(monoid.plus)) == 3
        assert bool(A.reduce_scalar(monoid.plus))
        assert complex(v @ v) == complex(5.0)
        assert A[0, 1].value == 1.0


def test_on_iter_contains_array(data):
    A, v = data
    with gb.config.set(autocompute=True):
        e = v.ewise_add(v, binary.plus)
        assert sorted(i for i in e) == [0, 2]
        assert 0 in e
        # __array__ delegates to the collection, which refuses direct numpy
        # conversion by contract — the delegated message, not the autocompute one
        with pytest.raises(TypeError, match="to_coo"):
            np.asarray(v.apply(unary.one))


def test_config_restored_after_context(data):
    A, v = data
    assert gb.config.get("autocompute") is True
    with gb.config.set(autocompute=False):
        assert gb.config.get("autocompute") is False
        with pytest.raises(TypeError, match="autocompute"):
            A.ewise_add(A, binary.plus).nvals
    assert gb.config.get("autocompute") is True
    assert A.ewise_add(A, binary.plus).nvals == 4


def test_off_error_message_has_hint(data):
    A, v = data
    with gb.config.set(autocompute=False):
        with pytest.raises(TypeError, match=r"\.new\(\)"):
            A.ewise_add(A, binary.plus).nvals
