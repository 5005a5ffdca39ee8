"""Operator registry and UDF tests (models reference test_op.py)."""

import numpy as np
import pytest

import graphblas_tpu as gb
from graphblas_tpu import Matrix, Vector, binary, dtypes, monoid, op, semiring, unary
from graphblas_tpu.core.operator import get_semiring, get_typed_op
from graphblas_tpu.core.operator.base import TypedOpBase


def test_builtin_unary_types():
    assert dtypes.INT64 in unary.ainv.types
    assert unary.ainv[dtypes.INT64].return_type == dtypes.INT64
    assert unary.abs[dtypes.FC64].return_type == dtypes.FP64
    assert unary.isnan[dtypes.FP32].return_type == dtypes.BOOL
    # coercion: sqrt of int computes in FP64
    assert unary.sqrt[dtypes.INT64].type_ == dtypes.FP64
    with pytest.raises(KeyError):
        unary.bnot[dtypes.FP64]


def test_builtin_binary_types():
    assert binary.plus[dtypes.INT8].return_type == dtypes.INT8
    assert binary.eq[dtypes.FP64].return_type == dtypes.BOOL
    assert binary.truediv[dtypes.INT64].type_ == dtypes.FP64
    assert binary.cdiv[dtypes.INT64].return_type == dtypes.INT64
    assert binary.firsti[dtypes.FP64].return_type == dtypes.INT64


def test_binary_fn_semantics():
    f = binary.cdiv[dtypes.INT64].fn
    assert int(f(np.int64(7), np.int64(-2))) == -3  # C truncation, not floor
    f = binary.pow[dtypes.BOOL].fn
    assert bool(f(np.bool_(False), np.bool_(False))) is True
    f = binary.plus[dtypes.BOOL].fn
    assert bool(f(np.bool_(True), np.bool_(True))) is True  # OR, not add
    f = binary.minus[dtypes.BOOL].fn
    assert bool(f(np.bool_(True), np.bool_(True))) is False  # XOR
    f = binary.bget[dtypes.UINT8].fn
    assert int(f(np.uint8(0b100), np.uint8(3))) == 1


def test_monoid_identities():
    assert monoid.plus[dtypes.INT64].identity == 0
    assert monoid.times[dtypes.FP64].identity == 1
    assert monoid.min[dtypes.INT8].identity == 127
    assert monoid.max[dtypes.UINT8].identity == 0
    assert monoid.land[dtypes.BOOL].identity == True  # noqa: E712
    assert monoid.min.is_idempotent
    assert not monoid.plus.is_idempotent
    # logical monoid coercions: land over ints via BOOL
    assert monoid.land[dtypes.INT64].type_ == dtypes.BOOL


def test_binaryop_monoid_link():
    assert binary.plus.monoid is monoid.plus
    assert binary.minus.monoid is None
    assert binary.plus[dtypes.INT64].monoid is monoid.plus[dtypes.INT64]


def test_commutes_to():
    assert binary.plus.commutes_to is binary.plus
    assert binary.first.commutes_to is binary.second
    assert binary.gt.commutes_to is binary.lt
    assert binary.minus.commutes_to is binary.rminus


def test_semiring_composition():
    sr = semiring.min_plus
    assert sr.monoid is monoid.min
    assert sr.binaryop is binary.plus
    typed = sr[dtypes.FP64]
    assert typed.return_type == dtypes.FP64
    # lazy composition of arbitrary names
    sr2 = semiring.max_isge
    assert sr2.monoid is monoid.max
    sr3 = get_semiring(monoid.plus, binary.times)
    assert sr3 is semiring.plus_times or sr3.name == "plus_times"


def test_semiring_bool_coercion():
    typed = semiring.lor_land[dtypes.INT64]
    assert typed.return_type == dtypes.BOOL


def test_get_typed_op_strings():
    t = get_typed_op("min_plus", dtypes.INT32, dtypes.INT64, kind="semiring")
    assert t.parent.name == "min_plus"
    assert t.return_type == dtypes.INT64
    t = get_typed_op("+", dtypes.INT32, kind="binary")
    assert t.parent is binary.plus
    t = get_typed_op("plus[int]", dtypes.FP64, kind="binary")
    assert t.type_ == dtypes.INT64


def test_op_namespace():
    assert op.plus is binary.plus
    assert op.abs is unary.abs
    assert op.min_plus is semiring.min_plus
    assert op.from_string("min_plus") is semiring.min_plus


def test_register_new_unary():
    def plus_one(x):
        return x + 1

    op_new = unary.register_new("plus_one_test", plus_one)
    assert op_new is unary.plus_one_test
    assert dtypes.INT64 in op_new.types
    v = Vector.from_coo([0, 1], [1, 2])
    got = v.apply(op_new).new()
    assert got.to_dict() == {0: 2, 1: 3}
    # dotted names create namespaces
    unary.register_new("testing.nested", plus_one)
    assert unary.testing.nested.name == "nested"


def test_register_new_binary_and_monoid():
    def absdiff(x, y):
        import jax.numpy as jnp

        return jnp.abs(x - y)

    bop = binary.register_new("absdiff_test", absdiff)
    v = Vector.from_coo([0, 1], [5, 2])
    w = Vector.from_coo([0, 1], [3, 7])
    got = v.ewise_mult(w, bop).new()
    assert got.to_dict() == {0: 2, 1: 5}
    mon = monoid.register_new("absdiff_mon_test", bop, 0)
    assert mon[dtypes.INT64].identity == 0
    sr = semiring.register_new("min_absdiff_test", monoid.min, bop)
    got = v._as_matrix().T.new().mxv(w, sr).new()
    assert got.nvals == 1


def test_register_anonymous_lambda_in_ewise():
    v = Vector.from_coo([0, 1], [5.0, 2.0])
    got = v.apply(lambda x: x * 10).new()
    assert got.to_dict() == {0: 50.0, 1: 20.0}


def test_parameterized_udf():
    def scale(factor=2):
        def inner(x):
            return x * factor

        return inner

    sop = unary.register_new("scale_test", scale, parameterized=True)
    v = Vector.from_coo([0, 1], [1, 2])
    got = v.apply(sop(3)).new()
    assert got.to_dict() == {0: 3, 1: 6}


def test_isclose_parameterized():
    f = binary.isclose(rel_tol=0.1)
    v = Vector.from_coo([0, 1], [1.0, 1.0])
    w = Vector.from_coo([0, 1], [1.05, 2.0])
    got = v.ewise_mult(w, f).new()
    assert got.to_dict() == {0: True, 1: False}


def test_indexunary_register():
    import graphblas_tpu.indexunary as indexunary
    import graphblas_tpu.select as select

    def in_band(val, i, j, thunk):
        return (j - i >= 0) & (j - i <= thunk)

    op_new = indexunary.register_new("in_band_test", in_band)
    assert hasattr(select, "in_band_test")
    m = Matrix.from_coo([0, 0, 1], [0, 2, 0], [1, 2, 3], nrows=3, ncols=3)
    got = m.select(select.in_band_test, 1).new()
    assert got.to_dicts() == {0: {0: 1}}


def test_op_repr_and_pickle():
    import pickle

    assert repr(binary.plus) == "binary.plus"
    assert repr(semiring.min_plus) == "semiring.min_plus"
    assert "INT64" in repr(binary.plus[dtypes.INT64])
    p = pickle.loads(pickle.dumps(binary.plus))
    assert p is binary.plus
    p = pickle.loads(pickle.dumps(semiring.min_plus))
    assert p is semiring.min_plus
    p = pickle.loads(pickle.dumps(binary.plus[dtypes.INT64]))
    assert p is binary.plus[dtypes.INT64]


def test_op_contains():
    assert dtypes.INT64 in binary.plus
    assert dtypes.FP64 not in binary.band
    assert "FP64" in unary.sqrt


def test_numpy_namespace():
    # the namespace caches ops at first access, so force a fresh build under
    # a pinned mapnumpy (the harness randomizes the global default)
    for mod, names in ((unary.numpy, ("exp",)), (binary.numpy, ("add",))):
        for nm in names:
            mod.__dict__.pop(nm, None)
    with gb.config.set(mapnumpy=True):
        assert unary.numpy.exp is unary.exp
        assert binary.numpy.add is binary.plus
    unary.numpy.__dict__.pop("exp", None)
    binary.numpy.__dict__.pop("add", None)
    with gb.config.set(mapnumpy=False):
        # fresh (unmapped) ops are registered on access
        spacing = unary.numpy.spacing
        assert spacing.name == "numpy.spacing"
        exp = unary.numpy.exp
        assert exp.name == "numpy.exp"
    # restore the aliased default for later tests in this process
    unary.numpy.__dict__.pop("exp", None)
    binary.numpy.__dict__.pop("add", None)


def test_udt_register():
    udt = dtypes.register_anonymous([("x", np.int64), ("y", np.float64)], "PointTest")
    assert udt.np_type.names == ("x", "y")
    udt2 = dtypes.lookup_dtype(udt.np_type)
    assert udt2 is udt
