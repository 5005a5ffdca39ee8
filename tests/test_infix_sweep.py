"""Infix-operator differential sweep: `|` `&` `@` and arithmetic dunders
against their method spellings.

Reference: core/infix.py (ewise infix with default ops), core/infixmethods.py
(arithmetic dunders -> apply/ewise).
"""

import zlib

import numpy as np

import graphblas_tpu as gb  # noqa: F401
from graphblas_tpu import binary, semiring
from graphblas_tpu.core import dtypes
from graphblas_tpu.core.matrix import Matrix
from graphblas_tpu.core.vector import Vector

import oracle as orc


def _rng(tag):
    return np.random.default_rng(zlib.crc32(tag.encode()))


def _mk_v(tag, n=10):
    rng = _rng(tag)
    d = {int(rng.integers(0, n)): float(rng.integers(1, 9)) for _ in range(6)}
    return d, Vector.from_coo(np.array(list(d), np.int64), np.array(list(d.values())), dtypes.FP64, size=n)


def _mk_m(tag, nr=5, nc=6):
    rng = _rng(tag)
    d = {(int(rng.integers(0, nr)), int(rng.integers(0, nc))): float(rng.integers(1, 9)) for _ in range(12)}
    return d, Matrix.from_coo(
        np.array([k[0] for k in d], np.int64), np.array([k[1] for k in d], np.int64),
        np.array(list(d.values())), dtype=dtypes.FP64, nrows=nr, ncols=nc,
    )


def test_vector_or_is_ewise_add():
    import pytest

    _, a = _mk_v("ia")
    _, b = _mk_v("ib")
    via_method = orc.to_dict(a.ewise_add(b, binary.plus).new(dtypes.FP64))
    # an op applied to the infix expression computes it
    got2 = orc.to_dict(binary.plus(a | b).new(dtypes.FP64))
    assert got2 == via_method
    # bare `x | y` only auto-computes for BOOL (reference core/infix.py:19-45)
    with pytest.raises(TypeError, match="BOOL"):
        (a | b).new(dtypes.FP64)
    ba = a.apply("ne", 0).new(dtypes.BOOL)
    bb = b.apply("ne", 0).new(dtypes.BOOL)
    bool_or = orc.to_dict((ba | bb).new(dtypes.BOOL))
    assert bool_or == {k: True for k in set(via_method)}


def test_vector_and_is_ewise_mult():
    _, a = _mk_v("ic")
    _, b = _mk_v("id")
    got = orc.to_dict(binary.times(a & b).new(dtypes.FP64))
    exp = orc.to_dict(a.ewise_mult(b, binary.times).new(dtypes.FP64))
    assert got == exp


def test_matmul_is_plus_times():
    _, A = _mk_m("ie")
    _, B = _mk_m("if", 6, 4)
    got = orc.to_dict((A @ B).new(dtypes.FP64))
    exp = orc.to_dict(A.mxm(B, semiring.plus_times).new(dtypes.FP64))
    assert got == exp


def test_vector_matmul_vector_is_inner():
    _, a = _mk_v("ig")
    _, b = _mk_v("ih")
    got = (a @ b).new(dtypes.FP64)
    exp = a.inner(b, semiring.plus_times).new(dtypes.FP64)
    ga, gb_ = got.value, exp.value
    if ga is None or (isinstance(ga, float) and np.isnan(ga)):
        assert gb_ is None or (isinstance(gb_, float) and np.isnan(gb_))
    else:
        assert abs(float(ga) - float(gb_)) < 1e-9


def test_arith_add_scalar():
    d, a = _mk_v("ii")
    got = orc.to_dict((a + 3.0).new(dtypes.FP64))
    assert got == {k: v + 3.0 for k, v in d.items()}


def test_arith_radd_scalar():
    d, a = _mk_v("ij")
    got = orc.to_dict((3.0 + a).new(dtypes.FP64))
    assert got == {k: 3.0 + v for k, v in d.items()}


def test_arith_mul_vectors_intersection():
    da, a = _mk_v("ik")
    db, b = _mk_v("il")
    got = orc.to_dict((a * b).new(dtypes.FP64))
    assert got == {k: da[k] * db[k] for k in da.keys() & db.keys()}


def test_arith_sub_vectors_union():
    da, a = _mk_v("im")
    db, b = _mk_v("in")
    got = orc.to_dict((a - b).new(dtypes.FP64))
    exp = {}
    for k in da.keys() | db.keys():
        if k in da and k in db:
            exp[k] = da[k] - db[k]
        elif k in da:
            exp[k] = da[k]
        else:
            exp[k] = db[k]  # ewise_add(minus) keeps the lone value
    assert got == exp


def test_arith_neg():
    d, a = _mk_v("io")
    got = orc.to_dict((-a).new(dtypes.FP64))
    assert got == {k: -v for k, v in d.items()}


def test_arith_abs():
    d, a = _mk_v("ip")
    neg = (-a).new(dtypes.FP64)
    got = orc.to_dict(abs(neg).new(dtypes.FP64))
    assert got == {k: abs(v) for k, v in d.items()}


def test_arith_pow_scalar():
    d, a = _mk_v("iq")
    got = orc.to_dict((a ** 2).new(dtypes.FP64))
    assert got == {k: v ** 2 for k, v in d.items()}


def test_arith_truediv_scalar():
    d, a = _mk_v("ir")
    got = orc.to_dict((a / 2.0).new(dtypes.FP64))
    assert got == {k: v / 2.0 for k, v in d.items()}


def test_matrix_add_scalar():
    d, A = _mk_m("is")
    got = orc.to_dict((A + 1.5).new(dtypes.FP64))
    assert got == {k: v + 1.5 for k, v in d.items()}


def test_infix_into_updater():
    da, a = _mk_v("it")
    db, b = _mk_v("iu")
    out = Vector(dtypes.FP64, a.size)
    out << binary.plus(a | b)
    exp = {}
    for k in da.keys() | db.keys():
        exp[k] = da.get(k, 0.0) + db.get(k, 0.0) if (k in da and k in db) else da.get(k, db.get(k))
    assert orc.to_dict(out) == exp


def test_comparison_eq_vectors():
    da, a = _mk_v("iv")
    got = orc.to_dict((a == a).new(dtypes.BOOL))
    assert got == {k: True for k in da}
