"""Semiring matmul differential sweep: mxm / mxv / vxm / inner / outer over a
panel of semirings vs the dict oracle (tests/oracle.py mxm).

Reference: GrB_mxm/mxv/vxm semantics (core/matrix.py:2203-2331); positional
semirings use the C=A*B index conventions (core/operator/base.py tables).
"""

import zlib

import numpy as np

import graphblas_tpu as gb  # noqa: F401
from graphblas_tpu import semiring
from graphblas_tpu.core import dtypes
from graphblas_tpu.core.matrix import Matrix
from graphblas_tpu.core.vector import Vector

import oracle as orc

M, K, N = 6, 7, 8

_SEMIRINGS = {
    "plus_times": (lambda a, b: a + b, lambda x, y, i, k, j: x * y),
    "min_plus": (min, lambda x, y, i, k, j: x + y),
    "max_plus": (max, lambda x, y, i, k, j: x + y),
    "min_times": (min, lambda x, y, i, k, j: x * y),
    "max_first": (max, lambda x, y, i, k, j: x),
    "min_second": (min, lambda x, y, i, k, j: y),
    "plus_pair": (lambda a, b: a + b, lambda x, y, i, k, j: 1.0),
    "min_max": (min, lambda x, y, i, k, j: max(x, y)),
    "plus_min": (lambda a, b: a + b, lambda x, y, i, k, j: min(x, y)),
    "max_min": (max, lambda x, y, i, k, j: min(x, y)),
    "min_firstj": (min, lambda x, y, i, k, j: k),
    "max_secondi": (max, lambda x, y, i, k, j: k),
    "min_firsti": (min, lambda x, y, i, k, j: i),
    "max_secondj": (max, lambda x, y, i, k, j: j),
}
_POSITIONAL = {"min_firstj", "max_secondi", "min_firsti", "max_secondj"}


def _rng(tag):
    return np.random.default_rng(zlib.crc32((tag).encode()))


def _mk(rng, nr, nc, density=0.45):
    d = {}
    for _ in range(int(nr * nc * density)):
        d[(int(rng.integers(0, nr)), int(rng.integers(0, nc)))] = float(rng.integers(1, 9))
    return d, Matrix.from_coo(
        np.array([k[0] for k in d], np.int64),
        np.array([k[1] for k in d], np.int64),
        np.array(list(d.values())), dtype=dtypes.FP64, nrows=nr, ncols=nc,
    )


def _check_mxm(name):
    rng = _rng("mxm" + name)
    ad, A = _mk(rng, M, K)
    bd, B = _mk(rng, K, N)
    add, mul = _SEMIRINGS[name]
    got = A.mxm(B, getattr(semiring, name)).new()
    exp = orc.mxm(ad, bd, add, mul)
    g = orc.to_dict(got)
    g = {k: float(v) for k, v in g.items()}
    exp = {k: float(v) for k, v in exp.items()}
    orc.assert_equal_dicts(g, exp, rel=1e-9)


def _check_mxv(name):
    rng = _rng("mxv" + name)
    ad, A = _mk(rng, M, K)
    vd = {int(i): float(_rng("x" + name).integers(1, 9)) for i in range(0, K, 2)}
    x = Vector.from_coo(np.array(list(vd), np.int64), np.array(list(vd.values())), dtypes.FP64, size=K)
    add, mul = _SEMIRINGS[name]
    got = A.mxv(x, getattr(semiring, name)).new()
    bd = {(k, 0): v for k, v in vd.items()}
    exp = {i: v for (i, _), v in orc.mxm(ad, bd, add, mul).items()}
    g = {k: float(v) for k, v in orc.to_dict(got).items()}
    orc.assert_equal_dicts(g, {k: float(v) for k, v in exp.items()}, rel=1e-9)


def _check_vxm(name):
    rng = _rng("vxm" + name)
    bd, B = _mk(rng, K, N)
    vd = {int(i): float(_rng("y" + name).integers(1, 9)) for i in range(0, K, 2)}
    x = Vector.from_coo(np.array(list(vd), np.int64), np.array(list(vd.values())), dtypes.FP64, size=K)
    add, mul = _SEMIRINGS[name]
    got = x.vxm(B, getattr(semiring, name)).new()
    ad = {(0, k): v for k, v in vd.items()}
    exp = {j: v for (_, j), v in orc.mxm(ad, bd, add, mul).items()}
    g = {k: float(v) for k, v in orc.to_dict(got).items()}
    orc.assert_equal_dicts(g, {k: float(v) for k, v in exp.items()}, rel=1e-9)


def test_mxm_plus_times():
    _check_mxm("plus_times")


def test_mxm_min_plus():
    _check_mxm("min_plus")


def test_mxm_max_plus():
    _check_mxm("max_plus")


def test_mxm_min_times():
    _check_mxm("min_times")


def test_mxm_max_first():
    _check_mxm("max_first")


def test_mxm_min_second():
    _check_mxm("min_second")


def test_mxm_plus_pair():
    _check_mxm("plus_pair")


def test_mxm_min_max():
    _check_mxm("min_max")


def test_mxm_plus_min():
    _check_mxm("plus_min")


def test_mxm_max_min():
    _check_mxm("max_min")


def test_mxm_min_firstj():
    _check_mxm("min_firstj")


def test_mxm_max_secondi():
    _check_mxm("max_secondi")


def test_mxm_min_firsti():
    _check_mxm("min_firsti")


def test_mxm_max_secondj():
    _check_mxm("max_secondj")


def test_mxv_plus_times():
    _check_mxv("plus_times")


def test_mxv_min_plus():
    _check_mxv("min_plus")


def test_mxv_max_first():
    _check_mxv("max_first")


def test_mxv_plus_pair():
    _check_mxv("plus_pair")


def test_mxv_min_firstj():
    _check_mxv("min_firstj")


def test_vxm_plus_times():
    _check_vxm("plus_times")


def test_vxm_min_plus():
    _check_vxm("min_plus")


def test_vxm_min_second():
    _check_vxm("min_second")


def test_vxm_plus_pair():
    _check_vxm("plus_pair")


def test_inner_matches_oracle():
    rng = _rng("inner")
    a = rng.integers(1, 9, K).astype(np.float64)
    b = rng.integers(1, 9, K).astype(np.float64)
    va = Vector.from_dense(a)
    vb = Vector.from_dense(b)
    got = float(va.inner(vb, semiring.plus_times).new().value)
    assert abs(got - float(a @ b)) < 1e-9


def test_outer_matches_oracle():
    rng = _rng("outer")
    a = rng.integers(1, 9, 4).astype(np.float64)
    b = rng.integers(1, 9, 5).astype(np.float64)
    va = Vector.from_dense(a)
    vb = Vector.from_dense(b)
    got = va.outer(vb).new()
    exp = {(i, j): a[i] * b[j] for i in range(4) for j in range(5)}
    orc.assert_equal_dicts({k: float(v) for k, v in orc.to_dict(got).items()}, exp, rel=1e-9)
