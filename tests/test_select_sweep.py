"""Select / IndexUnary differential sweep: every builtin indexunary op on
Matrix and Vector, as both ``apply`` (value result) and ``select``
(filtering), against independent numpy index models.

Reference contracts: graphblas/core/operator/indexunary.py builtin tables;
GrB_select semantics (core/matrix.py:2534).  One literal test per
(op, collection, mode) combo.
"""

import zlib

import numpy as np

import graphblas_tpu as gb  # noqa: F401
from graphblas_tpu import indexunary, select
from graphblas_tpu.core import dtypes
from graphblas_tpu.core.matrix import Matrix
from graphblas_tpu.core.vector import Vector

import oracle as orc

NR, NC = 7, 9
VN = 13
THUNK = 2

# model(v, i, j, thunk) for matrix cells; vectors use j=0
_MODELS = {
    "rowindex": lambda v, i, j, t: i + t,
    "colindex": lambda v, i, j, t: j + t,
    "diagindex": lambda v, i, j, t: j - i + t,
    "tril": lambda v, i, j, t: j <= i + t,
    "triu": lambda v, i, j, t: j >= i + t,
    "diag": lambda v, i, j, t: j == i + t,
    "offdiag": lambda v, i, j, t: j != i + t,
    "colle": lambda v, i, j, t: j <= t,
    "colgt": lambda v, i, j, t: j > t,
    "rowle": lambda v, i, j, t: i <= t,
    "rowgt": lambda v, i, j, t: i > t,
    "valueeq": lambda v, i, j, t: v == t,
    "valuene": lambda v, i, j, t: v != t,
    "valuelt": lambda v, i, j, t: v < t,
    "valuele": lambda v, i, j, t: v <= t,
    "valuegt": lambda v, i, j, t: v > t,
    "valuege": lambda v, i, j, t: v >= t,
}
_BOOL_OPS = {
    "tril", "triu", "diag", "offdiag", "colle", "colgt", "rowle", "rowgt",
    "valueeq", "valuene", "valuelt", "valuele", "valuegt", "valuege",
}
_POSITIONAL = {"rowindex", "colindex", "diagindex", "tril", "triu", "diag",
               "offdiag", "colle", "colgt", "rowle", "rowgt"}


def _mk(rng, kind):
    if kind == "m":
        d = {}
        for _ in range(40):
            d[(int(rng.integers(0, NR)), int(rng.integers(0, NC)))] = float(rng.integers(-4, 5))
        rows = np.array([k[0] for k in d], np.int64)
        cols = np.array([k[1] for k in d], np.int64)
        return d, Matrix.from_coo(rows, cols, np.array(list(d.values())), dtype=dtypes.FP64, nrows=NR, ncols=NC)
    d = {}
    for _ in range(9):
        d[int(rng.integers(0, VN))] = float(rng.integers(-4, 5))
    return d, Vector.from_coo(np.array(list(d), np.int64), np.array(list(d.values())), dtypes.FP64, size=VN)


def _check_apply(name, kind):
    rng = np.random.default_rng(zlib.crc32(("ap" + name + kind).encode()))
    d, C = _mk(rng, kind)
    model = _MODELS[name]
    got = C.apply(getattr(indexunary, name), THUNK).new()
    if kind == "m":
        exp = {k: model(v, k[0], k[1], THUNK) for k, v in d.items()}
    else:
        exp = {k: model(v, k, 0, THUNK) for k, v in d.items()}
    if name in _BOOL_OPS:
        exp = {k: bool(v) for k, v in exp.items()}
    else:
        exp = {k: int(v) for k, v in exp.items()}
    got_d = orc.to_dict(got)
    got_d = {k: (bool(v) if name in _BOOL_OPS else int(v)) for k, v in got_d.items()}
    assert got_d == exp, (name, kind)


def _check_select(name, kind):
    rng = np.random.default_rng(zlib.crc32(("se" + name + kind).encode()))
    d, C = _mk(rng, kind)
    model = _MODELS[name]
    got = C.select(getattr(select, name), THUNK).new()
    if kind == "m":
        exp = {k: v for k, v in d.items() if model(v, k[0], k[1], THUNK)}
    else:
        exp = {k: v for k, v in d.items() if model(v, k, 0, THUNK)}
    orc.assert_equal_dicts(orc.to_dict(got), exp)


def _check_select_string(name, kind):
    """String-op spellings: C.select("tril", t) == C.select(select.tril, t)."""
    rng = np.random.default_rng(zlib.crc32(("ss" + name + kind).encode()))
    d, C = _mk(rng, kind)
    a = orc.to_dict(C.select(name, THUNK).new())
    b = orc.to_dict(C.select(getattr(select, name), THUNK).new())
    assert a == b


def test_apply_rowindex_m():
    _check_apply("rowindex", "m")


def test_apply_colindex_m():
    _check_apply("colindex", "m")


def test_apply_diagindex_m():
    _check_apply("diagindex", "m")


def test_apply_tril_m():
    _check_apply("tril", "m")


def test_apply_triu_m():
    _check_apply("triu", "m")


def test_apply_diag_m():
    _check_apply("diag", "m")


def test_apply_offdiag_m():
    _check_apply("offdiag", "m")


def test_apply_colle_m():
    _check_apply("colle", "m")


def test_apply_colgt_m():
    _check_apply("colgt", "m")


def test_apply_rowle_m():
    _check_apply("rowle", "m")


def test_apply_rowgt_m():
    _check_apply("rowgt", "m")


def test_apply_valueeq_m():
    _check_apply("valueeq", "m")


def test_apply_valuene_m():
    _check_apply("valuene", "m")


def test_apply_valuelt_m():
    _check_apply("valuelt", "m")


def test_apply_valuele_m():
    _check_apply("valuele", "m")


def test_apply_valuegt_m():
    _check_apply("valuegt", "m")


def test_apply_valuege_m():
    _check_apply("valuege", "m")


def test_apply_rowindex_v():
    _check_apply("rowindex", "v")


def test_apply_diagindex_v():
    _check_apply("diagindex", "v")


def test_apply_tril_v():
    _check_apply("tril", "v")


def test_apply_triu_v():
    _check_apply("triu", "v")


def test_apply_valueeq_v():
    _check_apply("valueeq", "v")


def test_apply_valuelt_v():
    _check_apply("valuelt", "v")


def test_apply_valuegt_v():
    _check_apply("valuegt", "v")


def test_select_tril_m():
    _check_select("tril", "m")


def test_select_triu_m():
    _check_select("triu", "m")


def test_select_diag_m():
    _check_select("diag", "m")


def test_select_offdiag_m():
    _check_select("offdiag", "m")


def test_select_colle_m():
    _check_select("colle", "m")


def test_select_colgt_m():
    _check_select("colgt", "m")


def test_select_rowle_m():
    _check_select("rowle", "m")


def test_select_rowgt_m():
    _check_select("rowgt", "m")


def test_select_valueeq_m():
    _check_select("valueeq", "m")


def test_select_valuene_m():
    _check_select("valuene", "m")


def test_select_valuelt_m():
    _check_select("valuelt", "m")


def test_select_valuele_m():
    _check_select("valuele", "m")


def test_select_valuegt_m():
    _check_select("valuegt", "m")


def test_select_valuege_m():
    _check_select("valuege", "m")


def test_select_tril_v():
    _check_select("tril", "v")


def test_select_triu_v():
    _check_select("triu", "v")


def test_select_valueeq_v():
    _check_select("valueeq", "v")


def test_select_valuene_v():
    _check_select("valuene", "v")


def test_select_valuelt_v():
    _check_select("valuelt", "v")


def test_select_valuegt_v():
    _check_select("valuegt", "v")


def test_select_string_tril_m():
    _check_select_string("tril", "m")


def test_select_string_triu_m():
    _check_select_string("triu", "m")


def test_select_string_valuegt_v():
    _check_select_string("valuegt", "v")


def test_select_string_valuele_m():
    _check_select_string("valuele", "m")
