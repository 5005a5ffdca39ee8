"""Aggregator differential sweep: every builtin aggregator on Matrix
(rowwise/columnwise/scalar) and Vector vs numpy models.

Reference: graphblas/core/operator/agg.py recipes (monoid, pre+finalize,
composite, positional).
"""

import zlib

import numpy as np

import graphblas_tpu as gb  # noqa: F401
from graphblas_tpu import agg
from graphblas_tpu.core import dtypes
from graphblas_tpu.core.matrix import Matrix
from graphblas_tpu.core.vector import Vector

import oracle as orc

NR, NC = 6, 9

_MODELS = {
    "sum": np.sum,
    "prod": np.prod,
    "min": np.min,
    "max": np.max,
    "count": len,
    "count_nonzero": lambda vs: int(np.count_nonzero(vs)),
    "count_zero": lambda vs: int(len(vs) - np.count_nonzero(vs)),
    "mean": np.mean,
    "peak_to_peak": np.ptp,
    "varp": lambda vs: np.var(vs),
    "vars": lambda vs: np.var(vs, ddof=1) if len(vs) > 1 else np.nan,
    "stdp": lambda vs: np.std(vs),
    "stds": lambda vs: np.std(vs, ddof=1) if len(vs) > 1 else np.nan,
    "geometric_mean": lambda vs: float(np.exp(np.mean(np.log(vs)))),
    "harmonic_mean": lambda vs: float(len(vs) / np.sum(1.0 / np.asarray(vs))),
    "hypot": lambda vs: float(np.sqrt(np.sum(np.square(vs)))),
    "logaddexp": lambda vs: float(np.logaddexp.reduce(vs)),
    "logaddexp2": lambda vs: float(np.logaddexp2.reduce(vs)),
    "L0norm": lambda vs: int(np.count_nonzero(vs)),
    "L1norm": lambda vs: float(np.sum(np.abs(vs))),
    "L2norm": lambda vs: float(np.sqrt(np.sum(np.square(vs)))),
    "Linfnorm": lambda vs: float(np.max(np.abs(vs))),
    "sum_of_squares": lambda vs: float(np.sum(np.square(vs))),
    "sum_of_inverses": lambda vs: float(np.sum(1.0 / np.asarray(vs))),
    "exists": lambda vs: 1,
    "any_value": None,
    "all": lambda vs: bool(np.all(vs)),
    "any": lambda vs: bool(np.any(vs)),
    "bitwise_all": None,
    "bitwise_any": None,
}
_POSITIVE = {"geometric_mean", "harmonic_mean", "sum_of_inverses", "logaddexp", "logaddexp2"}
_BOOLISH = {"all", "any"}


def _mk(rng, positive):
    d = {}
    for _ in range(34):
        v = float(rng.integers(1, 9) if positive else rng.integers(-8, 9))
        d[(int(rng.integers(0, NR)), int(rng.integers(0, NC)))] = v
    return d, Matrix.from_coo(
        np.array([k[0] for k in d], np.int64),
        np.array([k[1] for k in d], np.int64),
        np.array(list(d.values())), dtype=dtypes.FP64, nrows=NR, ncols=NC,
    )


def _rows_model(d, model):
    groups = {}
    for (i, j), v in sorted(d.items()):
        groups.setdefault(i, []).append(v)
    return {i: model(vs) for i, vs in groups.items()}


def _check(name):
    model = _MODELS[name]
    rng = np.random.default_rng(zlib.crc32(("agg" + name).encode()))
    d, A = _mk(rng, name in _POSITIVE)
    a = getattr(agg, name)
    # rowwise
    got = {k: float(v) for k, v in orc.to_dict(A.reduce_rowwise(a).new()).items()}
    exp = {k: float(v) for k, v in _rows_model(d, model).items()}
    exp = {k: v for k, v in exp.items() if not np.isnan(v)}
    got = {k: v for k, v in got.items() if not np.isnan(v)}
    orc.assert_equal_dicts(got, exp, rel=1e-6)
    # scalar (whole collection)
    vs = list(d.values())
    got_s = float(A.reduce_scalar(a).new().value)
    exp_s = float(model(vs))
    if np.isnan(exp_s):
        assert np.isnan(got_s)
    else:
        assert abs(got_s - exp_s) <= 1e-6 * max(1.0, abs(exp_s)), (name, got_s, exp_s)


def test_agg_sum():
    _check("sum")


def test_agg_prod():
    _check("prod")


def test_agg_min():
    _check("min")


def test_agg_max():
    _check("max")


def test_agg_count():
    _check("count")


def test_agg_count_nonzero():
    _check("count_nonzero")


def test_agg_count_zero():
    _check("count_zero")


def test_agg_mean():
    _check("mean")


def test_agg_peak_to_peak():
    _check("peak_to_peak")


def test_agg_varp():
    _check("varp")


def test_agg_vars():
    _check("vars")


def test_agg_stdp():
    _check("stdp")


def test_agg_stds():
    _check("stds")


def test_agg_geometric_mean():
    _check("geometric_mean")


def test_agg_harmonic_mean():
    _check("harmonic_mean")


def test_agg_hypot():
    _check("hypot")


def test_agg_logaddexp():
    _check("logaddexp")


def test_agg_logaddexp2():
    _check("logaddexp2")


def test_agg_L0norm():
    _check("L0norm")


def test_agg_L1norm():
    _check("L1norm")


def test_agg_L2norm():
    _check("L2norm")


def test_agg_Linfnorm():
    _check("Linfnorm")


def test_agg_sum_of_squares():
    _check("sum_of_squares")


def test_agg_sum_of_inverses():
    _check("sum_of_inverses")


def test_agg_exists():
    _check("exists")


def test_agg_columnwise_mean():
    rng = np.random.default_rng(zlib.crc32(b"aggcols"))
    d, A = _mk(rng, False)
    got = {k: float(v) for k, v in orc.to_dict(A.reduce_columnwise(agg.mean).new()).items()}
    groups = {}
    for (i, j), v in sorted(d.items()):
        groups.setdefault(j, []).append(v)
    exp = {j: float(np.mean(vs)) for j, vs in groups.items()}
    orc.assert_equal_dicts(got, exp, rel=1e-9)


def test_agg_vector_sweep():
    rng = np.random.default_rng(zlib.crc32(b"aggvec"))
    d = {int(rng.integers(0, 15)): float(rng.integers(1, 9)) for _ in range(10)}
    v = Vector.from_coo(np.array(list(d), np.int64), np.array(list(d.values())), dtypes.FP64, size=15)
    vs = list(d.values())
    for name in ("sum", "mean", "L2norm", "count", "stdp", "hypot"):
        got = float(v.reduce(getattr(agg, name)).new().value)
        exp = float(_MODELS[name](vs))
        assert abs(got - exp) <= 1e-6 * max(1.0, abs(exp)), (name, got, exp)
