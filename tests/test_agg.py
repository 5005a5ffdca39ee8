"""Aggregator recipes vs numpy (models reference tests for agg)."""

import numpy as np
import pytest

import graphblas_tpu as gb
from graphblas_tpu import Matrix, Vector, agg, dtypes

import oracle as orc


@pytest.fixture
def A(rng):
    d = orc.random_matrix_dict(rng, 6, 5, 0.5, np.float64, 1, 9)
    return orc.matrix_from_dict(gb, d, 6, 5), d


def _rows(d):
    out = {}
    for (i, j), v in sorted(d.items()):
        out.setdefault(i, []).append(v)
    return out


def test_count(A):
    m, d = A
    got = m.reduce_rowwise(agg.count).new()
    assert got.dtype == dtypes.INT64
    expected = {i: len(vs) for i, vs in _rows(d).items()}
    orc.assert_equal_dicts(orc.to_dict(got), expected)
    s = m.reduce_scalar(agg.count).new()
    assert s.value == len(d)


def test_sum_min_max(A):
    m, d = A
    orc.assert_equal_dicts(
        orc.to_dict(m.reduce_rowwise(agg.sum).new()),
        {i: sum(vs) for i, vs in _rows(d).items()},
        rel=1e-10,
    )
    orc.assert_equal_dicts(
        orc.to_dict(m.reduce_columnwise(agg.min).new()),
        {j: min(v for (i, jj), v in d.items() if jj == j) for j in {k[1] for k in d}},
    )
    assert m.reduce_scalar(agg.max).new().value == max(d.values())


def test_mean_std(A):
    m, d = A
    got = m.reduce_rowwise(agg.mean).new()
    expected = {i: float(np.mean(vs)) for i, vs in _rows(d).items()}
    orc.assert_equal_dicts(orc.to_dict(got), expected, rel=1e-10)
    got = m.reduce_rowwise(agg.stdp).new()
    expected = {i: float(np.std(vs)) for i, vs in _rows(d).items()}
    orc.assert_equal_dicts(orc.to_dict(got), expected, rel=1e-8)
    rows2 = {i: vs for i, vs in _rows(d).items() if len(vs) > 1}
    got = m.reduce_rowwise(agg.stds).new()
    for i, vs in rows2.items():
        assert np.isclose(orc.to_dict(got)[i], np.std(vs, ddof=1), rtol=1e-8)


def test_varp_vars(A):
    m, d = A
    got = m.reduce_rowwise(agg.varp).new()
    for i, vs in _rows(d).items():
        assert np.isclose(orc.to_dict(got)[i], np.var(vs), rtol=1e-8)


def test_norms(A):
    m, d = A
    rows = _rows(d)
    orc.assert_equal_dicts(
        orc.to_dict(m.reduce_rowwise(agg.L1norm).new()),
        {i: float(np.sum(np.abs(vs))) for i, vs in rows.items()},
        rel=1e-10,
    )
    orc.assert_equal_dicts(
        orc.to_dict(m.reduce_rowwise(agg.L2norm).new()),
        {i: float(np.sqrt(np.sum(np.square(vs)))) for i, vs in rows.items()},
        rel=1e-10,
    )
    orc.assert_equal_dicts(
        orc.to_dict(m.reduce_rowwise(agg.Linfnorm).new()),
        {i: float(np.max(np.abs(vs))) for i, vs in rows.items()},
        rel=1e-10,
    )
    orc.assert_equal_dicts(
        orc.to_dict(m.reduce_rowwise(agg.L0norm).new()),
        {i: int(np.count_nonzero(vs)) for i, vs in rows.items()},
    )


def test_peak_to_peak_and_means(A):
    m, d = A
    rows = _rows(d)
    orc.assert_equal_dicts(
        orc.to_dict(m.reduce_rowwise(agg.peak_to_peak).new()),
        {i: max(vs) - min(vs) for i, vs in rows.items()},
        rel=1e-10,
    )
    got = m.reduce_rowwise(agg.geometric_mean).new()
    for i, vs in rows.items():
        assert np.isclose(orc.to_dict(got)[i], np.exp(np.mean(np.log(vs))), rtol=1e-8)
    got = m.reduce_rowwise(agg.harmonic_mean).new()
    for i, vs in rows.items():
        assert np.isclose(orc.to_dict(got)[i], len(vs) / np.sum(1.0 / np.asarray(vs)), rtol=1e-8)
    got = m.reduce_rowwise(agg.root_mean_square).new()
    for i, vs in rows.items():
        assert np.isclose(orc.to_dict(got)[i], np.sqrt(np.mean(np.square(vs))), rtol=1e-8)


def test_argminmax(A):
    m, d = A
    rows = _rows(d)
    got = orc.to_dict(m.reduce_rowwise(agg.argmax).new())
    for i in rows:
        j = got[i]
        assert d[(i, j)] == max(rows[i])
    got = orc.to_dict(m.reduce_rowwise(agg.argmin).new())
    for i in rows:
        assert d[(i, got[i])] == min(rows[i])


def test_first_last(A):
    m, d = A
    got = orc.to_dict(m.reduce_rowwise(agg.first).new())
    for i in got:
        j = min(jj for (ii, jj) in d if ii == i)
        assert got[i] == d[(i, j)]
    got = orc.to_dict(m.reduce_rowwise(agg.last_index).new())
    for i in got:
        assert got[i] == max(jj for (ii, jj) in d if ii == i)


def test_vector_agg(rng):
    dv = orc.random_vector_dict(rng, 10, 0.6, np.float64, 1, 9)
    v = orc.vector_from_dict(gb, dv, 10)
    assert np.isclose(float(v.reduce(agg.mean).new().value), np.mean(list(dv.values())))
    assert v.reduce(agg.count).new().value == len(dv)
    am = v.reduce(agg.argmax).new().value
    assert dv[am] == max(dv.values())


def test_agg_with_mask(A, rng):
    m, d = A
    dm = orc.random_vector_dict(rng, 6, 0.6, np.bool_)
    M = orc.vector_from_dict(gb, dm, 6, dtypes.BOOL)
    out = Vector(dtypes.FP64, 6)
    out(M.S) << m.reduce_rowwise(agg.sum)
    mask_keys = orc.mask_bits(dm, (6,), structural=True, complement=False, ndim=1)
    expected = {i: sum(vs) for i, vs in _rows(d).items() if i in mask_keys}
    orc.assert_equal_dicts(orc.to_dict(out), expected, rel=1e-10)


def test_agg_from_string(A):
    m, d = A
    got = m.reduce_scalar("count").new()
    assert got.value == len(d)
