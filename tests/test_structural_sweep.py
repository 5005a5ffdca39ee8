"""Structural-op differential sweep: diag / setdiag / reposition /
flatten / reshape / split / concat vs index models.

Reference: Matrix.diag (core/matrix.py:720), setdiag (:2905),
reposition (:2764), ss flatten/reshape/split/concat (core/ss/matrix.py).
"""

import zlib

import numpy as np

import graphblas_tpu as gb  # noqa: F401
from graphblas_tpu import binary
from graphblas_tpu.core import dtypes
from graphblas_tpu.core.matrix import Matrix
from graphblas_tpu.core.vector import Vector

import oracle as orc

NR, NC = 7, 9


def _rng(tag):
    return np.random.default_rng(zlib.crc32(tag.encode()))


def _mk_m(rng, nr=NR, nc=NC, k=28):
    d = {}
    for _ in range(k):
        d[(int(rng.integers(0, nr)), int(rng.integers(0, nc)))] = float(rng.integers(1, 9))
    return d, Matrix.from_coo(
        np.array([k_[0] for k_ in d], np.int64),
        np.array([k_[1] for k_ in d], np.int64),
        np.array(list(d.values())), dtype=dtypes.FP64, nrows=nr, ncols=nc,
    )


def _check_diag(k):
    rng = _rng(f"diag{k}")
    d, A = _mk_m(rng)
    got = orc.to_dict(A.diag(k))
    # diag index convention: entry at position min(i, j) along the diagonal
    exp = {}
    for (i, j), v in d.items():
        if j - i == k:
            exp[i if k >= 0 else j] = v
    assert got == exp, (k, got, exp)


def test_diag_main():
    _check_diag(0)


def test_diag_upper1():
    _check_diag(1)


def test_diag_upper3():
    _check_diag(3)


def test_diag_lower1():
    _check_diag(-1)


def test_diag_lower2():
    _check_diag(-2)


def _check_vector_diag(k):
    """gb.ss.diag / Matrix from a vector diagonal."""
    rng = _rng(f"vdiag{k}")
    vals = rng.integers(1, 9, 5).astype(np.float64)
    v = Vector.from_dense(vals)
    M = gb.ss.diag(v, k=k)
    got = orc.to_dict(M)
    exp = {}
    for p, val in enumerate(vals):
        i, j = (p, p + k) if k >= 0 else (p - k, p)
        exp[(i, j)] = float(val)
    assert got == exp, (k, got, exp)


def test_vector_diag_0():
    _check_vector_diag(0)


def test_vector_diag_pos():
    _check_vector_diag(2)


def test_vector_diag_neg():
    _check_vector_diag(-3)


def _check_setdiag(k):
    rng = _rng(f"setdiag{k}")
    d, A = _mk_m(rng, 6, 6)
    A.setdiag(7.5, k)
    exp = dict(d)
    for p in range(6):
        i, j = (p, p + k) if k >= 0 else (p - k, p)
        if i < 6 and j < 6:
            exp[(i, j)] = 7.5
    orc.assert_equal_dicts(orc.to_dict(A), exp)


def test_setdiag_main():
    _check_setdiag(0)


def test_setdiag_upper():
    _check_setdiag(2)


def test_setdiag_lower():
    _check_setdiag(-1)


def _check_reposition(ri, ci):
    rng = _rng(f"repos{ri}{ci}")
    d, A = _mk_m(rng)
    got = orc.to_dict(A.reposition(ri, ci).new())
    exp = {}
    for (i, j), v in d.items():
        ni, nj = i + ri, j + ci
        if 0 <= ni < NR and 0 <= nj < NC:
            exp[(ni, nj)] = v
    assert got == exp, (ri, ci)


def test_reposition_down_right():
    _check_reposition(2, 3)


def test_reposition_up_left():
    _check_reposition(-1, -2)


def test_reposition_mixed():
    _check_reposition(3, -4)


def test_vector_reposition():
    rng = _rng("vrepos")
    d = {int(rng.integers(0, 10)): float(rng.integers(1, 9)) for _ in range(6)}
    v = Vector.from_coo(np.array(list(d), np.int64), np.array(list(d.values())), dtypes.FP64, size=10)
    got = orc.to_dict(v.reposition(3).new())
    exp = {i + 3: val for i, val in d.items() if i + 3 < 10}
    assert got == exp


def test_flatten_reshape_roundtrip():
    rng = _rng("flat")
    d, A = _mk_m(rng, 4, 6)
    flat = A.tx.flatten()
    assert flat.size == 24
    exp_flat = {i * 6 + j: v for (i, j), v in d.items()}
    assert orc.to_dict(flat) == exp_flat
    back = flat.tx.reshape(4, 6)
    orc.assert_equal_dicts(orc.to_dict(back), d)
    other = flat.tx.reshape(6, 4)
    exp_other = {(p // 4, p % 4): v for p, v in exp_flat.items()}
    orc.assert_equal_dicts(orc.to_dict(other), exp_other)


def test_split_concat_roundtrip():
    rng = _rng("split")
    d, A = _mk_m(rng, 6, 8)
    tiles = A.tx.split([[3, 3], [4, 4]])
    assert len(tiles) == 2 and len(tiles[0]) == 2
    back = gb.ss.concat(tiles)
    orc.assert_equal_dicts(orc.to_dict(back), d)


def test_concat_vectors_as_columns():
    a = Vector.from_dense(np.array([1.0, 2.0]))
    b = Vector.from_dense(np.array([3.0, 4.0]))
    M = gb.ss.concat([[a._as_matrix() if hasattr(a, "_as_matrix") else a, b._as_matrix() if hasattr(b, "_as_matrix") else b]])
    assert M.shape[0] == 2 and M.shape[1] == 2
