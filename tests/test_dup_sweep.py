"""from_coo duplicate-combination sweep (dup_op) across ops and storages.

Reference: GrB_Matrix_build dup semantics (core/matrix.py from_coo
validation; SuiteSparse combines duplicates with dup_op in input order).
"""

import zlib

import numpy as np
import pytest

import graphblas_tpu as gb  # noqa: F401
from graphblas_tpu import binary, tx
from graphblas_tpu.core import dtypes
from graphblas_tpu.core.matrix import Matrix
from graphblas_tpu.core.vector import Vector

import oracle as orc

_DUPS = {
    "plus": lambda vs: sum(vs),
    "times": lambda vs: float(np.prod(vs)),
    "min": min,
    "max": max,
    "first": lambda vs: vs[0],
    "second": lambda vs: vs[-1],
    "any": None,  # any element of the group is acceptable
}


def _coo_with_dups(rng, nr, nc, e):
    rows = rng.integers(0, nr, e)
    cols = rng.integers(0, nc, e)
    vals = rng.integers(1, 9, e).astype(np.float64)
    groups = {}
    for r, c, v in zip(rows.tolist(), cols.tolist(), vals.tolist()):
        groups.setdefault((r, c), []).append(v)
    return rows, cols, vals, groups


def _check(dup_name, sparse_storage):
    rng = np.random.default_rng(zlib.crc32((dup_name + str(sparse_storage)).encode()))
    nr, nc, e = (4000 if sparse_storage else 8), (5000 if sparse_storage else 9), 60
    rows, cols, vals, groups = _coo_with_dups(rng, nr, nc, e)
    model = _DUPS[dup_name]
    M = Matrix.from_coo(rows, cols, vals, dtype=dtypes.FP64, nrows=nr, ncols=nc,
                        dup_op=getattr(binary, dup_name))
    assert (M._sparse is not None) == sparse_storage
    got = orc.to_dict(M)
    assert set(got) == set(groups)
    for k, vs in groups.items():
        if model is None:
            assert got[k] in vs, (k, got[k], vs)
        else:
            assert abs(got[k] - model(vs)) < 1e-9, (dup_name, k, got[k], vs)


def test_dup_plus_dense():
    _check("plus", False)


def test_dup_times_dense():
    _check("times", False)


def test_dup_min_dense():
    _check("min", False)


def test_dup_max_dense():
    _check("max", False)


def test_dup_first_dense():
    _check("first", False)


def test_dup_second_dense():
    _check("second", False)


def test_dup_any_dense():
    _check("any", False)


def test_dup_plus_sparse():
    _check("plus", True)


def test_dup_times_sparse():
    _check("times", True)


def test_dup_min_sparse():
    _check("min", True)


def test_dup_max_sparse():
    _check("max", True)


def test_dup_first_sparse():
    _check("first", True)


def test_dup_second_sparse():
    _check("second", True)


def test_dup_any_sparse():
    _check("any", True)


def test_dup_required_error():
    """Duplicates without dup_op raise (reference contract)."""
    with pytest.raises(ValueError, match="[Dd]uplicate"):
        Matrix.from_coo([0, 0], [1, 1], [1.0, 2.0], nrows=3, ncols=3)


def test_vector_dup_plus():
    v = Vector.from_coo([1, 1, 3, 3, 3], [1.0, 2.0, 4.0, 5.0, 6.0], size=5, dup_op=binary.plus)
    assert orc.to_dict(v) == {1: 3.0, 3: 15.0}


def test_vector_dup_string_op():
    v = Vector.from_coo([2, 2, 2], [7.0, 3.0, 5.0], size=4, dup_op="min")
    assert orc.to_dict(v) == {2: 3.0}
