"""Corner cases of the assign/subassign surface (the most intricate semantic
surface per SURVEY §7 — reference: core/matrix.py:3116-3581)."""

import numpy as np
import pytest

import graphblas_tpu as gb
from graphblas_tpu import Matrix, Scalar, Vector, binary, dtypes

import oracle as orc


@pytest.fixture
def C():
    rng = np.random.default_rng(11)
    d = orc.random_matrix_dict(rng, 6, 6, 0.5, np.int64, 1, 9)
    return orc.matrix_from_dict(gb, d, 6, 6, dtypes.INT64), d


def test_row_assign_with_vector_mask(C):
    """C(vmask)[i, :] = v — region-shaped (vector) mask on a row assign."""
    m, d = C
    v = Vector.from_coo([0, 2, 5], [70, 72, 75], dtypes.INT64, size=6)
    vm = Vector.from_coo([0, 2, 3], [True, True, True], dtypes.BOOL, size=6)
    m(vm.S)[1, :] = v
    # region mask semantics: inside row 1, only cols {0,2,3} get updated
    expected = {k: val for k, val in d.items()}
    for j in range(6):
        if j in (0, 2, 3):
            expected.pop((1, j), None)
            if j in (0, 2):
                expected[(1, j)] = 70 + j
    orc.assert_equal_dicts(orc.to_dict(m), expected)


def test_col_assign(C):
    m, d = C
    v = Vector.from_coo([1, 4], [81, 84], dtypes.INT64, size=6)
    m[:, 3] = v
    expected = {k: val for k, val in d.items() if k[1] != 3}
    expected[(1, 3)] = 81
    expected[(4, 3)] = 84
    orc.assert_equal_dicts(orc.to_dict(m), expected)


def test_assign_everything_scalar_with_mask(C):
    m, d = C
    mask_d = {(i, j): True for i in range(6) for j in range(6) if (i + j) % 2 == 0}
    M = orc.matrix_from_dict(gb, mask_d, 6, 6, dtypes.BOOL)
    m(M.S) << m.apply(binary.plus, right=100)
    expected = dict(d)
    for k in d:
        if k in mask_d:
            expected[k] = d[k] + 100
    orc.assert_equal_dicts(orc.to_dict(m), expected)


def test_subassign_with_accum(C):
    m, d = C
    B = Matrix.from_coo([0, 1], [0, 1], [100, 200], dtypes.INT64, nrows=2, ncols=2)
    m[[2, 4], [1, 3]](accum=binary.plus) << B
    expected = dict(d)
    for (oi, oj), val in [((0, 0), 100), ((1, 1), 200)]:
        key = ([2, 4][oi], [1, 3][oj])
        expected[key] = expected.get(key, 0) + val
    orc.assert_equal_dicts(orc.to_dict(m), expected)


def test_assign_expression_value(C):
    m, d = C
    v = Vector.from_coo([0, 1, 2], [1, 2, 3], dtypes.INT64, size=6)
    m[0, :] = v.apply(binary.times, right=10)
    expected = {k: val for k, val in d.items() if k[0] != 0}
    expected.update({(0, 0): 10, (0, 1): 20, (0, 2): 30})
    orc.assert_equal_dicts(orc.to_dict(m), expected)


def test_updater_getitem_extract(C):
    """C(mask)[idx] used as an extract-with-output-mask via << into out."""
    m, d = C
    out = Vector(dtypes.INT64, 6)
    vm = Vector.from_coo([0, 1], [True, True], dtypes.BOOL, size=6)
    out(vm.S) << m[2, :]
    row = {j: val for (i, j), val in d.items() if i == 2}
    expected = {j: val for j, val in row.items() if j in (0, 1)}
    orc.assert_equal_dicts(orc.to_dict(out), expected)


def test_scalar_element_updater():
    m = Matrix.from_coo([0], [0], [5], dtypes.INT64, nrows=2, ncols=2)
    s = Scalar(dtypes.INT64)
    s << m[0, 0]
    assert s.value == 5
    s << m[1, 1]
    assert s.is_empty


def test_vector_subassign_replace():
    v = Vector.from_coo([0, 1, 2, 3], [1, 2, 3, 4], dtypes.INT64, size=6)
    sub_mask = Vector.from_coo([0], [True], dtypes.BOOL, size=2)
    w = Vector.from_coo([0, 1], [10, 20], dtypes.INT64, size=2)
    v[[1, 2]](sub_mask.S, replace=True) << w
    # region {1, 2}: position 1 (region idx 0, masked) -> 10;
    # position 2 (region idx 1, unmasked + replace) -> deleted
    assert v.to_dict() == {0: 1, 1: 10, 3: 4}


def test_assign_empty_region_noop():
    m = Matrix.from_coo([0], [0], [5], dtypes.INT64, nrows=3, ncols=3)
    m[[], []] = Matrix(dtypes.INT64, 0, 0)
    assert m.to_dicts() == {0: {0: 5}}


def test_iso_assign_row_scalar(C):
    m, d = C
    m[3, :] = 7
    expected = {k: val for k, val in d.items() if k[0] != 3}
    for j in range(6):
        expected[(3, j)] = 7
    orc.assert_equal_dicts(orc.to_dict(m), expected)


def test_chained_updates(C):
    """Multiple masked updates compose correctly."""
    m, d = C
    snapshot = orc.to_dict(m)
    m(m.S) << m.apply(binary.plus, right=1)
    m(m.S) << m.apply(binary.plus, right=1)
    expected = {k: val + 2 for k, val in snapshot.items()}
    orc.assert_equal_dicts(orc.to_dict(m), expected)
