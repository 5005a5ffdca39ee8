"""Exhaustive mask/accum/replace semantics vs the dict oracle.

Models reference graphblas/tests/test_mask.py (verifies recipes against
brute-force equivalents).
"""

import itertools

import numpy as np
import pytest

import graphblas_tpu as gb
from graphblas_tpu import Matrix, Vector, binary, dtypes, semiring

import oracle as orc


@pytest.mark.parametrize("structural", [True, False])
@pytest.mark.parametrize("complement", [True, False])
@pytest.mark.parametrize("replace", [True, False])
@pytest.mark.parametrize("use_accum", [True, False])
def test_mask_accum_replace_matrix(rng, structural, complement, replace, use_accum):
    dc = orc.random_matrix_dict(rng, 6, 6, 0.4, np.int64, 1, 9)
    da = orc.random_matrix_dict(rng, 6, 6, 0.4, np.int64, 1, 9)
    db = orc.random_matrix_dict(rng, 6, 6, 0.4, np.int64, 1, 9)
    dm = orc.random_matrix_dict(rng, 6, 6, 0.5, np.bool_)
    C = orc.matrix_from_dict(gb, dc, 6, 6, dtypes.INT64)
    A = orc.matrix_from_dict(gb, da, 6, 6, dtypes.INT64)
    B = orc.matrix_from_dict(gb, db, 6, 6, dtypes.INT64)
    M = orc.matrix_from_dict(gb, dm, 6, 6, dtypes.BOOL)

    mask = M.S if structural else M.V
    if complement:
        mask = ~mask
    accum = binary.plus if use_accum else None

    C(mask, accum=accum, replace=replace) << A.ewise_add(B, binary.plus)

    z = orc.ewise_add(da, db, lambda x, y: x + y)
    mask_keys = orc.mask_bits(dm, (6, 6), structural=structural, complement=complement)
    expected = orc.merge(
        dc, z, mask_keys=mask_keys, accum=(lambda x, y: x + y) if use_accum else None, replace=replace
    )
    orc.assert_equal_dicts(orc.to_dict(C), expected)


@pytest.mark.parametrize("structural", [True, False])
@pytest.mark.parametrize("complement", [True, False])
@pytest.mark.parametrize("replace", [True, False])
def test_mask_mxv(rng, structural, complement, replace):
    da = orc.random_matrix_dict(rng, 6, 6, 0.5, np.int64, 1, 9)
    dv = orc.random_vector_dict(rng, 6, 0.6, np.int64, 1, 9)
    dw = orc.random_vector_dict(rng, 6, 0.5, np.int64, 1, 9)
    dm = orc.random_vector_dict(rng, 6, 0.6, np.bool_)
    A = orc.matrix_from_dict(gb, da, 6, 6, dtypes.INT64)
    v = orc.vector_from_dict(gb, dv, 6, dtypes.INT64)
    w = orc.vector_from_dict(gb, dw, 6, dtypes.INT64)
    M = orc.vector_from_dict(gb, dm, 6, dtypes.BOOL)

    mask = M.S if structural else M.V
    if complement:
        mask = ~mask
    w(mask, replace=replace) << A.mxv(v, semiring.min_plus)

    dvm = {(k, 0): val for k, val in dv.items()}
    z = {i: val for (i, _), val in orc.mxm(da, dvm, min, orc.simple_mul(lambda x, y: x + y)).items()}
    mask_keys = orc.mask_bits(dm, (6,), structural=structural, complement=complement, ndim=1)
    expected = orc.merge(dw, z, mask_keys=mask_keys, replace=replace)
    orc.assert_equal_dicts(orc.to_dict(w), expected)


def test_mask_requires_bool_value():
    m = Matrix.from_coo([0], [0], [1.5], nrows=2, ncols=2)
    out = Matrix(float, 2, 2)
    with pytest.raises(TypeError):
        out(m) << m.ewise_add(m, binary.plus)
    # but .S / .V work on any dtype
    out(m.S) << m.ewise_add(m, binary.plus)
    assert out.nvals == 1


def test_replace_requires_mask():
    m = Matrix.from_coo([0], [0], [1.5], nrows=2, ncols=2)
    with pytest.raises(ValueError):
        m(replace=True) << m.ewise_add(m, binary.plus)


def test_mask_new():
    dm = {(0, 0): True, (0, 1): False, (1, 1): True}
    M = orc.matrix_from_dict(gb, dm, 2, 2, dtypes.BOOL)
    got = M.S.new()
    orc.assert_equal_dicts(orc.to_dict(got), {k: True for k in dm})
    got = M.V.new()
    orc.assert_equal_dicts(orc.to_dict(got), {k: True for k, v in dm.items() if v})
    got = (~M.V).new()
    expected = {(i, j): True for i in range(2) for j in range(2) if not dm.get((i, j), False)}
    orc.assert_equal_dicts(orc.to_dict(got), expected)


def test_mask_combinations(rng):
    d1 = orc.random_matrix_dict(rng, 5, 5, 0.5, np.bool_)
    d2 = orc.random_matrix_dict(rng, 5, 5, 0.5, np.bool_)
    M1 = orc.matrix_from_dict(gb, d1, 5, 5, dtypes.BOOL)
    M2 = orc.matrix_from_dict(gb, d2, 5, 5, dtypes.BOOL)
    for m1, k1 in [(M1.S, orc.mask_bits(d1, (5, 5), structural=True, complement=False)),
                   (M1.V, orc.mask_bits(d1, (5, 5), structural=False, complement=False)),
                   (~M1.S, orc.mask_bits(d1, (5, 5), structural=True, complement=True)),
                   (~M1.V, orc.mask_bits(d1, (5, 5), structural=False, complement=True))]:
        for m2, k2 in [(M2.S, orc.mask_bits(d2, (5, 5), structural=True, complement=False)),
                       (~M2.V, orc.mask_bits(d2, (5, 5), structural=False, complement=True))]:
            both = m1 & m2
            got = set(orc.to_dict(both.new()))
            assert got == (k1 & k2)
            either = m1 | m2
            got = set(orc.to_dict(either.new()))
            assert got == (k1 | k2)


@pytest.mark.parametrize("replace", [True, False])
@pytest.mark.parametrize("is_submask", [True, False])
def test_assign_mask_semantics(rng, replace, is_submask):
    """GrB_assign vs GxB_subassign: mask scope and replace scope differ
    (reference: core/matrix.py:3116-3529)."""
    dc = orc.random_matrix_dict(rng, 6, 6, 0.5, np.int64, 1, 9)
    db = orc.random_matrix_dict(rng, 3, 3, 0.7, np.int64, 1, 9)
    C = orc.matrix_from_dict(gb, dc, 6, 6, dtypes.INT64)
    B = orc.matrix_from_dict(gb, db, 3, 3, dtypes.INT64)
    rows, cols = [0, 2, 4], [1, 3, 5]

    if is_submask:
        dm = orc.random_matrix_dict(rng, 3, 3, 0.6, np.bool_)
        M = orc.matrix_from_dict(gb, dm, 3, 3, dtypes.BOOL)
        C[rows, cols](M.S, replace=replace) << B
    else:
        dm = orc.random_matrix_dict(rng, 6, 6, 0.6, np.bool_)
        M = orc.matrix_from_dict(gb, dm, 6, 6, dtypes.BOOL)
        C(M.S, replace=replace)[rows, cols] = B

    # oracle
    region = {(i, j) for i in rows for j in cols}
    z = {k: v for k, v in dc.items() if k not in region}
    for (oi, oj), v in db.items():
        z[(rows[oi], cols[oj])] = v
    if is_submask:
        mask_keys_region = {
            (rows[i], cols[j]) for (i, j) in orc.mask_bits(dm, (3, 3), structural=True, complement=False)
        }
        expected = {k: v for k, v in z.items() if k not in region}
        for k in region:
            if k in mask_keys_region:
                if k in z:
                    expected[k] = z[k]
            elif not replace and k in dc:
                # unmasked positions inside the region keep C
                expected[k] = dc[k]
    else:
        mask_keys = orc.mask_bits(dm, (6, 6), structural=True, complement=False)
        expected = orc.merge(dc, z, mask_keys=mask_keys, replace=replace)
    orc.assert_equal_dicts(orc.to_dict(C), expected)


def test_input_mask_extract(rng):
    dc = orc.random_matrix_dict(rng, 5, 5, 0.6, np.int64, 1, 9)
    dm = orc.random_matrix_dict(rng, 5, 5, 0.5, np.bool_)
    C = orc.matrix_from_dict(gb, dc, 5, 5, dtypes.INT64)
    M = orc.matrix_from_dict(gb, dm, 5, 5, dtypes.BOOL)
    w = Vector(dtypes.INT64, 5)
    w(input_mask=M.S) << C[:, 2]
    mask_keys = orc.mask_bits(dm, (5, 5), structural=True, complement=False)
    expected = {i: v for (i, j), v in dc.items() if j == 2 and (i, 2) in mask_keys}
    orc.assert_equal_dicts(orc.to_dict(w), expected)


def test_mask_combinations_full_16(rng):
    """All 16 mask-kind pairs x {&, |} vs brute-force key sets, and the
    combined mask used as a real mask in an update (reference:
    core/mask.py:205-513 recipe tables; tests/test_mask.py)."""
    d1 = orc.random_matrix_dict(rng, 5, 5, 0.5, np.bool_)
    d2 = orc.random_matrix_dict(rng, 5, 5, 0.5, np.bool_)
    da = orc.random_matrix_dict(rng, 5, 5, 0.8, np.int64, 1, 9)
    M1 = orc.matrix_from_dict(gb, d1, 5, 5, dtypes.BOOL)
    M2 = orc.matrix_from_dict(gb, d2, 5, 5, dtypes.BOOL)
    A = orc.matrix_from_dict(gb, da, 5, 5, dtypes.INT64)

    def variants(M, d):
        return [
            (M.S, orc.mask_bits(d, (5, 5), structural=True, complement=False)),
            (M.V, orc.mask_bits(d, (5, 5), structural=False, complement=False)),
            (~M.S, orc.mask_bits(d, (5, 5), structural=True, complement=True)),
            (~M.V, orc.mask_bits(d, (5, 5), structural=False, complement=True)),
        ]

    for m1, k1 in variants(M1, d1):
        for m2, k2 in variants(M2, d2):
            for combined, keys in [(m1 & m2, k1 & k2), (m1 | m2, k1 | k2)]:
                assert set(orc.to_dict(combined.new())) == keys
                # combined mask drives a masked dup of A
                C = Matrix(dtypes.INT64, 5, 5)
                C(combined) << A
                expected = {k: v for k, v in da.items() if k in keys}
                orc.assert_equal_dicts(orc.to_dict(C), expected)


def test_complement_of_combined_mask(rng):
    d1 = orc.random_matrix_dict(rng, 5, 5, 0.5, np.bool_)
    d2 = orc.random_matrix_dict(rng, 5, 5, 0.5, np.bool_)
    M1 = orc.matrix_from_dict(gb, d1, 5, 5, dtypes.BOOL)
    M2 = orc.matrix_from_dict(gb, d2, 5, 5, dtypes.BOOL)
    k1 = orc.mask_bits(d1, (5, 5), structural=True, complement=False)
    k2 = orc.mask_bits(d2, (5, 5), structural=False, complement=False)
    both = ~(M1.S & M2.V)
    all_keys = {(i, j) for i in range(5) for j in range(5)}
    assert set(orc.to_dict(both.new())) == all_keys - (k1 & k2)
    either = ~(M1.S | M2.V)
    assert set(orc.to_dict(either.new())) == all_keys - (k1 | k2)


def test_vector_mask_combinations(rng):
    dv = orc.random_vector_dict(rng, 8, 0.5, np.bool_)
    dw = orc.random_vector_dict(rng, 8, 0.5, np.bool_)
    V = orc.vector_from_dict(gb, dv, 8, dtypes.BOOL)
    W = orc.vector_from_dict(gb, dw, 8, dtypes.BOOL)
    kv = {i for i in dv}
    kw = {i for i, val in dw.items() if val}
    got = set(orc.to_dict((V.S & W.V).new()))
    assert got == (kv & kw)
    got = set(orc.to_dict((~V.S | W.V).new()))
    assert got == (set(range(8)) - kv) | kw
