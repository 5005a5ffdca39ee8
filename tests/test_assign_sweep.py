"""Dense assign/subassign differential sweep.

The single most intricate contract in GraphBLAS is GrB_assign /
GxB_subassign (reference semantics: graphblas/core/matrix.py:3116-3529;
reference case density: graphblas/tests/test_matrix.py assign sections).
This file sweeps mask-kind x accum x replace x region-shape x value-kind for
both Matrix and Vector against an independent dict oracle (tests/oracle.py
style: hash-map semantics, no shared code with the engine).

Calling conventions (reference):
  assign     C(M, accum, replace)[I, J] = A     (C-shaped mask)
  subassign  C[I, J](m, accum, replace) << A    (region-shaped mask)

One generated test function per (target, mask, accum, replace, sub) combo;
each sweeps every region shape and value kind inside.
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
VN = 11

_ACCUMS = {
    "none": (None, None),
    "plus": (binary.plus, lambda a, b: a + b),
    "minus": (binary.minus, lambda a, b: a - b),
}
_MASKS = ["none", "V", "S", "~V", "~S"]


def _rng(tag):
    return np.random.default_rng(zlib.crc32((tag).encode()))


def _mk_matrix(rng, nr, nc, density=0.5, lo=-9, hi=9):
    d = {}
    for _ in range(int(nr * nc * density)):
        d[(int(rng.integers(0, nr)), int(rng.integers(0, nc)))] = float(
            rng.integers(lo, hi)
        )
    rows = np.array([k[0] for k in d], np.int64)
    cols = np.array([k[1] for k in d], np.int64)
    vals = np.array(list(d.values()), np.float64)
    m = Matrix.from_coo(rows, cols, vals, dtype=dtypes.FP64, nrows=nr, ncols=nc)
    return d, m


def _mk_vector(rng, n, density=0.6, lo=-9, hi=9):
    d = {}
    for _ in range(int(n * density)):
        d[int(rng.integers(0, n))] = float(rng.integers(lo, hi))
    idx = np.array(list(d), np.int64)
    vals = np.array(list(d.values()), np.float64)
    return d, Vector.from_coo(idx, vals, dtypes.FP64, size=n)


def _regions_m():
    full_r, full_c = np.arange(NR), np.arange(NC)
    return [
        ("full", full_r, full_c),
        ("rowslice", np.arange(1, 5), full_c),
        ("colslice", full_r, np.arange(2, 7)),
        ("lists", np.array([0, 2, 5, 6]), np.array([1, 3, 4, 8])),
        ("revlist", np.array([6, 3, 0]), np.array([8, 2, 0])),
        ("onerow", np.array([3]), full_c),
        ("onecol", full_r, np.array([4])),
    ]


def _regions_v():
    return [
        ("full", np.arange(VN)),
        ("slice", np.arange(3, 9)),
        ("list", np.array([0, 4, 7, 10])),
        ("revlist", np.array([9, 5, 1])),
        ("single", np.array([6])),
    ]


def _ix(idx, n):
    """Region indices as the DSL accepts them (slice where contiguous)."""
    if len(idx) == n and idx[0] == 0 and int(idx[-1]) == n - 1:
        return slice(None)
    if len(idx) > 1 and (np.diff(idx) == 1).all():
        return slice(int(idx[0]), int(idx[-1]) + 1)
    return idx.tolist()


def _oracle_sub(c, region_keys, vmap, accum_fn, mask_keys, replace):
    """GxB_subassign over dicts: mask/replace scoped to the region."""
    out = dict(c)
    for k in region_keys:
        inmask = mask_keys is None or k in mask_keys
        if inmask:
            if accum_fn is None:
                if k in vmap:
                    out[k] = vmap[k]
                else:
                    out.pop(k, None)
            elif k in vmap:
                out[k] = accum_fn(c[k], vmap[k]) if k in c else vmap[k]
        elif replace:
            out.pop(k, None)
    return out


def _oracle_assign(c, region_keys, vmap, accum_fn, mask_keys, replace):
    """GrB_assign over dicts: C-shaped mask merge over the whole collection."""
    z = dict(c)
    if accum_fn is None:
        for k in region_keys:
            z.pop(k, None)
        z.update(vmap)
    else:
        for k, v in vmap.items():
            z[k] = accum_fn(c[k], v) if k in c else v
    if mask_keys is None:
        return z
    out = {k: v for k, v in z.items() if k in mask_keys}
    if not replace:
        out.update({k: v for k, v in c.items() if k not in mask_keys})
    return out


def _mask_obj(M, kind):
    m = M.S if "S" in kind else M.V
    return ~m if "~" in kind else m


def _check_matrix(mask_kind, accum_name, replace, subassign):
    accum_op, accum_fn = _ACCUMS[accum_name]
    for rname, rr, cc in _regions_m():
        for vkind in ("scalar", "matrix"):
            tag = f"m-{mask_kind}-{accum_name}-{replace}-{subassign}-{rname}-{vkind}"
            rng = _rng(tag)
            cd, C = _mk_matrix(rng, NR, NC)
            region_keys = {(int(i), int(j)) for i in rr for j in cc}

            if vkind == "scalar":
                value = 5.0
                vmap = {k: 5.0 for k in region_keys}
            else:
                vd, value = _mk_matrix(rng, len(rr), len(cc), density=0.6)
                vmap = {(int(rr[a]), int(cc[b])): v for (a, b), v in vd.items()}

            if mask_kind == "none":
                mask_keys = None
            else:
                md, M = _mk_matrix(rng, NR, NC, density=0.5, lo=0, hi=3)
                mask_keys = orc.mask_bits(
                    md, (NR, NC), structural="S" in mask_kind, complement="~" in mask_kind
                )

            got = C.dup()
            if subassign:
                # region-shaped mask: slice the C-shaped mask down so the
                # oracle's mask_keys still index in C coordinates
                region_mask_keys = (
                    None if mask_keys is None else {k for k in mask_keys if k in region_keys}
                )
                if mask_kind == "none":
                    got[_ix(rr, NR), _ix(cc, NC)](accum=accum_op) << value
                else:
                    sub = M[rr.tolist(), cc.tolist()].new()
                    smask = _mask_obj(sub, mask_kind)
                    got[_ix(rr, NR), _ix(cc, NC)](smask, accum=accum_op, replace=replace) << value
                exp = _oracle_sub(cd, region_keys, vmap, accum_fn, region_mask_keys if mask_kind != "none" else None, replace)
            else:
                if mask_kind == "none":
                    got(accum=accum_op)[_ix(rr, NR), _ix(cc, NC)] = value
                else:
                    got(_mask_obj(M, mask_kind), accum=accum_op, replace=replace)[
                        _ix(rr, NR), _ix(cc, NC)
                    ] = value
                exp = _oracle_assign(cd, region_keys, vmap, accum_fn, mask_keys, replace)
            orc.assert_equal_dicts(orc.to_dict(got), exp, rel=1e-9)


def _check_vector(mask_kind, accum_name, replace, subassign):
    accum_op, accum_fn = _ACCUMS[accum_name]
    for rname, rr in _regions_v():
        for vkind in ("scalar", "vector"):
            tag = f"v-{mask_kind}-{accum_name}-{replace}-{subassign}-{rname}-{vkind}"
            rng = _rng(tag)
            cd, C = _mk_vector(rng, VN)
            region_keys = {int(i) for i in rr}

            if vkind == "scalar":
                value = 5.0
                vmap = {k: 5.0 for k in region_keys}
            else:
                vd, value = _mk_vector(rng, len(rr), density=0.7)
                vmap = {int(rr[a]): v for a, v in vd.items()}

            if mask_kind == "none":
                mask_keys = None
            else:
                md, M = _mk_vector(rng, VN, density=0.5, lo=0, hi=3)
                mask_keys = orc.mask_bits(
                    md, (VN,), structural="S" in mask_kind, complement="~" in mask_kind, ndim=1
                )

            got = C.dup()
            if subassign:
                region_mask_keys = (
                    None if mask_keys is None else {k for k in mask_keys if k in region_keys}
                )
                if mask_kind == "none":
                    got[_ix(rr, VN)](accum=accum_op) << value
                else:
                    sub = M[rr.tolist()].new()
                    smask = _mask_obj(sub, mask_kind)
                    got[_ix(rr, VN)](smask, accum=accum_op, replace=replace) << value
                exp = _oracle_sub(cd, region_keys, vmap, accum_fn, region_mask_keys if mask_kind != "none" else None, replace)
            else:
                if mask_kind == "none":
                    got(accum=accum_op)[_ix(rr, VN)] = value
                else:
                    got(_mask_obj(M, mask_kind), accum=accum_op, replace=replace)[_ix(rr, VN)] = value
                exp = _oracle_assign(cd, region_keys, vmap, accum_fn, mask_keys, replace)
            orc.assert_equal_dicts(orc.to_dict(got), exp, rel=1e-9)


def test_massign_std_none_none_k():
    _check_matrix('none', 'none', False, False)


def test_massign_sub_none_none_k():
    _check_matrix('none', 'none', False, True)


def test_massign_std_none_plus_k():
    _check_matrix('none', 'plus', False, False)


def test_massign_sub_none_plus_k():
    _check_matrix('none', 'plus', False, True)


def test_massign_std_none_minus_k():
    _check_matrix('none', 'minus', False, False)


def test_massign_sub_none_minus_k():
    _check_matrix('none', 'minus', False, True)


def test_massign_std_V_none_k():
    _check_matrix('V', 'none', False, False)


def test_massign_sub_V_none_k():
    _check_matrix('V', 'none', False, True)


def test_massign_std_V_none_rp():
    _check_matrix('V', 'none', True, False)


def test_massign_sub_V_none_rp():
    _check_matrix('V', 'none', True, True)


def test_massign_std_V_plus_k():
    _check_matrix('V', 'plus', False, False)


def test_massign_sub_V_plus_k():
    _check_matrix('V', 'plus', False, True)


def test_massign_std_V_plus_rp():
    _check_matrix('V', 'plus', True, False)


def test_massign_sub_V_plus_rp():
    _check_matrix('V', 'plus', True, True)


def test_massign_std_V_minus_k():
    _check_matrix('V', 'minus', False, False)


def test_massign_sub_V_minus_k():
    _check_matrix('V', 'minus', False, True)


def test_massign_std_V_minus_rp():
    _check_matrix('V', 'minus', True, False)


def test_massign_sub_V_minus_rp():
    _check_matrix('V', 'minus', True, True)


def test_massign_std_S_none_k():
    _check_matrix('S', 'none', False, False)


def test_massign_sub_S_none_k():
    _check_matrix('S', 'none', False, True)


def test_massign_std_S_none_rp():
    _check_matrix('S', 'none', True, False)


def test_massign_sub_S_none_rp():
    _check_matrix('S', 'none', True, True)


def test_massign_std_S_plus_k():
    _check_matrix('S', 'plus', False, False)


def test_massign_sub_S_plus_k():
    _check_matrix('S', 'plus', False, True)


def test_massign_std_S_plus_rp():
    _check_matrix('S', 'plus', True, False)


def test_massign_sub_S_plus_rp():
    _check_matrix('S', 'plus', True, True)


def test_massign_std_S_minus_k():
    _check_matrix('S', 'minus', False, False)


def test_massign_sub_S_minus_k():
    _check_matrix('S', 'minus', False, True)


def test_massign_std_S_minus_rp():
    _check_matrix('S', 'minus', True, False)


def test_massign_sub_S_minus_rp():
    _check_matrix('S', 'minus', True, True)


def test_massign_std_cV_none_k():
    _check_matrix('~V', 'none', False, False)


def test_massign_sub_cV_none_k():
    _check_matrix('~V', 'none', False, True)


def test_massign_std_cV_none_rp():
    _check_matrix('~V', 'none', True, False)


def test_massign_sub_cV_none_rp():
    _check_matrix('~V', 'none', True, True)


def test_massign_std_cV_plus_k():
    _check_matrix('~V', 'plus', False, False)


def test_massign_sub_cV_plus_k():
    _check_matrix('~V', 'plus', False, True)


def test_massign_std_cV_plus_rp():
    _check_matrix('~V', 'plus', True, False)


def test_massign_sub_cV_plus_rp():
    _check_matrix('~V', 'plus', True, True)


def test_massign_std_cV_minus_k():
    _check_matrix('~V', 'minus', False, False)


def test_massign_sub_cV_minus_k():
    _check_matrix('~V', 'minus', False, True)


def test_massign_std_cV_minus_rp():
    _check_matrix('~V', 'minus', True, False)


def test_massign_sub_cV_minus_rp():
    _check_matrix('~V', 'minus', True, True)


def test_massign_std_cS_none_k():
    _check_matrix('~S', 'none', False, False)


def test_massign_sub_cS_none_k():
    _check_matrix('~S', 'none', False, True)


def test_massign_std_cS_none_rp():
    _check_matrix('~S', 'none', True, False)


def test_massign_sub_cS_none_rp():
    _check_matrix('~S', 'none', True, True)


def test_massign_std_cS_plus_k():
    _check_matrix('~S', 'plus', False, False)


def test_massign_sub_cS_plus_k():
    _check_matrix('~S', 'plus', False, True)


def test_massign_std_cS_plus_rp():
    _check_matrix('~S', 'plus', True, False)


def test_massign_sub_cS_plus_rp():
    _check_matrix('~S', 'plus', True, True)


def test_massign_std_cS_minus_k():
    _check_matrix('~S', 'minus', False, False)


def test_massign_sub_cS_minus_k():
    _check_matrix('~S', 'minus', False, True)


def test_massign_std_cS_minus_rp():
    _check_matrix('~S', 'minus', True, False)


def test_massign_sub_cS_minus_rp():
    _check_matrix('~S', 'minus', True, True)


def test_vassign_std_none_none_k():
    _check_vector('none', 'none', False, False)


def test_vassign_sub_none_none_k():
    _check_vector('none', 'none', False, True)


def test_vassign_std_none_plus_k():
    _check_vector('none', 'plus', False, False)


def test_vassign_sub_none_plus_k():
    _check_vector('none', 'plus', False, True)


def test_vassign_std_none_minus_k():
    _check_vector('none', 'minus', False, False)


def test_vassign_sub_none_minus_k():
    _check_vector('none', 'minus', False, True)


def test_vassign_std_V_none_k():
    _check_vector('V', 'none', False, False)


def test_vassign_sub_V_none_k():
    _check_vector('V', 'none', False, True)


def test_vassign_std_V_none_rp():
    _check_vector('V', 'none', True, False)


def test_vassign_sub_V_none_rp():
    _check_vector('V', 'none', True, True)


def test_vassign_std_V_plus_k():
    _check_vector('V', 'plus', False, False)


def test_vassign_sub_V_plus_k():
    _check_vector('V', 'plus', False, True)


def test_vassign_std_V_plus_rp():
    _check_vector('V', 'plus', True, False)


def test_vassign_sub_V_plus_rp():
    _check_vector('V', 'plus', True, True)


def test_vassign_std_V_minus_k():
    _check_vector('V', 'minus', False, False)


def test_vassign_sub_V_minus_k():
    _check_vector('V', 'minus', False, True)


def test_vassign_std_V_minus_rp():
    _check_vector('V', 'minus', True, False)


def test_vassign_sub_V_minus_rp():
    _check_vector('V', 'minus', True, True)


def test_vassign_std_S_none_k():
    _check_vector('S', 'none', False, False)


def test_vassign_sub_S_none_k():
    _check_vector('S', 'none', False, True)


def test_vassign_std_S_none_rp():
    _check_vector('S', 'none', True, False)


def test_vassign_sub_S_none_rp():
    _check_vector('S', 'none', True, True)


def test_vassign_std_S_plus_k():
    _check_vector('S', 'plus', False, False)


def test_vassign_sub_S_plus_k():
    _check_vector('S', 'plus', False, True)


def test_vassign_std_S_plus_rp():
    _check_vector('S', 'plus', True, False)


def test_vassign_sub_S_plus_rp():
    _check_vector('S', 'plus', True, True)


def test_vassign_std_S_minus_k():
    _check_vector('S', 'minus', False, False)


def test_vassign_sub_S_minus_k():
    _check_vector('S', 'minus', False, True)


def test_vassign_std_S_minus_rp():
    _check_vector('S', 'minus', True, False)


def test_vassign_sub_S_minus_rp():
    _check_vector('S', 'minus', True, True)


def test_vassign_std_cV_none_k():
    _check_vector('~V', 'none', False, False)


def test_vassign_sub_cV_none_k():
    _check_vector('~V', 'none', False, True)


def test_vassign_std_cV_none_rp():
    _check_vector('~V', 'none', True, False)


def test_vassign_sub_cV_none_rp():
    _check_vector('~V', 'none', True, True)


def test_vassign_std_cV_plus_k():
    _check_vector('~V', 'plus', False, False)


def test_vassign_sub_cV_plus_k():
    _check_vector('~V', 'plus', False, True)


def test_vassign_std_cV_plus_rp():
    _check_vector('~V', 'plus', True, False)


def test_vassign_sub_cV_plus_rp():
    _check_vector('~V', 'plus', True, True)


def test_vassign_std_cV_minus_k():
    _check_vector('~V', 'minus', False, False)


def test_vassign_sub_cV_minus_k():
    _check_vector('~V', 'minus', False, True)


def test_vassign_std_cV_minus_rp():
    _check_vector('~V', 'minus', True, False)


def test_vassign_sub_cV_minus_rp():
    _check_vector('~V', 'minus', True, True)


def test_vassign_std_cS_none_k():
    _check_vector('~S', 'none', False, False)


def test_vassign_sub_cS_none_k():
    _check_vector('~S', 'none', False, True)


def test_vassign_std_cS_none_rp():
    _check_vector('~S', 'none', True, False)


def test_vassign_sub_cS_none_rp():
    _check_vector('~S', 'none', True, True)


def test_vassign_std_cS_plus_k():
    _check_vector('~S', 'plus', False, False)


def test_vassign_sub_cS_plus_k():
    _check_vector('~S', 'plus', False, True)


def test_vassign_std_cS_plus_rp():
    _check_vector('~S', 'plus', True, False)


def test_vassign_sub_cS_plus_rp():
    _check_vector('~S', 'plus', True, True)


def test_vassign_std_cS_minus_k():
    _check_vector('~S', 'minus', False, False)


def test_vassign_sub_cS_minus_k():
    _check_vector('~S', 'minus', False, True)


def test_vassign_std_cS_minus_rp():
    _check_vector('~S', 'minus', True, False)


def test_vassign_sub_cS_minus_rp():
    _check_vector('~S', 'minus', True, True)


def test_assign_sweep_selfcheck():
    """The sweep covers the full combo grid (108 literal tests)."""
    names = [k for k in globals() if k.startswith(("test_massign", "test_vassign"))]
    assert len(names) == 108, len(names)
