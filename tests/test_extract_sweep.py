"""Extract differential sweep: C(M, accum, replace) << A[I, J] combos.

Reference semantics: GrB_extract (graphblas/core/matrix.py:3051-3115) with
the standard mask/accum/replace output merge.  One generated test per
(target, mask, accum, replace) combo; regions and transposed sources sweep
inside.  Oracle: dict model (tests/oracle.py).
"""

import zlib

import numpy as np

import graphblas_tpu as gb  # noqa: F401
from graphblas_tpu import binary
from graphblas_tpu.core import dtypes
from graphblas_tpu.core.matrix import Matrix
from graphblas_tpu.core.vector import Vector

import oracle as orc

NR, NC = 8, 10
VN = 12

_ACCUMS = {
    "none": (None, None),
    "plus": (binary.plus, lambda a, b: a + b),
    "max": (binary.max, max),
}
_MASKS = ["none", "V", "S", "~V", "~S"]


def _rng(tag):
    return np.random.default_rng(zlib.crc32((tag).encode()))


def _mk_matrix(rng, nr, nc, density=0.5, lo=-9, hi=9):
    d = {}
    for _ in range(int(nr * nc * density)):
        d[(int(rng.integers(0, nr)), int(rng.integers(0, nc)))] = float(rng.integers(lo, hi))
    rows = np.array([k[0] for k in d], np.int64)
    cols = np.array([k[1] for k in d], np.int64)
    vals = np.array(list(d.values()), np.float64)
    return d, Matrix.from_coo(rows, cols, vals, dtype=dtypes.FP64, nrows=nr, ncols=nc)


def _mk_vector(rng, n, density=0.6, lo=-9, hi=9):
    d = {}
    for _ in range(int(n * density)):
        d[int(rng.integers(0, n))] = float(rng.integers(lo, hi))
    return d, Vector.from_coo(
        np.array(list(d), np.int64), np.array(list(d.values()), np.float64),
        dtypes.FP64, size=n,
    )


def _oracle_extract_m(ad, rr, cc, transposed=False):
    # position-first so duplicate region indices each get their own cell
    out = {}
    for a, i in enumerate(rr):
        for b, j in enumerate(cc):
            key = (int(j), int(i)) if transposed else (int(i), int(j))
            if key in ad:
                out[(a, b)] = ad[key]
    return out


def _oracle_extract_v(ad, rr):
    return {a: ad[int(i)] for a, i in enumerate(rr) if int(i) in ad}


def _mask_obj(M, kind):
    m = M.S if "S" in kind else M.V
    return ~m if "~" in kind else m


def _regions_m():
    return [
        ("lists", np.array([0, 2, 5, 7]), np.array([1, 3, 4, 9])),
        ("slice", np.arange(2, 6), np.arange(3, 8)),
        ("dup", np.array([1, 1, 4]), np.array([0, 6, 6])),
        ("rev", np.array([7, 4, 0, 2]), np.array([9, 0, 5])),
    ]


def _check_matrix(mask_kind, accum_name, replace, transposed):
    accum_op, accum_fn = _ACCUMS[accum_name]
    for rname, rr, cc in _regions_m():
        if transposed:
            # A.T is (NC, NR): swap the region lists so indices stay in range
            rr, cc = cc, rr
        tag = f"xm-{mask_kind}-{accum_name}-{replace}-{transposed}-{rname}"
        rng = _rng(tag)
        ad, A = _mk_matrix(rng, NR, NC)
        nr_out, nc_out = len(rr), len(cc)
        cd, C = _mk_matrix(rng, nr_out, nc_out, density=0.4)
        src = A.T if transposed else A
        zd = _oracle_extract_m(ad, rr, cc, transposed=transposed)

        if mask_kind == "none":
            mask_keys = None
        else:
            md, M = _mk_matrix(rng, nr_out, nc_out, density=0.5, lo=0, hi=3)
            mask_keys = orc.mask_bits(
                md, (nr_out, nc_out), structural="S" in mask_kind, complement="~" in mask_kind
            )

        got = C.dup()
        if mask_kind == "none":
            if replace:
                return
            got(accum=accum_op) << src[rr.tolist(), cc.tolist()]
        else:
            got(_mask_obj(M, mask_kind), accum=accum_op, replace=replace) << src[
                rr.tolist(), cc.tolist()
            ]
        exp = orc.merge(cd, zd, mask_keys=mask_keys, accum=accum_fn, replace=replace)
        orc.assert_equal_dicts(orc.to_dict(got), exp, rel=1e-9)


def _check_vector(mask_kind, accum_name, replace, rowcol):
    accum_op, accum_fn = _ACCUMS[accum_name]
    regions = [
        ("list", np.array([0, 3, 7, 10, 11])),
        ("slice", np.arange(4, 10)),
        ("dup", np.array([2, 2, 8])),
    ]
    for rname, rr in regions:
        tag = f"xv-{mask_kind}-{accum_name}-{replace}-{rowcol}-{rname}"
        rng = _rng(tag)
        if rowcol == "flat":
            ad, A = _mk_vector(rng, VN)
            zd = _oracle_extract_v(ad, rr)
            src_expr = lambda: A[rr.tolist()]  # noqa: E731
        elif rowcol == "row":
            admat, Am = _mk_matrix(rng, 6, VN)
            ad = {j: v for (i, j), v in admat.items() if i == 3}
            zd = _oracle_extract_v(ad, rr)
            src_expr = lambda: Am[3, rr.tolist()]  # noqa: E731
        else:  # col
            admat, Am = _mk_matrix(rng, VN, 6)
            ad = {i: v for (i, j), v in admat.items() if j == 2}
            zd = _oracle_extract_v(ad, rr)
            src_expr = lambda: Am[rr.tolist(), 2]  # noqa: E731

        n_out = len(rr)
        cd, C = _mk_vector(rng, n_out, density=0.5)
        if mask_kind == "none":
            mask_keys = None
        else:
            md, M = _mk_vector(rng, n_out, density=0.5, lo=0, hi=3)
            mask_keys = orc.mask_bits(
                md, (n_out,), structural="S" in mask_kind, complement="~" in mask_kind, ndim=1
            )
        got = C.dup()
        if mask_kind == "none":
            if replace:
                return
            got(accum=accum_op) << src_expr()
        else:
            got(_mask_obj(M, mask_kind), accum=accum_op, replace=replace) << src_expr()
        exp = orc.merge(cd, zd, mask_keys=mask_keys, accum=accum_fn, replace=replace)
        orc.assert_equal_dicts(orc.to_dict(got), exp, rel=1e-9)


def test_extract_mN_none_none_k():
    _check_matrix('none', 'none', False, False)


def test_extract_mT_none_none_k():
    _check_matrix('none', 'none', False, True)


def test_extract_vflat_none_none_k():
    _check_vector('none', 'none', False, 'flat')


def test_extract_vrow_none_none_k():
    _check_vector('none', 'none', False, 'row')


def test_extract_vcol_none_none_k():
    _check_vector('none', 'none', False, 'col')


def test_extract_mN_none_plus_k():
    _check_matrix('none', 'plus', False, False)


def test_extract_mT_none_plus_k():
    _check_matrix('none', 'plus', False, True)


def test_extract_vflat_none_plus_k():
    _check_vector('none', 'plus', False, 'flat')


def test_extract_vrow_none_plus_k():
    _check_vector('none', 'plus', False, 'row')


def test_extract_vcol_none_plus_k():
    _check_vector('none', 'plus', False, 'col')


def test_extract_mN_none_max_k():
    _check_matrix('none', 'max', False, False)


def test_extract_mT_none_max_k():
    _check_matrix('none', 'max', False, True)


def test_extract_vflat_none_max_k():
    _check_vector('none', 'max', False, 'flat')


def test_extract_vrow_none_max_k():
    _check_vector('none', 'max', False, 'row')


def test_extract_vcol_none_max_k():
    _check_vector('none', 'max', False, 'col')


def test_extract_mN_V_none_k():
    _check_matrix('V', 'none', False, False)


def test_extract_mT_V_none_k():
    _check_matrix('V', 'none', False, True)


def test_extract_vflat_V_none_k():
    _check_vector('V', 'none', False, 'flat')


def test_extract_vrow_V_none_k():
    _check_vector('V', 'none', False, 'row')


def test_extract_vcol_V_none_k():
    _check_vector('V', 'none', False, 'col')


def test_extract_mN_V_none_rp():
    _check_matrix('V', 'none', True, False)


def test_extract_mT_V_none_rp():
    _check_matrix('V', 'none', True, True)


def test_extract_vflat_V_none_rp():
    _check_vector('V', 'none', True, 'flat')


def test_extract_vrow_V_none_rp():
    _check_vector('V', 'none', True, 'row')


def test_extract_vcol_V_none_rp():
    _check_vector('V', 'none', True, 'col')


def test_extract_mN_V_plus_k():
    _check_matrix('V', 'plus', False, False)


def test_extract_mT_V_plus_k():
    _check_matrix('V', 'plus', False, True)


def test_extract_vflat_V_plus_k():
    _check_vector('V', 'plus', False, 'flat')


def test_extract_vrow_V_plus_k():
    _check_vector('V', 'plus', False, 'row')


def test_extract_vcol_V_plus_k():
    _check_vector('V', 'plus', False, 'col')


def test_extract_mN_V_plus_rp():
    _check_matrix('V', 'plus', True, False)


def test_extract_mT_V_plus_rp():
    _check_matrix('V', 'plus', True, True)


def test_extract_vflat_V_plus_rp():
    _check_vector('V', 'plus', True, 'flat')


def test_extract_vrow_V_plus_rp():
    _check_vector('V', 'plus', True, 'row')


def test_extract_vcol_V_plus_rp():
    _check_vector('V', 'plus', True, 'col')


def test_extract_mN_V_max_k():
    _check_matrix('V', 'max', False, False)


def test_extract_mT_V_max_k():
    _check_matrix('V', 'max', False, True)


def test_extract_vflat_V_max_k():
    _check_vector('V', 'max', False, 'flat')


def test_extract_vrow_V_max_k():
    _check_vector('V', 'max', False, 'row')


def test_extract_vcol_V_max_k():
    _check_vector('V', 'max', False, 'col')


def test_extract_mN_V_max_rp():
    _check_matrix('V', 'max', True, False)


def test_extract_mT_V_max_rp():
    _check_matrix('V', 'max', True, True)


def test_extract_vflat_V_max_rp():
    _check_vector('V', 'max', True, 'flat')


def test_extract_vrow_V_max_rp():
    _check_vector('V', 'max', True, 'row')


def test_extract_vcol_V_max_rp():
    _check_vector('V', 'max', True, 'col')


def test_extract_mN_S_none_k():
    _check_matrix('S', 'none', False, False)


def test_extract_mT_S_none_k():
    _check_matrix('S', 'none', False, True)


def test_extract_vflat_S_none_k():
    _check_vector('S', 'none', False, 'flat')


def test_extract_vrow_S_none_k():
    _check_vector('S', 'none', False, 'row')


def test_extract_vcol_S_none_k():
    _check_vector('S', 'none', False, 'col')


def test_extract_mN_S_none_rp():
    _check_matrix('S', 'none', True, False)


def test_extract_mT_S_none_rp():
    _check_matrix('S', 'none', True, True)


def test_extract_vflat_S_none_rp():
    _check_vector('S', 'none', True, 'flat')


def test_extract_vrow_S_none_rp():
    _check_vector('S', 'none', True, 'row')


def test_extract_vcol_S_none_rp():
    _check_vector('S', 'none', True, 'col')


def test_extract_mN_S_plus_k():
    _check_matrix('S', 'plus', False, False)


def test_extract_mT_S_plus_k():
    _check_matrix('S', 'plus', False, True)


def test_extract_vflat_S_plus_k():
    _check_vector('S', 'plus', False, 'flat')


def test_extract_vrow_S_plus_k():
    _check_vector('S', 'plus', False, 'row')


def test_extract_vcol_S_plus_k():
    _check_vector('S', 'plus', False, 'col')


def test_extract_mN_S_plus_rp():
    _check_matrix('S', 'plus', True, False)


def test_extract_mT_S_plus_rp():
    _check_matrix('S', 'plus', True, True)


def test_extract_vflat_S_plus_rp():
    _check_vector('S', 'plus', True, 'flat')


def test_extract_vrow_S_plus_rp():
    _check_vector('S', 'plus', True, 'row')


def test_extract_vcol_S_plus_rp():
    _check_vector('S', 'plus', True, 'col')


def test_extract_mN_S_max_k():
    _check_matrix('S', 'max', False, False)


def test_extract_mT_S_max_k():
    _check_matrix('S', 'max', False, True)


def test_extract_vflat_S_max_k():
    _check_vector('S', 'max', False, 'flat')


def test_extract_vrow_S_max_k():
    _check_vector('S', 'max', False, 'row')


def test_extract_vcol_S_max_k():
    _check_vector('S', 'max', False, 'col')


def test_extract_mN_S_max_rp():
    _check_matrix('S', 'max', True, False)


def test_extract_mT_S_max_rp():
    _check_matrix('S', 'max', True, True)


def test_extract_vflat_S_max_rp():
    _check_vector('S', 'max', True, 'flat')


def test_extract_vrow_S_max_rp():
    _check_vector('S', 'max', True, 'row')


def test_extract_vcol_S_max_rp():
    _check_vector('S', 'max', True, 'col')


def test_extract_mN_cV_none_k():
    _check_matrix('~V', 'none', False, False)


def test_extract_mT_cV_none_k():
    _check_matrix('~V', 'none', False, True)


def test_extract_vflat_cV_none_k():
    _check_vector('~V', 'none', False, 'flat')


def test_extract_vrow_cV_none_k():
    _check_vector('~V', 'none', False, 'row')


def test_extract_vcol_cV_none_k():
    _check_vector('~V', 'none', False, 'col')


def test_extract_mN_cV_none_rp():
    _check_matrix('~V', 'none', True, False)


def test_extract_mT_cV_none_rp():
    _check_matrix('~V', 'none', True, True)


def test_extract_vflat_cV_none_rp():
    _check_vector('~V', 'none', True, 'flat')


def test_extract_vrow_cV_none_rp():
    _check_vector('~V', 'none', True, 'row')


def test_extract_vcol_cV_none_rp():
    _check_vector('~V', 'none', True, 'col')


def test_extract_mN_cV_plus_k():
    _check_matrix('~V', 'plus', False, False)


def test_extract_mT_cV_plus_k():
    _check_matrix('~V', 'plus', False, True)


def test_extract_vflat_cV_plus_k():
    _check_vector('~V', 'plus', False, 'flat')


def test_extract_vrow_cV_plus_k():
    _check_vector('~V', 'plus', False, 'row')


def test_extract_vcol_cV_plus_k():
    _check_vector('~V', 'plus', False, 'col')


def test_extract_mN_cV_plus_rp():
    _check_matrix('~V', 'plus', True, False)


def test_extract_mT_cV_plus_rp():
    _check_matrix('~V', 'plus', True, True)


def test_extract_vflat_cV_plus_rp():
    _check_vector('~V', 'plus', True, 'flat')


def test_extract_vrow_cV_plus_rp():
    _check_vector('~V', 'plus', True, 'row')


def test_extract_vcol_cV_plus_rp():
    _check_vector('~V', 'plus', True, 'col')


def test_extract_mN_cV_max_k():
    _check_matrix('~V', 'max', False, False)


def test_extract_mT_cV_max_k():
    _check_matrix('~V', 'max', False, True)


def test_extract_vflat_cV_max_k():
    _check_vector('~V', 'max', False, 'flat')


def test_extract_vrow_cV_max_k():
    _check_vector('~V', 'max', False, 'row')


def test_extract_vcol_cV_max_k():
    _check_vector('~V', 'max', False, 'col')


def test_extract_mN_cV_max_rp():
    _check_matrix('~V', 'max', True, False)


def test_extract_mT_cV_max_rp():
    _check_matrix('~V', 'max', True, True)


def test_extract_vflat_cV_max_rp():
    _check_vector('~V', 'max', True, 'flat')


def test_extract_vrow_cV_max_rp():
    _check_vector('~V', 'max', True, 'row')


def test_extract_vcol_cV_max_rp():
    _check_vector('~V', 'max', True, 'col')


def test_extract_mN_cS_none_k():
    _check_matrix('~S', 'none', False, False)


def test_extract_mT_cS_none_k():
    _check_matrix('~S', 'none', False, True)


def test_extract_vflat_cS_none_k():
    _check_vector('~S', 'none', False, 'flat')


def test_extract_vrow_cS_none_k():
    _check_vector('~S', 'none', False, 'row')


def test_extract_vcol_cS_none_k():
    _check_vector('~S', 'none', False, 'col')


def test_extract_mN_cS_none_rp():
    _check_matrix('~S', 'none', True, False)


def test_extract_mT_cS_none_rp():
    _check_matrix('~S', 'none', True, True)


def test_extract_vflat_cS_none_rp():
    _check_vector('~S', 'none', True, 'flat')


def test_extract_vrow_cS_none_rp():
    _check_vector('~S', 'none', True, 'row')


def test_extract_vcol_cS_none_rp():
    _check_vector('~S', 'none', True, 'col')


def test_extract_mN_cS_plus_k():
    _check_matrix('~S', 'plus', False, False)


def test_extract_mT_cS_plus_k():
    _check_matrix('~S', 'plus', False, True)


def test_extract_vflat_cS_plus_k():
    _check_vector('~S', 'plus', False, 'flat')


def test_extract_vrow_cS_plus_k():
    _check_vector('~S', 'plus', False, 'row')


def test_extract_vcol_cS_plus_k():
    _check_vector('~S', 'plus', False, 'col')


def test_extract_mN_cS_plus_rp():
    _check_matrix('~S', 'plus', True, False)


def test_extract_mT_cS_plus_rp():
    _check_matrix('~S', 'plus', True, True)


def test_extract_vflat_cS_plus_rp():
    _check_vector('~S', 'plus', True, 'flat')


def test_extract_vrow_cS_plus_rp():
    _check_vector('~S', 'plus', True, 'row')


def test_extract_vcol_cS_plus_rp():
    _check_vector('~S', 'plus', True, 'col')


def test_extract_mN_cS_max_k():
    _check_matrix('~S', 'max', False, False)


def test_extract_mT_cS_max_k():
    _check_matrix('~S', 'max', False, True)


def test_extract_vflat_cS_max_k():
    _check_vector('~S', 'max', False, 'flat')


def test_extract_vrow_cS_max_k():
    _check_vector('~S', 'max', False, 'row')


def test_extract_vcol_cS_max_k():
    _check_vector('~S', 'max', False, 'col')


def test_extract_mN_cS_max_rp():
    _check_matrix('~S', 'max', True, False)


def test_extract_mT_cS_max_rp():
    _check_matrix('~S', 'max', True, True)


def test_extract_vflat_cS_max_rp():
    _check_vector('~S', 'max', True, 'flat')


def test_extract_vrow_cS_max_rp():
    _check_vector('~S', 'max', True, 'row')


def test_extract_vcol_cS_max_rp():
    _check_vector('~S', 'max', True, 'col')


def test_extract_sweep_selfcheck():
    """135 literal combo tests."""
    names = [k for k in globals() if k.startswith("test_extract_") and "selfcheck" not in k]
    assert len(names) == 135, len(names)
