"""Extract differential sweep: C(M, accum, replace) << A[I, J] combos.

Reference semantics: GrB_extract (graphblas/core/matrix.py:3051-3115) with
the standard mask/accum/replace output merge.  One generated test per
(target, mask, accum, replace) combo; regions and transposed sources sweep
inside.  Oracle: dict model (tests/oracle.py).
"""

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
    return np.random.default_rng(abs(hash(tag)) % (2**31))


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


def _make(mask_kind, accum_name, replace, variant, target):
    if target == "m":
        def test():
            _check_matrix(mask_kind, accum_name, replace, variant == "T")
    else:
        def test():
            _check_vector(mask_kind, accum_name, replace, variant)

    mk = mask_kind.replace("~", "c")
    test.__name__ = f"test_extract_{target}{variant}_{mk}_{accum_name}_{'rp' if replace else 'k'}"
    return test


for _mask in _MASKS:
    for _acc in _ACCUMS:
        for _rp in (False, True):
            if _mask == "none" and _rp:
                continue
            for _var in ("N", "T"):
                _t = _make(_mask, _acc, _rp, _var, "m")
                globals()[_t.__name__] = _t
            for _var in ("flat", "row", "col"):
                _t = _make(_mask, _acc, _rp, _var, "v")
                globals()[_t.__name__] = _t
del _t


def test_extract_sweep_selfcheck():
    names = [k for k in globals() if k.startswith("test_extract_") and "selfcheck" not in k]
    # (4 masks x 3 accums x 2 rp + 1 nomask x 3 accums) x 5 variants
    assert len(names) == (4 * 3 * 2 + 3) * 5, len(names)
