"""ewise_union / masked-accum reductions / kronecker / power differentials.

Reference semantics: ewise_union (core/matrix.py:2043 — absent sides take
the DEFAULT, both-absent stays absent), reduce_rowwise/columnwise with the
standard output merge, GrB_kronecker, and the binary-exponentiation power
recipe (core/matrix.py:2840).  Oracle: dict models (tests/oracle.py).
"""

import zlib

import numpy as np

import graphblas_tpu as gb  # noqa: F401
from graphblas_tpu import binary, monoid, semiring
from graphblas_tpu.core import dtypes
from graphblas_tpu.core.matrix import Matrix
from graphblas_tpu.core.vector import Vector

import oracle as orc

NR, NC = 6, 8
VN = 12


def _rng(tag):
    return np.random.default_rng(zlib.crc32((tag).encode()))


def _mk_m(rng, nr=NR, nc=NC, density=0.4):
    d = {}
    for _ in range(int(nr * nc * density)):
        d[(int(rng.integers(0, nr)), int(rng.integers(0, nc)))] = float(rng.integers(-9, 9))
    return d, Matrix.from_coo(
        np.array([k[0] for k in d], np.int64),
        np.array([k[1] for k in d], np.int64),
        np.array(list(d.values())), dtype=dtypes.FP64, nrows=nr, ncols=nc,
    )


def _mk_v(rng, n=VN, density=0.5):
    d = {}
    for _ in range(int(n * density)):
        d[int(rng.integers(0, n))] = float(rng.integers(-9, 9))
    return d, Vector.from_coo(np.array(list(d), np.int64), np.array(list(d.values())), dtypes.FP64, size=n)


# ---- ewise_union ----------------------------------------------------------

def _union_model(a, b, fn, ld, rd):
    out = {}
    for k in a.keys() | b.keys():
        out[k] = fn(a.get(k, ld), b.get(k, rd))
    return out


def _check_union(kind, opname, fn, ld, rd):
    rng = _rng(f"un-{kind}-{opname}")
    mk = _mk_m if kind == "m" else _mk_v
    ad, A = mk(rng)
    bd, B = mk(rng)
    got = A.ewise_union(B, getattr(binary, opname), ld, rd).new()
    orc.assert_equal_dicts(orc.to_dict(got), _union_model(ad, bd, fn, ld, rd), rel=1e-9)


def test_union_minus_m():
    _check_union("m", "minus", lambda a, b: a - b, 0.0, 0.0)


def test_union_minus_nonzero_defaults_m():
    _check_union("m", "minus", lambda a, b: a - b, 5.0, -3.0)


def test_union_truediv_m():
    # IEEE semantics: x/0 -> inf (numpy division, not python's ZeroDivisionError)
    _check_union(
        "m", "truediv", lambda a, b: float(np.float64(a) / np.float64(b)), 1.0, 2.0
    )


def test_union_max_m():
    _check_union("m", "max", max, -100.0, -100.0)


def test_union_minus_v():
    _check_union("v", "minus", lambda a, b: a - b, 0.0, 0.0)


def test_union_pow_v():
    _check_union("v", "pow", lambda a, b: a ** b, 1.0, 1.0)


def test_union_first_v():
    _check_union("v", "first", lambda a, b: a, 7.0, 9.0)


def test_union_scalar_defaults_as_scalars_m():
    """Scalar objects as defaults (reference accepts Scalar or literal)."""
    from graphblas_tpu.core.scalar import Scalar

    rng = _rng("un-scalar")
    ad, A = _mk_m(rng)
    bd, B = _mk_m(rng)
    got = A.ewise_union(B, binary.plus, Scalar.from_value(2.0), Scalar.from_value(4.0)).new()
    orc.assert_equal_dicts(orc.to_dict(got), _union_model(ad, bd, lambda a, b: a + b, 2.0, 4.0), rel=1e-9)


# ---- masked / accum reductions ---------------------------------------------

def _reduce_rows_model(ad, nr, fn):
    out = {}
    for (i, j), v in sorted(ad.items()):
        out[i] = fn(out[i], v) if i in out else v
    return out


def _check_reduce(axis, mask_kind, accum_name):
    rng = _rng(f"red-{axis}-{mask_kind}-{accum_name}")
    ad, A = _mk_m(rng)
    if axis == "rows":
        zd = _reduce_rows_model(ad, NR, lambda a, b: a + b)
        n_out = NR
        expr = A.reduce_rowwise(monoid.plus)
    else:
        td = {(j, i): v for (i, j), v in ad.items()}
        zd = _reduce_rows_model(td, NC, lambda a, b: a + b)
        n_out = NC
        expr = A.reduce_columnwise(monoid.plus)
    cd, C = _mk_v(rng, n_out, density=0.5)
    accum_op, accum_fn = {
        "none": (None, None), "plus": (binary.plus, lambda a, b: a + b),
        "min": (binary.min, min),
    }[accum_name]
    if mask_kind == "none":
        mask_keys = None
        got = C.dup()
        got(accum=accum_op) << expr
    else:
        md, M = _mk_v(rng, n_out, density=0.5)
        mask_keys = orc.mask_bits(
            md, (n_out,), structural="S" in mask_kind, complement="~" in mask_kind, ndim=1
        )
        got = C.dup()
        got(_mask(M, mask_kind), accum=accum_op, replace=False) << expr
    exp = orc.merge(cd, zd, mask_keys=mask_keys, accum=accum_fn, replace=False)
    orc.assert_equal_dicts(orc.to_dict(got), exp, rel=1e-9)


def _mask(M, kind):
    m = M.S if "S" in kind else M.V
    return ~m if "~" in kind else m


def test_reduce_rows_nomask_none():
    _check_reduce("rows", "none", "none")


def test_reduce_rows_nomask_plus():
    _check_reduce("rows", "none", "plus")


def test_reduce_rows_V_none():
    _check_reduce("rows", "V", "none")


def test_reduce_rows_S_plus():
    _check_reduce("rows", "S", "plus")


def test_reduce_rows_cV_min():
    _check_reduce("rows", "~V", "min")


def test_reduce_rows_cS_none():
    _check_reduce("rows", "~S", "none")


def test_reduce_cols_nomask_none():
    _check_reduce("cols", "none", "none")


def test_reduce_cols_V_plus():
    _check_reduce("cols", "V", "plus")


def test_reduce_cols_S_min():
    _check_reduce("cols", "S", "min")


def test_reduce_cols_cS_plus():
    _check_reduce("cols", "~S", "plus")


# ---- kronecker --------------------------------------------------------------

def test_kronecker_times():
    rng = _rng("kron")
    ad, A = _mk_m(rng, 3, 4, 0.5)
    bd, B = _mk_m(rng, 2, 5, 0.5)
    got = A.kronecker(B, binary.times).new()
    exp = {}
    for (i, j), av in ad.items():
        for (k, l), bv in bd.items():
            exp[(i * 2 + k, j * 5 + l)] = av * bv
    orc.assert_equal_dicts(orc.to_dict(got), exp, rel=1e-9)


def test_kronecker_plus():
    rng = _rng("kron2")
    ad, A = _mk_m(rng, 2, 3, 0.6)
    bd, B = _mk_m(rng, 3, 2, 0.6)
    got = A.kronecker(B, binary.plus).new()
    exp = {}
    for (i, j), av in ad.items():
        for (k, l), bv in bd.items():
            exp[(i * 3 + k, j * 2 + l)] = av + bv
    orc.assert_equal_dicts(orc.to_dict(got), exp, rel=1e-9)


# ---- power -------------------------------------------------------------------

def test_power_matches_repeated_mxm():
    rng = _rng("pow")
    n = 6
    d = {}
    for _ in range(14):
        d[(int(rng.integers(0, n)), int(rng.integers(0, n)))] = float(rng.integers(1, 4))
    A = Matrix.from_coo(
        np.array([k[0] for k in d], np.int64),
        np.array([k[1] for k in d], np.int64),
        np.array(list(d.values())), dtype=dtypes.FP64, nrows=n, ncols=n,
    )
    p3 = A.power(3, semiring.plus_times).new()
    ref = A.mxm(A, semiring.plus_times).new().mxm(A, semiring.plus_times).new()
    orc.assert_equal_dicts(orc.to_dict(p3), orc.to_dict(ref), rel=1e-9)


def test_power_one_is_dup():
    rng = _rng("pow1")
    ad, A = _mk_m(rng, 5, 5, 0.4)
    p1 = A.power(1, semiring.plus_times).new()
    orc.assert_equal_dicts(orc.to_dict(p1), ad, rel=1e-12)
