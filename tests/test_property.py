"""Property-based differential testing: random op chains vs the dict oracle.

Models the reference's brute-force cross-validation style (reference
graphblas/tests/test_mask.py parametrized sweeps) but as randomized chains:
each chain threads one collection through a random sequence of masked /
accumulated operations, checking the engine against tests/oracle.py after
every step.  Integer dtypes + min_plus matmuls keep every step exact, so any
mismatch is a real semantics bug, not tolerance noise.
"""

import numpy as np
import pytest

import graphblas_tpu as gb
from graphblas_tpu import Matrix, Vector, binary, dtypes, semiring

import oracle

N_CHAINS = 8
N_STEPS = 7
N = 5  # square so mxm composes

_BINOPS = {
    "plus": (binary.plus, lambda a, b: a + b),
    "times": (binary.times, lambda a, b: a * b),
    "min": (binary.min, min),
    "max": (binary.max, max),
    "first": (binary.first, lambda a, b: a),
    "second": (binary.second, lambda a, b: b),
    "minus": (binary.minus, lambda a, b: a - b),
}


def _rand_mask(rng, shape, ndim):
    """Random (gb_mask, oracle_keys) or (None, None)."""
    if rng.random() < 0.3:
        return None, None, False
    d = (
        oracle.random_matrix_dict(rng, *shape, density=0.5, dtype=np.bool_)
        if ndim == 2
        else oracle.random_vector_dict(rng, shape[0], density=0.6, dtype=np.bool_)
    )
    holder = (
        oracle.matrix_from_dict(gb, d, *shape, dtype=dtypes.BOOL)
        if ndim == 2
        else oracle.vector_from_dict(gb, d, shape[0], dtype=dtypes.BOOL)
    )
    structural = bool(rng.random() < 0.5)
    complement = bool(rng.random() < 0.3)
    m = holder.S if structural else holder.V
    if complement:
        m = ~m
    keys = oracle.mask_bits(d, shape, structural=structural, complement=complement, ndim=ndim)
    replace = bool(rng.random() < 0.3)
    return m, keys, replace


def _rand_accum(rng):
    if rng.random() < 0.5:
        return None, None
    name = rng.choice(["plus", "min", "max", "second"])
    return _BINOPS[name][0], _BINOPS[name][1]


def _step_matrix(rng, C, cd):
    """One random mutating step applied to both the Matrix and the oracle."""
    kind = rng.choice(["ewise_add", "ewise_mult", "mxm", "apply", "select"])
    od = oracle.random_matrix_dict(rng, N, N, density=0.4, dtype=np.int64, low=-3, high=4)
    other = oracle.matrix_from_dict(gb, od, N, N, dtype=dtypes.INT64)
    opname = rng.choice(["plus", "min", "max", "first", "minus"])
    op, fn = _BINOPS[opname]
    if kind == "ewise_add":
        expr = C.ewise_add(other, op)
        z = oracle.ewise_add(cd, od, fn)
    elif kind == "ewise_mult":
        expr = C.ewise_mult(other, op)
        z = oracle.ewise_mult(cd, od, fn)
    elif kind == "mxm":
        expr = C.mxm(other, semiring.min_plus)
        z = oracle.mxm(cd, od, min, oracle.simple_mul(lambda a, b: a + b))
    elif kind == "apply":
        c = int(rng.integers(-3, 4))
        expr = C.apply(op, right=c)
        z = {k: fn(v, c) for k, v in cd.items()}
    else:  # select
        c = int(rng.integers(-5, 6))
        expr = C.select("valuegt", c)
        z = {k: v for k, v in cd.items() if v > c}
    mask, mask_keys, replace = _rand_mask(rng, (N, N), 2)
    accum, accum_fn = _rand_accum(rng)
    C(mask=mask, accum=accum, replace=replace if mask is not None else False) << expr
    return oracle.merge(
        cd, z, mask_keys=mask_keys, accum=accum_fn, replace=replace if mask_keys is not None else False
    )


def _step_vector(rng, v, vd, ad):
    A = oracle.matrix_from_dict(gb, ad, N, N, dtype=dtypes.INT64)
    kind = rng.choice(["ewise_add", "ewise_mult", "vxm", "apply", "select"])
    od = oracle.random_vector_dict(rng, N, density=0.5, dtype=np.int64, low=-3, high=4)
    other = oracle.vector_from_dict(gb, od, N, dtype=dtypes.INT64)
    opname = rng.choice(["plus", "min", "max", "second", "minus"])
    op, fn = _BINOPS[opname]
    if kind == "ewise_add":
        expr = v.ewise_add(other, op)
        z = oracle.ewise_add(vd, od, fn)
    elif kind == "ewise_mult":
        expr = v.ewise_mult(other, op)
        z = oracle.ewise_mult(vd, od, fn)
    elif kind == "vxm":
        expr = v.vxm(A, semiring.min_plus)
        a2 = {(0, i): val for i, val in vd.items()}
        z2 = oracle.mxm(a2, ad, min, oracle.simple_mul(lambda a, b: a + b))
        z = {j: val for (_, j), val in z2.items()}
    elif kind == "apply":
        c = int(rng.integers(-3, 4))
        expr = v.apply(op, right=c)
        z = {k: fn(val, c) for k, val in vd.items()}
    else:
        c = int(rng.integers(-5, 6))
        expr = v.select("valuele", c)
        z = {k: val for k, val in vd.items() if val <= c}
    mask, mask_keys, replace = _rand_mask(rng, (N,), 1)
    accum, accum_fn = _rand_accum(rng)
    v(mask=mask, accum=accum, replace=replace if mask is not None else False) << expr
    return oracle.merge(
        vd, z, mask_keys=mask_keys, accum=accum_fn, replace=replace if mask_keys is not None else False
    )


@pytest.mark.parametrize("seed", range(N_CHAINS))
def test_random_matrix_chain(seed):
    rng = np.random.default_rng(1000 + seed)
    cd = oracle.random_matrix_dict(rng, N, N, density=0.4, dtype=np.int64, low=-3, high=4)
    C = oracle.matrix_from_dict(gb, cd, N, N, dtype=dtypes.INT64)
    for step in range(N_STEPS):
        cd = _step_matrix(rng, C, cd)
        oracle.assert_equal_dicts(oracle.to_dict(C), cd), f"seed={seed} step={step}"


@pytest.mark.parametrize("seed", range(N_CHAINS))
def test_random_vector_chain(seed):
    rng = np.random.default_rng(2000 + seed)
    vd = oracle.random_vector_dict(rng, N, density=0.5, dtype=np.int64, low=-3, high=4)
    v = oracle.vector_from_dict(gb, vd, N, dtype=dtypes.INT64)
    ad = oracle.random_matrix_dict(rng, N, N, density=0.4, dtype=np.int64, low=-3, high=4)
    for step in range(N_STEPS):
        vd = _step_vector(rng, v, vd, ad)
        oracle.assert_equal_dicts(oracle.to_dict(v), vd), f"seed={seed} step={step}"


@pytest.mark.parametrize("seed", range(6))
def test_random_sparse_chain(seed):
    """Random chains over the SPARSE (analyzed-COO) container: every step's
    output must stay in sparse storage and match the oracle — exercises the
    merge-join ewise, sparse apply/select, and sparse transpose paths."""
    from graphblas_tpu import tx

    rng = np.random.default_rng(3000 + seed)
    with tx.config.set(dense_limit=0):
        cd = oracle.random_matrix_dict(rng, N, N, density=0.5, dtype=np.int64, low=-3, high=4)
        C = oracle.matrix_from_dict(gb, cd, N, N, dtype=dtypes.INT64)
        assert C._sparse is not None
        for step in range(N_STEPS):
            kind = rng.choice(["ewise_add", "ewise_mult", "ewise_union", "apply", "select", "transpose"])
            od = oracle.random_matrix_dict(rng, N, N, density=0.5, dtype=np.int64, low=-3, high=4)
            other = oracle.matrix_from_dict(gb, od, N, N, dtype=dtypes.INT64)
            opname = rng.choice(["plus", "min", "max", "first", "minus"])
            op, fn = _BINOPS[opname]
            if kind == "ewise_add":
                C = C.ewise_add(other, op).new()
                cd = oracle.ewise_add(cd, od, fn)
            elif kind == "ewise_mult":
                C = C.ewise_mult(other, op).new()
                cd = oracle.ewise_mult(cd, od, fn)
            elif kind == "ewise_union":
                C = C.ewise_union(other, op, -7, 9).new()
                cd = {
                    k: fn(cd.get(k, -7), od.get(k, 9))
                    for k in set(cd) | set(od)
                }
            elif kind == "apply":
                c = int(rng.integers(-3, 4))
                C = C.apply(op, right=c).new()
                cd = {k: fn(v, c) for k, v in cd.items()}
            elif kind == "select":
                c = int(rng.integers(-5, 6))
                C = C.select("valuegt", c).new()
                cd = {k: v for k, v in cd.items() if v > c}
            else:
                C = C.T.new()
                cd = {(j, i): v for (i, j), v in cd.items()}
            assert C._sparse is not None, f"seed={seed} step={step} {kind} left sparse storage"
            oracle.assert_equal_dicts(oracle.to_dict(C), cd)


@pytest.mark.parametrize("seed", range(8))
def test_random_assign_extract_chain(seed):
    """Random region assign/extract/delete chains vs a dict oracle —
    targets the reference's most intricate semantic surface
    (_prep_for_assign, core/matrix.py:3116-3529)."""
    rng = np.random.default_rng(4000 + seed)
    M = 6
    cd = oracle.random_matrix_dict(rng, M, M, density=0.5, dtype=np.int64, low=-9, high=10)
    C = oracle.matrix_from_dict(gb, cd, M, M, dtype=dtypes.INT64)

    def rand_region():
        kind = rng.choice(["slice", "list", "int"])
        if kind == "slice":
            a, b = sorted(rng.choice(M + 1, size=2, replace=False).tolist())
            step = int(rng.integers(1, 3))
            return slice(a, b, step), list(range(a, b, step))
        if kind == "list":
            k = int(rng.integers(1, M))
            idx = sorted(rng.choice(M, size=k, replace=False).tolist())
            return idx, idx
        i = int(rng.integers(0, M))
        return i, [i]

    for step in range(10):
        op = rng.choice(["assign_scalar", "assign_vector", "extract", "delete_elem", "setelem"])
        if op == "assign_scalar":
            r_sel, r_keys = rand_region()
            c_sel, c_keys = rand_region()
            val = int(rng.integers(-5, 6))
            C[r_sel, c_sel] = val
            for i in r_keys:
                for j in c_keys:
                    cd[(i, j)] = val
        elif op == "assign_vector":
            i = int(rng.integers(0, M))
            vd = oracle.random_vector_dict(rng, M, density=0.7, dtype=np.int64, low=-9, high=10)
            v = oracle.vector_from_dict(gb, vd, M, dtype=dtypes.INT64)
            C[i, :] = v
            for j in range(M):
                if j in vd:
                    cd[(i, j)] = vd[j]
                else:
                    cd.pop((i, j), None)
        elif op == "extract":
            r_sel, r_keys = rand_region()
            c_sel, c_keys = rand_region()
            if isinstance(r_sel, int) and isinstance(c_sel, int):
                got = C[r_sel, c_sel].new() if hasattr(C[r_sel, c_sel], "new") else C[r_sel, c_sel]
                expected = cd.get((r_sel, c_sel))
                gv = got.value if hasattr(got, "value") else got
                assert (gv is None and expected is None) or gv == expected
            elif isinstance(r_sel, int) or isinstance(c_sel, int):
                sub = C[r_sel, c_sel].new()
                if isinstance(r_sel, int):
                    expected = {
                        jj: cd[(r_sel, j)] for jj, j in enumerate(c_keys) if (r_sel, j) in cd
                    }
                else:
                    expected = {
                        ii: cd[(i, c_sel)] for ii, i in enumerate(r_keys) if (i, c_sel) in cd
                    }
                oracle.assert_equal_dicts(oracle.to_dict(sub), expected)
            else:
                sub = C[r_sel, c_sel].new()
                expected = {
                    (ii, jj): cd[(i, j)]
                    for ii, i in enumerate(r_keys)
                    for jj, j in enumerate(c_keys)
                    if (i, j) in cd
                }
                oracle.assert_equal_dicts(oracle.to_dict(sub), expected)
        elif op == "delete_elem":
            i, j = int(rng.integers(0, M)), int(rng.integers(0, M))
            del C[i, j]
            cd.pop((i, j), None)
        else:
            i, j = int(rng.integers(0, M)), int(rng.integers(0, M))
            val = int(rng.integers(-5, 6))
            C[i, j] = val
            cd[(i, j)] = val
        oracle.assert_equal_dicts(oracle.to_dict(C), cd), f"seed={seed} step={step} {op}"
