"""Independent numpy/dict GraphBLAS oracle for differential testing.

Implements GraphBLAS semantics directly over {(i, j): value} dicts with a
completely different algorithm than the engine (hash maps vs dense masked
arrays), mirroring how the reference validates against brute force in
graphblas/tests/test_mask.py and friends.
"""

import math

import numpy as np


def to_dict(m):
    """Collection -> {(i, j): v} or {i: v}."""
    if m.ndim == 1:
        idx, vals = m.to_coo()
        return dict(zip(idx.tolist(), vals.tolist()))
    r, c, v = m.to_coo()
    return dict(zip(zip(r.tolist(), c.tolist()), v.tolist()))


def mxm(a, b, add, mul):
    """Semiring matmul over dicts: a: {(i,k)}, b: {(k,j)}.
    ``mul(x, y, i, k, j)`` so positional multiplies can be tested too."""
    out = {}
    b_by_row = {}
    for (k, j), bv in b.items():
        b_by_row.setdefault(k, []).append((j, bv))
    for (i, k), av in sorted(a.items()):
        for j, bv in b_by_row.get(k, []):
            prod = mul(av, bv, i, k, j)
            key = (i, j)
            if key in out:
                out[key] = add(out[key], prod)
            else:
                out[key] = prod
    return out


def simple_mul(fn):
    return lambda x, y, i, k, j: fn(x, y)


def ewise_mult(a, b, fn):
    return {k: fn(a[k], b[k]) for k in a.keys() & b.keys()}


def ewise_add(a, b, fn):
    out = {}
    for k in a.keys() | b.keys():
        if k in a and k in b:
            out[k] = fn(a[k], b[k])
        elif k in a:
            out[k] = a[k]
        else:
            out[k] = b[k]
    return out


def ewise_union(a, b, fn, left_default, right_default):
    out = {}
    for k in a.keys() | b.keys():
        out[k] = fn(a.get(k, left_default), b.get(k, right_default))
    return out


def reduce_rowwise(a, add):
    out = {}
    for (i, j), v in sorted(a.items()):
        out[i] = add(out[i], v) if i in out else v
    return out


def reduce_all(a, add):
    it = iter(sorted(a.items()))
    try:
        _, acc = next(it)
    except StopIteration:
        return None
    for _, v in it:
        acc = add(acc, v)
    return acc


def mask_bits(mask_dict, shape, *, structural, complement, ndim=2):
    """Resolve a mask dict to a set of selected keys."""
    keys = set()
    if ndim == 2:
        all_keys = {(i, j) for i in range(shape[0]) for j in range(shape[1])}
    else:
        all_keys = set(range(shape[0]))
    for k, v in mask_dict.items():
        if structural or bool(v):
            keys.add(k)
    if complement:
        keys = all_keys - keys
    return keys


def merge(c, z, *, mask_keys=None, accum=None, replace=False):
    """The GraphBLAS mask/accum/replace merge over dicts."""
    if accum is not None:
        merged = dict(c)
        for k, v in z.items():
            merged[k] = accum(c[k], v) if k in c else v
        z = merged
    if mask_keys is None:
        return dict(z)
    out = {}
    for k, v in z.items():
        if k in mask_keys:
            out[k] = v
    if not replace:
        for k, v in c.items():
            if k not in mask_keys:
                out[k] = v
    return out


def assert_equal_dicts(result, expected, *, rel=1e-10):
    rkeys, ekeys = set(result), set(expected)
    assert rkeys == ekeys, f"patterns differ: extra={rkeys - ekeys}, missing={ekeys - rkeys}"
    for k in expected:
        r, e = result[k], expected[k]
        if isinstance(e, float):
            assert r == e or math.isclose(r, e, rel_tol=rel) or (np.isnan(r) and np.isnan(e)), f"at {k}: {r} != {e}"
        else:
            assert r == e, f"at {k}: {r} != {e}"


def random_matrix_dict(rng, nrows, ncols, density=0.3, dtype=np.float64, low=-10, high=10):
    n = int(nrows * ncols * density)
    rows = rng.integers(0, nrows, n)
    cols = rng.integers(0, ncols, n)
    if np.issubdtype(dtype, np.integer):
        vals = rng.integers(low, high, n).astype(dtype)
    elif dtype == np.bool_:
        vals = rng.integers(0, 2, n).astype(bool)
    else:
        vals = (rng.random(n) * (high - low) + low).astype(dtype)
    return {(int(i), int(j)): v.item() if hasattr(v, "item") else v for i, j, v in zip(rows, cols, vals)}


def random_vector_dict(rng, size, density=0.4, dtype=np.float64, low=-10, high=10):
    n = max(1, int(size * density))
    idx = rng.integers(0, size, n)
    if np.issubdtype(dtype, np.integer):
        vals = rng.integers(low, high, n).astype(dtype)
    elif dtype == np.bool_:
        vals = rng.integers(0, 2, n).astype(bool)
    else:
        vals = (rng.random(n) * (high - low) + low).astype(dtype)
    return {int(i): v.item() for i, v in zip(idx, vals)}


def matrix_from_dict(gb, d, nrows, ncols, dtype=None):
    if not d:
        return gb.Matrix(dtype or float, nrows, ncols)
    rows, cols = zip(*d.keys())
    return gb.Matrix.from_coo(rows, cols, list(d.values()), dtype, nrows=nrows, ncols=ncols)


def vector_from_dict(gb, d, size, dtype=None):
    if not d:
        return gb.Vector(dtype or float, size)
    return gb.Vector.from_coo(list(d.keys()), list(d.values()), dtype, size=size)
