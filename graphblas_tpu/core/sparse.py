"""Sparse ("analyzed COO") Matrix storage + its kernel paths.

The reference scales past dense storage with CSR/CSC/hypersparse formats
inside SuiteSparse (reference: /root/reference/graphblas/core/ss/matrix.py:537+,
index space to 2^60 per graphblas/__init__.py:210-213).  The TPU-native
analogue is this container: canonical row-major COO on the host (int64
indices — dimensions way past device memory are representable), device
caches per sort order, and a lazily-built permutation-network ``SpmvPlan``
per direction so the DSL's ``A.mxv(v)`` / ``v.vxm(A)`` run the O(E) fast
engine (ops/fastspmv) instead of dense-masked kernels.

Dispatch contract: a ``Matrix`` whose ``_sparse`` is set has NO dense
``_values``/``_struct``; touching them densifies if the dense size is under
``tx.config["dense_limit"]`` and raises otherwise.  The op layer
(collection_ops) routes mxv/vxm/reduce/apply/select through the functions
here before any densify can trigger.
"""

import os

import numpy as np

from .. import exceptions as _exc

_INT32_MAX = np.iinfo(np.int32).max

# numpy ufuncs for host-side dup combination (subset of dup_op names)
_NP_COMBINE = {
    "plus": np.add,
    "times": np.multiply,
    "min": np.minimum,
    "max": np.maximum,
    "lor": np.logical_or,
    "land": np.logical_and,
    "bor": np.bitwise_or,
    "band": np.bitwise_and,
}

# monoids with a direct jax.ops.segment_* lowering
_SEGMENT_OPS = {"plus", "min", "max", "times", "lor", "land", "any"}


def _dense_limit():
    """Storage-format preference: above this many cells, prefer sparse."""
    from ..tx import config as _txconfig

    return int(_txconfig.get("dense_limit", 1 << 24))


def _densify_limit():
    """Hard guard: densifying past this many cells raises OutOfMemory."""
    from ..tx import config as _txconfig

    return int(_txconfig.get("densify_limit", 1 << 26))


def _mxv_strategy():
    from ..tx import config as _txconfig

    return _txconfig.get("mxv_strategy", "auto")


class SparseMatrixData:
    """Canonical sorted-dedup'd COO + device/plan caches for one Matrix."""

    __slots__ = (
        "rows",
        "cols",
        "vals",
        "nrows",
        "ncols",
        "_dev",
        "_plans",
        "_col_order",
    )

    def __init__(self, rows, cols, vals, nrows, ncols):
        self.rows = rows  # np.int64, row-major sorted
        self.cols = cols  # np.int64
        self.vals = vals  # np array of the Matrix dtype
        self.nrows = int(nrows)
        self.ncols = int(ncols)
        self._dev = {}
        self._plans = {}
        self._col_order = None

    # ------------------------------------------------------------------
    # construction
    # ------------------------------------------------------------------

    @classmethod
    def from_arrays(cls, rows, cols, vals, nrows, ncols, dup_op=None, *, sorted_dedup=False):
        """Canonicalize (row-major sort + dup combine) host COO arrays."""
        rows = np.asarray(rows, np.int64).reshape(-1)
        cols = np.asarray(cols, np.int64).reshape(-1)
        vals = np.asarray(vals).reshape(-1)
        if not sorted_dedup and rows.size:
            order = np.lexsort((cols, rows))
            rows, cols, vals = rows[order], cols[order], vals[order]
            dup = (rows[1:] == rows[:-1]) & (cols[1:] == cols[:-1])
            if dup.any():
                rows, cols, vals = _combine_dups(rows, cols, vals, dup, dup_op)
        return cls(rows, cols, vals, nrows, ncols)

    @property
    def nvals(self):
        return int(self.rows.size)

    def copy(self, vals=None):
        return SparseMatrixData(
            self.rows, self.cols, self.vals if vals is None else vals, self.nrows, self.ncols
        )

    def transposed(self):
        """Swap row/col roles (re-canonicalized; indices shared, not copied)."""
        order = self.col_order()
        return SparseMatrixData(
            self.cols[order], self.rows[order], self.vals[order], self.ncols, self.nrows
        )

    def col_order(self):
        """Permutation to column-major order (lazily computed and cached)."""
        if self._col_order is None:
            self._col_order = np.lexsort((self.rows, self.cols))
        return self._col_order

    # ------------------------------------------------------------------
    # device caches
    # ------------------------------------------------------------------

    def _idx_dtype(self):
        return np.int32 if max(self.nrows, self.ncols) <= _INT32_MAX else np.int64

    def device(self, key):
        """Device array cache: rows/cols/vals in row ('r') or col ('c') order."""
        import jax.numpy as jnp

        if key not in self._dev:
            idt = self._idx_dtype()
            if key == "rows_r":
                self._dev[key] = jnp.asarray(self.rows.astype(idt))
            elif key == "cols_r":
                self._dev[key] = jnp.asarray(self.cols.astype(idt))
            elif key == "vals_r":
                self._dev[key] = jnp.asarray(self.vals)
            elif key == "rows_c":
                self._dev[key] = jnp.asarray(self.rows[self.col_order()].astype(idt))
            elif key == "cols_c":
                self._dev[key] = jnp.asarray(self.cols[self.col_order()].astype(idt))
            elif key == "vals_c":
                self._dev[key] = jnp.asarray(self.vals[self.col_order()])
            else:  # pragma: no cover
                raise KeyError(key)
        return self._dev[key]

    # ------------------------------------------------------------------
    # permutation-network plans
    # ------------------------------------------------------------------

    def plan(self, direction):
        """SpmvPlan for 'pull' (dst=rows, src=cols) or 'push' (dst=cols).

        Built once per direction (the pattern-analysis step — the analogue of
        SuiteSparse picking Gustavson/hash/dot per matrix); cached in memory
        and, when GRAPHBLAS_TPU_PLAN_CACHE points at a directory, on disk.
        """
        if direction not in self._plans:
            from ..ops import fastspmv as _fs

            n = max(self.nrows, self.ncols)
            src, dst = (self.cols, self.rows) if direction == "pull" else (self.rows, self.cols)
            w = None
            if self.vals is not None and not np.issubdtype(self.vals.dtype, np.bool_):
                w = self.vals.astype(np.float32)
            cache_dir = os.environ.get("GRAPHBLAS_TPU_PLAN_CACHE")
            path = None
            if cache_dir:
                import hashlib

                h = hashlib.blake2b(digest_size=16)
                h.update(np.int64([self.nrows, self.ncols, self.nvals]).tobytes())
                h.update(self.rows.tobytes())
                h.update(self.cols.tobytes())
                if w is not None:
                    h.update(w.tobytes())
                path = os.path.join(cache_dir, f"gbtpu_plan_{direction}_{h.hexdigest()}.npz")
                if os.path.exists(path):
                    self._plans[direction] = _fs.load_spmv_plan(path)
                    return self._plans[direction]
            plan = _fs.build_spmv_plan(src, dst, w, n=n)
            if path is not None:
                os.makedirs(cache_dir, exist_ok=True)
                _fs.save_spmv_plan(plan, path)
            self._plans[direction] = plan
        return self._plans[direction]

    # ------------------------------------------------------------------
    # densify (guarded)
    # ------------------------------------------------------------------

    def densify(self, np_dtype, *, limit=None):
        """(values, struct) dense jnp arrays; raises past the dense limit."""
        import jax.numpy as jnp

        limit = _densify_limit() if limit is None else limit
        cells = self.nrows * self.ncols
        if cells > limit:
            raise _exc.OutOfMemory(
                f"operation requires densifying a {self.nrows}x{self.ncols} sparse Matrix "
                f"({cells} cells > tx.config['densify_limit']={limit}); use sparse-supported "
                "ops (mxv/vxm/reduce/apply/select/transpose/extract) or raise the limit"
            )
        dv = np.zeros((self.nrows, self.ncols), self.vals.dtype)
        ds = np.zeros((self.nrows, self.ncols), bool)
        dv[self.rows, self.cols] = self.vals
        ds[self.rows, self.cols] = True
        from .utils import device_asarray

        return device_asarray(dv), jnp.asarray(ds)


def _combine_dups(rows, cols, vals, dup, dup_op):
    """Combine adjacent duplicate (row, col) runs in sorted COO arrays."""
    if dup_op is None:
        raise ValueError("Duplicate indices found; must provide dup_op to combine them")
    starts = np.flatnonzero(np.concatenate([[True], ~dup]))
    name = getattr(dup_op, "name", None) or str(dup_op)
    base = name.split("[")[0]
    np_fn = _NP_COMBINE.get(base)
    out_rows, out_cols = rows[starts], cols[starts]
    if np_fn is not None:
        out_vals = np_fn.reduceat(vals, starts)
    elif base == "first":
        out_vals = vals[starts]
    elif base in {"second", "any"}:
        lasts = np.concatenate([starts[1:], [len(rows)]]) - 1
        out_vals = vals[lasts]
    else:
        # generic typed op: combine each dup group through the op's jax fn
        from .operator import get_typed_op
        from . import dtypes as _dt

        op_t = get_typed_op(dup_op, _dt.lookup_dtype(vals.dtype), kind="binary")
        ends = np.concatenate([starts[1:], [len(rows)]])
        out_vals = vals[starts].copy()
        for gi, (s, e) in enumerate(zip(starts, ends)):
            acc = vals[s]
            for k in range(s + 1, e):
                acc = np.asarray(op_t.fn(acc, vals[k]))
            out_vals[gi] = acc
    return out_rows, out_cols, out_vals


# ---------------------------------------------------------------------------
# segmented reduction over sorted segment ids (the sparse monoid core)
# ---------------------------------------------------------------------------


def _segment_reduce(contrib, valid, seg_ids, num_segments, monoid_t):
    """Dense (y, ys) from per-edge contributions grouped by sorted seg_ids.

    Standard monoids lower to jax.ops.segment_* (one scatter); any other
    monoid runs a segmented associative_scan with the monoid's jax fn —
    exact for every registered/user monoid.
    """
    import jax
    import jax.numpy as jnp

    name = monoid_t.parent.name
    ident = monoid_t.identity
    out_dt = contrib.dtype
    if contrib.size == 0:
        iv = jnp.zeros((), out_dt) if ident is None else jnp.asarray(ident, out_dt)
        return jnp.full((num_segments,), iv), jnp.zeros((num_segments,), bool)

    ys = jax.ops.segment_max(valid.astype(jnp.int32), seg_ids, num_segments=num_segments) > 0

    if name in _SEGMENT_OPS:
        if name == "plus":
            eff = jnp.where(valid, contrib, jnp.zeros((), out_dt))
            y = jax.ops.segment_sum(eff, seg_ids, num_segments=num_segments)
        elif name == "times":
            eff = jnp.where(valid, contrib, jnp.ones((), out_dt))
            y = jax.ops.segment_prod(eff, seg_ids, num_segments=num_segments)
        elif name in {"min", "land"}:
            big = _extreme(out_dt, "max")
            eff = jnp.where(valid, contrib, big)
            y = jax.ops.segment_min(eff, seg_ids, num_segments=num_segments)
        else:  # max, lor, any
            small = _extreme(out_dt, "min")
            eff = jnp.where(valid, contrib, small)
            y = jax.ops.segment_max(eff, seg_ids, num_segments=num_segments)
        if out_dt == jnp.bool_:
            y = y.astype(bool)
    else:
        import jax.lax as lax

        iv = jnp.asarray(ident, out_dt)
        eff = jnp.where(valid, contrib, iv)
        first = jnp.concatenate(
            [jnp.ones((1,), bool), seg_ids[1:] != seg_ids[:-1]]
        )
        fn = monoid_t.fn

        def comb(a, b):
            af, av = a
            bf, bv = b
            return af | bf, jnp.where(bf, bv, fn(av, bv).astype(av.dtype))

        _, scanned = lax.associative_scan(comb, (first, eff))
        is_end = jnp.concatenate([seg_ids[1:] != seg_ids[:-1], jnp.ones((1,), bool)])
        idx = jnp.where(is_end, seg_ids, num_segments).astype(seg_ids.dtype)
        y = jnp.full((num_segments,), iv).at[idx].set(scanned, mode="drop")
    y = jnp.where(ys, y, jnp.zeros((), out_dt))
    return y, ys


def _extreme(dtype, which):
    import jax.numpy as jnp

    if dtype == jnp.bool_:
        return jnp.asarray(which == "max", bool)
    if jnp.issubdtype(dtype, jnp.floating):
        return jnp.asarray(np.inf if which == "max" else -np.inf, dtype)
    info = np.iinfo(np.dtype(dtype))
    return jnp.asarray(info.max if which == "max" else info.min, dtype)


# ---------------------------------------------------------------------------
# semiring mxv / vxm
# ---------------------------------------------------------------------------

_PLAN_ADDS = {"plus", "min", "max", "any"}
_PLAN_MULS = {"times", "plus", "first", "second", "pair", "oneb"}


def sparse_mxv(sp, pull, a_first, xv, xs, sr, out_dtype):
    """Semiring y = A (.) x over one direction of a sparse matrix.

    pull: dst=rows/src=cols (GrB_mxv on A); push: dst=cols (vxm / mxv on A.T).
    a_first: the stored matrix is the multiply's FIRST argument (mxv) or the
    second (vxm).  Returns dense (values, struct) over the dst axis.
    Reference semantics: GrB_mxv core/matrix.py:2203, GrB_vxm core/vector.py:1309.
    """
    import jax.numpy as jnp

    out_np = np.dtype(out_dtype.np_type)
    n_out = sp.nrows if pull else sp.ncols
    mul = sr.binaryop
    addm = sr.monoid
    add_name = addm.parent.name
    pos = mul.positional
    strategy = _mxv_strategy()

    plan_mul = _plan_mul_name(mul, a_first, pos)
    use_plan = _plan_allowed(sp, strategy, add_name, plan_mul, out_np, pos)
    if use_plan:
        yv, ys = _plan_mxv(sp, pull, xv, xs, add_name, plan_mul, pos, out_np)
        if yv.shape[0] != n_out:
            yv, ys = yv[:n_out], ys[:n_out]
        return yv.astype(out_np), ys

    # generic gather + segment path: exact for every semiring/dtype
    if pull:
        dst = sp.device("rows_r")
        src = sp.device("cols_r")
        avals = sp.device("vals_r")
    else:
        dst = sp.device("cols_c")
        src = sp.device("rows_c")
        avals = sp.device("vals_c")
    xg = xv[src]
    valid = xs[src]
    if pos is not None:
        which, delta = pos
        role = _positional_role(which, a_first)
        if role == "src":
            contrib = src.astype(np.int64) + delta
        elif role == "dst":
            contrib = dst.astype(np.int64) + delta
        else:
            contrib = jnp.zeros(src.shape, np.int64) + delta
        contrib = contrib.astype(out_np)
    else:
        a_c = avals.astype(np.dtype((mul.type_ if a_first else mul.type2).np_type))
        x_c = xg.astype(np.dtype((mul.type2 if a_first else mul.type_).np_type))
        contrib = (mul.fn(a_c, x_c) if a_first else mul.fn(x_c, a_c)).astype(out_np)
    monoid_t = addm if addm.type_.np_type == out_np else _retype_monoid(addm, out_dtype)
    return _segment_reduce(contrib, valid, dst, n_out, monoid_t)


def _retype_monoid(monoid_t, out_dtype):
    from .operator import get_typed_op

    return get_typed_op(monoid_t.parent, out_dtype, kind="monoid")


def _positional_role(which, a_first):
    """Where a positional multiply's index lives for a matrix-vector product.

    Reference tables (core/operator/base.py:33-87): in C=A*B terms firsti=i,
    firstj=k, secondi=k, secondj=j.  For mxv (a_first) the vector is B (k,1):
    j==0; for vxm the vector is A (1,k): i==0.
    """
    base = which
    if base in {"firstj", "secondi"}:
        return "src"
    if base == "firsti":
        return "dst" if a_first else "zero"
    # secondj
    return "zero" if a_first else "dst"


def _plan_mul_name(mul, a_first, pos):
    """Map the GraphBLAS multiply onto a fastspmv channel, or None."""
    if pos is not None:
        which, _ = pos
        return "secondi" if _positional_role(which, a_first) == "src" else None
    name = mul.parent.name
    if name not in _PLAN_MULS:
        return None
    if name in {"times", "plus"}:
        return name
    if name in {"pair", "oneb"}:
        return "pair"
    # first/second: fastspmv's "first" channel is x, "second" is the weights
    if name == "first":
        return "second" if a_first else "first"
    return "first" if a_first else "second"


def _plan_allowed(sp, strategy, add_name, plan_mul, out_np, pos):
    if strategy == "generic" or plan_mul is None or add_name not in _PLAN_ADDS:
        return False
    if pos is not None:
        # src-id channel is exact in f32 below 2^24
        if max(sp.nrows, sp.ncols) >= (1 << 24):
            return False
    elif out_np != np.float32:
        # value channel runs in f32; never silently degrade other dtypes
        return False
    if strategy == "plan":
        return True
    # auto: the plan build is host-side work worth it for big graphs on TPU
    import jax

    return jax.default_backend() == "tpu" and sp.nvals >= (1 << 17)


def _plan_mxv(sp, pull, xv, xs, add_name, plan_mul, pos, out_np):
    import jax.numpy as jnp

    from ..ops import fastspmv as _fs

    plan = sp.plan("pull" if pull else "push")
    n = plan.n
    if plan_mul == "pair":
        x_in = jnp.ones((n,), jnp.float32)
        plan_mul = "first"
    else:
        x_in = xv.astype(jnp.float32)
        if x_in.shape[0] != n:
            x_in = jnp.pad(x_in, (0, n - x_in.shape[0]))
    xs_in = xs
    if xs_in.shape[0] != n:
        xs_in = jnp.pad(xs_in, (0, n - xs_in.shape[0]))
    yv, ys = _fs.spmv_masked(plan, x_in, xs_in, add=add_name, mul=plan_mul)
    if pos is not None:
        _, delta = pos
        if delta:
            yv = yv + delta
        yv = jnp.where(ys, yv, jnp.zeros((), yv.dtype))
    return yv.astype(out_np), ys


# ---------------------------------------------------------------------------
# reductions
# ---------------------------------------------------------------------------


def sparse_reduce_axis(sp, monoid_t, axis):
    """reduce_rowwise (axis=1) / columnwise (axis=0) over sparse storage."""
    import jax.numpy as jnp

    out_np = np.dtype(monoid_t.type_.np_type)
    if axis == 1:
        seg = sp.device("rows_r")
        vals = sp.device("vals_r")
        n_out = sp.nrows
    else:
        seg = sp.device("cols_c")
        vals = sp.device("vals_c")
        n_out = sp.ncols
    contrib = vals.astype(out_np)
    valid = jnp.ones(contrib.shape, bool)
    return _segment_reduce(contrib, valid, seg, n_out, monoid_t)


def sparse_reduce_scalar(sp, monoid_t):
    """Full reduction to a scalar; returns (value, present) device scalars."""
    import jax.numpy as jnp

    out_np = np.dtype(monoid_t.type_.np_type)
    if sp.nvals == 0:
        return jnp.zeros((), out_np), jnp.asarray(False)
    vals = sp.device("vals_r").astype(out_np)
    name = monoid_t.parent.name
    if name == "plus":
        y = jnp.sum(vals)
    elif name == "times":
        y = jnp.prod(vals)
    elif name in {"min", "land"}:
        y = jnp.min(vals)
    elif name in {"max", "lor", "any"}:
        y = jnp.max(vals)
    else:
        import jax.lax as lax

        fn = monoid_t.fn

        def comb(a, b):
            return fn(a, b).astype(a.dtype)

        y = lax.associative_scan(comb, vals)[-1]
    if vals.dtype == jnp.bool_:
        y = y.astype(bool)
    return y, jnp.asarray(True)


# ---------------------------------------------------------------------------
# apply / select / positional patterns
# ---------------------------------------------------------------------------


def sparse_apply_values(sp, fn, out_np):
    """Entrywise op on present values; pattern unchanged."""
    new_vals = np.asarray(fn(sp.device("vals_r"))).astype(out_np)
    return sp.copy(vals=new_vals)


def sparse_apply_indexunary(sp, op_t, thunk_dev, out_np):
    """IndexUnary apply over present entries: f(val, i, j, thunk)."""
    import jax.numpy as jnp

    vals = sp.device("vals_r").astype(np.dtype(op_t.type_.np_type))
    rows = sp.device("rows_r").astype(jnp.int64)
    cols = sp.device("cols_r").astype(jnp.int64)
    res = op_t.fn(vals, rows, cols, thunk_dev)
    return sp.copy(vals=np.asarray(res).astype(out_np))


def sparse_select(sp, op_t, thunk_dev):
    """GrB_select on sparse storage: filter entries, keep sparse."""
    import jax.numpy as jnp

    if sp.nvals == 0:
        return sp.copy()
    vals = sp.device("vals_r")
    rows = sp.device("rows_r").astype(jnp.int64)
    cols = sp.device("cols_r").astype(jnp.int64)
    keep = np.asarray(op_t.fn(vals, rows, cols, thunk_dev)).astype(bool)
    return SparseMatrixData(
        sp.rows[keep], sp.cols[keep], sp.vals[keep], sp.nrows, sp.ncols
    )


def sparse_apply_positional(sp, which, delta, out_np):
    """Positional unary apply (rowindex/colindex) on sparse storage."""
    idx = sp.rows if which == "i" else sp.cols
    return sp.copy(vals=(idx + delta).astype(out_np))


# ---------------------------------------------------------------------------
# masked semiring SpGEMM (the BASELINE acceptance metric)
# ---------------------------------------------------------------------------

_SPGEMM_WMAX = 256  # segment width cap; hub lists split into chunk-pair tasks
_SPGEMM_EQ_BUDGET = 1 << 26  # eq-tensor elements per device batch


class SpgemmPlan:
    """Analyzed masked-SpGEMM tasks: per-width buckets of padded key/value
    tiles resident on device (the pattern-analysis step, done once per
    (A, B, M) pattern; re-executed cheaply when values change)."""

    __slots__ = ("m_rows", "m_cols", "n_entries", "buckets")

    def __init__(self, m_rows, m_cols, n_entries, buckets):
        self.m_rows = m_rows
        self.m_cols = m_cols
        self.n_entries = n_entries
        self.buckets = buckets  # [(W, task_entry, multi_task, ak, av, bk, bv)]


def sparse_spgemm_analyze(a_sp, b_sp, m_rows, m_cols):
    """Build the task plan for C(M) = A (.) B (dot method, host-side)."""
    import jax.numpy as jnp

    m_rows = np.asarray(m_rows, np.int64)
    m_cols = np.asarray(m_cols, np.int64)
    a_indptr = np.searchsorted(a_sp.rows, np.arange(a_sp.nrows + 1))
    b_order = b_sp.col_order()
    b_order_cols = b_sp.cols[b_order]
    b_indptr = np.searchsorted(b_order_cols, np.arange(b_sp.ncols + 1))
    a_keys_all = a_sp.cols
    a_vals_all = a_sp.vals
    b_keys_all = b_sp.rows[b_order]
    b_vals_all = b_sp.vals[b_order]

    da = (a_indptr[m_rows + 1] - a_indptr[m_rows]).astype(np.int64)
    db = (b_indptr[m_cols + 1] - b_indptr[m_cols]).astype(np.int64)
    w_entry = np.maximum(np.maximum(da, db), 1)
    w_entry = np.minimum(
        _SPGEMM_WMAX, np.maximum(4, 1 << np.ceil(np.log2(w_entry)).astype(np.int64))
    )
    buckets = []
    for W in np.unique(w_entry):
        W = int(W)
        in_bucket = np.flatnonzero((w_entry == W) & (da > 0) & (db > 0))
        if in_bucket.size == 0:
            continue
        dab, dbb = da[in_bucket], db[in_bucket]
        na = -(-dab // W)
        nb = -(-dbb // W)
        ntasks = na * nb
        rep = np.repeat(np.arange(len(in_bucket)), ntasks)
        task_entry = in_bucket[rep]
        offs = np.concatenate([[0], np.cumsum(ntasks)])
        local = np.arange(offs[-1]) - offs[rep]
        nb_rep = np.repeat(nb, ntasks)
        ta = local // np.maximum(nb_rep, 1)
        tb = local % np.maximum(nb_rep, 1)
        a_start = a_indptr[m_rows[task_entry]] + ta * W
        b_start = b_indptr[m_cols[task_entry]] + tb * W
        a_len = np.minimum(da[task_entry] - ta * W, W)
        b_len = np.minimum(db[task_entry] - tb * W, W)
        T = len(task_entry)
        iota = np.arange(W)
        ai = a_start[:, None] + iota[None, :]
        bi = b_start[:, None] + iota[None, :]
        am = iota[None, :] < a_len[:, None]
        bm = iota[None, :] < b_len[:, None]
        ak = np.where(am, a_keys_all[np.minimum(ai, a_sp.nvals - 1)], -1)
        bk = np.where(bm, b_keys_all[np.minimum(bi, b_sp.nvals - 1)], -2)
        av = np.where(am, a_vals_all[np.minimum(ai, a_sp.nvals - 1)], 0)
        bv = np.where(bm, b_vals_all[np.minimum(bi, b_sp.nvals - 1)], 0)
        multi = np.repeat(ntasks > 1, ntasks)
        # pad task count to the chunk size (single lax.map dispatch/bucket)
        chunk = max(64, _SPGEMM_EQ_BUDGET // (W * W))
        pad = (-T) % chunk
        if pad:
            ak = np.pad(ak, ((0, pad), (0, 0)), constant_values=-1)
            bk = np.pad(bk, ((0, pad), (0, 0)), constant_values=-2)
            av = np.pad(av, ((0, pad), (0, 0)))
            bv = np.pad(bv, ((0, pad), (0, 0)))
        idt = np.int32 if len(m_rows) < (1 << 31) else np.int64
        buckets.append(
            (
                W,
                task_entry,
                multi,
                jnp.asarray(ak.astype(np.int32 if max(a_sp.ncols, 2) < (1 << 31) else np.int64)),
                jnp.asarray(av),
                jnp.asarray(bk.astype(np.int32 if max(b_sp.nrows, 2) < (1 << 31) else np.int64)),
                jnp.asarray(bv),
                chunk,
                jnp.asarray(task_entry.astype(idt)),
            )
        )
    return SpgemmPlan(m_rows, m_cols, len(m_rows), buckets)


def sparse_spgemm_execute(plan, sr, out_dtype, *, keep_on_device=False):
    """Run the analyzed masked SpGEMM: one device dispatch per width bucket;
    task partials segment-combine by entry ON DEVICE (sorted task order).

    keep_on_device=True returns (values (n_entries,), hit, flops) as device
    arrays — no host transfer (the result of one algebra step usually feeds
    the next device op; over remote tunnels the download dwarfs compute).
    """
    import functools

    import jax
    import jax.numpy as jnp

    mul = sr.binaryop
    addm = sr.monoid
    name = addm.parent.name
    ident = addm.identity
    out_np = np.dtype(out_dtype.np_type)
    a_np = np.dtype(mul.type_.np_type)
    b_np = np.dtype(mul.type2.np_type)
    n_entries = plan.n_entries

    import functools as _ft

    bucket_meta = [(b[0], b[7]) for b in plan.buckets]  # (W, chunk) static

    @jax.jit
    def exec_all(bucket_arrays):
        acc = jnp.zeros((n_entries,), out_np)
        hit = jnp.zeros((n_entries,), bool)
        flops = jnp.zeros((), jnp.int32)
        for (W, chunk), (ak, av, bk, bv, ids) in zip(bucket_meta, bucket_arrays):
            y, ys, nm = bucket_body(ak, av, bk, bv, ids, chunk)
            acc = jnp.where(ys, y, acc)
            hit = hit | ys
            flops = flops + nm
        return acc, hit, flops

    def bucket_body(ak, av, bk, bv, entry_ids, chunk):
        def one(chunk_args):
            akk, avv, bkk, bvv = chunk_args
            eq = akk[:, :, None] == bkk[:, None, :]
            prod = mul.fn(
                avv.astype(a_np)[:, :, None], bvv.astype(b_np)[:, None, :]
            ).astype(out_np)
            nmatch = jnp.sum(eq.astype(jnp.int32), axis=(1, 2))
            if name == "plus":
                val = jnp.sum(jnp.where(eq, prod, jnp.zeros((), out_np)), axis=(1, 2))
            elif name in {"min", "land"}:
                val = jnp.min(jnp.where(eq, prod, _extreme(out_np, "max")), axis=(1, 2))
            elif name in {"max", "lor", "any"}:
                val = jnp.max(jnp.where(eq, prod, _extreme(out_np, "min")), axis=(1, 2))
            elif name == "times":
                val = jnp.prod(jnp.where(eq, prod, jnp.ones((), out_np)), axis=(1, 2))
            else:
                iv = jnp.asarray(ident, out_np)
                eff = jnp.where(eq, prod, iv).reshape(prod.shape[0], -1)
                fn = addm.fn
                val = jax.lax.associative_scan(
                    lambda x, y: fn(x, y).astype(out_np), eff, axis=1
                )[:, -1]
            return val, nmatch

        nchunks = ak.shape[0] // chunk
        resh = lambda x: x.reshape(nchunks, chunk, x.shape[1])  # noqa: E731
        vals, nmatch = jax.lax.map(one, (resh(ak), resh(av), resh(bk), resh(bv)))
        vals = vals.reshape(-1)[: entry_ids.shape[0]]
        nmatch = nmatch.reshape(-1)[: entry_ids.shape[0]]
        y, ys = _segment_reduce(vals, nmatch > 0, entry_ids, n_entries, addm)
        return y, ys, jnp.sum(nmatch)

    if plan.buckets:
        arrays = tuple((b[3], b[4], b[5], b[6], b[8]) for b in plan.buckets)
        acc, hit, flops_dev = exec_all(arrays)
    else:
        acc = jnp.zeros((n_entries,), out_np)
        hit = jnp.zeros((n_entries,), bool)
        flops_dev = jnp.zeros((), jnp.int32)
    flops_dev = 2 * flops_dev
    if keep_on_device:
        return acc, hit, flops_dev
    keep = np.asarray(hit)
    vals_host = np.asarray(acc)
    return (
        plan.m_rows[keep],
        plan.m_cols[keep],
        vals_host[keep].astype(out_np),
        int(flops_dev),
    )


def sparse_mxm_masked(a_sp, b_sp, m_rows, m_cols, sr, out_dtype):
    """C(M) = A ⊕.⊗ B over sparse operands, output restricted to M's pattern.

    TPU-native dot method (the analogue of SuiteSparse's masked dot,
    axb_method=dot — reference: core/ss/descriptor.py:76-82): for each
    masked (i, j), intersect A's row-i list with B's column-j list.  Entries
    bucket by power-of-2 list width (hub lists split into chunk-pair tasks,
    monoid-accumulated), and each width bucket runs as ONE device dispatch
    evaluating the full W×W pairwise key-equality on the VPU — no gathers in
    the compute, any semiring.  Returns (rows, cols, values, flops); flops
    counts the multiply-adds actually performed (2 × intersections found).
    """
    out_np = np.dtype(out_dtype.np_type)
    m_rows = np.asarray(m_rows, np.int64)
    m_cols = np.asarray(m_cols, np.int64)
    if len(m_rows) == 0 or a_sp.nvals == 0 or b_sp.nvals == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, out_np), 0
    plan = sparse_spgemm_analyze(a_sp, b_sp, m_rows, m_cols)
    return sparse_spgemm_execute(plan, sr, out_dtype)


def _np_monoid_fn(name, addm):
    table = {
        "plus": lambda a, b: a + b,
        "times": lambda a, b: a * b,
        "min": min,
        "max": max,
        "lor": lambda a, b: bool(a) or bool(b),
        "land": lambda a, b: bool(a) and bool(b),
        "any": lambda a, b: b,
    }
    if name in table:
        return table[name]
    fn = addm.fn
    return lambda a, b: np.asarray(fn(a, b))[()]
