"""Matrix: 2-D sparse collection + TransposedMatrix view.

Reference: /root/reference/graphblas/core/matrix.py (Matrix :167, from_coo
:818, from_csr/csc/dcsr/dcsc :1071-1336, mxm :2264, apply :2375, select
:2534, reduce_* :2636-2763, power :2840, setdiag :2905, TransposedMatrix
:3825-3920).
"""

import numpy as np

from .. import exceptions as _exc
from ..ops import densemasked as _dm
from . import collection_ops as _cops
from . import dtypes as _dt
from .base import BaseExpression, BaseType, Updater
from .expr import AmbiguousAssignOrExtract, IndexerResolver
from .infixmethods import InfixMixin
from .operator import get_typed_op
from .scalar import Scalar, _as_scalar, _is_scalar_like
from .utils import device_asarray, ensure_int, get_shape, values_to_numpy_buffer
from .vector import Vector, _apply_dup


def _sparse_mod_limit():
    from .sparse import _dense_limit

    return _dense_limit()


class Matrix(InfixMixin, BaseType):
    """A 2-D collection of ((row, col), value) entries over a dtype domain.

    Two storage formats: dense-masked (values + struct device arrays — the
    default below ``tx.config['dense_limit']`` cells) and sparse analyzed COO
    (``core/sparse.SparseMatrixData`` — the scalable format, analogue of the
    reference's CSR/hypersparse storage, core/ss/matrix.py:537+).  Sparse
    matrices materialize dense arrays on demand (guarded by the limit); the
    op layer dispatches mxv/vxm/reduce/apply/select sparsely first.
    """

    __slots__ = ("_sparse", "_tx_config")
    ndim = 2
    _output_type = None

    def __init__(self, dtype=_dt.FP64, nrows=0, ncols=0, *, name=None):
        import jax.numpy as jnp

        from . import _init_jax

        _init_jax()
        self._dtype = _dt.lookup_dtype(dtype)
        nrows = ensure_int(nrows, "nrows")
        ncols = ensure_int(ncols, "ncols")
        self._sparse = None
        if nrows * ncols > _sparse_mod_limit():
            from .sparse import SparseMatrixData

            self._sparse = SparseMatrixData(
                np.empty(0, np.int64),
                np.empty(0, np.int64),
                np.empty(0, self._dtype.np_type),
                nrows,
                ncols,
            )
            self.name = name
            return
        if self._dtype._is_udt:
            # UDT storage is struct-of-arrays: one leaf array per field
            self._values = {
                f: jnp.zeros((nrows, ncols), self._dtype.np_type[f])
                for f in self._dtype.np_type.names
            }
        else:
            self._values = device_asarray(np.zeros((nrows, ncols), self._dtype.np_type))
        self._struct = _dm.s_zeros((nrows, ncols))
        self.name = name

    @classmethod
    def _from_arrays(cls, values, struct, dtype, name=None):
        obj = cls.__new__(cls)
        obj._dtype = _dt.lookup_dtype(dtype)
        obj._sparse = None
        obj._values = values
        obj._struct = struct
        obj.name = name
        return obj

    @classmethod
    def _from_sparse(cls, sp, dtype, name=None):
        """Wrap a SparseMatrixData as a sparse-format Matrix."""
        obj = cls.__new__(cls)
        obj._dtype = _dt.lookup_dtype(dtype)
        obj._sparse = sp
        obj.name = name
        return obj

    def _set_storage(self, fmt):
        """Convert storage format in place (per-object tx.config['storage'])."""
        if fmt in ("coo", "sparse"):
            if self._sparse is None:
                from .sparse import SparseMatrixData

                r, c, v = self.to_coo()
                self._adopt_sparse(
                    SparseMatrixData.from_arrays(
                        r.astype(np.int64), c.astype(np.int64), v,
                        self.nrows, self.ncols, sorted_dedup=True,
                    )
                )
        elif fmt == "densemasked":
            if self._sparse is not None:
                self._values  # noqa: B018 — densify (guarded by densify_limit)
        else:
            raise ValueError(f"unknown storage format: {fmt!r}")

    def __getattr__(self, name):
        # sparse-format matrices leave the dense slots unset; first dense
        # touch materializes (guarded by tx.config['dense_limit'])
        if name in ("_values", "_struct"):
            try:
                sp = BaseType.__getattribute__(self, "_sparse")
            except AttributeError:
                sp = None
            if sp is not None:
                v, s = sp.densify(self._dtype.np_type)
                self._values = v
                self._struct = s
                self._sparse = None
                return v if name == "_values" else s
        raise AttributeError(name)

    def _set_arrays(self, values, struct):
        self._sparse = None
        self._values = values
        self._struct = struct

    def _adopt_sparse(self, sp):
        """Switch this Matrix to sparse storage (dropping dense arrays)."""
        for slot in ("_values", "_struct"):
            try:
                delattr(self, slot)
            except AttributeError:
                pass
        self._sparse = sp

    # -- introspection -----------------------------------------------------------

    @property
    def nrows(self):
        sp = self._sparse
        return sp.nrows if sp is not None else self._struct.shape[0]

    @property
    def ncols(self):
        sp = self._sparse
        return sp.ncols if sp is not None else self._struct.shape[1]

    @property
    def shape(self):
        sp = self._sparse
        return (sp.nrows, sp.ncols) if sp is not None else self._struct.shape

    @property
    def nvals(self):
        sp = self._sparse
        if sp is not None:
            return sp.nvals
        return BaseType.nvals.fget(self)

    def clear(self):
        sp = self._sparse
        if sp is not None:
            self._adopt_sparse(
                type(sp)(
                    np.empty(0, np.int64),
                    np.empty(0, np.int64),
                    np.empty(0, sp.vals.dtype),
                    sp.nrows,
                    sp.ncols,
                )
            )
            return
        BaseType.clear(self)

    def wait(self, how="materialize"):
        if self._sparse is not None:
            return self  # host-canonical storage has nothing pending
        return BaseType.wait(self, how)

    def isequal(self, other, *, check_dtype=False):
        if self._sparse is not None or getattr(other, "_sparse", None) is not None:
            other = self._expect_type(other, type(self), within="isequal", argname="other")
            if check_dtype and self.dtype != other.dtype:
                return False
            if self.shape != other.shape:
                return False
            r1, c1, v1 = self.to_coo()
            r2, c2, v2 = other.to_coo()
            return (
                np.array_equal(r1, r2)
                and np.array_equal(c1, c2)
                and np.array_equal(v1, v2)
            )
        return BaseType.isequal(self, other, check_dtype=check_dtype)

    @property
    def T(self):
        """Transpose view — no compute (reference: core/matrix.py:497)."""
        return TransposedMatrix(self)

    def __repr__(self):
        from .formatting import format_matrix

        return format_matrix(self)

    def _repr_html_(self):
        from .formatting import format_matrix_html

        return format_matrix_html(self)

    def __sizeof__(self):
        sp = self._sparse
        if sp is not None:
            return object.__sizeof__(self) + sp.rows.nbytes + sp.cols.nbytes + sp.vals.nbytes
        vb = (
            sum(a.nbytes for a in self._values.values())
            if isinstance(self._values, dict)
            else self._values.nbytes
        )
        return object.__sizeof__(self) + vb + self._struct.nbytes

    def _sparse_find(self, r, c):
        """Index into sparse storage for entry (r, c), or -1 (host binary search)."""
        sp = self._sparse
        lo = np.searchsorted(sp.rows, r, "left")
        hi = np.searchsorted(sp.rows, r, "right")
        j = lo + np.searchsorted(sp.cols[lo:hi], c, "left")
        if j < hi and sp.cols[j] == c:
            return int(j)
        return -1

    def __contains__(self, index):
        resolved = IndexerResolver(self, index)
        if not resolved.is_single_element:
            raise TypeError("`in` requires a single (row, col) index")
        r, c = resolved.indices
        if self._sparse is not None:
            return self._sparse_find(r.index, c.index) >= 0
        return bool(self._struct[r.index, c.index])

    def __iter__(self):
        rows, cols, _ = self.to_coo(values=False)
        return zip(rows.tolist(), cols.tolist())

    def __reduce__(self):
        rows, cols, vals = self.to_coo()
        return (
            _matrix_from_pickle,
            (rows, cols, vals, self._dtype, self.nrows, self.ncols, self.name),
        )

    # -- constructors ------------------------------------------------------------

    @classmethod
    def from_coo(cls, rows, columns, values=1.0, dtype=None, *, nrows=None, ncols=None, dup_op=None, name=None):
        """Create from (rows, cols, values) (reference: core/matrix.py:818)."""
        import jax.numpy as jnp

        rows = np.asarray(rows, np.int64).reshape(-1)
        columns = np.asarray(columns, np.int64).reshape(-1)
        if _is_scalar_like(values):
            values = np.full(rows.shape, values)
        values, dtype = values_to_numpy_buffer(values, dtype)
        values = values.reshape(-1)
        if not (rows.size == columns.size == values.size):
            raise ValueError(
                f"rows, columns, values lengths differ: {rows.size}, {columns.size}, {values.size}"
            )
        if nrows is None:
            if rows.size == 0:
                raise ValueError("No nrows given and no rows to infer it from")
            nrows = int(rows.max()) + 1
        if ncols is None:
            if columns.size == 0:
                raise ValueError("No ncols given and no columns to infer it from")
            ncols = int(columns.max()) + 1
        nrows = ensure_int(nrows, "nrows")
        ncols = ensure_int(ncols, "ncols")
        rows = np.where(rows < 0, rows + nrows, rows)
        columns = np.where(columns < 0, columns + ncols, columns)
        if rows.size and ((rows < 0).any() or (rows >= nrows).any()):
            raise _exc.IndexOutOfBound(f"row index out of range for nrows {nrows}")
        if columns.size and ((columns < 0).any() or (columns >= ncols).any()):
            raise _exc.IndexOutOfBound(f"column index out of range for ncols {ncols}")
        if nrows * ncols > _sparse_mod_limit():
            from .sparse import SparseMatrixData

            sp = SparseMatrixData.from_arrays(rows, columns, values, nrows, ncols, dup_op)
            return cls._from_sparse(sp, dtype, name=name)
        flat = rows * ncols + columns
        if flat.size != np.unique(flat).size:
            flat, values = _apply_dup(flat, values, dup_op)
            rows, columns = flat // ncols, flat % ncols
        dense_v = np.zeros((nrows, ncols), dtype.np_type)
        dense_s = np.zeros((nrows, ncols), bool)
        dense_v[rows, columns] = values
        dense_s[rows, columns] = True
        if dtype._is_udt:
            dv = {f: jnp.asarray(dense_v[f]) for f in dtype.np_type.names}
        else:
            dv = device_asarray(dense_v)
        return cls._from_arrays(dv, jnp.asarray(dense_s), dtype, name=name)

    @classmethod
    def from_edgelist(cls, edgelist, values=None, dtype=None, *, nrows=None, ncols=None, dup_op=None, name=None):
        """Create from [(r, c) ...] or [(r, c, v) ...] (reference: core/matrix.py:897)."""
        edges = list(edgelist)
        if edges and len(edges[0]) == 3:
            if values is not None:
                raise TypeError("edgelist contains values; cannot also pass `values`")
            rows, cols, vals = zip(*edges)
        else:
            rows, cols = zip(*edges) if edges else ((), ())
            vals = values if values is not None else 1.0
        if not _is_scalar_like(vals) and not isinstance(vals, (int, float)):
            vals = np.asarray(vals)
        return cls.from_coo(np.asarray(rows, np.int64), np.asarray(cols, np.int64), vals, dtype, nrows=nrows, ncols=ncols, dup_op=dup_op, name=name)

    @classmethod
    def from_csr(cls, indptr, col_indices, values=1.0, dtype=None, *, nrows=None, ncols=None, name=None):
        """Create from CSR arrays (reference: core/matrix.py:1071)."""
        indptr = np.asarray(indptr, np.int64)
        col_indices = np.asarray(col_indices, np.int64)
        if nrows is None:
            nrows = len(indptr) - 1
        rows = np.repeat(np.arange(nrows, dtype=np.int64), np.diff(indptr))
        if ncols is None:
            ncols = int(col_indices.max()) + 1 if col_indices.size else 0
        return cls.from_coo(rows, col_indices, values, dtype, nrows=nrows, ncols=ncols, name=name)

    @classmethod
    def from_csc(cls, indptr, row_indices, values=1.0, dtype=None, *, nrows=None, ncols=None, name=None):
        """Create from CSC arrays (reference: core/matrix.py:1136)."""
        indptr = np.asarray(indptr, np.int64)
        row_indices = np.asarray(row_indices, np.int64)
        if ncols is None:
            ncols = len(indptr) - 1
        cols = np.repeat(np.arange(ncols, dtype=np.int64), np.diff(indptr))
        if nrows is None:
            nrows = int(row_indices.max()) + 1 if row_indices.size else 0
        return cls.from_coo(row_indices, cols, values, dtype, nrows=nrows, ncols=ncols, name=name)

    @classmethod
    def from_dcsr(cls, compressed_rows, indptr, col_indices, values=1.0, dtype=None, *, nrows=None, ncols=None, name=None):
        """Create from hypersparse-CSR (reference: core/matrix.py:1201)."""
        compressed_rows = np.asarray(compressed_rows, np.int64)
        indptr = np.asarray(indptr, np.int64)
        col_indices = np.asarray(col_indices, np.int64)
        rows = np.repeat(compressed_rows, np.diff(indptr))
        if nrows is None:
            nrows = int(compressed_rows.max()) + 1 if compressed_rows.size else 0
        if ncols is None:
            ncols = int(col_indices.max()) + 1 if col_indices.size else 0
        return cls.from_coo(rows, col_indices, values, dtype, nrows=nrows, ncols=ncols, name=name)

    @classmethod
    def from_dcsc(cls, compressed_cols, indptr, row_indices, values=1.0, dtype=None, *, nrows=None, ncols=None, name=None):
        """Create from hypersparse-CSC (reference: core/matrix.py:1269)."""
        compressed_cols = np.asarray(compressed_cols, np.int64)
        indptr = np.asarray(indptr, np.int64)
        row_indices = np.asarray(row_indices, np.int64)
        cols = np.repeat(compressed_cols, np.diff(indptr))
        if ncols is None:
            ncols = int(compressed_cols.max()) + 1 if compressed_cols.size else 0
        if nrows is None:
            nrows = int(row_indices.max()) + 1 if row_indices.size else 0
        return cls.from_coo(row_indices, cols, values, dtype, nrows=nrows, ncols=ncols, name=name)

    @classmethod
    def from_scalar(cls, value, nrows, ncols, dtype=None, *, name=None):
        """Dense iso-valued matrix (reference: core/matrix.py:1337)."""
        import jax.numpy as jnp

        sc = _as_scalar(value, dtype)
        dtype = _dt.lookup_dtype(dtype) if dtype is not None else sc.dtype
        if nrows * ncols > _sparse_mod_limit() * 8:
            # a fully-iso matrix at huge dimensions needs a dedicated iso
            # storage format (reference is_iso, core/ss/matrix.py); explicit
            # storage would allocate nrows*ncols cells
            raise _exc.OutOfMemory(
                f"from_scalar would materialize {nrows * ncols} explicit entries; "
                "iso-valued storage at this scale is not supported — build the "
                "needed region sparsely (from_coo) instead"
            )
        return cls._from_arrays(
            jnp.full((nrows, ncols), sc._device_value(dtype.np_type)),
            _dm.s_ones((nrows, ncols)),
            dtype,
            name=name,
        )

    @classmethod
    def from_dense(cls, values, missing_value=None, dtype=None, *, name=None):
        """Create from a dense 2-D array (reference: core/matrix.py:1398)."""
        import jax.numpy as jnp

        values, dtype = values_to_numpy_buffer(np.asarray(values), dtype)
        if values.ndim != 2:
            raise ValueError("values must be 2-dimensional for Matrix.from_dense")
        if dtype._is_udt:
            from .utils import udt_struct_from_missing

            struct = udt_struct_from_missing(values, missing_value, dtype.np_type)
            dv = {
                f: jnp.asarray(np.where(struct, values[f], np.zeros((), values.dtype[f])))
                for f in dtype.np_type.names
            }
            return cls._from_arrays(dv, jnp.asarray(struct), dtype, name=name)
        if missing_value is None:
            struct = np.ones(values.shape, bool)
        else:
            struct = values != missing_value
        v = np.where(struct, values, np.zeros((), dtype.np_type))
        return cls._from_arrays(device_asarray(v), jnp.asarray(struct), dtype, name=name)

    @classmethod
    def from_dicts(cls, nested_dicts, dtype=None, *, order="rowwise", nrows=None, ncols=None, name=None):
        """Create from {row: {col: val}} (reference: core/matrix.py:1519)."""
        rows, cols, vals = [], [], []
        if isinstance(nested_dicts, dict):
            items = nested_dicts.items()
        else:
            items = enumerate(nested_dicts)
        for outer, inner in items:
            for inner_key, val in inner.items():
                rows.append(outer)
                cols.append(inner_key)
                vals.append(val)
        if order == "columnwise":
            rows, cols = cols, rows
        if not rows and (nrows is None or ncols is None):
            raise ValueError("nrows and ncols must be provided for empty dicts")
        return cls.from_coo(
            np.asarray(rows, np.int64), np.asarray(cols, np.int64), np.array(vals), dtype, nrows=nrows, ncols=ncols, name=name
        )

    # -- exporters ---------------------------------------------------------------

    def to_coo(self, dtype=None, *, rows=True, columns=True, values=True, sort=True):
        """(rows, cols, values) numpy arrays, row-major sorted
        (reference: core/matrix.py:525)."""
        sp = self._sparse
        if sp is not None:
            out_v = None
            if values:
                out_v = sp.vals.copy()
                if dtype is not None:
                    out_v = out_v.astype(_dt.lookup_dtype(dtype).np_type)
            return (
                sp.rows.astype(np.uint64) if rows else None,
                sp.cols.astype(np.uint64) if columns else None,
                out_v,
            )
        struct = np.asarray(self._struct)
        r, c = np.nonzero(struct)
        out_r = r.astype(np.uint64) if rows else None
        out_c = c.astype(np.uint64) if columns else None
        out_v = None
        if values:
            if self._dtype._is_udt:
                vals = np.empty(len(r), self._dtype.np_type)
                for f in self._dtype.np_type.names:
                    vals[f] = np.asarray(self._values[f])[r, c]
            else:
                vals = np.asarray(self._values)[r, c]
                if dtype is not None:
                    vals = vals.astype(_dt.lookup_dtype(dtype).np_type)
            out_v = vals
        return out_r, out_c, out_v

    def to_edgelist(self, dtype=None, *, values=True, sort=True):
        """[(r, c), ...] or ([(r, c), ...], values) (reference: core/matrix.py:600)."""
        r, c, v = self.to_coo(dtype, values=values, sort=sort)
        edges = np.column_stack([r, c])
        if values:
            return edges, v
        return edges

    def to_csr(self, dtype=None, *, sort=True):
        """(indptr, col_indices, values) (reference: core/matrix.py:1600)."""
        r, c, v = self.to_coo(dtype)
        r = r.astype(np.int64)
        indptr = np.zeros(self.nrows + 1, np.uint64)
        np.add.at(indptr, r + 1, 1)
        indptr = np.cumsum(indptr).astype(np.uint64)
        return indptr, c, v

    def to_csc(self, dtype=None, *, sort=True):
        """(indptr, row_indices, values) (reference: core/matrix.py:1660)."""
        r, c, v = self.to_coo(dtype)
        order = np.lexsort((r, c))
        r, c, v = r[order], c[order], v[order]
        indptr = np.zeros(self.ncols + 1, np.uint64)
        np.add.at(indptr, c.astype(np.int64) + 1, 1)
        indptr = np.cumsum(indptr).astype(np.uint64)
        return indptr, r, v

    def to_dcsr(self, dtype=None, *, sort=True):
        """(compressed_rows, indptr, col_indices, values) (reference: core/matrix.py:1721)."""
        r, c, v = self.to_coo(dtype)
        r = r.astype(np.int64)
        unique_rows, counts = np.unique(r, return_counts=True)
        indptr = np.concatenate([[0], np.cumsum(counts)]).astype(np.uint64)
        return unique_rows.astype(np.uint64), indptr, c, v

    def to_dcsc(self, dtype=None, *, sort=True):
        """(compressed_cols, indptr, row_indices, values) (reference: core/matrix.py:1786)."""
        r, c, v = self.to_coo(dtype)
        order = np.lexsort((r, c))
        r, c, v = r[order], c[order], v[order]
        unique_cols, counts = np.unique(c.astype(np.int64), return_counts=True)
        indptr = np.concatenate([[0], np.cumsum(counts)]).astype(np.uint64)
        return unique_cols.astype(np.uint64), indptr, r, v

    def to_dense(self, fill_value=None, dtype=None, **opts):
        """Dense numpy array (reference: core/matrix.py:1851)."""
        if fill_value is None and self.nvals < self.nrows * self.ncols:
            raise TypeError("fill_value must be given to to_dense when not all entries are present")
        if self._dtype._is_udt:
            from .utils import udt_fill_dense

            if dtype is not None and _dt.lookup_dtype(dtype) is not self._dtype:
                raise TypeError("to_dense cannot cast a UDT to another dtype")
            return udt_fill_dense(
                self._values, np.asarray(self._struct), self._dtype.np_type, fill_value
            )
        if fill_value is None:
            fill_value = 0
        dtype = _dt.lookup_dtype(dtype) if dtype is not None else self._dtype
        v = np.asarray(self._values).astype(dtype.np_type)
        s = np.asarray(self._struct)
        return np.where(s, v, np.asarray(fill_value, dtype.np_type))

    def to_dicts(self, order="rowwise"):
        """{row: {col: val}} (reference: core/matrix.py:1806)."""
        r, c, v = self.to_coo()
        if order == "columnwise":
            r, c = c, r
        out = {}
        for i, j, val in zip(r.tolist(), c.tolist(), v.tolist()):
            out.setdefault(i, {})[j] = val
        return out

    # -- maintenance -------------------------------------------------------------

    def build(self, rows, columns, values, *, dup_op=None, clear=False, nrows=None, ncols=None):
        """Populate from coo; must be empty unless clear=True (reference: core/matrix.py:627)."""
        if not clear and self.nvals > 0:
            raise _exc.OutputNotEmpty("Matrix already contains values; use clear=True")
        new = Matrix.from_coo(rows, columns, values, self._dtype, nrows=nrows or self.nrows, ncols=ncols or self.ncols, dup_op=dup_op)
        if new._sparse is not None:
            self._adopt_sparse(new._sparse)
        else:
            self._set_arrays(new._values, new._struct)

    def dup(self, dtype=None, *, clear=False, mask=None, name=None, **opts):
        """Duplicate (reference: core/matrix.py:683)."""
        import jax.numpy as jnp

        dtype = _dt.lookup_dtype(dtype) if dtype is not None else self._dtype
        if clear:
            return Matrix(dtype, self.nrows, self.ncols, name=name)
        if self._sparse is not None and mask is None:
            sp = self._sparse
            vals = sp.vals if dtype is self._dtype else sp.vals.astype(dtype.np_type)
            return Matrix._from_sparse(sp.copy(vals=vals.copy()), dtype, name=name)
        if self._dtype._is_udt:
            if dtype != self._dtype:
                raise TypeError("Cannot cast a UDT Matrix to another dtype in dup")
            v = dict(self._values)
        else:
            v = self._values.astype(dtype.np_type)
        s = self._struct
        if mask is not None:
            from .base import _check_mask

            mask = _check_mask(mask, self)
            bits = mask._bits()
            s = s & bits
            v = jnp.where(s, v, jnp.zeros((), dtype.np_type))
        return Matrix._from_arrays(v, s, dtype, name=name)

    def resize(self, nrows, ncols):
        """Grow/shrink in place (reference: core/matrix.py:512)."""
        import jax.numpy as jnp

        from ..ops import densemasked as _dmx

        nrows = ensure_int(nrows, "nrows")
        ncols = ensure_int(ncols, "ncols")
        if self._sparse is not None:
            sp = self._sparse
            keep = (sp.rows < nrows) & (sp.cols < ncols)
            self._adopt_sparse(
                type(sp)(sp.rows[keep], sp.cols[keep], sp.vals[keep], nrows, ncols)
            )
            return
        v, s = self._values, self._struct
        if nrows < self.nrows:
            v, s = _dmx.tmap(lambda a: a[:nrows], v), s[:nrows]
        elif nrows > self.nrows:
            pad_r = nrows - s.shape[0]
            v = _dmx.tmap(lambda a: jnp.pad(a, ((0, pad_r), (0, 0))), v)
            s = jnp.pad(s, ((0, pad_r), (0, 0)))
        if ncols < self.ncols:
            v, s = _dmx.tmap(lambda a: a[:, :ncols], v), s[:, :ncols]
        elif ncols > s.shape[1]:
            pad_c = ncols - s.shape[1]
            v = _dmx.tmap(lambda a: jnp.pad(a, ((0, 0), (0, pad_c))), v)
            s = jnp.pad(s, ((0, 0), (0, pad_c)))
        self._set_arrays(v, s)

    def get(self, row, col, default=None):
        """Element or default (reference: core/matrix.py:791)."""
        resolved = IndexerResolver(self, (row, col))
        r, c = resolved.indices
        if self._sparse is not None:
            j = self._sparse_find(r.index, c.index)
            return self._sparse.vals[j].item() if j >= 0 else default
        if bool(self._struct[r.index, c.index]):
            if self._dtype._is_udt:
                out = np.zeros((), self._dtype.np_type)
                for f in self._dtype.np_type.names:
                    out[f] = np.asarray(self._values[f][r.index, c.index])
                return out[()]
            return self._values[r.index, c.index].item()
        return default

    def diag(self, k=0, dtype=None, *, name=None):
        """Extract diagonal k as a Vector (reference: core/matrix.py:720)."""
        k = int(k)
        if self._sparse is not None:
            sp = self._sparse
            diag_len = min(self.nrows - max(-k, 0), self.ncols - max(k, 0))
            sel = (sp.cols - sp.rows) == k
            idx = sp.rows[sel] - max(-k, 0)
            dtype_r = _dt.lookup_dtype(dtype) if dtype is not None else self._dtype
            vals = sp.vals[sel].astype(dtype_r.np_type)
            return Vector.from_coo(idx, vals, dtype_r, size=diag_len, name=name)
        v, s = _dm.diag_extract(self._values, self._struct, int(k))
        dtype = _dt.lookup_dtype(dtype) if dtype is not None else self._dtype
        v = v.astype(_dt.executed_np(dtype.np_type))  # 64-bit contract
        return Vector._from_arrays(v, s, dtype, name=name)

    def setdiag(self, values, k=0, *, mask=None, accum=None, **opts):
        """Set diagonal k from a scalar or vector (reference: core/matrix.py:2905)."""
        import jax.numpy as jnp

        k = int(k)
        diag_len = min(self.nrows - max(-k, 0), self.ncols - max(k, 0))
        if diag_len < 0:
            raise _exc.IndexOutOfBound(f"diagonal {k} out of range")
        rows = np.arange(max(-k, 0), max(-k, 0) + diag_len, dtype=np.int64)
        cols = np.arange(max(k, 0), max(k, 0) + diag_len, dtype=np.int64)
        if _is_scalar_like(values) or isinstance(values, Scalar):
            sc = _as_scalar(values)
            vv = jnp.full((diag_len,), sc._device_value(self.dtype.np_type))
            vs = jnp.ones((diag_len,), bool)
        else:
            if hasattr(values, "_get_value"):
                values = values._get_value()
            if values.size != diag_len:
                raise _exc.DimensionMismatch(f"setdiag vector size {values.size} != diagonal length {diag_len}")
            vv = values._values.astype(self.dtype.np_type)
            vs = values._struct
        mbits = None
        if mask is not None:
            # Reference semantics (core/matrix.py:2982-3007): a Vector mask is
            # diag-length; a Matrix mask must match self, only its diagonal used.
            mp = mask.parent
            if mp.ndim == 2:
                if mp.shape != self.shape:
                    raise _exc.DimensionMismatch(
                        f"Matrix mask in setdiag is the wrong shape; expected {self.shape}, got {mp.shape}"
                    )
                mbits = mask._bits()[rows, cols]
            else:
                if mp.shape[0] != diag_len:
                    raise _exc.DimensionMismatch(
                        f"Vector mask in setdiag is the wrong length; expected {diag_len}, got {mp.shape[0]}"
                    )
                mbits = mask._bits()
        new_v, new_s = vv, vs
        if accum is not None or mbits is not None:
            old_v = self._values[rows, cols]
            old_s = self._struct[rows, cols]
            if accum is not None:
                accum_t = get_typed_op(accum, self.dtype, kind="binary")
                both = old_s & vs
                new_v = jnp.where(
                    both, accum_t.fn(old_v, vv).astype(old_v.dtype), jnp.where(vs, vv, old_v)
                )
                new_s = old_s | vs
            if mbits is not None:
                new_v = jnp.where(mbits, new_v, old_v)
                new_s = jnp.where(mbits, new_s, old_s)
        cv = self._values.at[rows, cols].set(new_v)
        cs = self._struct.at[rows, cols].set(new_s)
        self._set_arrays(*_dm.canonical(cv, cs))

    # -- indexing ----------------------------------------------------------------

    def __getitem__(self, keys):
        return AmbiguousAssignOrExtract(self, IndexerResolver(self, keys))

    def __setitem__(self, keys, value):
        Updater(self)[keys] = value

    def __delitem__(self, keys):
        resolved = IndexerResolver(self, keys)
        _cops.do_delete(self, resolved)

    def _assign(self, resolved, value, *, mask, accum, replace, is_submask):
        _cops.do_assign(self, resolved, value, mask=mask, accum=accum, replace=replace, is_submask=is_submask)

    def _delete_region(self, resolved, mask=None):
        _cops.do_delete(self, resolved, mask)

    # -- operations --------------------------------------------------------------

    def ewise_add(self, other, op="plus"):
        """Union elementwise (reference: core/matrix.py:1861)."""
        return _cops.ewise_expr(self, other, op, "add")

    def ewise_mult(self, other, op="times"):
        """Intersection elementwise (reference: core/matrix.py:1952)."""
        return _cops.ewise_expr(self, other, op, "mult")

    def ewise_union(self, other, op, left_default, right_default):
        """Union with defaults (reference: core/matrix.py:2043)."""
        return _cops.ewise_expr(self, other, op, "union", left_default=left_default, right_default=right_default)

    def mxv(self, other, op="plus_times"):
        """Matrix-vector multiply (reference: core/matrix.py:2203)."""
        other = self._expect_type(other, Vector, within="mxv", argname="other")
        return _cops.mxm_expr(self, other, op, "mxv")

    def mxm(self, other, op="plus_times"):
        """Matrix-matrix multiply (reference: core/matrix.py:2264-2331)."""
        other = self._expect_type(other, (Matrix, TransposedMatrix), within="mxm", argname="other")
        return _cops.mxm_expr(self, other, op, "mxm")

    def kronecker(self, other, op="times"):
        """Kronecker product (reference: core/matrix.py:2333)."""
        other = self._expect_type(other, (Matrix, TransposedMatrix), within="kronecker", argname="other")
        return _cops.kronecker_expr(self, other, op)

    def apply(self, op, right=None, *, left=None, thunk=None):
        """Elementwise transform (reference: core/matrix.py:2375-2533)."""
        return _cops.apply_expr(self, op, right, left=left, thunk=thunk)

    def select(self, op, thunk=None):
        """Filter entries (reference: core/matrix.py:2534)."""
        return _cops.select_expr(self, op, thunk)

    def reduce_rowwise(self, op="plus"):
        """Reduce each row to a Vector entry (reference: core/matrix.py:2636)."""
        return _cops.reduce_axis_expr(self, op, 1, "reduce_rowwise")

    def reduce_columnwise(self, op="plus"):
        """Reduce each column (reference: core/matrix.py:2674)."""
        return _cops.reduce_axis_expr(self, op, 0, "reduce_columnwise")

    def reduce_scalar(self, op="plus", *, allow_empty=True):
        """Reduce everything to a Scalar (reference: core/matrix.py:2712)."""
        return _cops.reduce_scalar_expr(self, op, allow_empty)

    def reposition(self, row_offset, column_offset, *, nrows=None, ncols=None):
        """Shift all entries (reference: core/matrix.py:2764)."""
        out_rows = self.nrows if nrows is None else ensure_int(nrows, "nrows")
        out_cols = self.ncols if ncols is None else ensure_int(ncols, "ncols")
        row_offset = ensure_int(row_offset, "row_offset")
        column_offset = ensure_int(column_offset, "column_offset")

        def compute():
            import jax.numpy as jnp

            v, s = self._values, self._struct
            if (out_rows, out_cols) != self.shape:
                pad_r = max(out_rows - self.nrows, 0)
                pad_c = max(out_cols - self.ncols, 0)
                v = jnp.pad(v, ((0, pad_r), (0, pad_c)))[:out_rows, :out_cols]
                s = jnp.pad(s, ((0, pad_r), (0, pad_c)))[:out_rows, :out_cols]
            ri = jnp.arange(out_rows)[:, None]
            ci = jnp.arange(out_cols)[None, :]
            src_r = ri - row_offset
            src_c = ci - column_offset
            valid = (src_r >= 0) & (src_r < self.nrows) & (src_c >= 0) & (src_c < self.ncols)
            src_r = jnp.clip(src_r, 0, self.nrows - 1)
            src_c = jnp.clip(src_c, 0, self.ncols - 1)
            vv = jnp.where(valid, self._values[src_r, src_c], 0)
            ss = jnp.where(valid, self._struct[src_r, src_c], False)
            return vv, ss

        return BaseExpression(
            "reposition", Matrix, compute, dtype=self.dtype, shape=(out_rows, out_cols), args=(self,), opname="reposition"
        )

    def power(self, n, op="plus_times"):
        """Matrix power by binary exponentiation (recipe; reference: core/matrix.py:2840)."""
        n = ensure_int(n, "n")
        if self.nrows != self.ncols:
            raise _exc.DimensionMismatch("power requires a square matrix")
        if n < 0:
            raise ValueError("n must be nonnegative")
        sr = get_typed_op(op, self.dtype, self.dtype, kind="semiring")

        def compute():
            if n == 0:
                import jax.numpy as jnp

                eye_v = jnp.eye(self.nrows, dtype=self._values.dtype)
                eye_s = jnp.eye(self.nrows, dtype=bool)
                return eye_v, eye_s
            result = None
            base_v, base_s = self._values.astype(sr.binaryop.type_.np_type), self._struct
            e = n
            while e > 0:
                if e & 1:
                    if result is None:
                        result = (base_v, base_s)
                    else:
                        result = _dm.mxm(result[0], result[1], base_v, base_s, sr, sr.return_type)
                e >>= 1
                if e:
                    base_v, base_s = _dm.mxm(base_v, base_s, base_v, base_s, sr, sr.return_type)
            return result

        return BaseExpression(
            "power", Matrix, compute, op=sr, dtype=sr.return_type, shape=self.shape, args=(self,), opname=f"power[{n}]"
        )

    # -- conversions -------------------------------------------------------------

    def _as_vector(self):
        """View an n-by-1 matrix as a vector (reference: core/matrix.py:227)."""
        if self.ncols != 1:
            raise _exc.DimensionMismatch("Matrix must have a single column to be cast to a Vector")
        return Vector._from_arrays(
            _dm.tmap(lambda a: a[:, 0], self._values), self._struct[:, 0], self._dtype, name=self.name
        )

    @property
    def tx(self):
        from ..tx.matrix import MatrixTx

        return MatrixTx(self)

    ss = tx


class TransposedMatrix:
    """A no-compute transpose view (reference: core/matrix.py:3825-3920)."""

    __slots__ = "_matrix", "name"
    ndim = 2
    _is_scalar = False

    def __init__(self, matrix):
        self._matrix = matrix
        self.name = f"{matrix.name or 'M'}.T"

    @property
    def _output_type(self):
        return Matrix

    @property
    def T(self):
        return self._matrix

    @property
    def _values(self):
        return self._matrix._values.T

    @property
    def _struct(self):
        return self._matrix._struct.T

    @property
    def dtype(self):
        return self._matrix.dtype

    @property
    def nrows(self):
        return self._matrix.ncols

    @property
    def ncols(self):
        return self._matrix.nrows

    @property
    def shape(self):
        return (self._matrix.ncols, self._matrix.nrows)

    @property
    def nvals(self):
        return self._matrix.nvals

    def new(self, dtype=None, *, mask=None, name=None, **opts):
        return self._as_expression().new(dtype, mask=mask, name=name, **opts)

    dup = new

    def _as_expression(self):
        m = self._matrix

        def compute():
            return _dm.transpose(m._values, m._struct)

        sparse_compute = None
        sp = getattr(m, "_sparse", None)
        if sp is not None:

            def sparse_compute():
                # zero-copy-ish: index arrays shared, reordered views
                return Matrix._from_sparse(sp.transposed(), m.dtype)

        return BaseExpression(
            "transpose", Matrix, compute, dtype=m.dtype, shape=self.shape, args=(m,), opname="transpose", sparse_compute=sparse_compute
        )

    # -- zero-copy delegations (reference keeps the view free of compute,
    #    core/matrix.py:3825-3920): exports and reductions swap roles on the
    #    parent instead of materializing a transposed copy ------------------
    def to_coo(self, dtype=None, *, rows=True, columns=True, values=True, sort=True):
        r, c, v = self._matrix.to_coo(dtype, sort=False)
        if sort:
            order = np.lexsort((r, c))
            r, c, v = r[order], c[order], v[order]
        return (
            c if rows else None,
            r if columns else None,
            v if values else None,
        )

    def to_csr(self, dtype=None, *, sort=True):
        return self._matrix.to_csc(dtype, sort=sort)

    def to_csc(self, dtype=None, *, sort=True):
        return self._matrix.to_csr(dtype, sort=sort)

    def to_dense(self, fill_value=None, dtype=None, **opts):
        return self._matrix.to_dense(fill_value, dtype, **opts).T

    def to_dicts(self, order="rowwise"):
        return self._matrix.to_dicts("columnwise" if order == "rowwise" else "rowwise")

    def to_edgelist(self, dtype=None, *, values=True, sort=True):
        r, c, v = self.to_coo(dtype, sort=sort)
        edges = np.column_stack([r, c])
        return (edges, v) if values else edges

    def get(self, row, col, default=None):
        return self._matrix.get(col, row, default)

    def __contains__(self, index):
        r, c = index
        return (c, r) in self._matrix

    def reduce_rowwise(self, op="plus"):
        return self._matrix.reduce_columnwise(op)

    def reduce_columnwise(self, op="plus"):
        return self._matrix.reduce_rowwise(op)

    def reduce_scalar(self, op="plus", *, allow_empty=True):
        return self._matrix.reduce_scalar(op, allow_empty=allow_empty)

    def diag(self, k=0, dtype=None, *, name=None):
        return self._matrix.diag(-k, dtype, name=name)

    # view delegates the remaining read-only API to a materialized copy
    def __getattr__(self, name):
        if name.startswith("_"):
            raise AttributeError(name)
        if hasattr(Matrix, name):
            return getattr(self.new(), name)
        raise AttributeError(name)

    def __getitem__(self, keys):
        return self.new()[keys]

    def __repr__(self):
        from .formatting import format_matrix

        return format_matrix(self)

    def isequal(self, other, **kwargs):
        return self.new().isequal(other, **kwargs)

    def isclose(self, other, **kwargs):
        return self.new().isclose(other, **kwargs)


def _matrix_from_pickle(rows, cols, vals, dtype, nrows, ncols, name):
    return Matrix.from_coo(rows, cols, vals, dtype, nrows=nrows, ncols=ncols, name=name)


Matrix._output_type = Matrix
