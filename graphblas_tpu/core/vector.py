"""Vector: 1-D sparse collection.

Reference: /root/reference/graphblas/core/vector.py (Vector :141, from_coo
:682, vxm :1309, apply :1380, select :1536, reduce :1635, inner :1684, outer
:1746, reposition :1789).
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
from .utils import device_asarray, ensure_int, values_to_numpy_buffer


def _vec_sparse_limit():
    from .sparse import _dense_limit

    return _dense_limit()


def _apply_dup(rows_or_idx, values, dup_op):
    """Host-side duplicate combination for build/from_coo."""
    if dup_op is None:
        raise ValueError("Duplicate indices found; must provide dup_op to combine them")
    if isinstance(dup_op, str):
        # strings work anywhere an op does (reference: op-from-string DSL,
        # core/operator/utils.py:371-493)
        from .operator.utils import binary_from_string

        dup_op = binary_from_string(dup_op)
    name = dup_op.name if hasattr(dup_op, "name") else None
    np_fn = {
        "plus": np.add,
        "times": np.multiply,
        "min": np.minimum,
        "max": np.maximum,
        "any": None,
        "first": None,
        "second": None,
        "lor": np.logical_or,
        "land": np.logical_and,
    }.get(name)
    order = np.argsort(rows_or_idx, kind="stable")
    sorted_idx = rows_or_idx[order]
    sorted_vals = values[order]
    unique, starts = np.unique(sorted_idx, return_index=True)
    if np_fn is not None:
        combined = np_fn.reduceat(sorted_vals, starts) if hasattr(np_fn, "reduceat") else None
        if combined is None:
            combined = np.array([np_fn.reduce(sorted_vals[s:e]) for s, e in zip(starts, list(starts[1:]) + [len(sorted_vals)])])
    elif name in {"first", "any"}:
        combined = sorted_vals[starts]
    elif name == "second":
        ends = np.append(starts[1:], len(sorted_vals)) - 1
        combined = sorted_vals[ends]
    else:
        fn = dup_op.fn if hasattr(dup_op, "fn") else dup_op
        ends = np.append(starts[1:], len(sorted_vals))
        out = []
        for s, e in zip(starts, ends):
            acc = sorted_vals[s]
            for i in range(s + 1, e):
                acc = np.asarray(fn(acc, sorted_vals[i]))
            out.append(acc)
        combined = np.array(out, dtype=values.dtype)
    return unique, combined.astype(values.dtype)


class Vector(InfixMixin, BaseType):
    """A 1-D collection of (index, value) pairs over a dtype domain.

    Two storage formats, like Matrix: dense-masked (values + struct device
    arrays, the default below ``tx.config['dense_limit']`` entries) and
    sparse (index, value) host-canonical arrays — the scalable format for
    huge dimensions (reference: hypersparse vectors to 2^60,
    /root/reference/graphblas/core/vector.py:682+).
    """

    __slots__ = ("_sparse", "_tx_config")
    ndim = 1
    _output_type = None  # set after class definition

    def _set_storage(self, fmt):
        """Convert storage format in place (per-object tx.config['storage'])."""
        if fmt in ("coo", "sparse"):
            if self._sparse is None:
                from .sparse import SparseVectorData

                idx, vals = self.to_coo()
                self._adopt_sparse(
                    SparseVectorData(idx.astype(np.int64), vals, self.size)
                )
        elif fmt in ("densemasked", "auto"):
            if self._sparse is not None:
                self._values  # noqa: B018 — densify (guarded by densify_limit)
        else:
            raise ValueError(f"unknown storage format: {fmt!r}")

    def __init__(self, dtype=_dt.FP64, size=0, *, name=None):
        import jax.numpy as jnp

        from . import _init_jax

        _init_jax()
        self._dtype = _dt.lookup_dtype(dtype)
        size = ensure_int(size, "size")
        self._sparse = None
        from . import looplayout as _ll

        _llctx = _ll.active()
        if _llctx is not None and size == _llctx.n and not self._dtype._is_udt:
            # edge-layout loop body: empty n-sized vectors created inside the
            # body live in the edge layout (core/looplayout.py)
            self._values = device_asarray(np.zeros((_llctx.e_pad,), self._dtype.np_type))
            self._struct = _dm.s_zeros((_llctx.e_pad,))
            self.name = name
            return
        if not self._dtype._is_udt and size > _vec_sparse_limit():
            from .sparse import SparseVectorData

            self._sparse = SparseVectorData(
                np.empty(0, np.int64), np.empty(0, self._dtype.np_type), size
            )
            self.name = name
            return
        if self._dtype._is_udt:
            self._values = {
                f: jnp.zeros((size,), self._dtype.np_type[f])
                for f in self._dtype.np_type.names
            }
        else:
            self._values = device_asarray(np.zeros((size,), self._dtype.np_type))
        self._struct = _dm.s_zeros((size,))
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
    def _from_sparse(cls, sv, dtype, name=None):
        """Wrap a SparseVectorData as a sparse-format Vector."""
        obj = cls.__new__(cls)
        obj._dtype = _dt.lookup_dtype(dtype)
        obj._sparse = sv
        obj.name = name
        return obj

    def __getattr__(self, name):
        # sparse-format vectors leave the dense slots unset; first dense
        # touch materializes (guarded by tx.config['densify_limit'])
        if name in ("_values", "_struct"):
            try:
                sv = BaseType.__getattribute__(self, "_sparse")
            except AttributeError:
                sv = None
            if sv is not None:
                v, st = sv.densify(self._dtype.np_type)
                self._values = v
                self._struct = st
                self._sparse = None
                return v if name == "_values" else st
        raise AttributeError(name)

    def _set_arrays(self, values, struct):
        self._sparse = None
        self._values = values
        self._struct = struct

    def _adopt_sparse(self, sv):
        """Switch this Vector to sparse storage (dropping dense arrays)."""
        for slot in ("_values", "_struct"):
            try:
                delattr(self, slot)
            except AttributeError:
                pass
        self._sparse = sv

    # -- introspection -----------------------------------------------------------

    @property
    def size(self):
        sv = self._sparse
        return sv.size if sv is not None else self._struct.shape[0]

    @property
    def nvals(self):
        sv = self._sparse
        if sv is not None:
            return sv.nvals
        return BaseType.nvals.fget(self)

    def clear(self):
        sv = self._sparse
        if sv is not None:
            self._adopt_sparse(
                type(sv)(np.empty(0, np.int64), np.empty(0, sv.vals.dtype), sv.size)
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
            i1, v1 = self.to_coo()
            i2, v2 = other.to_coo()
            return np.array_equal(i1, i2) and np.array_equal(v1, v2)
        return BaseType.isequal(self, other, check_dtype=check_dtype)

    @property
    def shape(self):
        return (self.size,)

    def __len__(self):
        return self.nvals

    def __sizeof__(self):
        sv = self._sparse
        if sv is not None:
            return object.__sizeof__(self) + sv.idx.nbytes + sv.vals.nbytes
        vb = (
            sum(a.nbytes for a in self._values.values())
            if isinstance(self._values, dict)
            else self._values.nbytes
        )
        return object.__sizeof__(self) + vb + self._struct.nbytes

    def __repr__(self):
        from .formatting import format_vector

        return format_vector(self)

    def _repr_html_(self):
        from .formatting import format_vector_html

        return format_vector_html(self)

    def _sparse_find(self, i):
        """Index into sparse storage for entry i, or -1 (host binary search)."""
        sv = self._sparse
        j = int(np.searchsorted(sv.idx, i))
        if j < len(sv.idx) and sv.idx[j] == i:
            return j
        return -1

    def __contains__(self, index):
        idx = IndexerResolver(self, index).indices[0]
        if self._sparse is not None:
            return self._sparse_find(idx.index) >= 0
        return bool(self._struct[idx.index])

    def __iter__(self):
        idx, _ = self.to_coo(values=False)
        return iter(idx.tolist())

    def __reduce__(self):
        idx, vals = self.to_coo()
        return (_vector_from_pickle, (idx, vals, self._dtype, self.size, self.name))

    # -- constructors ------------------------------------------------------------

    @classmethod
    def from_coo(cls, indices, values=1.0, dtype=None, *, size=None, dup_op=None, name=None):
        """Create from (indices, values) (reference: core/vector.py:682)."""
        import jax.numpy as jnp

        indices = np.asarray(indices, np.int64).reshape(-1)
        if _is_scalar_like(values):
            values = np.full(indices.shape, values)
        values, dtype = values_to_numpy_buffer(values, dtype)
        values = values.reshape(-1)
        if indices.size != values.size:
            raise ValueError(f"`indices` and `values` have different lengths: {indices.size} != {values.size}")
        if size is None:
            if indices.size == 0:
                raise ValueError("No size given and no indices to infer it from")
            size = int(indices.max()) + 1
        size = ensure_int(size, "size")
        if indices.size and (indices.min() < 0 or indices.max() >= size):
            neg = indices < 0
            indices = np.where(neg, indices + size, indices)
            if indices.size and (indices.min() < 0 or indices.max() >= size):
                raise _exc.IndexOutOfBound(f"index out of range for size {size}")
        if indices.size != np.unique(indices).size:
            indices, values = _apply_dup(indices, values, dup_op)
        if not dtype._is_udt and size > _vec_sparse_limit():
            from .sparse import SparseVectorData

            order = np.argsort(indices, kind="stable")
            sv = SparseVectorData(
                indices[order], values[order].astype(dtype.np_type), size
            )
            return cls._from_sparse(sv, dtype, name=name)
        dense_v = np.zeros(size, dtype.np_type)
        dense_s = np.zeros(size, bool)
        dense_v[indices] = values
        dense_s[indices] = True
        if dtype._is_udt:
            dv = {f: jnp.asarray(dense_v[f]) for f in dtype.np_type.names}
        else:
            dv = device_asarray(dense_v)
        return cls._from_arrays(dv, jnp.asarray(dense_s), dtype, name=name)

    @classmethod
    def from_pairs(cls, pairs, dtype=None, *, size=None, dup_op=None, name=None):
        """Create from iterable of (index, value) (reference: core/vector.py:740)."""
        pairs = list(pairs)
        if pairs:
            indices, values = zip(*pairs)
        else:
            indices, values = [], []
        return cls.from_coo(np.asarray(indices, np.int64), np.asarray(values), dtype, size=size, dup_op=dup_op, name=name)

    @classmethod
    def from_scalar(cls, value, size, dtype=None, *, name=None):
        """Dense iso-valued vector (reference: core/vector.py:789)."""
        import jax.numpy as jnp

        sc = _as_scalar(value, dtype)
        dtype = _dt.lookup_dtype(dtype) if dtype is not None else sc.dtype
        size = ensure_int(size, "size")
        from . import looplayout as _ll

        ctx = _ll.active()
        if ctx is not None and size == ctx.n and not dtype._is_udt:
            # edge-layout loop body: an n-sized iso vector created inside the
            # body is state-adjacent — build it directly in the edge layout
            # (present exactly at the state slots)
            return cls._from_arrays(
                jnp.full((ctx.e_pad,), sc._device_value(dtype.np_type)),
                ctx.is_last.copy(),
                dtype,
                name=name,
            )
        return cls._from_arrays(
            jnp.full((size,), sc._device_value(dtype.np_type)), _dm.s_ones((size,)), dtype, name=name
        )

    @classmethod
    def from_dense(cls, values, missing_value=None, dtype=None, *, name=None):
        """Create from a dense array; missing_value marks absent entries
        (reference: core/vector.py:849)."""
        import jax.numpy as jnp

        values, dtype = values_to_numpy_buffer(np.asarray(values), dtype)
        if values.ndim != 1:
            raise ValueError("values must be 1-dimensional for Vector.from_dense")
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
    def from_dict(cls, d, dtype=None, *, size=None, name=None):
        """Create from {index: value} (reference: core/vector.py:2051)."""
        indices = np.fromiter(d.keys(), np.int64, count=len(d))
        values = np.array(list(d.values()))
        if size is None and len(d) == 0:
            raise ValueError("No size given and no indices to infer it from")
        return cls.from_coo(indices, values, dtype, size=size, name=name)

    # -- exporters ---------------------------------------------------------------

    def to_coo(self, dtype=None, *, indices=True, values=True, sort=True):
        """(indices, values) as numpy arrays (reference: core/vector.py:618)."""
        sv = self._sparse
        if sv is not None:
            out_idx = sv.idx.astype(np.uint64) if indices else None
            out_vals = None
            if values:
                out_vals = sv.vals.copy()
                if dtype is not None:
                    out_vals = out_vals.astype(_dt.lookup_dtype(dtype).np_type)
            return out_idx, out_vals
        struct = np.asarray(self._struct)
        idx = np.nonzero(struct)[0].astype(np.uint64)
        out_idx = idx if indices else None
        out_vals = None
        if values:
            ii = idx.astype(np.int64)
            if self._dtype._is_udt:
                vals = np.empty(len(ii), self._dtype.np_type)
                for f in self._dtype.np_type.names:
                    vals[f] = np.asarray(self._values[f])[ii]
            else:
                vals = np.asarray(self._values)[ii]
                if dtype is not None:
                    vals = vals.astype(_dt.lookup_dtype(dtype).np_type)
            out_vals = vals
        return out_idx, out_vals

    def to_dense(self, fill_value=None, dtype=None, **opts):
        """Dense numpy array with absent entries filled (reference: core/vector.py:900)."""
        if fill_value is None and self.nvals < self.size:
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

    def to_dict(self):
        idx, vals = self.to_coo()
        return dict(zip(idx.tolist(), vals.tolist()))

    # -- maintenance -------------------------------------------------------------

    def build(self, indices, values, *, dup_op=None, clear=False, size=None):
        """Populate from coo; object must be empty unless clear=True
        (reference: core/vector.py:611)."""
        if not clear and self.nvals > 0:
            raise _exc.OutputNotEmpty("Vector already contains values; use clear=True")
        new = Vector.from_coo(indices, values, self._dtype, size=size or self.size, dup_op=dup_op)
        if new.size != self.size and size is None:
            raise _exc.DimensionMismatch("built vector size does not match")
        self._set_arrays(new._values, new._struct)

    def dup(self, dtype=None, *, clear=False, mask=None, name=None, **opts):
        """Duplicate (reference: core/vector.py:519)."""
        import jax.numpy as jnp

        dtype = _dt.lookup_dtype(dtype) if dtype is not None else self._dtype
        if clear:
            return Vector(dtype, self.size, name=name)
        if self._sparse is not None and mask is None:
            sv = self._sparse
            vals = sv.vals.astype(dtype.np_type)
            return Vector._from_sparse(sv.copy(vals=vals.copy()), dtype, name=name)
        if self._dtype._is_udt:
            if dtype != self._dtype:
                raise TypeError("Cannot cast a UDT Vector to another dtype in dup")
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
        return Vector._from_arrays(v, s, dtype, name=name)

    def resize(self, size):
        """Grow/shrink in place (reference: core/vector.py:461)."""
        import jax.numpy as jnp

        size = ensure_int(size, "size")
        from ..ops import densemasked as _dmx

        cur = self.size
        if size == cur:
            return
        if size < cur:
            self._set_arrays(_dmx.tmap(lambda a: a[:size], self._values), self._struct[:size])
        else:
            self._set_arrays(
                _dmx.tmap(lambda a: jnp.pad(a, (0, size - cur)), self._values),
                jnp.pad(self._struct, (0, size - cur)),
            )

    def get(self, index, default=None):
        """Element or default (reference: core/vector.py:499)."""
        idx = IndexerResolver(self, index).indices[0]
        if self._sparse is not None:
            j = self._sparse_find(idx.index)
            return self._sparse.vals[j].item() if j >= 0 else default
        if bool(self._struct[idx.index]):
            if self._dtype._is_udt:
                out = np.zeros((), self._dtype.np_type)
                for f in self._dtype.np_type.names:
                    out[f] = np.asarray(self._values[f][idx.index])
                return out[()]
            return self._values[idx.index].item()
        return default

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
        """Union elementwise (reference: core/vector.py:960)."""
        return _cops.ewise_expr(self, other, op, "add")

    def ewise_mult(self, other, op="times"):
        """Intersection elementwise (reference: core/vector.py:1045)."""
        return _cops.ewise_expr(self, other, op, "mult")

    def ewise_union(self, other, op, left_default, right_default):
        """Union with defaults (reference: core/vector.py:1130)."""
        return _cops.ewise_expr(self, other, op, "union", left_default=left_default, right_default=right_default)

    def vxm(self, other, op="plus_times"):
        """Vector-matrix multiply (reference: core/vector.py:1309)."""
        from .matrix import Matrix, TransposedMatrix

        other = self._expect_type(other, (Matrix, TransposedMatrix), within="vxm", argname="other")
        return _cops.mxm_expr(self, other, op, "vxm")

    def apply(self, op, right=None, *, left=None, thunk=None):
        """Elementwise transform (reference: core/vector.py:1380)."""
        return _cops.apply_expr(self, op, right, left=left, thunk=thunk)

    def select(self, op, thunk=None):
        """Filter entries (reference: core/vector.py:1536)."""
        return _cops.select_expr(self, op, thunk)

    def reduce(self, op="plus", *, allow_empty=True):
        """Reduce to Scalar (reference: core/vector.py:1635)."""
        return _cops.reduce_scalar_expr(self, op, allow_empty, "reduce")

    def inner(self, other, op="plus_times"):
        """Dot product (reference: core/vector.py:1684)."""
        other = self._expect_type(other, Vector, within="inner", argname="other")
        return _cops.mxm_expr(self, other, op, "inner")

    def outer(self, other, op="times"):
        """Outer product (reference: core/vector.py:1746)."""
        from .matrix import Matrix

        other = self._expect_type(other, Vector, within="outer", argname="other")
        op_t = get_typed_op(op, self.dtype, other.dtype, kind="binary")
        from .operator import find_opclass

        _, opclass = find_opclass(op_t)
        if opclass == "Semiring":
            op_t = op_t.binaryop

        def compute():
            av, as_ = self._values.astype(op_t.type_.np_type), self._struct
            bv, bs = other._values.astype(op_t.type2.np_type), other._struct
            return _dm.kronecker(av[:, None], as_[:, None], bv[None, :], bs[None, :], op_t, op_t.return_type)

        return BaseExpression(
            "outer",
            Matrix,
            compute,
            op=op_t,
            dtype=op_t.return_type,
            shape=(self.size, other.size),
            args=(self, other),
            opname=f"outer[{op_t.name}]",
        )

    def reposition(self, offset, *, size=None):
        """Shift all entries by offset (reference: core/vector.py:1789)."""
        import jax.numpy as jnp

        offset = ensure_int(offset, "offset")
        out_size = self.size if size is None else ensure_int(size, "size")

        def compute():
            v, s = self._values, self._struct
            if out_size != self.size:
                if out_size > self.size:
                    v = jnp.pad(v, (0, out_size - self.size))
                    s = jnp.pad(s, (0, out_size - self.size))
                else:
                    v, s = v[:out_size], s[:out_size]
            idx = jnp.arange(out_size)
            valid = (idx >= offset) & (idx - offset < self.size)
            src = jnp.clip(idx - offset, 0, self.size - 1)
            vv = jnp.where(valid, self._values[src], 0)
            ss = jnp.where(valid, self._struct[src], False)
            return vv, ss

        return BaseExpression(
            "reposition", Vector, compute, dtype=self.dtype, shape=(out_size,), args=(self,), opname="reposition"
        )

    # -- conversions -------------------------------------------------------------

    def _as_matrix(self):
        """Zero-copy view as an n-by-1 matrix (reference: core/vector.py 'as matrix')."""
        from ..ops import densemasked as _dmx
        from .matrix import Matrix

        return Matrix._from_arrays(
            _dmx.tmap(lambda a: a[:, None], self._values), self._struct[:, None], self._dtype, name=self.name
        )

    @property
    def tx(self):
        from ..tx.vector import VectorTx

        return VectorTx(self)

    ss = tx

    def diag(self, k=0):
        """Create a matrix with this vector on diagonal k (reference: gb.ss.diag)."""
        n = self.size + abs(int(k))
        v, s = _dm.diag_build(self._values, self._struct, int(k), n, n)
        from .matrix import Matrix

        return Matrix._from_arrays(v, s, self._dtype)


def _vector_from_pickle(idx, vals, dtype, size, name):
    return Vector.from_coo(idx, vals, dtype, size=size, name=name)


Vector._output_type = Vector
