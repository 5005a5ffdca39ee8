"""Per-Vector extension namespace ``v.tx`` (aliased as ``v.ss``).

Analogue of the reference's ``Vector.ss`` (core/ss/vector.py).
"""

import pickle

import numpy as np

from ..core import dtypes as _dt
from ..core.utils import normalize_chunks
from ..ops import densemasked as _dm


class VectorTx:
    def __init__(self, parent):
        self._parent = parent

    @property
    def format(self):
        return "densemasked"

    @property
    def config(self):
        """Per-object config (reference: VectorConfig core/ss/vector.py:50)."""
        from .matrix import _object_config

        return _object_config(self._parent, "Vector")

    @property
    def nbytes(self):
        p = self._parent
        sv = getattr(p, "_sparse", None)
        if sv is not None:
            return sv.idx.nbytes + sv.vals.nbytes
        return p._values.nbytes + p._struct.nbytes

    @property
    def is_iso(self):
        import jax.numpy as jnp

        p = self._parent
        if p.nvals == 0:
            return True
        sv = getattr(p, "_sparse", None)
        if sv is not None:
            import numpy as np

            return bool(np.all(sv.vals == sv.vals[0]))
        vals = p._values[p._struct]
        return bool(jnp.all(vals == vals[0])) if vals.size else True

    def split(self, chunks, *, name=None):
        """Split into tiles (reference: core/ss/vector.py split)."""
        from ..core.vector import Vector

        p = self._parent
        (sizes,) = normalize_chunks(chunks, p.shape)
        tiles = []
        start = 0
        for i, size in enumerate(sizes):
            tiles.append(
                Vector._from_arrays(
                    p._values[start : start + size],
                    p._struct[start : start + size],
                    p.dtype,
                    name=f"{name or p.name or 'split'}_{i}",
                )
            )
            start += size
        return tiles

    @staticmethod
    def _sv_as_row_matrix(sv, dtype):
        """View a SparseVectorData as a 1-row sparse Matrix (shared arrays)."""
        import numpy as np

        from ..core.matrix import Matrix
        from ..core.sparse import SparseMatrixData

        sp = SparseMatrixData(
            np.zeros(sv.nvals, np.int64), sv.idx, sv.vals, 1, sv.size
        )
        return Matrix._from_sparse(sp, dtype)

    @staticmethod
    def _row_matrix_back(mat, dtype, name=None):
        import numpy as np

        from ..core.sparse import SparseVectorData
        from ..core.vector import Vector

        sp = mat._sparse
        if sp is not None:
            return Vector._from_sparse(
                SparseVectorData(sp.cols.copy(), sp.vals.copy(), sp.ncols), dtype, name=name
            )
        return Vector._from_arrays(mat._values[0], mat._struct[0], dtype, name=name)


    def scan(self, op="plus", *, name=None):
        """Prefix scan (reference: core/ss/vector.py:1359)."""
        from ..core.operator import get_typed_op
        from ..core.vector import Vector

        p = self._parent
        monoid = get_typed_op(op, p.dtype, kind="monoid")
        if getattr(p, "_sparse", None) is not None:
            m = self._sv_as_row_matrix(p._sparse, p.dtype)
            out = m.tx.scan(op, "rowwise")
            return self._row_matrix_back(out, monoid.return_type, name)
        v, s = _dm.prefix_scan(p._values.astype(monoid.type_.np_type), p._struct, monoid, 0)
        return Vector._from_arrays(v, s, monoid.return_type, name=name)

    def reshape(self, nrows, ncols=None, order="rowwise", *, name=None):
        """Reshape to a Matrix (reference: core/ss/vector.py:1372)."""
        from ..core.matrix import Matrix

        p = self._parent
        if ncols is None:
            if isinstance(nrows, tuple):
                nrows, ncols = nrows
            else:
                ncols = p.size // nrows
        if nrows * ncols != p.size:
            raise ValueError(f"Cannot reshape {p.size} to ({nrows}, {ncols})")
        v, s = p._values, p._struct
        if order in {"columnwise", "col"}:
            v = v.reshape(ncols, nrows).T
            s = s.reshape(ncols, nrows).T
        else:
            v = v.reshape(nrows, ncols)
            s = s.reshape(nrows, ncols)
        return Matrix._from_arrays(v, s, p.dtype, name=name)

    def selectk(self, how, k, *, name=None):
        """Select k entries (reference: core/ss/vector.py:1403)."""
        p = self._parent
        if getattr(p, "_sparse", None) is not None:
            m = self._sv_as_row_matrix(p._sparse, p.dtype)
            out = m.tx.selectk(how, k)
            return self._row_matrix_back(out, p.dtype, name)
        m = self._parent._as_matrix()
        # operate on the 1-row transpose so rowwise kernels apply
        result = type(m)._from_arrays(m._values.T, m._struct.T, m.dtype).tx.selectk(how, k)
        from ..core.vector import Vector

        return Vector._from_arrays(result._values[0], result._struct[0], self._parent.dtype, name=name)

    def compactify(self, how="first", size=None, *, name=None):
        """Push entries to the front (reference: core/ss/vector.py:1500)."""
        p = self._parent
        if getattr(p, "_sparse", None) is not None:
            m = self._sv_as_row_matrix(p._sparse, p.dtype)
            out = m.tx.compactify(how, p.size if size is None else size)
            return self._row_matrix_back(out, p.dtype, name)
        m = self._parent._as_matrix()
        result = type(m)._from_arrays(m._values.T, m._struct.T, m.dtype).tx.compactify(how, size)
        from ..core.vector import Vector

        return Vector._from_arrays(result._values[0], result._struct[0], self._parent.dtype, name=name)

    def sort(self, op="lt", *, values=True, permutation=True, nthreads=None):
        """Sort entries (reference: core/ss/vector.py:1560)."""
        p0 = self._parent
        if getattr(p0, "_sparse", None) is not None:
            m = self._sv_as_row_matrix(p0._sparse, p0.dtype)
            out = m.tx.sort(op, values=values, permutation=permutation)
            if values and permutation:
                v_, p_ = out
                return (
                    self._row_matrix_back(v_, p0.dtype),
                    self._row_matrix_back(p_, _dt.INT64),
                )
            return self._row_matrix_back(out, p0.dtype if values else _dt.INT64)
        m = self._parent._as_matrix()
        mt = type(m)._from_arrays(m._values.T, m._struct.T, m.dtype).tx
        out = mt.sort(op, values=values, permutation=permutation)
        from ..core.vector import Vector

        def back(mat, dtype):
            return Vector._from_arrays(mat._values[0], mat._struct[0], dtype)

        if values and permutation:
            v, p = out
            return back(v, self._parent.dtype), back(p, _dt.INT64)
        if values:
            return back(out, self._parent.dtype)
        return back(out, _dt.INT64)

    def head(self, n=10, dtype=None, *, sort=False):
        idx, vals = self._parent.to_coo(dtype)
        return idx[:n], vals[:n]

    def iterkeys(self):
        idx, _ = self._parent.to_coo(values=False)
        return iter(idx.tolist())

    def itervalues(self):
        _, vals = self._parent.to_coo()
        return iter(vals.tolist())

    def iteritems(self):
        idx, vals = self._parent.to_coo()
        return iter(zip(idx.tolist(), vals.tolist()))

    def serialize(self, compression="default", level=None, **opts):
        """GBTX binary serialize (reference: core/ss/vector.py:1621)."""
        from . import _binary

        p = self._parent
        idx, vals = p.to_coo()
        iso = bool(self.is_iso) and len(vals) > 0
        arrays = {"indices": np.asarray(idx, np.int64)}
        arrays["values"] = vals[:1] if iso else vals
        body = _binary.pack(
            "Vector",
            _dt._dtype_to_string(p.dtype.np_type),
            (p.size,),
            arrays,
            meta={"format": self.format, "iso": int(iso), "nvals": p.nvals},
        )
        return _binary.compress(body, compression, level)

    def export(self, format=None, *, sort=False, give_ownership=False, raw=False):
        p = self._parent
        format = (format or "sparse").lower()
        if format == "sparse":
            idx, vals = p.to_coo()
            return {"format": "sparse", "indices": idx, "values": vals, "size": p.size}
        if format == "bitmap":
            return {
                "format": "bitmap",
                "bitmap": np.asarray(p._struct),
                "values": np.asarray(p._values),
                "size": p.size,
            }
        if format == "full":
            return {"format": "full", "values": p.to_dense(fill_value=0), "size": p.size}
        raise ValueError(f"Invalid format for export: {format}")


def deserialize_vector(data):
    """Inverse of VectorTx.serialize (GBTX binary; legacy pickle accepted)."""
    from . import _binary
    from ..core.vector import Vector

    raw = _binary.decompress(data)
    if raw[:4] == _binary.MAGIC:
        header, arrays = _binary.unpack(raw)
        dtype = _dt._string_to_dtype(header["dtype"])
        vals = arrays["values"]
        if header["meta"].get("iso"):
            vals = np.broadcast_to(vals[:1], arrays["indices"].shape)
        return Vector.from_coo(arrays["indices"], vals, dtype, size=header["dims"][0])
    payload = pickle.loads(raw)
    dtype = _dt._string_to_dtype(payload["dtype"])
    return Vector.from_coo(payload["indices"], payload["values"], dtype, size=payload["size"])
