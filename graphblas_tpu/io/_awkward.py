"""awkward-array interop (reference: /root/reference/graphblas/io/_awkward.py:10-179).
Gated: ``awkward`` is optional and not baked into this image."""

_AWKWARD_VERSION = None


def to_awkward(A, format=None):
    try:
        import awkward as ak
    except ImportError:
        raise ImportError("awkward is required for to_awkward") from None
    from ..core.vector import Vector

    if isinstance(A, Vector):
        idx, vals = A.to_coo()
        return ak.Array({"indices": idx, "values": vals})
    indptr, cols, vals = A.to_csr()
    import numpy as np

    counts = np.diff(indptr.astype(np.int64))
    return ak.Array(
        {
            "indices": ak.unflatten(cols, counts),
            "values": ak.unflatten(vals, counts),
        }
    )


def from_awkward(A, *, name=None):
    try:
        import awkward as ak
    except ImportError:
        raise ImportError("awkward is required for from_awkward") from None
    import numpy as np

    from ..core.matrix import Matrix
    from ..core.vector import Vector

    if A.ndim == 1 or "indices" in A.fields and A["indices"].ndim == 1:
        idx = np.asarray(A["indices"])
        vals = np.asarray(A["values"])
        return Vector.from_coo(idx, vals, name=name)
    counts = ak.num(A["indices"])
    rows = np.repeat(np.arange(len(counts)), np.asarray(counts))
    cols = np.asarray(ak.flatten(A["indices"]))
    vals = np.asarray(ak.flatten(A["values"]))
    return Matrix.from_coo(rows, cols, vals, nrows=len(counts), name=name)
