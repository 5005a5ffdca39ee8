"""Graph: a device-resident padded-COO graph container for the models.

Static-shape edge arrays (padded to a power of two) so every algorithm
compiles once per graph size class.  Convertible from/to the DSL's Matrix.
"""

import numpy as np

from ..ops import edgewise as _ew


class Graph:
    """Directed graph as padded COO device arrays.

    Attributes
    ----------
    n : number of nodes
    src, dst : int32 device arrays (padded)
    weights : float32 device array or None
    valid : bool device array marking real edges
    nedges : number of real edges
    """

    def __init__(self, n, src, dst, weights, valid, nedges):
        self.n = int(n)
        self.src = src
        self.dst = dst
        self.weights = weights
        self.valid = valid
        self.nedges = int(nedges)

    @classmethod
    def from_arrays(cls, src, dst, weights=None, *, n=None, pad_to=None):
        import jax.numpy as jnp

        src = np.asarray(src, np.int32)
        dst = np.asarray(dst, np.int32)
        if n is None:
            n = int(max(src.max(initial=-1), dst.max(initial=-1))) + 1
        e = len(src)
        psrc, pdst, pw, valid = _ew.pad_edges(src, dst, weights, pad_to=pad_to)
        return cls(
            n,
            jnp.asarray(psrc),
            jnp.asarray(pdst),
            jnp.asarray(pw, jnp.float32) if pw is not None else None,
            jnp.asarray(valid),
            e,
        )

    @classmethod
    def from_matrix(cls, A):
        """From a graphblas_tpu Matrix (adjacency; A[i, j] = weight of i->j)."""
        rows, cols, vals = A.to_coo()
        return cls.from_arrays(rows.astype(np.int32), cols.astype(np.int32), vals, n=A.nrows)

    def to_matrix(self, dtype=None):
        from ..core.matrix import Matrix

        src = np.asarray(self.src)[np.asarray(self.valid)]
        dst = np.asarray(self.dst)[np.asarray(self.valid)]
        if self.weights is not None:
            w = np.asarray(self.weights)[np.asarray(self.valid)]
        else:
            w = np.ones(len(src))
        import graphblas_tpu.binary as binary

        # parallel (duplicate) edges collapse additively, multigraph-style
        return Matrix.from_coo(src, dst, w, dtype, nrows=self.n, ncols=self.n, dup_op=binary.plus)

    @property
    def has_weights(self):
        return self.weights is not None

    def reverse(self):
        """Graph with all edges flipped."""
        return Graph(self.n, self.dst, self.src, self.weights, self.valid, self.nedges)

    def __repr__(self):
        return f"Graph(n={self.n}, nedges={self.nedges}, padded={len(np.asarray(self.src))})"


def rmat(scale, edge_factor=16, *, a=0.57, b=0.19, c=0.19, seed=0, weighted=False):
    """Synthetic RMAT/Graph500-style power-law graph (GAP-style benchmark input)."""
    rng = np.random.default_rng(seed)
    n = 1 << scale
    e = n * edge_factor
    src = np.zeros(e, np.int64)
    dst = np.zeros(e, np.int64)
    for bit in range(scale):
        r = rng.random(e)
        src_bit = (r > a + b).astype(np.int64)
        r2 = rng.random(e)
        thresh = np.where(src_bit == 0, a / (a + b), c / (1 - a - b))
        dst_bit = (r2 > thresh).astype(np.int64)
        src |= src_bit << bit
        dst |= dst_bit << bit
    # permute ids to break locality artifacts
    perm = rng.permutation(n)
    src, dst = perm[src], perm[dst]
    w = rng.random(e).astype(np.float32) * 9 + 1 if weighted else None
    return Graph.from_arrays(src.astype(np.int32), dst.astype(np.int32), w, n=n)
