"""Golden acceptance workloads: the BASELINE configs (reference notebook
recipes) with exact expected outputs, expressed in the DSL.

Reference: notebooks/Intro to GraphBLAS + SSSP example.ipynb, Example B.1
(level BFS), Example B.3 (parent BFS via any_secondi), Pagerank Demo,
Louvain/TC (plus_pair masked SpGEMM) — BASELINE.md configs 1-5.
"""

import numpy as np
import pytest

import graphblas_tpu as gb
from graphblas_tpu import Matrix, Vector, binary, dtypes, semiring, unary

# the classic 7-node directed graph from the intro notebook
EDGES = [
    (0, 1, 2.0), (0, 3, 3.0), (1, 4, 3.0), (1, 6, 6.0), (2, 5, 1.0),
    (3, 0, 3.0), (3, 2, 5.0), (4, 5, 1.0), (5, 2, 1.0), (6, 2, 2.0),
]


@pytest.fixture
def A():
    rows, cols, vals = zip(*EDGES)
    return Matrix.from_coo(rows, cols, vals, dtypes.FP64, nrows=7, ncols=7)


def test_sssp_intro_recipe(A):
    """Config 1: min_plus mxv with mask+accum until fixed point."""
    dist = Vector(dtypes.FP64, 7)
    dist[0] = 0.0
    for _ in range(7):
        prev = dist.dup()
        dist(accum=binary.min) << A.T.mxv(dist, semiring.min_plus)
        if dist.isequal(prev):
            break
    assert dist.to_dict() == {0: 0.0, 1: 2.0, 2: 7.0, 3: 3.0, 4: 5.0, 5: 6.0, 6: 8.0}


def test_level_bfs_recipe(A):
    """Config 3a: structural-mask level BFS (Example B.1)."""
    n = 7
    levels = Vector(dtypes.INT64, n)
    frontier = Vector(dtypes.BOOL, n)
    frontier[0] = True
    levels[0] = 0
    for level in range(1, n):
        # next frontier: reachable and not yet leveled
        frontier = frontier.vxm(A, semiring.lor_land).new(mask=~levels.S)
        if frontier.nvals == 0:
            break
        levels(frontier.S) << Vector.from_scalar(level, n, dtypes.INT64)
    assert levels.to_dict() == {0: 0, 1: 1, 3: 1, 2: 2, 4: 2, 6: 2, 5: 3}


def test_parent_bfs_any_secondi(A):
    """Config 3b: parent BFS via the any_secondi positional semiring
    (Example B.3)."""
    n = 7
    parents = Vector(dtypes.INT64, n)
    parents[0] = 0
    wavefront = Vector(dtypes.INT64, n)
    wavefront[0] = 0
    while wavefront.nvals:
        wavefront = wavefront.vxm(A, semiring.any_secondi).new(mask=~parents.S)
        parents(wavefront.S) << wavefront
    got = parents.to_dict()
    assert got[0] == 0 and set(got) == {0, 1, 2, 3, 4, 5, 6}
    # every parent edge must exist and parents must be one level shallower
    edge_set = {(r, c) for r, c, _ in EDGES}
    for child, parent in got.items():
        if child != 0:
            assert (parent, child) in edge_set, (parent, child)


def test_pagerank_recipe(A):
    """Config 2: plus_times mxv + plus reduce + apply, rank sums to 1."""
    n = 7
    damping = 0.85
    outdeg = A.reduce_rowwise("plus").new()
    r = Vector.from_scalar(1.0 / n, n, dtypes.FP64)
    for _ in range(50):
        contrib = r.ewise_mult(outdeg.apply(unary.minv), binary.times).new()
        pulled = A.T.mxv(contrib, semiring.plus_times).new()
        dangling = float(r.reduce("plus").new().value) - float(
            contrib.ewise_mult(outdeg, binary.times).new().reduce("plus").new().value
        )
        r = pulled.apply(binary.times, left=damping).new()
        r(accum=binary.plus) << Vector.from_scalar((1.0 - damping) / n + damping * dangling / n, n, dtypes.FP64)
    total = float(r.reduce("plus").new().value)
    assert abs(total - 1.0) < 1e-6
    # node 2 collects from 3, 5, 6 -> highest rank
    assert max(r.to_dict(), key=r.to_dict().get) == 2


def test_triangle_count_plus_pair(rng):
    """Config 5: masked plus_pair SpGEMM on L (Cohen's recipe)."""
    n = 30
    r1 = rng.integers(0, n, 200)
    c1 = rng.integers(0, n, 200)
    lo, hi = np.minimum(r1, c1), np.maximum(r1, c1)
    keep = lo != hi
    L = Matrix.from_coo(hi[keep], lo[keep], 1.0, dtypes.FP64, nrows=n, ncols=n, dup_op=binary.first)
    C = Matrix(dtypes.FP64, n, n)
    C(L.S) << L.mxm(L.T, semiring.plus_pair)
    tc = int(C.reduce_scalar("plus").new().value)
    # oracle: count triangles in the undirected graph
    dense = np.zeros((n, n), bool)
    lr, lc, _ = L.to_coo()
    dense[lr, lc] = True
    dense |= dense.T
    di = dense.astype(np.int64)
    expected = int(np.einsum("ij,jk,ki->", di, di, di)) // 6
    assert tc == expected
