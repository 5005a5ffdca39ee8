"""SSSP via min_plus mxv with mask+accum — the intro recipe.

Parity example for the reference's "Intro to GraphBLAS + SSSP example"
notebook, written against graphblas_tpu's DSL.
"""

import graphblas_tpu as gb
from graphblas_tpu import Matrix, Vector, binary, dtypes, semiring

# the classic 7-node directed graph from the intro notebook
edges = [
    (0, 1, 2.0), (0, 3, 3.0), (1, 4, 3.0), (1, 6, 6.0), (2, 5, 1.0),
    (3, 0, 3.0), (3, 2, 5.0), (4, 5, 1.0), (5, 2, 1.0), (6, 2, 2.0),
]
rows, cols, vals = zip(*edges)
A = Matrix.from_coo(rows, cols, vals, dtypes.FP64, nrows=7, ncols=7, name="A")

# distance vector: source gets 0
dist = Vector(dtypes.FP64, 7, name="dist")
dist[0] = 0.0

# relax until fixed point: dist(min)« A^T min_plus dist
for _ in range(A.nrows):
    prev = dist.dup()
    dist(accum=binary.min) << A.T.mxv(dist, semiring.min_plus)
    if dist.isequal(prev):
        break

print(dist)
# expected (Dijkstra): {0: 0, 1: 2, 2: 7, 3: 3, 4: 5, 5: 6, 6: 8}
assert dist.to_dict() == {0: 0.0, 1: 2.0, 2: 7.0, 3: 3.0, 4: 5.0, 5: 6.0, 6: 8.0}
print("SSSP OK")
