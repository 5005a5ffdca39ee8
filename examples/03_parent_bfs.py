"""Parent BFS with the any_secondi positional semiring — reference Example B.3."""

import graphblas_tpu as gb
from graphblas_tpu import Matrix, Vector, dtypes, semiring

edges = [(0, 1), (0, 3), (1, 4), (1, 6), (2, 5), (3, 0), (3, 2), (4, 5), (5, 2), (6, 2)]
rows, cols = zip(*edges)
A = Matrix.from_coo(rows, cols, 1, dtypes.INT64, nrows=7, ncols=7, name="A")

parents = Vector(dtypes.INT64, 7, name="parents")
frontier = Vector(dtypes.INT64, 7, name="frontier")
parents[0] = 0
frontier[0] = 0

while frontier.nvals > 0:
    # w(~visited) << A^T any_secondi frontier: value = the parent's index
    frontier(~parents.S, replace=True) << A.T.mxv(frontier, semiring.any_secondi)
    parents(frontier.S) << frontier

print(parents)
p = parents.to_dict()
levels = {0: 0, 1: 1, 3: 1, 4: 2, 6: 2, 2: 2, 5: 3}
edge_set = set(edges)
assert p[0] == 0
for v, par in p.items():
    if v:
        assert (par, v) in edge_set
print("Parent BFS OK")
