"""Level BFS with structural/complemented masks — reference Example B.1."""

import graphblas_tpu as gb
from graphblas_tpu import Matrix, Vector, dtypes, semiring

edges = [(0, 1), (0, 3), (1, 4), (1, 6), (2, 5), (3, 0), (3, 2), (4, 5), (5, 2), (6, 2)]
rows, cols = zip(*edges)
A = Matrix.from_coo(rows, cols, True, dtypes.BOOL, nrows=7, ncols=7, name="A")

levels = Vector(dtypes.INT64, 7, name="levels")
frontier = Vector(dtypes.BOOL, 7, name="frontier")
frontier[0] = True
level = 0
levels[0] = 0

while frontier.nvals > 0:
    level += 1
    # next frontier: reachable ∧ unvisited — one masked any_pair mxv
    frontier(~levels.S, replace=True) << A.T.mxv(frontier, semiring.any_pair)
    levels(frontier.S) << frontier.apply(lambda x: 0 * x + level).new(dtypes.INT64)

print(levels)
assert levels.to_dict() == {0: 0, 1: 1, 2: 2, 3: 1, 4: 2, 5: 3, 6: 2}
print("Level BFS OK")
