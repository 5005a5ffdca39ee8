"""Connected components (FastSV) and Louvain community detection.

Parity examples for the reference's "Connected Components -- FastSV" and
"Louvain" notebooks: the DSL builds the graph; the compiled models run the
whole iteration loop as one XLA program.
"""

import numpy as np

from graphblas_tpu import Matrix, binary, dtypes
from graphblas_tpu.models import connected_components, louvain, triangle_count

# two cliques bridged to themselves only -> two components
edges = []
for comp in ([0, 1, 2, 3], [4, 5, 6]):
    for i in comp:
        for j in comp:
            if i != j:
                edges.append((i, j))
rows, cols = zip(*edges)
A = Matrix.from_coo(rows, cols, 1.0, dtypes.FP64, nrows=7, ncols=7, dup_op=binary.first)

labels = np.asarray(connected_components(A))
assert labels[0] == labels[1] == labels[2] == labels[3]
assert labels[4] == labels[5] == labels[6]
assert labels[0] != labels[4]
print("components:", labels.tolist())

comm = np.asarray(louvain(A))
assert len({comm[0], comm[4]}) == 2  # the two cliques separate
print("louvain communities:", comm.tolist())

tc = int(triangle_count(A))
# K4 has 4 triangles, K3 has 1
assert tc == 5, tc
print("triangles:", tc)
print("components+louvain OK")
