"""Triangle counting — plus_pair masked SpGEMM on L (reference Louvain/TC recipe)."""

import graphblas_tpu as gb
from graphblas_tpu import Matrix, binary, dtypes, semiring, select

# K4 plus a tail
edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 4)]
rows, cols = zip(*edges)
und = list(zip(rows, cols)) + list(zip(cols, rows))
r2, c2 = zip(*und)
A = Matrix.from_coo(r2, c2, True, dtypes.BOOL, nrows=5, ncols=5, name="A")

# L = strictly lower triangle; tc = sum over (i,j) in L of (L @ L^T)[i, j]
L = A.select(select.tril, -1).new(name="L")
C = Matrix(dtypes.INT64, 5, 5)
# type the semiring at INT64: over BOOL, plus degrades to LOR (counts saturate)
C(L.S) << L.mxm(L.T, semiring.plus_pair[dtypes.INT64])
tc = C.reduce_scalar(binary.plus).new()
print(f"triangles: {tc.value}")
assert tc.value == 4
print("Triangle count OK")
