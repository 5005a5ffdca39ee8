"""PageRank — plus_times mxv + plus reduce + apply (reference Pagerank Demo)."""

import numpy as np

import graphblas_tpu as gb
from graphblas_tpu import Matrix, Vector, binary, dtypes, semiring, unary

rng = np.random.default_rng(3)
n, e = 40, 200
src = rng.integers(0, n, e)
dst = rng.integers(0, n, e)
A = Matrix.from_coo(src, dst, 1.0, dtypes.FP64, nrows=n, ncols=n, dup_op=binary.plus)

damping = 0.85
out_degree = A.reduce_rowwise(binary.plus).new(name="out_degree")
# normalize: A_hat[i, j] = A[i, j] / out_degree[i]  (broadcast via diag mxm)
import graphblas_tpu.tx as tx

inv_deg = out_degree.apply(unary.minv).new()
D = tx.diag(inv_deg)
A_hat = D.mxm(A, semiring.plus_times).new(name="A_hat")

r = Vector.from_scalar(1.0 / n, n, dtypes.FP64, name="rank")
teleport = (1 - damping) / n
for _ in range(50):
    prev = r.dup()
    r << A_hat.T.mxv(r, semiring.plus_times)
    r << r.apply(binary.times, right=damping)
    r(accum=binary.plus) << Vector.from_scalar(teleport, n, dtypes.FP64)
    delta = r.ewise_mult(prev, binary.minus).new().apply(unary.abs).new().reduce(binary.plus).new()
    if delta.value is not None and delta.value < 1e-10:
        break

total = r.reduce(binary.plus).new().value
print(f"sum of ranks: {total:.6f}")
assert abs(total - 1.0) < 0.05  # dangling nodes leak a little without the dangling fix
print("PageRank OK")
