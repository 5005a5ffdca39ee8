import numpy as np, time
import graphblas_tpu
graphblas_tpu.config.set(enable_x64=False)
graphblas_tpu._init(automatic=True)
import jax, jax.numpy as jnp
from graphblas_tpu import Matrix, binary, semiring
from graphblas_tpu import tx as txmod
from graphblas_tpu.core.sparse import sparse_spgemm_analyze, sparse_spgemm_execute
from graphblas_tpu.core.operator import get_typed_op
from graphblas_tpu.core import dtypes as dtmod

rng_l = np.random.default_rng(7)
ns = 1 << 16; csize = 64
base = np.arange(ns) - (np.arange(ns) % csize)
rs_list, cs_list = [], []
for d in range(1, csize):
    rs_list.append(np.arange(ns)); cs_list.append(base + (np.arange(ns) + d) % csize)
rs_ = np.concatenate(rs_list + [rng_l.integers(0, ns, ns * 2)])
cs_ = np.concatenate(cs_list + [rng_l.integers(0, ns, ns * 2)])
lo, hi = np.minimum(rs_, cs_), np.maximum(rs_, cs_)
keep = lo != hi
t0=time.perf_counter()
with txmod.config.set(dense_limit=0):
    L = Matrix.from_coo(hi[keep], lo[keep], np.float32(1.0), dtmod.FP32, nrows=ns, ncols=ns, dup_op=binary.first)
    U = L.T.new()
print("build graph", round(time.perf_counter()-t0,2))
sr = get_typed_op(semiring.plus_pair, dtmod.FP32, dtmod.FP32, kind="semiring")
lsp, usp = L._sparse, U._sparse
t0=time.perf_counter()
plan = sparse_spgemm_analyze(lsp, usp, lsp.rows, lsp.cols, bricks=True, reduce_net=True)
print("analyze", round(time.perf_counter()-t0,2), "buckets", [(b[0], len(b[1])) for b in plan.buckets], "brick", None if plan.brick is None else (plan.brick.a_idx.shape, plan.brick.kmax))
for i in range(6):
    t0=time.perf_counter()
    acc, hit, fl = sparse_spgemm_execute(plan, sr, dtmod.FP32, keep_on_device=True)
    s = float(jnp.sum(acc)); f = int(fl)
    print(f"exec{i}", round(time.perf_counter()-t0,3), "flops", f, "GF/s", round(f/(time.perf_counter()-t0)/1e9,4))
