import numpy as np, time
import graphblas_tpu
graphblas_tpu.config.set(enable_x64=False)
graphblas_tpu._init(automatic=True)
import jax, jax.numpy as jnp
from graphblas_tpu import Matrix, binary, semiring
from graphblas_tpu import tx as txmod
from graphblas_tpu.core.sparse import sparse_spgemm_analyze, _segment_reduce
from graphblas_tpu.ops.pallas_eqjoin import eqjoin
from graphblas_tpu.core.operator import get_typed_op
from graphblas_tpu.core import dtypes as dtmod

rng_l = np.random.default_rng(7)
ns = 1 << 16; csize = 32
base = np.arange(ns) - (np.arange(ns) % csize)
rs_list, cs_list = [], []
for d in range(1, csize):
    rs_list.append(np.arange(ns)); cs_list.append(base + (np.arange(ns) + d) % csize)
rs_ = np.concatenate(rs_list + [rng_l.integers(0, ns, ns * 2)])
cs_ = np.concatenate(cs_list + [rng_l.integers(0, ns, ns * 2)])
lo, hi = np.minimum(rs_, cs_), np.maximum(rs_, cs_)
keep = lo != hi
with txmod.config.set(dense_limit=0):
    L = Matrix.from_coo(hi[keep], lo[keep], np.float32(1.0), dtmod.FP32, nrows=ns, ncols=ns, dup_op=binary.first)
    U = L.T.new()
sr = get_typed_op(semiring.plus_pair, dtmod.FP32, dtmod.FP32, kind="semiring")
plan = sparse_spgemm_analyze(L._sparse, U._sparse, L._sparse.rows, L._sparse.cols)

def force(x): return float(jnp.sum(x.astype(jnp.float32)))

def timeit(fn, reps=3):
    force(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); force(fn()); ts.append(time.perf_counter()-t0)
    return sorted(ts)[reps//2]

mon = sr.monoid
n_entries = plan.n_entries
# (a) eqjoin alone per bucket
for b in plan.buckets:
    W, akT, bkT, ids = b[0], b[3], b[5], b[8]
    f = jax.jit(lambda akT=akT, bkT=bkT: eqjoin(akT, None, bkT, None, add="plus", mul="pair")[0])
    print(f"eqjoin W={W} T={akT.shape[1]}: {timeit(f)*1e3:.1f} ms", flush=True)
# (b) segment reduce alone (biggest bucket)
b = plan.buckets[3]
vals = jnp.ones((b[8].shape[0],), jnp.float32)
valid = jnp.ones((b[8].shape[0],), bool)
f = jax.jit(lambda: _segment_reduce(vals, valid, b[8], n_entries, mon)[0])
print(f"segreduce T={b[8].shape[0]}: {timeit(f)*1e3:.1f} ms", flush=True)
