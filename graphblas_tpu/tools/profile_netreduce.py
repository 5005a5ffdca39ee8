import numpy as np, time
import graphblas_tpu
graphblas_tpu.config.set(enable_x64=False)
graphblas_tpu._init(automatic=True)
import jax, jax.numpy as jnp
from graphblas_tpu import Matrix, binary, semiring
from graphblas_tpu import tx as txmod
from graphblas_tpu.core.sparse import sparse_spgemm_analyze
from graphblas_tpu.core import dtypes as dtmod
from graphblas_tpu.ops.permute import apply_plan
from graphblas_tpu.ops.pallas_scan import segmented_scan
from graphblas_tpu.ops.pallas_eqjoin import eqjoin

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
with txmod.config.set(dense_limit=0):
    L = Matrix.from_coo(hi[keep], lo[keep], np.float32(1.0), dtmod.FP32, nrows=ns, ncols=ns, dup_op=binary.first)
    U = L.T.new()
lsp, usp = L._sparse, U._sparse
plan = sparse_spgemm_analyze(lsp, usp, lsp.rows, lsp.cols, reduce_net=True)
net1, net2, seg_start, has_task = plan.reduce_net
tg_pad = seg_start.shape[0]
arrays = tuple((b[3], b[5], b[8]) for b in plan.buckets)

def force(v): return float(jnp.sum(v.astype(jnp.float32)))
def timeit(fn, *a):
    force(fn(*a))
    ts=[]
    for _ in range(3):
        t0=time.perf_counter(); force(fn(*a)); ts.append(time.perf_counter()-t0)
    return sorted(ts)[1]*1e3

def joins(bas):
    vs, nms = [], []
    for ak, bk, ids in bas:
        v, nm = eqjoin(ak, None, bk, None, add="plus", mul="pair")
        vs.append(v); nms.append(nm)
    sv = jnp.concatenate(vs); snm = jnp.concatenate(nms).astype(jnp.int32)
    pad = tg_pad - sv.shape[0]
    sv = jnp.concatenate([sv, jnp.zeros((pad,), jnp.float32)])
    snm = jnp.concatenate([snm, jnp.zeros((pad,), jnp.int32)])
    return sv, snm

print("a) joins only     :", round(timeit(jax.jit(lambda b: joins(b)[0]), arrays),1), flush=True)
print("b) joins+scan     :", round(timeit(jax.jit(lambda b: segmented_scan(joins(b)[0], seg_start, "add")), arrays),1), flush=True)
print("c) joins+net1     :", round(timeit(jax.jit(lambda b: apply_plan(joins(b)[0], net1)), arrays),1), flush=True)
def full(b):
    sv, snm = joins(b)
    sv = apply_plan(sv, net1); snm = apply_plan(snm, net1)
    sv = jnp.where(snm > 0, sv, 0.0)
    return apply_plan(segmented_scan(sv, seg_start, "add"), net2)
print("d) joins+full     :", round(timeit(jax.jit(full), arrays),1), flush=True)

real_arrays = tuple((b[3], b[4], b[5], b[6], b[8]) for b in plan.buckets)
ne = plan.n_entries

def full2(b):
    vs, nms = [], []
    flops = jnp.zeros((), jnp.int32)
    for (ak, av, bk, bv, ids) in b:
        v, nm = eqjoin(ak, None, bk, None, add="plus", mul="pair")
        vs.append(v); nms.append(nm)
        flops = flops + jnp.sum(nm[: ids.shape[0]])
    sv = jnp.concatenate(vs); snm = jnp.concatenate(nms).astype(jnp.int32)
    pad = tg_pad - sv.shape[0]
    sv = jnp.concatenate([sv, jnp.zeros((pad,), jnp.float32)])
    snm = jnp.concatenate([snm, jnp.zeros((pad,), jnp.int32)])
    sv = apply_plan(sv, net1); snm = apply_plan(snm, net1)
    sv = jnp.where(snm > 0, sv, 0.0)
    scanned_v = segmented_scan(sv, seg_start, "add")
    scanned_nm = segmented_scan(snm, seg_start, "add")
    out_v = apply_plan(scanned_v, net2)[:ne]
    out_nm = apply_plan(scanned_nm, net2)[:ne]
    hit = has_task & (out_nm > 0)
    return jnp.where(hit, out_v, 0.0), hit, flops

jfull2 = jax.jit(full2)
def run2(b):
    acc, hit, fl = jfull2(b)
    return float(jnp.sum(acc)) + int(fl)
run2(real_arrays)
for i in range(3):
    t0=time.perf_counter(); run2(real_arrays); print("e) exact replica  :", round((time.perf_counter()-t0)*1e3,1), flush=True)

# f) through the real executor for comparison
from graphblas_tpu.core.sparse import sparse_spgemm_execute
from graphblas_tpu.core.operator import get_typed_op
sr = get_typed_op(semiring.plus_pair, dtmod.FP32, dtmod.FP32, kind="semiring")
def runreal():
    acc, hit, fl = sparse_spgemm_execute(plan, sr, dtmod.FP32, keep_on_device=True)
    return float(jnp.sum(acc)) + int(fl)
runreal()
for i in range(3):
    t0=time.perf_counter(); runreal(); print("f) real executor  :", round((time.perf_counter()-t0)*1e3,1), flush=True)

key = list(plan._exec.keys())
print("exec cache keys:", len(key), flush=True)
ex = plan._exec[key[0]]
brick_arrays = None
for i in range(3):
    t0=time.perf_counter()
    acc, hit, fl = ex(real_arrays, brick_arrays, plan.reduce_net)
    s = float(jnp.sum(acc)) + int(fl)
    print("g) cached exec_all:", round((time.perf_counter()-t0)*1e3,1), flush=True)
t0=time.perf_counter()
_ = ex.lower(real_arrays, brick_arrays, plan.reduce_net)
print("h) lower (trace) time:", round((time.perf_counter()-t0)*1e3,1), flush=True)
