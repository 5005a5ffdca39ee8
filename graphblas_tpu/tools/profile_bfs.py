"""BFS level breakdown on the cached scale-19 plan (real TPU).

Amortizes over chained dispatches and forces with host reads (bench-style:
block_until_ready is unreliable over remote tunnels)."""
import time

import numpy as np

import graphblas_tpu

graphblas_tpu.config.set(enable_x64=False)
graphblas_tpu._init(automatic=True)
import jax
import jax.numpy as jnp

from graphblas_tpu.models import fast as mf
from graphblas_tpu.ops.fastspmv import load_spmv_plan, spmv_state, state_to_start
from graphblas_tpu.ops.pallas_scan import segmented_scan, segmented_scan_contrib
from graphblas_tpu.ops.permute import apply_plan

plan = load_spmv_plan("/tmp/gbtpu_plan_v3_s19_e16_5.npz")
n = plan.n
e_pad = plan.e_pad
print("n", n, "e_pad", e_pad, "stages", plan.perm_plan, flush=True)

def _force(x):
    return float(jnp.sum(x.astype(jnp.float32)))

tick = jax.jit(lambda v: v + 1.0)
probe = jnp.ones((8,), jnp.float32)
_force(tick(probe))
floors = []
for _ in range(5):
    t0 = time.perf_counter(); _force(tick(probe)); floors.append(time.perf_counter() - t0)
floor = sorted(floors)[2]
print("floor ms:", round(floor * 1e3, 1), flush=True)

def chain(fn, x, m=16):
    """amortized ms per application: m chained dispatches, one host read."""
    y = fn(x); _force(y)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        y = x
        for _ in range(m):
            y = fn(y)
        _force(y)
        ts.append(time.perf_counter() - t0)
    return (sorted(ts)[1] - floor) / m * 1e3

f8 = jnp.zeros((e_pad,), jnp.int8).at[::97].set(1)
f32 = jnp.zeros((e_pad,), jnp.float32).at[::97].set(1.0)
with jax.enable_x64(False):
    print("loopnet int8   :", round(chain(jax.jit(lambda v: apply_plan(v, plan.loop_plan)), f8), 3), flush=True)
    print("loopnet f32    :", round(chain(jax.jit(lambda v: apply_plan(v, plan.loop_plan)), f32), 3), flush=True)
    print("fill  int8     :", round(chain(jax.jit(lambda v: segmented_scan(v, plan.seg_start_src, "fill")), f8), 3), flush=True)
    print("fill  f32      :", round(chain(jax.jit(lambda v: segmented_scan(v, plan.seg_start_src, "fill")), f32), 3), flush=True)
    print("contrib int8   :", round(chain(jax.jit(lambda v: segmented_scan_contrib(v, None, plan.valid_dst_order, plan.seg_start_dst, "max", "first").astype(jnp.int8)), f8), 3), flush=True)

    @jax.jit
    def level(carry):
        levels, frontier, depth = carry
        x_start = state_to_start(plan, frontier, jnp.zeros((), jnp.int8))
        scanned = spmv_state(plan, x_start, "max", "first")
        nxt = plan.is_last_dst & (scanned > 0) & (levels < 0)
        return jnp.where(nxt, depth + 1, levels), nxt.astype(jnp.int8), depth + 1

    lv = jnp.full((e_pad,), -1, jnp.int32)
    y = level((lv, f8, jnp.int32(0))); _force(y[0])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        c = (lv, f8, jnp.int32(0))
        for _ in range(16):
            c = level(c)
        _force(c[0])
        ts.append(time.perf_counter() - t0)
    print("full level     :", round((sorted(ts)[1] - floor) / 16 * 1e3, 3), flush=True)

    src = 5
    def run_bfs():
        for s in [1, 2, 3, 4, 5, 6, 7]:
            mf.bfs_level(plan, s, n)
        return mf.bfs_level(plan, 8, n)
    r = run_bfs(); _force(r)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); _force(run_bfs()); ts.append(time.perf_counter() - t0)
    print("bfs amortized/8:", round((sorted(ts)[1] - floor) / 8 * 1e3, 3), flush=True)
