"""Compiled DSL loops: a whole Python loop of DSL statements as ONE XLA program.

Run: PYTHONPATH=. python examples/10_compiled_dsl_loops.py
"""

import numpy as np

import graphblas_tpu as gb
from graphblas_tpu import Matrix, Vector, binary, monoid, semiring
from graphblas_tpu.core import dtypes as dtm

# a small random digraph, pull-oriented (AT[i, j] = edge j -> i)
rng = np.random.default_rng(0)
n, e = 400, 2500
src, dst = rng.integers(0, n, e), rng.integers(0, n, e)
AT = Matrix.from_coo(dst, src, np.float32(1.0), dtm.FP32, nrows=n, ncols=n, dup_op=binary.plus)

# ---- fixed-iteration loop: gb.loop -----------------------------------------
deg = np.bincount(src, minlength=n).astype(np.float32)
inv_deg = Vector.from_dense(np.where(deg > 0, 1.0 / np.maximum(deg, 1), 0.0).astype(np.float32))
r0 = Vector.from_scalar(1.0 / n, n, dtm.FP32)


def pagerank_iter(r):
    q = r.ewise_mult(inv_deg, binary.times).new(dtm.FP32)
    pulled = AT.mxv(q, semiring.plus_times).new(dtm.FP32)
    teleport = Vector.from_scalar(0.15 / n, n, dtm.FP32)
    return teleport.ewise_add(pulled.apply(binary.times, right=0.85), binary.plus).new(dtm.FP32)


r = gb.loop(30, pagerank_iter, r0)  # ONE lax.fori_loop program
print("pagerank mass:", float(np.sum(r.to_dense(fill_value=0))))

# ---- data-dependent loop: gb.until -----------------------------------------
d0 = Vector.from_scalar(np.float32(3.4e38 / 4), n, dtm.FP32)
d0[0] = 0.0
changed0 = gb.Scalar.from_value(True, dtm.BOOL)


def cond(dist, changed):
    return changed


def body(dist, changed):
    relaxed = AT.mxv(dist, semiring.min_plus).new(dtm.FP32)
    new = dist.dup()
    new(accum=binary.min) << relaxed
    ch = new.ewise_mult(dist, binary.lt).reduce(monoid.lor).new(dtm.BOOL)
    return new, ch


dist, _ = gb.until(cond, body, d0, changed0)
reached = int(np.sum(dist.to_dense(fill_value=np.float32(3.4e38)) < 1e30))
print("vertices reached from 0:", reached)

# ---- reusable runners (benchmarks, restarts) --------------------------------
from graphblas_tpu.models import dsl

levels = dsl.bfs_level(AT, 0)
print("bfs levels found:", int(levels.nvals))
cc = dsl.connected_components  # min-label propagation, one compiled while-loop
