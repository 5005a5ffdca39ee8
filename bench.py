"""Benchmark driver: GAP-style BFS/SSSP/PageRank GTEPS on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline (BASELINE.md): north-star >= 1 GTEPS/chip on GAP-scale BFS; the
reference publishes no numbers, so vs_baseline is value / 1.0 GTEPS.

Env overrides: GRAPHBLAS_BENCH_SCALE (default 18), GRAPHBLAS_BENCH_EF (16).
"""

import json
import os
import time

import numpy as np


def main():
    import jax

    import graphblas_tpu  # noqa: F401

    graphblas_tpu._init(automatic=True)
    from graphblas_tpu.models import bfs_level, pagerank, sssp
    from graphblas_tpu.models.graph import rmat

    scale = int(os.environ.get("GRAPHBLAS_BENCH_SCALE", "18"))
    ef = int(os.environ.get("GRAPHBLAS_BENCH_EF", "16"))

    g = rmat(scale, ef, seed=5, weighted=True)
    n, e = g.n, g.nedges

    # pick high-degree sources (GAP-style: sources that reach most of the graph)
    src_np = np.asarray(g.src)[np.asarray(g.valid)]
    deg = np.bincount(src_np, minlength=n)
    sources = np.argsort(deg)[::-1][:8].tolist()

    # ---- BFS (primary metric) ----
    levels = bfs_level(g, sources[0])
    levels.block_until_ready()  # compile + warmup
    t0 = time.perf_counter()
    runs = 0
    for s in sources[1:4]:
        levels = bfs_level(g, s)
        runs += 1
    levels.block_until_ready()
    bfs_time = (time.perf_counter() - t0) / max(runs, 1)
    bfs_gteps = e / bfs_time / 1e9

    # ---- PageRank (edges/s per iteration) ----
    r = pagerank(g, max_iters=5)
    r.block_until_ready()
    t0 = time.perf_counter()
    iters = 20
    r = pagerank(g, max_iters=iters, tol=0.0)
    r.block_until_ready()
    pr_time = (time.perf_counter() - t0) / iters
    pr_gteps = e / pr_time / 1e9

    # ---- SSSP ----
    d = sssp(g, sources[0])
    d.block_until_ready()
    t0 = time.perf_counter()
    d = sssp(g, sources[1])
    d.block_until_ready()
    sssp_time = time.perf_counter() - t0
    sssp_gteps = e / sssp_time / 1e9

    result = {
        "metric": "BFS GTEPS/chip (RMAT scale=%d ef=%d)" % (scale, ef),
        "value": round(bfs_gteps, 4),
        "unit": "GTEPS",
        "vs_baseline": round(bfs_gteps / 1.0, 4),
        "detail": {
            "platform": jax.default_backend(),
            "nodes": n,
            "edges": e,
            "bfs_gteps": round(bfs_gteps, 4),
            "pagerank_gteps_per_iter": round(pr_gteps, 4),
            "sssp_gteps": round(sssp_gteps, 4),
            "bfs_ms": round(bfs_time * 1e3, 2),
            "pagerank_iter_ms": round(pr_time * 1e3, 2),
            "sssp_ms": round(sssp_time * 1e3, 2),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
