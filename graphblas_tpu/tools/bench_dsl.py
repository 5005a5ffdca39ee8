"""Standalone DSL-metrics runner (iteration tool; bench.py stays canonical).

Measures the DSL-expressed PageRank/BFS/SSSP/CC against cached plans.
Usage: GRAPHBLAS_BENCH_SCALE=19 python -m graphblas_tpu.tools.bench_dsl
"""

import json
import os
import tempfile
import time


def main():
    import jax
    import numpy as np

    import graphblas_tpu

    graphblas_tpu.config.set(enable_x64=False)
    graphblas_tpu._init(automatic=True)
    import jax.numpy as jnp

    scale = int(os.environ.get("GRAPHBLAS_BENCH_SCALE", "19"))
    ef = int(os.environ.get("GRAPHBLAS_BENCH_EF", "16"))
    seed = 5
    only = os.environ.get("GRAPHBLAS_BENCH_DSL_ONLY", "")  # pr|bfs|sssp|cc
    cache = os.environ.get("GRAPHBLAS_BENCH_CACHE", tempfile.gettempdir())
    graph_path = os.path.join(cache, f"gbtpu_graph_s{scale}_e{ef}_{seed}.npz")
    dsl_graph_path = graph_path.replace(".npz", "_dsl.npz")
    dsl_cache = os.path.join(cache, f"gbtpu_dslplans_s{scale}_e{ef}_{seed}")
    os.environ["GRAPHBLAS_TPU_PLAN_CACHE"] = dsl_cache

    from graphblas_tpu import tx as txmod
    from graphblas_tpu.core import dtypes as dtmod
    from graphblas_tpu.core.matrix import Matrix
    from graphblas_tpu.core.sparse import SparseMatrixData
    from graphblas_tpu.models import dsl

    gdata = np.load(graph_path)
    e = len(gdata["src"])
    dd = np.load(dsl_graph_path)
    nn = int(dd["n"][0])

    def mk(prefix):
        sp = SparseMatrixData(
            dd[f"{prefix}_rows"], dd[f"{prefix}_cols"], dd[f"{prefix}_vals"], nn, nn
        )
        return Matrix._from_sparse(sp, dtmod.FP32)

    def _force(x):
        return float(jnp.sum(x.astype(jnp.float32)))

    tick = jax.jit(lambda v: v + 1.0)
    probe = jnp.ones((8,), jnp.float32)
    _force(tick(probe))
    floors = []
    for _ in range(5):
        t0 = time.perf_counter()
        _force(tick(probe))
        floors.append(time.perf_counter() - t0)
    floor = sorted(floors)[2]

    def measure(fn, m):
        _force(fn())
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            _force(fn())
            ts.append(time.perf_counter() - t0)
        return max(sorted(ts)[1] - floor, 1e-9) / m

    out = {"scale": scale, "edges": e, "floor_ms": round(floor * 1e3, 2)}
    with txmod.config.set(mxv_strategy="plan"):
        if not only or only == "pr":
            AT = mk("pr")
            t0 = time.perf_counter()
            pr_run = dsl.pagerank_runner(AT, max_iters=50)
            out["pr_compile_s"] = round(time.perf_counter() - t0, 1)
            t = measure(lambda: pr_run()._values, 50)
            out["dsl_pagerank_gteps_per_iter"] = round(e / t / 1e9, 4)
            out["dsl_pagerank_iter_ms"] = round(t * 1e3, 3)
            out["dsl_pagerank_mode"] = pr_run.mode
            print(json.dumps(out), flush=True)
        if not only or only == "bfs":
            AT = mk("pr")
            srcs = np.argsort(np.bincount(gdata["src"], minlength=nn))[::-1][:2]
            t0 = time.perf_counter()
            runs = [dsl.bfs_level_runner(AT, int(s_)) for s_ in srcs]
            out["bfs_compile_s"] = round(time.perf_counter() - t0, 1)

            def run2():
                runs[0]()
                return runs[1]()._values

            t = measure(run2, 2)
            out["dsl_bfs_gteps"] = round(e / t / 1e9, 4)
            out["dsl_bfs_mode"] = runs[0].mode
            print(json.dumps(out), flush=True)
        if not only or only == "sssp":
            ATw = mk("ss")
            srcs = np.argsort(np.bincount(gdata["src"], minlength=nn))[::-1][:2]
            t0 = time.perf_counter()
            runs = [dsl.sssp_runner(ATw, int(s_)) for s_ in srcs]
            out["sssp_compile_s"] = round(time.perf_counter() - t0, 1)

            def run2():
                runs[0]()
                return runs[1]()._values

            t = measure(run2, 2)
            out["dsl_sssp_gteps"] = round(e / t / 1e9, 4)
            out["dsl_sssp_mode"] = runs[0].mode
            print(json.dumps(out), flush=True)
        if not only or only == "cc":
            ATs = mk("cc")
            e_sym = int(dd["cc_rows"].shape[0])
            t0 = time.perf_counter()
            cc_run = dsl.connected_components_runner(ATs)
            out["cc_compile_s"] = round(time.perf_counter() - t0, 1)
            t = measure(lambda: cc_run()._values, 1)
            out["cc_gteps"] = round(e_sym / t / 1e9, 4)
            out["cc_ms"] = round(t * 1e3, 2)
            out["cc_iters"] = int(cc_run.runner.last_iters)
            print(json.dumps(out), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
