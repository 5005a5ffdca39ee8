"""Profile BFS/SSSP loop overhead: fori(K) body chains vs while_loop.

Usage: python -m graphblas_tpu.tools.profile_bfs --scale 19
"""

import argparse
import json
import os
import tempfile
import time


def _force(x):
    import jax.numpy as jnp

    return float(jnp.sum(x.astype(jnp.float32)))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--scale", type=int, default=19)
    parser.add_argument("--ef", type=int, default=16)
    args = parser.parse_args()

    import graphblas_tpu

    graphblas_tpu.config.set(enable_x64=False)
    graphblas_tpu._init(automatic=True)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from graphblas_tpu.models import fast as mf
    from graphblas_tpu.ops import fastspmv as fs

    cache = os.environ.get("GRAPHBLAS_BENCH_CACHE", tempfile.gettempdir())
    plan_path = os.path.join(cache, f"gbtpu_plan_v3_s{args.scale}_e{args.ef}_5.npz")
    plan = fs.load_spmv_plan(plan_path)
    gdata = np.load(os.path.join(cache, f"gbtpu_graph_s{args.scale}_e{args.ef}_5.npz"))
    n = int(gdata["n"][0])
    outdeg_np = np.bincount(gdata["src"], minlength=n)
    source = int(np.argsort(outdeg_np)[::-1][0])
    out = {}

    def timeit(fn, *a):
        _force(fn(*a))
        best = []
        for _ in range(3):
            t0 = time.perf_counter()
            _force(fn(*a))
            best.append(time.perf_counter() - t0)
        return sorted(best)[1]

    with jax.enable_x64(False):
        K = 6

        # BFS body chained in a fori_loop (no data-dependent cond)
        @jax.jit
        def bfs_fori(plan, src_i):
            levels0 = jnp.full((n,), -1, jnp.int32).at[src_i].set(0)
            frontier0 = jnp.zeros((n,), jnp.float32).at[src_i].set(1.0)

            def body(i, state):
                levels, frontier = state
                reached = fs.spmv(plan, frontier, "max", "first") > 0
                nxt = reached & (levels < 0)
                return jnp.where(nxt, i + 1, levels), nxt.astype(jnp.float32)

            levels, _ = jax.lax.fori_loop(0, K, body, (levels0, frontier0))
            return levels

        out[f"bfs_fori_{K}"] = timeit(bfs_fori, plan, jnp.int32(source)) * 1e3
        print("bfs_fori", out[f"bfs_fori_{K}"], flush=True)
        out["bfs_while"] = timeit(lambda s: mf._bfs_loop(plan, int(s), n), source) * 1e3
        print("bfs_while", out["bfs_while"], flush=True)

        # plain spmv max/first alone, K reps chained
        @jax.jit
        def spmv_chain(plan, x0):
            return jax.lax.fori_loop(
                0, K, lambda i, x: fs.spmv(plan, x, "max", "first"), x0
            )

        out[f"spmv_maxfirst_chain_{K}"] = timeit(spmv_chain, plan, jnp.ones((n,), jnp.float32)) * 1e3
        print("spmv_chain", out[f"spmv_maxfirst_chain_{K}"], flush=True)

        # SSSP: fori of 21 relaxations vs while
        @jax.jit
        def sssp_fori(plan, src_i):
            dist0 = jnp.full((n,), mf._BIG, jnp.float32).at[src_i].set(0.0)

            def body(i, dist):
                return jnp.minimum(dist, fs.spmv(plan, dist, "min", "plus"))

            return jax.lax.fori_loop(0, 21, body, dist0)

        out["sssp_fori_21"] = timeit(sssp_fori, plan, jnp.int32(source)) * 1e3
        print("sssp_fori", out["sssp_fori_21"], flush=True)
        out["sssp_while"] = timeit(lambda s: mf._sssp_loop(plan, int(s), n), source) * 1e3

    print(json.dumps({k: round(v, 2) for k, v in out.items()}, indent=1))


if __name__ == "__main__":
    main()
