"""Round-5 consolidated A/B profile (TPU, exclusive — never run concurrently
with another TPU job).  Measures, bench-style (floor-subtracted medians after
adaptive warm-up):

  1. PageRank iter ms at HEAD defaults (the bench reads 1.46, the isolated
     r5 fuse measurement read 1.17 — which is true in bench-like context?)
  2. model SSSP / BFS totals under x_start modes donor / donor_post / select
  3. DSL cc (min-label, e_pad 2^24) with GRAPHBLAS_TPU_S_ALIAS off vs on —
     the in-context probe for the 2^24 network cost cliff
  4. slope-based per-apply cost of the 2^24 cc perm chain, alias off vs on

Writes incremental results to stdout (flush per line) + one final JSON line.
    python -m graphblas_tpu.tools.profile_r5c
"""

import functools
import json
import os
import tempfile
import time

import numpy as np

OUT = {}


def log(k, v):
    OUT[k] = round(v, 4) if isinstance(v, float) else v
    print(f"{k}: {v}", flush=True)


def main():
    import graphblas_tpu

    graphblas_tpu.config.set(enable_x64=False)
    graphblas_tpu._init(automatic=True)
    import jax
    import jax.numpy as jnp

    from graphblas_tpu.models import fast as mf
    from graphblas_tpu.ops import fastspmv as fs
    from graphblas_tpu.ops import permute as pm

    tmp = tempfile.gettempdir()
    plan = fs.load_spmv_plan(os.path.join(tmp, "gbtpu_plan_v3_s19_e16_5.npz"))
    g = np.load(os.path.join(tmp, "gbtpu_graph_s19_e16_5.npz"))
    src_np, n = g["src"], int(g["n"][0])
    e = len(src_np)
    outdeg = np.bincount(src_np, minlength=n)
    sources = np.argsort(outdeg)[::-1][:4].tolist()

    def force(x):
        return float(jnp.sum(x.astype(jnp.float32)))

    tick = jax.jit(lambda v: v + 1.0)
    probe = jnp.ones((8,), jnp.float32)
    force(tick(probe))
    floors = []
    for _ in range(5):
        t0 = time.perf_counter()
        force(tick(probe))
        floors.append(time.perf_counter() - t0)
    floor = sorted(floors)[2]
    log("floor_ms", floor * 1e3)

    def measure(fn, m):
        force(fn())
        prev = None
        for _ in range(6):
            t0 = time.perf_counter()
            force(fn())
            t = time.perf_counter() - t0
            if prev is not None and abs(t - prev) <= 0.08 * max(t, prev):
                break
            prev = t
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            force(fn())
            ts.append(time.perf_counter() - t0)
        return max(sorted(ts)[1] - floor, 1e-9) / m

    with jax.enable_x64(False):
        # -- 1. PageRank at HEAD defaults (bench-identical call) ------------
        outdeg_j = jnp.asarray(outdeg.astype(np.int32))
        t = measure(lambda: mf.pagerank(plan, outdeg_j, n, max_iters=50, tol=0.0), 50)
        log("pagerank_iter_ms", t * 1e3)

        # -- 2. SSSP / BFS x_start mode A/B ---------------------------------
        for mode in ("donor", "donor_post", "select"):
            runs = sources[:4] * 2

            def run_sssp(_m=mode):
                for s_ in runs[:-1]:
                    mf._sssp_loop_v3(plan, s_, n, mode=_m)
                return mf._sssp_loop_v3(plan, runs[-1], n, mode=_m)

            t = measure(run_sssp, 8)
            log(f"sssp_ms[{mode}]", t * 1e3)
            log(f"sssp_gteps[{mode}]", e / t / 1e9)

        for mode in ("donor", "donor_post", "select"):
            runs = sources[:4] * 2

            def run_bfs(_m=mode):
                for s_ in runs[:-1]:
                    mf._bfs_loop_v3(plan, s_, n, mode=_m)
                return mf._bfs_loop_v3(plan, runs[-1], n, mode=_m)

            t = measure(run_bfs, 8)
            log(f"bfs_ms[{mode}]", t * 1e3)
            log(f"bfs_gteps[{mode}]", e / t / 1e9)

        # -- 3. DSL cc, alias off vs on --------------------------------------
        from graphblas_tpu import tx as txmod
        from graphblas_tpu.core import dtypes as dtmod
        from graphblas_tpu.core.matrix import Matrix
        from graphblas_tpu.core.sparse import SparseMatrixData
        from graphblas_tpu.models import dsl

        dd = np.load(os.path.join(tmp, "gbtpu_graph_s19_e16_5_dsl.npz"))
        nn = int(dd["n"][0])
        os.environ["GRAPHBLAS_TPU_PLAN_CACHE"] = os.path.join(tmp, "gbtpu_dslplans_s19_e16_5")
        e_sym = int(dd["cc_rows"].shape[0])

        def mk(prefix):
            sp = SparseMatrixData(
                dd[f"{prefix}_rows"], dd[f"{prefix}_cols"], dd[f"{prefix}_vals"], nn, nn
            )
            return Matrix._from_sparse(sp, dtmod.FP32)

        with txmod.config.set(mxv_strategy="plan"):
            for alias in ("0", "1"):
                os.environ["GRAPHBLAS_TPU_S_ALIAS"] = alias
                ATs = mk("cc")
                cc_run = dsl.connected_components_runner(ATs)
                t = measure(lambda: cc_run()._values, 1)
                log(f"cc_ms[alias={alias}]", t * 1e3)
                log(f"cc_gteps[alias={alias}]", e_sym / t / 1e9)
                log(f"cc_iters[alias={alias}]", int(cc_run.runner.last_iters))

        # -- 4. 2^24 perm chain slope, alias off vs on -----------------------
        dsl_dir = os.path.join(tmp, "gbtpu_dslplans_s19_e16_5")
        big = None
        for f in sorted(os.listdir(dsl_dir)):
            p = fs.load_spmv_plan(os.path.join(dsl_dir, f))
            if p.e_pad == 1 << 24:
                big = p
                break
        if big is not None:
            net = big.perm_plan

            def slope_ms(jfn, x, K1=8, K2=32, reps=3):
                def best(K):
                    force(jfn(x, K))
                    ts = []
                    for _ in range(reps):
                        t0 = time.perf_counter()
                        force(jfn(x, K))
                        ts.append(time.perf_counter() - t0)
                    return sorted(ts)[reps // 2]

                t1, t2 = best(K1), best(K2)
                return (t2 - t1) / (K2 - K1) * 1e3

            for alias in ("0", "1"):
                os.environ["GRAPHBLAS_TPU_S_ALIAS"] = alias

                @functools.partial(jax.jit, static_argnames=("K", "tag"))
                def run(x, K, tag):
                    return jax.lax.fori_loop(0, K, lambda i, v: pm.apply_plan(v, net), x)

                ms = slope_ms(
                    functools.partial(run, tag=f"a{alias}"), jnp.ones((big.e_pad,), jnp.float32)
                )
                log(f"perm24_slope_ms[alias={alias}]", ms)
        os.environ["GRAPHBLAS_TPU_S_ALIAS"] = "0"

    print(json.dumps(OUT, indent=1), flush=True)


if __name__ == "__main__":
    main()
