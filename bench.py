"""Benchmark driver: GAP-style PageRank/BFS/SSSP GTEPS on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline (BASELINE.md): the reference publishes no numbers; the north star
is >= 1 GTEPS/chip, so vs_baseline = value / 1.0 GTEPS.

Pipeline: the graph's SpMV plan (permutation-network layout, see
graphblas_tpu/ops/fastspmv.py) is built by a subprocess WITHOUT the TPU
tunnel attached (the tunnel env serializes host CPU ~20x — CLAUDE.md), then
the compiled algorithms run on the chip.

Env overrides: GRAPHBLAS_BENCH_SCALE (default 18), GRAPHBLAS_BENCH_EF (16).
"""

import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np


def _build_plan_subprocess(scale, ef, seed, plan_path, graph_path, dsl_cache):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # detach the TPU tunnel: host speed
    env["JAX_PLATFORMS"] = "cpu"
    cmd = [
        sys.executable,
        "-m",
        "graphblas_tpu.tools.build_plan",
        "--scale",
        str(scale),
        "--ef",
        str(ef),
        "--seed",
        str(seed),
        "--out",
        plan_path,
        "--graph-out",
        graph_path,
        "--dsl-cache",
        dsl_cache,
    ]
    subprocess.run(cmd, check=True, env=env, cwd=os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax

    import graphblas_tpu  # noqa: F401

    # the bench path is all 32-bit; x64 would force 64-bit index promotion
    graphblas_tpu.config.set(enable_x64=False)
    graphblas_tpu._init(automatic=True)
    import jax.numpy as jnp

    from graphblas_tpu.models import fast as mf
    from graphblas_tpu.ops.fastspmv import load_spmv_plan, spmv

    scale = int(os.environ.get("GRAPHBLAS_BENCH_SCALE", "19"))
    ef = int(os.environ.get("GRAPHBLAS_BENCH_EF", "16"))
    seed = 5
    cache = os.environ.get("GRAPHBLAS_BENCH_CACHE", tempfile.gettempdir())
    os.makedirs(cache, exist_ok=True)
    plan_path = os.path.join(cache, f"gbtpu_plan_v3_s{scale}_e{ef}_{seed}.npz")
    graph_path = os.path.join(cache, f"gbtpu_graph_s{scale}_e{ef}_{seed}.npz")
    dsl_cache = os.path.join(cache, f"gbtpu_dslplans_s{scale}_e{ef}_{seed}")
    dsl_graph_path = graph_path.replace(".npz", "_dsl.npz")
    if not (
        os.path.exists(plan_path)
        and os.path.exists(graph_path)
        and os.path.exists(dsl_graph_path)
        and os.path.exists(os.path.join(dsl_cache, "plans_v3.done"))
    ):
        # the marker guards the plan SET (v3: loop-capable total plans for
        # the compiled loops' edge-layout lowering); pattern-keyed plans
        # already in the cache are reused across marker upgrades
        _build_plan_subprocess(scale, ef, seed, plan_path, graph_path, dsl_cache)
    # DSL matrices load their (pre-built) plans from this on-disk cache
    os.environ["GRAPHBLAS_TPU_PLAN_CACHE"] = dsl_cache

    # NOTE: block_until_ready is unreliable over remote-execution tunnels;
    # force completion with a host value read instead.
    def _force(x):
        return float(jnp.sum(x.astype(jnp.float32)))

    # Measurement floor: one program dispatch + host-read over the tunnel
    # costs ~30 ms regardless of work (measured: a fori_loop body's total
    # time is constant in the iteration count until work dominates).  It is
    # RPC latency, not device time — subtract it and amortize over many
    # kernel executions, GAP-style.
    tick = jax.jit(lambda v: v + 1.0)
    # the remote tunnel occasionally comes up wedged (FAILED_PRECONDITION /
    # UNAVAILABLE on the first host read) and outages can last tens of
    # minutes; this MUST be the process's FIRST device touch (before any
    # plan upload) — back off and retry for up to ~30 min before giving up
    max_attempts = int(os.environ.get("GRAPHBLAS_BENCH_PROBE_ATTEMPTS", "10"))
    for attempt in range(max_attempts):
        try:
            probe = jnp.ones((8,), jnp.float32)
            _force(tick(probe))
            break
        except Exception:
            if attempt == max_attempts - 1:
                raise
            # a failed backend INIT is cached by jax — drop it so the next
            # attempt re-dials the tunnel instead of re-raising immediately
            try:
                from jax._src import xla_bridge as _xb

                _xb._clear_backends()
            except Exception:
                pass
            time.sleep(min(60 * (attempt + 1), 300))

    plan = load_spmv_plan(plan_path)
    gdata = np.load(graph_path)
    src, dst = gdata["src"], gdata["dst"]
    n = int(gdata["n"][0])
    e = len(src)
    outdeg_np = np.bincount(src, minlength=n)
    outdeg = jnp.asarray(outdeg_np.astype(np.int32))
    sources = np.argsort(outdeg_np)[::-1][:4].tolist()

    floors = []
    for _ in range(5):
        t0 = time.perf_counter()
        _force(tick(probe))
        floors.append(time.perf_counter() - t0)
    floor = sorted(floors)[2]

    def measure(fn, m):
        """median of (walltime - dispatch floor) / m work units, after an
        adaptive warm-up: repeat until two consecutive timings agree within
        8% (compile, plan upload, and XLA autotuning all land in the first
        executions; a cold driver process otherwise reads 10-40% low —
        CLAUDE.md bench-variance note)."""
        _force(fn())  # compile + first execution
        prev = None
        for _ in range(6):  # bounded warm-up
            t0 = time.perf_counter()
            _force(fn())
            t = time.perf_counter() - t0
            if prev is not None and abs(t - prev) <= 0.08 * max(t, prev):
                break
            prev = t
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            _force(fn())
            ts.append(time.perf_counter() - t0)
        return max(sorted(ts)[1] - floor, 1e-9) / m

    # ---- PageRank (primary: GTEPS per plus_times mxv iteration) ----------
    iters = 50
    pr_time = measure(lambda: mf.pagerank(plan, outdeg, n, max_iters=iters, tol=0.0), iters)
    pr_gteps = e / pr_time / 1e9

    # ---- BFS (many sources; async dispatch chains on-device) --------------
    nbfs = 8
    bfs_sources = sources[:4] * 2

    def run_bfs():
        for src_node in bfs_sources[:-1]:
            mf.bfs_level(plan, src_node, n)
        return mf.bfs_level(plan, bfs_sources[-1], n)

    bfs_time = measure(run_bfs, nbfs)
    bfs_gteps = e / bfs_time / 1e9
    nlevels = int(np.asarray(mf.bfs_level(plan, sources[0], n)).max())

    # ---- masked semiring SpGEMM (BASELINE acceptance metric) --------------
    # triangle-counting shape: C(L.S) = L plus_pair L^T over the lower
    # triangle of a degree-bounded random graph (dot method, sparse format)
    def spgemm_gflops():
        from graphblas_tpu import Matrix, binary, semiring
        from graphblas_tpu import tx as txmod
        from graphblas_tpu.core.sparse import sparse_mxm_masked
        from graphblas_tpu.core.operator import get_typed_op
        from graphblas_tpu.core import dtypes as dtmod

        rng_l = np.random.default_rng(7)
        # clustered graph (cliques + random edges): real intersection
        # work, like the community structure of the GAP TC inputs
        ns = 1 << 16
        csize = 64  # divides ns
        base = np.arange(ns) - (np.arange(ns) % csize)
        rs_list, cs_list = [], []
        for d in range(1, csize):
            rs_list.append(np.arange(ns))
            cs_list.append(base + (np.arange(ns) + d) % csize)
        rs_ = np.concatenate(rs_list + [rng_l.integers(0, ns, ns * 2)])
        cs_ = np.concatenate(cs_list + [rng_l.integers(0, ns, ns * 2)])
        lo, hi = np.minimum(rs_, cs_), np.maximum(rs_, cs_)
        keep = lo != hi
        with txmod.config.set(dense_limit=0):
            L = Matrix.from_coo(hi[keep], lo[keep], np.float32(1.0), dtmod.FP32, nrows=ns, ncols=ns, dup_op=binary.first)
            U = L.T.new()
        sr = get_typed_op(semiring.plus_pair, dtmod.FP32, dtmod.FP32, kind="semiring")
        lsp, usp = L._sparse, U._sparse
        mr, mc = lsp.rows, lsp.cols
        from graphblas_tpu.core.sparse import sparse_spgemm_analyze, sparse_spgemm_execute

        task_plan = sparse_spgemm_analyze(lsp, usp, mr, mc, bricks=True, reduce_net=True)  # pattern analysis, once

        def run_once():
            acc, hit, flops_dev = sparse_spgemm_execute(
                task_plan, sr, dtmod.FP32, keep_on_device=True
            )
            return acc, flops_dev

        acc, flops_dev = run_once()  # warm (compile)
        flops = int(flops_dev)  # constant across runs: read outside timing
        _force(acc)
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            acc, _ = run_once()
        _force(acc)  # device queue is in-order: forcing the last waits for all
        dt = (time.perf_counter() - t0 - floor) / reps
        return flops / dt / 1e9, int(lsp.nvals)

    try:
        spgemm_gf, spgemm_nnz = spgemm_gflops()
    except Exception:
        spgemm_gf, spgemm_nnz = -1.0, 0

    # ---- dense tropical (min_plus) mxm ------------------------------------
    def tropical_tops():
        from graphblas_tpu.ops.pallas_mxm import tropical_mxm_filled

        mt = 2048
        rng_t = np.random.default_rng(3)
        a = jnp.asarray(rng_t.random((mt, mt), np.float32))
        b = jnp.asarray(rng_t.random((mt, mt), np.float32))

        def run8():  # amortize past the dispatch floor
            for _ in range(7):
                tropical_mxm_filled(a, b, "min", "plus")
            return tropical_mxm_filled(a, b, "min", "plus")

        t = measure(run8, 8)
        return 2 * mt**3 / t / 1e12

    try:
        trop_tops = tropical_tops()
    except Exception:
        trop_tops = -1.0

    # ---- DSL-expressed algorithms (loop capture, VERDICT r2 #1) -----------
    # The same workloads written as USER DSL statements, compiled by
    # gb.loop/gb.until into one XLA program each; plans pre-built by the
    # subprocess and loaded from the on-disk plan cache.
    def dsl_metrics():
        from graphblas_tpu import tx as txmod
        from graphblas_tpu.core import dtypes as dtmod
        from graphblas_tpu.core.matrix import Matrix
        from graphblas_tpu.core.sparse import SparseMatrixData
        from graphblas_tpu.models import dsl

        dd = np.load(dsl_graph_path)
        nn = int(dd["n"][0])

        def mk(prefix):
            sp = SparseMatrixData(
                dd[f"{prefix}_rows"], dd[f"{prefix}_cols"], dd[f"{prefix}_vals"], nn, nn
            )
            return Matrix._from_sparse(sp, dtmod.FP32)

        out = {}
        with txmod.config.set(mxv_strategy="plan"):
            # PageRank: dup edges fold into values (plus), so the DSL result
            # equals the model's multigraph pagerank exactly; GTEPS uses the
            # raw edge count like the model metric
            AT = mk("pr")
            pr_run = dsl.pagerank_runner(AT, max_iters=iters)
            t = measure(lambda: pr_run()._values, iters)
            out["dsl_pagerank_gteps_per_iter"] = round(e / t / 1e9, 4)
            out["dsl_pagerank_iter_ms"] = round(t * 1e3, 3)
            out["dsl_pagerank_mode"] = f"{pr_run.mode}/{pr_run.layout}"
            out["dsl_vs_model_iter_ratio"] = round(t / pr_time, 3)

            # BFS (same sources as the model metric); amortize 4 runs past
            # the dispatch floor like the model-path measurements
            bfs_runs = [dsl.bfs_level_runner(AT, s_) for s_ in sources[:2]] * 2

            def run_dsl_bfs():
                for r_ in bfs_runs[:-1]:
                    r_()
                return bfs_runs[-1]()._values

            t = measure(run_dsl_bfs, 4)
            out["dsl_bfs_gteps"] = round(e / t / 1e9, 4)
            out["dsl_bfs_mode"] = bfs_runs[0].mode

            # BFS, TPU-idiomatic dense-frontier recipe (hoisted mode)
            bfsd_runs = [dsl.bfs_level_dense_runner(AT, s_) for s_ in sources[:2]] * 2

            def run_dsl_bfs_dense():
                for r_ in bfsd_runs[:-1]:
                    r_()
                return bfsd_runs[-1]()._values

            t = measure(run_dsl_bfs_dense, 4)
            out["dsl_bfs_dense_gteps"] = round(e / t / 1e9, 4)
            out["dsl_bfs_dense_mode"] = f"{bfsd_runs[0].mode}/{bfsd_runs[0].runner.layout}"

            # SSSP (min-folded duplicate edges: identical relaxations)
            ATw = mk("ss")
            sssp_runs = [dsl.sssp_runner(ATw, s_) for s_ in sources[:2]] * 2

            def run_dsl_sssp():
                for r_ in sssp_runs[:-1]:
                    r_()
                return sssp_runs[-1]()._values

            t = measure(run_dsl_sssp, 4)
            out["dsl_sssp_gteps"] = round(e / t / 1e9, 4)
            out["dsl_sssp_mode"] = f"{sssp_runs[0].mode}/{sssp_runs[0].runner.layout}"

            # Connected components (acceptance workload #4): alternating
            # pull/push min-label on the DIRECTED adjacency (weak
            # connectivity == the symmetrization's components).  The
            # directed e_pad (2^23 here) stays below the network VMEM
            # cliff that the symmetrized graph's 2^24 e_pad pays; GTEPS
            # keeps the symmetrized edge count as the workload size,
            # whole run timed, amortized over 4 runs like BFS/SSSP
            e_sym = int(dd["cc_rows"].shape[0])
            cc_run = dsl.connected_components_runner(AT)

            def run_cc():
                for _ in range(3):
                    cc_run()
                return cc_run()._values

            t = measure(run_cc, 4)
            out["cc_gteps"] = round(e_sym / t / 1e9, 4)
            out["cc_ms"] = round(t * 1e3, 2)
            out["cc_iters"] = int(cc_run.runner.last_iters)
            out["cc_passes"] = 2 * out["cc_iters"]
            out["cc_edges_sym"] = e_sym
            out["cc_mode"] = f"{cc_run.mode}/{cc_run.runner.layout}"
        return out

    try:
        dsl_out = dsl_metrics()
    except Exception as ex:  # pragma: no cover - bench resilience
        dsl_out = {"dsl_error": f"{type(ex).__name__}: {ex}"}

    # ---- SSSP -------------------------------------------------------------
    # amortize over 8 runs like BFS: at ~8 ms/run vs a ~30 ms dispatch
    # floor, 3 runs left the measurement floor-noise-dominated
    nsssp = 8
    sssp_sources = sources[:4] * 2

    def run_sssp():
        for src_node in sssp_sources[:-1]:
            mf.sssp(plan, src_node, n)
        return mf.sssp(plan, sssp_sources[-1], n)

    sssp_time = measure(run_sssp, nsssp)
    sssp_gteps = e / sssp_time / 1e9

    result = {
        "metric": "PageRank GTEPS/iter/chip (RMAT scale=%d ef=%d, permutation-network SpMV)" % (scale, ef),
        "value": round(pr_gteps, 4),
        "unit": "GTEPS",
        "vs_baseline": round(pr_gteps / 1.0, 4),
        "detail": {
            "platform": jax.default_backend(),
            "nodes": n,
            "edges": e,
            "pagerank_gteps_per_iter": round(pr_gteps, 4),
            "bfs_gteps": round(bfs_gteps, 4),
            "bfs_levels": nlevels,
            "sssp_gteps": round(sssp_gteps, 4),
            "pagerank_iter_ms": round(pr_time * 1e3, 2),
            "bfs_ms": round(bfs_time * 1e3, 2),
            "sssp_ms": round(sssp_time * 1e3, 2),
            "dispatch_floor_ms": round(floor * 1e3, 2),
            "masked_spgemm_gflops": round(spgemm_gf, 4),
            "masked_spgemm_mask_nnz": spgemm_nnz,
            "tropical_mxm_tops": round(trop_tops, 4),
            **dsl_out,
        },
    }
    print(json.dumps(result))


# The last independently-corroborated full-bench numbers (see BENCH_NOTES);
# embedded in the failure JSON so an outage round still records the state.
_LAST_GOOD = {
    "pagerank_gteps_per_iter": 5.7312,
    "bfs_gteps": 0.9468,
    "sssp_gteps": 0.8388,
    "masked_spgemm_gflops": 3.9021,
    "tropical_mxm_tops": 3.5188,
    "source": "round-5 warm run (02:13 UTC 2026-08-19, /tmp/bench_r5b.log)",
}


def _install_watchdog():
    """A device read can block FOREVER when the TPU relay dies mid-bench
    (round-4 outage: PJRT blocks in make_c_api_client).  If main() hasn't
    finished by the deadline, print the failure JSON and hard-exit so the
    driver records a parseable artifact instead of an rc=124 timeout."""
    import threading

    deadline = float(os.environ.get("GRAPHBLAS_BENCH_DEADLINE_S", "3300"))

    def fire():
        print(
            json.dumps(
                {
                    "metric": "PageRank GTEPS/iter/chip (bench TIMED OUT — relay hang?)",
                    "value": None,
                    "unit": "GTEPS",
                    "vs_baseline": None,
                    "error": f"watchdog: no result after {deadline}s (device read blocked?)",
                    "last_good": _LAST_GOOD,
                }
            ),
            flush=True,
        )
        os._exit(0)

    t = threading.Timer(deadline, fire)
    t.daemon = True
    t.start()
    return t


if __name__ == "__main__":
    # The driver parses exactly ONE JSON line from stdout. A dead TPU relay
    # (the round-3/4 failure mode) must yield a diagnosable artifact, not a
    # raw traceback with rc=1.
    import traceback

    _wd = _install_watchdog()
    try:
        main()
        _wd.cancel()
    except BaseException as ex:  # noqa: BLE001 — bench resilience by design
        err = {
            "metric": "PageRank GTEPS/iter/chip (bench FAILED — backend unavailable?)",
            "value": None,
            "unit": "GTEPS",
            "vs_baseline": None,
            "error": f"{type(ex).__name__}: {ex}",
            "traceback_tail": traceback.format_exc().strip().splitlines()[-3:],
            "last_good": _LAST_GOOD,
        }
        print(json.dumps(err))
        sys.exit(0)
