"""Round-5 SSSP/BFS x_start A/B #2 (TPU, exclusive): donor with one-element
DUS inject + fr_reduce'd changed flags, vs donor_where (full-pass inject),
vs select.

    python -m graphblas_tpu.tools.profile_r5d
"""

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
        # correctness cross-check on device: donor vs select outputs agree
        d_donor = np.asarray(mf._sssp_loop_v3(plan, sources[0], n, mode="donor_state"))
        d_sel = np.asarray(mf._sssp_loop_v3(plan, sources[0], n, mode="select"))
        assert np.allclose(d_donor, d_sel, rtol=1e-6), "donor_state != select on device"
        l_donor = np.asarray(mf._bfs_loop_v3(plan, sources[0], n, mode="donor_state"))
        l_sel = np.asarray(mf._bfs_loop_v3(plan, sources[0], n, mode="select"))
        assert (l_donor == l_sel).all(), "bfs donor_state != select on device"
        log("device_crosscheck", "ok")

        for mode in ("donor", "donor_state", "select"):
            runs = sources[:4] * 2

            def run_sssp(_m=mode):
                for s_ in runs[:-1]:
                    mf._sssp_loop_v3(plan, s_, n, mode=_m)
                return mf._sssp_loop_v3(plan, runs[-1], n, mode=_m)

            t = measure(run_sssp, 8)
            log(f"sssp_ms[{mode}]", t * 1e3)
            log(f"sssp_gteps[{mode}]", e / t / 1e9)

        for mode in ("donor", "donor_state", "select"):
            runs = sources[:4] * 2

            def run_bfs(_m=mode):
                for s_ in runs[:-1]:
                    mf._bfs_loop_v3(plan, s_, n, mode=_m)
                return mf._bfs_loop_v3(plan, runs[-1], n, mode=_m)

            t = measure(run_bfs, 8)
            log(f"bfs_ms[{mode}]", t * 1e3)
            log(f"bfs_gteps[{mode}]", e / t / 1e9)

    print(json.dumps(OUT, indent=1), flush=True)


if __name__ == "__main__":
    main()
