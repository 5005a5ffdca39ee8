"""Per-stage SpMV profiler: where does the PageRank iteration time go?

Times each pipeline stage (expand scatter+fill, every permute stage,
fused contrib scan, boundary picks) by running R repetitions inside one
jitted lax.fori_loop (amortizes tunnel dispatch latency) and forcing a
host read.  Usage (TPU, single process):

    python -m graphblas_tpu.tools.profile_spmv --scale 19 [--reps 20]
"""

import argparse
import json
import os
import tempfile
import time


def _force(x):
    import jax.numpy as jnp

    return float(jnp.sum(x.astype(jnp.float32)))


def _timed(fn, x, reps):
    """Median-of-3 of (jit'd fori_loop of fn^reps) per-rep seconds."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(x0):
        def body(i, acc):
            y = fn(acc)
            # keep shapes stable: fold outputs back to input shape domain
            if y.shape != acc.shape or y.dtype != acc.dtype:
                return acc + jnp.sum(y.astype(jnp.float32)) * 0
            return y

        return jax.lax.fori_loop(0, reps, body, x0)

    _force(loop(x))  # compile + warm
    best = []
    for _ in range(3):
        t0 = time.perf_counter()
        _force(loop(x))
        best.append((time.perf_counter() - t0) / reps)
    return sorted(best)[1]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--scale", type=int, default=19)
    parser.add_argument("--ef", type=int, default=16)
    parser.add_argument("--reps", type=int, default=200)
    args = parser.parse_args()

    import graphblas_tpu

    graphblas_tpu.config.set(enable_x64=False)
    graphblas_tpu._init(automatic=True)
    import jax
    import jax.numpy as jnp

    from graphblas_tpu.ops import fastspmv as fs
    from graphblas_tpu.ops.pallas_scan import segmented_scan, segmented_scan_contrib
    from graphblas_tpu.ops.permute import apply_plan

    cache = os.environ.get("GRAPHBLAS_BENCH_CACHE", tempfile.gettempdir())
    plan_path = os.path.join(cache, f"gbtpu_plan_s{args.scale}_e{args.ef}_5.npz")
    if not os.path.exists(plan_path):
        raise SystemExit(f"no cached plan at {plan_path}; run bench.py first")
    plan = fs.load_spmv_plan(plan_path)
    n, e_pad = plan.n, plan.e_pad
    print(f"n={n} e_pad={e_pad} stages={[s[0] for s in plan.perm_plan.stages]}")

    x = jnp.linspace(0.0, 1.0, n, dtype=jnp.float32)
    xe = jnp.linspace(0.0, 1.0, e_pad, dtype=jnp.float32)
    reps = args.reps
    out = {}

    with jax.enable_x64(False):
        # measurement floor: identity body (host-read cost / reps)
        out["floor_identity"] = _timed(lambda v: v, x, reps)
        # full spmv
        out["full_spmv"] = _timed(
            lambda v: fs.spmv(plan, v[:n], "plus", "first").astype(jnp.float32), x, reps
        )
        # expand = scatter + fill scan
        out["expand"] = _timed(
            lambda v: fs._expand_src_sorted(v[:n], plan.indptr_src, e_pad)[:n], x, reps
        )
        # whole permute network
        out["permute_all"] = _timed(lambda v: apply_plan(v, plan.perm_plan), xe, reps)
        # per-stage timings
        for i, stage in enumerate(plan.perm_plan.stages):
            sub = type(plan.perm_plan)(e_pad, [stage])
            out[f"stage{i}_{stage[0]}"] = _timed(lambda v, s=sub: apply_plan(v, s), xe, reps)
        # fused contrib scan
        starts = plan.indptr_dst[:-1]
        seg = jnp.zeros(e_pad, bool).at[starts].set(True)

        def contrib(v):
            return segmented_scan_contrib(
                v, plan.w_dst_order, plan.valid_dst_order, seg, "add", "times"
            )

        if plan.w_dst_order is not None:
            out["contrib_scan"] = _timed(contrib, xe, reps)
        out["plain_scan"] = _timed(lambda v: segmented_scan(v, seg, "add"), xe, reps)
        # boundary pick: ends gather + empty-mask
        ends = plan.indptr_dst[1:]

        def boundary(v):
            padded = jnp.concatenate([jnp.zeros((1,), v.dtype), v])
            return padded[ends].astype(jnp.float32)

        out["boundary_pick"] = _timed(boundary, xe, reps)
        # reference: raw HBM copy and a plain elementwise op at e_pad
        out["copy_epad"] = _timed(lambda v: v + 1.0, xe, reps)

    print(json.dumps({k: round(v * 1e3, 3) for k, v in out.items()}, indent=1))


if __name__ == "__main__":
    main()
