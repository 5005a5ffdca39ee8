"""Micro-profile: which SpMV variant/stage is slow? Chained inside fori."""

import json
import os
import tempfile
import time


def _force(x):
    import jax.numpy as jnp

    return float(jnp.sum(x.astype(jnp.float32)))


def main():
    import graphblas_tpu

    graphblas_tpu.config.set(enable_x64=False)
    graphblas_tpu._init(automatic=True)
    import functools

    import jax
    import jax.numpy as jnp

    from graphblas_tpu.ops import fastspmv as fs
    from graphblas_tpu.ops.pallas_scan import segmented_scan, segmented_scan_contrib
    from graphblas_tpu.ops.permute import apply_plan

    cache = tempfile.gettempdir()
    plan = fs.load_spmv_plan(os.path.join(cache, "gbtpu_plan_v3_s19_e16_5.npz"))
    n, e_pad = plan.n, plan.e_pad
    x = jnp.ones((n,), jnp.float32)
    xe = jnp.ones((e_pad,), jnp.float32)
    out = {}
    K = 10

    @functools.partial(jax.jit, static_argnames=("tag",))
    def chain(plan, x0, tag):
        def body(i, v):
            if tag == "spmv_plus_first":
                y = fs.spmv(plan, v, "plus", "first")
            elif tag == "spmv_max_first":
                y = fs.spmv(plan, v, "max", "first")
            elif tag == "spmv_min_plus":
                y = fs.spmv(plan, v, "min", "plus")
            elif tag == "spmv_plus_times":
                y = fs.spmv(plan, v, "plus", "times")
            return y

        return jax.lax.fori_loop(0, K, body, x0)

    @functools.partial(jax.jit, static_argnames=("tag",))
    def echain(plan, v0, tag):
        seg = plan.seg_start_dst

        def body(i, v):
            if tag == "scan_add":
                return segmented_scan(v, seg, "add")
            if tag == "scan_max":
                return segmented_scan(v, seg, "max")
            if tag == "scan_fill":
                return segmented_scan(v, plan.seg_start_src, "fill")
            if tag == "contrib_add":
                return segmented_scan_contrib(v, None, plan.valid_dst_order, seg, "add", "first")
            if tag == "contrib_max":
                return segmented_scan_contrib(v, None, plan.valid_dst_order, seg, "max", "first")
            if tag == "permute":
                return apply_plan(v, plan.perm_plan)
            if tag == "place":
                return apply_plan(v, plan.place_plan)
            if tag == "collect":
                return apply_plan(v, plan.collect_plan)
            return v

        return jax.lax.fori_loop(0, K, body, v0)

    def timeit(fn, *a):
        _force(fn(*a))
        best = []
        for _ in range(3):
            t0 = time.perf_counter()
            _force(fn(*a))
            best.append(time.perf_counter() - t0)
        return sorted(best)[1] / K * 1e3

    with jax.enable_x64(False):
        for tag in ["spmv_plus_first", "spmv_max_first", "spmv_min_plus", "spmv_plus_times"]:
            out[tag] = timeit(chain, plan, x, tag)
            print(tag, round(out[tag], 3), flush=True)
        for tag in ["scan_add", "scan_max", "scan_fill", "contrib_add", "contrib_max", "permute", "place", "collect"]:
            out[tag] = timeit(echain, plan, xe, tag)
            print(tag, round(out[tag], 3), flush=True)

    print(json.dumps({k: round(v, 3) for k, v in out.items()}, indent=1))


if __name__ == "__main__":
    main()
