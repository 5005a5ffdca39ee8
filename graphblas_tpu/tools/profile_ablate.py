"""Ablation profile: marginal cost of each SpMV stage inside the real pipeline."""

import json
import os
import tempfile
import time
import functools


def main():
    import graphblas_tpu

    graphblas_tpu.config.set(enable_x64=False)
    graphblas_tpu._init(automatic=True)
    import jax
    import jax.numpy as jnp

    from graphblas_tpu.ops import fastspmv as fs
    from graphblas_tpu.ops.pallas_scan import segmented_scan, segmented_scan_contrib
    from graphblas_tpu.ops.permute import apply_plan

    plan = fs.load_spmv_plan(os.path.join(tempfile.gettempdir(), "gbtpu_plan_v3_s19_e16_5.npz"))
    n, e_pad = plan.n, plan.e_pad
    K = 10

    @functools.partial(jax.jit, static_argnames=("mode",))
    def pipe(plan, x0, mode):
        def spmv_ablate(x):
            pad = e_pad - n
            x_emb = jnp.concatenate([x, jnp.zeros((pad,), x.dtype)]) if pad else x
            v = x_emb
            if "place" in mode:
                v = apply_plan(v, plan.place_plan)
            if "fill" in mode:
                v = segmented_scan(v, plan.seg_start_src, "fill")
            if "main" in mode:
                v = apply_plan(v, plan.perm_plan)
            if "contrib" in mode:
                v = segmented_scan_contrib(
                    v, None, plan.valid_dst_order, plan.seg_start_dst, "add", "first"
                )
            if "collect" in mode:
                v = apply_plan(v, plan.collect_plan)
            return jnp.where(plan.dst_nonempty, v[:n], jnp.float32(0))

        return jax.lax.fori_loop(0, K, lambda i, x: spmv_ablate(x), x0)

    def force(x):
        return float(jnp.sum(x))

    x = jnp.ones((n,), jnp.float32)
    modes = [
        "place-fill-main-contrib-collect",
        "fill-main-contrib-collect",
        "place-main-contrib-collect",
        "place-fill-contrib-collect",
        "place-fill-main-collect",
        "place-fill-main-contrib",
        "place",
        "fill",
        "contrib",
        "none",
    ]
    out = {}
    with jax.enable_x64(False):
        for mode in modes:
            force(pipe(plan, x, mode))
            best = []
            for _ in range(3):
                t0 = time.perf_counter()
                force(pipe(plan, x, mode))
                best.append(time.perf_counter() - t0)
            out[mode] = sorted(best)[1] / K * 1e3
            print(mode, round(out[mode], 3), flush=True)
    print(json.dumps({k: round(v, 3) for k, v in out.items()}, indent=1))


if __name__ == "__main__":
    main()
