"""What costs 4ms per fori iteration? Bisect the trivial-body overhead."""

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

    plan = fs.load_spmv_plan(os.path.join(tempfile.gettempdir(), "gbtpu_plan_v3_s19_e16_5.npz"))
    n, e_pad = plan.n, plan.e_pad
    out = {}

    def force(x):
        return float(jnp.sum(x))

    def timeit(jfn, *a, K=10):
        force(jfn(*a))
        best = []
        for _ in range(3):
            t0 = time.perf_counter()
            force(jfn(*a))
            best.append(time.perf_counter() - t0)
        return sorted(best)[1] / K * 1e3

    @functools.partial(jax.jit, static_argnames=("mode", "K"))
    def loop(plan, x0, mode, K):
        def body(i, x):
            if mode == "add_n":
                return x + 1.0
            if mode == "concat_slice":
                v = jnp.concatenate([x, jnp.zeros((e_pad - n,), x.dtype)])
                return v[:n] * 1.000001
            if mode == "where_plan":
                return jnp.where(plan.dst_nonempty, x, jnp.float32(0)) + 1.0
            if mode == "concat_where":
                v = jnp.concatenate([x, jnp.zeros((e_pad - n,), x.dtype)])
                return jnp.where(plan.dst_nonempty, v[:n], jnp.float32(0))
            return x

        return jax.lax.fori_loop(0, K, body, x0)

    x = jnp.ones((n,), jnp.float32)
    with jax.enable_x64(False):
        for mode in ["add_n", "where_plan", "concat_slice", "concat_where"]:
            for K in (10, 40):
                out[f"{mode}_K{K}"] = timeit(loop, plan, x, mode, K, K=K)
                print(f"{mode}_K{K}", round(out[f'{mode}_K{K}'], 3), flush=True)
    print(json.dumps({k: round(v, 3) for k, v in out.items()}, indent=1))


if __name__ == "__main__":
    main()
