"""Round-5 cliff bisect #2 (TPU, exclusive): is the e_pad=2^24 in-context
network cost a POWER-OF-2 aliasing effect rather than bandwidth?

Builds single permutation networks at m in {7, 8, 9} (L=2; sizes 14.7M,
16.8M=2^24, 18.9M) and measures the fori-loop slope per apply.  If m=9
(12.5% MORE data than 2^24) is materially cheaper per apply than m=8, the
cliff is address aliasing and the fix is to skip m=8 padding.

    python -m graphblas_tpu.tools.profile_r5e
"""

import functools
import json
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

    from graphblas_tpu.ops import permute as pm

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

    rng = np.random.default_rng(42)
    for m in (4, 7, 8, 9):
        n = m * 128 * 128 * 128
        t0 = time.perf_counter()
        perm = rng.permutation(n)
        net = pm.build_permutation_plan(perm, validate=False)
        log(f"build_s[m={m}]", time.perf_counter() - t0)

        @functools.partial(jax.jit, static_argnames=("K",))
        def run(x, K, _net=net):
            return jax.lax.fori_loop(0, K, lambda i, v: pm.apply_plan(v, _net), x)

        ms = slope_ms(run, jnp.ones((n,), jnp.float32))
        log(f"perm_slope_ms[m={m}]", ms)
        log(f"per_elem_ns[m={m}]", ms * 1e6 / n * 1e3)  # ps/elem actually: ns*1000
        del net

    print(json.dumps(OUT, indent=1), flush=True)


if __name__ == "__main__":
    main()
