"""Root-cause the e_pad=2^24 network cost cliff (CLAUDE.md round-5 findings).

An 11-stage network apply costs ~0.35-0.40 ms at e_pad=2^23 (m=4, L=2) but
~1.4 ms at 2^24 (m=8) — 3.5-4x for 2x data.  This tool measures, per stage
KIND and per size, slope-based per-apply cost (K=8 vs K=32 chains inside one
jit — subtracts the dispatch floor exactly), for:

  - the REAL perm networks of the cached scale-19 (2^23) and cc (2^24) plans
  - synthetic S-only chains (per-row 128-lane Pallas shuffle)
  - synthetic T1 / T2 chains (XLA digit transposes)
  - synthetic RSEL chains at m in {4, 8}

Run (TPU, exclusively — never concurrent with another TPU job):
    python -m graphblas_tpu.tools.profile_cliff
"""

import functools
import json
import os
import tempfile
import time

import numpy as np


def main():
    import graphblas_tpu

    graphblas_tpu.config.set(enable_x64=False)
    graphblas_tpu._init(automatic=True)
    import jax
    import jax.numpy as jnp

    from graphblas_tpu.ops import fastspmv as fs
    from graphblas_tpu.ops import permute as pm

    out = {}

    def force(x):
        return float(jnp.sum(x))

    def slope_ms(jfn, x, K1=8, K2=32, reps=3):
        """Per-apply ms via the two-K slope (kills the dispatch floor)."""

        def best(K):
            force(jfn(x, K))  # warm/compile
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                force(jfn(x, K))
                ts.append(time.perf_counter() - t0)
            return sorted(ts)[reps // 2]

        t1, t2 = best(K1), best(K2)
        return (t2 - t1) / (K2 - K1) * 1e3

    def chain(apply_fn):
        @functools.partial(jax.jit, static_argnames=("K",))
        def run(x, K):
            return jax.lax.fori_loop(0, K, lambda i, v: apply_fn(v), x)

        return run

    rng = np.random.default_rng(7)

    def synth_S(n):
        r = n // 128
        idx = jnp.asarray(
            np.argsort(rng.random((r, 128)), axis=1).astype(np.int8)
        )
        return lambda v: pm._pallas_shuffle(v.reshape(r, 128), idx).reshape(-1)

    def synth_T(n, level):
        M = 128**level
        q = n // (128 * M * 128)
        return lambda v: v.reshape(q, 128, M, 128).transpose(0, 3, 2, 1).reshape(-1)

    def synth_RSEL(n, m):
        s2 = n // (128 * m)
        st = jnp.asarray(rng.integers(0, m, (m, s2, 128)).astype(np.int32))

        def apply(v):
            x3 = v.reshape(m, s2, 128)
            acc = jnp.zeros((m, s2, 128), v.dtype)
            for j in range(m):
                acc = jnp.where(st == j, x3[j][None, :, :], acc)
            return acc.reshape(-1)

        return apply

    with jax.enable_x64(False):
        # -- real plans -------------------------------------------------------
        tmp = tempfile.gettempdir()
        plans = {}
        small = os.path.join(tmp, "gbtpu_plan_v3_s19_e16_5.npz")
        if os.path.exists(small):
            plans["real_2^23"] = fs.load_spmv_plan(small)
        dsl_dir = os.path.join(tmp, "gbtpu_dslplans_s19_e16_5")
        if os.path.isdir(dsl_dir):
            for f in sorted(os.listdir(dsl_dir)):
                p = fs.load_spmv_plan(os.path.join(dsl_dir, f))
                plans[f"real_2^{int(np.log2(p.e_pad))}_{f[-8:-4]}"] = p

        for name, p in plans.items():
            net = p.perm_plan
            stages = "".join(s[0][0] for s in net.stages)
            ms = slope_ms(chain(lambda v, _net=net: pm.apply_plan(v, _net)),
                          jnp.ones((p.e_pad,), jnp.float32))
            out[f"{name}_perm[{stages}]"] = ms
            print(f"{name} e_pad=2^{np.log2(p.e_pad):.0f} perm[{stages}]: {ms:.3f} ms", flush=True)
            # per-stage-kind breakdown of THIS plan's stages
            for i, s in enumerate(net.stages):
                one = pm.PermutePlan(net.n, [s])
                # a single stage is its own inverse only for T; chain anyway —
                # cost is shape-determined, not table-determined
                ms1 = slope_ms(chain(lambda v, _n=one: pm.apply_plan(v, _n)),
                               jnp.ones((p.e_pad,), jnp.float32))
                out[f"{name}_stage{i}_{s[0]}"] = ms1
                print(f"  stage{i} {s[0]}{s[1] if s[0]=='T' else ''}"
                      f"{' m=' + str(s[2]) if len(s) > 2 else ''}: {ms1:.3f} ms", flush=True)

        # -- synthetic sweeps over m ------------------------------------------
        for m in (4, 6, 8):
            n = m * 128 * 128 * 128
            x = jnp.ones((n,), jnp.float32)
            out[f"S_m{m}"] = slope_ms(chain(synth_S(n)), x)
            out[f"T1_m{m}"] = slope_ms(chain(synth_T(n, 1)), x)
            out[f"RSEL_m{m}"] = slope_ms(chain(synth_RSEL(n, m)), x)
            print(f"m={m} (n=2^{np.log2(n):.1f}): S {out[f'S_m{m}']:.3f} "
                  f"T1 {out[f'T1_m{m}']:.3f} RSEL {out[f'RSEL_m{m}']:.3f} ms", flush=True)

    print(json.dumps({k: round(v, 4) for k, v in out.items()}, indent=1))


if __name__ == "__main__":
    main()
