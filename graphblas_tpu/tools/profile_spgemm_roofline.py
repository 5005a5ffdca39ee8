"""Masked-SpGEMM roofline probe (VERDICT r4 #6): is 3.9 GF/s compare-bound?

Builds the bench's exact TC workload (clustered cliques, csize=64, ns=2^16),
then measures on the TPU:

  1. full sparse_spgemm_execute time (bench-style, floor-subtracted)
  2. eq-join kernel time per width bucket  -> achieved key-compares/s
  3. an empirical VPU ceiling: a compute-bound Pallas FMA kernel (K unrolled
     mul+add per element in VMEM)  -> elementwise ops/s the chip can sustain
  4. the combine path (reduce networks + segmented scan) alone

Host-side it counts, per bucket: padded tasks T, compares = Wa*Wb*T, and the
useful flops (2 * matches, the bench's accounting).  The writeup formula:

  GF_useful/s  =  (compares/s achieved) * (useful flops / compare)

The second factor is a *workload property* (intersection density); if the
first factor is at the VPU ceiling, the masked dot-method SpGEMM is
provably compare-bound and the only lever is fewer compares (the brick/MXU
peel, which this probe also times).

    python -m graphblas_tpu.tools.profile_spgemm_roofline
"""

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

    from graphblas_tpu import Matrix, binary, semiring
    from graphblas_tpu import tx as txmod
    from graphblas_tpu.core import dtypes as dtmod
    from graphblas_tpu.core.operator import get_typed_op
    from graphblas_tpu.core.sparse import sparse_spgemm_analyze, sparse_spgemm_execute
    from graphblas_tpu.ops.pallas_eqjoin import eqjoin

    def force(x):
        return float(jnp.sum(jnp.asarray(x).astype(jnp.float32)))

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

    def timeit(fn, reps=5):
        force(fn())  # warm
        force(fn())
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn()
        force(r)
        return max((time.perf_counter() - t0 - floor) / reps, 1e-9)

    # ---- the bench's TC workload --------------------------------------
    rng_l = np.random.default_rng(7)
    ns = 1 << 16
    csize = 64
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
        L = Matrix.from_coo(
            hi[keep], lo[keep], np.float32(1.0), dtmod.FP32, nrows=ns, ncols=ns, dup_op=binary.first
        )
        U = L.T.new()
    sr = get_typed_op(semiring.plus_pair, dtmod.FP32, dtmod.FP32, kind="semiring")
    lsp, usp = L._sparse, U._sparse
    plan = sparse_spgemm_analyze(lsp, usp, lsp.rows, lsp.cols, bricks=True, reduce_net=True)
    log("mask_nnz", int(lsp.nvals))
    log("n_entries", int(plan.n_entries))

    # ---- host bucket stats --------------------------------------------
    total_cmp = 0
    for b in plan.buckets:
        (Wa, Wb) = b[0]
        T = int(b[3].shape[0]) if b[3].ndim == 2 else int(b[3].shape[1])
        # tasks-on-lanes layout: akT is (Wa, T) after transpose — detect
        shp = b[3].shape
        T = int(shp[1]) if shp[0] in (Wa,) else int(shp[0])
        cmp_b = Wa * Wb * T
        total_cmp += cmp_b
        log(f"bucket[{Wa}x{Wb}] T", T)
    if plan.brick is not None:
        bi = plan.brick
        # brick path: count the batched 128x128x128 matmul MACs
        try:
            nb = int(bi[0].shape[0])
            log("bricks", nb)
            total_brick_mac = nb * 128 * 128 * 128
            log("brick_mac", total_brick_mac)
        except Exception:
            pass
    log("total_key_compares", total_cmp)

    # ---- 1. full execute ------------------------------------------------
    def run_full():
        acc, hit, fl = sparse_spgemm_execute(plan, sr, dtmod.FP32, keep_on_device=True)
        return acc

    acc, hit, fl = sparse_spgemm_execute(plan, sr, dtmod.FP32, keep_on_device=True)
    useful = 2 * int(fl)
    log("useful_flops", useful)
    t_full = timeit(run_full)
    log("full_ms", t_full * 1e3)
    log("gflops", useful / t_full / 1e9)
    log("achieved_Gcmp_per_s", total_cmp / t_full / 1e9)
    log("useful_per_compare", useful / max(total_cmp, 1))

    # ---- 2. eqjoin alone per bucket -------------------------------------
    t_eq_sum = 0.0
    for b in plan.buckets:
        (Wa, Wb) = b[0]
        akT, avT, bkT, bvT = b[3], b[4], b[5], b[6]

        def f(akT=akT, bkT=bkT):
            return eqjoin(akT, None, bkT, None, add="plus", mul="pair")[0]

        jf = jax.jit(f)
        t = timeit(lambda: jf())
        t_eq_sum += t
        shp = akT.shape
        T = int(shp[1]) if shp[0] == Wa else int(shp[0])
        log(f"eqjoin[{Wa}x{Wb}] ms", t * 1e3)
        log(f"eqjoin[{Wa}x{Wb}] Gcmp/s", Wa * Wb * T / t / 1e9)
    log("eqjoin_total_ms", t_eq_sum * 1e3)

    # ---- 3. empirical VPU ceiling ---------------------------------------
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, K = 1 << 14, 64  # R rows of 128 lanes, K fused compare+adds each

    def vpu_kernel(a_ref, b_ref, o_ref):
        a = a_ref[:]
        b = b_ref[:]
        acc = jnp.zeros_like(a)
        for i in range(K):
            acc = acc + jnp.where(a == b + np.float32(i), np.float32(1), np.float32(0))
        o_ref[:] = acc

    blk = 512
    vspec = pl.BlockSpec((blk, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    a = jnp.ones((R, 128), jnp.float32)
    barr = jnp.zeros((R, 128), jnp.float32)
    vf = jax.jit(
        lambda a, b: pl.pallas_call(
            vpu_kernel,
            grid=(R // blk,),
            in_specs=[vspec, vspec],
            out_specs=vspec,
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
        )(a, b)
    )
    t = timeit(lambda: vf(a, barr))
    ceiling = R * 128 * K / t
    log("vpu_compare_ceiling_Gcmp_per_s", ceiling / 1e9)

    # implied GF/s if eqjoin ran AT the ceiling and everything else was free
    log(
        "gflops_ceiling_at_vpu_peak",
        (useful / max(total_cmp, 1)) * ceiling / 1e9,
    )

    print(json.dumps(OUT, indent=1), flush=True)


if __name__ == "__main__":
    main()
