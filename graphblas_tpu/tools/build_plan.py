"""CLI: build an SpmvPlan for an RMAT graph and save it.

Run in a CLEAN environment (no TPU plugin attached): the tunnel environment
serializes host CPU heavily (see CLAUDE.md), so the pattern-analysis step runs
in a subprocess spawned by bench.py with the plugin env stripped.

Usage:
    python -m graphblas_tpu.tools.build_plan --scale 18 --ef 16 --seed 5 --out plan.npz
"""

import argparse
import os
import sys


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--scale", type=int, required=True)
    parser.add_argument("--ef", type=int, default=16)
    parser.add_argument("--seed", type=int, default=5)
    parser.add_argument("--out", required=True)
    parser.add_argument("--graph-out", default=None, help="also save the COO arrays")
    parser.add_argument(
        "--dsl-cache",
        default=None,
        help="also build the DSL Matrix plans (pagerank/sssp/cc) into this "
        "plan-cache dir + save their canonical COOs next to --graph-out",
    )
    args = parser.parse_args()

    # force CPU: this tool must run without the TPU tunnel attached
    os.environ["JAX_PLATFORMS"] = "cpu"
    import numpy as np

    from graphblas_tpu.models.graph import rmat
    from graphblas_tpu.ops.fastspmv import build_spmv_plan, save_spmv_plan

    g = rmat(args.scale, args.ef, seed=args.seed, weighted=True)
    valid = np.asarray(g.valid)
    src = np.asarray(g.src)[valid]
    dst = np.asarray(g.dst)[valid]
    w = np.asarray(g.weights)[valid]
    if os.path.exists(args.out):
        print(f"model plan exists, skipping: {args.out}")
    else:
        plan = build_spmv_plan(src, dst, w, n=g.n)
        save_spmv_plan(plan, args.out)
        print(f"plan saved: n={plan.n} e_pad={plan.e_pad} stages={plan.perm_plan}")
    if args.graph_out:
        np.savez(args.graph_out, src=src, dst=dst, w=w, n=np.asarray([g.n]))

    if args.dsl_cache:
        _build_dsl_plans(src, dst, w, g.n, args.dsl_cache, args.graph_out)


def _build_dsl_plans(src, dst, w, n, cache_dir, graph_out):
    """Build the DSL matrices' pull plans into the on-disk plan cache and
    save their canonical COO arrays (bench.py reconstructs the same
    Matrix objects without re-sorting and the plan() content hash hits)."""
    import time

    import numpy as np

    os.environ["GRAPHBLAS_TPU_PLAN_CACHE"] = cache_dir
    os.makedirs(cache_dir, exist_ok=True)
    import graphblas_tpu as gb
    from graphblas_tpu import binary
    from graphblas_tpu.core import dtypes as dtm
    from graphblas_tpu.core.matrix import Matrix
    from graphblas_tpu.tx import config as txconfig

    arrays = {}
    with txconfig.set(dense_limit=0):
        t0 = time.perf_counter()
        # pagerank/bfs matrix: AT[dst, src]; duplicate edges fold into the
        # value (plus) so plus_times pagerank matches the raw multigraph
        AT = Matrix.from_coo(dst, src, np.ones(len(src), np.float32), dtm.FP32, nrows=n, ncols=n, dup_op=binary.plus)
        AT._sparse.plan("pull", loop=True)
        arrays.update(pr_rows=AT._sparse.rows, pr_cols=AT._sparse.cols, pr_vals=AT._sparse.vals)
        print(f"dsl pagerank plan: {time.perf_counter() - t0:.1f}s nvals={AT._sparse.nvals}")

        t0 = time.perf_counter()
        # sssp matrix: weighted, duplicates fold with min (equivalent relax)
        ATw = Matrix.from_coo(dst, src, w.astype(np.float32), dtm.FP32, nrows=n, ncols=n, dup_op=binary.min)
        ATw._sparse.plan("pull", loop=True)
        arrays.update(ss_rows=ATw._sparse.rows, ss_cols=ATw._sparse.cols, ss_vals=ATw._sparse.vals)
        print(f"dsl sssp plan: {time.perf_counter() - t0:.1f}s nvals={ATw._sparse.nvals}")

        t0 = time.perf_counter()
        # cc runs alternating pull/push min-label on the DIRECTED pagerank
        # matrix (models/dsl.connected_components) — build its push plan;
        # the symmetrized COO is saved only for the bench's workload-size
        # accounting (no 2^24-e_pad plan needed anymore)
        AT._sparse.plan("push", loop=True)
        print(f"dsl cc (pagerank push) plan: {time.perf_counter() - t0:.1f}s")
        us = np.concatenate([src, dst])
        vs = np.concatenate([dst, src])
        ATs = Matrix.from_coo(vs, us, np.ones(len(us), np.float32), dtm.FP32, nrows=n, ncols=n, dup_op=binary.first)
        arrays.update(cc_rows=ATs._sparse.rows, cc_cols=ATs._sparse.cols, cc_vals=ATs._sparse.vals)

    out = (graph_out or "graph.npz").replace(".npz", "_dsl.npz")
    np.savez(out, n=np.asarray([n]), **arrays)
    print(f"dsl COOs saved: {out}")
    # marker consumed by bench.py: which plan set this cache contains
    with open(os.path.join(cache_dir, "plans_v3.done"), "w") as fh:
        fh.write("loopT pull:pr,ss + loopT push:pr\n")


if __name__ == "__main__":
    main()
