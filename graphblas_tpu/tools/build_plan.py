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
    plan = build_spmv_plan(src, dst, w, n=g.n)
    save_spmv_plan(plan, args.out)
    if args.graph_out:
        np.savez(args.graph_out, src=src, dst=dst, w=w, n=np.asarray([g.n]))
    print(f"plan saved: n={plan.n} e_pad={plan.e_pad} stages={plan.perm_plan}")


if __name__ == "__main__":
    main()
