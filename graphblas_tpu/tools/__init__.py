"""Host-side CLI tools and TPU profiling harnesses.

- ``build_plan``: build + cache an SpmvPlan for a graph in a clean
  subprocess (the bench driver's pattern-analysis step).
- ``profile_*``: one-off measurement harnesses used to derive the kernel
  tile choices and the measured numbers quoted in docs/engine.md and
  BENCH_NOTES (run as ``python -m graphblas_tpu.tools.profile_spmv`` with
  the TPU tunnel; never run two TPU processes at once).
"""
