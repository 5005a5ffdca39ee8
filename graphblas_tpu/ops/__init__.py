"""The kernel engine.

This package replaces the SuiteSparse:GraphBLAS C library (reference layer L0,
SURVEY.md §1): every GraphBLAS operation family implemented over static-shape
device arrays.

- ``densemasked``: the reference semantics engine — (values, structure) dense
  pairs, every op family as jit-compiled jnp code.  This is the differential
  oracle and the fallback path (analogue of the reference's
  "suitesparse-vanilla" backend).
- ``lowering``: semiring -> strategy registry choosing MXU matmul forms,
  Pallas kernels, or the generic path.
- ``pallas_mxm`` / ``pallas_spmv``: hand-written TPU kernels for hot
  semirings.
"""
