"""Core implementation package.

Feature flags mirror the reference core bootstrap
(/root/reference/graphblas/core/__init__.py): the reference gates UDF support
on numba; here UDFs are plain JAX-traceable Python functions, so UDFs are
always supported.
"""

_supports_udfs = True


def _init_jax():
    """Ensure library-level JAX config (x64) is applied before first trace."""
    import graphblas_tpu

    graphblas_tpu._init(automatic=True)
