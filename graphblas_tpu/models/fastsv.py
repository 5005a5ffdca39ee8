"""Connected components — FastSV.

Reference recipe: notebooks/Connected Components -- FastSV.ipynb (min_second
mxv + assign/extract hot loop).  The hooking step's scatter-min is a
``.at[].min`` scatter; the whole loop is one compiled ``lax.while_loop``.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import edgewise as _ew
from .graph import Graph


@functools.partial(jax.jit, static_argnames=("n",))
def _fastsv_loop(src, dst, valid, n):
    f0 = jnp.arange(n, dtype=jnp.int32)
    big = jnp.int32(n)

    def cond(state):
        _, changed, it = state
        return changed & (it < n)

    def body(state):
        f, _, it = state
        gp = f[f]  # grandparents
        # mngp[j] = min over edges (i->j) of gp[i]  (min_second mxv)
        mngp = jnp.minimum(
            _ew.spmv_min_second(src, dst, valid, gp, n, big=big),
            _ew.spmv_min_second(dst, src, valid, gp, n, big=big),  # symmetrize
        )
        mngp = jnp.minimum(mngp, gp)
        # hooking: f[f[j]] = min(f[f[j]], mngp[j])  (scatter-min assign)
        f1 = f.at[f].min(mngp)
        # shortcut: f = f[f]
        f2 = jnp.minimum(f1[f1], f1)
        changed = (f2 != f).any()
        return f2, changed, it + 1

    f, _, _ = jax.lax.while_loop(cond, body, (f0, jnp.asarray(True), jnp.int32(0)))
    # final full shortcut to fixed point
    def short_cond(state):
        f, changed = state
        return changed

    def short_body(state):
        f, _ = state
        nf = f[f]
        return nf, (nf != f).any()

    f, _ = jax.lax.while_loop(short_cond, short_body, (f, jnp.asarray(True)))
    return f


def connected_components(graph, *, as_vector=False):
    """Component label (minimum node id in component) per node."""
    if not isinstance(graph, Graph):
        graph = Graph.from_matrix(graph)
    f = _fastsv_loop(graph.src, graph.dst, graph.valid, graph.n)
    if as_vector:
        from ..core import dtypes as _dt
        from ..core.vector import Vector

        it = _dt.default_int()
        return Vector._from_arrays(f.astype(it.np_type), jnp.ones((graph.n,), bool), it)
    return f
