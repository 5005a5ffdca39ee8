"""PageRank — plus_times mxv + plus reduce + apply, fused into one program.

Reference recipe: notebooks/Pagerank Demo.ipynb (plus_times mxv, plus reduce,
apply).  One compiled ``lax.while_loop``; the per-iteration work is a single
O(E) gather/segment-sum plus O(n) vector ops.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import edgewise as _ew
from .graph import Graph


@functools.partial(jax.jit, static_argnames=("n", "max_iters"))
def _pagerank_loop(src, dst, valid, outdeg, n, damping, tol, max_iters):
    r0 = jnp.full((n,), 1.0 / n, jnp.float32)
    safe_deg = jnp.where(outdeg > 0, outdeg, 1).astype(jnp.float32)
    dangling = outdeg == 0

    def cond(state):
        _, delta, it = state
        return (delta > tol) & (it < max_iters)

    def body(state):
        r, _, it = state
        contrib = r / safe_deg
        # w << A.T.mxv(r / outdeg, plus_times) via segment sum
        pulled = _ew.spmv_plus_first(src, dst, valid, contrib, n)
        dangling_mass = jnp.sum(jnp.where(dangling, r, 0.0))
        new_r = (1.0 - damping) / n + damping * (pulled + dangling_mass / n)
        delta = jnp.sum(jnp.abs(new_r - r))
        return new_r, delta, it + 1

    r, _, iters = jax.lax.while_loop(cond, body, (r0, jnp.float32(jnp.inf), jnp.int32(0)))
    return r, iters


def pagerank(graph, *, damping=0.85, tol=1e-6, max_iters=100, as_vector=False):
    """PageRank scores (sum to 1)."""
    if not isinstance(graph, Graph):
        graph = Graph.from_matrix(graph)
    outdeg = _ew.degrees(graph.src, graph.valid, graph.n)
    r, iters = _pagerank_loop(
        graph.src,
        graph.dst,
        graph.valid,
        outdeg,
        graph.n,
        jnp.float32(damping),
        jnp.float32(tol),
        int(max_iters),
    )
    if as_vector:
        from ..core import dtypes as _dt
        from ..core.vector import Vector

        ft = _dt.default_float()
        return Vector._from_arrays(r.astype(ft.np_type), jnp.ones((graph.n,), bool), ft)
    return r
