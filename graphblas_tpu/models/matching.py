"""Maximal matching — parallel local-max (Luby-style) rounds, one XLA program.

Reference recipe: the LAGraph-style maximal matching the reference's
algorithm suite models (SURVEY.md §6): give every edge a random priority; an
edge joins the matching when it holds the maximum priority among all edges
incident to both endpoints; matched vertices drop out; repeat to fixpoint.
Each round is two O(E) scatter-max passes + elementwise masks, so the whole
loop is a single ``lax.while_loop`` over the padded edge arrays.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .graph import Graph


@functools.partial(jax.jit, static_argnames=("n",))
def _matching_loop(src, dst, valid, prio, n):
    e = src.shape[0]
    matched0 = jnp.full((e,), False)
    used0 = jnp.zeros((n,), bool)
    live0 = valid & (src != dst)

    def cond(state):
        _, _, live = state
        return live.any()

    def body(state):
        matched, used, live = state
        p = jnp.where(live, prio, -jnp.inf)
        vmax = jnp.full((n,), -jnp.inf).at[src].max(p).at[dst].max(p)
        win = live & (p == vmax[src]) & (p == vmax[dst])
        matched = matched | win
        used = used.at[jnp.where(win, src, n)].set(True, mode="drop")
        used = used.at[jnp.where(win, dst, n)].set(True, mode="drop")
        live = live & ~used[src] & ~used[dst]
        return matched, used, live

    matched, used, _ = jax.lax.while_loop(cond, body, (matched0, used0, live0))
    return matched, used


def maximal_matching(graph, *, seed=0):
    """Maximal (not maximum) matching of the undirected view of ``graph``.

    Returns a boolean mask over the graph's padded edge arrays: True where
    that edge is in the matching.  Every vertex appears in at most one
    matched edge, and no unmatched edge has both endpoints free (maximality).
    ``seed`` picks the random edge priorities; ties are broken by edge index
    so priorities are strictly ordered.
    """
    if not isinstance(graph, Graph):
        graph = Graph.from_matrix(graph)
    e = int(np.asarray(graph.src).shape[0])
    rng = np.random.default_rng(seed)
    # random strict total order on edges (permutation -> no ties)
    prio = rng.permutation(e).astype(np.float32)
    matched, _ = _matching_loop(
        graph.src, graph.dst, graph.valid, jnp.asarray(prio), graph.n
    )
    return matched
