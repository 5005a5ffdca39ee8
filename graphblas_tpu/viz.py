"""Visualization helpers (reference: /root/reference/graphblas/viz.py).

``draw`` (networkx layout), ``spy`` (matplotlib sparsity plot), ``datashade``
(gated on datashader availability).
"""

import numpy as np


def _get_imports(names, within):
    import importlib

    out = []
    for name in names.split():
        try:
            out.append(importlib.import_module(name))
        except ImportError:
            raise ImportError(f"`{name}` is required for {within}") from None
    return out if len(out) > 1 else out[0]


def draw(m, **kwargs):
    """Draw a Matrix as a directed graph (reference: viz.py:45)."""
    nx = _get_imports("networkx", "draw")
    plt = _get_imports("matplotlib.pyplot", "draw")

    from .io import to_networkx

    g = to_networkx(m)
    pos = nx.spring_layout(g)
    edge_labels = {(i, j): d["weight"] for i, j, d in g.edges(data=True)}
    nx.draw_networkx(g, pos, node_color="red", node_size=500, **kwargs)
    nx.draw_networkx_edge_labels(g, pos, edge_labels=edge_labels)
    return g


def spy(m, *, show=True, **kwargs):
    """Plot the sparsity pattern (reference: viz.py:68)."""
    plt = _get_imports("matplotlib.pyplot", "spy")
    from .io import to_scipy_sparse

    s = to_scipy_sparse(m, "coo")
    fig, ax = plt.subplots()
    ax.spy(s, **kwargs)
    if show:
        plt.show()
    return ax


def datashade(m, agg="count", *, width=None, height=None, **kwargs):
    """Interactive datashader plot (reference: viz.py:106); optional dep."""
    _get_imports("datashader", "datashade")
    raise NotImplementedError(
        "datashade requires datashader/hvplot, which are not available in this build"
    )
