"""Text/HTML reprs for collections.

Reference: /root/reference/graphblas/core/formatting.py (pandas-backed
truncated grids).  The header format follows the reference:
"<name>  nvals  nrows x ncols  dtype  format".
"""

import numpy as np

_MAX_DISPLAY = 32


def _grid_dataframe(obj, max_rows=_MAX_DISPLAY, max_cols=_MAX_DISPLAY):
    try:
        import pandas as pd
    except ImportError:
        return None
    if isinstance(obj._values, dict):
        # UDT: render per-element field tuples
        fields = list(obj._values)
        leaves = {f: np.asarray(a) for f, a in obj._values.items()}
        v = np.empty(obj._struct.shape, object)
        it = np.nditer(np.asarray(obj._struct), flags=["multi_index"])
        for _ in it:
            idx = it.multi_index
            v[idx] = tuple(leaves[f][idx] for f in fields)
    else:
        v = np.asarray(obj._values)
    s = np.asarray(obj._struct)
    if obj.ndim == 1:
        v = v[None, :]
        s = s[None, :]
    nrows, ncols = v.shape
    rs = slice(0, min(nrows, max_rows))
    cs = slice(0, min(ncols, max_cols))
    data = [
        [v[i, j] if s[i, j] else "" for j in range(cs.stop)]
        for i in range(rs.stop)
    ]
    df = pd.DataFrame(data, index=list(range(rs.stop)), columns=list(range(cs.stop)))
    return df


def format_scalar(sc):
    header = f'"{sc.name}"' if sc.name else "gb.Scalar"
    value = sc.value if not sc.is_empty else ""
    return (
        f"{header}\n"
        f"value: {value}\n"
        f"dtype: {sc.dtype}"
        + ("" if not sc.is_empty else "  (empty)")
    )


def format_vector(v):
    name = f'"{v.name}"' if v.name else "gb.Vector"
    header = f"{name}  nvals: {v.nvals}  size: {v.size}  dtype: {v.dtype}  format: densemasked"
    df = _grid_dataframe(v)
    if df is None or v.size > _MAX_DISPLAY:
        idx, vals = v.to_coo()
        n = min(len(idx), 10)
        entries = ", ".join(f"{i}: {val}" for i, val in zip(idx[:n].tolist(), vals[:n].tolist()))
        more = "" if len(idx) <= n else f", ... ({len(idx) - n} more)"
        return f"{header}\n{{{entries}{more}}}"
    return f"{header}\n{df.to_string()}"


def format_matrix(m, title=None):
    name = f'"{m.name}"' if m.name else (title or "gb.Matrix")
    header = f"{name}  nvals: {m.nvals}  nrows: {m.nrows}  ncols: {m.ncols}  dtype: {m.dtype}  format: densemasked"
    df = _grid_dataframe(m)
    if df is None or m.nrows > _MAX_DISPLAY or m.ncols > _MAX_DISPLAY:
        r, c, vals = m.to_coo()
        n = min(len(r), 10)
        entries = ", ".join(
            f"({i}, {j}): {val}" for i, j, val in zip(r[:n].tolist(), c[:n].tolist(), vals[:n].tolist())
        )
        more = "" if len(r) <= n else f", ... ({len(r) - n} more)"
        return f"{header}\n{{{entries}{more}}}"
    return f"{header}\n{df.to_string()}"


def format_vector_html(v):
    df = _grid_dataframe(v)
    body = df.to_html() if df is not None else ""
    return f"<div><tt>{format_vector(v).splitlines()[0]}</tt>{body}</div>"


def format_matrix_html(m):
    df = _grid_dataframe(m)
    body = df.to_html() if df is not None else ""
    return f"<div><tt>{format_matrix(m).splitlines()[0]}</tt>{body}</div>"
