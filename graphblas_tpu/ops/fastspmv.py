"""Permutation-network SpMV: O(E) semiring mxv without XLA gather/scatter.

The pipeline (all static-shape, all fast TPU primitives):

    expand:   x (n,) -> x[src] in src-sorted edge order
              = place x at CSR boundaries (scatter of n elements, ~90 M/s is
              fine at n-size) + segmented forward-fill (streaming Pallas scan)
    multiply: per-edge semiring multiply with the edge weights
    permute:  src-sorted order -> dst-sorted order via a PermutePlan
              (lane-shuffle/transpose network, ~5 G elem/s per stage)
    reduce:   segmented reduce by dst = inclusive scan + boundary pick
              (plus: cumsum + diff; min/max: segmented scan + ends)

Plans and layouts are built once per graph (the pattern analysis step —
the analogue of SuiteSparse choosing Gustavson/hash/dot per matrix) and
reused every iteration.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..native import counting_sort
from .permute import PermutePlan, apply_plan, build_permutation_plan, padded_size


class SpmvPlan:
    """Static layout + routing for y = A^T-style pulls over a fixed graph.

    Computes, for x over sources: y[d] = REDUCE_{edges (s -> d)} x[s] (*) w.
    Registered as a pytree: arrays travel as jit arguments.
    """

    def __init__(
        self,
        n,
        e_pad,
        src_sorted,
        w_dst_order,
        indptr_src,
        indptr_dst,
        perm_plan,
        valid_dst_order,
        src_dst_order=None,
    ):
        self.n = n
        self.e_pad = e_pad
        self.src_sorted = src_sorted  # device: src of each edge in src-sorted order (int32)
        self.w_dst_order = w_dst_order  # device: weights in dst-sorted order (or None)
        self.indptr_src = indptr_src  # device (n+1,) int32: src segment boundaries
        self.indptr_dst = indptr_dst  # device (n+1,) int32: dst segment boundaries
        self.perm_plan = perm_plan  # PermutePlan: src-order -> dst-order
        self.valid_dst_order = valid_dst_order  # device bool: real edge (in dst order)
        # static src ids (f32) in dst order: the positional-mul channel
        # (secondi/firstj contributions are the src vertex id — no expand needed)
        self.src_dst_order = src_dst_order


def _register_spmv_pytree():
    from jax.tree_util import register_pytree_node

    def flatten(p):
        children = (
            p.src_sorted,
            p.w_dst_order,
            p.indptr_src,
            p.indptr_dst,
            p.perm_plan,
            p.valid_dst_order,
            p.src_dst_order,
        )
        return children, (p.n, p.e_pad)

    def unflatten(aux, children):
        return SpmvPlan(aux[0], aux[1], *children)

    register_pytree_node(SpmvPlan, flatten, unflatten)


_register_spmv_pytree()


def build_spmv_plan(src, dst, w=None, *, n=None):
    """Analyze a COO graph into an SpmvPlan (host-side, once per graph)."""
    src = np.asarray(src, np.int32)
    dst = np.asarray(dst, np.int32)
    e = len(src)
    if n is None:
        n = int(max(src.max(initial=-1), dst.max(initial=-1))) + 1
    e_pad = padded_size(e)
    # pad with edges (n-1 -> n-1) marked invalid; they sort to the end-ish but
    # validity masks them out of the reduce
    pad = e_pad - e
    src_p = np.concatenate([src, np.full(pad, n - 1, np.int32)])
    dst_p = np.concatenate([dst, np.full(pad, n - 1, np.int32)])
    valid_p = np.zeros(e_pad, bool)
    valid_p[:e] = True
    w_p = None
    if w is not None:
        w_p = np.concatenate([np.asarray(w, np.float32), np.zeros(pad, np.float32)])

    order_src = counting_sort(src_p, n)  # src-sorted edge ids
    order_dst = counting_sort(dst_p, n)  # dst-sorted edge ids
    # permutation: dst-order position p draws from src-order position q:
    # contrib_dst[p] = contrib_src[rank_src[order_dst[p]]]
    rank_src = np.empty(e_pad, np.int64)
    rank_src[order_src] = np.arange(e_pad)
    middle_perm = rank_src[order_dst]
    perm_plan = build_permutation_plan(middle_perm, validate=False)

    src_sorted = src_p[order_src]
    counts_src = np.bincount(src_p, minlength=n)
    indptr_src = np.concatenate([[0], np.cumsum(counts_src)]).astype(np.int32)
    counts_dst = np.bincount(dst_p, minlength=n)
    indptr_dst = np.concatenate([[0], np.cumsum(counts_dst)]).astype(np.int32)

    return SpmvPlan(
        n,
        e_pad,
        jnp.asarray(src_sorted),
        jnp.asarray(w_p[order_dst]) if w_p is not None else None,
        jnp.asarray(indptr_src),
        jnp.asarray(indptr_dst),
        perm_plan,
        jnp.asarray(valid_p[order_dst]),
        jnp.asarray(src_p[order_dst].astype(np.float32)),
    )


def _interpret_scan():
    return jax.default_backend() != "tpu"


def _expand_src_sorted(x, indptr_src, e_pad):
    """x (n,) -> x[src] for src-sorted edges, with no big gather:
    scatter x at segment starts (nonempty segments only; empties share a
    start slot with the next nonempty segment and must not clobber it),
    then segmented forward-fill (streaming Pallas scan)."""
    from .pallas_scan import segmented_scan

    starts = indptr_src[:-1]
    nonempty = indptr_src[1:] > starts
    idx = jnp.where(nonempty, starts, e_pad)  # out-of-bounds -> dropped
    placed = jnp.zeros(e_pad, x.dtype).at[idx].set(x, mode="drop")
    seg_start = jnp.zeros(e_pad, bool).at[idx].set(True, mode="drop")
    return segmented_scan(placed, seg_start, "fill", interpret=_interpret_scan())


def _segment_reduce_dst(contrib, indptr_dst, kind):
    """Segmented reduce of dst-sorted contributions -> y (n,)."""
    from .pallas_scan import segmented_scan

    ends = indptr_dst[1:]
    starts = indptr_dst[:-1]
    # segmented inclusive scan (resets at segment starts), then pick at ends.
    # Used for plus as well: a global cumsum+diff loses float precision to
    # cancellation; the segmented scan only accumulates within a segment.
    e_pad = contrib.shape[0]
    seg_start = jnp.zeros(e_pad, bool).at[starts].set(True)
    op = {"plus": "add", "min": "min", "max": "max"}[kind]
    scanned = segmented_scan(contrib, seg_start, op, interpret=_interpret_scan())
    ident = _ident_of(contrib.dtype, kind)
    padded = jnp.concatenate([jnp.full((1,), ident, contrib.dtype), scanned])
    out = padded[ends]  # value at last slot of each segment (ends are 1-past)
    empty = starts == ends
    return jnp.where(empty, ident, out)


def _ident_of(dtype, kind):
    if kind == "plus":
        return np.zeros((), dtype)[()]
    if np.issubdtype(np.dtype(dtype), np.floating):
        return np.asarray(np.inf if kind == "min" else -np.inf, dtype)[()]
    info = np.iinfo(np.dtype(dtype))
    return np.asarray(info.max if kind == "min" else info.min, dtype)[()]


def save_spmv_plan(plan, path):
    """Serialize an SpmvPlan (host-side plan cache; the pattern-analysis
    result is reusable across processes)."""
    arrays = {
        "src_sorted": np.asarray(plan.src_sorted),
        "indptr_src": np.asarray(plan.indptr_src),
        "indptr_dst": np.asarray(plan.indptr_dst),
        "valid_dst_order": np.asarray(plan.valid_dst_order),
        "meta": np.asarray([plan.n, plan.e_pad], np.int64),
    }
    if plan.w_dst_order is not None:
        arrays["w_dst_order"] = np.asarray(plan.w_dst_order)
    if plan.src_dst_order is not None:
        arrays["src_dst_order"] = np.asarray(plan.src_dst_order)
    kinds = []
    for i, s in enumerate(plan.perm_plan.stages):
        if s[0] == "S":
            kinds.append("S")
            arrays[f"stage{i}"] = np.asarray(s[1])
        elif s[0] == "T":
            kinds.append(f"T{s[1]}")
        else:
            kinds.append(f"R{s[2]}")
            arrays[f"stage{i}"] = np.asarray(s[1])
    arrays["kinds"] = np.asarray(kinds)
    np.savez(path, **arrays)


def load_spmv_plan(path):
    import jax.numpy as jnp

    data = np.load(path, allow_pickle=False)
    n, e_pad = (int(v) for v in data["meta"])
    stages = []
    for i, kind in enumerate(data["kinds"]):
        kind = str(kind)
        if kind == "S":
            stages.append(("S", jnp.asarray(data[f"stage{i}"])))
        elif kind.startswith("T"):
            stages.append(("T", int(kind[1:])))
        else:
            stages.append(("ROWSEL", jnp.asarray(data[f"stage{i}"]), int(kind[1:])))
    perm_plan = PermutePlan(e_pad, stages)
    return SpmvPlan(
        n,
        e_pad,
        jnp.asarray(data["src_sorted"]),
        jnp.asarray(data["w_dst_order"]) if "w_dst_order" in data else None,
        jnp.asarray(data["indptr_src"]),
        jnp.asarray(data["indptr_dst"]),
        perm_plan,
        jnp.asarray(data["valid_dst_order"]),
        jnp.asarray(data["src_dst_order"]) if "src_dst_order" in data else None,
    )


def _no_x64(fn):
    """Trace with x64 off: the fast-path kernels are a strictly 32-bit domain
    (Mosaic rejects i64), regardless of the global jax_enable_x64 setting."""
    import functools as _ft

    @_ft.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.enable_x64(False):
            return fn(*args, **kwargs)

    return wrapper


@functools.partial(jax.jit, static_argnames=("add", "mul", "x_full"))
@_no_x64
def spmv_masked(plan: SpmvPlan, x, xs, add="plus", mul="times", x_full=False):
    """DSL-exact SpMV: like ``spmv`` but honors x's structure and returns
    (values, struct).

    y[d] = ADD over edges (s->d) with x[s] PRESENT of contrib; y has an entry
    at d iff at least one such edge exists (GraphBLAS semantics — reference
    GrB_mxv, core/matrix.py:2203).  The x-structure rides the same
    expand/permute network as the values (an extra f32 channel) unless
    ``x_full`` says it is statically all-present.  ``mul`` additionally
    supports "secondi" (positional: contribution = src vertex id, a static
    per-plan channel — the any_secondi parent-BFS semiring).
    """
    from .pallas_scan import segmented_scan, segmented_scan_contrib

    interp = _interpret_scan()
    ends = plan.indptr_dst[1:]
    starts = plan.indptr_dst[:-1]
    seg_start = jnp.zeros(plan.e_pad, bool).at[starts].set(True)
    op = {"plus": "add", "min": "min", "max": "max", "any": "max"}[add]

    if x_full:
        validc = plan.valid_dst_order
    else:
        xse = _expand_src_sorted(xs.astype(jnp.float32), plan.indptr_src, plan.e_pad)
        validc = plan.valid_dst_order & (apply_plan(xse, plan.perm_plan) > 0.5)

    if mul == "secondi":
        xe_dst = plan.src_dst_order
        w = None
        chan_mul = "first"
    else:
        xe = _expand_src_sorted(x, plan.indptr_src, plan.e_pad)
        xe_dst = apply_plan(xe, plan.perm_plan)
        w = plan.w_dst_order if mul in ("times", "plus", "second") else None
        chan_mul = mul
    scanned = segmented_scan_contrib(xe_dst, w, validc, seg_start, op, chan_mul, interpret=interp)
    ident = _ident_of(scanned.dtype, "max" if add == "any" else add)
    padded = jnp.concatenate([jnp.full((1,), ident, scanned.dtype), scanned])
    yv = padded[ends]

    # structure channel: any valid contribution per segment
    cnt = segmented_scan(validc.astype(jnp.float32), seg_start, "add", interpret=interp)
    cpad = jnp.concatenate([jnp.zeros((1,), jnp.float32), cnt])
    ys = (cpad[ends] > 0) & (starts != ends)
    return jnp.where(ys, yv, jnp.zeros((), yv.dtype)), ys


@functools.partial(jax.jit, static_argnames=("add", "mul"))
@_no_x64
def spmv(plan: SpmvPlan, x, add="plus", mul="times"):
    """y[d] = ADD over edges (s->d) of (x[s] MUL w).  add in {plus,min,max};
    mul in {times,plus,first,second}.  Absent/invalid edges contribute the
    ADD identity.  The per-edge multiply + validity mask + segmented reduce
    scan run as ONE fused Pallas kernel."""
    from .pallas_scan import segmented_scan_contrib

    xe = _expand_src_sorted(x, plan.indptr_src, plan.e_pad)
    xe_dst = apply_plan(xe, plan.perm_plan)
    w = plan.w_dst_order if mul in ("times", "plus", "second") else None
    ends = plan.indptr_dst[1:]
    starts = plan.indptr_dst[:-1]
    seg_start = jnp.zeros(plan.e_pad, bool).at[starts].set(True)
    op = {"plus": "add", "min": "min", "max": "max"}[add]
    scanned = segmented_scan_contrib(
        xe_dst, w, plan.valid_dst_order, seg_start, op, mul, interpret=_interpret_scan()
    )
    ident = _ident_of(scanned.dtype, add)
    padded = jnp.concatenate([jnp.full((1,), ident, scanned.dtype), scanned])
    out = padded[ends]
    return jnp.where(starts == ends, ident, out)
