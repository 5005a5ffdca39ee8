"""Static permutation engine: arbitrary E-element permutations at near-memory-
bandwidth on TPU.

XLA's general gather/scatter runs at ~65M elem/s on TPU — useless for
edge-order data movement.  The hardware IS fast at two regular movements:
per-row 128-lane shuffles (``tpu.dynamic_gather``, ~5 G/s measured) and tile
transposes (~5.7 G/s).  This module realizes ANY static permutation as a
Clos/Benes-style network of those primitives:

    [S T]*L  S ROWSEL S  [T S]*L

where S = per-row lane shuffle (routing tables from a 128-edge-coloring of a
bipartite multigraph — computed by the native router,
graphblas_tpu/native/router.cpp), T = digit-swap transpose, and ROWSEL = a
small m-way row exchange.  For N = m * 128^(L+1) elements the network has
2L+3 shuffle stages and 2L transposes.

The plan is built once per (graph, layout) on the host and reused every
iteration — the analogue of SuiteSparse analyzing a sparse pattern once and
reusing the factorization.
"""

import functools

import numpy as np

from ..native import euler_color, euler_color_batched


class PermutePlan:
    """A compiled route: apply with ``apply_plan``.  Stages:
    ("S", idx[R,128] int32) | ("T", level) | ("ROWSEL", src_top[m,128^L,128] int32, m)

    Registered as a JAX pytree so routing tables travel as device arguments
    (not embedded HLO constants) when a plan is closed over under ``jit``.
    """

    def __init__(self, n, stages):
        self.n = n
        self.stages = stages

    def __repr__(self):
        kinds = "".join(s[0][0] for s in self.stages)
        return f"PermutePlan(n={self.n}, stages={kinds})"

    def tree_flatten(self):
        children = []
        aux = [self.n]
        for s in self.stages:
            if s[0] == "S":
                children.append(s[1])
                aux.append(("S",))
            elif s[0] == "T":
                aux.append(("T", s[1]))
            else:
                children.append(s[1])
                aux.append((s[0], s[2]))
        return children, tuple(aux)

    @classmethod
    def tree_unflatten(cls, aux, children):
        n = aux[0]
        stages = []
        it = iter(children)
        for item in aux[1:]:
            if item[0] == "S":
                stages.append(("S", next(it)))
            elif item[0] == "T":
                stages.append(("T", item[1]))
            else:
                stages.append((item[0], next(it), item[1]))
        return cls(n, stages)


def _register_plan_pytree():
    from jax.tree_util import register_pytree_node

    register_pytree_node(
        PermutePlan,
        lambda p: p.tree_flatten(),
        lambda aux, children: PermutePlan.tree_unflatten(aux, children),
    )


_register_plan_pytree()


def _rowsel_shuffle_enabled():
    import os

    return os.environ.get("GRAPHBLAS_TPU_ROWSEL_SHUFFLE") == "1"


def _rsel_kernel_enabled():
    """Single-pass Pallas RSEL (opt-in via GRAPHBLAS_TPU_RSEL_KERNEL=1).

    Measured NEUTRAL vs the XLA m-way select at m=4 and m=8 on v5e (XLA
    already fuses the where chain into ~2 HBM passes), so the default stays
    the r4-verified XLA path."""
    import os

    return os.environ.get("GRAPHBLAS_TPU_RSEL_KERNEL", "0") == "1"


def _s_alias_enabled():
    """In-place S stages (opt-in via GRAPHBLAS_TPU_S_ALIAS=1): alias the
    value operand to the kernel output (input_output_aliases={0: 0}).  Safe
    because each grid block's rows are fully loaded to VMEM before the
    store and the shuffle is row-local.  Probe for the e_pad=2^24 in-context
    cost cliff (CLAUDE.md round-5): halves the live-buffer footprint of
    every network stage inside a compiled loop."""
    import os

    return os.environ.get("GRAPHBLAS_TPU_S_ALIAS", "0") == "1"


def padded_size(e):
    """Smallest admissible network size >= e.  Admissible: rows r = m * 128^L
    with 1 <= m <= 128, size = r * 128."""
    r0 = max(1, -(-e // 128))
    L = 0
    while 128 ** (L + 1) < r0:
        L += 1
    m = -(-r0 // (128**L))
    return m * (128**L) * 128


def _shape_params(n):
    r = n // 128
    L = 0
    m = r
    while m > 128:
        if m % 128:
            raise ValueError(f"{n} is not an admissible network size; use padded_size")
        m //= 128
        L += 1
    return r, m, L


def _t_slotmap(n, level):
    """The (self-inverse) slot permutation of transpose stage T_level."""
    M = 128**level
    q = n // (128 * M * 128)
    p = np.arange(n)
    b = p % 128
    mm = (p // 128) % M
    a = (p // (128 * M)) % 128
    qq = p // (128 * M * 128)
    return ((qq * 128 + b) * M + mm) * 128 + a


def _apply_S_np(elem, idx):
    r = idx.shape[0]
    e2 = elem.reshape(r, 128)
    return np.take_along_axis(e2, idx.astype(np.int32), axis=1).reshape(-1)


def _apply_T_np(elem, n, level):
    M = 128**level
    q = n // (128 * M * 128)
    return (
        elem.reshape(q, 128, M, 128).transpose(0, 3, 2, 1).reshape(-1)
    )


def _rowsel_table(src_top, m):
    """Lane-shuffle table realizing a ROWSEL (m-way row exchange) in the
    axis-rotated layout.

    ROWSEL moves whole 128-lane rows between the m top-digit groups:
    out[g, s, l] = x[st[g, s, l], s, l].  Rotating the array to (s, l, m)
    puts the m-axis on lanes (m | 128), where the exchange becomes a
    per-row 128-lane shuffle — the network's fast primitive — bounded at
    3 passes TOTAL (rotate, shuffle, rotate back) instead of the m+1
    passes of an m-way select.  Returns the (n//128, 128) int8 table.
    """
    st = np.asarray(src_top)
    m_, s2, _ = st.shape
    assert m_ == m
    n = m * s2 * 128
    rows = n // 128
    r = np.arange(rows, dtype=np.int64)[:, None]
    p = np.arange(128, dtype=np.int64)[None, :]
    flat = r * 128 + p
    s_ix = flat // (128 * m)
    rem = flat % (128 * m)
    l_ix = rem // m
    g_ix = rem % m
    lane = (p // m) * m + st[g_ix, s_ix, l_ix]
    return lane.astype(np.int8)


def _rowsel_unshuffle(shuf, m):
    """Invert ``_rowsel_table``: recover the (m, s2, 128) src_top select
    table from a saved lane-shuffle table (r3 plan-cache compat)."""
    shuf = np.asarray(shuf)
    rows = shuf.shape[0]
    n = rows * 128
    s2 = n // (128 * m)
    r = np.arange(rows, dtype=np.int64)[:, None]
    p = np.arange(128, dtype=np.int64)[None, :]
    flat = r * 128 + p
    s_ix = flat // (128 * m)
    rem = flat % (128 * m)
    l_ix = rem // m
    g_ix = rem % m
    st = np.empty((m, s2, 128), np.int32)
    st[g_ix, s_ix, l_ix] = shuf.astype(np.int64) - (p // m) * m
    return st


def _apply_RSEL_np(elem, src_top, m):
    s2 = src_top.shape[1]
    e3 = elem.reshape(m, s2, 128)
    return np.take_along_axis(e3, src_top.astype(np.int64), axis=0).reshape(-1)


def _apply_ROWSEL_np(elem, shuf, m):
    """Numpy application of the rotated-layout ROWSEL shuffle table."""
    n = elem.shape[0]
    s2 = n // (128 * m)
    t = np.ascontiguousarray(elem.reshape(m, s2, 128).transpose(1, 2, 0)).reshape(-1, 128)
    t = np.take_along_axis(t, shuf.astype(np.int64), axis=1)
    return np.ascontiguousarray(t.reshape(s2, 128, m).transpose(2, 0, 1)).reshape(-1)


def plan_to_device(plan):
    """Commit a plan's routing tables to the device.  A freshly built plan
    holds numpy tables; passing it as a jit ARGUMENT would re-upload them on
    every call (over a remote tunnel that dwarfs the compute)."""
    import jax.numpy as jnp

    stages = []
    for s in plan.stages:
        if s[0] == "S":
            stages.append(("S", jnp.asarray(s[1])))
        elif s[0] == "T":
            stages.append(s)
        else:
            stages.append((s[0], jnp.asarray(s[1]), s[2]))
    return PermutePlan(plan.n, stages)


def _euler_color_strided(out_row, r, stride):
    """128-edge-coloring for a forward S-stage at level > 0: both endpoints of
    every edge agree mod ``stride`` (out_row = hi * stride + cur_row % stride),
    so the problem decomposes into ``stride`` INDEPENDENT colorings of
    r//stride rows each — small enough to stay cache-resident, where the
    Euler-split walk runs ~20x faster than at full size.  cur_row is the
    static slot//128 pattern.  Returns colors in slot order."""
    E = len(out_row)
    rs = r // stride
    # slot order is row-major; rows cycle groups with period ``stride`` —
    # group-major regrouping is a pure reshape/transpose
    out_g = (
        np.ascontiguousarray(
            out_row.reshape(rs, stride, 128).transpose(1, 0, 2)
        ).reshape(-1)
        // stride
    ).astype(np.int32)
    in_local = np.repeat(np.arange(rs, dtype=np.int32), 128)
    seglen = rs * 128
    colors_g = euler_color_batched(in_local, out_g, seglen, rs)
    return np.ascontiguousarray(
        colors_g.reshape(stride, rs, 128).transpose(1, 0, 2)
    ).reshape(-1)


def build_permutation_plan(perm, *, validate=True):
    """Build a network plan computing out[p] = in[perm[p]].

    ``perm`` must be a true permutation of an admissible size (use
    ``padded_size`` + identity-extend to pad).
    """
    perm = np.asarray(perm, np.int64)
    n = len(perm)
    r, m, L = _shape_params(n)
    if n < (1 << 31) and not _rowsel_shuffle_enabled():
        # fused native build (one pass per level per side instead of ~8
        # numpy full-array passes; colorings run inline) — same stages,
        # verified in-kernel (routing collisions and a final elem==perm
        # check fail the call)
        from ..native import build_network

        built = build_network(perm, L, m)
        if built is not None:
            s_tables, rsel = built
            stages = []
            for lvl in range(L + 1):
                stages.append(("S", s_tables[lvl]))
                if lvl < L:
                    stages.append(("T", lvl))
                else:
                    stages.append(("RSEL", rsel, m))
            stages.append(("S", s_tables[L + 1]))
            for lvl in range(L - 1, -1, -1):
                stages.append(("T", lvl))
                stages.append(("S", s_tables[L + 1 + (L - lvl)]))
            return PermutePlan(n, stages)
    idt = np.int32 if n < (1 << 31) else np.int64
    # target slot per element (element id = source slot)
    t = np.empty(n, idt)
    t[perm] = np.arange(n, dtype=idt)
    elem = np.arange(n, dtype=idt)
    stages = []
    slots = np.arange(n, dtype=idt)
    lanes_all = slots % 128
    rows_all = slots // 128

    # ---- forward: S_pre (+ T) per level; base ROWSEL -----------------------
    for lvl in range(L + 1):
        stride = 128**lvl
        te = t[elem]
        cur_row = rows_all
        out_row = (te // (128 ** (lvl + 1))) * stride + cur_row % stride
        if stride > 1:
            colors = _euler_color_strided(out_row, r, stride)
        else:
            colors = euler_color(cur_row.astype(np.int32), out_row.astype(np.int32), r, 128)
        idx = np.full((r, 128), -1, np.int16)
        idx[cur_row, colors] = lanes_all.astype(np.int16)
        if validate and (idx < 0).any():
            raise AssertionError("invalid coloring: lane collision")
        idx = idx.astype(np.int8)  # lanes < 128: int8 tables = 4x less traffic
        stages.append(("S", idx))
        elem = _apply_S_np(elem, idx)
        if lvl < L:
            stages.append(("T", lvl))
            elem = _apply_T_np(elem, n, lvl)
        else:
            te = t[elem]
            dest_row = (te // (128 ** (lvl + 1))) * stride + rows_all % stride
            src = np.full((r, 128), -1, np.int32)
            src[dest_row, lanes_all] = rows_all.astype(np.int32)
            if validate and (src < 0).any():
                raise AssertionError("invalid routing: row collision in ROWSEL")
            # rows differ only in top digit: m-way row select (RSEL).
            # MEASURED (v5e, scale 19, m=4): the r3 rotate+lane-shuffle
            # ROWSEL form is 18.5x SLOWER than this select (7.02 vs 0.38
            # ms/apply) — XLA lowers the (m,s2,128)<->(s2,128,m) relayouts
            # around the shuffle as full HBM passes with m-wide minor axes.
            # The shuffle form stays available for experiments behind
            # GRAPHBLAS_TPU_ROWSEL_SHUFFLE=1.
            src_top = (src // stride).reshape(m, stride, 128).astype(np.int32)
            if _rowsel_shuffle_enabled() and 128 % m == 0:
                shuf = _rowsel_table(src_top, m)
                stages.append(("ROWSEL", shuf, m))
                elem = _apply_ROWSEL_np(elem, shuf, m)
            else:
                stages.append(("RSEL", src_top, m))
                elem = _apply_RSEL_np(elem, src_top, m)

    # ---- backward: S_post fixes the level's lane digit; T's unwind ----------
    # S_post at level lvl routes each element to lane (t // 128^lvl) % 128;
    # the forward routing guarantees it is already in the right row.
    back = [("S_post", L)]
    for lvl in range(L - 1, -1, -1):
        back.append(("T", lvl))
        back.append(("S_post", lvl))
    for stage in back:
        if stage[0] == "T":
            stages.append(("T", stage[1]))
            elem = _apply_T_np(elem, n, stage[1])
        else:
            lvl = stage[1]
            req_lane = (t[elem] // (128**lvl)) % 128
            idx = np.full((r, 128), -1, np.int16)
            idx[rows_all, req_lane] = lanes_all.astype(np.int16)
            if validate and (idx < 0).any():
                raise AssertionError(f"invalid S_post table at level {lvl}")
            idx = idx.astype(np.int8)
            stages.append(("S", idx))
            elem = _apply_S_np(elem, idx)

    if validate and not np.array_equal(elem, perm):
        raise AssertionError("permutation plan does not reproduce the permutation")
    return PermutePlan(n, stages)


# ---------------------------------------------------------------------------
# Runtime application
# ---------------------------------------------------------------------------


def _use_pallas():
    import jax

    return jax.default_backend() == "tpu"


_S_BLK = 4096

# S∘T fusion measured SLOWER on v5e (6.0 ms vs 1.6 ms for the 11-stage
# permute at 4.2M): Mosaic lowers the in-kernel (128, mc, 128) axes-0<->2
# transpose poorly.  Kept for future Mosaic versions / the megakernel work.
_FUSE_ST = False


def _pallas_shuffle(x2d, idx, post=None, aux2d=(), scalars=()):
    """Per-row 128-lane shuffle via tpu.dynamic_gather (~5 G elem/s).

    ``post(out, aux_blocks, scalar_vals)`` optionally runs elementwise on the
    shuffled block INSIDE the kernel (slot-aligned ``aux2d`` arrays ride VMEM
    blocks, ``scalars`` ride SMEM): fusing the x_start selects of the loop
    algorithms here deletes 2-3 full HBM passes per iteration (~10% of a
    PageRank/SSSP round at scale 19)."""
    import jax
    import jax.experimental.pallas as pl
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    r = x2d.shape[0]
    blk = min(_S_BLK, r)
    if r % blk:
        blk = r  # fall back to single block for odd sizes
    n_aux = len(aux2d)
    n_s = len(scalars)

    def kernel(x_ref, i_ref, *rest):
        aux_refs = rest[:n_aux]
        s_refs = rest[n_aux : n_aux + n_s]
        o_ref = rest[-1]
        # keep indices int32 even when jax_enable_x64 is on (Mosaic is 32-bit);
        # tables arrive int8 (4x less HBM traffic) and upcast in VMEM.
        # 8-bit VALUE channels (BFS frontiers) also ride HBM as int8 and are
        # gathered as int32 in VMEM (dynamic_gather int8 support is partial).
        with jax.enable_x64(False):
            x = x_ref[:]
            io_dtype = x.dtype
            if io_dtype.itemsize == 1:
                x = x.astype(jnp.int32)
            out = jnp.take_along_axis(x, i_ref[:].astype(jnp.int32), axis=1)
            out = out.astype(io_dtype)
            if post is not None:
                out = post(out, tuple(a[:] for a in aux_refs), tuple(s[0, 0] for s in s_refs))
            o_ref[:] = out

    vspec = pl.BlockSpec((blk, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    out_dtype = x2d.dtype
    if post is not None:
        # dtype probe: use the FLAT (1-D) branch of ``post`` — the kernel
        # branch may call pl.program_id, which only traces inside a grid
        out_dtype = jax.eval_shape(
            lambda x, a, s: post(x, a, s),
            jax.ShapeDtypeStruct((blk * 128,), x2d.dtype),
            tuple(jax.ShapeDtypeStruct((blk * 128,), a.dtype) for a in aux2d),
            tuple(jax.ShapeDtypeStruct((), jnp.asarray(s).dtype) for s in scalars),
        ).dtype
    alias = {0: 0} if (_s_alias_enabled() and out_dtype == x2d.dtype) else {}
    return pl.pallas_call(
        kernel,
        grid=(r // blk,),
        in_specs=[vspec, vspec] + [vspec] * n_aux + [sspec] * n_s,
        out_specs=vspec,
        out_shape=jax.ShapeDtypeStruct(x2d.shape, out_dtype),
        input_output_aliases=alias,
    )(x2d, idx, *aux2d, *(jnp.asarray(s).reshape(1, 1) for s in scalars))


def _pallas_shuffle_then_t(x, idx, level, n):
    """Fused S∘T stage: per-row lane shuffle, then the level's digit-swap
    transpose applied in-VMEM with block-aligned output (one HBM pass
    instead of two).  Bricks are (128, mc, 128) slices of the (Q, 128, M,
    128) view; the transpose swaps axes 0<->2 within the brick."""
    import jax
    import jax.experimental.pallas as pl
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    M = 128**level
    Q = n // (128 * M * 128)
    mc = min(M, 16)  # (128, mc, 128) f32 x3 buffers ~ 3 MB at mc=16
    x4 = x.reshape(Q, 128, M, 128)
    i4 = idx.reshape(Q, 128, M, 128)

    def kernel(x_ref, i_ref, o_ref):
        with jax.enable_x64(False):
            # Mosaic's dynamic_gather is 2D-only: flatten (128, mc) rows
            s2 = jnp.take_along_axis(
                x_ref[0].reshape(128 * mc, 128), i_ref[0].reshape(128 * mc, 128), axis=1
            )
        o_ref[0] = jnp.transpose(s2.reshape(128, mc, 128), (2, 1, 0))

    spec = pl.BlockSpec((1, 128, mc, 128), lambda qq, m: (qq, 0, m, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(Q, M // mc),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((Q, 128, M, 128), x.dtype),
    )(x4, i4)
    return out.reshape(-1)


def _pallas_rsel(x3, st, m):
    """Single-pass m-way row select: out[g, s, l] = x[st[g, s, l], s, l].

    The XLA lowering (m chained selects) streams the x block m+1 times; at
    scale 20 the m=8 RSEL is the stage that makes per-edge cost grow 1.4x
    over scale 19 (CLAUDE.md).  Here one kernel invocation reads ALL m group
    rows of an s2-block into VMEM once and emits all m outputs: ~2 HBM
    passes + table, independent of m."""
    import jax
    import jax.experimental.pallas as pl
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    s2 = x3.shape[1]
    # block the s2 axis; keep m resident (m <= 128, typically 4-16)
    blk = max(1, min(s2, _S_BLK // m))
    while s2 % blk:
        blk -= 1

    def kernel(x_ref, t_ref, o_ref):
        with jax.enable_x64(False):
            x = x_ref[:]  # (m, blk, 128)
            t = t_ref[:]
            out = x[0][None]
            for j in range(1, m):
                out = jnp.where(t == j, x[j][None], out)
            o_ref[:] = out.astype(x.dtype)

    spec = pl.BlockSpec((m, blk, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(s2 // blk,),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(x3.shape, x3.dtype),
    )(x3, st)


def apply_plan(x, plan, *, pallas=None, postlude=None, post_aux=(), post_scalars=()):
    """Apply a PermutePlan to a flat device array (out[p] = in[perm[p]]).
    Adjacent S-then-T stages run as one fused Pallas pass.

    ``postlude(y, aux, scalars)`` is an elementwise epilogue on the permuted
    result (``aux`` are flat arrays slot-aligned with the OUTPUT).  When the
    final stage is a Pallas lane shuffle it runs inside that kernel (zero
    extra HBM passes); otherwise it runs as plain jnp afterwards."""
    import jax.numpy as jnp

    if pallas is None:
        pallas = _use_pallas()
    n = plan.n
    stages = list(plan.stages)
    i = 0
    fused_post = False
    while i < len(stages):
        stage = stages[i]
        kind = stage[0]
        last = i == len(stages) - 1
        if kind == "S":
            idx = jnp.asarray(stage[1])
            if (
                _FUSE_ST
                and pallas
                and i + 1 < len(stages)
                and stages[i + 1][0] == "T"
                and 128 ** stages[i + 1][1] <= 1 << 14
            ):
                x = _pallas_shuffle_then_t(x, idx, stages[i + 1][1], n)
                i += 2
                continue
            x2d = x.reshape(n // 128, 128)
            if pallas:
                if last and postlude is not None:
                    aux2d = tuple(jnp.asarray(a).reshape(n // 128, 128) for a in post_aux)
                    x = _pallas_shuffle(
                        x2d, idx, post=postlude, aux2d=aux2d, scalars=post_scalars
                    ).reshape(-1)
                    fused_post = True
                else:
                    x = _pallas_shuffle(x2d, idx).reshape(-1)
            else:
                x = jnp.take_along_axis(x2d, idx.astype(jnp.int32), axis=1).reshape(-1)
        elif kind == "T":
            level = stage[1]
            M = 128**level
            q = n // (128 * M * 128)
            x = x.reshape(q, 128, M, 128).transpose(0, 3, 2, 1).reshape(-1)
        elif kind == "RSEL":  # m-way row select (m does not divide 128)
            src_top, m = stage[1], stage[2]
            s2 = src_top.shape[1]
            x3 = x.reshape(m, s2, 128)
            st = jnp.asarray(src_top)
            if pallas and 1 < m <= 32 and _rsel_kernel_enabled():
                x = _pallas_rsel(x3, st.astype(jnp.int32), m).reshape(-1)
            elif m <= 16:
                acc = jnp.zeros((m, s2, 128), x.dtype)
                for j in range(m):
                    acc = jnp.where(st == j, x3[j][None, :, :], acc)
                x = acc.reshape(-1)
            else:
                x = jnp.take_along_axis(x3, st.astype(jnp.int32), axis=0).reshape(-1)
        else:  # ROWSEL: rotate m onto lanes, per-row shuffle, rotate back
            shuf, m = stage[1], stage[2]
            if m > 1:
                s2 = n // (128 * m)
                t = x.reshape(m, s2, 128).transpose(1, 2, 0).reshape(-1, 128)
                idx = jnp.asarray(shuf)
                if pallas:
                    t = _pallas_shuffle(t, idx)
                else:
                    t = jnp.take_along_axis(t, idx.astype(jnp.int32), axis=1)
                x = t.reshape(s2, 128, m).transpose(2, 0, 1).reshape(-1)
        i += 1
    if postlude is not None and not fused_post:
        x = postlude(
            x,
            tuple(jnp.asarray(a) for a in post_aux),
            tuple(jnp.asarray(s).reshape(()) for s in post_scalars),
        )
    return x
