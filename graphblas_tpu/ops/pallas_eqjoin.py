"""Pallas eq-join kernel: the masked-SpGEMM dot-method inner loop.

Each task intersects two W-long sorted key segments (a row chunk of A and a
column chunk of B) under a semiring: out[t] = ADD over (k, l) with
ak[k, t] == bk[l, t] of MUL(av[k, t], bv[l, t]), plus the match count.

Layout is tasks-on-lanes: arrays are (W, T) so a (W, blk) tile fills the
128-lane vregs with independent tasks and the W x W key comparison becomes W
fully-vectorized (W, blk) passes — the XLA formulation ((T, W, W) eq tensor
via lax.map) pads W=32 lanes 4x and runs ~100x under the VPU roofline.

Padding convention (from the analyzer): missing A keys are -1, missing B keys
are -2, so pad slots never match.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

_BLK = 512  # default tasks per tile (lane dim; multiple of 512)

# Per-(Wa, Wb) task-tile widths, swept on v5e (plus_times, warm, >1.5x wins
# only — pairs not listed measured within noise of 512).  Narrow-W tiles
# need wider task blocks to fill the VPU lanes (same lesson as the tropical
# mxm's wide-N tiles).
_BLK_TABLE = {
    (4, 16): 4096,
    (4, 64): 1024,
    (4, 256): 2048,
    (64, 16): 1024,
    (64, 64): 2048,
    (64, 256): 2048,
    (256, 16): 1024,
    (256, 64): 1024,
}


def task_tile(Wa, Wb):
    """Swept task-tile width for a (Wa, Wb) bucket."""
    return _BLK_TABLE.get((int(Wa), int(Wb)), _BLK)

_ADD_OPS = frozenset({"plus", "min", "max", "any", "lor", "land", "times"})
_MUL_OPS = frozenset({"pair", "times", "plus", "first", "second"})


def supported(add_name, mul_name):
    return add_name in _ADD_OPS and mul_name in _MUL_OPS


def _acc_init(add):
    return {
        "plus": 0.0,
        "lor": 0.0,
        "min": np.inf,
        "max": -np.inf,
        "any": -np.inf,
        "times": 1.0,
        "land": 1.0,
    }[add]


def _kernel(add, mul, Wa, Wb, blk, ak_ref, av_ref, bk_ref, bv_ref, o_ref, nm_ref):
    import jax.experimental.pallas as pl

    f32 = jnp.float32
    ak = ak_ref[:, :]  # (Wa, blk) int32
    av = av_ref[:, :] if av_ref is not None else None

    ident = jnp.asarray(_acc_init(add), f32)

    def body(l, carry):
        acc, nm = carry
        bkl = bk_ref[pl.ds(l, 1), :]  # (1, blk): B key l, all tasks
        eq = ak == bkl
        if mul == "pair":
            prod = jnp.ones((), f32)
        elif bv_ref is None:
            prod = av
        else:
            bvl = bv_ref[pl.ds(l, 1), :]
            if mul == "times":
                prod = av * bvl
            elif mul == "plus":
                prod = av + bvl
            elif mul == "first":
                prod = av
            else:  # second
                prod = jnp.broadcast_to(bvl, ak.shape)
        if add == "plus":
            acc = acc + jnp.where(eq, prod, jnp.zeros((), f32))
        elif add == "min":
            acc = jnp.where(eq, jnp.minimum(acc, prod), acc)
        elif add in ("max", "any"):
            acc = jnp.where(eq, jnp.maximum(acc, prod), acc)
        elif add == "times":
            acc = jnp.where(eq, acc * prod, acc)
        elif add == "lor":
            acc = jnp.where(eq & (prod != 0), jnp.ones((), f32), acc)
        else:  # land
            acc = jnp.where(eq, acc * jnp.where(prod != 0, jnp.ones((), f32), jnp.zeros((), f32)), acc)
        nm = nm + eq.astype(jnp.int32)
        return acc, nm

    acc0 = jnp.full((Wa, blk), ident, f32)
    nm0 = jnp.zeros((Wa, blk), jnp.int32)
    acc, nm = jax.lax.fori_loop(0, Wb, body, (acc0, nm0))
    nm_tot = jnp.sum(nm, axis=0, keepdims=True)
    hit = nm > 0
    if add == "plus":
        val = jnp.sum(acc, axis=0, keepdims=True)
    elif add == "min":
        val = jnp.min(jnp.where(hit, acc, jnp.asarray(np.inf, f32)), axis=0, keepdims=True)
    elif add in ("max", "any"):
        val = jnp.max(jnp.where(hit, acc, jnp.asarray(-np.inf, f32)), axis=0, keepdims=True)
    elif add in ("times", "land"):
        val = jnp.prod(jnp.where(hit, acc, jnp.ones((), f32)), axis=0, keepdims=True)
    else:  # lor
        val = jnp.max(jnp.where(hit, acc, jnp.zeros((), f32)), axis=0, keepdims=True)
    o_ref[:, :] = jnp.where(nm_tot > 0, val, jnp.zeros((), f32))
    nm_ref[:, :] = nm_tot


@functools.partial(jax.jit, static_argnames=("add", "mul", "interpret"))
def eqjoin(akT, avT, bkT, bvT, add, mul, interpret=False):
    """Batched sorted-segment intersection under a semiring.

    akT/bkT: (Wa, T) / (Wb, T) int32 key tiles (pad: -1 / -2); avT/bvT:
    matching f32 values (may be None when ``mul`` ignores them).  Tiles may be
    rectangular (Wa != Wb) — the work is Wa*Wb*T, so skewed list pairs (a hub
    row against a short column) cost what they should, not max(W)^2.  T must
    be a multiple of 512.  Returns (vals (T,) f32, nmatch (T,) int32).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Wa, T = akT.shape
    Wb = bkT.shape[0]
    blk = min(task_tile(Wa, Wb), T)
    assert T % blk == 0, "task count must be padded to the tile size"
    aspec = pl.BlockSpec((Wa, blk), lambda i: (0, i), memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((Wb, blk), lambda i: (0, i), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, blk), lambda i: (0, i), memory_space=pltpu.VMEM)
    use_av = mul in ("times", "plus", "first", "second")
    use_bv = mul in ("times", "plus", "second")
    # argument order: ak, [av], bk, [bv]
    args = [akT] + ([avT] if use_av else []) + [bkT] + ([bvT] if use_bv else [])
    in_specs = [aspec] * (1 + use_av) + [bspec] * (1 + use_bv)

    def kernel(*refs):
        o_ref, nm_ref = refs[-2], refs[-1]
        it = iter(refs[:-2])
        ak_ref = next(it)
        av_ref = next(it) if use_av else None
        bk_ref = next(it)
        bv_ref = next(it) if use_bv else None
        _kernel(add, mul, Wa, Wb, blk, ak_ref, av_ref, bk_ref, bv_ref, o_ref, nm_ref)

    vals, nm = pl.pallas_call(
        kernel,
        grid=(T // blk,),
        in_specs=in_specs,
        out_specs=[out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((1, T), jnp.float32),
            jax.ShapeDtypeStruct((1, T), jnp.int32),
        ],
        interpret=interpret,
    )(*args)
    return vals.reshape(-1), nm.reshape(-1)
