"""Pallas TPU kernels for tropical-family semiring matmul.

The MXU only multiplies-and-adds, so plus_times-family semirings lower to
``jnp.matmul`` (ops/densemasked._mxm_fast_path).  The tropical family
(min_plus, max_plus, min_max, max_min) has no MXU form — this module provides
a blocked VPU kernel: grid over (M/TM, N/TN, K/TK) with the k axis multiplied
into VMEM-resident (TM, CK, TN) broadcast blocks and reduced with the add
monoid, output block accumulated across k grid steps.

Absence is encoded by value: the add-monoid identity annihilates the multiply
for these (add, mul) pairs (inf + x = inf; inf is the min identity), so the
kernel runs on "filled" value arrays with no separate structure operand —
structure comes from one int8 MXU matmul outside the kernel.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

# (add, mul) -> fill value factory (the add identity, which annihilates mul)
_TROPICAL = {
    ("min", "plus"): np.inf,
    ("max", "plus"): -np.inf,
    ("min", "max"): np.inf,
    ("max", "min"): -np.inf,
}

_TM = 128
_TN = 2048  # wide N tiles keep the (CK, TM, TN) broadcast lane-parallel:
#             swept on v5e at 2048^3: TN 128 -> 0.41 Top/s, 512 -> 1.6,
#             1024 -> 2.9, 2048 -> 3.1 (CK=16); shapes below _TN use one
#             N block of the padded width
_TK = 512  # k-extent per grid step
_CK = 16  # k-extent per VMEM broadcast block


def is_tropical(add_name, mul_name, np_dtype):
    return (add_name, mul_name) in _TROPICAL and np.issubdtype(np_dtype, np.floating)


def _kernel(add_name, mul_name, nk_chunks, at_ref, b_ref, o_ref):
    import jax.experimental.pallas as pl

    add_fn = jnp.minimum if add_name == "min" else jnp.maximum
    if mul_name == "plus":
        mul_fn = lambda x, y: x + y  # noqa: E731
    elif mul_name == "max":
        mul_fn = jnp.maximum
    else:
        mul_fn = jnp.minimum
    fill = _TROPICAL[(add_name, mul_name)]

    @pl.when(pl.program_id(2) == 0)
    def _():
        o_ref[:, :] = jnp.full_like(o_ref, fill)

    def body(kk, acc):
        # k-slices are sublane slices on both operands (A is passed transposed)
        at = at_ref[pl.ds(kk * _CK, _CK), :]  # (CK, TM)
        b = b_ref[pl.ds(kk * _CK, _CK), :]  # (CK, TN)
        part = mul_fn(at[:, :, None], b[:, None, :])  # (CK, TM, TN)
        red = jnp.min(part, axis=0) if add_name == "min" else jnp.max(part, axis=0)
        return add_fn(acc, red)

    # int32 loop bounds: under enable_x64 a default fori_loop index is i64,
    # which Mosaic rejects when it reaches the pl.ds offset arithmetic
    acc = jax.lax.fori_loop(jnp.int32(0), jnp.int32(nk_chunks), body, o_ref[:, :])
    o_ref[:, :] = acc


@functools.partial(jax.jit, static_argnames=("add_name", "mul_name", "interpret"))
def tropical_mxm_filled(a_filled, b_filled, add_name, mul_name, interpret=False):
    """Blocked tropical matmul on filled (annihilator-encoded) f32 arrays.

    a: (M, K), b: (K, N) — padded internally to tile multiples with the fill
    value, so any shape works.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    fill = np.float32(_TROPICAL[(add_name, mul_name)])
    m, k = a_filled.shape
    _, n = b_filled.shape
    mp = -(-m // _TM) * _TM
    # N tile: the full (128-padded) width up to _TN, else _TN-multiples
    tn = min(_TN, -(-n // 128) * 128)
    np_ = -(-n // tn) * tn
    kp = -(-k // _TK) * _TK if k > _TK else -(-k // _CK) * _CK
    tk = min(_TK, kp)
    at_p = jnp.pad(
        a_filled.astype(jnp.float32).T, ((0, kp - k), (0, mp - m)), constant_values=fill
    )
    b_p = jnp.pad(b_filled.astype(jnp.float32), ((0, kp - k), (0, np_ - n)), constant_values=fill)

    grid = (mp // _TM, np_ // tn, kp // tk)
    out = pl.pallas_call(
        functools.partial(_kernel, add_name, mul_name, tk // _CK),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tk, _TM), lambda i, j, kk: (kk, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, tn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TM, tn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=(mp * kp + kp * np_ + mp * np_) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(at_p, b_p)
    return out[:m, :n]


def tropical_mxm(av, as_, bv, bs, add_name, mul_name, out_np_dtype, *, interpret=False):
    """Full tropical semiring mxm on (values, struct) pairs.

    Values go through the Pallas kernel on annihilator-filled arrays;
    structure is one int8->int32 MXU matmul.
    """
    fill = np.asarray(_TROPICAL[(add_name, mul_name)], np.float32)
    a_filled = jnp.where(as_, av.astype(jnp.float32), fill)
    b_filled = jnp.where(bs, bv.astype(jnp.float32), fill)
    cv = tropical_mxm_filled(a_filled, b_filled, add_name, mul_name, interpret)
    overlap = jnp.matmul(
        as_.astype(jnp.int8), bs.astype(jnp.int8), preferred_element_type=jnp.int32
    )
    cs = overlap > 0
    cv = jnp.where(cs, cv, jnp.zeros((), cv.dtype)).astype(np.dtype(out_np_dtype))
    return cv, cs
