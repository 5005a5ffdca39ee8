"""Pallas kernel correctness (interpret mode on CPU; compiled on TPU)."""

import numpy as np
import pytest

import graphblas_tpu as gb  # noqa: F401 — engages x64 etc.


@pytest.mark.parametrize(
    "add,mul",
    [("min", "plus"), ("max", "plus"), ("min", "max"), ("max", "min")],
)
def test_tropical_mxm_vs_oracle(rng, add, mul):
    import jax.numpy as jnp

    from graphblas_tpu.ops.pallas_mxm import tropical_mxm

    m, k, n = 48, 72, 33
    av = rng.random((m, k)).astype(np.float32) * 10
    bv = rng.random((k, n)).astype(np.float32) * 10
    as_ = rng.random((m, k)) < 0.4
    bs = rng.random((k, n)) < 0.4
    cv, cs = tropical_mxm(
        jnp.asarray(av), jnp.asarray(as_), jnp.asarray(bv), jnp.asarray(bs), add, mul, np.float32,
        interpret=True,
    )
    fill = np.inf if add == "min" else -np.inf
    af = np.where(as_, av, fill)
    bf = np.where(bs, bv, fill)
    mul_fn = {"plus": np.add, "max": np.maximum, "min": np.minimum}[mul]
    prod = mul_fn(af[:, :, None], bf[None, :, :])
    ref = prod.min(axis=1) if add == "min" else prod.max(axis=1)
    refs = (as_.astype(int) @ bs.astype(int)) > 0
    assert np.array_equal(np.asarray(cs), refs)
    assert np.allclose(np.asarray(cv)[refs], ref[refs], rtol=1e-6)


def test_eqjoin_kernel_vs_numpy(rng):
    """Pallas eq-join (interpret mode) vs a brute-force numpy intersection."""
    import jax.numpy as jnp

    from graphblas_tpu.ops.pallas_eqjoin import eqjoin

    W, T = 16, 512
    ak = rng.integers(0, 40, (W, T)).astype(np.int32)
    bk = rng.integers(0, 40, (W, T)).astype(np.int32)
    # sprinkle pad slots
    ak[rng.random((W, T)) < 0.2] = -1
    bk[rng.random((W, T)) < 0.2] = -2
    av = rng.random((W, T)).astype(np.float32)
    bv = rng.random((W, T)).astype(np.float32)

    for add, mul in [("plus", "times"), ("min", "plus"), ("max", "first"), ("plus", "pair"), ("lor", "pair")]:
        avv = jnp.asarray(av) if mul in ("times", "plus", "first", "second") else None
        bvv = jnp.asarray(bv) if mul in ("times", "plus", "second") else None
        vals, nm = eqjoin(jnp.asarray(ak), avv, jnp.asarray(bk), bvv, add=add, mul=mul, interpret=True)
        vals, nm = np.asarray(vals), np.asarray(nm)
        for t in range(0, T, 37):
            eq = ak[:, t][:, None] == bk[:, t][None, :]
            prods = {
                "times": av[:, t][:, None] * bv[:, t][None, :],
                "plus": av[:, t][:, None] + bv[:, t][None, :],
                "first": np.broadcast_to(av[:, t][:, None], (W, W)),
                "pair": np.ones((W, W), np.float32),
            }[mul][eq]
            assert nm[t] == eq.sum()
            if eq.sum() == 0:
                continue
            expected = {
                "plus": prods.sum(),
                "min": prods.min(),
                "max": prods.max(),
                "lor": float((prods != 0).any()),
            }[add]
            np.testing.assert_allclose(vals[t], expected, rtol=1e-5, err_msg=f"{add}_{mul} t={t}")


def test_segmented_fill_static_vs_scan(rng):
    """Static-gather segmented fill == generic scan fill for random flags,
    including all-empty/all-flagged rows and cross-tile carries."""
    import jax.numpy as jnp

    from graphblas_tpu.ops.pallas_scan import (
        build_fill_tables,
        segmented_fill_static,
        segmented_scan,
    )

    for n, density in [(128 * 8, 0.0), (128 * 8, 1.0), (128 * 64, 0.03), (128 * 2048 + 0, 0.06)]:
        flags = rng.random(n) < density
        x = rng.random(n).astype(np.float32)
        j, hp = build_fill_tables(flags)
        assert j.dtype == np.int8 and j.shape == (n // 128, 128)
        ref = np.asarray(segmented_scan(jnp.asarray(x), jnp.asarray(flags), "fill", interpret=True))
        got = np.asarray(
            segmented_fill_static(jnp.asarray(x), jnp.asarray(j), jnp.asarray(hp), interpret=True)
        )
        np.testing.assert_array_equal(got, ref, err_msg=f"n={n} d={density}")


def test_segmented_scan_state_vs_composed(rng):
    """Fused reduce+state-update kernel == contrib scan + elementwise epilogue."""
    import jax.numpy as jnp

    from graphblas_tpu.ops.pallas_scan import segmented_scan_contrib, segmented_scan_state

    n = 128 * 32
    flags = rng.random(n) < 0.05
    valid = rng.random(n) < 0.8
    il = np.zeros(n, bool)
    il[np.flatnonzero(flags) - 1] = True
    x = rng.random(n).astype(np.float32)
    w = rng.random(n).astype(np.float32)

    dist = (rng.random(n) * 2).astype(np.float32)
    ref = np.asarray(
        segmented_scan_contrib(
            jnp.asarray(x), jnp.asarray(w), jnp.asarray(valid), jnp.asarray(flags), "min", "plus", interpret=True
        )
    )
    # non-last slots carry the min identity (donor slots for the loop network)
    from graphblas_tpu.ops.pallas_scan import STATE_BIG

    ref_new = np.where(il, np.minimum(dist, ref), STATE_BIG)
    got_new, got_ch = segmented_scan_state(
        "sssp", jnp.asarray(x), jnp.asarray(w), jnp.asarray(valid), jnp.asarray(flags),
        jnp.asarray(il), jnp.asarray(dist), 0, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got_new), ref_new, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(got_ch), (ref_new < dist).astype(np.float32))

    lv = np.where(rng.random(n) < 0.3, 1, -1).astype(np.int32)
    fr = (rng.random(n) < 0.2).astype(np.float32)
    ref = np.asarray(
        segmented_scan_contrib(
            jnp.asarray(fr), None, jnp.asarray(valid), jnp.asarray(flags), "max", "first", interpret=True
        )
    )
    nxt = il & (ref > 0) & (lv < 0)
    got_lv, got_fr = segmented_scan_state(
        "bfs", jnp.asarray(fr), None, jnp.asarray(valid), jnp.asarray(flags),
        jnp.asarray(il), jnp.asarray(lv), 7, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got_lv), np.where(nxt, 8, lv))
    np.testing.assert_array_equal(np.asarray(got_fr), nxt.astype(np.float32))


def test_segmented_scan_state_fr_reduce(rng):
    """fr_reduce=True: per-block ANY(changed) flags match the full output."""
    import jax.numpy as jnp

    from graphblas_tpu.ops.pallas_scan import _BLK, segmented_scan_state

    n = 128 * 64
    flags = rng.random(n) < 0.05
    valid = rng.random(n) < 0.8
    il = np.zeros(n, bool)
    il[np.flatnonzero(flags) - 1] = True
    x = rng.random(n).astype(np.float32)
    w = rng.random(n).astype(np.float32)
    dist = (rng.random(n) * 2).astype(np.float32)
    args = (
        "sssp", jnp.asarray(x), jnp.asarray(w), jnp.asarray(valid), jnp.asarray(flags),
        jnp.asarray(il), jnp.asarray(dist), 0,
    )
    new_full, ch_full = segmented_scan_state(*args, interpret=True)
    new_red, ch_red = segmented_scan_state(*args, interpret=True, fr_reduce=True)
    np.testing.assert_allclose(np.asarray(new_red), np.asarray(new_full), rtol=1e-6)
    r = n // 128
    blk = min(_BLK, r)
    per_block = np.asarray(ch_full).reshape(r // blk, blk * 128).max(axis=1)
    np.testing.assert_array_equal(np.asarray(ch_red).reshape(-1), per_block)

    # bfs must reject the sssp-only contract
    import pytest as _pytest

    with _pytest.raises(ValueError):
        segmented_scan_state(
            "bfs", jnp.asarray(x), None, jnp.asarray(valid), jnp.asarray(flags),
            jnp.asarray(il), jnp.zeros(n, np.int32), 0, interpret=True, fr_reduce=True,
        )
