"""Permutation-network engine and fast SpMV tests."""

import numpy as np
import pytest

import graphblas_tpu as gb  # noqa: F401

from graphblas_tpu.native import euler_color
from graphblas_tpu.ops.fastspmv import build_spmv_plan, spmv
from graphblas_tpu.ops.permute import apply_plan, build_permutation_plan, padded_size


def test_euler_color_proper(rng):
    R, k = 16, 8
    E = R * k
    in_rows = np.repeat(np.arange(R, dtype=np.int32), k)
    out_rows = in_rows[rng.permutation(E)]
    colors = euler_color(in_rows, out_rows, R, k)
    for r in range(R):
        assert sorted(colors[in_rows == r].tolist()) == list(range(k))
        assert sorted(colors[out_rows == r].tolist()) == list(range(k))


@pytest.mark.parametrize("n", [128, 512, 1024, 16384])
def test_plan_roundtrip(rng, n):
    import jax.numpy as jnp

    perm = rng.permutation(n)
    plan = build_permutation_plan(perm)
    x = np.arange(n, dtype=np.float32)
    out = np.asarray(apply_plan(jnp.asarray(x), plan, pallas=False))
    np.testing.assert_array_equal(out, x[perm])


@pytest.mark.slow
def test_plan_two_level(rng):
    import jax.numpy as jnp

    n = 128 * 128 * 128
    perm = rng.permutation(n)
    plan = build_permutation_plan(perm, validate=False)
    x = rng.random(n).astype(np.float32)
    out = np.asarray(apply_plan(jnp.asarray(x), plan, pallas=False))
    np.testing.assert_array_equal(out, x[perm])


def test_padded_size():
    assert padded_size(100) == 128
    assert padded_size(128 * 128) == 128 * 128
    assert padded_size(128 * 128 + 1) == 2 * 128 * 128
    assert padded_size(1 << 24) == 8 * 128**3
    r = padded_size(3_000_000) // 128
    m = r
    while m > 128:
        assert m % 128 == 0
        m //= 128


@pytest.mark.parametrize(
    "add,mul", [("plus", "times"), ("min", "plus"), ("max", "first"), ("plus", "second")]
)
def test_spmv_vs_oracle(rng, add, mul):
    import jax.numpy as jnp

    n, e = 300, 2000
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    w = (rng.random(e) * 5).astype(np.float32)
    plan = build_spmv_plan(src, dst, w, n=n)
    x = (rng.random(n) * 5).astype(np.float32)
    y = np.asarray(spmv(plan, jnp.asarray(x), add, mul))

    mul_np = {
        "times": lambda xs, ws: ws * xs,
        "plus": lambda xs, ws: ws + xs,
        "first": lambda xs, ws: xs,
        "second": lambda xs, ws: ws,
    }[mul]
    contrib = mul_np(x[src], w)
    if add == "plus":
        ref = np.zeros(n, np.float32)
        np.add.at(ref, dst, contrib)
        np.testing.assert_allclose(y, ref, rtol=1e-4, atol=1e-5)
    else:
        fill = np.inf if add == "min" else -np.inf
        ref = np.full(n, fill, np.float32)
        (np.minimum if add == "min" else np.maximum).at(ref, dst, contrib)
        mask = np.isfinite(ref)
        np.testing.assert_allclose(y[mask], ref[mask], rtol=1e-4)
        assert np.array_equal(np.isfinite(y), mask)


def test_spmv_empty_rows(rng):
    """Nodes with no in/out edges must produce identity outputs."""
    import jax.numpy as jnp

    n = 200
    src = np.array([0, 1, 0], np.int32)
    dst = np.array([5, 5, 7], np.int32)
    w = np.array([1.0, 2.0, 3.0], np.float32)
    plan = build_spmv_plan(src, dst, w, n=n)
    x = np.arange(n, dtype=np.float32)
    y = np.asarray(spmv(plan, jnp.asarray(x), "plus", "times"))
    expected = np.zeros(n, np.float32)
    expected[5] = 1.0 * x[0] + 2.0 * x[1]
    expected[7] = 3.0 * x[0]
    np.testing.assert_allclose(y, expected, rtol=1e-6)
