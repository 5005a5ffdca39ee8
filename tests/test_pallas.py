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
