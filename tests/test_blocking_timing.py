"""Blocking-mode semantics: errors and materialization timing.

Reference: GrB_Mode blocking vs nonblocking (init(blocking=True) makes every
mutating statement materialize immediately; expression errors surface at
statement time instead of at the later value read).
"""

import numpy as np
import pytest

import graphblas_tpu as gb
from graphblas_tpu import binary, exceptions as exc, semiring
from graphblas_tpu.core import dtypes
from graphblas_tpu.core.matrix import Matrix
from graphblas_tpu.core.vector import Vector


@pytest.fixture
def blocking():
    # init() refuses to switch modes mid-process (reference contract); flip
    # the internal flag directly for the fixture's scope
    was = gb.is_blocking
    gb.is_blocking = True
    yield
    gb.is_blocking = was


def test_init_mode_switch_refused():
    """Re-initializing with a different mode raises (reference contract)."""
    with pytest.raises(exc.GraphblasException, match="re-initialized"):
        gb.init("jax", blocking=not gb.is_blocking)


def test_blocking_materializes_on_update(blocking):
    v = Vector.from_coo([0, 1], [1.0, 2.0], size=4)
    w = Vector(dtypes.FP64, 4)
    w << v.apply(binary.plus, right=1.0)
    # blocking mode: the value is already materialized (not a thunk)
    assert w._values is not None
    idx, vals = w.to_coo()
    assert vals.tolist() == [2.0, 3.0]


def test_nonblocking_defers_then_computes():
    v = Vector.from_coo([0, 1], [1.0, 2.0], size=4)
    w = Vector(dtypes.FP64, 4)
    w << v.apply(binary.plus, right=1.0)
    idx, vals = w.to_coo()
    assert vals.tolist() == [2.0, 3.0]


def test_blocking_error_at_statement(blocking):
    A = Matrix.from_coo([0], [1], [1.0], nrows=3, ncols=4)
    B = Matrix.from_coo([0], [1], [1.0], nrows=3, ncols=4)
    with pytest.raises(exc.DimensionMismatch):
        A.mxm(B, semiring.plus_times).new()


def test_wait_is_noop_safe(blocking):
    v = Vector.from_coo([0], [1.0], size=3)
    v.wait()
    assert v.nvals == 1


def test_blocking_updater_chain(blocking):
    v = Vector.from_coo([0, 1, 2], [1.0, 2.0, 3.0], size=3)
    v(accum=binary.plus) << v.apply(binary.times, right=2.0)
    idx, vals = v.to_coo()
    assert vals.tolist() == [3.0, 6.0, 9.0]
