"""Test harness.

Mirrors the reference harness idea (reference: /root/reference/conftest.py and
graphblas/tests/conftest.py): a randomized-config matrix.  The new axes are
platform (CPU-sim for tests; the engine is identical on TPU) and a virtual
8-device mesh for sharding tests (driver contract: tests must run without
real multi-chip hardware).
"""

import os

# Must be set before jax (or graphblas_tpu) is imported anywhere.
os.environ.setdefault("GRAPHBLAS_TPU_PLATFORM", "cpu")
# Tests always run on CPU, even when a TPU plugin env pinned JAX_PLATFORMS.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False, help="run slow tests")
    parser.addoption("--record", action="store_true", default=False, help="record engine calls")


def pytest_configure(config):
    # Randomized-config axes (reference: graphblas/tests/conftest.py backend/
    # blocking/record randomization):
    # - GRAPHBLAS_TEST_MXM_STRATEGY=auto|mxu|generic|pallas forces every mxm
    #   through one lowering
    # - GRAPHBLAS_TEST_BLOCKING=1 runs the whole suite in blocking mode
    #   (every mutating statement materializes -> error-timing differences
    #   surface)
    strategy = os.environ.get("GRAPHBLAS_TEST_MXM_STRATEGY")
    if strategy:
        from graphblas_tpu.tx import config as txconfig

        txconfig["mxm_strategy"] = strategy
    if os.environ.get("GRAPHBLAS_TEST_BLOCKING"):
        import graphblas_tpu

        graphblas_tpu.init("jax", blocking=True)
    if config.getoption("--record", default=False):
        # reference --record: wrap the run in a Recorder and dump every
        # engine call to record.txt (graphblas/tests/conftest.py:111-120)
        import graphblas_tpu

        config._gb_recorder = graphblas_tpu.Recorder(start=True, max_rows=1 << 30)


def pytest_unconfigure(config):
    rec = getattr(config, "_gb_recorder", None)
    if rec is not None:
        rec.stop()
        with open("record.txt", "w") as f:
            f.write("\n".join(rec.data) + "\n")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip_slow = pytest.mark.skip(reason="need --runslow option to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)


@pytest.fixture(scope="session")
def rng():
    seed = int(os.environ.get("GRAPHBLAS_TEST_SEED", "42"))
    return np.random.default_rng(seed)


@pytest.fixture
def gb():
    import graphblas_tpu

    return graphblas_tpu
