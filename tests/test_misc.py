"""Recorder, formatting, dtypes, config, tx namespace tests."""

import os
import numpy as np
import pytest

import graphblas_tpu as gb
from graphblas_tpu import Matrix, Recorder, Vector, binary, dtypes, semiring


def test_recorder_records_calls():
    A = Matrix.from_coo([0, 1], [1, 0], [1.0, 2.0], nrows=2, ncols=2)
    with Recorder() as rec:
        C = A.mxm(A, semiring.plus_times).new()
        C << A.ewise_add(A, binary.plus)
    assert len(rec) == 2
    assert any("mxm" in line for line in rec.data)
    assert any("ewise_add" in line for line in rec.data)
    # no recording outside the context
    D = A.mxm(A).new()
    assert len(rec) == 2
    assert "Recorder" in repr(rec)
    assert rec._repr_markdown_().startswith("```")


def test_recorder_start_stop():
    rec = Recorder(start=False)
    assert not rec.is_recording
    A = Matrix.from_coo([0], [0], [1.0], nrows=1, ncols=1)
    A.mxm(A).new()
    assert len(rec) == 0
    rec.start()
    A.mxm(A).new()
    rec.stop()
    assert len(rec) == 1
    rec.clear()
    assert len(rec) == 0


def test_repr_formats():
    A = Matrix.from_coo([0, 1], [1, 0], [1.5, 2.5], nrows=2, ncols=2, name="A")
    r = repr(A)
    assert '"A"' in r
    assert "nvals" in r and "gb.Matrix" in r
    v = Vector.from_coo([0], [1], size=3, name="v")
    assert "size" in repr(v) and "3" in repr(v)
    s = gb.Scalar.from_value(5)
    assert "5" in repr(s)
    empty = gb.Scalar(dtypes.FP32)
    assert "value" in repr(empty)
    # big sparse collection falls back to a coo triplet table
    big = Matrix.from_coo([0, 99], [99, 0], [1, 2], nrows=100, ncols=100)
    assert "row" in repr(big) and "col" in repr(big)
    assert A._repr_html_()


def test_dtype_lookup_spellings():
    assert dtypes.lookup_dtype("FP64") is dtypes.FP64
    assert dtypes.lookup_dtype("fp64") is dtypes.FP64
    assert dtypes.lookup_dtype(float) is dtypes.FP64
    assert dtypes.lookup_dtype(np.float64) is dtypes.FP64
    assert dtypes.lookup_dtype(np.dtype("float64")) is dtypes.FP64
    assert dtypes.lookup_dtype("<f8") is dtypes.FP64
    assert dtypes.lookup_dtype(int) is dtypes.INT64
    assert dtypes.lookup_dtype(bool) is dtypes.BOOL
    assert dtypes.unify(dtypes.INT32, dtypes.FP32) == dtypes.FP64
    assert dtypes.unify(dtypes.INT8, dtypes.INT16) is dtypes.INT16
    with pytest.raises(ValueError):
        dtypes.lookup_dtype("not_a_dtype")


def test_dtype_string_roundtrip():
    from graphblas_tpu.core.dtypes import _dtype_to_string, _string_to_dtype

    for dt in [dtypes.FP64, dtypes.INT8, dtypes.BOOL]:
        s = _dtype_to_string(dt.np_type)
        assert _string_to_dtype(s) == dt
    udt = dtypes.register_anonymous([("a", np.int32), ("b", np.float64)])
    s = _dtype_to_string(udt.np_type)
    assert _string_to_dtype(s).np_type == udt.np_type


def test_config():
    assert gb.config.get("autocompute") is True
    with gb.config.set(autocompute=False):
        assert gb.config.get("autocompute") is False
    assert gb.config.get("autocompute") is True
    with pytest.raises(KeyError):
        gb.config.set(not_a_key=1)
    assert "autocompute" in gb.config


def test_tx_namespace():
    import graphblas_tpu.tx as tx

    assert tx.about["library_name"]
    # default "auto" unless the harness pinned a strategy axis
    expected = os.environ.get("GRAPHBLAS_TEST_MXM_STRATEGY", "auto")
    assert tx.config["mxm_strategy"] == expected
    v = Vector.from_coo([0, 2], [1.0, 2.0], size=4)
    m = tx.diag(v)
    assert m.shape == (4, 4)
    back = tx.diag(m)
    assert back.isequal(v)
    with tx.burble():
        assert tx.config["burble"]
    assert not tx.config["burble"]


def test_tx_concat_split():
    import graphblas_tpu.tx as tx

    A = Matrix.from_coo([0, 1, 2, 3], [0, 1, 2, 3], [1, 2, 3, 4], nrows=4, ncols=4)
    tiles = A.tx.split(2)
    assert len(tiles) == 2 and len(tiles[0]) == 2
    B = tx.concat(tiles)
    assert B.isequal(A)
    v = Vector.from_coo([0, 3], [1, 2], size=4)
    parts = v.tx.split(2)
    assert len(parts) == 2
    w = tx.concat(parts)
    assert w.isequal(v)


def test_tx_matrix_utils():
    A = Matrix.from_coo([0, 0, 1], [0, 2, 1], [3.0, 1.0, 2.0], nrows=2, ncols=3)
    assert A.tx.format == "densemasked"
    assert A.tx.nbytes > 0
    assert not A.tx.is_iso
    iso = Matrix.from_scalar(1, 2, 2)
    assert iso.tx.is_iso
    flat = A.tx.flatten()
    assert flat.size == 6
    back = flat.tx.reshape(2, 3)
    assert back.isequal(A)
    assert list(A.tx.iterkeys()) == [(0, 0), (0, 2), (1, 1)]
    assert list(A.tx.itervalues()) == [3.0, 1.0, 2.0]
    r, c, v = A.tx.head(2)
    assert len(r) == 2


def test_tx_scan():
    v = Vector.from_coo([0, 1, 3], [1.0, 2.0, 3.0], size=4)
    s = v.tx.scan("plus")
    assert s.to_dict() == {0: 1.0, 1: 3.0, 3: 6.0}
    A = Matrix.from_coo([0, 0, 1], [0, 1, 1], [1.0, 2.0, 3.0], nrows=2, ncols=2)
    s = A.tx.scan("plus")
    assert s.to_dicts() == {0: {0: 1.0, 1: 3.0}, 1: {1: 3.0}}


def test_tx_selectk_compactify_sort():
    A = Matrix.from_coo(
        [0, 0, 0, 1, 1], [0, 2, 4, 1, 3], [5.0, 1.0, 3.0, 2.0, 4.0], nrows=2, ncols=5
    )
    top = A.tx.selectk("largest", 1)
    assert top.to_dicts() == {0: {0: 5.0}, 1: {3: 4.0}}
    first = A.tx.selectk("first", 2)
    assert first.to_dicts() == {0: {0: 5.0, 2: 1.0}, 1: {1: 2.0, 3: 4.0}}
    comp = A.tx.compactify("first")
    assert comp.to_dicts() == {0: {0: 5.0, 1: 1.0, 2: 3.0}, 1: {0: 2.0, 1: 4.0}}
    sorted_vals = A.tx.sort(permutation=False)
    assert sorted_vals.to_dicts()[0] == {0: 1.0, 1: 3.0, 2: 5.0}
    v = Vector.from_coo([0, 2, 3], [3.0, 1.0, 2.0], size=5)
    sv = v.tx.sort(permutation=False)
    assert sv.to_dict() == {0: 1.0, 1: 2.0, 2: 3.0}


def test_parallel_context():
    from graphblas_tpu.parallel import Context, current_context, shard_matrix

    assert current_context() is None
    with Context() as ctx:
        assert current_context() is ctx
        A = Matrix.from_coo([0, 1], [1, 0], [1.0, 2.0], nrows=8, ncols=8)
        shard_matrix(A)
        assert A.nvals == 2
    assert current_context() is None


def test_exceptions_hierarchy():
    assert issubclass(gb.exceptions.DimensionMismatch, gb.exceptions.GraphblasException)
    assert issubclass(gb.exceptions.IndexOutOfBound, gb.exceptions.GraphblasException)
    with pytest.raises(gb.exceptions.DimensionMismatch):
        a = Vector(dtypes.FP64, 3)
        b = Vector(dtypes.FP64, 4)
        a.ewise_add(b, binary.plus).new()


def test_setdiag_masked():
    # ADVICE r1: setdiag must honor mask (reference: core/matrix.py:2982-3007)
    A = Matrix.from_dense(np.zeros((3, 3)), dtype=dtypes.FP64)
    m = Vector.from_coo([0, 2], [True, True], size=3)
    A.setdiag(99.0, mask=m.S)
    d = A.diag().to_dict()
    assert d == {0: 99.0, 1: 0.0, 2: 99.0}
    # Matrix mask: only its diagonal is consulted
    A2 = Matrix.from_dense(np.ones((3, 3)), dtype=dtypes.FP64)
    M = Matrix.from_coo([1], [1], [True], nrows=3, ncols=3)
    A2.setdiag(7.0, mask=M.S)
    assert A2.diag().to_dict() == {0: 1.0, 1: 7.0, 2: 1.0}
    # masked + accum combine
    A3 = Matrix.from_dense(np.full((3, 3), 2.0), dtype=dtypes.FP64)
    A3.setdiag(10.0, mask=m.S, accum=binary.plus)
    assert A3.diag().to_dict() == {0: 12.0, 1: 2.0, 2: 12.0}
    with pytest.raises(gb.exceptions.DimensionMismatch):
        A3.setdiag(1.0, mask=Vector.from_coo([0], [True], size=7).S)


def test_masked_region_delete():
    # ADVICE r1: del v(m.S)[0:3] deletes only masked entries in the region
    v = Vector.from_coo([0, 1, 2, 3], [1.0, 2.0, 3.0, 4.0])
    m = Vector.from_coo([0], [True], size=4)
    del v(m.S)[0:3]
    assert v.to_dict() == {1: 2.0, 2: 3.0, 3: 4.0}
    A = Matrix.from_dense(np.arange(9.0).reshape(3, 3) + 1, dtype=dtypes.FP64)
    Mm = Matrix.from_coo([0, 1], [0, 1], [True, True], nrows=3, ncols=3)
    del A(Mm.S)[0:2, 0:2]
    assert A.to_dicts() == {
        0: {1: 2.0, 2: 3.0},
        1: {0: 4.0, 2: 6.0},
        2: {0: 7.0, 1: 8.0, 2: 9.0},
    }


def test_tx_descending_unsigned():
    # ADVICE r1: descending order must not negate unsigned keys (wraps)
    A = Matrix.from_coo([0, 0, 0], [0, 1, 2], [0, 200, 100], dtype=dtypes.UINT8, nrows=1, ncols=3)
    top = A.tx.selectk("largest", 1)
    assert top.to_dicts() == {0: {1: 200}}
    comp = A.tx.compactify("largest")
    assert list(comp.to_dicts()[0].values()) == [200, 100, 0]
    sv = A.tx.sort("gt", permutation=False)
    assert list(sv.to_dicts()[0].values()) == [200, 100, 0]
    # signed with a present minimum that ties the old fill
    B = Matrix.from_coo([0, 0], [1, 3], [127, -5], dtype=dtypes.INT8, nrows=1, ncols=4)
    assert B.tx.selectk("largest", 1).to_dicts() == {0: {1: 127}}
    assert B.tx.selectk("smallest", 1).to_dicts() == {0: {3: -5}}


def test_deserialize_tags():
    from graphblas_tpu import tx

    v = Vector.from_coo([0, 2], [1.5, 2.5], size=4)
    data = v.tx.serialize(compression=None)
    w = tx.deserialize(bytes(data))
    assert w.to_dict() == v.to_dict()
    with pytest.raises(ValueError, match="unknown serialization tag"):
        tx.deserialize(b"XXXXjunk")


def test_tx_per_object_config_persists():
    # VERDICT r1: per-object config was a throwaway stub; now persistent + live
    A = Matrix.from_coo([0, 1], [1, 0], [1.0, 2.0], nrows=3, ncols=3)
    cfg = A.tx.config
    assert cfg["storage"] == "auto"
    cfg["storage"] = "coo"
    assert A.tx.format == "coo"
    assert A.tx.config["storage"] == "coo"  # same object, persisted
    A.tx.config["storage"] = "densemasked"
    assert A.tx.format == "densemasked"
    with pytest.raises(KeyError):
        A.tx.config["nonsense"] = 1
    v = Vector.from_coo([0], [1.0], size=2)
    assert v.tx.config["storage"] == "auto"
    # round 3: Vectors support sparse storage like Matrix
    v.tx.config["storage"] = "coo"
    assert v._sparse is not None
    assert v.to_dict() == {0: 1.0}
    v.tx.config["storage"] = "densemasked"
    assert v._sparse is None


def test_tx_binary_serialize_roundtrip():
    from graphblas_tpu import tx

    A = Matrix.from_coo([0, 1, 2], [1, 0, 2], [1.5, 2.5, 3.5], nrows=3, ncols=4, name="A")
    for comp in [None, "none", "zstd", "default"]:
        data = A.tx.serialize(compression=comp)
        B = tx.deserialize(bytes(data))
        assert B.isequal(A)
    # binary, not pickle: GBTX magic after the envelope
    raw = bytes(A.tx.serialize(compression=None))
    assert raw[:4] == b"RAW0" and raw[4:8] == b"GBTX"
    with pytest.raises(ValueError, match="unsupported compression"):
        A.tx.serialize(compression="lz4")
    # iso stored once
    I = Matrix.from_coo([0, 1, 2], [0, 1, 2], 7.0, nrows=3, ncols=3)
    data = I.tx.serialize(compression=None)
    J = tx.deserialize(bytes(data))
    assert J.isequal(I)
    v = Vector.from_coo([1, 3], [4.0, 5.0], size=6)
    w = tx.deserialize(bytes(v.tx.serialize()))
    assert w.isequal(v)
    # sparse-format matrix keeps its format through the round trip
    from graphblas_tpu import tx as txmod

    with txmod.config.set(dense_limit=0):
        S = Matrix.from_coo([0, 2], [1, 0], [9.0, 8.0], nrows=3, ncols=3)
    S2 = tx.deserialize(bytes(S.tx.serialize()))
    assert S2.isequal(S)


def test_tx_build_diag_and_build_scalar():
    v = Vector.from_coo([0, 2], [5.0, 7.0], size=3)
    A = Matrix(dtypes.FP64, 3, 3)
    A.tx.build_diag(v)
    assert A.to_dicts() == {0: {0: 5.0}, 2: {2: 7.0}}
    with pytest.raises(gb.exceptions.OutputNotEmpty):
        A.tx.build_diag(v)
    B = Matrix(dtypes.INT64, 2, 3)
    B.tx.build_scalar([0, 1], [2, 0], 9)
    assert B.to_dicts() == {0: {2: 9}, 1: {0: 9}}
    assert B.tx.is_iso
    with pytest.raises(gb.exceptions.OutputNotEmpty):
        B.tx.build_scalar([0], [0], 1)


def test_burble_prints_dispatch(capsys):
    """Burble prints one diagnostic line per engine op with storage formats
    (analogue of SuiteSparse burble, reference: graphblas/ss/__init__.py:1)."""
    import graphblas_tpu as gb

    A = Matrix.from_coo([0, 1], [1, 0], [1.0, 2.0], dtypes.FP32, nrows=2, ncols=2, name="A")
    v = Vector.from_coo([0], [1.0], dtypes.FP32, size=2, name="v")
    w = A.mxv(v, semiring.plus_times).new(name="w")  # quiet: burble off
    assert capsys.readouterr().out == ""
    burb = gb.tx.burble()
    assert not burb.is_enabled
    with burb:
        assert burb.is_enabled
        w << A.mxv(v, semiring.min_plus)
    out = capsys.readouterr().out
    assert "[burble] mxv[min_plus](w<dense 2 FP32>" in out
    assert "A<dense 2x2 FP32>" in out
    assert not gb.tx.config["burble"]
    # off again afterwards
    w.dup()
    assert "[burble]" not in capsys.readouterr().out


def test_from_coo_string_dup_op():
    """Strings work anywhere an op does — including dup_op (reference:
    op-from-string DSL, core/operator/utils.py:371-493)."""
    A = Matrix.from_coo([0, 0, 1], [1, 1, 0], [2.0, 3.0, 4.0], nrows=2, ncols=2, dup_op="plus")
    assert A.get(0, 1) == 5.0
    v = Vector.from_coo([0, 0, 2], [1, 7, 5], size=3, dup_op="max")
    assert v.get(0) == 7


def test_build_spmv_plan_rejects_out_of_range():
    """Out-of-range edge endpoints raise IndexOutOfBound instead of
    corrupting the native counting sort (reference: GrB index validation)."""
    from graphblas_tpu.exceptions import IndexOutOfBound
    from graphblas_tpu.native import counting_sort
    from graphblas_tpu.ops.fastspmv import build_spmv_plan

    with pytest.raises(IndexOutOfBound):
        build_spmv_plan(np.array([0, 70]), np.array([1, 2]), None, n=64)
    with pytest.raises(IndexError):
        counting_sort(np.array([0, 99], np.int32), 10)
    with pytest.raises(IndexError):
        counting_sort(np.array([-1, 3], np.int32), 10)


def test_64bit_execution_contract():
    """docs/types.md: FP64/INT64 are supported collection dtypes everywhere;
    the policy helpers report the platform width; 64-bit collections work on
    a 32-bit execution platform (values at 32-bit width, declared dtype
    preserved, host materialization returns the declared numpy dtype)."""
    import jax

    import numpy as np
    from graphblas_tpu import Vector, binary, monoid
    from graphblas_tpu.core import dtypes as dtm

    assert dtm.executes_64bit() == (
        bool(jax.config.jax_enable_x64) and jax.default_backend() != "tpu"
    )
    if dtm.executes_64bit():
        assert dtm.default_float() is dtm.FP64
        assert dtm.default_int() is dtm.INT64
    else:
        assert dtm.default_float() is dtm.FP32
        assert dtm.default_int() is dtm.INT32

    v = Vector.from_coo([0, 2], [1.5, 2.5], dtm.FP64, size=3)
    w = v.apply(binary.plus, right=1.0).new()
    assert w.dtype is dtm.FP64  # declared dtype always 64-bit
    idx, vals = w.to_coo()
    assert vals.dtype == np.float64  # host materialization: declared width
    np.testing.assert_allclose(vals, [2.5, 3.5], rtol=1e-6)
    s = v.reduce(monoid.plus).new()
    assert s.dtype is dtm.FP64
    assert float(s.value) == 4.0
