"""input_mask extract rules + autocompute-off + build/dup-on-non-empty.

Ports the reference's nastiest remaining test surfaces (VERDICT r4 #9):
- ``test_extract_input_mask`` (reference graphblas/tests/test_matrix.py:477-560)
  including the Vector-mask-on-row/column rules of core/expr.py:335-379
- autocompute-off behavior (reference core/automethods.py:14-28)
- ``build``/``dup`` on non-empty collections (GrB_Matrix_build raises
  OUTPUT_NOT_EMPTY; reference core/matrix.py:627-682)
"""

import numpy as np
import pytest

import graphblas_tpu as gb
from graphblas_tpu import Matrix, Vector, binary, dtypes, monoid, semiring
from graphblas_tpu import exceptions as exc


@pytest.fixture
def A():
    # 0 1 2
    # 3 4 5
    return Matrix.from_coo([0, 0, 0, 1, 1, 1], [0, 1, 2, 0, 1, 2], [0, 1, 2, 3, 4, 5])


@pytest.fixture
def M():
    # _ 0 1
    # 2 3 _
    return Matrix.from_coo([0, 0, 1, 1], [1, 2, 0, 1], [0, 1, 2, 3])


# ---------------------------------------------------------------------------
# input_mask (reference test_extract_input_mask, verbatim case matrix)
# ---------------------------------------------------------------------------


def test_input_mask_matrix_structure(A, M):
    result = A[0, [0, 1]].new(input_mask=M.S)
    expected = Vector.from_coo([1], [1])
    assert result.isequal(expected)
    result.clear()
    result(input_mask=M.S) << A[0, [0, 1]]
    assert result.isequal(expected)


def test_input_mask_vector_on_row(A, M):
    m = M[0, :].new()
    result = A[0, [0, 1]].new(input_mask=m.S)
    expected = Vector.from_coo([1], [1])
    assert result.isequal(expected)
    result.clear()
    result(input_mask=m.S) << A[0, [0, 1]]
    assert result.isequal(expected)


def test_input_mask_vector_on_column(A, M):
    m = M[:, 1].new()  # entries at rows 0, 1
    result = A[[0, 1], 2].new(input_mask=m.S)
    expected = Vector.from_coo([0, 1], [2, 5])
    assert result.isequal(expected)


def test_input_mask_value_mask(A, M):
    result = A[0, [1, 2]].new(input_mask=M.V)
    expected = Vector.from_coo([1], [2], size=2)
    assert result.isequal(expected)
    result.clear()
    result(input_mask=M.V) << A[0, [1, 2]]
    assert result.isequal(expected)


def test_input_mask_complement(A, M):
    result = A[0, [0, 1]].new(input_mask=~M.S)
    expected = Vector.from_coo([0], [0], size=2)
    assert result.isequal(expected)


def test_input_mask_matrix_submatrix(A, M):
    result = A[[0, 1], [0, 1]].new(input_mask=M.S)
    # M covers (0,1), (1,0), (1,1) inside the extracted region
    expected = Matrix.from_coo([0, 1, 1], [1, 0, 1], [1, 3, 4], nrows=2, ncols=2)
    assert result.isequal(expected)


def test_input_mask_on_vector(A, M):
    v = A[0, :].new()
    m = M[0, :].new()
    result = v[[0, 1]].new(input_mask=m.S)
    expected = Vector.from_coo([1], [1], size=2)
    assert result.isequal(expected)


def test_input_mask_shape_mismatch(A, M):
    MT = M.T.new()
    m = M[0, :].new()
    with pytest.raises(ValueError, match="Shape of `input_mask` does not match shape of input"):
        A[0, [0, 1]].new(input_mask=MT.S)
    with pytest.raises(ValueError, match="Shape of `input_mask` does not match shape of input"):
        m(input_mask=MT.S) << A[0, [0, 1]]


def test_input_mask_vector_size_mismatch(A):
    small = Vector.from_coo([1], [1])  # size 2
    m = Vector.from_coo([1], [1], size=3)
    with pytest.raises(ValueError, match="Size of `input_mask` Vector does not match ncols of Matrix"):
        A[0, [0]].new(input_mask=small.S)
    with pytest.raises(ValueError, match="Size of `input_mask` Vector does not match ncols of Matrix"):
        small(input_mask=small.S) << A[0, [0]]
    with pytest.raises(ValueError, match="Size of `input_mask` Vector does not match nrows of Matrix"):
        A[[0], 0].new(input_mask=m.S)


def test_input_mask_vector_on_submatrix(A):
    small = Vector.from_coo([1], [1])
    with pytest.raises(TypeError, match="Got Vector `input_mask` when extracting a submatrix"):
        A[[0], [0]].new(input_mask=small.S)
    with pytest.raises(TypeError, match="Got Vector `input_mask` when extracting a submatrix"):
        A(input_mask=small.S) << A[[0], [0]]


def test_input_mask_element_extract_rejected(A, M):
    with pytest.raises(ValueError, match="input_mask"):
        A[0, 0].new(input_mask=M.S)


def test_input_mask_and_mask_mutually_exclusive(A, M):
    small = Vector.from_coo([1], [1])
    with pytest.raises(TypeError, match="mask and input_mask arguments cannot both be given"):
        A[0, [0, 1]].new(input_mask=M.S, mask=small.S)
    with pytest.raises(TypeError, match="mask and input_mask arguments cannot both be given"):
        A(input_mask=M.S, mask=M.S)


def test_input_mask_requires_mask_type(A, M):
    with pytest.raises(TypeError, match="Mask must be"):
        A[0, [0, 1]].new(input_mask=M)
    with pytest.raises(TypeError, match="Mask must be"):
        A(input_mask=M)


def test_input_mask_matrix_mask_on_vector_rejected(A, M):
    v = A[0, :].new()
    with pytest.raises(TypeError, match="Mask object must be type Vector"):
        v[[0, 1]].new(input_mask=M.S)
    with pytest.raises(TypeError, match="Mask object must be type Vector"):
        v(input_mask=M.S) << v[[0, 1]]


def test_input_mask_only_for_extract(A, M):
    with pytest.raises(TypeError, match="input_mask is only allowed for extract"):
        A(input_mask=M.S) << A.mxm(A.T.new(), semiring.plus_times)


def test_input_mask_bool_collection_autolifts(A, M):
    """A bool collection as input_mask auto-lifts to a ValueMask
    (reference _check_mask, core/base.py:169-183)."""
    mb = Matrix.from_coo([0, 0], [1, 2], [True, False], dtypes.BOOL, nrows=2, ncols=3)
    result = A[0, [1, 2]].new(input_mask=mb)
    expected = Vector.from_coo([0], [1], size=2)
    assert result.isequal(expected)


def test_input_mask_sparse_parent(A, M):
    """input_mask over a sparse-format parent routes through the same
    translation (the mask becomes an output mask on the extract)."""
    from graphblas_tpu import tx as txmod

    with txmod.config.set(dense_limit=0):
        As = Matrix.from_coo([0, 0, 0, 1, 1, 1], [0, 1, 2, 0, 1, 2], [0, 1, 2, 3, 4, 5])
        assert As._sparse is not None
        result = As[0, [0, 1]].new(input_mask=M.S)
    assert result.isequal(Vector.from_coo([1], [1]))


# ---------------------------------------------------------------------------
# autocompute-off (reference core/automethods.py:14-28)
# ---------------------------------------------------------------------------


def test_autocompute_off_attribute_access_raises(A):
    with gb.config.set(autocompute=False):
        e = A.ewise_add(A, binary.plus)
        for attr in ("nvals", "T"):
            with pytest.raises(TypeError, match="autocompute"):
                getattr(e, attr)
        with pytest.raises(TypeError, match="autocompute"):
            e.reduce_scalar(monoid.plus)
        # explicit materialization always works
        out = e.new()
        assert out.nvals == 6
        assert out.reduce_scalar(monoid.plus).new().value == 30


def test_autocompute_off_infix_still_builds(A):
    with gb.config.set(autocompute=False):
        e = A @ A.T.new()
        assert type(e).__name__ == "MatMulExpr"
        out = e.new()
        assert out.nrows == 2
        with pytest.raises(TypeError, match="autocompute"):
            (A | A).nvals


def test_autocompute_off_scalar_expressions(A):
    with gb.config.set(autocompute=False):
        s = A.reduce_scalar(monoid.plus)
        with pytest.raises(TypeError, match="autocompute"):
            float(s)
        with pytest.raises(TypeError, match="autocompute"):
            bool(s)
        with pytest.raises(TypeError, match="autocompute"):
            int(s)
        assert s.new().value == 15
    # restored: autocompute back on — scalar dunders compute
    assert float(A.reduce_scalar(monoid.plus)) == 15.0
    assert int(A.reduce_scalar(monoid.plus)) == 15
    assert bool(A.reduce_scalar(monoid.plus))  # nonzero scalar -> True
    # non-scalar expressions never support bool()
    with pytest.raises(TypeError, match="__bool__ not defined"):
        bool(A.ewise_add(A, binary.plus))


def test_autocompute_off_repr_does_not_compute(A):
    with gb.config.set(autocompute=False):
        e = A.ewise_mult(A, binary.times)
        r = repr(e)
        assert "ewise_mult" in r or "times" in r


# ---------------------------------------------------------------------------
# build / dup on non-empty collections (reference core/matrix.py:627-682)
# ---------------------------------------------------------------------------


def test_build_on_nonempty_raises(A):
    with pytest.raises(exc.OutputNotEmpty):
        A.build([0], [0], [99])
    # unchanged
    assert A[0, 0].new().value == 0


def test_build_clear_true_replaces(A):
    A.build([1], [2], [99], clear=True)
    assert A.nvals == 1
    assert A[1, 2].new().value == 99


def test_build_after_clear(A):
    A.clear()
    A.build([0, 1], [1, 0], [7, 8])
    assert A.nvals == 2
    assert A[0, 1].new().value == 7


def test_build_duplicates_require_dup_op():
    A = Matrix(dtypes.INT64, 2, 2)
    with pytest.raises(ValueError, match="[Dd]uplicate"):
        A.build([0, 0], [0, 0], [1, 2])
    A.clear()
    A.build([0, 0], [0, 0], [1, 2], dup_op=binary.plus)
    assert A[0, 0].new().value == 3


def test_build_length_mismatch():
    A = Matrix(dtypes.INT64, 2, 2)
    with pytest.raises(ValueError, match="lengths must match|length"):
        A.build([0, 1], [0], [1, 2])


def test_vector_build_on_nonempty():
    v = Vector.from_coo([0], [1], size=3)
    with pytest.raises(exc.OutputNotEmpty):
        v.build([1], [2])
    v.build([1, 2], [5, 6], clear=True)
    assert v.nvals == 2


def test_dup_clear_gives_empty_same_shape(A):
    d = A.dup(clear=True)
    assert d.nvals == 0
    assert d.shape == A.shape
    assert d.dtype == A.dtype
    d2 = A.dup(dtypes.FP64, clear=True)
    assert d2.dtype == dtypes.FP64


def test_dup_then_mutate_is_independent(A):
    d = A.dup()
    d[0, 0] = 100
    assert A[0, 0].new().value == 0
    assert d[0, 0].new().value == 100
