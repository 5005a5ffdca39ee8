"""Additional golden repr tests (generated from live reprs, then frozen;
reference density model: graphblas/tests/test_formatting.py).  Strings are
asserted EXACTLY — regenerate deliberately if the format changes."""

import numpy as np

import graphblas_tpu as gb
from graphblas_tpu import Matrix, Scalar, Vector, binary, dtypes, semiring, unary

def test_golden_vector_bool():
    obj = Vector.from_coo([0, 2, 5], [True, False, True], dtypes.BOOL, size=7, name='v_bool')
    expected = '"v_bool"   nvals  size  dtype       format\ngb.Vector      3     7   BOOL  densemasked\n------------------------------------------\nindex     0 1      2 3 4     5 6\nvalue  True    False      True  '
    assert repr(obj) == expected


def test_golden_vector_int8():
    obj = Vector.from_coo([0, 2, 5], [1, 2, 3], dtypes.INT8, size=7, name='v_int8')
    expected = '"v_int8"   nvals  size  dtype       format\ngb.Vector      3     7   INT8  densemasked\n------------------------------------------\nindex  0 1  2 3 4  5 6\nvalue  1    2      3  '
    assert repr(obj) == expected


def test_golden_vector_int16():
    obj = Vector.from_coo([0, 2, 5], [1, 2, 3], dtypes.INT16, size=7, name='v_int16')
    expected = '"v_int16"  nvals  size  dtype       format\ngb.Vector      3     7  INT16  densemasked\n------------------------------------------\nindex  0 1  2 3 4  5 6\nvalue  1    2      3  '
    assert repr(obj) == expected


def test_golden_vector_int32():
    obj = Vector.from_coo([0, 2, 5], [1, 2, 3], dtypes.INT32, size=7, name='v_int32')
    expected = '"v_int32"  nvals  size  dtype       format\ngb.Vector      3     7  INT32  densemasked\n------------------------------------------\nindex  0 1  2 3 4  5 6\nvalue  1    2      3  '
    assert repr(obj) == expected


def test_golden_vector_int64():
    obj = Vector.from_coo([0, 2, 5], [1, 2, 3], dtypes.INT64, size=7, name='v_int64')
    expected = '"v_int64"  nvals  size  dtype       format\ngb.Vector      3     7  INT64  densemasked\n------------------------------------------\nindex  0 1  2 3 4  5 6\nvalue  1    2      3  '
    assert repr(obj) == expected


def test_golden_vector_uint8():
    obj = Vector.from_coo([0, 2, 5], [1, 2, 3], dtypes.UINT8, size=7, name='v_uint8')
    expected = '"v_uint8"  nvals  size  dtype       format\ngb.Vector      3     7  UINT8  densemasked\n------------------------------------------\nindex  0 1  2 3 4  5 6\nvalue  1    2      3  '
    assert repr(obj) == expected


def test_golden_vector_uint16():
    obj = Vector.from_coo([0, 2, 5], [1, 2, 3], dtypes.UINT16, size=7, name='v_uint16')
    expected = '"v_uint16"  nvals  size   dtype       format\ngb.Vector       3     7  UINT16  densemasked\n--------------------------------------------\nindex  0 1  2 3 4  5 6\nvalue  1    2      3  '
    assert repr(obj) == expected


def test_golden_vector_uint32():
    obj = Vector.from_coo([0, 2, 5], [1, 2, 3], dtypes.UINT32, size=7, name='v_uint32')
    expected = '"v_uint32"  nvals  size   dtype       format\ngb.Vector       3     7  UINT32  densemasked\n--------------------------------------------\nindex  0 1  2 3 4  5 6\nvalue  1    2      3  '
    assert repr(obj) == expected


def test_golden_vector_uint64():
    obj = Vector.from_coo([0, 2, 5], [1, 2, 3], dtypes.UINT64, size=7, name='v_uint64')
    expected = '"v_uint64"  nvals  size   dtype       format\ngb.Vector       3     7  UINT64  densemasked\n--------------------------------------------\nindex  0 1  2 3 4  5 6\nvalue  1    2      3  '
    assert repr(obj) == expected


def test_golden_vector_fp32():
    obj = Vector.from_coo([0, 2, 5], [1.5, -2.25, 0.5], dtypes.FP32, size=7, name='v_fp32')
    expected = '"v_fp32"   nvals  size  dtype       format\ngb.Vector      3     7   FP32  densemasked\n------------------------------------------\nindex    0 1      2 3 4    5 6\nvalue  1.5    -2.25      0.5  '
    assert repr(obj) == expected


def test_golden_vector_fp64():
    obj = Vector.from_coo([0, 2, 5], [1.5, -2.25, 0.5], dtypes.FP64, size=7, name='v_fp64')
    expected = '"v_fp64"   nvals  size  dtype       format\ngb.Vector      3     7   FP64  densemasked\n------------------------------------------\nindex    0 1      2 3 4    5 6\nvalue  1.5    -2.25      0.5  '
    assert repr(obj) == expected


def test_golden_vector_bf16():
    obj = Vector.from_coo([0, 2, 5], [1.5, -2.25, 0.5], dtypes.BF16, size=7, name='v_bf16')
    expected = '"v_bf16"   nvals  size  dtype       format\ngb.Vector      3     7   BF16  densemasked\n------------------------------------------\nindex    0 1      2 3 4    5 6\nvalue  1.5    -2.25      0.5  '
    assert repr(obj) == expected


def test_golden_scalar_int8():
    obj = Scalar.from_value(5, dtypes.INT8, name='s_int8')
    expected = '"s_int8"   value  dtype\ngb.Scalar      5   INT8'
    assert repr(obj) == expected


def test_golden_scalar_uint64():
    obj = Scalar.from_value(7, dtypes.UINT64, name='s_uint64')
    expected = '"s_uint64"  value   dtype\ngb.Scalar       7  UINT64'
    assert repr(obj) == expected


def test_golden_scalar_fp32():
    obj = Scalar.from_value(2.5, dtypes.FP32, name='s_fp32')
    expected = '"s_fp32"   value  dtype\ngb.Scalar    2.5   FP32'
    assert repr(obj) == expected


def test_golden_scalar_bool():
    obj = Scalar.from_value(True, dtypes.BOOL, name='s_bool')
    expected = '"s_bool"   value  dtype\ngb.Scalar   True   BOOL'
    assert repr(obj) == expected


def test_golden_vector_truncated():
    obj = Vector.from_coo(np.arange(0, 400, 4), np.arange(100.0), dtypes.FP64, size=400, name='big_v')
    expected = '"big_v"    nvals  size  dtype       format\ngb.Vector    100   400   FP64  densemasked\n------------------------------------------\nindex    0 1 2 3    4 5  ... 393 394 395   396 397 398 399\nvalue  0.0        1.0    ...              99.0            '
    assert repr(obj) == expected


def test_golden_matrix_truncated():
    obj = Matrix.from_coo(np.repeat(np.arange(30), 2), np.tile([3, 17], 30), np.arange(60, dtype=np.int64), nrows=30, ncols=25, name='big_A')
    expected = '"big_A"    nvals  nrows  ncols  dtype       format\ngb.Matrix     60     30     25  INT64  densemasked\n--------------------------------------------------\n     row  col  val\n0      0    3    0\n1      0   17    1\n2      1    3    2\n3      1   17    3\n4      2    3    4\n5      2   17    5\n6      3    3    6\n7      3   17    7\n8      4    3    8\n9      4   17    9\n...  ...  ...  ...'
    assert repr(obj) == expected


def test_golden_matrix_iso():
    obj = Matrix.from_scalar(7, 4, 5, dtypes.INT32, name='iso_A')
    expected = '"iso_A"    nvals  nrows  ncols  dtype             format\ngb.Matrix     20      4      5  INT32  densemasked (iso)\n--------------------------------------------------------\n   0  1  2  3  4\n0  7  7  7  7  7\n1  7  7  7  7  7\n2  7  7  7  7  7\n3  7  7  7  7  7'
    assert repr(obj) == expected


def test_golden_matrix_empty():
    obj = Matrix(dtypes.FP64, 3, 4, name='empty_A')
    expected = '"empty_A"  nvals  nrows  ncols  dtype       format\ngb.Matrix      0      3      4   FP64  densemasked\n--------------------------------------------------\n  0 1 2 3\n0        \n1        \n2        '
    assert repr(obj) == expected


def test_golden_vector_empty():
    obj = Vector(dtypes.INT16, 6, name='empty_v')
    expected = '"empty_v"  nvals  size  dtype       format\ngb.Vector      0     6  INT16  densemasked\n------------------------------------------\nindex 0 1 2 3 4 5\nvalue            '
    assert repr(obj) == expected


def test_golden_scalar_missing():
    obj = Scalar(dtypes.FP64, name='empty_s')
    expected = '"empty_s"  value  dtype\ngb.Scalar          FP64'
    assert repr(obj) == expected


def test_golden_expr_mxm():
    obj = Matrix.from_coo([0,1],[1,0],[1.,2.],nrows=2,ncols=2,name='A').mxm(Matrix.from_coo([0,1],[1,0],[3.,4.],nrows=2,ncols=2,name='B'), semiring.plus_times)
    expected = '                     nrows  ncols  dtype\ngb.MatrixExpression      2      2   FP64\n\nA.mxm(B, op=plus_times)\n\nComputed result (autocompute is enabled):\n           nvals  nrows  ncols  dtype       format\ngb.Matrix      2      2      2   FP64  densemasked\n--------------------------------------------------\n     0    1\n0  4.0     \n1       6.0'
    assert repr(obj) == expected


def test_golden_expr_ewise():
    obj = Vector.from_coo([0,1],[1.,2.],size=3,name='x').ewise_add(Vector.from_coo([1,2],[5.,6.],size=3,name='y'), binary.plus)
    expected = '                     size  dtype\ngb.VectorExpression     3   FP64\n\nx.ewise_add(y, op=plus)\n\nComputed result (autocompute is enabled):\n           nvals  size  dtype       format\ngb.Vector      3     3   FP64  densemasked\n------------------------------------------\nindex    0    1    2\nvalue  1.0  7.0  6.0'
    assert repr(obj) == expected


def test_golden_expr_apply():
    obj = Vector.from_coo([0,1],[1.,4.],size=3,name='x').apply(unary.sqrt)
    expected = '                     size  dtype\ngb.VectorExpression     3   FP64\n\nx.apply(op=sqrt)\n\nComputed result (autocompute is enabled):\n           nvals  size  dtype       format\ngb.Vector      2     3   FP64  densemasked\n------------------------------------------\nindex    0    1 2\nvalue  1.0  2.0  '
    assert repr(obj) == expected


def test_golden_expr_reduce():
    obj = Vector.from_coo([0,1],[1.,4.],size=3,name='x').reduce('plus')
    expected = '                     dtype\ngb.ScalarExpression   FP64\n\nx.reduce(op=plus)\n\nComputed result (autocompute is enabled):\n           value  dtype\ngb.Scalar    5.0   FP64'
    assert repr(obj) == expected


def test_golden_huge_dim_vector():
    obj = Vector.from_coo([0, 2**35, 2**40 - 1], [1.0, 2.0, 3.0], dtypes.FP64, size=2**40, name='huge_v')
    expected = '"huge_v"   nvals           size  dtype       format\ngb.Vector      3  1099511627776   FP64  densemasked\n---------------------------------------------------\n           index  val\n0              0  1.0\n1    34359738368  2.0\n2  1099511627775  3.0'
    assert repr(obj) == expected


