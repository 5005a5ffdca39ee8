"""Golden repr tests (reference: graphblas/tests/test_formatting.py, 5k LoC of
verbatim repr assertions).  Strings are asserted EXACTLY; regenerate via
tools (see git history) when the format intentionally changes."""

import numpy as np

import graphblas_tpu as gb
from graphblas_tpu import Matrix, Scalar, Vector, binary, dtypes, semiring, tx, unary


def test_golden_matrix_small():
    obj = Matrix.from_coo([0, 1, 2, 4], [1, 0, 2, 3], [1.5, 2.0, 3.0, 4.25], nrows=5, ncols=6, name="A")
    expected = '"A"        nvals  nrows  ncols  dtype       format\ngb.Matrix      4      5      6   FP64  densemasked\n--------------------------------------------------\n     0    1    2     3 4 5\n0       1.5               \n1  2.0                    \n2            3.0          \n3                         \n4                 4.25    '
    assert repr(obj) == expected


def test_golden_matrix_transposed():
    _base = Matrix.from_coo([0, 1, 2, 4], [1, 0, 2, 3], [1.5, 2.0, 3.0, 4.25], nrows=5, ncols=6, name="A")
    obj = _base.T
    expected = '"A.T"                nvals  nrows  ncols  dtype           format\ngb.TransposedMatrix      4      6      5   FP64  densemasked (T)\n----------------------------------------------------------------\n     0    1    2 3     4\n0       2.0             \n1  1.5                  \n2            3.0        \n3                   4.25\n4                       \n5                       '
    assert repr(obj) == expected


def test_golden_mask_S():
    _base = Matrix.from_coo([0, 1, 2, 4], [1, 0, 2, 3], [1.5, 2.0, 3.0, 4.25], nrows=5, ncols=6, name="A")
    obj = _base.S
    expected = '"A.S"           nvals  nrows  ncols  dtype       format\nStructuralMask\nof gb.Matrix        4      5      6   FP64  densemasked\n-------------------------------------------------------\n   0  1  2  3 4 5\n0     1          \n1  1             \n2        1       \n3                \n4           1    '
    assert repr(obj) == expected


def test_golden_mask_V():
    _base = Matrix.from_coo([0, 1, 2, 4], [1, 0, 2, 3], [1.5, 2.0, 3.0, 4.25], nrows=5, ncols=6, name="A")
    obj = _base.V
    expected = '"A.V"         nvals  nrows  ncols  dtype       format\nValueMask   \nof gb.Matrix      4      5      6   FP64  densemasked\n-----------------------------------------------------\n   0  1  2  3 4 5\n0     1          \n1  1             \n2        1       \n3                \n4           1    '
    assert repr(obj) == expected


def test_golden_mask_comp_S():
    _base = Matrix.from_coo([0, 1, 2, 4], [1, 0, 2, 3], [1.5, 2.0, 3.0, 4.25], nrows=5, ncols=6, name="A")
    obj = ~_base.S
    expected = '"~A.S"                      nvals  nrows  ncols  dtype       format\nComplementedStructuralMask\nof gb.Matrix                    4      5      6   FP64  densemasked\n-------------------------------------------------------------------\n   0  1  2  3  4  5\n0  1  0  1  1  1  1\n1  0  1  1  1  1  1\n2  1  1  0  1  1  1\n3  1  1  1  1  1  1\n4  1  1  1  0  1  1'
    assert repr(obj) == expected


def test_golden_mask_comp_V():
    _base = Matrix.from_coo([0, 1, 2, 4], [1, 0, 2, 3], [1.5, 2.0, 3.0, 4.25], nrows=5, ncols=6, name="A")
    obj = ~_base.V
    expected = '"~A.V"                 nvals  nrows  ncols  dtype       format\nComplementedValueMask\nof gb.Matrix               4      5      6   FP64  densemasked\n--------------------------------------------------------------\n   0  1  2  3  4  5\n0  1  0  1  1  1  1\n1  0  1  1  1  1  1\n2  1  1  0  1  1  1\n3  1  1  1  1  1  1\n4  1  1  1  0  1  1'
    assert repr(obj) == expected


def test_golden_vector_bool():
    obj = Vector.from_coo([0, 3], [True, False], size=5, dtype=dtypes.BOOL, name="v")
    expected = '"v"        nvals  size  dtype       format\ngb.Vector      2     5   BOOL  densemasked\n------------------------------------------\nindex     0 1 2      3 4\nvalue  True      False  '
    assert repr(obj) == expected


def test_golden_vector_mask_S():
    _base = Vector.from_coo([0, 3], [True, False], size=5, dtype=dtypes.BOOL, name="v")
    obj = _base.S
    expected = '"v.S"           nvals  size  dtype       format\nStructuralMask\nof gb.Vector        2     5   BOOL  densemasked\n-----------------------------------------------\nindex  0 1 2  3 4\nvalue  1      1  '
    assert repr(obj) == expected


def test_golden_vector_mask_comp_V():
    _base = Vector.from_coo([0, 3], [True, False], size=5, dtype=dtypes.BOOL, name="v")
    obj = ~_base.V
    expected = '"~v.V"                 nvals  size  dtype       format\nComplementedValueMask\nof gb.Vector               2     5   BOOL  densemasked\n------------------------------------------------------\nindex  0  1  2  3  4\nvalue  0  1  1  1  1'
    assert repr(obj) == expected


def test_golden_vector_int():
    obj = Vector.from_coo([1, 2, 4], [10, 20, 30], size=6, name="iv")
    expected = '"iv"       nvals  size  dtype       format\ngb.Vector      3     6  INT64  densemasked\n------------------------------------------\nindex 0   1   2 3   4 5\nvalue    10  20    30  '
    assert repr(obj) == expected


def test_golden_scalar():
    obj = Scalar.from_value(3.5, name="s")
    expected = '"s"        value  dtype\ngb.Scalar    3.5   FP64'
    assert repr(obj) == expected


def test_golden_scalar_empty():
    obj = Scalar(dtypes.INT32, name="empty_s")
    expected = '"empty_s"  value  dtype\ngb.Scalar         INT32'
    assert repr(obj) == expected


def test_golden_matrix_big_coo_fallback():
    obj = Matrix.from_coo(np.arange(50), np.arange(50), np.arange(50) * 0.5, nrows=50, ncols=50, name="Big")
    expected = '"Big"      nvals  nrows  ncols  dtype       format\ngb.Matrix     50     50     50   FP64  densemasked\n--------------------------------------------------\n     row  col  val\n0      0    0  0.0\n1      1    1  0.5\n2      2    2  1.0\n3      3    3  1.5\n4      4    4  2.0\n5      5    5  2.5\n6      6    6  3.0\n7      7    7  3.5\n8      8    8  4.0\n9      9    9  4.5\n...  ...  ...  ...'
    assert repr(obj) == expected


def test_golden_matrix_truncated_grid():
    obj = Matrix.from_dense(np.arange(30 * 25).reshape(30, 25) * 1.0, dtype=dtypes.FP64, name="D")
    expected = '"D"        nvals  nrows  ncols  dtype       format\ngb.Matrix    750     30     25   FP64  densemasked\n--------------------------------------------------\n         0      1      2      3      4      5  ...     18     19     20     21     22     23     24\n0      0.0    1.0    2.0    3.0    4.0    5.0  ...   18.0   19.0   20.0   21.0   22.0   23.0   24.0\n1     25.0   26.0   27.0   28.0   29.0   30.0  ...   43.0   44.0   45.0   46.0   47.0   48.0   49.0\n2     50.0   51.0   52.0   53.0   54.0   55.0  ...   68.0   69.0   70.0   71.0   72.0   73.0   74.0\n3     75.0   76.0   77.0   78.0   79.0   80.0  ...   93.0   94.0   95.0   96.0   97.0   98.0   99.0\n4    100.0  101.0  102.0  103.0  104.0  105.0  ...  118.0  119.0  120.0  121.0  122.0  123.0  124.0\n...    ...    ...    ...    ...    ...    ...  ...    ...    ...    ...    ...    ...    ...    ...\n16   400.0  401.0  402.0  403.0  404.0  405.0  ...  418.0  419.0  420.0  421.0  422.0  423.0  424.0\n17   425.0  426.0  427.0  428.0  429.0  430.0  ...  443.0  444.0  445.0  446.0  447.0  448.0  449.0\n18   450.0  451.0  452.0  453.0  454.0  455.0  ...  468.0  469.0  470.0  471.0  472.0  473.0  474.0\n19   475.0  476.0  477.0  478.0  479.0  480.0  ...  493.0  494.0  495.0  496.0  497.0  498.0  499.0\n20   500.0  501.0  502.0  503.0  504.0  505.0  ...  518.0  519.0  520.0  521.0  522.0  523.0  524.0\n21   525.0  526.0  527.0  528.0  529.0  530.0  ...  543.0  544.0  545.0  546.0  547.0  548.0  549.0\n22   550.0  551.0  552.0  553.0  554.0  555.0  ...  568.0  569.0  570.0  571.0  572.0  573.0  574.0\n23   575.0  576.0  577.0  578.0  579.0  580.0  ...  593.0  594.0  595.0  596.0  597.0  598.0  599.0\n24   600.0  601.0  602.0  603.0  604.0  605.0  ...  618.0  619.0  620.0  621.0  622.0  623.0  624.0\n25   625.0  626.0  627.0  628.0  629.0  630.0  ...  643.0  644.0  645.0  646.0  647.0  648.0  649.0\n26   650.0  651.0  652.0  653.0  654.0  655.0  ...  668.0  669.0  670.0  671.0  672.0  673.0  674.0\n27   675.0  676.0  677.0  678.0  679.0  680.0  ...  693.0  694.0  695.0  696.0  697.0  698.0  699.0\n28   700.0  701.0  702.0  703.0  704.0  705.0  ...  718.0  719.0  720.0  721.0  722.0  723.0  724.0\n29   725.0  726.0  727.0  728.0  729.0  730.0  ...  743.0  744.0  745.0  746.0  747.0  748.0  749.0'
    assert repr(obj) == expected


def test_golden_vector_truncated():
    obj = Vector.from_dense(np.arange(40) * 1.0, name="lv")
    expected = '"lv"       nvals  size  dtype       format\ngb.Vector     40    40   FP64  densemasked\n------------------------------------------\nindex    0    1    2    3    4    5  ...    33    34    35    36    37    38    39\nvalue  0.0  1.0  2.0  3.0  4.0  5.0  ...  33.0  34.0  35.0  36.0  37.0  38.0  39.0'
    assert repr(obj) == expected


def test_golden_matrix_iso():
    obj = Matrix.from_coo([0, 1, 2], [1, 2, 0], 7.0, nrows=3, ncols=3, name="I")
    expected = '"I"        nvals  nrows  ncols  dtype             format\ngb.Matrix      3      3      3   FP64  densemasked (iso)\n--------------------------------------------------------\n     0    1    2\n0       7.0     \n1            7.0\n2  7.0          '
    assert repr(obj) == expected


def test_golden_matrix_sparse_coo_format():
    with tx.config.set(dense_limit=0):
            _obj = Matrix.from_coo([0, 1], [1, 2], [9.0, 8.0], nrows=3, ncols=3, name="S")
    obj = _obj
    expected = '"S"        nvals  nrows  ncols  dtype  format\ngb.Matrix      2      3      3   FP64     coo\n---------------------------------------------\n  0    1    2\n0    9.0     \n1         8.0\n2            '
    assert repr(obj) == expected


def test_golden_expr_mxv():
    _base = Matrix.from_coo([0, 1, 2, 4], [1, 0, 2, 3], [1.5, 2.0, 3.0, 4.25], nrows=5, ncols=6, name="A")
    obj = _base.mxv(Vector.from_dense(np.ones(6), name="ones"), semiring.plus_times)
    expected = '                     size  dtype\ngb.VectorExpression     5   FP64\n\nA.mxv(ones, op=plus_times)\n\nComputed result (autocompute is enabled):\n           nvals  size  dtype       format\ngb.Vector      4     5   FP64  densemasked\n------------------------------------------\nindex    0    1    2 3     4\nvalue  1.5  2.0  3.0    4.25'
    assert repr(obj) == expected


def test_golden_expr_apply():
    _base = Matrix.from_coo([0, 1, 2, 4], [1, 0, 2, 3], [1.5, 2.0, 3.0, 4.25], nrows=5, ncols=6, name="A")
    obj = _base.apply(unary.sqrt)
    expected = '                     nrows  ncols  dtype\ngb.MatrixExpression      5      6   FP64\n\nA.apply(op=sqrt)\n\nComputed result (autocompute is enabled):\n           nvals  nrows  ncols  dtype       format\ngb.Matrix      4      5      6   FP64  densemasked\n--------------------------------------------------\n                    0                  1                   2                   3 4 5\n0                      1.224744871391589                                            \n1  1.4142135623730951                                                               \n2                                         1.7320508075688772                        \n3                                                                                   \n4                                                             2.0615528128088303    '
    assert repr(obj) == expected


def test_golden_expr_reduce_scalar():
    _base = Matrix.from_coo([0, 1, 2, 4], [1, 0, 2, 3], [1.5, 2.0, 3.0, 4.25], nrows=5, ncols=6, name="A")
    obj = _base.reduce_scalar(binary.plus)
    expected = '                     dtype\ngb.ScalarExpression   FP64\n\nA.reduce_scalar(op=plus)\n\nComputed result (autocompute is enabled):\n           value  dtype\ngb.Scalar  10.75   FP64'
    assert repr(obj) == expected


def test_golden_matrix_empty_dim():
    obj = Matrix(dtypes.FP64, 0, 4, name="Z")
    expected = '"Z"        nvals  nrows  ncols  dtype       format\ngb.Matrix      0      0      4   FP64  densemasked\n--------------------------------------------------'
    assert repr(obj) == expected



# ---- batch 2: dtype variety, masks on values, UDTs, HTML -----------------

def test_golden_matrix_int8():
    A = Matrix.from_coo([0, 1], [1, 0], [5, -3], dtype=dtypes.INT8, nrows=2, ncols=2, name="i8")
    expected = '"i8"       nvals  nrows  ncols  dtype       format\ngb.Matrix      2      2      2   INT8  densemasked\n--------------------------------------------------\n    0  1\n0      5\n1  -3   '
    assert repr(A) == expected


def test_golden_matrix_uint16():
    A = Matrix.from_coo([0], [0], [65535], dtype=dtypes.UINT16, nrows=1, ncols=2, name="u16")
    expected = '"u16"      nvals  nrows  ncols   dtype             format\ngb.Matrix      1      1      2  UINT16  densemasked (iso)\n---------------------------------------------------------\n       0 1\n0  65535  '
    assert repr(A) == expected


def test_golden_matrix_fp32():
    A = Matrix.from_coo([0, 1], [0, 1], [0.5, 1.25], dtype=dtypes.FP32, nrows=2, ncols=2, name="f32")
    expected = '"f32"      nvals  nrows  ncols  dtype       format\ngb.Matrix      2      2      2   FP32  densemasked\n--------------------------------------------------\n     0     1\n0  0.5      \n1       1.25'
    assert repr(A) == expected


def test_golden_vector_fp64_absent_tail():
    v = Vector.from_coo([0], [2.5], size=4, name="vt")
    expected = '"vt"       nvals  size  dtype             format\ngb.Vector      1     4   FP64  densemasked (iso)\n------------------------------------------------\nindex    0 1 2 3\nvalue  2.5      '
    assert repr(v) == expected


def test_golden_vector_empty():
    v = Vector(dtypes.FP64, 3, name="ve")
    expected = '"ve"       nvals  size  dtype       format\ngb.Vector      0     3   FP64  densemasked\n------------------------------------------\nindex 0 1 2\nvalue      '
    assert repr(v) == expected


def test_golden_matrix_all_empty():
    A = Matrix(dtypes.BOOL, 2, 2, name="mb")
    expected = '"mb"       nvals  nrows  ncols  dtype       format\ngb.Matrix      0      2      2   BOOL  densemasked\n--------------------------------------------------\n  0 1\n0    \n1    '
    assert repr(A) == expected


def test_golden_value_mask_int():
    A = Matrix.from_coo([0, 0, 1], [0, 1, 1], [0, 2, 3], nrows=2, ncols=2, name="VM")
    expected = '"VM.V"        nvals  nrows  ncols  dtype       format\nValueMask   \nof gb.Matrix      3      2      2  INT64  densemasked\n-----------------------------------------------------\n   0  1\n0  0  1\n1     1'
    assert repr(A.V) == expected


def test_golden_structural_on_value_zero():
    A = Matrix.from_coo([0, 0, 1], [0, 1, 1], [0, 2, 3], nrows=2, ncols=2, name="VM")
    expected = '"VM.S"          nvals  nrows  ncols  dtype       format\nStructuralMask\nof gb.Matrix        3      2      2  INT64  densemasked\n-------------------------------------------------------\n   0  1\n0  1  1\n1     1'
    assert repr(A.S) == expected


def test_golden_udt_vector():
    Point = dtypes.register_anonymous([("fx", "<f4"), ("fy", "<f4")], name="FmtPoint")
    v = Vector(Point, 2, name="pts")
    v[0] = (1.0, 2.0)
    expected = '"pts"      nvals  size     dtype       format\ngb.Vector      1     2  FmtPoint  densemasked\n---------------------------------------------\nindex           0 1\nvalue  (1.0, 2.0)  '
    assert repr(v) == expected


def test_golden_scalar_bool():
    s = Scalar.from_value(True, name="sb")
    expected = '"sb"       value  dtype\ngb.Scalar   True   BOOL'
    assert repr(s) == expected


def test_golden_transposed_sparse():
    with tx.config.set(dense_limit=0):
        S = Matrix.from_coo([0, 2], [1, 0], [4.0, 5.0], nrows=3, ncols=3, name="TS")
    expected = '"TS.T"               nvals  nrows  ncols  dtype   format\ngb.TransposedMatrix      2      3      3   FP64  coo (T)\n--------------------------------------------------------\n     0 1    2\n0         5.0\n1  4.0       \n2            '
    assert repr(S.T) == expected



def test_autocompute_off_expression_repr():
    A = Matrix.from_coo([0], [0], [1.0], nrows=1, ncols=1, name="A")
    expr = A.apply(unary.sqrt)
    with gb.config.set(autocompute=False):
        r = repr(expr)
    assert "Do expr.new() or other << expr to compute the result." in r
    assert "A.apply(op=sqrt" in r
    assert "Computed result" not in r


def test_expression_repr_shows_computed():
    A = Matrix.from_coo([0], [0], [4.0], nrows=1, ncols=1, name="A")
    r = repr(A.apply(unary.sqrt))
    assert "Computed result (autocompute is enabled):" in r
    assert "2.0" in r


def test_html_reprs_contain_tables():
    A = Matrix.from_coo([0, 1], [1, 0], [1.5, 2.5], nrows=2, ncols=2, name="A")
    h = A._repr_html_()
    assert "gb-info-table" in h and "nvals" in h and '"A"' in h
    v = Vector.from_coo([0], [1.0], size=2, name="v")
    hv = v._repr_html_()
    assert "gb.Vector" in hv and "size" in hv
    hm = A.S._repr_html_()
    assert "StructuralMask" in hm
    s = Scalar.from_value(2, name="s")
    assert "gb.Scalar" in s._repr_html_()


def test_header_alignment_invariants():
    # the dashed border always matches the header width
    for obj in [
        Matrix.from_coo([0], [0], [1.0], nrows=1, ncols=1, name="x"),
        Vector.from_coo([0], [1.0], size=1, name="y" * 20),
        Matrix.from_coo(np.arange(30), np.arange(30), 1.0, nrows=30, ncols=30),
    ]:
        lines = repr(obj).splitlines()
        border = [i for i, ln in enumerate(lines) if set(ln) == {"-"}]
        assert border, lines
        b = border[0]
        assert len(lines[b]) == len(lines[0])
        assert all(len(ln) <= len(lines[b]) for ln in lines[:b])
