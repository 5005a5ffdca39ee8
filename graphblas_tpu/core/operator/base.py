"""Operator registry backbone.

Reference analogue: /root/reference/graphblas/core/operator/base.py.  The
reference builds its builtin tables by regexing the C symbol table
(base.py:803-893) and holds cffi handles per typed op; here every typed op
holds a **JAX-traceable Python function** plus dtype metadata, and builtin
tables are generated from declarative specs in the per-kind modules.  UDFs are
plain Python functions traced by JAX — no numba, no cfunc pointers
(replaces base.py:182-507).
"""

import itertools

import numpy as np

from .. import dtypes as _dt
from ... import exceptions as _exc

# ---------------------------------------------------------------------------
# Dtype groups used by the builtin spec tables
# ---------------------------------------------------------------------------

BOOLS = (_dt.BOOL,)
SINTS = (_dt.INT8, _dt.INT16, _dt.INT32, _dt.INT64)
UINTS = (_dt.UINT8, _dt.UINT16, _dt.UINT32, _dt.UINT64)
INTS = SINTS + UINTS
FPS = (_dt.FP32, _dt.FP64)
FCS = (_dt.FC32, _dt.FC64)
NUMS = INTS + FPS
NUMS_FC = NUMS + FCS
ALL = BOOLS + NUMS_FC
ALL_NOFC = BOOLS + NUMS

_POSITIONAL_NAMES = frozenset(
    [
        "firsti",
        "firsti1",
        "firstj",
        "firstj1",
        "secondi",
        "secondi1",
        "secondj",
        "secondj1",
        "positioni",
        "positioni1",
        "positionj",
        "positionj1",
        # index-unary positional
        "rowindex",
        "colindex",
        "diagindex",
        "tril",
        "triu",
        "diag",
        "offdiag",
        "colle",
        "colgt",
        "rowle",
        "rowgt",
        "indexle",
        "indexgt",
    ]
)


def _udt_aval(dt):
    """Abstract value for a dtype: a dict of field scalars for UDTs."""
    import jax

    if dt._is_udt:
        return {f: jax.ShapeDtypeStruct((), dt.np_type[f]) for f in dt.np_type.names}
    return jax.ShapeDtypeStruct((), dt.np_type)


def _output_dtype_of(fn, *input_dtypes):
    """Discover the output dtype of a scalar function via abstract evaluation.
    UDT arguments are passed as dicts of field scalars (SoA convention); a
    dict output means "same UDT" (UDF closure over the field structure)."""
    import jax

    try:
        out = jax.eval_shape(fn, *(_udt_aval(dt) for dt in input_dtypes))
    except Exception as exc:
        raise _exc.UdfParseError(f"unable to trace user-defined function: {exc}") from exc
    if isinstance(out, dict):
        fields = [(name, np.dtype(sds.dtype)) for name, sds in out.items()]
        return _dt.register_anonymous(np.dtype(fields))
    return _dt.lookup_dtype(np.dtype(out.dtype))


# ---------------------------------------------------------------------------
# Typed ops: an op specialized to concrete input dtype(s)
# ---------------------------------------------------------------------------


class TypedOpBase:
    __slots__ = ("parent", "name", "type_", "type2", "return_type", "fn", "_custom")

    def __init__(self, parent, name, type_, return_type, fn, type2=None):
        self.parent = parent
        self.name = name
        self.type_ = type_
        self.type2 = type2 if type2 is not None else type_
        self.return_type = return_type
        self.fn = fn

    @property
    def opclass(self):
        return type(self).__name__.removeprefix("Typed")

    @property
    def _carg(self):  # parity shim; identifies the op in the recorder
        return f"{self.parent!r}[{self.type_.name}]"

    def __repr__(self):
        return f"{self.parent!r}[{self.type_.name}]"

    def __reduce__(self):
        return (_deserialize_typed, (self.parent, self.type_.name))

    # positional metadata proxied from the parent
    @property
    def positional(self):
        return getattr(self.parent, "positional", None)

    @property
    def is_positional(self):
        return self.positional is not None


def _deserialize_typed(parent, typename):
    return parent[typename]


class TypedUnaryOp(TypedOpBase):
    __slots__ = ()

    def __call__(self, val):
        return _call_op(self, val)


class TypedBinaryOp(TypedOpBase):
    __slots__ = ()

    @property
    def monoid(self):
        m = self.parent.monoid
        if m is not None and self.type_ in m.types:
            return m[self.type_]
        return None

    @property
    def commutes_to(self):
        c = self.parent.commutes_to
        return c[self.type_] if c is not None and self.type_ in c.types else None

    def __call__(self, left, right=None, *, left_default=None, right_default=None):
        return _call_op(self, left, right, left_default=left_default, right_default=right_default)


class TypedMonoid(TypedOpBase):
    __slots__ = ("binaryop", "identity")

    def __init__(self, parent, name, type_, return_type, fn, binaryop, identity):
        super().__init__(parent, name, type_, return_type, fn, type2=type_)
        self.binaryop = binaryop
        self.identity = identity

    @property
    def is_idempotent(self):
        return self.parent.is_idempotent

    def __call__(self, left, right=None):
        return _call_op(self, left, right)


class TypedSemiring(TypedOpBase):
    __slots__ = ("monoid", "binaryop")

    def __init__(self, parent, name, type_, return_type, monoid, binaryop, type2=None):
        super().__init__(parent, name, type_, return_type, None, type2=type2)
        self.monoid = monoid
        self.binaryop = binaryop

    @property
    def is_positional(self):
        return self.binaryop.is_positional

    def __call__(self, left, right=None):
        return _call_op(self, left, right)


class TypedIndexUnaryOp(TypedOpBase):
    """fn signature: fn(value, row, col, thunk) -> value."""

    __slots__ = ()

    def __call__(self, val, thunk=None):
        return _call_op(self, val, thunk=thunk)


class TypedSelectOp(TypedOpBase):
    """Same as TypedIndexUnaryOp but return type is always BOOL."""

    __slots__ = ()

    def __call__(self, val, thunk=None):
        return _call_op(self, val, thunk=thunk)


class TypedIndexBinaryOp(TypedOpBase):
    """fn signature: fn(x, ix, jx, y, iy, jy, theta) -> value."""

    __slots__ = ()


def _call_op(op, left, right=None, *, thunk=None, left_default=None, right_default=None):
    """Make typed/untyped ops callable on collections & infix expressions,
    mirroring reference core/operator/base.py __call__ dispatch."""
    from ..infix import InfixExprBase
    from ..base import BaseType

    opclass = op.opclass
    if opclass in {"UnaryOp"}:
        return left.apply(op)
    if opclass in {"IndexUnaryOp", "SelectOp"}:
        if opclass == "SelectOp":
            return left.select(op, thunk)
        return left.apply(op, thunk=thunk)
    if right is None:
        if isinstance(left, InfixExprBase):
            return left._apply_op(op, left_default=left_default, right_default=right_default)
        raise TypeError(
            f"Bad type when calling {op!r}.\n    - Expected an infix expression like"
            f" (A | B) or (A & B) or (A @ B)\n    - Got {type(left)}"
        )
    # op(left, right) where one side may be a scalar -> bound apply
    if isinstance(left, BaseType) or isinstance(right, BaseType):
        from ..scalar import _is_scalar_like

        if _is_scalar_like(right):
            return left.apply(op, right=right)
        if _is_scalar_like(left):
            return right.apply(op, left=left)
        raise TypeError(
            f"Bad types when calling {op!r}. When two arguments are given, one must be a scalar.\n"
            f"    - Got {type(left)} and {type(right)}"
        )
    raise TypeError(f"Bad types when calling {op!r}: {type(left)}, {type(right)}")


# ---------------------------------------------------------------------------
# Untyped ops: name -> {dtype: typed op}
# ---------------------------------------------------------------------------


class OpBase:
    _typed_class = None
    _modname = "op"

    def __init__(self, name, *, anonymous=False):
        self.name = name
        self._anonymous = anonymous
        self._typed_ops = {}
        self.types = {}  # input DataType -> return DataType
        self.coercions = {}  # input DataType -> DataType actually used
        self.orig_func = None
        self._udt_cache = {}

    # -- registry access ----------------------------------------------------

    def __getitem__(self, type_):
        dtype = _dt.lookup_dtype(type_)
        if dtype in self._typed_ops:
            return self._typed_ops[dtype]
        if dtype in self.coercions:
            return self._typed_ops[self.coercions[dtype]]
        typed = self._compile_dtype(dtype)
        if typed is not None:
            return typed
        raise KeyError(f"{self.name} does not work with {dtype}")

    def _compile_dtype(self, dtype):
        """Build a typed op on demand for a new dtype (UDTs, unusual dtypes)
        from the generic Python function, via JAX abstract evaluation.
        Replaces the reference's numba ``_compile_udt`` (base.py:182-507)."""
        if self.orig_func is None:
            return None
        if dtype in self._udt_cache:
            return self._udt_cache[dtype]
        nargs = getattr(self, "_nargs", 1)
        ret = _output_dtype_of(self.orig_func, *([dtype] * nargs))
        typed = self._typed_class(self, self.name, dtype, ret, self.orig_func)
        self._udt_cache[dtype] = typed
        self.types[dtype] = ret
        self._typed_ops[dtype] = typed
        return typed

    def __contains__(self, type_):
        try:
            self[type_]
        except (TypeError, KeyError, ValueError, _exc.UdfParseError):
            return False
        return True

    def __repr__(self):
        return f"{self._modname}.{self.name}"

    def __reduce__(self):
        if self._anonymous:
            if self.orig_func is not None:
                return (self.register_anonymous, (self.orig_func, self.name))
            raise NotImplementedError("Cannot pickle this anonymous operator")
        name = f"{self._modname}.{self.name}"
        return (_deserialize_op_by_name, (name,))

    def _add(self, typed_op, dtype=None):
        dtype = typed_op.type_ if dtype is None else dtype
        self._typed_ops[dtype] = typed_op
        self.types[dtype] = typed_op.return_type

    positional = None  # overridden per-instance by positional ops

    @property
    def opclass(self):
        return type(self).__name__

    @property
    def is_positional(self):
        return self.positional is not None


def _deserialize_op_by_name(qualname):
    import importlib

    modname, opname = qualname.rsplit(".", 1)
    module = importlib.import_module(f"graphblas_tpu.{modname}")
    return getattr(module, opname)


class ParameterizedUdf:
    """An operator factory: calling it with parameters yields a concrete op.

    Reference: core/operator/base.py:646-687.
    """

    def __init__(self, name, func, anonymous, register, *, is_udt=False):
        self.name = name
        self.func = func
        self._anonymous = anonymous
        self._register = register
        self._cache = {}

    def __call__(self, *args, **kwargs):
        key = (args, tuple(sorted(kwargs.items())))
        try:
            if key in self._cache:
                return self._cache[key]
        except TypeError:
            key = None
        inner = self.func(*args, **kwargs)
        op = self._register(inner, f"{self.name}({', '.join(map(repr, args))})")
        if key is not None:
            self._cache[key] = op
        return op

    def __repr__(self):
        return f"ParameterizedUdf<{self.name}>"


def find_opclass(op):
    """Return (op, opclass_name) (reference: core/operator/base.py:945-957)."""
    from .agg import Aggregator, TypedAggregator

    if isinstance(op, OpBase):
        return op, op.opclass
    if isinstance(op, TypedOpBase):
        return op, op.opclass
    if isinstance(op, (Aggregator, TypedAggregator)):
        return op, "Aggregator"
    if isinstance(op, ParameterizedUdf):
        return op, "ParameterizedUdf"
    if callable(op):
        return op, "UserDefined"
    return op, "UnknownOpClass"


def _all_pairs(domains):
    return itertools.product(domains, repeat=2)
