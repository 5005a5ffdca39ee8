"""BinaryOp: typed elementwise functions of two values.

Reference: /root/reference/graphblas/core/operator/binary.py (builtin parse
config :421-460, python-defined extras :307-367, commutes table :462+).
SuiteSparse BOOL-arithmetic identities (PLUS=LOR, TIMES=LAND, MINUS=LXOR, ...)
are reproduced so integer/bool results are bit-exact.
"""

import numpy as np

from .. import dtypes as _dt
from . import base as _b
from .base import (
    ALL,
    BOOLS,
    FCS,
    FPS,
    INTS,
    NUMS,
    NUMS_FC,
    OpBase,
    ParameterizedUdf,
    TypedBinaryOp,
)
from .unary import _dotted_set


class BinaryOp(OpBase):
    _typed_class = TypedBinaryOp
    _modname = "binary"
    _nargs = 2
    positional = None

    def __init__(self, name, *, anonymous=False):
        super().__init__(name, anonymous=anonymous)
        self._monoid = None
        self._commutes_to_name = None
        # values are substituted with 1 at absent positions before applying
        # (guards int division-by-zero on dense-masked storage)
        self._needs_safe_fill = False

    @property
    def monoid(self):
        """The Monoid this BinaryOp drives, if any (reference: binary.py:197-220)."""
        if self._monoid is None:
            # back-links are installed by monoid registration; force the lazy
            # builtin-monoid namespace so e.g. reduce("plus") works before
            # the user ever imports graphblas_tpu.monoid
            import graphblas_tpu.monoid  # noqa: F401
        return self._monoid

    @property
    def commutes_to(self):
        if self._commutes_to_name is None:
            return None
        import graphblas_tpu.binary as binmod

        return getattr(binmod, self._commutes_to_name, None)

    def __call__(self, left, right=None, *, left_default=None, right_default=None):
        return _b._call_op(self, left, right, left_default=left_default, right_default=right_default)

    @classmethod
    def register_anonymous(cls, func, name=None, *, parameterized=False, is_udt=False):
        if parameterized:
            return ParameterizedUdf(name or "binary.anonymous", func, True, cls.register_anonymous)
        op = cls(name or getattr(func, "__name__", "binary.anonymous"), anonymous=True)
        op.orig_func = func
        _build_from_func(op, func)
        return op

    @classmethod
    def register_new(cls, name, func, *, parameterized=False, is_udt=False, lazy=False):
        import graphblas_tpu.binary as binary_module

        if parameterized:
            op = ParameterizedUdf(name, func, False, cls.register_anonymous)
        else:
            op = cls(name.rsplit(".", 1)[-1], anonymous=False)
            op.orig_func = func
            _build_from_func(op, func)
        _dotted_set(binary_module, name, op)
        return op

    def _compile_dtype(self, dtype):
        if self.orig_func is None:
            return None
        if dtype in self._udt_cache:
            return self._udt_cache[dtype]
        ret = _b._output_dtype_of(self.orig_func, dtype, dtype)
        typed = TypedBinaryOp(self, self.name, dtype, ret, self.orig_func)
        self._udt_cache[dtype] = typed
        self.types[dtype] = ret
        self._typed_ops[dtype] = typed
        return typed


def _build_from_func(op, func, domains=ALL):
    for dtype in domains:
        try:
            ret = _b._output_dtype_of(func, dtype, dtype)
        except Exception:
            continue
        op._add(TypedBinaryOp(op, op.name, dtype, ret, func))
    return op


class PositionalBinaryOp(BinaryOp):
    """firsti/firstj/secondi/secondj[1]: value-ignoring index producers.

    In an eWise/apply context, "first" and "second" refer to the same (i, j);
    in an mxm context a(i,k)*b(k,j): firsti->i, firstj->k, secondi->k,
    secondj->j.  Reference: core/operator/base.py:33-87 (_SS_OPERATORS),
    binary parse config :421-460.
    """

    def __init__(self, name):
        super().__init__(name)
        which = name.rstrip("1")
        offset = 1 if name.endswith("1") else 0
        self.positional = (which, offset)
        for dtype in (_dt.INT32, _dt.INT64):
            self._add(TypedBinaryOp(self, name, dtype, dtype, None))
        self.coercions.update(
            dict.fromkeys([d for d in ALL if d not in (_dt.INT32, _dt.INT64)], _dt.INT64)
        )


_COMMUTES = {
    "plus": "plus",
    "times": "times",
    "any": "any",
    "pair": "pair",
    "oneb": "oneb",
    "min": "min",
    "max": "max",
    "first": "second",
    "second": "first",
    "minus": "rminus",
    "rminus": "minus",
    "div": "rdiv",
    "rdiv": "div",
    "cdiv": "rdiv",
    "truediv": "rtruediv",
    "rtruediv": "truediv",
    "floordiv": "rfloordiv",
    "rfloordiv": "floordiv",
    "pow": "rpow",
    "rpow": "pow",
    "gt": "lt",
    "lt": "gt",
    "ge": "le",
    "le": "ge",
    "eq": "eq",
    "ne": "ne",
    "iseq": "iseq",
    "isne": "isne",
    "isgt": "islt",
    "islt": "isgt",
    "isge": "isle",
    "isle": "isge",
    "land": "land",
    "lor": "lor",
    "lxor": "lxor",
    "lxnor": "lxnor",
    "bor": "bor",
    "band": "band",
    "bxor": "bxor",
    "bxnor": "bxnor",
    "hypot": "hypot",
    "absfirst": "abssecond",
    "abssecond": "absfirst",
    "firsti": "secondi",
    "firsti1": "secondi1",
    "firstj": "secondj",
    "firstj1": "secondj1",
    "secondi": "firsti",
    "secondi1": "firsti1",
    "secondj": "firstj",
    "secondj1": "firstj1",
}

_SAFE_FILL = frozenset(
    "div cdiv rdiv truediv rtruediv floordiv rfloordiv fmod remainder pow rpow binom".split()
)

_FP_COERCIBLE = frozenset("atan2 hypot fmod remainder ldexp copysign truediv rtruediv".split())


def _specs():
    import jax
    import jax.numpy as jnp

    def const(fn):
        return lambda dtype: fn

    def truthy(x):
        return x != 0

    def as_t(dtype):
        def cast(v):
            return v.astype(dtype.np_type) if hasattr(v, "astype") else np.asarray(v, dtype.np_type)

        return cast

    # --- arithmetic with SuiteSparse BOOL identities -------------------------
    def plus(dt):
        if dt._is_bool:
            return lambda x, y: x | y
        return lambda x, y: x + y

    def minus(dt):
        if dt._is_bool:
            return lambda x, y: x ^ y
        return lambda x, y: x - y

    def rminus(dt):
        if dt._is_bool:
            return lambda x, y: x ^ y
        return lambda x, y: y - x

    def times(dt):
        if dt._is_bool:
            return lambda x, y: x & y
        return lambda x, y: x * y

    def cdiv(dt):
        if dt._is_bool:
            return lambda x, y: x  # DIV_BOOL = FIRST
        if dt._is_int:
            return lambda x, y: jax.lax.div(x, jnp.where(y == 0, np.asarray(1, dt.np_type), y)) * (
                y != 0
            ).astype(dt.np_type)
        return lambda x, y: x / y

    def rdiv(dt):
        inner = cdiv(dt)
        if dt._is_bool:
            return lambda x, y: y
        return lambda x, y: inner(y, x)

    def truediv(dt):
        return lambda x, y: x / y

    def rtruediv(dt):
        return lambda x, y: y / x

    def floordiv(dt):
        if dt._is_int:
            return lambda x, y: jnp.where(y == 0, np.asarray(0, dt.np_type), x // jnp.where(y == 0, np.asarray(1, dt.np_type), y))
        return lambda x, y: x // y

    def rfloordiv(dt):
        inner = floordiv(dt)
        return lambda x, y: inner(y, x)

    def pow_(dt):
        if dt._is_bool:
            return lambda x, y: x | ~y
        return lambda x, y: jnp.power(x, y)

    def rpow(dt):
        inner = pow_(dt)
        return lambda x, y: inner(y, x)

    def min_(dt):
        if dt._is_bool:
            return lambda x, y: x & y
        return lambda x, y: jnp.minimum(x, y)

    def max_(dt):
        if dt._is_bool:
            return lambda x, y: x | y
        return lambda x, y: jnp.maximum(x, y)

    def binom(dt):
        # binomial coefficient C(x, y); reference: binary.py:341-352
        from jax.scipy import special as jsp

        def f(x, y):
            xf = x.astype(np.float64) if hasattr(x, "astype") else np.float64(x)
            yf = y.astype(np.float64) if hasattr(y, "astype") else np.float64(y)
            res = jnp.exp(jsp.gammaln(xf + 1) - jsp.gammaln(yf + 1) - jsp.gammaln(xf - yf + 1))
            res = jnp.where((yf < 0) | (yf > xf), 0.0, res)
            return jnp.round(res).astype(dt.np_type) if dt._is_int else res.astype(dt.np_type)

        return f

    # --- logical over all numeric (nonzero = true, result same dtype) -------
    def L(op):
        def factory(dt):
            if dt._is_bool:
                return {
                    "land": lambda x, y: x & y,
                    "lor": lambda x, y: x | y,
                    "lxor": lambda x, y: x ^ y,
                    "lxnor": lambda x, y: x == y,
                }[op]
            cast = as_t(dt)
            return {
                "land": lambda x, y: cast(truthy(x) & truthy(y)),
                "lor": lambda x, y: cast(truthy(x) | truthy(y)),
                "lxor": lambda x, y: cast(truthy(x) ^ truthy(y)),
                "lxnor": lambda x, y: cast(truthy(x) == truthy(y)),
            }[op]

        return factory

    # --- is* comparisons returning same dtype --------------------------------
    def IS(op):
        def factory(dt):
            cast = as_t(dt)
            return {
                "iseq": lambda x, y: cast(x == y),
                "isne": lambda x, y: cast(x != y),
                "isgt": lambda x, y: cast(x > y),
                "islt": lambda x, y: cast(x < y),
                "isge": lambda x, y: cast(x >= y),
                "isle": lambda x, y: cast(x <= y),
            }[op]

        return factory

    # --- bitwise --------------------------------------------------------------
    def nbits(dt):
        return dt.np_type.itemsize * 8

    def bget(dt):
        n = nbits(dt)

        def f(x, y):
            k = y.astype(np.int64)
            ok = (k >= 1) & (k <= n)
            kk = jnp.clip(k - 1, 0, n - 1).astype(dt.np_type)
            return jnp.where(ok, (x >> kk) & np.asarray(1, dt.np_type), np.asarray(0, dt.np_type))

        return f

    def bset(dt):
        n = nbits(dt)

        def f(x, y):
            k = y.astype(np.int64)
            ok = (k >= 1) & (k <= n)
            kk = jnp.clip(k - 1, 0, n - 1).astype(dt.np_type)
            return jnp.where(ok, x | (np.asarray(1, dt.np_type) << kk), x)

        return f

    def bclr(dt):
        n = nbits(dt)

        def f(x, y):
            k = y.astype(np.int64)
            ok = (k >= 1) & (k <= n)
            kk = jnp.clip(k - 1, 0, n - 1).astype(dt.np_type)
            return jnp.where(ok, x & ~(np.asarray(1, dt.np_type) << kk), x)

        return f

    def bshift(dt):
        n = nbits(dt)
        signed = dt._is_signed_int

        def f(x, y):
            k = y.astype(np.int64)
            kl = jnp.clip(k, 0, n - 1).astype(dt.np_type)
            kr = jnp.clip(-k, 0, n - 1).astype(dt.np_type)
            left = jnp.where(k >= n, np.asarray(0, dt.np_type), x << kl)
            rshifted = x >> kr
            if signed:
                fill = jnp.where(x < 0, np.asarray(-1, dt.np_type), np.asarray(0, dt.np_type))
            else:
                fill = np.asarray(0, dt.np_type)
            right = jnp.where(-k >= n, fill, rshifted)
            return jnp.where(k >= 0, left, right)

        return f

    # --- float math -----------------------------------------------------------
    def fmod(dt):
        return lambda x, y: jnp.fmod(x, y)

    def remainder(dt):
        # C remainder(): x - round(x/y)*y with round-half-even
        def f(x, y):
            q = jnp.round(x / y)
            return x - q * y

        return f

    def ldexp(dt):
        return lambda x, y: jnp.ldexp(x, y.astype(np.int32))

    def cmplx_ret(dt):
        return _dt.FC32 if dt is _dt.FP32 else _dt.FC64

    def cmplx(dt):
        ct = cmplx_ret(dt).np_type
        return lambda x, y: (x + np.asarray(1j, ct) * y).astype(ct)

    specs = [
        # (name, domains, ret_rule, fn_factory)
        ("first", ALL, "same", lambda dt: (lambda x, y: x)),
        ("second", ALL, "same", lambda dt: (lambda x, y: y)),
        ("any", ALL, "same", lambda dt: (lambda x, y: x)),
        ("pair", ALL, "same", lambda dt: (lambda x, y: jnp.full_like(x, 1))),
        ("oneb", ALL, "same", lambda dt: (lambda x, y: jnp.full_like(x, 1))),
        ("plus", ALL, "same", plus),
        ("minus", ALL, "same", minus),
        ("rminus", ALL, "same", rminus),
        ("times", ALL, "same", times),
        ("cdiv", ALL, "same", cdiv),
        ("rdiv", ALL, "same", rdiv),
        ("truediv", FPS + FCS, "same", truediv),
        ("rtruediv", FPS + FCS, "same", rtruediv),
        ("floordiv", NUMS, "same", floordiv),
        ("rfloordiv", NUMS, "same", rfloordiv),
        ("pow", ALL, "same", pow_),
        ("rpow", ALL, "same", rpow),
        ("min", BOOLS + NUMS, "same", min_),
        ("max", BOOLS + NUMS, "same", max_),
        ("binom", INTS, "same", binom),
        ("absfirst", BOOLS + NUMS, "same", lambda dt: (lambda x, y: abs(x))),
        ("abssecond", BOOLS + NUMS, "same", lambda dt: (lambda x, y: abs(y))),
        ("land", BOOLS + NUMS, "same", L("land")),
        ("lor", BOOLS + NUMS, "same", L("lor")),
        ("lxor", BOOLS + NUMS, "same", L("lxor")),
        ("lxnor", BOOLS + NUMS, "same", L("lxnor")),
        ("iseq", BOOLS + NUMS, "same", IS("iseq")),
        ("isne", BOOLS + NUMS, "same", IS("isne")),
        ("isgt", BOOLS + NUMS, "same", IS("isgt")),
        ("islt", BOOLS + NUMS, "same", IS("islt")),
        ("isge", BOOLS + NUMS, "same", IS("isge")),
        ("isle", BOOLS + NUMS, "same", IS("isle")),
        ("eq", ALL, lambda dt: _dt.BOOL, lambda dt: (lambda x, y: x == y)),
        ("ne", ALL, lambda dt: _dt.BOOL, lambda dt: (lambda x, y: x != y)),
        ("gt", BOOLS + NUMS, lambda dt: _dt.BOOL, lambda dt: (lambda x, y: x > y)),
        ("lt", BOOLS + NUMS, lambda dt: _dt.BOOL, lambda dt: (lambda x, y: x < y)),
        ("ge", BOOLS + NUMS, lambda dt: _dt.BOOL, lambda dt: (lambda x, y: x >= y)),
        ("le", BOOLS + NUMS, lambda dt: _dt.BOOL, lambda dt: (lambda x, y: x <= y)),
        ("bor", INTS, "same", lambda dt: (lambda x, y: x | y)),
        ("band", INTS, "same", lambda dt: (lambda x, y: x & y)),
        ("bxor", INTS, "same", lambda dt: (lambda x, y: x ^ y)),
        ("bxnor", INTS, "same", lambda dt: (lambda x, y: ~(x ^ y))),
        ("bget", INTS, "same", bget),
        ("bset", INTS, "same", bset),
        ("bclr", INTS, "same", bclr),
        ("bshift", INTS, "same", bshift),
        ("atan2", FPS, "same", lambda dt: (lambda x, y: jnp.arctan2(x, y))),
        ("hypot", FPS, "same", lambda dt: (lambda x, y: jnp.hypot(x, y))),
        ("fmod", FPS, "same", fmod),
        ("remainder", FPS, "same", remainder),
        ("ldexp", FPS, "same", ldexp),
        ("copysign", FPS, "same", lambda dt: (lambda x, y: jnp.copysign(x, y))),
        ("cmplx", FPS, cmplx_ret, cmplx),
    ]
    return specs


def _isclose(rel_tol=1e-7, abs_tol=0.0):
    """Parameterized isclose (reference: binary.py:354-367)."""
    import jax.numpy as jnp

    def inner(x, y):
        return jnp.abs(x - y) <= jnp.maximum(rel_tol * jnp.maximum(jnp.abs(x), jnp.abs(y)), abs_tol)

    return inner


_POSITIONAL_BINARY = [
    "firsti",
    "firsti1",
    "firstj",
    "firstj1",
    "secondi",
    "secondi1",
    "secondj",
    "secondj1",
]


def _initialize(module):
    ops = {}
    for name, domains, ret_rule, fn_factory in _specs():
        op = BinaryOp(name)
        for dtype in domains:
            if ret_rule == "same":
                ret = dtype
            elif callable(ret_rule):
                ret = ret_rule(dtype)
            else:
                ret = ret_rule
            op._add(TypedBinaryOp(op, name, dtype, ret, fn_factory(dtype)))
        if name in _FP_COERCIBLE:
            for dtype in BOOLS + INTS:
                if dtype not in op.types:
                    op.coercions[dtype] = _dt.FP64
        op._commutes_to_name = _COMMUTES.get(name)
        op._needs_safe_fill = name in _SAFE_FILL
        ops[name] = op
    # `div` is C-style truncated division, aliased like the reference renames
    # *_div -> *_cdiv (core/operator/semiring.py:424-588)
    ops["div"] = ops["cdiv"]
    for name in _POSITIONAL_BINARY:
        ops[name] = PositionalBinaryOp(name)
    ops["isclose"] = ParameterizedUdf("isclose", _isclose, False, BinaryOp.register_anonymous)
    for name, op in ops.items():
        setattr(module, name, op)
    module._ops = ops
    return ops
