"""UnaryOp: typed elementwise functions of one value.

Reference: /root/reference/graphblas/core/operator/unary.py (builtin parse
config at :144-172, registration at :173-395).  Builtins here are declarative
JAX functions instead of regex-parsed C symbols.
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
    SINTS,
    UINTS,
    OpBase,
    ParameterizedUdf,
    TypedUnaryOp,
)


class UnaryOp(OpBase):
    _typed_class = TypedUnaryOp
    _modname = "unary"
    _nargs = 1
    positional = None

    def __call__(self, val):
        return _b._call_op(self, val)

    @classmethod
    def register_anonymous(cls, func, name=None, *, parameterized=False, is_udt=False):
        """Register a unary op from a JAX-traceable Python function without
        installing it into the ``unary`` namespace.
        Reference: core/operator/unary.py:296-335."""
        if parameterized:
            return ParameterizedUdf(name or "unary.anonymous", func, True, cls.register_anonymous)
        op = cls(name or getattr(func, "__name__", "unary.anonymous"), anonymous=True)
        op.orig_func = func
        _build_from_func(op, func)
        return op

    @classmethod
    def register_new(cls, name, func, *, parameterized=False, is_udt=False, lazy=False):
        """Register a unary op and install it as ``graphblas_tpu.unary.<name>``.
        Reference: core/operator/unary.py:337-395."""
        import graphblas_tpu.unary as unary_module

        if parameterized:
            op = ParameterizedUdf(name, func, False, cls.register_anonymous)
        else:
            op = cls(name.rsplit(".", 1)[-1], anonymous=False)
            op.orig_func = func
            _build_from_func(op, func)
            op._modname = "unary"
        _dotted_set(unary_module, name, op)
        return op


def _dotted_set(module, name, value):
    """Install ``value`` at a possibly dotted path under ``module``
    (reference allows e.g. register_new("x.y.plus_one"))."""
    import types

    parts = name.split(".")
    target = module
    for part in parts[:-1]:
        nxt = getattr(target, part, None)
        if nxt is None:
            nxt = types.SimpleNamespace()
            setattr(target, part, nxt)
        target = nxt
    # use __dict__ (not hasattr) so lazy module __getattr__ hooks don't
    # fabricate a conflicting attribute during the check
    existing = getattr(target, "__dict__", {}).get(parts[-1])
    if existing is not None and not isinstance(existing, types.SimpleNamespace):
        raise AttributeError(f"{name} is already defined")
    setattr(target, parts[-1], value)


def _build_from_func(op, func, domains=ALL):
    """Try to specialize ``func`` for each builtin dtype via abstract eval."""
    for dtype in domains:
        try:
            ret = _b._output_dtype_of(func, dtype)
        except Exception:
            continue
        op._add(TypedUnaryOp(op, op.name, dtype, ret, func))
    if not op.types:
        # leave it; `_compile_dtype` may still succeed for UDTs
        pass
    return op


# ---------------------------------------------------------------------------
# Builtin table.  Each entry: (name, domains, ret_rule, fn_factory)
#   ret_rule: "same" | DataType | callable(dtype)->DataType
#   fn_factory: callable(dtype) -> jax-traceable function
# Float-domain ops get coercions BOOL/INT -> FP64 (reference installs the
# same coercions when parsing C symbols).
# ---------------------------------------------------------------------------


def _jnp():
    import jax.numpy as jnp

    return jnp


def _specs():
    import jax
    import jax.numpy as jnp
    from jax.scipy import special as jsp

    def const(fn):
        return lambda dtype: fn

    def identity_fn(dtype):
        return lambda x: x

    def ainv(dtype):
        if dtype._is_bool:
            return lambda x: x  # SuiteSparse: AINV_BOOL is identity
        return lambda x: -x

    def minv(dtype):
        if dtype._is_bool:
            return lambda x: x  # MINV_BOOL is identity
        if dtype._is_int:
            one = np.asarray(1, dtype.np_type)
            return lambda x: jax.lax.div(jnp.asarray(one), x)
        return lambda x: 1 / x

    def one_fn(dtype):
        one = np.asarray(1, dtype.np_type)
        return lambda x: jnp.full_like(x, one)

    def abs_fn(dtype):
        return lambda x: jnp.abs(x)

    def lnot(dtype):
        if dtype._is_bool:
            return lambda x: ~x
        return lambda x: (x == 0).astype(dtype.np_type)

    def bnot(dtype):
        return lambda x: ~x

    def signum(dtype):
        return lambda x: jnp.sign(x)

    def c_round(dtype):
        # C round(): half away from zero (differs from numpy banker's rounding)
        return lambda x: jnp.sign(x) * jnp.floor(jnp.abs(x) + 0.5)

    def frexpx(dtype):
        return lambda x: jnp.frexp(x)[0]

    def frexpe(dtype):
        return lambda x: jnp.frexp(x)[1].astype(dtype.np_type)

    def tgamma(dtype):
        if hasattr(jsp, "gamma"):
            return lambda x: jsp.gamma(x)
        return lambda x: jnp.exp(jsp.gammaln(x))  # positive-domain fallback

    FP_RULE = "same"

    specs = [
        ("identity", ALL, "same", identity_fn),
        ("ainv", ALL, "same", ainv),
        ("minv", ALL, "same", minv),
        ("one", ALL, "same", one_fn),
        ("abs", ALL, lambda dt: {_dt.FC32: _dt.FP32, _dt.FC64: _dt.FP64}.get(dt, dt), abs_fn),
        ("lnot", BOOLS + NUMS, "same", lnot),
        ("bnot", INTS, "same", bnot),
        ("signum", NUMS, "same", signum),
    ]

    # float (and complex where meaningful) math ops
    def F(name, fn, domains=FPS + FCS, ret=FP_RULE):
        specs.append((name, domains, ret, const(fn)))

    F("sqrt", jnp.sqrt)
    F("log", jnp.log)
    F("exp", jnp.exp)
    F("log2", jnp.log2)
    F("sin", jnp.sin)
    F("cos", jnp.cos)
    F("tan", jnp.tan)
    F("acos", jnp.arccos)
    F("asin", jnp.arcsin)
    F("atan", jnp.arctan)
    F("sinh", jnp.sinh)
    F("cosh", jnp.cosh)
    F("tanh", jnp.tanh)
    F("acosh", jnp.arccosh)
    F("asinh", jnp.arcsinh)
    F("atanh", jnp.arctanh)
    F("ceil", jnp.ceil, FPS)
    F("floor", jnp.floor, FPS)
    F("trunc", jnp.trunc, FPS)
    F("exp2", jnp.exp2)
    F("expm1", jnp.expm1)
    F("log10", jnp.log10)
    F("log1p", jnp.log1p)
    F("lgamma", jsp.gammaln, FPS)
    F("erf", jsp.erf, FPS)
    F("erfc", jsp.erfc, FPS)
    F("cbrt", jnp.cbrt, FPS)
    specs.append(("tgamma", FPS, "same", tgamma))
    specs.append(("round", FPS, "same", c_round))
    specs.append(("frexpx", FPS, "same", frexpx))
    specs.append(("frexpe", FPS, "same", frexpe))

    # complex ops
    specs.append(("conj", FCS, "same", const(jnp.conj)))
    cplx_ret = lambda dt: _dt.FP32 if dt is _dt.FC32 else _dt.FP64  # noqa: E731
    specs.append(("creal", FCS, cplx_ret, const(jnp.real)))
    specs.append(("cimag", FCS, cplx_ret, const(jnp.imag)))
    specs.append(("carg", FCS, cplx_ret, const(lambda x: jnp.angle(x))))

    # classification -> BOOL
    specs.append(("isinf", FPS + FCS, lambda dt: _dt.BOOL, const(jnp.isinf)))
    specs.append(("isnan", FPS + FCS, lambda dt: _dt.BOOL, const(jnp.isnan)))
    specs.append(("isfinite", FPS + FCS, lambda dt: _dt.BOOL, const(jnp.isfinite)))
    return specs


_FP_COERCIBLE = frozenset(
    "sqrt log exp log2 sin cos tan acos asin atan sinh cosh tanh acosh asinh atanh "
    "exp2 expm1 log10 log1p lgamma tgamma erf erfc cbrt ceil floor round trunc "
    "frexpx frexpe isinf isnan isfinite".split()
)

_POSITIONAL_UNARY = {
    # name -> (which index, offset); used by apply() with index injection
    "positioni": ("i", 0),
    "positioni1": ("i", 1),
    "positionj": ("j", 0),
    "positionj1": ("j", 1),
}


class PositionalUnaryOp(UnaryOp):
    def __init__(self, name, which, offset):
        super().__init__(name)
        self.positional = (which, offset)
        for dtype in (_dt.INT32, _dt.INT64):
            self._add(TypedUnaryOp(self, name, dtype, dtype, None))
        self.coercions.update(dict.fromkeys([d for d in ALL if d not in (_dt.INT32, _dt.INT64)], _dt.INT64))


def _initialize(module):
    """Populate the ``graphblas_tpu.unary`` namespace with builtins."""
    ops = {}
    for name, domains, ret_rule, fn_factory in _specs():
        op = UnaryOp(name)
        for dtype in domains:
            if ret_rule == "same":
                ret = dtype
            elif callable(ret_rule):
                ret = ret_rule(dtype)
            else:
                ret = ret_rule
            op._add(TypedUnaryOp(op, name, dtype, ret, fn_factory(dtype)))
        if name in _FP_COERCIBLE:
            # ints/bool compute in FP64 (reference installs identical coercions)
            for dtype in BOOLS + INTS:
                if dtype not in op.types:
                    op.coercions[dtype] = _dt.FP64
        ops[name] = op
    for name, (which, offset) in _POSITIONAL_UNARY.items():
        ops[name] = PositionalUnaryOp(name, which, offset)
    for name, op in ops.items():
        setattr(module, name, op)
    module._ops = ops
    return ops
