"""EEL2 numeric semantics on jnp time-series (the vector counterpart of
semantics/scalar.py — keep the two in lockstep).

All values are f64 arrays; int ops truncate toward zero to i64, wrap to
i32, and return f64.  Comparisons are ordered (NaN -> 0.0) and produce
1.0/0.0.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

F64 = jnp.float64
I32 = jnp.int32
I64 = jnp.int64


def to_i64(x):
    # fptosi-style trunc toward zero; NaN/inf are UB upstream, clamp here
    return jnp.trunc(x).astype(I64)


def to_i32(x):
    return to_i64(x).astype(I32)  # wraps mod 2^32


def from_i(x):
    return x.astype(F64)


def eel_or(a, b):
    return from_i(to_i32(a) | to_i32(b))


def eel_and(a, b):
    return from_i(to_i32(a) & to_i32(b))


def eel_xor(a, b):
    return from_i(to_i32(a) ^ to_i32(b))


def eel_shl(a, b):
    return from_i(to_i32(a) << (to_i32(b) & 31))


def eel_shr(a, b):
    return from_i(to_i32(a) >> (to_i32(b) & 31))  # arithmetic on int32


def eel_mod(a, b):
    li, ri = to_i32(a), to_i32(b)
    mag = jnp.where(ri == 0, jnp.zeros_like(li), jnp.abs(li) % jnp.maximum(jnp.abs(ri), 1))
    return from_i(jnp.where(li < 0, -mag, mag))


def eel_div(a, b):
    return a / b  # IEEE: inf/NaN, never raises


def eel_pow(a, b):
    # XLA pow follows C pow edge cases (neg base frac exp -> NaN, etc.)
    return jnp.power(a, b)


def _bool_to_f(c):
    return c.astype(F64)


def cmp_lt(a, b):
    return _bool_to_f(a < b)


def cmp_le(a, b):
    return _bool_to_f(a <= b)


def cmp_gt(a, b):
    return _bool_to_f(a > b)


def cmp_ge(a, b):
    return _bool_to_f(a >= b)


def cmp_eq(a, b):
    return _bool_to_f(a == b)


def cmp_ne(a, b):
    # ordered: NaN present -> 0
    return _bool_to_f((a == a) & (b == b) & (a != b))


def truthy_mask(x):
    return (x < 0.0) | (x > 0.0)  # NaN falsy


def eel_not(x):
    return _bool_to_f(x == 0.0)


def eel_select(c, a, b):
    return jnp.where(truthy_mask(c), a, b)


def eel_min(a, b):
    return jnp.where(a < b, a, b)  # NaN -> b, matching scalar select


def eel_max(a, b):
    return jnp.where(a > b, a, b)


def eel_sign(a):
    return jnp.where(a > 0.0, 1.0, jnp.where(a < 0.0, -1.0, 0.0))


def eel_invsqrt(x):
    x32 = x.astype(jnp.float32)
    bits = lax.bitcast_convert_type(x32, I32)
    approx = jnp.int32(0x5F3759DF) - (bits >> 1)
    y0 = lax.bitcast_convert_type(approx, jnp.float32).astype(F64)
    return y0 * (1.5 - 0.5 * x * y0 * y0)


UNARY = {
    "sin": jnp.sin, "cos": jnp.cos, "tan": jnp.tan,
    "asin": jnp.arcsin, "acos": jnp.arccos, "atan": jnp.arctan,
    "exp": jnp.exp, "log": jnp.log, "log10": jnp.log10,
    "sqrt": jnp.sqrt, "abs": jnp.abs, "fabs": jnp.abs,
    "floor": jnp.floor, "ceil": jnp.ceil, "invsqrt": eel_invsqrt,
    "not": eel_not, "sign": eel_sign,
}

BINARY = {
    "+": lambda a, b: a + b,
    "-": lambda a, b: a - b,
    "*": lambda a, b: a * b,
    "/": eel_div,
    "^": eel_pow,
    "%": eel_mod,
    "|": eel_or,
    "&": eel_and,
    "~": eel_xor,
    "<<": eel_shl,
    ">>": eel_shr,
    "<": cmp_lt, "<=": cmp_le, ">": cmp_gt, ">=": cmp_ge,
    "==": cmp_eq, "!=": cmp_ne,
    "min": eel_min, "max": eel_max,
    "atan2": jnp.arctan2, "pow": eel_pow,
}


def linrec_assoc_scan(a, b, z0):
    """Solve z_t = a_t * z_{t-1} + b_t (z_{-1} = z0) with an associative scan.

    a may be a scalar (broadcast) or a length-N array; b is length-N.
    Returns the length-N stream of z_t.
    """
    b = jnp.asarray(b, F64)
    n = b.shape[0]
    a_arr = jnp.broadcast_to(jnp.asarray(a, F64), (n,))

    def combine(x, y):
        a1, b1 = x
        a2, b2 = y
        return a1 * a2, a2 * b1 + b2

    A, B = jax.lax.associative_scan(combine, (a_arr, b))
    return A * z0 + B
