"""Double-f32 ("df64") vector arithmetic for the f64 hot loop on TPU.

TPUs have no native f64: XLA emulates every f64 elementwise op with a
multi-op f32 sequence that is neither fused nor compensated-optimal.  The
chunk's per-iteration elementwise chain (solver/chunk.py) therefore runs
here on explicit (hi, lo) f32 pairs with error-free transformations —
TwoSum / Dekker TwoProd — giving ~2^-48 relative accuracy, the same
scheme as the lane SpMV kernel's compensated path (ops/pallas_spmv.py
`lane_spmv_df64`).  Per-chunk work (dots, norms, restart logic) stays in
ordinary emulated f64: it runs once per 150 iterations.

A pair is a plain (hi, lo) tuple of f32 arrays with value hi + lo,
|lo| <= ulp(hi)/2.  Infinities are legal in hi (free-row bounds); every
op sanitises lo to 0 where hi is non-finite so NaNs never leak out of
inf - finite intermediates.

SURVEY §7.0 design stance ("fp32 + compensated (Kahan/two-float 'df64')
accumulation ... as the high-precision mode"); no reference counterpart
(the reference computes in native f64 on hardware that has it).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# 2^12 + 1: Dekker splitter for f32.  A NUMPY scalar on purpose: a
# module-level jnp.float32 is a concrete DEVICE array, and because this
# module is imported lazily from inside traced functions (chunk.py,
# device_loop.py), that buffer used to materialise MID-TRACE — on the
# axon TPU backend the resulting superchunk program died with a runtime
# INVALID_ARGUMENT (round-5 finding: importing df64 before tracing made
# the identical program run; the only delta was this constant's import-
# time device placement).  numpy scalars embed as pure HLO constants.
_SPLIT = np.float32(4097.0)


def _san(h, l):
    """Zero the compensation where hi is inf (inf - finite paths produce
    NaN error terms).  Must run BEFORE recombining h + l: inf + nan = nan
    would poison the hi part."""
    return h, jnp.where(jnp.isfinite(h), l, jnp.float32(0.0))


def from64(x):
    """Split an f64 array (or scalar) into an (hi, lo) f32 pair."""
    h = x.astype(jnp.float32)
    return h, (x - h.astype(x.dtype)).astype(jnp.float32)


def to64(p, dtype=jnp.float64):
    h, l = p
    return h.astype(dtype) + l.astype(dtype)


def _two_sum(a, b):
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def _quick_two_sum(a, b):
    """Requires |a| >= |b| (or a == 0)."""
    s = a + b
    return s, b - (s - a)


def _two_prod(a, b):
    p = a * b
    ca = a * _SPLIT
    ah = ca - (ca - a)
    al = a - ah
    cb = b * _SPLIT
    bh = cb - (cb - b)
    bl = b - bh
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def add(x, y):
    """Pair + pair (sloppy double-double add: error O(eps^2))."""
    xh, xl = x
    yh, yl = y
    s, e = _two_sum(xh, yh)
    s, e = _san(s, e + (xl + yl))
    return _san(*_quick_two_sum(s, e))


def add_strict(x, y):
    """Accurate double-double add (two TwoSums + renormalize): keeps
    RELATIVE accuracy under catastrophic cancellation, where the sloppy
    `add` only bounds the ABSOLUTE error (measured 2e-12 relative on the
    merit norm's near-cancelling w).  Used for scalar decision math; the
    hot loop keeps the cheaper `add`."""
    s1, s2 = _two_sum(x[0], y[0])
    t1, t2 = _two_sum(x[1], y[1])
    s1, s2 = _san(s1, s2 + t1)
    s1, s2 = _quick_two_sum(s1, s2)
    s1, s2 = _san(s1, s2 + t2)
    return _san(*_quick_two_sum(s1, s2))


def neg(x):
    return -x[0], -x[1]


def sub(x, y):
    return add(x, neg(y))


def mul(x, y):
    """Pair * pair."""
    xh, xl = x
    yh, yl = y
    p, e = _two_prod(xh, yh)
    p, e = _san(p, e + (xh * yl + xl * yh))
    return _san(*_quick_two_sum(p, e))


def scale2(x):
    """Exact doubling."""
    return 2.0 * x[0], 2.0 * x[1]


def where(c, x, y):
    return jnp.where(c, x[0], y[0]), jnp.where(c, x[1], y[1])


def lt(x, y):
    """x < y by (hi, then lo) lexicographic comparison."""
    return (x[0] < y[0]) | ((x[0] == y[0]) & (x[1] < y[1]))


def clip(x, lo, hi):
    return where(lt(hi, x), hi, where(lt(x, lo), lo, x))


def maximum(x, y):
    return where(lt(x, y), y, x)


def minimum(x, y):
    return where(lt(y, x), y, x)


def zeros_like(x):
    z = jnp.zeros_like(x[0])
    return z, z


def div(x, y):
    """Pair / pair (long division with two correction terms, the
    standard double-double algorithm)."""
    xh, xl = x
    yh, yl = y
    q1 = xh / yh
    r = sub(x, mul((q1, jnp.zeros_like(q1)), y))
    q2 = r[0] / yh
    r = sub(r, mul((q2, jnp.zeros_like(q2)), y))
    q3 = r[0] / yh
    s, e = _two_sum(q1, q2)
    s, e = _san(s, e + q3)
    return _san(*_quick_two_sum(s, e))


def sqrt(x):
    """Pair sqrt: emulated-f64 seed + one pair Newton correction
    (s + (x - s^2)/(2s)) — full pair precision for non-negative inputs;
    returns 0 for x <= 0.  The seed deliberately routes through f64
    jnp.sqrt rather than an all-f32 formulation: the f32-seed variant
    compiled into a program that failed with a runtime INVALID_ARGUMENT
    on the TPU backend at some (shape-dependent) programs, and the
    Newton step erases the seed's error either way.  Decision-scalar
    cost only — not for the hot loop."""
    xh, xl = x
    s64 = jnp.sqrt(jnp.maximum(to64(x), 0.0))
    sp = from64(s64)
    d = sub(x, mul(sp, sp))
    corr = (d[0].astype(s64.dtype)
            / jnp.maximum(2.0 * s64, jnp.asarray(1e-300, s64.dtype)))
    out = from64(s64 + corr)
    zero = jnp.float32(0.0)
    nonpos = xh <= 0
    return (jnp.where(nonpos, zero, out[0]),
            jnp.where(nonpos, zero, out[1]))
