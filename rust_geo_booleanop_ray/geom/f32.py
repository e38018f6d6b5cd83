"""f32 coordinate type for the generic-Float kernel path.

The reference algorithm is generic over ``Float`` (f32 or f64,
/root/reference/lib/src/boolean/helper.rs:8-10); the Python kernel
computes in f64.  ``Float32`` provides the f32 instantiation: a
``float`` subclass whose arithmetic performs TRUE single-precision
IEEE operations (both operands cast to ``np.float32``, one numpy op,
result stored back as the exact f32 value).  Because it subclasses
``float``:

- comparisons, hashing, tuple/dict use, and the exact orient2d
  predicate all work unchanged (every f32 value is exactly
  representable in f64, so predicates and comparisons are exact);
- Python gives the SUBCLASS's reflected operators priority, so even
  ``0.5 * Float32(x)`` routes through ``__rmul__`` and stays f32.

Only code that CREATES coordinates needs the dtype: segment
intersection arithmetic and the ULP nudge (``nextafter`` dispatches on
this type in geom/predicates.py).  Everything else in the sweep is
comparisons and predicates, which are dtype-neutral.
"""

from __future__ import annotations

import numpy as np

_F32 = np.float32
_F32_INF = np.float32(np.inf)
_F32_NINF = np.float32(-np.inf)


class Float32(float):
    """A float whose arithmetic rounds like IEEE binary32."""

    __slots__ = ()

    def __new__(cls, value=0.0):
        return super().__new__(cls, _F32(value))

    # -- arithmetic: cast both sides to f32, single f32 op, wrap
    def __add__(self, other):
        return Float32(_F32(self) + _F32(other))

    __radd__ = __add__

    def __sub__(self, other):
        return Float32(_F32(self) - _F32(other))

    def __rsub__(self, other):
        return Float32(_F32(other) - _F32(self))

    def __mul__(self, other):
        return Float32(_F32(self) * _F32(other))

    __rmul__ = __mul__

    def __truediv__(self, other):
        return Float32(_F32(self) / _F32(other))

    def __rtruediv__(self, other):
        return Float32(_F32(other) / _F32(self))

    def __neg__(self):
        return Float32(-_F32(self))

    def __pos__(self):
        return self

    def __abs__(self):
        return Float32(abs(_F32(self)))


def f32_nextafter(x, up: bool):
    """One ULP step in binary32 (the f32 instantiation of the
    reference's NextAfter bound, helper.rs:12-34)."""
    return Float32(np.nextafter(_F32(x), _F32_INF if up else _F32_NINF))


def mp_to_f32(mp):
    """Multipolygon → Float32 coordinates (rounds to nearest f32)."""
    return [
        [[(Float32(x), Float32(y)) for x, y in ring] for ring in poly]
        for poly in mp
    ]


def mp_to_f64(mp):
    """Multipolygon with Float32 coords → plain Python floats (exact)."""
    return [
        [[(float(x), float(y)) for x, y in ring] for ring in poly]
        for poly in mp
    ]
