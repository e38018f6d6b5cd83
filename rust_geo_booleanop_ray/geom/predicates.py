"""Robust geometric predicates (Shewchuk adaptive-precision orient2d).

Python port of the public-domain adaptive orient2d predicate
(J. R. Shewchuk, "Adaptive Precision Floating-Point Arithmetic and Fast
Robust Geometric Predicates").  Sign convention matches the reference
engine's ``signed_area`` (reference: lib/src/boolean/signed_area.rs:13-19,
which delegates to the `robust` crate's orient2d):

    signed_area(p0, p1, p2) = (p0.x-p2.x)*(p1.y-p2.y) - (p0.y-p2.y)*(p1.x-p2.x)

computed with an exact sign.  Positive = counter-clockwise triple.

Only the *sign* of the result is consumed by the sweep-line algorithm
(comparisons against 0.0), so exact-sign is the load-bearing property;
the magnitude on the exact path is the leading expansion component,
exactly as in predicates.c.
"""

from __future__ import annotations

import math

_EPS = 1.1102230246251565e-16  # 2^-53
_SPLITTER = 134217729.0  # 2^27 + 1
_RESULTERRBOUND = (3.0 + 8.0 * _EPS) * _EPS
_CCWERRBOUND_A = (3.0 + 16.0 * _EPS) * _EPS
_CCWERRBOUND_B = (2.0 + 12.0 * _EPS) * _EPS
_CCWERRBOUND_C = (9.0 + 64.0 * _EPS) * _EPS * _EPS


def _two_sum(a: float, b: float):
    x = a + b
    bvirt = x - a
    avirt = x - bvirt
    bround = b - bvirt
    around = a - avirt
    return x, around + bround


def _two_diff(a: float, b: float):
    x = a - b
    bvirt = a - x
    avirt = x + bvirt
    bround = bvirt - b
    around = a - avirt
    return x, around + bround


def _two_diff_tail(a: float, b: float, x: float) -> float:
    bvirt = a - x
    avirt = x + bvirt
    bround = bvirt - b
    around = a - avirt
    return around + bround


def _split(a: float):
    c = _SPLITTER * a
    abig = c - a
    ahi = c - abig
    alo = a - ahi
    return ahi, alo


def _two_product(a: float, b: float):
    x = a * b
    ahi, alo = _split(a)
    bhi, blo = _split(b)
    err1 = x - (ahi * bhi)
    err2 = err1 - (alo * bhi)
    err3 = err2 - (ahi * blo)
    y = (alo * blo) - err3
    return x, y


def _two_one_diff(a1: float, a0: float, b: float):
    _i, x0 = _two_diff(a0, b)
    x2, x1 = _two_sum(a1, _i)
    return x2, x1, x0


def _two_two_diff(a1: float, a0: float, b1: float, b0: float):
    _j, _0, x0 = _two_one_diff(a1, a0, b0)
    x3, x2, x1 = _two_one_diff(_j, _0, b1)
    return x3, x2, x1, x0


def _fast_expansion_sum_zeroelim(e, f):
    """Sum two nonoverlapping expansions, eliminating zero components."""
    elen = len(e)
    flen = len(f)
    enow = e[0]
    fnow = f[0]
    eindex = 0
    findex = 0
    if (fnow > enow) == (fnow > -enow):
        Q = enow
        eindex = 1
        enow = e[eindex] if eindex < elen else 0.0
    else:
        Q = fnow
        findex = 1
        fnow = f[findex] if findex < flen else 0.0
    h = []
    if eindex < elen and findex < flen:
        if (fnow > enow) == (fnow > -enow):
            Qnew, hh = _two_sum(enow, Q)
            eindex += 1
            enow = e[eindex] if eindex < elen else 0.0
        else:
            Qnew, hh = _two_sum(fnow, Q)
            findex += 1
            fnow = f[findex] if findex < flen else 0.0
        Q = Qnew
        if hh != 0.0:
            h.append(hh)
        while eindex < elen and findex < flen:
            if (fnow > enow) == (fnow > -enow):
                Qnew, hh = _two_sum(Q, enow)
                eindex += 1
                enow = e[eindex] if eindex < elen else 0.0
            else:
                Qnew, hh = _two_sum(Q, fnow)
                findex += 1
                fnow = f[findex] if findex < flen else 0.0
            Q = Qnew
            if hh != 0.0:
                h.append(hh)
    while eindex < elen:
        Qnew, hh = _two_sum(Q, enow)
        eindex += 1
        enow = e[eindex] if eindex < elen else 0.0
        Q = Qnew
        if hh != 0.0:
            h.append(hh)
    while findex < flen:
        Qnew, hh = _two_sum(Q, fnow)
        findex += 1
        fnow = f[findex] if findex < flen else 0.0
        Q = Qnew
        if hh != 0.0:
            h.append(hh)
    if Q != 0.0 or not h:
        h.append(Q)
    return h


def _estimate(e) -> float:
    q = e[0]
    for v in e[1:]:
        q += v
    return q


def _orient2d_adapt(ax, ay, bx, by, cx, cy, detsum) -> float:
    acx = ax - cx
    bcx = bx - cx
    acy = ay - cy
    bcy = by - cy

    detleft, detlefttail = _two_product(acx, bcy)
    detright, detrighttail = _two_product(acy, bcx)

    b3, b2, b1, b0 = _two_two_diff(detleft, detlefttail, detright, detrighttail)
    B = (b0, b1, b2, b3)

    det = _estimate(B)
    errbound = _CCWERRBOUND_B * detsum
    if det >= errbound or -det >= errbound:
        return det

    acxtail = _two_diff_tail(ax, cx, acx)
    bcxtail = _two_diff_tail(bx, cx, bcx)
    acytail = _two_diff_tail(ay, cy, acy)
    bcytail = _two_diff_tail(by, cy, bcy)

    if acxtail == 0.0 and acytail == 0.0 and bcxtail == 0.0 and bcytail == 0.0:
        return det

    errbound = _CCWERRBOUND_C * detsum + _RESULTERRBOUND * math.fabs(det)
    det += (acx * bcytail + bcy * acxtail) - (acy * bcxtail + bcx * acytail)
    if det >= errbound or -det >= errbound:
        return det

    s1, s0 = _two_product(acxtail, bcy)
    t1, t0 = _two_product(acytail, bcx)
    u3, u2, u1, u0 = _two_two_diff(s1, s0, t1, t0)
    C1 = _fast_expansion_sum_zeroelim(B, (u0, u1, u2, u3))

    s1, s0 = _two_product(acx, bcytail)
    t1, t0 = _two_product(acy, bcxtail)
    u3, u2, u1, u0 = _two_two_diff(s1, s0, t1, t0)
    C2 = _fast_expansion_sum_zeroelim(C1, (u0, u1, u2, u3))

    s1, s0 = _two_product(acxtail, bcytail)
    t1, t0 = _two_product(acytail, bcxtail)
    u3, u2, u1, u0 = _two_two_diff(s1, s0, t1, t0)
    D = _fast_expansion_sum_zeroelim(C2, (u0, u1, u2, u3))

    return D[-1]


def orient2d(ax: float, ay: float, bx: float, by: float, cx: float, cy: float) -> float:
    """Exact-sign orientation of triple (a, b, c); >0 ⇔ counter-clockwise."""
    detleft = (ax - cx) * (by - cy)
    detright = (ay - cy) * (bx - cx)
    det = detleft - detright

    if detleft > 0.0:
        if detright <= 0.0:
            return det
        detsum = detleft + detright
    elif detleft < 0.0:
        if detright >= 0.0:
            return det
        detsum = -detleft - detright
    else:
        return det

    errbound = _CCWERRBOUND_A * detsum
    if det >= errbound or -det >= errbound:
        return det

    return _orient2d_adapt(ax, ay, bx, by, cx, cy, detsum)


def signed_area(p0, p1, p2) -> float:
    """Exact-sign signed area predicate on (x, y) tuples.

    Mirrors reference lib/src/boolean/signed_area.rs:13-19.  The orient2d
    fast path is inlined here (identical arithmetic) because this is the
    sweep's hottest function; only near-degenerate triples fall through
    to the exact-expansion slow path.
    """
    ax, ay = p0
    bx, by = p1
    cx, cy = p2
    detleft = (ax - cx) * (by - cy)
    detright = (ay - cy) * (bx - cx)
    det = detleft - detright

    if detleft > 0.0:
        if detright <= 0.0:
            return det
        detsum = detleft + detright
    elif detleft < 0.0:
        if detright >= 0.0:
            return det
        detsum = -detleft - detright
    else:
        return det

    errbound = _CCWERRBOUND_A * detsum
    if det >= errbound or -det >= errbound:
        return det

    return _orient2d_adapt(ax, ay, bx, by, cx, cy, detsum)


def nextafter(x: float, up: bool) -> float:
    """ULP step; mirrors reference lib/src/boolean/helper.rs:16-24.

    Dispatches on the coordinate type: binary32 step for the f32
    kernel path (the reference is generic over Float), binary64
    otherwise."""
    from .f32 import Float32, f32_nextafter

    if isinstance(x, Float32):
        return f32_nextafter(x, up)
    return math.nextafter(x, math.inf if up else -math.inf)
