"""Status-line (sweep line) segment comparator.

Mirrors reference lib/src/boolean/compare_segments.rs:10-108 exactly,
including the temporal-order swap, the exact-predicate non-collinear
branches with intersection-point cross-verification, and the collinear
tie-breaks.  Returns -1 / 0 / +1; 0 only for identity.
"""

from __future__ import annotations

from .predicates import _CCWERRBOUND_A, _orient2d_adapt
from .segment_intersection import INTER_NONE, INTER_POINT, segment_intersection
from .sweep_event import SweepEvent


def _sa(ax, ay, bx, by, cx, cy):
    """signed_area on unpacked coords (identical arithmetic) — inlined
    fast path for the comparator's double predicate evaluation."""
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


def compare_segments(se1_l: SweepEvent, se2_l: SweepEvent) -> int:
    if se1_l is se2_l:
        return 0

    # Swap according to temporal order; invert result if swapped
    # (reference compare_segments.rs:39-43).  ``less_if(cond)`` in the
    # reference is inlined as ``-sign if cond else sign``.
    if se1_l < se2_l:
        se_old_l, se_new_l = se1_l, se2_l
        sign = 1
    else:
        se_old_l, se_new_l = se2_l, se1_l
        sign = -1

    se_old_r = se_old_l.other_event
    se_new_r = se_new_l.other_event
    if se_old_r is None or se_new_r is None:
        return -sign

    p_old = se_old_l.point
    p_old_r = se_old_r.point
    p_new = se_new_l.point
    ax, ay = p_old
    bx, by = p_old_r
    cx, cy = p_new
    sa_l = _sa(ax, ay, bx, by, cx, cy)
    dx, dy = se_new_r.point
    sa_r = _sa(ax, ay, bx, by, dx, dy)
    if sa_l != 0.0 or sa_r != 0.0:
        # Segments are not collinear

        # Left endpoints exactly identical? Use the right endpoint to sort
        if p_old == p_new:
            return -sign if se_old_l.is_below(se_new_r.point) else sign

        # Left endpoints identical in x, but different in y? Sort by y
        if p_old[0] == p_new[0]:
            return -sign if p_old[1] < p_new[1] else sign

        # If `l` and `r` lie on the same side of the reference segment,
        # no intersection check is necessary.
        if (sa_l > 0.0) == (sa_r > 0.0):
            return -sign if sa_l > 0.0 else sign

        # If `l` lies on the reference segment, compare based on `r`.
        if sa_l == 0.0:
            return -sign if sa_r > 0.0 else sign

        # Signed areas say the segments cross; verify whether the
        # intersection point truly differs from `l`.
        kind, p, _p2 = segment_intersection(p_old, p_old_r, p_new, se_new_r.point)
        if kind == INTER_NONE:
            return -sign if sa_l > 0.0 else sign
        if kind == INTER_POINT:
            if p == p_new:
                return -sign if sa_r > 0.0 else sign
            return -sign if sa_l > 0.0 else sign
        # overlap → fall through to collinear logic

    # Segments are collinear
    if se_old_l.is_subject == se_new_l.is_subject:
        if p_old == p_new:
            return -sign if se_old_l.contour_id < se_new_l.contour_id else sign
        return -sign
    return -sign if se_old_l.is_subject else sign
