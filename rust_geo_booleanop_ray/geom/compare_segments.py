"""Status-line (sweep line) segment comparator.

Mirrors reference lib/src/boolean/compare_segments.rs:10-108 exactly,
including the temporal-order swap, the exact-predicate non-collinear
branches with intersection-point cross-verification, and the collinear
tie-breaks.  Returns -1 / 0 / +1; 0 only for identity.
"""

from __future__ import annotations

from .predicates import signed_area
from .segment_intersection import INTER_NONE, INTER_POINT, segment_intersection
from .sweep_event import SweepEvent


def compare_segments(se1_l: SweepEvent, se2_l: SweepEvent) -> int:
    if se1_l is se2_l:
        return 0

    # Swap according to temporal order; invert result if swapped
    # (reference compare_segments.rs:39-43).
    if se1_l.is_before(se2_l):
        se_old_l, se_new_l = se1_l, se2_l
        sign = 1
    else:
        se_old_l, se_new_l = se2_l, se1_l
        sign = -1

    def less_if(cond: bool) -> int:
        # less_if(c) == Less ⇒ se1 orders below se2 in the status line
        return -sign if cond else sign

    se_old_r = se_old_l.other_event
    se_new_r = se_new_l.other_event
    if se_old_r is None or se_new_r is None:
        return less_if(True)

    sa_l = signed_area(se_old_l.point, se_old_r.point, se_new_l.point)
    sa_r = signed_area(se_old_l.point, se_old_r.point, se_new_r.point)
    if sa_l != 0.0 or sa_r != 0.0:
        # Segments are not collinear

        # Left endpoints exactly identical? Use the right endpoint to sort
        if se_old_l.point == se_new_l.point:
            return less_if(se_old_l.is_below(se_new_r.point))

        # Left endpoints identical in x, but different in y? Sort by y
        if se_old_l.point[0] == se_new_l.point[0]:
            return less_if(se_old_l.point[1] < se_new_l.point[1])

        # If `l` and `r` lie on the same side of the reference segment,
        # no intersection check is necessary.
        if (sa_l > 0.0) == (sa_r > 0.0):
            return less_if(sa_l > 0.0)

        # If `l` lies on the reference segment, compare based on `r`.
        if sa_l == 0.0:
            return less_if(sa_r > 0.0)

        # Signed areas say the segments cross; verify whether the
        # intersection point truly differs from `l`.
        kind, p, _p2 = segment_intersection(
            se_old_l.point, se_old_r.point, se_new_l.point, se_new_r.point
        )
        if kind == INTER_NONE:
            return less_if(sa_l > 0.0)
        if kind == INTER_POINT:
            if p == se_new_l.point:
                return less_if(sa_r > 0.0)
            return less_if(sa_l > 0.0)
        # overlap → fall through to collinear logic

    # Segments are collinear
    if se_old_l.is_subject == se_new_l.is_subject:
        if se_old_l.point == se_new_l.point:
            return less_if(se_old_l.contour_id < se_new_l.contour_id)
        return less_if(True)
    return less_if(se_old_l.is_subject)
