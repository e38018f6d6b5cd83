"""Neighbor intersection handling + segment division.

Mirrors reference lib/src/boolean/divide_segment.rs:10-88 and
possible_intersection.rs:8-122 (including the ULP nudge that dodges the
retroactively-vertical corner case, and the 4 collinear-overlap
sub-cases with their divide order).
"""

from __future__ import annotations

from .predicates import nextafter
from .segment_intersection import (
    INTER_NONE,
    INTER_OVERLAP,
    INTER_POINT,
    segment_intersection,
)
from .sweep_event import (
    EDGE_DIFFERENT_TRANSITION,
    EDGE_NON_CONTRIBUTING,
    EDGE_SAME_TRANSITION,
    EventHeap,
    SweepEvent,
    event_cmp,
)


def divide_segment(se_l: SweepEvent, inter, queue: EventHeap) -> None:
    # reference divide_segment.rs:10-88
    se_r = se_l.other_event
    if se_r is None:
        return

    # Corner case 1: first sub-segment would become perfectly vertical —
    # avoid by one ULP (divide_segment.rs:47-50).
    if inter[0] == se_l.point[0] and inter[1] < se_l.point[1]:
        inter = (nextafter(inter[0], True), inter[1])

    r = SweepEvent(se_l.contour_id, inter, False, se_l, se_l.is_subject, True)
    l = SweepEvent(se_l.contour_id, inter, True, se_r, se_l.is_subject, True)

    # Corner case 2: second sub-segment perfectly vertical → swap l / se_r
    # (divide_segment.rs:72-75).
    if not l.is_before(se_r):
        se_r.left = True
        l.left = False

    se_l.other_event = r
    se_r.other_event = l

    queue.push(l)
    queue.push(r)


def possible_intersection(se1: SweepEvent, se2: SweepEvent, queue: EventHeap) -> int:
    # reference possible_intersection.rs:8-122
    other1 = se1.other_event
    other2 = se2.other_event
    if other1 is None or other2 is None:
        return 0

    kind, ip1, _ip2 = segment_intersection(se1.point, other1.point, se2.point, other2.point)

    if kind == INTER_NONE:
        return 0

    if kind == INTER_POINT:
        if se1.point == se2.point or other1.point == other2.point:
            # Endpoint touch: ignore for numerical stability
            # (possible_intersection.rs:39-47).
            return 0
        inter = ip1
        if se1.point != inter and other1.point != inter:
            divide_segment(se1, inter, queue)
        if se2.point != inter and other2.point != inter:
            divide_segment(se2, inter, queue)
        return 1

    # Overlap
    if se1.is_subject == se2.is_subject:
        return 0  # same-polygon overlap is ignored

    events = []
    left_coincide = False
    right_coincide = False

    if se1.point == se2.point:
        left_coincide = True
    elif event_cmp(se1, se2) < 0:  # se1 < se2 under inverted Ord
        events.append((se2, other2))
        events.append((se1, other1))
    else:
        events.append((se1, other1))
        events.append((se2, other2))

    if other1.point == other2.point:
        right_coincide = True
    elif event_cmp(other1, other2) < 0:
        events.append((other2, se2))
        events.append((other1, se1))
    else:
        events.append((other1, se1))
        events.append((other2, se2))

    if left_coincide:
        # Both segments equal or share the left endpoint
        # (possible_intersection.rs:83-96).
        se2.edge_type = EDGE_NON_CONTRIBUTING
        if se1.in_out == se2.in_out:
            se1.edge_type = EDGE_SAME_TRANSITION
        else:
            se1.edge_type = EDGE_DIFFERENT_TRANSITION

        if not right_coincide:
            divide_segment(events[1][1], events[0][0].point, queue)
        return 2

    if right_coincide:
        # Segments share the right endpoint (possible_intersection.rs:98-102).
        divide_segment(events[0][0], events[1][0].point, queue)
        return 3

    if events[0][0] is not events[3][1]:
        # No segment totally includes the other (possible_intersection.rs:104-109).
        divide_segment(events[0][0], events[1][0].point, queue)
        divide_segment(events[1][0], events[2][0].point, queue)
        return 3

    # One segment totally includes the other (possible_intersection.rs:111-119).
    # Must re-read the (mutated) other_event after the first divide.
    divide_segment(events[0][0], events[1][0].point, queue)
    divide_segment(events[3][0].other_event, events[2][0].point, queue)
    return 3
