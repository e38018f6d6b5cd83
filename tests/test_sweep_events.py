"""Ports of the reference's event-ordering unit tests
(sweep_event.rs:288-413, fill_queue.rs:87-173, divide_segment.rs:90-138)
plus splay-set randomized consistency (splay/mod.rs style)."""

import random

from rust_geo_booleanop_ray.geom.compare_segments import compare_segments
from rust_geo_booleanop_ray.geom.possible_intersection import divide_segment
from rust_geo_booleanop_ray.geom.segment_intersection import (
    INTER_POINT,
    segment_intersection,
)
from rust_geo_booleanop_ray.geom.splay import SplaySet
from rust_geo_booleanop_ray.geom.sweep_event import EventHeap, SweepEvent, event_cmp


def se_pair(contour_id, x, y, other_x, other_y, is_subject, left=True):
    other = SweepEvent(contour_id, (other_x, other_y), False, None, is_subject, True)
    event = SweepEvent(contour_id, (x, y), left, other, is_subject, True)
    other.other_event = event
    if left:
        assert event.is_before(other)
    return event, other


def make_simple(x, y, is_subject):
    return SweepEvent(0, (float(x), float(y)), False, None, is_subject, True)


def check_order_in_queue(first, second):
    # reference fill_queue.rs:99-124
    assert event_cmp(first, second) > 0
    assert event_cmp(second, first) < 0
    for a, b in [(first, second), (second, first)]:
        q = EventHeap()
        q.push(a)
        q.push(b)
        assert q.pop() is first
        assert q.pop() is second


def test_is_below_above_vertical():
    # reference sweep_event.rs:323-366
    other = SweepEvent(0, (1.0, 1.0), False, None, False, True)
    s1 = SweepEvent(0, (0.0, 0.0), True, other, False, True)
    s2 = SweepEvent(0, (0.0, 0.0), False, s1, False, True)

    assert s1.is_below((0.0, 1.0))
    assert s1.is_below((1.0, 2.0))
    assert not s1.is_below((0.0, 0.0))
    assert not s1.is_below((5.0, -1.0))
    assert not s2.is_below((0.0, 1.0))

    assert s1.is_above((0.0, 0.0))
    assert not s1.is_above((0.0, 1.0))

    vert_other = SweepEvent(0, (0.0, 1.0), False, None, False, True)
    v = SweepEvent(0, (0.0, 0.0), True, vert_other, False, True)
    assert v.is_vertical()
    nv_other = SweepEvent(0, (0.0001, 1.0), False, None, False, True)
    nv = SweepEvent(0, (0.0, 0.0), True, nv_other, False, True)
    assert not nv.is_vertical()


def test_queue_order():
    # reference fill_queue.rs:126-172
    check_order_in_queue(make_simple(0.0, 0.0, False), make_simple(0.5, 0.5, False))
    check_order_in_queue(make_simple(0.0, 0.0, False), make_simple(0.0, 0.5, False))

    e1 = make_simple(0.0, 0.0, False)
    e1.left = True
    e2 = make_simple(0.0, 0.0, False)
    e2.left = False
    check_order_in_queue(e2, e1)

    # shared edge, not collinear
    o1 = make_simple(1.0, 1.0, False)
    a = make_simple(0.0, 0.0, False)
    a.other_event = o1
    a.left = True
    o2 = make_simple(2.0, 3.0, False)
    b = make_simple(0.0, 0.0, False)
    b.other_event = o2
    b.left = True
    check_order_in_queue(a, b)

    # collinear, subject first
    o1 = make_simple(1.0, 1.0, True)
    a = make_simple(0.0, 0.0, True)
    a.other_event = o1
    a.left = True
    o2 = make_simple(2.0, 2.0, False)
    b = make_simple(0.0, 0.0, False)
    b.other_event = o2
    b.left = True
    check_order_in_queue(a, b)


def test_order_star_pattern():
    # reference sweep_event.rs:368-412: R events first (clockwise), then
    # L events (counter-clockwise), vertical first/last.
    z = 0.0
    a_pts = [(0, -1), (-2, -6), (-1, -2), (-1, -1), (-2, -1), (-2, 1), (-1, 1), (-1, 2), (-2, 6)]
    r_events = []
    for (x, y) in a_pts:
        _l, r = se_pair(0, float(x), float(y), z, z, True)
        r_events.append(r)
    b_pts = [(2, -6), (1, -2), (1, -1), (2, -1), (2, 1), (1, 1), (1, 2), (2, 6), (0, 1)]
    l_events = []
    for (x, y) in b_pts:
        l, _r = se_pair(0, z, z, float(x), float(y), True)
        l_events.append(l)

    expected = r_events + l_events
    for i in range(len(expected) - 1):
        for j in range(i + 1, len(expected)):
            assert expected[i].is_before(expected[j]), (i, j)


def test_divide_segments():
    # reference divide_segment.rs:120-138
    o1 = SweepEvent(0, (5.0, 5.0), False, None, True, True)
    se1 = SweepEvent(0, (0.0, 0.0), True, o1, True, True)
    o1.other_event = se1
    o2 = SweepEvent(0, (5.0, 0.0), False, None, False, True)
    se2 = SweepEvent(0, (0.0, 5.0), True, o2, False, True)
    o2.other_event = se2

    q = EventHeap()
    q.push(se1)
    q.push(se2)

    kind, inter, _ = segment_intersection(se1.point, o1.point, se2.point, o2.point)
    assert kind == INTER_POINT
    divide_segment(se1, inter, q)
    divide_segment(se2, inter, q)
    assert len(q) == 6


def test_splay_prev_next_consistency():
    # Mirrors the reference's randomized splay test (splay/mod.rs):
    # 400 inserts, then prev/next must agree with sorted order.
    rng = random.Random(42)
    values = list(range(400))
    rng.shuffle(values)
    s = SplaySet(lambda a, b: (a > b) - (a < b))
    for v in values:
        s.insert(v)
    assert len(s) == 400
    assert s.min() == 0
    assert s.max() == 399
    for v in range(400):
        assert s.contains(v)
        nxt = s.next(v)
        prv = s.prev(v)
        assert nxt == (v + 1 if v < 399 else None)
        assert prv == (v - 1 if v > 0 else None)
    # removal keeps order
    for v in range(0, 400, 7):
        assert s.remove(v)
    for v in range(1, 399):
        if v % 7 == 0:
            assert not s.contains(v)


def test_compare_segments_basic():
    # Two disjoint ascending segments: lower one orders below.
    low, _ = se_pair(0, 0.0, 0.0, 2.0, 0.5, True)
    high, _ = se_pair(0, 0.0, 1.0, 2.0, 1.5, True)
    assert compare_segments(low, high) == -1
    assert compare_segments(high, low) == 1
    assert compare_segments(low, low) == 0


def test_sweep_trace_dump():
    """Debug-trace analog of the reference's debug-booleanop feature:
    every processed event appears with computed flags."""
    from rust_geo_booleanop_ray.geom.compute_fields import OP_INTERSECTION
    from rust_geo_booleanop_ray.geom.debug import sweep_trace

    sq = [[[(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)]]]
    cl = [[[(2.0, 2.0), (6.0, 2.0), (6.0, 6.0), (2.0, 6.0), (2.0, 2.0)]]]
    t = sweep_trace(sq, cl, OP_INTERSECTION)
    assert t.num_rows >= 16  # 8 original edges × 2 events, plus splits
    assert set(t["result_transition"].to_pylist()) >= {"None"}
    rows = t.to_pylist()
    assert all(r["edge_type"] in {"Normal", "NonContributing", "SameTransition", "DifferentTransition"} for r in rows)
