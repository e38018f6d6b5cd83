"""Layer-2 integration ports: sweep-line ordering on two_triangles
(reference tests/src/subdivide_segments_test.rs:8-38) and the full
subdivision of two_shapes with exact in/out flags and float-exact
intersection points (reference tests/src/possible_intersection_test.rs:76-168)."""

from rust_geo_booleanop_ray.geom.compare_segments import compare_segments
from rust_geo_booleanop_ray.geom.compute_fields import OP_INTERSECTION
from rust_geo_booleanop_ray.geom.splay import SplaySet
from rust_geo_booleanop_ray.geom.subdivide import fill_queue, subdivide
from rust_geo_booleanop_ray.geom.sweep_event import SweepEvent
from rust_geo_booleanop_ray.sources.geojson_fixtures import load_fixture

from rust_geo_booleanop_ray.sources.fixture_pairs import fixtures_root

FIXTURES = fixtures_root()


def _shapes(name):
    case = load_fixture(f"{FIXTURES}/{name}")
    # fixture_shapes returns the first polygon of each side
    return case.subject[0], case.clipping[0]


def _ev(point, left, other_point=None, other_left=False, is_subject=True):
    other = None
    if other_point is not None:
        other = SweepEvent(0, other_point, other_left, None, is_subject, True)
    e = SweepEvent(0, point, left, other, is_subject, True)
    return e


def test_sweep_line_ordering_two_triangles():
    s, c = _shapes("two_triangles.geojson")
    s_ext = s[0]
    c_ext = c[0]

    ef = _ev(tuple(s_ext[0]), True, tuple(s_ext[2]), False)
    eg = _ev(tuple(s_ext[0]), True, tuple(s_ext[1]), False)

    tree = SplaySet(compare_segments)
    tree.insert(ef)
    tree.insert(eg)

    assert tree.find(ef) is ef
    assert tree.min() is ef
    assert tree.max() is eg
    assert tree.next(ef) is eg
    assert tree.prev(eg) is ef

    da = _ev(tuple(c_ext[0]), True, tuple(c_ext[2]), False)
    dc = _ev(tuple(c_ext[0]), True, tuple(c_ext[1]), False)
    tree.insert(da)
    tree.insert(dc)

    assert tree.min() is da
    assert tree.next(da) is dc
    assert tree.next(dc) is ef
    assert tree.next(ef) is eg


def test_subdivide_two_shapes_flags_and_floats():
    s, c = _shapes("two_shapes.geojson")
    queue, sbbox, cbbox = fill_queue([s], [c], OP_INTERSECTION)

    p0, p1, p2 = (16.0, 282.0), (298.0, 359.0), (156.0, 203.5)
    te = _ev(p0, True, p1, False)
    te3 = _ev(p0, True, p2, False)
    tr = SplaySet(compare_segments)
    tr.insert(te)
    tr.insert(te3)
    assert tr.find(te) is te
    assert tr.find(te3) is te3
    assert compare_segments(te, te3) > 0
    assert compare_segments(te3, te) < 0

    segments = subdivide(queue, sbbox, cbbox, OP_INTERSECTION)
    left = [e for e in segments if e.left]
    assert len(left) == 11

    e = (16.0, 282.0)
    i = (100.79403384562252, 233.41363754101192)  # float-exact split point
    g = (298.0, 359.0)
    c_ = (153.0, 294.5)
    j = (203.36313843035356, 257.5101243166895)
    f = (153.0, 203.5)
    d = (56.0, 181.0)
    a = (108.5, 120.0)
    b = (241.5, 229.5)

    intervals = [
        ("EI", e, i, False, True, False),
        ("IF", i, f, False, False, True),
        ("FJ", f, j, False, False, True),
        ("JG", j, g, False, True, False),
        ("EG", e, g, True, True, False),
        ("DA", d, a, False, True, False),
        ("AB", a, b, False, True, False),
        ("JB", j, b, True, True, False),
        ("CJ", c_, j, True, False, True),
        ("IC", i, c_, True, False, True),
        ("DC", d, i, True, True, False),
    ]

    for name, pa_, pb, in_out, other_in_out, in_result in intervals:
        found = any(
            seg.point == pa_
            and seg.other_event is not None
            and seg.other_event.point == pb
            and seg.in_out == in_out
            and seg.other_in_out == other_in_out
            and seg.is_in_result() == in_result
            for seg in left
        )
        assert found, f"interval {name} not found with expected flags"


def test_fill_queue_pop_order_two_shapes():
    """Verbatim port of fill_queue_test.rs::test_two_polygons: the 14
    exact (is_left, point, other_point) tuples popped from the queue
    for two_shapes ∩."""
    s, c = _shapes("two_shapes.geojson")
    q, _, _ = fill_queue([s], [c], OP_INTERSECTION)
    sorted_out = []
    while len(q):
        e = q.pop()
        sorted_out.append(
            (e.left, e.point[0], e.point[1], e.other_event.point[0], e.other_event.point[1])
        )
    assert sorted_out == [
        (True, 16.0, 282.0, 153.0, 203.5),
        (True, 16.0, 282.0, 298.0, 359.0),
        (True, 56.0, 181.0, 108.5, 120.0),
        (True, 56.0, 181.0, 153.0, 294.5),
        (False, 108.5, 120.0, 56.0, 181.0),
        (True, 108.5, 120.0, 241.5, 229.5),
        (False, 153.0, 203.5, 16.0, 282.0),
        (True, 153.0, 203.5, 298.0, 359.0),
        (False, 153.0, 294.5, 56.0, 181.0),
        (True, 153.0, 294.5, 241.5, 229.5),
        (False, 241.5, 229.5, 108.5, 120.0),
        (False, 241.5, 229.5, 153.0, 294.5),
        (False, 298.0, 359.0, 153.0, 203.5),
        (False, 298.0, 359.0, 16.0, 282.0),
    ]


def test_fill_queue_bboxes_and_pop_order_two_triangles():
    """Verbatim port of fill_queue_test.rs::test_fill_event_queue:
    exact subject/clipping bboxes and the first pop tuples for
    two_triangles ∩."""
    s, c = _shapes("two_triangles.geojson")
    q, sbbox, cbbox = fill_queue([s], [c], OP_INTERSECTION)
    assert sbbox == [20.0, -113.5, 226.5, 74.0]
    assert cbbox == [54.5, -198.0, 239.5, 33.5]
    sorted_out = []
    while len(q):
        e = q.pop()
        sorted_out.append(
            (
                e.point[0],
                e.point[1],
                e.left,
                e.other_event.point[0],
                e.other_event.point[1],
                e.other_event.left,
            )
        )
    assert sorted_out == [
        (20.0, -23.5, True, 226.5, -113.5, False),
        (20.0, -23.5, True, 170.0, 74.0, False),
        (54.5, -170.5, True, 239.5, -198.0, False),
        (54.5, -170.5, True, 140.5, 33.5, False),
        (140.5, 33.5, False, 54.5, -170.5, True),
        (140.5, 33.5, True, 239.5, -198.0, False),
        (170.0, 74.0, False, 20.0, -23.5, True),
        (170.0, 74.0, True, 226.5, -113.5, False),
        (226.5, -113.5, False, 20.0, -23.5, True),
        (226.5, -113.5, False, 170.0, 74.0, True),
        (239.5, -198.0, False, 54.5, -170.5, True),
        (239.5, -198.0, False, 140.5, 33.5, True),
    ]
