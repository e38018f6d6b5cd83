"""Port of the reference segment-intersection truth table
(segment_intersection.rs:182-335)."""

from rust_geo_booleanop_ray.geom.segment_intersection import (
    INTER_NONE,
    INTER_OVERLAP,
    INTER_POINT,
    _constrain_to_bounding_box,
    _get_intersection_bounding_box,
    segment_intersection,
)


def xy(x, y):
    return (float(x), float(y))


def test_get_intersection_bounding_box():
    assert _get_intersection_bounding_box(xy(0, 0), xy(2, 2), xy(1, 1), xy(3, 3)) == (
        1.0,
        1.0,
        2.0,
        2.0,
    )
    assert _get_intersection_bounding_box(xy(-1, 0), xy(1, 0), xy(0, -1), xy(0, 1)) == (
        0.0,
        0.0,
        0.0,
        0.0,
    )
    assert _get_intersection_bounding_box(xy(0, 0), xy(1, 1), xy(2, 0), xy(3, 1)) is None
    assert _get_intersection_bounding_box(xy(3, 0), xy(2, 1), xy(1, 0), xy(0, 1)) is None
    assert _get_intersection_bounding_box(xy(0, 0), xy(1, 1), xy(0, 2), xy(1, 3)) is None
    assert _get_intersection_bounding_box(xy(0, 3), xy(1, 2), xy(0, 1), xy(1, 0)) is None


def test_constrain_to_bounding_box():
    bb = (-1.0, -1.0, 1.0, 1.0)
    assert _constrain_to_bounding_box(xy(100, 0), bb) == (1.0, 0.0)
    assert _constrain_to_bounding_box(xy(-100, 0), bb) == (-1.0, 0.0)
    assert _constrain_to_bounding_box(xy(0, 100), bb) == (0.0, 1.0)
    assert _constrain_to_bounding_box(xy(0, -100), bb) == (0.0, -1.0)


def none_(a1, a2, b1, b2):
    assert segment_intersection(a1, a2, b1, b2)[0] == INTER_NONE


def point(a1, a2, b1, b2, p):
    kind, p1, _ = segment_intersection(a1, a2, b1, b2)
    assert kind == INTER_POINT
    assert p1 == p


def overlap(a1, a2, b1, b2, p, q):
    kind, p1, p2 = segment_intersection(a1, a2, b1, b2)
    assert kind == INTER_OVERLAP
    assert (p1, p2) == (p, q)


def test_intersection():
    none_(xy(0, 0), xy(1, 1), xy(1, 0), xy(2, 2))
    none_(xy(0, 0), xy(1, 1), xy(1, 0), xy(10, 2))
    none_(xy(2, 2), xy(3, 3), xy(0, 6), xy(2, 4))

    point(xy(0, 0), xy(1, 1), xy(1, 0), xy(0, 1), (0.5, 0.5))
    point(xy(0, 0), xy(1, 1), xy(0, 1), xy(0, 0), (0.0, 0.0))
    point(xy(0, 0), xy(1, 1), xy(0, 1), xy(1, 1), (1.0, 1.0))
    point(xy(0, 0), xy(1, 1), xy(0.5, 0.5), xy(1, 0), (0.5, 0.5))

    overlap(xy(0, 0), xy(10, 10), xy(1, 1), xy(5, 5), (1.0, 1.0), (5.0, 5.0))
    overlap(xy(1, 1), xy(10, 10), xy(1, 1), xy(5, 5), (1.0, 1.0), (5.0, 5.0))
    overlap(xy(3, 3), xy(10, 10), xy(0, 0), xy(5, 5), (3.0, 3.0), (5.0, 5.0))
    overlap(xy(0, 0), xy(1, 1), xy(0, 0), xy(1, 1), (0.0, 0.0), (1.0, 1.0))
    overlap(xy(1, 1), xy(0, 0), xy(0, 0), xy(1, 1), (1.0, 1.0), (0.0, 0.0))

    point(xy(0, 0), xy(1, 1), xy(1, 1), xy(2, 2), (1.0, 1.0))
    point(xy(1, 1), xy(0, 0), xy(1, 1), xy(2, 2), (1.0, 1.0))
    none_(xy(0, 0), xy(1, 1), xy(2, 2), xy(4, 4))
    none_(xy(0, 0), xy(1, 1), xy(0, -1), xy(1, 0))
    none_(xy(1, 1), xy(0, 0), xy(0, -1), xy(1, 0))
    none_(xy(0, -1), xy(1, 0), xy(0, 0), xy(1, 1))

    point(xy(0, 0.5), xy(1, 1.5), xy(0, 1), xy(1, 0), (0.25, 0.75))

    none_(xy(0, 0), xy(1, 0), xy(1, -1), xy(2, 1))
