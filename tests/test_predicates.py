"""Predicate unit tests (ports of reference signed_area.rs:21-35 and
helper.rs:90-101 in-module tests, plus adaptive-path checks)."""

import math

from rust_geo_booleanop_ray.geom.predicates import nextafter, orient2d, signed_area


def test_analytical_signed_area():
    # reference signed_area.rs:26-34
    assert signed_area((0, 0), (0, 1), (1, 1)) == -1.0
    assert signed_area((0, 1), (0, 0), (1, 0)) == 1.0
    assert signed_area((0, 0), (1, 1), (2, 2)) == 0.0
    assert signed_area((-1, 0), (2, 3), (0, 1)) == 0.0
    assert signed_area((2, 3), (-1, 0), (0, 1)) == 0.0


def test_orient2d_exact_sign_near_collinear():
    # Points nearly collinear: the sign must be exact even when the
    # perturbation is a single ULP (the naive determinant's rounding
    # error exceeds it once the points are translated off the origin).
    from fractions import Fraction

    base = 12.3
    eps = math.ulp(0.5 + base)
    a = (base, base)
    b = (1.0 + base, 1.0 + base)
    for dy, expect_sign in [(eps, 1), (-eps, -1), (0.0, 0)]:
        c = (0.5 + base, 0.5 + base + dy)
        exact = (Fraction(a[0]) - Fraction(c[0])) * (
            Fraction(b[1]) - Fraction(c[1])
        ) - (Fraction(a[1]) - Fraction(c[1])) * (Fraction(b[0]) - Fraction(c[0]))
        got = orient2d(a[0], a[1], b[0], b[1], c[0], c[1])
        assert (got > 0) - (got < 0) == (exact > 0) - (exact < 0)
        if expect_sign != 0:
            assert (got > 0) - (got < 0) == expect_sign


def test_orient2d_exact_grid():
    # Exhaustive sign check on a small grid against Fraction arithmetic.
    from fractions import Fraction

    vals = [0.0, 0.1, 0.2, 0.3, 1.0 / 3.0, 0.5]
    pts = [(x, y) for x in vals for y in vals][:12]
    for a in pts:
        for b in pts:
            for c in pts:
                exact = (Fraction(a[0]) - Fraction(c[0])) * (
                    Fraction(b[1]) - Fraction(c[1])
                ) - (Fraction(a[1]) - Fraction(c[1])) * (
                    Fraction(b[0]) - Fraction(c[0])
                )
                got = orient2d(a[0], a[1], b[0], b[1], c[0], c[1])
                if exact > 0:
                    assert got > 0.0, (a, b, c)
                elif exact < 0:
                    assert got < 0.0, (a, b, c)
                else:
                    assert got == 0.0, (a, b, c)


def test_nextafter():
    # reference helper.rs:90-101
    assert nextafter(0.0, True) == math.nextafter(0.0, math.inf)
    assert nextafter(1.0, True) > 1.0
    assert nextafter(1.0, False) < 1.0
    assert nextafter(1.0, True) - 1.0 < 1e-15
