"""f32 kernel path (generic Float, reference helper.rs:8-10):
true single-precision arithmetic, closure, and conformance spot-checks."""

import glob

import numpy as np
import pytest

from rust_geo_booleanop_ray.geom import boolean_op
from rust_geo_booleanop_ray.geom.f32 import Float32, f32_nextafter, mp_to_f32
from rust_geo_booleanop_ray.sources.arrow_geom import shoelace_area
from rust_geo_booleanop_ray.sources.geojson_fixtures import (
    apply_test_operation,
    load_fixture,
)

from rust_geo_booleanop_ray.sources.fixture_pairs import DEFAULT_FIXTURE_DIR

FIXTURES = DEFAULT_FIXTURE_DIR


def _f32_representable(mp):
    return all(
        float(np.float32(v)) == v for poly in mp for ring in poly for pt in ring for v in pt
    )


def test_float32_arithmetic_is_true_binary32():
    a = Float32(1.0)
    eps32 = float(np.finfo(np.float32).eps)
    # 1 + eps32/2 rounds back to 1 in f32, but not in f64
    assert a + (eps32 / 2) == 1.0
    assert 1.0 + (eps32 / 2) != 1.0 or True  # (f64 keeps the term)
    assert float(np.float64(1.0) + eps32 / 2) != 1.0
    # literal-first ops stay f32 (subclass reflected-op priority)
    b = 0.1 * Float32(3.0)
    assert isinstance(b, Float32)
    assert b == float(np.float32(np.float32(0.1) * np.float32(3.0)))
    # division rounds in f32
    c = Float32(1.0) / Float32(3.0)
    assert c == float(np.float32(1.0) / np.float32(3.0))
    assert isinstance(-Float32(2.0), Float32)
    assert f32_nextafter(Float32(1.0), True) == float(
        np.nextafter(np.float32(1.0), np.float32(np.inf))
    )


def test_f32_matches_f64_on_integer_rects():
    """Axis-parallel integer-coordinate clips are exact in both
    precisions, so the f32 path must reproduce the f64 result
    vertex-for-vertex."""
    rng = np.random.Generator(np.random.PCG64(23))
    for _ in range(25):
        x0, y0 = rng.integers(0, 50, 2)
        w1, h1, w2, h2 = rng.integers(2, 30, 4)
        dx, dy = rng.integers(-10, 10, 2)
        a = [[[(float(x0), float(y0)), (float(x0 + w1), float(y0)),
               (float(x0 + w1), float(y0 + h1)), (float(x0), float(y0 + h1)),
               (float(x0), float(y0))]]]
        b = [[[(float(x0 + dx), float(y0 + dy)), (float(x0 + dx + w2), float(y0 + dy)),
               (float(x0 + dx + w2), float(y0 + dy + h2)), (float(x0 + dx), float(y0 + dy + h2)),
               (float(x0 + dx), float(y0 + dy))]]]
        for op in ("intersection", "union", "difference", "xor"):
            r64 = boolean_op(a, b, op)
            r32 = boolean_op(a, b, op, dtype="f32")
            assert r32 == r64, (op, a, b)
            assert _f32_representable(r32)


@pytest.mark.parametrize(
    "name", ["basic1_poly", "basic2_poly_with_hole", "basic3_multi_poly", "many_rects"]
)
def test_f32_conformance_spot_check(name):
    """Golden fixtures through the f32 path: results are
    f32-representable and areas agree with the f64 goldens to f32
    relative precision."""
    case = load_fixture(f"{FIXTURES}/{name}.geojson")
    for exp in case.expected:
        r32 = apply_test_operation(
            lambda s, c, op: boolean_op(s, c, op, dtype="f32"),
            case.subject,
            case.clipping,
            exp.op_tag,
        )
        assert _f32_representable(r32)
        a32 = shoelace_area(r32)
        a64 = shoelace_area(exp.result)
        assert a32 == pytest.approx(a64, rel=1e-4, abs=1e-6), (name, exp.op_tag)


def test_f32_property_random_quads():
    """Property sweep: random integer-coordinate convex quad pairs
    through every op in f32 — outputs are always f32-representable,
    areas non-negative, and within f32 relative error of the f64 run."""
    rng = np.random.Generator(np.random.PCG64(77))
    for trial in range(30):
        def quad():
            cx, cy = rng.integers(0, 64, 2)
            w, h = rng.integers(1, 20, 2)
            return [[[(float(cx), float(cy)), (float(cx + w), float(cy)),
                      (float(cx + w), float(cy + h)), (float(cx), float(cy + h)),
                      (float(cx), float(cy))]]]
        a, b = quad(), quad()
        for op in ("intersection", "union", "difference", "xor"):
            r32 = boolean_op(a, b, op, dtype="f32")
            assert _f32_representable(r32)
            a32 = shoelace_area(r32)
            a64 = shoelace_area(boolean_op(a, b, op))
            assert a32 >= 0
            assert a32 == pytest.approx(a64, rel=1e-5, abs=1e-6), (trial, op)
