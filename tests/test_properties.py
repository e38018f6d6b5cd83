"""Property-based invariants of the boolean kernel (hypothesis).

The reference has no property tests (SURVEY §5); these pin algebraic
laws on random inputs beyond the fixture corpus: area arithmetic
(|A\\B| + |B\\A| + |A∩B| = |A∪B|, |A⊕B| = |A∪B| − |A∩B|),
commutativity of ∪/∩/⊕, and self-operation identities.

Contract: like the reference, set semantics presuppose properly-wound
simple operands (CCW exteriors; components of one multipolygon
disjoint).  Inputs here are normalized to that contract — on reversed
winding or self-overlapping components the algorithm's output follows
its in/out parity rules instead (implementation-defined, but pinned
bit-for-bit by the conformance corpus)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from rust_geo_booleanop_ray.geom import boolean_op
from rust_geo_booleanop_ray.geom.compute_fields import (
    OP_DIFFERENCE,
    OP_INTERSECTION,
    OP_UNION,
    OP_XOR,
)
from rust_geo_booleanop_ray.sources.arrow_geom import shoelace_area
from rust_geo_booleanop_ray.sources.generators import (
    generate_random_triangles,
    generate_rect_centered,
)


def _signed(ring) -> float:
    s = 0.0
    for i in range(len(ring) - 1):
        ax, ay = ring[i]
        bx, by = ring[i + 1]
        s += ax * by - bx * ay
    return s / 2.0


def _normalize(mp):
    """CCW exteriors, CW-agnostic holes → the kernel's documented input
    contract."""
    return [
        [r if (_signed(r) > 0) == (i == 0) else r[::-1] for i, r in enumerate(p)]
        for p in mp
    ]


def _area(mp) -> float:
    return abs(shoelace_area(mp))


def _one_rect(seed: int):
    rng = np.random.default_rng(seed)
    cx, cy = rng.uniform(-5, 5, 2)
    w, h = rng.uniform(0.5, 4, 2)
    return [[generate_rect_centered(cx, cy, w, h)]]


@st.composite
def _simple_pair(draw):
    kind = draw(st.sampled_from(["tri", "rect", "mixed"]))
    s1 = draw(st.integers(0, 10_000))
    s2 = draw(st.integers(0, 10_000))
    if kind == "tri":
        a = generate_random_triangles(1, s1)
        b = generate_random_triangles(1, s2 + 20_000)
    elif kind == "rect":
        a, b = _one_rect(s1), _one_rect(s2 + 20_000)
    else:
        a = generate_random_triangles(1, s1)
        b = _one_rect(s2 + 20_000)
    return _normalize(a), _normalize(b)


@settings(max_examples=80, deadline=None)
@given(_simple_pair())
def test_area_inclusion_exclusion(pair):
    a, b = pair
    union = _area(boolean_op(a, b, OP_UNION))
    inter = _area(boolean_op(a, b, OP_INTERSECTION))
    xor = _area(boolean_op(a, b, OP_XOR))
    diff = _area(boolean_op(a, b, OP_DIFFERENCE))
    diff_ba = _area(boolean_op(b, a, OP_DIFFERENCE))
    scale = max(union, 1e-12)
    assert inter <= union + 1e-9
    assert abs((diff + diff_ba + inter) - union) / scale < 1e-9
    assert abs((union - inter) - xor) / scale < 1e-9


@settings(max_examples=50, deadline=None)
@given(_simple_pair())
def test_commutativity(pair):
    a, b = pair
    for op in (OP_UNION, OP_INTERSECTION, OP_XOR):
        ab = _area(boolean_op(a, b, op))
        ba = _area(boolean_op(b, a, op))
        assert abs(ab - ba) / max(ab, 1e-12) < 1e-9


@settings(max_examples=30, deadline=None)
@given(st.integers(0, 10_000))
def test_self_operations(seed):
    a = _normalize(generate_random_triangles(1, seed))
    area_a = _area(a)
    assert abs(_area(boolean_op(a, a, OP_UNION)) - area_a) / max(area_a, 1e-12) < 1e-9
    assert abs(_area(boolean_op(a, a, OP_INTERSECTION)) - area_a) / max(area_a, 1e-12) < 1e-9
    assert _area(boolean_op(a, a, OP_XOR)) < 1e-9
    assert _area(boolean_op(a, a, OP_DIFFERENCE)) < 1e-9
