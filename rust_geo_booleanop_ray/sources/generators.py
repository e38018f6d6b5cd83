"""Deterministic synthetic geometry generators.

Port of the reference test-crate generators
(reference tests/src/data_generators.rs:8-141): centered rects, circle
rings, offset grids, nested circles/rects (rings as holes), and seeded
random triangles, plus the three canned benchmark datasets.  The RNG is
numpy PCG64 with fixed seeds (deterministic, though not bit-identical to
Rust's StdRng — these are benchmark *inputs*, not goldens).

Geometry representation matches the engine convention
(multipolygon = [polygon]; polygon = [ring]; ring = [(x, y), ...]).
"""

from __future__ import annotations

import math

import numpy as np


def generate_rect_centered(cx: float, cy: float, w: float, h: float):
    """One closed CCW rectangle ring (data_generators.rs:8-21)."""
    wh, hh = w / 2.0, h / 2.0
    return [
        (cx - wh, cy - hh),
        (cx + wh, cy - hh),
        (cx + wh, cy + hh),
        (cx - wh, cy + hh),
        (cx - wh, cy - hh),
    ]


def generate_circle_ring(cx: float, cy: float, num_points: int, r: float):
    """Open circle ring, phi from 0 (data_generators.rs:23-32)."""
    return [
        (
            cx + r * math.sin(i / num_points * 2.0 * math.pi),
            cy + r * math.cos(i / num_points * 2.0 * math.pi),
        )
        for i in range(num_points)
    ]


def generate_grid(min_v: float, max_v: float, rect_size: float, num_rects: int):
    """num_rects × num_rects grid of squares (data_generators.rs:34-49)."""
    assert num_rects >= 2
    positions = [
        min_v + (max_v - min_v) * i / (num_rects - 1) for i in range(num_rects)
    ]
    return [
        [generate_rect_centered(x, y, rect_size, rect_size)]
        for x in positions
        for y in positions
    ]


def generate_nested_circles(cx, cy, r_min, r_max, num_polys, num_points):
    """Concentric rings paired as (exterior, hole) (data_generators.rs:51-77)."""
    assert r_max > r_min > 0.0 and num_polys >= 1 and num_points >= 3
    num_radii = 2 * num_polys
    radii = [
        r_min + i * (r_max - r_min) / (num_radii - 1) for i in range(num_radii)
    ]
    return [
        [
            generate_circle_ring(cx, cy, num_points, radii[i]),
            generate_circle_ring(cx, cy, num_points, radii[i + 1]),
        ]
        for i in range(0, num_radii, 2)
    ]


def generate_nested_rects(cx, cy, width_min, width_max, num_polys):
    """Concentric squares paired as (exterior, hole) (data_generators.rs:79-103)."""
    assert width_max > width_min > 0.0 and num_polys >= 1
    num_widths = 2 * num_polys
    widths = [
        width_min + i * (width_max - width_min) / (num_widths - 1)
        for i in range(num_widths)
    ]
    return [
        [
            generate_rect_centered(cx, cy, widths[i], widths[i]),
            generate_rect_centered(cx, cy, widths[i + 1], widths[i + 1]),
        ]
        for i in range(0, num_widths, 2)
    ]


def generate_random_triangles(num_polys: int, seed: int):
    """Seeded random triangles in [-1, 1]^2 (data_generators.rs:105-123)."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(num_polys):
        pts = rng.uniform(-1.0, 1.0, size=(3, 2))
        ring = [tuple(p) for p in pts] + [tuple(pts[0])]
        out.append([ring])
    return out


def generate_grid_polygons():
    """31×31 grids offset by 0.4 (data_generators.rs:125-129)."""
    a = generate_grid(-15.0, 15.0, 0.4, 31)
    b = generate_grid(-15.4, 15.4, 0.4, 31)
    return a, b


def generate_circles_vs_rects():
    """30 nested 500-pt rings vs 30 nested rects (data_generators.rs:131-135)."""
    a = generate_nested_circles(0.0, 0.0, 1.0, 10.0, 30, 500)
    b = generate_nested_rects(1.0, 1.0, 2.0, 20.0, 30)
    return a, b


def generate_random_triangles_polygons():
    """10 vs 10 triangles, seeds 1 and 2 (data_generators.rs:137-141)."""
    return generate_random_triangles(10, 1), generate_random_triangles(10, 2)
