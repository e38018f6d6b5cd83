"""Convex hull on integer lattices (Andrew monotone chain).

Pure-numpy/int kernel shared by the engine stage and the generator-
side expected-values oracle — all comparisons are exact int64 cross
products, so engine and DuckDB literals agree bit-for-bit.

The distributed shape this enables: hull(A ∪ B) = hull(hull(A) ∪
hull(B)), so per-block PARTIAL hulls shrink each group to O(hull
size) points before the exchange, and the per-group merge runs the
same kernel over the union of partials — the classic
associative-combiner trick applied to computational geometry.

Reference scope note: the reference repo has no hull op; this is an
engine addition on its exact-integer-predicate discipline
(/root/reference/lib/src/helper.rs signed-area comparisons).
"""

from __future__ import annotations

import numpy as np


def _cross(ox, oy, ax, ay, bx, by):
    return (ax - ox) * (by - oy) - (ay - oy) * (bx - ox)


def convex_hull(xs: np.ndarray, ys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Hull vertices in counter-clockwise order starting from the
    lexicographically smallest point; collinear boundary points are
    DROPPED (strict turns only).  Handles degenerate (all-collinear)
    inputs by returning the 2 extreme points (or 1 for a single
    point).  Exact int64 arithmetic."""
    pts = np.unique(np.column_stack([xs.astype(np.int64), ys.astype(np.int64)]), axis=0)
    n = len(pts)
    if n <= 2:
        return pts[:, 0], pts[:, 1]
    # np.unique sorts lexicographically by (x, y) already
    x, y = pts[:, 0], pts[:, 1]

    def half(idx_range):
        out: list[int] = []
        for i in idx_range:
            while (
                len(out) >= 2
                and _cross(
                    x[out[-2]], y[out[-2]], x[out[-1]], y[out[-1]], x[i], y[i]
                )
                <= 0
            ):
                out.pop()
            out.append(i)
        return out

    lower = half(range(n))
    upper = half(range(n - 1, -1, -1))
    idx = np.array(lower[:-1] + upper[:-1], dtype=np.int64)
    if len(idx) == 0:  # fully collinear
        idx = np.array([0, n - 1], dtype=np.int64)
    return x[idx], y[idx]


def hull_area2(hx: np.ndarray, hy: np.ndarray) -> int:
    """Doubled shoelace area of the hull ring (0 for degenerate)."""
    if len(hx) < 3:
        return 0
    x = hx.astype(np.int64)
    y = hy.astype(np.int64)
    return abs(int((x * np.roll(y, -1) - np.roll(x, -1) * y).sum()))
