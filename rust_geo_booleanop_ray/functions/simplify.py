"""Visvalingam–Whyatt polygon simplification on integer lattices.

Pure-numpy kernel used both by the engine stage and the generator-side
expected-values oracle (the codec pattern: the oracle replays the same
input-data math, never engine output).  All vertex coordinates are
integers and areas are kept DOUBLED (2×shoelace), so every comparison
is exact int64 arithmetic — engine and DuckDB literals agree
bit-for-bit.

Reference scope note: the reference repo (21re/rust-geo-booleanop) has
no simplification op; this is an engine addition for the tile-
rendering path (simplify before rasterize/serve), following the same
exactness discipline as its boolean kernel.
"""

from __future__ import annotations

import numpy as np


def ring_area2(xs: np.ndarray, ys: np.ndarray) -> int:
    """Doubled signed shoelace area of a closed ring given WITHOUT the
    repeated last vertex — exact int64."""
    x = xs.astype(np.int64)
    y = ys.astype(np.int64)
    return int((x * np.roll(y, -1) - np.roll(x, -1) * y).sum())


def visvalingam(xs: np.ndarray, ys: np.ndarray, min_area2: int) -> np.ndarray:
    """Simplify an open vertex chain (first/last vertices pinned):
    repeatedly drop the interior vertex whose neighbor-triangle
    DOUBLED area is smallest (tie → lowest index) while that minimum
    is < ``min_area2``.  Returns the kept-vertex index mask.

    O(n²) recompute-min loop — unambiguous and exact; chains here are
    tens of vertices (the per-feature kernel inside map_batches, like
    the Martinez sweep itself).
    """
    n = len(xs)
    x = xs.astype(np.int64)
    y = ys.astype(np.int64)
    alive = np.ones(n, dtype=bool)
    while alive.sum() > 2:
        idx = np.flatnonzero(alive)
        xi, yi = x[idx], y[idx]
        # effective DOUBLED areas of the interior vertices
        areas = np.abs(
            (xi[1:-1] - xi[:-2]) * (yi[2:] - yi[:-2])
            - (xi[2:] - xi[:-2]) * (yi[1:-1] - yi[:-2])
        )
        if len(areas) == 0:
            break
        k = int(np.argmin(areas))  # first min = lowest index tie-break
        if int(areas[k]) >= min_area2:
            break
        alive[idx[k + 1]] = False
    return alive


def skyline_chain(i: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic integer 'skyline' vertex chain for shape ``i``:
    a staircase from (0,0) to (m,0) whose step heights come from
    splitmix64 — simple (x-monotone) by construction, collinear runs
    included so simplification has real work to do."""
    from ..stages.footprint import _splitmix64

    m = 24 + (i % 9) * 4
    j = np.arange(m, dtype=np.uint64)
    h = (_splitmix64(np.uint64(i) * np.uint64(1_000_003) + j) % np.uint64(12)).astype(
        np.int64
    )
    xs = np.empty(2 * m + 2, dtype=np.int64)
    ys = np.empty(2 * m + 2, dtype=np.int64)
    xs[0], ys[0] = 0, 0
    xs[1:-1:2] = np.arange(m)
    ys[1:-1:2] = h
    xs[2:-1:2] = np.arange(1, m + 1)
    ys[2:-1:2] = h
    xs[-1], ys[-1] = m, 0
    return xs, ys


def simplify_stats(i: int, min_area2: int) -> tuple[int, int, int, int]:
    """(n_before, n_after, area2_before, area2_after) for shape ``i``
    simplified at ``min_area2`` — the pure per-feature kernel shared
    by the engine stage and the expected-values oracle."""
    xs, ys = skyline_chain(i)
    keep = visvalingam(xs, ys, min_area2)
    # closed ring = chain + implicit (m,0)→(0,0) base edge
    a_before = abs(ring_area2(xs, ys))
    a_after = abs(ring_area2(xs[keep], ys[keep]))
    return len(xs), int(keep.sum()), a_before, a_after


def _orient(ax, ay, bx, by, cx, cy) -> int:
    v = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    return 0 if v == 0 else (1 if v > 0 else -1)


def _on_segment(ax, ay, bx, by, px, py) -> bool:
    return (
        min(ax, bx) <= px <= max(ax, bx)
        and min(ay, by) <= py <= max(ay, by)
        and _orient(ax, ay, bx, by, px, py) == 0
    )


def _segments_intersect(a, b, c, d) -> bool:
    """Exact integer segment intersection (touch counts)."""
    o1 = _orient(*a, *b, *c)
    o2 = _orient(*a, *b, *d)
    o3 = _orient(*c, *d, *a)
    o4 = _orient(*c, *d, *b)
    if o1 != o2 and o3 != o4:
        return True
    if o1 == 0 and _on_segment(*a, *b, *c):
        return True
    if o2 == 0 and _on_segment(*a, *b, *d):
        return True
    if o3 == 0 and _on_segment(*c, *d, *a):
        return True
    if o4 == 0 and _on_segment(*c, *d, *b):
        return True
    return False


def ring_self_intersections(xs: np.ndarray, ys: np.ndarray) -> int:
    """Count of NON-ADJACENT edge pairs of the closed ring that touch
    or cross — 0 ⇔ the ring is simple (the ST_IsValid core test).
    Exact integer orientation predicates; O(n²) pairs per feature
    (features are small; at scale the per-feature sweep replaces
    this, same predicates)."""
    n = len(xs)
    pts = [(int(xs[i]), int(ys[i])) for i in range(n)]
    edges = [(pts[i], pts[(i + 1) % n]) for i in range(n)]
    bad = 0
    for i in range(n):
        for j in range(i + 1, n):
            if j == i + 1 or (i == 0 and j == n - 1):
                continue  # adjacent edges share a vertex by design
            if _segments_intersect(*edges[i], *edges[j]):
                bad += 1
    return bad
