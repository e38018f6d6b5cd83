"""Convex-polygon × axis-aligned-rect clipping (Sutherland–Hodgman).

Fast path used by the grid-tile join for the dominant case (convex
footprint quad × tile rect): 4 half-plane passes, exact for convex
subjects.  Falls back to the Martinez kernel for anything non-convex /
multi-ring (the generic path).  Validated against the Martinez kernel
by area equality in tests/test_join_clip.py.
"""

from __future__ import annotations


def _clip_halfplane(pts, axis: int, bound: float, keep_less: bool):
    """One S-H pass: keep points with pts[axis] <= bound (keep_less) or
    >= bound.  ``pts`` is an OPEN ring (no closing dup)."""
    n = len(pts)
    if n == 0:
        return pts
    out = []
    for i in range(n):
        cur = pts[i]
        prev = pts[i - 1]
        cur_in = (cur[axis] <= bound) if keep_less else (cur[axis] >= bound)
        prev_in = (prev[axis] <= bound) if keep_less else (prev[axis] >= bound)
        if cur_in != prev_in:
            # edge crosses the boundary: interpolate
            t = (bound - prev[axis]) / (cur[axis] - prev[axis])
            if axis == 0:
                out.append((bound, prev[1] + t * (cur[1] - prev[1])))
            else:
                out.append((prev[0] + t * (cur[0] - prev[0]), bound))
        if cur_in:
            out.append(cur)
    return out


def clip_convex_ring_to_rect(ring, x0, y0, x1, y1):
    """Closed convex ring → closed clipped ring (or None if empty /
    degenerate).  Winding is preserved."""
    pts = list(ring[:-1]) if ring and ring[0] == ring[-1] else list(ring)
    for axis, bound, keep_less in (
        (0, x0, False),
        (0, x1, True),
        (1, y0, False),
        (1, y1, True),
    ):
        pts = _clip_halfplane(pts, axis, bound, keep_less)
        if len(pts) < 3:
            return None
    area2 = 0.0
    for i in range(len(pts)):
        ax, ay = pts[i]
        bx, by = pts[(i + 1) % len(pts)]
        area2 += ax * by - bx * ay
    if area2 == 0.0:
        return None  # pure boundary touch
    return pts + [pts[0]]


def is_single_convex_ring(mp) -> bool:
    """mp is one polygon with one hole-free ring, strictly convex-or-
    collinear with consistent turn direction."""
    if len(mp) != 1 or len(mp[0]) != 1:
        return False
    ring = mp[0][0]
    n = len(ring) - 1
    if n < 3:
        return False
    sign = 0
    for k in range(n):
        ax, ay = ring[k]
        bx, by = ring[(k + 1) % n]
        cx, cy = ring[(k + 2) % n]
        cross = (bx - ax) * (cy - by) - (by - ay) * (cx - bx)
        if cross != 0.0:
            s = 1 if cross > 0 else -1
            if sign == 0:
                sign = s
            elif s != sign:
                return False
    return sign != 0
