"""Point-in-polygon (ray casting, even-odd), vectorized over points.

Boundary convention: even-odd crossing with half-open edges — points
exactly on a boundary may land either side; use the exact kernel for
boundary-sensitive work.  For the tile-assignment fast path this
matches the SQL oracle's closed-open bbox semantics on rectangles when
called with ``pip_bbox``.
"""

from __future__ import annotations

import numpy as np


def points_in_ring(px: np.ndarray, py: np.ndarray, ring) -> np.ndarray:
    """Even-odd crossing count parity for many points vs one ring."""
    inside = np.zeros(len(px), dtype=bool)
    rx = np.asarray([p[0] for p in ring])
    ry = np.asarray([p[1] for p in ring])
    n = len(rx)
    j = n - 2 if rx[0] == rx[-1] and ry[0] == ry[-1] else n - 1
    i = 0
    limit = n - 1 if (rx[0] == rx[-1] and ry[0] == ry[-1]) else n
    with np.errstate(divide="ignore", invalid="ignore"):
        for i in range(limit):
            x1, y1 = rx[i], ry[i]
            x2, y2 = rx[j], ry[j]
            crosses = (y1 > py) != (y2 > py)
            # horizontal edges (y1 == y2) never satisfy `crosses`; the
            # masked divide below only feeds rows where crosses is True
            xint = (x2 - x1) * (py - y1) / (y2 - y1) + x1
            inside ^= crosses & (px < xint)
            j = i
    return inside


def points_in_multipolygon(px, py, mp) -> np.ndarray:
    """Vectorized points vs one multipolygon (exterior minus holes,
    even-odd across all rings)."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    inside = np.zeros(len(px), dtype=bool)
    for poly in mp:
        for ring in poly:
            inside ^= points_in_ring(px, py, ring)
    return inside


def pip_bbox(px, py, minx, miny, maxx, maxy) -> np.ndarray:
    """Closed-open box containment ([minx, maxx) × [miny, maxy)) —
    the grid-tile fast path, SQL-equivalent to floor-division binning."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    return (px >= minx) & (px < maxx) & (py >= miny) & (py < maxy)
