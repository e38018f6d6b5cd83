"""Dissolve (per-key cascaded union) — stages/dissolve.py.

Pins: (1) tree-reduce union ≡ brute sequential union as a SET measure,
(2) batch-composition independence (the monoid property the partial/
final split relies on), (3) the depth-aware even-odd area against a
unit-cell grid oracle, including the island-in-a-hole parenting case
that position-based shoelace miscounts.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from rust_geo_booleanop_ray.sources.arrow_geom import mps_to_arrow, rects_to_arrow
from rust_geo_booleanop_ray.stages.dissolve import (
    dissolve_partial,
    dissolve_stats_group,
    manhattan_perimeter,
    rectilinear_even_odd_area,
    union_reduce_keyed,
)


def _rand_rects(rng, n, span=40):
    x0 = rng.integers(0, span, n)
    y0 = rng.integers(0, span, n)
    w = rng.integers(1, 8, n)
    h = rng.integers(1, 8, n)
    return (
        x0.astype(np.float64),
        y0.astype(np.float64),
        (x0 + w).astype(np.float64),
        (y0 + h).astype(np.float64),
    )


def _grid_truth(minx, miny, maxx, maxy):
    cov = set()
    for a, b, c, d in zip(minx, miny, maxx, maxy):
        for x in range(int(a), int(c)):
            for y in range(int(b), int(d)):
                cov.add((x, y))
    adj = sum(1 for (x, y) in cov if (x + 1, y) in cov) + sum(
        1 for (x, y) in cov if (x, y + 1) in cov
    )
    return len(cov), 4 * len(cov) - 2 * adj


def test_union_reduce_matches_grid_truth():
    rng = np.random.default_rng(7)
    minx, miny, maxx, maxy = _rand_rects(rng, 60)
    keys = np.asarray(["k"] * 60)
    uk, ug = union_reduce_keyed(keys, rects_to_arrow(minx, miny, maxx, maxy))
    assert list(uk) == ["k"]
    from rust_geo_booleanop_ray.sources.arrow_geom import arrow_to_mps

    mp = arrow_to_mps(ug)[0]
    area, perim = _grid_truth(minx, miny, maxx, maxy)
    assert round(rectilinear_even_odd_area(mp)) == area
    assert round(manhattan_perimeter(mp)) == perim


def test_partial_final_split_is_batch_independent():
    rng = np.random.default_rng(11)
    minx, miny, maxx, maxy = _rand_rects(rng, 80)
    keys = np.where(np.arange(80) % 2 == 0, "a", "b")
    t = pa.table(
        {"k": pa.array(keys.tolist()), "geom": rects_to_arrow(minx, miny, maxx, maxy)}
    )
    results = []
    for n_batches in (1, 3, 8):
        parts = []
        n = t.num_rows
        for i in range(n_batches):
            sl = t.slice(i * n // n_batches, (i + 1) * n // n_batches - i * n // n_batches)
            parts.append(dissolve_partial(sl, "k", "geom"))
        out = dissolve_stats_group(pa.concat_tables(parts), "k", "geom")
        results.append(sorted(out.to_pylist(), key=lambda r: r["k"]))
    assert results[0] == results[1] == results[2]
    # cross-check vs grid truth per key
    for key in ("a", "b"):
        m = keys == key
        area, perim = _grid_truth(minx[m], miny[m], maxx[m], maxy[m])
        row = next(r for r in results[0] if r["k"] == key)
        assert (row["union_area"], row["union_perim"]) == (area, perim)


def test_even_odd_area_island_in_hole():
    # outer 0..10, hole 2..8, island 4..6 — parented the pathological
    # way (island listed as a second "hole" of the same polygon)
    def ring(x0, y0, x1, y1):
        return [(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)]

    mp = [[ring(0, 0, 10, 10), ring(2, 2, 8, 8), ring(4, 4, 6, 6)]]
    truth = 100 - 36 + 4
    assert round(rectilinear_even_odd_area(mp)) == truth
    # proper parenting (island its own polygon) gives the same answer
    mp2 = [[ring(0, 0, 10, 10), ring(2, 2, 8, 8)], [ring(4, 4, 6, 6)]]
    assert round(rectilinear_even_odd_area(mp2)) == truth
