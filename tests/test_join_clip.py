"""Spatial join + clip strategies: tile grid, broadcast poly, within-cell;
tiles raster/vector; lineage resume.  Local (no Ray) where possible."""

import numpy as np
import pyarrow as pa

from rust_geo_booleanop_ray.sources.arrow_geom import (
    arrow_to_mps,
    mp_bounds,
    mps_to_arrow,
    shoelace_area,
)
from rust_geo_booleanop_ray.sources.images import synth_image_batch
from rust_geo_booleanop_ray.stages.cells import cell_bounds, cell_encode
from rust_geo_booleanop_ray.stages.footprint import derive_footprints
from rust_geo_booleanop_ray.stages.join_clip import (
    BroadcastPolyJoinClip,
    TileJoinClip,
    _tile_multipolygon,
    join_cells_within_group,
)
from rust_geo_booleanop_ray.stages.tiles import RasterizeTile, raster_to_rects


def _footprints(n=80):
    return derive_footprints(synth_image_batch(np.arange(n)))


def test_tile_join_exact_area_conservation():
    """Clipped pieces of one footprint sum to the footprint area
    (tiles partition the plane)."""
    f = _footprints(60)
    out = TileJoinClip(tile_res=4, mode="exact")(f)
    assert out.num_rows >= f.num_rows  # at least one tile per footprint
    areas = {}
    for i in range(out.num_rows):
        img = out["image_id"][i].as_py()
        areas[img] = areas.get(img, 0.0) + out["clip_area"][i].as_py()
    mps = arrow_to_mps(f["footprint"])
    for i in range(f.num_rows):
        img = f["image_id"][i].as_py()
        expected = abs(shoelace_area(mps[i]))
        assert abs(areas[img] - expected) < 1e-9 * max(1.0, expected), img


def test_tile_join_assign_superset_of_exact():
    f = _footprints(40)
    assign = TileJoinClip(tile_res=4, mode="assign")(f)
    exact = TileJoinClip(tile_res=4, mode="exact")(f)
    a = set(zip(assign["image_id"].to_pylist(), assign["tile_id"].to_pylist()))
    e = set(zip(exact["image_id"].to_pylist(), exact["tile_id"].to_pylist()))
    assert e <= a


def test_clip_stays_inside_tile():
    f = _footprints(30)
    out = TileJoinClip(tile_res=4, mode="exact")(f)
    clips = arrow_to_mps(out["clip"])
    for i in range(out.num_rows):
        x0, y0, x1, y1 = cell_bounds(int(out["tile_id"][i].as_py()))
        bx0, by0, bx1, by1 = mp_bounds(clips[i])
        assert bx0 >= x0 - 1e-9 and bx1 <= x1 + 1e-9
        assert by0 >= y0 - 1e-9 and by1 <= y1 + 1e-9


def _poly_table(tile_ids):
    geoms = [_tile_multipolygon(t) for t in tile_ids]
    bounds = [mp_bounds(g) for g in geoms]
    return pa.table(
        {
            "tile_id": pa.array(tile_ids, pa.int64()),
            "geom": mps_to_arrow(geoms),
            "minx": pa.array([b[0] for b in bounds]),
            "miny": pa.array([b[1] for b in bounds]),
            "maxx": pa.array([b[2] for b in bounds]),
            "maxy": pa.array([b[3] for b in bounds]),
        }
    )


def test_broadcast_join_matches_tile_join():
    """Broadcast join against the full res-4 tile set must equal
    TileJoinClip exact output."""
    f = _footprints(40)
    exact = TileJoinClip(tile_res=4, mode="exact")(f)
    tile_ids = sorted(set(exact["tile_id"].to_pylist()))
    stage = BroadcastPolyJoinClip(_poly_table(tile_ids))
    out = stage(f)
    got = set(zip(out["image_id"].to_pylist(), out["tile_id"].to_pylist()))
    exp = set(zip(exact["image_id"].to_pylist(), exact["tile_id"].to_pylist()))
    assert got == exp
    # areas match row-for-row
    ga = {(r["image_id"], r["tile_id"]): r["clip_area"] for r in out.to_pylist()}
    ea = {(r["image_id"], r["tile_id"]): r["clip_area"] for r in exact.to_pylist()}
    for k in ga:
        assert abs(ga[k] - ea[k]) < 1e-12


def test_within_cell_group_join():
    f = _footprints(40)
    exact = TileJoinClip(tile_res=4, mode="exact")(f)
    tile_ids = sorted(set(exact["tile_id"].to_pylist()))
    build = _poly_table(tile_ids)
    # one mega-group (single cell) exercises the group-join path
    probe = f.select(["image_id", "footprint", "minx", "miny", "maxx", "maxy"])
    probe = probe.append_column("side", pa.array(["probe"] * probe.num_rows))
    probe = probe.append_column("tile_id", pa.array([0] * probe.num_rows, pa.int64()))
    probe = probe.append_column("geom", probe["footprint"])
    build2 = build.append_column("side", pa.array(["build"] * build.num_rows))
    build2 = build2.append_column("image_id", pa.array([""] * build.num_rows))
    build2 = build2.append_column("footprint", build2["geom"])
    cols = ["image_id", "tile_id", "footprint", "geom", "minx", "miny", "maxx", "maxy", "side"]
    group = pa.concat_tables([probe.select(cols), build2.select(cols)])
    out = join_cells_within_group(group)
    got = set(zip(out["image_id"].to_pylist(), out["tile_id"].to_pylist()))
    exp = set(zip(exact["image_id"].to_pylist(), exact["tile_id"].to_pylist()))
    assert got == exp


def test_rasterize_and_vectorize():
    # one tile fully covered by one clip = the tile rect itself
    tile = int(cell_encode(np.array([10.0]), np.array([10.0]), 4)[0])
    tile_poly = _tile_multipolygon(tile)
    g = pa.table(
        {
            "tile_id": pa.array([tile], pa.int64()),
            "clip": mps_to_arrow([tile_poly]),
        }
    )
    r = RasterizeTile(px=16)(g)
    assert r["coverage_fraction"][0].as_py() == 1.0
    rects = raster_to_rects(r["raster"][0].as_py(), 16, tile)
    assert len(rects) == 1
    x0, y0, x1, y1 = cell_bounds(tile)
    assert abs(shoelace_area(rects) - (x1 - x0) * (y1 - y0)) < 1e-9


def test_lineage_resume(tmp_path):
    from rust_geo_booleanop_ray.state.lineage import (
        PartitionCommitWriter,
        completed_partitions,
    )

    out = str(tmp_path / "out")
    w = PartitionCommitWriter(out, config_hash="cfg1")
    g1 = pa.table({"part": pa.array([3, 3], pa.int64()), "v": pa.array([1, 2])})
    m1 = w(g1)
    assert m1["skipped"][0].as_py() is False
    assert completed_partitions(out, "cfg1") == {3}
    # re-run skips
    m2 = w(g1)
    assert m2["skipped"][0].as_py() is True
    # different config rewrites
    w2 = PartitionCommitWriter(out, config_hash="cfg2")
    m3 = w2(g1)
    assert m3["skipped"][0].as_py() is False
    assert completed_partitions(out, "cfg2") == {3}
    assert completed_partitions(out, "cfg1") == set()


def test_convex_clip_matches_martinez_randomized():
    """Sutherland–Hodgman fast path vs Martinez kernel: area equality
    over random rotated quads × a fixed rect."""
    from rust_geo_booleanop_ray.functions.convex_clip import (
        clip_convex_ring_to_rect,
        is_single_convex_ring,
    )
    from rust_geo_booleanop_ray.geom import boolean_op

    rng = np.random.default_rng(9)
    rect = (-2.0, -2.0, 3.0, 3.0)
    tile_poly = [
        [
            [
                (rect[0], rect[1]),
                (rect[2], rect[1]),
                (rect[2], rect[3]),
                (rect[0], rect[3]),
                (rect[0], rect[1]),
            ]
        ]
    ]
    for _ in range(500):
        cx, cy = rng.uniform(-5, 5, 2)
        w, h = rng.uniform(0.5, 6, 2)
        th = rng.uniform(0, 2 * np.pi)
        c, s = np.cos(th), np.sin(th)
        pts = [(-w / 2, -h / 2), (w / 2, -h / 2), (w / 2, h / 2), (-w / 2, h / 2)]
        ring = [(cx + x * c - y * s, cy + x * s + y * c) for x, y in pts]
        ring.append(ring[0])
        assert is_single_convex_ring([[ring]])
        sh = clip_convex_ring_to_rect(ring, *rect)
        a_sh = abs(shoelace_area([[sh]])) if sh else 0.0
        mz = boolean_op([[ring]], tile_poly, "intersection")
        a_mz = abs(shoelace_area(mz)) if mz else 0.0
        assert abs(a_sh - a_mz) <= 1e-9 * max(1.0, a_mz)


def test_merge_rasters_saturates_instead_of_wrapping():
    """Pixel counts past the uint16 max must saturate, not wrap to 0
    (a wrap would undercount coverage_fraction)."""
    from rust_geo_booleanop_ray.stages.tiles import merge_rasters

    tile_id = int(cell_encode(np.array([0.0]), np.array([0.0]), 3)[0])
    px = 4
    # two partials of 40000 per pixel: the uint16 sum would wrap to
    # 80000 % 65536 = 14464 (nonzero) — craft a pair that wraps to 0:
    # 32768 + 32768 = 65536 ≡ 0 (mod 2^16)
    half = np.full(px * px, 32768, dtype=np.uint16).tobytes()
    group = pa.table(
        {
            "tile_id": pa.array([tile_id, tile_id], pa.int64()),
            "px": pa.array([px, px], pa.int32()),
            "raster": pa.array([half, half], pa.binary()),
            "n_pieces": pa.array([32768, 32768], pa.int64()),
        }
    )
    out = merge_rasters(group)
    assert out["coverage_fraction"][0].as_py() == 1.0
    merged = np.frombuffer(out["raster"][0].as_py(), dtype=np.uint16)
    assert (merged == 65535).all()  # saturated, not wrapped


def _region_polys(res=3):
    ids = [int(c) for c in cell_encode(np.linspace(-150, 150, 8), np.linspace(-60, 60, 8), res)]
    ids = sorted(set(ids))
    from rust_geo_booleanop_ray.stages.cells import cell_polygon

    geoms = [cell_polygon(c) for c in ids]
    bounds = [mp_bounds(g) for g in geoms]
    return pa.table(
        {
            "tile_id": pa.array(ids, pa.int64()),
            "geom": mps_to_arrow(geoms),
            "minx": pa.array([b[0] for b in bounds]),
            "miny": pa.array([b[1] for b in bounds]),
            "maxx": pa.array([b[2] for b in bounds]),
            "maxy": pa.array([b[3] for b in bounds]),
        }
    )


def _rows_key(t):
    return sorted(
        (
            t["image_id"][i].as_py(),
            t["tile_id"][i].as_py(),
            round(t["clip_area"][i].as_py(), 12),
        )
        for i in range(t.num_rows)
    )


def test_broadcast_poly_native_matches_python_fallback(monkeypatch):
    """The whole-batch native clip path and the per-pair Python loop
    must produce identical join rows (pairs + areas)."""
    import os

    f = _footprints(120)
    polys = _region_polys()
    native_out = BroadcastPolyJoinClip(polys)(f)

    monkeypatch.setenv("GEO_NATIVE", "0")
    py_out = BroadcastPolyJoinClip(polys)(f)
    monkeypatch.delenv("GEO_NATIVE")
    assert native_out.num_rows > 0
    assert _rows_key(native_out) == _rows_key(py_out)
    # clip geometries themselves agree
    assert sorted(map(str, arrow_to_mps(native_out["clip"]))) == sorted(
        map(str, arrow_to_mps(py_out["clip"]))
    )


def test_join_cells_within_group_native_matches_python(monkeypatch):
    f = _footprints(60)
    polys = _region_polys()
    n_b = polys.num_rows
    n_p = f.num_rows
    group = pa.table(
        {
            "side": pa.array(["build"] * n_b + ["probe"] * n_p),
            "tile_id": pa.array(
                polys["tile_id"].to_pylist() + [0] * n_p, pa.int64()
            ),
            "geom": pa.concat_arrays(
                [polys["geom"].combine_chunks() if isinstance(polys["geom"], pa.ChunkedArray) else polys["geom"],
                 mps_to_arrow([None] * n_p).cast(polys["geom"].type)]
            ),
            "image_id": pa.array([""] * n_b + f["image_id"].to_pylist()),
            "footprint": pa.concat_arrays(
                [mps_to_arrow([None] * n_b).cast(f["footprint"].type),
                 f["footprint"].combine_chunks() if isinstance(f["footprint"], pa.ChunkedArray) else f["footprint"]]
            ),
            "minx": pa.array(polys["minx"].to_pylist() + f["minx"].to_pylist()),
            "miny": pa.array(polys["miny"].to_pylist() + f["miny"].to_pylist()),
            "maxx": pa.array(polys["maxx"].to_pylist() + f["maxx"].to_pylist()),
            "maxy": pa.array(polys["maxy"].to_pylist() + f["maxy"].to_pylist()),
        }
    )
    native_out = join_cells_within_group(group)
    monkeypatch.setenv("GEO_NATIVE", "0")
    py_out = join_cells_within_group(group)
    monkeypatch.delenv("GEO_NATIVE")
    assert native_out.num_rows > 0
    assert _rows_key(native_out) == _rows_key(py_out)


def test_pbsm_dedup_matches_emit_all_plus_dedup():
    """PBSM reference-cell duplicate avoidance: joining per cell with
    pbsm_dedup=True yields each (image, tile) pair EXACTLY once, and
    the pair set + areas equal emit-all-then-dedup across cells."""
    from rust_geo_booleanop_ray.stages.cells import explode_to_cells
    from rust_geo_booleanop_ray.stages.join_clip import (
        join_cells_within_group_dedup,
    )

    f = _footprints(120)  # includes a giant (idx 0) spanning many cells
    n_p = f.num_rows
    probe = pa.table(
        {
            "image_id": f["image_id"],
            "tile_id": pa.array([0] * n_p, pa.int64()),
            "footprint": f["footprint"],
            "geom": f["footprint"],
            "minx": f["minx"],
            "miny": f["miny"],
            "maxx": f["maxx"],
            "maxy": f["maxy"],
            "side": pa.array(["probe"] * n_p),
        }
    )
    # build side: offset copies of the same quads so bboxes straddle
    # cell boundaries differently from the probe side
    g = _footprints(90)
    n_b = g.num_rows
    build = pa.table(
        {
            "image_id": pa.array([""] * n_b),
            "tile_id": pa.array(np.arange(n_b), pa.int64()),
            "footprint": g["footprint"],
            "geom": g["footprint"],
            "minx": g["minx"],
            "miny": g["miny"],
            "maxx": g["maxx"],
            "maxy": g["maxy"],
            "side": pa.array(["build"] * n_b),
        }
    )
    res = 4
    both = pa.concat_tables([explode_to_cells(probe, res), explode_to_cells(build, res)])
    cells = both["cell"].to_numpy()

    dedup_pairs = {}
    all_pairs = {}
    for c in np.unique(cells):
        grp = both.filter(pa.array(cells == c))
        out_d = join_cells_within_group_dedup(grp)
        for i in range(out_d.num_rows):
            key = (out_d["image_id"][i].as_py(), out_d["tile_id"][i].as_py())
            assert key not in dedup_pairs, f"pair {key} emitted twice"
            dedup_pairs[key] = out_d["clip_area"][i].as_py()
        out_a = join_cells_within_group(grp)
        for i in range(out_a.num_rows):
            key = (out_a["image_id"][i].as_py(), out_a["tile_id"][i].as_py())
            all_pairs[key] = out_a["clip_area"][i].as_py()

    assert set(dedup_pairs) == set(all_pairs)
    assert dedup_pairs and len(all_pairs) < sum(
        1 for _ in dedup_pairs
    ) or len(dedup_pairs) == len(all_pairs)
    for k, v in dedup_pairs.items():
        assert v == all_pairs[k], k
