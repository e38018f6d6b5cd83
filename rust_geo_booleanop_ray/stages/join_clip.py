"""Spatial join + clip stages.

Three join strategies, picked by data shape (ray_guide join patterns):

1. ``TileJoinClip`` — footprints × the regular tile grid.  Tiles are
   cells (stages/cells.py) at ``tile_res``; the cover is computed
   arithmetically (no index needed), the clip is the exact Martinez
   kernel against the tile rect.  Stateless map_batches.
2. ``BroadcastPolyJoinClip`` — footprints × an *irregular* polygon set
   small enough to broadcast (``ray.put`` once).  Actor-pool stage: the
   STR-tree over the polygon bboxes is built ONCE per actor in
   __init__, batches stream through __call__.
3. ``join_cells_within_group`` — both sides large: tag + union both
   datasets, groupby(cell), join inside each cell group with a local
   STR-tree on the smaller side.  Used via
   ``ds.groupby("cell").map_groups(join_cells_within_group,
   batch_format="pyarrow")``.

All outputs carry (image_id, tile_id, cell, clip geometry, clip_area)
— deduplicate PBSM replicas downstream on (image_id, tile_id) when
geometries were replicated to multiple cells.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.convex_clip import clip_convex_ring_to_rect, is_single_convex_ring
from ..functions.rtree import STRtree
from ..geom import boolean_op
from ..sources.arrow_geom import (
    MULTIPOLYGON_T,
    arrow_to_mps,
    mps_to_arrow,
    shoelace_area,
)
from .cells import cell_bounds, cover_bbox

_EMPTY_JOIN_SCHEMA = pa.schema(
    [
        pa.field("image_id", pa.string()),
        pa.field("tile_id", pa.int64()),
        pa.field("clip", MULTIPOLYGON_T),
        pa.field("clip_area", pa.float64()),
    ]
)


class TileJoinClip:
    """Footprints × regular tile grid → clipped pieces.

    mode='assign': bbox-level tile assignment only (no exact geometry) —
    the cheap path whose output is SQL-checkable.
    mode='exact': Martinez clip footprint ∩ tile rect; rows whose exact
    intersection is empty are dropped (bbox cover is a superset).
    """

    def __init__(self, tile_res: int, mode: str = "exact"):
        if mode not in ("assign", "exact"):
            raise ValueError(mode)
        self.tile_res = tile_res
        self.mode = mode
        # resume pushdown: (image, tile) pairs whose output partition
        # (cell_parent(tile, part_steps)) is already committed are
        # dropped HERE, before the exact clip — so a resumed run skips
        # the expensive compute, not just the writes
        self.skip_parts = None
        self.part_steps = 2

    def with_skip_parts(self, skip_parts, part_steps: int = 2):
        self.skip_parts = (
            np.array(sorted(skip_parts), dtype=np.uint64) if skip_parts else None
        )
        self.part_steps = part_steps
        return self

    def __call__(self, batch: pa.Table) -> pa.Table:
        row_idx, tiles = cover_bbox(
            batch["minx"].to_numpy(),
            batch["miny"].to_numpy(),
            batch["maxx"].to_numpy(),
            batch["maxy"].to_numpy(),
            self.tile_res,
        )
        if self.skip_parts is not None and len(row_idx):
            from .cells import cell_parent

            parts = cell_parent(tiles, self.part_steps)
            keep_mask = ~np.isin(parts, self.skip_parts)
            row_idx = row_idx[keep_mask]
            tiles = tiles[keep_mask]
        image_ids = batch["image_id"].take(pa.array(row_idx))
        tile_col = pa.array(tiles.view(np.int64), pa.int64())

        if self.mode == "assign":
            return pa.table({"image_id": image_ids, "tile_id": tile_col})

        bminx = batch["minx"].to_numpy()
        bminy = batch["miny"].to_numpy()
        bmaxx = batch["maxx"].to_numpy()
        bmaxy = batch["maxy"].to_numpy()

        # Native whole-batch path: ONE C call clips every candidate
        # (footprint, tile-rect) pair; only strictly-contained pairs
        # (intersection == footprint) bypass it.  Falls back to the
        # per-row convex/Martinez loop without a native kernel.
        from ..native import native_boolean_batch

        tile_bounds_cache: dict = {}
        contained = np.zeros(len(row_idx), dtype=bool)
        for j in range(len(row_idx)):
            i = row_idx[j]
            t = int(tiles[j])
            tb = tile_bounds_cache.get(t)
            if tb is None:
                tb = tile_bounds_cache[t] = cell_bounds(t)
            tx0, ty0, tx1, ty1 = tb
            contained[j] = (
                bminx[i] > tx0 and bmaxx[i] < tx1 and bminy[i] > ty0 and bmaxy[i] < ty1
            )
        need = ~contained
        if need.any():
            fp_col = batch["footprint"]
            if isinstance(fp_col, pa.ChunkedArray):
                fp_col = fp_col.combine_chunks()
            sub_idx = pa.array(np.asarray(row_idx)[need])
            subj = fp_col.take(sub_idx)
            clip_rects = mps_to_arrow(
                [_tile_multipolygon(int(t)) for t in tiles[need]]
            )
            res = native_boolean_batch(subj, clip_rects, ["intersection"] * len(clip_rects))
        else:
            res = mps_to_arrow([])

        if res is not None:
            res_mps = arrow_to_mps(res)
            mps = arrow_to_mps(fp_col) if need.any() else arrow_to_mps(batch["footprint"])
            clips, areas, keep = [], [], []
            ri = 0
            for j in range(len(row_idx)):
                if contained[j]:
                    fp = mps[row_idx[j]]
                    keep.append(j)
                    clips.append(fp)
                    areas.append(abs(shoelace_area(fp)))
                else:
                    clipped = res_mps[ri]
                    ri += 1
                    if clipped:
                        keep.append(j)
                        clips.append(clipped)
                        areas.append(abs(shoelace_area(clipped)))
            keep_arr = pa.array(np.asarray(keep, dtype=np.int64))
            return pa.table(
                {
                    "image_id": image_ids.take(keep_arr),
                    "tile_id": tile_col.take(keep_arr),
                    "clip": mps_to_arrow(clips),
                    "clip_area": pa.array(areas, pa.float64()),
                }
            )

        # ---- pure-Python fallback (no native kernel) ----
        mps = arrow_to_mps(batch["footprint"])
        is_convex = [is_single_convex_ring(mp) for mp in mps]
        clips, areas, keep = [], [], []
        for j in range(len(row_idx)):
            i = row_idx[j]
            fp = mps[i]
            t = int(tiles[j])
            tb = tile_bounds_cache.get(t)
            if tb is None:
                tb = tile_bounds_cache[t] = cell_bounds(t)
            tx0, ty0, tx1, ty1 = tb
            # Fast path 1: footprint bbox strictly inside the tile →
            # intersection is the footprint itself (no sweep needed).
            if bminx[i] > tx0 and bmaxx[i] < tx1 and bminy[i] > ty0 and bmaxy[i] < ty1:
                keep.append(j)
                clips.append(fp)
                areas.append(abs(shoelace_area(fp)))
                continue
            # Fast path 2: convex footprint × axis rect → Sutherland–
            # Hodgman (exact for convex; Martinez otherwise).
            if is_convex[i]:
                ring = clip_convex_ring_to_rect(fp[0][0], tx0, ty0, tx1, ty1)
                if ring is not None:
                    clipped = [[ring]]
                    keep.append(j)
                    clips.append(clipped)
                    areas.append(abs(shoelace_area(clipped)))
                continue
            clipped = boolean_op(fp, _tile_multipolygon(t), "intersection")
            if clipped:
                keep.append(j)
                clips.append(clipped)
                areas.append(abs(shoelace_area(clipped)))
        keep_arr = pa.array(np.asarray(keep, dtype=np.int64))
        return pa.table(
            {
                "image_id": image_ids.take(keep_arr),
                "tile_id": tile_col.take(keep_arr),
                "clip": mps_to_arrow(clips),
                "clip_area": pa.array(areas, pa.float64()),
            }
        )


def _tile_multipolygon(tile_id: int):
    x0, y0, x1, y1 = cell_bounds(tile_id)
    return [[[(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)]]]


class BroadcastPolyJoinClip:
    """Actor-pool join against a broadcast irregular polygon table.

    ``polys`` is either a plain pyarrow Table or a ``ray.ObjectRef`` to
    one (ray.put once on the driver; each actor ray.gets it once).
    Expected columns: tile_id:int64, geom:multipolygon, minx..maxy.
    """

    def __init__(self, polys, op: str = "intersection"):
        try:
            import ray

            if isinstance(polys, ray.ObjectRef):
                polys = ray.get(polys)
        except ImportError:
            pass
        self.op = op
        self.tile_ids = polys["tile_id"].to_numpy()
        self.geoms = arrow_to_mps(polys["geom"])
        self.tree = STRtree(
            polys["minx"].to_numpy(),
            polys["miny"].to_numpy(),
            polys["maxx"].to_numpy(),
            polys["maxy"].to_numpy(),
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        mps = arrow_to_mps(batch["footprint"])
        bminx = batch["minx"].to_numpy()
        bminy = batch["miny"].to_numpy()
        bmaxx = batch["maxx"].to_numpy()
        bmaxy = batch["maxy"].to_numpy()
        image_ids = batch["image_id"].to_pylist()

        out_img, out_tile, out_clip, out_area = [], [], [], []
        for i in range(batch.num_rows):
            cands = self.tree.query(bminx[i], bminy[i], bmaxx[i], bmaxy[i])
            for c in cands:
                clipped = boolean_op(mps[i], self.geoms[c], self.op)
                if clipped:
                    out_img.append(image_ids[i])
                    out_tile.append(int(self.tile_ids[c]))
                    out_clip.append(clipped)
                    out_area.append(abs(shoelace_area(clipped)))
        if not out_img:
            return _EMPTY_JOIN_SCHEMA.empty_table()
        return pa.table(
            {
                "image_id": pa.array(out_img, pa.string()),
                "tile_id": pa.array(out_tile, pa.int64()),
                "clip": mps_to_arrow(out_clip),
                "clip_area": pa.array(out_area, pa.float64()),
            }
        )


def join_cells_within_group(group: pa.Table) -> pa.Table:
    """Large×large within-cell join for groupby(cell).map_groups.

    Input: one cell's rows from BOTH sides, tagged by ``side`` column
    ('probe' carries image_id+footprint, 'build' carries tile_id+geom).
    Builds an STR-tree on the build side (small per cell), probes with
    the probe side, emits exact clipped intersections.
    """
    side = group["side"].to_pylist()
    is_build = np.array([s == "build" for s in side])
    build = group.filter(pa.array(is_build))
    probe = group.filter(pa.array(~is_build))
    if build.num_rows == 0 or probe.num_rows == 0:
        return _EMPTY_JOIN_SCHEMA.empty_table()

    tree = STRtree(
        build["minx"].to_numpy(),
        build["miny"].to_numpy(),
        build["maxx"].to_numpy(),
        build["maxy"].to_numpy(),
    )
    build_geoms = arrow_to_mps(build["geom"])
    build_tiles = build["tile_id"].to_numpy()
    probe_geoms = arrow_to_mps(probe["footprint"])
    pminx = probe["minx"].to_numpy()
    pminy = probe["miny"].to_numpy()
    pmaxx = probe["maxx"].to_numpy()
    pmaxy = probe["maxy"].to_numpy()
    image_ids = probe["image_id"].to_pylist()

    out_img, out_tile, out_clip, out_area = [], [], [], []
    for i in range(probe.num_rows):
        for c in tree.query(pminx[i], pminy[i], pmaxx[i], pmaxy[i]):
            clipped = boolean_op(probe_geoms[i], build_geoms[c], "intersection")
            if clipped:
                out_img.append(image_ids[i])
                out_tile.append(int(build_tiles[c]))
                out_clip.append(clipped)
                out_area.append(abs(shoelace_area(clipped)))
    if not out_img:
        return _EMPTY_JOIN_SCHEMA.empty_table()
    return pa.table(
        {
            "image_id": pa.array(out_img, pa.string()),
            "tile_id": pa.array(out_tile, pa.int64()),
            "clip": mps_to_arrow(out_clip),
            "clip_area": pa.array(out_area, pa.float64()),
        }
    )
