"""Tile materialization: raster ⇄ vector.

Tiles are cells at a fixed resolution (one id space for partitioning,
join keys and tile naming).  ``RasterizeTile`` turns the clipped
pieces of one tile into a coverage-count raster (vectorized PIP on the
pixel-center grid); ``raster_to_rects`` extracts maximal horizontal-run
rectangles back into vector space (raster→vector).  Together they give
the raster↔vector round trip of the north star.

Used as: join_output.groupby("tile_id").map_groups(RasterizeTile(px),
batch_format="pyarrow") — the groupby is the one shuffle, keyed by the
same cell-id space as everything else.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.pip import points_in_multipolygon
from ..sources.arrow_geom import arrow_to_mps, mps_to_arrow
from .cells import cell_bounds


class RasterizeTile:
    """Per-tile coverage raster from clipped geometries (map_groups fn)."""

    def __init__(self, px: int = 32):
        self.px = px
        self.__name__ = type(self).__name__

    def __call__(self, group: pa.Table) -> pa.Table:
        tile_id = int(group["tile_id"][0].as_py())
        x0, y0, x1, y1 = cell_bounds(tile_id)
        px = self.px
        xs = x0 + (np.arange(px) + 0.5) * (x1 - x0) / px
        ys = y0 + (np.arange(px) + 0.5) * (y1 - y0) / px
        gx, gy = np.meshgrid(xs, ys)
        gx = gx.ravel()
        gy = gy.ravel()

        # accumulate in uint32 — a pixel covered by >65535 pieces must
        # saturate on the uint16 wire, never wrap to 0 (wrap would
        # undercount coverage_fraction)
        counts = np.zeros(px * px, dtype=np.uint32)
        for mp in arrow_to_mps(group["clip"]):
            counts += points_in_multipolygon(gx, gy, mp).astype(np.uint32)

        covered = int((counts > 0).sum())
        wire = np.minimum(counts, 65535).astype(np.uint16)
        return pa.table(
            {
                "tile_id": pa.array([tile_id], pa.int64()),
                "px": pa.array([px], pa.int32()),
                "raster": pa.array([wire.tobytes()], pa.binary()),
                "n_pieces": pa.array([group.num_rows], pa.int64()),
                "coverage_fraction": pa.array([covered / (px * px)], pa.float64()),
            }
        )


class RasterizePartial:
    """map_batches kernel: clip rows → per-(batch, tile) PARTIAL count
    rasters.  The heavy geometry work happens here, before the shuffle;
    the ``groupby(tile_id)`` then moves only fixed-size bitmaps
    (2·px² bytes) instead of geometry lists, and ``merge_rasters`` sums
    them.  Count rasters are additive and order-independent, so
    partial + merge is exactly equivalent to whole-group rasterization
    (the pre-aggregate-before-shuffle pattern)."""

    def __init__(self, px: int = 32):
        self.px = px
        self.__name__ = type(self).__name__
        self._grids: dict = {}

    def _grid(self, tile_id: int):
        g = self._grids.get(tile_id)
        if g is None:
            x0, y0, x1, y1 = cell_bounds(tile_id)
            px = self.px
            xs = x0 + (np.arange(px) + 0.5) * (x1 - x0) / px
            ys = y0 + (np.arange(px) + 0.5) * (y1 - y0) / px
            gx, gy = np.meshgrid(xs, ys)
            g = (gx.ravel(), gy.ravel())
            if len(self._grids) > 4096:
                self._grids.clear()
            self._grids[tile_id] = g
        return g

    def __call__(self, batch: pa.Table) -> pa.Table:
        px = self.px
        tile_ids = batch["tile_id"].to_numpy()
        mps = arrow_to_mps(batch["clip"])
        acc: dict = {}
        pieces: dict = {}
        for tid, mp in zip(tile_ids, mps):
            tid = int(tid)
            gx, gy = self._grid(tid)
            counts = acc.get(tid)
            if counts is None:
                # uint32 accumulator; saturate to the uint16 wire below
                counts = np.zeros(px * px, dtype=np.uint32)
                acc[tid] = counts
                pieces[tid] = 0
            counts += points_in_multipolygon(gx, gy, mp).astype(np.uint32)
            pieces[tid] += 1
        tids = sorted(acc)
        return pa.table(
            {
                "tile_id": pa.array(tids, pa.int64()),
                "px": pa.array([px] * len(tids), pa.int32()),
                "raster": pa.array(
                    [np.minimum(acc[t], 65535).astype(np.uint16).tobytes() for t in tids],
                    pa.binary(),
                ),
                "n_pieces": pa.array([pieces[t] for t in tids], pa.int64()),
            }
        )


def merge_rasters(group: pa.Table) -> pa.Table:
    """map_groups merge of RasterizePartial outputs for one tile."""
    tile_id = int(group["tile_id"][0].as_py())
    px = int(group["px"][0].as_py())
    # uint32 accumulation: summing many uint16 partials must not wrap
    # (a pixel wrapping to 0 mod 65536 would silently undercount
    # coverage_fraction); the merged wire saturates at the uint16 max.
    # All partials of a tile are px*px uint16, so the whole group sums
    # in ONE zero-copy reshape — no per-raster Python loop
    arr = group["raster"]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset : arr.offset + n + 1
    ]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    seg = data[offs[0] : offs[-1]]
    counts = (
        seg.view(np.uint16).reshape(n, px * px).sum(axis=0, dtype=np.uint32)
        if seg.size
        else np.zeros(px * px, dtype=np.uint32)
    )
    covered = int((counts > 0).sum())
    wire = np.minimum(counts, 65535).astype(np.uint16)
    return pa.table(
        {
            "tile_id": pa.array([tile_id], pa.int64()),
            "px": pa.array([px], pa.int32()),
            "raster": pa.array([wire.tobytes()], pa.binary()),
            "n_pieces": pa.array([int(group["n_pieces"].to_numpy().sum())], pa.int64()),
            "coverage_fraction": pa.array([covered / (px * px)], pa.float64()),
        }
    )


def raster_to_rects(raster: bytes, px: int, tile_id: int):
    """Coverage raster → vector multipolygon of axis-aligned rectangles.

    Greedy row-wise run-length extraction of the covered mask: each
    maximal horizontal run of covered pixels in a row becomes one rect;
    vertically adjacent identical runs are merged.  Deterministic.
    """
    counts = np.frombuffer(raster, dtype=np.uint16).reshape(px, px)
    mask = counts > 0
    x0, y0, x1, y1 = cell_bounds(tile_id)
    wx = (x1 - x0) / px
    wy = (y1 - y0) / px

    # collect runs per row: (row, start_col, end_col)
    active: dict = {}  # (start_col, end_col) -> start_row
    polys = []

    def flush(start_col, end_col, start_row, end_row):
        rx0 = x0 + start_col * wx
        rx1 = x0 + (end_col + 1) * wx
        ry0 = y0 + start_row * wy
        ry1 = y0 + (end_row + 1) * wy
        polys.append([[(rx0, ry0), (rx1, ry0), (rx1, ry1), (rx0, ry1), (rx0, ry0)]])

    for row in range(px):
        runs = set()
        col = 0
        while col < px:
            if mask[row, col]:
                start = col
                while col < px and mask[row, col]:
                    col += 1
                runs.add((start, col - 1))
            else:
                col += 1
        # close runs that ended
        for key in list(active):
            if key not in runs:
                flush(key[0], key[1], active.pop(key), row - 1)
        for key in runs:
            if key not in active:
                active[key] = row
    for key, start_row in active.items():
        flush(key[0], key[1], start_row, px - 1)

    polys.sort(key=lambda p: (p[0][0][1], p[0][0][0]))
    return polys


def vectorize_tiles_batch(batch: pa.Table) -> pa.Table:
    """map_batches kernel: raster rows → vector multipolygon rows."""
    mps = [
        raster_to_rects(
            batch["raster"][i].as_py(),
            int(batch["px"][i].as_py()),
            int(batch["tile_id"][i].as_py()),
        )
        for i in range(batch.num_rows)
    ]
    return pa.table(
        {
            "tile_id": batch["tile_id"],
            "geom": mps_to_arrow(mps),
            "coverage_fraction": batch["coverage_fraction"],
        }
    )
