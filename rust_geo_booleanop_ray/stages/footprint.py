"""Footprint derivation: image rows → world-space quad polygons.

Deterministic per-row geo transform (pure function of the image index,
splitmix64 streams): each image is placed at a world position with a
rotated rectangular footprint whose aspect follows (w, h).  A 1/512
slice of rows gets a continent-sized footprint — the deliberate skew
source exercising hot-cell splitting.

Fully vectorized: corner coordinates are computed as numpy arrays and
assembled into the nested-list geometry column straight from offset
buffers (ListArray.from_arrays — no per-row Python).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..sources.arrow_geom import COORD_T


def _splitmix64(x: np.ndarray) -> np.ndarray:
    # the uint64 multiplies wrap BY DESIGN; errstate silences the
    # scalar-overflow RuntimeWarning 0-d inputs would otherwise emit
    with np.errstate(over="ignore"):
        return _splitmix64_impl(np.asarray(x, dtype=np.uint64))


def _splitmix64_impl(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    z = x
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(
        0xFFFFFFFFFFFFFFFF
    )
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(
        0xFFFFFFFFFFFFFFFF
    )
    return z ^ (z >> np.uint64(31))


def _u01(x: np.ndarray) -> np.ndarray:
    return x.astype(np.float64) / float(2**64)


def image_index(batch: pa.Table) -> np.ndarray:
    """Parse the numeric index out of image_id ('img-%08d'), vectorized."""
    sliced = pc.utf8_slice_codeunits(batch["image_id"], 4)
    return pc.cast(sliced, pa.int64()).to_numpy().astype(np.uint64)


def footprint_params(indices) -> tuple:
    """(cx, cy, cos_t, sin_t, half_w, half_h) for the given image
    indices — the identical float-op sequence as derive_footprints
    (w/h re-derived from the synth-source _SIZES table), exposed so SQL
    oracles can inline the quad parameters as literals."""
    from ..sources.images import _SIZES

    idx = np.asarray(indices, dtype=np.uint64)
    u_pos_x = _u01(_splitmix64(idx))
    u_pos_y = _u01(_splitmix64(idx + np.uint64(1 << 32)))
    u_rot = _u01(_splitmix64(idx + np.uint64(2 << 32)))
    u_scale = _u01(_splitmix64(idx + np.uint64(3 << 32)))
    cx = -170.0 + u_pos_x * 340.0
    cy = -80.0 + u_pos_y * 160.0
    i64 = idx.astype(np.int64)
    ws = _SIZES[i64 % len(_SIZES)].astype(np.float64)
    hs = _SIZES[(i64 // 3) % len(_SIZES)].astype(np.float64)
    scale = (0.5 + u_scale) * 0.05
    half_w = ws * scale * 0.5
    half_h = hs * scale * 0.5
    giant = (idx % np.uint64(512)) == np.uint64(0)
    half_w = np.where(giant, 15.0, half_w)
    half_h = np.where(giant, 10.0, half_h)
    theta = u_rot * (2.0 * np.pi)
    return cx, cy, np.cos(theta), np.sin(theta), half_w, half_h


def derive_footprints(batch: pa.Table) -> pa.Table:
    """map_batches kernel: image batch → + footprint, centroid, bbox cols."""
    idx = image_index(batch)
    n = len(idx)
    u_pos_x = _u01(_splitmix64(idx))
    u_pos_y = _u01(_splitmix64(idx + np.uint64(1 << 32)))
    u_rot = _u01(_splitmix64(idx + np.uint64(2 << 32)))
    u_scale = _u01(_splitmix64(idx + np.uint64(3 << 32)))

    cx = -170.0 + u_pos_x * 340.0
    cy = -80.0 + u_pos_y * 160.0

    ws = batch["w"].to_numpy().astype(np.float64)
    hs = batch["h"].to_numpy().astype(np.float64)
    # footprint half-extent in degrees: 0.05°–1.1° for normal rows
    scale = (0.5 + u_scale) * 0.05
    half_w = ws * scale * 0.5
    half_h = hs * scale * 0.5
    # skew: 1 in 512 images is continent-sized (15° half-extent)
    giant = (idx % np.uint64(512)) == np.uint64(0)
    half_w = np.where(giant, 15.0, half_w)
    half_h = np.where(giant, 10.0, half_h)

    theta = u_rot * (2.0 * np.pi)
    cos_t = np.cos(theta)
    sin_t = np.sin(theta)

    # quad corners (CCW), closed ring of 5 points
    dx = np.stack([-half_w, half_w, half_w, -half_w, -half_w], axis=1)
    dy = np.stack([-half_h, -half_h, half_h, half_h, -half_h], axis=1)
    xs = cx[:, None] + dx * cos_t[:, None] - dy * sin_t[:, None]
    ys = cy[:, None] + dx * sin_t[:, None] + dy * cos_t[:, None]

    coords = np.empty((n * 5, 2), dtype=np.float64)
    coords[:, 0] = xs.ravel()
    coords[:, 1] = ys.ravel()

    coord_arr = pa.FixedSizeListArray.from_arrays(pa.array(coords.ravel()), 2)
    ring_off = pa.array(np.arange(n + 1, dtype=np.int32) * 5)
    ring_arr = pa.ListArray.from_arrays(ring_off, coord_arr)
    poly_off = pa.array(np.arange(n + 1, dtype=np.int32))
    poly_arr = pa.ListArray.from_arrays(poly_off, ring_arr)
    mp_arr = pa.ListArray.from_arrays(poly_off, poly_arr)

    out = batch.append_column("footprint", mp_arr)
    out = out.append_column("cx", pa.array(cx))
    out = out.append_column("cy", pa.array(cy))
    out = out.append_column("minx", pa.array(xs.min(axis=1)))
    out = out.append_column("miny", pa.array(ys.min(axis=1)))
    out = out.append_column("maxx", pa.array(xs.max(axis=1)))
    out = out.append_column("maxy", pa.array(ys.max(axis=1)))
    return out
