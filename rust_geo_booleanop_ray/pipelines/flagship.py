"""Flagship pipeline: images → footprints → tile join/clip → tiles.

The end-to-end north-star flow, every stage a Dataset transform:

  read images (streaming synth source or parquet)
    → derive_footprints           (stateless map_batches, vectorized)
    → TileJoinClip('exact')       (stateless map_batches; Martinez clip)
    → groupby(tile_id)            (THE shuffle, keyed on the cell space)
    → RasterizeTile               (map_groups)
    → vectorize_tiles_batch       (map_batches, raster→vector)

No driver-side materialization: callers consume the returned Dataset
(write_parquet / iter_batches / aggregate).
"""

from __future__ import annotations

from ..sources.images import read_synth_images
from ..stages.footprint import derive_footprints
from ..stages.join_clip import TileJoinClip
from ..stages.tiles import RasterizeTile, vectorize_tiles_batch


def footprints_dataset(n_images: int = 2000, seed: int = 42, images_ds=None):
    ds = images_ds if images_ds is not None else read_synth_images(n_images, seed=seed)
    return ds.map_batches(derive_footprints, batch_format="pyarrow", zero_copy_batch=True)


def clip_dataset(n_images: int = 2000, tile_res: int = 5, seed: int = 42, images_ds=None):
    fp = footprints_dataset(n_images, seed, images_ds)
    return fp.map_batches(
        TileJoinClip(tile_res, mode="exact"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def tile_pipeline(n_images: int = 2000, tile_res: int = 5, raster_px: int = 32, seed: int = 42, images_ds=None):
    clips = clip_dataset(n_images, tile_res, seed, images_ds)
    rasters = clips.groupby("tile_id").map_groups(
        RasterizeTile(raster_px), batch_format="pyarrow"
    )
    return rasters.map_batches(vectorize_tiles_batch, batch_format="pyarrow")
