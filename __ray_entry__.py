"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module:
nothing here (nor in the library) calls ray.init()/ray.shutdown().

- ``entry()``      — flagship pipeline: synthetic Lance-shaped image
                     table → footprints → Martinez tile clip →
                     raster→vector tiles (BASELINE.json north_star).
- ``queries()``    — one callable per implemented operator/pipeline
                     from SURVEY.md §2 (spatial join/clip/tiling/kNN,
                     dedup family, text analysis, ANN, image features,
                     TPC-H-style aggregates, windowed events).
- ``oracle_sql()`` — DuckDB-equivalent SQL for every SQL-expressible
                     query (same column names; cents-exact integer
                     arithmetic for cross-engine float determinism).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from rust_geo_booleanop_ray.pipelines.queries import build_oracle_sql, build_queries


def entry() -> Any:
    """Flagship: images → footprints → tile join/clip → vector tiles."""
    from rust_geo_booleanop_ray.pipelines.flagship import tile_pipeline

    return tile_pipeline(n_images=1000, tile_res=4, raster_px=16)


def queries() -> dict[str, Callable[[str], Any]]:
    return build_queries()


def oracle_sql() -> dict[str, str]:
    return build_oracle_sql()
