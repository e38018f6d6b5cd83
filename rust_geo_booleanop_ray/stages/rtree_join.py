"""Broadcast R-tree join: warm per-actor spatial index (north-star:
"actor-pool stages that keep per-cell R-tree indexes warm").

The small side (e.g. tile/zone polygons) is ``ray.put`` ONCE; each
actor builds an STR-packed R-tree over it in ``__init__`` and probes
every batch of the big side against the warm index — no shuffle at
all.  This is the complement of the cell-partitioned PBSM join
(queries.q_pip_join): broadcast-index when one side fits in a worker
heap, shuffle-on-cell when both sides are huge.

Use as:
    zones_ref = ray.put(zones_table)   # (id, minx, miny, maxx, maxy)
    ds.map_batches(RtreeContainsJoin(zones_ref), batch_format="pyarrow",
                   concurrency=N)      # actor pool — index built once
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.rtree import STRtree


class RtreeContainsJoin:
    """Actor-pool stage: point batch × broadcast rect set → (point id,
    zone id) containment pairs."""

    def __init__(
        self,
        zones_ref,
        id_col: str = "zone_id",
        point_id_col: str = "pid",
        x_col: str = "px",
        y_col: str = "py",
    ):
        import ray

        zones: pa.Table = ray.get(zones_ref)
        self._minx = zones["minx"].to_numpy()
        self._miny = zones["miny"].to_numpy()
        self._maxx = zones["maxx"].to_numpy()
        self._maxy = zones["maxy"].to_numpy()
        self._zone_ids = zones[id_col]
        # built ONCE per actor — the warm index
        self._tree = STRtree(self._minx, self._miny, self._maxx, self._maxy)
        self.id_col = id_col
        self.point_id_col = point_id_col
        self.x_col = x_col
        self.y_col = y_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        px = batch[self.x_col].to_numpy()
        py = batch[self.y_col].to_numpy()
        pids = batch[self.point_id_col]
        # one vectorized descent for the whole batch of point queries;
        # bbox-overlap for a degenerate (point) box IS containment
        rows, zones = self._tree.query_many(px, py, px, py)
        take_p = pa.array(rows)
        take_z = pa.array(zones)
        return pa.table(
            {
                self.point_id_col: pids.take(take_p),
                self.id_col: self._zone_ids.take(take_z),
            }
        )
