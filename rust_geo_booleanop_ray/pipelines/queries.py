"""Driver-facing query catalog: Ray pipelines + DuckDB oracle SQL.

Every SQL-expressible query here is value-checked by the driver against
DuckDB at sf=0.01 (order-insensitive hash of sorted-by-name columns).
Cross-engine float determinism rules used throughout:

  - derived spatial coordinates are INTEGER-VALUED doubles (modular
    arithmetic on keys), so rect/clip areas and squared distances are
    exact in f64 in any summation order;
  - money flows as cents: ``CAST(floor(x*100 + 0.5) AS BIGINT)`` — the
    same double op sequence in numpy and DuckDB, then exact int sums;
  - timestamps bucket via integer microsecond floor-division;
  - ANN cosines are rounded to 4 dp (gap between neighbors ≫ fp error).

Geometry queries route through the REAL engine stages (Martinez clip,
cell-partitioned joins, kNN) — the SQL oracle computes the same answer
with closed-form rectangle arithmetic, which is exactly what makes the
engine's exact kernel checkable without a SQL spatial extension.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..sources.arrow_geom import shoelace_area
from ..stages.boolean_batch import BooleanOpBatch
from ..tuning import tune_data_context

tune_data_context()

# ------------------------------------------------------------------ helpers

CLIP_WINDOW = (10.0, 10.0, 70.0, 60.0)
TILE = 8  # arithmetic tile size for the SQL-checkable tile queries
KNN_K = 5
KNN_RES = 4
ANN_K = 10

STOPWORDS_SQL = "('the','a','of','and','to','in','is')"


# vectorized axis-aligned rects → multipolygon column (shared helper)
from ..sources.arrow_geom import rects_to_arrow as _rect_mp_array  # noqa: E402


def _part_rect_batch(batch: pa.Table) -> pa.Table:
    """part rows → deterministic integer-valued rects (+ geometry)."""
    pk = batch["p_partkey"].to_numpy()
    size = batch["p_size"].to_numpy().astype(np.int64)
    cx = (pk % 97).astype(np.float64)
    cy = ((pk * 31) % 89).astype(np.float64)
    hw = (1 + (size % 5)).astype(np.float64)
    hh = (1 + ((size * 3) % 7)).astype(np.float64)
    minx = cx - hw
    miny = cy - hh
    maxx = cx + hw
    maxy = cy + hh
    out = batch.append_column("minx", pa.array(minx))
    out = out.append_column("miny", pa.array(miny))
    out = out.append_column("maxx", pa.array(maxx))
    out = out.append_column("maxy", pa.array(maxy))
    return out.append_column("footprint", _rect_mp_array(minx, miny, maxx, maxy))


PART_RECT_SQL = """
    SELECT p_partkey, p_brand,
           CAST(p_partkey % 97 AS DOUBLE) - CAST(1 + (p_size % 5) AS DOUBLE) AS minx,
           CAST((p_partkey * 31) % 89 AS DOUBLE) - CAST(1 + ((p_size * 3) % 7) AS DOUBLE) AS miny,
           CAST(p_partkey % 97 AS DOUBLE) + CAST(1 + (p_size % 5) AS DOUBLE) AS maxx,
           CAST((p_partkey * 31) % 89 AS DOUBLE) + CAST(1 + ((p_size * 3) % 7) AS DOUBLE) AS maxy
    FROM part
"""


def _customer_point_batch(batch: pa.Table) -> pa.Table:
    ck = batch["c_custkey"].to_numpy()
    out = batch.append_column("px", pa.array((ck % 97).astype(np.float64)))
    return out.append_column("py", pa.array(((ck * 13) % 89).astype(np.float64)))


CUSTOMER_POINT_SQL = """
    SELECT c_custkey,
           CAST(c_custkey % 97 AS DOUBLE) AS px,
           CAST((c_custkey * 13) % 89 AS DOUBLE) AS py
    FROM customer
"""


def _read(sf_dir: str, table: str, columns=None, num_blocks: int = 32):
    """Column-pruned parquet read, split into enough blocks that the
    per-batch stages parallelize even when the table is one file."""
    import ray.data as rd

    return rd.read_parquet(
        f"{sf_dir}/{table}.parquet", columns=columns, override_num_blocks=num_blocks
    )


def _cents(x: np.ndarray) -> np.ndarray:
    return np.floor(x * 100.0 + 0.5).astype(np.int64)


# ------------------------------------------------------------------ spatial


def q_clip_area(sf_dir: str):
    """Martinez clip of part-rects against a fixed window, per-brand
    integer area sums.  The kernel runs inside map_batches; the oracle
    is rectangle-intersection arithmetic."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    wx0, wy0, wx1, wy1 = CLIP_WINDOW
    window = [[[(wx0, wy0), (wx1, wy0), (wx1, wy1), (wx0, wy1), (wx0, wy0)]]]

    def clip_batch(batch: pa.Table) -> pa.Table:
        batch = _part_rect_batch(batch)
        n = batch.num_rows
        from ..sources.arrow_geom import mps_to_arrow

        batch = batch.append_column("clipping", mps_to_arrow([window] * n))
        batch = batch.rename_columns(
            [c if c != "footprint" else "subject" for c in batch.column_names]
        )
        out = BooleanOpBatch("intersection", mode="auto")(batch)
        from ..sources.arrow_geom import arrow_to_mps

        areas = np.array(
            [abs(shoelace_area(mp)) for mp in arrow_to_mps(out["result"])]
        )
        return pa.table(
            {
                "p_brand": batch["p_brand"],
                "clip_area_i": pa.array(areas.astype(np.int64), pa.int64()),
            }
        )

    ds = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"])
    ds = ds.map_batches(clip_batch, batch_format="pyarrow")
    return ds.groupby("p_brand").aggregate(Sum("clip_area_i", alias_name="clip_area"))


Q_CLIP_AREA_SQL = f"""
    WITH d AS ({PART_RECT_SQL})
    SELECT p_brand,
           CAST(SUM(
             greatest(0, least(maxx, 70.0) - greatest(minx, 10.0)) *
             greatest(0, least(maxy, 60.0) - greatest(miny, 10.0))
           ) AS BIGINT) AS clip_area
    FROM d GROUP BY p_brand
"""


def q_tile_assign(sf_dir: str):
    """Tile cover of each part rect (arithmetic tiling, closed-open)."""

    def assign(batch: pa.Table) -> pa.Table:
        batch = _part_rect_batch(batch)
        minx = batch["minx"].to_numpy()
        miny = batch["miny"].to_numpy()
        maxx = batch["maxx"].to_numpy()
        maxy = batch["maxy"].to_numpy()
        tx0 = np.floor(minx / TILE).astype(np.int64)
        ty0 = np.floor(miny / TILE).astype(np.int64)
        tx1 = np.floor(maxx / TILE).astype(np.int64)
        ty1 = np.floor(maxy / TILE).astype(np.int64)
        nx = tx1 - tx0 + 1
        ny = ty1 - ty0 + 1
        counts = nx * ny
        row_idx = np.repeat(np.arange(len(counts)), counts)
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        local = np.arange(int(counts.sum()), dtype=np.int64) - np.repeat(starts, counts)
        tx = np.repeat(tx0, counts) + local % np.repeat(nx, counts)
        ty = np.repeat(ty0, counts) + local // np.repeat(nx, counts)
        return pa.table(
            {
                "p_partkey": batch["p_partkey"].take(pa.array(row_idx)),
                "tx": pa.array(tx, pa.int64()),
                "ty": pa.array(ty, pa.int64()),
            }
        )

    return _read(sf_dir, "part", ["p_partkey", "p_size"]).map_batches(
        assign, batch_format="pyarrow"
    )


Q_TILE_ASSIGN_SQL = f"""
    WITH d AS ({PART_RECT_SQL}),
    b AS (
      SELECT p_partkey,
             CAST(floor(minx / {TILE}.0) AS BIGINT) AS tx0,
             CAST(floor(miny / {TILE}.0) AS BIGINT) AS ty0,
             CAST(floor(maxx / {TILE}.0) AS BIGINT) AS tx1,
             CAST(floor(maxy / {TILE}.0) AS BIGINT) AS ty1
      FROM d
    ),
    ex AS (SELECT p_partkey, unnest(range(tx0, tx1 + 1)) AS tx, ty0, ty1 FROM b)
    SELECT p_partkey, tx, unnest(range(ty0, ty1 + 1)) AS ty FROM ex
"""


def q_pip_join(sf_dir: str):
    """Cell-partitioned spatial join: customer points inside part rects.

    The engine path: both sides keyed by the shared cell space
    (points → home cell, rects → covering cells), groupby(cell), exact
    containment within the group, then distinct (PBSM replica dedup)."""
    import ray.data as rd

    from ..stages.cells import cell_encode, explode_to_cells

    def point_rows(batch: pa.Table) -> pa.Table:
        batch = _customer_point_batch(batch)
        cells = cell_encode(batch["px"].to_numpy(), batch["py"].to_numpy(), KNN_RES)
        return pa.table(
            {
                "cell": pa.array(cells.view(np.int64), pa.int64()),
                "c_custkey": batch["c_custkey"],
                "px": batch["px"],
                "py": batch["py"],
                "p_partkey": pa.array(np.zeros(batch.num_rows, dtype=np.int64)),
                "minx": pa.array(np.zeros(batch.num_rows)),
                "miny": pa.array(np.zeros(batch.num_rows)),
                "maxx": pa.array(np.zeros(batch.num_rows)),
                "maxy": pa.array(np.zeros(batch.num_rows)),
                "side": pa.array(["point"] * batch.num_rows),
            }
        )

    def rect_rows(batch: pa.Table) -> pa.Table:
        batch = _part_rect_batch(batch)
        exploded = explode_to_cells(batch, KNN_RES)
        n = exploded.num_rows
        return pa.table(
            {
                "cell": exploded["cell"],
                "c_custkey": pa.array(np.zeros(n, dtype=np.int64)),
                "px": pa.array(np.zeros(n)),
                "py": pa.array(np.zeros(n)),
                "p_partkey": exploded["p_partkey"],
                "minx": exploded["minx"],
                "miny": exploded["miny"],
                "maxx": exploded["maxx"],
                "maxy": exploded["maxy"],
                "side": pa.array(["rect"] * n),
            }
        )

    points = _read(sf_dir, "customer", ["c_custkey"]).map_batches(
        point_rows, batch_format="pyarrow"
    )
    rects = _read(sf_dir, "part", ["p_partkey", "p_size"]).map_batches(
        rect_rows, batch_format="pyarrow"
    )
    pairs = points.union(rects).groupby("cell").map_groups(
        _contain_join_group, batch_format="pyarrow"
    )
    # No PBSM replica dedup needed: a point lives in exactly ONE home
    # cell, so each (rect, point) pair is emitted exactly once — the
    # oracle cross-check pins this invariant.
    return pairs.select_columns(["p_partkey", "c_custkey"])


# bound on the dense pts×rects candidate matrix inside one cell group:
# one pathological hot cell must never allocate an unbounded bool
# matrix, so the product is evaluated in rect chunks of at most
# MAX_CONTAIN_MATRIX elements (skew splitting changes the partitioning
# upstream; this guard caps the worst case regardless)
MAX_CONTAIN_MATRIX = 1 << 22


def _contain_join_group(group: pa.Table) -> pa.Table:
    """groupby(cell) kernel: points-in-rects within one cell, chunked."""
    is_pt = pc.equal(group["side"], "point")
    pts = group.filter(is_pt)
    rects = group.filter(pc.invert(is_pt))
    if pts.num_rows == 0 or rects.num_rows == 0:
        return pa.schema(
            [pa.field("p_partkey", pa.int64()), pa.field("c_custkey", pa.int64())]
        ).empty_table()
    px = pts["px"].to_numpy()
    py = pts["py"].to_numpy()
    rminx = rects["minx"].to_numpy()
    rminy = rects["miny"].to_numpy()
    rmaxx = rects["maxx"].to_numpy()
    rmaxy = rects["maxy"].to_numpy()
    if len(px) * len(rminx) <= MAX_CONTAIN_MATRIX:
        # fast path: the whole product fits under the guard — one dense
        # evaluation, no chunk loop, no concatenate copies
        inside = (
            (px[None, :] >= rminx[:, None])
            & (px[None, :] <= rmaxx[:, None])
            & (py[None, :] >= rminy[:, None])
            & (py[None, :] <= rmaxy[:, None])
        )
        ri, pi = np.nonzero(inside)
    else:
        chunk = max(1, MAX_CONTAIN_MATRIX // max(1, len(px)))
        out_ri, out_pi = [], []
        for lo in range(0, len(rminx), chunk):
            hi = min(lo + chunk, len(rminx))
            inside = (
                (px[None, :] >= rminx[lo:hi, None])
                & (px[None, :] <= rmaxx[lo:hi, None])
                & (py[None, :] >= rminy[lo:hi, None])
                & (py[None, :] <= rmaxy[lo:hi, None])
            )
            ri, pi = np.nonzero(inside)
            out_ri.append(ri + lo)
            out_pi.append(pi)
        ri = np.concatenate(out_ri)
        pi = np.concatenate(out_pi)
    return pa.table(
        {
            "p_partkey": rects["p_partkey"].take(pa.array(ri)),
            "c_custkey": pts["c_custkey"].take(pa.array(pi)),
        }
    )


Q_PIP_JOIN_SQL = f"""
    WITH r AS ({PART_RECT_SQL}), p AS ({CUSTOMER_POINT_SQL})
    SELECT r.p_partkey, p.c_custkey
    FROM r, p
    WHERE p.px >= r.minx AND p.px <= r.maxx AND p.py >= r.miny AND p.py <= r.maxy
"""


HOT_CELL_THRESHOLD = 64


def q_pip_join_skew(sf_dir: str):
    """q_pip_join with explicit hot-cell skew splitting: a cheap
    counting pre-pass finds cells holding > HOT_CELL_THRESHOLD rect
    replicas; both sides re-explode those cells one resolution finer
    before the shuffle.  Same DuckDB oracle as pip_join — skew handling
    must change the partitioning, never the answer."""
    from ray.data.aggregate import Count

    from ..stages.cells import cell_encode, explode_to_cells, split_hot_cells

    def point_rows(batch: pa.Table) -> pa.Table:
        batch = _customer_point_batch(batch)
        px = batch["px"].to_numpy()
        py = batch["py"].to_numpy()
        cells = cell_encode(px, py, KNN_RES)
        return pa.table(
            {
                "cell": pa.array(cells.view(np.int64), pa.int64()),
                "c_custkey": batch["c_custkey"],
                "px": batch["px"],
                "py": batch["py"],
                "p_partkey": pa.array(np.zeros(batch.num_rows, dtype=np.int64)),
                # real degenerate bbox so hot-cell re-explode lands the
                # point in the correct child cell
                "minx": batch["px"],
                "miny": batch["py"],
                "maxx": batch["px"],
                "maxy": batch["py"],
                "side": pa.array(["point"] * batch.num_rows),
            }
        )

    def rect_rows(batch: pa.Table) -> pa.Table:
        batch = _part_rect_batch(batch)
        exploded = explode_to_cells(batch, KNN_RES)
        n = exploded.num_rows
        return pa.table(
            {
                "cell": exploded["cell"],
                "c_custkey": pa.array(np.zeros(n, dtype=np.int64)),
                "px": pa.array(np.zeros(n)),
                "py": pa.array(np.zeros(n)),
                "p_partkey": exploded["p_partkey"],
                "minx": exploded["minx"],
                "miny": exploded["miny"],
                "maxx": exploded["maxx"],
                "maxy": exploded["maxy"],
                "side": pa.array(["rect"] * n),
            }
        )

    # NOT materialized: the exploded rect side would otherwise sit in
    # the object store as the memory ceiling of the whole query.  The
    # counting pre-pass and the join each stream their own pass over
    # the column-pruned read + explode — recomputing one cheap
    # map_batches beats holding the widest intermediate resident.
    rects = _read(sf_dir, "part", ["p_partkey", "p_size"]).map_batches(
        rect_rows, batch_format="pyarrow"
    )

    # ---- pre-pass: SAMPLED per-batch partial cell counts → tiny driver
    # merge.  A deterministic hash-sample of the rect side estimates
    # per-cell density; the threshold is scaled by the sampling rate.
    # Mis-detecting a hot cell only changes the partitioning (the
    # oracle pins that the ANSWER is invariant); at 100-TB scale this
    # replaces a second full pass over the data with a 25% one.
    SAMPLE_MOD, SAMPLE_KEEP = 4, 1  # keep keys with hash%4 == 1 (25%)

    def cell_counts(batch: pa.Table) -> pa.Table:
        keys = batch["p_partkey"].to_numpy().astype(np.uint64)
        h = (keys * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)
        keep = (h % np.uint64(SAMPLE_MOD)) == SAMPLE_KEEP
        cells, counts = np.unique(
            batch["cell"].to_numpy()[keep], return_counts=True
        )
        return pa.table(
            {"cell": pa.array(cells, pa.int64()), "n": pa.array(counts, pa.int64())}
        )

    # Merge partials with a groupby BEFORE pulling to the driver: the
    # driver receives ≤ one row per distinct cell (≤ 4^res), bounded
    # regardless of block count — never O(n_batches × cells).
    from ray.data.aggregate import Sum

    totals = (
        rects.map_batches(cell_counts, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )
    hot = {
        np.uint64(row["cell"])
        for row in totals
        if row["n"] * SAMPLE_MOD > HOT_CELL_THRESHOLD
    }

    def split(batch: pa.Table) -> pa.Table:
        return split_hot_cells(batch, hot, steps=1)

    hot_arr = np.array(sorted(hot), dtype=np.uint64) if hot else np.array([], np.uint64)

    def split_points(batch: pa.Table) -> pa.Table:
        # A point must stay in exactly ONE cell — re-ENCODE at the finer
        # resolution (split_hot_cells' bbox cover would replicate points
        # sitting exactly on child boundaries → duplicate join pairs).
        cells = batch["cell"].to_numpy().view(np.uint64).copy()
        is_hot = np.isin(cells, hot_arr)
        if is_hot.any():
            fine = cell_encode(
                batch["px"].to_numpy()[is_hot],
                batch["py"].to_numpy()[is_hot],
                KNN_RES + 1,
            )
            cells[is_hot] = fine
        idx = batch.column_names.index("cell")
        return batch.set_column(
            idx, "cell", pa.array(cells.view(np.int64), pa.int64())
        )

    points = _read(sf_dir, "customer", ["c_custkey"]).map_batches(
        point_rows, batch_format="pyarrow"
    ).map_batches(split_points, batch_format="pyarrow")
    rects = rects.map_batches(split, batch_format="pyarrow")

    pairs = points.union(rects).groupby("cell").map_groups(
        _contain_join_group, batch_format="pyarrow"
    )
    # As in q_pip_join: points land in exactly one (possibly finer)
    # cell and hot-cell children tile the hot cell disjointly, so no
    # replica dedup shuffle is needed.
    return pairs.select_columns(["p_partkey", "c_custkey"])


def q_pip_join_rtree(sf_dir: str):
    """Same join as pip_join via the OTHER physical strategy: the rect
    side is broadcast once and each actor keeps a warm STR R-tree over
    it (built in __init__); customer-point batches probe the index —
    zero shuffles.  Right when one side fits in a worker heap."""
    import pyarrow.parquet as pq
    import ray

    from ..stages.rtree_join import RtreeContainsJoin

    rects = _part_rect_batch(
        pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_size"])
    )
    zones = pa.table(
        {
            "zone_id": rects["p_partkey"],
            "minx": rects["minx"],
            "miny": rects["miny"],
            "maxx": rects["maxx"],
            "maxy": rects["maxy"],
        }
    )
    zones_ref = ray.put(zones)

    def points(batch: pa.Table) -> pa.Table:
        b = _customer_point_batch(batch)
        return pa.table(
            {"pid": b["c_custkey"], "px": b["px"], "py": b["py"]}
        )

    ds = _read(sf_dir, "customer", ["c_custkey"]).map_batches(
        points, batch_format="pyarrow"
    )
    out = ds.map_batches(
        RtreeContainsJoin,
        fn_constructor_kwargs={"zones_ref": zones_ref},
        batch_format="pyarrow",
        concurrency=(4, 64),
    )
    return out.map_batches(
        lambda b: pa.table({"p_partkey": b["zone_id"], "c_custkey": b["pid"]}),
        batch_format="pyarrow",
    )


def q_nearest_facility(sf_dir: str):
    """Nearest-facility assignment (Voronoi labeling): every customer
    point is assigned to the closest of 25 facility sites, then
    per-facility demand is aggregated — the logistics/coverage
    counterpart of the spatial joins.  The facility table is tiny and
    BROADCAST (closure constants; never shuffled); each batch computes
    the full n×25 squared-distance matrix vectorized and argmins.
    Integer lattice coordinates make d² and the hash exact; ties
    break to the smallest facility id (argmin's first-hit order)."""
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum

    nat = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey"])
    fid = np.sort(nat["n_nationkey"].to_numpy().astype(np.int64))
    fx = (fid * 17) % 97
    fy = (fid * 41) % 89

    def assign(b: pa.Table) -> pa.Table:
        p = _customer_point_batch(b)
        px = p["px"].to_numpy().astype(np.int64)
        py = p["py"].to_numpy().astype(np.int64)
        d2 = (px[:, None] - fx[None, :]) ** 2 + (py[:, None] - fy[None, :]) ** 2
        best = np.argmin(d2, axis=1)
        t = pa.table(
            {
                "fid": pa.array(fid[best]),
                "d2": pa.array(d2[np.arange(len(px)), best]),
                "n": pa.array(np.ones(len(px), dtype=np.int64)),
            }
        )
        agg = pa.TableGroupBy(t, "fid").aggregate([("n", "sum"), ("d2", "sum")])
        return agg.rename_columns(["fid", "n_pts", "sum_d2"])

    ds = _read(sf_dir, "customer", ["c_custkey"])
    return (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("fid")
        .aggregate(Sum("n_pts", alias_name="n_pts"), Sum("sum_d2", alias_name="sum_d2"))
    )


Q_NEAREST_FACILITY_SQL = f"""
    WITH f AS (
      SELECT n_nationkey AS fid,
             CAST((n_nationkey * 17) % 97 AS BIGINT) AS fx,
             CAST((n_nationkey * 41) % 89 AS BIGINT) AS fy
      FROM nation
    ),
    p AS ({CUSTOMER_POINT_SQL}),
    d AS (
      SELECT p.c_custkey, f.fid,
             CAST((CAST(px AS BIGINT) - fx) * (CAST(px AS BIGINT) - fx)
                + (CAST(py AS BIGINT) - fy) * (CAST(py AS BIGINT) - fy)
               AS BIGINT) AS d2
      FROM p, f
    ),
    a AS (
      SELECT c_custkey, fid, d2,
             ROW_NUMBER() OVER (PARTITION BY c_custkey ORDER BY d2, fid) AS rn
      FROM d
    )
    SELECT fid, CAST(COUNT(*) AS BIGINT) AS n_pts,
           CAST(SUM(d2) AS BIGINT) AS sum_d2
    FROM a WHERE rn = 1 GROUP BY fid
"""


def q_spatial_knn(sf_dir: str):
    """k nearest customers for each query customer (c_custkey ≤ 20),
    via the cell-partitioned kNN operator (3×3 neighborhood at res 4 —
    cell edge 22.5° ≫ k-th neighbor distance at this density)."""
    import pyarrow.compute as pc

    from ..stages.knn import knn_pipeline

    pts = _read(sf_dir, "customer", ["c_custkey"]).map_batches(
        lambda b: pa.table(
            {
                "c_custkey": b["c_custkey"],
                "cx": _customer_point_batch(b)["px"],
                "cy": _customer_point_batch(b)["py"],
                # query predicate pushed INTO the operator: replicas and
                # the per-query merge stay O(|queries|), not O(corpus)
                "is_query": pc.less_equal(b["c_custkey"], 20),
            }
        ),
        batch_format="pyarrow",
    )
    return knn_pipeline(
        pts, k=KNN_K, res=KNN_RES, id_col="c_custkey", query_col="is_query"
    )


Q_SPATIAL_KNN_SQL = f"""
    WITH pts AS ({CUSTOMER_POINT_SQL}),
    q AS (SELECT * FROM pts WHERE c_custkey <= 20),
    d AS (
      SELECT q.c_custkey AS query_id, p.c_custkey AS neighbor_id,
             sqrt((q.px - p.px) * (q.px - p.px) + (q.py - p.py) * (q.py - p.py)) AS dist
      FROM q, pts p WHERE p.c_custkey <> q.c_custkey
    )
    SELECT query_id, neighbor_id, dist, CAST(rnk AS BIGINT) AS rank
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS rnk
      FROM d
    ) WHERE rnk <= {KNN_K}
"""


# ------------------------------------------------------------------ batch/agg


def q_pricing_summary(sf_dir: str):
    """TPC-H Q1-shaped pricing summary, cents-exact (partial aggregation
    inside map_batches, then a tiny groupby merge)."""
    from ray.data.aggregate import Count, Sum

    cutoff = np.datetime64("1998-09-02T00:00:00.000000")

    def partial(batch: pa.Table) -> pa.Table:
        ship = batch["l_shipdate"].to_numpy()
        mask = ship <= cutoff
        keep = pa.array(mask)
        qty = batch["l_quantity"].to_numpy()[mask]
        price = batch["l_extendedprice"].to_numpy()[mask]
        disc = batch["l_discount"].to_numpy()[mask]
        t = pa.table(
            {
                "l_returnflag": batch["l_returnflag"].filter(keep),
                "l_linestatus": batch["l_linestatus"].filter(keep),
                "q": pa.array(_cents(qty)),
                "base": pa.array(_cents(price)),
                "disc": pa.array(_cents(price * (1.0 - disc))),
            }
        )
        agg = pa.TableGroupBy(t, ["l_returnflag", "l_linestatus"]).aggregate(
            [("q", "sum"), ("base", "sum"), ("disc", "sum"), ("q", "count")]
        )
        return agg.rename_columns(
            ["l_returnflag", "l_linestatus", "sum_qty_c", "sum_base_c", "sum_disc_c", "n_rows"]
        )

    ds = _read(
        sf_dir,
        "lineitem",
        ["l_quantity", "l_extendedprice", "l_discount", "l_returnflag", "l_linestatus", "l_shipdate"],
    )
    ds = ds.map_batches(partial, batch_format="pyarrow")
    return ds.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty_c", alias_name="sum_qty_c"),
        Sum("sum_base_c", alias_name="sum_base_c"),
        Sum("sum_disc_c", alias_name="sum_disc_c"),
        Sum("n_rows", alias_name="n_rows"),
    )


Q_PRICING_SQL = """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty_c,
           CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_base_c,
           CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_disc_c,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
"""


def q_top_customers(sf_dir: str):
    """Top-10 customers by order spend: per-block partial sums → ONE
    key-bucketed shuffle with a vectorized merge + per-bucket top-10
    guard → bounded final sort; names joined via broadcast lookup."""
    from ..stages.footprint import _splitmix64

    N_BUCKETS = 64

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "o_custkey": batch["o_custkey"],
                "spend_c": pa.array(_cents(batch["o_totalprice"].to_numpy())),
            }
        )
        agg = pa.TableGroupBy(t, "o_custkey").aggregate([("spend_c", "sum")])
        agg = agg.rename_columns(["o_custkey", "spend_c"])
        h = _splitmix64(agg["o_custkey"].to_numpy().astype(np.uint64))
        return agg.append_column(
            "bucket", pa.array((h % np.uint64(N_BUCKETS)).astype(np.int64))
        )

    def merge_topk_bucket(group: pa.Table) -> pa.Table:
        # vectorized per-bucket spend merge + top-10 guard: customer
        # cardinality is ~rows, so the generic per-key aggregate would
        # pay per-distinct-key overhead; a key's partials all share a
        # bucket, so reduceat totals are global and each bucket only
        # forwards its own top-10 into the final bounded sort
        k = group["o_custkey"].to_numpy()
        s = group["spend_c"].to_numpy()
        order = np.argsort(k, kind="stable")
        k, s = k[order], s[order]
        starts = np.concatenate(([0], np.flatnonzero(k[1:] != k[:-1]) + 1))
        tot = np.add.reduceat(s, starts)
        uk = k[starts]
        top = np.lexsort((uk, -tot))[:10]
        return pa.table(
            {
                "o_custkey": pa.array(uk[top], pa.int64()),
                "spend_c": pa.array(tot[top].astype(np.int64)),
            }
        )

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    spend = (
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(merge_topk_bucket, batch_format="pyarrow")
    )
    top = spend.sort(["spend_c", "o_custkey"], descending=[True, False]).limit(10)

    import pyarrow.parquet as pq

    from ..stages.join import broadcast_join

    # dimension lookup via the standard broadcast-join operator (Arrow
    # table ray.put once + searchsorted attach) — no driver-side dict
    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"])
    top = top.map_batches(
        lambda b: b.rename_columns(["c_custkey", "spend_c"]), batch_format="pyarrow"
    )
    joined = broadcast_join(top, cust, "c_custkey", ["c_name"])
    return joined.select_columns(["c_custkey", "c_name", "spend_c"])


Q_TOP_CUSTOMERS_SQL = """
    SELECT c.c_custkey, c.c_name, s.spend_c
    FROM (
      SELECT o_custkey, CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS spend_c
      FROM orders GROUP BY o_custkey
      ORDER BY spend_c DESC, o_custkey LIMIT 10
    ) s JOIN customer c ON c.c_custkey = s.o_custkey
"""


def q_events_window(sf_dir: str):
    """Tumbling 1-hour window per event_type (streaming-shaped table;
    integer microsecond bucketing)."""
    from ray.data.aggregate import Sum

    def bucket(batch: pa.Table) -> pa.Table:
        # Arrow-native partial aggregation — no pandas round-trip.
        ts = batch["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        t = pa.table(
            {
                "event_type": batch["event_type"],
                "window_id": pa.array(ts // 3_600_000_000, pa.int64()),
                "value_c": pa.array(_cents(batch["value"].to_numpy()), pa.int64()),
            }
        )
        agg = pa.TableGroupBy(t, ["event_type", "window_id"]).aggregate(
            [("value_c", "count"), ("value_c", "sum")]
        )
        return pa.table(
            {
                "event_type": agg["event_type"],
                "window_id": agg["window_id"],
                "n": agg["value_c_count"].cast(pa.int64()),
                "sum_value_c": agg["value_c_sum"].cast(pa.int64()),
            }
        )

    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])
    return ds.map_batches(bucket, batch_format="pyarrow").groupby(
        ["event_type", "window_id"]
    ).aggregate(Sum("n", alias_name="n"), Sum("sum_value_c", alias_name="sum_value_c"))


Q_EVENTS_WINDOW_SQL = """
    SELECT event_type,
           epoch_us(ts) // 3600000000 AS window_id,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_c
    FROM events GROUP BY event_type, window_id
"""


def q_sliding_window(sf_dir: str):
    """SLIDING 2-hour window, 1-hour hop, per event_type: each event
    fans out to exactly len/hop = 2 window replicas in the partial
    (window_id = hop bucket of the window START), then the same
    pre-aggregated two-key groupby as the tumbling case — the overlap
    multiplies the partial rows by len/hop, never the exchanged data
    volume beyond that constant."""
    from ray.data.aggregate import Sum

    HOP = 3_600_000_000
    NSUB = 2  # window length = NSUB * HOP

    def bucket(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        hop_id = ts // HOP
        n = len(ts)
        # event in hop-bucket b belongs to windows starting at b-1 and b
        win = np.concatenate([hop_id - 1, hop_id])
        etype = pa.concat_arrays(
            [batch["event_type"].combine_chunks()] * NSUB
        )
        val = np.tile(_cents(batch["value"].to_numpy()), NSUB)
        t = pa.table(
            {
                "event_type": etype,
                "window_id": pa.array(win, pa.int64()),
                "value_c": pa.array(val, pa.int64()),
            }
        )
        agg = pa.TableGroupBy(t, ["event_type", "window_id"]).aggregate(
            [("value_c", "count"), ("value_c", "sum")]
        )
        return pa.table(
            {
                "event_type": agg["event_type"],
                "window_id": agg["window_id"],
                "n": agg["value_c_count"].cast(pa.int64()),
                "sum_value_c": agg["value_c_sum"].cast(pa.int64()),
            }
        )

    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])
    return (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby(["event_type", "window_id"])
        .aggregate(Sum("n", alias_name="n"), Sum("sum_value_c", alias_name="sum_value_c"))
    )


Q_SLIDING_WINDOW_SQL = """
    WITH f AS (
      SELECT event_type,
             unnest([epoch_us(ts) // 3600000000 - 1,
                     epoch_us(ts) // 3600000000]) AS window_id,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_c
      FROM events
    )
    SELECT event_type, window_id,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(value_c) AS BIGINT) AS sum_value_c
    FROM f GROUP BY event_type, window_id
"""


def q_sessions(sf_dir: str):
    """Gap-based sessionization (30-min inactivity timeout) per user —
    the streaming-window op the reference lacks.  Users are co-located
    by hash BUCKET (64 buckets, not one Python group call per user —
    user cardinality is ~rows at 100 TB, the per-key anti-pattern);
    the per-bucket kernel sessionizes EVERY user in one lexsort pass:
    a session starts at a user change or a >30-min gap, so one cumsum
    labels all sessions and reduceat-style masks pull the bounds."""
    GAP_US = 30 * 60 * 1_000_000
    N_BUCKETS = 64

    def bucket(b: pa.Table) -> pa.Table:
        from ..stages.footprint import _splitmix64

        u = b["user_id"].to_numpy().astype(np.uint64)
        ts = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        return pa.table(
            {
                "user_id": b["user_id"],
                "t": pa.array(ts, pa.int64()),
                "bucket": pa.array(
                    (_splitmix64(u) % np.uint64(N_BUCKETS)).astype(np.int64)
                ),
            }
        )

    def sessionize_bucket(group: pa.Table) -> pa.Table:
        u = group["user_id"].to_numpy()
        ts = group["t"].to_numpy()
        order = np.lexsort((ts, u))
        u, ts = u[order], ts[order]
        new_user = np.concatenate(([True], u[1:] != u[:-1]))
        gap = np.concatenate(([True], (ts[1:] - ts[:-1]) > GAP_US))
        start = new_user | gap
        sidx = np.cumsum(start) - 1
        counts = np.bincount(sidx)
        ends = np.flatnonzero(np.concatenate((start[1:], [True])))
        return pa.table(
            {
                "user_id": pa.array(u[start], pa.int64()),
                "session_start_us": pa.array(ts[start], pa.int64()),
                "session_end_us": pa.array(ts[ends], pa.int64()),
                "n_events": pa.array(counts.astype(np.int64)),
            }
        )

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    return (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(sessionize_bucket, batch_format="pyarrow")
    )


Q_SESSIONS_SQL = """
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS t,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                    OVER (PARTITION BY user_id ORDER BY epoch_us(ts))
                  > 1800000000 OR lag(epoch_us(ts))
                    OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) IS NULL
             THEN 1 ELSE 0 END AS is_start
      FROM events
    ),
    s AS (
      SELECT user_id, t,
             SUM(is_start) OVER (PARTITION BY user_id ORDER BY t
                                 ROWS UNBOUNDED PRECEDING) AS session_no
      FROM e
    )
    SELECT user_id,
           CAST(MIN(t) AS BIGINT) AS session_start_us,
           CAST(MAX(t) AS BIGINT) AS session_end_us,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM s GROUP BY user_id, session_no
"""


def q_transitions(sf_dir: str):
    """Markov transition matrix: counts of consecutive event-type
    pairs within each user's (ts, event_id)-ordered stream — the
    behavioral-model / next-event-prediction statistic.  Users are
    co-located by hash bucket; ONE lexsort per bucket pairs every
    consecutive row (segment boundaries masked out), a block-local
    pa.TableGroupBy pre-counts the ≤ |types|² pairs, and a tiny
    Sum-shuffle finishes."""
    from ray.data.aggregate import Sum

    from ..stages.footprint import _splitmix64

    N_BUCKETS = 64

    def bucket(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy().astype(np.uint64)
        ts = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        return pa.table(
            {
                "user_id": b["user_id"],
                "t": pa.array(ts, pa.int64()),
                "event_id": b["event_id"],
                "event_type": b["event_type"],
                "bucket": pa.array(
                    (_splitmix64(u) % np.uint64(N_BUCKETS)).astype(np.int64)
                ),
            }
        )

    def pairs(group: pa.Table) -> pa.Table:
        u = group["user_id"].to_numpy()
        ts = group["t"].to_numpy()
        eid = group["event_id"].to_numpy()
        types = group["event_type"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        u, types = u[order], types[order]
        same_user = u[1:] == u[:-1]
        t = pa.table(
            {
                "from_type": pa.array(types[:-1][same_user], pa.string()),
                "to_type": pa.array(types[1:][same_user], pa.string()),
            }
        )
        agg = pa.TableGroupBy(t, ["from_type", "to_type"]).aggregate(
            [([], "count_all")]
        )
        return agg.rename_columns(["from_type", "to_type", "n"])

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    return (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs, batch_format="pyarrow")
        .groupby(["from_type", "to_type"])
        .aggregate(Sum("n", alias_name="n"))
    )


Q_TRANSITIONS_SQL = """
    WITH s AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY epoch_us(ts), event_id) AS prev_type
      FROM events
    )
    SELECT prev_type AS from_type, event_type AS to_type,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM s WHERE prev_type IS NOT NULL
    GROUP BY 1, 2
"""


def q_funnel(sf_dir: str):
    """Ordered-sequence funnel: users who did view → click → purchase
    in timestamp order, with the stage reached (1–3) — the conversion
    query every product-analytics pipeline runs.  One user-hash
    BUCKETED exchange co-locates events; the per-bucket kernel walks the sorted
    sequence greedily (earliest next-stage event at a strictly later
    (ts, event_id)) — greedy-earliest is optimal for subsequence
    matching, and event_id uniqueness makes the walk deterministic."""
    STAGES = ("view", "click", "purchase")
    N_BUCKETS = 64
    _INF = np.iinfo(np.int64).max

    def bucket(b: pa.Table) -> pa.Table:
        from ..stages.footprint import _splitmix64

        u = b["user_id"].to_numpy().astype(np.uint64)
        ts = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        return pa.table(
            {
                "user_id": b["user_id"],
                "t": pa.array(ts, pa.int64()),
                "event_id": b["event_id"],
                "event_type": b["event_type"],
                "bucket": pa.array(
                    (_splitmix64(u) % np.uint64(N_BUCKETS)).astype(np.int64)
                ),
            }
        )

    def funnel_bucket(group: pa.Table) -> pa.Table:
        # every user in the bucket walked at once: sort (user, ts, id);
        # r1 = first view index per user segment, r2 = first click
        # index AFTER r1, r3 = first purchase after r2 — each a masked
        # minimum.reduceat, no per-user Python.  Greedy-earliest is
        # optimal for subsequence matching.
        u = group["user_id"].to_numpy()
        ts = group["t"].to_numpy()
        eid = group["event_id"].to_numpy()
        types = group["event_type"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        u, types = u[order], types[order]
        seg = np.concatenate(([True], u[1:] != u[:-1]))
        seg_pos = np.flatnonzero(seg)
        seg_id = np.cumsum(seg) - 1
        idx = np.arange(len(u), dtype=np.int64)
        prev = np.full(len(seg_pos), -1, dtype=np.int64)  # r0: before start
        stage = np.zeros(len(seg_pos), dtype=np.int64)
        for s_i, name in enumerate(STAGES):
            cand = np.where((types == name) & (idx > prev[seg_id]), idx, _INF)
            r = np.minimum.reduceat(cand, seg_pos)
            hit = r < _INF
            stage += hit.astype(np.int64) * (stage == s_i)
            prev = np.where(hit & (stage > s_i), r, _INF)
        return pa.table(
            {
                "user_id": pa.array(u[seg_pos], pa.int64()),
                "stage": pa.array(stage),
            }
        )

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    return (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(funnel_bucket, batch_format="pyarrow")
    )


Q_FUNNEL_SQL = """
    WITH e AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts), event_id) AS rn
      FROM events
    ),
    v AS (SELECT user_id, MIN(rn) AS r1 FROM e
          WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, MIN(rn) AS r2 FROM e JOIN v USING (user_id)
          WHERE event_type = 'click' AND rn > r1 GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(rn) AS r3 FROM e JOIN c USING (user_id)
          WHERE event_type = 'purchase' AND rn > r2 GROUP BY e.user_id)
    SELECT u.user_id,
           CAST(CASE WHEN p.user_id IS NOT NULL THEN 3
                     WHEN c.user_id IS NOT NULL THEN 2
                     WHEN v.user_id IS NOT NULL THEN 1
                     ELSE 0 END AS BIGINT) AS stage
    FROM (SELECT DISTINCT user_id FROM events) u
    LEFT JOIN v ON v.user_id = u.user_id
    LEFT JOIN c ON c.user_id = u.user_id
    LEFT JOIN p ON p.user_id = u.user_id
"""


def q_user_journey(sf_dir: str):
    """Ordered per-key string aggregation (collect_list → join): each
    user's event-type sequence in (ts, event_id) order — the session
    replay / journey feature.  Users are co-located by hash BUCKET
    (not one Python group call per user); the per-bucket kernel
    lexsorts once, slices every user's run into a ListArray straight
    from the segment offsets, and joins with the vectorized Arrow
    binary_join kernel.  event_id is unique, so the order — and the
    hash — cannot depend on block boundaries."""
    N_BUCKETS = 64

    def bucket(b: pa.Table) -> pa.Table:
        from ..stages.footprint import _splitmix64

        u = b["user_id"].to_numpy().astype(np.uint64)
        ts = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        return pa.table(
            {
                "user_id": b["user_id"],
                "t": pa.array(ts, pa.int64()),
                "event_id": b["event_id"],
                "event_type": b["event_type"],
                "bucket": pa.array(
                    (_splitmix64(u) % np.uint64(N_BUCKETS)).astype(np.int64)
                ),
            }
        )

    def journey_bucket(group: pa.Table) -> pa.Table:
        u = group["user_id"].to_numpy()
        ts = group["t"].to_numpy()
        eid = group["event_id"].to_numpy()
        order = np.lexsort((eid, ts, u))
        u = u[order]
        et = group["event_type"].combine_chunks() if isinstance(
            group["event_type"], pa.ChunkedArray
        ) else group["event_type"]
        types_sorted = et.take(pa.array(order))
        seg_pos = np.flatnonzero(np.concatenate(([True], u[1:] != u[:-1])))
        offsets = np.concatenate((seg_pos, [len(u)])).astype(np.int32)
        runs = pa.ListArray.from_arrays(pa.array(offsets), types_sorted)
        return pa.table(
            {
                "user_id": pa.array(u[seg_pos], pa.int64()),
                "journey": pc.binary_join(runs, ","),
                "n_events": pa.array(np.diff(offsets).astype(np.int64)),
            }
        )

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    return (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(journey_bucket, batch_format="pyarrow")
    )


Q_USER_JOURNEY_SQL = """
    SELECT user_id,
           string_agg(event_type, ',' ORDER BY epoch_us(ts), event_id) AS journey,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY user_id
"""


def q_price_histogram(sf_dir: str):
    """Fixed-width histogram of order totals (60 × 10k bins): the
    per-batch combiner bincounts locally so the single exchange moves
    ≤ 60 rows per block — the distributed-histogram shape that feeds
    equi-width binning, outlier fences and data-profiling at 100 TB.
    Empty bins are absent in both engines (GROUP BY semantics)."""
    from ray.data.aggregate import Sum

    BIN_W = 10_000.0

    def partial(batch: pa.Table) -> pa.Table:
        bins = np.floor(
            batch["o_totalprice"].to_numpy() / BIN_W
        ).astype(np.int64)
        uniq, counts = np.unique(bins, return_counts=True)
        return pa.table(
            {
                "bin": pa.array(uniq, pa.int64()),
                "n": pa.array(counts.astype(np.int64)),
            }
        )

    ds = _read(sf_dir, "orders", ["o_totalprice"])
    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("n", alias_name="n"))
    )


Q_PRICE_HISTOGRAM_SQL = """
    SELECT CAST(floor(o_totalprice / 10000.0) AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders GROUP BY bin
"""


def q_distinct_users(sf_dir: str):
    """Exact COUNT(DISTINCT user) per event type — a 5-value grouping
    key over the whole log, i.e. the canonical hot-key aggregate.
    Salting keeps it skew-proof AND exact: users are hash-partitioned
    into 32 disjoint salt buckets, each (type, salt) cell counts its
    distinct users locally, and a trivial Sum folds the salts.  The
    wide exchange is spread over type×salt tasks instead of one task
    per type; contrast `hll_distinct`, the approximate path when even
    a salt cell's distinct set is too large."""
    from ..stages.distinct import salted_distinct_count

    ds = _read(sf_dir, "events", ["event_type", "user_id"])
    return salted_distinct_count(ds, "event_type", "user_id", n_salt=32)


Q_DISTINCT_USERS_SQL = """
    SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct
    FROM events GROUP BY event_type
"""


def q_latest_by_key(sf_dir: str):
    """Log compaction / SCD upsert: the newest event per user — the
    operator that turns an append-only CDC log into current state.
    Per-batch combiner reduces every block to ≤ one row per user
    BEFORE the single groupby(user_id) exchange (vectorized lexsort,
    no per-row Python), so the shuffle moves ≤ one row per (block,
    key) regardless of log length.  Winner = lexicographic max of
    (ts_us, event_id); event_id is unique, so the result cannot
    depend on block boundaries."""
    from ..stages.compact import latest_by_key

    def prep(b: pa.Table) -> pa.Table:
        ts = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        return pa.table(
            {
                "user_id": b["user_id"],
                "ts_us": pa.array(ts, pa.int64()),
                "event_id": b["event_id"],
                "event_type": b["event_type"],
                "value_c": pa.array(_cents(b["value"].to_numpy())),
            }
        )

    ds = _read(
        sf_dir, "events", ["event_id", "ts", "user_id", "event_type", "value"]
    ).map_batches(prep, batch_format="pyarrow")
    return latest_by_key(ds, "user_id", ("ts_us", "event_id"))


Q_LATEST_BY_KEY_SQL = """
    SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_c
    FROM events
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY user_id
        ORDER BY epoch_us(ts) DESC, event_id DESC) = 1
"""


def q_interval_union(sf_dir: str):
    """Interval union / coverage per key: each event opens a 10-minute
    interval; overlaps merge (gaps-and-islands) and the result is the
    island count and total covered microseconds per user.  Users are
    co-located by hash BUCKET (not one Python group call per user —
    user cardinality is ~rows at scale); because every interval has
    the SAME length, island starts are exactly user changes or
    start-gaps > IVL, so ONE lexsort pass handles every user in the
    bucket and reduceat folds the per-user outputs.  Integer-us
    arithmetic keeps it hash-exact."""
    IVL_US = 600_000_000  # 10-minute interval per event
    N_BUCKETS = 64

    def bucket(b: pa.Table) -> pa.Table:
        from ..stages.footprint import _splitmix64

        u = b["user_id"].to_numpy().astype(np.uint64)
        ts = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        return pa.table(
            {
                "user_id": b["user_id"],
                "t": pa.array(ts, pa.int64()),
                "bucket": pa.array(
                    (_splitmix64(u) % np.uint64(N_BUCKETS)).astype(np.int64)
                ),
            }
        )

    def union_bucket(group: pa.Table) -> pa.Table:
        u = group["user_id"].to_numpy()
        s = group["t"].to_numpy()
        order = np.lexsort((s, u))
        u, s = u[order], s[order]
        new_user = np.concatenate(([True], u[1:] != u[:-1]))
        start = new_user | np.concatenate(([True], (s[1:] - s[:-1]) > IVL_US))
        ends = np.flatnonzero(np.concatenate((start[1:], [True])))
        covered = (s[ends] + IVL_US) - s[start]
        iu = u[start]
        ustart = np.concatenate(([True], iu[1:] != iu[:-1]))
        upos = np.flatnonzero(ustart)
        return pa.table(
            {
                "user_id": pa.array(iu[upos], pa.int64()),
                "n_intervals": pa.array(
                    np.add.reduceat(np.ones(len(iu), dtype=np.int64), upos)
                ),
                "covered_us": pa.array(np.add.reduceat(covered, upos)),
            }
        )

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    return (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(union_bucket, batch_format="pyarrow")
    )


Q_INTERVAL_UNION_SQL = """
    WITH iv AS (
      SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + 600000000 AS e
      FROM events
    ),
    ord AS (
      SELECT user_id, s, e,
             MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_max
      FROM iv
    ),
    isl AS (
      SELECT user_id, s, e,
             SUM(CASE WHEN prev_max IS NULL OR s > prev_max THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY s, e
                     ROWS UNBOUNDED PRECEDING) AS island
      FROM ord
    ),
    g AS (
      SELECT user_id, island, MIN(s) AS s0, MAX(e) AS e1
      FROM isl GROUP BY user_id, island
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           CAST(SUM(e1 - s0) AS BIGINT) AS covered_us
    FROM g GROUP BY user_id
"""


def q_mode_event(sf_dir: str):
    """Exact mode (most frequent event_type) per user with a
    deterministic lexicographic tie-break.  Per-batch partial counts
    shrink the exchange to one row per (user, type) per batch — the
    counts monoid — then ONE user-bucketed shuffle merges and
    argmaxes every user in a vectorized lexsort+reduceat pass (never
    one Python group call per user)."""

    N_BUCKETS = 64

    def partial(batch: pa.Table) -> pa.Table:
        from ..stages.footprint import _splitmix64

        agg = pa.TableGroupBy(
            batch.select(["user_id", "event_type"]), ["user_id", "event_type"]
        ).aggregate([([], "count_all")])
        u = agg["user_id"].to_numpy().astype(np.uint64)
        return pa.table(
            {
                "user_id": agg["user_id"],
                "event_type": agg["event_type"],
                "n": agg["count_all"].cast(pa.int64()),
                "bucket": pa.array(
                    (_splitmix64(u) % np.uint64(N_BUCKETS)).astype(np.int64)
                ),
            }
        )

    def pick_bucket(group: pa.Table) -> pa.Table:
        # merge the (user, type) partials and argmax per user in one
        # vectorized pass over the whole bucket (user cardinality is
        # ~rows at scale — never one Python group call per user)
        u = group["user_id"].to_numpy()
        et = group["event_type"].to_numpy(zero_copy_only=False)
        n = group["n"].to_numpy()
        order = np.lexsort((et, u))
        u, et, n = u[order], et[order], n[order]
        newpair = np.concatenate(([True], (u[1:] != u[:-1]) | (et[1:] != et[:-1])))
        starts = np.flatnonzero(newpair)
        tot = np.add.reduceat(n, starts)
        uu, tt = u[starts], et[starts]
        # winner per user by (count desc, type asc): lexsort then first
        o2 = np.lexsort((tt, -tot, uu))
        first = np.concatenate(([True], uu[o2][1:] != uu[o2][:-1]))
        sel = o2[first]
        return pa.table(
            {
                "user_id": pa.array(uu[sel], pa.int64()),
                "mode_event": pa.array(tt[sel], pa.string()),
                "mode_count": pa.array(tot[sel].astype(np.int64)),
            }
        )

    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pick_bucket, batch_format="pyarrow")
    )


Q_MODE_EVENT_SQL = """
    WITH c AS (
      SELECT user_id, event_type, COUNT(*) AS n
      FROM events GROUP BY user_id, event_type
    )
    SELECT user_id, event_type AS mode_event,
           CAST(n AS BIGINT) AS mode_count
    FROM c
    QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
                               ORDER BY n DESC, event_type) = 1
"""


def q_hash_sample(sf_dir: str):
    """Deterministic ~5% hash sample of orders (Knuth multiplicative
    hash on the key — reproducible across engines and runs, unlike
    random_sample), aggregated per order status.  The sampling op a
    training-data pipeline needs for repeatable subset selection."""
    from ray.data.aggregate import Count, Sum

    def sample(batch: pa.Table) -> pa.Table:
        keys = batch["o_orderkey"].to_numpy().astype(np.uint64)
        # reduce mod 2^32 BEFORE multiplying: (2^32-1)*2654435761 < 2^64
        # so the uint64 product is exact, matching the SQL side's
        # arbitrary-precision arithmetic at any key magnitude (an
        # unreduced key > ~6.9e9 would wrap here but not in DuckDB)
        h = ((keys % np.uint64(4294967296)) * np.uint64(2654435761)) % np.uint64(
            4294967296
        )
        keep = (h % np.uint64(100)) < 5
        kept = batch.filter(pa.array(keep))
        return pa.table(
            {
                "o_orderstatus": kept["o_orderstatus"],
                "price_c": pa.array(_cents(kept["o_totalprice"].to_numpy())),
            }
        )

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus", "o_totalprice"])
    return (
        ds.map_batches(sample, batch_format="pyarrow")
        .groupby("o_orderstatus")
        .aggregate(Count(alias_name="n"), Sum("price_c", alias_name="sum_price_c"))
    )


Q_HASH_SAMPLE_SQL = """
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_price_c
    FROM orders
    WHERE (((o_orderkey % 4294967296) * 2654435761) % 4294967296) % 100 < 5
    GROUP BY o_orderstatus
"""


def q_asof_join(sf_dir: str):
    """As-of join (custom operator Ray Data lacks): each 'click' event
    is matched to the latest 'view' event of the same user at or
    before its timestamp.  Non-click/view rows are shed BEFORE the
    exchange; users are co-located by hash BUCKET (not one Python
    group call per user), and the per-bucket kernel resolves every
    click in one lexsort + forward-fill pass: rows sort by (user, ts,
    view-before-click, event_id), a running maximum of view indices
    gives each click its latest prior view, and a segment-start bound
    rejects fills that leaked from the previous user.  Value-exact vs
    DuckDB ASOF JOIN."""
    N_BUCKETS = 64

    def prep(b: pa.Table) -> pa.Table:
        from ..stages.footprint import _splitmix64

        keep = pc.is_in(
            b["event_type"], value_set=pa.array(["click", "view"])
        )
        k = b.filter(keep)
        u = k["user_id"].to_numpy().astype(np.uint64)
        ts = k["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        return pa.table(
            {
                "user_id": k["user_id"],
                "t": pa.array(ts, pa.int64()),
                "event_id": k["event_id"],
                "is_click": pa.array(
                    pc.equal(k["event_type"], "click").to_numpy(
                        zero_copy_only=False
                    )
                ),
                "value": k["value"],
                "bucket": pa.array(
                    (_splitmix64(u) % np.uint64(N_BUCKETS)).astype(np.int64)
                ),
            }
        )

    def asof_bucket(group: pa.Table) -> pa.Table:
        u = group["user_id"].to_numpy()
        ts = group["t"].to_numpy()
        eid = group["event_id"].to_numpy()
        val = group["value"].to_numpy()
        is_click = group["is_click"].to_numpy(zero_copy_only=False)
        # views sort before clicks at the same (user, ts) so a click's
        # forward fill sees same-timestamp views (ASOF <= semantics);
        # among equal-ts views the LAST (max event_id) wins, matching
        # searchsorted side='right' - 1
        order = np.lexsort((eid, is_click.astype(np.int64), ts, u))
        u, ts, eid, val, is_click = (
            u[order],
            ts[order],
            eid[order],
            val[order],
            is_click[order],
        )
        n = len(u)
        seg = np.concatenate(([True], u[1:] != u[:-1]))
        seg_pos = np.flatnonzero(seg)
        seg_id = np.cumsum(seg) - 1
        idx = np.arange(n, dtype=np.int64)
        lastview = np.maximum.accumulate(np.where(~is_click, idx, -1))
        cr = np.flatnonzero(is_click)
        lv = lastview[cr]
        valid = lv >= seg_pos[seg_id[cr]]
        cr, lv = cr[valid], lv[valid]
        return pa.table(
            {
                "click_id": pa.array(eid[cr], pa.int64()),
                "view_id": pa.array(eid[lv], pa.int64()),
                "lag_us": pa.array(ts[cr] - ts[lv], pa.int64()),
                "view_value_c": pa.array(_cents(val[lv])),
            }
        )

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type", "value"])
    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(asof_bucket, batch_format="pyarrow")
    )


Q_ASOF_JOIN_SQL = """
    WITH c AS (SELECT user_id, event_id, epoch_us(ts) AS t FROM events WHERE event_type = 'click'),
         v AS (SELECT user_id, event_id, epoch_us(ts) AS t,
                      CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_c,
                      row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS rn
               FROM events WHERE event_type = 'view')
    SELECT c.event_id AS click_id,
           w.event_id AS view_id,
           CAST(c.t - w.t AS BIGINT) AS lag_us,
           w.value_c AS view_value_c
    FROM c
    JOIN LATERAL (
      SELECT v.event_id, v.t, v.value_c
      FROM v WHERE v.user_id = c.user_id AND v.t <= c.t
      ORDER BY v.t DESC, v.rn DESC LIMIT 1
    ) w ON TRUE
"""


# ------------------------------------------------------------------ documents


_EPOCH_2024_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in µs


def q_range_join_big(sf_dir: str):
    """Big×big range join — the scale path the broadcast variant
    documents: BOTH sides stream as Datasets (no ray.put of the
    interval table).  Temporal PBSM: each event lands in its single
    home hour-bucket, each interval replicates to every bucket it
    spans, ONE groupby(bucket) co-locates them, and the per-bucket
    kernel does a chunked vectorized containment — each pair emits
    exactly once because the event's home bucket is unique.  Same
    oracle as range_join (identical answer, different physical plan —
    use this one when the interval side outgrows a worker heap)."""
    from ray.data.aggregate import Count, Sum

    B_US = 3_600_000_000  # 1-hour buckets

    def interval_rows(batch: pa.Table) -> pa.Table:
        sk = batch["s_suppkey"].to_numpy()
        start = _EPOCH_2024_US + ((sk * 7919) % 720) * 3_600_000_000
        end = start + (1 + sk % 6) * 3_600_000_000
        # replicate each interval to every bucket it spans (vectorized
        # repeat over per-row bucket counts)
        b0 = start // B_US
        nb = end // B_US - b0 + 1
        total = int(nb.sum())
        rep = np.repeat(np.arange(len(sk), dtype=np.int64), nb)
        csum = np.concatenate(([0], np.cumsum(nb)[:-1]))
        local = np.arange(total, dtype=np.int64) - np.repeat(csum, nb)
        return pa.table(
            {
                "bucket": pa.array(b0[rep] + local, pa.int64()),
                "ts_us": pa.array(np.zeros(total, dtype=np.int64)),
                "value_c": pa.array(np.zeros(total, dtype=np.int64)),
                "interval_id": pa.array(sk[rep], pa.int64()),
                "start_us": pa.array(start[rep], pa.int64()),
                "end_us": pa.array(end[rep], pa.int64()),
                "side": pa.array(np.ones(total, dtype=np.int8)),
            }
        )

    def point_rows(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        n = len(ts)
        return pa.table(
            {
                "bucket": pa.array(ts // B_US, pa.int64()),
                "ts_us": pa.array(ts, pa.int64()),
                "value_c": pa.array(_cents(batch["value"].to_numpy())),
                "interval_id": pa.array(np.zeros(n, dtype=np.int64)),
                "start_us": pa.array(np.zeros(n, dtype=np.int64)),
                "end_us": pa.array(np.zeros(n, dtype=np.int64)),
                "side": pa.array(np.zeros(n, dtype=np.int8)),
            }
        )

    def join_bucket(group: pa.Table) -> pa.Table:
        side = group["side"].to_numpy()
        pts = group.filter(pa.array(side == 0))
        ivs = group.filter(pa.array(side == 1))
        empty = pa.schema(
            [pa.field("s_suppkey", pa.int64()), pa.field("value_c", pa.int64())]
        ).empty_table()
        if pts.num_rows == 0 or ivs.num_rows == 0:
            return empty
        ts = pts["ts_us"].to_numpy()
        vc = pts["value_c"].to_numpy()
        iid = ivs["interval_id"].to_numpy()
        s = ivs["start_us"].to_numpy()
        e = ivs["end_us"].to_numpy()
        out = []
        chunk = max(1, MAX_CONTAIN_MATRIX // max(1, len(ts)))
        for lo in range(0, len(iid), chunk):
            hi = min(lo + chunk, len(iid))
            inside = (ts[None, :] >= s[lo:hi, None]) & (
                ts[None, :] <= e[lo:hi, None]
            )
            ii, pp = np.nonzero(inside)
            out.append(
                pa.table(
                    {
                        "s_suppkey": pa.array(iid[lo + ii], pa.int64()),
                        "value_c": pa.array(vc[pp], pa.int64()),
                    }
                )
            )
        return pa.concat_tables(out) if out else empty

    points = _read(sf_dir, "events", ["ts", "value"]).map_batches(
        point_rows, batch_format="pyarrow"
    )
    intervals = _read(sf_dir, "supplier", ["s_suppkey"]).map_batches(
        interval_rows, batch_format="pyarrow"
    )
    pairs = (
        points.union(intervals)
        .groupby("bucket")
        .map_groups(join_bucket, batch_format="pyarrow")
    )
    return _suppkey_count_sum(pairs)


def _suppkey_count_sum(pairs_ds):
    """(s_suppkey, value_c) rows → exact per-supplier (n_events,
    sum_value_c): per-block TableGroupBy partial, then the shared
    key-hash bucketed reduceat merge (suppliers are rows-cardinality
    at scale — never the generic per-key aggregate)."""
    from ..stages.pivot import bucketed_wide_sum

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"s_suppkey": b["s_suppkey"], "value_c": b["value_c"]})
        agg = pa.TableGroupBy(t, "s_suppkey").aggregate(
            [("value_c", "count"), ("value_c", "sum")]
        )
        return pa.table(
            {
                "s_suppkey": agg["s_suppkey"],
                "n_events": agg["value_c_count"].cast(pa.int64()),
                "sum_value_c": agg["value_c_sum"].cast(pa.int64()),
            }
        )

    return bucketed_wide_sum(
        pairs_ds.map_batches(partial, batch_format="pyarrow"),
        "s_suppkey",
        ["n_events", "sum_value_c"],
    )


def q_range_join(sf_dir: str):
    """Range (interval) join — a custom operator Ray Data lacks:
    events are matched into deterministic supplier maintenance windows
    (integer-microsecond bounds derived from s_suppkey), via the
    broadcast interval join with a warm per-actor time-bucket index.
    Per-window event counts + cents-exact value sums."""
    import pyarrow.parquet as pq
    import ray
    from ray.data.aggregate import Count, Sum

    from ..stages.join import BroadcastIntervalJoin

    supp = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey"])
    sk = supp["s_suppkey"].to_numpy()
    start = _EPOCH_2024_US + ((sk * 7919) % 720) * 3_600_000_000
    end = start + (1 + sk % 6) * 3_600_000_000
    intervals = pa.table(
        {
            "interval_id": pa.array(sk, pa.int64()),
            "start_us": pa.array(start, pa.int64()),
            "end_us": pa.array(end, pa.int64()),
        }
    )
    iref = ray.put(intervals)

    def points(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        return pa.table(
            {
                "ts_us": pa.array(ts, pa.int64()),
                "value_c": pa.array(_cents(batch["value"].to_numpy())),
            }
        )

    ds = _read(sf_dir, "events", ["ts", "value"]).map_batches(
        points, batch_format="pyarrow"
    )
    joined = ds.map_batches(
        BroadcastIntervalJoin,
        fn_constructor_kwargs={"intervals": iref},
        batch_format="pyarrow",
        concurrency=(2, 64),
    )
    pairs = joined.map_batches(
        lambda b: pa.table({"s_suppkey": b["interval_id"], "value_c": b["value_c"]}),
        batch_format="pyarrow",
    )
    return _suppkey_count_sum(pairs)


Q_RANGE_JOIN_SQL = f"""
    WITH w AS (
      SELECT s_suppkey,
             {_EPOCH_2024_US} + ((s_suppkey * 7919) % 720) * 3600000000 AS start_us,
             {_EPOCH_2024_US} + ((s_suppkey * 7919) % 720) * 3600000000
               + (1 + s_suppkey % 6) * 3600000000 AS end_us
      FROM supplier
    ),
    e AS (SELECT epoch_us(ts) AS t,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_c
          FROM events)
    SELECT s_suppkey,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(value_c) AS BIGINT) AS sum_value_c
    FROM w JOIN e ON e.t >= w.start_us AND e.t <= w.end_us
    GROUP BY s_suppkey
"""


def q_dedup_exact(sf_dir: str):
    """Exact dedup groups: representative (min doc_id) + group size.
    The merge shuffle is BUCKETED (hash % 64), not grouped by the
    content hash itself — hash cardinality is ~rows, and one Python
    map_groups call per distinct document is the per-key anti-pattern;
    the bucketed kernel does the same merge with lexsort+reduceat."""
    from ..stages.dedup import (
        content_hash_batch,
        exact_dedup_bucket_col,
        exact_dedup_merge_bucket,
        exact_dedup_partial,
    )

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    hashed = ds.map_batches(content_hash_batch, batch_format="pyarrow")
    partials = hashed.map_batches(exact_dedup_partial, batch_format="pyarrow")
    merged = (
        partials.map_batches(exact_dedup_bucket_col, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(exact_dedup_merge_bucket, batch_format="pyarrow")
    )
    return merged.select_columns(["doc_id", "n"])


Q_DEDUP_EXACT_SQL = """
    SELECT MIN(doc_id) AS doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY text
"""


INCR_ID_OFFSET = 1 << 40  # append-batch id space, disjoint from priors


def q_incremental_dedup(sf_dir: str, prior_sigs=None):
    """Incremental dedup against a PERSISTED signature table (the
    append-only 100-TB pipeline shape: a prior run saved 24 B/doc of
    (doc_id, content_hash lo/hi); the new batch dedups against
    old+new WITHOUT re-reading or re-signing the old corpus).  The
    append batch models a re-crawl: every doc_id % 7 == 0 document
    arrives again as id + 2^40, and every doc_id % 13 == 0 document a
    second time as id + 2^41 (so docs ≡ 0 mod 91 also collide
    new-vs-new).  ``prior_sigs`` defaults to signing the full corpus
    inline, standing in for the ``read_parquet`` of the persisted
    table that scripts/dedup_incremental_stress.py exercises for
    real.  Flags = (new doc, keeper): the doc duplicates keeper, the
    smallest prior or smaller-id new partner.  Engine:
    stages/dedup.py::incremental_exact_dedup — one bucketed shuffle
    over signature rows, one lexsort/run kernel per bucket."""
    from ..stages.dedup import content_hash_batch, incremental_exact_dedup

    M = INCR_ID_OFFSET

    def new_split(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy()
        a = b.filter(pa.array(d % 7 == 0))
        c = b.filter(pa.array(d % 13 == 0))
        t = pa.table(
            {
                "doc_id": pa.array(
                    np.concatenate(
                        [a["doc_id"].to_numpy() + M, c["doc_id"].to_numpy() + 2 * M]
                    ),
                    pa.int64(),
                ),
                "text": pa.concat_arrays(
                    [a["text"].combine_chunks(), c["text"].combine_chunks()]
                ),
            }
        )
        return content_hash_batch(t)

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    new_sigs = docs.map_batches(new_split, batch_format="pyarrow")
    if prior_sigs is None:
        prior_sigs = docs.map_batches(content_hash_batch, batch_format="pyarrow")
    return incremental_exact_dedup(new_sigs, prior_sigs)


Q_INCREMENTAL_DEDUP_SQL = f"""
    WITH nw AS (
      SELECT doc_id + {INCR_ID_OFFSET} AS doc_id, text
      FROM documents WHERE doc_id % 7 = 0
      UNION ALL
      SELECT doc_id + {2 * INCR_ID_OFFSET} AS doc_id, text
      FROM documents WHERE doc_id % 13 = 0
    ),
    cand AS (
      SELECT n.doc_id AS doc_id, b.doc_id AS b
      FROM nw n JOIN documents b ON b.text = n.text
      UNION ALL
      SELECT n.doc_id, b.doc_id
      FROM nw n JOIN nw b ON b.text = n.text AND b.doc_id < n.doc_id
    )
    SELECT doc_id, CAST(MIN(b) AS BIGINT) AS keeper FROM cand GROUP BY doc_id
"""


def q_normalized_dedup(sf_dir: str):
    """Canonicalize-then-dedup: trim / lowercase / collapse space runs
    (the text canonicalization every training-data pipeline runs before
    exact dedup, so trivial whitespace/case variants collapse), then
    the bucketed exact-dedup merge — representative (min doc_id),
    group size and normalized length per distinct normalized text.
    Normalization is vectorized Arrow kernels (utf8_trim/lower +
    RE2 replace); the merge shuffle is hash-bucketed, never grouped by
    the ~rows-cardinality text hash itself."""
    from ..stages.dedup import DEDUP_BUCKETS, content_hash_batch

    def norm(batch: pa.Table) -> pa.Table:
        t = pc.replace_substring_regex(
            pc.utf8_lower(pc.utf8_trim(batch["text"], " ")),
            pattern=" +",
            replacement=" ",
        )
        return pa.table({"doc_id": batch["doc_id"], "text": t})

    def partial(batch: pa.Table) -> pa.Table:
        hashed = content_hash_batch(batch)
        n_chars = pc.utf8_length(batch["text"])
        agg = pa.TableGroupBy(
            pa.table(
                {
                    "content_hash": hashed["content_hash"],
                    "content_hash_hi": hashed["content_hash_hi"],
                    "doc_id": batch["doc_id"],
                    "n_chars": n_chars,
                }
            ),
            ["content_hash", "content_hash_hi"],
        ).aggregate([("doc_id", "min"), ("doc_id", "count"), ("n_chars", "min")])
        h = agg["content_hash"].to_numpy().view(np.uint64)
        return pa.table(
            {
                "content_hash": agg["content_hash"],
                "content_hash_hi": agg["content_hash_hi"],
                "doc_id": agg["doc_id_min"].cast(pa.int64()),
                "n": agg["doc_id_count"].cast(pa.int64()),
                "n_chars": agg["n_chars_min"].cast(pa.int64()),
                "bucket": pa.array(
                    (h % np.uint64(DEDUP_BUCKETS)).astype(np.int64)
                ),
            }
        )

    def merge(group: pa.Table) -> pa.Table:
        h = group["content_hash"].to_numpy()
        h2 = group["content_hash_hi"].to_numpy()
        d = group["doc_id"].to_numpy()
        n = group["n"].to_numpy()
        c = group["n_chars"].to_numpy()
        order = np.lexsort((d, h2, h))
        h, h2, d, n, c = h[order], h2[order], d[order], n[order], c[order]
        starts = np.concatenate(
            ([0], np.flatnonzero((h[1:] != h[:-1]) | (h2[1:] != h2[:-1])) + 1)
        )
        return pa.table(
            {
                "doc_id": pa.array(d[starts], pa.int64()),
                "n": pa.array(np.add.reduceat(n, starts).astype(np.int64)),
                "n_chars": pa.array(
                    np.minimum.reduceat(c, starts).astype(np.int64)
                ),
            }
        )

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return (
        ds.map_batches(norm, batch_format="pyarrow")
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(merge, batch_format="pyarrow")
    )


Q_NORMALIZED_DEDUP_SQL = """
    WITH nrm AS (
      SELECT doc_id,
             regexp_replace(lower(trim(text, ' ')), ' +', ' ', 'g') AS t
      FROM documents
    )
    SELECT MIN(doc_id) AS doc_id,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(length(t) AS BIGINT) AS n_chars
    FROM nrm GROUP BY t
"""


BOTTOMK_K = 200


def q_bottomk_sample(sf_dir: str):
    """Fixed-size uniform sample WITHOUT replacement via bottom-k of
    splitmix64 priorities — the mergeable distributed sampling
    primitive (hash_sample gives a fixed RATE; training-data curation
    usually wants a fixed COUNT).  Each block keeps its local bottom-k
    (the partial is trivially mergeable: bottom-k of bottom-ks is the
    global bottom-k), one final merge on a single block.  Deterministic
    across engines and block layouts."""
    from ..stages.footprint import _splitmix64

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch["o_orderkey"].to_numpy().astype(np.uint64)
        pri = _splitmix64(keys)
        k = min(BOTTOMK_K, len(pri))
        idx = np.argsort(pri, kind="stable")[:k]
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"].take(pa.array(idx)),
                "pri": pa.array(pri[idx].view(np.int64), pa.int64()),
            }
        )

    def final(batch: pa.Table) -> pa.Table:
        pri = batch["pri"].to_numpy().view(np.uint64)
        idx = np.argsort(pri, kind="stable")[: min(BOTTOMK_K, len(pri))]
        return batch.take(pa.array(idx))

    ds = _read(sf_dir, "orders", ["o_orderkey"])
    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        # batch_size=None: the global cut is only correct over the
        # whole merged block as ONE batch
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def _build_bottomk_sql() -> str:
    ctes = _splitmix64_ctes("orders", "o_orderkey", "o_orderkey")
    return f"""
    WITH {ctes}
    SELECT o_orderkey,
           CAST(h - CASE WHEN h >= 9223372036854775808::HUGEINT
                    THEN 18446744073709551616::HUGEINT ELSE 0::HUGEINT END
                AS BIGINT) AS pri
    FROM hsh ORDER BY h LIMIT {BOTTOMK_K}
"""


GROUPED_SAMPLE_K = 7


def q_grouped_sample(sf_dir: str):
    """Per-STRATUM fixed-k deterministic sample: the k lowest
    splitmix64 priorities per order priority class — the balanced
    eval-set draw (equal representation per stratum regardless of
    stratum size; `stratified_sample` keeps a fixed RATE instead).
    Mergeable like bottomk_sample: each block keeps its local per-group
    bottom-k (one lexsort, no per-group Python — group count is
    bounded by the 5 priority classes), the final single-block pass
    applies the same kernel globally.  Ties break (priority, key),
    mirrored by the SQL window."""
    from ..stages.footprint import _splitmix64

    def bottomk_per_group(batch: pa.Table) -> pa.Table:
        grp = batch["o_orderpriority"]
        if isinstance(grp, pa.ChunkedArray):
            grp = grp.combine_chunks()
        codes = grp.dictionary_encode().indices.to_numpy(zero_copy_only=False)
        keys = batch["o_orderkey"].to_numpy()
        if "pri" in batch.column_names:
            pri = batch["pri"].to_numpy().view(np.uint64)
        else:
            pri = _splitmix64(keys.astype(np.uint64))
        order = np.lexsort((keys, pri, codes))
        codes_s = codes[order]
        new_grp = np.concatenate(([True], codes_s[1:] != codes_s[:-1]))
        starts = np.flatnonzero(new_grp)
        pos = np.arange(len(order)) - starts[np.cumsum(new_grp) - 1]
        take = order[pos < GROUPED_SAMPLE_K]
        out = pa.table(
            {
                "o_orderpriority": grp.take(pa.array(take)),
                "o_orderkey": batch["o_orderkey"].take(pa.array(take)),
                "pri": pa.array(pri[take].view(np.int64), pa.int64()),
            }
        )
        return out

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    return (
        ds.map_batches(bottomk_per_group, batch_format="pyarrow")
        .repartition(1)
        # global cut must see the whole merged block as ONE batch
        .map_batches(bottomk_per_group, batch_format="pyarrow", batch_size=None)
    )


def _build_grouped_sample_sql() -> str:
    ctes = _splitmix64_ctes("orders", "o_orderkey", "o_orderkey, o_orderpriority")
    return f"""
    WITH {ctes},
    r AS (
      SELECT o_orderpriority, o_orderkey, h,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY h, o_orderkey) AS rnk
      FROM hsh
    )
    SELECT o_orderpriority, o_orderkey,
           CAST(h - CASE WHEN h >= 9223372036854775808::HUGEINT
                    THEN 18446744073709551616::HUGEINT ELSE 0::HUGEINT END
                AS BIGINT) AS pri
    FROM r WHERE rnk <= {GROUPED_SAMPLE_K}
"""


def _dedup_edge_union(sf_dir: str):
    """The deterministic document-similarity edge set shared by
    dedup_components and pagerank: consecutive doc_id chains within
    (lang, n_tokens) groups and within (source, n_chars % 10) groups."""

    def chain(group: pa.Table) -> pa.Table:
        ids = np.sort(group["doc_id"].to_numpy())
        if len(ids) < 2:
            return pa.schema(
                [pa.field("doc_a", pa.int64()), pa.field("doc_b", pa.int64())]
            ).empty_table()
        return pa.table(
            {
                "doc_a": pa.array(ids[:-1], pa.int64()),
                "doc_b": pa.array(ids[1:], pa.int64()),
            }
        )

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang", "source", "n_chars"])

    def key1(batch: pa.Table) -> pa.Table:
        n_tokens = pc.list_value_length(pc.split_pattern(batch["text"], " "))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang": batch["lang"],
                "n_tokens": pc.cast(n_tokens, pa.int64()),
            }
        )

    def key2(batch: pa.Table) -> pa.Table:
        mod = pc.cast(batch["n_chars"], pa.int64()).to_numpy() % 10
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "source": batch["source"],
                "chars_mod": pa.array(mod, pa.int64()),
            }
        )

    e1 = (
        ds.map_batches(key1, batch_format="pyarrow")
        .groupby(["lang", "n_tokens"])
        .map_groups(chain, batch_format="pyarrow")
    )
    e2 = (
        ds.map_batches(key2, batch_format="pyarrow")
        .groupby(["source", "chars_mod"])
        .map_groups(chain, batch_format="pyarrow")
    )
    return e1.union(e2)


def q_dedup_components(sf_dir: str):
    """Connected components over a deterministic document-similarity
    graph: docs are chained (consecutive doc_id) within (lang,
    n_tokens) groups and within (source, n_chars % 10) groups — two
    cross-cutting relations whose union forms multi-hop components.
    Engine: distributed min-label propagation + pointer jumping
    (stages/dedup.connected_components — labels never touch the
    driver); oracle: DuckDB recursive CTE."""
    from ..stages.dedup import connected_components

    comps = connected_components(_dedup_edge_union(sf_dir))
    return comps.map_batches(
        lambda b: pa.table({"doc_id": b["node"], "component": b["component"]}),
        batch_format="pyarrow",
    )


Q_DEDUP_COMPONENTS_SQL = """
    WITH RECURSIVE s AS (
      SELECT doc_id, lang, source, n_chars,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ),
    e1 AS (
      SELECT lag(doc_id) OVER (PARTITION BY lang, n_tokens ORDER BY doc_id) AS a,
             doc_id AS b
      FROM s
    ),
    e2 AS (
      SELECT lag(doc_id) OVER (PARTITION BY source, n_chars % 10 ORDER BY doc_id) AS a,
             doc_id AS b
      FROM s
    ),
    edges AS (
      SELECT a, b FROM e1 WHERE a IS NOT NULL
      UNION
      SELECT a, b FROM e2 WHERE a IS NOT NULL
    ),
    sym AS (SELECT a AS node, b AS peer FROM edges UNION SELECT b, a FROM edges),
    reach(node, label) AS (
      SELECT node, node FROM (SELECT DISTINCT node FROM sym)
      UNION
      SELECT sym.node, reach.label FROM sym JOIN reach ON reach.node = sym.peer
    )
    SELECT node AS doc_id, CAST(MIN(label) AS BIGINT) AS component
    FROM reach GROUP BY node
"""


def q_dedup_apply(sf_dir: str):
    """Apply the dedup decision end-to-end: the SURVIVING corpus after
    collapsing each similarity component to its canonical (min doc_id)
    member — components (distributed label propagation) → per-block
    dropped-key extraction → one anti-join shuffle against the corpus.
    This is the step that actually shrinks the training set; the
    component labels never touch the driver at any point."""
    from ..stages.join import shuffle_hash_join

    comps = q_dedup_components(sf_dir)

    def dropped_keys(b: pa.Table) -> pa.Table:
        d = b.filter(pc.not_equal(b["doc_id"], b["component"]))
        return pa.table({"doc_id": d["doc_id"]})

    dropped = comps.map_batches(dropped_keys, batch_format="pyarrow")
    docs = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    return shuffle_hash_join(
        docs,
        dropped,
        "doc_id",
        ["lang", "n_chars"],
        [],
        how="anti",
        left_schema=pa.schema(
            [
                pa.field("doc_id", pa.int64()),
                pa.field("lang", pa.string()),
                pa.field("n_chars", pa.int64()),
            ]
        ),
        right_schema=pa.schema([pa.field("doc_id", pa.int64())]),
    )


Q_DEDUP_APPLY_SQL = f"""
    SELECT d.doc_id, d.lang, d.n_chars FROM documents d
    WHERE NOT EXISTS (
      SELECT 1 FROM ({Q_DEDUP_COMPONENTS_SQL}) c
      WHERE c.doc_id = d.doc_id AND c.component <> c.doc_id)
"""


def q_safe_split(sf_dir: str):
    """Leakage-safe train/test split: each document is assigned by the
    deterministic hash of its similarity COMPONENT (falling back to
    its own id when it has no near-dups), so near-duplicate documents
    can never straddle the split — the eval-contamination guard every
    LLM data pipeline needs.  Components come from the distributed
    label propagation; one left-join shuffle attaches them; the split
    itself is a pure per-row hash (no extra exchange)."""
    from ..stages.join import shuffle_hash_join

    comps = q_dedup_components(sf_dir)
    docs = _read(sf_dir, "documents", ["doc_id", "lang"])
    joined = shuffle_hash_join(
        docs,
        comps,
        "doc_id",
        ["lang"],
        ["component"],
        how="left",
        left_schema=pa.schema(
            [pa.field("doc_id", pa.int64()), pa.field("lang", pa.string())]
        ),
        right_schema=pa.schema(
            [pa.field("doc_id", pa.int64()), pa.field("component", pa.int64())]
        ),
    )

    def assign(b: pa.Table) -> pa.Table:
        gkey = pc.coalesce(b["component"], b["doc_id"]).to_numpy().astype(np.uint64)
        h = ((gkey % np.uint64(4294967296)) * np.uint64(2654435761)) % np.uint64(
            4294967296
        )
        train = (h % np.uint64(10)) < 8
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "lang": b["lang"],
                "split": pa.array(np.where(train, "train", "test"), pa.string()),
            }
        )

    return joined.map_batches(assign, batch_format="pyarrow")


Q_SAFE_SPLIT_SQL = f"""
    WITH comp AS ({Q_DEDUP_COMPONENTS_SQL}),
    j AS (
      SELECT d.doc_id, d.lang, COALESCE(c.component, d.doc_id) AS gkey
      FROM documents d LEFT JOIN comp c USING (doc_id)
    )
    SELECT doc_id, lang,
           CASE WHEN (((gkey % 4294967296) * 2654435761) % 4294967296) % 10 < 8
                THEN 'train' ELSE 'test' END AS split
    FROM j
"""


def q_text_stats(sf_dir: str):
    """Per-language corpus stats (token / char / stopword sums)."""
    from ray.data.aggregate import Sum

    from ..stages.text import text_stats_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    stats = ds.map_batches(text_stats_batch, batch_format="pyarrow")
    return stats.groupby("lang").aggregate(
        Sum("n_chars", alias_name="sum_chars"),
        Sum("n_tokens", alias_name="sum_tokens"),
        Sum("n_stopwords", alias_name="sum_stopwords"),
    )


Q_TEXT_STATS_SQL = f"""
    SELECT lang,
           CAST(SUM(length(text)) AS BIGINT) AS sum_chars,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS sum_tokens,
           CAST(SUM(len(list_filter(string_split(text, ' '), x -> x IN {STOPWORDS_SQL}))) AS BIGINT) AS sum_stopwords
    FROM documents GROUP BY lang
"""


def q_regex_tokens(sf_dir: str):
    """BPE-ish regex token counting per language: letter/digit/punct
    runs via one vectorized RE2 pass per batch (both Arrow and DuckDB
    use RE2 with identical semantics for this lookahead-free
    pattern)."""
    from ray.data.aggregate import Max, Sum

    from ..stages.text import regex_token_count_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    counts = ds.map_batches(regex_token_count_batch, batch_format="pyarrow")
    return counts.groupby("lang").aggregate(
        Sum("bpe_tokens", alias_name="sum_bpe_tokens"),
        Max("bpe_tokens", alias_name="max_bpe_tokens"),
    )


Q_REGEX_TOKENS_SQL = r"""
    SELECT lang,
           CAST(SUM(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+'))) AS BIGINT) AS sum_bpe_tokens,
           CAST(MAX(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+'))) AS BIGINT) AS max_bpe_tokens
    FROM documents GROUP BY lang
"""


def q_ann_topk(sf_dir: str):
    """Brute-force cosine top-10 for query vectors (vec_id < 5)."""
    from ..stages.ann import brute_force_topk

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = brute_force_topk(ds, _ann_queries(sf_dir), ANN_K)

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "query_id": batch["query_id"],
                "vec_id": batch["vec_id"],
                "cosine_r": pa.array(np.round(batch["cosine"].to_numpy(), 4)),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


Q_ANN_TOPK_SQL = f"""
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5)
    SELECT query_id, vec_id, cosine_r FROM (
      SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
             round(CAST(list_cosine_similarity(e.embedding, q.embedding) AS DOUBLE), 4) AS cosine_r,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(e.embedding, q.embedding) DESC, e.vec_id
             ) AS rnk
      FROM embeddings e, q
    ) WHERE rnk <= {ANN_K}
"""


def q_table_diff(sf_dir: str):
    """Dataset reconciliation / symmetric difference: customer keys
    with URGENT orders vs keys with high-value orders, reporting
    which side each exclusive key is missing from — the integrity
    check you run between two snapshots or two pipelines' outputs.
    Per-batch combiner emits each block's DISTINCT keys with a side
    bitmask (1=a, 2=b); one key-BUCKETED shuffle ORs the masks with a
    vectorized reduceat (key cardinality is ~rows — never one Python
    group call per key) and keeps the single-sided keys.  The exchange
    moves ≤ one row per (block, side, key) — never the raw rows."""
    from ..stages.footprint import _splitmix64

    N_BUCKETS = 64

    def tag(col_filter, mask):
        def fn(b: pa.Table) -> pa.Table:
            keys = np.unique(col_filter(b).to_numpy(zero_copy_only=False))
            h = _splitmix64(keys.astype(np.uint64)) % np.uint64(N_BUCKETS)
            return pa.table(
                {
                    "c_custkey": pa.array(keys, pa.int64()),
                    "mask": pa.array(np.full(len(keys), mask, dtype=np.int64)),
                    "bucket": pa.array(h.astype(np.int64)),
                }
            )

        return fn

    a = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"]).map_batches(
        tag(
            lambda b: b.filter(pc.equal(b["o_orderpriority"], "1-URGENT"))["o_custkey"],
            1,
        ),
        batch_format="pyarrow",
    )
    b = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        tag(lambda b: b.filter(pc.greater(b["o_totalprice"], 300000.0))["o_custkey"], 2),
        batch_format="pyarrow",
    )

    def resolve_bucket(group: pa.Table) -> pa.Table:
        k = group["c_custkey"].to_numpy()
        m = group["mask"].to_numpy()
        order = np.argsort(k, kind="stable")
        k, m = k[order], m[order]
        starts = np.concatenate(([0], np.flatnonzero(k[1:] != k[:-1]) + 1))
        ored = np.bitwise_or.reduceat(m, starts)
        uk = k[starts]
        one_sided = ored != 3
        uk, ored = uk[one_sided], ored[one_sided]
        return pa.table(
            {
                "c_custkey": pa.array(uk, pa.int64()),
                "side": pa.array(
                    np.where(ored == 1, "a_only", "b_only"), pa.string()
                ),
            }
        )

    return (
        a.union(b)
        .groupby("bucket")
        .map_groups(resolve_bucket, batch_format="pyarrow")
    )


Q_TABLE_DIFF_SQL = """
    WITH a AS (SELECT DISTINCT o_custkey AS k FROM orders
               WHERE o_orderpriority = '1-URGENT'),
         b AS (SELECT DISTINCT o_custkey AS k FROM orders
               WHERE o_totalprice > 300000.0)
    SELECT k AS c_custkey, 'a_only' AS side FROM a
    WHERE k NOT IN (SELECT k FROM b)
    UNION ALL
    SELECT k AS c_custkey, 'b_only' AS side FROM b
    WHERE k NOT IN (SELECT k FROM a)
"""


def q_ann_filtered(sf_dir: str):
    """Metadata-filtered vector search (pre-filter semantics): exact
    cosine top-10 restricted to corpus vectors with label = 3 — the
    "search within a tenant / category" query every vector store
    serves.  The predicate is applied INSIDE the scan stage, before
    any distance work or exchange, so the matmul and the per-batch
    partial top-k only ever see qualifying rows; recall is exact by
    construction (no post-filter k-starvation)."""
    from ..stages.ann import brute_force_topk

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])

    def keep(b: pa.Table) -> pa.Table:
        return b.filter(pc.equal(b["label"], 3)).select(["vec_id", "embedding"])

    out = brute_force_topk(
        ds.map_batches(keep, batch_format="pyarrow"), _ann_queries(sf_dir), ANN_K
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "query_id": batch["query_id"],
                "vec_id": batch["vec_id"],
                "cosine_r": pa.array(np.round(batch["cosine"].to_numpy(), 4)),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


Q_ANN_FILTERED_SQL = f"""
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5)
    SELECT query_id, vec_id, cosine_r FROM (
      SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
             round(CAST(list_cosine_similarity(e.embedding, q.embedding) AS DOUBLE), 4) AS cosine_r,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(e.embedding, q.embedding) DESC, e.vec_id
             ) AS rnk
      FROM (SELECT * FROM embeddings WHERE label = 3) e, q
    ) WHERE rnk <= {ANN_K}
"""


# ---------------------------------------------------------- non-SQL (rows-only)


def _ann_queries(sf_dir: str):
    import pyarrow.parquet as pq

    # predicate pushdown: only row groups containing the query ids are
    # read — never the whole embedding column (wrong at 100 TB)
    qt = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", 5)],
    )
    q_ids = qt["vec_id"].to_numpy()
    emb = qt["embedding"].combine_chunks()
    qmat = (
        emb.values.to_numpy(zero_copy_only=False)
        .reshape(len(qt), -1)
        .astype(np.float64)
    )
    return q_ids, qmat


def q_ann_ivf(sf_dir: str):
    """IVF ANN (the scale path): vectors bucketed into inverted lists
    inside map_batches, queries probe their nprobe nearest lists.  The
    catalog query runs with FIXED deterministic centroids (Rademacher
    ±1 rows — equal norms, so assignment is argmax of signed
    coordinate sums), which makes assignment + probing + ranking
    value-exact vs the SQL mirror.  k-means training stays a separate
    tested function (train_ivf_centroids + recall test)."""
    from ..stages.ann import ivf_fixed_centroids, ivf_topk

    centroids = ivf_fixed_centroids(IVF_CENTROIDS, 64, seed=IVF_SEED)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = ivf_topk(ds, _ann_queries(sf_dir), ANN_K, centroids, nprobe=IVF_NPROBE)
    return out.select_columns(["query_id", "vec_id", "rank"])


IVF_CENTROIDS = 16
IVF_NPROBE = 4
IVF_SEED = 29


def _build_ann_ivf_sql() -> str:
    """SQL mirror of the fixed-centroid IVF pipeline: the ±1 centroid
    rows inline as signed coordinate sums; assignment is first-argmax
    (list_position of list_max — numpy argmax semantics); each query
    probes its nprobe top centroids; exact cosine ranks within the
    probed lists."""
    from ..stages.ann import ivf_fixed_centroids

    cent = ivf_fixed_centroids(IVF_CENTROIDS, 64, seed=IVF_SEED)
    dot_exprs = ",\n        ".join(
        "("
        + " ".join(
            ("+" if cent[c, d] > 0 else "-") + f" embedding[{d + 1}]"
            for d in range(cent.shape[1])
        ).lstrip("+ ")
        + ")"
        for c in range(cent.shape[0])
    )
    return f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings
    ),
    d AS (
      SELECT vec_id, embedding, [
        {dot_exprs}
      ] AS dots FROM e
    ),
    asg AS (
      SELECT vec_id, embedding,
             CAST(list_position(dots, list_max(dots)) - 1 AS BIGINT) AS centroid
      FROM d
    ),
    q AS (SELECT vec_id AS qid, embedding AS qe, dots AS qdots FROM d WHERE vec_id < 5),
    qc AS (
      SELECT qid, qe, c - 1 AS centroid,
             row_number() OVER (PARTITION BY qid ORDER BY qdots[c] DESC, c) AS crnk
      FROM q, UNNEST(generate_series(1, {IVF_CENTROIDS})) AS t(c)
    ),
    probe AS (SELECT qid, qe, centroid FROM qc WHERE crnk <= {IVF_NPROBE}),
    cand AS (
      SELECT p.qid AS query_id, a.vec_id,
             list_cosine_similarity(a.embedding, p.qe) AS cos
      FROM asg a JOIN probe p ON a.centroid = p.centroid
    )
    SELECT query_id, vec_id, CAST(rnk AS BIGINT) AS rank FROM (
      SELECT query_id, vec_id,
             row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rnk
      FROM cand
    ) WHERE rnk <= {ANN_K}
"""


Q_ANN_IVF_SQL = _build_ann_ivf_sql()


def q_ann_lsh(sf_dir: str):
    """Sign-LSH bucketed ANN (alternative scale path).  The planes are
    deterministic Rademacher ±1 matrices, so the oracle reproduces the
    exact bucketing (sign expressions inlined as literals) and the
    same candidate set → value-exact ranks."""
    from ..stages.ann import lsh_bucketed_topk

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = lsh_bucketed_topk(ds, _ann_queries(sf_dir), ANN_K, n_bits=4)
    return out.select_columns(["query_id", "vec_id", "rank"])


def _sign_bucket_expr(n_bits: int, seed: int, dim: int = 64) -> str:
    """SQL expression computing the sign-LSH bucket of ``embedding``
    with the SAME deterministic Rademacher planes as the engine.
    Signs are inlined (the sign of Σ ±e_d equals the engine's
    unit-vector projection sign — normalization is a positive
    scale)."""
    from ..stages.dedup import rademacher_planes

    planes = rademacher_planes(dim, n_bits, seed)
    bits = []
    for b in range(n_bits):
        terms = " + ".join(
            ("" if planes[d, b] > 0 else "-") + f"embedding[{d + 1}]"
            for d in range(dim)
        )
        bits.append(f"(CASE WHEN ({terms}) > 0 THEN {1 << b} ELSE 0 END)")
    return " + ".join(bits)


def _build_ann_lsh_sql() -> str:
    bucket = _sign_bucket_expr(n_bits=4, seed=13)
    return f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings
    ),
    eb AS (SELECT vec_id, embedding, {bucket} AS bucket FROM e),
    q AS (SELECT vec_id AS qid, embedding AS qe, bucket AS qb FROM eb WHERE vec_id < 5),
    cand AS (
      SELECT q.qid AS query_id, eb.vec_id,
             list_cosine_similarity(eb.embedding, q.qe) AS cos
      FROM eb JOIN q ON eb.bucket = q.qb
    )
    SELECT query_id, vec_id, CAST(rnk AS BIGINT) AS rank FROM (
      SELECT query_id, vec_id,
             row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rnk
      FROM cand
    ) WHERE rnk <= {ANN_K}
"""


Q_ANN_LSH_SQL = _build_ann_lsh_sql()


def _build_minhash_sql(threshold: float = 0.5) -> str:
    """Full SQL mirror of the MinHash+LSH pipeline: code-point shingle
    hashes (5-wide polynomial windows), the 64 splitmix64-derived
    permutations inlined as literals with the engine's exact
    wrap-mod-2^64-then-mod-p arithmetic, 8×8 banded blocking via
    list_reduce band hashes, and the k/64 signature-equality estimator
    (dyadic — hash-exact across engines)."""
    from ..stages.dedup import minhash_coeffs

    a, b = minhash_coeffs(64, 7)
    H = "18446744073709551616::HUGEINT"
    P = "2305843009213693951::HUGEINT"
    BF = 1099511628211
    Bp = [pow(BF, k, 1 << 64) for k in range(5)]
    win = " + ".join(
        f"unicode(t[i+{j}:i+{j}])::HUGEINT * {Bp[4 - j]}::HUGEINT" for j in range(5)
    )
    sig_exprs = ",\n        ".join(
        f"list_min(list_transform(sh, h -> ((({int(a[k])}::HUGEINT * h) % {H} "
        f"+ {int(b[k])}::HUGEINT) % {H}) % {P}))"
        for k in range(64)
    )
    band_exprs = ",\n        ".join(
        f"list_reduce(list_prepend(0::HUGEINT, sig[{8 * j + 1}:{8 * j + 8}]), "
        f"(acc, x) -> (acc * {BF}::HUGEINT + x) % {H})"
        for j in range(8)
    )
    return f"""
    WITH d AS (SELECT doc_id, text AS t FROM documents),
    s AS (
      SELECT doc_id,
        CASE WHEN length(t) <= 5
          THEN [list_reduce(list_prepend(0::HUGEINT,
                 [unicode(t[i:i])::HUGEINT FOR i IN range(1, length(t)+1)]),
                 (acc, x) -> (acc * {BF}::HUGEINT + x) % {H})]
          ELSE list_distinct([ (({win}) % {H}) FOR i IN range(1, length(t) - 3) ])
        END AS sh
      FROM d
    ),
    sg AS (
      SELECT doc_id, [
        {sig_exprs}
      ] AS sig FROM s
    ),
    bands AS (
      SELECT doc_id, sig, unnest(range(8)) AS band,
             unnest([
        {band_exprs}
             ]) AS band_hash
      FROM sg
    ),
    pairs AS (
      SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
             len([k FOR k IN range(1, 65) IF x.sig[k] = y.sig[k]]) / 64.0 AS est
      FROM bands x JOIN bands y
        ON x.band = y.band AND x.band_hash = y.band_hash AND x.doc_id < y.doc_id
    )
    SELECT doc_a, doc_b, MAX(est) AS est_jaccard
    FROM pairs WHERE est >= {threshold} GROUP BY doc_a, doc_b
"""


Q_MINHASH_SQL = _build_minhash_sql()


def q_minhash_near_dup(sf_dir: str):
    """MinHash+LSH near-dup candidate pairs over documents (est_jaccard
    ≥ 0.5); value-exact vs the full SQL pipeline mirror.  The candidate
    stage is the BUCKETED kernel (hash(band key) % 64 shuffle + one
    lexsort/run-boundary pass per bucket) — never one Python group call
    per distinct band bucket (cardinality ~8×docs at scale)."""
    from ..stages.dedup import MinHasher, lsh_band_explode, minhash_candidate_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    sigs = ds.map_batches(MinHasher(), batch_format="pyarrow")
    exploded = sigs.map_batches(lsh_band_explode, batch_format="pyarrow")
    pairs = minhash_candidate_pairs(exploded, threshold=0.5)
    from ..stages.dedup import pair_reduce

    return pair_reduce(pairs, "doc_a", "doc_b", "est_jaccard", how="max")


def q_minhash_lean(sf_dir: str):
    """The SCALE variant of minhash_near_dup: the band exchange carries
    (band_id, band_hash, doc_id) only — 24 B/row instead of the 536 B
    sig-bearing row (an 8× signature duplication that dominates the
    shuffle at 10⁹ docs; measured 8.8 GB → ~3.5 GB at 2M) — and ONE
    bucketed join ships each signature once to its candidate pairs for
    the deferred verify.  Same answer as the compact variant, checked
    against the SAME full-pipeline SQL mirror."""
    from ..stages.dedup import MinHasher, minhash_candidate_pairs_lean

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    sigs = ds.map_batches(MinHasher(), batch_format="pyarrow")
    return minhash_candidate_pairs_lean(sigs, threshold=0.5)


def _build_simhash_pairs_sql() -> str:
    """SQL mirror of the full simhash pipeline: per-token polynomial
    hash over code points (list_reduce) + murmur finalizer (split
    32×64 multiply keeps the HUGEINT products under 2^127), per-doc ±1
    bit vote, 4×16-bit band blocking, bit_count(xor) hamming ≤ 3.
    Assumes no band bucket exceeds the engine's quadratic-guard cap
    (200) — true for the synthetic corpus; the cap exists for
    adversarial skew at scale."""
    H = "18446744073709551616::HUGEINT"
    B = "1099511628211::HUGEINT"
    C = "18397679294719823053::HUGEINT"
    S33 = "8589934592::HUGEINT"
    S32 = "4294967296::HUGEINT"
    pw = ", ".join(f"{1 << k}::HUGEINT" for k in range(64))
    bandpw = ", ".join(f"{1 << (16 * k)}::HUGEINT" for k in range(4))
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    h0 AS (
      SELECT doc_id,
        list_reduce(
          list_prepend(0::HUGEINT, [unicode(tok[i:i])::HUGEINT FOR i IN range(1, length(tok)+1)]),
          (a, x) -> (a * {B} + x) % {H}) AS h
      FROM toks
    ),
    m1 AS (SELECT doc_id, xor(h, h // {S33}) AS h FROM h0),
    m2 AS (SELECT doc_id,
             ((((h // {S32}) * {C}) % {H}) * {S32} + (h % {S32}) * {C}) % {H} AS h
           FROM m1),
    hf AS (SELECT doc_id, xor(h, h // {S33}) AS h FROM m2),
    bp AS (SELECT unnest(range(64)) AS bit, unnest([{pw}]) AS p),
    bits AS (
      SELECT doc_id, bit,
             SUM(CASE WHEN (h // p) % 2 = 1 THEN 1 ELSE -1 END) AS acc
      FROM hf, bp GROUP BY doc_id, bit
    ),
    sim AS (
      SELECT bits.doc_id,
             SUM(CASE WHEN acc > 0 THEN p ELSE 0::HUGEINT END) AS simu
      FROM bits JOIN bp USING (bit) GROUP BY bits.doc_id
    ),
    s64 AS (
      SELECT doc_id, simu,
             CAST(simu - CASE WHEN simu >= 9223372036854775808::HUGEINT
                         THEN {H} ELSE 0::HUGEINT END AS BIGINT) AS sim64
      FROM sim
    ),
    bands AS (
      SELECT doc_id, sim64, b.range AS band,
             (simu // unnest_p.bpw) % 65536::HUGEINT AS band_val
      FROM s64, range(4) b,
           (SELECT unnest(range(4)) AS band2, unnest([{bandpw}]) AS bpw) unnest_p
      WHERE b.range = unnest_p.band2
    ),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             bit_count(xor(a.sim64, b.sim64)) AS ham
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_val = b.band_val AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, CAST(MIN(ham) AS BIGINT) AS hamming
    FROM pairs WHERE ham <= 3 GROUP BY doc_a, doc_b
"""


Q_SIMHASH_PAIRS_SQL = _build_simhash_pairs_sql()


def q_simhash_pairs(sf_dir: str):
    """SimHash hamming≤3 near-dup pairs (band blocking); value-exact
    vs the full SQL mirror (Q_SIMHASH_PAIRS_SQL).  Candidate stage is
    the bucketed kernel — one vectorized lexsort/popcount pass per
    shuffle bucket, never per distinct band value."""
    from ..stages.dedup import SimHasher, hamming_candidate_pairs, simhash_band_explode

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    hashed = ds.map_batches(SimHasher(), batch_format="pyarrow")
    exploded = hashed.map_batches(simhash_band_explode, batch_format="pyarrow")
    pairs = hamming_candidate_pairs(exploded, max_hamming=3)
    from ..stages.dedup import pair_reduce

    return pair_reduce(pairs, "doc_a", "doc_b", "hamming", how="min")


def q_fingerprints(sf_dir: str):
    """Rolling-hash document fingerprints (deterministic ints); the
    oracle reproduces the min-over-windows polynomial hash with
    arbitrary-precision HUGEINT arithmetic — value-exact."""
    from ..stages.text import fingerprint_batch

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        fingerprint_batch, batch_format="pyarrow"
    )


def _build_fingerprints_sql() -> str:
    from ..stages.text import _FP_BASE, _FP_WINDOW

    B = int(_FP_BASE)
    H = 1 << 64
    powers = [pow(B, k, H) for k in range(_FP_WINDOW)]
    terms = " + ".join(
        f"unicode(t[i+{j}:i+{j}]) * {powers[_FP_WINDOW - 1 - j]}::HUGEINT"
        for j in range(_FP_WINDOW)
    )
    return f"""
    WITH c AS (
      SELECT doc_id,
             CASE WHEN length(text) < {_FP_WINDOW}
                  THEN text || repeat(' ', {_FP_WINDOW} - length(text))
                  ELSE text END AS t
      FROM documents
    ),
    w AS (
      SELECT doc_id,
             list_min([ (({terms}) % 18446744073709551616::HUGEINT)
                        FOR i IN range(1, length(t) - {_FP_WINDOW - 2}) ]) AS hv
      FROM c
    )
    SELECT doc_id,
           CAST(hv - CASE WHEN hv >= 9223372036854775808::HUGEINT
                     THEN 18446744073709551616::HUGEINT ELSE 0::HUGEINT END
                AS BIGINT) AS fingerprint
    FROM w
"""


Q_FINGERPRINTS_SQL = _build_fingerprints_sql()


def q_embedding_near_dup(sf_dir: str):
    """Embedding-cosine near-dup pairs via sign-LSH buckets.

    Threshold 0.35 suits the synthetic random-vector table (true
    near-dups don't exist there; this exercises the bucketing +
    verify machinery and keeps the output schema non-empty).  The
    deterministic Rademacher planes make the whole pipeline
    SQL-mirrorable; cosines are rounded to 4 dp for cross-engine
    value equality (gap ≫ fp error)."""
    from ..stages.dedup import EmbeddingLshBucket, EmbeddingNearDupPairs
    from ray.data.aggregate import Max

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    bucketed = ds.map_batches(
        EmbeddingLshBucket(n_bits=8), batch_format="pyarrow"
    )
    pairs = bucketed.groupby("bucket").map_groups(
        EmbeddingNearDupPairs(threshold=0.35), batch_format="pyarrow"
    )
    from ..stages.dedup import pair_reduce

    agg = pair_reduce(pairs, "vec_a", "vec_b", "cosine", how="max")
    return agg.map_batches(
        lambda b: pa.table(
            {
                "vec_a": b["vec_a"],
                "vec_b": b["vec_b"],
                "cosine_r": pa.array(np.round(b["cosine"].to_numpy(), 4)),
            }
        ),
        batch_format="pyarrow",
    )


def _build_embedding_near_dup_sql() -> str:
    bucket = _sign_bucket_expr(n_bits=8, seed=13)
    return f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings
    ),
    eb AS (SELECT vec_id, embedding, {bucket} AS bucket FROM e),
    pairs AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             list_cosine_similarity(a.embedding, b.embedding) AS cos
      FROM eb a JOIN eb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    )
    SELECT vec_a, vec_b, round(MAX(cos), 4) AS cosine_r
    FROM pairs WHERE cos >= 0.35 GROUP BY vec_a, vec_b
"""


Q_EMBEDDING_NEAR_DUP_SQL = _build_embedding_near_dup_sql()


def q_mutual_nn(sf_dir: str):
    """Reciprocal-nearest-neighbor ("best buddy") pairs within sign-LSH
    buckets: each vector's nearest neighbor by EXACT integer squared-L2
    over fixed-point quantized embeddings; a pair survives iff each is
    the other's nearest.  The mutual-NN criterion is the standard
    high-precision near-dup verifier (one-sided NN over-pairs hubs).
    Integer distances (floor(x·1000+0.5) quantization, the Gram/dim
    stats convention) make the RANKING itself exact across engines —
    a float cosine rank could flip on a one-ulp difference.  Buckets
    are the bounded 256-ary sign-LSH partition (never an all-pairs
    scan); ties break on (d2, vec_id), mirrored in the SQL window."""
    from ..stages.dedup import EmbeddingLshBucket
    from ..stages.linalg import quantize_embeddings

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    bucketed = ds.map_batches(
        EmbeddingLshBucket(n_bits=8), batch_format="pyarrow"
    )

    def mutual_in_bucket(group: pa.Table) -> pa.Table:
        empty = pa.schema(
            [
                pa.field("vec_a", pa.int64()),
                pa.field("vec_b", pa.int64()),
                pa.field("d2", pa.int64()),
            ]
        ).empty_table()
        if group.num_rows < 2:
            return empty
        ids = group["vec_id"].to_numpy()
        q = quantize_embeddings(group["embedding"])
        uniq, pos = np.unique(ids, return_index=True)
        q = q[pos]
        n = len(uniq)
        if n < 2:
            return empty
        # rows sorted by vec_id (np.unique), so the FIRST minimum in a
        # row is the smallest-vec_id tie — the SQL (d2, vec_id) order
        sq = (q * q).sum(axis=1)
        big = np.iinfo(np.int64).max
        nn = np.empty(n, dtype=np.int64)
        nnd = np.empty(n, dtype=np.int64)
        chunk = max(1, (1 << 22) // n)
        for lo in range(0, n, chunk):
            hi = min(lo + chunk, n)
            d2 = sq[lo:hi, None] + sq[None, :] - 2 * (q[lo:hi] @ q.T)
            d2[np.arange(lo, hi) - lo, np.arange(lo, hi)] = big  # no self
            nn[lo:hi] = d2.argmin(axis=1)
            nnd[lo:hi] = d2[np.arange(hi - lo), nn[lo:hi]]
        i = np.arange(n)
        mutual = (nn[nn] == i) & (i < nn)
        if not mutual.any():
            return empty
        return pa.table(
            {
                "vec_a": pa.array(uniq[mutual], pa.int64()),
                "vec_b": pa.array(uniq[nn[mutual]], pa.int64()),
                "d2": pa.array(nnd[mutual], pa.int64()),
            }
        )

    return bucketed.groupby("bucket").map_groups(
        mutual_in_bucket, batch_format="pyarrow"
    )


def _build_mutual_nn_sql() -> str:
    bucket = _sign_bucket_expr(n_bits=8, seed=13)
    d2 = " + ".join(
        f"(a.q[{d}]-b.q[{d}])*(a.q[{d}]-b.q[{d}])" for d in range(1, GRAM_DIM + 1)
    )
    return f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings
    ),
    eb AS (
      SELECT vec_id, {bucket} AS bucket,
             list_transform(embedding,
                            x -> CAST(floor(x * 1000 + 0.5) AS BIGINT)) AS q
      FROM e
    ),
    pairs AS (
      SELECT a.vec_id AS src, b.vec_id AS dst, {d2} AS d2
      FROM eb a JOIN eb b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
    ),
    r AS (
      SELECT src, dst, d2,
             row_number() OVER (PARTITION BY src ORDER BY d2, dst) AS rnk
      FROM pairs
    ),
    nn AS (SELECT src, dst, d2 FROM r WHERE rnk = 1)
    SELECT x.src AS vec_a, x.dst AS vec_b, CAST(x.d2 AS BIGINT) AS d2
    FROM nn x JOIN nn y ON x.dst = y.src AND y.dst = x.src AND x.src < y.src
"""


def q_martinez_fixtures(sf_dir: str):
    """The full reference fixture corpus through the Ray boolean stage.

    Emits (case_id, op_tag, n_polys, n_vertices, result_hash) per
    fixture×op, where result_hash fingerprints the ENGINE result's
    canonical compact-GeoJSON serialization.  The oracle inlines the
    same columns derived from the GOLDEN expected geometries
    (sources/fixture_pairs.py::golden_expected_table), so the driver's
    hash-exact comparison IS the bit-for-bit conformance gate over
    /root/reference/tests/fixtures/generic_test_cases — the flagship
    kernel verification, now driver-visible."""
    import ray.data as rd

    from ..sources.arrow_geom import arrow_to_mps
    from ..sources.fixture_pairs import fixture_pairs_table, mp_conformance_hash

    table = fixture_pairs_table()
    ds = rd.from_arrow(table)
    out = ds.map_batches(
        BooleanOpBatch(op_column="op"), batch_format="pyarrow", batch_size=16
    )

    def metrics(batch: pa.Table) -> pa.Table:
        mps = arrow_to_mps(batch["result"])
        return pa.table(
            {
                "case_id": batch["case_id"],
                "op_tag": batch["op_tag"],
                "n_polys": pa.array([len(m) for m in mps], pa.int64()),
                "n_vertices": pa.array(
                    [sum(len(r) for p in m for r in p) for m in mps], pa.int64()
                ),
                "result_hash": pa.array(
                    [mp_conformance_hash(m) for m in mps], pa.int64()
                ),
            }
        )

    return out.map_batches(metrics, batch_format="pyarrow")


def q_image_features(sf_dir: str):
    """Synthetic image table → real decode (PNG rows inflate through
    the pure-numpy codec) → integer-exact per-image features.
    Value-exact: the oracle inlines GENERATOR-side expected values
    (phash + position-weighted pixel checksum computed from the input
    pixel math, never through the codec) as literals; the engine
    recomputes the same features through the encode→decode round trip,
    so driver equality pins the codec bit-for-bit on every row."""
    from ..sources.images import read_synth_images
    from ..stages.image_ops import DecodeFeatures

    ds = read_synth_images(2000)
    feats = ds.map_batches(
        DecodeFeatures(), batch_format="pyarrow", batch_size=256
    )

    def check(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "image_id": batch["image_id"],
                "phash": batch["phash_decoded"],
                "pix_checksum": batch["pix_checksum"],
            }
        )

    return feats.map_batches(check, batch_format="pyarrow")


def q_image_quality(sf_dir: str):
    """Image quality scoring + filter (stages/image_ops.py::
    DecodeQuality): real PNG/raw decode → integer-exact brightness /
    contrast / edge-energy signals → in-stage shed of below-mid-gray
    images, so rejected payloads never leave the map stage.  The image
    analogue of the text quality filter.  Value-exact: the oracle
    inlines GENERATOR-side stats for the passing rows (pixel math,
    never the codec), so driver equality pins decode + scoring + the
    filter decision on every row."""
    from ..sources.images import read_synth_images
    from ..stages.image_ops import DecodeQuality

    ds = read_synth_images(2000)
    return ds.map_batches(
        DecodeQuality(), batch_format="pyarrow", batch_size=256
    )


PYRAMID_N = 1200


def q_image_pyramid(sf_dir: str):
    """Thumbnail / resolution-ladder pyramid: real decode → two exact
    2× box-downsample levels per image → integer checksums.  The
    preprocessing ladder a tile server or multi-resolution trainer
    runs over every stored image; payloads drop inside the actor
    stage, so the exchange only ever sees 40-byte rows.  Value-exact:
    the oracle inlines generator-side per-level checksums (pixel
    math, never the codec), pinning decode + the downsample kernel
    bit-for-bit per (image, level)."""
    from ..sources.images import read_synth_images
    from ..stages.image_ops import DecodePyramid

    ds = read_synth_images(PYRAMID_N)
    return ds.map_batches(
        DecodePyramid(levels=2), batch_format="pyarrow", batch_size=256
    )


AUG_N = 1200


def q_image_augment(sf_dir: str):
    """Training-augmentation fan-out: real decode → deterministic
    flip/rot90 variants → integer checksums, two rows per image.  The
    preprocessing stage a vision trainer runs per epoch; payloads drop
    inside the actor stage.  Value-exact: generator-side per-variant
    checksums (pixel math, never the codec) pin decode + each
    rearrangement bit-for-bit."""
    from ..sources.images import read_synth_images
    from ..stages.image_ops import DecodeAugment

    ds = read_synth_images(AUG_N)
    return ds.map_batches(
        DecodeAugment(), batch_format="pyarrow", batch_size=256
    )


PIXHIST_N = 1500


def q_pixel_histogram(sf_dir: str):
    """Corpus-wide pixel-intensity histogram (16 bins, bin = byte>>4):
    the exposure/contrast profile a vision-data pipeline computes
    before normalization.  Real decode per image (PNG rows inflate
    through the codec); each batch folds its images into ONE 16-bin
    partial (np.bincount over all channel bytes), so the exchange
    carries 16 rows per block regardless of image count.  Value-exact:
    the oracle inlines the generator-side total histogram (pixel math,
    never the codec), pinning decode + binning over every byte of the
    corpus."""
    from ray.data.aggregate import Sum

    from ..sources.images import read_synth_images
    from ..stages.image_ops import decode_image

    def partial(b: pa.Table) -> pa.Table:
        payloads = b["bytes"].to_pylist()
        ws = b["w"].to_numpy()
        hs = b["h"].to_numpy()
        fmts = b["fmt"].to_pylist()
        hist = np.zeros(16, dtype=np.int64)
        for i, payload in enumerate(payloads):
            px = decode_image(payload, int(ws[i]), int(hs[i]), fmts[i])
            hist += np.bincount(px.ravel() >> 4, minlength=16)
        return pa.table(
            {
                "bin": pa.array(np.arange(16, dtype=np.int64)),
                "n": pa.array(hist),
            }
        )

    ds = read_synth_images(PIXHIST_N)
    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=256)
        .groupby("bin")
        .aggregate(Sum("n", alias_name="n"))
    )


def _build_pixel_histogram_sql(n_images: int = PIXHIST_N) -> str:
    from ..sources.images import _base_pixels

    hist = np.zeros(16, dtype=np.int64)
    for i in range(n_images):
        hist += np.bincount(_base_pixels(i).ravel() >> 4, minlength=16)
    rows = ",\n      ".join(
        f"(CAST({b} AS BIGINT), CAST({int(n)} AS BIGINT))"
        for b, n in enumerate(hist)
    )
    return f"""
    SELECT * FROM (VALUES
      {rows}
    ) AS expected(bin, n)
"""


JPEG_RT_N = 600


def q_jpeg_roundtrip(sf_dir: str):
    """The LOSSY codec path: mixed-format corpus (raw / png / baseline
    JPEG at JPEG_QUALITY, real pure-numpy DCT+Huffman codec) → actor-pool
    decode → per-row reconstruction invariant (psnr centi-dB vs the
    re-synthesized original, decoded-pixel checksum, PSNR≥40dB
    verdict — BASELINE.json input_hint).  Value-exact: the oracle
    inlines driver-side literals computed by the SAME generator +
    codec math (sources/images.py::roundtrip_metrics), so driver
    equality pins the distributed decode of genuinely lossy bytes."""
    from ..sources.images import read_synth_lossy_images
    from ..stages.image_ops import DecodeRoundtrip

    ds = read_synth_lossy_images(JPEG_RT_N)
    return ds.map_batches(
        DecodeRoundtrip(), batch_format="pyarrow", batch_size=128
    )


JPEG_SWEEP_N = 200
JPEG_SWEEP_QUALITIES = (60, 80, 95)


def q_jpeg_quality_sweep(sf_dir: str):
    """Rate–distortion sweep: every image encoded at three JPEG
    qualities INSIDE the map stage (the distributed transcode a
    storage-budget pass runs), emitting (quality, payload bytes, PSNR
    centi-dB) per variant — 3 rows of 32 bytes per image leave the
    stage, never pixels.  Exercises the pure-numpy ENCODER (DCT,
    quantization, Huffman, byte stuffing) distributed, where
    jpeg_roundtrip exercises the decoder.  Value-exact: oracle inlines
    driver-side literals from the identical generator+codec math."""
    import ray.data as rd

    from ..sources.images import lossy_base_pixels
    from ..stages.image_ops import psnr

    def sweep(batch: pa.Table) -> pa.Table:
        from ..functions.jpeg import decode_jpeg, encode_jpeg

        idx = batch["id"].to_numpy()
        out_id, out_q, out_b, out_cb = [], [], [], []
        for i in idx:
            i = int(i)
            px = lossy_base_pixels(i)
            for q in JPEG_SWEEP_QUALITIES:
                data = encode_jpeg(px, quality=q)
                p = psnr(px, decode_jpeg(data))
                out_id.append(i)
                out_q.append(q)
                out_b.append(len(data))
                out_cb.append(
                    99999 if np.isinf(p) else int(np.floor(p * 100.0 + 0.5))
                )
        return pa.table(
            {
                "img_idx": pa.array(out_id, pa.int64()),
                "quality": pa.array(out_q, pa.int64()),
                "n_bytes": pa.array(out_b, pa.int64()),
                "psnr_cb": pa.array(out_cb, pa.int64()),
            }
        )

    ds = rd.range(JPEG_SWEEP_N, override_num_blocks=8)
    return ds.map_batches(sweep, batch_format="pyarrow", batch_size=32)


def _build_jpeg_sweep_sql() -> str:
    from ..functions.jpeg import decode_jpeg, encode_jpeg
    from ..sources.images import lossy_base_pixels
    from ..stages.image_ops import psnr

    ids, qs, bs, cbs = [], [], [], []
    for i in range(JPEG_SWEEP_N):
        px = lossy_base_pixels(i)
        for q in JPEG_SWEEP_QUALITIES:
            data = encode_jpeg(px, quality=q)
            p = psnr(px, decode_jpeg(data))
            ids.append(i)
            qs.append(q)
            bs.append(len(data))
            cbs.append(99999 if np.isinf(p) else int(np.floor(p * 100.0 + 0.5)))
    return _values_oracle_sql(
        pa.table(
            {
                "img_idx": pa.array(ids, pa.int64()),
                "quality": pa.array(qs, pa.int64()),
                "n_bytes": pa.array(bs, pa.int64()),
                "psnr_cb": pa.array(cbs, pa.int64()),
            }
        )
    )


IMAGE_NEARDUP_N = 2000
IMAGE_NEARDUP_MAX_HAMMING = 6


def _phash_band_explode(batch: pa.Table) -> pa.Table:
    from ..stages.dedup import band_explode

    return band_explode(batch, "img_idx", "phash", bands=4)


def q_image_near_dup(sf_dir: str):
    """Perceptual-hash near-duplicate IMAGE pairs over a corpus with
    planted variants: real decode (PNG rows inflate through the codec)
    → in-engine 64-bit average-hash → 4×16-bit band blocking (pigeonhole:
    hamming<4 guarantees a shared band; wider-hamming variants are
    caught because the perturbation touches whole hash-grid cells, so
    flipped bits cluster) → exact popcount verify within buckets.

    Scale shape is identical to the SimHash text path: after the lean
    DecodePhash stage every row is 16 bytes, the explode is 4×, and the
    only shuffle is the bucketed groupby — never an all-pairs scan over
    the image table.  Value-exact: the oracle inlines GENERATOR-side
    phashes (pixel math, never the codec) and mirrors the banding +
    bit_count(xor) verify in SQL, so driver equality pins the decode
    path AND the pairing pipeline."""
    from ..sources.images import read_synth_neardup_images
    from ..stages.dedup import hamming_candidate_pairs
    from ..stages.image_ops import DecodePhash

    ds = read_synth_neardup_images(IMAGE_NEARDUP_N)
    hashed = ds.map_batches(
        DecodePhash(), batch_format="pyarrow", batch_size=256
    )
    exploded = hashed.map_batches(_phash_band_explode, batch_format="pyarrow")
    pairs = hamming_candidate_pairs(
        exploded,
        max_hamming=IMAGE_NEARDUP_MAX_HAMMING,
        key_col="img_idx",
        sig_col="phash",
        out_cols=("img_a", "img_b"),
    )
    from ..stages.dedup import pair_reduce

    return pair_reduce(pairs, "img_a", "img_b", "hamming", how="min")


IMAGE_SIM_N = 1500
IMAGE_SIM_K = 5
IMAGE_SIM_QUERIES = (0, 251, 502, 753, 1004, 1255)


def q_image_sim(sf_dir: str):
    """Similarity search over the IMAGE table: decode → 16-d integer
    thumbnail vector → exact squared-L2 top-k against a broadcast
    query matrix (ray.put once, read in every actor's __init__), fused
    into a single actor stage that emits only Q×k candidate rows per
    batch — the merge groupby moves kilobytes regardless of corpus
    size.  Integer features keep every distance exact, so the oracle
    (generator-side feature literals + a windowed ROW_NUMBER top-k)
    is value-exact and driver equality pins the decode path, the
    feature math and the distributed top-k merge."""
    import ray

    from ..sources.images import expected_thumb_features, read_synth_images
    from ..stages.image_ops import ImageSimMerge, ImageSimPartial

    feats = expected_thumb_features(IMAGE_SIM_N)
    qpos = list(IMAGE_SIM_QUERIES)
    qmat = np.stack(
        [
            np.array([feats[f"f{d}"][i].as_py() for d in range(16)], dtype=np.int64)
            for i in qpos
        ]
    )
    queries_ref = ray.put((np.array(qpos, dtype=np.int64), qmat))

    ds = read_synth_images(IMAGE_SIM_N)
    cands = ds.map_batches(
        ImageSimPartial(queries_ref, IMAGE_SIM_K),
        batch_format="pyarrow",
        batch_size=256,
    )
    return cands.groupby("query_idx").map_groups(
        ImageSimMerge(IMAGE_SIM_K), batch_format="pyarrow"
    )


def _build_image_sim_sql() -> str:
    """SQL mirror: feature literals (generator pixel math), integer
    squared-L2 cross join against the query rows, ROW_NUMBER top-k
    with the same (dist, img_idx) tie-break."""
    from ..sources.images import expected_thumb_features

    values = _values_oracle_sql(expected_thumb_features(IMAGE_SIM_N))
    qlist = ", ".join(str(i) for i in IMAGE_SIM_QUERIES)
    dist = " + ".join(
        f"(q.f{d} - f.f{d}) * (q.f{d} - f.f{d})" for d in range(16)
    )
    return f"""
    WITH f AS ({values}),
    q AS (SELECT * FROM f WHERE img_idx IN ({qlist})),
    d AS (
      SELECT q.img_idx AS query_idx, f.img_idx AS img_idx,
             {dist} AS dist
      FROM q CROSS JOIN f
    ),
    r AS (
      SELECT query_idx, img_idx, dist,
             ROW_NUMBER() OVER (
               PARTITION BY query_idx ORDER BY dist, img_idx
             ) AS rnk
      FROM d
    )
    SELECT query_idx, img_idx, CAST(dist AS BIGINT) AS dist,
           CAST(rnk AS BIGINT) AS rank
    FROM r WHERE rnk <= {IMAGE_SIM_K}
"""


def _build_image_near_dup_sql() -> str:
    """SQL mirror of the pHash near-dup pipeline over generator-side
    phash literals: unsigned reinterpretation, 4×16-bit band extraction,
    band-equality self-join, bit_count(xor) hamming, min per pair."""
    from ..sources.images import expected_neardup_phashes

    values = _values_oracle_sql(expected_neardup_phashes(IMAGE_NEARDUP_N))
    bandpw = ", ".join(f"{1 << (16 * k)}::HUGEINT" for k in range(4))
    return f"""
    WITH ph AS ({values}),
    u AS (
      SELECT img_idx, phash,
             CASE WHEN phash < 0
                  THEN phash + 18446744073709551616::HUGEINT
                  ELSE phash::HUGEINT END AS phu
      FROM ph
    ),
    bands AS (
      SELECT img_idx, phash, p.band AS band_id,
             (phu // p.bpw) % 65536::HUGEINT AS band_val
      FROM u, (SELECT unnest(range(4)) AS band, unnest([{bandpw}]) AS bpw) p
    ),
    pairs AS (
      SELECT a.img_idx AS img_a, b.img_idx AS img_b,
             bit_count(xor(a.phash, b.phash)) AS ham
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.band_val = b.band_val
       AND a.img_idx < b.img_idx
    )
    SELECT img_a, img_b, CAST(MIN(ham) AS BIGINT) AS hamming
    FROM pairs WHERE ham <= {IMAGE_NEARDUP_MAX_HAMMING}
    GROUP BY img_a, img_b
"""


def q_image_dedup_components(sf_dir: str):
    """Connected components over the IMAGE near-dup graph: the pHash
    banded pipeline's verified pairs (real decode → 64-bit hash →
    bucketed band candidates) feed the same distributed min-label
    propagation + pointer jumping the document path uses — variant
    chains (A~B, B~C) collapse into one cluster whose canonical member
    is the min img_idx.  The image-axis twin of dedup_components:
    labels never touch the driver; the oracle rebuilds the identical
    graph from generator-side phash literals and closes it with a
    recursive CTE."""
    from ..stages.dedup import connected_components

    pairs = q_image_near_dup(sf_dir)
    comps = connected_components(pairs, a_col="img_a", b_col="img_b")
    return comps.map_batches(
        lambda b: pa.table({"img_idx": b["node"], "component": b["component"]}),
        batch_format="pyarrow",
    )


def _build_image_dedup_components_sql() -> str:
    return f"""
    WITH RECURSIVE pr AS ({_build_image_near_dup_sql()}),
    sym AS (
      SELECT img_a AS node, img_b AS peer FROM pr
      UNION
      SELECT img_b, img_a FROM pr
    ),
    reach(node, label) AS (
      SELECT node, node FROM (SELECT DISTINCT node FROM sym)
      UNION
      SELECT sym.node, reach.label FROM sym JOIN reach ON reach.node = sym.peer
    )
    SELECT node AS img_idx, CAST(MIN(label) AS BIGINT) AS component
    FROM reach GROUP BY node
"""


def q_image_safe_split(sf_dir: str):
    """Leakage-safe train/test split on the IMAGE axis: every image is
    assigned by the hash of its near-dup COMPONENT (its own index when
    it has no variants), so visually-duplicate images never straddle
    the split — the image twin of safe_split, the eval-contamination
    guard a multimodal training pipeline needs.  One left-join shuffle
    attaches the component labels; the split is a pure per-row hash."""
    import ray.data as rd

    from ..stages.join import shuffle_hash_join

    comps = q_image_dedup_components(sf_dir)
    ids = rd.range(IMAGE_NEARDUP_N).map_batches(
        lambda b: pa.table({"img_idx": b["id"].cast(pa.int64())}),
        batch_format="pyarrow",
    )
    joined = shuffle_hash_join(
        ids,
        comps,
        "img_idx",
        [],
        ["component"],
        how="left",
        left_schema=pa.schema([pa.field("img_idx", pa.int64())]),
        right_schema=pa.schema(
            [pa.field("img_idx", pa.int64()), pa.field("component", pa.int64())]
        ),
    )

    def assign(b: pa.Table) -> pa.Table:
        gkey = pc.coalesce(b["component"], b["img_idx"]).to_numpy().astype(np.uint64)
        h = ((gkey % np.uint64(4294967296)) * np.uint64(2654435761)) % np.uint64(
            4294967296
        )
        train = (h % np.uint64(10)) < 8
        return pa.table(
            {
                "img_idx": b["img_idx"],
                "split": pa.array(
                    np.where(train, "train", "test").tolist(), pa.string()
                ),
            }
        )

    return joined.map_batches(assign, batch_format="pyarrow")


def _build_image_safe_split_sql() -> str:
    return f"""
    WITH comp AS ({_build_image_dedup_components_sql()}),
    ids AS (SELECT unnest(range({IMAGE_NEARDUP_N})) AS img_idx),
    j AS (
      SELECT ids.img_idx, COALESCE(c.component, ids.img_idx) AS gkey
      FROM ids LEFT JOIN comp c ON c.img_idx = ids.img_idx
    )
    SELECT CAST(img_idx AS BIGINT) AS img_idx,
           CASE WHEN (((gkey % 4294967296) * 2654435761) % 4294967296) % 10 < 8
                THEN 'train' ELSE 'test' END AS split
    FROM j
"""


def _values_oracle_sql(t: pa.Table) -> str:
    """Expected-values oracle: a VALUES table of generator-side
    literals (input-data math, never engine output) the driver compares
    hash-exact against the engine's decode-derived results."""

    def lit(v):
        # explicit casts so DuckDB types every column like the engine
        # (bare small-int literals would come out INTEGER, not BIGINT)
        return f"'{v}'" if isinstance(v, str) else f"CAST({v!r} AS BIGINT)"

    cols = t.column_names
    rows = ",\n      ".join(
        "(" + ", ".join(lit(t[c][i].as_py()) for c in cols) + ")"
        for i in range(t.num_rows)
    )
    return f"""
    SELECT * FROM (VALUES
      {rows}
    ) AS expected({", ".join(cols)})
"""


def _region_polys_table() -> pa.Table:
    """Deterministic irregular region set: mixed-resolution cells
    (coarse + fine) spread over the world — shared by the poly_clip
    queries and inlined (as exact double literals) into the DuckDB
    oracle."""
    from ..stages.cells import cell_encode, cell_polygon
    from ..sources.arrow_geom import mp_bounds, mps_to_arrow

    region_ids = [int(c) for c in cell_encode(
        np.linspace(-150, 150, 12), np.linspace(-70, 70, 12), 3
    )] + [int(c) for c in cell_encode(
        np.linspace(-120, 120, 12), np.linspace(60, -60, 12), 5
    )]
    region_ids = sorted(set(region_ids))
    geoms = [cell_polygon(c) for c in region_ids]
    bounds = [mp_bounds(g) for g in geoms]
    return pa.table(
        {
            "tile_id": pa.array(region_ids, pa.int64()),
            "geom": mps_to_arrow(geoms),
            "minx": pa.array([b[0] for b in bounds]),
            "miny": pa.array([b[1] for b in bounds]),
            "maxx": pa.array([b[2] for b in bounds]),
            "maxy": pa.array([b[3] for b in bounds]),
        }
    )


def q_poly_clip(sf_dir: str):
    """Part-derived axis rects × the irregular broadcast region set via
    the warm R-tree actor stage (BroadcastPolyJoinClip, whole-batch
    native Martinez clip): per-region piece counts + integer
    clipped-area sums.  The oracle reproduces the region set as literal
    rect bounds (cell bounds are exact doubles) and uses closed-form
    rect∩rect arithmetic — value-exact."""
    import ray
    from ray.data.aggregate import Count, Sum

    from ..stages.join_clip import BroadcastPolyJoinClip

    polys_ref = ray.put(_region_polys_table())

    def subjects(batch: pa.Table) -> pa.Table:
        b = _part_rect_batch(batch)
        return pa.table(
            {
                "image_id": pc.cast(b["p_partkey"], pa.string()),
                "footprint": b["footprint"],
                "minx": b["minx"],
                "miny": b["miny"],
                "maxx": b["maxx"],
                "maxy": b["maxy"],
            }
        )

    fp = _read(sf_dir, "part", ["p_partkey", "p_size"]).map_batches(
        subjects, batch_format="pyarrow"
    )
    out = fp.map_batches(
        BroadcastPolyJoinClip,
        fn_constructor_kwargs={"polys": polys_ref},
        batch_format="pyarrow",
        concurrency=(2, 64),
    )

    def to_int(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "region_id": batch["tile_id"],
                "area_e6": pa.array(
                    np.round(batch["clip_area"].to_numpy() * 1e6).astype(np.int64)
                ),
            }
        )

    return (
        out.map_batches(to_int, batch_format="pyarrow")
        .groupby("region_id")
        .aggregate(Count(alias_name="n_pieces"), Sum("area_e6", alias_name="area_e6"))
    )


def _build_poly_clip_sql() -> str:
    t = _region_polys_table()
    rows = ",\n      ".join(
        f"({t['tile_id'][i].as_py()}, {t['minx'][i].as_py()!r}, {t['miny'][i].as_py()!r}, "
        f"{t['maxx'][i].as_py()!r}, {t['maxy'][i].as_py()!r})"
        for i in range(t.num_rows)
    )
    return f"""
    WITH d AS ({PART_RECT_SQL}),
    r(region_id, rx0, ry0, rx1, ry1) AS (VALUES
      {rows}
    )
    SELECT region_id,
           CAST(COUNT(*) AS BIGINT) AS n_pieces,
           CAST(SUM(CAST(round(
             (least(maxx, rx1) - greatest(minx, rx0)) *
             (least(maxy, ry1) - greatest(miny, ry0)) * 1000000
           ) AS BIGINT)) AS BIGINT) AS area_e6
    FROM d, r
    WHERE least(maxx, rx1) > greatest(minx, rx0)
      AND least(maxy, ry1) > greatest(miny, ry0)
    GROUP BY region_id
"""


Q_POLY_CLIP_SQL = _build_poly_clip_sql()


def q_wkb_clip(sf_dir: str):
    """WKB ingest escape hatch end-to-end (the SURVEY §1.4 promise):
    the same part-derived rect subjects arrive as a WIRE-FORMAT WKB
    binary column (little-endian ISO MultiPolygon — what GeoParquet
    carries), one decode stage (sources/arrow_geom.py::wkb_to_mp_arrow)
    rebuilds the nested-list geometry + vectorized bbox columns, and
    the stream flows through the SAME warm R-tree Martinez clip stage
    as poly_clip.  Oracle identical to poly_clip — driver equality
    through the wire format pins the codec both ways (the subjects are
    ENCODED with mp_arrow_to_wkb first, so a bug in either direction
    breaks the hash).  Reference geometry model: lib/src/boolean/
    mod.rs:33, fill_queue.rs:25-28."""
    import ray
    from ray.data.aggregate import Count, Sum

    from ..sources.arrow_geom import (
        arrow_mp_bounds,
        mp_arrow_to_wkb,
        wkb_to_mp_arrow,
    )
    from ..stages.join_clip import BroadcastPolyJoinClip

    polys_ref = ray.put(_region_polys_table())

    def to_wkb(batch: pa.Table) -> pa.Table:
        # the "reader": subjects serialized to the GeoParquet wire format
        b = _part_rect_batch(batch)
        return pa.table(
            {
                "image_id": pc.cast(b["p_partkey"], pa.string()),
                "wkb": mp_arrow_to_wkb(b["footprint"]),
            }
        )

    def decode_wkb(batch: pa.Table) -> pa.Table:
        mp = wkb_to_mp_arrow(batch["wkb"])
        bb = arrow_mp_bounds(mp)
        return pa.table(
            {
                "image_id": batch["image_id"],
                "footprint": mp,
                "minx": pa.array(bb["minx"]),
                "miny": pa.array(bb["miny"]),
                "maxx": pa.array(bb["maxx"]),
                "maxy": pa.array(bb["maxy"]),
            }
        )

    fp = (
        _read(sf_dir, "part", ["p_partkey", "p_size"])
        .map_batches(to_wkb, batch_format="pyarrow")
        .map_batches(decode_wkb, batch_format="pyarrow")
    )
    out = fp.map_batches(
        BroadcastPolyJoinClip,
        fn_constructor_kwargs={"polys": polys_ref},
        batch_format="pyarrow",
        concurrency=(2, 64),
    )

    def to_int(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "region_id": batch["tile_id"],
                "area_e6": pa.array(
                    np.round(batch["clip_area"].to_numpy() * 1e6).astype(np.int64)
                ),
            }
        )

    return (
        out.map_batches(to_int, batch_format="pyarrow")
        .groupby("region_id")
        .aggregate(Count(alias_name="n_pieces"), Sum("area_e6", alias_name="area_e6"))
    )


def q_poly_clip_quads(sf_dir: str):
    """Rotated image-footprint quads × the irregular region set through
    the warm broadcast R-tree actor (BroadcastPolyJoinClip, whole-batch
    native Martinez clip) — per-region piece counts plus 16×16
    pixel-center coverage of the clipped pieces (the engine rasterizes
    the MARTINEZ OUTPUT polygons; RasterizePartial pre-aggregates
    before the one groupby shuffle).  Value-exact: the oracle inlines
    the deterministic quad parameters and region cell bounds as
    literals, decides positive-area overlap by the separating-axis
    test, and tests exact-dyadic pixel centers against each rotated
    rect directly (center ∈ quad∩region ⇔ center ∈ quad, since grid
    centers lie strictly inside their region) — the same
    discretization trick as Q_TILE_COVERAGE_SQL."""
    import ray

    from ..pipelines.flagship import footprints_dataset
    from ..stages.join_clip import BroadcastPolyJoinClip
    from ..stages.tiles import RasterizePartial, merge_rasters

    polys_ref = ray.put(_region_polys_table())
    fp = footprints_dataset(2000)
    out = fp.map_batches(
        BroadcastPolyJoinClip,
        fn_constructor_kwargs={"polys": polys_ref},
        batch_format="pyarrow",
        concurrency=(2, 64),
    )
    part = out.map_batches(RasterizePartial(px=16), batch_format="pyarrow")
    merged = part.groupby("tile_id").map_groups(merge_rasters, batch_format="pyarrow")

    def finalize(batch: pa.Table) -> pa.Table:
        covered = [
            int((np.frombuffer(b, np.uint16) > 0).sum())
            for b in batch["raster"].to_pylist()
        ]
        return pa.table(
            {
                "region_id": batch["tile_id"],
                "n_pieces": batch["n_pieces"],
                "px_covered": pa.array(covered, pa.int64()),
            }
        )

    return merged.map_batches(finalize, batch_format="pyarrow")


def _build_poly_clip_quads_sql(n_images: int = 2000, px: int = 16) -> str:
    """SQL mirror of q_poly_clip_quads (see its docstring).  Quad
    literals come from footprint_params (generator math, not engine
    output); region bounds are the exact-dyadic cell bounds."""
    from ..stages.footprint import footprint_params

    t = _region_polys_table()
    rrows = ",\n      ".join(
        f"({t['tile_id'][i].as_py()}, {t['minx'][i].as_py()!r}::DOUBLE, "
        f"{t['miny'][i].as_py()!r}::DOUBLE, {t['maxx'][i].as_py()!r}::DOUBLE, "
        f"{t['maxy'][i].as_py()!r}::DOUBLE)"
        for i in range(t.num_rows)
    )
    cx, cy, ct, st, hw, hh = footprint_params(np.arange(n_images, dtype=np.int64))
    qrows = ",\n      ".join(
        f"({cx[i]!r}::DOUBLE, {cy[i]!r}::DOUBLE, {ct[i]!r}::DOUBLE, "
        f"{st[i]!r}::DOUBLE, {hw[i]!r}::DOUBLE, {hh[i]!r}::DOUBLE)"
        for i in range(n_images)
    )
    # pixel center: engine computes x0 + ((i + 0.5) * (x1 - x0)) / px —
    # mirror the op order (all quantities are exact dyadic doubles)
    cxp = f"(o.rx0 + px_.o * (o.rx1 - o.rx0) / {float(px)!r})"
    cyp = f"(o.ry0 + py_.o * (o.ry1 - o.ry0) / {float(px)!r})"
    return f"""
    WITH r(region_id, rx0, ry0, rx1, ry1) AS (VALUES
      {rrows}
    ),
    q(cx, cy, ct, st, hw, hh) AS (VALUES
      {qrows}
    ),
    qb AS (
      SELECT *, abs(ct) * hw + abs(st) * hh AS ex,
                abs(st) * hw + abs(ct) * hh AS ey
      FROM q
    ),
    ov AS (
      SELECT r.region_id, r.rx0, r.ry0, r.rx1, r.ry1,
             qb.cx, qb.cy, qb.ct, qb.st, qb.hw, qb.hh
      FROM qb, r
      WHERE cx - ex < rx1 AND cx + ex > rx0
        AND cy - ey < ry1 AND cy + ey > ry0
        AND least((rx0-cx)*ct + (ry0-cy)*st, (rx1-cx)*ct + (ry0-cy)*st,
                  (rx0-cx)*ct + (ry1-cy)*st, (rx1-cx)*ct + (ry1-cy)*st) < hw
        AND greatest((rx0-cx)*ct + (ry0-cy)*st, (rx1-cx)*ct + (ry0-cy)*st,
                     (rx0-cx)*ct + (ry1-cy)*st, (rx1-cx)*ct + (ry1-cy)*st) > -hw
        AND least(-(rx0-cx)*st + (ry0-cy)*ct, -(rx1-cx)*st + (ry0-cy)*ct,
                  -(rx0-cx)*st + (ry1-cy)*ct, -(rx1-cx)*st + (ry1-cy)*ct) < hh
        AND greatest(-(rx0-cx)*st + (ry0-cy)*ct, -(rx1-cx)*st + (ry0-cy)*ct,
                     -(rx0-cx)*st + (ry1-cy)*ct, -(rx1-cx)*st + (ry1-cy)*ct) > -hh
    ),
    pix AS (SELECT CAST(i AS DOUBLE) + 0.5 AS o, i
            FROM UNNEST(generate_series(0, {px - 1})) AS t(i)),
    hits AS (
      SELECT DISTINCT o.region_id, px_.i AS pi, py_.i AS pj
      FROM ov o, pix px_, pix py_
      WHERE abs(({cxp} - o.cx) * o.ct + ({cyp} - o.cy) * o.st) < o.hw
        AND abs(-({cxp} - o.cx) * o.st + ({cyp} - o.cy) * o.ct) < o.hh
    )
    SELECT p.region_id, p.n_pieces,
           COALESCE(h.px_covered, CAST(0 AS BIGINT)) AS px_covered
    FROM (SELECT region_id, CAST(COUNT(*) AS BIGINT) AS n_pieces
          FROM ov GROUP BY region_id) p
    LEFT JOIN (SELECT region_id, CAST(COUNT(*) AS BIGINT) AS px_covered
               FROM hits GROUP BY region_id) h
    USING (region_id)
"""


Q_POLY_CLIP_QUADS_SQL = _build_poly_clip_quads_sql()


def q_scene_stats(sf_dir: str):
    """Video motion profiling / scene-change signal: per-video Σ and
    max of absolute inter-frame differences through the REAL frame
    decode (raw and length-prefixed-PNG payloads) — the curation
    signal that separates static clips from pans and cuts.  One row
    out per video; payloads drop inside the actor stage.  Value-exact
    via generator-side expected motion integers (pixel math, never
    the codec)."""
    from ..sources.videos import read_synth_videos
    from ..stages.video_ops import SceneStats

    ds = read_synth_videos(500)
    return ds.map_batches(
        SceneStats, batch_format="pyarrow", batch_size=64, concurrency=(2, 64)
    )


def q_video_frames(sf_dir: str):
    """Video frame sampling: every 2nd frame of each synthetic clip →
    (video_id, frame_idx, frame_phash, frame_checksum) rows.  Raw and
    PNG-compressed frame payloads both decode for real.  Value-exact:
    expected-values oracle from the generator's frame pixel math (see
    q_image_features) — equality pins the length-prefixed PNG frame
    codec on every sampled frame."""
    from ..sources.videos import read_synth_videos
    from ..stages.video_ops import FrameSample

    ds = read_synth_videos(500)
    out = ds.map_batches(
        FrameSample,
        fn_constructor_kwargs={"stride": 2},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(2, 64),
    )
    return out.select_columns(
        ["video_id", "frame_idx", "frame_phash", "frame_checksum"]
    )


def q_audio_features(sf_dir: str):
    """PCM16 audio decode → integer-exact clip features (peak,
    absolute sum, zero crossings).  Value-exact: expected-values
    oracle from the generator's wave math (see q_image_features)."""
    from ..sources.videos import read_synth_audio
    from ..stages.video_ops import AudioFeatures

    ds = read_synth_audio(1000)
    return ds.map_batches(
        AudioFeatures, batch_format="pyarrow", batch_size=128, concurrency=(2, 64)
    )


def q_tile_coverage(sf_dir: str):
    """Flagship tiling pipeline summary (vector tiles + coverage):
    synth images → rotated quad footprints → bbox cover at res 4 →
    exact Martinez clip per tile → pixel-center rasterize (16×16) →
    per-tile coverage fraction.  Value-exact vs a SQL mirror that
    inlines the deterministic quad parameters as literals, reproduces
    the grid cover + Morton tile ids in integer arithmetic, decides
    positive-area quad∩tile overlap by the separating-axis test, and
    tests pixel centers (exact dyadic doubles) against each rotated
    rect directly — coverage counts are integers over 256, so the
    fraction is an exact dyadic double in both engines."""
    from .flagship import tile_pipeline

    ds = tile_pipeline(n_images=1000, tile_res=4, raster_px=16)
    return ds.select_columns(["tile_id", "coverage_fraction"])


def _build_tile_coverage_sql(n_images: int = 1000, tile_res: int = 4, px: int = 16) -> str:
    """SQL mirror of q_tile_coverage (see its docstring).  The quad
    parameter literals come from footprint_params — the same
    deterministic generator math the engine runs, NOT engine output."""
    assert tile_res == 4, "Morton spread below is written for 4-bit indices"
    from ..stages.footprint import footprint_params

    cx, cy, ct, st, hw, hh = footprint_params(np.arange(n_images, dtype=np.int64))
    # ::DOUBLE on every literal — DuckDB otherwise types long decimal
    # literals in VALUES as DECIMAL(38,·) and overflows
    rows = ",\n      ".join(
        f"({cx[i]!r}::DOUBLE, {cy[i]!r}::DOUBLE, {ct[i]!r}::DOUBLE, "
        f"{st[i]!r}::DOUBLE, {hw[i]!r}::DOUBLE, {hh[i]!r}::DOUBLE)"
        for i in range(n_images)
    )
    n_side = 2**tile_res
    wx = 360.0 / n_side  # 22.5, exact dyadic
    wy = 180.0 / n_side  # 11.25, exact dyadic
    sx = wx / px  # 1.40625, exact dyadic
    sy = wy / px  # 0.703125, exact dyadic

    def gidx(expr: str, lo: float, span: float) -> str:
        return (
            f"least(CAST(floor(greatest((({expr}) - {lo!r}) / {span!r}, 0.0)"
            f" * {float(n_side)!r}) AS BIGINT), {n_side - 1})"
        )

    def spread(v: str) -> str:
        return f"(({v} & 1) | (({v} & 2) << 1) | (({v} & 4) << 2) | (({v} & 8) << 3))"

    return f"""
    WITH q(cx, cy, ct, st, hw, hh) AS (VALUES
      {rows}
    ),
    qb AS (
      SELECT *, abs(ct) * hw + abs(st) * hh AS ex,
                abs(st) * hw + abs(ct) * hh AS ey
      FROM q
    ),
    g AS (
      SELECT *,
             {gidx("cx - ex", -180.0, 360.0)} AS ix0,
             {gidx("cx + ex", -180.0, 360.0)} AS ix1,
             {gidx("cy - ey", -90.0, 180.0)} AS iy0,
             {gidx("cy + ey", -90.0, 180.0)} AS iy1
      FROM qb
    ),
    pairs AS (
      SELECT g.*, tx.ix, ty.iy
      FROM g, UNNEST(generate_series(ix0, ix1)) AS tx(ix),
              UNNEST(generate_series(iy0, iy1)) AS ty(iy)
    ),
    tiles AS (
      SELECT *,
             (CAST({tile_res} AS BIGINT) << 58)
               | {spread("ix")} | ({spread("iy")} << 1) AS tile_id,
             -180.0 + CAST(ix AS DOUBLE) * {wx!r} AS tx0,
             -90.0 + CAST(iy AS DOUBLE) * {wy!r} AS ty0
      FROM pairs
    ),
    ov AS (
      SELECT * FROM (SELECT *, tx0 + {wx!r} AS tx1, ty0 + {wy!r} AS ty1 FROM tiles)
      WHERE cx - ex < tx1 AND cx + ex > tx0
        AND cy - ey < ty1 AND cy + ey > ty0
        AND least((tx0-cx)*ct + (ty0-cy)*st, (tx1-cx)*ct + (ty0-cy)*st,
                  (tx0-cx)*ct + (ty1-cy)*st, (tx1-cx)*ct + (ty1-cy)*st) < hw
        AND greatest((tx0-cx)*ct + (ty0-cy)*st, (tx1-cx)*ct + (ty0-cy)*st,
                     (tx0-cx)*ct + (ty1-cy)*st, (tx1-cx)*ct + (ty1-cy)*st) > -hw
        AND least(-(tx0-cx)*st + (ty0-cy)*ct, -(tx1-cx)*st + (ty0-cy)*ct,
                  -(tx0-cx)*st + (ty1-cy)*ct, -(tx1-cx)*st + (ty1-cy)*ct) < hh
        AND greatest(-(tx0-cx)*st + (ty0-cy)*ct, -(tx1-cx)*st + (ty0-cy)*ct,
                     -(tx0-cx)*st + (ty1-cy)*ct, -(tx1-cx)*st + (ty1-cy)*ct) > -hh
    ),
    pix AS (SELECT CAST(i AS DOUBLE) + 0.5 AS o, i FROM UNNEST(generate_series(0, {px - 1})) AS t(i)),
    hits AS (
      SELECT DISTINCT o.tile_id, px_.i AS pi, py_.i AS pj
      FROM ov o, pix px_, pix py_
      WHERE abs(((o.tx0 + px_.o * {sx!r}) - o.cx) * o.ct
              + ((o.ty0 + py_.o * {sy!r}) - o.cy) * o.st) < o.hw
        AND abs(-((o.tx0 + px_.o * {sx!r}) - o.cx) * o.st
              + ((o.ty0 + py_.o * {sy!r}) - o.cy) * o.ct) < o.hh
    )
    SELECT t.tile_id,
           COALESCE(h.covered, 0.0) / {float(px * px)!r} AS coverage_fraction
    FROM (SELECT DISTINCT tile_id FROM ov) t
    LEFT JOIN (
      SELECT tile_id, CAST(COUNT(*) AS DOUBLE) AS covered FROM hits GROUP BY tile_id
    ) h USING (tile_id)
"""


Q_TILE_COVERAGE_SQL = _build_tile_coverage_sql()


FPM_N = 1000


def q_footprint_metrics(sf_dir: str):
    """Per-feature geometry metrics: the exact shoelace area of every
    image's rotated quad footprint, computed by the engine's
    vectorized multipolygon-area kernel (arrow_mp_areas — reduceat
    layout with scalar-loop bit parity) straight off the Arrow
    geometry column.  Value-exact the hard way: the oracle inlines
    the quad parameters and replays the IDENTICAL float op sequence
    (corner derivation, per-edge cross terms, left-to-right ring sum,
    abs/2) in SQL — no rounding, the doubles must agree bit-for-bit."""
    from ..sources.arrow_geom import arrow_mp_areas
    from ..sources.images import read_synth_images
    from ..stages.footprint import derive_footprints, image_index

    ds = read_synth_images(FPM_N)
    ds = ds.map_batches(derive_footprints, batch_format="pyarrow")

    def metrics(b: pa.Table) -> pa.Table:
        idx = image_index(b).astype(np.int64)
        areas = arrow_mp_areas(b["footprint"])
        return pa.table(
            {
                "img_idx": pa.array(idx, pa.int64()),
                "area": pa.array(areas, pa.float64()),
            }
        )

    return ds.map_batches(metrics, batch_format="pyarrow")


def _build_footprint_metrics_sql(n_images: int = FPM_N) -> str:
    """SQL mirror of q_footprint_metrics: corners from the inlined
    quad params with the engine's exact float op order
    ((cx + dx·ct) − dy·st …), per-edge cross terms, left-to-right ring
    sum, abs/2.

    Literals are inlined as mantissa × 2^exponent (both exact in
    DOUBLE arithmetic): unlike the integer-output quad oracles, this
    one emits RAW doubles, and DuckDB's decimal→double parse is off
    by one ulp for ~10% of shortest-repr literals — enough to flip the
    hash even though every float op matches."""
    import math

    from ..stages.footprint import footprint_params

    def dlit(x: float) -> str:
        m, e = math.frexp(float(x))
        mi = int(m * (1 << 53))
        return f"(CAST({mi} AS DOUBLE) * pow(2.0, {e - 53}))"

    cx, cy, ct, st, hw, hh = footprint_params(np.arange(n_images, dtype=np.int64))
    rows = ",\n      ".join(
        f"(CAST({i} AS BIGINT), {dlit(cx[i])}, {dlit(cy[i])}, "
        f"{dlit(ct[i])}, {dlit(st[i])}, {dlit(hw[i])}, {dlit(hh[i])})"
        for i in range(n_images)
    )
    # corner k: dx, dy signs in ring order (CCW)
    signs = [(-1, -1), (1, -1), (1, 1), (-1, 1), (-1, -1)]
    xs, ys = [], []
    for sx_, sy_ in signs:
        dx = f"({'-' if sx_ < 0 else ''}hw)"
        dy = f"({'-' if sy_ < 0 else ''}hh)"
        xs.append(f"((cx + ({dx} * ct)) - ({dy} * st))")
        ys.append(f"((cy + ({dx} * st)) + ({dy} * ct))")
    cross = [
        f"(({xs[k]} * {ys[k + 1]}) - ({xs[k + 1]} * {ys[k]}))" for k in range(4)
    ]
    ring_sum = f"((({cross[0]} + {cross[1]}) + {cross[2]}) + {cross[3]})"
    return f"""
    WITH q(img_idx, cx, cy, ct, st, hw, hh) AS (VALUES
      {rows}
    )
    SELECT img_idx, abs({ring_sum}) / 2.0 AS area FROM q
"""


Q_FOOTPRINT_METRICS_SQL = _build_footprint_metrics_sql()


MOSAIC_N = 1500


def q_tile_mosaic(sf_dir: str):
    """Best-image-per-tile mosaic selection — the geospatial×image
    synthesis op: which of the overlapping scenes should render each
    map tile?  Pipeline: synth images → quad footprints → REAL decode
    + quality scoring with in-stage shed (rejected payloads never
    reach the exchange; the bbox columns ride through the decode
    stage) → bbox tile cover at res 4 → per-tile argmax of
    (bright_sum, img_idx) via the compaction combiner, so each block
    contributes ≤ one candidate row per tile to the single shuffle.
    Value-exact: the oracle inlines the generator-side quad params +
    quality stats as literals and mirrors the grid cover, Morton tile
    ids and the argmax (ROW_NUMBER) in SQL."""
    from ..sources.images import read_synth_images
    from ..stages.cells import explode_to_cells
    from ..stages.compact import latest_by_key
    from ..stages.footprint import derive_footprints, image_index
    from ..stages.image_ops import DecodeQuality

    ds = read_synth_images(MOSAIC_N)
    ds = ds.map_batches(derive_footprints, batch_format="pyarrow")
    ds = ds.map_batches(
        DecodeQuality(keep_cols=("minx", "miny", "maxx", "maxy")),
        batch_format="pyarrow",
        batch_size=256,
    )

    def assign(b: pa.Table) -> pa.Table:
        t = explode_to_cells(b, 4, cell_col="tile_id")
        idx = image_index(t).astype(np.int64)
        return pa.table(
            {
                "tile_id": t["tile_id"],
                "img_idx": pa.array(idx, pa.int64()),
                "bright_sum": t["bright_sum"],
            }
        )

    ds = ds.map_batches(assign, batch_format="pyarrow")
    return latest_by_key(ds, "tile_id", ("bright_sum", "img_idx"))


def _build_tile_mosaic_sql(n_images: int = MOSAIC_N, tile_res: int = 4) -> str:
    """SQL mirror of q_tile_mosaic: quad params + PASSING quality
    stats from the generator math (never engine output), the same
    integer grid-cover + Morton arithmetic as the tile_coverage
    oracle, then ROW_NUMBER argmax per tile."""
    assert tile_res == 4, "Morton spread below is written for 4-bit indices"
    from ..sources.images import expected_quality_stats
    from ..stages.footprint import footprint_params

    stats = expected_quality_stats(n_images)
    idxs = [int(s[4:]) for s in stats["image_id"].to_pylist()]
    bright = stats["bright_sum"].to_pylist()
    cx, cy, ct, st, hw, hh = footprint_params(np.arange(n_images, dtype=np.int64))
    rows = ",\n      ".join(
        f"(CAST({i} AS BIGINT), {cx[i]!r}::DOUBLE, {cy[i]!r}::DOUBLE, "
        f"{ct[i]!r}::DOUBLE, {st[i]!r}::DOUBLE, {hw[i]!r}::DOUBLE, "
        f"{hh[i]!r}::DOUBLE, CAST({b} AS BIGINT))"
        for i, b in zip(idxs, bright)
    )
    n_side = 2**tile_res

    def gidx(expr: str, lo: float, span: float) -> str:
        return (
            f"least(CAST(floor(greatest((({expr}) - {lo!r}) / {span!r}, 0.0)"
            f" * {float(n_side)!r}) AS BIGINT), {n_side - 1})"
        )

    def spread(v: str) -> str:
        return f"(({v} & 1) | (({v} & 2) << 1) | (({v} & 4) << 2) | (({v} & 8) << 3))"

    return f"""
    WITH q(idx, cx, cy, ct, st, hw, hh, bright) AS (VALUES
      {rows}
    ),
    qb AS (
      SELECT *, abs(ct) * hw + abs(st) * hh AS ex,
                abs(st) * hw + abs(ct) * hh AS ey
      FROM q
    ),
    g AS (
      SELECT *,
             {gidx("cx - ex", -180.0, 360.0)} AS ix0,
             {gidx("cx + ex", -180.0, 360.0)} AS ix1,
             {gidx("cy - ey", -90.0, 180.0)} AS iy0,
             {gidx("cy + ey", -90.0, 180.0)} AS iy1
      FROM qb
    ),
    pairs AS (
      SELECT g.*, tx.ix, ty.iy
      FROM g, UNNEST(generate_series(ix0, ix1)) AS tx(ix),
              UNNEST(generate_series(iy0, iy1)) AS ty(iy)
    ),
    tiles AS (
      SELECT idx, bright,
             (CAST({tile_res} AS BIGINT) << 58)
               | {spread("ix")} | ({spread("iy")} << 1) AS tile_id
      FROM pairs
    )
    SELECT tile_id, idx AS img_idx, bright AS bright_sum
    FROM tiles
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY tile_id ORDER BY bright DESC, idx DESC) = 1
"""


def q_revenue_by_nation(sf_dir: str):
    """Revenue per nation (TPC-H Q5 shape): lineitem ⋈ orders is the
    big⋈big shuffle join — revenue is pre-aggregated per orderkey INSIDE
    map_batches before the shuffle so the exchange moves one row per
    order, not one per lineitem; customer→nation is a broadcast lookup."""
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum

    from ..stages.join import broadcast_join, shuffle_hash_join

    def rev_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "l_orderkey": batch["l_orderkey"],
                "rev_c": pa.array(
                    _cents(
                        batch["l_extendedprice"].to_numpy()
                        * (1.0 - batch["l_discount"].to_numpy())
                    )
                ),
            }
        )
        agg = pa.TableGroupBy(t, "l_orderkey").aggregate([("rev_c", "sum")])
        return agg.rename_columns(["l_orderkey", "rev_c"])

    lineitem = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])
    # batch-local partial only — no per-orderkey shuffle aggregate; the
    # join's bucket shuffle co-locates the partials and the final
    # 25-group aggregate sums them (one less all-to-all)
    rev = lineitem.map_batches(rev_partial, batch_format="pyarrow")

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).map_batches(
        lambda b: b.rename_columns(["l_orderkey", "o_custkey"]),
        batch_format="pyarrow",
    )
    joined = shuffle_hash_join(
        rev, orders, key="l_orderkey", left_cols=["rev_c"], right_cols=["o_custkey"]
    )

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    cust = cust.rename_columns(["o_custkey", "c_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    nation = nation.rename_columns(["c_nationkey", "n_name"])

    with_nation = broadcast_join(joined, cust, "o_custkey", ["c_nationkey"])
    with_name = broadcast_join(with_nation, nation, "c_nationkey", ["n_name"])
    return with_name.groupby("n_name").aggregate(Sum("rev_c", alias_name="revenue_c"))


Q_REVENUE_BY_NATION_SQL = """
    SELECT n.n_name,
           CAST(SUM(l.rev_c) AS BIGINT) AS revenue_c
    FROM (
      SELECT l_orderkey,
             SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS rev_c
      FROM lineitem GROUP BY l_orderkey
    ) l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY n.n_name
"""


def q_order_priority(sf_dir: str):
    """Order-priority counts for orders having a heavy lineitem
    (TPC-H Q4 shape): the EXISTS side is distinct-reduced per batch,
    then one shuffle joins it to orders (semi-join)."""
    from ray.data.aggregate import Count, Sum

    from ..stages.join import shuffle_hash_join

    def keys_partial(batch: pa.Table) -> pa.Table:
        keys = batch["l_orderkey"].to_numpy()[batch["l_quantity"].to_numpy() > 45.0]
        uniq = np.unique(keys)
        return pa.table(
            {
                "o_orderkey": pa.array(uniq, pa.int64()),
                "dup": pa.array(np.ones(len(uniq), dtype=np.int64)),
            }
        )

    # batch-local unique only; global dedup happens inside the join's
    # buckets (distinct='right'), saving a separate distinct shuffle
    heavy = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"]).map_batches(
        keys_partial, batch_format="pyarrow"
    )

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    joined = shuffle_hash_join(
        orders,
        heavy,
        key="o_orderkey",
        left_cols=["o_orderpriority"],
        right_cols=["dup"],
        distinct="right",
    )
    return (
        joined.groupby("o_orderpriority")
        .aggregate(Count(alias_name="n_orders"))
        .select_columns(["o_orderpriority", "n_orders"])
    )


Q_ORDER_PRIORITY_SQL = """
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 45)
    GROUP BY o_orderpriority
"""


def _skyline_2d(price_c: np.ndarray, day: np.ndarray) -> np.ndarray:
    """Indices of the maximize-both Pareto frontier, tie-aware: a row
    survives iff no other row is ≥ in both dimensions and > in one
    (exact duplicates all survive).  O(n log n) vectorized: sort by
    (price desc, day desc); within each equal-price group only the
    max-day rows can survive, and they do iff that day beats every
    higher-price group's best day."""
    order = np.lexsort((-day, -price_c))
    p = price_c[order]
    d = day[order]
    grp_start = np.concatenate(([True], p[1:] != p[:-1]))
    grp_id = np.cumsum(grp_start) - 1
    dmax_group = d[grp_start][grp_id]
    run = np.maximum.accumulate(d[grp_start])
    best_before = np.concatenate(([np.iinfo(np.int64).min], run[:-1]))[grp_id]
    survive = (d == dmax_group) & (dmax_group > best_before)
    return order[survive]


def q_skyline(sf_dir: str):
    """Distributed 2-D skyline: URGENT orders on the (price, recency)
    Pareto frontier — "no other order is both pricier and newer".
    Skyline-of-skylines is the global skyline (domination is
    transitive across blocks), so each block reduces to its local
    frontier first and ONE tiny final pass merges the survivors —
    never an all-pairs comparison on the engine side.  Integer cents
    and epoch days keep the comparisons and the hash exact."""
    import ray.data as rd

    def prep(b: pa.Table) -> pa.Table:
        keep = pc.equal(b["o_orderpriority"], "1-URGENT")
        k = b.filter(keep)
        day = (
            k["o_orderdate"].to_numpy().astype("datetime64[D]").astype(np.int64)
        )
        return pa.table(
            {
                "o_orderkey": k["o_orderkey"],
                "price_c": pa.array(_cents(k["o_totalprice"].to_numpy())),
                "day": pa.array(day, pa.int64()),
            }
        )

    def local_skyline(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        idx = _skyline_2d(b["price_c"].to_numpy(), b["day"].to_numpy())
        return b.take(pa.array(np.sort(idx)))

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_totalprice", "o_orderdate"])
    partial = ds.map_batches(prep, batch_format="pyarrow").map_batches(
        local_skyline, batch_format="pyarrow"
    )
    # batch_size=None pinned explicitly: the final merge is only
    # correct if the whole repartition(1) block arrives as ONE batch
    # (a bounded default would compute the frontier per-chunk and leak
    # false survivors silently)
    return partial.repartition(1).map_batches(
        local_skyline, batch_format="pyarrow", batch_size=None
    )


Q_SKYLINE_SQL = """
    WITH o AS (
      SELECT o_orderkey,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_c,
             CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day
      FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    SELECT q.o_orderkey, q.price_c, q.day FROM o q
    WHERE NOT EXISTS (
      SELECT 1 FROM o p
      WHERE p.price_c >= q.price_c AND p.day >= q.day
        AND (p.price_c > q.price_c OR p.day > q.day))
"""


HQ_BIN_W = 2500.0  # cents-free: o_totalprice in dollars, 256 bins to 640k


def q_quantile_sketch(sf_dir: str):
    """Approximate per-group quantiles with BOUNDED state: a fixed
    256-bin histogram sketch per order priority — ≤ groups×256 rows
    per block into one Sum exchange regardless of row count, the
    t-digest-shaped alternative to q_group_quantiles' exact value
    histogram (whose state grows with distinct values).  The estimate
    (bin lower edge at integer rank ceil(q·n)) is deterministic
    integer arithmetic, so the oracle mirrors the SKETCH exactly —
    the approximation is in the quantile definition, not the run."""
    from ray.data.aggregate import Sum

    from ..stages.sketch import hq_finalize_group, hq_partial

    def partial(b: pa.Table) -> pa.Table:
        return hq_partial(
            b, "o_orderpriority", b["o_totalprice"].to_numpy(), HQ_BIN_W
        )

    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])
    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["o_orderpriority", "bin"])
        .aggregate(Sum("n", alias_name="n"))
    )
    return merged.groupby("o_orderpriority").map_groups(
        lambda g: hq_finalize_group(g, "o_orderpriority", HQ_BIN_W),
        batch_format="pyarrow",
    )


Q_QUANTILE_SKETCH_SQL = f"""
    WITH b AS (
      SELECT o_orderpriority,
             least(CAST(floor(o_totalprice / {HQ_BIN_W!r}) AS BIGINT), 255) AS bin
      FROM orders
    ),
    h AS (SELECT o_orderpriority, bin, CAST(COUNT(*) AS BIGINT) AS n
          FROM b GROUP BY 1, 2),
    c AS (
      SELECT o_orderpriority, bin, n,
             SUM(n) OVER (PARTITION BY o_orderpriority ORDER BY bin
                          ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(n) OVER (PARTITION BY o_orderpriority) AS n_tot
      FROM h
    )
    SELECT o_orderpriority,
           CAST(MIN(CASE WHEN cum >= (1 * n_tot + 1) // 2
                         THEN bin * {int(HQ_BIN_W)} END) AS BIGINT) AS p50_lo,
           CAST(MIN(CASE WHEN cum >= (9 * n_tot + 9) // 10
                         THEN bin * {int(HQ_BIN_W)} END) AS BIGINT) AS p90_lo,
           CAST(MIN(n_tot) AS BIGINT) AS n_tot
    FROM c GROUP BY o_orderpriority
"""


def q_retention(sf_dir: str):
    """Cohort retention: users grouped by first-activity week, counted
    as retained in each later week they act — the (cohort, offset)
    matrix every growth dashboard is built on.  Plan: block-local
    distinct (user, week) pairs, ONE user-BUCKETED shuffle (not one
    Python group call per user) whose kernel dedupes and derives
    every user's cohort + offsets in a single lexsort pass, then a
    small (cohort, offset) count (pairs are already distinct)."""
    from ray.data.aggregate import Sum

    WEEK_US = 7 * 24 * 3600 * 1_000_000
    N_BUCKETS = 64

    def weeks(b: pa.Table) -> pa.Table:
        from ..stages.footprint import _splitmix64

        ts = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        t = pa.table(
            {
                "user_id": b["user_id"],
                "week": pa.array(ts // WEEK_US, pa.int64()),
            }
        )
        # block-local distinct (user, week) pairs
        uniq = pa.TableGroupBy(t, ["user_id", "week"]).aggregate([])
        u = uniq["user_id"].to_numpy().astype(np.uint64)
        return uniq.append_column(
            "bucket",
            pa.array((_splitmix64(u) % np.uint64(N_BUCKETS)).astype(np.int64)),
        )

    def cohort_bucket(group: pa.Table) -> pa.Table:
        u = group["user_id"].to_numpy()
        w = group["week"].to_numpy()
        order = np.lexsort((w, u))
        u, w = u[order], w[order]
        # global dedupe of (user, week) — block-local distincts overlap
        keep = np.concatenate(([True], (u[1:] != u[:-1]) | (w[1:] != w[:-1])))
        u, w = u[keep], w[keep]
        seg = np.concatenate(([True], u[1:] != u[:-1]))
        cohort = w[np.flatnonzero(seg)][np.cumsum(seg) - 1]
        return pa.table(
            {
                "cohort_week": pa.array(cohort, pa.int64()),
                "offset_w": pa.array(w - cohort, pa.int64()),
            }
        )

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    pairs = (
        ds.map_batches(weeks, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(cohort_bucket, batch_format="pyarrow")
    )

    def count_partial(b: pa.Table) -> pa.Table:
        agg = pa.TableGroupBy(b, ["cohort_week", "offset_w"]).aggregate(
            [([], "count_all")]
        )
        return agg.rename_columns(["cohort_week", "offset_w", "n_users"])

    return (
        pairs.map_batches(count_partial, batch_format="pyarrow")
        .groupby(["cohort_week", "offset_w"])
        .aggregate(Sum("n_users", alias_name="n_users"))
    )


Q_RETENTION_SQL = """
    WITH a AS (
      SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS week
      FROM events
    ),
    c AS (SELECT user_id, MIN(week) AS cohort_week FROM a GROUP BY user_id)
    SELECT c.cohort_week, a.week - c.cohort_week AS offset_w,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM a JOIN c USING (user_id)
    GROUP BY 1, 2
"""


COOC_TOP = 30


def q_basket_pairs(sf_dir: str):
    """Market-basket co-occurrence: the top part pairs appearing in
    the same order — the classic recommendation/association pre-pass.
    Baskets are co-located by hash BUCKET (64 buckets, not one Python
    group call per order — at sf0.1 that was 150k calls and 12× the
    runtime); the per-bucket kernel dedupes (order, part) rows with
    one lexsort and fans out every basket's ordered pairs in ≤
    max_basket² vectorized passes.  A per-bucket combiner pre-counts
    pairs (packed into ONE int64 key), a second PAIR-bucketed shuffle
    merges with a C-speed sort+reduceat kernel (totals are global — a
    pair's instances all share a pbucket) and forwards only each
    bucket's top-k into the bounded final sort."""
    N_BUCKETS = 64

    def bucket(b: pa.Table) -> pa.Table:
        ok = b["l_orderkey"].to_numpy().astype(np.uint64)
        h = ((ok % np.uint64(4294967296)) * np.uint64(2654435761)) % np.uint64(
            4294967296
        )
        return pa.table(
            {
                "l_orderkey": b["l_orderkey"],
                "l_partkey": b["l_partkey"],
                "bucket": pa.array((h % N_BUCKETS).astype(np.int64)),
            }
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ok = group["l_orderkey"].to_numpy()
        pk = group["l_partkey"].to_numpy()
        order = np.lexsort((pk, ok))
        ok, pk = ok[order], pk[order]
        keep = np.concatenate(
            ([True], (ok[1:] != ok[:-1]) | (pk[1:] != pk[:-1]))
        )
        ok, pk = ok[keep], pk[keep]
        # shared O(max_basket)-pass fan-out (scale-shape rule: never
        # the nested O(max_basket²) offset loop — hot baskets stall it)
        a_arr, b_arr = triu_pairs_in_runs(ok, pk)
        if len(a_arr) == 0:
            return pa.schema(
                [pa.field("pair_key", pa.int64()), pa.field("n", pa.int64())]
            ).empty_table()
        # pack the pair into ONE int64 (partkeys < 2^31): Ray's sort
        # aggregate over a single int column is far faster than the
        # two-column key path, which dominated this query's wall time
        key = (a_arr.astype(np.uint64) << np.uint64(32)) | b_arr.astype(
            np.uint64
        )
        t = pa.table({"pair_key": pa.array(key.view(np.int64))})
        agg = pa.TableGroupBy(t, "pair_key").aggregate([([], "count_all")])
        agg = agg.rename_columns(["pair_key", "n"])
        pk2 = agg["pair_key"].to_numpy().astype(np.uint64)
        h = ((pk2 % np.uint64(4294967296)) ^ (pk2 >> np.uint64(32))) % np.uint64(
            N_BUCKETS
        )
        return agg.append_column("pbucket", pa.array(h.astype(np.int64)))

    def merge_topk(group: pa.Table) -> pa.Table:
        # vectorized per-bucket merge: every instance of a pair lands
        # in the same pbucket, so reduceat totals here are GLOBAL
        # totals; each bucket then only forwards its top-k.  (Ray's
        # generic Aggregate on ~1M distinct keys cost ~170 CPU-seconds
        # at sf0.1 — this sort+reduceat merge is the same shuffle with
        # a C-speed combine.)
        key = group["pair_key"].to_numpy()
        n = group["n"].to_numpy()
        order = np.argsort(key, kind="stable")
        key, n = key[order], n[order]
        starts = np.concatenate(([0], np.flatnonzero(key[1:] != key[:-1]) + 1))
        totals = np.add.reduceat(n, starts)
        ukey = key[starts]
        # top-k by (n desc, key asc): key's major half is pa_
        top = np.lexsort((ukey, -totals))[:COOC_TOP]
        k = ukey[top].view(np.uint64)
        return pa.table(
            {
                "pa_": pa.array((k >> np.uint64(32)).astype(np.int64)),
                "pb_": pa.array((k & np.uint64(0xFFFFFFFF)).astype(np.int64)),
                "n": pa.array(totals[top].astype(np.int64)),
            }
        )

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    return (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pyarrow")
        .groupby("pbucket")
        .map_groups(merge_topk, batch_format="pyarrow")
        .sort(["n", "pa_", "pb_"], descending=[True, False, False])
        .limit(COOC_TOP)
    )


Q_BASKET_PAIRS_SQL = f"""
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    p AS (
      SELECT a.l_partkey AS pa_, b.l_partkey AS pb_,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    )
    SELECT pa_, pb_, n FROM p
    ORDER BY n DESC, pa_, pb_ LIMIT {COOC_TOP}
"""


def q_group_regression(sf_dir: str):
    """Per-group least-squares trend (value vs time) from exact
    integer moments: each block folds to (n, Σx, Σy, Σxy, Σx²) per
    event type — the five-scalar state that makes distributed
    regression a pure Sum-shuffle.  The slope is reported as the
    exact integer fraction (n·Σxy − Σx·Σy) / (n·Σx² − Σx²-bar):
    no division ever happens, so the result is hash-exact.  x = hours
    since the 2024 epoch (small ints keep every moment in int64)."""
    from ray.data.aggregate import Sum

    def moments(b: pa.Table) -> pa.Table:
        ts = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        x = (ts - _EPOCH_2024_US) // 3_600_000_000
        y = _cents(b["value"].to_numpy())
        t = pa.table(
            {
                "event_type": b["event_type"],
                "n": pa.array(np.ones(len(x), dtype=np.int64)),
                "sx": pa.array(x),
                "sy": pa.array(y),
                "sxy": pa.array(x * y),
                "sxx": pa.array(x * x),
            }
        )
        agg = pa.TableGroupBy(t, "event_type").aggregate(
            [("n", "sum"), ("sx", "sum"), ("sy", "sum"), ("sxy", "sum"), ("sxx", "sum")]
        )
        return agg.rename_columns(["event_type", "n", "sx", "sy", "sxy", "sxx"])

    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])
    merged = (
        ds.map_batches(moments, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sx", alias_name="sx"),
            Sum("sy", alias_name="sy"),
            Sum("sxy", alias_name="sxy"),
            Sum("sxx", alias_name="sxx"),
        )
    )

    def finish(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy()
        sx = b["sx"].to_numpy()
        sy = b["sy"].to_numpy()
        sxy = b["sxy"].to_numpy()
        sxx = b["sxx"].to_numpy()
        return pa.table(
            {
                "event_type": b["event_type"],
                "n": pa.array(n),
                "slope_num": pa.array(n * sxy - sx * sy),
                "slope_den": pa.array(n * sxx - sx * sx),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")


Q_GROUP_REGRESSION_SQL = f"""
    WITH m AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM (
        SELECT event_type,
               (epoch_us(ts) - {_EPOCH_2024_US}) // 3600000000 AS x,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS y
        FROM events
      )
      GROUP BY event_type
    )
    SELECT event_type, n,
           CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
           CAST(n * sxx - sx * sx AS BIGINT) AS slope_den
    FROM m
"""


PR_BASE = 150_000  # (1-d)·10^6 with d=0.85, in integer micro-units
PR_ROUNDS = 2


def q_pagerank(sf_dir: str):
    """Integer PageRank (2 rounds, d=0.85) over the symmetric
    document-similarity graph — the iterative weighted-propagation
    primitive, made hash-exact by doing EVERYTHING in integer
    micro-units: score₀ = 10⁶, each round score(u) = 150000 +
    Σ_in floor(floor(score_v / deg_v) · 17 / 20).  Per round: one
    bucketed shuffle joins scores to out-edges, one node-bucketed
    vectorized reduceat sums the contributions — the same exchange
    shape as connected_components, scores never touch the driver."""
    from ..stages.footprint import _splitmix64
    from ..stages.join import shuffle_hash_join

    N_BUCKETS = 64

    # deterministic edges: the consecutive-doc chains used by
    # dedup_components (both relations).  PageRank is multiplicity-
    # sensitive (degrees!), so the two relations' edge sets are
    # DEDUPED (bucketed unique over the packed pair key — the SQL
    # mirror's UNION does the same) before symmetrizing.
    comps_edges = _dedup_edge_union(sf_dir)

    def pack_bucket(b: pa.Table) -> pa.Table:
        key = (b["doc_a"].to_numpy().astype(np.uint64) << np.uint64(32)) | b[
            "doc_b"
        ].to_numpy().astype(np.uint64)
        h = _splitmix64(key) % np.uint64(N_BUCKETS)
        return pa.table(
            {
                "edge_key": pa.array(key.view(np.int64)),
                "bucket": pa.array(h.astype(np.int64)),
            }
        )

    def uniq_sym(group: pa.Table) -> pa.Table:
        key = np.unique(group["edge_key"].to_numpy()).view(np.uint64)
        a = (key >> np.uint64(32)).astype(np.int64)
        c = (key & np.uint64(0xFFFFFFFF)).astype(np.int64)
        return pa.table(
            {
                "src": pa.array(np.concatenate((a, c))),
                "dst": pa.array(np.concatenate((c, a))),
            }
        )

    edges = (
        comps_edges.map_batches(pack_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(uniq_sym, batch_format="pyarrow")
        .materialize()
    )
    import ray.data as rd

    # per-round bucket/task count scales with the graph (see
    # connected_components): each bucket is a task per round
    nb = int(min(64, max(2, edges.count() // 65536)))
    edges = rd.from_arrow_refs(edges.repartition(nb).materialize().to_arrow_refs())

    def src_bucket(b: pa.Table) -> pa.Table:
        h = _splitmix64(b["src"].to_numpy().astype(np.uint64)) % np.uint64(nb)
        return b.append_column("bucket", pa.array(h.astype(np.int64)))

    def degrees(group: pa.Table) -> pa.Table:
        s = np.sort(group["src"].to_numpy())
        starts = np.concatenate(([0], np.flatnonzero(s[1:] != s[:-1]) + 1))
        return pa.table(
            {
                "src": pa.array(s[starts], pa.int64()),
                "deg": pa.array(
                    np.diff(np.concatenate((starts, [len(s)]))).astype(np.int64)
                ),
            }
        )

    deg = (
        edges.map_batches(src_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(degrees, batch_format="pyarrow")
        .materialize()
    )

    i64 = pa.int64()
    scores = deg.map_batches(
        lambda b: pa.table(
            {"src": b["src"], "score": pa.array(np.full(b.num_rows, 1_000_000, dtype=np.int64))}
        ),
        batch_format="pyarrow",
    ).materialize()

    edge_schema = pa.schema([("src", i64), ("dst", i64)])
    sd_schema = pa.schema([("src", i64), ("score", i64), ("deg", i64)])

    for _ in range(PR_ROUNDS):
        sd = shuffle_hash_join(
            scores,
            deg,
            "src",
            ["score"],
            ["deg"],
            n_buckets=nb,
            left_schema=pa.schema([("src", i64), ("score", i64)]),
            right_schema=pa.schema([("src", i64), ("deg", i64)]),
        )
        flowed = shuffle_hash_join(
            rd.from_arrow_refs(edges.to_arrow_refs()),
            sd,
            "src",
            ["dst"],
            ["score", "deg"],
            n_buckets=nb,
            left_schema=edge_schema,
            right_schema=sd_schema,
        )

        def contrib(b: pa.Table) -> pa.Table:
            sc = b["score"].to_numpy()
            dg = b["deg"].to_numpy()
            c = ((sc // dg) * 17) // 20
            h = _splitmix64(b["dst"].to_numpy().astype(np.uint64)) % np.uint64(nb)
            return pa.table(
                {
                    "node": b["dst"],
                    "c": pa.array(c.astype(np.int64)),
                    "bucket": pa.array(h.astype(np.int64)),
                }
            )

        def fold(group: pa.Table) -> pa.Table:
            n = group["node"].to_numpy()
            c = group["c"].to_numpy()
            order = np.argsort(n, kind="stable")
            n, c = n[order], c[order]
            starts = np.concatenate(([0], np.flatnonzero(n[1:] != n[:-1]) + 1))
            return pa.table(
                {
                    "src": pa.array(n[starts], pa.int64()),
                    "score": pa.array(
                        PR_BASE + np.add.reduceat(c, starts).astype(np.int64)
                    ),
                }
            )

        scores = (
            flowed.map_batches(contrib, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(fold, batch_format="pyarrow")
            .materialize()
        )
        scores = rd.from_arrow_refs(scores.to_arrow_refs())

    return scores.map_batches(
        lambda b: pa.table({"doc_id": b["src"], "score": b["score"]}),
        batch_format="pyarrow",
    )


def _build_pagerank_sql() -> str:
    # two unrolled integer rounds over the same symmetric edge set the
    # components oracle derives
    return f"""
    WITH s AS (
      SELECT doc_id, lang, source, n_chars,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ),
    e1 AS (
      SELECT lag(doc_id) OVER (PARTITION BY lang, n_tokens ORDER BY doc_id) AS a,
             doc_id AS b
      FROM s
    ),
    e2 AS (
      SELECT lag(doc_id) OVER (PARTITION BY source, n_chars % 10 ORDER BY doc_id) AS a,
             doc_id AS b
      FROM s
    ),
    edges AS (
      SELECT a, b FROM e1 WHERE a IS NOT NULL
      UNION
      SELECT a, b FROM e2 WHERE a IS NOT NULL
    ),
    sym AS (SELECT a AS src, b AS dst FROM edges UNION ALL SELECT b, a FROM edges),
    deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM sym GROUP BY src),
    s0 AS (SELECT src, CAST(1000000 AS BIGINT) AS score FROM deg),
    s1 AS (
      SELECT sym.dst AS src,
             {PR_BASE} + CAST(SUM(((s0.score // deg.deg) * 17) // 20) AS BIGINT)
               AS score
      FROM sym JOIN s0 ON s0.src = sym.src JOIN deg ON deg.src = sym.src
      GROUP BY sym.dst
    ),
    s2 AS (
      SELECT sym.dst AS src,
             {PR_BASE} + CAST(SUM(((s1.score // deg.deg) * 17) // 20) AS BIGINT)
               AS score
      FROM sym JOIN s1 ON s1.src = sym.src JOIN deg ON deg.src = sym.src
      GROUP BY sym.dst
    )
    SELECT src AS doc_id, score FROM s2
"""


Q_PAGERANK_SQL = _build_pagerank_sql()


BFS_ROUNDS = 4


def q_bfs_depth(sf_dir: str):
    """Multi-source BFS: hop distance (≤ 4) from the seed set
    (doc_id % 50 == 0) over the deduped symmetric similarity graph —
    the blast-radius / influence-frontier primitive.  Min-plus label
    propagation with the components' exchange shape: per round, one
    bucketed join flows dist+1 along out-edges and one node-bucketed
    vectorized min folds; only reached nodes materialize.  Exact by
    construction (4 full rounds ≡ 4-hop closure) and mirrored by a
    depth-bounded recursive CTE."""
    import ray.data as rd

    from ..stages.footprint import _splitmix64
    from ..stages.join import shuffle_hash_join

    N_BUCKETS = 64
    comps_edges = _dedup_edge_union(sf_dir)

    def pack_bucket(b: pa.Table) -> pa.Table:
        key = (b["doc_a"].to_numpy().astype(np.uint64) << np.uint64(32)) | b[
            "doc_b"
        ].to_numpy().astype(np.uint64)
        h = _splitmix64(key) % np.uint64(N_BUCKETS)
        return pa.table(
            {
                "edge_key": pa.array(key.view(np.int64)),
                "bucket": pa.array(h.astype(np.int64)),
            }
        )

    def uniq_sym(group: pa.Table) -> pa.Table:
        key = np.unique(group["edge_key"].to_numpy()).view(np.uint64)
        a = (key >> np.uint64(32)).astype(np.int64)
        c = (key & np.uint64(0xFFFFFFFF)).astype(np.int64)
        return pa.table(
            {
                "src": pa.array(np.concatenate((a, c))),
                "dst": pa.array(np.concatenate((c, a))),
            }
        )

    edges = (
        comps_edges.map_batches(pack_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(uniq_sym, batch_format="pyarrow")
        .materialize()
    )
    # per-round bucket/task count scales with the graph (as
    # connected_components does): every bucket is a task per round, so
    # a tiny graph at 64 buckets pays ~200 near-empty tasks per round
    nb = int(min(64, max(2, edges.count() // 65536)))
    edges = rd.from_arrow_refs(edges.repartition(nb).materialize().to_arrow_refs())

    def node_bucket(b: pa.Table, col: str) -> pa.Table:
        h = _splitmix64(b[col].to_numpy().astype(np.uint64)) % np.uint64(nb)
        return b.append_column("bucket", pa.array(h.astype(np.int64)))

    def min_fold(group: pa.Table) -> pa.Table:
        n = group["src"].to_numpy()
        d = group["dist"].to_numpy()
        order = np.lexsort((d, n))
        n, d = n[order], d[order]
        starts = np.concatenate(([0], np.flatnonzero(n[1:] != n[:-1]) + 1))
        return pa.table(
            {
                "src": pa.array(n[starts], pa.int64()),
                "dist": pa.array(d[starts], pa.int64()),
            }
        )

    def seed_rows(b: pa.Table) -> pa.Table:
        s = np.unique(b["src"].to_numpy())
        s = s[s % 50 == 0]
        return pa.table(
            {
                "src": pa.array(s, pa.int64()),
                "dist": pa.array(np.zeros(len(s), dtype=np.int64)),
            }
        )

    labels = (
        edges.map_batches(seed_rows, batch_format="pyarrow")
        .map_batches(lambda b: node_bucket(b, "src"), batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(min_fold, batch_format="pyarrow")
        .materialize()
    )
    labels = rd.from_arrow_refs(labels.to_arrow_refs())

    i64 = pa.int64()
    for _ in range(BFS_ROUNDS):
        flowed = shuffle_hash_join(
            rd.from_arrow_refs(edges.to_arrow_refs()),
            labels,
            "src",
            ["dst"],
            ["dist"],
            n_buckets=nb,
            left_schema=pa.schema([("src", i64), ("dst", i64)]),
            right_schema=pa.schema([("src", i64), ("dist", i64)]),
        ).map_batches(
            lambda b: pa.table(
                {
                    "src": b["dst"],
                    "dist": pa.array(
                        b["dist"].to_numpy(zero_copy_only=False) + 1, pa.int64()
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        labels = (
            labels.union(flowed)
            .map_batches(lambda b: node_bucket(b, "src"), batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(min_fold, batch_format="pyarrow")
            .materialize()
        )
        labels = rd.from_arrow_refs(labels.to_arrow_refs())

    return labels.map_batches(
        lambda b: pa.table({"doc_id": b["src"], "dist": b["dist"]}),
        batch_format="pyarrow",
    )


Q_BFS_DEPTH_SQL = f"""
    WITH RECURSIVE s AS (
      SELECT doc_id, lang, source, n_chars,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ),
    e1 AS (
      SELECT lag(doc_id) OVER (PARTITION BY lang, n_tokens ORDER BY doc_id) AS a,
             doc_id AS b
      FROM s
    ),
    e2 AS (
      SELECT lag(doc_id) OVER (PARTITION BY source, n_chars % 10 ORDER BY doc_id) AS a,
             doc_id AS b
      FROM s
    ),
    edges AS (
      SELECT a, b FROM e1 WHERE a IS NOT NULL
      UNION
      SELECT a, b FROM e2 WHERE a IS NOT NULL
    ),
    sym AS (SELECT a AS src, b AS dst FROM edges UNION ALL SELECT b, a FROM edges),
    r(node, d) AS (
      SELECT DISTINCT src, 0 FROM sym WHERE src % 50 = 0
      UNION
      SELECT sym.dst, r.d + 1 FROM r JOIN sym ON sym.src = r.node
      WHERE r.d < {BFS_ROUNDS}
    )
    SELECT node AS doc_id, CAST(MIN(d) AS BIGINT) AS dist
    FROM r GROUP BY node
"""


def triu_pairs_in_runs(group_keys: np.ndarray, values: np.ndarray):
    """All ordered (v, w) pairs (v<w) within runs of equal group_keys
    over SORTED, DEDUPED input.  One vectorized pass per FIRST-element
    offset (O(max_degree) passes, O(total pairs) work) — the nested
    O(max_degree²) mask loop stalls on skewed hubs/baskets with
    thousands of members.  Shared by triangles, word_pairs-style
    fan-outs and basket_pairs (the repo scale-shape rule)."""
    starts = np.concatenate(
        ([0], np.flatnonzero(group_keys[1:] != group_keys[:-1]) + 1)
    )
    lens = np.diff(np.concatenate((starts, [len(group_keys)])))
    out_a, out_b = [], []
    kmax = int(lens.max()) if len(lens) else 0
    for a in range(kmax - 1):
        m = lens > a + 1
        if not m.any():
            break
        nb = lens[m] - a - 1  # partners per run for this offset
        bstart = starts[m] + a + 1
        total = int(nb.sum())
        csum = np.concatenate(([0], np.cumsum(nb)[:-1]))
        idx = (
            np.arange(total, dtype=np.int64)
            - np.repeat(csum, nb)
            + np.repeat(bstart, nb)
        )
        out_b.append(values[idx])
        out_a.append(np.repeat(values[starts[m] + a], nb))
    if not out_a:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    return np.concatenate(out_a), np.concatenate(out_b)


def q_triangles(sf_dir: str):
    """Distributed triangle counting on the co-purchase graph (parts
    linked when bought in the same order) — the clustering-structure
    primitive of graph analytics.  Node-ordering orientation counts
    each triangle exactly once at its lowest vertex: edges orient
    low→high, hub-bucketed wedge fan-out emits (v, w) pairs of higher
    neighbors (one vectorized pass per neighbor offset), a broadcast
    BLOOM bitmap over the edge keys sheds the ~96% of wedges that
    cannot close BEFORE the exchange (per-bucket sentinel rows carry
    the true wedge totals, so the shed loses no information), and ONE
    tagged union + key-bucketed membership pass confirms closure
    exactly.  The raw edge list is never pulled to the driver — only
    the 2 MiB bitmap."""
    import ray
    from ray.data.aggregate import Sum

    from ..stages.footprint import _splitmix64
    from ..stages.join import bloom_might_contain, build_bloom

    N_BUCKETS = 64

    def bucket_orders(b: pa.Table) -> pa.Table:
        ok = b["l_orderkey"].to_numpy().astype(np.uint64)
        h = _splitmix64(ok) % np.uint64(N_BUCKETS)
        return pa.table(
            {
                "l_orderkey": b["l_orderkey"],
                "l_partkey": b["l_partkey"],
                "bucket": pa.array(h.astype(np.int64)),
            }
        )

    _triu_pairs = triu_pairs_in_runs  # module-level shared kernel

    def order_edges(group: pa.Table) -> pa.Table:
        # distinct sorted parts per order → oriented edges (a < b)
        ok = group["l_orderkey"].to_numpy()
        pk = group["l_partkey"].to_numpy()
        order = np.lexsort((pk, ok))
        ok, pk = ok[order], pk[order]
        keep = np.concatenate(([True], (ok[1:] != ok[:-1]) | (pk[1:] != pk[:-1])))
        ok, pk = ok[keep], pk[keep]
        a, b = _triu_pairs(ok, pk)
        # dedupe edges within the bucket (same pair from many orders)
        key = (a.astype(np.uint64) << np.uint64(32)) | b.astype(np.uint64)
        key = np.unique(key)
        h = _splitmix64(key) % np.uint64(N_BUCKETS)
        return pa.table(
            {
                "edge_key": pa.array(key.view(np.int64)),
                "ebucket": pa.array(h.astype(np.int64)),
            }
        )

    # edge list, globally deduped by key bucket (an edge may surface
    # from orders in different buckets)
    edges = (
        _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
        .map_batches(bucket_orders, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(order_edges, batch_format="pyarrow")
        .groupby("ebucket")
        .map_groups(
            lambda g: pa.table(
                {"edge_key": pa.array(np.unique(g["edge_key"].to_numpy()))}
            ),
            batch_format="pyarrow",
        )
    )

    def hub_bucket(b: pa.Table) -> pa.Table:
        k = b["edge_key"].to_numpy().view(np.uint64)
        hub = (k >> np.uint64(32)).astype(np.int64)
        h = _splitmix64(hub.astype(np.uint64)) % np.uint64(N_BUCKETS)
        return pa.table(
            {
                "hub": pa.array(hub),
                "nbr": pa.array((k & np.uint64(0xFFFFFFFF)).astype(np.int64)),
                "bucket": pa.array(h.astype(np.int64)),
            }
        )

    bloom_ref = ray.put(build_bloom(edges, "edge_key", n_bits=1 << 24))

    def wedges(group: pa.Table) -> pa.Table:
        hub = group["hub"].to_numpy()
        nbr = group["nbr"].to_numpy()
        order = np.lexsort((nbr, hub))
        v, w = _triu_pairs(hub[order], nbr[order])
        key = (v.astype(np.uint64) << np.uint64(32)) | w.astype(np.uint64)
        key, cnt = np.unique(key, return_counts=True)
        total = int(cnt.sum())
        # shed definite non-edges before the exchange; the sentinel
        # row (edge_key = -1, never a packed key) carries the bucket's
        # TRUE wedge total so the shed loses no information
        keep = bloom_might_contain(ray.get(bloom_ref), key)
        key, cnt = key[keep], cnt[keep]
        h = _splitmix64(key) % np.uint64(N_BUCKETS)
        n = len(key)
        return pa.table(
            {
                "edge_key": pa.array(
                    np.concatenate((key.view(np.int64), [-1]))
                ),
                "n_wedge": pa.array(
                    np.concatenate((cnt.astype(np.int64), [0]))
                ),
                "is_edge": pa.array(np.zeros(n + 1, dtype=np.int64)),
                "wedge_total": pa.array(
                    np.concatenate((np.zeros(n, dtype=np.int64), [total]))
                ),
                "kbucket": pa.array(
                    np.concatenate((h.astype(np.int64), [0]))
                ),
            }
        )

    wedge_ds = (
        edges.map_batches(hub_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(wedges, batch_format="pyarrow")
    )

    def edge_side(b: pa.Table) -> pa.Table:
        k = b["edge_key"].to_numpy()
        h = _splitmix64(k.view(np.uint64)) % np.uint64(N_BUCKETS)
        n = len(k)
        return pa.table(
            {
                "edge_key": b["edge_key"],
                "n_wedge": pa.array(np.zeros(n, dtype=np.int64)),
                "is_edge": pa.array(np.ones(n, dtype=np.int64)),
                "wedge_total": pa.array(np.zeros(n, dtype=np.int64)),
                "kbucket": pa.array(h.astype(np.int64)),
            }
        )

    def close_count(group: pa.Table) -> pa.Table:
        k = group["edge_key"].to_numpy()
        nw = group["n_wedge"].to_numpy()
        ie = group["is_edge"].to_numpy()
        order = np.argsort(k, kind="stable")
        k, nw, ie = k[order], nw[order], ie[order]
        starts = np.concatenate(([0], np.flatnonzero(k[1:] != k[:-1]) + 1))
        wedge_n = np.add.reduceat(nw, starts)
        has_edge = np.add.reduceat(ie, starts) > 0
        return pa.table(
            {
                "n_wedges": pa.array(
                    [int(group["wedge_total"].to_numpy().sum())], pa.int64()
                ),
                "n_triangles": pa.array(
                    [int(wedge_n[has_edge].sum())], pa.int64()
                ),
            }
        )

    both = wedge_ds.union(edges.map_batches(edge_side, batch_format="pyarrow"))
    totals = (
        both.groupby("kbucket")
        .map_groups(close_count, batch_format="pyarrow")
        .aggregate(
            Sum("n_wedges", alias_name="n_wedges"),
            Sum("n_triangles", alias_name="n_triangles"),
        )
    )  # global aggregate → one dict row on the driver (two scalars)
    return pa.table(
        {
            "n_wedges": pa.array([int(totals["n_wedges"])], pa.int64()),
            "n_triangles": pa.array([int(totals["n_triangles"])], pa.int64()),
        }
    )


Q_TRIANGLES_SQL = """
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    w AS (
      SELECT e1.v AS x, e2.v AS y
      FROM e e1 JOIN e e2 ON e1.u = e2.u AND e1.v < e2.v
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_wedges,
           CAST(SUM(CASE WHEN EXISTS (
             SELECT 1 FROM e WHERE e.u = w.x AND e.v = w.y)
             THEN 1 ELSE 0 END) AS BIGINT) AS n_triangles
    FROM w
"""


def q_revenue_share(sf_dir: str):
    """Percent-of-total (ratio-to-report): each event type's share of
    total event value in basis points.  The grand total is NOT a
    second pass over the data — it folds from the same 5-row
    aggregate the per-type sums come from (a bounded result the
    driver may hold), and integer basis points keep it hash-exact."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "event_type": b["event_type"],
                "value_c": pa.array(_cents(b["value"].to_numpy())),
            }
        )
        agg = pa.TableGroupBy(t, "event_type").aggregate([("value_c", "sum")])
        return agg.rename_columns(["event_type", "value_c"])

    ds = _read(sf_dir, "events", ["event_type", "value"])
    per_type = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("value_c", alias_name="value_c"))
    )
    t = pa.Table.from_pylist(per_type.take_all())  # ≤ n_event_types rows
    total = int(np.sum(t["value_c"].to_numpy()))
    share = (10_000 * t["value_c"].to_numpy()) // total
    return rd.from_arrow(
        pa.table(
            {
                "event_type": t["event_type"],
                "value_c": t["value_c"],
                "share_bp": pa.array(share.astype(np.int64)),
            }
        )
    )


Q_REVENUE_SHARE_SQL = """
    WITH t AS (
      SELECT event_type,
             CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS value_c
      FROM events GROUP BY event_type
    )
    SELECT event_type, value_c,
           CAST((10000 * value_c) // (SELECT SUM(value_c) FROM t) AS BIGINT)
             AS share_bp
    FROM t
"""


CAPQ_N = 2000


def q_caption_stats(sf_dir: str):
    """Cross-modal caption analysis: the text kernels (char counting,
    whitespace tokenization) run over the IMAGE table's caption
    column, grouped by caption subject — the text-quality profile of
    a vision-language corpus.  Per-batch combiner pre-aggregates per
    subject (≤ 5 rows per block into the Sum exchange).  Value-exact:
    the oracle reconstructs every caption from the generator's index
    arithmetic and word lists in SQL — no literals of engine output."""
    from ray.data.aggregate import Sum

    from ..sources.images import CAPTION_SUBJECTS, read_synth_image_meta
    from ..stages.footprint import image_index

    def partial(b: pa.Table) -> pa.Table:
        n_chars = pc.utf8_length(b["caption"]).to_numpy().astype(np.int64)
        n_tokens = (
            pc.list_value_length(pc.split_pattern(b["caption"], " "))
            .to_numpy()
            .astype(np.int64)
        )
        idx = image_index(b).astype(np.int64)
        subj_idx = idx % 5
        t = pa.table(
            {
                "subject": pa.array(
                    np.asarray(CAPTION_SUBJECTS, dtype=object)[subj_idx], pa.string()
                ),
                "n_caps": pa.array(np.ones(len(idx), dtype=np.int64)),
                "sum_chars": pa.array(n_chars),
                "sum_tokens": pa.array(n_tokens),
            }
        )
        agg = pa.TableGroupBy(t, "subject").aggregate(
            [("n_caps", "sum"), ("sum_chars", "sum"), ("sum_tokens", "sum")]
        )
        return agg.rename_columns(["subject", "n_caps", "sum_chars", "sum_tokens"])

    ds = read_synth_image_meta(CAPQ_N)
    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("subject")
        .aggregate(
            Sum("n_caps", alias_name="n_caps"),
            Sum("sum_chars", alias_name="sum_chars"),
            Sum("sum_tokens", alias_name="sum_tokens"),
        )
    )


def _build_caption_stats_sql(n: int = CAPQ_N) -> str:
    from ..sources.images import CAPTION_EXTRAS, CAPTION_PLACES, CAPTION_SUBJECTS

    def lst(words) -> str:
        return "[" + ", ".join(f"'{w}'" for w in words) + "]"

    return f"""
    WITH idx AS (SELECT unnest(range({n})) AS i),
    cap AS (
      SELECT list_extract({lst(CAPTION_SUBJECTS)}, CAST(i % 5 AS INT) + 1) AS subject,
             list_extract({lst(CAPTION_SUBJECTS)}, CAST(i % 5 AS INT) + 1) || ' ' ||
             list_extract({lst(CAPTION_PLACES)}, CAST((i // 5) % 7 AS INT) + 1) || ' ' ||
             list_extract({lst(CAPTION_EXTRAS)}, CAST((i // 35) % 5 AS INT) + 1) ||
             ' #' || CAST(i AS VARCHAR) AS caption
      FROM idx
    )
    SELECT subject,
           CAST(COUNT(*) AS BIGINT) AS n_caps,
           CAST(SUM(length(caption)) AS BIGINT) AS sum_chars,
           CAST(SUM(len(string_split(caption, ' '))) AS BIGINT) AS sum_tokens
    FROM cap GROUP BY subject
"""


Q_CAPTION_STATS_SQL = _build_caption_stats_sql()


def q_quality_filter(sf_dir: str):
    """Quality gate over documents with integer-exact bands (so the
    DuckDB oracle matches value-for-value): keep docs with 5 ≤ tokens
    ≤ 200 and ≥ 4% stopwords; report per-language kept count + chars."""
    from ray.data.aggregate import Count, Sum

    from ..stages.text import text_stats_batch

    def gate(batch: pa.Table) -> pa.Table:
        stats = text_stats_batch(batch)
        n_tok = stats["n_tokens"].to_numpy()
        n_stop = stats["n_stopwords"].to_numpy()
        keep = (n_tok >= 5) & (n_tok <= 200) & (n_stop * 25 >= n_tok)
        return stats.filter(pa.array(keep))

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    kept = ds.map_batches(gate, batch_format="pyarrow")
    return kept.groupby("lang").aggregate(
        Count(alias_name="n_kept"),
        Sum("n_chars", alias_name="sum_chars"),
    )


Q_QUALITY_FILTER_SQL = f"""
    WITH s AS (
      SELECT lang,
             length(text) AS n_chars,
             len(string_split(text, ' ')) AS n_tokens,
             len(list_filter(string_split(text, ' '), x -> x IN {STOPWORDS_SQL})) AS n_stop
      FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM s
    WHERE n_tokens >= 5 AND n_tokens <= 200 AND n_stop * 25 >= n_tokens
    GROUP BY lang
"""


def q_lang_id(sf_dir: str):
    """Heuristic language-ID actor pool scored against the table's own
    labels: per (true lang, predicted lang) confusion counts.
    Model state (marker sets) lives in the actor __init__; the marker
    heuristic is mirrored in SQL (list_filter counts + the same
    first-strictly-greater tie-break) — value-exact."""
    from ray.data.aggregate import Count

    from ..stages.text import LangId

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    pred = ds.map_batches(LangId(), batch_format="pyarrow")
    return (
        pred.groupby(["lang", "lang_pred"])
        .aggregate(Count(alias_name="n"))
        .select_columns(["lang", "lang_pred", "n"])
    )


def _build_lang_id_sql() -> str:
    """SQL mirror of stages/text.LangId: per-language marker counts via
    list_filter; the prediction is the FIRST language (in marker-dict
    order en, de, fr, es, zh) whose score beats every later one and is
    > 0 — identical to the Python loop's strictly-greater update."""
    from ..stages.text import _LANG_MARKERS

    langs = list(_LANG_MARKERS)
    score_cols = []
    for lang in langs:
        members = ",".join(f"'{m}'" for m in sorted(_LANG_MARKERS[lang]))
        score_cols.append(
            f"len(list_filter(toks, x -> x IN ({members}))) AS s_{lang}"
        )
    cases = []
    for i, lang in enumerate(langs):
        conds = [f"s_{lang} > 0"] + [
            f"s_{lang} >= s_{other}" for other in langs[i + 1 :]
        ]
        cases.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    # earlier languages win ties because the Python loop only replaces
    # the best on a STRICTLY greater score — so lang i beats i+1.. on
    # >=, and has already lost to 0..i-1 when their WHEN fired first
    return f"""
    WITH t AS (SELECT lang, string_split(lower(text), ' ') AS toks FROM documents),
    sc AS (SELECT lang, {", ".join(score_cols)} FROM t),
    p AS (
      SELECT lang,
             CASE {" ".join(cases)} ELSE 'und' END AS lang_pred
      FROM sc
    )
    SELECT lang, lang_pred, CAST(COUNT(*) AS BIGINT) AS n
    FROM p GROUP BY lang, lang_pred
"""


Q_LANG_ID_SQL = _build_lang_id_sql()


COV_TILE_RES = 3
COV_PX = 16


def q_tile_coverage_rects(sf_dir: str):
    """Raster tile coverage over part-derived axis rects: exact tile
    clip (TileJoinClip) → partial rasters before the shuffle →
    groupby(tile) merge — the flagship's raster path with an
    SQL-checkable input.  Output is integer pixel counts; the oracle
    enumerates the 16×16 pixel-center grid per tile (centers never lie
    on rect edges — rect bounds are integers, centers never are)."""
    from ray.data.aggregate import Sum

    from ..stages.cells import cell_xy
    from ..stages.join_clip import TileJoinClip
    from ..stages.tiles import RasterizePartial, merge_rasters

    def subjects(batch: pa.Table) -> pa.Table:
        b = _part_rect_batch(batch)
        return pa.table(
            {
                "image_id": pc.cast(b["p_partkey"], pa.string()),
                "footprint": b["footprint"],
                "minx": b["minx"],
                "miny": b["miny"],
                "maxx": b["maxx"],
                "maxy": b["maxy"],
            }
        )

    ds = _read(sf_dir, "part", ["p_partkey", "p_size"]).map_batches(
        subjects, batch_format="pyarrow"
    )
    clipped = ds.map_batches(
        TileJoinClip(tile_res=COV_TILE_RES, mode="exact"), batch_format="pyarrow"
    )
    merged = (
        clipped.map_batches(RasterizePartial(px=COV_PX), batch_format="pyarrow")
        .groupby("tile_id")
        .map_groups(merge_rasters, batch_format="pyarrow")
    )

    def finish(batch: pa.Table) -> pa.Table:
        tiles = batch["tile_id"].to_numpy().view(np.uint64)
        tx, ty = cell_xy(tiles)
        covered = np.empty(batch.num_rows, dtype=np.int64)
        for i, buf in enumerate(batch["raster"].to_pylist()):
            covered[i] = int(
                (np.frombuffer(buf, dtype=np.uint16) > 0).sum()
            )
        return pa.table(
            {
                "tx": pa.array(tx.astype(np.int64), pa.int64()),
                "ty": pa.array(ty.astype(np.int64), pa.int64()),
                "n_pieces": batch["n_pieces"],
                "covered_px": pa.array(covered, pa.int64()),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")


Q_TILE_COVERAGE_RECTS_SQL = f"""
    WITH d AS ({PART_RECT_SQL}),
    b AS (
      SELECT minx, miny, maxx, maxy,
             CAST(greatest(0, least(7, floor((minx + 180) / 360 * 8))) AS BIGINT) AS tx0,
             CAST(greatest(0, least(7, floor((maxx + 180) / 360 * 8))) AS BIGINT) AS tx1,
             CAST(greatest(0, least(7, floor((miny + 90) / 180 * 8))) AS BIGINT) AS ty0,
             CAST(greatest(0, least(7, floor((maxy + 90) / 180 * 8))) AS BIGINT) AS ty1
      FROM d
    ),
    ex AS (SELECT minx, miny, maxx, maxy, unnest(range(tx0, tx1 + 1)) AS tx, ty0, ty1 FROM b),
    tiles AS (SELECT minx, miny, maxx, maxy, tx, unnest(range(ty0, ty1 + 1)) AS ty FROM ex),
    pieces AS (
      SELECT * FROM tiles
      WHERE least(maxx, -180 + (tx + 1) * 45.0) > greatest(minx, -180 + tx * 45.0)
        AND least(maxy, -90 + (ty + 1) * 22.5) > greatest(miny, -90 + ty * 22.5)
    ),
    np_ AS (SELECT tx, ty, CAST(COUNT(*) AS BIGINT) AS n_pieces FROM pieces GROUP BY tx, ty),
    cov AS (
      SELECT DISTINCT tx, ty, i.range AS i, j.range AS j
      FROM pieces, range({COV_PX}) i, range({COV_PX}) j
      WHERE (-180 + tx * 45.0 + (i.range + 0.5) * (45.0 / {COV_PX})) > minx
        AND (-180 + tx * 45.0 + (i.range + 0.5) * (45.0 / {COV_PX})) < maxx
        AND (-90 + ty * 22.5 + (j.range + 0.5) * (22.5 / {COV_PX})) > miny
        AND (-90 + ty * 22.5 + (j.range + 0.5) * (22.5 / {COV_PX})) < maxy
    ),
    cv AS (SELECT tx, ty, CAST(COUNT(*) AS BIGINT) AS covered_px FROM cov GROUP BY tx, ty)
    SELECT np_.tx, np_.ty, n_pieces, covered_px FROM np_ JOIN cv USING (tx, ty)
"""


Q_NGRAM_DEDUP_SQL = f"""
    WITH cand AS ({_build_minhash_sql(threshold=0.3)}),
    tx AS (
      SELECT doc_id,
             list_distinct([ text[i:i+4] FOR i IN range(1, greatest(2, length(text) - 3)) ]) AS sh
      FROM documents
    ),
    v AS (
      SELECT doc_a, doc_b,
             CAST(floor(100.0 * len(list_intersect(a.sh, b.sh))
                        / len(list_distinct(list_concat(a.sh, b.sh))) + 0.5) AS BIGINT) AS jaccard_pct
      FROM cand JOIN tx a ON a.doc_id = cand.doc_a
                JOIN tx b ON b.doc_id = cand.doc_b
    )
    SELECT doc_a, doc_b, jaccard_pct FROM v WHERE jaccard_pct >= 50
"""


def q_ngram_dedup(sf_dir: str):
    """N-gram Jaccard near-dup pairs: MinHash LSH proposes candidates
    (deterministic — the oracle reproduces the exact candidate set),
    the exact 5-gram Jaccard verifies ≥ 0.5 (integer percent,
    half-up) — value-exact vs the SQL mirror.

    Fully distributed, nothing on the driver: the candidate stage is
    the bucketed LSH kernel, duplicate pairs merge via ``pair_reduce``
    (one packed-int64 bucket shuffle), and the verify join never pulls
    texts to the driver — each pair explodes to (doc_id, pair_key,
    slot), ONE bucketed hash join attaches the corpus text to each
    slot, and a pair_key-bucketed regroup evaluates the exact Jaccard
    inside the bucket workers.  Two shuffles total, each O(candidates),
    regardless of corpus size."""
    from ..stages.dedup import (
        MinHasher,
        lsh_band_explode,
        minhash_candidate_pairs,
        ngram_jaccard_pct,
        pair_reduce,
    )
    from ..stages.footprint import _splitmix64
    from ..stages.join import shuffle_hash_join

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    sigs = ds.map_batches(MinHasher(), batch_format="pyarrow")
    exploded = sigs.map_batches(lsh_band_explode, batch_format="pyarrow")
    cand = minhash_candidate_pairs(exploded, threshold=0.3)
    cand = pair_reduce(cand, "doc_a", "doc_b", "est_jaccard", how="max")

    def explode_pairs(b: pa.Table) -> pa.Table:
        a = b["doc_a"].to_numpy().astype(np.uint64)
        bb = b["doc_b"].to_numpy().astype(np.uint64)
        key = ((a << np.uint64(32)) | bb).view(np.int64)
        n = len(a)
        return pa.table(
            {
                "doc_id": pa.array(
                    np.concatenate([a, bb]).astype(np.int64), pa.int64()
                ),
                "pair_key": pa.array(np.concatenate([key, key]), pa.int64()),
                "slot": pa.array(
                    np.concatenate(
                        [np.zeros(n, np.int64), np.ones(n, np.int64)]
                    ),
                    pa.int64(),
                ),
            }
        )

    pair_docs = cand.map_batches(explode_pairs, batch_format="pyarrow")
    joined = shuffle_hash_join(
        pair_docs,
        _read(sf_dir, "documents", ["doc_id", "text"]),
        "doc_id",
        ["pair_key", "slot"],
        ["text"],
        left_schema=pa.schema(
            [
                pa.field("doc_id", pa.int64()),
                pa.field("pair_key", pa.int64()),
                pa.field("slot", pa.int64()),
            ]
        ),
        right_schema=pa.schema(
            [pa.field("doc_id", pa.int64()), pa.field("text", pa.string())]
        ),
    )

    N_BUCKETS = 64

    def add_pair_bucket(b: pa.Table) -> pa.Table:
        k = b["pair_key"].to_numpy().view(np.uint64)
        return pa.table(
            {
                "pair_key": b["pair_key"],
                "slot": b["slot"],
                "text": b["text"],
                "vbucket": pa.array(
                    (_splitmix64(k) % np.uint64(N_BUCKETS)).astype(np.int64)
                ),
            }
        )

    def verify_bucket(group: pa.Table) -> pa.Table:
        k = group["pair_key"].to_numpy()
        slot = group["slot"].to_numpy()
        order = np.lexsort((slot, k))
        k = k[order]
        texts = group["text"].take(pa.array(order)).to_pylist()
        starts = np.flatnonzero(np.concatenate(([True], k[1:] != k[:-1])))
        # every pair_key carries exactly its two slots (both docs exist
        # in the corpus); the exact shingle-set Jaccard is inherent
        # per-pair work, run here inside the bucket worker — bounded by
        # candidates/bucket, never on the driver
        jac = np.empty(len(starts), dtype=np.int64)
        for i, s in enumerate(starts):
            jac[i] = ngram_jaccard_pct(texts[s], texts[s + 1])
        uk = k[starts].view(np.uint64)
        out = pa.table(
            {
                "doc_a": pa.array(
                    (uk >> np.uint64(32)).astype(np.int64), pa.int64()
                ),
                "doc_b": pa.array(
                    (uk & np.uint64(0xFFFFFFFF)).astype(np.int64), pa.int64()
                ),
                "jaccard_pct": pa.array(jac, pa.int64()),
            }
        )
        return out.filter(pc.greater_equal(out["jaccard_pct"], 50))

    return (
        joined.map_batches(add_pair_bucket, batch_format="pyarrow")
        .groupby("vbucket")
        .map_groups(verify_bucket, batch_format="pyarrow")
    )


# ------------------------------------------------------- big×big join

SUPPLIER_RECT_SQL = """
    SELECT s_suppkey,
           CAST((s_suppkey * 7) % 97 AS DOUBLE) - CAST(2 + (s_suppkey % 6) AS DOUBLE) AS minx,
           CAST((s_suppkey * 11) % 89 AS DOUBLE) - CAST(2 + ((s_suppkey * 3) % 5) AS DOUBLE) AS miny,
           CAST((s_suppkey * 7) % 97 AS DOUBLE) + CAST(2 + (s_suppkey % 6) AS DOUBLE) AS maxx,
           CAST((s_suppkey * 11) % 89 AS DOUBLE) + CAST(2 + ((s_suppkey * 3) % 5) AS DOUBLE) AS maxy
    FROM supplier
"""


def _supplier_rect_batch(batch: pa.Table) -> pa.Table:
    """supplier rows → deterministic integer-valued rects (+ geometry)."""
    sk = batch["s_suppkey"].to_numpy().astype(np.int64)
    cx = ((sk * 7) % 97).astype(np.float64)
    cy = ((sk * 11) % 89).astype(np.float64)
    hw = (2 + (sk % 6)).astype(np.float64)
    hh = (2 + ((sk * 3) % 5)).astype(np.float64)
    minx, miny, maxx, maxy = cx - hw, cy - hh, cx + hw, cy + hh
    out = batch.append_column("minx", pa.array(minx))
    out = out.append_column("miny", pa.array(miny))
    out = out.append_column("maxx", pa.array(maxx))
    out = out.append_column("maxy", pa.array(maxy))
    return out.append_column("geom", _rect_mp_array(minx, miny, maxx, maxy))


def q_poly_join_big(sf_dir: str):
    """Big×big cell-partitioned spatial join + clip (PBSM): part rects
    × supplier rects where NEITHER side is broadcast — the 100-TB
    shape.  Both sides explode to their covering cells, ONE shuffle on
    the shared cell key co-locates them, and each cell group joins
    locally via STR-tree candidates + whole-batch native Martinez clip
    (stages/join_clip.py::join_cells_within_group — the engine lift of
    the bbox gate at /root/reference/lib/src/boolean/mod.rs:106-109).
    Geometries spanning several cells are replicated, so the same pair
    is FOUND in every shared cell: PBSM reference-cell duplicate
    avoidance (keep a pair only in the cell holding the min corner of
    the two bboxes' intersection) emits each pair from exactly one
    cell — no second shuffle to dedup replicas — pinning that
    replication changes partitioning, never the answer.  Rect subjects
    make the exact Martinez clip area closed-form for the oracle; only
    positive-area intersections are kept (edge-touching rects clip to
    an empty multipolygon)."""
    from ..stages.cells import explode_to_cells
    from ..stages.join_clip import join_cells_within_group_dedup

    def probe_rows(batch: pa.Table) -> pa.Table:
        batch = _part_rect_batch(batch)
        n = batch.num_rows
        t = pa.table(
            {
                "image_id": pc.cast(batch["p_partkey"], pa.string()),
                "tile_id": pa.array(np.zeros(n, dtype=np.int64)),
                "footprint": batch["footprint"],
                "geom": batch["footprint"],
                "minx": batch["minx"],
                "miny": batch["miny"],
                "maxx": batch["maxx"],
                "maxy": batch["maxy"],
                "side": pa.array(["probe"] * n),
            }
        )
        return explode_to_cells(t, KNN_RES)

    def build_rows(batch: pa.Table) -> pa.Table:
        batch = _supplier_rect_batch(batch)
        n = batch.num_rows
        t = pa.table(
            {
                "image_id": pa.array([""] * n, pa.string()),
                "tile_id": batch["s_suppkey"],
                "footprint": batch["geom"],
                "geom": batch["geom"],
                "minx": batch["minx"],
                "miny": batch["miny"],
                "maxx": batch["maxx"],
                "maxy": batch["maxy"],
                "side": pa.array(["build"] * n),
            }
        )
        return explode_to_cells(t, KNN_RES)

    probe = _read(sf_dir, "part", ["p_partkey", "p_size"]).map_batches(
        probe_rows, batch_format="pyarrow"
    )
    build = _read(sf_dir, "supplier", ["s_suppkey"]).map_batches(
        build_rows, batch_format="pyarrow"
    )
    joined = (
        probe.union(build)
        .groupby("cell")
        .map_groups(join_cells_within_group_dedup, batch_format="pyarrow")
    )

    def finalize(batch: pa.Table) -> pa.Table:
        area = batch["clip_area"].to_numpy().astype(np.int64)
        out = pa.table(
            {
                "p_partkey": pc.cast(batch["image_id"], pa.int64()),
                "s_suppkey": batch["tile_id"],
                "clip_area": pa.array(area, pa.int64()),
            }
        )
        return out.filter(pc.greater_equal(out["clip_area"], 1))

    return joined.map_batches(finalize, batch_format="pyarrow")


Q_POLY_JOIN_BIG_SQL = f"""
    WITH r AS ({PART_RECT_SQL}), s AS ({SUPPLIER_RECT_SQL})
    SELECT r.p_partkey, s.s_suppkey,
           CAST((least(r.maxx, s.maxx) - greatest(r.minx, s.minx)) *
                (least(r.maxy, s.maxy) - greatest(r.miny, s.miny)) AS BIGINT) AS clip_area
    FROM r, s
    WHERE least(r.maxx, s.maxx) > greatest(r.minx, s.minx)
      AND least(r.maxy, s.maxy) > greatest(r.miny, s.miny)
"""


def q_dissolve(sf_dir: str):
    """Dissolve (cascaded union per group): union all part rects of a
    brand into one multipolygon, report its exact area and perimeter.

    Union is an associative monoid, so it pre-aggregates like a sum:
    each batch tree-reduces its own rows per brand first
    (stages/dissolve.py::dissolve_partial — rounds of whole-batch
    native Martinez unions), then ONE groupby shuffle moves a single
    partial multipolygon per (batch, brand) and map_groups unions the
    partials.  Integer rect coordinates make every intermediate vertex
    exact, so area/perimeter are integer-exact and union-order-
    independent; the oracle enumerates unit cells (area = covered
    cells, perimeter = covered/uncovered boundary edges = 4N − 2·
    adjacent pairs).  Engine lift of the one-pair-per-call reference
    driver (/root/reference/lib/src/boolean/mod.rs:88) to union-of-many.
    """
    from ..stages.dissolve import dissolve_partial, dissolve_stats_group

    def partial(batch: pa.Table) -> pa.Table:
        batch = _part_rect_batch(batch)
        return dissolve_partial(batch, "p_brand", "footprint")

    def final(group: pa.Table) -> pa.Table:
        return dissolve_stats_group(group, "p_brand", "footprint")

    ds = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"])
    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("p_brand")
        .map_groups(final, batch_format="pyarrow")
    )


Q_DISSOLVE_SQL = f"""
    WITH d AS ({PART_RECT_SQL}),
    wx AS (
      SELECT p_brand,
             CAST(miny AS BIGINT) AS miny, CAST(maxy AS BIGINT) AS maxy,
             unnest(generate_series(CAST(minx AS BIGINT), CAST(maxx AS BIGINT) - 1)) AS x
      FROM d
    ),
    cells AS (
      SELECT DISTINCT p_brand, x,
             unnest(generate_series(miny, maxy - 1)) AS y
      FROM wx
    ),
    n AS (SELECT p_brand, COUNT(*) AS area FROM cells GROUP BY p_brand),
    adj AS (
      SELECT c1.p_brand, COUNT(*) AS pairs
      FROM cells c1 JOIN cells c2
        ON c1.p_brand = c2.p_brand
       AND ((c2.x = c1.x + 1 AND c2.y = c1.y) OR
            (c2.x = c1.x AND c2.y = c1.y + 1))
      GROUP BY c1.p_brand
    )
    SELECT n.p_brand,
           CAST(n.area AS BIGINT) AS union_area,
           CAST(4 * n.area - 2 * COALESCE(adj.pairs, 0) AS BIGINT) AS union_perim
    FROM n LEFT JOIN adj ON n.p_brand = adj.p_brand
"""


def q_grouped_topk(sf_dir: str):
    """Top-3 orders per priority class by price: per-batch top-k
    combiner (stages/topk.py — at most k rows per group per batch enter
    the shuffle), groupby(group) re-rank finalizer.  Deterministic via
    the unique o_orderkey tie-break."""
    from ..stages.topk import grouped_topk_batch

    K = 3

    def partial(batch: pa.Table) -> pa.Table:
        price_c = _cents(batch["o_totalprice"].to_numpy())
        t = pa.table(
            {
                "o_orderpriority": batch["o_orderpriority"],
                "o_orderkey": batch["o_orderkey"],
                "price_c": pa.array(price_c),
            }
        )
        kept, _ = grouped_topk_batch(
            t, "o_orderpriority", price_c, batch["o_orderkey"].to_numpy(), K
        )
        return kept

    def final(group: pa.Table) -> pa.Table:
        kept, rank = grouped_topk_batch(
            group,
            "o_orderpriority",
            group["price_c"].to_numpy(),
            group["o_orderkey"].to_numpy(),
            K,
        )
        return kept.append_column("rank", pa.array(rank))

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_totalprice"])
    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .map_groups(final, batch_format="pyarrow")
    )


Q_GROUPED_TOPK_SQL = """
    WITH o AS (
      SELECT o_orderpriority, o_orderkey,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_c
      FROM orders
    ),
    r AS (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY o_orderpriority
               ORDER BY price_c DESC, o_orderkey) AS rank
      FROM o
    )
    SELECT o_orderpriority, o_orderkey, price_c, CAST(rank AS BIGINT) AS rank
    FROM r WHERE rank <= 3
"""


def q_running_total(sf_dir: str):
    """Cumulative per-key window: running spend per user ordered by
    (ts, event_id) — SUM OVER ROWS UNBOUNDED PRECEDING, the classic
    ordered window op the reference lacks.  user_id cardinality is
    ~rows at 100 TB, so the kernel is user-hash BUCKETED (64 buckets,
    the sessionize shape): one lexsort per bucket orders EVERY user's
    history at once and a segment-rebased cumsum (cumsum minus each
    segment's starting offset) computes all running totals in one
    vectorized pass — never one Python group call per user."""
    N_BUCKETS = 64

    def bucket(b: pa.Table) -> pa.Table:
        from ..stages.footprint import _splitmix64

        u = b["user_id"].to_numpy().astype(np.uint64)
        ts = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        return pa.table(
            {
                "user_id": b["user_id"],
                "event_id": b["event_id"],
                "t": pa.array(ts, pa.int64()),
                "value_c": pa.array(_cents(b["value"].to_numpy()), pa.int64()),
                "bucket": pa.array(
                    (_splitmix64(u) % np.uint64(N_BUCKETS)).astype(np.int64)
                ),
            }
        )

    def running_bucket(group: pa.Table) -> pa.Table:
        u = group["user_id"].to_numpy()
        t = group["t"].to_numpy()
        eid = group["event_id"].to_numpy()
        v = group["value_c"].to_numpy()
        order = np.lexsort((eid, t, u))
        u, eid, v = u[order], eid[order], v[order]
        new_user = np.concatenate(([True], u[1:] != u[:-1]))
        cs = np.cumsum(v)
        seg = np.cumsum(new_user) - 1
        base = (cs - v)[new_user]  # running sum before each segment
        return pa.table(
            {
                "user_id": pa.array(u, pa.int64()),
                "event_id": pa.array(eid, pa.int64()),
                "running_c": pa.array(cs - base[seg], pa.int64()),
            }
        )

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    return (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(running_bucket, batch_format="pyarrow")
    )


Q_RUNNING_TOTAL_SQL = """
    SELECT user_id, event_id,
           CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_c
    FROM events
"""


def q_event_gaps(sf_dir: str):
    """LAG window: per-user inter-event gap in microseconds (first
    event: −1 sentinel) and the previous event's id.  Same bucketed
    shape as running_total — user-hash buckets, ONE lexsort per bucket
    over every user's history, vectorized shift with the user-boundary
    rows masked to the sentinel.  No per-distinct-user Python call."""
    N_BUCKETS = 64

    def bucket(b: pa.Table) -> pa.Table:
        from ..stages.footprint import _splitmix64

        u = b["user_id"].to_numpy().astype(np.uint64)
        ts = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        return pa.table(
            {
                "user_id": b["user_id"],
                "event_id": b["event_id"],
                "t": pa.array(ts, pa.int64()),
                "bucket": pa.array(
                    (_splitmix64(u) % np.uint64(N_BUCKETS)).astype(np.int64)
                ),
            }
        )

    def gaps_bucket(group: pa.Table) -> pa.Table:
        u = group["user_id"].to_numpy()
        t = group["t"].to_numpy()
        eid = group["event_id"].to_numpy()
        order = np.lexsort((eid, t, u))
        u, t, eid = u[order], t[order], eid[order]
        n = len(t)
        gap = np.empty(n, dtype=np.int64)
        prev = np.empty(n, dtype=np.int64)
        gap[0], prev[0] = -1, -1
        gap[1:] = t[1:] - t[:-1]
        prev[1:] = eid[:-1]
        new_user = np.concatenate(([True], u[1:] != u[:-1]))
        gap[new_user] = -1
        prev[new_user] = -1
        return pa.table(
            {
                "user_id": pa.array(u, pa.int64()),
                "event_id": pa.array(eid, pa.int64()),
                "prev_event_id": pa.array(prev, pa.int64()),
                "gap_us": pa.array(gap, pa.int64()),
            }
        )

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id"])
    return (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(gaps_bucket, batch_format="pyarrow")
    )


Q_EVENT_GAPS_SQL = """
    SELECT user_id, event_id,
           CAST(COALESCE(LAG(event_id) OVER w, -1) AS BIGINT) AS prev_event_id,
           CAST(COALESCE(
                epoch_us(ts) - LAG(epoch_us(ts)) OVER w, -1) AS BIGINT) AS gap_us
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def _mulmod64_sql(x: str, c: int) -> str:
    """(x * c) mod 2^64 in DuckDB HUGEINT without INT128 overflow: the
    constant is split into 32-bit halves so every intermediate stays
    under 2^97."""
    c0, c1 = c & 0xFFFFFFFF, c >> 32
    return (
        f"(({x}) * {c0}::HUGEINT"
        f" + ((({x}) * {c1}::HUGEINT) % 4294967296) * 4294967296)"
        " % 18446744073709551616::HUGEINT"
    )


def _splitmix64_ctes(
    src: str, key_expr: str, carry_cols: str, suffix: str = ""
) -> str:
    """CTE chain computing h = splitmix64(key_expr) over ``src`` —
    mirrors stages/footprint.py::_splitmix64 step for step (>>k as
    //2^k on non-negative HUGEINTs).  ``carry_cols``: comma-joined
    columns to carry through.  The final CTE is named ``hsh{suffix}``
    with columns (carry_cols..., h); pass a distinct ``suffix`` per
    chain when one query needs several independent hashes (e.g. the
    count-min sketch's D rows)."""
    H = "18446744073709551616::HUGEINT"
    C1, C2, C3 = 0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9, 0x94D049BB133111EB
    s = suffix
    return f"""x1{s} AS (
      SELECT {carry_cols}, (({key_expr})::HUGEINT + {C1}) % {H} AS x FROM {src}
    ),
    z1{s} AS (SELECT {carry_cols}, {_mulmod64_sql("xor(x, x // 1073741824)", C2)} AS z FROM x1{s}),
    z2{s} AS (SELECT {carry_cols}, {_mulmod64_sql("xor(z, z // 134217728)", C3)} AS z FROM z1{s}),
    hsh{s} AS (SELECT {carry_cols}, xor(z, z // 2147483648) AS h FROM z2{s})"""


KMV_K = 256


def q_kmv_overlap(sf_dir: str):
    """KMV / bottom-k theta-sketch SET OPERATIONS: estimated distinct
    clickers, purchasers, their union and Jaccard overlap — the
    audience-overlap question sketches exist for, answered from two
    256-value sketches instead of two full user sets.  Per-block
    combiner keeps each side's bottom-k distinct hashes; ONE tiny
    groupby(side) merge; the driver receives ≤ 2k hashes (bounded
    regardless of input size) and finishes with integer arithmetic —
    the oracle mirrors the sketch itself, splitmix64 in HUGEINT."""
    from ..stages.footprint import _splitmix64

    def partial(b: pa.Table) -> pa.Table:
        keep = pc.is_in(b["event_type"], value_set=pa.array(["click", "purchase"]))
        k = b.filter(keep)
        side = pc.equal(k["event_type"], "click").to_numpy(zero_copy_only=False)
        u = k["user_id"].to_numpy().astype(np.uint64)
        h = _splitmix64(u)
        out_s, out_h = [], []
        for s in (0, 1):
            hs = np.unique(h[side == bool(s)])[:KMV_K]
            out_s.append(np.full(len(hs), s, dtype=np.int64))
            out_h.append(hs.view(np.int64))
        return pa.table(
            {
                "side": pa.array(np.concatenate(out_s)),
                "h": pa.array(np.concatenate(out_h)),
            }
        )

    def merge(group: pa.Table) -> pa.Table:
        hs = np.unique(group["h"].to_numpy().view(np.uint64))[:KMV_K]
        return pa.table(
            {
                "side": group["side"].slice(0, 1),
                "h": pa.array([hs.view(np.int64).tolist()], pa.list_(pa.int64())),
            }
        )

    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("side")
        .map_groups(merge, batch_format="pyarrow")
    )
    # driver-side finish over ≤ 2k UNSIGNED hash values (python ints)
    mask = (1 << 64) - 1
    rows = {
        r["side"]: {v & mask for v in r["h"]} for r in merged.take_all()
    }
    a = rows.get(1, set())  # clickers
    b = rows.get(0, set())  # purchasers

    def est(sk: set) -> int:
        if len(sk) < KMV_K:
            return len(sk)
        return (KMV_K - 1) * (1 << 64) // max(sk)

    union_sk = set(sorted(a | b)[:KMV_K])
    overlap = sum(1 for x in union_sk if x in a and x in b)
    return pa.table(
        {
            "est_click": pa.array([est(a)], pa.int64()),
            "est_purchase": pa.array([est(b)], pa.int64()),
            "est_union": pa.array([est(union_sk)], pa.int64()),
            "jaccard_pct": pa.array(
                [100 * overlap // max(1, len(union_sk))], pa.int64()
            ),
        }
    )


def _build_kmv_sql() -> str:
    """SQL mirror of the KMV sketch arithmetic (splitmix64 in HUGEINT,
    unsigned ordering, bottom-k cuts, small-sketch exact fallback)."""
    return f"""
    WITH src AS (
      SELECT DISTINCT user_id, event_type FROM events
      WHERE event_type IN ('click', 'purchase')
    ),
    {_splitmix64_ctes("src", "user_id", "event_type")},
    a AS (SELECT DISTINCT h FROM hsh WHERE event_type = 'click'
          ORDER BY h LIMIT {KMV_K}),
    b AS (SELECT DISTINCT h FROM hsh WHERE event_type = 'purchase'
          ORDER BY h LIMIT {KMV_K}),
    u AS (SELECT h FROM (SELECT h FROM a UNION SELECT h FROM b)
          ORDER BY h LIMIT {KMV_K}),
    stats AS (
      SELECT
        (SELECT COUNT(*) FROM a) AS na,
        (SELECT MAX(h) FROM a) AS ka,
        (SELECT COUNT(*) FROM b) AS nb,
        (SELECT MAX(h) FROM b) AS kb,
        (SELECT COUNT(*) FROM u) AS nu,
        (SELECT MAX(h) FROM u) AS ku,
        (SELECT COUNT(*) FROM u
         WHERE h IN (SELECT h FROM a) AND h IN (SELECT h FROM b)) AS ov
    )
    SELECT
      CAST(CASE WHEN na < {KMV_K} THEN na
           ELSE ({KMV_K - 1}::HUGEINT * 18446744073709551616::HUGEINT) // ka
           END AS BIGINT) AS est_click,
      CAST(CASE WHEN nb < {KMV_K} THEN nb
           ELSE ({KMV_K - 1}::HUGEINT * 18446744073709551616::HUGEINT) // kb
           END AS BIGINT) AS est_purchase,
      CAST(CASE WHEN nu < {KMV_K} THEN nu
           ELSE ({KMV_K - 1}::HUGEINT * 18446744073709551616::HUGEINT) // ku
           END AS BIGINT) AS est_union,
      CAST(100 * ov // greatest(1, nu) AS BIGINT) AS jaccard_pct
    FROM stats
"""


def q_hll_distinct(sf_dir: str):
    """Approximate COUNT(DISTINCT user_id) per event_type via the
    mergeable 64-register sketch (stages/sketch.py).  The shuffle moves
    one 64-byte register vector per (batch, group); partials merge by
    elementwise max.  All reported quantities are exact integers, so
    the oracle mirrors the sketch itself — not the true count."""
    from ..stages.sketch import hll_finalize_group, hll_partial

    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    return (
        ds.map_batches(
            lambda b: hll_partial(b, "user_id", "event_type"),
            batch_format="pyarrow",
        )
        .groupby("event_type")
        .map_groups(
            lambda g: hll_finalize_group(g, "event_type"), batch_format="pyarrow"
        )
    )


def _build_hll_sql() -> str:
    """SQL mirror of the sketch: splitmix64 in HUGEINT (mod-2^64 steps,
    >> as //), trailing-zero rho via the (w & -w) bit trick, register
    max per (group, bucket), zero-filled 64-bucket grid, then the exact
    integer estimate with alpha = 709/1000 and 2^59 scaling.

    The 64x64-bit multiplies would overflow INT128, so each constant is
    split into 32-bit halves: x*C mod 2^64 = (x*c0 + ((x*c1 mod 2^32)
    << 32)) mod 2^64 — every intermediate stays under 2^97."""
    return f"""
    WITH {_splitmix64_ctes("events", "user_id", "event_type")},
    br AS (
      SELECT event_type,
             CAST(h % 64 AS BIGINT) AS bucket,
             CAST(h // 64 AS BIGINT) AS w
      FROM hsh
    ),
    rho AS (
      SELECT event_type, bucket,
             CASE WHEN w = 0 THEN 59
                  ELSE bit_count((w & -w) - 1) + 1 END AS rho
      FROM br
    ),
    regs AS (
      SELECT event_type, bucket, MAX(rho) AS r
      FROM rho GROUP BY event_type, bucket
    ),
    grid AS (
      SELECT g.event_type, b.bucket
      FROM (SELECT DISTINCT event_type FROM events) g,
           (SELECT unnest(range(64)) AS bucket) b
    ),
    filled AS (
      SELECT grid.event_type, COALESCE(regs.r, 0) AS r
      FROM grid LEFT JOIN regs
        ON grid.event_type = regs.event_type AND grid.bucket = regs.bucket
    ),
    agg AS (
      SELECT event_type,
             SUM(CASE WHEN r = 0 THEN 1 ELSE 0 END) AS n_zero,
             SUM(r) AS reg_sum,
             SUM(((CAST(1 AS BIGINT) << (59 - r)))::HUGEINT) AS d
      FROM filled GROUP BY event_type
    )
    SELECT event_type,
           CAST(n_zero AS BIGINT) AS n_zero,
           CAST(reg_sum AS BIGINT) AS reg_sum,
           CAST(LEAST((709::HUGEINT * 4096 * 576460752303423488)
                        // (1000::HUGEINT * d),
                      4611686018427387904::HUGEINT) AS BIGINT) AS est_distinct
    FROM agg
"""


Q_HLL_DISTINCT_SQL = _build_hll_sql()


def q_cms_counts(sf_dir: str):
    """Count-min sketch point-frequency estimates (stages/sketch.py).

    Per-block D×W count grids tree-reduce by SUM through Ray's
    aggregate, so the driver receives one 32 KiB array regardless of
    input size; the fixed probe set (user_id 0..149) is then answered
    from the sketch alone.  Estimates are exact integers and the
    sketch is order-independent, so the oracle mirrors the sketch
    itself (not the true counts) — the same contract as hll_distinct."""
    from ..stages.sketch import build_cms, cms_estimate

    ds = _read(sf_dir, "events", ["user_id"])
    sk = build_cms(ds, "user_id")
    probes = np.arange(150, dtype=np.uint64)
    est = cms_estimate(sk, probes)
    return pa.table(
        {
            "user_id": pa.array(probes.astype(np.int64), pa.int64()),
            "est_count": pa.array(est, pa.int64()),
        }
    )


def _build_cms_sql() -> str:
    """SQL mirror of the count-min sketch: for each of the D=4 hash
    rows, bucket = splitmix64(key XOR row_i_salt) mod 1024; per-bucket
    COUNT(*) over events gives that row's counter; a probe key's
    estimate is the MIN over rows of its bucket's counter (0 when the
    bucket was never touched)."""
    from ..stages.sketch import CMS_D, CMS_SEED, CMS_W

    parts = ["probe AS (SELECT unnest(range(150)) AS k)"]
    est_joins, est_cols = [], []
    for i in range(CMS_D):
        salt = (i * CMS_SEED) & 0xFFFFFFFFFFFFFFFF
        parts.append(
            _splitmix64_ctes(
                "events",
                f"xor(CAST(user_id AS HUGEINT), {salt}::HUGEINT)",
                "user_id",
                suffix=f"e{i}",
            )
        )
        parts.append(
            f"""cnt{i} AS (
      SELECT CAST(h % {CMS_W} AS BIGINT) AS b,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM hshe{i} GROUP BY 1
    )"""
        )
        parts.append(
            _splitmix64_ctes(
                "probe",
                f"xor(CAST(k AS HUGEINT), {salt}::HUGEINT)",
                "k",
                suffix=f"p{i}",
            )
        )
        parts.append(
            f"""pe{i} AS (
      SELECT k, COALESCE(cnt{i}.c, 0) AS e
      FROM (SELECT k, CAST(h % {CMS_W} AS BIGINT) AS b FROM hshp{i}) pb
      LEFT JOIN cnt{i} USING (b)
    )"""
        )
        est_joins.append(f"JOIN pe{i} USING (k)" if i else f"pe{i}")
        est_cols.append(f"pe{i}.e")
    ctes = ",\n    ".join(parts)
    return f"""
    WITH {ctes}
    SELECT CAST(k AS BIGINT) AS user_id,
           CAST(LEAST({", ".join(est_cols)}) AS BIGINT) AS est_count
    FROM {" ".join(est_joins)}
"""


Q_CMS_COUNTS_SQL = _build_cms_sql()


GRAM_DIM = 64  # embeddings table vector width (all scale factors)


def q_gram_matrix(sf_dir: str):
    """Distributed Gram / covariance matrix over the embedding column
    (stages/linalg.py): per-block (64, 64) int64 partial products
    tree-reduce by SUM, one 32 KiB grid to the driver regardless of
    row count — the PCA/whitening pre-pass shape.  Emitted as the
    2,080-row upper triangle; fixed-point quantization makes every
    entry integer-exact."""
    from ..stages.linalg import build_gram

    ds = _read(sf_dir, "embeddings", ["embedding"])
    g = build_gram(ds, "embedding", GRAM_DIM)
    iu, ju = np.triu_indices(GRAM_DIM)
    return pa.table(
        {
            "i": pa.array(iu.astype(np.int64), pa.int64()),
            "j": pa.array(ju.astype(np.int64), pa.int64()),
            "gram": pa.array(g[iu, ju], pa.int64()),
        }
    )


Q_GRAM_MATRIX_SQL = f"""
    WITH q AS (
      SELECT list_transform(
               embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)
             ) AS qv
      FROM embeddings
    ),
    idx AS (SELECT unnest(range(1, {GRAM_DIM + 1})) AS a)
    SELECT CAST(i.a - 1 AS BIGINT) AS i,
           CAST(j.a - 1 AS BIGINT) AS j,
           CAST(SUM(q.qv[i.a] * q.qv[j.a]) AS BIGINT) AS gram
    FROM q, idx i, idx j
    WHERE j.a >= i.a
    GROUP BY 1, 2
"""


CELL_ROLLUP_LEVELS = (2, 3, 4)


FOCAL_RES = 4


def q_focal_sum(sf_dir: str):
    """Focal / neighborhood statistics: each res-4 cell's customer
    count plus its 3×3 neighborhood total — the raster-smoothing
    (heatmap / kernel-density-lite) op.  Per-block partial counts per
    cell, then each (cell, n) partial FANS OUT to the 9 cells whose
    neighborhoods it contributes to (vectorized; edge cells clamp), so
    ONE groupby(cell) Sum yields both the self count and the focal
    total without a second join or shuffle."""
    from ray.data.aggregate import Sum

    from ..stages.cells import cell_encode, cell_xy

    n_side = 2**FOCAL_RES

    def partial(b: pa.Table) -> pa.Table:
        p = _customer_point_batch(b)
        cells = cell_encode(p["px"].to_numpy(), p["py"].to_numpy(), FOCAL_RES)
        uniq, counts = np.unique(cells, return_counts=True)
        cx, cy = cell_xy(uniq)
        cx = cx.astype(np.int64)
        cy = cy.astype(np.int64)
        counts = counts.astype(np.int64)
        out_cell, out_self, out_focal = [], [], []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                nx, ny = cx + dx, cy + dy
                m = (nx >= 0) & (nx < n_side) & (ny >= 0) & (ny < n_side)
                # re-encode neighbor cell ids through the same Morton math
                ncell = cell_encode(
                    -180.0 + (nx[m] + 0.5) * (360.0 / n_side),
                    -90.0 + (ny[m] + 0.5) * (180.0 / n_side),
                    FOCAL_RES,
                )
                out_cell.append(ncell.view(np.int64))
                out_focal.append(counts[m])
                out_self.append(
                    counts[m] if dx == 0 and dy == 0 else np.zeros(m.sum(), np.int64)
                )
        return pa.table(
            {
                "cell": pa.array(np.concatenate(out_cell), pa.int64()),
                "n_self": pa.array(np.concatenate(out_self)),
                "n_focal": pa.array(np.concatenate(out_focal)),
            }
        )

    ds = _read(sf_dir, "customer", ["c_custkey"])
    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(
            Sum("n_self", alias_name="n_self"),
            Sum("n_focal", alias_name="n_focal"),
        )
    )


def _build_focal_sum_sql() -> str:
    n_side = 2**FOCAL_RES

    def spread(v: str) -> str:
        return f"(({v} & 1) | (({v} & 2) << 1) | (({v} & 4) << 2) | (({v} & 8) << 3))"

    def gidx(expr: str, lo: float, span: float) -> str:
        return (
            f"least(CAST(floor(greatest((({expr}) - {lo!r}) / {span!r}, 0.0)"
            f" * {float(n_side)!r}) AS BIGINT), {n_side - 1})"
        )

    return f"""
    WITH p AS ({CUSTOMER_POINT_SQL}),
    g AS (
      SELECT {gidx("px", -180.0, 360.0)} AS ix, {gidx("py", -90.0, 180.0)} AS iy
      FROM p
    ),
    h AS (SELECT ix, iy, CAST(COUNT(*) AS BIGINT) AS n FROM g GROUP BY ix, iy),
    d AS (SELECT unnest([-1, 0, 1]) AS o),
    f AS (
      SELECT h.ix + dx.o AS ix, h.iy + dy.o AS iy,
             CASE WHEN dx.o = 0 AND dy.o = 0 THEN n ELSE 0 END AS n_self,
             n AS n_focal
      FROM h, d dx, d dy
      WHERE h.ix + dx.o BETWEEN 0 AND {n_side - 1}
        AND h.iy + dy.o BETWEEN 0 AND {n_side - 1}
    )
    SELECT (CAST({FOCAL_RES} AS BIGINT) << 58)
             | {spread("ix")} | ({spread("iy")} << 1) AS cell,
           CAST(SUM(n_self) AS BIGINT) AS n_self,
           CAST(SUM(n_focal) AS BIGINT) AS n_focal
    FROM f GROUP BY 1
"""


Q_FOCAL_SUM_SQL = _build_focal_sum_sql()


def q_cell_rollup(sf_dir: str):
    """Multi-resolution spatial density rollup: customer-point counts
    per cell at res 2/3/4 in ONE pass — the tile-pyramid aggregation a
    map service precomputes.  The per-batch combiner emits every
    level's partial counts together (the spatial analogue of
    rollup_sales' multi-level partials), so all three pyramid levels
    share a single groupby(cell) exchange instead of one scan+shuffle
    per level; the exchange moves ≤ Σ distinct cells per block."""
    from ray.data.aggregate import Sum

    from ..stages.cells import cell_encode

    def partial(b: pa.Table) -> pa.Table:
        p = _customer_point_batch(b)
        px = p["px"].to_numpy()
        py = p["py"].to_numpy()
        cells = np.concatenate(
            [cell_encode(px, py, r).view(np.int64) for r in CELL_ROLLUP_LEVELS]
        )
        uniq, counts = np.unique(cells, return_counts=True)
        return pa.table(
            {
                "cell": pa.array(uniq, pa.int64()),
                "n": pa.array(counts.astype(np.int64)),
            }
        )

    ds = _read(sf_dir, "customer", ["c_custkey"])
    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(Sum("n", alias_name="n"))
    )


def _build_cell_rollup_sql() -> str:
    """SQL mirror of q_cell_rollup: the engine's grid-index expression
    ((x-lo)/span, clamp, truncate) and 4-bit Morton spread per level,
    unioned, then COUNT per cell."""

    def spread(v: str) -> str:
        return f"(({v} & 1) | (({v} & 2) << 1) | (({v} & 4) << 2) | (({v} & 8) << 3))"

    def gidx(expr: str, lo: float, span: float, n_side: int) -> str:
        return (
            f"least(CAST(floor(greatest((({expr}) - {lo!r}) / {span!r}, 0.0)"
            f" * {float(n_side)!r}) AS BIGINT), {n_side - 1})"
        )

    parts = []
    for r in CELL_ROLLUP_LEVELS:
        n_side = 2**r
        gx = gidx("px", -180.0, 360.0, n_side)
        gy = gidx("py", -90.0, 180.0, n_side)
        parts.append(
            f"SELECT (CAST({r} AS BIGINT) << 58) | {spread(gx)}"
            f" | ({spread(gy)} << 1) AS cell FROM pts"
        )
    union = "\n      UNION ALL\n      ".join(parts)
    return f"""
    WITH pts AS ({CUSTOMER_POINT_SQL}),
    c AS (
      {union}
    )
    SELECT cell, CAST(COUNT(*) AS BIGINT) AS n FROM c GROUP BY cell
"""


Q_CELL_ROLLUP_SQL = _build_cell_rollup_sql()


CELL_COMPACT_RES = 4  # compact occupied res-4 cells down to res 2


def q_cell_compact(sf_dir: str):
    """Hierarchical cell-set compaction (the H3 ``compact`` API): the
    DISTINCT cells occupied by customer points at res 4, with every
    complete sibling QUARTET replaced by its parent, applied level by
    level down to res 2 — the canonical way to store a coverage set in
    O(boundary) instead of O(area) cells.

    Scale shape: per-block distinct partials shrink the exchange to
    unique cells per block; the groupby(cell) count is over a
    RESOLUTION-BOUNDED key space (≤ 4^res cells — bounded by the grid,
    never by rows, so the generic aggregate is safe); the compaction
    kernel then runs on one block (the distinct-cell set is ≤ 4^res
    rows by construction — document-bounded, not data-bounded).
    Parent arithmetic is ``morton >> 2`` (stages/cells.py id layout),
    mirrored bit-for-bit in SQL."""
    from ..stages.cells import cell_encode, cell_res, cell_xy

    R = CELL_COMPACT_RES

    def partial(b: pa.Table) -> pa.Table:
        p = _customer_point_batch(b)
        cells = cell_encode(p["px"].to_numpy(), p["py"].to_numpy(), R)
        return pa.table({"cell": pa.array(np.unique(cells.view(np.int64)))})

    def compact(batch: pa.Table) -> pa.Table:
        cells = np.unique(batch["cell"].to_numpy().view(np.uint64))
        out = []
        cur = cells
        for lvl in range(R, 2, -1):
            morton = cur & np.uint64((1 << 58) - 1)
            parents = morton >> np.uint64(2)
            uniq_p, counts = np.unique(parents, return_counts=True)
            full = uniq_p[counts == 4]
            keep = ~np.isin(parents, full)
            out.append(cur[keep])
            cur = (np.uint64(lvl - 1) << np.uint64(58)) | full
        out.append(cur)
        allc = np.concatenate(out)
        return pa.table(
            {
                "cell": pa.array(allc.view(np.int64), pa.int64()),
                "res": pa.array(cell_res(allc).astype(np.int64), pa.int64()),
            }
        )

    ds = _read(sf_dir, "customer", ["c_custkey"])
    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("cell")
        .count()
        .select_columns(["cell"])
        .repartition(1)
        .map_batches(compact, batch_format="pyarrow", batch_size=None)
    )


def q_cell_uncompact(sf_dir: str):
    """Inverse of cell_compact (the H3 ``uncompact`` API): expand the
    compacted mixed-resolution cover back to uniform res-4 cells — a
    vectorized children fan-out (morton << 2 per level, 4^Δ offsets per
    cell).  Driver equality against the DISTINCT occupied res-4 cell
    set proves the compact→uncompact round trip is LOSSLESS, in the
    engine and in the oracle's independent arithmetic."""
    R = CELL_COMPACT_RES

    def expand(batch: pa.Table) -> pa.Table:
        cells = batch["cell"].to_numpy().view(np.uint64)
        res = (cells >> np.uint64(58)).astype(np.int64)
        morton = cells & np.uint64((1 << 58) - 1)
        out = []
        for r in np.unique(res):
            m = morton[res == r]
            d = int(R - r)
            base = m << np.uint64(2 * d)
            offs = np.arange(4**d, dtype=np.uint64)
            full = (base[:, None] | offs[None, :]).ravel()
            out.append((np.uint64(R) << np.uint64(58)) | full)
        allc = np.concatenate(out) if out else np.empty(0, np.uint64)
        return pa.table({"cell": pa.array(allc.view(np.int64), pa.int64())})

    return q_cell_compact(sf_dir).map_batches(expand, batch_format="pyarrow")


def _build_cell_uncompact_sql() -> str:
    def spread(v: str) -> str:
        return f"(({v} & 1) | (({v} & 2) << 1) | (({v} & 4) << 2) | (({v} & 8) << 3))"

    def gidx(expr: str, lo: float, span: float, n_side: int) -> str:
        return (
            f"least(CAST(floor(greatest((({expr}) - {lo!r}) / {span!r}, 0.0)"
            f" * {float(n_side)!r}) AS BIGINT), {n_side - 1})"
        )

    R = CELL_COMPACT_RES
    n_side = 2**R
    gx = gidx("px", -180.0, 360.0, n_side)
    gy = gidx("py", -90.0, 180.0, n_side)
    return f"""
    WITH pts AS ({CUSTOMER_POINT_SQL})
    SELECT DISTINCT (CAST({R} AS BIGINT) << 58)
           | {spread(gx)} | ({spread(gy)} << 1) AS cell
    FROM pts
"""


def _build_cell_compact_sql() -> str:
    def spread(v: str) -> str:
        return f"(({v} & 1) | (({v} & 2) << 1) | (({v} & 4) << 2) | (({v} & 8) << 3))"

    def gidx(expr: str, lo: float, span: float, n_side: int) -> str:
        return (
            f"least(CAST(floor(greatest((({expr}) - {lo!r}) / {span!r}, 0.0)"
            f" * {float(n_side)!r}) AS BIGINT), {n_side - 1})"
        )

    R = CELL_COMPACT_RES
    n_side = 2**R
    gx = gidx("px", -180.0, 360.0, n_side)
    gy = gidx("py", -90.0, 180.0, n_side)
    return f"""
    WITH pts AS ({CUSTOMER_POINT_SQL}),
    c4 AS (SELECT DISTINCT {spread(gx)} | ({spread(gy)} << 1) AS m FROM pts),
    f3 AS (SELECT m >> 2 AS m FROM c4 GROUP BY m >> 2 HAVING COUNT(*) = 4),
    k4 AS (SELECT m FROM c4 WHERE m >> 2 NOT IN (SELECT m FROM f3)),
    f2 AS (SELECT m >> 2 AS m FROM f3 GROUP BY m >> 2 HAVING COUNT(*) = 4),
    k3 AS (SELECT m FROM f3 WHERE m >> 2 NOT IN (SELECT m FROM f2))
    SELECT (CAST({R} AS BIGINT) << 58) | m AS cell, CAST({R} AS BIGINT) AS res FROM k4
    UNION ALL
    SELECT (CAST({R - 1} AS BIGINT) << 58) | m, CAST({R - 1} AS BIGINT) FROM k3
    UNION ALL
    SELECT (CAST({R - 2} AS BIGINT) << 58) | m, CAST({R - 2} AS BIGINT) FROM f2
"""


def q_dim_stats(sf_dir: str):
    """Per-dimension embedding profile (sum/min/max in quantized
    int64): the normalization-constant / clip-range / dead-dimension
    pass before training.  Fixed-size aggregate state like the Gram
    matrix — each block folds to 3·d int64, the tree-reduce combines,
    the driver pull is 1.5 KiB at d=64 regardless of row count."""
    from ..stages.linalg import build_dim_stats

    ds = _read(sf_dir, "embeddings", ["embedding"])
    st = build_dim_stats(ds, "embedding", GRAM_DIM)
    return pa.table(
        {
            "dim": pa.array(np.arange(GRAM_DIM, dtype=np.int64), pa.int64()),
            "sum_q": pa.array(st["sum"], pa.int64()),
            "min_q": pa.array(st["min"], pa.int64()),
            "max_q": pa.array(st["max"], pa.int64()),
        }
    )


Q_DIM_STATS_SQL = f"""
    WITH q AS (
      SELECT list_transform(
               embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)
             ) AS qv
      FROM embeddings
    ),
    idx AS (SELECT unnest(range(1, {GRAM_DIM + 1})) AS a)
    SELECT CAST(i.a - 1 AS BIGINT) AS dim,
           CAST(SUM(q.qv[i.a]) AS BIGINT) AS sum_q,
           CAST(MIN(q.qv[i.a]) AS BIGINT) AS min_q,
           CAST(MAX(q.qv[i.a]) AS BIGINT) AS max_q
    FROM q, idx i
    GROUP BY 1
"""


def q_spatial_antijoin(sf_dir: str):
    """Spatial ANTI-join: customer points contained in NO part rect.
    Same one-shuffle PBSM layout as pip_join (points to their single
    home cell, rects replicated to covering cells), but the per-cell
    kernel emits the points with zero containing rects — each point is
    decided entirely within its home cell, so no second pass and no
    dedup.  The rect side is a keyed subset (p_partkey % 29 == 0) so
    the anti-set is non-trivial at every tested scale — full coverage
    would make the query vacuous."""
    from ..stages.cells import cell_encode, explode_to_cells

    def point_rows(batch: pa.Table) -> pa.Table:
        batch = _customer_point_batch(batch)
        cells = cell_encode(batch["px"].to_numpy(), batch["py"].to_numpy(), KNN_RES)
        n = batch.num_rows
        return pa.table(
            {
                "cell": pa.array(cells.view(np.int64), pa.int64()),
                "c_custkey": batch["c_custkey"],
                "px": batch["px"],
                "py": batch["py"],
                "minx": pa.array(np.zeros(n)),
                "miny": pa.array(np.zeros(n)),
                "maxx": pa.array(np.zeros(n)),
                "maxy": pa.array(np.zeros(n)),
                "side": pa.array(["point"] * n),
            }
        )

    def rect_rows(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pa.array(batch["p_partkey"].to_numpy() % 29 == 0))
        batch = _part_rect_batch(batch)
        exploded = explode_to_cells(batch, KNN_RES)
        n = exploded.num_rows
        return pa.table(
            {
                "cell": exploded["cell"],
                "c_custkey": pa.array(np.zeros(n, dtype=np.int64)),
                "px": pa.array(np.zeros(n)),
                "py": pa.array(np.zeros(n)),
                "minx": exploded["minx"],
                "miny": exploded["miny"],
                "maxx": exploded["maxx"],
                "maxy": exploded["maxy"],
                "side": pa.array(["rect"] * n),
            }
        )

    def anti_group(group: pa.Table) -> pa.Table:
        is_pt = pc.equal(group["side"], "point")
        pts = group.filter(is_pt)
        if pts.num_rows == 0:
            return pa.schema([pa.field("c_custkey", pa.int64())]).empty_table()
        rects = group.filter(pc.invert(is_pt))
        px = pts["px"].to_numpy()
        py = pts["py"].to_numpy()
        matched = np.zeros(len(px), dtype=bool)
        rminx = rects["minx"].to_numpy()
        rminy = rects["miny"].to_numpy()
        rmaxx = rects["maxx"].to_numpy()
        rmaxy = rects["maxy"].to_numpy()
        chunk = max(1, MAX_CONTAIN_MATRIX // max(1, len(px)))
        for lo in range(0, len(rminx), chunk):
            hi = min(lo + chunk, len(rminx))
            inside = (
                (px[None, :] >= rminx[lo:hi, None])
                & (px[None, :] <= rmaxx[lo:hi, None])
                & (py[None, :] >= rminy[lo:hi, None])
                & (py[None, :] <= rmaxy[lo:hi, None])
            )
            matched |= inside.any(axis=0)
        return pa.table({"c_custkey": pts["c_custkey"].filter(pa.array(~matched))})

    points = _read(sf_dir, "customer", ["c_custkey"]).map_batches(
        point_rows, batch_format="pyarrow"
    )
    rects = _read(sf_dir, "part", ["p_partkey", "p_size"]).map_batches(
        rect_rows, batch_format="pyarrow"
    )
    return points.union(rects).groupby("cell").map_groups(
        anti_group, batch_format="pyarrow"
    )


Q_SPATIAL_ANTIJOIN_SQL = f"""
    WITH r AS (
      SELECT * FROM ({PART_RECT_SQL}) WHERE p_partkey % 29 = 0
    ), p AS ({CUSTOMER_POINT_SQL})
    SELECT p.c_custkey FROM p
    WHERE NOT EXISTS (
      SELECT 1 FROM r
      WHERE p.px >= r.minx AND p.px <= r.maxx
        AND p.py >= r.miny AND p.py <= r.maxy)
"""


COOC_WORD_TOP = 30
COOC_VOCAB = 100


def q_word_pairs(sf_dir: str):
    """Word co-occurrence (skip-gram statistics): the top pairs of
    TOP-100-VOCABULARY words appearing in the same document — the
    counting pass behind PMI / embedding training.  Phase 1 derives
    the vocabulary exactly (vocab_topk's aggregate, deterministic
    tie-break) and BROADCASTS the ≤100-word id map; phase 2 is the
    basket shape: doc-bucketed dedupe of (doc, word-id) pairs,
    offset-vectorized pair fan-out, pair-bucketed sort+reduceat merge
    forwarding only per-bucket top-k into the bounded final sort."""
    import ray
    from ray.data.aggregate import Sum

    from ..stages.footprint import _splitmix64

    N_BUCKETS = 64

    def term_rows(b: pa.Table) -> pa.Table:
        words = pc.split_pattern_regex(pc.utf8_lower(b["text"]), "[^a-z]+")
        n_per = pc.list_value_length(words).to_numpy().astype(np.int64)
        flat = words.combine_chunks().flatten() if isinstance(
            words, pa.ChunkedArray
        ) else words.flatten()
        doc = np.repeat(b["doc_id"].to_numpy(), n_per)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(doc[keep], pa.int64()),
                "term": flat.filter(pa.array(keep)),
            }
        )

    # phase 1: exact top-100 vocabulary (same machinery as vocab_topk)
    def term_counts(b: pa.Table) -> pa.Table:
        agg = pa.TableGroupBy(b.select(["term"]), "term").aggregate(
            [([], "count_all")]
        )
        return agg.rename_columns(["term", "n"])

    terms = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        term_rows, batch_format="pyarrow"
    )
    vocab_rows = (
        terms.map_batches(term_counts, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("n", alias_name="n"))
        .sort(["n", "term"], descending=[True, False])
        .limit(COOC_VOCAB)
        .take_all()
    )  # ≤ 100 rows on the driver, then broadcast
    vocab = [r["term"] for r in vocab_rows]
    vocab_ref = ray.put({w: i for i, w in enumerate(vocab)})

    def bucket(b: pa.Table) -> pa.Table:
        vmap = ray.get(vocab_ref)
        ids = np.array(
            [vmap.get(t, -1) for t in b["term"].to_pylist()], dtype=np.int64
        )
        keep = ids >= 0
        doc = b["doc_id"].to_numpy()[keep]
        h = _splitmix64(doc.astype(np.uint64)) % np.uint64(N_BUCKETS)
        return pa.table(
            {
                "doc_id": pa.array(doc),
                "wid": pa.array(ids[keep]),
                "bucket": pa.array(h.astype(np.int64)),
            }
        )

    def _triu(group_keys, values):
        starts = np.concatenate(
            ([0], np.flatnonzero(group_keys[1:] != group_keys[:-1]) + 1)
        )
        lens = np.diff(np.concatenate((starts, [len(group_keys)])))
        out_a, out_b = [], []
        kmax = int(lens.max()) if len(lens) else 0
        for a in range(kmax - 1):
            m = lens > a + 1
            if not m.any():
                break
            nb = lens[m] - a - 1
            bstart = starts[m] + a + 1
            total = int(nb.sum())
            csum = np.concatenate(([0], np.cumsum(nb)[:-1]))
            idx = (
                np.arange(total, dtype=np.int64)
                - np.repeat(csum, nb)
                + np.repeat(bstart, nb)
            )
            out_b.append(values[idx])
            out_a.append(np.repeat(values[starts[m] + a], nb))
        if not out_a:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        return np.concatenate(out_a), np.concatenate(out_b)

    def doc_pairs(group: pa.Table) -> pa.Table:
        doc = group["doc_id"].to_numpy()
        wid = group["wid"].to_numpy()
        order = np.lexsort((wid, doc))
        doc, wid = doc[order], wid[order]
        keep = np.concatenate(
            ([True], (doc[1:] != doc[:-1]) | (wid[1:] != wid[:-1]))
        )
        doc, wid = doc[keep], wid[keep]
        a, b_ = _triu(doc, wid)
        key = a * COOC_VOCAB + b_
        key, cnt = np.unique(key, return_counts=True)
        h = _splitmix64(key.astype(np.uint64)) % np.uint64(N_BUCKETS)
        return pa.table(
            {
                "pair_key": pa.array(key),
                "n": pa.array(cnt.astype(np.int64)),
                "pbucket": pa.array(h.astype(np.int64)),
            }
        )

    def merge_topk(group: pa.Table) -> pa.Table:
        vmap = ray.get(vocab_ref)
        inv = list(vmap)  # insertion order == id order
        k = group["pair_key"].to_numpy()
        n = group["n"].to_numpy()
        order = np.argsort(k, kind="stable")
        k, n = k[order], n[order]
        starts = np.concatenate(([0], np.flatnonzero(k[1:] != k[:-1]) + 1))
        tot = np.add.reduceat(n, starts)
        uk = k[starts]
        # decode to LEXICOGRAPHIC (word_a < word_b) pair order and cut
        # top-k with the same tie-break the final global sort uses —
        # an id-order cut could drop a boundary tie the lexicographic
        # order keeps
        pairs = [
            tuple(sorted((inv[v // COOC_VOCAB], inv[v % COOC_VOCAB])))
            for v in uk
        ]
        wa = np.array([p_[0] for p_ in pairs], dtype=object)
        wb = np.array([p_[1] for p_ in pairs], dtype=object)
        top = np.lexsort((wb, wa, -tot))[:COOC_WORD_TOP]
        return pa.table(
            {
                "word_a": pa.array(wa[top], pa.string()),
                "word_b": pa.array(wb[top], pa.string()),
                "n": pa.array(tot[top].astype(np.int64)),
            }
        )

    return (
        terms.map_batches(bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(doc_pairs, batch_format="pyarrow")
        .groupby("pbucket")
        .map_groups(merge_topk, batch_format="pyarrow")
        .sort(["n", "word_a", "word_b"], descending=[True, False, False])
        .limit(COOC_WORD_TOP)
    )


Q_WORD_PAIRS_SQL = f"""
    WITH t AS (
      SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z]+')) AS term
      FROM documents
    ),
    tt AS (SELECT doc_id, term FROM t WHERE term <> ''),
    vocab AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS n
      FROM tt GROUP BY term ORDER BY n DESC, term LIMIT {COOC_VOCAB}
    ),
    dv AS (SELECT DISTINCT tt.doc_id, tt.term FROM tt JOIN vocab USING (term)),
    p AS (
      SELECT a.term AS word_a, b.term AS word_b, CAST(COUNT(*) AS BIGINT) AS n
      FROM dv a JOIN dv b
        ON a.doc_id = b.doc_id AND a.term < b.term
      GROUP BY 1, 2
    )
    SELECT word_a, word_b, n FROM p
    ORDER BY n DESC, word_a, word_b LIMIT {COOC_WORD_TOP}
"""


def q_vocab_topk(sf_dir: str):
    """Vocabulary building: top-50 corpus terms by total occurrences —
    the canonical map-reduce word count.  One vectorized RE2 pass per
    batch (lower → split), per-batch value_counts combiner, ONE
    groupby(term) shuffle of (term, n) partials, then the small global
    top-k sort.  Ties broken by term so the cut at rank 50 is
    deterministic."""
    from ray.data.aggregate import Sum

    def term_counts(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(batch["text"]), "[^a-z]+")
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = flat.value_counts()
        return pa.table(
            {"term": vc.field("values"), "n": vc.field("counts").cast(pa.int64())}
        )

    ds = _read(sf_dir, "documents", ["text"])
    counts = (
        ds.map_batches(term_counts, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("n", alias_name="n"))
    )
    return counts.sort(["n", "term"], descending=[True, False]).limit(50)


Q_VOCAB_TOPK_SQL = """
    WITH t AS (
      SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS term
      FROM documents
    )
    SELECT term, CAST(COUNT(*) AS BIGINT) AS n
    FROM t WHERE term <> ''
    GROUP BY term ORDER BY n DESC, term LIMIT 50
"""


def q_dist_join(sf_dir: str):
    """Distance-band spatial self-join: customer point pairs within
    eps=5 (PBSM home-point rule, stages/dist_join.py — one shuffle,
    ≤9× replication, exactly-once without a dedup pass).  Coordinates
    are integer lattice points so d² is integer-exact."""
    from ..stages.dist_join import dist_join_pipeline

    pts = _read(sf_dir, "customer", ["c_custkey"]).map_batches(
        lambda b: pa.table(
            {
                "c_custkey": b["c_custkey"],
                "px": _customer_point_batch(b)["px"],
                "py": _customer_point_batch(b)["py"],
            }
        ),
        batch_format="pyarrow",
    )
    return dist_join_pipeline(
        pts, eps=5.0, res=5, id_col="c_custkey", x_col="px", y_col="py"
    )


Q_DIST_JOIN_SQL = f"""
    WITH pts AS ({CUSTOMER_POINT_SQL})
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           CAST((a.px - b.px) * (a.px - b.px)
              + (a.py - b.py) * (a.py - b.py) AS BIGINT) AS d2
    FROM pts a JOIN pts b
      ON a.c_custkey < b.c_custkey
     AND (a.px - b.px) * (a.px - b.px)
       + (a.py - b.py) * (a.py - b.py) <= 25.0
"""


def q_cube_sales(sf_dir: str):
    """CUBE / full grouping-sets aggregate: all FOUR levels —
    (flag, status), (flag), (status), grand total — from ONE scan and
    ONE shuffle.  Same multi-level-partials shape as rollup_sales
    (coarser levels derive from each block's finest partial, sentinel
    'ALL' for cubed-away keys); the exchange carries ≤
    (|flags|+1)·(|statuses|+1) rows per block."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        qty = np.floor(batch["l_quantity"].to_numpy() + 0.5).astype(np.int64)
        price_c = _cents(batch["l_extendedprice"].to_numpy())
        t = pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "qty": pa.array(qty),
                "price_c": pa.array(price_c),
                "n": pa.array(np.ones(len(qty), dtype=np.int64)),
            }
        )

        def agg(tbl: pa.Table, keys: list[str]) -> pa.Table:
            g = pa.TableGroupBy(tbl, keys).aggregate(
                [("qty", "sum"), ("price_c", "sum"), ("n", "sum")]
            )
            cols = {k: g[k] for k in keys}
            for rolled in ("l_returnflag", "l_linestatus"):
                if rolled not in keys:
                    cols[rolled] = pa.array(["ALL"] * g.num_rows)
            cols["n"] = g["n_sum"]
            cols["sum_qty"] = g["qty_sum"]
            cols["sum_price_c"] = g["price_c_sum"]
            names = ["l_returnflag", "l_linestatus", "n", "sum_qty", "sum_price_c"]
            return pa.table({k: cols[k] for k in names})

        finest = agg(t, ["l_returnflag", "l_linestatus"])
        mid = pa.table(
            {
                "l_returnflag": finest["l_returnflag"],
                "l_linestatus": finest["l_linestatus"],
                "qty": finest["sum_qty"],
                "price_c": finest["sum_price_c"],
                "n": finest["n"],
            }
        )
        return pa.concat_tables(
            [
                finest,
                agg(mid, ["l_returnflag"]),
                agg(mid, ["l_linestatus"]),
                agg(mid, []),
            ]
        )

    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
    )
    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_price_c", alias_name="sum_price_c"),
        )
    )


Q_CUBE_SALES_SQL = """
    SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
           COALESCE(l_linestatus, 'ALL') AS l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS sum_price_c
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def q_rollup_sales(sf_dir: str):
    """ROLLUP / grouping-sets aggregate: lineitem quantity + revenue
    totals at three levels — (returnflag, linestatus), (returnflag),
    grand total — in ONE shuffle.  Each batch pre-aggregates the
    finest level locally, derives the coarser levels from those
    partials (sentinel 'ALL' for rolled-up keys), and ships ≤
    |flags|·|statuses|+|flags|+1 rows; a single
    groupby(flag, status).Sum finishes every level at once."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        qty = np.floor(batch["l_quantity"].to_numpy() + 0.5).astype(np.int64)
        price_c = _cents(batch["l_extendedprice"].to_numpy())
        t = pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "qty": pa.array(qty),
                "price_c": pa.array(price_c),
                "n": pa.array(np.ones(len(qty), dtype=np.int64)),
            }
        )

        def agg(tbl: pa.Table, keys: list[str]) -> pa.Table:
            g = pa.TableGroupBy(tbl, keys).aggregate(
                [("qty", "sum"), ("price_c", "sum"), ("n", "sum")]
            )
            cols = {k: g[k] for k in keys}
            for rolled in ("l_returnflag", "l_linestatus"):
                if rolled not in keys:
                    cols[rolled] = pa.array(["ALL"] * g.num_rows)
            cols["n"] = g["n_sum"]
            cols["sum_qty"] = g["qty_sum"]
            cols["sum_price_c"] = g["price_c_sum"]
            names = ["l_returnflag", "l_linestatus", "n", "sum_qty", "sum_price_c"]
            return pa.table({k: cols[k] for k in names})

        finest = agg(t, ["l_returnflag", "l_linestatus"])
        # coarser levels derive from the finest partial, not the raw rows
        mid = pa.table(
            {
                "l_returnflag": finest["l_returnflag"],
                "l_linestatus": finest["l_linestatus"],
                "qty": finest["sum_qty"],
                "price_c": finest["sum_price_c"],
                "n": finest["n"],
            }
        )
        return pa.concat_tables(
            [finest, agg(mid, ["l_returnflag"]), agg(mid, [])]
        )

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"])
    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_price_c", alias_name="sum_price_c"),
        )
    )


Q_ROLLUP_SALES_SQL = """
    SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
           COALESCE(l_linestatus, 'ALL') AS l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS sum_price_c
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
"""


def q_tfidf_topterms(sf_dir: str):
    """TF-IDF feature extraction: each document's top-3 terms from the
    top-100-by-df corpus vocabulary, scored tf × idf with integer
    arithmetic (idf_scaled = (N·10⁶) // df) so the oracle mirrors it
    exactly.  Two passes over the corpus — the unavoidable shape: a
    global df aggregate (term,n partials only on the wire), then a
    broadcast of the 100-term vocabulary into a shuffle-free scoring
    pass (a doc's terms are derived in-batch, so per-batch top-k is
    final).  The driver pulls exactly V=100 vocabulary rows — bounded
    regardless of corpus size."""
    from ray.data.aggregate import Sum

    from ..stages.text import (
        TFIDF_SCALE,
        df_partial_from_tf,
        doc_term_tf_batch,
        make_tfidf_scorer,
    )

    V, K = 100, 3
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    n_docs = _read(sf_dir, "documents", ["doc_id"]).count()
    df = (
        docs.map_batches(
            lambda b: df_partial_from_tf(doc_term_tf_batch(b)),
            batch_format="pyarrow",
        )
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"))
    )
    vocab = df.sort(["df", "term"], descending=[True, False]).limit(V).take_all()
    terms = np.array([r["term"] for r in vocab])
    idf = np.array(
        [(n_docs * TFIDF_SCALE) // r["df"] for r in vocab], dtype=np.int64
    )
    order = np.argsort(terms)
    scorer = make_tfidf_scorer(terms[order], idf[order], K)
    return docs.map_batches(scorer, batch_format="pyarrow")


Q_TFIDF_SQL = """
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z]+')) AS term
      FROM documents
    ),
    t AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM tok WHERE term <> '' GROUP BY doc_id, term
    ),
    df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM t GROUP BY term),
    v AS (
      SELECT term, ((SELECT COUNT(*) FROM documents) * 1000000) // df AS idf_s
      FROM df ORDER BY df DESC, term LIMIT 100
    ),
    s AS (
      SELECT t.doc_id, t.term, t.tf, t.tf * v.idf_s AS score
      FROM t JOIN v ON t.term = v.term
    ),
    r AS (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY doc_id ORDER BY score DESC, term) AS rank
      FROM s
    )
    SELECT doc_id, term, tf, CAST(score AS BIGINT) AS score,
           CAST(rank AS BIGINT) AS rank
    FROM r WHERE rank <= 3
"""


def q_quartile_label(sf_dir: str):
    """Quantile binning / NTILE-by-value: global exact quartile cut
    points of l_quantity (rank arithmetic over a tiny value
    histogram), broadcast back over the stream to label every row,
    then counts per (returnflag, quartile) — the two-phase
    "small exact aggregate → broadcast → big labeling pass" pattern
    feature binning uses.  The cut points are ≤ 50 ints on the
    driver; the labeling pass is one vectorized compare per row."""
    from ray.data.aggregate import Sum

    def hist_partial(b: pa.Table) -> pa.Table:
        qty = np.floor(b["l_quantity"].to_numpy() + 0.5).astype(np.int64)
        uq, cnt = np.unique(qty, return_counts=True)
        return pa.table(
            {"q": pa.array(uq), "n": pa.array(cnt.astype(np.int64))}
        )

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])
    hist = (
        ds.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("q")
        .aggregate(Sum("n", alias_name="n"))
    )
    rows = sorted((r["q"], r["n"]) for r in hist.take_all())  # ≤ ~50 rows
    vals = np.array([r[0] for r in rows], dtype=np.int64)
    cum = np.cumsum(np.array([r[1] for r in rows], dtype=np.int64))
    tot = int(cum[-1])
    c25 = int(vals[np.searchsorted(cum, (tot + 3) // 4)])
    c50 = int(vals[np.searchsorted(cum, (tot + 1) // 2)])
    c75 = int(vals[np.searchsorted(cum, (3 * tot + 3) // 4)])

    def label(b: pa.Table) -> pa.Table:
        qty = np.floor(b["l_quantity"].to_numpy() + 0.5).astype(np.int64)
        quart = 1 + (qty > c25).astype(np.int64) + (qty > c50) + (qty > c75)
        t = pa.table(
            {
                "l_returnflag": b["l_returnflag"],
                "quartile": pa.array(quart),
                "n": pa.array(np.ones(len(qty), dtype=np.int64)),
            }
        )
        agg = pa.TableGroupBy(t, ["l_returnflag", "quartile"]).aggregate(
            [("n", "sum")]
        )
        return agg.rename_columns(["l_returnflag", "quartile", "n"])

    return (
        ds.map_batches(label, batch_format="pyarrow")
        .groupby(["l_returnflag", "quartile"])
        .aggregate(Sum("n", alias_name="n"))
    )


Q_QUARTILE_LABEL_SQL = """
    WITH v AS (
      SELECT l_returnflag,
             CAST(floor(l_quantity + 0.5) AS BIGINT) AS q
      FROM lineitem
    ),
    h AS (SELECT q, CAST(COUNT(*) AS BIGINT) AS n FROM v GROUP BY q),
    c AS (
      SELECT q,
             SUM(n) OVER (ORDER BY q ROWS UNBOUNDED PRECEDING) AS cum,
             (SELECT SUM(n) FROM h) AS tot
      FROM h
    ),
    cuts AS (
      SELECT MIN(CASE WHEN cum >= (tot + 3) // 4 THEN q END) AS c25,
             MIN(CASE WHEN cum >= (tot + 1) // 2 THEN q END) AS c50,
             MIN(CASE WHEN cum >= (3 * tot + 3) // 4 THEN q END) AS c75
      FROM c
    )
    SELECT l_returnflag,
           CAST(1 + (q > c25)::BIGINT + (q > c50)::BIGINT
                  + (q > c75)::BIGINT AS BIGINT) AS quartile,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM v, cuts
    GROUP BY 1, 2
"""


def q_group_quantiles(sf_dir: str):
    """Exact distributed quantiles (p50/p90 of l_quantity per return
    flag) via value-histogram compression: each batch emits (group,
    value, count) partials — the exchange carries at most (batches ×
    groups × distinct-values) rows, independent of row count — and the
    per-group finalizer merges histograms and reads the quantile off
    the cumulative counts.  Rank semantics are explicit integers
    (ceil(q·n) = (q_num·n + q_den − 1) // q_den) so the SQL mirror is
    arithmetic, not a builtin."""

    def partial(batch: pa.Table) -> pa.Table:
        qty = np.floor(batch["l_quantity"].to_numpy() + 0.5).astype(np.int64)
        t = pa.table({"l_returnflag": batch["l_returnflag"], "qty": pa.array(qty)})
        agg = pa.TableGroupBy(t, ["l_returnflag", "qty"]).aggregate([("qty", "count")])
        return pa.table(
            {
                "l_returnflag": agg["l_returnflag"],
                "qty": agg["qty"],
                "n": agg["qty_count"].cast(pa.int64()),
            }
        )

    def final(group: pa.Table) -> pa.Table:
        qty = group["qty"].to_numpy()
        n = group["n"].to_numpy()
        order = np.argsort(qty, kind="stable")
        qty, n = qty[order], n[order]
        # collapse duplicate values across partials
        uq, inv = np.unique(qty, return_inverse=True)
        counts = np.zeros(len(uq), dtype=np.int64)
        np.add.at(counts, inv, n)
        cum = np.cumsum(counts)
        total = int(cum[-1])
        r50 = (total + 1) // 2
        r90 = (9 * total + 9) // 10
        p50 = int(uq[np.searchsorted(cum, r50)])
        p90 = int(uq[np.searchsorted(cum, r90)])
        return pa.table(
            {
                "l_returnflag": group["l_returnflag"][:1],
                "n": pa.array([total], pa.int64()),
                "p50_qty": pa.array([p50], pa.int64()),
                "p90_qty": pa.array([p90], pa.int64()),
            }
        )

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])
    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("l_returnflag")
        .map_groups(final, batch_format="pyarrow")
    )


def q_anti_join(sf_dir: str):
    """Equi ANTI-join: customers with no URGENT order (the relational
    cousin of the spatial anti-join).  Same one-shuffle bucketed plan
    as the inner shuffle_hash_join — all rows of a key land in one
    bucket, so the bucket-local Acero left-anti verdict is the global
    verdict; the build side is filtered at the read and ships only its
    key column into the exchange."""
    from ..stages.join import shuffle_hash_join

    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])

    def urgent_keys(b: pa.Table) -> pa.Table:
        keep = pc.equal(b["o_orderpriority"], "1-URGENT")
        return pa.table({"c_custkey": b.filter(keep)["o_custkey"]})

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"]).map_batches(
        urgent_keys, batch_format="pyarrow"
    )
    return shuffle_hash_join(
        cust,
        orders,
        "c_custkey",
        ["c_name"],
        [],
        how="anti",
        left_schema=pa.schema(
            [pa.field("c_custkey", pa.int64()), pa.field("c_name", pa.string())]
        ),
        right_schema=pa.schema([pa.field("c_custkey", pa.int64())]),
    )


Q_ANTI_JOIN_SQL = """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
"""


def q_semi_join(sf_dir: str):
    """Equi SEMI-join with a bloom pre-filter: customers having ≥1
    high-value order.  The build side's keys are folded into ONE
    broadcast bitmap (distributed OR tree-reduce, 1 MiB on the driver
    regardless of build size); the probe side sheds definite
    non-matches BEFORE the shuffle — at 100 TB that's the difference
    between exchanging every customer row and only plausible matches.
    False positives are resolved exactly by the bucket-local Acero
    semi join, so the result is still exact."""
    import ray

    from ..stages.join import bloom_prefilter, build_bloom, shuffle_hash_join

    def hi_keys(b: pa.Table) -> pa.Table:
        keep = pc.greater(b["o_totalprice"], 450000.0)
        return pa.table({"c_custkey": b.filter(keep)["o_custkey"]})

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        hi_keys, batch_format="pyarrow"
    )
    words = build_bloom(orders, "c_custkey")
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    cust = bloom_prefilter(cust, ray.put(words), "c_custkey")
    return shuffle_hash_join(
        cust,
        orders,
        "c_custkey",
        ["c_name"],
        [],
        how="semi",
        left_schema=pa.schema(
            [pa.field("c_custkey", pa.int64()), pa.field("c_name", pa.string())]
        ),
        right_schema=pa.schema([pa.field("c_custkey", pa.int64())]),
    )


Q_SEMI_JOIN_SQL = """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000.0)
"""


def q_left_join(sf_dir: str):
    """Left OUTER equi-join: every customer, with their URGENT orders
    attached and typed-null order columns where none exist — the join
    shape that preserves the driving table (feature enrichment where
    missing is meaningful).  Same one-shuffle bucketed plan; the
    bucket-local Acero left-outer verdict is global because all rows
    of a key share a bucket."""
    from ..stages.join import shuffle_hash_join

    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])

    def urgent(b: pa.Table) -> pa.Table:
        keep = pc.equal(b["o_orderpriority"], "1-URGENT")
        kept = b.filter(keep)
        return pa.table(
            {
                "c_custkey": kept["o_custkey"],
                "o_orderkey": kept["o_orderkey"],
                "price_c": pa.array(_cents(kept["o_totalprice"].to_numpy())),
            }
        )

    orders = _read(
        sf_dir, "orders", ["o_custkey", "o_orderkey", "o_orderpriority", "o_totalprice"]
    ).map_batches(urgent, batch_format="pyarrow")
    return shuffle_hash_join(
        cust,
        orders,
        "c_custkey",
        ["c_name"],
        ["o_orderkey", "price_c"],
        how="left",
        left_schema=pa.schema(
            [pa.field("c_custkey", pa.int64()), pa.field("c_name", pa.string())]
        ),
        right_schema=pa.schema(
            [
                pa.field("c_custkey", pa.int64()),
                pa.field("o_orderkey", pa.int64()),
                pa.field("price_c", pa.int64()),
            ]
        ),
    )


Q_LEFT_JOIN_SQL = """
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS price_c
    FROM customer c
    LEFT JOIN orders o
      ON o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
"""


def q_full_join(sf_dir: str):
    """Full OUTER equi-join: a customer SUBSET (custkeys whose low two
    bits are zero, ~every fourth —
    a stand-in for a partially-loaded dimension) against URGENT
    orders.  Keeps matched products, subset customers with no urgent
    order (null order columns) AND urgent orders whose customer is
    outside the subset (null name) — the reconciliation join you run
    when neither side is authoritative.  Same one-shuffle bucketed
    plan as the other four modes; the bucket-local Acero full-outer
    verdict is global because all rows of a key share a bucket, and
    the key column is coalesced across sides per SQL semantics."""
    from ..stages.join import shuffle_hash_join

    def subset(b: pa.Table) -> pa.Table:
        keep = pc.equal(pc.bit_wise_and(b["c_custkey"], 3), 0)
        return b.filter(keep).select(["c_custkey", "c_name"])

    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"]).map_batches(
        subset, batch_format="pyarrow"
    )

    def urgent(b: pa.Table) -> pa.Table:
        keep = pc.equal(b["o_orderpriority"], "1-URGENT")
        kept = b.filter(keep)
        return pa.table(
            {
                "c_custkey": kept["o_custkey"],
                "o_orderkey": kept["o_orderkey"],
                "price_c": pa.array(_cents(kept["o_totalprice"].to_numpy())),
            }
        )

    orders = _read(
        sf_dir, "orders", ["o_custkey", "o_orderkey", "o_orderpriority", "o_totalprice"]
    ).map_batches(urgent, batch_format="pyarrow")
    return shuffle_hash_join(
        cust,
        orders,
        "c_custkey",
        ["c_name"],
        ["o_orderkey", "price_c"],
        how="full",
        left_schema=pa.schema(
            [pa.field("c_custkey", pa.int64()), pa.field("c_name", pa.string())]
        ),
        right_schema=pa.schema(
            [
                pa.field("c_custkey", pa.int64()),
                pa.field("o_orderkey", pa.int64()),
                pa.field("price_c", pa.int64()),
            ]
        ),
    )


Q_FULL_JOIN_SQL = """
    SELECT COALESCE(c.c_custkey, o.o_custkey) AS c_custkey, c.c_name,
           o.o_orderkey,
           CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS price_c
    FROM (SELECT c_custkey, c_name FROM customer
          WHERE (c_custkey & 3) = 0) c
    FULL JOIN (SELECT * FROM orders WHERE o_orderpriority = '1-URGENT') o
      ON o.o_custkey = c.c_custkey
"""


def q_zonal_stats(sf_dir: str):
    """Zonal statistics: per-rect (zone) count and sum of a customer
    point metric — the spatial-aggregate pattern (join + aggregate in
    one pass).  The per-cell group kernel pre-aggregates matches per
    zone BEFORE the final groupby, so the second shuffle moves one
    partial row per (cell, zone), never the raw pairs; a point
    belongs to one home cell, so partials are disjoint and sum
    exactly.  Metric = c_custkey % 1000 (integer-exact)."""
    from ray.data.aggregate import Sum

    from ..stages.cells import cell_encode, explode_to_cells

    def point_rows(batch: pa.Table) -> pa.Table:
        batch = _customer_point_batch(batch)
        cells = cell_encode(batch["px"].to_numpy(), batch["py"].to_numpy(), KNN_RES)
        n = batch.num_rows
        metric = (batch["c_custkey"].to_numpy() % 1000).astype(np.int64)
        return pa.table(
            {
                "cell": pa.array(cells.view(np.int64), pa.int64()),
                "metric": pa.array(metric),
                "px": batch["px"],
                "py": batch["py"],
                "p_partkey": pa.array(np.zeros(n, dtype=np.int64)),
                "minx": pa.array(np.zeros(n)),
                "miny": pa.array(np.zeros(n)),
                "maxx": pa.array(np.zeros(n)),
                "maxy": pa.array(np.zeros(n)),
                "side": pa.array(["point"] * n),
            }
        )

    def rect_rows(batch: pa.Table) -> pa.Table:
        batch = _part_rect_batch(batch)
        exploded = explode_to_cells(batch, KNN_RES)
        n = exploded.num_rows
        return pa.table(
            {
                "cell": exploded["cell"],
                "metric": pa.array(np.zeros(n, dtype=np.int64)),
                "px": pa.array(np.zeros(n)),
                "py": pa.array(np.zeros(n)),
                "p_partkey": exploded["p_partkey"],
                "minx": exploded["minx"],
                "miny": exploded["miny"],
                "maxx": exploded["maxx"],
                "maxy": exploded["maxy"],
                "side": pa.array(["rect"] * n),
            }
        )

    def zonal_group(group: pa.Table) -> pa.Table:
        empty = pa.schema(
            [
                pa.field("p_partkey", pa.int64()),
                pa.field("n_points", pa.int64()),
                pa.field("sum_metric", pa.int64()),
            ]
        ).empty_table()
        is_pt = pc.equal(group["side"], "point")
        pts = group.filter(is_pt)
        rects = group.filter(pc.invert(is_pt))
        if pts.num_rows == 0 or rects.num_rows == 0:
            return empty
        px = pts["px"].to_numpy()
        py = pts["py"].to_numpy()
        metric = pts["metric"].to_numpy()
        rminx = rects["minx"].to_numpy()
        rminy = rects["miny"].to_numpy()
        rmaxx = rects["maxx"].to_numpy()
        rmaxy = rects["maxy"].to_numpy()
        n_r = len(rminx)
        counts = np.zeros(n_r, dtype=np.int64)
        sums = np.zeros(n_r, dtype=np.int64)
        chunk = max(1, MAX_CONTAIN_MATRIX // max(1, len(px)))
        for lo in range(0, n_r, chunk):
            hi = min(lo + chunk, n_r)
            inside = (
                (px[None, :] >= rminx[lo:hi, None])
                & (px[None, :] <= rmaxx[lo:hi, None])
                & (py[None, :] >= rminy[lo:hi, None])
                & (py[None, :] <= rmaxy[lo:hi, None])
            )
            counts[lo:hi] = inside.sum(axis=1)
            sums[lo:hi] = inside @ metric
        keep = counts > 0
        return pa.table(
            {
                "p_partkey": rects["p_partkey"].filter(pa.array(keep)),
                "n_points": pa.array(counts[keep]),
                "sum_metric": pa.array(sums[keep]),
            }
        )

    points = _read(sf_dir, "customer", ["c_custkey"]).map_batches(
        point_rows, batch_format="pyarrow"
    )
    rects = _read(sf_dir, "part", ["p_partkey", "p_size"]).map_batches(
        rect_rows, batch_format="pyarrow"
    )
    partials = points.union(rects).groupby("cell").map_groups(
        zonal_group, batch_format="pyarrow"
    )
    return partials.groupby("p_partkey").aggregate(
        Sum("n_points", alias_name="n_points"),
        Sum("sum_metric", alias_name="sum_metric"),
    )


Q_ZONAL_STATS_SQL = f"""
    WITH r AS ({PART_RECT_SQL}),
    p AS (
      SELECT c_custkey,
             CAST(c_custkey % 97 AS DOUBLE) AS px,
             CAST((c_custkey * 13) % 89 AS DOUBLE) AS py,
             c_custkey % 1000 AS metric
      FROM customer
    )
    SELECT r.p_partkey,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(SUM(p.metric) AS BIGINT) AS sum_metric
    FROM r JOIN p
      ON p.px >= r.minx AND p.px <= r.maxx
     AND p.py >= r.miny AND p.py <= r.maxy
    GROUP BY r.p_partkey
"""


def q_buffer_dissolve(sf_dir: str):
    """Buffer-then-dissolve: inflate every part rect by an integer,
    size-dependent radius (a rectilinear Minkowski sum with a square —
    the GIS buffer op, exact for axis-aligned inputs), then cascaded-
    union per brand.  Same tree-reduce combiner scale shape as
    `dissolve`; the buffer itself is a pure vectorized column map."""
    from ..stages.dissolve import dissolve_partial, dissolve_stats_group

    def partial(batch: pa.Table) -> pa.Table:
        batch = _part_rect_batch(batch)
        r = (batch["p_partkey"].to_numpy() % 3 + 1).astype(np.float64)
        minx = batch["minx"].to_numpy() - r
        miny = batch["miny"].to_numpy() - r
        maxx = batch["maxx"].to_numpy() + r
        maxy = batch["maxy"].to_numpy() + r
        buffered = pa.table(
            {
                "p_brand": batch["p_brand"],
                "footprint": _rect_mp_array(minx, miny, maxx, maxy),
            }
        )
        return dissolve_partial(buffered, "p_brand", "footprint")

    def final(group: pa.Table) -> pa.Table:
        return dissolve_stats_group(group, "p_brand", "footprint")

    ds = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"])
    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("p_brand")
        .map_groups(final, batch_format="pyarrow")
    )


Q_BUFFER_DISSOLVE_SQL = f"""
    WITH d0 AS ({PART_RECT_SQL}),
    d AS (
      SELECT p_brand,
             minx - CAST(p_partkey % 3 + 1 AS DOUBLE) AS minx,
             miny - CAST(p_partkey % 3 + 1 AS DOUBLE) AS miny,
             maxx + CAST(p_partkey % 3 + 1 AS DOUBLE) AS maxx,
             maxy + CAST(p_partkey % 3 + 1 AS DOUBLE) AS maxy
      FROM d0
    ),
    wx AS (
      SELECT p_brand,
             CAST(miny AS BIGINT) AS miny, CAST(maxy AS BIGINT) AS maxy,
             unnest(generate_series(CAST(minx AS BIGINT), CAST(maxx AS BIGINT) - 1)) AS x
      FROM d
    ),
    cells AS (
      SELECT DISTINCT p_brand, x,
             unnest(generate_series(miny, maxy - 1)) AS y
      FROM wx
    ),
    n AS (SELECT p_brand, COUNT(*) AS area FROM cells GROUP BY p_brand),
    adj AS (
      SELECT c1.p_brand, COUNT(*) AS pairs
      FROM cells c1 JOIN cells c2
        ON c1.p_brand = c2.p_brand
       AND ((c2.x = c1.x + 1 AND c2.y = c1.y) OR
            (c2.x = c1.x AND c2.y = c1.y + 1))
      GROUP BY c1.p_brand
    )
    SELECT n.p_brand,
           CAST(n.area AS BIGINT) AS union_area,
           CAST(4 * n.area - 2 * COALESCE(adj.pairs, 0) AS BIGINT) AS union_perim
    FROM n LEFT JOIN adj ON n.p_brand = adj.p_brand
"""


Q_GROUP_QUANTILES_SQL = """
    WITH v AS (
      SELECT l_returnflag, CAST(floor(l_quantity + 0.5) AS BIGINT) AS q
      FROM lineitem
    ),
    r AS (
      SELECT l_returnflag, q,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY q) AS rn,
             COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      FROM v
    )
    SELECT l_returnflag,
           CAST(MAX(n) AS BIGINT) AS n,
           CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN q END) AS BIGINT) AS p50_qty,
           CAST(MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN q END) AS BIGINT) AS p90_qty
    FROM r GROUP BY l_returnflag
"""


def q_stratified_sample(sf_dir: str):
    """Deterministic stratified sampling: the k rows with the SMALLEST
    splitmix64(key) hash per stratum (bottom-k / KMV sampling).  Unlike
    a percentage filter (hash_sample) this yields an EXACT per-group
    sample size regardless of group skew, and the bottom-k set is a
    monoid — the bottom-k of a union is the bottom-k of concatenated
    per-part bottom-ks — so each batch ships at most k rows per stratum
    into the shuffle and a billion-row stratum still costs k rows per
    batch.  The hash rank also makes samples NESTED: the k'=10 sample
    is a prefix of the k=20 sample, the property coordinated sampling
    at 100 TB relies on."""
    from ..stages.footprint import _splitmix64
    from ..stages.topk import grouped_topk_batch

    K = 20

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch["o_orderkey"].to_numpy()
        h = _splitmix64(keys.astype(np.uint64))
        t = pa.table(
            {
                "o_orderpriority": batch["o_orderpriority"],
                "o_orderkey": batch["o_orderkey"],
                "price_c": pa.array(_cents(batch["o_totalprice"].to_numpy())),
                "h": pa.array(h.view(np.int64)),
            }
        )
        kept, _ = grouped_topk_batch(t, "o_orderpriority", h, keys, K, smallest=True)
        return kept

    def final(group: pa.Table) -> pa.Table:
        h = group["h"].to_numpy().view(np.uint64)
        kept, rank = grouped_topk_batch(
            group, "o_orderpriority", h, group["o_orderkey"].to_numpy(), K,
            smallest=True,
        )
        return kept.append_column("rank", pa.array(rank))

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_totalprice"])
    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .map_groups(final, batch_format="pyarrow")
    )


def _build_stratified_sample_sql() -> str:
    return f"""
    WITH o AS (
      SELECT o_orderpriority, o_orderkey,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_c
      FROM orders
    ),
    {_splitmix64_ctes("o", "o_orderkey", "o_orderpriority, o_orderkey, price_c")},
    r AS (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY o_orderpriority ORDER BY h, o_orderkey) AS rank
      FROM hsh
    )
    SELECT o_orderpriority, o_orderkey, price_c,
           CAST(h - CASE WHEN h >= 9223372036854775808::HUGEINT
                    THEN 18446744073709551616::HUGEINT ELSE 0::HUGEINT END
                AS BIGINT) AS h,
           CAST(rank AS BIGINT) AS rank
    FROM r WHERE rank <= 20
"""


Q_STRATIFIED_SAMPLE_SQL = _build_stratified_sample_sql()


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_pivot_events(sf_dir: str):
    """Pivot the events log into a per-user wide feature matrix: one
    row per user with count + value-cents columns per event type
    (stages/pivot.py).  The classic user-feature table a training
    pipeline materializes; lowers to conditional-column partial
    aggregation — one vectorized pass per batch — and because users
    are a rows-cardinality key the partials merge through the
    user-hash BUCKETED reduceat kernel (bucketed_wide_sum), never the
    generic per-distinct-key aggregate."""
    from ..stages.pivot import (
        bucketed_wide_sum,
        make_pivot_partial,
        pivot_column_names,
    )

    names = pivot_column_names(EVENT_TYPES)
    partial = make_pivot_partial(
        "user_id", "event_type", EVENT_TYPES,
        lambda b: _cents(b["value"].to_numpy()),
    )
    ds = _read(sf_dir, "events", ["user_id", "event_type", "value"])
    return bucketed_wide_sum(
        ds.map_batches(partial, batch_format="pyarrow"), "user_id", names
    )


def _build_pivot_events_sql() -> str:
    cols = []
    for c in EVENT_TYPES:
        cols.append(
            f"CAST(SUM(CASE WHEN event_type = '{c}' THEN 1 ELSE 0 END)"
            f" AS BIGINT) AS n_{c}"
        )
        cols.append(
            f"CAST(SUM(CASE WHEN event_type = '{c}' THEN"
            f" CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END)"
            f" AS BIGINT) AS v_{c}_c"
        )
    return (
        "SELECT user_id, " + ", ".join(cols) + " FROM events GROUP BY user_id"
    )


Q_PIVOT_EVENTS_SQL = _build_pivot_events_sql()


# ------------------------------------------------------------------ catalog


# ------------------------------------------------- round-4b additions


ASPECT_N = 2000
# diffusion-style training buckets: each aspect class maps to a fixed
# target latent shape (the SDXL bucketing trick); classes are decided
# with INTEGER cross-multiplication so engine and oracle agree exactly
ASPECT_TARGETS = {
    "square": (512, 512),
    "wide": (576, 448),
    "ultrawide": (640, 384),
    "tall": (448, 576),
    "ultratall": (384, 640),
}


def q_aspect_bucket(sf_dir: str):
    """Aspect-ratio bucketing for image-model training (the SDXL /
    diffusion bucketing step): every image is assigned an aspect class
    by integer ratio tests (w==h square; 2w>=3h ultrawide; ...) and a
    resolution tier by pixel count, then counted per (class, tier,
    target shape).  Payload is shed in the FIRST map_batches — only
    (w, h) reach the aggregate; class cardinality is ≤ 15 so the final
    groupby is a tiny exchange.  At 10^12 images this is one streaming
    metadata pass."""
    from ray.data.aggregate import Sum

    from ..sources.images import read_synth_image_meta

    classes = np.asarray(list(ASPECT_TARGETS), dtype=object)
    tgt_w = {k: v[0] for k, v in ASPECT_TARGETS.items()}
    tgt_h = {k: v[1] for k, v in ASPECT_TARGETS.items()}

    def partial(b: pa.Table) -> pa.Table:
        w = b["w"].to_numpy().astype(np.int64)
        h = b["h"].to_numpy().astype(np.int64)
        cls_idx = np.where(
            w == h,
            0,
            np.where(
                w > h,
                np.where(2 * w >= 3 * h, 2, 1),
                np.where(2 * h >= 3 * w, 4, 3),
            ),
        )
        aspect = classes[cls_idx]
        t = pa.table(
            {
                "aspect": pa.array(aspect, pa.string()),
                "n": pa.array(np.ones(len(w), dtype=np.int64)),
                "sum_pixels": pa.array(w * h),
            }
        )
        agg = pa.TableGroupBy(t, "aspect").aggregate(
            [("n", "sum"), ("sum_pixels", "sum")]
        )
        return agg.rename_columns(["aspect", "n", "sum_pixels"])

    def attach_targets(b: pa.Table) -> pa.Table:
        a = b["aspect"].to_pylist()
        return b.append_column(
            "bucket_w", pa.array([tgt_w[x] for x in a], pa.int64())
        ).append_column("bucket_h", pa.array([tgt_h[x] for x in a], pa.int64()))

    ds = read_synth_image_meta(ASPECT_N)
    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("aspect")
        .aggregate(Sum("n", alias_name="n"), Sum("sum_pixels", alias_name="sum_pixels"))
        .map_batches(attach_targets, batch_format="pyarrow")
    )


def _build_aspect_bucket_sql(n: int = ASPECT_N) -> str:
    tgt_w = "CASE aspect " + " ".join(
        f"WHEN '{k}' THEN {v[0]}" for k, v in ASPECT_TARGETS.items()
    ) + " END"
    tgt_h = "CASE aspect " + " ".join(
        f"WHEN '{k}' THEN {v[1]}" for k, v in ASPECT_TARGETS.items()
    ) + " END"
    return f"""
    WITH idx AS (SELECT unnest(range({n})) AS i),
    m AS (
      SELECT CAST(list_extract([8,12,16,24,32], CAST(i % 5 AS INT) + 1) AS BIGINT) AS w,
             CAST(list_extract([8,12,16,24,32], CAST((i // 3) % 5 AS INT) + 1) AS BIGINT) AS h
      FROM idx
    ),
    c AS (
      SELECT w, h,
             CASE WHEN w = h THEN 'square'
                  WHEN w > h AND 2*w >= 3*h THEN 'ultrawide'
                  WHEN w > h THEN 'wide'
                  WHEN 2*h >= 3*w THEN 'ultratall'
                  ELSE 'tall' END AS aspect
      FROM m
    )
    SELECT aspect,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(w * h) AS BIGINT) AS sum_pixels,
           {tgt_w} AS bucket_w,
           {tgt_h} AS bucket_h
    FROM c GROUP BY aspect
"""


TOKEN_SHARD_BUDGET = 4096


def q_token_shards(sf_dir: str):
    """Token-budget shard packing (LLM training-data step): documents
    are packed into fixed-token-budget shards contiguously in doc_id
    order per source — shard = exclusive-prefix-sum(tokens) //
    BUDGET.  Source cardinality is small (tens), so co-locating one
    source per group is NOT the forbidden rows-cardinality pattern;
    within a group ONE argsort + cumsum assigns every shard.  At
    100 TB the per-source scan becomes a two-pass distributed prefix
    sum (per-block partials, then block-offset broadcast) — same
    math, documented here as the scale path."""

    def tok_count(b: pa.Table) -> pa.Table:
        toks = (
            pc.list_value_length(pc.split_pattern(b["text"], " "))
            .to_numpy()
            .astype(np.int64)
        )
        return pa.table(
            {"doc_id": b["doc_id"], "source": b["source"], "tok": pa.array(toks)}
        )

    def pack(group: pa.Table) -> pa.Table:
        d = group["doc_id"].to_numpy()
        t = group["tok"].to_numpy()
        order = np.argsort(d, kind="stable")
        d, t = d[order], t[order]
        ex = np.cumsum(t) - t  # exclusive prefix sum
        return pa.table(
            {
                "doc_id": pa.array(d, pa.int64()),
                "source": pa.array(group["source"].to_numpy(zero_copy_only=False)[order], pa.string()),
                "tok": pa.array(t, pa.int64()),
                "shard": pa.array(ex // TOKEN_SHARD_BUDGET, pa.int64()),
            }
        )

    ds = _read(sf_dir, "documents", ["doc_id", "source", "text"])
    return (
        ds.map_batches(tok_count, batch_format="pyarrow")
        .groupby("source")
        .map_groups(pack, batch_format="pyarrow")
    )


Q_TOKEN_SHARDS_SQL = f"""
    SELECT doc_id, source, tok,
           CAST(COALESCE(SUM(tok) OVER (
                PARTITION BY source ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                // {TOKEN_SHARD_BUDGET} AS BIGINT) AS shard
    FROM (
      SELECT doc_id, source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
      FROM documents
    )
"""


def q_data_mixture(sf_dir: str):
    """Deterministic source-mixture resampling (the data-mixing step
    of an LLM pipeline): each source gets a target sampling rate in
    basis points derived from its numeric suffix; a doc survives iff
    knuth_hash(doc_id) % 10000 < rate.  Hash-gated keep/drop is a
    stateless vectorized filter — no shuffle until the tiny per-source
    count aggregate.  Resampling 100 TB this way is one streaming
    pass with a ≤ #sources-row result."""
    from ray.data.aggregate import Sum

    def mix(b: pa.Table) -> pa.Table:
        doc = b["doc_id"].to_numpy().astype(np.uint64)
        src = b["source"].to_numpy(zero_copy_only=False)
        srcnum = np.array([int(s[3:]) for s in src], dtype=np.int64)
        rate_bp = 300 + 700 * (srcnum % 10)
        h = ((doc % np.uint64(2**32)) * np.uint64(2654435761)) % np.uint64(2**32)
        keep = (h % np.uint64(10000)).astype(np.int64) < rate_bp
        t = pa.table(
            {
                "source": pa.array(src[keep], pa.string()),
                "n_kept": pa.array(np.ones(int(keep.sum()), dtype=np.int64)),
                "sum_chars": pa.array(b["n_chars"].to_numpy()[keep]),
            }
        )
        agg = pa.TableGroupBy(t, "source").aggregate(
            [("n_kept", "sum"), ("sum_chars", "sum")]
        )
        return agg.rename_columns(["source", "n_kept", "sum_chars"])

    ds = _read(sf_dir, "documents", ["doc_id", "source", "n_chars"])
    return (
        ds.map_batches(mix, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("n_kept", alias_name="n_kept"), Sum("sum_chars", alias_name="sum_chars"))
    )


Q_DATA_MIXTURE_SQL = """
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents
    WHERE (((doc_id % 4294967296) * 2654435761) % 4294967296) % 10000
          < 300 + 700 * (CAST(substr(source, 4) AS BIGINT) % 10)
    GROUP BY source
"""


def q_cum_distinct(sf_dir: str):
    """Cumulative-distinct window: per event, how many DISTINCT event
    types its user has produced up to and including it (ordered ts,
    event_id).  The rows-cardinality user key is hash-BUCKETED; the
    per-bucket kernel makes two vectorized passes — one lexsort on
    (user, type, ts, id) marks first-seen rows, a second lexsort on
    (user, ts, id) turns the marks into a segment-rebased cumsum.  No
    per-distinct-user Python call (CLAUDE.md scale rule)."""
    N_BUCKETS = 64

    def bucket(b: pa.Table) -> pa.Table:
        from ..stages.footprint import _splitmix64

        u = b["user_id"].to_numpy().astype(np.uint64)
        ts = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        return pa.table(
            {
                "user_id": b["user_id"],
                "event_id": b["event_id"],
                "t": pa.array(ts, pa.int64()),
                "etype": b["event_type"],
                "bucket": pa.array(
                    (_splitmix64(u) % np.uint64(N_BUCKETS)).astype(np.int64)
                ),
            }
        )

    def cumdist(group: pa.Table) -> pa.Table:
        u = group["user_id"].to_numpy()
        t = group["t"].to_numpy()
        eid = group["event_id"].to_numpy()
        code = group["etype"].dictionary_encode().combine_chunks().indices.to_numpy()
        # pass 1: first occurrence of each (user, type) in (ts, id) order
        o1 = np.lexsort((eid, t, code, u))
        u1, c1 = u[o1], code[o1]
        first_sorted = np.concatenate(
            ([True], (u1[1:] != u1[:-1]) | (c1[1:] != c1[:-1]))
        )
        first = np.empty(len(u), dtype=np.int64)
        first[o1] = first_sorted
        # pass 2: running sum of first-seen flags per user history
        o2 = np.lexsort((eid, t, u))
        u2, f2 = u[o2], first[o2]
        new_user = np.concatenate(([True], u2[1:] != u2[:-1]))
        cs = np.cumsum(f2)
        seg = np.cumsum(new_user) - 1
        base = (cs - f2)[new_user]
        return pa.table(
            {
                "user_id": pa.array(u2, pa.int64()),
                "event_id": pa.array(eid[o2], pa.int64()),
                "n_types": pa.array(cs - base[seg], pa.int64()),
            }
        )

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    return (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(cumdist, batch_format="pyarrow")
    )


Q_CUM_DISTINCT_SQL = """
    WITH r AS (
      SELECT user_id, event_id, ts,
             CASE WHEN ROW_NUMBER() OVER (
                    PARTITION BY user_id, event_type ORDER BY ts, event_id) = 1
                  THEN 1 ELSE 0 END AS first_seen
      FROM events
    )
    SELECT user_id, event_id,
           CAST(SUM(first_seen) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_types
    FROM r
"""


def q_promo_revenue(sf_dir: str):
    """Promotion-revenue share (TPC-H Q14 shape): 1997 lineitems ⋈
    part on partkey; output is promo cents and total cents (integer —
    the ratio is the caller's one division).  The year filter prunes
    at the READ via an Arrow dataset filter; part ships only
    (partkey, is_promo) into a bucket-shuffled hash join; the final
    aggregate is a 2-column global Sum."""
    from ray.data.aggregate import Sum

    from ..stages.join import shuffle_hash_join

    def li_prep(b: pa.Table) -> pa.Table:
        ts = b["l_shipdate"].to_numpy().astype("datetime64[us]")
        keep = (ts >= np.datetime64("1997-01-01")) & (ts < np.datetime64("1998-01-01"))
        rev = _cents(
            b["l_extendedprice"].to_numpy()[keep]
            * (1.0 - b["l_discount"].to_numpy()[keep])
        )
        return pa.table(
            {
                "l_partkey": pa.array(b["l_partkey"].to_numpy()[keep]),
                "rev_c": pa.array(rev),
            }
        )

    def part_prep(b: pa.Table) -> pa.Table:
        promo = pc.starts_with(b["p_type"], "PROMO")
        return pa.table(
            {
                "l_partkey": b["p_partkey"],
                "is_promo": pc.cast(promo, pa.int64()),
            }
        )

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"])
    li = li.map_batches(li_prep, batch_format="pyarrow")
    part = _read(sf_dir, "part", ["p_partkey", "p_type"]).map_batches(
        part_prep, batch_format="pyarrow"
    )
    joined = shuffle_hash_join(
        li, part, key="l_partkey", left_cols=["rev_c"], right_cols=["is_promo"]
    )

    def split_rev(b: pa.Table) -> pa.Table:
        rev = b["rev_c"].to_numpy()
        promo = b["is_promo"].to_numpy()
        return pa.table(
            {
                "promo_rev_c": pa.array([int(rev[promo == 1].sum())], pa.int64()),
                "total_rev_c": pa.array([int(rev.sum())], pa.int64()),
            }
        )

    agg = joined.map_batches(split_rev, batch_format="pyarrow").aggregate(
        Sum("promo_rev_c", alias_name="promo_rev_c"),
        Sum("total_rev_c", alias_name="total_rev_c"),
    )
    # Dataset.aggregate returns a plain dict for global aggregates
    return pa.table({k: pa.array([v], pa.int64()) for k, v in agg.items()})


Q_PROMO_REVENUE_SQL = """
    SELECT CAST(SUM(CASE WHEN p.p_type LIKE 'PROMO%' THEN
                  CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS promo_rev_c,
           CAST(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS total_rev_c
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
"""


def q_returned_items(sf_dir: str):
    """Top-20 customers by RETURNED revenue (TPC-H Q10 shape): the
    returnflag filter sheds ~2/3 of lineitem in the first batch pass;
    revenue partials pre-aggregate per orderkey before the orderkey
    join; custkey is rows-cardinality so the per-customer merge is
    hash-BUCKETED (top_customers shape: reduceat totals + per-bucket
    top-20 guard), the global sort sees ≤ 64×20 rows, and name/nation
    attach by broadcast."""
    import pyarrow.parquet as pq

    from ..stages.footprint import _splitmix64
    from ..stages.join import broadcast_join, shuffle_hash_join

    N_BUCKETS = 64

    def rev_partial(b: pa.Table) -> pa.Table:
        keep = pc.equal(b["l_returnflag"], "R").to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "l_orderkey": pa.array(b["l_orderkey"].to_numpy()[keep]),
                "rev_c": pa.array(
                    _cents(
                        b["l_extendedprice"].to_numpy()[keep]
                        * (1.0 - b["l_discount"].to_numpy()[keep])
                    )
                ),
            }
        )
        agg = pa.TableGroupBy(t, "l_orderkey").aggregate([("rev_c", "sum")])
        return agg.rename_columns(["l_orderkey", "rev_c"])

    def bucket_partial(b: pa.Table) -> pa.Table:
        t = pa.table({"o_custkey": b["o_custkey"], "rev_c": b["rev_c"]})
        agg = pa.TableGroupBy(t, "o_custkey").aggregate([("rev_c", "sum")])
        agg = agg.rename_columns(["o_custkey", "rev_c"])
        h = _splitmix64(agg["o_custkey"].to_numpy().astype(np.uint64))
        return agg.append_column(
            "bucket", pa.array((h % np.uint64(N_BUCKETS)).astype(np.int64))
        )

    def merge_topk(group: pa.Table) -> pa.Table:
        k = group["o_custkey"].to_numpy()
        s = group["rev_c"].to_numpy()
        order = np.argsort(k, kind="stable")
        k, s = k[order], s[order]
        starts = np.concatenate(([0], np.flatnonzero(k[1:] != k[:-1]) + 1))
        tot = np.add.reduceat(s, starts)
        uk = k[starts]
        top = np.lexsort((uk, -tot))[:20]
        return pa.table(
            {
                "c_custkey": pa.array(uk[top], pa.int64()),
                "revenue_c": pa.array(tot[top].astype(np.int64)),
            }
        )

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"])
    rev = li.map_batches(rev_partial, batch_format="pyarrow")
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).map_batches(
        lambda b: b.rename_columns(["l_orderkey", "o_custkey"]), batch_format="pyarrow"
    )
    joined = shuffle_hash_join(
        rev, orders, key="l_orderkey", left_cols=["rev_c"], right_cols=["o_custkey"]
    )
    per_cust = (
        joined.map_batches(bucket_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(merge_topk, batch_format="pyarrow")
    )
    top = per_cust.sort(["revenue_c", "c_custkey"], descending=[True, False]).limit(20)

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name", "c_nationkey"]
    )
    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    nation = nation.rename_columns(["c_nationkey", "n_name"])
    out = broadcast_join(top, cust, "c_custkey", ["c_name", "c_nationkey"])
    out = broadcast_join(out, nation, "c_nationkey", ["n_name"])
    return out.select_columns(["c_custkey", "c_name", "n_name", "revenue_c"])


Q_RETURNED_ITEMS_SQL = """
    WITH rev AS (
      SELECT o.o_custkey AS c_custkey,
             SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)) AS revenue_c
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE l.l_returnflag = 'R'
      GROUP BY o.o_custkey
    )
    SELECT r.c_custkey, c.c_name, n.n_name, CAST(r.revenue_c AS BIGINT) AS revenue_c
    FROM rev r
    JOIN customer c ON c.c_custkey = r.c_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    ORDER BY r.revenue_c DESC, r.c_custkey
    LIMIT 20
"""


PQ_M = 4
PQ_K = 16
PQ_SEED = 37


def q_ann_pq(sf_dir: str):
    """Product-quantization ANN (the 10^12-vector scale path): vectors
    compress to PQ_M centroid codes inside map_batches — 64 floats →
    4 bytes per row on the wire at scale — and queries rank by ADC
    lookup-table sums.  Runs with FIXED deterministic ±1 codebooks
    (stages/ann.py::pq_fixed_codebooks) so assignment + ADC ranking
    are value-exact vs the SQL mirror; per-subspace k-means training
    (pq_train) stays a separately recall-tested function."""
    from ..stages.ann import pq_fixed_codebooks, pq_topk

    books = pq_fixed_codebooks(PQ_M, PQ_K, 64, seed=PQ_SEED)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = pq_topk(ds, _ann_queries(sf_dir), ANN_K, books)
    return out.select_columns(["query_id", "vec_id", "rank"])


def _build_ann_pq_sql() -> str:
    """SQL mirror of fixed-codebook PQ: per-subspace signed-sum lists
    for assignment (first-argmax via list_position of list_max), the
    query's own lists as the ADC lookup table, score = Σ_s
    qd_s[code_s], exact rank by (score DESC, vec_id)."""
    from ..stages.ann import pq_fixed_codebooks

    books = pq_fixed_codebooks(PQ_M, PQ_K, 64, seed=PQ_SEED)
    m, K, sub = books.shape

    def dots_list(s: int) -> str:
        exprs = []
        for c in range(K):
            terms = " ".join(
                ("+" if books[s, c, d] > 0 else "-") + f" embedding[{s * sub + d + 1}]"
                for d in range(sub)
            ).lstrip("+ ")
            exprs.append("(" + terms + ")")
        return "[\n        " + ",\n        ".join(exprs) + "\n      ]"

    dots_cols = ",\n      ".join(
        f"{dots_list(s)} AS dots{s}" for s in range(m)
    )
    code_cols = ", ".join(
        f"CAST(list_position(dots{s}, list_max(dots{s})) AS INT) AS c{s}"
        for s in range(m)
    )
    score = " + ".join(f"q.qd{s}[a.c{s}]" for s in range(m))
    qd_cols = ", ".join(f"dots{s} AS qd{s}" for s in range(m))
    return f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings
    ),
    d AS (
      SELECT vec_id,
      {dots_cols}
      FROM e
    ),
    asg AS (SELECT vec_id, {code_cols} FROM d),
    q AS (SELECT vec_id AS qid, {qd_cols} FROM d WHERE vec_id < 5),
    cand AS (
      SELECT q.qid AS query_id, a.vec_id, {score} AS score
      FROM asg a, q
    )
    SELECT query_id, vec_id, CAST(rnk AS BIGINT) AS rank FROM (
      SELECT query_id, vec_id,
             row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rnk
      FROM cand
    ) WHERE rnk <= {ANN_K}
"""


PATCH_N = 1200


def q_patch_stats(sf_dir: str):
    """ViT patchification profile: real decode → p×p patch grid →
    integer per-image stats (stages/image_ops.py::DecodePatches).
    The expected-values oracle pins decode + the patch reshape kernel
    per image; at scale the patch tensors feed the trainer from the
    same worker and only these stats ever reach an exchange."""
    from ..sources.images import read_synth_images
    from ..stages.image_ops import DecodePatches

    return read_synth_images(PATCH_N).map_batches(
        DecodePatches(p=4), batch_format="pyarrow"
    )


SIMP_N = 1500
SIMP_MIN_AREA2 = 4


def q_simplify_poly(sf_dir: str):
    """Polygon simplification for the tile-serving path (Visvalingam–
    Whyatt on integer lattices, functions/simplify.py): each skyline
    feature's chain loses its smallest-triangle vertices until every
    remaining triangle has doubled area ≥ 4.  All-integer arithmetic
    → the expected-values oracle pins the kernel per feature; one
    vectorized area pass per removal round, features independent so
    the stage is an embarrassingly parallel task UDF."""
    import ray.data as rd

    from ..functions.simplify import simplify_stats

    def stats(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy()
        rows = [simplify_stats(int(i), SIMP_MIN_AREA2) for i in ids]
        nb, na, ab, aa = zip(*rows) if rows else ((), (), (), ())
        return pa.table(
            {
                "shape_id": pa.array(ids, pa.int64()),
                "n_before": pa.array(list(nb), pa.int64()),
                "n_after": pa.array(list(na), pa.int64()),
                "area2_before": pa.array(list(ab), pa.int64()),
                "area2_after": pa.array(list(aa), pa.int64()),
            }
        )

    return rd.range(SIMP_N, override_num_blocks=32).map_batches(
        stats, batch_format="pyarrow"
    )


def _build_simplify_poly_sql() -> str:
    from ..functions.simplify import simplify_stats

    rows = []
    for i in range(SIMP_N):
        nb, na, ab, aa = simplify_stats(i, SIMP_MIN_AREA2)
        rows.append(
            f"(CAST({i} AS BIGINT), CAST({nb} AS BIGINT), CAST({na} AS BIGINT),"
            f" CAST({ab} AS BIGINT), CAST({aa} AS BIGINT))"
        )
    return (
        "\n    SELECT * FROM (VALUES\n      "
        + ",\n      ".join(rows)
        + "\n    ) AS expected(shape_id, n_before, n_after, area2_before, area2_after)\n"
    )


DUPF_N = 600


def q_dup_frames(sf_dir: str):
    """Static-frame pruning on the video axis: real frame decode →
    exact duplicate-transition profile per clip (stages/video_ops.py::
    DupFrames) over a corpus with PLANTED held frames.  The oracle
    recomputes the hold schedule from the generator's hash math —
    pinning decode + the diff kernel without touching pixels."""
    from ..sources.videos import read_synth_holdframe_videos
    from ..stages.video_ops import DupFrames

    return read_synth_holdframe_videos(DUPF_N).map_batches(
        DupFrames(), batch_format="pyarrow", batch_size=64
    )


CAPD_N = 2000


def q_caption_dedup(sf_dir: str):
    """Cross-modal caption dedup: normalize the IMAGE table's caption
    (strip the per-image ' #N' suffix with one vectorized RE2 pass),
    then keep one canonical image per normalized caption — the
    duplicate-caption collapse a vision-language corpus runs before
    training.  Per-batch partial (count + min keeper per caption)
    pre-aggregates before a caption-hash BUCKETED lexsort/reduceat
    merge — normalized captions are rows-cardinality at 10^12 images,
    so the generic per-key aggregate never runs."""
    N_BUCKETS = 16

    from ..sources.images import read_synth_image_meta

    def partial(b: pa.Table) -> pa.Table:
        norm = pc.replace_substring_regex(b["caption"], r" #\d+$", "")
        t = pa.table(
            {
                "caption": norm,
                "n_images": pa.array(np.ones(b.num_rows, dtype=np.int64)),
                "keeper": b["image_id"],
            }
        )
        agg = pa.TableGroupBy(t, "caption").aggregate(
            [("n_images", "sum"), ("keeper", "min")]
        )
        agg = agg.rename_columns(["caption", "n_images", "keeper"])
        # deterministic across workers (Python hash() is per-process salted)
        import zlib

        h = np.array(
            [zlib.crc32(c.encode()) for c in agg["caption"].to_pylist()],
            dtype=np.int64,
        )
        return agg.append_column("bucket", pa.array(h % N_BUCKETS))

    def merge(group: pa.Table) -> pa.Table:
        cap = np.asarray(group["caption"].to_pylist(), dtype=object)
        n = group["n_images"].to_numpy()
        keep = np.asarray(group["keeper"].to_pylist(), dtype=object)
        order = np.argsort(cap, kind="stable")
        cap, n, keep = cap[order], n[order], keep[order]
        starts = np.concatenate(([0], np.flatnonzero(cap[1:] != cap[:-1]) + 1))
        tot = np.add.reduceat(n, starts)
        kmin = np.minimum.reduceat(keep, starts)
        return pa.table(
            {
                "caption": pa.array(cap[starts], pa.string()),
                "n_images": pa.array(tot.astype(np.int64)),
                "keeper": pa.array(kmin, pa.string()),
            }
        )

    ds = read_synth_image_meta(CAPD_N)
    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(merge, batch_format="pyarrow")
    )


def _build_caption_dedup_sql(n: int = CAPD_N) -> str:
    from ..sources.images import CAPTION_EXTRAS, CAPTION_PLACES, CAPTION_SUBJECTS

    def lst(words) -> str:
        return "[" + ", ".join(f"'{w}'" for w in words) + "]"

    return f"""
    WITH idx AS (SELECT unnest(range({n})) AS i),
    cap AS (
      SELECT list_extract({lst(CAPTION_SUBJECTS)}, CAST(i % 5 AS INT) + 1) || ' ' ||
             list_extract({lst(CAPTION_PLACES)}, CAST((i // 5) % 7 AS INT) + 1) || ' ' ||
             list_extract({lst(CAPTION_EXTRAS)}, CAST((i // 35) % 5 AS INT) + 1) AS caption,
             printf('img-%08d', CAST(i AS INT)) AS image_id
      FROM idx
    )
    SELECT caption,
           CAST(COUNT(*) AS BIGINT) AS n_images,
           MIN(image_id) AS keeper
    FROM cap GROUP BY caption
"""


HULL_N = 4000
HULL_GROUPS = 37


def _hull_points(idx: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Deterministic (group, x, y) triples for the hull corpus."""
    from ..stages.footprint import _splitmix64

    i = idx.astype(np.uint64)
    g = (i % np.uint64(HULL_GROUPS)).astype(np.int64)
    x = (_splitmix64(i * np.uint64(3)) % np.uint64(1000)).astype(np.int64)
    y = (_splitmix64(i * np.uint64(3) + np.uint64(1)) % np.uint64(1000)).astype(
        np.int64
    )
    return g, x, y


def q_convex_hull(sf_dir: str):
    """Per-group convex hull (dissolve-to-footprint primitive): the
    associative hull combiner — hull(A∪B) = hull(hull(A)∪hull(B)) —
    lets each block shrink its groups to O(hull) points BEFORE the
    exchange, then one per-group merge reruns the same exact-integer
    monotone-chain kernel (functions/hull.py) over the partial
    unions.  Group count is bounded (regions/zones), so the final
    groupby is small; the partial-hull shed is what survives 100 TB."""

    import ray.data as rd

    from ..functions.hull import convex_hull, hull_area2

    def gen_partial(batch: pa.Table) -> pa.Table:
        g, x, y = _hull_points(batch["id"].to_numpy())
        order = np.argsort(g, kind="stable")
        g, x, y = g[order], x[order], y[order]
        starts = np.concatenate(([0], np.flatnonzero(g[1:] != g[:-1]) + 1))
        counts = np.diff(np.concatenate((starts, [len(g)])))
        out_g, out_x, out_y, out_n = [], [], [], []
        for s, c in zip(starts, counts):
            hx, hy = convex_hull(x[s : s + c], y[s : s + c])
            out_g.append(np.full(len(hx), g[s], dtype=np.int64))
            out_x.append(hx)
            out_y.append(hy)
            cnt = np.zeros(len(hx), dtype=np.int64)
            cnt[0] = c  # block's point count rides on ONE partial row
            out_n.append(cnt)
        return pa.table(
            {
                "grp": pa.array(np.concatenate(out_g)),
                "hx": pa.array(np.concatenate(out_x)),
                "hy": pa.array(np.concatenate(out_y)),
                "n_pts": pa.array(np.concatenate(out_n)),
            }
        )

    def merge(group: pa.Table) -> pa.Table:
        hx, hy = convex_hull(group["hx"].to_numpy(), group["hy"].to_numpy())
        return pa.table(
            {
                "grp": pa.array([int(group["grp"][0].as_py())], pa.int64()),
                "n_points": pa.array([int(group["n_pts"].to_numpy().sum())], pa.int64()),
                "hull_n": pa.array([len(hx)], pa.int64()),
                "hull_area2": pa.array([hull_area2(hx, hy)], pa.int64()),
            }
        )

    ds = rd.range(HULL_N, override_num_blocks=32)
    return (
        ds.map_batches(gen_partial, batch_format="pyarrow")
        .groupby("grp")
        .map_groups(merge, batch_format="pyarrow")
    )


def _build_convex_hull_sql() -> str:
    """Expected-values oracle from the shared exact kernel over the
    deterministic corpus (n_points double-counts partial-hull sharing
    is avoided: each input point contributes once per group)."""
    from ..functions.hull import convex_hull, hull_area2

    g, x, y = _hull_points(np.arange(HULL_N, dtype=np.int64))
    rows = []
    for grp in range(HULL_GROUPS):
        m = g == grp
        hx, hy = convex_hull(x[m], y[m])
        rows.append(
            f"(CAST({grp} AS BIGINT), CAST({int(m.sum())} AS BIGINT),"
            f" CAST({len(hx)} AS BIGINT), CAST({hull_area2(hx, hy)} AS BIGINT))"
        )
    return (
        "\n    SELECT * FROM (VALUES\n      "
        + ",\n      ".join(rows)
        + "\n    ) AS expected(grp, n_points, hull_n, hull_area2)\n"
    )


def q_bm25_topterms(sf_dir: str):
    """BM25 feature extraction (integer-exact variant, k1=6/5 b=3/4):
    each document's top-3 vocabulary terms with length-normalized
    saturation — same two-pass shape as TF-IDF (global df aggregate →
    broadcast V=100 vocab into shuffle-free in-batch scoring) plus two
    corpus scalars (doc count, Σ doc length) folded from per-batch
    partials.  Denominator-cleared integer arithmetic makes every
    score mirror exactly (stages/text.py::make_bm25_scorer)."""
    from ray.data.aggregate import Sum

    from ..stages.text import (
        TFIDF_SCALE,
        df_partial_from_tf,
        doc_term_tf_batch,
        make_bm25_scorer,
    )

    V, K = 100, 3
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def len_partial(b: pa.Table) -> pa.Table:
        # one pass yields BOTH corpus scalars (doc count + Σ tokens)
        tf = doc_term_tf_batch(b)
        return pa.table(
            {
                "tok": pa.array([int(tf["tf"].to_numpy().sum())], pa.int64()),
                "nd": pa.array([b.num_rows], pa.int64()),
            }
        )

    scalars = docs.map_batches(len_partial, batch_format="pyarrow").aggregate(
        Sum("tok", alias_name="tok"), Sum("nd", alias_name="nd")
    )
    total_tokens = int(scalars["tok"])
    n_docs = int(scalars["nd"])
    df = (
        docs.map_batches(
            lambda b: df_partial_from_tf(doc_term_tf_batch(b)),
            batch_format="pyarrow",
        )
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"))
    )
    vocab = df.sort(["df", "term"], descending=[True, False]).limit(V).take_all()
    terms = np.array([r["term"] for r in vocab])
    idf = np.array(
        [(n_docs * TFIDF_SCALE) // r["df"] for r in vocab], dtype=np.int64
    )
    order = np.argsort(terms)
    scorer = make_bm25_scorer(terms[order], idf[order], K, n_docs, total_tokens)
    return docs.map_batches(scorer, batch_format="pyarrow")


Q_BM25_SQL = """
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z]+')) AS term
      FROM documents
    ),
    t AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM tok WHERE term <> '' GROUP BY doc_id, term
    ),
    dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS doc_len FROM t GROUP BY doc_id),
    corpus AS (
      SELECT (SELECT COUNT(*) FROM documents) AS n,
             (SELECT SUM(doc_len) FROM dl) AS tt
    ),
    df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM t GROUP BY term),
    v AS (
      SELECT term, ((SELECT COUNT(*) FROM documents) * 1000000) // df AS idf_s
      FROM df ORDER BY df DESC, term LIMIT 100
    ),
    s AS (
      SELECT t.doc_id, t.term, t.tf, dl.doc_len,
             (44 * v.idf_s * t.tf * c.tt)
             // (20 * c.tt * t.tf + 6 * c.tt + 18 * dl.doc_len * c.n) AS score
      FROM t
      JOIN v ON t.term = v.term
      JOIN dl ON dl.doc_id = t.doc_id
      CROSS JOIN corpus c
    ),
    r AS (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY doc_id ORDER BY score DESC, term) AS rank
      FROM s
    )
    SELECT doc_id, term, tf, doc_len, CAST(score AS BIGINT) AS score,
           CAST(rank AS BIGINT) AS rank
    FROM r WHERE rank <= 3
"""


LETTERBOX_N = 1500


def q_letterbox(sf_dir: str):
    """Letterbox / padding-artifact detection: real decode → symmetric
    constant-bar height per image over a corpus with PLANTED black
    bars (stages/image_ops.py::DetectLetterbox).  The oracle replays
    the detector over the generator's own pixels — the detector, not
    the plant schedule, defines truth (a clean random interior could
    legitimately have a uniform edge row)."""
    from ..sources.images import read_synth_letterbox_images
    from ..stages.image_ops import DetectLetterbox

    return read_synth_letterbox_images(LETTERBOX_N).map_batches(
        DetectLetterbox(), batch_format="pyarrow"
    )


PCA_ITERS = 6
PCA_SCALE = 1 << 20


def q_pca_power(sf_dir: str):
    """Top principal direction by integer power iteration (the PCA
    pre-pass for whitening/compression): the DISTRIBUTED part is the
    Gram tree-reduce (one 32 KiB (d,d) int64 grid to the driver
    regardless of row count — stages/linalg.py::build_gram); the
    driver then runs PCA_ITERS exact integer iterations v ← normalize
    (G·v), where normalize is sign-preserving truncating scaling to
    2^20 (floor on magnitudes — DuckDB's `//` truncates toward zero,
    so magnitudes-only division keeps both engines identical).  Python
    big-ints make the driver loop overflow-proof; the oracle unrolls
    the same six iterations as chained CTEs in HUGEINT."""
    from ..stages.linalg import build_gram

    ds = _read(sf_dir, "embeddings", ["embedding"])
    g = build_gram(ds, "embedding", GRAM_DIM)
    G = [[int(x) for x in row] for row in g]
    v = [PCA_SCALE] + [0] * (GRAM_DIM - 1)
    for _ in range(PCA_ITERS):
        w = [sum(G[i][j] * v[j] for j in range(GRAM_DIM)) for i in range(GRAM_DIM)]
        mx = max(max(abs(x) for x in w), 1)
        v = [
            -((-x * PCA_SCALE) // mx) if x < 0 else (x * PCA_SCALE) // mx
            for x in w
        ]
    return pa.table(
        {
            "dim": pa.array(np.arange(GRAM_DIM, dtype=np.int64)),
            "v": pa.array(np.array(v, dtype=np.int64)),
        }
    )


def _build_pca_power_sql() -> str:
    S = PCA_SCALE
    ctes = [
        f"""q AS (
      SELECT list_transform(
               embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)
             ) AS qv
      FROM embeddings
    ),
    idx AS (SELECT unnest(range(1, {GRAM_DIM + 1})) AS a),
    g AS (
      SELECT i.a AS i, j.a AS j,
             CAST(SUM(q.qv[i.a] * q.qv[j.a]) AS HUGEINT) AS g
      FROM q, idx i, idx j GROUP BY 1, 2
    ),
    v0 AS (SELECT a AS d, CAST(CASE WHEN a = 1 THEN {S} ELSE 0 END AS HUGEINT) AS v FROM idx)"""
    ]
    for t in range(1, PCA_ITERS + 1):
        ctes.append(
            f"""w{t} AS (
      SELECT g.i AS d, SUM(g.g * v{t - 1}.v) AS w
      FROM g JOIN v{t - 1} ON v{t - 1}.d = g.j GROUP BY 1
    ),
    n{t} AS (SELECT GREATEST(MAX(ABS(w)), 1) AS mx FROM w{t}),
    v{t} AS (
      SELECT d,
             CASE WHEN w < 0 THEN -(((-w) * {S}) // mx)
                  ELSE (w * {S}) // mx END AS v
      FROM w{t}, n{t}
    )"""
        )
    return (
        "\n    WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT CAST(d - 1 AS BIGINT) AS dim, CAST(v AS BIGINT) AS v
    FROM v{PCA_ITERS}
"""
    )


CHAN_N = 1500


def q_channel_stats(sf_dir: str):
    """Per-channel corpus normalization constants (the mean/std every
    image trainer bakes into its input transform): real decode →
    per-block (3,) count/sum/sumsq partials → one 9-int Sum exchange
    regardless of corpus size.  Integer moments; the float mean/std
    is the caller's division.  Expected-values oracle pins decode +
    the reduction over every pixel byte."""
    from ray.data.aggregate import Sum

    from ..sources.images import read_synth_images
    from ..stages.image_ops import decode_image

    def partial(batch: pa.Table) -> pa.Table:
        payloads = batch["bytes"].to_pylist()
        ws = batch["w"].to_numpy()
        hs = batch["h"].to_numpy()
        fmts = batch["fmt"].to_pylist()
        cnt = np.zeros(3, dtype=np.int64)
        s = np.zeros(3, dtype=np.int64)
        ss = np.zeros(3, dtype=np.int64)
        for i, payload in enumerate(payloads):
            px = decode_image(payload, int(ws[i]), int(hs[i]), fmts[i]).astype(
                np.int64
            )
            cnt += px.shape[0] * px.shape[1]
            s += px.sum(axis=(0, 1))
            ss += (px * px).sum(axis=(0, 1))
        return pa.table(
            {
                "channel": pa.array(np.arange(3, dtype=np.int64)),
                "n_px": pa.array(cnt),
                "sum_v": pa.array(s),
                "sum_sq": pa.array(ss),
            }
        )

    return (
        read_synth_images(CHAN_N)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("channel")
        .aggregate(
            Sum("n_px", alias_name="n_px"),
            Sum("sum_v", alias_name="sum_v"),
            Sum("sum_sq", alias_name="sum_sq"),
        )
    )


def q_props_extract(sf_dir: str):
    """Semi-structured field extraction (the log-parsing step): pull
    the integer ``k`` out of the JSON-ish ``props`` string with ONE
    vectorized RE2 pass per batch (pyarrow extract_regex — never a
    per-row json.loads), decade-bucket it, and aggregate count +
    value-cents per (event_type, k_bucket).  Per-batch combiner
    pre-aggregates, so the exchange moves ≤ types×buckets rows per
    block."""
    from ray.data.aggregate import Sum

    def extract(b: pa.Table) -> pa.Table:
        m = pc.extract_regex(b["props"], r'"k": (?P<k>\d+)')
        k = pc.cast(pc.struct_field(m, "k"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        t = pa.table(
            {
                "event_type": b["event_type"],
                "k_bucket": pa.array((k // 10).astype(np.int64)),
                "n": pa.array(np.ones(len(k), dtype=np.int64)),
                "sum_value_c": pa.array(_cents(b["value"].to_numpy())),
            }
        )
        agg = pa.TableGroupBy(t, ["event_type", "k_bucket"]).aggregate(
            [("n", "sum"), ("sum_value_c", "sum")]
        )
        return agg.rename_columns(["event_type", "k_bucket", "n", "sum_value_c"])

    ds = _read(sf_dir, "events", ["event_type", "props", "value"])
    return (
        ds.map_batches(extract, batch_format="pyarrow")
        .groupby(["event_type", "k_bucket"])
        .aggregate(Sum("n", alias_name="n"), Sum("sum_value_c", alias_name="sum_value_c"))
    )


Q_PROPS_EXTRACT_SQL = """
    SELECT event_type,
           CAST(CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) // 10 AS BIGINT) AS k_bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_c
    FROM events
    GROUP BY 1, 2
"""


def q_gap_fill(sf_dir: str):
    """Time-series densification / gap filling: one row per (user,
    hour) over each user's active span, zeros where the log is silent
    — the resample step before windowed feature extraction.  Users
    are rows-cardinality, so the kernel is user-hash BUCKETED; inside
    a bucket the fill is ONE vectorized pass: per-user span extents
    via reduceat, repeat/arange row synthesis, scatter-add of the
    observed counts (no per-user Python, no row loop)."""
    N_BUCKETS = 64
    US_PER_HOUR = 3_600_000_000

    def bucket(b: pa.Table) -> pa.Table:
        from ..stages.footprint import _splitmix64

        u = b["user_id"].to_numpy().astype(np.uint64)
        ts = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        return pa.table(
            {
                "user_id": b["user_id"],
                "hour": pa.array(ts // US_PER_HOUR, pa.int64()),
                "bucket": pa.array(
                    (_splitmix64(u) % np.uint64(N_BUCKETS)).astype(np.int64)
                ),
            }
        )

    def fill(group: pa.Table) -> pa.Table:
        u = group["user_id"].to_numpy()
        h = group["hour"].to_numpy()
        order = np.lexsort((h, u))
        u, h = u[order], h[order]
        new_u = np.concatenate(([True], u[1:] != u[:-1]))
        starts = np.flatnonzero(new_u)
        ends = np.concatenate((starts[1:], [len(u)]))
        hmin = h[starts]
        hmax = h[ends - 1]  # h sorted within user
        spans = hmax - hmin + 1
        offsets = np.concatenate(([0], np.cumsum(spans)[:-1]))
        total = int(spans.sum())
        seg = np.repeat(np.arange(len(starts)), spans)
        out_u = u[starts][seg]
        out_h = hmin[seg] + (np.arange(total) - offsets[seg])
        # scatter-add observed events into their synthesized slot
        ev_seg = np.cumsum(new_u) - 1
        pos = offsets[ev_seg] + (h - hmin[ev_seg])
        n = np.zeros(total, dtype=np.int64)
        np.add.at(n, pos, 1)
        return pa.table(
            {
                "user_id": pa.array(out_u, pa.int64()),
                "hour": pa.array(out_h, pa.int64()),
                "n": pa.array(n),
            }
        )

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    return (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fill, batch_format="pyarrow")
    )


Q_GAP_FILL_SQL = """
    WITH e AS (
      SELECT user_id, epoch_us(ts) // 3600000000 AS hour FROM events
    ),
    span AS (
      SELECT user_id, MIN(hour) AS h0, MAX(hour) AS h1 FROM e GROUP BY user_id
    ),
    grid AS (
      SELECT user_id, unnest(range(h0, h1 + 1)) AS hour FROM span
    ),
    cnt AS (
      SELECT user_id, hour, CAST(COUNT(*) AS BIGINT) AS n FROM e GROUP BY 1, 2
    )
    SELECT g.user_id, CAST(g.hour AS BIGINT) AS hour,
           CAST(COALESCE(c.n, 0) AS BIGINT) AS n
    FROM grid g LEFT JOIN cnt c ON c.user_id = g.user_id AND c.hour = g.hour
"""


def _zorder_sql_expr(xcol: str, ycol: str, bits: int = 16) -> str:
    terms = []
    for b in range(bits):
        terms.append(f"((({xcol} >> {b}) & 1) << {2 * b})")
        terms.append(f"((({ycol} >> {b}) & 1) << {2 * b + 1})")
    return " | ".join(terms)


def q_zorder_layout(sf_dir: str):
    """Z-order (Morton) data layout + zone maps — the clustering pass
    a lakehouse runs so multi-column predicates skip files: each row's
    16-bit (partkey, suppkey) halves interleave into a 32-bit z-value
    (vectorized shift/or, the cells.py trick on key space instead of
    geometry), rows land in z-range partitions (z >> 14), and the query
    emits each partition's zone map (count + min/max of BOTH keys).
    The per-batch combiner pre-aggregates, so the exchange moves
    ≤ 256 rows per block; narrow min/max ranges per partition are
    exactly what makes the layout prunable."""
    from ray.data.aggregate import Max, Min, Sum

    def partial(b: pa.Table) -> pa.Table:
        x = (b["l_partkey"].to_numpy() & 0xFFFF).astype(np.uint64)
        y = (b["l_suppkey"].to_numpy() & 0xFFFF).astype(np.uint64)
        z = np.zeros(len(x), dtype=np.uint64)
        for bit in range(16):
            z |= ((x >> np.uint64(bit)) & np.uint64(1)) << np.uint64(2 * bit)
            z |= ((y >> np.uint64(bit)) & np.uint64(1)) << np.uint64(2 * bit + 1)
        t = pa.table(
            {
                "zpart": pa.array((z >> np.uint64(14)).astype(np.int64)),
                "n": pa.array(np.ones(len(x), dtype=np.int64)),
                "min_part": b["l_partkey"],
                "max_part": b["l_partkey"],
                "min_supp": b["l_suppkey"],
                "max_supp": b["l_suppkey"],
            }
        )
        agg = pa.TableGroupBy(t, "zpart").aggregate(
            [
                ("n", "sum"),
                ("min_part", "min"),
                ("max_part", "max"),
                ("min_supp", "min"),
                ("max_supp", "max"),
            ]
        )
        return agg.rename_columns(
            ["zpart", "n", "min_part", "max_part", "min_supp", "max_supp"]
        )

    ds = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("zpart")
        .aggregate(
            Sum("n", alias_name="n"),
            Min("min_part", alias_name="min_part"),
            Max("max_part", alias_name="max_part"),
            Min("min_supp", alias_name="min_supp"),
            Max("max_supp", alias_name="max_supp"),
        )
    )


Q_ZORDER_LAYOUT_SQL = f"""
    WITH z AS (
      SELECT l_partkey, l_suppkey,
             ({_zorder_sql_expr("(l_partkey & 65535)", "(l_suppkey & 65535)")}) >> 14 AS zpart
      FROM lineitem
    )
    SELECT CAST(zpart AS BIGINT) AS zpart,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(l_partkey) AS BIGINT) AS min_part,
           CAST(MAX(l_partkey) AS BIGINT) AS max_part,
           CAST(MIN(l_suppkey) AS BIGINT) AS min_supp,
           CAST(MAX(l_suppkey) AS BIGINT) AS max_supp
    FROM z GROUP BY zpart
"""


def q_period_over_period(sf_dir: str):
    """Period-over-period analytics: weekly order revenue per priority
    with the previous week's value and the delta (the WoW dashboard
    op).  The heavy pass is one partial-aggregated Sum exchange
    (≤ priorities×weeks rows); the LAG runs per priority group — 5
    groups, each one vectorized sort+shift (key cardinality is the
    ENUM, not rows, so groupby is the right tool here)."""
    from ray.data.aggregate import Sum

    US_PER_WEEK = 7 * 24 * 3_600_000_000

    def partial(b: pa.Table) -> pa.Table:
        ts = b["o_orderdate"].to_numpy().astype("datetime64[us]").astype(np.int64)
        t = pa.table(
            {
                "o_orderpriority": b["o_orderpriority"],
                "week": pa.array(ts // US_PER_WEEK, pa.int64()),
                "rev_c": pa.array(_cents(b["o_totalprice"].to_numpy())),
            }
        )
        agg = pa.TableGroupBy(t, ["o_orderpriority", "week"]).aggregate(
            [("rev_c", "sum")]
        )
        return agg.rename_columns(["o_orderpriority", "week", "rev_c"])

    def lag(group: pa.Table) -> pa.Table:
        w = group["week"].to_numpy()
        r = group["rev_c"].to_numpy()
        order = np.argsort(w)
        w, r = w[order], r[order]
        prev = np.empty_like(r)
        prev[0] = -1
        prev[1:] = r[:-1]
        # LAG over observed weeks (not the dense calendar): -1 sentinel
        return pa.table(
            {
                "o_orderpriority": group["o_orderpriority"].take(
                    pa.array(order.astype(np.int64))
                ),
                "week": pa.array(w, pa.int64()),
                "rev_c": pa.array(r, pa.int64()),
                "prev_rev_c": pa.array(prev, pa.int64()),
            }
        )

    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_orderdate", "o_totalprice"])
    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["o_orderpriority", "week"])
        .aggregate(Sum("rev_c", alias_name="rev_c"))
        .groupby("o_orderpriority")
        .map_groups(lag, batch_format="pyarrow")
    )


Q_PERIOD_OVER_PERIOD_SQL = """
    WITH w AS (
      SELECT o_orderpriority,
             epoch_us(o_orderdate) // 604800000000 AS week,
             CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_c
      FROM orders GROUP BY 1, 2
    )
    SELECT o_orderpriority, CAST(week AS BIGINT) AS week, rev_c,
           CAST(COALESCE(LAG(rev_c) OVER (
                PARTITION BY o_orderpriority ORDER BY week), -1) AS BIGINT) AS prev_rev_c
    FROM w
"""


SKEW_BUCKETS = 1024


def q_skew_report(sf_dir: str):
    """Pre-shuffle skew diagnosis: hash the join key into 1024
    buckets, count per bucket, and fold the distribution into one
    summary row (nonempty buckets, max/min bucket load, total rows) —
    the report you read BEFORE deciding salting/splitting for a 100-TB
    exchange.  Two tiny exchanges: per-block bucket counts → Sum, then
    a single-row fold."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        k = b["o_custkey"].to_numpy().astype(np.uint64)
        h = ((k % np.uint64(2**32)) * np.uint64(2654435761)) % np.uint64(2**32)
        bucket = (h % np.uint64(SKEW_BUCKETS)).astype(np.int64)
        cnt = np.bincount(bucket, minlength=SKEW_BUCKETS).astype(np.int64)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {"bucket": pa.array(nz), "n": pa.array(cnt[nz])}
        )

    def fold(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy()
        return pa.table(
            {
                "nonempty_buckets": pa.array([len(n)], pa.int64()),
                "max_bucket": pa.array([int(n.max())], pa.int64()),
                "min_bucket": pa.array([int(n.min())], pa.int64()),
                "total_rows": pa.array([int(n.sum())], pa.int64()),
            }
        )

    ds = _read(sf_dir, "orders", ["o_custkey"])
    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n", alias_name="n"))
        .repartition(1)
        .map_batches(fold, batch_format="pyarrow", batch_size=None)
    )


Q_SKEW_REPORT_SQL = f"""
    WITH b AS (
      SELECT (((o_custkey % 4294967296) * 2654435761) % 4294967296) % {SKEW_BUCKETS} AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM orders GROUP BY 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS nonempty_buckets,
           CAST(MAX(n) AS BIGINT) AS max_bucket,
           CAST(MIN(n) AS BIGINT) AS min_bucket,
           CAST(SUM(n) AS BIGINT) AS total_rows
    FROM b
"""


def q_contamination(sf_dir: str):
    """Train/eval contamination detection (the decontamination pass an
    LLM pipeline runs before training): eval docs (doc_id % 50 == 0)
    are flagged when they share ANY 8-code-point window hash with a
    train doc; output is each eval doc's count of contaminating train
    docs.  Shape: per-doc distinct window hashes (stages/text.py::
    window_hashes_batch) → ONE hash-bucketed shuffle joins eval×train
    within buckets → ONE eval-bucketed shuffle dedups (eval, train)
    pairs and counts — all kernels lexsort/unique, no per-key
    Python.  At 10^12 docs the window set is winnowed; exactness here
    keeps the oracle bit-true."""
    from ..stages.text import window_hashes_batch

    return _contamination_pipeline(sf_dir, window_hashes_batch)


def q_contamination_winnow(sf_dir: str):
    """The SCALE variant of contamination: winnowed fingerprints
    (stages/text.py::winnowed_hashes_batch — per-16-window minima,
    Schleimer et al.) cut the hash exchange ~16× while keeping the
    guarantee that any shared run of ≥ 23 code points still collides.
    Same distributed shape, and still value-exact: winnowing is
    deterministic, so the oracle replays the window-of-windows argmin
    in SQL (list slicing + list_position-of-min, ties-first like
    numpy argmin)."""
    from ..stages.text import winnowed_hashes_batch

    return _contamination_pipeline(sf_dir, winnowed_hashes_batch)


def _contamination_pipeline(sf_dir: str, hash_batch):
    N_BUCKETS = 64

    def prep(b: pa.Table) -> pa.Table:
        w = hash_batch(b)
        d = w["doc_id"].to_numpy()
        h = w["hv"].to_numpy()
        from ..stages.footprint import _splitmix64

        return pa.table(
            {
                "doc_id": pa.array(d),
                "hv": pa.array(h),
                "is_eval": pa.array((d % 50 == 0).astype(np.int64)),
                "bucket": pa.array(
                    (_splitmix64(h.astype(np.uint64)) % np.uint64(N_BUCKETS)).astype(
                        np.int64
                    )
                ),
            }
        )

    def join_bucket(group: pa.Table) -> pa.Table:
        h = group["hv"].to_numpy()
        d = group["doc_id"].to_numpy()
        ev = group["is_eval"].to_numpy().astype(bool)
        order = np.lexsort((d, h))
        h, d, ev = h[order], d[order], ev[order]
        starts = np.concatenate(([0], np.flatnonzero(h[1:] != h[:-1]) + 1))
        ends = np.concatenate((starts[1:], [len(h)]))
        # shed pure runs first: only hash runs containing BOTH sides
        # fan out (the loop is over mixed runs whose total body work
        # IS the output size — not a per-distinct-key dispatch)
        e_cnt = np.add.reduceat(ev.astype(np.int64), starts)
        n_cnt = ends - starts
        mixed = np.flatnonzero((e_cnt > 0) & (e_cnt < n_cnt))
        out_e, out_t = [], []
        for k in mixed:
            s, e = starts[k], ends[k]
            evs = d[s:e][ev[s:e]]
            trs = d[s:e][~ev[s:e]]
            out_e.append(np.repeat(evs, len(trs)))
            out_t.append(np.tile(trs, len(evs)))
        if not out_e:
            return pa.table(
                {"eval_doc": pa.array([], pa.int64()), "train_doc": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "eval_doc": pa.array(np.concatenate(out_e)),
                "train_doc": pa.array(np.concatenate(out_t)),
            }
        )

    def ebucket(b: pa.Table) -> pa.Table:
        from ..stages.footprint import _splitmix64

        e = b["eval_doc"].to_numpy().astype(np.uint64)
        return b.append_column(
            "bucket",
            pa.array((_splitmix64(e) % np.uint64(N_BUCKETS)).astype(np.int64)),
        )

    def count_bucket(group: pa.Table) -> pa.Table:
        e = group["eval_doc"].to_numpy()
        t = group["train_doc"].to_numpy()
        pairs = np.unique(np.column_stack([e, t]), axis=0)
        ue = pairs[:, 0]
        starts = np.concatenate(([0], np.flatnonzero(ue[1:] != ue[:-1]) + 1))
        counts = np.diff(np.concatenate((starts, [len(ue)])))
        return pa.table(
            {
                "eval_doc": pa.array(ue[starts], pa.int64()),
                "n_train": pa.array(counts.astype(np.int64)),
            }
        )

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(join_bucket, batch_format="pyarrow")
    )
    return (
        pairs.map_batches(ebucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(count_bucket, batch_format="pyarrow")
    )


def _build_contamination_sql() -> str:
    from ..stages.text import _FP_BASE, _FP_WINDOW

    B = int(_FP_BASE)
    H = 1 << 64
    powers = [pow(B, k, H) for k in range(_FP_WINDOW)]
    terms = " + ".join(
        f"unicode(t[i+{j}:i+{j}]) * {powers[_FP_WINDOW - 1 - j]}::HUGEINT"
        for j in range(_FP_WINDOW)
    )
    return f"""
    WITH c AS (
      SELECT doc_id,
             CASE WHEN length(text) < {_FP_WINDOW}
                  THEN text || repeat(' ', {_FP_WINDOW} - length(text))
                  ELSE text END AS t
      FROM documents
    ),
    w AS (
      SELECT doc_id,
             unnest([ (({terms}) % 18446744073709551616::HUGEINT)
                      FOR i IN range(1, length(t) - {_FP_WINDOW - 2}) ]) AS hv
      FROM c
    ),
    d AS (SELECT DISTINCT doc_id, hv FROM w),
    ev AS (SELECT * FROM d WHERE doc_id % 50 = 0),
    tr AS (SELECT * FROM d WHERE doc_id % 50 <> 0),
    hits AS (
      SELECT DISTINCT ev.doc_id AS eval_doc, tr.doc_id AS train_doc
      FROM ev JOIN tr ON ev.hv = tr.hv
    )
    SELECT eval_doc, CAST(COUNT(*) AS BIGINT) AS n_train
    FROM hits GROUP BY eval_doc
"""


def q_substring_dedup(sf_dir: str):
    """Substring-level EXACT dedup (the Lee-et-al. "long repeated run"
    modality, the third dedup granularity next to whole-doc exact and
    near-dup): a doc is flagged when it shares an exact run of
    ≥ SUBSTR_RUN_LEN code points with a SMALLER-id doc; output is
    (doc_id, keeper) where keeper is the smallest such partner — the
    canonical-min drop decision.

    Shape: per-doc distinct L-window rolling hashes (stages/text.py::
    long_window_hashes_batch — shared run ≥ L ⟺ shared L-window hash)
    → ONE hash-bucketed shuffle; within each hv run the fan-out is
    LINEAR (every non-min doc pairs with the run min — never the
    quadratic pair product) → ONE doc-bucketed min merge.  At 10^12
    docs the winnowed fingerprints pre-filter candidates (see the
    kernel docstring); exhaustive windows here keep the oracle exact."""
    from ..stages.footprint import _splitmix64
    from ..stages.text import long_window_hashes_batch

    N_BUCKETS = 64

    def prep(b: pa.Table) -> pa.Table:
        w = long_window_hashes_batch(b)
        h = w["hv"].to_numpy()
        return w.append_column(
            "bucket",
            pa.array(
                (_splitmix64(h.astype(np.uint64)) % np.uint64(N_BUCKETS)).astype(
                    np.int64
                )
            ),
        )

    def flag_bucket(group: pa.Table) -> pa.Table:
        h = group["hv"].to_numpy()
        d = group["doc_id"].to_numpy()
        order = np.lexsort((d, h))
        h, d = h[order], d[order]
        starts = np.concatenate(([0], np.flatnonzero(h[1:] != h[:-1]) + 1))
        ends = np.concatenate((starts[1:], [len(h)]))
        # docs are sorted within each hv run: d[start] is the run min,
        # every later doc pairs with it — O(run length) fan-out
        run_min = np.repeat(d[starts], ends - starts)
        keep = d != run_min
        if not keep.any():
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "keeper": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "doc_id": pa.array(d[keep], pa.int64()),
                "keeper": pa.array(run_min[keep], pa.int64()),
            }
        )

    def dbucket(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy().astype(np.uint64)
        return b.append_column(
            "bucket",
            pa.array((_splitmix64(d) % np.uint64(N_BUCKETS)).astype(np.int64)),
        )

    def min_bucket(group: pa.Table) -> pa.Table:
        d = group["doc_id"].to_numpy()
        k = group["keeper"].to_numpy()
        order = np.lexsort((k, d))
        d, k = d[order], k[order]
        first = np.concatenate(([True], d[1:] != d[:-1]))
        return pa.table(
            {
                "doc_id": pa.array(d[first], pa.int64()),
                "keeper": pa.array(k[first], pa.int64()),
            }
        )

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    flagged = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(flag_bucket, batch_format="pyarrow")
    )
    return (
        flagged.map_batches(dbucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(min_bucket, batch_format="pyarrow")
    )


def _build_substring_dedup_sql() -> str:
    """SQL mirror of q_substring_dedup: the same L-term polynomial
    expansion as the contamination oracle, self-joined a.doc > b.doc,
    keeper = MIN(b.doc).  Note MIN over partners equals the engine's
    min-over-run-minima: in any shared hv run the run min IS the
    smallest partner."""
    from ..stages.text import _FP_BASE, SUBSTR_RUN_LEN

    L = SUBSTR_RUN_LEN
    B = int(_FP_BASE)
    H = 1 << 64
    powers = [pow(B, k, H) for k in range(L)]
    terms = " + ".join(
        f"unicode(t[i+{j}:i+{j}]) * {powers[L - 1 - j]}::HUGEINT" for j in range(L)
    )
    return f"""
    WITH c AS (
      SELECT doc_id,
             CASE WHEN length(text) < {L}
                  THEN text || repeat(' ', {L} - length(text))
                  ELSE text END AS t
      FROM documents
    ),
    w AS (
      SELECT doc_id,
             unnest([ (({terms}) % 18446744073709551616::HUGEINT)
                      FOR i IN range(1, length(t) - {L - 2}) ]) AS hv
      FROM c
    ),
    d AS (SELECT DISTINCT doc_id, hv FROM w)
    SELECT a.doc_id AS doc_id, CAST(MIN(b.doc_id) AS BIGINT) AS keeper
    FROM d a JOIN d b ON a.hv = b.hv AND a.doc_id > b.doc_id
    GROUP BY a.doc_id
"""


Q_SUBSTRING_DEDUP_SQL = _build_substring_dedup_sql()


PR_RANGE_SHIFT = 14  # price ranges of 2^14 cents (~$164)
PR_BUCKETS = 64


def q_percent_rank(sf_dir: str):
    """Percent-rank normalization (integer basis points): each order's
    price rank within its priority, pr_bp = (rank−1)·10⁴ // (n−1) with
    RANK ties (count of strictly smaller + 1).  TWO-PASS distributed
    rank — a whole enum partition is rows-cardinality DATA, so it is
    never sorted on one worker: pass 1 folds per-(priority, price
    range) counts into a bounded aggregate whose per-priority prefix
    sums broadcast back as a flat OFFSET TABLE; pass 2 hash-buckets
    the (priority, range) cells — ONE lexsort per bucket ranks every
    cell at once (tie-run starts give the strictly-smaller counts),
    so neither the range-cell count (~value domain) nor the row count
    ever meets per-key Python dispatch."""
    from ray.data.aggregate import Sum

    PRIOS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]

    def range_counts(b: pa.Table) -> pa.Table:
        from ..stages.footprint import _splitmix64

        v = _cents(b["o_totalprice"].to_numpy())
        code = pc.index_in(
            b["o_orderpriority"], value_set=pa.array(PRIOS)
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        t = pa.table(
            {
                "cell": pa.array(code * (1 << 40) + (v >> PR_RANGE_SHIFT)),
                "n": pa.array(np.ones(len(v), dtype=np.int64)),
            }
        )
        agg = pa.TableGroupBy(t, "cell").aggregate([("n", "sum")])
        agg = agg.rename_columns(["cell", "n"])
        h = _splitmix64(agg["cell"].to_numpy().astype(np.uint64))
        return agg.append_column(
            "bucket", pa.array((h % np.uint64(PR_BUCKETS)).astype(np.int64))
        )

    def merge_counts(group: pa.Table) -> pa.Table:
        # cell cardinality tracks the VALUE DOMAIN (~10³–10⁴ cells) —
        # still merged bucketed, never via the generic per-key aggregate
        c = group["cell"].to_numpy()
        n = group["n"].to_numpy()
        order = np.argsort(c, kind="stable")
        c, n = c[order], n[order]
        starts = np.concatenate(([0], np.flatnonzero(c[1:] != c[:-1]) + 1))
        return pa.table(
            {
                "cell": pa.array(c[starts], pa.int64()),
                "n": pa.array(np.add.reduceat(n, starts).astype(np.int64)),
            }
        )

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_totalprice"])
    hist = (
        ds.map_batches(range_counts, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(merge_counts, batch_format="pyarrow")
        .take_all()  # ≤ priorities × price-domain/2^14 rows — bounded
    )
    cells = np.array([int(r["cell"]) for r in hist], dtype=np.int64)
    ns = np.array([int(r["n"]) for r in hist], dtype=np.int64)
    order = np.argsort(cells)
    cells, ns = cells[order], ns[order]
    codes = cells >> 40
    # exclusive prefix sum per priority = each cell's rank offset
    offs = np.cumsum(ns) - ns
    base = np.zeros(len(PRIOS), dtype=np.int64)
    tot = np.zeros(len(PRIOS), dtype=np.int64)
    for p in range(len(PRIOS)):
        m = codes == p
        if m.any():
            base[p] = offs[m][0]
            tot[p] = ns[m].sum()
    cell_off = offs - base[codes]

    import ray

    lut_ref = ray.put((cells, cell_off, tot))

    def tag(b: pa.Table) -> pa.Table:
        from ..stages.footprint import _splitmix64

        v = _cents(b["o_totalprice"].to_numpy())
        code = pc.index_in(
            b["o_orderpriority"], value_set=pa.array(PRIOS)
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        cell = code * (1 << 40) + (v >> PR_RANGE_SHIFT)
        return pa.table(
            {
                "o_orderkey": b["o_orderkey"],
                "o_orderpriority": b["o_orderpriority"],
                "price_c": pa.array(v, pa.int64()),
                "cell": pa.array(cell),
                "bucket": pa.array(
                    (_splitmix64(cell.astype(np.uint64)) % np.uint64(PR_BUCKETS)).astype(
                        np.int64
                    )
                ),
            }
        )

    def rank_bucket(group: pa.Table) -> pa.Table:
        cells_s, cell_off_s, tot_s = ray.get(lut_ref)
        cell = group["cell"].to_numpy()
        v = group["price_c"].to_numpy()
        sidx = np.lexsort((v, cell))
        cell_s, v_s = cell[sidx], v[sidx]
        new_cell = np.concatenate(([True], cell_s[1:] != cell_s[:-1]))
        new_tie = new_cell | np.concatenate(([True], v_s[1:] != v_s[:-1]))
        idx = np.arange(len(v_s))
        run_start = idx[new_cell][np.cumsum(new_cell) - 1]
        tie_start = idx[new_tie][np.cumsum(new_tie) - 1]
        local = tie_start - run_start
        off = cell_off_s[np.searchsorted(cells_s, cell_s)]
        code = cell_s >> 40
        n = tot_s[code]
        pr_s = (off + local) * 10000 // np.maximum(n - 1, 1)
        pr = np.empty_like(pr_s)
        pr[sidx] = pr_s
        return pa.table(
            {
                "o_orderkey": group["o_orderkey"],
                "o_orderpriority": group["o_orderpriority"],
                "price_c": pa.array(v, pa.int64()),
                "pr_bp": pa.array(pr.astype(np.int64)),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(rank_bucket, batch_format="pyarrow")
    )


Q_PERCENT_RANK_SQL = """
    SELECT o_orderkey, o_orderpriority,
           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_c,
           CAST((RANK() OVER (PARTITION BY o_orderpriority
                              ORDER BY CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) - 1)
                * 10000
                // GREATEST(COUNT(*) OVER (PARTITION BY o_orderpriority) - 1, 1)
                AS BIGINT) AS pr_bp
    FROM orders
"""


KMEANS_K = 8
KMEANS_ITERS = 3


def q_kmeans_labels(sf_dir: str):
    """Distributed k-means over the embedding table (the clustering
    pass behind SemDeDup-style curation and IVF training): 3 exact
    INTEGER iterations — each a streamed assignment pass folding to a
    k×(1+d) partial and one Sum tree-reduce; centroid updates are
    sign-preserving truncating division so the oracle replays every
    op (stages/linalg.py::kmeans_iterate).  Init = the first k
    quantized vectors; output = per-cluster size + centroid L1 norm."""
    import pyarrow.parquet as pq

    from ..stages.linalg import (
        kmeans_assign_summary,
        kmeans_iterate,
        quantize_embeddings,
    )

    seed_t = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", KMEANS_K)],
    ).sort_by("vec_id")
    init = quantize_embeddings(seed_t["embedding"].combine_chunks())
    ds = _read(sf_dir, "embeddings", ["embedding"])
    cent = kmeans_iterate(ds, "embedding", GRAM_DIM, KMEANS_K, init, KMEANS_ITERS)
    return kmeans_assign_summary(ds, "embedding", cent)


def _kmeans_ctes() -> str:
    """Shared CTE chain: quantize → init → ITERS unrolled iterations →
    final assignment ``af(vec_id, c)`` with centroids ``c{ITERS}``."""
    K, D, ITERS = KMEANS_K, GRAM_DIM, KMEANS_ITERS
    dist = (
        "list_sum(list_transform(range(1, %d), i -> "
        "(q.qv[i] - c.cv[i]) * (q.qv[i] - c.cv[i])))" % (D + 1)
    )
    ctes = [
        f"""q AS (
      SELECT vec_id, list_transform(
               embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)
             ) AS qv
      FROM embeddings
    ),
    dims AS (SELECT unnest(range(1, {D + 1})) AS d),
    c0 AS (
      SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS c, qv AS cv
      FROM q WHERE vec_id < {K}
    )"""
    ]
    for t in range(1, ITERS + 1):
        prev = f"c{t - 1}"
        ctes.append(
            f"""a{t} AS (
      SELECT vec_id, qv, c FROM (
        SELECT q.vec_id, q.qv, c.c,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY {dist}, c.c) AS rn
        FROM q, {prev} c
      ) WHERE rn = 1
    ),
    u{t} AS (
      SELECT a.c, d.d, SUM(a.qv[d.d]) AS s, COUNT(*) AS n
      FROM a{t} a, dims d GROUP BY 1, 2
    ),
    m{t} AS (
      SELECT c, list(CASE WHEN s < 0 THEN -((-s) // n) ELSE s // n END
                     ORDER BY d) AS cv
      FROM u{t} GROUP BY c
    ),
    c{t} AS (
      SELECT p.c, COALESCE(m.cv, p.cv) AS cv
      FROM {prev} p LEFT JOIN m{t} m ON m.c = p.c
    )"""
        )
    dist_f = (
        "list_sum(list_transform(range(1, %d), i -> "
        "(q.qv[i] - c.cv[i]) * (q.qv[i] - c.cv[i])))" % (D + 1)
    )
    return (
        ",\n    ".join(ctes)
        + f""",
    af AS (
      SELECT vec_id, qv, c FROM (
        SELECT q.vec_id, q.qv, c.c,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY {dist_f}, c.c) AS rn
        FROM q, c{ITERS} c
      ) WHERE rn = 1
    )"""
    )


def _build_kmeans_sql() -> str:
    return f"""
    WITH {_kmeans_ctes()}
    SELECT af.c AS cluster,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(list_sum(list_transform(cf.cv, x -> abs(x))) AS BIGINT) AS c_norm1
    FROM af JOIN c{KMEANS_ITERS} cf ON cf.c = af.c
    GROUP BY af.c, cf.cv
"""


def q_late_events(sf_dir: str):
    """Event-time lateness profile (the watermark diagnosis of a
    streaming ingest): per user, events are replayed in ARRIVAL order
    (event_id); lateness = running max of event time minus this
    event's time.  One bucketed lexsort + segment-rebased cummax per
    user bucket (the running_total shape with maximum.accumulate);
    output per user: late-event count and max lateness µs."""
    N_BUCKETS = 64

    def bucket(b: pa.Table) -> pa.Table:
        from ..stages.footprint import _splitmix64

        u = b["user_id"].to_numpy().astype(np.uint64)
        ts = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        return pa.table(
            {
                "user_id": b["user_id"],
                "event_id": b["event_id"],
                "t": pa.array(ts, pa.int64()),
                "bucket": pa.array(
                    (_splitmix64(u) % np.uint64(N_BUCKETS)).astype(np.int64)
                ),
            }
        )

    def lateness(group: pa.Table) -> pa.Table:
        u = group["user_id"].to_numpy()
        eid = group["event_id"].to_numpy()
        t = group["t"].to_numpy()
        order = np.lexsort((eid, u))
        u, t = u[order], t[order]
        new_u = np.concatenate(([True], u[1:] != u[:-1]))
        # segment-rebased running max: lift each user's segment onto
        # its own disjoint band so one global maximum.accumulate can't
        # carry a previous user's watermark across the boundary
        seg = np.cumsum(new_u) - 1
        BIG = np.int64(1) << np.int64(50)
        lifted = t + seg * BIG
        run = np.maximum.accumulate(lifted) - seg * BIG
        late = run - t
        n_late = np.zeros(len(t), dtype=np.int64)
        n_late[late > 0] = 1
        starts = np.flatnonzero(new_u)
        tot_late = np.add.reduceat(n_late, starts)
        max_late = np.maximum.reduceat(late, starts)
        return pa.table(
            {
                "user_id": pa.array(u[starts], pa.int64()),
                "n_late": pa.array(tot_late),
                "max_late_us": pa.array(max_late.astype(np.int64)),
            }
        )

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id"])
    return (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(lateness, batch_format="pyarrow")
    )


Q_LATE_EVENTS_SQL = """
    WITH r AS (
      SELECT user_id,
             MAX(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY event_id
                                     ROWS UNBOUNDED PRECEDING)
             - epoch_us(ts) AS late
      FROM events
    )
    SELECT user_id,
           CAST(SUM(CASE WHEN late > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
           CAST(MAX(late) AS BIGINT) AS max_late_us
    FROM r GROUP BY user_id
"""


def q_semantic_dedup(sf_dir: str):
    """SemDeDup-shaped semantic dedup: cluster the embedding space
    with the integer k-means (3 streamed iterations), then find each
    cluster's CLOSEST pair by exact quantized L2² — the candidate the
    curation pass would drop first.  Pairwise work never crosses
    clusters (the SemDeDup trick that makes 10^12-vector dedup
    tractable: O(Σ n_c²) ≪ O(n²)); within a cluster the pair matrix
    is chunked numpy.  k is bounded, so groupby(cluster) is a
    small exchange."""
    import pyarrow.parquet as pq

    from ..stages.linalg import kmeans_iterate, quantize_embeddings

    seed_t = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", KMEANS_K)],
    ).sort_by("vec_id")
    init = quantize_embeddings(seed_t["embedding"].combine_chunks())
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    cent = kmeans_iterate(ds, "embedding", GRAM_DIM, KMEANS_K, init, KMEANS_ITERS)

    import ray

    cent_ref = ray.put(cent)

    def assign(b: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        q = quantize_embeddings(b["embedding"])
        d2 = (
            (q * q).sum(axis=1, keepdims=True)
            - 2 * (q @ c.T)
            + (c * c).sum(axis=1)[None, :]
        )
        t = pa.table(
            {
                "vec_id": b["vec_id"],
                "cluster": pa.array(np.argmin(d2, axis=1).astype(np.int64)),
            }
        )
        for dd in range(q.shape[1]):
            t = t.append_column(f"q{dd}", pa.array(q[:, dd]))
        return t

    def closest_pair(group: pa.Table) -> pa.Table:
        ids = group["vec_id"].to_numpy()
        q = np.column_stack(
            [group[f"q{dd}"].to_numpy() for dd in range(GRAM_DIM)]
        )
        n = len(ids)
        if n < 2:
            return pa.table(
                {
                    "cluster": pa.array([], pa.int64()),
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                    "d2": pa.array([], pa.int64()),
                }
            )
        order = np.argsort(ids)
        ids, q = ids[order], q[order]
        sq = (q * q).sum(axis=1)
        best = (np.iinfo(np.int64).max, -1, -1)
        CH = 512
        for s in range(0, n, CH):
            e = min(s + CH, n)
            d2 = sq[s:e, None] - 2 * (q[s:e] @ q.T) + sq[None, :]
            ii, jj = np.meshgrid(np.arange(s, e), np.arange(n), indexing="ij")
            mask = ii < jj
            if not mask.any():
                continue
            dd = d2[mask]
            k = int(np.lexsort((jj[mask], ii[mask], dd))[0])
            cand = (int(dd[k]), int(ids[ii[mask][k]]), int(ids[jj[mask][k]]))
            if cand < best:
                best = cand
        return pa.table(
            {
                "cluster": pa.array([int(group["cluster"][0].as_py())], pa.int64()),
                "doc_a": pa.array([best[1]], pa.int64()),
                "doc_b": pa.array([best[2]], pa.int64()),
                "d2": pa.array([best[0]], pa.int64()),
            }
        )

    return (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("cluster")
        .map_groups(closest_pair, batch_format="pyarrow")
    )


def _build_semantic_dedup_sql() -> str:
    D = GRAM_DIM
    dist = (
        "list_sum(list_transform(range(1, %d), i -> "
        "(a.qv[i] - b.qv[i]) * (a.qv[i] - b.qv[i])))" % (D + 1)
    )
    return f"""
    WITH {_kmeans_ctes()},
    pairs AS (
      SELECT a.c AS cluster, a.vec_id AS doc_a, b.vec_id AS doc_b,
             {dist} AS d2
      FROM af a JOIN af b ON a.c = b.c AND a.vec_id < b.vec_id
    )
    SELECT cluster, doc_a, doc_b, CAST(d2 AS BIGINT) AS d2 FROM (
      SELECT *, row_number() OVER (PARTITION BY cluster
                                   ORDER BY d2, doc_a, doc_b) AS rn
      FROM pairs
    ) WHERE rn = 1
"""


def q_degree_hist(sf_dir: str):
    """Count-of-counts / degree distribution (orders per customer →
    histogram of customer order-counts): the two-level aggregate
    whose FIRST level is rows-cardinality — per-block partial counts
    merge in custkey-hash buckets (reduceat), and each bucket folds
    its exact per-customer totals STRAIGHT into histogram partials
    (count, n_customers) before the second, tiny Sum exchange — the
    full per-customer table never leaves the buckets."""
    N_BUCKETS = 64

    from ray.data.aggregate import Sum

    from ..stages.footprint import _splitmix64

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "o_custkey": b["o_custkey"],
                "n": pa.array(np.ones(b.num_rows, dtype=np.int64)),
            }
        )
        agg = pa.TableGroupBy(t, "o_custkey").aggregate([("n", "sum")])
        agg = agg.rename_columns(["o_custkey", "n"])
        h = _splitmix64(agg["o_custkey"].to_numpy().astype(np.uint64))
        return agg.append_column(
            "bucket", pa.array((h % np.uint64(N_BUCKETS)).astype(np.int64))
        )

    def hist_bucket(group: pa.Table) -> pa.Table:
        k = group["o_custkey"].to_numpy()
        n = group["n"].to_numpy()
        order = np.argsort(k, kind="stable")
        k, n = k[order], n[order]
        starts = np.concatenate(([0], np.flatnonzero(k[1:] != k[:-1]) + 1))
        tot = np.add.reduceat(n, starts)
        counts, freqs = np.unique(tot, return_counts=True)
        return pa.table(
            {
                "n_orders": pa.array(counts.astype(np.int64)),
                "n_customers": pa.array(freqs.astype(np.int64)),
            }
        )

    ds = _read(sf_dir, "orders", ["o_custkey"])
    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(hist_bucket, batch_format="pyarrow")
        .groupby("n_orders")
        .aggregate(Sum("n_customers", alias_name="n_customers"))
    )


Q_DEGREE_HIST_SQL = """
    WITH d AS (
      SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY o_custkey
    )
    SELECT n_orders, CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM d GROUP BY n_orders
"""


STREAM_JOIN_WINDOW_US = 3_600_000_000  # 1 h


def q_stream_join(sf_dir: str):
    """Stream-stream windowed join (the Flink/Beam interval join):
    every (click, purchase) pair of the SAME user with the purchase
    in [click, click+1h].  Distinct from asof (nearest single match)
    and range_join (static interval table): both sides are streams.
    User-bucketed; inside a bucket clicks and purchases sort once and
    TWO searchsorted calls bound each click's purchase slice — pair
    emission is the output size, not a nested scan.  Irrelevant event
    types shed before the exchange."""
    N_BUCKETS = 64

    def prep(b: pa.Table) -> pa.Table:
        from ..stages.footprint import _splitmix64

        et = b["event_type"].to_numpy(zero_copy_only=False)
        keep = (et == "click") | (et == "purchase")
        u = b["user_id"].to_numpy()[keep].astype(np.uint64)
        ts = (
            b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)[keep]
        )
        return pa.table(
            {
                "user_id": pa.array(u.astype(np.int64)),
                "event_id": pa.array(b["event_id"].to_numpy()[keep]),
                "t": pa.array(ts),
                "is_click": pa.array((et[keep] == "click").astype(np.int64)),
                "bucket": pa.array(
                    (_splitmix64(u) % np.uint64(N_BUCKETS)).astype(np.int64)
                ),
            }
        )

    def join_bucket(group: pa.Table) -> pa.Table:
        u = group["user_id"].to_numpy()
        eid = group["event_id"].to_numpy()
        t = group["t"].to_numpy()
        click = group["is_click"].to_numpy().astype(bool)
        BIG = np.int64(1) << np.int64(50)
        # lift each user's timeline onto a disjoint band: ONE pair of
        # searchsorted calls then resolves every user's windows at once
        uu, uidx = np.unique(u, return_inverse=True)
        lift = uidx.astype(np.int64) * BIG
        ct = np.sort(t[click] + lift[click])
        c_eid_order = np.argsort(t[click] + lift[click], kind="stable")
        c_eid = eid[click][c_eid_order]
        c_t = (t[click] + lift[click])[c_eid_order]
        p_order = np.argsort(t[~click] + lift[~click], kind="stable")
        p_t = (t[~click] + lift[~click])[p_order]
        p_eid = eid[~click][p_order]
        lo = np.searchsorted(p_t, c_t, side="left")
        # side="left": the window is half-open [t, t+W) like the SQL
        hi = np.searchsorted(p_t, c_t + STREAM_JOIN_WINDOW_US, side="left")
        # same-band guard: window never crosses the BIG band gap
        counts = hi - lo
        total = int(counts.sum())
        if total == 0:
            return pa.table(
                {
                    "click_id": pa.array([], pa.int64()),
                    "purchase_id": pa.array([], pa.int64()),
                    "gap_us": pa.array([], pa.int64()),
                }
            )
        seg = np.repeat(np.arange(len(c_t)), counts)
        offs = np.concatenate(([0], np.cumsum(counts)[:-1]))
        pidx = lo[seg] + (np.arange(total) - offs[seg])
        return pa.table(
            {
                "click_id": pa.array(c_eid[seg], pa.int64()),
                "purchase_id": pa.array(p_eid[pidx], pa.int64()),
                "gap_us": pa.array((p_t[pidx] - c_t[seg]).astype(np.int64)),
            }
        )

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(join_bucket, batch_format="pyarrow")
    )


Q_STREAM_JOIN_SQL = f"""
    SELECT c.event_id AS click_id,
           p.event_id AS purchase_id,
           CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) AS gap_us
    FROM events c
    JOIN events p
      ON p.user_id = c.user_id
     AND p.event_type = 'purchase'
     AND c.event_type = 'click'
     AND epoch_us(p.ts) >= epoch_us(c.ts)
     AND epoch_us(p.ts) < epoch_us(c.ts) + {STREAM_JOIN_WINDOW_US}
"""


BLOOM_BITS = 1 << 16
BLOOM_HASHES = 3


def _bloom_positions(keys: np.ndarray) -> np.ndarray:
    """(n, BLOOM_HASHES) bit positions from splitmix64 chains."""
    from ..stages.footprint import _splitmix64

    k = keys.astype(np.uint64)
    pos = np.empty((len(k), BLOOM_HASHES), dtype=np.int64)
    h = k
    for j in range(BLOOM_HASHES):
        h = _splitmix64(h)
        pos[:, j] = (h % np.uint64(BLOOM_BITS)).astype(np.int64)
    return pos


def q_bloom_join(sf_dir: str):
    """Bloom-filter join shed — THE canonical 100-TB join
    optimization, as a first-class operator: the build side (parts of
    one brand) folds its keys into a 64-Kbit bloom via a MERGEABLE
    bitwise-OR aggregate (8 KiB fixed state per block, same contract
    as the sketches); the bloom broadcasts once and the probe side
    (lineitem) sheds non-members BEFORE the join shuffle.  False
    positives survive the shed but die in the exact hash join, so the
    result equals the plain join — the oracle doesn't even see the
    bloom.  Output: revenue cents per partkey for the brand's parts."""
    import ray
    from ray.data.aggregate import AggregateFn, Sum

    from ..stages.join import shuffle_hash_join

    brand = "Brand#13"

    def build_filter(b: pa.Table) -> pa.Table:
        keep = pc.equal(b["p_brand"], brand).to_numpy(zero_copy_only=False)
        return pa.table({"l_partkey": pa.array(b["p_partkey"].to_numpy()[keep])})

    part = _read(sf_dir, "part", ["p_partkey", "p_brand"]).map_batches(
        build_filter, batch_format="pyarrow"
    )

    def accumulate_block(state: np.ndarray, block) -> np.ndarray:
        t = pa.table(block) if not isinstance(block, pa.Table) else block
        pos = _bloom_positions(t["l_partkey"].to_numpy())
        out = state.copy()
        np.bitwise_or.at(
            out, pos.ravel() >> 3, (1 << (pos.ravel() & 7)).astype(np.uint8)
        )
        return out

    bloom = part.aggregate(
        AggregateFn(
            init=lambda _: np.zeros(BLOOM_BITS // 8, dtype=np.uint8),
            accumulate_block=accumulate_block,
            merge=lambda a, b: a | b,
            name="bloom",
        )
    )["bloom"]
    bloom_ref = ray.put(bloom)

    def probe_shed(b: pa.Table) -> pa.Table:
        bits = ray.get(bloom_ref)
        keys = b["l_partkey"].to_numpy()
        pos = _bloom_positions(keys)
        hit = np.ones(len(keys), dtype=bool)
        for j in range(BLOOM_HASHES):
            hit &= (bits[pos[:, j] >> 3] & (1 << (pos[:, j] & 7))) != 0
        rev = _cents(
            b["l_extendedprice"].to_numpy()[hit]
            * (1.0 - b["l_discount"].to_numpy()[hit])
        )
        t = pa.table(
            {
                "l_partkey": pa.array(keys[hit]),
                "rev_c": pa.array(rev),
            }
        )
        agg = pa.TableGroupBy(t, "l_partkey").aggregate([("rev_c", "sum")])
        return agg.rename_columns(["l_partkey", "rev_c"])

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount"])
    probe = li.map_batches(probe_shed, batch_format="pyarrow")
    # exact join kills bloom false positives
    joined = shuffle_hash_join(
        probe, part, key="l_partkey", left_cols=["rev_c"], right_cols=[]
    )
    from ray.data.aggregate import Sum as _Sum

    return joined.groupby("l_partkey").aggregate(_Sum("rev_c", alias_name="rev_c"))


Q_BLOOM_JOIN_SQL = """
    SELECT l.l_partkey, CAST(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_c
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#13'
    GROUP BY l.l_partkey
"""


def _build_contamination_winnow_sql() -> str:
    from ..stages.text import _FP_BASE, _FP_WINDOW, WINNOW_W

    B = int(_FP_BASE)
    H = 1 << 64
    W = WINNOW_W
    powers = [pow(B, k, H) for k in range(_FP_WINDOW)]
    terms = " + ".join(
        f"unicode(t[i+{j}:i+{j}]) * {powers[_FP_WINDOW - 1 - j]}::HUGEINT"
        for j in range(_FP_WINDOW)
    )
    return f"""
    WITH c AS (
      SELECT doc_id,
             CASE WHEN length(text) < {_FP_WINDOW}
                  THEN text || repeat(' ', {_FP_WINDOW} - length(text))
                  ELSE text END AS t
      FROM documents
    ),
    hl AS (
      SELECT doc_id,
             [ (({terms}) % 18446744073709551616::HUGEINT)
               FOR i IN range(1, length(t) - {_FP_WINDOW - 2}) ] AS hs
      FROM c
    ),
    ks AS (
      SELECT doc_id, hs,
             CASE WHEN len(hs) <= {W}
                  THEN [list_position(hs, list_min(hs))]
                  ELSE list_distinct([ p + list_position(hs[p:p+{W - 1}],
                                       list_min(hs[p:p+{W - 1}])) - 1
                                       FOR p IN range(1, len(hs) - {W - 2}) ])
             END AS keeps
      FROM hl
    ),
    w AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(keeps, k -> hs[k]))) AS hv
      FROM ks
    ),
    d AS (SELECT DISTINCT doc_id, hv FROM w),
    ev AS (SELECT * FROM d WHERE doc_id % 50 = 0),
    tr AS (SELECT * FROM d WHERE doc_id % 50 <> 0),
    hits AS (
      SELECT DISTINCT ev.doc_id AS eval_doc, tr.doc_id AS train_doc
      FROM ev JOIN tr ON ev.hv = tr.hv
    )
    SELECT eval_doc, CAST(COUNT(*) AS BIGINT) AS n_train
    FROM hits GROUP BY eval_doc
"""


def q_cdc_state(sf_dir: str):
    """CDC / MERGE-with-tombstones: replay the append-only event log
    into current per-user state — the newest event wins (lexmax of
    (ts, event_id) via the bucketed compaction kernel), and a newest
    event of type 'error' is a TOMBSTONE that deletes the key (the
    Delta/Hudi MERGE semantic).  One bucketed exchange; the delete
    filter runs on the ≤1-row-per-key result, never the log."""
    from ..stages.compact import latest_by_key

    def prep(b: pa.Table) -> pa.Table:
        ts = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        return pa.table(
            {
                "user_id": b["user_id"],
                "ts_us": pa.array(ts, pa.int64()),
                "event_id": b["event_id"],
                "event_type": b["event_type"],
                "value_c": pa.array(_cents(b["value"].to_numpy()), pa.int64()),
            }
        )

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type", "value"])
    latest = latest_by_key(
        ds.map_batches(prep, batch_format="pyarrow"),
        "user_id",
        ("ts_us", "event_id"),
    )

    def drop_tombstones(b: pa.Table) -> pa.Table:
        keep = pc.not_equal(b["event_type"], "error")
        return b.filter(keep).select(["user_id", "ts_us", "event_id", "value_c"])

    return latest.map_batches(drop_tombstones, batch_format="pyarrow")


Q_CDC_STATE_SQL = """
    SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us, event_id,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_c
    FROM events
    QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) = 1
    AND event_type <> 'error'
"""


MOVING_K = 4  # window = this row + 3 preceding


def q_moving_window(sf_dir: str):
    """Bounded moving window (ROWS 3 PRECEDING): per event, the sum of
    the user's last 4 event values in (ts, event_id) order — the
    moving-aggregate feature extractor.  Same bucketed shape as
    running_total; the bounded window is one extra vectorized gather:
    m[i] = cumsum[i] − cumsum[j−1] with j = max(segment start, i−3)."""
    N_BUCKETS = 64

    def bucket(b: pa.Table) -> pa.Table:
        from ..stages.footprint import _splitmix64

        u = b["user_id"].to_numpy().astype(np.uint64)
        ts = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        return pa.table(
            {
                "user_id": b["user_id"],
                "event_id": b["event_id"],
                "t": pa.array(ts, pa.int64()),
                "value_c": pa.array(_cents(b["value"].to_numpy()), pa.int64()),
            }
        ).append_column(
            "bucket",
            pa.array((_splitmix64(u) % np.uint64(N_BUCKETS)).astype(np.int64)),
        )

    def moving(group: pa.Table) -> pa.Table:
        u = group["user_id"].to_numpy()
        t = group["t"].to_numpy()
        eid = group["event_id"].to_numpy()
        v = group["value_c"].to_numpy()
        order = np.lexsort((eid, t, u))
        u, eid, v = u[order], eid[order], v[order]
        new_u = np.concatenate(([True], u[1:] != u[:-1]))
        seg = np.cumsum(new_u) - 1
        starts = np.flatnonzero(new_u)
        cs = np.cumsum(v)
        idx = np.arange(len(v))
        j = np.maximum(starts[seg], idx - (MOVING_K - 1))
        # exclusive prefix at j: cs[j-1], with segment-start handled by
        # subtracting the value sum BEFORE the segment
        prev = np.where(j > 0, cs[np.maximum(j - 1, 0)], 0)
        ms = cs - prev
        return pa.table(
            {
                "user_id": pa.array(u, pa.int64()),
                "event_id": pa.array(eid, pa.int64()),
                "moving_c": pa.array(ms.astype(np.int64)),
            }
        )

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    return (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(moving, batch_format="pyarrow")
    )


Q_MOVING_WINDOW_SQL = f"""
    SELECT user_id, event_id,
           CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS {MOVING_K - 1} PRECEDING) AS BIGINT) AS moving_c
    FROM events
"""


VALID_N = 1200


def _validate_ring(i: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic shape corpus with PLANTED invalid geometries:
    every 5th index emits a bowtie (self-crossing quad, shifted by
    hash); otherwise the simple skyline ring."""
    from ..functions.simplify import skyline_chain
    from ..stages.footprint import _splitmix64

    if int(_splitmix64(np.uint64(i * 613)) % np.uint64(5)) == 0:
        dx = int(_splitmix64(np.uint64(i * 613 + 1)) % np.uint64(50))
        dy = int(_splitmix64(np.uint64(i * 613 + 2)) % np.uint64(50))
        xs = np.array([0, 4, 4, 0], dtype=np.int64) + dx
        ys = np.array([0, 4, 0, 4], dtype=np.int64) + dy
        return xs, ys
    xs, ys = skyline_chain(i)
    # clean class must be SIMPLE: lift the staircase off the base edge
    # (heights ≥ 1) and drop zero-length edges from equal-height runs
    ys = ys.copy()
    ys[1:-1] += 1
    keep = np.concatenate(
        ([True], (xs[1:] != xs[:-1]) | (ys[1:] != ys[:-1]))
    )
    return xs[keep], ys[keep]


def q_geom_validate(sf_dir: str):
    """Geometry validity audit (the ST_IsValid ingest gate every
    spatial pipeline runs before the expensive ops): per feature,
    count non-adjacent edge pairs that touch or cross — 0 ⇔ simple
    ring.  Exact integer orientation predicates (functions/
    simplify.py::ring_self_intersections), features independent →
    embarrassingly parallel task UDF; the corpus plants bowties so
    both verdicts occur."""
    import ray.data as rd

    from ..functions.simplify import ring_area2, ring_self_intersections

    def validate(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy()
        rows = []
        for i in map(int, ids):
            xs, ys = _validate_ring(i)
            bad = ring_self_intersections(xs, ys)
            rows.append((i, bad, int(bad == 0), abs(ring_area2(xs, ys))))
        sid, nb, ok, a2 = zip(*rows) if rows else ((), (), (), ())
        return pa.table(
            {
                "shape_id": pa.array(list(sid), pa.int64()),
                "n_self_intersections": pa.array(list(nb), pa.int64()),
                "is_valid": pa.array(list(ok), pa.int64()),
                "area2": pa.array(list(a2), pa.int64()),
            }
        )

    return rd.range(VALID_N, override_num_blocks=32).map_batches(
        validate, batch_format="pyarrow"
    )


def _build_geom_validate_sql() -> str:
    from ..functions.simplify import ring_area2, ring_self_intersections

    rows = []
    for i in range(VALID_N):
        xs, ys = _validate_ring(i)
        bad = ring_self_intersections(xs, ys)
        rows.append(
            f"(CAST({i} AS BIGINT), CAST({bad} AS BIGINT),"
            f" CAST({int(bad == 0)} AS BIGINT), CAST({abs(ring_area2(xs, ys))} AS BIGINT))"
        )
    return (
        "\n    SELECT * FROM (VALUES\n      "
        + ",\n      ".join(rows)
        + "\n    ) AS expected(shape_id, n_self_intersections, is_valid, area2)\n"
    )


def _winnow_hash_ctes(src: str, prefix: str) -> str:
    """CTE fragment: ``{prefix}w(doc_id, hv)`` = DISTINCT winnowed
    window hashes of the docs in CTE ``src`` (must expose doc_id,
    text) — the SQL twin of stages/text.py::winnowed_hashes_batch."""
    from ..stages.text import _FP_BASE, _FP_WINDOW, WINNOW_W

    B = int(_FP_BASE)
    H = 1 << 64
    W = WINNOW_W
    powers = [pow(B, k, H) for k in range(_FP_WINDOW)]
    terms = " + ".join(
        f"unicode(t[i+{j}:i+{j}]) * {powers[_FP_WINDOW - 1 - j]}::HUGEINT"
        for j in range(_FP_WINDOW)
    )
    return f"""{prefix}c AS (
      SELECT doc_id,
             CASE WHEN length(text) < {_FP_WINDOW}
                  THEN text || repeat(' ', {_FP_WINDOW} - length(text))
                  ELSE text END AS t
      FROM {src}
    ),
    {prefix}hl AS (
      SELECT doc_id,
             [ (({terms}) % 18446744073709551616::HUGEINT)
               FOR i IN range(1, length(t) - {_FP_WINDOW - 2}) ] AS hs
      FROM {prefix}c
    ),
    {prefix}ks AS (
      SELECT doc_id, hs,
             CASE WHEN len(hs) <= {W}
                  THEN [list_position(hs, list_min(hs))]
                  ELSE list_distinct([ p + list_position(hs[p:p+{W - 1}],
                                       list_min(hs[p:p+{W - 1}])) - 1
                                       FOR p IN range(1, len(hs) - {W - 2}) ])
             END AS keeps
      FROM {prefix}hl
    ),
    {prefix}w AS (
      SELECT DISTINCT doc_id,
             unnest(list_distinct(list_transform(keeps, k -> hs[k]))) AS hv
      FROM {prefix}ks
    )"""


CURATION_CONTAM_MIN = 10
# broadcast fast path only while the eval split stays benchmark-sized;
# past this the decontamination gate switches to the bucketed-join plan
CURATION_EVAL_BROADCAST_MAX_DOCS = 200_000


def q_corpus_curation(sf_dir: str, scale_path: bool | None = None):
    """END-TO-END corpus curation — the composed LLM-training-data
    pipeline, stages chained the way a real job runs them, one result
    the oracle checks across ALL of them at once:

      1. drop the eval split (doc_id % 50 == 0) from training;
      2. quality gate (integer-exact: 5 ≤ tokens ≤ 200, stopword
         ratio ≥ 4%) — sheds before anything expensive;
      3. DECONTAMINATION: drop survivors sharing ≥ CURATION_CONTAM_MIN
         winnowed fingerprints with any eval doc.  Two physical plans,
         same answer: a size-guarded BROADCAST fast path for fixed
         benchmark evals (eval hashes computed DISTRIBUTED, pulled as
         one sorted int64 array, probed with np.isin — no per-row
         Python), and the corpus-fraction SCALE path (eval hashes stay
         a Dataset; one bucketed semi-join + doc-bucketed count + one
         anti-join — nothing eval-sized ever on the driver, the
         q_contamination shape);
      4. exact dedup among survivors (128-bit content hash, keeper =
         min doc_id, hash-bucketed lexsort merge);
      5. per-source corpus report (bounded groupby).

    Every stage reuses the already-oracle-checked kernels; the
    composition is what this query pins.  ``scale_path=None`` picks by
    eval-split size (parquet metadata count, no execution)."""
    import ray

    from ..stages.dedup import content_hash_batch
    from ..stages.footprint import _splitmix64
    from ..stages.join import shuffle_hash_join
    from ..stages.text import _STOPWORDS, winnowed_hashes_batch

    N_BUCKETS = 64

    # eval fingerprints computed DISTRIBUTED (never a driver-side read
    # of the corpus): filter to the eval split inside map_batches, one
    # winnowed-hash kernel call per block
    def eval_hashes(b: pa.Table) -> pa.Table:
        t = b.filter(pa.array(b["doc_id"].to_numpy() % 50 == 0))
        wh = winnowed_hashes_batch(t)
        return pa.table({"hv": wh["hv"]})

    ev_ds = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        eval_hashes, batch_format="pyarrow"
    )

    if scale_path is None:
        # metadata-only row count: eval split is 2% of docs
        n_docs = _read(sf_dir, "documents", ["doc_id"]).count()
        scale_path = (n_docs // 50) > CURATION_EVAL_BROADCAST_MAX_DOCS

    def quality_gate(b: pa.Table) -> pa.Table:
        doc = b["doc_id"].to_numpy()
        keep_train = doc % 50 != 0
        toks = pc.list_value_length(pc.split_pattern(b["text"], " ")).to_numpy()
        # stopword count via is_in over the flattened tokens
        tl = pc.split_pattern(b["text"], " ")
        flat = pc.list_flatten(tl)
        parent = pc.list_parent_indices(tl)
        stop_hits = pc.is_in(flat, value_set=pa.array(list(_STOPWORDS))).to_numpy(
            zero_copy_only=False
        )
        n_stop = np.zeros(b.num_rows, dtype=np.int64)
        np.add.at(n_stop, parent.to_numpy(), stop_hits.astype(np.int64))
        quality = (toks >= 5) & (toks <= 200) & (n_stop * 25 >= toks)
        return b.filter(pa.array(keep_train & quality))

    def finish(kept: pa.Table) -> pa.Table:
        hashed = content_hash_batch(kept)
        toks_kept = (
            pc.list_value_length(pc.split_pattern(kept["text"], " "))
            .to_numpy()
            .astype(np.int64)
        )
        h = _splitmix64(hashed["content_hash"].to_numpy().astype(np.uint64))
        return pa.table(
            {
                "doc_id": kept["doc_id"],
                "source": kept["source"],
                "tok": pa.array(toks_kept),
                "h_lo": hashed["content_hash"],
                "h_hi": hashed["content_hash_hi"],
                "bucket": pa.array((h % np.uint64(N_BUCKETS)).astype(np.int64)),
            }
        )

    def dedup_merge(group: pa.Table) -> pa.Table:
        d = group["doc_id"].to_numpy()
        lo = group["h_lo"].to_numpy()
        hi = group["h_hi"].to_numpy()
        order = np.lexsort((d, hi, lo))
        lo, hi, d = lo[order], hi[order], d[order]
        first = np.concatenate(([True], (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1])))
        take = pa.array(order[np.flatnonzero(first)].astype(np.int64))
        out = group.take(take)
        return out.select(["doc_id", "source", "tok"])

    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["doc_id", "source", "text"])

    if not scale_path:
        # ---- broadcast fast path: eval hashes → ONE sorted int64
        # array on the driver (bounded by the guard above), vectorized
        # np.isin probes — no per-row Python membership anywhere
        parts = [t["hv"].to_numpy() for t in ray.get(ev_ds.to_arrow_refs())]
        ev = np.unique(np.concatenate(parts)) if parts else np.empty(0, np.int64)
        ev_ref = ray.put(ev)

        def gate(b: pa.Table) -> pa.Table:
            evs = ray.get(ev_ref)
            kept = quality_gate(b)
            if kept.num_rows:
                wh = winnowed_hashes_batch(kept)
                wd = wh["doc_id"].to_numpy()
                whv = wh["hv"].to_numpy()
                hit = np.isin(whv, evs)
                # strong-overlap rule: a doc is contaminated when ≥
                # CURATION_CONTAM_MIN of its DISTINCT winnowed hashes
                # appear in the eval set (one shared n-gram is
                # background noise in a shared-vocabulary corpus)
                du, dc = np.unique(wd[hit], return_counts=True)
                dirty = du[dc >= CURATION_CONTAM_MIN]
                clean = ~np.isin(kept["doc_id"].to_numpy(), dirty)
                kept = kept.filter(pa.array(clean))
            return finish(kept)

        staged = ds.map_batches(gate, batch_format="pyarrow")
    else:
        # ---- corpus-fraction scale path: eval hashes stay a Dataset.
        # gated train hashes semi-join the eval set on hv (one bucketed
        # exchange), per-doc hit counts merge in ONE doc-bucketed
        # lexsort kernel, dirty ids anti-join the survivor stream —
        # nothing proportional to the eval split touches the driver.
        gated = ds.map_batches(quality_gate, batch_format="pyarrow")

        def train_hashes(b: pa.Table) -> pa.Table:
            return winnowed_hashes_batch(b)

        hits = shuffle_hash_join(
            gated.map_batches(train_hashes, batch_format="pyarrow"),
            ev_ds,
            "hv",
            ["doc_id"],
            [],
            how="semi",
            n_buckets=N_BUCKETS,
            left_schema=pa.schema(
                [pa.field("doc_id", pa.int64()), pa.field("hv", pa.int64())]
            ),
            right_schema=pa.schema([pa.field("hv", pa.int64())]),
        )

        def add_doc_bucket(b: pa.Table) -> pa.Table:
            d = b["doc_id"].to_numpy()
            bk = _splitmix64(d.astype(np.uint64)) % np.uint64(N_BUCKETS)
            return pa.table(
                {
                    "doc_id": b["doc_id"],
                    "dbucket": pa.array(bk.astype(np.int64)),
                }
            )

        def dirty_in_bucket(group: pa.Table) -> pa.Table:
            d = np.sort(group["doc_id"].to_numpy())
            first = np.concatenate(([True], d[1:] != d[:-1]))
            starts = np.flatnonzero(first)
            counts = np.diff(np.append(starts, len(d)))
            dirty = d[starts[counts >= CURATION_CONTAM_MIN]]
            return pa.table({"doc_id": pa.array(dirty, pa.int64())})

        dirty_ds = (
            hits.map_batches(add_doc_bucket, batch_format="pyarrow")
            .groupby("dbucket")
            .map_groups(dirty_in_bucket, batch_format="pyarrow")
        )

        clean = shuffle_hash_join(
            gated,
            dirty_ds,
            "doc_id",
            ["source", "text"],
            [],
            how="anti",
            n_buckets=N_BUCKETS,
            left_schema=pa.schema(
                [
                    pa.field("doc_id", pa.int64()),
                    pa.field("source", pa.string()),
                    pa.field("text", pa.string()),
                ]
            ),
            right_schema=pa.schema([pa.field("doc_id", pa.int64())]),
        )
        staged = clean.map_batches(finish, batch_format="pyarrow")

    survivors = staged.groupby("bucket").map_groups(
        dedup_merge, batch_format="pyarrow"
    )

    def src_partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "source": b["source"],
                "n_docs": pa.array(np.ones(b.num_rows, dtype=np.int64)),
                "sum_tokens": b["tok"],
            }
        )
        agg = pa.TableGroupBy(t, "source").aggregate(
            [("n_docs", "sum"), ("sum_tokens", "sum")]
        )
        return agg.rename_columns(["source", "n_docs", "sum_tokens"])

    return (
        survivors.map_batches(src_partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("n_docs", alias_name="n_docs"), Sum("sum_tokens", alias_name="sum_tokens"))
    )


def _build_corpus_curation_sql() -> str:
    CURATION = CURATION_CONTAM_MIN
    return f"""
    WITH ev0 AS (SELECT doc_id, text FROM documents WHERE doc_id % 50 = 0),
    {_winnow_hash_ctes("ev0", "e_")},
    q AS (
      SELECT doc_id, source, text,
             len(string_split(text, ' ')) AS tok,
             len(list_filter(string_split(text, ' '), x -> x IN {STOPWORDS_SQL})) AS n_stop
      FROM documents WHERE doc_id % 50 <> 0
    ),
    qk AS (
      SELECT * FROM q
      WHERE tok >= 5 AND tok <= 200 AND n_stop * 25 >= tok
    ),
    {_winnow_hash_ctes("qk", "t_")},
    dirty AS (
      SELECT t_w.doc_id, COUNT(*) AS n_shared
      FROM t_w JOIN (SELECT DISTINCT hv FROM e_w) e ON t_w.hv = e.hv
      GROUP BY t_w.doc_id
    ),
    clean AS (
      SELECT qk.* FROM qk
      LEFT JOIN dirty ON dirty.doc_id = qk.doc_id
      WHERE COALESCE(dirty.n_shared, 0) < {CURATION}
    ),
    ded AS (
      SELECT * FROM clean
      QUALIFY ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) = 1
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(tok) AS BIGINT) AS sum_tokens
    FROM ded GROUP BY source
"""


def q_image_curation(sf_dir: str, n_images: int | None = None):
    """END-TO-END image curation — the image-axis twin of
    corpus_curation, stages chained the way a dataset build runs them:

      1. ONE real decode per image produces BOTH curation signals
         (quality brightness ints + 64-bit pHash) — never two decode
         passes;
      2. quality gate (integer mid-gray rule, image_quality_keep);
      3. near-dup dedup among survivors: banded pHash candidates →
         exact popcount verify → drop the larger id of every verified
         pair (canonical-min keeper, the variant collapse);
      4. aspect-bucket report of the curated set (bounded groupby).

    The drop set is applied as a DISTRIBUTED anti-join (the
    q_dedup_apply shape): pairs → per-block dropped-key extraction →
    ONE shuffle_hash_join(how='anti') against the survivor stream —
    the dropped ids never materialize on the driver, so the collapse
    scales with the corpus's variant count instead of pinning a Python
    set in every worker.  The oracle replays every stage from
    generator-side pixel-math literals, so one driver row-hash pins
    decode + gate + pairing + bucketing TOGETHER."""
    from ray.data.aggregate import Sum

    from ..sources.images import (
        image_quality_keep,
        quality_stats,
        read_synth_neardup_images,
    )
    from ..stages.dedup import hamming_candidate_pairs
    from ..stages.image_ops import decode_image

    def decode_profile(b: pa.Table) -> pa.Table:
        from ..sources.images import _phash64

        payloads = b["bytes"].to_pylist()
        ws = b["w"].to_numpy()
        hs = b["h"].to_numpy()
        fmts = b["fmt"].to_pylist()
        idxs = b["img_idx"].to_numpy()
        keep_rows, ph = [], []
        for i, payload in enumerate(payloads):
            px = decode_image(payload, int(ws[i]), int(hs[i]), fmts[i])
            bright, _, _ = quality_stats(px)
            if image_quality_keep(bright, px.size):
                keep_rows.append(i)
                ph.append(np.int64(_phash64(px)))
        take = pa.array(np.array(keep_rows, dtype=np.int64))
        kept = b.select(["img_idx", "w", "h"]).take(take)
        return kept.append_column("phash", pa.array(np.array(ph, dtype=np.int64)))

    n_img = n_images or IMAGE_NEARDUP_N
    ds = read_synth_neardup_images(n_img)
    profiled = ds.map_batches(decode_profile, batch_format="pyarrow", batch_size=256)
    if n_img >= 100_000:
        # decode ONCE at volume: profiled is consumed by both the pair
        # branch and the anti-join left side; after decode_profile the
        # stream is 4 int columns (~32 B/row — payloads shed in-stage),
        # so pinning it in the object store is cheap wherever decode
        # dominates, and it halves the pipeline's decode work.  Coalesce
        # to the downstream bucket count first: the sort shuffle behind
        # every groupby pays a per-block × per-partition scheduling
        # cost, so hundreds of ~2k-row decode output blocks would
        # dominate the exchange (measured 9.3 s → 0.7 s at 1M images).
        # Below the cutoff the materialize barrier costs more than the
        # duplicate decode it saves — stay fully streaming there.
        profiled = profiled.repartition(64).materialize()

    exploded = profiled.map_batches(_phash_band_explode, batch_format="pyarrow")
    pairs = hamming_candidate_pairs(
        exploded,
        max_hamming=IMAGE_NEARDUP_MAX_HAMMING,
        key_col="img_idx",
        sig_col="phash",
        out_cols=("img_a", "img_b"),
    )
    # canonical-min keeper: the larger element of every verified pair
    # drops — per-block dropped-key rows, then ONE anti-join shuffle
    # against the survivor stream (no driver materialization)
    from ..stages.join import shuffle_hash_join

    def dropped_keys(b: pa.Table) -> pa.Table:
        u = pc.unique(b["img_b"])
        return pa.table({"img_idx": u.cast(pa.int64())})

    dropped = pairs.map_batches(dropped_keys, batch_format="pyarrow")
    survivors = shuffle_hash_join(
        profiled,
        dropped,
        "img_idx",
        ["w", "h"],
        [],
        how="anti",
        left_schema=pa.schema(
            [
                pa.field("img_idx", pa.int64()),
                pa.field("w", pa.int32()),
                pa.field("h", pa.int32()),
            ]
        ),
        right_schema=pa.schema([pa.field("img_idx", pa.int64())]),
    )

    classes = np.asarray(list(ASPECT_TARGETS), dtype=object)

    def survive_bucket(b: pa.Table) -> pa.Table:
        w = b["w"].to_numpy().astype(np.int64)
        h = b["h"].to_numpy().astype(np.int64)
        cls_idx = np.where(
            w == h,
            0,
            np.where(
                w > h,
                np.where(2 * w >= 3 * h, 2, 1),
                np.where(2 * h >= 3 * w, 4, 3),
            ),
        )
        t = pa.table(
            {
                "aspect": pa.array(classes[cls_idx], pa.string()),
                "n": pa.array(np.ones(len(w), dtype=np.int64)),
            }
        )
        agg = pa.TableGroupBy(t, "aspect").aggregate([("n", "sum")])
        return agg.rename_columns(["aspect", "n"])

    return (
        survivors.map_batches(survive_bucket, batch_format="pyarrow")
        .groupby("aspect")
        .aggregate(Sum("n", alias_name="n"))
    )


def _build_image_curation_sql() -> str:
    from ..sources.images import expected_curation_profile

    values = _values_oracle_sql(expected_curation_profile(IMAGE_NEARDUP_N))
    bandpw = ", ".join(f"{1 << (16 * k)}::HUGEINT" for k in range(4))
    return f"""
    WITH prof AS ({values}),
    qk AS (SELECT * FROM prof WHERE 2 * bright >= 255 * n_sub),
    u AS (
      SELECT img_idx, phash,
             CASE WHEN phash < 0
                  THEN phash + 18446744073709551616::HUGEINT
                  ELSE phash::HUGEINT END AS phu
      FROM qk
    ),
    bands AS (
      SELECT img_idx, phash, p.band AS band_id,
             (phu // p.bpw) % 65536::HUGEINT AS band_val
      FROM u, (SELECT unnest(range(4)) AS band, unnest([{bandpw}]) AS bpw) p
    ),
    dropped AS (
      SELECT DISTINCT b.img_idx AS img_b
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.band_val = b.band_val
       AND a.img_idx < b.img_idx
      WHERE bit_count(xor(a.phash, b.phash)) <= {IMAGE_NEARDUP_MAX_HAMMING}
    ),
    surv AS (
      SELECT qk.* FROM qk
      WHERE qk.img_idx NOT IN (SELECT img_b FROM dropped)
    ),
    c AS (
      SELECT CASE WHEN w = h THEN 'square'
                  WHEN w > h AND 2*w >= 3*h THEN 'ultrawide'
                  WHEN w > h THEN 'wide'
                  WHEN 2*h >= 3*w THEN 'ultratall'
                  ELSE 'tall' END AS aspect
      FROM surv
    )
    SELECT aspect, CAST(COUNT(*) AS BIGINT) AS n FROM c GROUP BY aspect
"""


BPE_ROUNDS = 3
BPE_SEP = "·"


def q_bpe_merges(sf_dir: str):
    """BPE tokenizer training (the canonical LLM preprocessing step),
    3 merge rounds over the corpus: per round, count every adjacent
    symbol pair (per-batch Counter partials → ONE bounded groupby —
    pair cardinality tracks the vocabulary, not rows), pick the global
    top pair (count DESC, pair lexicographic), broadcast it, and merge
    it corpus-wide with ONE vectorized literal replace per batch
    (pyarrow replace_substring — left-to-right non-overlapping,
    exactly DuckDB's replace()).  State lives in the separator-joined
    symbol string; the oracle unrolls the same three rounds as CTEs.
    Output: one row per round (merged pair + its count)."""
    from ray.data.aggregate import Sum

    SEP = BPE_SEP

    def to_symbols(b: pa.Table) -> pa.Table:
        joined = [SEP.join(t) for t in b["text"].to_pylist()]
        return pa.table({"doc_id": b["doc_id"], "sym": pa.array(joined, pa.string())})

    def pair_counts(b: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for s in b["sym"].to_pylist():
            toks = s.split(SEP)
            c.update(zip(toks, toks[1:]))
        if not c:
            return pa.table(
                {"a": pa.array([], pa.string()), "b": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64())}
            )
        a, bb, n = zip(*((k[0], k[1], v) for k, v in c.items()))
        return pa.table(
            {"a": pa.array(list(a), pa.string()), "b": pa.array(list(bb), pa.string()),
             "n": pa.array(list(n), pa.int64())}
        )

    ds = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        to_symbols, batch_format="pyarrow"
    )
    merges = []
    for _ in range(BPE_ROUNDS):
        counts = (
            ds.map_batches(pair_counts, batch_format="pyarrow")
            .groupby(["a", "b"])
            .aggregate(Sum("n", alias_name="n"))
            .take_all()  # bounded: pairs over the current vocabulary
        )
        top = min(counts, key=lambda r: (-r["n"], r["a"], r["b"]))
        merges.append((top["a"], top["b"], int(top["n"])))
        pat, rep = top["a"] + SEP + top["b"], top["a"] + top["b"]

        def apply_merge(b: pa.Table, _p=pat, _r=rep) -> pa.Table:
            return pa.table(
                {
                    "doc_id": b["doc_id"],
                    "sym": pc.replace_substring(b["sym"], pattern=_p, replacement=_r),
                }
            )

        ds = ds.map_batches(apply_merge, batch_format="pyarrow")
    return pa.table(
        {
            "round": pa.array(np.arange(1, BPE_ROUNDS + 1, dtype=np.int64)),
            "sym_a": pa.array([m[0] for m in merges], pa.string()),
            "sym_b": pa.array([m[1] for m in merges], pa.string()),
            "pair_count": pa.array([m[2] for m in merges], pa.int64()),
        }
    )


def _build_bpe_sql() -> str:
    S = BPE_SEP
    ctes = [
        f"""s0 AS (
      SELECT doc_id,
             rtrim(regexp_replace(text, '(.)', '\\1{S}', 'g'), '{S}') AS sym
      FROM documents
    )"""
    ]
    for t in range(1, BPE_ROUNDS + 1):
        prev = f"s{t - 1}"
        ctes.append(
            f"""p{t} AS (
      SELECT pr[1] AS a, pr[2] AS b, COUNT(*) AS n FROM (
        SELECT unnest(list_zip(l[1:-2], l[2:-1])) AS pr
        FROM (SELECT string_split(sym, '{S}') AS l FROM {prev})
      ) WHERE pr[2] IS NOT NULL GROUP BY 1, 2
    ),
    t{t} AS (SELECT a, b, n FROM p{t} ORDER BY n DESC, a, b LIMIT 1),
    s{t} AS (
      SELECT s.doc_id,
             replace(s.sym, t.a || '{S}' || t.b, t.a || t.b) AS sym
      FROM {prev} s CROSS JOIN t{t} t
    )"""
        )
    rounds_sql = " UNION ALL ".join(
        f"SELECT CAST({t} AS BIGINT) AS round, a AS sym_a, b AS sym_b, CAST(n AS BIGINT) AS pair_count FROM t{t}"
        for t in range(1, BPE_ROUNDS + 1)
    )
    return "\n    WITH " + ",\n    ".join(ctes) + "\n    " + rounds_sql + "\n"


def q_bpe_tokenize(sf_dir: str):
    """BPE tokenization APPLY (the trainer's other half): run the 3
    learned merges over the corpus and emit each document's BPE token
    count — the sequence-length profile a trainer packs batches by.
    Same state representation as q_bpe_merges; counting is one split
    per doc, vectorized via list_value_length."""
    from ray.data.aggregate import Sum

    SEP = BPE_SEP

    def to_symbols(b: pa.Table) -> pa.Table:
        joined = [SEP.join(t) for t in b["text"].to_pylist()]
        return pa.table({"doc_id": b["doc_id"], "sym": pa.array(joined, pa.string())})

    def pair_counts(b: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for s in b["sym"].to_pylist():
            toks = s.split(SEP)
            c.update(zip(toks, toks[1:]))
        if not c:
            return pa.table(
                {"a": pa.array([], pa.string()), "b": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64())}
            )
        a, bb, n = zip(*((k[0], k[1], v) for k, v in c.items()))
        return pa.table(
            {"a": pa.array(list(a), pa.string()), "b": pa.array(list(bb), pa.string()),
             "n": pa.array(list(n), pa.int64())}
        )

    ds = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        to_symbols, batch_format="pyarrow"
    )
    for _ in range(BPE_ROUNDS):
        counts = (
            ds.map_batches(pair_counts, batch_format="pyarrow")
            .groupby(["a", "b"])
            .aggregate(Sum("n", alias_name="n"))
            .take_all()
        )
        top = min(counts, key=lambda r: (-r["n"], r["a"], r["b"]))
        pat, rep = top["a"] + SEP + top["b"], top["a"] + top["b"]

        def apply_merge(b: pa.Table, _p=pat, _r=rep) -> pa.Table:
            return pa.table(
                {
                    "doc_id": b["doc_id"],
                    "sym": pc.replace_substring(b["sym"], pattern=_p, replacement=_r),
                }
            )

        ds = ds.map_batches(apply_merge, batch_format="pyarrow")

    def count_tokens(b: pa.Table) -> pa.Table:
        n = pc.list_value_length(pc.split_pattern(b["sym"], SEP))
        return pa.table(
            {"doc_id": b["doc_id"], "n_bpe_tokens": pc.cast(n, pa.int64())}
        )

    return ds.map_batches(count_tokens, batch_format="pyarrow")


def _build_bpe_tokenize_sql() -> str:
    # reuse the trainer's CTE chain; count symbols of the final state
    chain = _build_bpe_sql()
    # strip the trailing UNION ALL select and keep the WITH chain
    head = chain.split("\n    SELECT CAST(1 AS BIGINT)")[0]
    return (
        head
        + f"""
    SELECT doc_id,
           CAST(len(string_split(sym, '{BPE_SEP}')) AS BIGINT) AS n_bpe_tokens
    FROM s{BPE_ROUNDS}
"""
    )


def build_queries():
    return {
        "clip_area": q_clip_area,
        "tile_assign": q_tile_assign,
        "pip_join": q_pip_join,
        "pip_join_skew": q_pip_join_skew,
        "pip_join_rtree": q_pip_join_rtree,
        "poly_join_big": q_poly_join_big,
        "dissolve": q_dissolve,
        "spatial_knn": q_spatial_knn,
        "nearest_facility": q_nearest_facility,
        "pricing_summary": q_pricing_summary,
        "top_customers": q_top_customers,
        "events_window": q_events_window,
        "sliding_window": q_sliding_window,
        "sessions": q_sessions,
        "interval_union": q_interval_union,
        "mode_event": q_mode_event,
        "latest_by_key": q_latest_by_key,
        "distinct_users": q_distinct_users,
        "user_journey": q_user_journey,
        "funnel": q_funnel,
        "transitions": q_transitions,
        "price_histogram": q_price_histogram,
        "hash_sample": q_hash_sample,
        "asof_join": q_asof_join,
        "range_join": q_range_join,
        "range_join_big": q_range_join_big,
        "dedup_exact": q_dedup_exact,
        "incremental_dedup": q_incremental_dedup,
        "normalized_dedup": q_normalized_dedup,
        "bottomk_sample": q_bottomk_sample,
        "grouped_sample": q_grouped_sample,
        "dedup_components": q_dedup_components,
        "dedup_apply": q_dedup_apply,
        "safe_split": q_safe_split,
        "text_stats": q_text_stats,
        "regex_tokens": q_regex_tokens,
        "ann_topk": q_ann_topk,
        "ann_filtered": q_ann_filtered,
        "table_diff": q_table_diff,
        "ann_ivf": q_ann_ivf,
        "ann_lsh": q_ann_lsh,
        "minhash_near_dup": q_minhash_near_dup,
        "minhash_lean": q_minhash_lean,
        "simhash_pairs": q_simhash_pairs,
        "fingerprints": q_fingerprints,
        "embedding_near_dup": q_embedding_near_dup,
        "mutual_nn": q_mutual_nn,
        "martinez_fixtures": q_martinez_fixtures,
        "image_features": q_image_features,
        "image_quality": q_image_quality,
        "image_pyramid": q_image_pyramid,
        "pixel_histogram": q_pixel_histogram,
        "image_augment": q_image_augment,
        "image_near_dup": q_image_near_dup,
        "image_dedup_components": q_image_dedup_components,
        "image_sim_topk": q_image_sim,
        "jpeg_roundtrip": q_jpeg_roundtrip,
        "jpeg_quality_sweep": q_jpeg_quality_sweep,
        "video_frames": q_video_frames,
        "scene_stats": q_scene_stats,
        "audio_features": q_audio_features,
        "tile_coverage": q_tile_coverage,
        "tile_coverage_rects": q_tile_coverage_rects,
        "tile_mosaic": q_tile_mosaic,
        "footprint_metrics": q_footprint_metrics,
        "poly_clip": q_poly_clip,
        "wkb_clip": q_wkb_clip,
        "poly_clip_quads": q_poly_clip_quads,
        "revenue_by_nation": q_revenue_by_nation,
        "order_priority": q_order_priority,
        "quality_filter": q_quality_filter,
        "revenue_share": q_revenue_share,
        "caption_stats": q_caption_stats,
        "triangles": q_triangles,
        "pagerank": q_pagerank,
        "group_regression": q_group_regression,
        "bfs_depth": q_bfs_depth,
        "retention": q_retention,
        "basket_pairs": q_basket_pairs,
        "quantile_sketch": q_quantile_sketch,
        "skyline": q_skyline,
        "lang_id": q_lang_id,
        "ngram_dedup": q_ngram_dedup,
        "grouped_topk": q_grouped_topk,
        "running_total": q_running_total,
        "event_gaps": q_event_gaps,
        "hll_distinct": q_hll_distinct,
        "kmv_overlap": q_kmv_overlap,
        "cms_counts": q_cms_counts,
        "gram_matrix": q_gram_matrix,
        "dim_stats": q_dim_stats,
        "cell_rollup": q_cell_rollup,
        "cell_compact": q_cell_compact,
        "cell_uncompact": q_cell_uncompact,
        "image_safe_split": q_image_safe_split,
        "focal_sum": q_focal_sum,
        "spatial_antijoin": q_spatial_antijoin,
        "dist_join": q_dist_join,
        "vocab_topk": q_vocab_topk,
        "word_pairs": q_word_pairs,
        "tfidf_topterms": q_tfidf_topterms,
        "rollup_sales": q_rollup_sales,
        "cube_sales": q_cube_sales,
        "group_quantiles": q_group_quantiles,
        "quartile_label": q_quartile_label,
        "anti_join": q_anti_join,
        "semi_join": q_semi_join,
        "left_join": q_left_join,
        "full_join": q_full_join,
        "zonal_stats": q_zonal_stats,
        "buffer_dissolve": q_buffer_dissolve,
        "stratified_sample": q_stratified_sample,
        "pivot_events": q_pivot_events,
        "aspect_bucket": q_aspect_bucket,
        "token_shards": q_token_shards,
        "data_mixture": q_data_mixture,
        "cum_distinct": q_cum_distinct,
        "promo_revenue": q_promo_revenue,
        "returned_items": q_returned_items,
        "ann_pq": q_ann_pq,
        "patch_stats": q_patch_stats,
        "simplify_poly": q_simplify_poly,
        "dup_frames": q_dup_frames,
        "caption_dedup": q_caption_dedup,
        "convex_hull": q_convex_hull,
        "bm25_topterms": q_bm25_topterms,
        "letterbox": q_letterbox,
        "pca_power": q_pca_power,
        "channel_stats": q_channel_stats,
        "props_extract": q_props_extract,
        "gap_fill": q_gap_fill,
        "zorder_layout": q_zorder_layout,
        "period_over_period": q_period_over_period,
        "skew_report": q_skew_report,
        "contamination": q_contamination,
        "substring_dedup": q_substring_dedup,
        "percent_rank": q_percent_rank,
        "kmeans_labels": q_kmeans_labels,
        "late_events": q_late_events,
        "semantic_dedup": q_semantic_dedup,
        "degree_hist": q_degree_hist,
        "stream_join": q_stream_join,
        "bloom_join": q_bloom_join,
        "contamination_winnow": q_contamination_winnow,
        "cdc_state": q_cdc_state,
        "moving_window": q_moving_window,
        "geom_validate": q_geom_validate,
        "corpus_curation": q_corpus_curation,
        "image_curation": q_image_curation,
        "bpe_merges": q_bpe_merges,
        "bpe_tokenize": q_bpe_tokenize,
    }


def build_oracle_sql():
    # Expected-values oracles for the codec queries are built lazily
    # HERE (not at module import): the literals come from generator
    # math (a Python loop over 3,500 rows) that only the driver's
    # oracle comparison needs — workers importing this module for
    # map_batches closures must not pay for it.
    from ..sources.images import (
        expected_decode_features,
        expected_pyramid,
        expected_quality_stats,
    )
    from ..sources.videos import expected_audio_features, expected_frame_features

    image_features_sql = _values_oracle_sql(
        expected_decode_features(2000).rename_columns(
            ["image_id", "phash", "pix_checksum"]
        )
    )
    image_quality_sql = _values_oracle_sql(expected_quality_stats(2000))
    image_pyramid_sql = _values_oracle_sql(expected_pyramid(PYRAMID_N, levels=2))
    from ..sources.images import expected_augmented

    image_augment_sql = _values_oracle_sql(expected_augmented(AUG_N))
    from ..sources.images import expected_patch_stats

    patch_stats_sql = _values_oracle_sql(expected_patch_stats(PATCH_N))
    from ..sources.images import expected_letterbox

    letterbox_sql = _values_oracle_sql(expected_letterbox(LETTERBOX_N))
    from ..sources.images import expected_channel_stats

    channel_stats_sql = _values_oracle_sql(expected_channel_stats(CHAN_N))
    video_frames_sql = _values_oracle_sql(expected_frame_features(500, stride=2))
    from ..sources.videos import expected_scene_stats

    scene_stats_sql = _values_oracle_sql(expected_scene_stats(500))
    audio_features_sql = _values_oracle_sql(expected_audio_features(1000))
    from ..sources.videos import expected_dup_frames

    dup_frames_sql = _values_oracle_sql(expected_dup_frames(DUPF_N))
    # golden-derived literals: the fixtures' EXPECTED geometries,
    # canonically serialized + hashed (never engine output) — makes the
    # bit-for-bit conformance corpus a driver-green CORRECTNESS row
    from ..sources.fixture_pairs import golden_expected_table

    martinez_fixtures_sql = _values_oracle_sql(golden_expected_table())
    from ..sources.images import expected_roundtrip

    jpeg_roundtrip_sql = _values_oracle_sql(expected_roundtrip(JPEG_RT_N))
    return {
        "martinez_fixtures": martinez_fixtures_sql,
        "jpeg_roundtrip": jpeg_roundtrip_sql,
        "normalized_dedup": Q_NORMALIZED_DEDUP_SQL,
        "bottomk_sample": _build_bottomk_sql(),
        "grouped_sample": _build_grouped_sample_sql(),
        "mutual_nn": _build_mutual_nn_sql(),
        "image_dedup_components": _build_image_dedup_components_sql(),
        "image_safe_split": _build_image_safe_split_sql(),
        "minhash_lean": Q_MINHASH_SQL,
        "cell_uncompact": _build_cell_uncompact_sql(),
        "cell_compact": _build_cell_compact_sql(),
        "jpeg_quality_sweep": _build_jpeg_sweep_sql(),
        "image_features": image_features_sql,
        "image_quality": image_quality_sql,
        "image_pyramid": image_pyramid_sql,
        "pixel_histogram": _build_pixel_histogram_sql(),
        "image_augment": image_augment_sql,
        "patch_stats": patch_stats_sql,
        "letterbox": letterbox_sql,
        "channel_stats": channel_stats_sql,
        "simplify_poly": _build_simplify_poly_sql(),
        "video_frames": video_frames_sql,
        "scene_stats": scene_stats_sql,
        "audio_features": audio_features_sql,
        "dup_frames": dup_frames_sql,
        "clip_area": Q_CLIP_AREA_SQL,
        "tile_assign": Q_TILE_ASSIGN_SQL,
        "pip_join": Q_PIP_JOIN_SQL,
        "pip_join_skew": Q_PIP_JOIN_SQL,
        "pip_join_rtree": Q_PIP_JOIN_SQL,
        "poly_join_big": Q_POLY_JOIN_BIG_SQL,
        "dissolve": Q_DISSOLVE_SQL,
        "spatial_knn": Q_SPATIAL_KNN_SQL,
        "nearest_facility": Q_NEAREST_FACILITY_SQL,
        "pricing_summary": Q_PRICING_SQL,
        "top_customers": Q_TOP_CUSTOMERS_SQL,
        "events_window": Q_EVENTS_WINDOW_SQL,
        "sliding_window": Q_SLIDING_WINDOW_SQL,
        "sessions": Q_SESSIONS_SQL,
        "interval_union": Q_INTERVAL_UNION_SQL,
        "mode_event": Q_MODE_EVENT_SQL,
        "latest_by_key": Q_LATEST_BY_KEY_SQL,
        "distinct_users": Q_DISTINCT_USERS_SQL,
        "user_journey": Q_USER_JOURNEY_SQL,
        "funnel": Q_FUNNEL_SQL,
        "transitions": Q_TRANSITIONS_SQL,
        "price_histogram": Q_PRICE_HISTOGRAM_SQL,
        "hash_sample": Q_HASH_SAMPLE_SQL,
        "asof_join": Q_ASOF_JOIN_SQL,
        "range_join": Q_RANGE_JOIN_SQL,
        "range_join_big": Q_RANGE_JOIN_SQL,
        "dedup_exact": Q_DEDUP_EXACT_SQL,
        "incremental_dedup": Q_INCREMENTAL_DEDUP_SQL,
        "dedup_components": Q_DEDUP_COMPONENTS_SQL,
        "dedup_apply": Q_DEDUP_APPLY_SQL,
        "safe_split": Q_SAFE_SPLIT_SQL,
        "text_stats": Q_TEXT_STATS_SQL,
        "regex_tokens": Q_REGEX_TOKENS_SQL,
        "ann_topk": Q_ANN_TOPK_SQL,
        "ann_filtered": Q_ANN_FILTERED_SQL,
        "table_diff": Q_TABLE_DIFF_SQL,
        "ann_ivf": Q_ANN_IVF_SQL,
        "revenue_by_nation": Q_REVENUE_BY_NATION_SQL,
        "order_priority": Q_ORDER_PRIORITY_SQL,
        "quality_filter": Q_QUALITY_FILTER_SQL,
        "revenue_share": Q_REVENUE_SHARE_SQL,
        "caption_stats": Q_CAPTION_STATS_SQL,
        "triangles": Q_TRIANGLES_SQL,
        "pagerank": Q_PAGERANK_SQL,
        "group_regression": Q_GROUP_REGRESSION_SQL,
        "bfs_depth": Q_BFS_DEPTH_SQL,
        "retention": Q_RETENTION_SQL,
        "basket_pairs": Q_BASKET_PAIRS_SQL,
        "quantile_sketch": Q_QUANTILE_SKETCH_SQL,
        "skyline": Q_SKYLINE_SQL,
        "lang_id": Q_LANG_ID_SQL,
        "poly_clip": Q_POLY_CLIP_SQL,
        "wkb_clip": Q_POLY_CLIP_SQL,
        "poly_clip_quads": Q_POLY_CLIP_QUADS_SQL,
        "tile_coverage_rects": Q_TILE_COVERAGE_RECTS_SQL,
        "tile_coverage": Q_TILE_COVERAGE_SQL,
        "tile_mosaic": _build_tile_mosaic_sql(),
        "footprint_metrics": Q_FOOTPRINT_METRICS_SQL,
        "fingerprints": Q_FINGERPRINTS_SQL,
        "simhash_pairs": Q_SIMHASH_PAIRS_SQL,
        "ann_lsh": Q_ANN_LSH_SQL,
        "embedding_near_dup": Q_EMBEDDING_NEAR_DUP_SQL,
        "minhash_near_dup": Q_MINHASH_SQL,
        "ngram_dedup": Q_NGRAM_DEDUP_SQL,
        "grouped_topk": Q_GROUPED_TOPK_SQL,
        "running_total": Q_RUNNING_TOTAL_SQL,
        "event_gaps": Q_EVENT_GAPS_SQL,
        "hll_distinct": Q_HLL_DISTINCT_SQL,
        "kmv_overlap": _build_kmv_sql(),
        "cms_counts": Q_CMS_COUNTS_SQL,
        "gram_matrix": Q_GRAM_MATRIX_SQL,
        "dim_stats": Q_DIM_STATS_SQL,
        "cell_rollup": Q_CELL_ROLLUP_SQL,
        "focal_sum": Q_FOCAL_SUM_SQL,
        "spatial_antijoin": Q_SPATIAL_ANTIJOIN_SQL,
        "dist_join": Q_DIST_JOIN_SQL,
        "vocab_topk": Q_VOCAB_TOPK_SQL,
        "word_pairs": Q_WORD_PAIRS_SQL,
        "tfidf_topterms": Q_TFIDF_SQL,
        "rollup_sales": Q_ROLLUP_SALES_SQL,
        "cube_sales": Q_CUBE_SALES_SQL,
        "group_quantiles": Q_GROUP_QUANTILES_SQL,
        "quartile_label": Q_QUARTILE_LABEL_SQL,
        "anti_join": Q_ANTI_JOIN_SQL,
        "semi_join": Q_SEMI_JOIN_SQL,
        "left_join": Q_LEFT_JOIN_SQL,
        "full_join": Q_FULL_JOIN_SQL,
        "zonal_stats": Q_ZONAL_STATS_SQL,
        "buffer_dissolve": Q_BUFFER_DISSOLVE_SQL,
        "stratified_sample": Q_STRATIFIED_SAMPLE_SQL,
        "pivot_events": Q_PIVOT_EVENTS_SQL,
        "image_near_dup": _build_image_near_dup_sql(),
        "image_sim_topk": _build_image_sim_sql(),
        "aspect_bucket": _build_aspect_bucket_sql(),
        "token_shards": Q_TOKEN_SHARDS_SQL,
        "data_mixture": Q_DATA_MIXTURE_SQL,
        "cum_distinct": Q_CUM_DISTINCT_SQL,
        "promo_revenue": Q_PROMO_REVENUE_SQL,
        "returned_items": Q_RETURNED_ITEMS_SQL,
        "ann_pq": _build_ann_pq_sql(),
        "caption_dedup": _build_caption_dedup_sql(),
        "convex_hull": _build_convex_hull_sql(),
        "bm25_topterms": Q_BM25_SQL,
        "pca_power": _build_pca_power_sql(),
        "props_extract": Q_PROPS_EXTRACT_SQL,
        "gap_fill": Q_GAP_FILL_SQL,
        "zorder_layout": Q_ZORDER_LAYOUT_SQL,
        "period_over_period": Q_PERIOD_OVER_PERIOD_SQL,
        "skew_report": Q_SKEW_REPORT_SQL,
        "contamination": _build_contamination_sql(),
        "substring_dedup": Q_SUBSTRING_DEDUP_SQL,
        "percent_rank": Q_PERCENT_RANK_SQL,
        "kmeans_labels": _build_kmeans_sql(),
        "late_events": Q_LATE_EVENTS_SQL,
        "semantic_dedup": _build_semantic_dedup_sql(),
        "degree_hist": Q_DEGREE_HIST_SQL,
        "stream_join": Q_STREAM_JOIN_SQL,
        "bloom_join": Q_BLOOM_JOIN_SQL,
        "contamination_winnow": _build_contamination_winnow_sql(),
        "cdc_state": Q_CDC_STATE_SQL,
        "moving_window": Q_MOVING_WINDOW_SQL,
        "geom_validate": _build_geom_validate_sql(),
        "corpus_curation": _build_corpus_curation_sql(),
        "image_curation": _build_image_curation_sql(),
        "bpe_merges": _build_bpe_sql(),
        "bpe_tokenize": _build_bpe_tokenize_sql(),
    }
