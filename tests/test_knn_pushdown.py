"""kNN query-predicate pushdown: restricted query sets produce the same
answers for those queries as the all-points run, and empty-query batches
are handled (regression: np.concatenate on zero query rows)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from rust_geo_booleanop_ray.stages.knn import knn_pipeline, prepare_knn_rows


def _points_table(n=200, seed=3, query_ids=None):
    rng = np.random.default_rng(seed)
    ids = np.arange(n, dtype=np.int64)
    t = {
        "pid": pa.array(ids),
        "cx": pa.array(rng.uniform(5, 85, n)),
        "cy": pa.array(rng.uniform(5, 85, n)),
    }
    if query_ids is not None:
        t["is_query"] = pa.array(np.isin(ids, query_ids))
    return pa.table(t)


def _rows(ds):
    return sorted(
        ds.take_all(), key=lambda r: (r["query_id"], r["rank"])
    )


def test_pushdown_matches_full_run(ray_session):
    queries = np.array([3, 17, 42], dtype=np.int64)
    full = knn_pipeline(
        rd.from_arrow(_points_table()), k=4, res=3, id_col="pid"
    )
    full_rows = [r for r in _rows(full) if r["query_id"] in set(queries.tolist())]

    pushed = knn_pipeline(
        rd.from_arrow(_points_table(query_ids=queries)),
        k=4,
        res=3,
        id_col="pid",
        query_col="is_query",
    )
    assert _rows(pushed) == full_rows


def test_empty_query_batch():
    t = _points_table(n=8, query_ids=np.array([], dtype=np.int64))
    out = prepare_knn_rows(t, res=3, id_col="pid", query_col="is_query")
    # 8 data rows, zero query replicas
    assert out.num_rows == 8
    assert set(out["side"].to_pylist()) == {"data"}


def test_dist_join_exactly_once_across_cells(ray_session):
    """Pairs straddling cell boundaries are emitted exactly once, and
    the pair set matches brute force."""
    import itertools

    import ray.data as rd

    from rust_geo_booleanop_ray.stages.dist_join import dist_join_pipeline

    rng = np.random.RandomState(5)
    # integer lattice spanning many res-5 cells incl. boundary-hugging
    # points (res-5 edges: 11.25 x, 5.625 y -> x=11,12 / y=5,6 straddle)
    xs = rng.randint(0, 60, 400).astype(np.float64)
    ys = rng.randint(0, 40, 400).astype(np.float64)
    ids = np.arange(400, dtype=np.int64)
    t = pa.table({"pid": pa.array(ids), "px": pa.array(xs), "py": pa.array(ys)})
    out = dist_join_pipeline(
        rd.from_arrow(t).repartition(7), eps=5.0, res=5,
        id_col="pid", x_col="px", y_col="py",
    ).take_all()
    got = sorted((r["id_a"], r["id_b"], r["d2"]) for r in out)
    assert len(got) == len(set((a, b) for a, b, _ in got)), "duplicate pairs"
    want = sorted(
        (int(a), int(b), int((xs[a] - xs[b]) ** 2 + (ys[a] - ys[b]) ** 2))
        for a, b in itertools.combinations(range(400), 2)
        if (xs[a] - xs[b]) ** 2 + (ys[a] - ys[b]) ** 2 <= 25.0
    )
    assert got == want


def test_dist_join_rejects_oversized_eps():
    import pytest

    from rust_geo_booleanop_ray.stages.dist_join import check_eps_fits

    with pytest.raises(ValueError):
        check_eps_fits(6, 5.0)  # res-6 y edge is 2.8125 < eps
    check_eps_fits(5, 5.0)
