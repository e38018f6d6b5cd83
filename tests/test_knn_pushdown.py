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
