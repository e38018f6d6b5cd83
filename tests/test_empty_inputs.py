"""Empty-input robustness: every bucketed kernel must survive empty
tables / empty buckets (the dim_stats empty-block crash class) and
return an empty result rather than raising."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("empty_sf"))
    for table in ["events", "documents", "orders", "lineitem", "part", "customer", "nation", "embeddings", "supplier"]:
        t = pq.read_table(f"{SRC}/{table}.parquet")
        pq.write_table(t.slice(0, 0), f"{d}/{table}.parquet")
    return d


EMPTY_SAFE_QUERIES = [
    "cum_distinct",
    "gap_fill",
    "late_events",
    "stream_join",
    "token_shards",
    "data_mixture",
    "cdc_state",
    "period_over_period",
    "degree_hist",
    "percent_rank",
    "contamination",
    "props_extract",
]


@pytest.mark.parametrize("name", EMPTY_SAFE_QUERIES)
def test_query_on_empty_tables(ray_session, empty_sf, name):
    from rust_geo_booleanop_ray.pipelines.queries import build_queries

    res = build_queries()[name](empty_sf)
    n = res.count() if hasattr(res, "count") else len(res)
    assert n == 0
