"""Multi-format ingestion: the same events table as parquet, CSV and
JSONL must produce IDENTICAL results through the same pipeline
(sources/tabular.py::read_table_any)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _export_all_formats(tmpdir: str) -> dict:
    t = pq.read_table(
        f"{SF}/events.parquet", columns=["event_id", "ts", "user_id", "value"]
    )
    paths = {"parquet": f"{tmpdir}/events.parquet"}
    pq.write_table(t, paths["parquet"])
    from pyarrow import csv as pacsv

    paths["csv"] = f"{tmpdir}/events.csv"
    pacsv.write_csv(t, paths["csv"])
    paths["jsonl"] = f"{tmpdir}/events.jsonl"
    df = t.to_pandas()
    df["ts"] = df["ts"].astype("datetime64[us]").astype(str)
    df.to_json(paths["jsonl"], orient="records", lines=True)
    return paths


def _aggregate(ds):
    import pyarrow.compute as pc

    def partial(b: pa.Table) -> pa.Table:
        ts = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        hour = ts // 3_600_000_000
        cents = np.floor(b["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        t = pa.table(
            {
                "hour": pa.array(hour),
                "n": pa.array(np.ones(len(hour), dtype=np.int64)),
                "sum_c": pa.array(cents),
            }
        )
        agg = pa.TableGroupBy(t, "hour").aggregate([("n", "sum"), ("sum_c", "sum")])
        return agg.rename_columns(["hour", "n", "sum_c"])

    from ray.data.aggregate import Sum

    rows = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("hour")
        .aggregate(Sum("n", alias_name="n"), Sum("sum_c", alias_name="sum_c"))
        .take_all()
    )
    return sorted((r["hour"], r["n"], r["sum_c"]) for r in rows)


def test_same_pipeline_over_parquet_csv_jsonl(ray_session, tmp_path):
    from rust_geo_booleanop_ray.sources.tabular import read_table_any

    paths = _export_all_formats(str(tmp_path))
    results = {}
    for fmt, path in paths.items():
        ds = read_table_any(
            path,
            columns=["event_id", "ts", "user_id", "value"],
            timestamp_cols=("ts",),
        )
        results[fmt] = _aggregate(ds)
    assert results["csv"] == results["parquet"]
    assert results["jsonl"] == results["parquet"]
    assert len(results["parquet"]) > 100  # real hourly spread


def test_read_table_any_rejects_unknown(ray_session, tmp_path):
    import pytest

    from rust_geo_booleanop_ray.sources.tabular import read_table_any

    p = str(tmp_path / "events.xyz")
    open(p, "w").write("x")
    with pytest.raises(ValueError):
        read_table_any(p)
