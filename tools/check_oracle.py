"""Local replica of the driver's correctness gate: run each queries()
entry and its oracle_sql() via DuckDB on the same sf_dir; compare
row count, schema (sorted column names) and an order-insensitive
value hash.  Usage: python tools/check_oracle.py [sf_dir] [names...]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res):
    if isinstance(res, pd.DataFrame):
        return res
    try:
        import pyarrow as pa

        if isinstance(res, pa.Table):
            return res.to_pandas()
    except ImportError:
        pass
    return res.to_pandas()  # ray Dataset


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    rows = sorted(df.itertuples(index=False, name=None))
    h = hashlib.sha256()
    for r in rows:
        h.update(repr(r).encode())
    return h.hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    ray.init(
        address="local",
        num_cpus=8,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = e.queries()
    oracles = e.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            mine = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"FAIL {name}: ray side raised {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(mine)} rows, cols={sorted(mine.columns)}")
            continue
        try:
            theirs = con.execute(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: oracle raised {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        ok_rows = len(mine) == len(theirs)
        ok_schema = sorted(mine.columns) == sorted(theirs.columns)
        ok_hash = ok_schema and value_hash(mine) == value_hash(theirs)
        status = "PASS" if (ok_rows and ok_schema and ok_hash) else "FAIL"
        if status == "PASS":
            n_pass += 1
        else:
            n_fail += 1
        print(
            f"{status} {name}: rows {len(mine)}/{len(theirs)} schema_ok={ok_schema} hash_ok={ok_hash}"
        )
        if status == "FAIL" and ok_schema:
            m = mine[sorted(mine.columns)].copy()
            t = theirs[sorted(theirs.columns)].copy()
            print("  mine:", m.head(3).to_dict("records"))
            print("  orcl:", t.head(3).to_dict("records"))
    print(f"\n{n_pass} pass, {n_fail} fail")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
