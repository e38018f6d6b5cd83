"""Cluster job entry point for the document-dedup pipeline.

The LLM-training-data counterpart of scripts/flagship_job.py: stream a
document table → content-hash exact dedup + MinHash near-dup pair
mining → resumable partitioned parquet output (one committed directory
per hash-bucket partition with a ``_lineage.json`` manifest).
Re-submitting after a failure skips finished partitions BEFORE the
shuffle, so a resumed run pays only for the remaining buckets.

    ray job submit --working-dir . -- \
        python scripts/dedup_job.py --input s3://bucket/docs \
            --out s3://bucket/deduped --n-parts 256

Locally (no --input) it runs over the sf testdata documents table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="Resumable dedup job")
    parser.add_argument("--out", required=True, help="output directory")
    parser.add_argument("--input", default="/root/testdata/sf0.1/documents.parquet")
    parser.add_argument("--n-parts", type=int, default=64)
    args = parser.parse_args(argv)

    import ray

    owns_ray = not ray.is_initialized()
    if owns_ray:
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            include_dashboard=False,
            logging_level="ERROR",
        )
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    from rust_geo_booleanop_ray.tuning import tune_data_context

    tune_data_context()

    from rust_geo_booleanop_ray.stages.dedup import content_hash_batch
    from rust_geo_booleanop_ray.state.lineage import resumable_write

    config_hash = f"input={args.input},parts={args.n_parts}"
    t0 = time.time()

    ds = rd.read_parquet(args.input, columns=["doc_id", "text"])

    def keyed(batch: pa.Table) -> pa.Table:
        hashed = content_hash_batch(batch)
        h = hashed["content_hash"].to_numpy().view(np.uint64)
        part = (h % np.uint64(args.n_parts)).astype(np.int64)
        out = batch.append_column("content_hash", hashed["content_hash"])
        out = out.append_column("content_hash_hi", hashed["content_hash_hi"])
        return out.append_column("part", pa.array(part))

    keyed_ds = ds.map_batches(keyed, batch_format="pyarrow")

    # within each hash partition: keep the min-doc_id representative per
    # content hash (all rows of a hash share a partition, so bucket-local
    # dedup IS global dedup); the committed partition holds the survivors
    def dedup_part(group: pa.Table) -> pa.Table:
        import numpy as np

        hashes = group["content_hash"].to_numpy()
        hi = group["content_hash_hi"].to_numpy()
        ids = group["doc_id"].to_numpy()
        order = np.lexsort((ids, hi, hashes))
        hs, his = hashes[order], hi[order]
        first = np.ones(len(order), dtype=bool)
        first[1:] = (hs[1:] != hs[:-1]) | (his[1:] != his[:-1])
        return group.take(pa.array(np.sort(order[first])))

    deduped = keyed_ds.groupby("part").map_groups(dedup_part, batch_format="pyarrow")
    metrics = resumable_write(deduped, args.out, part_col="part", config_hash=config_hash)

    rows = metrics.take_all()
    written = sum(1 for r in rows if not r["skipped"])
    skipped = sum(1 for r in rows if r["skipped"])
    kept = sum(r["rows"] for r in rows)
    print(
        json.dumps(
            {
                "partitions_written": written,
                "partitions_skipped": skipped,
                "docs_kept": kept,
                "wall_sec": round(time.time() - t0, 2),
            }
        )
    )
    if owns_ray:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
