"""Cluster job entry point for the flagship tiling pipeline.

On a real multi-node cluster this is the submittable unit:

    ray job submit --working-dir . -- \
        python scripts/flagship_job.py --out s3://bucket/tiles \
            --n-images 1000000000 --tile-res 9 --raster-px 64

The job is resumable: output partitions commit atomically with
per-partition lineage manifests (see state/lineage.py), so re-submitting
after a failure skips finished partitions.  Locally it runs against
`ray.init(address="local")` (RAY_ADDRESS=local is preset in this
sandbox); on a cluster `ray job submit` provides the address.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# submitted with --working-dir .; make the package importable when run
# from the repo root or the job's working dir
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="Flagship tiling job")
    parser.add_argument("--out", required=True, help="output directory")
    parser.add_argument("--n-images", type=int, default=100_000)
    parser.add_argument("--tile-res", type=int, default=5)
    parser.add_argument("--raster-px", type=int, default=16)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--input", default=None,
                        help="parquet/lance image table (default: synthetic)")
    args = parser.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(include_dashboard=False)

    from rust_geo_booleanop_ray.pipelines.flagship import tile_pipeline_resumable
    from rust_geo_booleanop_ray.sources.images import read_image_table

    images_ds = read_image_table(args.input) if args.input else None

    t0 = time.perf_counter()
    metrics = tile_pipeline_resumable(
        args.out,
        n_images=args.n_images,
        tile_res=args.tile_res,
        raster_px=args.raster_px,
        seed=args.seed,
        images_ds=images_ds,
    ).take_all()
    dt = time.perf_counter() - t0

    written = sum(1 for m in metrics if not m["skipped"])
    skipped = len(metrics) - written
    rows = sum(m["rows"] for m in metrics)
    print(json.dumps({
        "partitions_written": written,
        "partitions_skipped": skipped,
        "tile_rows": rows,
        "wall_sec": round(dt, 2),
        "images_per_sec": round(args.n_images / dt, 1),
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
