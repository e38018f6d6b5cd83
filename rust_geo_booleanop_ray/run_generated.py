"""CLI generator-dataset runner —
`python -m rust_geo_booleanop_ray.run_generated <name> [out.geojson]`.

Mirror of the reference's run_generated_dataset binary
(reference tests/src/bin/run_generated_dataset.rs:13-45): builds one of
the canned generator datasets, runs all four boolean ops through the
Martinez kernel, and writes the inputs + results as compact GeoJSON
(plotting omitted — no display here).

Names: grid | circles_vs_rects | random_triangles
"""

from __future__ import annotations

import sys
import time

from .geom import boolean_op
from .geom.compute_fields import OP_DIFFERENCE, OP_INTERSECTION, OP_UNION, OP_XOR
from .sinks import convert_to_feature, write_compact_geojson
from .sources.generators import (
    generate_circles_vs_rects,
    generate_grid_polygons,
    generate_random_triangles_polygons,
)

DATASETS = {
    "grid": generate_grid_polygons,
    "circles_vs_rects": generate_circles_vs_rects,
    "random_triangles": generate_random_triangles_polygons,
}

OPS = [
    ("intersection", OP_INTERSECTION),
    ("union", OP_UNION),
    ("diff", OP_DIFFERENCE),
    ("xor", OP_XOR),
]


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if not argv or argv[0] not in DATASETS:
        print(f"usage: run_generated {{{'|'.join(DATASETS)}}} [out.geojson]")
        return 2
    name = argv[0]
    out_path = argv[1] if len(argv) > 1 else f"{name}.generated.geojson"

    a, b = DATASETS[name]()
    features = [convert_to_feature(a), convert_to_feature(b)]
    for tag, op in OPS:
        t0 = time.perf_counter()
        result = boolean_op(a, b, op)
        dt = time.perf_counter() - t0
        print(f"{name}/{tag}: {dt*1e3:.1f} ms, {len(result)} polygons")
        features.append(convert_to_feature(result, tag))

    write_compact_geojson(features, out_path)
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
