"""CLI fixture runner — `python -m rust_geo_booleanop_ray.run_fixture <file>`.

Mirror of the reference's run_single_test binary
(reference tests/src/bin/run_single_test.rs:15-60): copies the fixture
to `<file>.generated`, runs every expected operation through the
Martinez kernel, and rewrites the file with the byte-compatible compact
GeoJSON writer so it can be diffed against the golden.  `--swap-ab`
swaps the subject/clipping inputs.  (Plotting is intentionally omitted —
no display in this environment.)
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys

from .geom import boolean_op
from .sinks import convert_to_feature, write_compact_geojson
from .sources.geojson_fixtures import OP_TAGS, apply_test_operation, load_fixture


def run_generic_test_case(filename: str, swap_ab: bool = False) -> None:
    print(f"\n *** Running test case: {filename}")
    with open(filename) as f:
        doc = json.load(f)
    case = load_fixture(filename)
    subject, clipping = (
        (case.clipping, case.subject) if swap_ab else (case.subject, case.clipping)
    )

    in_feats = doc["features"][:2]
    output_features = list(reversed(in_feats)) if swap_ab else list(in_feats)

    for exp in case.expected:
        print(f"Testing operation: {exp.op_tag}")
        result = apply_test_operation(boolean_op, subject, clipping, exp.op_tag)
        output_features.append(convert_to_feature(result, exp.op_tag))

    write_compact_geojson(output_features, filename)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="Test case runner")
    parser.add_argument("file", help="Input file")
    parser.add_argument(
        "--swap-ab", action="store_true", help="Swap A/B input polygons"
    )
    args = parser.parse_args(argv)

    filename_out = args.file + ".generated"
    shutil.copy(args.file, filename_out)
    run_generic_test_case(filename_out, swap_ab=args.swap_ab)
    print(f"wrote {filename_out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
