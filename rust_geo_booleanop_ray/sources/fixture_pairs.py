"""Fixture corpus → Arrow pair table (engine input for conformance runs).

Schema (FIXTURES.md §1):
  case_id: string, op: string (kernel op name), op_tag: string (raw
  5-valued fixture tag), subject/clipping/expected: multipolygon
  nested-list, swap_ab_is_broken: bool.

``diff_ba`` rows arrive with subject/clipping already swapped so the
engine only ever computes the 4 kernel ops (mirroring
tests/src/helper.rs:35-43).
"""

from __future__ import annotations

import os

import pyarrow as pa

from .arrow_geom import MULTIPOLYGON_T, mps_to_arrow
from .geojson_fixtures import OP_TAGS, load_fixture_dir

# The 45-case corpus is MIT-licensed test DATA vendored into the repo
# (tests/fixtures/) so the bit-for-bit conformance gate works without a
# reference checkout; the reference path is kept as a fallback only.
_VENDORED = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "tests",
    "fixtures",
)
_REFERENCE = "/root/reference/tests/fixtures"


def fixtures_root() -> str:
    """Root of the GeoJSON fixture tree (vendored copy preferred)."""
    if os.path.isdir(os.path.join(_VENDORED, "generic_test_cases")):
        return _VENDORED
    return _REFERENCE


DEFAULT_FIXTURE_DIR = os.path.join(fixtures_root(), "generic_test_cases")


def fixture_pairs_table(fixture_dir: str = DEFAULT_FIXTURE_DIR) -> pa.Table:
    case_ids, ops, op_tags, subjects, clippings, expecteds, broken = (
        [],
        [],
        [],
        [],
        [],
        [],
        [],
    )
    for case in load_fixture_dir(fixture_dir):
        for exp in case.expected:
            op, swap = OP_TAGS[exp.op_tag]
            case_ids.append(case.name)
            ops.append(op)
            op_tags.append(exp.op_tag)
            if swap:
                subjects.append(case.clipping)
                clippings.append(case.subject)
            else:
                subjects.append(case.subject)
                clippings.append(case.clipping)
            expecteds.append(exp.result)
            broken.append(exp.swap_ab_is_broken)

    return pa.table(
        {
            "case_id": pa.array(case_ids, pa.string()),
            "op": pa.array(ops, pa.string()),
            "op_tag": pa.array(op_tags, pa.string()),
            "subject": mps_to_arrow(subjects),
            "clipping": mps_to_arrow(clippings),
            "expected": mps_to_arrow(expecteds),
            "swap_ab_is_broken": pa.array(broken, pa.bool_()),
        }
    )


def mp_conformance_hash(mp) -> int:
    """64-bit fingerprint of a multipolygon's canonical serialization.

    The serialization is the byte-parity compact-GeoJSON writer
    (sinks/compact_geojson.py — byte-identical to the reference's
    write_compact_geojson on all 45 goldens), so two multipolygons hash
    equal iff they are bit-for-bit the same geometry.  Shared by the
    ``martinez_fixtures`` engine query (hashing ENGINE results) and the
    golden-derived oracle literals (hashing the fixtures' expected
    geometries) — driver hash equality therefore IS the bit-for-bit
    conformance gate."""
    import hashlib

    from ..sinks.compact_geojson import convert_to_feature, feature_collection_string

    s = feature_collection_string([convert_to_feature(mp)])
    return int.from_bytes(
        hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "big"
    ) - (1 << 63)


def golden_expected_table(fixture_dir: str = DEFAULT_FIXTURE_DIR) -> pa.Table:
    """(case_id, op_tag, n_polys, n_vertices, result_hash) derived from
    the GOLDEN expected geometries only — never from engine output.
    These rows become the VALUES literals of
    ``oracle_sql()['martinez_fixtures']``; tests/test_conformance.py
    asserts they equal the golden serialization, so the driver's
    hash-exact comparison pins the whole fixture corpus
    (/root/reference/tests/src/generic_test_cases.rs:45-94)."""
    case_ids, op_tags, n_polys, n_vertices, hashes = [], [], [], [], []
    for case in load_fixture_dir(fixture_dir):
        for exp in case.expected:
            case_ids.append(case.name)
            op_tags.append(exp.op_tag)
            n_polys.append(len(exp.result))
            n_vertices.append(sum(len(r) for p in exp.result for r in p))
            hashes.append(mp_conformance_hash(exp.result))
    return pa.table(
        {
            "case_id": pa.array(case_ids, pa.string()),
            "op_tag": pa.array(op_tags, pa.string()),
            "n_polys": pa.array(n_polys, pa.int64()),
            "n_vertices": pa.array(n_vertices, pa.int64()),
            "result_hash": pa.array(hashes, pa.int64()),
        }
    )
