"""Golden-file conformance: the reference's 45-case GeoJSON corpus,
bit-for-bit, with automatic A/B-swap symmetry checks
(reference tests/src/generic_test_cases.rs:96-122)."""

import os

import pytest

from rust_geo_booleanop_ray.geom import boolean_op
from rust_geo_booleanop_ray.geom.boolean_op import boolean_op_python
from rust_geo_booleanop_ray.sources.geojson_fixtures import (
    OP_TAGS,
    SWAPPABLE,
    apply_test_operation,
    load_fixture,
    multipolygons_equal,
)

from rust_geo_booleanop_ray.sources.fixture_pairs import DEFAULT_FIXTURE_DIR

FIXTURE_DIR = DEFAULT_FIXTURE_DIR

# the dispatching kernel (native C when built, else Python) AND the
# pure-Python kernel are BOTH held to the golden corpus — the Python
# path stays the parity oracle for the C port
KERNELS = [("dispatch", boolean_op), ("python", boolean_op_python)]


def _cases():
    if not os.path.isdir(FIXTURE_DIR):
        return []
    out = []
    for fn in sorted(os.listdir(FIXTURE_DIR)):
        if fn.endswith(".geojson"):
            out.append(fn)
    return out


@pytest.mark.parametrize("kernel_name,kernel", KERNELS)
@pytest.mark.parametrize("filename", _cases())
def test_generic_case(filename, kernel_name, kernel):
    case = load_fixture(os.path.join(FIXTURE_DIR, filename))
    assert case.expected, f"{filename}: no expected results"
    for exp in case.expected:
        result = apply_test_operation(kernel, case.subject, case.clipping, exp.op_tag)
        assert multipolygons_equal(result, exp.result), (
            f"{filename} / {exp.op_tag} / {kernel_name} / main has result deviation"
        )
        if exp.op_tag in SWAPPABLE and not exp.swap_ab_is_broken:
            op, _ = OP_TAGS[exp.op_tag]
            swapped = kernel(case.clipping, case.subject, op)
            assert multipolygons_equal(swapped, exp.result), (
                f"{filename} / {exp.op_tag} / {kernel_name} / swap has result deviation"
            )


def test_corpus_is_present():
    assert len(_cases()) >= 45


def test_martinez_fixtures_oracle_literals_are_golden_derived():
    """The driver-green `martinez_fixtures` CORRECTNESS row is only a
    conformance gate if the SQL literals provably derive from the
    golden fixtures: recompute (case, op, n_polys, n_vertices,
    result_hash) from the fixture files' EXPECTED geometries and assert
    both that the oracle-literal table equals that recomputation and
    that the engine kernel reproduces every hash bit-for-bit."""
    from rust_geo_booleanop_ray.sources.fixture_pairs import (
        golden_expected_table,
        mp_conformance_hash,
    )

    golden = golden_expected_table()
    rows = {
        (r["case_id"], r["op_tag"]): r for r in golden.to_pylist()
    }
    n_checked = 0
    for fn in _cases():
        case = load_fixture(os.path.join(FIXTURE_DIR, fn))
        for exp in case.expected:
            r = rows[(case.name, exp.op_tag)]
            assert r["n_polys"] == len(exp.result)
            assert r["n_vertices"] == sum(
                len(ring) for p in exp.result for ring in p
            )
            # literal == serialization of the GOLDEN geometry
            assert r["result_hash"] == mp_conformance_hash(exp.result)
            # and the engine reproduces it bit-for-bit
            result = apply_test_operation(
                boolean_op, case.subject, case.clipping, exp.op_tag
            )
            assert mp_conformance_hash(result) == r["result_hash"], (
                f"{fn} / {exp.op_tag}: engine hash != golden hash"
            )
            n_checked += 1
    assert n_checked == golden.num_rows >= 78
