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
