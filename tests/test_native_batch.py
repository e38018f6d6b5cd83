"""Native batch kernel: whole-corpus golden equality through the
Arrow-offsets batch entry point, trivial-path semantics, and the
BooleanOpBatch stage routing."""

import glob

import numpy as np
import pyarrow as pa
import pytest

from rust_geo_booleanop_ray.native import (
    native_available,
    native_boolean_batch,
)
from rust_geo_booleanop_ray.sources.arrow_geom import arrow_to_mps, mps_to_arrow
from rust_geo_booleanop_ray.sources.geojson_fixtures import OP_TAGS, load_fixture
from rust_geo_booleanop_ray.stages.boolean_batch import BooleanOpBatch

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native kernel not built"
)

FIXTURES = sorted(
    glob.glob(
        __import__(
            "rust_geo_booleanop_ray.sources.fixture_pairs", fromlist=["DEFAULT_FIXTURE_DIR"]
        ).DEFAULT_FIXTURE_DIR
        + "/*.geojson"
    )
)


def test_batch_corpus_bit_for_bit():
    subs, clips, ops, expected = [], [], [], []
    for p in FIXTURES:
        case = load_fixture(p)
        for exp in case.expected:
            op, swap = OP_TAGS[exp.op_tag]
            s, c = (
                (case.clipping, case.subject) if swap else (case.subject, case.clipping)
            )
            subs.append(s)
            clips.append(c)
            ops.append(op)
            expected.append(exp.result)

    res = native_boolean_batch(mps_to_arrow(subs), mps_to_arrow(clips), ops)
    mps = arrow_to_mps(res)
    assert len(mps) == len(expected)
    for i, (m, e) in enumerate(zip(mps, expected)):
        assert m == e, f"pair {i} deviates"


def test_batch_trivial_paths():
    A = [[[(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0), (0.0, 0.0)]]]
    B = [[[(5.0, 5.0), (6.0, 5.0), (6.0, 6.0), (5.0, 6.0), (5.0, 5.0)]]]
    sa = mps_to_arrow([A] * 4)
    ca = mps_to_arrow([B] * 4)
    res = arrow_to_mps(
        native_boolean_batch(sa, ca, ["intersection", "union", "difference", "xor"])
    )
    assert res == [[], A + B, A, A + B]


def test_stage_routes_through_batch():
    A = [[[(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)]]]
    B = [[[(2.0, 2.0), (6.0, 2.0), (6.0, 6.0), (2.0, 6.0), (2.0, 2.0)]]]
    batch = pa.table(
        {"subject": mps_to_arrow([A] * 3), "clipping": mps_to_arrow([B] * 3)}
    )
    out = BooleanOpBatch("intersection")(batch)
    mps = arrow_to_mps(out["result"])
    assert mps == [[[[(2.0, 2.0), (4.0, 2.0), (4.0, 4.0), (2.0, 4.0), (2.0, 2.0)]]]] * 3


def test_batch_empty_inputs_match_python():
    """Empty multipolygon operands take the bbox-disjoint trivial path
    in both kernels with identical results."""
    from rust_geo_booleanop_ray.geom.boolean_op import boolean_op_python

    A = [[[(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0), (0.0, 0.0)]]]
    E = []
    for s, c in [(A, E), (E, A), (E, E)]:
        for op in ("intersection", "union", "difference", "xor"):
            got = arrow_to_mps(
                native_boolean_batch(mps_to_arrow([s]), mps_to_arrow([c]), [op])
            )[0]
            assert got == boolean_op_python(s, c, op)
