"""Minimum Ray slice: fixture pairs → map_batches(BooleanOpBatch) →
results equal both the direct kernel output and the goldens."""

import pyarrow as pa

from rust_geo_booleanop_ray.sources.arrow_geom import arrow_to_mps, mps_to_arrow
from rust_geo_booleanop_ray.sources.fixture_pairs import fixture_pairs_table
from rust_geo_booleanop_ray.stages.boolean_batch import BooleanOpBatch


def test_boolean_batch_local():
    """Stage as a plain function on one Arrow batch (no Ray)."""
    table = fixture_pairs_table()
    out = BooleanOpBatch(op_column="op")(table)
    results = arrow_to_mps(out["result"])
    expected = arrow_to_mps(out["expected"])
    assert results == expected


def test_boolean_batch_ray_pipeline(ray_session):
    import ray.data as rd

    table = fixture_pairs_table()
    ds = rd.from_arrow(table)
    out = ds.map_batches(
        BooleanOpBatch(op_column="op"),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=16,
    )
    got = out.take_all()
    assert len(got) == table.num_rows
    by_key = {(r["case_id"], r["op_tag"]): r for r in got}
    exp_tbl = table.to_pylist()
    for row in exp_tbl:
        g = by_key[(row["case_id"], row["op_tag"])]
        assert g["result"] == g["expected"], (row["case_id"], row["op_tag"])


def test_boolean_batch_disjoint_fast_path():
    sq = [[[(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0), (0.0, 0.0)]]]
    far = [[[(9.0, 9.0), (10.0, 9.0), (10.0, 10.0), (9.0, 10.0), (9.0, 9.0)]]]
    t = pa.table(
        {
            "subject": mps_to_arrow([sq, sq]),
            "clipping": mps_to_arrow([far, sq]),
        }
    )
    out = BooleanOpBatch("union")(t)
    res = arrow_to_mps(out["result"])
    assert res[0] == sq + far  # trivial concatenation
    assert res[1] == sq


def test_on_error_null_poison_pill():
    """A malformed geometry yields a null result + error string instead
    of failing the task (poison-pill isolation for 100 TB runs)."""
    import pyarrow as pa

    from rust_geo_booleanop_ray.sources.arrow_geom import MULTIPOLYGON_T, mps_to_arrow
    from rust_geo_booleanop_ray.stages.boolean_batch import BooleanOpBatch

    good = [[[(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)]]]
    clip = [[[(1.0, 1.0), (3.0, 1.0), (3.0, 3.0), (1.0, 3.0), (1.0, 1.0)]]]
    batch = pa.table(
        {
            "subject": mps_to_arrow([good, good]),
            "clipping": mps_to_arrow([clip, clip]),
            # second row carries a poison op tag — boolean_op raises on it
            "op": pa.array(["intersection", "not_an_op"]),
        }
    )

    import pytest

    with pytest.raises(Exception):
        BooleanOpBatch(op_column="op")(batch)  # default raises

    out = BooleanOpBatch(op_column="op", on_error="null")(batch)
    assert out["result"][0].as_py() is not None
    assert out["result"][1].as_py() is None
    errs = out["result_error"].to_pylist()
    assert errs[0] is None and errs[1]
