"""Flagship pipeline with lineage checkpoints: full run → damage one
partition → resume rewrites only that partition, output unchanged."""

import glob
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from rust_geo_booleanop_ray.pipelines.flagship import tile_pipeline_resumable


def _read_all(out_dir):
    files = sorted(glob.glob(os.path.join(out_dir, "part=*", "part.parquet")))
    t = pa.concat_tables([pq.read_table(f) for f in files])
    order = pa.compute.sort_indices(t, sort_keys=[("tile_id", "ascending")])
    return t.take(order)


def test_flagship_resume(tmp_path):
    out = str(tmp_path / "tiles")
    kw = dict(n_images=300, tile_res=4, raster_px=8)

    m1 = tile_pipeline_resumable(out, **kw).take_all()
    assert m1 and all(not r["skipped"] for r in m1)
    first = _read_all(out)
    assert first.num_rows > 0

    # damage one partition: drop its manifest (simulates a mid-run kill
    # between data write and commit)
    victim = sorted(glob.glob(os.path.join(out, "part=*")))[0]
    os.remove(os.path.join(victim, "_lineage.json"))

    m2 = tile_pipeline_resumable(out, **kw).take_all()
    assert len(m2) == 1 and not m2[0]["skipped"]
    assert f"part={m2[0]['part_key']}" == os.path.basename(victim)

    # resumed output is identical
    second = _read_all(out)
    assert second.equals(first)

    # config change ⇒ everything recomputes
    m3 = tile_pipeline_resumable(out, n_images=300, tile_res=4, raster_px=16).take_all()
    assert all(not r["skipped"] for r in m3)


def test_dedup_job_resume(tmp_path, ray_session):
    """The dedup job CLI commits hash-bucket partitions atomically and
    a re-run skips them all (pure function of input+config)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "dedup_job", os.path.join(os.path.dirname(__file__), "..", "scripts", "dedup_job.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    out = str(tmp_path / "dedup")
    sf = "/root/testdata/sf0.001/documents.parquet"
    import io
    from contextlib import redirect_stdout

    def run():
        buf = io.StringIO()
        with redirect_stdout(buf):
            mod.main(["--out", out, "--input", sf, "--n-parts", "8"])
        return json.loads(buf.getvalue().strip().splitlines()[-1])

    r1 = run()
    assert r1["partitions_written"] == 8
    assert r1["docs_kept"] == 500  # all texts distinct at sf0.001
    r2 = run()
    assert r2["partitions_written"] == 0  # all committed, skipped pre-shuffle
    assert len(glob.glob(os.path.join(out, "part=*", "_lineage.json"))) == 8
