"""Synthetic image source, decode features, footprints, per-row invariant."""

import numpy as np
import pyarrow as pa

from rust_geo_booleanop_ray.sources.arrow_geom import arrow_mp_bounds, arrow_to_mps
from rust_geo_booleanop_ray.sources.images import synth_image_batch
from rust_geo_booleanop_ray.stages.footprint import derive_footprints
from rust_geo_booleanop_ray.stages.image_ops import (
    DecodeFeatures,
    decode_image,
    psnr,
    resize_nearest,
)


def test_synth_images_deterministic():
    a = synth_image_batch(np.arange(50))
    b = synth_image_batch(np.arange(50))
    assert a.equals(b)
    # disjoint index slices agree with full generation
    c = synth_image_batch(np.arange(10, 20))
    assert c.equals(a.slice(10, 10))


def test_schema_matches_input_hint():
    t = synth_image_batch(np.arange(5))
    assert [(f.name, str(f.type)) for f in t.schema] == [
        ("image_id", "string"),
        ("bytes", "binary"),
        ("w", "int32"),
        ("h", "int32"),
        ("fmt", "string"),
        ("caption", "string"),
        ("phash", "int64"),
    ]


def test_decode_roundtrip_invariant():
    """Per-row invariant: decoded pixels allclose (exact for raw) and
    caption equality; recomputed phash matches the stored one."""
    t = synth_image_batch(np.arange(40))
    feats = DecodeFeatures()(t)
    raw_rows = [i for i in range(40) if t["fmt"][i].as_py() == "raw"]
    assert raw_rows
    for i in raw_rows:
        assert feats["phash_decoded"][i].as_py() == t["phash"][i].as_py()
    assert feats["caption"].to_pylist() == t["caption"].to_pylist()
    # PSNR of identical decode is inf >= 40
    px = decode_image(
        t["bytes"][0].as_py(), t["w"][0].as_py(), t["h"][0].as_py(), "raw"
    )
    assert psnr(px, px) == float("inf")


def test_resize_nearest():
    px = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    out = resize_nearest(px, 3, 2)
    assert out.shape == (2, 3, 3)
    assert (out[0, 0] == px[0, 0]).all()


def test_footprints_cover_plausible_world():
    t = synth_image_batch(np.arange(300))
    f = derive_footprints(t)
    b = arrow_mp_bounds(f["footprint"])
    assert (b["minx"] >= -180 - 15).all() and (b["maxx"] <= 180 + 15).all()
    mps = arrow_to_mps(f["footprint"])
    assert all(len(mp) == 1 and len(mp[0]) == 1 and len(mp[0][0]) == 5 for mp in mps)
    # closed rings
    assert all(mp[0][0][0] == mp[0][0][-1] for mp in mps)
    # giant-footprint skew rows exist (idx 0 and 512 would be; here only 0)
    widths = b["maxx"] - b["minx"]
    assert widths.max() >= 20.0
    assert np.median(widths) < 3.0
