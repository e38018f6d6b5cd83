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
    """Per-row invariant: decoded pixels exact (raw AND png are both
    lossless real decodes now) and caption equality; recomputed phash
    matches the stored one for EVERY row."""
    t = synth_image_batch(np.arange(40))
    feats = DecodeFeatures()(t)
    png_rows = [i for i in range(40) if t["fmt"][i].as_py() == "png"]
    assert png_rows  # the compressed path is exercised
    assert feats["phash_decoded"].to_pylist() == t["phash"].to_pylist()
    assert feats["caption"].to_pylist() == t["caption"].to_pylist()
    # PSNR of identical decode is inf >= 40
    px = decode_image(
        t["bytes"][0].as_py(), t["w"][0].as_py(), t["h"][0].as_py(), "raw"
    )
    assert psnr(px, px) == float("inf")


def test_png_rows_decode_to_generator_pixels():
    """fmt='png' payloads are REAL PNGs whose decode reproduces the
    exact pixel plane the generator drew (per-row lossless invariant)."""
    t = synth_image_batch(np.arange(0, 45, 11))  # indices % 11 == 0 → png
    assert set(t["fmt"].to_pylist()) == {"png"}
    for i in range(t.num_rows):
        w, h = t["w"][i].as_py(), t["h"][i].as_py()
        payload = t["bytes"][i].as_py()
        assert payload[:8] == b"\x89PNG\r\n\x1a\n"
        px = decode_image(payload, w, h, "png")
        idx = int(t["image_id"][i].as_py()[4:])
        rng = np.random.Generator(np.random.PCG64(42 * 1_000_003 + idx))
        expected = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert (px == expected).all()


def test_decode_quality_matches_generator_and_filters():
    """DecodeQuality reproduces the generator-side integer stats
    through the decode path (incl. the PNG rows) and keeps exactly the
    above-mid-gray rows."""
    from rust_geo_booleanop_ray.sources.images import (
        _base_pixels,
        image_quality_keep,
        quality_stats,
    )
    from rust_geo_booleanop_ray.stages.image_ops import DecodeQuality

    t = synth_image_batch(np.arange(60))
    out = DecodeQuality()(t)
    want = {}
    for i in range(60):
        px = _base_pixels(i)
        bright, ssq, edge = quality_stats(px)
        if image_quality_keep(bright, px.size):
            want[f"img-{i:08d}"] = (bright, ssq, edge)
    got = {
        out["image_id"][i].as_py(): (
            out["bright_sum"][i].as_py(),
            out["contrast_ssq"][i].as_py(),
            out["edge_energy"][i].as_py(),
        )
        for i in range(out.num_rows)
    }
    assert got == want
    assert 0 < len(want) < 60  # the filter is non-trivial both ways
    # keep_cols ride through the stage and are filtered consistently
    out2 = DecodeQuality(keep_cols=("w", "h"))(t)
    assert out2.column_names[-2:] == ["w", "h"]
    assert out2["image_id"].to_pylist() == out["image_id"].to_pylist()
    src_wh = {
        t["image_id"][i].as_py(): (t["w"][i].as_py(), t["h"][i].as_py())
        for i in range(t.num_rows)
    }
    for i in range(out2.num_rows):
        iid = out2["image_id"][i].as_py()
        assert (out2["w"][i].as_py(), out2["h"][i].as_py()) == src_wh[iid]


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


def test_pyramid_decode_matches_generator():
    """DecodePyramid reproduces the generator-side per-level checksums
    through the decode path (incl. PNG rows) for both levels."""
    from rust_geo_booleanop_ray.sources.images import (
        box_downsample2,
        expected_pyramid,
    )
    from rust_geo_booleanop_ray.stages.image_ops import DecodePyramid

    t = synth_image_batch(np.arange(44))
    out = DecodePyramid(levels=2)(t)
    want = expected_pyramid(44, levels=2)
    got = sorted(zip(*(out[c].to_pylist() for c in out.column_names)))
    exp = sorted(zip(*(want[c].to_pylist() for c in want.column_names)))
    assert got == exp
    # kernel sanity: 2x2 blocks of a constant image stay constant,
    # floor-mean on a crafted block is exact
    px = np.zeros((4, 4, 3), dtype=np.uint8)
    px[0, 0] = (1, 2, 3)
    px[0, 1] = (2, 3, 4)
    px[1, 0] = (3, 4, 5)
    px[1, 1] = (5, 6, 7)
    d = box_downsample2(px)
    assert d.shape == (2, 2, 3)
    assert d[0, 0].tolist() == [(1 + 2 + 3 + 5) // 4, (2 + 3 + 4 + 6) // 4, (3 + 4 + 5 + 7) // 4]


def test_augment_decode_matches_generator():
    from rust_geo_booleanop_ray.sources.images import (
        augment_pixels,
        expected_augmented,
    )
    from rust_geo_booleanop_ray.stages.image_ops import DecodeAugment

    t = synth_image_batch(np.arange(33))
    out = DecodeAugment()(t)
    want = expected_augmented(33)
    got = sorted(zip(*(out[c].to_pylist() for c in out.column_names)))
    exp = sorted(zip(*(want[c].to_pylist() for c in want.column_names)))
    assert got == exp
    # rearrangement-only invariants: byte multiset preserved, dims swap
    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    f = augment_pixels(px, "flip_h")
    r = augment_pixels(px, "rot90")
    assert sorted(f.ravel()) == sorted(px.ravel())
    assert r.shape == (3, 2, 3)
    assert (f[:, 0] == px[:, -1]).all()
