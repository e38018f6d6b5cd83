"""Pure-numpy baseline JPEG codec: genuinely lossy round trips gated
on the input_hint invariant (decoded-pixel PSNR ≥ 40 dB for lossy
formats), dispatch through decode_image, and the mixed-format corpus.
"""

import numpy as np
import pyarrow as pa

from rust_geo_booleanop_ray.functions.jpeg import decode_jpeg, encode_jpeg
from rust_geo_booleanop_ray.sources.images import (
    JPEG_QUALITY,
    lossy_base_pixels,
    roundtrip_metrics,
    synth_lossy_batch,
)
from rust_geo_booleanop_ray.stages.image_ops import decode_image, psnr


def test_jpeg_roundtrip_is_lossy_but_above_40db():
    """The real invariant: the codec LOSES information (decode != input,
    finite PSNR) yet stays above 40 dB on the corpus content — the
    psnr helper finally sees non-identical decodes."""
    n_lossy = 0
    for i in range(0, 40):
        px = lossy_base_pixels(i)
        out = decode_jpeg(encode_jpeg(px, quality=JPEG_QUALITY))
        assert out.shape == px.shape
        p = psnr(px, out)
        if not np.array_equal(px, out):
            n_lossy += 1
            assert np.isfinite(p)
        assert p >= 40.0, f"row {i}: psnr {p:.2f} < 40 dB"
    assert n_lossy >= 30  # the corpus is genuinely lossy, not identity


def test_jpeg_is_a_real_lossy_codec_on_noise():
    """Incompressible noise at quality 90 must come back clearly
    degraded — proves quantization actually runs (an identity codec
    would pass the 40 dB gate vacuously)."""
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(px, quality=90))
    p = psnr(px, out)
    assert np.isfinite(p) and p < 35.0
    # and the payload is smaller than raw (entropy coding works)
    assert len(encode_jpeg(px, quality=50)) < px.nbytes


def test_jpeg_non_multiple_of_8_dims():
    px = lossy_base_pixels(1)  # 20-wide row in the size cycle
    sizes = {lossy_base_pixels(i).shape[:2] for i in range(25)}
    assert any(s[0] % 8 or s[1] % 8 for s in sizes)  # corpus exercises crop
    out = decode_jpeg(encode_jpeg(px, quality=95))
    assert out.shape == px.shape


def test_decode_image_dispatches_jpeg():
    px = lossy_base_pixels(3)
    payload = encode_jpeg(px, quality=JPEG_QUALITY)
    out = decode_image(payload, px.shape[1], px.shape[0], "jpeg")
    assert psnr(px, out) >= 40.0


def test_image_features_accepts_jpeg_rows():
    """DecodeFeatures (the image_features stage) runs over fmt='jpeg'
    rows through the same dispatch — no ImageCodecNotAvailable."""
    from rust_geo_booleanop_ray.stages.image_ops import DecodeFeatures

    batch = synth_lossy_batch(np.arange(8))
    assert "jpeg" in set(batch["fmt"].to_pylist())
    out = DecodeFeatures()(batch)
    assert out.num_rows == 8
    assert "phash_decoded" in out.column_names


def test_roundtrip_metrics_match_stage_semantics():
    """The oracle-literal math (roundtrip_metrics) agrees with a manual
    decode of the corpus payload — pins that the driver-side literals
    describe the same bytes the engine decodes."""
    batch = synth_lossy_batch(np.arange(12))
    for i in range(12):
        fmt, cb, ck, ok = roundtrip_metrics(i)
        assert fmt == batch["fmt"][i].as_py()
        decoded = decode_image(
            batch["bytes"][i].as_py(),
            batch["w"][i].as_py(),
            batch["h"][i].as_py(),
            fmt,
        )
        orig = lossy_base_pixels(i)
        p = psnr(orig, decoded)
        want_cb = 99999 if np.isinf(p) else int(np.floor(p * 100.0 + 0.5))
        assert cb == want_cb and ok == int(cb >= 4000)
        if fmt in ("raw", "png"):
            assert cb == 99999  # lossless paths bit-exact
        else:
            assert 4000 <= cb < 99999  # lossy but above the bar


def test_decoder_reads_tables_from_file():
    """The decoder honors in-file DQT (it is not hardwired to the
    encoder's quality): the same pixels at two qualities decode to
    different reconstructions."""
    px = lossy_base_pixels(2)
    a = decode_jpeg(encode_jpeg(px, quality=60))
    b = decode_jpeg(encode_jpeg(px, quality=95))
    assert not np.array_equal(a, b)
    assert psnr(px, b) > psnr(px, a)


def test_malformed_jpeg_streams_fail_cleanly():
    """Decoder must raise ValueError on malformed input — never hang,
    crash, or return garbage silently (the PNG codec has the same
    contract suite)."""
    import pytest

    px = lossy_base_pixels(0)
    good = encode_jpeg(px, quality=90)

    cases = [
        b"",  # empty
        b"\x00\x01",  # not a JPEG
        b"\xff\xd8",  # SOI only
        b"\xff\xd8\xff",  # truncated marker
        good[: len(good) // 3],  # truncated mid-stream
        good[:2] + b"\xff\xc2" + good[4:],  # progressive SOF2
        b"\xff\xd8\xff\xdd\x00\x04\x00\x10" + good[2:],  # restart interval
    ]
    for i, data in enumerate(cases):
        with pytest.raises((ValueError, IndexError, KeyError)):
            decode_jpeg(data)

    # truncated entropy data: bit reader runs out → numpy IndexError
    # family is acceptable, silent wrong pixels are not
    cut = good[: -max(4, len(good) // 10)]
    try:
        out = decode_jpeg(cut)
        # if it decodes (cut landed after the last MCU), dims must hold
        assert out.shape == px.shape
    except (ValueError, IndexError, KeyError):
        pass
