"""Pure-numpy PNG codec: lossless round trips over every filter type,
channel layout, and edge dimension; malformed-stream rejection."""

import struct
import zlib

import numpy as np
import pytest

from rust_geo_booleanop_ray.functions.png import (
    PngFormatError,
    decode_png,
    encode_png,
)
from rust_geo_booleanop_ray.stages.image_ops import (
    ImageCodecNotAvailable,
    decode_image,
)


def _rand(shape, seed):
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.integers(0, 256, size=shape, dtype=np.uint8)


@pytest.mark.parametrize("filter_mode", [0, 1, 2, 3, 4, "adaptive"])
def test_roundtrip_each_filter(filter_mode):
    px = _rand((13, 17, 3), seed=1)
    out = decode_png(encode_png(px, filter_mode=filter_mode))
    assert out.shape == (13, 17, 3)
    assert (out == px).all()


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_roundtrip_channel_layouts(channels):
    px = _rand((9, 7, channels), seed=channels)
    out = decode_png(encode_png(px))
    assert out.shape == (9, 7, channels)
    assert (out == px).all()


def test_roundtrip_grayscale_2d_and_edge_dims():
    g = _rand((5, 6), seed=3)
    out = decode_png(encode_png(g))
    assert out.shape == (5, 6, 1)
    assert (out[:, :, 0] == g).all()
    for shape in [(1, 1, 3), (1, 40, 3), (40, 1, 3), (2, 2, 4)]:
        px = _rand(shape, seed=sum(shape))
        assert (decode_png(encode_png(px)) == px).all()


def test_gradient_prefers_sub_filter_and_roundtrips():
    """A smooth gradient compresses via non-trivial filters; the
    adaptive encoder must still round-trip exactly."""
    x = np.arange(64, dtype=np.uint8)
    px = np.stack([np.add.outer(x, x) % 256 // 1] * 3, axis=2).astype(np.uint8)
    data = encode_png(px)
    assert (decode_png(data) == px).all()
    # gradient rows should pick a differencing filter (not all None)
    stream = zlib.decompress(data[data.index(b"IDAT") + 4 :][: len(data)])
    filters = np.frombuffer(stream, dtype=np.uint8).reshape(64, -1)[:, 0]
    assert (filters != 0).any()


def test_deterministic_encoding():
    px = _rand((16, 16, 3), seed=7)
    assert encode_png(px) == encode_png(px)


def test_rejects_malformed():
    with pytest.raises(PngFormatError):
        decode_png(b"not a png at all")
    px = _rand((4, 4, 3), seed=9)
    data = bytearray(encode_png(px))
    # flip the interlace byte inside IHDR (offset: 8 sig + 8 hdr + 12)
    assert data[8 + 8 + 12] == 0
    data[8 + 8 + 12] = 1
    with pytest.raises(PngFormatError, match="interlaced"):
        decode_png(bytes(data))
    # 16-bit depth rejected
    data = bytearray(encode_png(px))
    data[8 + 8 + 8] = 16
    with pytest.raises(PngFormatError, match="depth"):
        decode_png(bytes(data))
    # truncated IDAT body
    with pytest.raises(PngFormatError):
        decode_png(encode_png(px)[:-20] + struct.pack(">I", 0) + b"IEND" + b"\0" * 4)


def test_decode_image_contract():
    px = _rand((8, 6, 3), seed=11)
    out = decode_image(encode_png(px), 6, 8, "png")
    assert (out == px).all()
    with pytest.raises(ValueError, match="disagree"):
        decode_image(encode_png(px), 7, 8, "png")
    with pytest.raises(ImageCodecNotAvailable):
        decode_image(b"\x00" * 16, 2, 2, "webp")  # no codec for webp
    with pytest.raises(ValueError):  # jpeg HAS a codec; truncated stream
        decode_image(b"\xff\xd8\xff", 2, 2, "jpeg")
    # non-RGB PNGs are normalized to 3 channels
    rgba = _rand((5, 5, 4), seed=12)
    out = decode_image(encode_png(rgba), 5, 5, "png")
    assert out.shape == (5, 5, 3)
    assert (out == rgba[:, :, :3]).all()
    gray = _rand((5, 5), seed=13)
    out = decode_image(encode_png(gray), 5, 5, "png")
    assert (out[:, :, 0] == gray).all() and (out[:, :, 2] == gray).all()
