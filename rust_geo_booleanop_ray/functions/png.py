"""Pure-Python/numpy PNG codec (no external image libraries).

Implements the subset of ISO/IEC 15948 the engine's image tables need:
8-bit-depth grayscale / gray+alpha / RGB / RGBA, non-interlaced, all
five scanline filters (None/Sub/Up/Average/Paeth).  DEFLATE compression
comes from stdlib ``zlib``; chunk CRCs from ``zlib.crc32``.

Why it exists: BASELINE.json's input_hint mandates an image+caption
table with compressed payloads and a decoded-pixel invariant, and this
container ships no image codecs — so the codec is part of the engine.
The encoder is fully vectorized (all five filter candidates are
computed for the whole image at once; per-row selection uses the
standard minimum-sum-of-absolute-differences heuristic).  The decoder
unfilters row-by-row: Sub is a per-channel cumulative sum, Up is one
vectorized add, Average/Paeth walk pixels left-to-right vectorized
over channels.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color type -> channel count (bit depth 8 only)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}


class PngFormatError(ValueError):
    """Raised for malformed or unsupported PNG payloads."""


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray, level: int = 6, filter_mode: str | int = "adaptive") -> bytes:
    """Encode an (h, w) or (h, w, c) uint8 array as a PNG byte string.

    ``filter_mode``: "adaptive" picks the per-row filter minimizing the
    sum of absolute signed filtered bytes (the spec's recommended
    heuristic, deterministic); an int 0-4 forces that filter for every
    row (used by tests to pin each decode path).
    """
    px = np.asarray(pixels)
    if px.dtype != np.uint8:
        raise PngFormatError(f"encode_png wants uint8 pixels, got {px.dtype}")
    if px.ndim == 2:
        px = px[:, :, None]
    if px.ndim != 3 or px.shape[2] not in _COLOR_TYPE:
        raise PngFormatError(f"unsupported pixel shape {pixels.shape}")
    h, w, ch = px.shape
    if h == 0 or w == 0:
        raise PngFormatError("empty image")
    color_type = _COLOR_TYPE[ch]

    raw = px.reshape(h, w * ch).astype(np.int16)
    prev = np.zeros_like(raw)
    prev[1:] = raw[:-1]
    left = np.zeros_like(raw)
    left[:, ch:] = raw[:, :-ch]
    upleft = np.zeros_like(raw)
    upleft[:, ch:] = prev[:, :-ch]

    # all five filter candidates for every row at once (mod-256 deltas)
    f0 = raw
    f1 = raw - left
    f2 = raw - prev
    f3 = raw - ((left + prev) >> 1)
    # Paeth predictor, vectorized
    p = left + prev - upleft
    pa_ = np.abs(p - left)
    pb = np.abs(p - prev)
    pc_ = np.abs(p - upleft)
    pred = np.where((pa_ <= pb) & (pa_ <= pc_), left, np.where(pb <= pc_, prev, upleft))
    f4 = raw - pred

    cand = np.stack(
        [(f0 & 0xFF), (f1 & 0xFF), (f2 & 0xFF), (f3 & 0xFF), (f4 & 0xFF)]
    ).astype(np.uint8)
    if filter_mode == "adaptive":
        # MSAD over signed interpretation of the filtered bytes
        signed = cand.astype(np.int16)
        signed = np.where(signed > 127, 256 - signed, signed)
        choice = signed.sum(axis=2).argmin(axis=0)
    else:
        fi = int(filter_mode)
        if not 0 <= fi <= 4:
            raise PngFormatError(f"filter {filter_mode!r} out of range")
        choice = np.full(h, fi, dtype=np.int64)

    stream = np.empty((h, 1 + w * ch), dtype=np.uint8)
    stream[:, 0] = choice
    stream[:, 1:] = cand[choice, np.arange(h)]

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    idat = zlib.compress(stream.tobytes(), level)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def _unfilter(stream: np.ndarray, h: int, w: int, ch: int) -> np.ndarray:
    """Reconstruct raw scanlines from the filtered byte stream."""
    stride = w * ch
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ftype = int(stream[y, 0])
        row = stream[y, 1:].astype(np.int32)
        if ftype == 0:
            recon = row
        elif ftype == 1:  # Sub: per-channel prefix sum mod 256
            recon = np.cumsum(row.reshape(w, ch), axis=0).reshape(stride) & 0xFF
        elif ftype == 2:  # Up
            recon = (row + prev) & 0xFF
        elif ftype == 3:  # Average
            recon = row
            rp = recon.reshape(w, ch)
            pp = prev.reshape(w, ch)
            rp[0] = (rp[0] + (pp[0] >> 1)) & 0xFF
            for x in range(1, w):
                rp[x] = (rp[x] + ((rp[x - 1] + pp[x]) >> 1)) & 0xFF
            recon = rp.reshape(stride)
        elif ftype == 4:  # Paeth
            recon = row
            rp = recon.reshape(w, ch)
            pp = prev.reshape(w, ch)
            rp[0] = (rp[0] + pp[0]) & 0xFF  # left & upleft are 0 → pred = up
            for x in range(1, w):
                a = rp[x - 1]
                b = pp[x]
                c = pp[x - 1]
                p = a + b - c
                pa_ = np.abs(p - a)
                pb = np.abs(p - b)
                pc_ = np.abs(p - c)
                pred = np.where(
                    (pa_ <= pb) & (pa_ <= pc_), a, np.where(pb <= pc_, b, c)
                )
                rp[x] = (rp[x] + pred) & 0xFF
            recon = rp.reshape(stride)
        else:
            raise PngFormatError(f"unknown filter type {ftype} on row {y}")
        out[y] = recon.astype(np.uint8)
        prev = recon
    return out


def decode_png(data: bytes) -> np.ndarray:
    """Decode a PNG byte string → (h, w, channels) uint8 array.

    Supports bit depth 8, color types 0/2/4/6, non-interlaced streams
    (exactly what ``encode_png`` emits, plus the common RGB/RGBA files
    other encoders produce).  Raises ``PngFormatError`` for palette,
    sub-byte depths, 16-bit, or interlaced images.
    """
    if data[:8] != _SIGNATURE:
        raise PngFormatError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    idat = []
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise PngFormatError("truncated chunk")
        pos += 12 + length  # skip CRC (we trust zlib's adler check below)
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        elif tag == b"PLTE" or (tag[0] & 0x20) == 0:
            # PLTE means palette output; any other unknown CRITICAL
            # chunk changes meaning — refuse rather than mis-decode
            if tag != b"PLTE":
                raise PngFormatError(f"unsupported critical chunk {tag!r}")
    if ihdr is None:
        raise PngFormatError("missing IHDR")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8:
        raise PngFormatError(f"unsupported bit depth {depth}")
    if color_type not in _CHANNELS:
        raise PngFormatError(f"unsupported color type {color_type}")
    if comp != 0 or filt != 0:
        raise PngFormatError("unsupported compression/filter method")
    if interlace != 0:
        raise PngFormatError("interlaced (Adam7) PNG unsupported")
    if not idat:
        raise PngFormatError("missing IDAT")
    ch = _CHANNELS[color_type]
    expect = h * (1 + w * ch)
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as exc:
        raise PngFormatError(f"corrupt DEFLATE stream: {exc}") from None
    if len(raw) != expect:
        raise PngFormatError(
            f"decompressed stream is {len(raw)} bytes, expected {expect}"
        )
    stream = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + w * ch)
    return _unfilter(stream, h, w, ch).reshape(h, w, ch)
