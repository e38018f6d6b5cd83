"""Vectorized UTF-8 → code-point decoding over flat Arrow string buffers.

Lets batch kernels hash CODE POINTS (what DuckDB's ``unicode()`` /
character slicing sees, so oracles can mirror them exactly) without
falling back to per-token Python ``str`` handling: one pass of numpy
selects over the whole byte buffer.
"""

from __future__ import annotations

import numpy as np


def utf8_codepoints(data: np.ndarray):
    """Decode a UTF-8 byte buffer.

    ``data``: uint8 array (concatenated, well-formed UTF-8).
    Returns ``(codepoints, prefix)`` where ``codepoints`` is a uint32
    array of decoded code points in order and ``prefix`` (len(data)+1,
    int64) maps a BYTE offset to the number of code points strictly
    before it — so a byte segment [s, e) covers code points
    ``codepoints[prefix[s]:prefix[e]]``.
    """
    b = data.astype(np.uint32)
    n = len(b)
    if n == 0:
        return np.empty(0, dtype=np.uint32), np.zeros(1, dtype=np.int64)
    lead = (data & 0xC0) != 0x80

    d1 = np.zeros(n, dtype=np.uint32)
    d2 = np.zeros(n, dtype=np.uint32)
    d3 = np.zeros(n, dtype=np.uint32)
    d1[: n - 1] = b[1:] & 0x3F
    d2[: n - 2] = b[2:] & 0x3F
    d3[: n - 3] = b[3:] & 0x3F

    is1 = b < 0x80
    is2 = (b >= 0xC0) & (b < 0xE0)
    is3 = (b >= 0xE0) & (b < 0xF0)
    cp = np.select(
        [is1, is2, is3],
        [
            b,
            ((b & 0x1F) << 6) | d1,
            ((b & 0x0F) << 12) | (d1 << 6) | d2,
        ],
        default=((b & 0x07) << 18) | (d1 << 12) | (d2 << 6) | d3,
    ).astype(np.uint32)

    prefix = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lead, out=prefix[1:])
    return cp[lead], prefix
