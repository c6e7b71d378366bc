"""Dependency-free JPEG header parser: frame dimensions + component count
from the SOF marker segment (ISO/IEC 10918-1 §B.2.2).

A 100 TB multimodal corpus is mostly JPEG; baseline-DCT pixel decode is out
of scope here, but the metadata contract (width/height/channels + n_bytes)
that `decode_media` exposes needs only the SOFn header — the same surface
the reference touches through fitz pixmap metadata
(parsers/dots_ocr/__main__.py:111-118).
"""

from __future__ import annotations

# SOFn markers carrying frame headers (C4=DHT, C8=JPG, CC=DAC excluded)
_SOF_MARKERS = frozenset(
    m for m in range(0xC0, 0xD0) if m not in (0xC4, 0xC8, 0xCC)
)
# standalone markers with no length field
_STANDALONE = frozenset({0x01, 0xD8, 0xD9} | set(range(0xD0, 0xD8)))


def is_jpeg(data: bytes) -> bool:
    return len(data) >= 4 and data[:2] == b"\xff\xd8"


def jpeg_dims(data: bytes) -> tuple[int, int, int]:
    """(width, height, channels) from the first SOFn segment.

    Raises ValueError on anything that is not a well-formed JPEG header
    stream — callers treat that as an undecodable payload (X4 isolation).
    """
    if not is_jpeg(data):
        raise ValueError("not a JPEG (missing SOI)")
    i = 2
    n = len(data)
    while i + 4 <= n:
        if data[i] != 0xFF:
            raise ValueError("JPEG marker desync")
        marker = data[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        i += 2
        if marker in _STANDALONE:
            continue
        if i + 2 > n:
            break
        seglen = int.from_bytes(data[i:i + 2], "big")
        if seglen < 2:
            raise ValueError("bad JPEG segment length")
        if marker in _SOF_MARKERS:
            if i + 8 > n:
                break
            height = int.from_bytes(data[i + 3:i + 5], "big")
            width = int.from_bytes(data[i + 5:i + 7], "big")
            channels = data[i + 7]
            if width == 0 or height == 0 or channels == 0:
                raise ValueError("empty JPEG frame")
            return width, height, channels
        if marker == 0xDA:  # SOS: entropy data follows; SOF must precede
            break
        i += seglen
    raise ValueError("no SOF marker found")
