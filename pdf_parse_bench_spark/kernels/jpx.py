"""JPEG 2000 (JPXDecode) header-only support: true pixel dims for
degradation rows (VERDICT r5 item 10). Full wavelet decode is out of
scope — JPX Image XObjects degrade to decoded=False, but with REAL dims
read from the stream's own headers rather than the PDF dict's claim
(the same contract jbig2_dims provides for out-of-profile JBIG2).

Built from the public ISO/IEC 15444-1 structure only:

  - raw codestream: SOC (FF4F) then SIZ (FF51) — width/height are
    Xsiz-XOsiz / Ysiz-YOsiz, component count Csiz (A.5.1).
  - JP2 box container: walk the box tree for jp2h/ihdr (height, width,
    nc — I.5.3.1); fall back to the contiguous-codestream box's SIZ.
"""

from __future__ import annotations

import struct

_SOC_SIZ = b"\xff\x4f\xff\x51"
_JP2_SIG = b"\x00\x00\x00\x0cjP  \r\n\x87\n"


def _siz_dims(cs: bytes) -> tuple[int, int, int]:
    """(w, h, ncomp) from a raw codestream starting at SOC."""
    if not cs.startswith(_SOC_SIZ) or len(cs) < 42:
        raise ValueError("no SOC+SIZ")
    # after SOC(2) SIZ-marker(2): Lsiz(2) Rsiz(2) Xsiz(4) Ysiz(4)
    # XOsiz(4) YOsiz(4) XTsiz(4) YTsiz(4) XTOsiz(4) YTOsiz(4) Csiz(2)
    xs, ys, xo, yo = struct.unpack(">IIII", cs[8:24])
    (nc,) = struct.unpack(">H", cs[40:42])
    w, h = xs - xo, ys - yo
    if w <= 0 or h <= 0 or not nc:
        raise ValueError("bad SIZ dims")
    return w, h, nc


def jpx_dims(data: bytes) -> tuple[int, int, int]:
    """(width, height, ncomp) from a JPXDecode stream — raw J2K
    codestream or JP2 box container. Raises ValueError when neither
    header form is present."""
    if data.startswith(_SOC_SIZ):
        return _siz_dims(data)
    if not data.startswith(_JP2_SIG[:8]):
        raise ValueError("not a JP2/J2K stream")
    i, n = 0, len(data)
    stack = [(0, n)]
    while stack:
        i, end = stack.pop()
        while i + 8 <= end:
            (ln,) = struct.unpack(">I", data[i:i + 4])
            btype = data[i + 4:i + 8]
            body = i + 8
            if ln == 1:  # 64-bit extended length
                if body + 8 > end:
                    break
                (ln,) = struct.unpack(">Q", data[body:body + 8])
                body += 8
            elif ln == 0:  # box runs to the end of the container
                ln = end - i
            nxt = i + ln
            if nxt <= i or nxt > end:
                break
            if btype == b"ihdr" and nxt - body >= 10:
                h, w = struct.unpack(">II", data[body:body + 8])
                (nc,) = struct.unpack(">H", data[body + 8:body + 10])
                if w and h and nc:
                    return w, h, nc
                raise ValueError("bad ihdr dims")
            if btype == b"jp2c":
                return _siz_dims(data[body:nxt])
            if btype == b"jp2h":  # superbox: descend
                stack.append((nxt, end))
                i, end = body, nxt
                continue
            i = nxt
    raise ValueError("no ihdr/jp2c dims")
