"""Dependency-free JBIG2 (ITU-T T.88) support for embedded PDF streams:
segment-header parsing for true image dims, and generic-region decode —
the profile that covers the bulk of bilevel scanned PDFs that don't use
CCITT (VERDICT r5 item 5).

Scope (everything here is built from the public T.88 spec structure):

  - ``jbig2_dims``: walk the embedded-format segment headers (§7.2) and
    return the page/region pixel dims — the minimum contract: even when
    the region coding is out of profile, degradation rows carry REAL
    dims read from the data, not just the PDF dict's claim.
  - ``jbig2_decode``: decode an embedded-format stream whose regions are
    all GENERIC regions (segment types 36/38/39), either MMR-coded
    (T.6/G4 — reuses kernels/ccitt.py) or MQ-arithmetic-coded
    (templates 0-3, nominal or explicit AT pixels, optional TPGDON
    typical-prediction), composited onto the page bitmap with OR or
    REPLACE. Symbol/text/halftone/refinement segments raise ValueError
    — callers degrade to dims-only metadata (X4 isolation).
  - ``_MQDecoder`` / ``_MQEncoder``: the shared MQ coder (Annex E) with
    the standard 47-state Qe table — the encoder exists so fixtures can
    synthesize real arithmetic-coded streams with closed-form goldens.

Bitmaps are uint8 arrays, 255 = white, 0 = black (JBIG2's 1-bits are
black, matching the CCITT kernel's convention).
"""

from __future__ import annotations

import struct

import numpy as np

# Annex E Qe table: (Qe, NMPS, NLPS, SWITCH)
_QE = [
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0),
    (0x0AC1, 4, 12, 0), (0x0521, 5, 29, 0), (0x0221, 38, 33, 0),
    (0x5601, 7, 6, 1), (0x5401, 8, 14, 0), (0x4801, 9, 14, 0),
    (0x3801, 10, 14, 0), (0x3001, 11, 17, 0), (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0), (0x1601, 29, 21, 0), (0x5601, 15, 14, 1),
    (0x5401, 16, 14, 0), (0x5101, 17, 15, 0), (0x4801, 18, 16, 0),
    (0x3801, 19, 17, 0), (0x3401, 20, 18, 0), (0x3001, 21, 19, 0),
    (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0),
    (0x1401, 28, 25, 0), (0x1201, 29, 26, 0), (0x1101, 30, 27, 0),
    (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0), (0x08A1, 33, 30, 0),
    (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0),
    (0x0085, 40, 37, 0), (0x0049, 41, 38, 0), (0x0025, 42, 39, 0),
    (0x0015, 43, 40, 0), (0x0009, 44, 41, 0), (0x0005, 45, 42, 0),
    (0x0001, 45, 43, 0), (0x5601, 46, 46, 0),
]


class _MQDecoder:
    """MQ arithmetic decoder (T.88 Annex E, decoder side) over one
    region's data. Context state lives in the caller's arrays (index,
    mps) so one decoder serves any number of context labels."""

    def __init__(self, data: bytes):
        self.data = data
        self.end = len(data)
        self.bp = 0
        b0 = data[0] if data else 0xFF
        self.chigh = b0
        self.clow = 0
        self.ct = 0
        self._byte_in()
        self.chigh = ((self.chigh << 7) & 0xFFFF) | ((self.clow >> 9) & 0x7F)
        self.clow = (self.clow << 7) & 0xFFFF
        self.ct -= 7
        self.a = 0x8000

    def _byte_in(self) -> None:
        data, bp = self.data, self.bp
        cur = data[bp] if bp < self.end else 0xFF
        nxt = data[bp + 1] if bp + 1 < self.end else 0xFF
        if cur == 0xFF:
            if nxt > 0x8F:
                self.clow += 0xFF00
                self.ct = 8
            else:
                self.bp = bp + 1
                self.clow += nxt << 9
                self.ct = 7
        else:
            self.bp = bp + 1
            self.clow += (nxt << 8) if bp + 1 < self.end else 0xFF00
            self.ct = 8
        if self.clow > 0xFFFF:
            self.chigh += self.clow >> 16
            self.clow &= 0xFFFF

    def decode(self, cx_index: list, cx_mps: list, cx: int) -> int:
        i = cx_index[cx]
        mps = cx_mps[cx]
        qe, nmps, nlps, switch = _QE[i]
        self.a -= qe
        if self.chigh < qe:
            if self.a < qe:  # MPS exchange
                self.a = qe
                d = mps
                cx_index[cx] = nmps
            else:
                self.a = qe
                d = 1 ^ mps
                if switch:
                    cx_mps[cx] = d
                cx_index[cx] = nlps
        else:
            self.chigh -= qe
            if self.a & 0x8000:
                return mps
            if self.a < qe:
                d = 1 ^ mps
                if switch:
                    cx_mps[cx] = d
                cx_index[cx] = nlps
            else:
                d = mps
                cx_index[cx] = nmps
        while True:  # renormalize
            if self.ct == 0:
                self._byte_in()
            self.a = (self.a << 1) & 0xFFFF
            self.chigh = ((self.chigh << 1) & 0xFFFF) | ((self.clow >> 15) & 1)
            self.clow = (self.clow << 1) & 0xFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break
        return d


class _MQEncoder:
    """MQ arithmetic encoder (T.88 Annex E, encoder side) — the fixture
    generator's half of the pair; round-trip pinned against the decoder."""

    def __init__(self):
        self.a = 0x8000
        self.c = 0
        self.ct = 12
        # index 0 is the spec's BP = BPST-1 sentinel byte: never part of
        # the stream unless a carry propagates into it
        self.b = bytearray([0])
        self.sentinel_carry = False

    def _byteout(self) -> None:
        b = self.b
        if b[-1] == 0xFF:  # bit stuffing after an FF byte
            b.append(self.c >> 20)
            self.c &= 0xFFFFF
            self.ct = 7
        elif self.c < 0x8000000:
            b.append(self.c >> 19)
            self.c &= 0x7FFFF
            self.ct = 8
        else:
            if len(b) == 1:  # carry reaches the pre-stream sentinel
                self.sentinel_carry = True
            b[-1] += 1  # carry into the previous byte
            self.c &= 0x7FFFFFF  # carry consumed by the increment
            if b[-1] == 0xFF:
                b.append(self.c >> 20)
                self.c &= 0xFFFFF
                self.ct = 7
            else:
                b.append(self.c >> 19)
                self.c &= 0x7FFFF
                self.ct = 8

    def _renorm(self) -> None:
        while True:
            if self.ct == 0:
                self._byteout()
            self.a = (self.a << 1) & 0xFFFF
            self.c <<= 1
            self.ct -= 1
            if self.a & 0x8000:
                break

    def encode(self, cx_index: list, cx_mps: list, cx: int, d: int) -> None:
        i = cx_index[cx]
        mps = cx_mps[cx]
        qe, nmps, nlps, switch = _QE[i]
        if d == mps:  # CODEMPS
            self.a -= qe
            if self.a & 0x8000 == 0:
                if self.a < qe:
                    self.a = qe
                else:
                    self.c += qe
                cx_index[cx] = nmps
                self._renorm()
            else:
                self.c += qe
        else:  # CODELPS
            self.a -= qe
            if self.a < qe:
                self.c += qe
            else:
                self.a = qe
            if switch:
                cx_mps[cx] = 1 - mps
            cx_index[cx] = nlps
            self._renorm()

    def flush(self) -> bytes:
        # SETBITS + two byteouts (E.3.8); the sentinel byte is emitted
        # only if a carry propagated into it (then it IS the stream's
        # true first byte)
        temp = (self.c + self.a - 1) & 0xFFFF0000
        self.c = temp + 0x8000 if temp < self.c else temp
        self.c <<= self.ct
        self._byteout()
        self.c <<= self.ct
        self._byteout()
        return bytes(self.b if self.sentinel_carry else self.b[1:])


# generic-region context templates (T.88 6.2.5.3): fixed pixels per
# template; AT pixel count and nominal positions.  The context label is
# the template pixels sorted by (y, x), MSB first — the public
# construction used by the reference JBIG2 implementations.
_TEMPLATES = {
    0: ([(-1, -2), (0, -2), (1, -2),
         (-2, -1), (-1, -1), (0, -1), (1, -1), (2, -1),
         (-4, 0), (-3, 0), (-2, 0), (-1, 0)],
        [(3, -1), (-3, -1), (2, -2), (-2, -2)]),
    1: ([(-1, -2), (0, -2), (1, -2), (2, -2),
         (-2, -1), (-1, -1), (0, -1), (1, -1), (2, -1),
         (-3, 0), (-2, 0), (-1, 0)],
        [(3, -1)]),
    2: ([(-1, -2), (0, -2), (1, -2),
         (-2, -1), (-1, -1), (0, -1), (1, -1),
         (-2, 0), (-1, 0)],
        [(2, -1)]),
    3: ([(-3, -1), (-2, -1), (-1, -1), (0, -1), (1, -1),
         (-4, 0), (-3, 0), (-2, 0), (-1, 0)],
        [(2, -1)]),
}
# TPGDON pseudo-pixel context per template (6.2.5.7)
_TPGD_CX = {0: 0x9B25, 1: 0x0795, 2: 0x00E5, 3: 0x0195}


def _sorted_template(template: int, at: list[tuple[int, int]]):
    fixed, nominal = _TEMPLATES[template]
    pix = fixed + (at if at else nominal)
    return sorted(pix, key=lambda p: (p[1], p[0]))


JBIG2_MQ_MAX_PIXELS = 1 << 22  # ~4.2M px MQ-decode budget (ADVICE r6)


def _decode_generic(data: bytes, w: int, h: int, template: int,
                    at: list[tuple[int, int]], tpgdon: bool) -> np.ndarray:
    """MQ-coded generic region decode → (h, w) uint8 {0,1} bitmap.

    Budget guard (ADVICE r6): the MQ arithmetic decoder is a per-pixel
    Python loop (~13-16 context reads + one MQ decode per pixel), so a
    300-dpi scanned page (~8M px) would take minutes inside a corpus
    kernel. Regions above JBIG2_MQ_MAX_PIXELS raise ValueError — the
    kernels' documented degradation contract (decoded=False with real
    dims), never a stalled task. MMR-coded regions decode through the
    vectorized CCITT kernel and are not capped."""
    if w * h > JBIG2_MQ_MAX_PIXELS:
        raise ValueError(
            f"jbig2 generic region {w}x{h} exceeds the MQ decode budget")
    pix = _sorted_template(template, at)
    nbits = len(pix)
    cx_index = [0] * (1 << 16)
    cx_mps = [0] * (1 << 16)
    dec = _MQDecoder(data)
    bm = np.zeros((h, w), dtype=np.uint8)
    ltp = 0
    tp_cx = _TPGD_CX[template]
    for y in range(h):
        if tpgdon:
            if dec.decode(cx_index, cx_mps, tp_cx):
                ltp ^= 1
            if ltp:
                if y > 0:
                    bm[y] = bm[y - 1]
                continue
        row = bm[y]
        for x in range(w):
            cx = 0
            for dx, dy in pix:
                xx, yy = x + dx, y + dy
                v = 0
                if 0 <= xx < w and 0 <= yy < h and yy <= y:
                    v = int(bm[yy, xx]) if (yy < y or xx < x) else 0
                cx = (cx << 1) | v
            row[x] = dec.decode(cx_index, cx_mps, cx)
    assert nbits <= 16
    return bm


def _encode_generic(bm: np.ndarray, template: int,
                    at: list[tuple[int, int]], tpgdon: bool = False
                    ) -> bytes:
    """Fixture-side MQ generic-region encoder (inverse of
    _decode_generic; bm is {0,1})."""
    h, w = bm.shape
    pix = _sorted_template(template, at)
    cx_index = [0] * (1 << 16)
    cx_mps = [0] * (1 << 16)
    enc = _MQEncoder()
    ltp = 0
    tp_cx = _TPGD_CX[template]
    for y in range(h):
        if tpgdon:
            # the decoded bit TOGGLES the LTP state; LTP rows are copies
            # of the previous row, so set LTP exactly when the row is one
            want = 1 if (y > 0 and bool(np.array_equal(bm[y], bm[y - 1]))) \
                else 0
            enc.encode(cx_index, cx_mps, tp_cx, want ^ ltp)
            ltp = want
            if ltp:
                continue
        for x in range(w):
            cx = 0
            for dx, dy in pix:
                xx, yy = x + dx, y + dy
                v = 0
                if 0 <= xx < w and 0 <= yy < h and yy <= y:
                    v = int(bm[yy, xx]) if (yy < y or xx < x) else 0
                cx = (cx << 1) | v
            enc.encode(cx_index, cx_mps, cx, int(bm[y, x]))
    return enc.flush()


def _parse_segments(data: bytes):
    """Iterate embedded-format segment headers (§7.2): yields
    (seg_number, seg_type, page_assoc, payload_bytes)."""
    i = 0
    n = len(data)
    while i + 11 <= n:
        num = int.from_bytes(data[i:i + 4], "big")
        flags = data[i + 4]
        seg_type = flags & 0x3F
        page4 = bool(flags & 0x40)
        i += 5
        rts = data[i]
        if (rts >> 5) == 7:  # long form
            count = int.from_bytes(data[i:i + 4], "big") & 0x1FFFFFFF
            i += 4 + (count + 8) // 8
        else:
            count = rts >> 5
            i += 1
        # referred-to segment numbers: size depends on this segment's number
        ref_sz = 1 if num <= 256 else (2 if num <= 65536 else 4)
        i += count * ref_sz
        i += 4 if page4 else 1
        page = int.from_bytes(data[i - (4 if page4 else 1):i], "big")
        if i + 4 > n:
            raise ValueError("truncated JBIG2 segment header")
        length = int.from_bytes(data[i:i + 4], "big")
        i += 4
        if length == 0xFFFFFFFF:
            raise ValueError("unknown-length JBIG2 segment")
        if i + length > n:
            raise ValueError("truncated JBIG2 segment data")
        yield num, seg_type, page, data[i:i + length]
        i += length


def jbig2_dims(data: bytes, globals_data: bytes = b"") -> tuple[int, int]:
    """(width, height) from the page-info segment (type 48), falling
    back to the union extent of region segments — true dims read from
    the embedded stream's own headers."""
    best = None
    for blob in (globals_data, data):
        if not blob:
            continue
        for _num, seg_type, _page, payload in _parse_segments(blob):
            if seg_type == 48 and len(payload) >= 8:
                w, h = struct.unpack(">II", payload[:8])
                if h != 0xFFFFFFFF and w and h:
                    return w, h
                if w:
                    best = (w, 0)
            elif seg_type in (36, 38, 39, 4, 6, 7, 20, 22, 23, 40, 42, 43) \
                    and len(payload) >= 17:
                w, h, x, y = struct.unpack(">IIII", payload[:16])
                ext = (x + w, y + h)
                best = (max(best[0], ext[0]) if best else ext[0],
                        max(best[1], ext[1]) if best else ext[1])
    if not best or not best[0] or not best[1]:
        raise ValueError("no JBIG2 page/region dims")
    return best


def jbig2_decode(data: bytes, globals_data: bytes = b"") -> np.ndarray:
    """Decode an embedded-format JBIG2 stream whose regions are all
    generic regions → (h, w) uint8, 255 white / 0 black. Raises
    ValueError on any out-of-profile segment (symbol/text/halftone/
    refinement) — callers degrade to jbig2_dims metadata."""
    page_w = page_h = None
    page_def_pixel = 0
    regions = []
    for blob in (globals_data, data):
        if not blob:
            continue
        for _num, seg_type, _page, payload in _parse_segments(blob):
            if seg_type == 48:  # page info
                if len(payload) < 17:
                    raise ValueError("short page info")
                page_w, page_h = struct.unpack(">II", payload[:8])
                page_def_pixel = (payload[16] >> 2) & 1
            elif seg_type in (36, 38, 39):  # generic region
                regions.append(payload)
            elif seg_type in (0, 16, 49, 50, 51, 62):
                continue  # symbol dict unused / pattern / end / extension
            else:
                raise ValueError(f"unsupported JBIG2 segment {seg_type}")
    if not regions:
        raise ValueError("no generic region")
    # page height may be unknown (0xFFFFFFFF): size to region extents
    ext_w = ext_h = 0
    parsed = []
    for payload in regions:
        if len(payload) < 18:
            raise ValueError("short region segment")
        w, h, x, y = struct.unpack(">IIII", payload[:16])
        comb_op = payload[16] & 0x07
        flags = payload[17]
        mmr = flags & 1
        template = (flags >> 1) & 3
        tpgdon = bool(flags & 8)
        p = 18
        at = []
        if not mmr:
            n_at = 4 if template == 0 else 1
            for _ in range(n_at):
                ax = struct.unpack(">b", payload[p:p + 1])[0]
                ay = struct.unpack(">b", payload[p + 1:p + 2])[0]
                at.append((ax, ay))
                p += 2
        parsed.append((w, h, x, y, comb_op, mmr, template, tpgdon,
                       at, payload[p:]))
        ext_w = max(ext_w, x + w)
        ext_h = max(ext_h, y + h)
    if page_w is None or not page_w:
        page_w = ext_w
    if page_h is None or page_h == 0xFFFFFFFF or not page_h:
        page_h = ext_h
    page = np.full((page_h, page_w), page_def_pixel, dtype=np.uint8)
    for w, h, x, y, comb_op, mmr, template, tpgdon, at, body in parsed:
        if mmr:
            from pdf_parse_bench_spark.kernels.ccitt import ccittfax_decode
            bm = (ccittfax_decode(body, w, h, k=-1) == 0).astype(np.uint8)
        else:
            bm = _decode_generic(body, w, h, template, at, tpgdon)
        tgt = page[y:y + h, x:x + w]
        if tgt.shape != bm.shape:
            # T.88 permits regions extending past the page: clip (ADVICE
            # r6 — the unclipped broadcast raised and degraded the image)
            bm = bm[:tgt.shape[0], :tgt.shape[1]]
        if comb_op == 0:  # OR
            tgt |= bm
        elif comb_op == 4:  # REPLACE
            tgt[:] = bm
        elif comb_op == 1:  # AND
            tgt &= bm
        elif comb_op == 2:  # XOR
            tgt ^= bm
        else:
            raise ValueError("unsupported combination operator")
    return ((1 - page) * np.uint8(255)).astype(np.uint8)


# --- fixture-side embedded-stream builder -----------------------------------

def _segment(num: int, seg_type: int, page: int, payload: bytes) -> bytes:
    """One embedded-format segment with no referred-to segments and a
    1-byte page association."""
    return (num.to_bytes(4, "big") + bytes([seg_type]) + b"\x00"
            + bytes([page]) + len(payload).to_bytes(4, "big") + payload)


def jbig2_encode(img: np.ndarray, mmr: bool = False, template: int = 0,
                 tpgdon: bool = False) -> bytes:
    """Fixture generator: wrap one full-page generic region (MMR or MQ
    template coded) in embedded-format segments (page info + immediate
    lossless generic region + end-of-page). `img` is uint8 255/0."""
    h, w = img.shape
    bm = (img == 0).astype(np.uint8)  # 1 = black
    if mmr:
        from pdf_parse_bench_spark.kernels.ccitt import ccittfax_encode
        body = ccittfax_encode(img, k=-1, byte_align=False)
        flags = 1
        at_bytes = b""
    else:
        fixed_at = _TEMPLATES[template][1]
        body = _encode_generic(bm, template, fixed_at, tpgdon)
        flags = (template << 1) | (8 if tpgdon else 0)
        at_bytes = b"".join(
            struct.pack(">bb", ax, ay) for ax, ay in fixed_at)
    page_info = (struct.pack(">IIII", w, h, 0, 0) + b"\x01"
                 + b"\x00\x00")
    region = (struct.pack(">IIII", w, h, 0, 0) + b"\x00"  # comb op OR
              + bytes([flags]) + at_bytes + body)
    return (_segment(0, 48, 1, page_info)
            + _segment(1, 39, 1, region)        # immediate lossless
            + _segment(2, 49, 1, b""))          # end of page
