"""Dependency-free JPEG support: header metadata for every JPEG, plus a
full baseline-DCT pixel decoder for the grayscale single-scan profile
(ISO/IEC 10918-1: SOF0, one component, no restart markers).

A 100 TB multimodal corpus is mostly JPEG. `jpeg_dims` reads only the SOFn
header — the metadata surface the reference touches through fitz pixmap
metadata (parsers/dots_ocr/__main__.py:111-118). `jpeg_decode_gray` goes
further for the dominant archival-scan profile: DQT/DHT/SOF0/SOS parse,
canonical Huffman decode of the entropy stream (DC categories + AC
run-length with ZRL/EOB), dequantize, inverse zigzag, separable float
IDCT, level shift, clamp. Profiles outside that scope (color, progressive,
restart-interval streams) raise — callers degrade to the header-only
metadata contract rather than failing the task (X4 isolation).
"""

from __future__ import annotations

import numpy as np

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


# --- baseline-DCT grayscale decode -----------------------------------------

# zigzag order: ZIGZAG[i] = raster index of the i-th coefficient in the
# stream (ISO/IEC 10918-1 Figure A.6)
def _zigzag_order() -> list[int]:
    order = []
    for s in range(15):
        ij = [(i, s - i) for i in range(max(0, s - 7), min(8, s + 1))]
        if s % 2 == 0:
            ij.reverse()  # even diagonals run bottom-left -> top-right
        order.extend(i * 8 + j for i, j in ij)
    return order


_ZIGZAG = _zigzag_order()

# orthonormal 8x8 DCT-II basis: block = A.T @ coef @ A
_A = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _c = np.sqrt(0.125) if _k == 0 else 0.5
        _A[_k, _n] = _c * np.cos((2 * _n + 1) * _k * np.pi / 16)


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with 0xFF00
    byte-unstuffing; raises at any marker (EOI ends a well-formed scan —
    trailing pad bits before it are legal and simply never requested)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG scan truncated")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("JPEG scan truncated at 0xFF")
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise ValueError("marker inside entropy data")
            self.bitbuf = b
            self.nbits = 8
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _build_huffman(counts: bytes, symbols: bytes) -> dict[tuple[int, int], int]:
    """Canonical Huffman per Annex C: {(length, code): symbol}."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, t: int) -> int:
    """EXTEND (F.2.2.1): map t magnitude bits to the signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def jpeg_decode(data: bytes) -> "np.ndarray":
    """Decode a baseline JPEG (SOF0, single interleaved scan, no restart
    interval) to uint8 pixels: (h, w) for grayscale, (h, w, 3) RGB for
    YCbCr color with 4:4:4 or 4:2:0 sampling (the two layouts that cover
    virtually all archival scans). Raises ValueError for any stream
    outside that profile or malformed within it."""
    if not is_jpeg(data):
        raise ValueError("not a JPEG (missing SOI)")
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    width = height = 0
    comps: list[tuple[int, int, int, int]] = []  # (id, hs, vs, tq)
    scan_sel: list[tuple[int, int, int]] = []    # (comp_idx, dc_id, ac_id)
    i = 2
    n = len(data)
    scan_pos = -1
    while i + 4 <= n:
        if data[i] != 0xFF:
            raise ValueError("JPEG marker desync")
        marker = data[i + 1]
        if marker == 0xFF:
            i += 1
            continue
        i += 2
        if marker in _STANDALONE:
            if marker == 0xD9:
                break
            continue
        seglen = int.from_bytes(data[i:i + 2], "big")
        if seglen < 2 or i + seglen > n:
            raise ValueError("bad JPEG segment length")
        seg = data[i + 2:i + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq_id = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq != 0:
                    raise ValueError("16-bit quant table unsupported")
                if p + 64 > len(seg):
                    raise ValueError("short DQT")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[_ZIGZAG] = np.frombuffer(seg[p:p + 64], dtype=np.uint8)
                quant[tq_id] = tbl.reshape(8, 8)
                p += 64
        elif marker == 0xC4:  # DHT
            p = 0
            while p + 17 <= len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                counts = seg[p + 1:p + 17]
                total = sum(counts)
                syms = seg[p + 17:p + 17 + total]
                if len(syms) < total:
                    raise ValueError("short DHT")
                (huff_dc if tc == 0 else huff_ac)[th] = _build_huffman(
                    counts, syms)
                p += 17 + total
        elif marker == 0xC0:  # SOF0 baseline
            if seg[0] != 8:
                raise ValueError("non-8-bit precision")
            height = int.from_bytes(seg[1:3], "big")
            width = int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            if nc not in (1, 3):
                raise ValueError("unsupported component count")
            for c in range(nc):
                cid = seg[6 + 3 * c]
                hv = seg[7 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, seg[8 + 3 * c]))
            if nc == 1 and comps[0][1:3] != (1, 1):
                raise ValueError("subsampled single component")
            if nc == 3:
                samp = [(c[1], c[2]) for c in comps]
                if samp not in ([(1, 1)] * 3,
                                [(2, 2), (1, 1), (1, 1)]):
                    raise ValueError("only 4:4:4 / 4:2:0 sampling")
        elif marker in _SOF_MARKERS:
            raise ValueError("non-baseline SOF")
        elif marker == 0xDD:  # DRI
            if int.from_bytes(seg[0:2], "big") != 0:
                raise ValueError("restart intervals unsupported")
        elif marker == 0xDA:  # SOS
            if seg[0] != len(comps) or not comps:
                raise ValueError("scan/frame component mismatch")
            by_id = {c[0]: k for k, c in enumerate(comps)}
            for c in range(seg[0]):
                cid = seg[1 + 2 * c]
                tt = seg[2 + 2 * c]
                if cid not in by_id:
                    raise ValueError("unknown scan component")
                scan_sel.append((by_id[cid], tt >> 4, tt & 0x0F))
            scan_pos = i + seglen
            break
        i += seglen
    if scan_pos < 0 or not width or not height:
        raise ValueError("no scan data")
    for _, _, _, tq in comps:
        if tq not in quant:
            raise ValueError("missing quant table")
    for _, dc_id, ac_id in scan_sel:
        if dc_id not in huff_dc or ac_id not in huff_ac:
            raise ValueError("missing Huffman table")

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for _, hs, vs, _ in comps:
        planes.append(np.zeros((mcuy * vs * 8, mcux * hs * 8),
                               dtype=np.float64))
    br = _BitReader(data, scan_pos)
    preds = [0] * len(comps)

    def read_block(dct_t, act_t, q, pred):
        coef = np.zeros(64, dtype=np.float64)
        t = _huff_decode(br, dct_t)
        pred += _extend(br.read_bits(t), t)
        coef[0] = pred
        k = 1
        while k < 64:
            rs = _huff_decode(br, act_t)
            r, s_ = rs >> 4, rs & 0x0F
            if s_ == 0:
                if r == 15:  # ZRL
                    k += 16
                    continue
                break  # EOB
            k += r
            if k > 63:
                raise ValueError("AC index overflow")
            coef[_ZIGZAG[k]] = _extend(br.read_bits(s_), s_)
            k += 1
        return _A.T @ (coef.reshape(8, 8) * q) @ _A, pred

    for my in range(mcuy):
        for mx in range(mcux):
            for si, (ci, dc_id, ac_id) in enumerate(scan_sel):
                _, hs, vs, tq = comps[ci]
                q = quant[tq].astype(np.float64)
                for by in range(vs):
                    for bx in range(hs):
                        block, preds[ci] = read_block(
                            huff_dc[dc_id], huff_ac[ac_id], q, preds[ci])
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = block

    if len(comps) == 1:
        img = np.clip(np.round(planes[0][:height, :width] + 128), 0, 255)
        return img.astype(np.uint8)
    # upsample chroma to full resolution (pixel replication — the JFIF
    # nearest-neighbor path), then YCbCr -> RGB (JFIF / BT.601 full-range)
    full = []
    for ci, (_, hs, vs, _) in enumerate(comps):
        p = planes[ci]
        if hs < hmax or vs < vmax:
            p = np.repeat(np.repeat(p, vmax // vs, 0), hmax // hs, 1)
        full.append(p[:height, :width])
    y, cb, cr = full[0] + 128.0, full[1], full[2]
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def jpeg_decode_gray(data: bytes) -> "np.ndarray":
    """Grayscale-profile entry point kept for callers that require a 2-D
    result: decodes via jpeg_decode and rejects color streams."""
    img = jpeg_decode(data)
    if img.ndim != 2:
        raise ValueError("not a grayscale JPEG")
    return img
