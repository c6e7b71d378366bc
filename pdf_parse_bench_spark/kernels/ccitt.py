"""CCITT Group 3/4 fax decoding (+ a test/fixture encoder) from scratch.

Scanned PDFs — a large share of any crawled corpus — carry their page
images as `/CCITTFaxDecode` image XObjects (ITU-T T.4/T.6 bilevel
compression); the reference reads them for free through fitz pixmaps
(parsers/dots_ocr/__main__.py:111-118). This module implements the two
profiles that cover scanner output:

  - **Group 4 (T.6, K < 0)**: pure two-dimensional MMR coding —
    pass / vertical(±3) / horizontal modes against the reference line.
  - **Group 3 one-dimensional (T.4 MH, K = 0)**: per-line modified
    Huffman run lengths, optional EOL codes.

plus `/EncodedByteAlign`. Output is a uint8 pixel array (255 white,
0 black) — `/BlackIs1` only affects re-packed 1-bit output, which we
never produce, so it is accepted and ignored.

The run-length code tables are transcribed from the public ITU-T T.4
standard (Tables 2/3: terminating + make-up codes, shared extended
make-ups). Correctness evidence is (a) encoder↔decoder round-trips over
randomized bilevel images — which exercises every mode but would not
catch a table transposition mirrored on both sides — and (b) pinned
known-answer bit strings for a hand-coded line (white-4/black-3/white-1
MH = "1011" "10" "000111"), which do pin the common table entries
independently of the encoder.
"""

from __future__ import annotations

from bisect import bisect_right

import numpy as np

# ---------------------------------------------------------------------------
# ITU-T T.4 modified-Huffman run-length code tables
# ---------------------------------------------------------------------------

_WHITE_TERM = {
    0: "00110101", 1: "000111", 2: "0111", 3: "1000", 4: "1011",
    5: "1100", 6: "1110", 7: "1111", 8: "10011", 9: "10100",
    10: "00111", 11: "01000", 12: "001000", 13: "000011", 14: "110100",
    15: "110101", 16: "101010", 17: "101011", 18: "0100111",
    19: "0001100", 20: "0001000", 21: "0010111", 22: "0000011",
    23: "0000100", 24: "0101000", 25: "0101011", 26: "0010011",
    27: "0100100", 28: "0011000", 29: "00000010", 30: "00000011",
    31: "00011010", 32: "00011011", 33: "00010010", 34: "00010011",
    35: "00010100", 36: "00010101", 37: "00010110", 38: "00010111",
    39: "00101000", 40: "00101001", 41: "00101010", 42: "00101011",
    43: "00101100", 44: "00101101", 45: "00000100", 46: "00000101",
    47: "00001010", 48: "00001011", 49: "01010010", 50: "01010011",
    51: "01010100", 52: "01010101", 53: "00100100", 54: "00100101",
    55: "01011000", 56: "01011001", 57: "01011010", 58: "01011011",
    59: "01001010", 60: "01001011", 61: "00110010", 62: "00110011",
    63: "00110100",
}
_WHITE_MAKEUP = {
    64: "11011", 128: "10010", 192: "010111", 256: "0110111",
    320: "00110110", 384: "00110111", 448: "01100100", 512: "01100101",
    576: "01101000", 640: "01100111", 704: "011001100",
    768: "011001101", 832: "011010010", 896: "011010011",
    960: "011010100", 1024: "011010101", 1088: "011010110",
    1152: "011010111", 1216: "011011000", 1280: "011011001",
    1344: "011011010", 1408: "011011011", 1472: "010011000",
    1536: "010011001", 1600: "010011010", 1664: "011000",
    1728: "010011011",
}
_BLACK_TERM = {
    0: "0000110111", 1: "010", 2: "11", 3: "10", 4: "011", 5: "0011",
    6: "0010", 7: "00011", 8: "000101", 9: "000100", 10: "0000100",
    11: "0000101", 12: "0000111", 13: "00000100", 14: "00000111",
    15: "000011000", 16: "0000010111", 17: "0000011000",
    18: "0000001000", 19: "00001100111", 20: "00001101000",
    21: "00001101100", 22: "00000110111", 23: "00000101000",
    24: "00000010111", 25: "00000011000", 26: "000011001010",
    27: "000011001011", 28: "000011001100", 29: "000011001101",
    30: "000001101000", 31: "000001101001", 32: "000001101010",
    33: "000001101011", 34: "000011010010", 35: "000011010011",
    36: "000011010100", 37: "000011010101", 38: "000011010110",
    39: "000011010111", 40: "000001101100", 41: "000001101101",
    42: "000011011010", 43: "000011011011", 44: "000001010100",
    45: "000001010101", 46: "000001010110", 47: "000001010111",
    48: "000001100100", 49: "000001100101", 50: "000001010010",
    51: "000001010011", 52: "000000100100", 53: "000000110111",
    54: "000000111000", 55: "000000100111", 56: "000000101000",
    57: "000001011000", 58: "000001011001", 59: "000000101011",
    60: "000000101100", 61: "000001011010", 62: "000001100110",
    63: "000001100111",
}
_BLACK_MAKEUP = {
    64: "0000001111", 128: "000011001000", 192: "000011001001",
    256: "000001011011", 320: "000000110011", 384: "000000110100",
    448: "000000110101", 512: "0000001101100", 576: "0000001101101",
    640: "0000001001010", 704: "0000001001011", 768: "0000001001100",
    832: "0000001001101", 896: "0000001110010", 960: "0000001110011",
    1024: "0000001110100", 1088: "0000001110101", 1152: "0000001110110",
    1216: "0000001110111", 1280: "0000001010010", 1344: "0000001010011",
    1408: "0000001010100", 1472: "0000001010101", 1536: "0000001011010",
    1600: "0000001011011", 1664: "0000001100100", 1728: "0000001100101",
}
# extended make-ups 1792..2560 are shared by both colours (T.4 Table 3b)
_EXT_MAKEUP = {
    1792: "00000001000", 1856: "00000001100", 1920: "00000001101",
    1984: "000000010010", 2048: "000000010011", 2112: "000000010100",
    2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110",
    2560: "000000011111",
}

_EOL = "000000000001"


def _decode_table(*tables) -> dict:
    out = {}
    for t in tables:
        for run, bits in t.items():
            out[(len(bits), int(bits, 2))] = run
    return out


_WHITE_DEC = _decode_table(_WHITE_TERM, _WHITE_MAKEUP, _EXT_MAKEUP)
_BLACK_DEC = _decode_table(_BLACK_TERM, _BLACK_MAKEUP, _EXT_MAKEUP)

# G4 / 2-D mode codes (T.6 Table 4): value = signed vertical offset
_MODE_V = {"1": 0, "011": 1, "000011": 2, "0000011": 3,
           "010": -1, "000010": -2, "0000010": -3}
_MODE_PASS = "0001"
_MODE_HORIZ = "001"


class _Bits:
    """MSB-first bit reader with byte alignment support."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self) -> int:
        p = self.pos
        if p >> 3 >= len(self.data):
            raise ValueError("CCITT data exhausted")
        self.pos = p + 1
        return (self.data[p >> 3] >> (7 - (p & 7))) & 1

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def exhausted(self) -> bool:
        return self.pos >> 3 >= len(self.data)


def _read_mh_run(br: _Bits, table: dict) -> int:
    """One modified-Huffman run: make-up codes accumulate until a
    terminating (< 64) code arrives."""
    total = 0
    while True:
        length = 0
        code = 0
        run = None
        while length < 14:
            code = (code << 1) | br.read()
            length += 1
            run = table.get((length, code))
            if run is not None:
                break
        if run is None:
            raise ValueError("invalid CCITT run code")
        total += run
        if run < 64:
            return total


def _read_mode(br: _Bits) -> tuple[str, int]:
    """(mode, v_offset) — mode in {'V','P','H'}; raises on EOL/garbage."""
    bits = ""
    for _ in range(7):
        bits += str(br.read())
        if bits in _MODE_V:
            return ("V", _MODE_V[bits])
        if bits == _MODE_PASS:
            return ("P", 0)
        if bits == _MODE_HORIZ:
            return ("H", 0)
    raise ValueError(f"bad CCITT 2-D mode code {bits!r}")


def _transitions_to_line(trans: list[int], columns: int) -> np.ndarray:
    """Changing positions -> uint8 line (255 white / 0 black); lines
    start white, transitions alternate."""
    line = np.full(columns, 255, dtype=np.uint8)
    for i in range(0, len(trans), 2):
        b = trans[i]
        w = trans[i + 1] if i + 1 < len(trans) else columns
        line[b:w] = 0
    return line


def _b1_b2(ref: list[int], a0: int, color: int) -> tuple[int, int]:
    """First changing element on the reference line right of a0 with
    colour opposite to the current colour (b1), and the next one (b2).
    ref holds alternating change positions starting white->black, so
    b1 must sit at an even index for white (starts a black run) and an
    odd index for black."""
    i = bisect_right(ref, a0)
    if (i & 1) != color:
        i += 1
    n = len(ref)
    b1 = ref[i] if i < n else 10 ** 9
    b2 = ref[i + 1] if i + 1 < n else 10 ** 9
    return b1, b2


def ccittfax_decode(data: bytes, columns: int, rows: int, k: int = -1,
                    byte_align: bool = False) -> np.ndarray:
    """Decode a CCITTFaxDecode stream to a (rows, columns) uint8 array
    (255 white, 0 black). k < 0 = Group 4 (T.6 MMR); k == 0 = Group 3
    one-dimensional MH (leading EOL codes skipped). Positive k (mixed
    2-D G3) is out of scope and raises."""
    if k > 0:
        raise ValueError("G3 2-D (K > 0) unsupported")
    br = _Bits(data)
    out = np.full((rows, columns), 255, dtype=np.uint8)
    ref: list[int] = []  # imaginary all-white line above the image
    for y in range(rows):
        if byte_align:
            br.align()
        if k == 0:
            # optional fill + EOL(s) before each line: T.4 permits any
            # number of zero-fill bits before each EOL (000000000001) in
            # byte-aligned scanner streams. EOL is the only code with
            # >= 11 leading zeros (the MH tables are prefix-free against
            # it), so a run of >= 11 zeros terminated by a 1 is
            # fill+EOL — consume the whole run, not a fixed 12-bit peek.
            while True:
                save = br.pos
                zeros = 0
                try:
                    bit = br.read()
                    while bit == 0:
                        zeros += 1
                        bit = br.read()
                except ValueError:
                    br.pos = save
                    break
                if zeros >= 11:
                    continue  # fill+EOL consumed (terminating 1 read)
                br.pos = save
                break
            trans = []
            pos = 0
            color = 0
            while pos < columns:
                run = _read_mh_run(br, _WHITE_DEC if color == 0
                                   else _BLACK_DEC)
                pos += run
                trans.append(pos)
                color ^= 1
            if trans and trans[-1] >= columns:
                trans.pop()  # trailing change at the right edge
            out[y] = _transitions_to_line(trans, columns)
            continue
        # --- Group 4: one 2-D coded line against ref ---
        a0 = -1
        color = 0
        trans: list[int] = []
        while a0 < columns:
            mode, dv = _read_mode(br)
            b1, b2 = _b1_b2(ref, a0, color)
            b1 = min(b1, columns)
            b2 = min(b2, columns)
            if mode == "P":
                a0 = b2
            elif mode == "V":
                a1 = b1 + dv
                if not (0 <= a1 <= columns):
                    raise ValueError("CCITT vertical offset out of range")
                trans.append(a1)
                a0 = a1
                color ^= 1
            else:  # horizontal: two MH runs of current then opposite colour
                start = max(a0, 0)
                r1 = _read_mh_run(br, _WHITE_DEC if color == 0
                                  else _BLACK_DEC)
                r2 = _read_mh_run(br, _BLACK_DEC if color == 0
                                  else _WHITE_DEC)
                a1 = start + r1
                a2 = a1 + r2
                if a2 > columns + 1:
                    raise ValueError("CCITT horizontal run overflow")
                trans.append(min(a1, columns))
                trans.append(min(a2, columns))
                a0 = a2
            if a0 >= columns:
                break
        trans = [t for t in trans if t < columns]
        out[y] = _transitions_to_line(trans, columns)
        ref = trans
    return out


# ---------------------------------------------------------------------------
# Encoder (fixtures/tests): proves decode by round-trip
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write_bits(self, bits: str) -> None:
        for c in bits:
            self.acc = (self.acc << 1) | (c == "1")
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                self.acc = 0
                self.n = 0

    def align(self) -> None:
        while self.n:
            self.write_bits("0")

    def flush(self) -> bytes:
        self.align()
        return bytes(self.out)


def _mh_bits(run: int, color: int) -> str:
    term = _WHITE_TERM if color == 0 else _BLACK_TERM
    makeup = dict(_WHITE_MAKEUP if color == 0 else _BLACK_MAKEUP)
    makeup.update(_EXT_MAKEUP)
    bits = ""
    while run >= 64:
        m = min(2560, (run // 64) * 64)
        while m not in makeup:
            m -= 64
        bits += makeup[m]
        run -= m
    return bits + term[run]


def _line_transitions(line: np.ndarray) -> list[int]:
    d = np.flatnonzero(np.diff(
        np.concatenate(([255], line.astype(np.int16)))))
    return [int(x) for x in d]


def ccittfax_encode(img: np.ndarray, k: int = -1,
                    byte_align: bool = False) -> bytes:
    """Encode a bilevel uint8 array (255 white / anything else black)
    as Group 4 (k < 0) or Group 3 1-D (k == 0) fax data."""
    img = np.where(np.asarray(img) >= 128, 255, 0).astype(np.uint8)
    rows, columns = img.shape
    bw = _BitWriter()
    ref: list[int] = []
    for y in range(rows):
        if byte_align:
            bw.align()
        cur = _line_transitions(img[y])
        if k == 0:
            pos = 0
            color = 0
            for t in cur + [columns]:
                if t == pos and color == 0 and pos == 0:
                    # leading zero-length white run
                    bw.write_bits(_mh_bits(0, 0))
                    color ^= 1
                    continue
                bw.write_bits(_mh_bits(t - pos, color))
                pos = t
                color ^= 1
                if pos >= columns:
                    break
            continue
        # --- Group 4 ---
        a0 = -1
        color = 0
        while a0 < columns:
            i = bisect_right(cur, a0 if a0 >= 0 else -1)
            # next changing element of the CODING line after a0 whose
            # run colour matches: parity alignment as in the decoder
            if (i & 1) != color:
                i += 1
            a1 = cur[i] if i < len(cur) else columns
            a2 = cur[i + 1] if i + 1 < len(cur) else columns
            b1, b2 = _b1_b2(ref, a0, color)
            b1 = min(b1, columns)
            b2 = min(b2, columns)
            if b2 < a1:
                bw.write_bits(_MODE_PASS)
                a0 = b2
            elif abs(a1 - b1) <= 3:
                inv = {v: bits for bits, v in _MODE_V.items()}
                bw.write_bits(inv[a1 - b1])
                a0 = a1
                color ^= 1
            else:
                start = max(a0, 0)
                bw.write_bits(_MODE_HORIZ)
                bw.write_bits(_mh_bits(a1 - start, color))
                bw.write_bits(_mh_bits(a2 - a1, 1 - color))
                a0 = a2
        ref = cur
    # EOFB then pad
    if k < 0:
        bw.write_bits(_EOL + _EOL)
    return bw.flush()
