"""Dependency-free Y4M (YUV4MPEG2) parser — the video leg of the
multimodal column model.

Y4M is the uncompressed interchange container (plain-text stream header,
`FRAME` markers, raw planar YCbCr): the one video format that admits an
honest, deterministic parser without codec libraries. Compressed
containers (mp4/mkv) would slot behind the same sniff and degrade to
metadata-only the way non-baseline JPEG does in decode_media.

Supported colorspaces: C420 (default, chroma quarter-size), C444.
"""

from __future__ import annotations

import numpy as np

_MAGIC = b"YUV4MPEG2"


def is_y4m(data: bytes) -> bool:
    return data.startswith(_MAGIC)


def parse_y4m(data: bytes) -> dict:
    """{width, height, fps_num, fps_den, colorspace, n_frames,
    frames: list[np.ndarray Y-plane uint8]}; raises ValueError on
    malformed streams."""
    if not is_y4m(data):
        raise ValueError("not a Y4M stream")
    nl = data.find(b"\n")
    if nl < 0:
        raise ValueError("no stream header terminator")
    width = height = 0
    fps_num, fps_den = 25, 1
    cs = "420"
    for tok in data[len(_MAGIC):nl].split(b" "):
        if not tok:
            continue
        tag, val = tok[:1], tok[1:]
        if tag == b"W":
            width = int(val)
        elif tag == b"H":
            height = int(val)
        elif tag == b"F":
            fps_num, fps_den = (int(x) for x in val.split(b":"))
        elif tag == b"C":
            cs = val.decode("ascii", "replace")
    if width <= 0 or height <= 0 or fps_den <= 0:
        raise ValueError("bad Y4M geometry")
    if cs.startswith("420"):
        frame_len = width * height + 2 * ((width // 2) * (height // 2))
    elif cs.startswith("444"):
        frame_len = 3 * width * height
    else:
        raise ValueError(f"unsupported colorspace C{cs}")
    frames: list[np.ndarray] = []
    i = nl + 1
    n = len(data)
    while i < n:
        if not data.startswith(b"FRAME", i):
            raise ValueError("missing FRAME marker")
        fnl = data.find(b"\n", i)
        if fnl < 0:
            raise ValueError("unterminated FRAME header")
        i = fnl + 1
        if i + frame_len > n:
            raise ValueError("truncated frame payload")
        frames.append(
            np.frombuffer(data[i:i + width * height],
                          dtype=np.uint8).reshape(height, width))
        i += frame_len
    return {"width": width, "height": height, "fps_num": fps_num,
            "fps_den": fps_den, "colorspace": cs, "n_frames": len(frames),
            "frames": frames}
