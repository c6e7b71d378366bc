"""Dependency-free WAV (RIFF/WAVE) parser: fmt metadata for any PCM
stream plus real sample decode for the PCM-16 profile.

The audio leg of the multimodal column model (media as opaque binary +
typed metadata): the reference treats media through external libraries,
so the deterministic surface here is the container spec itself —
RIFF chunk walk (word-aligned), fmt fields, and little-endian int16
samples via NumPy. Profiles outside PCM-16 (float, ADPCM, 24-bit) parse
to metadata only; callers degrade the same way decode_media does for
non-baseline JPEG."""

from __future__ import annotations

import numpy as np


def is_wav(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def parse_wav(data: bytes) -> dict:
    """Metadata + (for PCM-16) decoded samples.

    Returns {channels, sample_rate, bits, n_samples, duration_ms,
    samples: np.ndarray (n, channels) int16 | None}. Raises ValueError on
    anything that is not a well-formed RIFF/WAVE stream."""
    if not is_wav(data):
        raise ValueError("not a WAV (missing RIFF/WAVE)")
    i = 12
    n = len(data)
    fmt = None
    pcm = None
    while i + 8 <= n:
        cid = data[i:i + 4]
        size = int.from_bytes(data[i + 4:i + 8], "little")
        body = data[i + 8:i + 8 + size]
        if len(body) < size:
            raise ValueError("truncated WAV chunk")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("short fmt chunk")
            fmt = {
                "audio_format": int.from_bytes(body[0:2], "little"),
                "channels": int.from_bytes(body[2:4], "little"),
                "sample_rate": int.from_bytes(body[4:8], "little"),
                "bits": int.from_bytes(body[14:16], "little"),
            }
        elif cid == b"data":
            pcm = body
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    ch, bits = fmt["channels"], fmt["bits"]
    if ch <= 0 or fmt["sample_rate"] <= 0 or bits <= 0:
        raise ValueError("degenerate fmt fields")
    frame = ch * (bits // 8)
    if frame == 0:
        raise ValueError("zero frame size")
    n_samples = len(pcm) // frame
    out = {
        "channels": ch,
        "sample_rate": fmt["sample_rate"],
        "bits": bits,
        "n_samples": n_samples,
        "duration_ms": (n_samples * 1000) // fmt["sample_rate"],
        "samples": None,
    }
    if fmt["audio_format"] == 1 and bits == 16:
        out["samples"] = np.frombuffer(
            pcm[:n_samples * frame], dtype="<i2").reshape(n_samples, ch)
    return out
