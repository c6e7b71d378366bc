"""Multimodal column handling: image/audio/video as opaque binary + typed
metadata (the `media_ref` side of the span model; olmOCR figure-ref
convention parsers/olmocr/__main__.py:59-61).

`decode_media` is a REAL pixel decode: a dependency-free PNG codec
(kernels/png.py, stdlib zlib + filters) runs inside Arrow batches — the
analog of the reference's formula-PNG rendering surface
(utilities/formula_renderer.py:119-164). Non-PNG formats (jpeg/audio/video)
would slot into the same batch shape behind the format sniff.
"""

from __future__ import annotations

import re
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from pdf_parse_bench_spark.kernels.png import decode_png

_REF_RE = re.compile(r"page_(\d+)_(\d+)_(\d+)_(\d+)\.png")


def media_features(spans: DataFrame) -> DataFrame:
    """image spans → typed metadata (x, y, w, h, area) parsed from the
    media_ref. Pure column expressions (regexp_extract), so this stays in
    whole-stage codegen; a real decoder would swap in `decode_media`."""
    img = spans.where(F.col("kind") == "image")
    g = lambda i: F.regexp_extract("media_ref", _REF_RE.pattern, i).cast("int")
    return img.select(
        "doc_id",
        "offset",
        "media_ref",
        g(1).alias("x"),
        g(2).alias("y"),
        g(3).alias("w"),
        g(4).alias("h"),
        (g(3) * g(4)).alias("area"),
    )


_DECODE_COLS = ["doc_id", "offset", "media_ref", "width", "height",
                "channels", "n_bytes", "mean_intensity"]


def decode_media(media_df: DataFrame) -> DataFrame:
    """mapInPandas decode over (doc_id, offset, media_ref, media_bytes):
    real PNG decode (kernels/png.py) → width/height/channels + mean pixel
    intensity in [0, 1] (rounded half-up to 6 dp, engine-portable).
    Undecodable payloads yield null stats instead of failing the task
    (X4 isolation)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {c: [] for c in _DECODE_COLS}
            for doc_id, off, ref, b in zip(
                pdf["doc_id"], pdf["offset"], pdf["media_ref"],
                pdf["media_bytes"],
            ):
                out["doc_id"].append(doc_id)
                out["offset"].append(off)
                out["media_ref"].append(ref)
                out["n_bytes"].append(len(b) if b is not None else 0)
                try:
                    img = decode_png(bytes(b))
                    h, w = img.shape[:2]
                    ch = 1 if img.ndim == 2 else img.shape[2]
                    mean = float(img.mean()) / 255.0
                    out["width"].append(w)
                    out["height"].append(h)
                    out["channels"].append(ch)
                    out["mean_intensity"].append(
                        float(np.floor(mean * 1e6 + 0.5)) / 1e6)
                except Exception:
                    out["width"].append(None)
                    out["height"].append(None)
                    out["channels"].append(None)
                    out["mean_intensity"].append(None)
            yield pd.DataFrame(out)

    return media_df.mapInPandas(
        run,
        schema=("doc_id string, offset int, media_ref string, width int, "
                "height int, channels int, n_bytes long, "
                "mean_intensity double"),
    )
