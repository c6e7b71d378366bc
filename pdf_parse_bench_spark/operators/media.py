"""Multimodal column handling: image/audio/video as opaque binary + typed
metadata (the `media_ref` side of the span model; olmOCR figure-ref
convention parsers/olmocr/__main__.py:59-61).

Spark-side plumbing (schema, partitioning, Arrow batch shape) is real and
tested; the actual pixel decode is STUBBED because no image/audio libraries
exist in this container — `decode_media` raises NotImplementedError unless
PIL is importable, and `media_features` derives deterministic features from
the media_ref geometry instead (the same UDF signature a real decoder
would use).
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

_REF_RE = re.compile(r"page_(\d+)_(\d+)_(\d+)_(\d+)\.png")

try:  # pragma: no cover - not installed in this container
    from PIL import Image  # noqa: F401
    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


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


def decode_media(media_df: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas decode stage over (doc_id, media_ref, media_bytes).

    With `fake=True` (default in this container) emits deterministic fake
    pixels stats derived from the byte length; with a real imaging lib the
    same batch shape decodes actual content.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                if not _HAS_PIL:
                    raise NotImplementedError(
                        "real media decode requires PIL; container has none "
                        "— run with fake=True"
                    )
            n_bytes = pdf["media_bytes"].map(lambda b: len(b) if b is not None else 0)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "n_bytes": n_bytes.astype("int64"),
                    "mean_intensity": (n_bytes % 251).astype("double") / 250.0,
                }
            )

    return media_df.mapInPandas(
        run,
        schema="doc_id string, media_ref string, n_bytes long, mean_intensity double",
    )
