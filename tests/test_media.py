"""Multimodal plumbing tests: media metadata extraction is pure column
expressions; the decode stage runs as mapInPandas with a deterministic
fake (real decode is stubbed — no imaging libs in this container)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_parse_bench_spark.operators.media import decode_media, media_features


def test_media_features_parse_geometry(spark, fx_smoke):
    spans = spark.read.parquet(str(fx_smoke / "golden_spans.parquet"))
    feats = media_features(spans)
    row = feats.first()
    assert row.media_ref == f"page_{row.x}_{row.y}_{row.w}_{row.h}.png"
    assert row.area == row.w * row.h
    assert feats.where(F.col("w") <= 0).isEmpty()


def test_decode_media_fake_batches(spark):
    df = spark.createDataFrame(
        [("d1", "a.png", bytearray(b"\x00" * 10)),
         ("d2", "b.png", bytearray(b"\x01" * 300))],
        "doc_id string, media_ref string, media_bytes binary",
    )
    out = decode_media(df).collect()
    by_ref = {r.media_ref: r for r in out}
    assert by_ref["a.png"].n_bytes == 10
    assert by_ref["b.png"].n_bytes == 300
    assert 0.0 <= by_ref["a.png"].mean_intensity <= 1.0
