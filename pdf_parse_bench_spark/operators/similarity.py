"""Similarity search over the `embeddings` table (array<float> column).

Baseline: brute-force cosine top-k — a broadcast of the (small) query set
against the full corpus; one scan, no shuffle until the per-query top-k
aggregation. Scale path: sign-LSH bucketing restricts each query to its
bucket (the IVF analog: bucket = coarse cell).

All arithmetic in float64 via built-in higher-order functions
(zip_with/aggregate — JVM-side, no Python UDF), rounded to 6 dp so the
DuckDB oracle matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from pdf_parse_bench_spark.functions import round_half_up


def _as_double(col: str = "embedding"):
    return F.transform(col, lambda x: x.cast("double"))


def _with_norm(df: DataFrame, out: str = "v") -> DataFrame:
    return df.select(
        "vec_id", _as_double().alias(out)
    ).withColumn(
        "norm", F.sqrt(F.aggregate(out, F.lit(0.0), lambda a, x: a + x * x))
    )


def _cosine(va, vb, na, nb):
    return round_half_up(
        F.aggregate(F.zip_with(va, vb, lambda x, y: x * y), F.lit(0.0),
                    lambda a, x: a + x) / (na * nb)
    )


def brute_force_topk(emb: DataFrame, n_queries: int = 5, k: int = 10) -> DataFrame:
    """Top-k cosine neighbors for the first `n_queries` vec_ids.

    The query side is tiny → broadcast join (no shuffle of the corpus);
    ranking uses a per-query window with a deterministic (cosine desc,
    vec_id asc) tie-break.
    """
    corpus = _with_norm(emb)
    queries = (
        corpus.where(F.col("vec_id") < n_queries)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("norm").alias("qnorm"),
        )
    )
    scored = (
        corpus.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .withColumn("cosine", _cosine("qv", "v", F.col("qnorm"), F.col("norm")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def lsh_topk(emb: DataFrame, n_queries: int = 5, k: int = 10,
             sign_dims: int = 2) -> DataFrame:
    """Bucketed ANN: only vectors sharing the query's sign-LSH bucket are
    scored (approximate — may differ from brute force; that IS the contract).
    At 100 TB the bucket column becomes the Iceberg partition key, turning
    each query into a partition-pruned scan."""
    bucket = F.concat_ws(
        "",
        *[
            F.when(F.element_at("v", i + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
            for i in range(sign_dims)
        ],
    )
    corpus = _with_norm(emb).withColumn("bucket", bucket)
    queries = (
        corpus.where(F.col("vec_id") < n_queries)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("norm").alias("qnorm"),
            "bucket",
        )
    )
    scored = (
        corpus.join(F.broadcast(queries), "bucket")
        .where(F.col("vec_id") != F.col("query_id"))
        .withColumn("cosine", _cosine("qv", "v", F.col("qnorm"), F.col("norm")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )
