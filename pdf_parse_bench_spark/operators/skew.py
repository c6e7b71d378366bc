"""Skew handling for UDF stages (north_rule: salted repartitioning on doc_id).

AQE's skew-join splitting does not cover pandas-UDF stage skew (a 50x-sized
document stalls one task, invisible to the optimizer — SURVEY.md §4). Design
constraint: nothing here may serialize through the driver or a single-
partition global sort — a `Window.orderBy(size)` bin-packer would be exact
but is a deliberate non-choice at 10^12 docs. Instead:

  - rebalance_by_size: hash-uniform spread, except oversized rows (size >
    quantile-derived threshold) are isolated into their own partition slots
    so one giant document never shares a task with thousands of normal ones.
    Fully parallel: one approxQuantile pass + one shuffle.
  - salted_repartition: classic (key, salt) spread for stages that do not
    need whole-key grouping.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def rebalance_by_size(df: DataFrame, size_col: Column,
                      num_partitions: int | None = None,
                      big_quantile: float = 0.99) -> DataFrame:
    """Repartition so pandas-UDF tasks get balanced work.

    Normal rows: uniform hash spread over `num_partitions`. Rows above the
    `big_quantile` size threshold: spread over a dedicated extra band of
    partitions (one straggler cannot hide a thousand small docs behind it,
    and AQE cannot split a running Python task).
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism * 2
    sized = df.withColumn("_size", size_col)
    # r7: threshold from a BOUNDED-PREFIX sample (limit), not a fraction
    # sample. sample(0.01) still scans every row to flip its coin — at
    # 100 TB that second full read just picks a cutoff, and on the
    # single-row-group fixture files it decoded the whole payload column
    # in ONE task before the real pass even started (measured 1.5-3 s of
    # fixed cost per pdf/markdown query at sf1.0). limit(N) touches only
    # the first N rows of the first split(s). The p99 of an 8k-row prefix
    # is a good estimator whenever row order is not size-correlated (true
    # of every corpus here); a size-sorted adversarial layout would only
    # skew the BALANCE bands, never results.
    row = (sized.select("_size").limit(8192)
           .agg(F.percentile_approx("_size", big_quantile, 1000)
                .alias("t")).first())
    threshold = float(row["t"]) if row and row["t"] is not None \
        else float("inf")
    n_big = max(4, num_partitions // 4)
    pid = F.when(
        F.col("_size") > F.lit(threshold),
        F.lit(num_partitions) + F.pmod(F.xxhash64(F.col("doc_id")), F.lit(n_big)),
    ).otherwise(F.pmod(F.xxhash64(F.col("doc_id"), F.lit(17)), F.lit(num_partitions)))
    return (
        sized.withColumn("_pid", pid)
        .repartition(num_partitions + n_big, "_pid")
        .drop("_size", "_pid")
    )


def spread_for_kernel(df: DataFrame, key: str = "doc_id",
                      min_bytes: int | None = None) -> DataFrame:
    """Ensure a per-row kernel stage engages every core (guide §2.5 "input
    skew": one huge unsplittable file).

    The sf fixture tables are written as a SINGLE parquet row group, which
    no maxPartitionBytes / minPartitionNum setting can split — so the scan
    stage (and any per-doc kernel fused into it) runs as ONE task no matter
    the cluster size. When the scan already has at least one partition per
    core (the 100 TB layout: thousands of files/row groups), this is a
    no-op — no exchange is added; otherwise one hash repartition on `key`
    spreads the rows. Partition count derives from defaultParallelism, not
    a local constant, and the hash key is a stable column (replay-safe
    under task retry, unlike round-robin of nondeterministic input).

    Inputs below `min_bytes` (catalyst size estimate; default
    MIN_SPREAD_BYTES) are also left alone: for a few MB the shuffle +
    many-task python overhead exceeds the parallelism win (measured at
    sf0.1), and a single task finishes in well under a second anyway —
    the gate derives from input size, never from a fixed core count.
    Call sites whose kernels do heavy per-row CPU (md5 shingling,
    trigram counting, plane folds) pass HEAVY_KERNEL_MIN_BYTES: for
    those, compressed bytes understate the work by orders of
    magnitude."""
    if min_bytes is None:
        min_bytes = MIN_SPREAD_BYTES
    n = df.sparkSession.sparkContext.defaultParallelism * 2
    if df.rdd.getNumPartitions() >= n:
        return df
    try:
        size = int(df._jdf.queryExecution().optimizedPlan()
                   .stats().sizeInBytes())
    except Exception:
        size = min_bytes
    if size < min_bytes:
        return df
    return df.repartition(n, key)


MIN_SPREAD_BYTES = 4 * 1024 * 1024
HEAVY_KERNEL_MIN_BYTES = 1024 * 1024


def salted_repartition(df: DataFrame, key: str = "doc_id", n_salts: int = 8,
                       num_partitions: int | None = None,
                       salt_cols: list[str] | None = None,
                       salt_seed: int = 29) -> DataFrame:
    """Spread rows of hot keys across `n_salts` buckets. Only valid before
    stages that do NOT need whole-key grouping (e.g. map-side transforms,
    partial aggregations that re-merge later).

    The salt is a content hash (xxhash64 of `salt_cols`, default all
    columns, mixed with a pass seed), NOT monotonically_increasing_id: the
    id changes on task retry/recompute, which would make the partitioning
    non-replay-stable (a lost-executor recompute could route the same row
    to a different partition than its first run)."""
    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism * 2
    cols = salt_cols if salt_cols is not None else df.columns
    salted = df.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in cols], F.lit(salt_seed)),
               F.lit(n_salts)),
    )
    return (
        salted.repartition(num_partitions, F.col(key), F.col("_salt"))
        .drop("_salt")
    )
