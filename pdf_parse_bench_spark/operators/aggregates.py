"""Aggregation / ranking operators over extraction scores.

Reference semantics:
  A1 grouped mean scores       pipeline/pipeline.py:181-244
  A2 counts                    pipeline/pipeline.py:175-214
  A3 extraction-quality        segment_extractor.py:81-85,136-140,159-170
  W1 leaderboard rank          utilities/generate_benchmark_table.py:52-73
  U2/P5 pending-score anti-join eval/llm_judge.py:259-264

All are single-shuffle groupBy/window plans with map-side partial
aggregation — the shapes that scale linearly with executor count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from pdf_parse_bench_spark.functions import round_half_up, table_complexity_expr


def grouped_mean_scores(scores: DataFrame) -> DataFrame:
    """Per (parser, kind, judge_model) average score (A1)."""
    return (
        scores.groupBy("parser_name", "kind", "judge_model")
        .agg(round_half_up(F.avg("score")).alias("avg_score"),
             F.count("*").alias("n"))
    )


def score_cube(scores: DataFrame) -> DataFrame:
    """Grouping-sets flavor of A1: cube over (kind, complexity) with a
    grouping id to disambiguate rollup nulls from data nulls."""
    return (
        scores.cube("kind", "complexity")
        .agg(round_half_up(F.avg("score")).alias("avg_score"),
             F.count("*").alias("n"),
             F.grouping_id().alias("gid"))
    )


def extracted_complexity_cube(spans: DataFrame) -> DataFrame:
    """Cube over (kind, complexity) on EXTRACTED spans: complexity is
    classified at parse time from the tabular text itself (the reference
    carries the GT `complexity` tag into its summary cube,
    eval/llm_judge.py:45 — here extraction re-derives it, so the cube works
    on real extractions, not only on fixture scores). Pure codegen + one
    grouping-sets aggregation."""
    return (
        spans.withColumn("complexity", table_complexity_expr())
        .cube("kind", "complexity")
        .agg(F.count("*").alias("n_spans"), F.grouping_id().alias("gid"))
    )


def judged_complexity_cube(judged: DataFrame, extracted: DataFrame) -> DataFrame:
    """The reference's summary cube over REAL extractions: judge scores
    grouped by kind x complexity where complexity comes from the extracted
    tabular text itself (not a fixture label) — the pipeline/pipeline.py:
    181-244 accumulation with eval/llm_judge.py:45's complexity dimension,
    now derivable mid-pipeline. One equi-join on (doc_id, offset) + one
    grouping-sets aggregation."""
    cx = extracted.select(
        "doc_id", "offset", table_complexity_expr().alias("complexity"))
    return (
        judged.join(cx, ["doc_id", "offset"])
        .cube("kind", "complexity")
        .agg(round_half_up(F.avg("score")).alias("avg_score"),
             F.count("*").alias("n"),
             F.grouping_id().alias("gid"))
    )


def benchmark_counts(scores: DataFrame) -> DataFrame:
    """A2: corpus counts per parser (docs, inline/display formulas, tables)."""
    return scores.groupBy("parser_name").agg(
        F.countDistinct("doc_id").alias("num_docs"),
        F.sum(F.when(F.col("kind") == "inline-formula", 1).otherwise(0)).alias(
            "total_inline_formulas"
        ),
        F.sum(F.when(F.col("kind") == "display-formula", 1).otherwise(0)).alias(
            "total_display_formulas"
        ),
        F.sum(F.when(F.col("kind") == "table", 1).otherwise(0)).alias(
            "total_tables"
        ),
    )


def extraction_quality(scores: DataFrame) -> DataFrame:
    """A3: per (doc, parser) failure metrics — zero scores and error counts."""
    return scores.groupBy("doc_id", "parser_name").agg(
        F.sum(F.when(F.col("score") == 0, 1).otherwise(0)).alias("n_failed"),
        F.sum(F.size("errors")).alias("n_errors"),
        F.count("*").alias("n_scored"),
    )


def leaderboard(scores: DataFrame, judge_model: str = "judge-x") -> DataFrame:
    """W1: rank parsers by average score under one judge (desc), rank 1..n,
    deterministic tie-break on parser_name."""
    avg = (
        scores.where(F.col("judge_model") == judge_model)
        .groupBy("parser_name")
        .agg(round_half_up(F.avg("score")).alias("avg_score"))
    )
    w = Window.orderBy(F.desc("avg_score"), F.asc("parser_name"))
    return avg.withColumn("rank", F.row_number().over(w))


def leaderboard_markdown(scores: DataFrame,
                         judge_model: str = "judge-x") -> str:
    """Render the ranked leaderboard as the human-facing markdown artifact
    (utilities/generate_benchmark_table.py:40-74: sort by overall average
    desc, emit | Rank | Parser | Overall | Inline | Display | rows with
    2-decimal scores). The aggregation is distributed; only the tiny
    per-parser summary (a handful of rows) is collected to format."""
    avg = (
        scores.where((F.col("judge_model") == judge_model)
                     & F.col("kind").isin("inline-formula", "display-formula"))
        .groupBy("parser_name")
        .agg(
            F.avg("score").alias("overall"),
            F.avg(F.when(F.col("kind") == "inline-formula", F.col("score")))
            .alias("inline"),
            F.avg(F.when(F.col("kind") == "display-formula", F.col("score")))
            .alias("display"),
        )
    )
    rows = sorted(avg.collect(), key=lambda r: (-r.overall, r.parser_name))
    lines = [
        "| Rank | Parser | Overall | Inline | Display |",
        "|------|--------|---------|--------|---------|",
    ]
    for rank, r in enumerate(rows, start=1):
        lines.append(
            f"| {rank} | {r.parser_name} | {(r.overall or 0.0):.2f} "
            f"| {(r.inline or 0.0):.2f} | {(r.display or 0.0):.2f} |"
        )
    return "\n".join(lines)


def pending_scores(scores: DataFrame, judge_model: str = "judge-y") -> DataFrame:
    """U2/P5: (doc, index, parser) units still lacking a given judge's score
    — the incremental-resume gap set (resume.pending keeps the literal
    anti-join form against a separate checkpoint table).

    r7 (guide §2.4): when universe and done both derive from the SAME
    table, the distinct + distinct + left_anti composition (three full
    exchanges of the unit key at sf1.0) collapses to ONE map-side-partial
    aggregation: a unit is pending iff no row of its group carries the
    judge's model. Same rows, one shuffle."""
    return (
        scores.groupBy("doc_id", "index", "parser_name")
        .agg(F.max(F.when(F.col("judge_model") == judge_model, 1)
                   .otherwise(0)).alias("_has"))
        .where(F.col("_has") == 0)
        .select("doc_id", "index", "parser_name")
    )
