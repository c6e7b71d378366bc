"""pdf_parse_bench_spark — a from-scratch PySpark-native document-extraction
engine with the semantic capabilities of phorn1/pdf-parse-bench.

Public API (the reference's library entry point 2, README.md:172-216, as
composable DataFrame transforms):

    from pdf_parse_bench_spark import (
        parse_documents, extract_spans, align_extractions, score_spans,
        summarize,
    )
"""

from pdf_parse_bench_spark.operators.extract import (  # noqa: F401
    align_extractions,
    assemble_markdown,
    compute_boilerplate,
    extract_spans,
    extract_spans_from_layout,
    parse_pdfs,
)
from pdf_parse_bench_spark.operators.aggregates import (  # noqa: F401
    benchmark_counts,
    extraction_quality,
    grouped_mean_scores,
    leaderboard,
    pending_scores,
    score_cube,
)

__version__ = "0.1.0"

# convenience aliases matching the reference's stage names
parse_documents = parse_pdfs
summarize = grouped_mean_scores


def score_spans_judged(extracted, golden):
    """Deterministic 0-10 judge (E2 default scorer): per aligned span pair,
    score = round_half_up(10 * (1 - levenshtein/max_len)) — the reference's
    LLM judge (eval/llm_judge.py:133-158) replaced by an exact, reproducible
    similarity metric. Built-in levenshtein → JVM-side, no UDF."""
    from pyspark.sql import functions as F

    e = extracted.select("doc_id", "offset", "kind",
                         F.col("text").alias("extracted_text"))
    g = golden.select("doc_id", "offset", F.col("text").alias("golden_text"))
    joined = e.join(g, ["doc_id", "offset"])
    max_len = F.greatest(
        F.length("extracted_text"), F.length("golden_text"), F.lit(1)
    )
    raw = 10.0 * (
        F.lit(1.0) - F.levenshtein("extracted_text", "golden_text") / max_len
    )
    score = F.greatest(
        F.lit(0), (F.floor(raw + F.lit(0.5))).cast("int")
    )
    return joined.select("doc_id", "offset", "kind", score.alias("score"))


def score_spans(extracted, golden):
    """Exact span-equality scorer (our deterministic judge, E2 default):
    per doc_id, fraction of golden spans matched exactly on
    (kind, text, media_ref, offset)."""
    from pyspark.sql import functions as F

    keys = ["doc_id", "offset", "kind", "text", "media_ref"]
    g = golden.select(*keys)
    e = extracted.select(*keys).withColumn("_hit", F.lit(1))
    joined = g.join(e, keys, "left")
    return joined.groupBy("doc_id").agg(
        F.count("*").alias("n_golden"),
        F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_matched"),
        (F.floor(F.sum(F.coalesce(F.col("_hit"), F.lit(0))) / F.count("*")
                 * 1000000.0 + F.lit(0.5)) / 1000000.0).alias("match_rate"),
    )
