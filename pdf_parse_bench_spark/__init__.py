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
