"""CLI — the reference's per-parser command surface (pipeline/cli.py:31-127,
`uv run -m parsers.<name> -i data/<dataset>`) re-expressed as one backend-
parameterized entry point:

    python -m pdf_parse_bench_spark backends
    python -m pdf_parse_bench_spark extract --backend markdown \
        --input fixtures/sf0.001/parsed_markdown.parquet --output /tmp/spans \
        [--checkpoint /tmp/ckpt] [--cores 8]
    python -m pdf_parse_bench_spark score --extracted /tmp/spans \
        --golden fixtures/sf0.001/golden_spans.parquet
    python -m pdf_parse_bench_spark summarize --scores fixtures/sf0.001/extraction_scores.parquet
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="pdf_parse_bench_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    sub.add_parser("backends", help="list registered extraction backends")

    p_ex = sub.add_parser("extract", help="run an extraction backend")
    p_ex.add_argument("--backend", default="markdown")
    p_ex.add_argument("--input", required=True)
    p_ex.add_argument("--output", required=True)
    p_ex.add_argument("--checkpoint", default=None)
    p_ex.add_argument("--cores", type=int, default=8)

    p_sc = sub.add_parser("score", help="exact + judged scoring vs golden")
    p_sc.add_argument("--extracted", required=True)
    p_sc.add_argument("--golden", required=True)
    p_sc.add_argument("--cores", type=int, default=8)

    p_su = sub.add_parser("summarize", help="grouped mean scores + leaderboard")
    p_su.add_argument("--scores", required=True)
    p_su.add_argument("--cores", type=int, default=8)

    args = ap.parse_args(argv)

    from pdf_parse_bench_spark.operators.backends import get_backend, list_backends

    if args.cmd == "backends":
        print("\n".join(list_backends()))
        return 0

    from pdf_parse_bench_spark.session import get_spark

    spark = get_spark(f"cli-{args.cmd}", cores=args.cores)
    try:
        if args.cmd == "extract":
            df = spark.read.parquet(args.input)
            spans = get_backend(args.backend)(df)
            spans.write.mode("overwrite").parquet(args.output)
            if args.checkpoint:
                from pdf_parse_bench_spark.operators.resume import lineage_of
                from pyspark.sql import functions as F
                lineage = (
                    spans.groupBy("doc_id")
                    .agg(F.count("*").alias("n_spans"))
                    .select("doc_id", F.lit("extract").alias("stage"),
                            F.lit("ok").alias("status"), "n_spans")
                )
                lineage.write.mode("overwrite").parquet(args.checkpoint)
            n = spark.read.parquet(args.output).count()
            print(f"wrote {n} spans to {args.output}")
        elif args.cmd == "score":
            from pdf_parse_bench_spark import score_spans, score_spans_judged
            ext = spark.read.parquet(args.extracted)
            gold = spark.read.parquet(args.golden)
            exact = score_spans(ext, gold)
            from pyspark.sql import functions as F
            row = exact.agg(
                F.sum("n_matched").alias("matched"),
                F.sum("n_golden").alias("golden"),
            ).first()
            judged = score_spans_judged(ext, gold)
            avg = judged.agg(F.avg("score")).first()[0]
            print(f"exact match: {row.matched}/{row.golden} "
                  f"({row.matched / max(1, row.golden):.4f}); "
                  f"judged mean: {avg:.3f}/10")
        elif args.cmd == "summarize":
            from pdf_parse_bench_spark.operators.aggregates import (
                grouped_mean_scores, leaderboard, leaderboard_markdown,
            )
            scores = spark.read.parquet(args.scores)
            grouped_mean_scores(scores).orderBy(
                "parser_name", "kind", "judge_model"
            ).show(50, truncate=False)
            leaderboard(scores).show(truncate=False)
            # the human-facing artifact (generate_benchmark_table.py analog)
            print(leaderboard_markdown(scores))
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
