"""Aggregate-operator tests: the markdown leaderboard artifact (the
generate_benchmark_table.py:40-74 analog) against a hand-computed golden."""

from __future__ import annotations

from pdf_parse_bench_spark.operators.aggregates import leaderboard_markdown


def test_leaderboard_markdown_golden(spark):
    rows = [
        # (doc, idx, kind, parser, judge, score)
        ("d1", 0, "inline-formula", "engine-b", "judge-x", 10),
        ("d1", 1, "display-formula", "engine-b", "judge-x", 8),
        ("d1", 0, "inline-formula", "engine-a", "judge-x", 6),
        ("d1", 1, "display-formula", "engine-a", "judge-x", 7),
        ("d1", 2, "table", "engine-a", "judge-x", 0),  # non-formula: excluded
        ("d1", 0, "inline-formula", "engine-c", "judge-x", 9),
        ("d1", 1, "display-formula", "engine-c", "judge-x", 4),
        ("d1", 0, "inline-formula", "engine-a", "judge-y", 10),  # other judge
    ]
    scores = spark.createDataFrame(
        rows, "doc_id string, index int, kind string, parser_name string, "
              "judge_model string, score int")
    md = leaderboard_markdown(scores, judge_model="judge-x")
    assert md == "\n".join([
        "| Rank | Parser | Overall | Inline | Display |",
        "|------|--------|---------|--------|---------|",
        "| 1 | engine-b | 9.00 | 10.00 | 8.00 |",
        "| 2 | engine-a | 6.50 | 6.00 | 7.00 |",
        "| 3 | engine-c | 6.50 | 9.00 | 4.00 |",
    ])


def test_leaderboard_markdown_on_fixture(spark, fx_smoke):
    scores = spark.read.parquet(str(fx_smoke / "extraction_scores.parquet"))
    md = leaderboard_markdown(scores)
    lines = md.splitlines()
    assert lines[0] == "| Rank | Parser | Overall | Inline | Display |"
    assert len(lines) == 2 + 3  # three fixture parsers
    assert [ln.split("|")[1].strip() for ln in lines[2:]] == ["1", "2", "3"]
