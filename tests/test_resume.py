"""Resumable-pipeline tests (SURVEY.md §5(d)): per-partition lineage,
never-fail UDFs, anti-join resume, idempotency after a partial failure."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_parse_bench_spark.operators.extract import _collect_boilerplate
from pdf_parse_bench_spark.operators.resume import (
    extract_with_lineage,
    lineage_of,
    pending,
    read_resumed,
    run_resumable,
)


def _md(spark, fx):
    return spark.read.parquet(str(fx / "parsed_markdown.parquet"))


def test_injected_failures_isolated(spark, fx_smoke):
    md = _md(spark, fx_smoke).limit(50).cache()
    fail = frozenset(r.doc_id for r in md.limit(5).collect())
    res = extract_with_lineage(md, fail_docs=fail)
    lin = lineage_of(res)
    err = {r.doc_id for r in lin.where(F.col("status") == "error").collect()}
    assert err == set(fail)
    # failed docs contribute zero spans; healthy docs unaffected
    ok = lin.where(F.col("status") == "ok")
    assert ok.count() == 45
    assert ok.where(F.col("n_spans") <= 0).isEmpty()


def test_resume_after_partial_failure(spark, fx_smoke, tmp_path):
    md = _md(spark, fx_smoke).limit(60).cache()
    bp = _collect_boilerplate(_md(spark, fx_smoke))
    out1 = str(tmp_path / "spans")
    ckpt = str(tmp_path / "ckpt")
    fail = frozenset(r.doc_id for r in md.limit(7).collect())

    # pass 1: 7 docs fail, 53 succeed
    run_resumable(md, out1, ckpt, boilerplate=bp, fail_docs=fail)
    assert pending(md, ckpt).count() == 7

    # pass 2: failures resolved; only pending docs reprocessed
    run_resumable(md, out1, ckpt, boilerplate=bp, fail_docs=frozenset())
    assert pending(md, ckpt).count() == 0

    # pass 3: nothing pending → no-op (idempotent)
    run_resumable(md, out1, ckpt, boilerplate=bp, fail_docs=frozenset())

    resumed = read_resumed(spark, out1, ckpt)
    # equals a clean single-pass run
    from pdf_parse_bench_spark.operators.extract import extract_spans
    clean = extract_spans(md, boilerplate=bp)
    assert resumed.count() == clean.count()
    assert resumed.exceptAll(clean).isEmpty()
    assert clean.exceptAll(resumed).isEmpty()


def test_zero_span_docs_drain(spark, fx_smoke, tmp_path):
    """A doc whose markdown parses to zero spans must still checkpoint
    (ok sentinel) so the pending set drains; the sentinel never reaches
    the span output."""
    md = spark.createDataFrame(
        [("zempty", ""), ("zreal", "Real content line.")],
        "doc_id string, markdown string",
    )
    out, ckpt = str(tmp_path / "spans"), str(tmp_path / "ckpt")
    run_resumable(md, out, ckpt)
    assert pending(md, ckpt).count() == 0  # empty doc checkpointed too
    lin = spark.read.parquet(ckpt)
    z = lin.where(F.col("doc_id") == "zempty").collect()
    assert len(z) == 1 and z[0].status == "ok" and z[0].n_spans == 0
    resumed = read_resumed(spark, out, ckpt)
    assert resumed.where(F.col("doc_id") == "zempty").isEmpty()
    assert resumed.where(F.col("offset") < 0).isEmpty()
    # re-run is a no-op (nothing pending)
    run_resumable(md, out, ckpt)
    assert resumed.count() == read_resumed(spark, out, ckpt).count()


def test_read_resumed_no_full_row_distinct(spark, fx_smoke, tmp_path):
    """The final-view dedup must key its exchange on (doc_id, offset),
    never on full rows with text payloads."""
    md = _md(spark, fx_smoke).limit(10)
    out, ckpt = str(tmp_path / "spans"), str(tmp_path / "ckpt")
    run_resumable(md, out, ckpt)
    plan = read_resumed(spark, out, ckpt)._jdf.queryExecution() \
        .executedPlan().toString()
    import re
    for m in re.finditer(r"hashpartitioning\(([^)]*)\)", plan):
        assert "text#" not in m.group(1), m.group(0)


def test_lineage_partition_metrics(spark, fx_smoke):
    md = _md(spark, fx_smoke).limit(30)
    lin = lineage_of(extract_with_lineage(md))
    rows = lin.collect()
    assert all(r.partition_id >= 0 for r in rows)
    assert all(r.stage == "extract" for r in rows)


def test_lineage_summary_matches_composition(spark, fx_smoke):
    """r7 pin: the fused one-row-per-doc lineage_summary must be
    row-identical to lineage_of(extract_with_lineage(...)) — including an
    injected failure and a zero-span (all-boilerplate) doc."""
    from pdf_parse_bench_spark.operators.resume import lineage_summary

    md = _md(spark, fx_smoke).limit(25)
    fail = frozenset(r.doc_id for r in md.limit(2).collect())
    cols = ["doc_id", "stage", "status", "error", "n_spans"]
    fused = {tuple(r) for r in
             lineage_summary(md, fail_docs=fail).select(*cols).collect()}
    composed = {tuple(r) for r in
                lineage_of(extract_with_lineage(md, fail_docs=fail))
                .select(*cols).collect()}
    assert fused == composed and len(fused) == 25
