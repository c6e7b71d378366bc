"""Table-structure extraction: LaTeX tabular sources -> logical cell grids.

The reference's tables corpus ships ground-truth tables as raw tabular
source (data/2026-q1-tables-only/ground_truth/*.json, type='table'
segments), and the engine's interleaved-documents table carries the same
representation in kind='table' spans (fixtures._mk_table). This operator
reconstructs the logical grid — the spec-declared column count and the
per-row cells with styling stripped — so downstream consumers (table QA,
cell-level dedup, structure-aware quality scoring) see rows and columns
instead of markup.

Scale shape: a pure JVM-side projection — one pruned scan of
(doc_id, spans), explode, regexp + split/filter/transform higher-order
functions, zero shuffles, linear in table-text bytes. At 100 TB the plan
is embarrassingly parallel; nothing here widens beyond the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# literal \begin{tabular}{<spec>} — the l/c/r letters of <spec> declare
# the logical column count (separators |, @{} padding etc. do not)
_SPEC_RE = r"\\begin\{tabular\}\{([^}]*)\}"
_BOLD_RE = r"\\textbf\{([^}]*)\}"
_ROW_END_RE = r"\s*\\\\\s*$"  # trailing LaTeX row terminator '\\'


def table_cells(docs: DataFrame) -> DataFrame:
    """One output row per logical table row of every kind='table' span:
    (doc_id, offset, row_idx, n_cols, n_cells, cells) with cells
    '|'-joined in column order, row_idx 0 = header row. n_cols is the
    spec-declared width, n_cells the actual split width — a mismatch
    flags a ragged source row for QA."""
    t = (
        docs.select("doc_id", F.explode("spans").alias("s"))
        .where(F.col("s.kind") == "table")
        .select(
            "doc_id",
            F.col("s.offset").cast("long").alias("offset"),
            F.col("s.text").alias("tab"),
        )
    )
    spec = F.regexp_extract("tab", _SPEC_RE, 1)
    rows = F.filter(F.split("tab", "\n"), lambda ln: ln.contains("&"))
    t = t.select(
        "doc_id",
        "offset",
        F.length(F.regexp_replace(spec, "[^lcr]", ""))
        .cast("long")
        .alias("n_cols"),
        F.posexplode(rows).alias("row_idx", "row"),
    )
    clean = F.regexp_replace(
        F.regexp_replace("row", _BOLD_RE, "$1"), _ROW_END_RE, ""
    )
    cells = F.transform(F.split(clean, " & "), lambda c: F.trim(c))
    return t.select(
        "doc_id",
        "offset",
        F.col("row_idx").cast("long").alias("row_idx"),
        "n_cols",
        F.size(cells).cast("long").alias("n_cells"),
        F.array_join(cells, "|").alias("cells"),
    )
