"""Backend registry — the E1 plug-in surface re-expressed for Spark.

The reference's 23 parser backends share one interface (`PDFParser.parse`,
utilities/base_parser.py:8-43, auto parser_id :21-29). Here a *backend* is a
named DataFrame transform `f(df, **opts) -> spans DataFrame`; registration
mirrors the reference's directory-name auto-id. Deterministic backends ship
in-tree; VLM/API-bound ones (M6) are not reproducible and would register the
same way around an inference service client.

    from pdf_parse_bench_spark.operators.backends import get_backend
    spans = get_backend("markdown")(md_df)
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

from pdf_parse_bench_spark.operators.extract import (
    extract_spans,
    extract_spans_from_html,
    extract_spans_from_layout,
    extract_spans_from_tei,
    parse_pdfs,
    pdf_spans,
)

_REGISTRY: dict[str, Callable[..., DataFrame]] = {}


def register_backend(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn
    return deco


def get_backend(name: str) -> Callable[..., DataFrame]:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown backend {name!r}; available: {sorted(_REGISTRY)}"
        ) from None


def list_backends() -> list[str]:
    return sorted(_REGISTRY)


register_backend("markdown")(extract_spans)
register_backend("html")(extract_spans_from_html)
register_backend("tei")(extract_spans_from_tei)  # GROBID M4 flavor
register_backend("layout")(extract_spans_from_layout)
register_backend("pdf-text")(parse_pdfs)
register_backend("pdf-spans")(pdf_spans)  # font-aware kind classification
