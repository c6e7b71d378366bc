"""Dump `.explain("formatted")` for named queries into plans/r07/.

Usage: python tools/dump_r07_plan.py before|after query [query ...]
Runs against fixtures at SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.01 —
plan SHAPE is scale-independent; sf0.01 keeps driver-side sampling jobs
cheap)."""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as entry  # noqa: E402
from pdf_parse_bench_spark.plans import formatted_plan  # noqa: E402
from pdf_parse_bench_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    out_dir = REPO / "plans" / "r07"
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("dump-plans-r07", cores=8)
    qs = entry.queries()
    for name in names:
        plan = formatted_plan(qs[name](spark, SF))
        (out_dir / f"{name}_{tag}.txt").write_text(plan)
        print(f"wrote plans/r07/{name}_{tag}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
