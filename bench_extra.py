"""Scoped per-query timing harness for optimization work (bench.py is FROZEN
for measurement; this file exists so iteration runs don't touch it — guide
§1.1/§1.4).

Methodology matches bench.py: one SparkSession at local[$SPARK_GRAFT_CPUS],
JVM + python-worker warmed, each query timed around a `.count()` action
(what the driver times).  `--noop` instead times a
`write.format("noop")` sink, which materializes EVERY column (guide §1.4) —
use it to make sure a win isn't an artifact of count-path pruning.

Usage:
  SPARK_GRAFT_SF_DIR=fixtures-root python bench_extra.py [--noop]
      [--repeat N] query [query ...]
Prints one JSON line: {"queries": {name: [sec, ...]}, "sf_dir": ..., "mode": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    args = [a for a in sys.argv[1:]]
    noop = "--noop" in args
    args = [a for a in args if a != "--noop"]
    repeat = 1
    if "--repeat" in args:
        i = args.index("--repeat")
        repeat = int(args[i + 1])
        del args[i:i + 2]

    import __spark_entry__ as entry
    from pdf_parse_bench_spark.session import get_spark

    entry.fx.ensure_fixtures(SF_DIR)
    spark = get_spark("bench-extra", cores=CPUS)
    qs = entry.queries()
    names = args or list(qs)
    spark.range(10).count()
    qs["extract_spans"](spark, SF_DIR).limit(64).count()  # worker warm
    times: dict[str, list[float]] = {}
    for name in names:
        times[name] = []
        for _ in range(repeat):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            if noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            times[name].append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
    spark.stop()
    print(json.dumps({"queries": times, "sf_dir": SF_DIR,
                      "mode": "noop" if noop else "count"}))


if __name__ == "__main__":
    main()
