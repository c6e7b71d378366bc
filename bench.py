"""Benchmark harness — prints ONE JSON line.

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": 0.1,
   "docs_per_sec": ..., "scaling": {...N vs 4N throughput + efficiency...}}

Headline = the north metric path: end-to-end unguided extraction (markdown →
ordered spans) over the sf fixture corpus, plus the other pipeline families.
Scaling evidence (north_rule: >=0.8 efficiency between N and 4N executors):
the same extraction job re-run in fresh JVMs at local[N] and local[4N]
(subprocess mode --scale-worker), reported as docs/sec at each level.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     SPARK_GRAFT_SCALING=0 to skip the scaling sub-runs.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _extract_seconds(spark, sf_dir: str, runs: int = 2) -> tuple[float, int]:
    """Warm-steady extraction timing: first run pays python-worker spin-up,
    report the best of `runs`."""
    import __spark_entry__ as entry

    fn = entry.queries()["extract_spans"]
    best = float("inf")
    for _ in range(runs):
        t0 = time.time()
        fn(spark, sf_dir).count()
        best = min(best, time.time() - t0)
    n_docs = spark.read.parquet(
        str(Path(entry.fx.ensure_fixtures(sf_dir)) / "parsed_markdown.parquet")
    ).count()
    return best, n_docs


SCALE_REPL = int(os.environ.get("SPARK_GRAFT_SCALE_REPL", "24"))
SCALE_FILES = 128


def _ensure_scaling_corpus(sf_dir: str) -> str:
    """Materialize the replicated corpus once, pre-split into SCALE_FILES
    parquet files so every parallelism level sees fine-grained uniform
    tasks (one giant batch per task quantizes away all scaling)."""
    import __spark_entry__ as entry
    from pyspark.sql import functions as F
    from pdf_parse_bench_spark.session import get_spark

    fx_dir = Path(entry.fx.ensure_fixtures(sf_dir))
    out = fx_dir / f"scaling_corpus_x{SCALE_REPL}"
    if (out / "_SUCCESS").exists():
        return str(out)
    spark = get_spark("bench-prep", cores=16)
    md = spark.read.parquet(str(fx_dir / "parsed_markdown.parquet"))
    (
        md.repartition(SCALE_FILES)
        .crossJoin(spark.range(SCALE_REPL).select(F.col("id").alias("_c")))
        .select(F.concat("doc_id", F.lit("#"), F.col("_c")).alias("doc_id"),
                "markdown")
        .repartition(SCALE_FILES)
        .write.mode("overwrite").parquet(str(out))
    )
    spark.stop()
    return str(out)


def scale_worker(cores: int) -> None:
    """One parallelism level: fresh JVM at local[cores], fine-grained input
    (2MB splits, SPARK_GRAFT_BATCH-row Arrow batches), steady-state best of
    3 runs of the extraction pipeline. Launched via subprocess ==
    `spark-submit --master local[cores] --py-files ...` with identical
    configs (jobs/extract_job.py is the literal spark-submit form).

    Tunables (env): SPARK_GRAFT_BATCH (Arrow rows/batch, default 1024),
    SPARK_GRAFT_SPLIT_MB (input split size, default 2),
    SPARK_GRAFT_ENGINE (arrow|pandas kernel exchange, default arrow)."""
    from pyspark.sql import SparkSession

    batch = int(os.environ.get("SPARK_GRAFT_BATCH", "1024"))
    split_mb = int(os.environ.get("SPARK_GRAFT_SPLIT_MB", "2"))
    engine = os.environ.get("SPARK_GRAFT_ENGINE", "arrow")
    corpus = _ensure_scaling_corpus(SF_DIR)
    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"bench-scale-{cores}")
        .config("spark.sql.shuffle.partitions", str(max(16, 2 * cores)))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch))
        .config("spark.sql.files.maxPartitionBytes", str(split_mb * 1024 * 1024))
        .config("spark.python.worker.reuse", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    try:
        from pdf_parse_bench_spark.operators.extract import extract_spans

        md = spark.read.parquet(corpus)
        n_docs = md.count()
        runs = int(os.environ.get("SPARK_GRAFT_SCALE_RUNS", "2"))
        best = float("inf")
        for _ in range(runs):
            t0 = time.time()
            extract_spans(md, boilerplate=frozenset(), rebalance=False,
                          engine=engine).count()
            best = min(best, time.time() - t0)
        print(json.dumps({"cores": cores, "sec": best, "docs": n_docs}))
    finally:
        spark.stop()


def _burn_worker(args):
    """Pure-python shard: run the extraction kernel flat out (no Spark) —
    the per-process hardware ceiling for this workload on this box."""
    docs, n_iter = args
    from pdf_parse_bench_spark.kernels.markdown import parse_markdown
    c = 0
    for _ in range(n_iter):
        for md in docs:
            c += len(parse_markdown(md, frozenset()))
    return c


def _burn_level(procs: int) -> float:
    """docs/sec of a pure multiprocessing burn of the SAME kernel at one
    process count (best of 2). The N→4N ratio of these numbers is what the
    shared box physically permits (all-core turbo downclock + SMT sharing)
    — the engine's scaling efficiency is reported raw AND normalized to
    this. Called immediately after the matching Spark level so both see
    the same box state (neighbor load swings both equally)."""
    import multiprocessing as mp
    import pyarrow.parquet as pq
    import __spark_entry__ as entry

    fx_dir = Path(entry.fx.ensure_fixtures(SF_DIR))
    t = pq.read_table(str(fx_dir / "parsed_markdown.parquet"),
                      columns=["markdown"])
    mds = t.column("markdown").to_pylist()[:1250]
    n_iter = max(2, 16 // max(1, procs // 8))  # ~2s+ per level
    init, initargs = None, ()
    if os.environ.get("SPARK_GRAFT_PIN", "") == "1" and procs < CPUS:
        init, initargs = _pin_affinity, (procs,)
    best = 0.0
    for _ in range(2):
        with mp.Pool(procs, initializer=init, initargs=initargs) as p:
            t0 = time.time()
            p.map(_burn_worker, [(mds, n_iter)] * procs)
            dt = time.time() - t0
        best = max(best, procs * len(mds) * n_iter / dt)
    return best


def _pin_affinity(n: int) -> None:
    """Pool initializer for SPARK_GRAFT_PIN=1: confine burn workers to the
    first n CPUs — the same set the pinned Spark level runs on."""
    os.sched_setaffinity(0, set(range(n)))


def _stats(xs: list[float]) -> dict:
    s = sorted(xs)
    n = len(s)
    med = s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2
    return {"min": round(s[0], 3), "median": round(med, 3),
            "max": round(s[-1], 3)}


def run_scaling(pairs: list[tuple[int, int]],
                repeats: int | None = None) -> list[dict]:
    """Measure each (N, 4N) pair `repeats` times IN ONE INVOCATION and
    report the distribution (min/median/max) of raw efficiency and of the
    engine/ceiling ratio — the committed artifact, not a single lucky run,
    is the evidence for the >=0.8 north rule. Each repeat runs the Spark
    level and its pure-python burn back-to-back so shared-box load swings
    hit both equally; the ratio is reported RAW (a value > 1.0 flags
    box-state drift between the level and its burn rather than being
    clamped invisible)."""
    if repeats is None:
        repeats = int(os.environ.get("SPARK_GRAFT_SCALE_REPEATS", "5"))
    levels = sorted({c for p in pairs for c in p})
    thr: dict[int, list[float]] = {c: [] for c in levels}
    burn: dict[int, list[float]] = {c: [] for c in levels}
    pin = os.environ.get("SPARK_GRAFT_PIN", "") == "1"
    for _ in range(repeats):
        for cores in levels:
            cmd = [sys.executable, __file__, "--scale-worker", str(cores)]
            if pin and cores < CPUS:
                # SPARK_GRAFT_PIN=1: pin sub-maximal levels to the first
                # `cores` CPUs so the ceiling comparison isolates
                # frequency/SMT effects from scheduler placement (a free
                # 8-thread JVM on a 32-CPU box migrates across all cores,
                # catching per-core turbo the pinned level cannot)
                cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
            r = subprocess.run(
                cmd, capture_output=True, text=True, timeout=1200,
            )
            line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
            d = json.loads(line)
            thr[cores].append(d["docs"] / d["sec"])
            burn[cores].append(_burn_level(cores))  # same box state
    results = []
    for n_small, n_big in pairs:
        effs, ceffs, ratios = [], [], []
        for i in range(repeats):
            eff = thr[n_big][i] / thr[n_small][i] / (n_big / n_small)
            ceff = burn[n_big][i] / burn[n_small][i] / (n_big / n_small)
            effs.append(eff)
            ceffs.append(ceff)
            ratios.append(eff / ceff)
        results.append({
            "cores_small": n_small,
            "cores_big": n_big,
            "repeats": repeats,
            "docs_per_sec_small": _stats(thr[n_small]),
            "docs_per_sec_big": _stats(thr[n_big]),
            "efficiency_raw": _stats(effs),
            "hw_ceiling_efficiency": _stats(ceffs),
            "efficiency_vs_ceiling_raw": _stats(ratios),
            "efficiency_per_repeat": [round(x, 3) for x in effs],
            "ceiling_per_repeat": [round(x, 3) for x in ceffs],
            "ratio_per_repeat": [round(x, 3) for x in ratios],
            "burn_docs_per_sec_small": _stats(burn[n_small]),
            "burn_docs_per_sec_big": _stats(burn[n_big]),
        })
    return results


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--scale-worker":
        scale_worker(int(sys.argv[2]))
        return

    import __spark_entry__ as entry
    from pdf_parse_bench_spark.session import get_spark

    # fixtures are generated once (deterministic) before timing starts
    entry.fx.ensure_fixtures(SF_DIR)

    # co-tenancy probe (VERDICT r4 item 7): one-process kernel burn
    # before and after the query pass. On a quiet box the two numbers
    # agree; a big drop flags that the per-query seconds were taken on a
    # loaded box and should not be read as regressions.
    burn_before = round(_burn_level(1), 1)

    spark = get_spark("bench", cores=CPUS)
    qs = entry.queries()
    # every registered query is timed (VERDICT r3 item 7: the committed
    # bench artifact must carry per-query data for ALL entries, not a
    # curated headline subset); SPARK_GRAFT_BENCH_QUERIES=name,name scopes
    # a local iteration run
    only = os.environ.get("SPARK_GRAFT_BENCH_QUERIES", "")
    headline = [x for x in only.split(",") if x] if only else list(qs)
    spark.range(10).count()  # JVM warm
    # python-worker warm: the first mapInPandas/pandas_udf query otherwise
    # pays worker spin-up + Arrow init inside its timed window, which
    # reads as a false regression on whichever query happens to run first
    qs["extract_spans"](spark, SF_DIR).limit(64).count()
    times: dict[str, float] = {}
    for name in headline:
        t0 = time.time()
        qs[name](spark, SF_DIR).count()
        times[name] = round(time.time() - t0, 3)

    # steady-state extraction throughput (the north metric)
    ext_sec, n_docs = _extract_seconds(spark, SF_DIR)
    docs_per_sec = n_docs / ext_sec
    spark.stop()
    burn_after = round(_burn_level(1), 1)

    # the query-pass artifact is written to disk BEFORE the scaling sweep
    # starts (VERDICT r4 item 7): the per-query numbers on disk can never
    # be numbers taken while the sweep's burn loops load the box
    result = {
        "metric": "end-to-end extraction throughput (markdown->ordered spans),"
                  " exact span-sequence match vs golden",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "sf": float(Path(SF_DIR).name.replace("sf", "")),
        "n_docs": n_docs,
        "extract_sec_steady": round(ext_sec, 3),
        "docs_per_sec": round(docs_per_sec, 2),
        # co-tenancy stamp: 1-proc kernel docs/sec before vs after the
        # pass; ratio far below 1.0 = the box got loaded mid-pass
        "box_probe": {"burn_before": burn_before, "burn_after": burn_after,
                      "quiet": round(min(burn_before, burn_after)
                                     / max(burn_before, burn_after), 3)},
        "scaling": None,
        "queries": times,
    }
    out = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT",
        str(Path(__file__).parent / "BENCH_full_last.json"))
    with open(out, "w") as fh:
        json.dump(result, fh, indent=1)

    scaling = None
    if os.environ.get("SPARK_GRAFT_SCALING", "1") != "0":
        # two N-vs-4N pairs: (2,8) runs in the regime where the shared
        # 32-core sandbox can give every worker a dedicated core; (8,32)
        # additionally shows the all-core turbo-downclock ceiling
        # (hardware: 32-proc pure-python throughput = 3.08x of 8-proc,
        # i.e. 0.77 ideal — see BASELINE.md scaling section).
        # SPARK_GRAFT_SCALE_PAIRS="8:32,2:8" overrides the pair list.
        pairs = [(2, 8), (max(2, CPUS // 4), CPUS)]
        env_pairs = os.environ.get("SPARK_GRAFT_SCALE_PAIRS", "")
        if env_pairs:
            pairs = [tuple(int(x) for x in p.split(":"))
                     for p in env_pairs.split(",")]
        scaling = run_scaling(pairs)
        # the sweep gets its OWN artifact; the query-pass file on disk
        # stays untouched by anything measured under sweep load
        with open(str(Path(out).with_name(
                Path(out).stem + "_scaling.json")), "w") as fh:
            json.dump({"sf": result["sf"], "scaling": scaling}, fh, indent=1)

    # `queries` deliberately LAST in the printed line: the driver records
    # only a bounded TAIL of stdout, so tail-anchored ordering keeps the
    # per-query data even when the head of the line is cut (r3's artifact
    # lost exactly the head). The on-disk files are the durable record.
    result["scaling"] = scaling
    result["queries"] = result.pop("queries")  # keep queries tail-anchored
    print(json.dumps(result))


if __name__ == "__main__":
    main()
