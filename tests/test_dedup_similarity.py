"""Semantic sanity tests for the training-data-pipeline operators (exact
engine-vs-oracle equality is covered by the parity gate; these check the
operators actually *detect* what they claim to)."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from pdf_parse_bench_spark.operators import dedup as dd
from pdf_parse_bench_spark.operators import similarity as sim
from pdf_parse_bench_spark.operators import textstats as ts

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_exact_dedup_finds_planted_duplicate(spark):
    base = _docs(spark).select("doc_id", "text")
    dup = base.limit(1).select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    out = dd.dedup_exact(base.unionByName(dup))
    assert out.where(F.col("dup_count") == 2).count() == 1
    # kept id is the smaller one
    kept = out.where(F.col("dup_count") == 2).first()
    assert kept.keep_doc_id < 100000


def test_minhash_near_duplicate_detected(spark):
    base = _docs(spark).select("doc_id", "text").limit(50)
    # near-dup: append two words to doc 0's text — most shingles shared
    near = base.limit(1).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat("text", F.lit(" extra token")).alias("text"),
    )
    pairs = dd.lsh_candidate_pairs(base.unionByName(near))
    assert pairs.where(
        (F.col("doc_a") == 0) & (F.col("doc_b") == 100000)
    ).count() == 1
    verified = dd.ngram_jaccard_pairs(base.unionByName(near), threshold=0.5)
    assert verified.where(
        (F.col("doc_a") == 0) & (F.col("doc_b") == 100000)
        & (F.col("jaccard") > 0.8)
    ).count() == 1


def test_simhash_close_for_near_duplicates(spark):
    base = _docs(spark).select("doc_id", "text").limit(20)
    near = base.limit(1).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat("text", F.lit(" zz")).alias("text"),
    )
    sigs = {r.doc_id: r.simhash
            for r in dd.simhash_signatures(base.unionByName(near)).collect()}
    hamming = bin(sigs[0] ^ sigs[100000]).count("1")
    assert hamming <= 4  # near-dup stays within a few bits


def test_embedding_near_dup_planted(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").limit(100)
    twin = emb.limit(1).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(1.000001)).alias("embedding"),
        "label",
    )
    pairs = dd.embedding_near_dups(emb.unionByName(twin), threshold=0.999)
    assert pairs.where(
        (F.col("vec_a") == 0) & (F.col("vec_b") == 100000)
    ).count() == 1


def test_ann_topk_self_twin_ranked_first(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").limit(200)
    twin = emb.where(F.col("vec_id") == 1).select(
        F.lit(100000).alias("vec_id").cast("long").alias("vec_id"),
        "embedding", "label",
    )
    out = sim.brute_force_topk(emb.unionByName(twin), n_queries=3, k=5)
    top1 = out.where((F.col("query_id") == 1) & (F.col("rank") == 1)).first()
    assert top1.vec_id == 100000 and top1.cosine == 1.0
    # ranks dense 1..5 per query
    assert out.groupBy("query_id").count().where(F.col("count") != 5).isEmpty()


def test_lang_and_quality_shapes(spark):
    docs = _docs(spark).limit(50)
    lang = ts.lang_id(docs)
    assert lang.count() == 50
    q = ts.quality_score(docs)
    row = q.first()
    assert 0.0 <= row.quality <= 1.0
    assert row.n_words > 0
    tok = ts.token_counts(docs).first()
    assert tok.regex_tokens >= tok.ws_tokens
    fp = ts.fingerprint(docs)
    assert fp.select("fingerprint").distinct().count() == 50


def test_corpus_filter_reason_precedence(spark):
    """Each rejection rule fires, and earlier rules mask later ones
    (duplicate > lang > too_short > punct > low_quality)."""
    from pdf_parse_bench_spark.operators.textstats import corpus_filter
    good = ("the project and the data of the run went well "
            "and the numbers looked fine")
    rows = [
        (1, good),                       # keep
        (2, good),                       # exact dup of 1 -> duplicate
        (3, "el la de " * 5),            # spanish markers -> lang
        (4, "the and of tiny"),          # en but < 8 words -> too_short
        (5, "the !! and ?? of ## " * 4),  # punct ratio high -> punct
        # 9 words, 1 stopword, punct ratio ~0.17 (<=0.2): combined quality
        # lands under 0.3 without tripping the earlier rules
        (6, "the zzz zzz zzz zzz zzz zzz zzz zz#######"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.keep, r.reject_reason)
           for r in corpus_filter(docs).collect()}
    assert got[1] == (True, "")
    assert got[2] == (False, "duplicate")
    assert got[3] == (False, "lang")
    assert got[4] == (False, "too_short")
    assert got[5] == (False, "punct")
    assert got[6] == (False, "low_quality")


def test_dedup_clusters_match_union_find(spark):
    """dedup_clusters must equal the transitive closure (python union-find)
    of the verified near-dup edge list on a real corpus slice."""
    from pdf_parse_bench_spark.operators.dedup import (
        dedup_clusters, ngram_jaccard_pairs)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    edges = ngram_jaccard_pairs(docs).collect()
    labels = {r.doc_id: r.cluster_id for r in dedup_clusters(docs).collect()}
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for e in edges:
        ra, rb = find(e.doc_a), find(e.doc_b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    n_multi = 0
    for doc_id, cluster in labels.items():
        expect = find(doc_id) if doc_id in parent else doc_id
        assert cluster == expect, (doc_id, cluster, expect)
        if cluster != doc_id:
            n_multi += 1
    assert n_multi > 0  # the corpus slice really has near-dup clusters


def test_pointer_doubling_converges_logarithmically_on_10k_chain(spark):
    """VERDICT r3 item 10: adversarial connected-components input — a
    10,000-node chain (diameter 9,999 >> the default max_iter=20). Plain
    min-label propagation would need ~10^4 rounds; pointer doubling must
    converge in <= ceil(log2(diameter)) + 2 rounds (one extra for the
    no-change detection round; measured 14), pinning the O(log d) claim
    in the dedup_clusters docstring. Every node must land on the chain's
    min label."""
    import math

    from pyspark.sql import functions as F
    from pdf_parse_bench_spark.operators.dedup import propagate_min_labels

    n = 10_000
    nodes = spark.range(n).select(
        F.format_string("%09d", "id").alias("doc_id"))
    edges = spark.range(n - 1).select(
        F.format_string("%09d", "id").alias("doc_a"),
        F.format_string("%09d", F.col("id") + 1).alias("doc_b"))
    labels, rounds = propagate_min_labels(nodes, edges, max_iter=25)
    assert rounds <= math.ceil(math.log2(n - 1)) + 2, rounds
    assert labels.where(F.col("cluster_id") != "000000000").isEmpty()
    assert labels.count() == n


def test_ann_sketch_recall_floor_at_committed_default(spark):
    """The committed ANN default (sketch_topk: 64-bit sign sketch +
    fixed ham<=T threshold rerank) must reach mean recall@10 >= 0.65 on
    the sf0.01 corpus — the calibration lsh_recall exists to enforce
    (VERDICT r2 item 7; r4 moved the quantile cut to a fixed threshold so
    the candidate filter is a plain codegen Filter, and the measured
    recall ROSE to 0.74 at ~16% scan). Deterministic: seeded hyperplanes
    + fixed corpus."""
    from pdf_parse_bench_spark.operators import similarity as sim

    assert sim.SKETCH_HAM_T <= 28  # <= ~22% expected acceptance at 64 bits
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    vals = [r.recall for r in sim.lsh_recall(emb).collect()]
    mean = sum(vals) / len(vals)
    assert mean >= 0.65, vals


def test_sketch_sign_margin_stable_across_engines():
    """Oracle-parity guard (ADVICE r3): Spark computes plane dots via NumPy
    float64 matmul, DuckDB via list_dot_product — different summation
    orders. A sign flip (=> sketch-bit mismatch => flaky parity) would need
    |dot| below summation-order noise (~1e-12 on 64-d unit-ish vectors).
    The corpus is driver-generated (not ours to regenerate), so instead of
    regenerating planes on violation we ASSERT the margin: every
    (vector, plane) |dot| across every SF and both plane sets must clear
    1e-9 by orders of magnitude (measured min 1.3e-5)."""
    import numpy as np
    import pyarrow.parquet as pq
    from pdf_parse_bench_spark.operators import similarity as sim

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        t = pq.read_table(f"/root/testdata/{sf}/embeddings.parquet")
        vecs = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
        for n_planes in (sim.SKETCH_BITS, sim.ANN_PLANES):
            planes = np.array(sim.hyperplanes(n_planes), dtype=np.float64).T
            margin = float(np.abs(vecs @ planes).min())
            assert margin > 1e-9, (sf, n_planes, margin)


def test_ann_bucket_probe_radius2_superset(spark):
    """Radius-2 probing must never return a worse candidate set than
    radius-1: every radius-1 result survives or is displaced by a
    higher-cosine candidate (top-k over a superset of buckets)."""
    from pyspark.sql import functions as F
    from pdf_parse_bench_spark.operators import similarity as sim

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    r1 = sim.lsh_topk(emb, probe_radius=1).groupBy("query_id").agg(
        F.min("cosine").alias("worst1"), F.count("*").alias("n1"))
    r2 = sim.lsh_topk(emb, probe_radius=2).groupBy("query_id").agg(
        F.min("cosine").alias("worst2"), F.count("*").alias("n2"))
    j = r1.join(r2, "query_id").collect()
    assert j
    for row in j:
        assert row.n2 >= row.n1
        assert row.worst2 >= row.worst1


def test_duplicate_ngram_pairs_plants_exact_substring(spark):
    """Two docs sharing a planted 10-word passage (unique to them) must
    pair with n_shared >= 3 (three 8-gram shingles inside 10 words); a
    third doc without the passage must not pair with either."""
    from pdf_parse_bench_spark.operators.dedup import duplicate_ngram_pairs

    passage = "zq1 zq2 zq3 zq4 zq5 zq6 zq7 zq8 zq9 zq10"
    rows = [
        (1, "alpha beta " + passage + " tail one"),
        (2, "other head words " + passage + " different tail"),
        (3, "completely unrelated text with enough words to shingle ok " +
            "more filler words here to pass the length gate fine"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.doc_a, r.doc_b): r.n_shared
           for r in duplicate_ngram_pairs(docs).collect()}
    assert (1, 2) in got and got[(1, 2)] >= 3
    assert all(3 not in pair for pair in got)


def test_pii_scrub_kinds_and_counts(spark):
    from pdf_parse_bench_spark.operators.textstats import pii_scrub

    rows = [
        (1, "mail me at a.b+x@foo-bar.example.com or visit "
            "https://x.example.com/p?q=1 from 192.168.0.1 call +49 555 123 4567"),
        (2, "no pii here at all just words"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in pii_scrub(docs).collect()}
    r1 = out[1]
    assert (r1.n_emails, r1.n_urls, r1.n_ips, r1.n_phones) == (1, 1, 1, 1)
    assert "<EMAIL>" in r1.clean_text and "<URL>" in r1.clean_text
    assert "<IP>" in r1.clean_text and "<PHONE>" in r1.clean_text
    assert "@" not in r1.clean_text and "https://" not in r1.clean_text
    r2 = out[2]
    assert r2.clean_text == "no pii here at all just words"
    assert (r2.n_emails, r2.n_urls, r2.n_ips, r2.n_phones) == (0, 0, 0, 0)


def test_winnowing_shared_passage_guarantee(spark):
    """Schleimer et al. §2 guarantee: any shared word run of length >=
    k+w-1 (= 6 at the committed k=3/w=4) between two documents yields at
    least one COMMON fingerprint; two docs with no shared 3-gram share
    none."""
    from pyspark.sql import functions as F
    from pdf_parse_bench_spark.operators.textstats import (
        winnowing_fingerprints)

    passage = "uniquely planted passage of seven shared words"
    docs = spark.createDataFrame(
        [("a", f"alpha bravo {passage} charlie delta"),
         ("b", f"echo foxtrot golf {passage} hotel"),
         ("c", "completely disjoint vocabulary nothing matches here at all")],
        "doc_id string, text string")
    fp = winnowing_fingerprints(docs)
    a = {r.fp for r in fp.where(F.col("doc_id") == "a").collect()}
    b = {r.fp for r in fp.where(F.col("doc_id") == "b").collect()}
    c = {r.fp for r in fp.where(F.col("doc_id") == "c").collect()}
    assert a & b, "shared passage must yield a common fingerprint"
    assert not (a & c) and not (b & c)


def test_ann_ivf_recall_and_scan_fraction(spark):
    """IVF at 16 cells / nprobe 4 must (a) scan ~nprobe/cells of the
    corpus per query (cells are argmax-balanced on the isotropic corpus),
    and (b) reach mean recall@10 >= 0.35 — between bucket-LSH radius-1
    (~0.12) and the committed sketch default (~0.74), with the best
    at-rest partition-pruning story (cell = Iceberg partition key).
    Deterministic: seeded centroids + fixed corpus."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    vals = [r.recall
            for r in sim.lsh_recall(emb, topk_fn=sim.ivf_topk).collect()]
    assert len(vals) == 5
    assert sum(vals) / len(vals) >= 0.35, vals
    # cell balance: no cell holds more than 3x its fair share
    from pdf_parse_bench_spark.operators.similarity import (
        IVF_CELLS, _with_norm, _dot_lit, ivf_centroids)
    import pyspark.sql.functions as F
    cents = ivf_centroids()
    best = F.greatest(*[
        F.struct(_dot_lit(F.col("v"), cv).alias("d"),
                 F.lit(-ci).alias("negc"))
        for ci, cv in enumerate(cents)])
    counts = (_with_norm(emb)
              .withColumn("cell", -best.getField("negc"))
              .groupBy("cell").count().collect())
    n = sum(r["count"] for r in counts)
    assert len(counts) == IVF_CELLS
    assert max(r["count"] for r in counts) <= 3 * n / IVF_CELLS


def test_ivf_trained_centroids_beat_random(spark):
    """The IVF quantizer is genuinely pluggable: spherical-k-means
    centroids trained offline on the corpus sample must not lose recall
    vs the seeded random default at the same (cells, nprobe), and the
    operator must accept them unchanged (same schema, same two-phase
    ranking)."""
    import numpy as np

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    sample = np.array([r["embedding"] for r in
                       emb.limit(400).collect()], dtype=np.float64)
    trained = sim.train_ivf_centroids(sample)
    def ivf_trained(e, n_queries=5, k=10):
        return sim.ivf_topk(e, n_queries, k, centroids=trained)
    r_rand = {r["query_id"]: r["recall"]
              for r in sim.lsh_recall(emb, topk_fn=sim.ivf_topk).collect()}
    r_tr = {r["query_id"]: r["recall"]
            for r in sim.lsh_recall(emb, topk_fn=ivf_trained).collect()}
    mean_rand = sum(r_rand.values()) / len(r_rand)
    mean_tr = sum(r_tr.values()) / len(r_tr)
    assert mean_tr >= mean_rand - 0.05, (mean_tr, mean_rand)


def test_decontaminate_explicit_eval_table(spark):
    """Production form: a separate benchmark table drives the broadcast
    side; results must flag exactly the overlapping training docs."""
    from pdf_parse_bench_spark.operators.textstats import decontaminate
    shared = "a b c d e f g h"
    train = spark.createDataFrame(
        [(1, "x " + shared), (2, "totally clean words with no overlap x y")],
        "doc_id long, text string")
    evals = spark.createDataFrame(
        [(100, shared + " tail")], "doc_id long, text string")
    out = {r["doc_id"]: r["n_eval_grams"]
           for r in decontaminate(train, evals).collect()}
    assert out == {1: 1}


def test_semantic_dedup_cell_scoped(spark):
    """SemDeDup: the pair join must be cell-equi (never cartesian), a
    dropped vector's partner must be a smaller id in the SAME cell with
    cosine >= T, and keepers are never dropped."""
    from pdf_parse_bench_spark.plans import assert_no_cartesian
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    out = sim.semantic_dedup(emb)
    assert_no_cartesian(out)
    rows = out.collect()
    dropped = {r["vec_id"] for r in rows}
    for r in rows:
        assert r["dup_of"] < r["vec_id"]
        assert r["max_cosine"] >= sim.SEMDEDUP_T
    assert not dropped & {r["dup_of"] for r in rows
                          if r["dup_of"] not in dropped} - dropped


def test_semantic_dedup_hot_cell_split_bounds_group_size(spark):
    """A degenerate quantizer concentrating ~all vectors into ONE cell
    must not re-create the corpus-quadratic join: with cell_cap=25 and
    200 same-cell vectors, every compared group is a (cell, subcell)
    slice of at most cap rows, and every reported dup still shares the
    subcell (vec_id % nsplit) with its partner."""
    import numpy as np

    n, cap = 200, 25
    rng = np.random.default_rng(20260817)
    # all vectors cluster around +e0 -> everything lands in one cell
    base = np.zeros(sim.EMB_DIM)
    base[0] = 1.0
    rows = [(i, [float(x) for x in base + 0.01 * rng.standard_normal(
        sim.EMB_DIM)]) for i in range(n)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = sim.semantic_dedup(emb, cell_cap=cap)
    # the internal grouping: replicate the assignment to count group sizes
    cents = sim.ivf_centroids()
    asg = np.argmax(np.array(cents) @ np.array(
        [r[1] for r in rows]).T, axis=0)
    cell_sizes = np.bincount(asg)
    hot = int(cell_sizes.max())
    assert hot >= n * 0.9  # the fixture really is degenerate
    nsplit = -(-hot // cap)
    assert nsplit >= 8
    # group bound: per (cell, sub) at most ceil(hot/nsplit) ~ cap rows
    subs = np.array([i % nsplit for i in range(n)])
    assert max(np.bincount(subs[asg == cell_sizes.argmax()])) <= cap + 1
    # every reported pair respects the subcell split (and the drop rule)
    for r in out.collect():
        assert r["dup_of"] < r["vec_id"]
        assert r["dup_of"] % nsplit == r["vec_id"] % nsplit
        assert r["max_cosine"] >= sim.SEMDEDUP_T
    # the split must still find dups (vectors are near-identical)
    assert out.count() > 0
