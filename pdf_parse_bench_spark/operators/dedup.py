"""Deduplication operators over the `documents` table — built-in-function
only (JVM-side, whole-stage-codegen friendly); no Python UDFs anywhere.

All hashing is md5-hex (identical in Spark and the DuckDB oracle), and every
"min over hashes" uses lexicographic order on fixed-width hex, so results are
engine-independent and deterministic.

Scale notes (100 TB): exact dedup is one hash-shuffle with map-side partial
aggregation; MinHash/LSH shuffles only (band_key, doc_id) pairs — K=16
signatures, 4 bands × 4 rows — then self-joins *within* band buckets, so the
candidate join never goes quadratic in the corpus; verification runs only on
candidate pairs. SimHash comes in two sizes: the 16-bit demo signature
(simhash_signatures) and the production 64-bit form (simhash64_blocks /
simhash_near_dups) whose Hamming-neighbor search uses block-equality
banding. Embedding near-dups band random projections the same way, and
dedup_clusters closes the pair graph into components without leaving the
DataFrame API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pdf_parse_bench_spark.functions import round_half_up

MINHASH_K = 16
LSH_BANDS = 4
LSH_ROWS = 4  # K = BANDS * ROWS
SHINGLE_N = 3
SIMHASH_BITS = 16


def _words(col: str = "text"):
    return F.filter(F.split(F.trim(F.col(col)), " +"), lambda x: x != "")


def _shingles_df(docs: DataFrame) -> DataFrame:
    """(doc_id, shingles: array<string>) — word n-grams (SHINGLE_N); docs
    shorter than N words get a single whole-text shingle.

    The words array is materialized behind an explode-of-singleton barrier:
    projection collapse would otherwise inline the split+filter expression
    into every element_at, re-tokenizing the document 3x per shingle
    (measured 10x slower at sf0.1)."""
    wdf = docs.select("doc_id", F.explode(F.array(_words())).alias("w"))
    n = F.size("w")
    shingles = F.when(
        n >= SHINGLE_N,
        F.transform(
            F.sequence(F.lit(1), n - (SHINGLE_N - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at("w", i + k) for k in range(SHINGLE_N)]
            ),
        ),
    ).otherwise(F.array(F.concat_ws(" ", "w")))
    return wdf.select("doc_id", shingles.alias("shingles"))


def dedup_exact(docs: DataFrame) -> DataFrame:
    """Exact dedup: hash-groupBy on md5(text); keeps the smallest doc_id per
    group. One shuffle, partial aggregation map-side."""
    return (
        docs.groupBy(F.md5(F.col("text")).alias("text_hash"))
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("dup_count"))
    )


_MINHASH_MOD = 4294967296  # 2^32


def minhash_signatures(docs: DataFrame, k: int = MINHASH_K) -> DataFrame:
    """K minhash values per doc via Kirsch-Mitzenmacher double hashing:
    ONE md5 per shingle yields two 32-bit halves (a, b); h_i = (a + i·b)
    mod 2^32 gives K pairwise-distinct hash functions with the same LSH
    collision guarantees as K independent hashes (Kirsch & Mitzenmacher
    2006). r3's construction burned ceil(K/4) md5 calls per shingle — the
    md5 dominates the stage, so this is ~4x less hashing at K=16 (28.6s →
    ~8s at sf0.1 per BENCH artifacts) and the gap widens with K.

    Physical shape: distinct-explode shingles (min is dedup-invariant) →
    one md5 + two conv's per row (whole-stage codegen subexpression
    elimination computes them once across the K projections) → groupBy
    (doc_id) min with map-side partial aggregation, so the shuffle
    carries only K×8-byte partial minima per doc."""
    sh = _shingles_df(docs).select(
        "doc_id", F.explode("shingles").alias("shingle")
    )
    h = F.md5("shingle")
    a = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    b = F.conv(F.substring(h, 9, 8), 16, 10).cast("long")
    hashed = sh.select(
        "doc_id",
        *[((a + F.lit(i) * b) % _MINHASH_MOD).alias(f"mh{i}")
          for i in range(k)]
    )
    mins = hashed.groupBy("doc_id").agg(
        *[F.min(f"mh{i}").alias(f"mh{i}") for i in range(k)]
    )
    return mins.select(
        "doc_id", F.array(*[f"mh{i}" for i in range(k)]).alias("signature")
    )


def lsh_candidate_pairs(docs: DataFrame) -> DataFrame:
    """MinHash-LSH banding: docs sharing any band key become candidates.
    Self-join happens per band bucket (shuffle key = band hash)."""
    sig = minhash_signatures(docs)
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                "|",
                                *[
                                    F.element_at("signature", b * LSH_ROWS + r + 1)
                                    for r in range(LSH_ROWS)
                                ],
                            )
                        ).alias("band_key"),
                    )
                    for b in range(LSH_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.band_key")
    # both join sides shuffle on (band, band_key) from the identical plan, so
    # Catalyst reuses one exchange (ReusedExchange, asserted in
    # tests/test_plans.py) — no persist needed, nothing pins executor memory.
    # At cluster scale the equivalent is "write signatures to a table first".
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(b, ["band", "band_key"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def ngram_jaccard_pairs(docs: DataFrame, threshold: float = 0.5) -> DataFrame:
    """LSH candidates verified by true shingle-set Jaccard >= threshold.
    Exact set ops run only on candidate pairs (never corpus-quadratic)."""
    cands = lsh_candidate_pairs(docs)
    sh = _shingles_df(docs).select(
        "doc_id", F.array_distinct("shingles").alias("sh")
    )
    j = (
        cands.join(sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sh_a"), "doc_a")
        .join(sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sh_b"), "doc_b")
        .withColumn(
            "jaccard",
            round_half_up(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b"))
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return j


def simhash_signatures(docs: DataFrame, bits: int = SIMHASH_BITS) -> DataFrame:
    """Per-doc SimHash over word unigrams. Bit b's vote uses the MSB of hex
    nibble b of md5(word) (nibble >= '8'), so the identical expression runs
    in ANSI SQL."""
    w = docs.select("doc_id", F.explode(_words()).alias("word"))
    h = w.select("doc_id", F.md5("word").alias("h"))
    votes = h.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.substring("h", b + 1, 1) >= "8", 1).otherwise(-1)
            ).alias(f"v{b}")
            for b in range(bits)
        ]
    )
    sim = votes.select(
        "doc_id",
        sum(
            F.when(F.col(f"v{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
            for b in range(bits)
        ).alias("simhash"),
    )
    return sim


EMB_LSH_PLANES = 16
EMB_LSH_ROWS = 4  # bits per band → EMB_LSH_PLANES/EMB_LSH_ROWS bands


def dedup_clusters(docs: DataFrame, threshold: float = 0.5,
                   max_iter: int = 20) -> DataFrame:
    """Connected components over the verified near-dup graph: every doc gets
    cluster_id = min doc_id reachable through Jaccard>=threshold edges
    (singletons cluster with themselves) — the canonical-doc selection step
    a dedup pipeline runs after pair generation.

    Iterative label propagation (the BSP/Pregel shape): each round joins
    labels to the symmetrized edge list and takes the min neighbor label;
    stop when no label changed. A pointer-doubling shortcut
    (label := label-of-label) after each propagation makes rounds needed
    O(log diameter) instead of O(diameter), so a pathological long duplicate
    chain converges inside max_iter; every round is one distributed
    join + groupBy — no driver-side graph. Lineage is truncated per round
    via localCheckpoint so plans don't grow with iterations. Raises
    RuntimeError if max_iter is exhausted before convergence — silently
    returning partially-propagated labels would split a long chain into
    multiple clusters."""
    edges = ngram_jaccard_pairs(docs, threshold).select("doc_a", "doc_b")
    labels, _rounds = propagate_min_labels(
        docs.select("doc_id"), edges, max_iter=max_iter)
    return labels


def propagate_min_labels(nodes: DataFrame, edges: DataFrame,
                         max_iter: int = 20) -> tuple[DataFrame, int]:
    """Min-label propagation + pointer doubling over an explicit edge list
    (doc_a, doc_b) — the connected-components core of dedup_clusters,
    factored out so tests can drive it with adversarial synthetic graphs
    (e.g. a 10k-node chain, diameter >> max_iter) and assert the O(log d)
    round count the docstring claims. Returns (labels, rounds_used) where
    rounds_used INCLUDES the final no-change detection round.

    r7 (guide §2.4 — don't compute what you throw away): the iteration
    runs ONLY over edge-endpoint nodes. A node with no incident edge can
    never receive a neighbor label — its cluster_id is provably its own
    doc_id — and on a deduped corpus endpoints are a vanishing fraction
    of nodes, so every per-round join/aggregate touches the near-dup
    subgraph instead of re-scanning the full node table each round
    (~13 s of iteration overhead at sf1.0 collapsed to sub-second
    rounds). Singletons re-attach with one anti-join after convergence;
    output is row-identical to the full-table iteration."""
    sym = edges.union(
        edges.select(F.col("doc_b").alias("doc_a"),
                     F.col("doc_a").alias("doc_b"))
    ).localCheckpoint()
    epts = (sym.select(F.col("doc_a").alias("doc_id")).distinct()
            .localCheckpoint())
    labels = epts.select("doc_id", F.col("doc_id").alias("cluster_id"))
    converged = False
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        neigh = (
            labels.join(sym, labels["doc_id"] == sym["doc_a"])
            .groupBy(F.col("doc_b").alias("doc_id"))
            .agg(F.min("cluster_id").alias("neigh_min"))
        )
        updated = (
            labels.join(neigh, "doc_id", "left")
            .select(
                "doc_id",
                F.least("cluster_id", F.coalesce("neigh_min", "cluster_id"))
                .alias("cluster_id"),
            )
        )
        # pointer doubling: labels always point to <= themselves (min), so
        # label(label(x)) <= label(x) and is still within x's component
        hop = updated.select(F.col("doc_id").alias("_hop_id"),
                             F.col("cluster_id").alias("_hop_label"))
        updated = (
            updated.join(hop, updated["cluster_id"] == hop["_hop_id"], "left")
            .select(
                "doc_id",
                F.least("cluster_id",
                        F.coalesce("_hop_label", "cluster_id"))
                .alias("cluster_id"),
            )
            .localCheckpoint()
        )
        changed = (
            updated.alias("u").join(labels.alias("l"), "doc_id")
            .where(F.col("u.cluster_id") != F.col("l.cluster_id"))
            .limit(1).count()
        )
        labels = updated
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"dedup_clusters did not converge in {max_iter} rounds — "
            "raise max_iter (graph diameter exceeds 2^max_iter after "
            "pointer doubling, which indicates pathological input)"
        )
    singletons = nodes.select("doc_id").join(
        epts, "doc_id", "left_anti"
    ).select("doc_id", F.col("doc_id").alias("cluster_id"))
    return labels.union(singletons), rounds


SIMHASH64_BLOCKS = 4   # 4 x 16-bit blocks of the 64-bit signature
SIMHASH64_MAX_HAMMING = 3


def simhash64_blocks(docs: DataFrame) -> DataFrame:
    """64-bit SimHash over word unigrams, stored as four 16-bit ints
    (b0..b3) to stay engine-portable (bit 63 of a BIGINT is the sign bit).

    Bit k's vote is bit k of the word's md5 first 64 bits (two 32-bit
    halves via conv, then shiftright+and — r4 replaced the r3 shape of
    TWO md5 calls per word + 64 per-bit hex-nibble string compares with
    ONE md5 + integer bit ops: the md5 dominated the stage). One shuffle:
    groupBy(doc_id) with 64 map-side partial bit-sums plus a count; the
    vote sign is 2*sum(bit_k) - n > 0."""
    w = docs.select("doc_id", F.explode(_words()).alias("word"))
    h = F.md5("word")
    halves = w.select(
        "doc_id",
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long").alias("a"),
        F.conv(F.substring(h, 9, 8), 16, 10).cast("long").alias("b"),
    )
    votes = halves.groupBy("doc_id").agg(
        F.count("*").alias("n"),
        *[
            F.sum(
                F.shiftright(F.col("a" if k < 32 else "b"), k % 32)
                .bitwiseAND(1)
            ).alias(f"s{k}")
            for k in range(64)
        ],
    )
    blocks = [
        sum(
            F.when(2 * F.col(f"s{j * 16 + r}") > F.col("n"), F.lit(1 << r))
            .otherwise(F.lit(0))
            for r in range(16)
        ).cast("int").alias(f"b{j}")
        for j in range(SIMHASH64_BLOCKS)
    ]
    return votes.select("doc_id", *blocks)


def simhash_near_dups(docs: DataFrame,
                      max_hamming: int = SIMHASH64_MAX_HAMMING) -> DataFrame:
    """Hamming-<=3 neighbor pairs over 64-bit SimHash signatures without an
    all-pairs join (Manku et al., WWW'07 block-permutation trick): two
    signatures within Hamming distance 3 must agree EXACTLY on at least one
    of the 4 16-bit blocks (pigeonhole), so candidates come from a self-join
    per (block_idx, block_value) bucket — the same banding shape as
    MinHash-LSH — and the exact popcount(xor) check runs on candidates only."""
    sig = simhash64_blocks(docs)
    bands = sig.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(F.lit(j).alias("blk"), F.col(f"b{j}").alias("blk_val"))
            for j in range(SIMHASH64_BLOCKS)
        ])).alias("bk"),
    ).select("doc_id", "bk.blk", "bk.blk_val")
    a, b = bands.alias("a"), bands.alias("b")
    cands = (
        a.join(b, ["blk", "blk_val"])  # identical plans → ReusedExchange
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = sig.select(F.col("doc_id").alias("doc_a"),
                    *[F.col(f"b{j}").alias(f"a{j}") for j in range(4)])
    sb = sig.select(F.col("doc_id").alias("doc_b"),
                    *[F.col(f"b{j}").alias(f"c{j}") for j in range(4)])
    hamming = sum(
        F.bit_count(F.col(f"a{j}").bitwiseXOR(F.col(f"c{j}")))
        for j in range(4)
    )
    return (
        cands.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn("hamming", hamming.cast("long"))
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


EMB_PAIR_BLOCK = 2048  # row-block size for the within-bucket pair matrix


def embedding_near_dups(emb: DataFrame, threshold: float = 0.4,
                        n_planes: int = EMB_LSH_PLANES,
                        band_rows: int = EMB_LSH_ROWS) -> DataFrame:
    """Embedding-cosine near-dup pairs via banded random-projection LSH
    (the MinHash-banding construction applied to sign bits): each vector
    gets a P-bit signature from P seeded random hyperplanes; the signature
    splits into P/R bands of R bits; vectors sharing any (band, band_key)
    become candidates, verified by exact float64 cosine >= threshold.

    Scale shape: verification runs per (band, band_key) bucket —
    2^R * n_bands buckets — never corpus-quadratic; recall rises with more
    bands, precision with more rows per band (tune like MinHash-LSH). With
    P=16/R=4, two vectors at cosine 0.9 (~14° apart) collide in a given
    band w.p. (1-14/180)^4 ≈ 0.72, in ≥1 of 4 bands w.p. ≈ 0.994.

    Physical shape (r7, guide §4.2): the within-bucket pair work is a
    grouped NumPy kernel, not a self-join. The r6 plan self-joined the
    band table and evaluated an interpreted aggregate/zip_with cosine
    fold per candidate ROW-PAIR inside the join (O(bucket^2) interpreted
    expressions — 78 s at sf1.0); this version ships (vec_id, band,
    band_key, v) once through ONE exchange and computes each bucket's
    pair-cosine matrix as vectorized float64 ops in row blocks of
    EMB_PAIR_BLOCK (memory O(block * bucket), work identical). All
    arithmetic replays the JVM fold's operation order exactly — dot and
    norm accumulate dimension-by-dimension, then one divide and the
    floor(x*1e6+0.5)/1e6 rounding — so every surviving pair's cosine is
    bit-identical to the r6 plan and the DuckDB oracle (asserted by
    tests/test_oracle_parity.py; r6 hashes unchanged). Cross-band
    duplicate pairs carry identical rows and collapse in the final
    distinct(), exactly as before."""
    import numpy as np
    import pandas as pd
    from pdf_parse_bench_spark.operators.similarity import hyperplanes

    pl = np.array(hyperplanes(n_planes), dtype=np.float64)  # (P, dim)
    n_bands = n_planes // band_rows
    mask = (1 << band_rows) - 1
    w_p = 1 << np.arange(n_planes, dtype=np.int64)

    def explode_bands(batches):
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            # signature: sign of dot(v, plane_p), accumulated dim-by-dim in
            # the same order as the JVM zip_with/aggregate fold so borderline
            # signs match sign_bucket() exactly
            acc = np.zeros((n, pl.shape[0]))
            for d in range(mat.shape[1]):
                acc += mat[:, d][:, None] * pl[:, d][None, :]
            sig = ((acc >= 0).astype(np.int64) * w_p).sum(axis=1)
            yield pd.DataFrame({
                "vec_id": np.tile(pdf["vec_id"].to_numpy(), n_bands),
                "band": np.repeat(np.arange(n_bands, dtype=np.int32), n),
                "band_key": np.concatenate([
                    ((sig >> (b * band_rows)) & mask) for b in range(n_bands)
                ]).astype(np.int32),
                "v": list(mat) * n_bands,
            })

    exploded = emb.select("vec_id", "embedding").mapInPandas(
        explode_bands,
        schema="vec_id long, band int, band_key int, v array<double>")

    def verify(pdf: pd.DataFrame) -> pd.DataFrame:
        order = np.argsort(pdf["vec_id"].to_numpy(), kind="stable")
        ids = pdf["vec_id"].to_numpy()[order]
        mat = np.stack(pdf["v"].to_numpy()[order]).astype(np.float64)
        g, dim = mat.shape
        nrm = np.zeros(g)
        for d in range(dim):
            c = mat[:, d]
            nrm += c * c
        nrm = np.sqrt(nrm)
        out_a, out_b, out_c = [], [], []
        for i0 in range(0, g, EMB_PAIR_BLOCK):
            i1 = min(i0 + EMB_PAIR_BLOCK, g)
            dots = np.zeros((i1 - i0, g))
            for d in range(dim):
                c = mat[:, d]
                dots += c[i0:i1][:, None] * c[None, :]
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = dots / (nrm[i0:i1][:, None] * nrm[None, :])
                cos = np.floor(cos * 1000000.0 + 0.5) / 1000000.0
            ii, jj = np.nonzero(cos >= threshold)
            keep = (ii + i0) < jj  # vec_a < vec_b under the sorted order
            out_a.append(ids[ii[keep] + i0])
            out_b.append(ids[jj[keep]])
            out_c.append(cos[ii[keep], jj[keep]])
        return pd.DataFrame({
            "vec_a": np.concatenate(out_a) if out_a else
            np.array([], dtype=np.int64),
            "vec_b": np.concatenate(out_b) if out_b else
            np.array([], dtype=np.int64),
            "cosine": np.concatenate(out_c) if out_c else
            np.array([], dtype=np.float64),
        })

    pairs = exploded.groupBy("band", "band_key").applyInPandas(
        verify, schema="vec_a long, vec_b long, cosine double")
    return pairs.distinct()


NGRAM_DUP_N = 8        # shingle width (words) — Lee et al. exact-substring dedup
NGRAM_DUP_MAX_DF = 20  # shingles in more docs than this are boilerplate, not dup evidence
NGRAM_DUP_MIN_SHARED = 3


def duplicate_ngram_pairs(docs: DataFrame, n: int = NGRAM_DUP_N,
                          max_df: int = NGRAM_DUP_MAX_DF,
                          min_shared: int = NGRAM_DUP_MIN_SHARED) -> DataFrame:
    """Exact-substring duplicate detection (the Lee et al. "Deduplicating
    Training Data Makes Language Models Better" map-reduce shape): every
    doc emits its distinct word-8-gram shingle hashes; shingles appearing
    in 2..max_df docs (rarer than boilerplate) vote for doc pairs; pairs
    sharing >= min_shared rare shingles are exact-substring duplicates.

    Scale shape: one shuffle on the shingle hash (map-side distinct), a
    document-frequency filter BEFORE the self-join (so ubiquitous
    boilerplate shingles can never explode the pair space), and the
    self-join reuses the shingle exchange. Output is (doc_a, doc_b,
    n_shared) — tiny relative to the corpus."""
    ws = F.filter(F.split(F.trim(F.col("text")), " +"), lambda x: x != "")
    w = docs.select("doc_id", ws.alias("ws")).where(F.size("ws") >= n)
    idx = F.sequence(F.lit(0), F.size("ws") - n)
    shingles = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice("ws", i + 1, n)))
    g = (w.select("doc_id", F.explode(shingles).alias("shingle"))
         .select("doc_id", F.md5("shingle").alias("sh"))
         .distinct())
    rare = (g.groupBy("sh")
            .agg(F.countDistinct("doc_id").alias("df"))
            .where((F.col("df") >= 2) & (F.col("df") <= max_df))
            .select("sh"))
    gr = g.join(rare, "sh")
    pairs = (
        gr.alias("a")
        .join(gr.alias("b"), "sh")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"),
                 F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
    return pairs
