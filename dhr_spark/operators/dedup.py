"""Deduplication operators — exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

These are the training-data-pipeline siblings of the retrieval engine: the
same tokenize/explode/agg machinery, pointed at duplicate detection. Every
operator is a declarative DataFrame plan (codegen'd column math; the only
shuffles are the groupBys/joins Catalyst already handles), with an exact
ANSI-SQL twin in ``__spark_entry__.oracle_sql``.

Scale shape (100 TB):
  * exact dedup — one hash-groupBy, map-side partial agg; skew-free (md5).
  * ngram-Jaccard — the shingle self-join explodes quadratically inside a
    shingle bucket; ONLY run it downstream of MinHash-LSH candidate pruning
    (``lsh_candidate_pairs``) at scale. Provided standalone for small corpora
    and as the verifier stage.
  * MinHash — signatures are per-doc column math (no shuffle); banding is one
    groupBy on (band, band_hash) whose groups are capped by near-dup cluster
    size, not corpus size.
  * SimHash — one explode + groupBy(doc); 60 conditional sums, all codegen.
  * embedding cosine — quadratic; the scale path is LSH bucketing first
    (see operators.similarity), with the brute pair-join as verifier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dhr_spark.functions.analyzer import simple_tokens_col
from dhr_spark.operators.textstats import tokhash60

SIMHASH_BITS = 60  # tokhash60 provides 60 portable bits


def exact_dup_groups(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(text_hash, n_dups, keep_id): one row per distinct text; keep_id is the
    smallest member id (the canonical survivor), n_dups its group size."""
    return (
        docs.select(F.md5(F.col("text")).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(
            F.count("*").alias("n_dups"),
            F.min(id_col).alias("keep_id"),
        )
    )


def exact_dedup(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Filter to one survivor per distinct text (min id wins)."""
    keep = exact_dup_groups(docs, id_col).select(F.col("keep_id").alias(id_col))
    return docs.join(keep, id_col, "left_semi")


def _shingles(n: int):
    """tokens -> distinct n-gram shingle strings (column function)."""

    def col(tokens):
        k = F.size(tokens) - (n - 1)
        return F.array_distinct(
            F.transform(
                F.slice(tokens, 1, F.greatest(k, F.lit(0))),
                lambda _, i: F.concat_ws(
                    " ", F.slice(tokens, i + 1, n)
                ),
            )
        )

    return col


def shingle_sets(docs: DataFrame, n: int = 3, id_col: str = "doc_id") -> DataFrame:
    """(id, shingle): exploded distinct word n-grams (simple tokenization).

    The token array is projected into a named column BEFORE the shingle
    higher-order function: referencing the regexp-split expression inside the
    transform lambda makes codegen re-evaluate the split per shingle element
    (measured 6x slower at sf0.1)."""
    with_toks = docs.select(
        F.col(id_col), simple_tokens_col(F.col("text")).alias("_toks")
    )
    return with_toks.select(
        F.col(id_col), F.explode(_shingles(n)(F.col("_toks"))).alias("shingle")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_a, id_b, jaccard): doc pairs with n-gram Jaccard >= threshold,
    id_a < id_b, jaccard rounded to 6 for cross-engine hashing.

    Shingles are materialized once (localCheckpoint): three plan references
    (sizes + both join sides) would otherwise re-tokenize the corpus three
    times — measured 3x slower at sf0.1."""
    sh = shingle_sets(docs, n, id_col).localCheckpoint()
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("common"))
    )
    return (
        common.join(sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("common")
                / (F.col("sz_a") + F.col("sz_b") - F.col("common")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


MINHASH_P = (1 << 31) - 1  # Mersenne prime: affine-hash products stay < 2^62


def minhash_constants(num_hashes: int) -> tuple[list[int], list[int]]:
    """Fixed affine-family constants h_i(x) = (A_i*x + B_i) mod p — simple
    deterministic formulas so any engine can regenerate them inline."""
    a = [(i * 2654435761 + 1) % MINHASH_P for i in range(num_hashes)]
    b = [(i * 40503 + 17) % MINHASH_P for i in range(num_hashes)]
    return a, b


def minhash_signatures(
    docs: DataFrame, num_hashes: int = 16, shingle_n: int = 3, id_col: str = "doc_id"
) -> DataFrame:
    """(id, sig array<long>): MinHash signature over n-gram shingles.

    One md5 per shingle (tokhash60), then ``num_hashes`` affine hashes
    h_i(x) = (A_i * (x mod p) + B_i) mod p over the Mersenne prime
    p = 2^31 - 1 — the classic universal family, exactly portable (the DuckDB
    oracle regenerates A_i/B_i inline and reproduces every value).

    Pure Column math end-to-end: shingle explode -> md5 hash -> 16 affine
    min-aggregates, all whole-stage codegen (the prior md5-per-(shingle, i)
    Python UDF was the slowest op in BENCH_r01 — 16x more md5 calls and an
    Arrow round-trip). The groupBy shuffles only map-side partial minima:
    16 longs per (doc, partition). Docs with < shingle_n tokens get the
    all -1 sentinel and MUST NOT be banded (see lsh_candidate_pairs).
    """
    a_c, b_c = minhash_constants(num_hashes)
    sh = shingle_sets(docs, shingle_n, id_col)
    x = F.pmod(tokhash60(F.col("shingle")), F.lit(MINHASH_P))
    hs = sh.select(F.col(id_col), x.alias("x"))
    aggs = [
        F.min(F.pmod(F.col("x") * F.lit(a_c[i]) + F.lit(b_c[i]), F.lit(MINHASH_P)))
        .cast("long")
        .alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sigs = (
        hs.groupBy(id_col)
        .agg(*aggs)
        .select(
            F.col(id_col),
            F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig"),
        )
    )
    sentinel = F.array(*[F.lit(-1).cast("long")] * num_hashes)
    return (
        docs.select(F.col(id_col))
        .join(sigs, id_col, "left")
        .select(F.col(id_col), F.coalesce(F.col("sig"), sentinel).alias("sig"))
    )


def lsh_bands(
    sigs: DataFrame, bands: int = 4, rows: int = 4, id_col: str = "doc_id"
) -> DataFrame:
    """(id, band, band_hash): banded signature for bucket-join candidate
    generation. band_hash = md5 of the comma-joined band slice."""
    band = F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band")
    out = sigs.select(F.col(id_col), F.col("sig"), band)
    slice_ = F.slice(F.col("sig"), F.col("band") * rows + 1, rows)
    return out.select(
        id_col,
        "band",
        F.md5(F.concat_ws(",", F.transform(slice_, lambda x: x.cast("string")))).alias(
            "band_hash"
        ),
    )


def lsh_candidate_pairs(
    docs: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_a, id_b, n_bands): pairs sharing >= 1 LSH band (id_a < id_b).

    The scale-path candidate generator: group size is bounded by true
    near-dup cluster size; the quadratic expansion happens only inside a
    bucket. Feed into ngram_jaccard_pairs on the candidate set to verify.

    Sentinel signatures (docs with < shingle_n tokens, sig all -1) are
    dropped BEFORE banding: they would otherwise all share every band hash,
    forming one quadratic skew bucket of short docs that are not near-dups
    of each other. Short-doc dedup belongs to exact_dedup (full-text hash).
    """
    rows = num_hashes // bands
    sigs = minhash_signatures(docs, num_hashes, shingle_n, id_col).filter(
        F.element_at(F.col("sig"), 1) >= 0
    )
    # materialized once: both self-join sides reference the signature plan
    b = lsh_bands(sigs, bands, rows, id_col).localCheckpoint()
    l = b.select(F.col(id_col).alias("id_a"), "band", "band_hash")
    r = b.select(F.col(id_col).alias("id_b"), "band", "band_hash")
    return (
        l.join(r, ["band", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_bands"))
    )


def lsh_verified_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_a, id_b, jaccard): the canonical web-scale text-dedup pipeline as
    one operator — MinHash-LSH candidate generation, then exact n-gram
    Jaccard computed ONLY for candidate pairs.

    Either stage alone is wrong at 100 TB: ngram_jaccard_pairs explodes
    quadratically inside hot shingle buckets; lsh_candidate_pairs emits band
    collisions that are not actually similar. Composed, the shingle join is
    gated by the (small) candidate list — broadcastable when near-dup
    density is low — and every emitted jaccard is exact. Pairs the LSH
    misses are the documented recall tradeoff: P[miss] = (1 - j^rows)^bands.
    """
    cands = lsh_candidate_pairs(docs, num_hashes, bands, shingle_n, id_col)
    # materialized once: referenced by sizes and both join sides
    sh = shingle_sets(docs, shingle_n, id_col).localCheckpoint()
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    common = (
        cands.select("id_a", "id_b")
        .join(a, "id_a")
        .join(b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("common"))
    )
    return (
        common.join(
            sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a")),
            "id_a",
        )
        .join(
            sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b")),
            "id_b",
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("common")
                / (F.col("sz_a") + F.col("sz_b") - F.col("common")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, simhash): 60-bit SimHash, tf-weighted.

    bit b of the output = 1 iff sum over terms of tf * (2*bit_b(tokhash60) - 1)
    is > 0 (ties -> 0). One explode + one groupBy; the 60 conditional sums are
    all whole-stage codegen.
    """
    toks = simple_tokens_col(F.col("text"))
    tf = (
        docs.select(F.col(id_col), F.explode(toks).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
        .withColumn("h", tokhash60(F.col("term")))
    )
    bit_sums = [
        F.sum(
            F.col("tf")
            * (F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) * 2 - 1)
        ).alias(f"s{b}")
        for b in range(SIMHASH_BITS)
    ]
    agg = tf.groupBy(id_col).agg(*bit_sums)
    out = F.lit(0).cast("long")
    for b in range(SIMHASH_BITS):
        out = out + F.when(F.col(f"s{b}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        ) * F.lit(1 << b).cast("long")
    return agg.select(F.col(id_col), out.alias("simhash"))


def hamming64(a, b):
    """Hamming distance between two int64 bit-sets as a Column."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_dup_pairs(
    docs: DataFrame, max_hamming: int = 3, id_col: str = "doc_id"
) -> DataFrame:
    """(id_a, id_b, hamming): near-dup pairs by SimHash distance.

    Brute pair-join — ORACLE/VERIFIER ONLY (quadratic). The scale path is
    simhash_blocked_pairs, which produces the identical output via
    pigeonhole blocking."""
    s = simhash(docs, id_col)
    a = s.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("ha"))
    b = s.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("hb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", hamming64(F.col("ha"), F.col("hb")).cast("long"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def simhash_blocked_pairs(
    docs: DataFrame, max_hamming: int = 3, id_col: str = "doc_id"
) -> DataFrame:
    """(id_a, id_b, hamming): SimHash near-dup pairs via pigeonhole blocking —
    EXACTLY equal to simhash_dup_pairs, without the cross join.

    Split the 60-bit hash into (max_hamming + 1) chunks: two hashes within
    Hamming distance d differ in <= d bit positions, so at least one of the
    d+1 chunks is untouched and IDENTICAL in both (pigeonhole). Candidate
    generation is therefore an equi-join on (chunk_idx, chunk_value); the
    exact hamming filter then removes false candidates. No recall loss —
    this is a lossless decomposition, not an approximation.

    Scale shape: |docs| * (d+1) rows into one equi-join whose bucket sizes
    are bounded by docs sharing a 15-bit chunk value (corpus/2^15 expected,
    plus true near-dup clusters) — at 10^9 docs this is the standard
    blocked-SimHash layout (Manku et al., WWW'07 — public algorithm).
    """
    n_chunks = max_hamming + 1
    chunk_bits = (SIMHASH_BITS + n_chunks - 1) // n_chunks
    mask = (1 << chunk_bits) - 1
    # materialize the hashes once (eager): the pair self-join references the
    # simhash aggregation on both sides, and Spark does not reuse that
    # exchange across the join — lazily it computes the 60-bit hash TWICE
    # (measured 2.4x slower at sf0.1). At deployment scale the simhash table
    # is a persisted column anyway; checkpoint() to cluster storage there.
    s = simhash(docs, id_col).localCheckpoint()
    chunk_arr = F.array(
        *[
            F.struct(
                F.lit(i).alias("ci"),
                F.shiftright(F.col("simhash"), i * chunk_bits)
                .bitwiseAND(F.lit(mask))
                .alias("cv"),
            )
            for i in range(n_chunks)
        ]
    )
    e = s.select(
        F.col(id_col), F.col("simhash"), F.explode(chunk_arr).alias("c")
    ).select(id_col, "simhash", F.col("c.ci").alias("ci"), F.col("c.cv").alias("cv"))
    a = e.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("ha"), "ci", "cv"
    )
    b = e.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("hb"), "ci", "cv"
    )
    return (
        a.join(b, ["ci", "cv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")  # a pair can collide in several chunks
        .agg(F.first("ha").alias("ha"), F.first("hb").alias("hb"))
        .withColumn("hamming", hamming64(F.col("ha"), F.col("hb")).cast("long"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def dup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 50,
    stats: dict | None = None,
) -> DataFrame:
    """(id, cluster_id): connected components over duplicate pairs —
    cluster_id = smallest member id; docs in no pair are singleton clusters.

    Min-label propagation accelerated with POINTER JUMPING: each round first
    takes the min label over graph neighbors (one shuffle), then replaces
    every label with its label's label (label(u) always names a node in the
    same component, so the jump preserves correctness while halving chain
    depth — path doubling). Convergence is O(log diameter) rounds instead of
    O(diameter), which is what survives a pathological near-dup CHAIN
    (a->b->c->...) at web scale; shallow clusters still converge in 2-3
    rounds. This is the shuffle-count behavior of the large-star/small-star
    algorithm with a simpler per-round plan (two joins + one agg). At web
    scale swap the convergence count() for an accumulator check, same shape.
    """
    # ``stats``, when given, records {"rounds": n} — lets tests assert the
    # O(log diameter) convergence bound on adversarial chain components.
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
        )
        .distinct()
        .cache()
    )
    labels = docs.select(
        F.col(id_col).alias("node"), F.col(id_col).alias("label")
    ).cache()
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        prop = (
            edges.join(labels, edges["src"] == labels["node"])
            .groupBy("dst")
            .agg(F.min("label").alias("nl"))
        )
        stepped = labels.join(prop, labels["node"] == prop["dst"], "left").select(
            "node",
            F.least(
                F.col("label"), F.coalesce(F.col("nl"), F.col("label"))
            ).alias("label"),
        )
        # pointer jump: label <- label(label). Invariant: label(u) is the id
        # of a node in u's component, so jumping stays inside the component
        # and is monotone non-increasing (labels only shrink toward the min).
        lookup = stepped.select(
            F.col("node").alias("l_node"), F.col("label").alias("l_label")
        )
        # localCheckpoint (not cache): the jump references `stepped` twice,
        # which doubles the LOGICAL plan every round — lineage must be
        # truncated or plan compilation itself blows up after ~10 rounds.
        # On a cluster use checkpoint() to reliable storage instead.
        new_labels = (
            stepped.join(lookup, stepped["label"] == lookup["l_node"], "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("l_label"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    if stats is not None:
        stats["rounds"] = rounds
    edges.unpersist()
    return labels.select(F.col("node").alias(id_col), F.col("label").alias("cluster_id"))


def embedding_dup_pairs(
    embs: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_a, id_b, cosine): embedding near-dup pairs, cosine >= threshold.

    Normalizes once, then a pair-join with a zip_with/aggregate dot product —
    JVM column math, no UDF. Quadratic — ORACLE/VERIFIER ONLY; the scale
    path is embedding_dup_pairs_lsh (bucketed join).
    """
    norm = F.sqrt(
        F.aggregate(
            F.col(vec_col),
            F.lit(0.0),
            lambda a, x: a + x.cast("double") * x.cast("double"),
        )
    )
    unit = embs.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double") / norm).alias("u"),
    )
    a = unit.select(F.col(id_col).alias("id_a"), F.col("u").alias("ua"))
    b = unit.select(F.col(id_col).alias("id_b"), F.col("u").alias("ub"))
    dot = F.aggregate(
        F.zip_with(F.col("ua"), F.col("ub"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.round(dot, 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def embedding_dup_pairs_lsh(
    embs: DataFrame,
    threshold: float = 0.9,
    dim: int = 64,
    n_tables: int = 8,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_a, id_b, cosine): embedding near-dup pairs, LSH-gated — the scale
    path for embedding_dup_pairs.

    The corpus is bucketed once with the portable Rademacher hyperplanes
    (operators.similarity.lsh_buckets_udf); the pair join runs per (table,
    bucket), so work is bounded by bucket occupancy instead of |corpus|^2.
    Exact cosine is computed inside each collision, so precision is exact;
    recall is the LSH collision probability (1 - (1 - (1-θ/π)^n_planes)^
    n_tables — ≈1.0 for true near-dups at θ→0, pytest-bounded). The
    deterministic planes make this reproducible in the DuckDB oracle, which
    replicates the gating exactly rather than comparing against brute force.
    """
    import numpy as np
    import pandas as pd

    from dhr_spark.operators.similarity import lsh_buckets_udf

    buckets = lsh_buckets_udf(dim, n_tables, n_planes, probe=False)
    e = embs.select(
        F.col(id_col),
        F.col(vec_col).alias("v"),
        F.explode(buckets(F.col(vec_col))).alias("bucket"),
    )

    # per-bucket pair scoring as ONE numpy matmul (U @ U.T) instead of a
    # per-pair zip_with/aggregate fold — the fold is interpreted per element
    # (measured ~10s vs <1s at sf0.1 for the same join). The bucket is the
    # natural kernel batch: all-pairs WITHIN a bucket is exactly the work
    # LSH admits, and the threshold filter runs before anything leaves the
    # kernel, so shuffle-out is only true near-dup pairs.
    def _pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, ignore_index=True)
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cosine": "float64"}
            )
        u = np.stack(pdf["v"].to_numpy()).astype(np.float64)
        u /= np.linalg.norm(u, axis=1, keepdims=True)
        cos = np.round(u @ u.T, 6)
        ia, ib = np.triu_indices(n, 1)
        keep = cos[ia, ib] >= threshold
        ids = pdf[id_col].to_numpy()
        return pd.DataFrame(
            {
                "id_a": ids[ia[keep]],
                "id_b": ids[ib[keep]],
                "cosine": cos[ia[keep], ib[keep]],
            }
        )

    return (
        e.groupBy("bucket")
        .applyInPandas(_pairs, "id_a long, id_b long, cosine double")
        .groupBy("id_a", "id_b")  # a pair can collide in several tables
        .agg(F.first("cosine").alias("cosine"))
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 13,
    min_hits: int = 1,
    id_col: str = "doc_id",
    broadcast_bench: bool = True,
) -> DataFrame:
    """(id, n_hits, contaminated): benchmark decontamination — flag training
    documents sharing >= ``min_hits`` distinct word n-grams with ANY row of
    a benchmark/eval set (both sides (doc_id, text); simple tokenization —
    rename the benchmark id to doc_id before calling). The
    standard pretraining-hygiene op (n=13 is the usual contamination
    n-gram); run before training, drop contaminated=true.

    Plan shape: the benchmark shingle set is tiny next to the corpus —
    distinct + broadcast, so the corpus-side shingle stream semi-joins
    map-side with NO shuffle of corpus data; the per-doc hit count is the
    only aggregation. ``broadcast_bench=False`` for benchmark sets beyond
    broadcast range (shuffle hash join on the shingle key, still linear).
    Docs shorter than n tokens have no shingles -> n_hits 0, never flagged.
    """
    doc_sh = shingle_sets(docs, n, id_col)
    bench_sh = shingle_sets(bench, n, "doc_id").select("shingle").distinct()
    if broadcast_bench:
        bench_sh = F.broadcast(bench_sh)
    hits = (
        doc_sh.join(bench_sh, "shingle")
        .groupBy(id_col)
        .agg(F.count_distinct("shingle").alias("n_hits"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) >= min_hits).alias("contaminated"),
        )
    )


def decontaminate_bloom(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 13,
    min_hits: int = 1,
    m_bits: int = 65536,
    k: int = 4,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_hits, contaminated): Bloom-filter decontamination — the
    constant-memory variant of ``decontaminate`` for benchmark suites whose
    shingle SET outgrows broadcast range. The filter is m_bits/32 packed
    words no matter how many benchmark shingles exist (operators/
    sketches.py), shipped to every task as ONE map row, so the corpus
    shingle stream is probed map-side with zero extra shuffles: the only
    aggregation is the same per-doc groupBy the exact op has.

    Bloom guarantees no false negatives: ``n_hits`` >= the exact op's and
    ``contaminated`` is a superset — the right direction for hygiene
    (over-drop, never under-drop). Size ``m_bits`` ~ 16x the benchmark
    shingle count for ~2% false-positive rate at k=4."""
    from dhr_spark.operators.sketches import _bloom_probes, bloom_bits

    bench_sh = shingle_sets(bench, n, "doc_id").select("shingle").distinct()
    bloom_map = bloom_bits(bench_sh, "shingle", m_bits, k).agg(
        F.map_from_entries(
            F.collect_list(F.struct("word", "bits"))
        ).alias("_bloom")
    )
    doc_sh = shingle_sets(docs, n, id_col)
    member = F.forall(
        _bloom_probes(F.col("shingle"), k, m_bits),
        lambda p: (
            F.coalesce(
                F.element_at(F.col("_bloom"), p["word"]), F.lit(0).cast("long")
            ).bitwiseAND(p["mask"])
            != 0
        ),
    )
    hits = (
        doc_sh.crossJoin(F.broadcast(bloom_map))
        .select(id_col, member.alias("_m"))
        .groupBy(id_col)
        .agg(F.sum(F.col("_m").cast("long")).alias("n_hits"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) >= min_hits).alias("contaminated"),
        )
    )


def duplicate_ngram_fraction(
    docs: DataFrame, n: int = 8, id_col: str = "doc_id"
) -> DataFrame:
    """(id, n_shingles, n_dup, dup_fraction): per-document duplicated
    n-gram fraction — the share of a doc's distinct word n-grams that also
    appear in at least one OTHER document. This is the standard corpus-level
    duplication signal LLM curation pipelines threshold on (Dolma / Gopher
    "fraction of duplicate n-grams"; RefinedWeb cuts at dup_fraction > 0.x)
    — unlike pairwise dedup it needs no candidate pairs at all, so it is the
    cheapest corpus-wide near-dup triage pass. The reference has no corpus
    analytics of this kind (its corpus ops are per-doc encoders,
    /root/reference/densify/corpus_vectorizer.py); this extends the
    documents-table curation family.

    Plan shape (single shuffle): explode distinct shingles -> ONE exchange
    on the shingle key, where a partition-local window counts distinct docs
    per shingle -> re-aggregate by doc. No self-join, no pair blow-up; the
    widest intermediate is the (doc, shingle) relation itself, linear in
    corpus token count. Shingle-key skew (boilerplate n-grams shared by
    millions of docs) stays harmless because the window only COUNTS rows
    per key. Docs with fewer than ``n`` tokens have no shingles:
    n_shingles 0, dup_fraction 0.0.

    Determinism: dup_fraction is one exactly-rounded IEEE division of two
    exact integers — bit-identical in Spark and the DuckDB oracle with no
    round() midpoint hazard.
    """
    from pyspark.sql import Window

    sh = shingle_sets(docs, n, id_col)
    n_docs = F.count("*").over(Window.partitionBy("shingle"))
    per_doc = (
        sh.withColumn("_nd", n_docs)
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_shingles"),
            F.sum((F.col("_nd") >= 2).cast("long")).alias("n_dup"),
        )
    )
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_shingles", F.lit(0)).cast("long").alias("n_shingles"),
            F.coalesce("n_dup", F.lit(0)).cast("long").alias("n_dup"),
            F.when(
                F.coalesce("n_shingles", F.lit(0)) > 0,
                F.col("n_dup").cast("double") / F.col("n_shingles"),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_fraction"),
        )
    )


def paragraph_dedup(
    docs: DataFrame, id_col: str = "doc_id", sep: str = "\n"
) -> DataFrame:
    """(id, n_pars, n_kept, text_clean): Dolma-style paragraph-level exact
    deduplication — each document is split into paragraphs on ``sep``, and
    only the FIRST occurrence corpus-wide of each distinct paragraph
    survives (first = smallest (id, paragraph index); every later
    occurrence is dropped, including repeats inside the same document).
    Surviving paragraphs are reassembled in original order; a document
    whose every paragraph was seen earlier emits text_clean = ''. This is
    the paragraph arm of Dolma's exact dedup (Soldaini et al. 2024 §4.1;
    CCNet and RefinedWeb run the same line/paragraph hash pass) — finer
    than document ``exact_dedup`` (boilerplate paragraphs inside otherwise
    unique docs) and far cheaper than MinHash, so curation pipelines run
    it first. The reference has no corpus curation ops (its corpus pass is
    a per-doc encoder, /root/reference/densify/corpus_vectorizer.py); this
    extends the documents-table curation family.

    Plan shape (two shuffles, both key-combinable): posexplode paragraphs
    -> groupBy(md5(paragraph)) keeping min(struct(id, idx)) — map-side
    partial agg makes boilerplate-paragraph skew harmless — -> equi-join
    the one-row-per-hash keeper table back (AQE handles hot hashes) ->
    groupBy(id) reassembly. The widest intermediate is the (id, paragraph)
    relation itself, linear in corpus bytes; no pairs, no windows over
    corpus-sized partitions."""
    pars = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col("text"), sep)).alias("par_idx", "par"),
    ).withColumn("par_hash", F.md5(F.col("par")))
    first = pars.groupBy("par_hash").agg(
        F.min(F.struct(F.col(id_col).alias("i"), F.col("par_idx").alias("x")))
        .alias("_first")
    )
    kept = (
        pars.join(first, "par_hash")
        .filter(
            (F.col(id_col) == F.col("_first.i"))
            & (F.col("par_idx") == F.col("_first.x"))
        )
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_kept"),
            F.concat_ws(
                sep,
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("par_idx", "par"))
                    ),
                    lambda s: s["par"],
                ),
            ).alias("text_clean"),
        )
    )
    totals = docs.select(
        F.col(id_col),
        F.size(F.split(F.col("text"), sep)).cast("long").alias("n_pars"),
    )
    return totals.join(kept, id_col, "left").select(
        id_col,
        "n_pars",
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
        F.coalesce(F.col("text_clean"), F.lit("")).alias("text_clean"),
    )


def duplicate_spans(
    docs: DataFrame,
    n: int = 8,
    min_len: int | None = None,
    id_col: str = "doc_id",
    within_doc: bool = True,
) -> DataFrame:
    """(id, span_start, span_end, span_len): maximal duplicated token spans —
    the exact-substring deduplication signal of Lee et al. 2022
    ("Deduplicating Training Data Makes Language Models Better"), whose
    suffix-array pass marks every substring of >= K tokens that occurs twice
    anywhere in the corpus. The scalable Spark re-expression: a substring of
    length >= n repeats iff ALL of its length-n windows repeat, so the union
    of duplicated n-gram windows is exactly the token mass a suffix array
    would mark (conservative only at spans shorter than n, which the
    ``min_len`` floor excludes anyway). Spans are half-open token-index
    intervals [span_start, span_end) over the simple-tokenization stream.

    ``within_doc=True`` counts total corpus occurrences (the suffix-array
    semantics: a phrase repeated twice inside ONE doc is duplicated);
    ``False`` counts distinct docs only (the Dolma/RefinedWeb inter-document
    form, matching duplicate_ngram_fraction).

    Plan shape: positional shingle explode -> ONE exchange on the shingle
    key where a count-only window tags repeated shingles (skew-proof:
    boilerplate shingles only COUNT, same argument as
    duplicate_ngram_fraction) -> per-doc gaps-and-islands merge (window by
    id; bounded by max doc length). Equal-width intervals sorted by start
    merge iff gap <= n, so one lag() comparison builds the islands — no
    interval algebra, no self-join.

    The reference has no corpus curation surface (its pipeline starts from
    an already-cleaned collection, tokenize_corpus.py:31-36); this extends
    the training-data family alongside duplicate_ngram_fraction and
    paragraph_dedup.
    """
    from pyspark.sql import Window

    if min_len is None:
        min_len = n
    if n < 1 or min_len < n:
        raise ValueError(f"need n >= 1 and min_len >= n, got n={n} min_len={min_len}")

    with_toks = docs.select(
        F.col(id_col), simple_tokens_col(F.col("text")).alias("_toks")
    )
    k = F.size(F.col("_toks")) - (n - 1)
    # positional (non-distinct) shingles: pos is the 0-based token index of
    # the window start
    sh = with_toks.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.slice(F.col("_toks"), 1, F.greatest(k, F.lit(0))),
                lambda _, i: F.concat_ws(" ", F.slice(F.col("_toks"), i + 1, n)),
            )
        ).alias("pos", "shingle"),
    )
    if within_doc:
        tagged = sh.withColumn(
            "_c", F.count("*").over(Window.partitionBy("shingle"))
        )
    else:
        # distinct-doc count without a DISTINCT window agg (unsupported) or
        # a collect_set window (materializes the doc set per row — skew
        # hazard on boilerplate shingles): mark each (shingle, doc)'s first
        # occurrence, then SUM the markers per shingle — count-only state
        w_sd = Window.partitionBy("shingle", id_col).orderBy("pos")
        tagged = sh.withColumn(
            "_f", (F.row_number().over(w_sd) == 1).cast("long")
        ).withColumn("_c", F.sum("_f").over(Window.partitionBy("shingle")))
    dup = tagged.filter(F.col("_c") >= 2).select(id_col, "pos")
    w = Window.partitionBy(id_col).orderBy("pos")
    brk = (
        F.when(F.lag("pos").over(w).isNull(), F.lit(1))
        .when(F.col("pos") - F.lag("pos").over(w) > n, F.lit(1))
        .otherwise(F.lit(0))
    )
    islands = dup.withColumn(
        "_island", F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        islands.groupBy(id_col, "_island")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + n).cast("long").alias("span_end"),
        )
        .withColumn(
            "span_len", (F.col("span_end") - F.col("span_start")).cast("long")
        )
        .filter(F.col("span_len") >= min_len)
        .select(id_col, "span_start", "span_end", "span_len")
    )


def strip_duplicate_spans(
    docs: DataFrame,
    n: int = 8,
    min_len: int | None = None,
    id_col: str = "doc_id",
    within_doc: bool = True,
) -> DataFrame:
    """(id, n_tokens, n_dup_tokens, text_clean): Lee et al.'s REMOVAL step —
    every token covered by a duplicate_spans interval is dropped and the
    survivors rejoin with single spaces (token-stream reconstruction: the
    simple tokenizer already collapsed case/punctuation, exactly like
    dropping byte ranges from a normalized training stream).

    Zero additional shuffles beyond duplicate_spans' two: spans fold back
    per doc (groupBy id — same key as the island merge), broadcast-join the
    corpus, and a filter-with-index higher-order function keeps uncovered
    tokens. Docs with no spans pass through intact (n_dup_tokens 0).
    Spans are disjoint by construction, so n_dup_tokens = Σ span_len."""
    spans = duplicate_spans(docs, n, min_len, id_col, within_doc)
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans"),
        F.sum("span_len").cast("long").alias("n_dup_tokens"),
    )
    with_toks = docs.select(
        F.col(id_col), simple_tokens_col(F.col("text")).alias("_toks")
    )
    covered = lambda i: F.exists(  # noqa: E731
        F.col("_spans"),
        lambda s: (F.lit(i) >= s["span_start"]) & (F.lit(i) < s["span_end"]),
    )
    joined = with_toks.join(per_doc, id_col, "left")
    # sequence(0, -1) on an empty token array would yield [0, -1] (inferred
    # negative step) — guard the index stream explicitly
    idxs = F.when(F.size("_toks") > 0, F.sequence(F.lit(0), F.size("_toks") - 1)).otherwise(
        F.array().cast("array<int>")
    )
    kept = F.filter(
        F.zip_with(
            F.col("_toks"),
            idxs,
            lambda t, i: F.struct(t.alias("t"), i.alias("i")),
        ),
        lambda s: ~F.exists(
            F.coalesce(
                F.col("_spans"),
                F.array().cast("array<struct<span_start:long,span_end:long>>"),
            ),
            lambda sp: (s["i"] >= sp["span_start"]) & (s["i"] < sp["span_end"]),
        ),
    )
    return joined.select(
        F.col(id_col),
        F.size("_toks").cast("long").alias("n_tokens"),
        F.coalesce("n_dup_tokens", F.lit(0)).cast("long").alias("n_dup_tokens"),
        F.concat_ws(" ", F.transform(kept, lambda s: s["t"])).alias("text_clean"),
    )


def semdedup_pairs(
    embs: DataFrame,
    threshold: float = 0.9,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_a, id_b, cid, cosine): SemDeDup (Abbas et al. 2023) — semantic
    near-duplicate pairs found by k-means-clustering the embedding space
    and comparing ONLY within each cluster. The cluster gate is the scale
    story: pair work is sum over clusters of |cluster|^2 instead of
    |corpus|^2, and (unlike LSH banding) the partition is also the unit a
    curation loop inspects — 'this cluster of the corpus is 40% duplicate'.

    Reuses the deterministic spherical k-means of operators.ivf (seeds =
    k smallest ids, every step rounded to 6 decimals), so the DuckDB
    oracle replays the whole chain bit-for-bit, exactly as ann_ivf does.
    Exact cosine runs inside each cluster — precision is exact; recall is
    bounded by near-dup pairs split across cluster boundaries (SemDeDup's
    own published trade-off; the LSH path, embedding_dup_pairs_lsh, is the
    recall-tunable alternative).

    Scale shape: centroid training is bounded-sample driver numpy
    (ivf_centroids), assignment is one Arrow-batched matmul per batch with
    no shuffle, and the only shuffle is the groupBy(cid) — k-bounded. The
    per-cluster kernel is the same numpy U @ U.T as the LSH bucket kernel;
    at 100 TB, cap cluster size by raising k (faiss practice: k ~ sqrt(n))
    so each kernel batch stays executor-memory-sized.
    """
    import numpy as np
    import pandas as pd

    from dhr_spark.operators.ivf import ivf_assign, ivf_centroids

    cent = ivf_centroids(embs, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
    assign = ivf_assign(embs, cent, id_col=id_col, vec_col=vec_col)
    e = (
        embs.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))
        .join(assign, "vec_id")
    )

    def _pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"id_a": [], "id_b": [], "cid": [], "cosine": []}
        ).astype(
            {"id_a": "int64", "id_b": "int64", "cid": "int64", "cosine": "float64"}
        )
        pdf = pdf.sort_values("vec_id", ignore_index=True)
        n = len(pdf)
        if n < 2:
            return empty
        u = np.stack(pdf["v"].to_numpy()).astype(np.float64)
        u /= np.linalg.norm(u, axis=1, keepdims=True)
        cos = np.round(u @ u.T, 6)
        ia, ib = np.triu_indices(n, 1)
        keep = cos[ia, ib] >= threshold
        ids = pdf["vec_id"].to_numpy()
        return pd.DataFrame(
            {
                "id_a": ids[ia[keep]],
                "id_b": ids[ib[keep]],
                "cid": np.full(int(keep.sum()), int(pdf["cid"].iloc[0])),
                "cosine": cos[ia[keep], ib[keep]],
            }
        )

    return e.groupBy("cid").applyInPandas(
        _pairs, "id_a long, id_b long, cid long, cosine double"
    )


def semdedup_keep(
    embs: DataFrame,
    threshold: float = 0.9,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, keep): SemDeDup survivor flags — within every near-dup pair
    the smaller id survives (the same min-id rule every dedup family member
    uses), so keep = 'no kept smaller neighbor dominates me'. One boolean
    per row; filter keep and train on what remains.

    Transitive note: min-id-per-PAIR (a dominated doc drops even when its
    dominator also drops) — deliberately the aggressive variant; compose
    with dup_clusters for one-survivor-per-component semantics."""
    drops = (
        semdedup_pairs(embs, threshold, k, iters, id_col, vec_col)
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
        .withColumn("_drop", F.lit(True))
    )
    return (
        embs.select(F.col(id_col).alias("vec_id"))
        .join(drops, "vec_id", "left")
        .select("vec_id", F.coalesce(~F.col("_drop"), F.lit(True)).alias("keep"))
    )
