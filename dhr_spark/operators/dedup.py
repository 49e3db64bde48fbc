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

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

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
    """(id, shingle): exploded distinct word n-grams (simple tokenization)."""
    toks = simple_tokens_col(F.col("text"))
    return docs.select(
        F.col(id_col), F.explode(_shingles(n)(toks)).alias("shingle")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_a, id_b, jaccard): doc pairs with n-gram Jaccard >= threshold,
    id_a < id_b, jaccard rounded to 6 for cross-engine hashing."""
    sh = shingle_sets(docs, n, id_col)
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


def minhash_signatures(
    docs: DataFrame, num_hashes: int = 16, shingle_n: int = 3, id_col: str = "doc_id"
) -> DataFrame:
    """(id, sig array<long>): MinHash signature over n-gram shingles.

    Hash family i(x) = int(md5(shingle || '#' || i)[:15], 16) — md5-derived,
    exactly portable across engines (the DuckDB oracle reproduces it with
    strpos/substr digit math). Signature component i = min over the doc's
    distinct shingles; docs with no shingles get all -1.

    Arrow-batched iterator UDF (not Column HOFs: Spark evaluates nested
    higher-order lambdas interpreted per element — measured ~10x slower than
    this batch kernel). ZERO shuffle: signatures are per-doc map work.
    """
    from dhr_spark.functions.analyzer import analyze_simple

    suffixes = [f"#{i}".encode() for i in range(num_hashes)]

    def sig_of(text: str) -> list[int]:
        toks = analyze_simple(text) if isinstance(text, str) else []
        if len(toks) < shingle_n:
            return [-1] * num_hashes
        shingles = {
            " ".join(toks[j : j + shingle_n]).encode()
            for j in range(len(toks) - shingle_n + 1)
        }
        sig = []
        for sfx in suffixes:
            sig.append(
                min(
                    int(hashlib.md5(s + sfx).hexdigest()[:15], 16)
                    for s in shingles
                )
            )
        return sig

    @F.pandas_udf(ArrayType(LongType()))
    def _sig(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            yield s.map(sig_of)

    return docs.select(F.col(id_col), _sig(F.col("text")).alias("sig"))


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
    """
    rows = num_hashes // bands
    b = lsh_bands(minhash_signatures(docs, num_hashes, shingle_n, id_col), bands, rows, id_col)
    l = b.select(F.col(id_col).alias("id_a"), "band", "band_hash")
    r = b.select(F.col(id_col).alias("id_b"), "band", "band_hash")
    return (
        l.join(r, ["band", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_bands"))
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

    Brute pair-join for verification; the scale path blocks on bit-chunks
    (pigeonhole: distance <= d pairs share at least one of d+1 chunks).
    """
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


def dup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 50,
) -> DataFrame:
    """(id, cluster_id): connected components over duplicate pairs —
    cluster_id = smallest member id; docs in no pair are singleton clusters.

    Iterative min-label propagation (the iterative-algorithm pattern Spark
    expresses as a driver loop of joins; each iteration is one shuffle and
    the loop runs O(component diameter) times — near-dup clusters are
    shallow, so 2-4 iterations in practice). At web scale swap the
    convergence count() for an accumulator check, same plan shape.
    """
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
    for _ in range(max_iter):
        prop = (
            edges.join(labels, edges["src"] == labels["node"])
            .groupBy("dst")
            .agg(F.min("label").alias("nl"))
        )
        new_labels = (
            labels.join(prop, labels["node"] == prop["dst"], "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nl"), F.col("label"))
                ).alias("label"),
            )
            .cache()
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
    JVM column math, no UDF. Quadratic: at scale gate behind
    similarity.lsh_buckets (random hyperplane) so the join runs per-bucket.
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
