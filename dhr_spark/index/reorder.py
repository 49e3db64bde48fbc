"""Similarity-clustered docid reordering — smaller delta-gap postings.

Corpus-order docids interleave topics, so a term's posting list carries
large docid gaps and the varint coder (index/codec.py) spends 2-3 bytes
per gap. Reassigning docids so that LEXICALLY SIMILAR documents sit on
adjacent ids shrinks the gaps of exactly the terms those documents share
— the same reason Lucene ships BPIndexReorderer (graph-bisection docid
reassignment) and PISA reorders by MinHash/URL clustering. Bisection is
an inherently sequential refinement loop; the Spark-shaped equivalent is
the MinHash ORDERING: sort documents by their minimum-shingle-hash pair

    ckey = (minhash_0(d) << 31) | minhash_1(d)

Two documents share their first minhash with probability equal to their
shingle Jaccard similarity (the MinHash property), so sorting by the key
places near-duplicate and same-topic documents contiguously — exactly
the high-payoff case for gap compression. The 10^12-doc shape: the key
is pure per-row column math over the token array (array_min over the
affine hash family of dedup.minhash_signatures — NO explode, NO shuffle,
whole-stage codegen), and the sort rides the docid assignment's existing
repartitionByRange, which the build pays anyway.

Everything downstream is unchanged: doc_map materializes the
(docid <-> conv_id, turn_idx) mapping, so queries return identical
results under any permutation (pinned by test_reorder.py identity test);
appends keep the per-chunk sort invariant like every index_sort build
(index/incremental.py). Measured effect on a 200-topic synthetic corpus:
see tests/test_reorder.py (clustered bytes strictly below corpus-order
bytes); the manifest's per-chunk ``bytes`` metrics expose the win.

Reference anchor: the reference inherits Lucene's index layout through
Anserini (densify/output_vector.py:24-31); docid reordering is the
layout lever that engine exposes via IndexWriterConfig + BPReorderer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dhr_spark.functions.analyzer import simple_tokens_col
from dhr_spark.operators.dedup import (
    MINHASH_P,
    _shingles,
    minhash_constants,
)
from dhr_spark.operators.textstats import tokhash60

CKEY_SENTINEL = -1  # < shingle_n tokens: no shingles -> cluster together


def with_cluster_key(
    transcripts: DataFrame, shingle_n: int = 3, col: str = "ckey"
) -> DataFrame:
    """transcripts + ``col``: int64 clustering key of each turn's text —
    the first two MinHash values of its shingle set, packed
    ((h0 << 31) | h1; both < 2^31) — ready for
    ``build_index(..., index_sort=(col, True))``.

    Pure column math: tokenize, shingle (array ops), md5-hash, two
    affine-min folds — no explode, no aggregation, no UDF. Texts too
    short to shingle get CKEY_SENTINEL (they sort together, which is
    itself gap-friendly). Every intermediate is a NAMED projection:
    referencing the tokenizer/shingle expression inside a transform
    lambda makes codegen re-evaluate it per array element (the dedup.py
    shingle trap — measured 10x slower build before these projections)."""
    a_c, b_c = minhash_constants(2)
    packed = F.array_min(F.col("_h0")).cast("long") * F.lit(
        1 << 31
    ).cast("long") + F.array_min(F.col("_h1")).cast("long")
    return (
        transcripts.withColumn("_toks", simple_tokens_col(F.col("text")))
        .withColumn("_sh", _shingles(shingle_n)(F.col("_toks")))
        .withColumn(
            "_xs",
            F.transform(
                F.col("_sh"), lambda s: F.pmod(tokhash60(s), F.lit(MINHASH_P))
            ),
        )
        .withColumn(
            "_h0",
            F.transform(
                F.col("_xs"),
                lambda x: F.pmod(
                    x * F.lit(a_c[0]) + F.lit(b_c[0]), F.lit(MINHASH_P)
                ),
            ),
        )
        .withColumn(
            "_h1",
            F.transform(
                F.col("_xs"),
                lambda x: F.pmod(
                    x * F.lit(a_c[1]) + F.lit(b_c[1]), F.lit(MINHASH_P)
                ),
            ),
        )
        .withColumn(
            col, F.coalesce(packed, F.lit(CKEY_SENTINEL).cast("long"))
        )
        .drop("_toks", "_sh", "_xs", "_h0", "_h1")
    )


def build_clustered_index(
    spark: SparkSession,
    transcripts: DataFrame,
    index_dir: str,
    shingle_n: int = 3,
    **build_kw,
) -> dict:
    """build_index with MinHash-clustered docid assignment: similar turns
    get adjacent docids, shrinking posting-list delta gaps (the manifest's
    per-chunk ``bytes`` metrics show the reduction). All other build
    options pass through; the clustering key rides the existing
    ``index_sort`` machinery (doc_map docvalue, per-chunk sort invariant
    across appends, compaction preservation)."""
    from dhr_spark.index.builder import build_index

    if "index_sort" in build_kw:
        raise ValueError(
            "build_clustered_index assigns index_sort=('ckey', True); "
            "pass a plain build_index call for a custom sort"
        )
    # the clustered marker rides the build's SINGLE atomic manifest commit
    # (a second commit would open a crash window where the index is sorted
    # by ckey but appends can no longer re-derive the key). It makes the
    # layout self-describing: the sort key is the CANONICAL text-derived
    # cluster key, so append_to_index (and streaming refresh_index, whose
    # staged batches never carry derived columns) re-derives it with the
    # committed shingle geometry instead of demanding the column.
    return build_index(
        spark,
        with_cluster_key(transcripts, shingle_n),
        index_dir,
        index_sort=("ckey", True),
        extra_manifest={"clustered": {"shingle_n": int(shingle_n)}},
        **build_kw,
    )
