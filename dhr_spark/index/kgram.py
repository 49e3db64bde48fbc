"""k-gram term index — multi-term query acceleration at dictionary scale.

Lucene resolves WildcardQuery/FuzzyQuery/PrefixQuery by intersecting an
automaton with its FST term dictionary; Elasticsearch's ``wildcard`` field
type takes the coarser, shardable route: an n-gram index over the terms
pre-filters candidates, then the original pattern verifies them. This
module is the ES design on the index layout here, because the FST walk is
inherently a sequential in-memory structure while a gram posting table is
exactly the shape Spark scans well:

* ``build_kgram_index`` explodes every dictionary term into
  boundary-marked character k-grams (``^term$`` windows — Manning, IR
  §3.2.2) and writes ``(gram, term_id)`` parquet under
  ``<index>/kgram_dict``, repartitioned BY GRAM and sorted within
  partitions, so a query's handful of required grams prunes parquet row
  groups via min/max stats instead of scanning |V| rows;
* the manifest records ``kgram: {k, max_term_id, batches}``.
  ``max_term_id`` is a WATERMARK: term ids are append-only across index
  appends and physical merges (dst ids are authoritative, new terms get
  higher ids), so a stale gram table stays EXACT — the Searcher unions
  kgram candidates with a plain dictionary scan of ``term_id >
  watermark`` and re-running build_kgram_index folds only the new terms
  into a fresh gram batch (O(new terms), dynamic-partition idempotent);
* query side (``wildcard_grams`` / ``prefix_grams`` / ``fuzzy_grams``)
  turns a pattern into (required_grams, min_match_count):
  - wildcard/prefix: grams of the literal segments (boundary-marked at
    the anchored ends) must ALL be present;
  - fuzzy: a term within ``e`` edits of the body shares at least
    ``distinct_grams(body) − k·e`` DISTINCT grams with it (each edit can
    remove every occurrence of at most k gram types), so the count
    threshold is that bound clamped to >= 1 — when the bound is < 1 the
    filter is vacuous and the caller falls back to the dictionary scan.
  Both shapes are NECESSARY conditions only; the caller always verifies
  candidates with the original pattern, so results are bit-identical to
  the full dictionary scan — the gram table only changes WHAT IS READ.

Scale shape: a wildcard clause over a 2B-term dictionary costs reading
the posting rows of ~|pattern| grams (row-group-pruned) plus verification
of the candidate slice, instead of regex-scanning 2B dictionary rows.
The artifact is ~(avg_term_len + 3 − k)·|V| rows of (3-char string,
long) — a constant small multiple of the dictionary itself.

Reference anchor: the reference's Lucene backend
(/root/reference/densify/output_vector.py:24-31 reads from an Anserini
index) serves these rewrites through the FST; this is the
scale-equivalent capability, Spark-first.
"""

from __future__ import annotations

import os
import re
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dhr_spark.index.builder import _write_manifest, load_manifest

K_DEFAULT = 3
KGRAM_DIR = "kgram_dict"


def _gram_col(term, k: int):
    """array<string> of boundary-marked k-grams of a term column — pure
    column math (codegen), no UDF."""
    aug = F.concat(F.lit("^"), term, F.lit("$"))
    return F.transform(
        F.sequence(F.lit(1), F.length(aug) - F.lit(k - 1)),
        lambda i: aug.substr(i, F.lit(k)),
    )


def build_kgram_index(
    spark: SparkSession, index_dir: str, k: int = K_DEFAULT
) -> dict:
    """Build or refresh the k-gram term index; returns the committed
    manifest. Incremental by construction: only terms above the committed
    watermark explode into a new gram batch (a term's grams never change),
    so refreshing after an append/merge costs O(new terms). Idempotent
    under crash-and-retry (deterministic batch partition + manifest
    commit). A no-op when the dictionary hasn't grown."""
    t0 = time.time()
    man = load_manifest(index_dir)
    if man is None:
        raise FileNotFoundError(f"no manifest in {index_dir}")
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    prev = man.get("kgram")
    if prev and int(prev["k"]) != int(k):
        raise ValueError(
            f"index has a k={prev['k']} gram table — one geometry per "
            "index (rebuild by deleting kgram_dict + the manifest key)"
        )
    td_dir = man.get("term_dict_dir", "term_dict")
    tdict = spark.read.parquet(os.path.join(index_dir, td_dir)).select(
        "term", "term_id"
    )
    wm = int(prev["max_term_id"]) if prev else -1
    new = tdict.filter(F.col("term_id") > wm)
    hi_row = tdict.agg(F.max("term_id").alias("m")).collect()[0]
    hi = int(hi_row["m"]) if hi_row["m"] is not None else -1
    if hi <= wm:
        return dict(man)  # dictionary hasn't grown — no-op
    batch = int(prev["batches"]) if prev else 0
    (
        new.select(
            "term_id", F.explode(_gram_col(F.col("term"), k)).alias("gram")
        )
        .distinct()  # fuzzy counts DISTINCT shared gram types
        .withColumn("gram_batch", F.lit(batch))
        .repartition("gram")
        .sortWithinPartitions("gram")
        .write.mode("overwrite")
        .options(partitionOverwriteMode="dynamic")
        .partitionBy("gram_batch")
        .parquet(os.path.join(index_dir, KGRAM_DIR))
    )
    man2 = dict(man)
    man2["kgram"] = {
        "k": int(k),
        "max_term_id": hi,
        "batches": batch + 1,
        "seconds": round(time.time() - t0, 2),
    }
    _write_manifest(index_dir, man2)
    return man2


def _segment_grams(aug: str, k: int) -> list[str]:
    return [aug[i : i + k] for i in range(len(aug) - k + 1)]


def prefix_grams(prefix: str, k: int) -> tuple[list[str], int] | None:
    """(required_grams, min_count) for a PrefixQuery, or None when the
    prefix is too short to yield one full gram (caller falls back)."""
    grams = _segment_grams("^" + prefix, k)
    if not grams:
        return None
    req = sorted(set(grams))
    return req, len(req)


def wildcard_grams(pattern: str, k: int) -> tuple[list[str], int] | None:
    """(required_grams, min_count) for a WildcardQuery (* = any run,
    ? = exactly one char): every full k-gram of every literal segment,
    boundary-marked at anchored ends. None when no segment yields a gram
    or the pattern carries escapes (conservative fallback)."""
    if "\\" in pattern:
        return None
    segs = re.split(r"[*?]", pattern)
    grams: list[str] = []
    for i, seg in enumerate(segs):
        aug = seg
        if i == 0:
            aug = "^" + aug
        if i == len(segs) - 1:
            aug = aug + "$"
        grams += _segment_grams(aug, k)
    if not grams:
        return None
    req = sorted(set(grams))
    return req, len(req)


def fuzzy_grams(
    body: str, max_edits: int, k: int
) -> tuple[list[str], int] | None:
    """(candidate_grams, min_count) for a FuzzyQuery: a term within
    ``max_edits`` of ``body`` shares >= distinct_grams(body) − k·edits
    distinct grams with it. None when that bound is < 1 (vacuous — every
    term would pass; caller falls back to the dictionary scan)."""
    req = sorted(set(_segment_grams("^" + body + "$", k)))
    thresh = len(req) - k * int(max_edits)
    if thresh < 1:
        return None
    return req, thresh


def kgram_candidates(
    spark: SparkSession,
    index_dir: str,
    manifest: dict,
    grams: tuple[list[str], int],
) -> DataFrame:
    """(term_id) of terms at-or-below the kgram watermark containing at
    least ``min_count`` of the required grams — the NECESSARY-condition
    pre-filter (caller verifies). One-input special case of
    kgram_candidates_batch."""
    req, min_count = grams
    return kgram_candidates_batch(
        spark, index_dir, [("", req, min_count)]
    ).select("term_id")


def kgram_candidates_batch(
    spark: SparkSession,
    index_dir: str,
    inputs: list[tuple[str, list[str], int]],
) -> DataFrame:
    """(qt, term_id): per-input gram candidates for a BATCH of
    ``(qt, required_grams, min_count)`` patterns, resolved in ONE pass
    over the gram table. The union'd gram ``isin`` reaches the parquet
    row groups (the table is gram-sorted) — this reads the required
    grams' postings, not the dictionary; the per-(qt, term_id) shared
    count compares against each input's own threshold. Per-input gram
    lists must be DISTINCT (every producer in this module emits sets), so
    count(*) == count_distinct(gram) after the (gram) join. This is the
    single implementation of the necessary-condition cut — wand.py's
    rewrite paths and the fuzzy-candidate batcher all route here, so the
    gram-table layout has exactly one reader to keep in sync."""
    gdf = spark.createDataFrame(
        [(qt, g) for qt, req, _ in inputs for g in req],
        "qt string, gram string",
    )
    tdf = spark.createDataFrame(
        [(qt, int(mc)) for qt, _, mc in inputs], "qt string, thresh int"
    )
    all_grams = sorted({g for _, req, _ in inputs for g in req})
    kg = spark.read.parquet(os.path.join(index_dir, KGRAM_DIR))
    return (
        kg.filter(F.col("gram").isin(all_grams))
        .join(F.broadcast(gdf), "gram")
        .groupBy("qt", "term_id")
        .agg(F.count("*").alias("_n"))
        .join(F.broadcast(tdf), "qt")
        .filter(F.col("_n") >= F.col("thresh"))
        .select("qt", "term_id")
    )
