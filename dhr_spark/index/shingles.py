"""Bigram (shingle) statistics artifact — the LM behind the phrase
suggester ("did you mean").

``build_bigram_index`` derives adjacent-pair counts from the POSITIONAL
artifact (no corpus access: a bigram is two terms at consecutive position
increments), writing ``bigrams/`` = (t1, t2, n) term-id pairs. Under the
lucene chain stopwords consume a position, so pairs spanning a stopword do
NOT count as adjacent — the same convention Lucene's ShingleFilter
exposes as filler tokens, here simply absent mass. Tombstoned docs are
excluded, so the LM reflects the live corpus.

Scale shape: one posexplode of the positions relation (token-stream-sized,
the same volume any corpus statistic pays) → one self-join keyed on
(docid, pos) — co-partitioned, a single exchange — → a (t1, t2) count
with map-side combine. The artifact is vocabulary-pair-sized, written
once; queries read slices of it by t1 pushdown. Freshness is manifested:
the build records the corpus n_docs it saw, and readers refuse a stale
table instead of silently under-counting (refresh = rebuild; bigram mass
is corpus-wide, not append-local like k-grams).

Reference anchor: Elasticsearch phrase suggester (``suggest.phrase``)
builds its candidate-scoring LM from index shingles the same way; Lucene
ShingleFilter / DirectSpellChecker are the underlying pieces.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dhr_spark.index.builder import (
    _write_manifest,
    load_manifest,
    read_tombstones,
)

BIGRAM_DIR = "bigrams"


def build_bigram_index(spark: SparkSession, index_dir: str) -> dict:
    """Build (or rebuild) the bigram artifact; returns the committed
    manifest. Requires ``build_index(..., positional=True)``."""
    t0 = time.time()
    man = load_manifest(index_dir)
    if man is None:
        raise FileNotFoundError(f"no manifest in {index_dir}")
    if not man.get("positional"):
        raise ValueError(
            "bigram statistics derive from the positional artifact — "
            "build the index with positional=True"
        )
    prev = man.get("bigrams")
    if prev and int(prev["n_docs"]) == int(man["n_docs"]) and int(
        prev.get("appends", 0)
    ) == int(man.get("appends", 0)):
        return dict(man)  # corpus unchanged — the table is fresh, no-op
    committed = [int(c) for c in man["chunks"]]
    pos = (
        spark.read.parquet(os.path.join(index_dir, "positions"))
        .filter(F.col("chunk").isin(committed))
        .select("docid", "term_id", "positions")
    )
    tomb = read_tombstones(spark, index_dir, man)
    if tomb is not None:
        pos = pos.join(tomb, "docid", "left_anti")
    tok = pos.select(
        "docid", F.col("term_id").alias("t1"),
        F.explode("positions").alias("pos"),
    )
    nxt = tok.select(
        "docid", F.col("t1").alias("t2"), (F.col("pos") - 1).alias("pos")
    )
    pairs = tok.join(nxt, ["docid", "pos"]).groupBy("t1", "t2").agg(
        F.count("*").cast("long").alias("n")
    )
    pairs.repartition(1 if len(committed) <= 64 else 32, "t1").write.mode(
        "overwrite"
    ).parquet(os.path.join(index_dir, BIGRAM_DIR))
    man2 = dict(man)
    man2["bigrams"] = {
        "n_docs": int(man["n_docs"]),
        "appends": int(man.get("appends", 0)),
        "seconds": round(time.time() - t0, 2),
    }
    _write_manifest(index_dir, man2)
    return man2


def read_bigrams(
    spark: SparkSession, index_dir: str, manifest: dict
) -> DataFrame:
    """The committed bigram relation (t1, t2, n); refuses a stale table
    (corpus changed since the build) rather than under-counting."""
    bg = manifest.get("bigrams")
    if not bg:
        raise ValueError(
            "index has no bigram artifact — run "
            "index.shingles.build_bigram_index first"
        )
    if int(bg["n_docs"]) != int(manifest["n_docs"]) or int(
        bg.get("appends", 0)
    ) != int(manifest.get("appends", 0)):
        raise ValueError(
            "bigram artifact is stale (corpus changed since its build) — "
            "re-run index.shingles.build_bigram_index"
        )
    return spark.read.parquet(os.path.join(index_dir, BIGRAM_DIR))


def bigram_counts_scan(
    docs: DataFrame, text_col: str = "text", mode: str = "simple"
) -> DataFrame:
    """(t1, t2, n) by corpus scan — the oracle twin of the index-derived
    artifact (term strings, not ids). Zero-shuffle pair extraction
    (adjacent zip per row) + one count aggregation."""
    from dhr_spark.functions.analyzer import tokenize_udf

    toks = tokenize_udf(mode)(F.col(text_col))
    z = F.arrays_zip(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
    )
    return (
        docs.select(F.explode(z).alias("p"))
        .select(F.col("p")["0"].alias("t1"), F.col("p")["1"].alias("t2"))
        .groupBy("t1", "t2")
        .agg(F.count("*").cast("long").alias("n"))
    )
