"""Bigram (shingle) statistics artifact — the LM behind the phrase
suggester ("did you mean").

``build_bigram_index`` derives adjacent-pair counts from the POSITIONAL
artifact (no corpus access: a bigram is two terms at consecutive position
increments), writing ``bigrams/`` = (t1, t2, n) term-id pairs. Under the
lucene chain stopwords consume a position, so pairs spanning a stopword do
NOT count as adjacent — the same convention Lucene's ShingleFilter
exposes as filler tokens, here simply absent mass. Tombstoned docs are
excluded, so the LM reflects the live corpus.

Incremental by construction for the append lifecycle: appends allocate
docids at the next chunk boundary, so the docid watermark recorded at the
last build bounds exactly the NEW documents — a refresh after appends
folds only their positions into a new ``bg_batch`` partition (bigram mass
is per-doc additive; readers sum across batches). Deletes change existing
docs' contribution, so a tombstone-count change forces a full rebuild —
the staleness record (n_docs / appends / tombstones / next_docid) makes
the choice explicit, and readers REFUSE a stale table instead of
under-counting.

Scale shape: one posexplode of the (delta) positions relation → one
self-join keyed on (docid, pos) — co-partitioned, a single exchange — →
a (t1, t2) count with map-side combine. The artifact is
vocabulary-pair-sized; queries read slices of it by t1 pushdown, then
aggregate across batches (batch count grows only with appends and resets
at each rebuild/compaction).

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


def _pairs(pos: DataFrame) -> DataFrame:
    tok = pos.select(
        "docid", F.col("term_id").alias("t1"),
        F.explode("positions").alias("pos"),
    )
    nxt = tok.select(
        "docid", F.col("t1").alias("t2"), (F.col("pos") - 1).alias("pos")
    )
    return tok.join(nxt, ["docid", "pos"]).groupBy("t1", "t2").agg(
        F.count("*").cast("long").alias("n")
    )


def build_bigram_index(spark: SparkSession, index_dir: str) -> dict:
    """Build or refresh the bigram artifact; returns the committed
    manifest. Requires ``build_index(..., positional=True)``. Fresh table
    -> no-op; append-only growth -> O(batch) delta fold; anything that
    changed existing docs (deletes, conversation re-emits) -> rebuild."""
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
    n_tomb = int(man.get("tombstones", 0))
    if (
        prev
        and "batches" in prev  # pre-batch layouts always rebuild
        and int(prev["n_docs"]) == int(man["n_docs"])
        and int(prev.get("appends", 0)) == int(man.get("appends", 0))
        and int(prev.get("tombstones", 0)) == n_tomb
    ):
        return dict(man)  # corpus unchanged — the table is fresh, no-op
    committed = [int(c) for c in man["chunks"]]
    chunk_bits = int(man["chunk_bits"])
    pos = (
        spark.read.parquet(os.path.join(index_dir, "positions"))
        .filter(F.col("chunk").isin(committed))
        .select("docid", "term_id", "positions")
    )
    delta_only = (
        prev is not None
        and "batches" in prev
        and "next_docid" in prev
        and int(prev.get("tombstones", -1)) == n_tomb
        and int(man.get("appends", 0)) > int(prev.get("appends", 0))
    )
    if delta_only:
        # appends only: every new doc sits at docid >= the recorded
        # watermark (appends allocate at the next chunk boundary), so the
        # delta fold reads only the new chunks' positions
        wm = int(prev["next_docid"])
        pos = pos.filter(F.col("docid") >= wm)
        batch = int(prev.get("batches", 1))
    else:
        batch = 0
    tomb = read_tombstones(spark, index_dir, man)
    if tomb is not None:
        pos = pos.join(tomb, "docid", "left_anti")
    pairs = _pairs(pos).withColumn("bg_batch", F.lit(batch))
    writer = pairs.repartition(
        1 if len(committed) <= 64 else 32, "t1"
    ).write.mode("overwrite")
    if batch:
        writer = writer.options(partitionOverwriteMode="dynamic")
    writer.partitionBy("bg_batch").parquet(
        os.path.join(index_dir, BIGRAM_DIR)
    )
    man2 = dict(man)
    man2["bigrams"] = {
        "n_docs": int(man["n_docs"]),
        "appends": int(man.get("appends", 0)),
        "tombstones": n_tomb,
        "next_docid": int(man["next_docid"]),
        "batches": batch + 1,
        "seconds": round(time.time() - t0, 2),
    }
    _write_manifest(index_dir, man2)
    return man2


def read_bigrams(
    spark: SparkSession, index_dir: str, manifest: dict
) -> DataFrame:
    """The committed bigram relation (t1, t2, n) — batches summed; refuses
    a stale table (corpus changed since the last refresh) rather than
    under-counting."""
    bg = manifest.get("bigrams")
    if not bg:
        raise ValueError(
            "index has no bigram artifact — run "
            "index.shingles.build_bigram_index first"
        )
    if (
        "batches" not in bg  # pre-batch layout: rebuild to upgrade
        or int(bg["n_docs"]) != int(manifest["n_docs"])
        or int(bg.get("appends", 0)) != int(manifest.get("appends", 0))
        or int(bg.get("tombstones", 0)) != int(manifest.get("tombstones", 0))
    ):
        raise ValueError(
            "bigram artifact is stale (corpus changed since its build) — "
            "re-run index.shingles.build_bigram_index"
        )
    raw = spark.read.parquet(os.path.join(index_dir, BIGRAM_DIR)).filter(
        F.col("bg_batch") < int(bg.get("batches", 1))
    )
    return raw.groupBy("t1", "t2").agg(F.sum("n").cast("long").alias("n"))


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
