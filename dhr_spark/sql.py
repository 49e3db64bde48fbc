"""SQL-parity layer: the engine's analyzer and index artifacts exposed to
plain ``spark.sql``.

The reference drives everything through Python entry points (argparse mains,
/root/reference/retrieval/gip_retrieval.py:233-344); Spark's native SQL front
end is the idiomatic equivalent surface, and SURVEY.md §4 reserves exactly
this hook ("optionally a spark.udf registration layer for SQL parity"). Two
pieces:

* :func:`register_functions` — the analyzer chains (the one genuinely
  SQL-inexpressible scalar family, SURVEY F1) registered as vectorized
  Arrow pandas UDFs under SQL names. Everything else the engine computes
  (BM25 weights, tokhash60, quality thresholds, …) is already plain column
  arithmetic a SQL user can write directly — registering Python twins for
  those would demote JVM codegen to UDF calls, so we deliberately do not.
* :func:`register_index_views` — a built index's artifacts as temp views
  with LIVE-document semantics (manifest-committed chunks only, committed
  tombstones excluded — the same two read rules the WAND Searcher applies,
  operators/wand.py), so ad-hoc SQL over an index agrees with the engine
  even after crashes, appends, and deletes.

With both registered, full Lucene-convention BM25 (k1/b from the manifest,
idf = ln(1 + (N - df + .5)/(df + .5)), no (k1+1) factor — SURVEY §7.2) is a
pure ``spark.sql`` statement over ``<prefix>_dictionary`` /
``<prefix>_forward`` / ``<prefix>_doclens`` / ``<prefix>_stats``;
tests/test_sql_registration.py pins that statement rank- and
score-identical to ``Searcher.search``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dhr_spark.functions.analyzer import tokenize_udf
from dhr_spark.index.builder import load_manifest, read_tombstones
from dhr_spark.index.compact import decode_doclens

__all__ = ["register_functions", "register_index_views"]


def register_functions(spark: SparkSession, prefix: str = "dhr_") -> None:
    """Register the analyzer family for SQL use (idempotent re-register):

    * ``<prefix>analyze(text)`` → array<string> — the full Lucene default
      chain (lowercase, possessive strip, stopwords, Porter) the index is
      built with (functions/analyzer.py; reference analyzer entry
      /root/reference/densify/densify_query.py:46,82-84).
    * ``<prefix>analyze_simple(text)`` — whitespace/lowercase only (the
      pre-tokenized convention, densify_query.py:85).
    * ``<prefix>analyze_gaps(text)`` — Lucene position increments: removed
      tokens stay as NULL slots, so ``posexplode`` + ``IS NOT NULL`` yields
      gap-correct (position, term) rows for phrase SQL.

    All three are iterator-of-series pandas UDFs (Arrow-batched, analyzer
    setup amortized per batch stream) — no per-row Python.
    """
    spark.udf.register(f"{prefix}analyze", tokenize_udf("lucene"))
    spark.udf.register(f"{prefix}analyze_simple", tokenize_udf("simple"))
    spark.udf.register(
        f"{prefix}analyze_gaps", tokenize_udf("lucene", keep_gaps=True)
    )


def _live(df: DataFrame, tombs: DataFrame | None) -> DataFrame:
    return df if tombs is None else df.join(tombs, "docid", "left_anti")


def register_index_views(
    spark: SparkSession,
    index_dir: str,
    prefix: str = "dhr",
    snapshot: int | None = None,
) -> dict:
    """Expose a built index as temp views; returns the manifest it read.

    Views (those whose artifact exists in this index):

    * ``<prefix>_dictionary`` — (term, term_id, df, ctf); the manifest's
      CURRENT versioned dictionary dir, so exact-stats deletes are visible.
    * ``<prefix>_doclens``    — (docid, dl), decoded from the chunk-packed
      artifact, live docs only.
    * ``<prefix>_doc_map``    — (docid, conv_id, turn_idx, *docvalues),
      live docs only.
    * ``<prefix>_forward``    — (docid, term_id, tf, chunk) doc-major term
      vectors, live docs only (present iff built with forward_index=True).
    * ``<prefix>_stored``     — (docid, text, chunk) original text, live
      docs only (present iff built with stored=True) — join it to a hit
      list for SQL-side fetch, the Lucene stored-field read.
    * ``<prefix>_positions``  — (docid, term_id, positions array<int>,
      chunk), live docs only (present iff built with positional=True);
      positions count Lucene increments (stopwords consume slots), the
      same stream ``<prefix>analyze_gaps`` emits, so SQL phrase checks
      compose with the analyzer UDF.
    * ``<prefix>_stats``      — one row (n_docs, avgdl, total_dl, n_terms,
      k1, b) from the manifest — already net of exact-stats deletes.

    Read rules match the Searcher: scans are restricted to chunks in the
    manifest lineage (orphan partitions from a crashed append are
    invisible) and committed tombstones are anti-joined out, so SQL over
    these views agrees with engine results across the whole index
    lifecycle. ``snapshot=`` pins every view to an earlier commit
    (Iceberg-style time travel), same contract as ``Searcher(snapshot=)``.

    The views are lazy (temp views over parquet scans with a partition
    filter); registration reads only the manifest JSON.
    """
    man = load_manifest(index_dir, snapshot=snapshot)
    if man is None:
        raise FileNotFoundError(f"no manifest in {index_dir}")
    chunks = [int(c) for c in man["chunks"]]
    tombs = read_tombstones(spark, index_dir, man)

    td_dir = man.get("term_dict_dir", "term_dict")
    spark.read.parquet(os.path.join(index_dir, td_dir)).createOrReplaceTempView(
        f"{prefix}_dictionary"
    )

    # doclens is stored chunk-packed (base_docid, n_docs, dls int32-binary);
    # the view is the decoded per-doc relation SQL can join on
    doclens = decode_doclens(
        spark.read.parquet(os.path.join(index_dir, "doclens")).where(
            F.col("chunk").isin(chunks)
        )
    )
    _live(doclens, tombs).createOrReplaceTempView(f"{prefix}_doclens")

    dm_path = os.path.join(index_dir, "doc_map")
    if os.path.isdir(dm_path):
        from dhr_spark.index.dvupdate import overlay_fields

        dm = spark.read.parquet(dm_path).drop("seg_batch")
        # committed in-place docvalue updates (dv_gens) overlay the view —
        # SQL reads see current values, snapshot= sees that snapshot's gens
        dv_fields = [f for f in (man.get("dv_gens") or {}) if f in dm.columns]
        dm = overlay_fields(spark, index_dir, man, dm, dv_fields)
        _live(dm, tombs).createOrReplaceTempView(f"{prefix}_doc_map")

    if man.get("stored"):
        st = spark.read.parquet(os.path.join(index_dir, "stored")).where(
            F.col("chunk").isin(chunks)
        )
        _live(st, tombs).createOrReplaceTempView(f"{prefix}_stored")

    if man.get("positional"):
        pos = spark.read.parquet(os.path.join(index_dir, "positions")).where(
            F.col("chunk").isin(chunks)
        )
        _live(pos, tombs).createOrReplaceTempView(f"{prefix}_positions")

    if man.get("forward_index"):
        fwd = spark.read.parquet(os.path.join(index_dir, "forward")).where(
            F.col("chunk").isin(chunks)
        )
        _live(fwd, tombs).createOrReplaceTempView(f"{prefix}_forward")

    # literal SELECT (OneRowRelation), NOT createDataFrame(list): the list
    # spelling parallelizes one row into defaultParallelism Python
    # partitions, and a CROSS JOIN of that against a chunk-partitioned scan
    # multiplies partition counts (31 chunks x 32 stats partitions = 992
    # tasks, 8.2 s, measured on the sql_bm25_topk plan). A LocalRelation
    # keeps the cross join at the scan's own width. Doubles ride as quoted
    # reprs cast to DOUBLE — Double.parseDouble round-trips the shortest
    # repr bit-exactly, so values match the createDataFrame spelling.
    spark.sql(
        "SELECT "
        f"CAST({int(man['n_docs'])} AS BIGINT) AS n_docs, "
        f"CAST('{float(man['avgdl'])!r}' AS DOUBLE) AS avgdl, "
        f"CAST({int(man['total_dl'])} AS BIGINT) AS total_dl, "
        f"CAST({int(man['n_terms'])} AS BIGINT) AS n_terms, "
        f"CAST('{float(man['k1'])!r}' AS DOUBLE) AS k1, "
        f"CAST('{float(man['b'])!r}' AS DOUBLE) AS b"
    ).createOrReplaceTempView(f"{prefix}_stats")
    return man
