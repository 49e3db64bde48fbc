"""Impact index build — posting lists whose per-posting payload is a
precomputed integer impact instead of a term frequency.

The reference indexes non-BM25 models (DeepImpact / uniCOIL / SPLADE) by
densifying encoder-emitted per-(doc, term) weights rather than Lucene BM25
vectors (/root/reference/densify/densify_corpus.py:109-127); at query time
scoring is the gated inner product of query weights × document impacts with
no length normalization (gip_retrieval.py:117-126). This module gives those
models a true inverted-index home:

* the SAME v2 segment codec as the BM25 index — delta-gap + varint docid
  blocks with per-block (max_tf, min_dl) stats — with the ``tf`` stream
  carrying the integer impact. ``block_max_tf`` is then exactly the
  block-max impact, so ``Searcher.search_impact`` runs block-max WAND with
  the bound qweight · max_impact (dl-independent, trivially admissible).
* doclens/doc_map/dictionary/manifest layouts are shared, so chunk pruning,
  snapshots, and the deployment tooling all work unchanged. The manifest
  records ``scoring: "impact"``; Searcher refuses to run tf/dl similarities
  (BM25, QLD, …) over impact postings and vice versa — the stored integers
  mean different things.

Input contract: ``impacts (docid long, term string, impact int >= 1)`` —
already-quantized integer impacts (uniCOIL's native JSONL form). Float
encoder outputs go through ``operators.impact.quantize_impacts`` first
(Anserini's b-bit linear quantization, exact integer arithmetic).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from dhr_spark.index.builder import (
    _write_manifest,
    auto_chunk_bits,
    load_manifest,
)
from dhr_spark.index.segments import build_doclens, build_segments
from dhr_spark.operators.stats import term_dictionary

__all__ = ["build_impact_index", "append_impacts_to_index"]


def build_impact_index(
    spark: SparkSession,
    impacts: DataFrame,
    index_dir: str,
    analyzer_mode: str = "lucene",
    chunk_bits: int | str = 17,
    block_size: int = 128,
    resume: bool = False,
    doc_map_df: DataFrame | None = None,
    extra_manifest: dict | None = None,
) -> dict:
    """Build (or resume) an impact index over (docid, term, impact) rows.

    ``analyzer_mode`` is recorded for the QUERY side only: text queries to
    ``Searcher.search_impact`` are analyzed with it and their term counts
    become query weights (the DeepImpact query convention); weighted-query
    callers bypass the analyzer entirely (uniCOIL's encoded queries).

    Same resumability contract as the BM25 build: chunk-partitioned segment
    and doclens writes, per-chunk lineage + metrics in the manifest, and a
    ``resume=True`` re-run skips committed chunks (the manifest is the
    checkpoint; corpus identity is asserted).
    """
    t0 = time.time()
    prior = load_manifest(index_dir) if resume else None
    done_chunks = set(prior["chunks"].keys()) if prior else set()

    rows = impacts.select(
        F.col("docid").cast("long").alias("docid"),
        F.col("term").cast("string").alias("term"),
        F.col("impact").cast("long").alias("impact"),
    ).cache()
    bad = rows.filter(
        F.col("impact").isNull()
        | (F.col("impact") < 1)
        | (F.col("impact") > 0x7FFFFFFF)
    ).limit(1).count()
    if bad:
        rows.unpersist()
        raise ValueError(
            "impacts must be integers in [1, 2^31-1] (quantize float "
            "weights with operators.impact.quantize_impacts; zero/negative "
            "weights are the encoder's sparsification — drop them upstream; "
            "the segment tf stream is 31-bit)"
        )

    # per-doc "length" = number of posting terms. Impact scoring never reads
    # it, but the doclens artifact doubles as the chunk base + valid-docid
    # mask (SURVEY P5) and keeps every reader surface index-agnostic.
    dls = rows.groupBy("docid").agg(F.count("*").alias("dl"))
    cs = dls.agg(
        F.count("*").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        F.sum("dl").alias("total_dl"),
        F.max("docid").alias("max_docid"),
    ).collect()[0]
    if cs["n_docs"] == 0:
        rows.unpersist()
        raise ValueError("cannot build an impact index over zero postings")
    n_docs, avgdl = int(cs["n_docs"]), float(cs["avgdl"])
    total_dl, max_docid = int(cs["total_dl"]), int(cs["max_docid"])

    if chunk_bits == "auto":
        chunk_bits = (
            int(prior["chunk_bits"])
            if prior is not None
            else auto_chunk_bits(
                max_docid + 1, spark.sparkContext.defaultParallelism
            )
        )
    if prior is not None and int(prior["chunk_bits"]) != chunk_bits:
        raise ValueError(
            f"resume=True with chunk_bits={chunk_bits} but the prior build "
            f"used {prior['chunk_bits']}"
        )
    if prior is not None and (
        prior.get("scoring") != "impact" or int(prior["n_docs"]) != n_docs
    ):
        raise ValueError(
            "resume=True requires the SAME impact corpus as the prior build "
            f"(manifest scoring={prior.get('scoring')!r} "
            f"n_docs={prior['n_docs']}, got n_docs={n_docs})"
        )

    # dictionary: df = postings per term (each (doc, term) appears once),
    # idf kept for schema parity (readers join it; impact scoring ignores
    # it), ctf = total impact mass per term (the stats a merged/federated
    # impact corpus would need, mirroring the BM25 dictionary's contract)
    ts = (
        rows.groupBy("term")
        .agg(F.count("*").alias("df"), F.sum("impact").alias("ctf"))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
    )
    tdict = term_dictionary(ts.select("term", "df", "idf")).join(
        ts.select("term", "ctf"), "term"
    ).cache()
    if prior is not None and tdict.count() != int(prior["n_terms"]):
        rows.unpersist()
        tdict.unpersist()
        raise ValueError(
            "resume=True requires the SAME impact corpus: term count differs "
            "from the prior manifest"
        )

    post = (
        rows.join(F.broadcast(tdict.select("term", "term_id")), "term")
        .join(dls, "docid")
        .select(
            "term_id", "docid", F.col("impact").alias("tf"), "dl"
        )
    )
    if done_chunks:
        done_ints = [int(c) for c in done_chunks]
        post = post.filter(
            ~F.shiftright(F.col("docid"), chunk_bits).cast("int").isin(done_ints)
        )

    seg_path = os.path.join(index_dir, "segments")
    dl_path = os.path.join(index_dir, "doclens")
    mode = "append" if done_chunks else "overwrite"
    seg = build_segments(post, chunk_bits, block_size)
    seg.repartition("chunk").write.mode(mode).partitionBy("chunk").parquet(seg_path)

    dls_w = dls
    if done_chunks:
        dls_w = dls.filter(
            ~F.shiftright(F.col("docid"), chunk_bits).cast("int").isin(done_ints)
        )
    build_doclens(dls_w, chunk_bits).write.mode(mode).partitionBy(
        "chunk"
    ).parquet(dl_path)

    if not done_chunks:
        td_path = os.path.join(index_dir, "term_dict")
        tdict.write.mode("overwrite").parquet(td_path)
        n_terms = spark.read.parquet(td_path).count()
        if doc_map_df is not None:
            doc_map_df.withColumn("seg_batch", F.lit(0)).write.mode(
                "overwrite"
            ).partitionBy("seg_batch").parquet(os.path.join(index_dir, "doc_map"))
    else:
        n_terms = prior["n_terms"]

    written = spark.read.parquet(seg_path)
    metrics = (
        written.groupBy("chunk")
        .agg(
            F.sum("n").alias("postings"),
            F.sum("bytes").alias("bytes"),
            F.count("*").alias("terms"),
            (F.max("n") / F.avg("n")).alias("skew_ratio"),
        )
        .collect()
    )
    chunks = {
        str(r["chunk"]): {
            "postings": int(r["postings"]),
            "bytes": int(r["bytes"]),
            "terms": int(r["terms"]),
            "skew_ratio": round(float(r["skew_ratio"]), 3),
        }
        for r in metrics
    }
    manifest = {
        "version": 2,
        "scoring": "impact",
        "k1": 0.9,
        "b": 0.4,
        "chunk_bits": chunk_bits,
        "block_size": block_size,
        "analyzer_mode": analyzer_mode,
        "n_docs": n_docs,
        "avgdl": avgdl,
        "total_dl": total_dl,
        "next_docid": max_docid + 1,
        "appends": 0,
        "term_dict_dir": "term_dict",
        "forward_index": False,
        "positional": False,
        "stored": False,
        "n_terms": int(n_terms),
        "docvalues": [],
        "build_seconds": round(time.time() - t0, 2),
        "resumed_from": sorted(done_chunks) if done_chunks else [],
        "chunks": chunks,
    }
    if extra_manifest:
        manifest.update(extra_manifest)
    _write_manifest(index_dir, manifest)
    rows.unpersist()
    tdict.unpersist()
    return manifest


def append_impacts_to_index(
    spark: SparkSession,
    impacts: DataFrame,
    index_dir: str,
    doc_map_df: DataFrame | None = None,
    extra_manifest: dict | None = None,
) -> dict:
    """Fold a batch of (docid, term, impact) rows into an existing impact
    index — the learned-sparse twin of incremental.append_docs_to_index,
    with the SAME no-read-modify-write contract: batch docids are
    caller-assigned (encoders shard corpora themselves) and must sit
    at-or-above the next chunk boundary, so the append creates only
    brand-new chunk partitions; dictionary df/ctf merge additively with
    fresh term ids allocated past the old maximum; every write is dynamic
    partition overwrite (crash-and-retry idempotent) and the manifest
    rewrite is the atomic commit. Impact scoring reads no corpus stats, so
    committed segments stay exactly valid — appends cannot shift scores of
    existing documents at all (stronger than BM25's idf drift)."""
    from dhr_spark.operators.docids import with_global_ids

    t0 = time.time()
    man = load_manifest(index_dir)
    if man is None:
        raise FileNotFoundError(f"no manifest in {index_dir}")
    if man.get("scoring") != "impact":
        raise ValueError(
            f"append_impacts_to_index needs an impact index (manifest "
            f"scoring={man.get('scoring')!r}); text indexes append via "
            "index.incremental"
        )
    chunk_bits = int(man["chunk_bits"])
    chunk_docs = 1 << chunk_bits
    floor = -(-int(man["next_docid"]) // chunk_docs) * chunk_docs

    rows = impacts.select(
        F.col("docid").cast("long").alias("docid"),
        F.col("term").cast("string").alias("term"),
        F.col("impact").cast("long").alias("impact"),
    ).cache()
    bad = rows.filter(
        F.col("impact").isNull()
        | (F.col("impact") < 1)
        | (F.col("impact") > 0x7FFFFFFF)
    ).limit(1).count()
    if bad:
        rows.unpersist()
        raise ValueError("impacts must be integers in [1, 2^31-1]")
    dup = rows.groupBy("docid", "term").count().filter(F.col("count") > 1)
    if dup.limit(1).count():
        rows.unpersist()
        raise ValueError(
            "append batch has duplicate (docid, term) rows — encoder output "
            "must carry one impact per posting"
        )
    dls = rows.groupBy("docid").agg(F.count("*").alias("dl"))
    cs = dls.agg(
        F.min("docid").alias("lo"),
        F.max("docid").alias("hi"),
        F.count("*").alias("n"),
        F.sum("dl").alias("dl_sum"),
    ).collect()[0]
    if int(cs["n"]) == 0:
        rows.unpersist()
        raise ValueError("append batch is empty (0 documents)")
    if int(cs["lo"]) < floor:
        rows.unpersist()
        raise ValueError(
            f"batch docid {int(cs['lo'])} is below the next chunk boundary "
            f"{floor} — appends may only create brand-new chunks"
        )
    n_docs = int(man["n_docs"]) + int(cs["n"])
    total_dl = int(man["total_dl"]) + int(cs["dl_sum"])

    old = spark.read.parquet(
        os.path.join(index_dir, man.get("term_dict_dir", "term_dict"))
    ).select("term", "term_id", "df", "ctf")
    batch = rows.groupBy("term").agg(
        F.count("*").alias("df_b"), F.sum("impact").cast("long").alias("ctf_b")
    )
    joined = old.join(batch, "term", "full_outer")
    known = joined.filter(F.col("term_id").isNotNull()).select(
        "term",
        "term_id",
        (F.coalesce("df", F.lit(0)) + F.coalesce("df_b", F.lit(0))).alias("df"),
        (F.coalesce("ctf", F.lit(0)) + F.coalesce("ctf_b", F.lit(0)))
        .cast("long")
        .alias("ctf"),
    )
    fresh_base = with_global_ids(
        joined.filter(F.col("term_id").isNull()).select("term", "df_b", "ctf_b"),
        [F.col("df_b").desc(), F.col("term").asc()],
        "_new_id",
    )
    fresh = fresh_base.select(
        "term",
        (F.col("_new_id") + F.lit(int(man["n_terms"]))).cast("long").alias("term_id"),
        F.col("df_b").alias("df"),
        F.col("ctf_b").cast("long").alias("ctf"),
    )
    tdict = (
        known.unionByName(fresh)
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
        .cache()
    )
    n_terms = tdict.count()
    fresh_cached = getattr(fresh_base, "_dhr_persisted", None)

    post = (
        rows.join(F.broadcast(tdict.select("term", "term_id")), "term")
        .join(dls, "docid")
        .select("term_id", "docid", F.col("impact").alias("tf"), "dl")
    )
    append_no = int(man.get("appends", 0)) + 1
    dyn = {"partitionOverwriteMode": "dynamic"}
    seg = build_segments(
        post, chunk_bits, int(man["block_size"]), man.get("codec", "varint")
    )
    seg_path = os.path.join(index_dir, "segments")
    seg.repartition("chunk").write.mode("overwrite").options(**dyn).partitionBy(
        "chunk"
    ).parquet(seg_path)
    build_doclens(dls, chunk_bits).write.mode("overwrite").options(
        **dyn
    ).partitionBy("chunk").parquet(os.path.join(index_dir, "doclens"))
    dm_path = os.path.join(index_dir, "doc_map")
    if os.path.isdir(dm_path):
        if doc_map_df is None:
            rows.unpersist()
            tdict.unpersist()
            raise ValueError(
                "index carries a doc_map; pass doc_map_df for the batch"
            )
        doc_map_df.withColumn("seg_batch", F.lit(append_no)).write.mode(
            "overwrite"
        ).options(**dyn).partitionBy("seg_batch").parquet(dm_path)
    td_dir = f"term_dict_v{append_no}"
    tdict.write.mode("overwrite").parquet(os.path.join(index_dir, td_dir))

    new_chunk_lo = (int(cs["lo"]) // chunk_docs) * chunk_docs >> chunk_bits
    written = spark.read.parquet(seg_path).filter(F.col("chunk") >= new_chunk_lo)
    metrics = (
        written.groupBy("chunk")
        .agg(
            F.sum("n").alias("postings"),
            F.sum("bytes").alias("bytes"),
            F.count("*").alias("terms"),
            (F.max("n") / F.avg("n")).alias("skew_ratio"),
        )
        .collect()
    )
    chunks = dict(man["chunks"])
    for r in metrics:
        chunks[str(r["chunk"])] = {
            "postings": int(r["postings"]),
            "bytes": int(r["bytes"]),
            "terms": int(r["terms"]),
            "skew_ratio": round(float(r["skew_ratio"]), 3),
        }
    man2 = dict(man)
    man2.update(
        {
            "n_docs": n_docs,
            "avgdl": total_dl / n_docs,
            "total_dl": total_dl,
            "next_docid": int(cs["hi"]) + 1,
            "n_terms": int(n_terms),
            "appends": append_no,
            "term_dict_dir": td_dir,
            "last_append_seconds": round(time.time() - t0, 2),
            "chunks": chunks,
        }
    )
    if extra_manifest:
        man2.update(extra_manifest)
    _write_manifest(index_dir, man2)
    rows.unpersist()
    tdict.unpersist()
    if fresh_cached is not None:
        fresh_cached.unpersist()
    return man2
