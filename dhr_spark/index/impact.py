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

__all__ = ["build_impact_index"]


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
        F.col("impact").isNull() | (F.col("impact") < 1)
    ).limit(1).count()
    if bad:
        rows.unpersist()
        raise ValueError(
            "impacts must be integers >= 1 (quantize float weights with "
            "operators.impact.quantize_impacts; zero/negative weights are "
            "the encoder's sparsification — drop them upstream)"
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
