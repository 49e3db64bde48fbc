"""spark-submit entry: the full LLM-training-data curation pipeline over
transcripts, composed from the repo's individually-oracled stages:

    conversation docs -> C4 line cleaning + Gopher shape rules + exact
    dedup + hash split (operators/curation.curation_pipeline)
    -> MinHash-LSH near-dup clustering, one survivor per cluster
       (dedup.lsh_verified_pairs + dup_clusters)
    -> optional benchmark decontamination (dedup.decontaminate)
    -> optional DSIR target-distribution selection (operators/dsir)
    -> sequence packing plan (operators/packing.pack_offsets)

Emits ONE JSON audit line with per-stage in/out counts (the 100-TB
operational contract: every drop is accounted), writes the surviving
documents and the packing plan as parquet.

    spark-submit --py-files dhr_spark.zip scripts/curate_corpus.py \\
        --input <path or iceberg table> --output /data/curated \\
        [--bench eval_set.parquet] [--target clean_sample.parquet] \\
        [--keep 100000] [--seq-len 2048] [--jaccard 0.5]

Local sandbox smoke:
    python scripts/curate_corpus.py --synthetic 200 --output /tmp/curated
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", help="transcripts path/table")
    p.add_argument("--format", default="parquet",
                   choices=["parquet", "iceberg"])
    p.add_argument("--synthetic", type=int, default=0,
                   help="generate N synthetic conversations instead")
    p.add_argument("--output", required=True,
                   help="output dir (docs/ + pack_plan/ parquet)")
    p.add_argument("--jaccard", type=float, default=0.5,
                   help="near-dup Jaccard threshold (LSH-verified)")
    p.add_argument("--bench", default=None,
                   help="benchmark parquet with (doc_id, text): drop "
                        "training docs sharing a 13-gram with it")
    p.add_argument("--target", default=None,
                   help="target-corpus parquet with (doc_id, text): DSIR "
                        "importance resampling toward its n-gram "
                        "distribution")
    p.add_argument("--keep", type=int, default=0,
                   help="docs to keep in the DSIR resample (0 = skip even "
                        "with --target)")
    p.add_argument("--seq-len", type=int, default=2048)
    p.add_argument("--holdout-pct", type=int, default=10)
    p.add_argument("--quality", default="gopher",
                   choices=["both", "c4", "gopher", "none"],
                   help="which quality gates apply (exact dedup + split "
                        "always run). Default gopher: C4's web-page line "
                        "rules (terminal punctuation etc.) reject "
                        "conversational text wholesale — keep them for "
                        "web-document corpora")
    p.add_argument("--master", default=None)
    args = p.parse_args()
    if args.target and args.keep <= 0:
        p.error("--target needs --keep N (resample size)")

    from pyspark.sql import functions as F

    from dhr_spark.operators import dedup as D
    from dhr_spark.operators.conversations import conv_documents
    from dhr_spark.operators.curation import curation_pipeline
    from dhr_spark.operators.docids import with_global_ids
    from dhr_spark.operators.packing import pack_offsets, pack_stats
    from dhr_spark.operators.textstats import with_simple_tokens
    from dhr_spark.session import get_spark

    spark = get_spark(app_name="dhr_curate_corpus", master=args.master)
    if args.synthetic:
        from dhr_spark.data.synthetic import synth_transcripts

        tr = synth_transcripts(spark, n_convs=args.synthetic)
    elif args.input:
        from dhr_spark.sources.transcripts import read_transcripts

        tr = read_transcripts(
            spark, args.input,
            fmt="table" if args.format == "iceberg" else "parquet",
        )
    else:
        p.error("--input or --synthetic required")

    audit: dict = {"stages": {}}

    # stage 0: one document per conversation, dense numeric ids
    docs = with_global_ids(
        conv_documents(tr).select("conv_id", "text"),
        [F.col("conv_id").asc()], "doc_id",
    ).select("doc_id", "conv_id", "text").localCheckpoint()
    n0 = docs.count()
    audit["stages"]["conversations"] = {"in_turns": tr.count(), "docs": n0}

    # stage 1: cheap curation — selectable quality gates, exact dedup +
    # hash split always (curation_pipeline's composition, with keep
    # re-derived from the requested gate set)
    flags = curation_pipeline(docs, holdout_pct=args.holdout_pct)
    gate = ~F.col("is_exact_dup")
    if args.quality in ("both", "c4"):
        gate = gate & F.col("c4_keep")
    if args.quality in ("both", "gopher"):
        gate = gate & F.col("gopher_keep")
    kept1 = docs.join(
        flags.filter(gate).select("doc_id", "split"), "doc_id"
    ).localCheckpoint()
    n1 = kept1.count()
    audit["stages"]["curation"] = {
        "in": n0, "out": n1, "dropped": n0 - n1, "quality": args.quality,
    }

    # stage 2: near-dup clustering — one survivor per cluster (min doc_id)
    pairs = D.lsh_verified_pairs(kept1, threshold=args.jaccard)
    clusters = D.dup_clusters(kept1, pairs)
    kept2 = kept1.join(
        clusters.filter(F.col("doc_id") == F.col("cluster_id")).select(
            "doc_id"
        ),
        "doc_id",
    ).localCheckpoint()
    n2 = kept2.count()
    audit["stages"]["near_dedup"] = {"in": n1, "out": n2, "dropped": n1 - n2}

    # stage 3: benchmark decontamination (13-gram hit => drop)
    if args.bench:
        bench = spark.read.parquet(args.bench).select("doc_id", "text")
        flags3 = D.decontaminate(kept2, bench)
        kept3 = kept2.join(
            flags3.filter(~F.col("contaminated")).select("doc_id"), "doc_id"
        ).localCheckpoint()
        n3 = kept3.count()
        audit["stages"]["decontaminate"] = {
            "in": n2, "out": n3, "dropped": n2 - n3,
        }
    else:
        kept3, n3 = kept2, n2

    # stage 4: DSIR selection toward the target distribution
    if args.target and args.keep:
        from dhr_spark.operators.dsir import dsir_resample

        target = spark.read.parquet(args.target).select("doc_id", "text")
        sel = dsir_resample(kept3, target, k=args.keep)
        kept4 = kept3.join(sel.select("doc_id"), "doc_id").localCheckpoint()
        n4 = kept4.count()
        audit["stages"]["dsir"] = {"in": n3, "out": n4, "dropped": n3 - n4}
    else:
        kept4, n4 = kept3, n3

    # stage 5: packing plan over simple-token counts
    counts = with_simple_tokens(kept4).select(
        F.col("doc_id").alias("docid"),
        F.size("tokens").cast("long").alias("n_tokens"),
    )
    plan = pack_offsets(counts, args.seq_len)
    stats = pack_stats(plan, args.seq_len).collect()[0].asDict()
    audit["stages"]["packing"] = {k: (float(v) if v is not None else None)
                                  for k, v in stats.items()}

    out = args.output.rstrip("/")
    kept4.write.mode("overwrite").parquet(f"{out}/docs")
    plan.write.mode("overwrite").parquet(f"{out}/pack_plan")
    audit["final_docs"] = n4
    audit["output"] = out
    print(json.dumps(audit))
    spark.stop()


if __name__ == "__main__":
    main()
