"""spark-submit entry: fold a new transcript batch into a live index.

Turn-level index (built by build_index.py, default granularity):

    spark-submit --py-files dhr_spark.zip scripts/append_index.py \\
        --index-dir s3://bucket/index \\
        --batch <path or iceberg table of NEW turns>

Conversation-level index (built with --granularity conversation): new turns
CHANGE existing conversation documents, so the append also needs the full
updated transcripts source to re-emit the affected conversations (their old
docids are tombstoned; superseded postings never score):

    spark-submit --py-files dhr_spark.zip scripts/append_index.py \\
        --index-dir s3://bucket/conv_index \\
        --batch <new turns> --all <full transcripts table>

The granularity is read from the index manifest — the right append path is
chosen automatically. Both paths are idempotent under crash-and-retry (the
manifest rewrite is the atomic commit point) and score-identical to a full
rebuild over the union corpus (tests/test_incremental.py,
tests/test_conv_incremental.py).

Local sandbox smoke: python scripts/append_index.py --index-dir /tmp/idx \\
    --synthetic 50
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _read(spark, source: str, fmt: str):
    from dhr_spark.sources.transcripts import read_transcripts

    return read_transcripts(
        spark, source, fmt="table" if fmt == "iceberg" else "parquet"
    )


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--index-dir", required=True)
    p.add_argument("--batch", help="new turns (path or table)")
    p.add_argument("--all", dest="all_turns",
                   help="full updated transcripts source (conversation "
                        "granularity only)")
    p.add_argument("--format", default="parquet", choices=["parquet", "iceberg"])
    p.add_argument("--synthetic", type=int, default=0,
                   help="generate N synthetic conversations as the batch")
    p.add_argument("--master", default=None)
    args = p.parse_args()

    from dhr_spark.index.builder import load_manifest
    from dhr_spark.session import get_spark

    man = load_manifest(args.index_dir)
    if man is None:
        p.error(f"no manifest in {args.index_dir}")
    spark = get_spark(app_name="dhr_append_index", master=args.master)

    if args.synthetic:
        from pyspark.sql import functions as F

        from dhr_spark.data.synthetic import synth_transcripts

        batch = synth_transcripts(spark, n_convs=args.synthetic, seed=91).withColumn(
            "conv_id", F.concat(F.lit("apnd-"), F.col("conv_id"))
        )
    elif args.batch:
        batch = _read(spark, args.batch, args.format)
    else:
        p.error("--batch or --synthetic required")

    if man.get("granularity") == "conversation":
        from dhr_spark.index.conv import append_conversations

        if args.all_turns:
            turns_all = _read(spark, args.all_turns, args.format)
        elif args.synthetic:
            # synthetic batches are brand-new conversations: the batch IS
            # the full text of every affected conversation
            turns_all = batch
        else:
            p.error("conversation-granularity append needs --all "
                    "(full updated transcripts source)")
        man2 = append_conversations(spark, batch, turns_all, args.index_dir)
    else:
        from dhr_spark.index.incremental import append_to_index

        man2 = append_to_index(spark, batch, args.index_dir)

    print(json.dumps({k: v for k, v in man2.items() if k != "chunks"}))
    spark.stop()


if __name__ == "__main__":
    main()
