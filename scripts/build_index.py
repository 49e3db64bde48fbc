"""spark-submit entry: build (or resume) the inverted index.

Cluster usage (BASELINE.json north_rule):

    zip -r dhr_spark.zip dhr_spark
    spark-submit --py-files dhr_spark.zip scripts/build_index.py \\
        --input  <path or iceberg table of transcripts> \\
        --format parquet|iceberg \\
        --index-dir s3://bucket/index \\
        --chunk-bits 20 --block-size 128 [--resume]

Local sandbox: python scripts/build_index.py --synthetic 600 --index-dir /tmp/idx

The job is idempotent per docid-chunk: a rerun with --resume skips chunks
already committed to the manifest (per-partition lineage + metrics), which is
the checkpoint/restart story for multi-hour 10^12-turn builds.
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
    p.add_argument("--format", default="parquet", choices=["parquet", "iceberg"])
    p.add_argument("--synthetic", type=int, default=0,
                   help="generate N synthetic conversations instead of --input")
    p.add_argument("--index-dir", required=True)
    p.add_argument("--analyzer", default="lucene", choices=["lucene", "simple"])
    p.add_argument(
        "--chunk-bits",
        type=lambda v: v if v == "auto" else int(v),
        default=17,
        help="docs-per-chunk exponent, or 'auto' (~4 chunks/core over the "
             "docid space — builder.auto_chunk_bits documents the sizing)",
    )
    p.add_argument("--block-size", type=int, default=128)
    p.add_argument("--k1", type=float, default=0.9)
    p.add_argument("--b", type=float, default=0.4)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--forward-index", action="store_true",
                   help="also write doc-major term vectors (enables RM3)")
    p.add_argument("--positional", action="store_true",
                   help="also write term positions (enables index-backed phrase search)")
    p.add_argument("--stored", action="store_true",
                   help="also store the original text (enables fetch_stored "
                        "/ highlight without rescanning the source table)")
    p.add_argument("--granularity", default="turn",
                   choices=["turn", "conversation"],
                   help="one doc per turn (default) or per conversation "
                        "(conversation forces --forward-index: the "
                        "tombstoning refresh path needs doc term vectors)")
    p.add_argument("--docvalues", default=None,
                   help="comma-separated transcript columns carried into "
                        "doc_map as per-doc columnar fields (Lucene "
                        "DocValues; backs search_sorted / result_facets / "
                        "search_filtered / search_boosted / search_recency; "
                        "turn-level indexes only)")
    p.add_argument("--index-sort", default=None, metavar="FIELD[:asc]",
                   help="Lucene setIndexSort: assign docids in this "
                        "docvalues field's order (default :desc — e.g. "
                        "ts:desc = newest-first) so search_sorted "
                        "early-terminates; turn granularity only")
    p.add_argument("--kgram", action="store_true",
                   help="also build the k-gram term index (accelerates "
                        "wildcard/fuzzy/prefix at huge dictionaries; "
                        "index/kgram.py)")
    p.add_argument("--clustered", action="store_true",
                   help="MinHash-clustered docid assignment (index/"
                        "reorder.py): similar turns get adjacent docids, "
                        "shrinking delta-gap posting bytes; mutually "
                        "exclusive with --index-sort, turn granularity "
                        "only. Appends and streaming refresh re-derive "
                        "the cluster key automatically (manifest records "
                        "the shingle geometry)")
    p.add_argument("--master", default=None)
    args = p.parse_args()
    docvalues = (
        tuple(c.strip() for c in args.docvalues.split(",") if c.strip())
        if args.docvalues else ()
    )
    if docvalues and args.granularity == "conversation":
        p.error("--docvalues is turn-level only (a conversation doc has no "
                "single per-turn field value)")
    if args.index_sort and args.granularity == "conversation":
        p.error("--index-sort is turn-level only (it rides docvalues)")
    if args.clustered and args.granularity == "conversation":
        p.error("--clustered is turn-level only (it rides index_sort)")
    if args.clustered and args.index_sort:
        p.error("--clustered assigns its own index sort (ckey); pick one")

    from dhr_spark.session import get_spark
    from dhr_spark.index.builder import build_index

    spark = get_spark(app_name="dhr_build_index", master=args.master)
    if args.synthetic:
        from dhr_spark.data.synthetic import synth_transcripts

        transcripts = synth_transcripts(spark, n_convs=args.synthetic)
    else:
        # Iceberg catalogs are configured via --conf spark.sql.catalog.*;
        # read_transcripts resolves table-vs-path and pins the contract
        # schema (missing/incompatible columns fail fast here, not mid-build)
        from dhr_spark.sources.transcripts import read_transcripts

        transcripts = read_transcripts(
            spark, args.input,
            fmt="table" if args.format == "iceberg" else "parquet",
        )

    if args.granularity == "conversation":
        from dhr_spark.index.conv import build_conv_index

        if args.resume:
            p.error("--resume is turn-level only; conversation indexes "
                    "refresh via append_conversations")
        manifest = build_conv_index(
            spark,
            transcripts,
            args.index_dir,
            analyzer_mode=args.analyzer,
            chunk_bits=args.chunk_bits,
            block_size=args.block_size,
            k1=args.k1,
            b=args.b,
            positional=args.positional,
            stored=args.stored,
        )
    else:
        index_sort = None
        if args.index_sort:
            f, _, d = args.index_sort.partition(":")
            if d not in ("", "asc", "desc"):
                p.error(f"--index-sort direction must be asc|desc, got {d!r}")
            index_sort = (f, d == "asc")
        kw = dict(
            analyzer_mode=args.analyzer,
            chunk_bits=args.chunk_bits,
            block_size=args.block_size,
            k1=args.k1,
            b=args.b,
            resume=args.resume,
            forward_index=args.forward_index,
            positional=args.positional,
            stored=args.stored,
            docvalues=docvalues,
        )
        if args.clustered:
            from dhr_spark.index.reorder import build_clustered_index

            manifest = build_clustered_index(
                spark, transcripts, args.index_dir, **kw
            )
        else:
            manifest = build_index(
                spark, transcripts, args.index_dir,
                index_sort=index_sort, **kw,
            )
    if args.kgram:
        from dhr_spark.index.kgram import build_kgram_index

        manifest = build_kgram_index(spark, args.index_dir)
    print(json.dumps({k: v for k, v in manifest.items() if k != "chunks"}))
    spark.stop()


if __name__ == "__main__":
    main()
