"""spark-submit entry: merge underfull chunks of a live index (Lucene
tiered-merge analogue; index/compact.py).

Run periodically against an index that receives incremental appends — each
append lands in fresh chunks at the next docid boundary, so a long append
history accumulates underfull chunks whose per-chunk fixed costs degrade
query throughput. Compaction is score-identical (same BM25 scores, same
(conv_id, turn_idx) ranking) and atomic: the manifest rewrite is the commit
point, and GC of superseded files is idempotent under crash-and-retry.

    spark-submit --py-files dhr_spark.zip scripts/compact_index.py \\
        --index-dir s3://bucket/index [--fill-threshold 0.5] \\
        [--max-chunks 10000] [--no-gc] [--gc-only]

Conversation-granularity indexes also drop their covered tombstones during
the merge (deleted-docs cleanup), keeping the tombstone set bounded.

Local sandbox smoke: python scripts/compact_index.py --index-dir /tmp/idx
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--index-dir", required=True)
    p.add_argument("--fill-threshold", type=float, default=0.5,
                   help="compact chunks whose live-doc fill ratio is below "
                        "this (default 0.5)")
    p.add_argument("--max-chunks", type=int, default=10_000,
                   help="cap on chunks merged per run (smallest-fill first)")
    p.add_argument("--no-gc", action="store_true",
                   help="commit the compaction but defer GC of superseded "
                        "files (run --gc-only later)")
    p.add_argument("--gc-only", action="store_true",
                   help="only finish a pending GC (after a crash or --no-gc)")
    p.add_argument("--master", default=None)
    args = p.parse_args()

    from dhr_spark.index.compact import compact_index, gc_index
    from dhr_spark.session import get_spark

    spark = get_spark(app_name="dhr_compact_index", master=args.master)
    if args.gc_only:
        man = gc_index(spark, args.index_dir)
    else:
        man = compact_index(
            spark,
            args.index_dir,
            fill_threshold=args.fill_threshold,
            max_chunks=args.max_chunks,
            gc=not args.no_gc,
        )
    out = {k: v for k, v in man.items() if k != "chunks"}
    out["n_chunks"] = len(man["chunks"])
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
