"""spark-submit entry: fold one committed index into another physically —
the Lucene ``IndexWriter.addIndexes(Directory...)`` analogue (index/merge.py).

Use when a corpus slice was indexed separately (a backfill shard, a tenant
migration, a per-day build) and should become part of a live index without
re-tokenizing or re-encoding anything: postings blobs copy opaquely, only
term-id columns are rewritten through the merged dictionary, and all corpus
statistics are exactly additive — post-merge rankings equal a union-corpus
rebuild score-for-score.

Contract: the two indexes must share chunk_bits / block_size / analyzer /
scoring family / artifact set, and their CHUNK sets must be disjoint (build
the source with docids above the destination's chunk ceiling, or from the
global docid sequence a range-sharded layout already uses). The source is
never modified; the destination's manifest rewrite is the atomic commit
point and every write is idempotent under crash-and-retry.

    spark-submit --py-files dhr_spark.zip scripts/merge_index.py \\
        --dst s3://bucket/live_index --src s3://bucket/backfill_index

Local sandbox smoke: python scripts/merge_index.py --dst /tmp/a --src /tmp/b
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--dst", required=True,
                   help="destination index dir (modified in place)")
    p.add_argument("--src", required=True,
                   help="source index dir (read-only; copied into dst)")
    p.add_argument("--master", default=None)
    args = p.parse_args()

    from dhr_spark.index.merge import merge_indexes
    from dhr_spark.session import get_spark

    spark = get_spark(app_name="dhr_merge_index", master=args.master)
    man = merge_indexes(spark, args.dst, args.src)
    out = {k: v for k, v in man.items() if k != "chunks"}
    out["n_chunks"] = len(man["chunks"])
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
