"""spark-submit entry: in-place docvalue updates — the Lucene
``IndexWriter.updateDocValues`` analogue (index/dvupdate.py).

Feeds freshness/popularity/status signals into an index WITHOUT reindexing:
the update batch (a parquet table of ``docid`` plus one column per field to
change) lands as typed per-field generation sidecars that every docvalues
read path — sort, facets, function-score boosting, recency, filtered
search, delete-by-match, the SQL doc_map view — overlays latest-wins.

    spark-submit --py-files dhr_spark.zip scripts/update_docvalues.py \\
        --index-dir s3://bucket/index --updates s3://bucket/updates.parquet

Cost is O(|updates|); the manifest rewrite is the atomic commit point and
a crashed run is safely retried. Identity columns (docid, conv_id,
turn_idx) are refused — changing them is a reindex, not an update.

Local sandbox smoke:
    python scripts/update_docvalues.py --index-dir /tmp/idx --updates /tmp/u
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
    p.add_argument("--updates", required=True,
                   help="parquet path: (docid, <field>[, <field>...])")
    p.add_argument("--master", default=None)
    args = p.parse_args()

    from dhr_spark.index.dvupdate import update_docvalues
    from dhr_spark.session import get_spark

    spark = get_spark(app_name="dhr_update_docvalues", master=args.master)
    man = update_docvalues(
        spark, args.index_dir, spark.read.parquet(args.updates)
    )
    out = {k: v for k, v in man.items() if k != "chunks"}
    out["n_chunks"] = len(man["chunks"])
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
