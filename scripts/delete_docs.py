"""spark-submit entry: delete documents from a live index without a rebuild
(Lucene IndexWriter.deleteDocuments analogue; index/delete.py).

The GDPR-shaped operation at 10^12-turn scale: tombstone the target docs so
they never score again, subtracting their df/dl stats exactly when the
forward index is present (post-delete rankings equal a rebuild minus the
deleted docs), or mask-only with Lucene's literal docFreq-drift semantics
otherwise. A later compaction run (scripts/compact_index.py) purges the
tombstoned postings physically.

    spark-submit --py-files dhr_spark.zip scripts/delete_docs.py \\
        --index-dir s3://bucket/index \\
        (--docids 17,42,99 | --match conv_id=c12,c40) \\
        [--mask-only]

--match deletes by a doc_map docvalues column (deleteDocuments(Term)):
`--match conv_id=c12,c40` removes every live doc of those conversations on
any index granularity. Unknown ids / unmatched values are no-ops.

Local sandbox smoke:
    python scripts/delete_docs.py --index-dir /tmp/idx --docids 0,1
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
    p.add_argument("--docids", default=None,
                   help="comma-separated global docids to delete")
    p.add_argument("--match", default=None,
                   help="field=v1,v2,... — delete docs whose doc_map "
                        "docvalues column matches any value")
    p.add_argument("--mask-only", action="store_true",
                   help="skip exact stats subtraction (Lucene docFreq "
                        "drift until rebuild); default subtracts exactly "
                        "via the forward index")
    p.add_argument("--master", default=None)
    args = p.parse_args()
    if (args.docids is None) == (args.match is None):
        p.error("pass exactly one of --docids / --match")

    from dhr_spark.index.delete import delete_docs
    from dhr_spark.session import get_spark

    kw: dict = {"exact_stats": not args.mask_only}
    if args.docids is not None:
        kw["docids"] = [int(x) for x in args.docids.split(",") if x.strip()]
    else:
        field, _, vals = args.match.partition("=")
        if not vals:
            p.error("--match needs field=v1[,v2,...]")
        kw["match"] = (field.strip(), [v for v in vals.split(",") if v])

    spark = get_spark(app_name="dhr_delete_docs", master=args.master)
    man = delete_docs(spark, args.index_dir, **kw)
    out = {k: v for k, v in man.items() if k != "chunks"}
    out["n_chunks"] = len(man["chunks"])
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
