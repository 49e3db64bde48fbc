"""spark-submit entry: index aliases with ILM rollover (index/alias.py).

Create an alias over existing member indexes:

    spark-submit --py-files dhr_spark.zip scripts/alias_index.py create \\
        --alias-dir s3://bucket/alias --members idx1 idx2 [--write idx2]

Append a transcript batch through the alias (rolls a new member when the
write member holds --max-docs live docs):

    spark-submit --py-files dhr_spark.zip scripts/alias_index.py append \\
        --alias-dir s3://bucket/alias --batch <path or table> \\
        [--max-docs 100000000]

Show the committed alias record:

    python scripts/alias_index.py show --alias-dir /tmp/alias

Local sandbox smoke: python scripts/alias_index.py append \\
    --alias-dir /tmp/alias --synthetic 50 --max-docs 1000
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("action", choices=["create", "append", "show"])
    p.add_argument("--alias-dir", required=True)
    p.add_argument("--members", nargs="*", default=[])
    p.add_argument("--write")
    p.add_argument("--batch", help="new turns (path or table)")
    p.add_argument("--format", default="parquet",
                   choices=["parquet", "iceberg"])
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--max-docs", type=int)
    p.add_argument("--master", default="local[8]")
    args = p.parse_args()

    from dhr_spark.index.alias import (
        append_to_alias, create_alias, load_alias,
    )

    if args.action == "show":
        print(json.dumps(load_alias(args.alias_dir)))
        return
    if args.action == "create":
        rec = create_alias(args.alias_dir, args.members, write=args.write)
        print(json.dumps(rec))
        return

    from dhr_spark.session import get_spark

    spark = get_spark(master=args.master)
    if args.synthetic:
        from dhr_spark.data.synthetic import synth_transcripts

        batch = synth_transcripts(spark, args.synthetic, seed=7)
    elif args.batch:
        from dhr_spark.sources.transcripts import read_transcripts

        batch = read_transcripts(
            spark, args.batch,
            fmt="table" if args.format == "iceberg" else "parquet",
        )
    else:
        p.error("append needs --batch or --synthetic")
    rec = append_to_alias(spark, batch, args.alias_dir,
                          max_docs=args.max_docs)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
