"""spark-submit entry: query-driven bulk mutations — Elasticsearch
``_update_by_query`` / ``_delete_by_query`` (index/byquery.py).

Matches documents by an analyzed OR query (optionally gated by a docvalues
filter over CURRENT values), then either sets docvalues on them without
reindexing or tombstones them:

    spark-submit --py-files dhr_spark.zip scripts/by_query.py \\
        --index-dir s3://bucket/index --query "error timeout" \\
        (--set status=retired [--set pop=0] | --delete [--mask-only]) \\
        [--filter-field pop --lo 0 --hi 10] [--filter-values a,b]

--set takes field=value pairs (values parsed as int, then float, else
string); --delete tombstones with exact stats unless --mask-only. Both are
no-ops when nothing matches, exactly like ES reporting updated/deleted: 0.

Local sandbox smoke:
    python scripts/by_query.py --index-dir /tmp/idx --query dup --delete
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _parse_val(s: str):
    for cast in (int, float):
        try:
            return cast(s)
        except ValueError:
            pass
    return s


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--index-dir", required=True)
    p.add_argument("--query", required=True)
    p.add_argument("--set", action="append", default=[],
                   metavar="FIELD=VALUE", help="update mode (repeatable)")
    p.add_argument("--delete", action="store_true", help="delete mode")
    p.add_argument("--mask-only", action="store_true",
                   help="delete without exact stats subtraction")
    p.add_argument("--filter-field", default=None)
    p.add_argument("--lo", type=_parse_val, default=None)
    p.add_argument("--hi", type=_parse_val, default=None)
    p.add_argument("--filter-values", default=None, help="comma-separated")
    p.add_argument("--master", default=None)
    args = p.parse_args()
    if bool(args.set) == bool(args.delete):
        p.error("pass exactly one of --set or --delete")

    from dhr_spark.index.byquery import delete_by_query, update_by_query
    from dhr_spark.session import get_spark

    spark = get_spark(app_name="dhr_by_query", master=args.master)
    vals = (
        [_parse_val(v) for v in args.filter_values.split(",")]
        if args.filter_values is not None
        else None
    )
    if args.delete:
        man = delete_by_query(
            spark, args.index_dir, args.query,
            filter_field=args.filter_field, lo=args.lo, hi=args.hi,
            values=vals, exact_stats=not args.mask_only,
        )
    else:
        assignments = {}
        for kv in args.set:
            f, _, v = kv.partition("=")
            if not _:
                p.error(f"--set needs FIELD=VALUE, got {kv!r}")
            assignments[f] = _parse_val(v)
        man = update_by_query(
            spark, args.index_dir, args.query, assignments,
            filter_field=args.filter_field, lo=args.lo, hi=args.hi,
            values=vals,
        )
    out = {k: v for k, v in man.items() if k != "chunks"}
    out["n_chunks"] = len(man["chunks"])
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
