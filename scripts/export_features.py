"""spark-submit entry: export the learning-to-rank feature matrix
(operators/ltr.py) for a query file against a live index — the
training-data shape: first-pass BM25 top-k candidates per query, every
lexical similarity + match-shape feature per pair, written as parquet.

    spark-submit --py-files dhr_spark.zip scripts/export_features.py \\
        --index-dir s3://bucket/index --queries queries.tsv \\
        --output s3://bucket/features [--k 100] [--mu 1000] [--lam 0.1]

Query file: TSV (qid <tab> text) or parquet with (qid, text).
Local smoke: python scripts/export_features.py --index-dir /tmp/idx \\
    --synthetic-queries 20 --output /tmp/feats
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
    p.add_argument("--queries", help="TSV (qid\\ttext) or parquet")
    p.add_argument("--synthetic-queries", type=int, default=0)
    p.add_argument("--output", required=True)
    p.add_argument("--k", type=int, default=100)
    p.add_argument("--mu", type=float, default=1000.0)
    p.add_argument("--lam", type=float, default=0.1)
    p.add_argument("--master", default="local[8]")
    args = p.parse_args()

    from dhr_spark.operators.wand import Searcher
    from dhr_spark.session import get_spark

    spark = get_spark(master=args.master)
    if args.synthetic_queries:
        from dhr_spark.data.synthetic import synth_queries

        q = synth_queries(spark, args.synthetic_queries)
    elif args.queries:
        if args.queries.endswith(".parquet") or os.path.isdir(args.queries):
            q = spark.read.parquet(args.queries).select("qid", "text")
        else:
            from dhr_spark.sources.io import read_tsv_queries

            q = read_tsv_queries(spark, args.queries)
    else:
        p.error("need --queries or --synthetic-queries")
    s = Searcher(spark, args.index_dir)
    feats = s.ltr_features(q, k=args.k, mu=args.mu, lam=args.lam)
    feats.write.mode("overwrite").parquet(args.output)
    out = spark.read.parquet(args.output)
    print(json.dumps({
        "rows": out.count(),
        "queries": out.select("qid").distinct().count(),
        "columns": out.columns,
        "output": args.output,
    }))


if __name__ == "__main__":
    main()
