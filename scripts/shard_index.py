"""spark-submit entry: build / append / query a RANGE-SHARDED index layout.

The time/tenant-partitioned deployment shape (dhr_spark/index/sharded.py):
one v2 index per key range, whole-shard pruning on ranged queries,
hot-shard appends under one global docid sequence.

    # build: one shard per key range over a generic (docid, text, key) corpus
    python scripts/shard_index.py build --input docs.parquet \\
        --root /idx/by_day --field day --cuts 1,2,3,4,5,6,7 \\
        --analyzer simple --chunk-bits 15

    # append a batch (text + key [+ docvalues]; docids allocated globally)
    python scripts/shard_index.py append --input new.parquet --root /idx/by_day

    # ranged query (prunes non-intersecting shards)
    python scripts/shard_index.py query --root /idx/by_day \\
        --queries q.tsv --lo 3 --hi 3 --k 1000 [--sim qld]

Cluster: spark-submit --py-files dhr_spark.zip scripts/shard_index.py ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("mode", choices=["build", "append", "query"])
    p.add_argument("--root", required=True, help="sharded layout root dir")
    p.add_argument("--input", help="parquet path (build: docid,text,<field>; "
                                   "append: text,<field>)")
    p.add_argument("--field", help="shard key column (build)")
    p.add_argument("--cuts", help="comma-separated ascending cut points (build)")
    p.add_argument("--analyzer", default="lucene",
                   choices=["lucene", "simple"])
    p.add_argument("--chunk-bits", type=int, default=17)
    p.add_argument("--block-size", type=int, default=128)
    p.add_argument("--queries", help="TSV qid\\ttext (query)")
    p.add_argument("--synthetic", type=int, default=0,
                   help="query: use N synthetic queries instead of --queries")
    p.add_argument("--lo", type=float, default=None)
    p.add_argument("--hi", type=float, default=None)
    p.add_argument("--k", type=int, default=1000)
    p.add_argument("--sim", default="bm25",
                   choices=["bm25", "qld", "lmjm", "f2exp", "f2log", "tfidf",
                            "inl2", "spl"])
    p.add_argument("--sim-param", type=float, default=None)
    p.add_argument("--output", help="query: write results parquet here")
    p.add_argument("--master", default=None)
    args = p.parse_args()

    from dhr_spark.session import get_spark

    spark = get_spark(app_name=f"dhr_shard_{args.mode}", master=args.master)
    t0 = time.time()

    if args.mode == "build":
        if not (args.input and args.field and args.cuts):
            p.error("build needs --input, --field, --cuts")
        from dhr_spark.index.sharded import build_range_sharded

        cuts = [
            int(c) if float(c).is_integer() else float(c)
            for c in args.cuts.split(",")
        ]
        root = build_range_sharded(
            spark, spark.read.parquet(args.input), args.root, args.field,
            cuts=cuts, analyzer_mode=args.analyzer,
            chunk_bits=args.chunk_bits, block_size=args.block_size,
        )
        print(json.dumps({
            "mode": "build", "seconds": round(time.time() - t0, 1),
            "shards": [
                {k: s[k] for k in ("lo", "hi", "n_docs")}
                for s in root["shards"]
            ],
        }))
    elif args.mode == "append":
        if not args.input:
            p.error("append needs --input")
        from dhr_spark.index.sharded import append_to_sharded

        res = append_to_sharded(
            spark, spark.read.parquet(args.input), args.root
        )
        print(json.dumps({
            "mode": "append", "seconds": round(time.time() - t0, 1),
            "base_docid": res["base"], "shards_touched": res["shards_touched"],
        }))
    else:
        from dhr_spark.index.sharded import ShardedSearcher
        from dhr_spark.sources.io import read_tsv_queries

        if args.synthetic:
            from dhr_spark.data.synthetic import synth_queries

            queries = synth_queries(spark, n_queries=args.synthetic)
        elif args.queries:
            queries = read_tsv_queries(spark, args.queries)
        else:
            p.error("query needs --queries or --synthetic")
        ss = ShardedSearcher(spark, args.root)
        lo = int(args.lo) if args.lo is not None and args.lo.is_integer() else args.lo
        hi = int(args.hi) if args.hi is not None and args.hi.is_integer() else args.hi
        sel = ss.select_shards(lo, hi) if (lo is not None or hi is not None) \
            else [(i, True) for i, s in enumerate(ss.shards) if s["dir"]]
        run = ss.search(queries, k=args.k, lo=lo, hi=hi,
                        sim=args.sim, sim_param=args.sim_param)
        if args.output:
            run.write.mode("overwrite").parquet(args.output)
            n = spark.read.parquet(args.output).count()
        else:
            n = run.count()
        print(json.dumps({
            "mode": "query", "seconds": round(time.time() - t0, 2),
            "rows": n, "shards_total": len([s for s in ss.shards if s["dir"]]),
            "shards_read": len(sel),
            "shards_full_wand": sum(1 for _i, full in sel if full),
        }))
    spark.stop()


if __name__ == "__main__":
    main()
