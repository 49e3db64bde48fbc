"""spark-submit entry: evaluate a TREC run against qrels — the engine's twin
of the reference's eval flow (`pyserini.eval.trec_eval -c -M 10 -m recip_rank
-m recall.1000` + `retrieval.rcap_eval`, /root/reference/docs/dhr/
msmarco-passage-train-eval.md:150-155, beir-eval.md:103-106), computed as
DataFrame aggregates so a million-query eval is a handful of shuffles.

    spark-submit --py-files dhr_spark.zip scripts/evaluate.py \\
        --run s3://bucket/run --qrels qrels.tsv --k 10 1000

Local sandbox:
    python scripts/run_queries.py --index-dir /tmp/idx --synthetic 50 \\
        --k 100 --output /tmp/run --trec
    python scripts/evaluate.py --run /tmp/run --qrels qrels.tsv

Prints one JSON line per cutoff with the mean of every metric the reference
reports (MRR, Recall, NDCG, MAP, R_cap, Hole, Acc) plus, at cutoffs <= 10
(the exact-arithmetic window), the graded-judgment trio bpref / ERR / RBP;
per-query output via --per-query.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


METRICS = {
    "mrr": ("mrr_at_k", "rr"),
    "recall": ("recall_at_k", "recall"),
    "ndcg": ("ndcg_at_k", "ndcg"),
    "map": ("map_at_k", "ap"),
    "r_cap": ("recall_cap_at_k", "r_cap"),
    "hole": ("hole_at_k", "hole"),
    "acc": ("top_k_accuracy_at_k", "acc"),
    "p": ("precision_at_k", "prec"),
    "judged": ("judged_at_k", "judged"),
}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--run", required=True, help="TREC run file/dir")
    p.add_argument("--qrels", required=True, help="qrels TSV (qid 0 docid rel)")
    p.add_argument("--k", type=int, nargs="+", default=[10],
                   help="cutoff depths (one JSON line each)")
    p.add_argument("--per-query", help="optional parquet output of per-query rows")
    p.add_argument("--compare", default=None,
                   help="second TREC run: adds a paired Student's t over "
                        "per-query diffs for every metric (run minus "
                        "compare; shared queries only)")
    p.add_argument("--master", default=None)
    args = p.parse_args()

    from dhr_spark.functions import metrics as M
    from dhr_spark.session import get_spark
    from dhr_spark.sources.io import read_qrels, read_trec_run

    spark = get_spark(app_name="dhr_evaluate", master=args.master)
    run = read_trec_run(spark, args.run).cache()
    qrels = read_qrels(spark, args.qrels).cache()

    run_b = (
        read_trec_run(spark, args.compare).cache() if args.compare else None
    )
    for k in args.k:
        out = {"k": k, "n_queries": run.select("qid").distinct().count()}
        per_query = None
        for name, (fn, col) in METRICS.items():
            pq = getattr(M, fn)(run, qrels, k=k)
            out[name] = float(
                M.mean_metric(pq, col).collect()[0][f"mean_{col}"]
            )
            if run_b is not None:
                cmp_row = M.paired_diff_test(
                    pq, getattr(M, fn)(run_b, qrels, k=k), col
                ).collect()[0]
                out[f"{name}_diff"] = float(cmp_row["mean_diff"])
                out[f"{name}_t"] = (
                    None if cmp_row["t_stat"] is None
                    else round(float(cmp_row["t_stat"]), 4)
                )
            if args.per_query:
                per_query = pq if per_query is None else per_query.join(
                    pq, "qid", "full_outer"
                )
        if k <= 10:
            # graded-judgment metrics, exact only inside the lcm(1..10)
            # window: bpref (judged rel=0 rows are its whole point), the
            # ERR cascade (graded gains), and RBP (p = 1/2 persistence)
            for name, fn, col, kw in (
                ("bpref", M.bpref_at_k, "bpref", {}),
                ("err", M.err_at_k, "err", {"max_grade": 4}),
                ("rbp", M.rbp_at_k, "rbp", {"p_sixteenths": 8}),
            ):
                pq = fn(run, qrels, k=k, **kw)
                out[name] = float(
                    M.mean_metric(pq, col).collect()[0][f"mean_{col}"]
                )
                if run_b is not None:
                    cmp_row = M.paired_diff_test(
                        pq, fn(run_b, qrels, k=k, **kw), col
                    ).collect()[0]
                    out[f"{name}_diff"] = float(cmp_row["mean_diff"])
                    out[f"{name}_t"] = (
                        None if cmp_row["t_stat"] is None
                        else round(float(cmp_row["t_stat"]), 4)
                    )
                if args.per_query:
                    per_query = pq if per_query is None else per_query.join(
                        pq, "qid", "full_outer"
                    )
        # 11-point interpolated precision-recall curve (trec_eval
        # iprec_at_recall_*): mean over queries at each recall level
        from pyspark.sql import functions as F

        curve = (
            M.iprec_at_recall(run, qrels, k=k)
            .groupBy("level")
            .agg(F.round(F.avg("iprec"), 6).alias("m"))
            .collect()
        )
        out["iprec_at_recall"] = {
            f"{r['level'] / 10:.1f}": float(r["m"])
            for r in sorted(curve, key=lambda r: r["level"])
        }
        if run_b is not None and k <= 10:
            # rank-biased overlap of the two runs' top-k prefixes (exact
            # at k <= 10 — metrics.rbo_at_k's lcm window); the rank-
            # similarity complement to the score-diff t-tests above
            rbo_pq = M.rbo_at_k(run, run_b, k=k)
            out["rbo"] = float(
                M.mean_metric(rbo_pq, "rbo").collect()[0]["mean_rbo"]
            )
        if args.per_query:
            per_query.write.mode("overwrite").parquet(
                f"{args.per_query.rstrip('/')}/k={k}"
            )
        print(json.dumps(out))

    spark.stop()


if __name__ == "__main__":
    main()
