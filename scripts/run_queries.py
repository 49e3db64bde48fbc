"""spark-submit entry: run top-k queries against one or more built indexes.

    spark-submit --py-files dhr_spark.zip scripts/run_queries.py \\
        --index-dir s3://bucket/index \\
        --queries queries.tsv --k 1000 \\
        --output s3://bucket/run --trec

Repeat --index-dir to FEDERATE shard indexes (time/tenant partitions)
under exact merged global BM25 stats; --k1/--b override the similarity at
query time (no reindex); --rm3 / --phrases / --highlight select the
expansion, batch-phrase, and stored-field snippet modes; --rewrite runs
the multi-term rewrites (prefix/wildcard/fuzzy/regexp patterns, or mlt with the
query text holding the seed docid).

Local sandbox: python scripts/run_queries.py --index-dir /tmp/idx --synthetic 50
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--index-dir", required=True, action="append",
                   dest="index_dirs",
                   help="index directory; repeat the flag to federate "
                        "multiple shard indexes under merged global BM25 "
                        "stats (operators/federate.py)")
    p.add_argument("--queries", help="TSV qid\\ttext")
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--k", type=int, default=1000)
    p.add_argument("--output", help="output path (parquet, or text with --trec)")
    p.add_argument("--trec", action="store_true")
    p.add_argument("--no-prune", action="store_true",
                   help="disable block-max pruning (debug/verification)")
    p.add_argument("--qld", action="store_true",
                   help="rank with query-likelihood Dirichlet smoothing "
                        "(Lucene LMDirichletSimilarity) instead of BM25 — "
                        "same index, pluggable similarity")
    p.add_argument("--mu", type=float, default=1000.0,
                   help="QLD Dirichlet mu (default 1000, the Lucene/"
                        "Pyserini default)")
    p.add_argument("--lmjm", action="store_true",
                   help="rank with LM Jelinek-Mercer smoothing (Lucene "
                        "LMJelinekMercerSimilarity) — same index, third "
                        "pluggable similarity")
    p.add_argument("--lam", type=float, default=0.1,
                   help="Jelinek-Mercer lambda (default 0.1, Lucene's "
                        "title default; 0.7 for long text)")
    p.add_argument("--f2exp", action="store_true",
                   help="rank with axiomatic F2EXP (Anserini "
                        "AxiomaticF2EXP, Fang & Zhai 2005) — same index, "
                        "fourth pluggable similarity")
    p.add_argument("--f2exp-s", type=float, default=0.5,
                   help="F2EXP length-normalization s (default 0.5)")
    p.add_argument("--snapshot", type=int, default=None,
                   help="pin the searcher to an earlier committed manifest "
                        "snapshot (point-in-time read; ids from "
                        "index_stats.py or builder.list_snapshots)")
    p.add_argument("--f2log", action="store_true",
                   help="rank with axiomatic F2LOG (log idf) instead of "
                        "BM25; shares --f2exp-s")
    p.add_argument("--tfidf", action="store_true",
                   help="rank with Lucene ClassicSimilarity TF-IDF "
                        "(idf^2*sqrt(tf)/sqrt(dl)) instead of BM25")
    p.add_argument("--inl2", action="store_true",
                   help="rank with DFR InL2 instead of BM25 (uses --dfr-c)")
    p.add_argument("--dph", action="store_true",
                   help="rank with DFR DPH (parameter-free; "
                        "Searcher.search_dph)")
    p.add_argument("--spl", action="store_true",
                   help="rank with information-based SPL instead of BM25 "
                        "(ctf-bearing dictionary required; uses --dfr-c)")
    p.add_argument("--dfr-c", type=float, default=0.1,
                   help="normalization-2 c for --inl2/--spl (default 0.1)")
    p.add_argument("--fuse", default=None,
                   choices=["qld", "lmjm", "f2exp", "f2log", "tfidf",
                            "inl2", "spl", "dph"],
                   help="RRF-fuse BM25 with this second similarity over "
                        "the same index (search_fused, k_rrf=60)")
    p.add_argument("--f2exp-k", type=float, default=0.35,
                   help="F2EXP idf power-law exponent (default 0.35)")
    p.add_argument("--rocchio", action="store_true",
                   help="Rocchio PRF second pass (forward index required); "
                        "--fb-docs/--fb-terms set the positive arm, "
                        "--rocchio-gamma > 0 enables negative feedback")
    p.add_argument("--rocchio-alpha", type=float, default=1.0)
    p.add_argument("--rocchio-beta", type=float, default=0.75)
    p.add_argument("--rocchio-gamma", type=float, default=0.0)
    p.add_argument("--bottom-docs", type=int, default=10)
    p.add_argument("--fb-depth", type=int, default=50,
                   help="first-pass depth the feedback arms draw from")
    p.add_argument("--rm3", action="store_true",
                   help="BM25+RM3 expansion (index must have --forward-index)")
    p.add_argument("--phrases", action="store_true",
                   help="treat the query file as (qid, phrase) and run batch "
                        "EXACT-PHRASE search over the positions artifact "
                        "(index must have --positional); outputs "
                        "(qid, docid, n_matches, first_pos)")
    p.add_argument("--fb-docs", type=int, default=10)
    p.add_argument("--fb-terms", type=int, default=10)
    p.add_argument("--rm3-beta", type=float, default=0.5,
                   help="original-query interpolation weight")
    p.add_argument("--highlight", action="store_true",
                   help="attach keyword-in-context snippets from the stored "
                        "fields (index must have --stored); outputs "
                        "(qid, docid, rank, score, start, n_hits, snippet)")
    p.add_argument("--width", type=int, default=10,
                   help="snippet window width in tokens (--highlight)")
    p.add_argument("--rewrite",
                   choices=["prefix", "wildcard", "fuzzy", "regexp", "mlt"],
                   help="multi-term rewrite mode: the query text column "
                        "carries the pattern (prefix/wildcard/fuzzy) or the "
                        "seed docid (mlt; needs --forward-index at build)")
    p.add_argument("--max-expansions", type=int, default=None,
                   help="rewrite expansion cap (default: 1024, fuzzy 50)")
    p.add_argument("--max-edits", type=int, default=2,
                   help="fuzzy edit-distance bound")
    p.add_argument("--prefix-len", type=int, default=1,
                   help="fuzzy exact-prefix gate length")
    p.add_argument("--mlt-terms", type=int, default=10,
                   help="MoreLikeThis max query terms")
    p.add_argument("--min-should-match", type=int, default=0,
                   help="with --syntax: docs must satisfy at least this "
                        "many SHOULD clauses (Lucene "
                        "minimumNumberShouldMatch)")
    p.add_argument("--syntax", action="store_true",
                   help="parse the query text as Lucene classic syntax "
                        "(+must -not \"phrase\"~slop wild* fuzzy~edits) and "
                        "execute exactly; pure term queries still take the "
                        "WAND fast path")
    p.add_argument("--count", action="store_true",
                   help="emit exact total hit counts (qid, n) instead of "
                        "ranked results (Lucene count(); docid-blocks-only "
                        "decode, nothing scored)")
    p.add_argument("--explain", action="store_true",
                   help="emit the per-term score breakdown of the top-k "
                        "hits instead of the run (Lucene explain; index "
                        "must have --forward-index): (qid, docid, term, "
                        "qtf, tf, dl, idf, weight)")
    p.add_argument("--boost", metavar="FIELD", default=None,
                   help="FunctionScore: multiply relevance by the "
                        "saturation prior v/(v+scale) over this numeric "
                        "docvalues field (Lucene FeatureField)")
    p.add_argument("--boost-scale", type=float, default=250.0,
                   help="saturation pivot for --boost (factor 1/2 at "
                        "v == scale)")
    p.add_argument("--recency", metavar="FIELD", default=None,
                   help="recency boost: multiply relevance by the "
                        "half-life decay h/(h+age) over this epoch-seconds "
                        "docvalues field")
    p.add_argument("--now", type=int, default=None,
                   help="reference 'now' epoch seconds for --recency "
                        "(default: wall clock)")
    p.add_argument("--half-life", type=int, default=7 * 86400,
                   help="recency half-life in seconds (--recency)")
    p.add_argument("--rescore-window", type=int, default=None,
                   help="with --boost/--recency: rescore only the "
                        "relevance top-W (ES rescore); default exact")
    p.add_argument("--k1", type=float, default=None,
                   help="query-time BM25 k1 override (no reindex)")
    p.add_argument("--b", type=float, default=None,
                   help="query-time BM25 b override (no reindex)")
    p.add_argument("--master", default=None)
    args = p.parse_args()
    if (args.phrases or args.explain or args.count) and args.trec:
        p.error("--trec needs ranked (qid, docid, rank, score) output; "
                "--phrases/--explain/--count emit diagnostic row shapes")
    if args.boost and args.recency:
        p.error("--boost and --recency are mutually exclusive (one prior "
                "per query; compose offline if you need both)")
    if (args.boost or args.recency) and (
        args.rm3 or args.rocchio or args.fuse or args.phrases
        or args.highlight or args.rewrite or args.syntax
        or args.count or args.explain
    ):
        p.error("--boost/--recency compose with similarity flags "
                "(--qld/--lmjm/...) but not with --rm3/--rocchio/--fuse/"
                "--phrases/--highlight/--rewrite/--syntax/--count/--explain")
    # an alias directory (index/alias.py) expands to its member indexes —
    # searching an alias IS federation over its members
    expanded = []
    for d in args.index_dirs:
        if os.path.isfile(os.path.join(d, "alias.json")):
            from dhr_spark.index.alias import load_alias

            expanded.extend(load_alias(d)["members"])
        else:
            expanded.append(d)
    args.index_dirs = expanded

    if len(args.index_dirs) > 1 and (
        args.phrases or args.rm3 or args.rocchio or args.qld
        or args.lmjm or args.f2exp or args.f2log or args.tfidf
        or args.inl2 or args.spl or args.dph or args.fuse
        or args.highlight
        or args.rewrite or args.explain or args.count or args.syntax
    ):
        p.error("federated (multiple --index-dir) currently serves ranked "
                "search only; run --phrases/--rm3/--rocchio/--highlight/"
                "--rewrite/--explain/--count per shard")

    from dhr_spark.session import get_spark
    from dhr_spark.operators.wand import Searcher
    from dhr_spark.sources.io import read_tsv_queries, write_trec_run

    spark = get_spark(app_name="dhr_run_queries", master=args.master)
    if args.synthetic:
        from dhr_spark.data.synthetic import synth_queries

        queries = synth_queries(spark, n_queries=args.synthetic)
    else:
        queries = read_tsv_queries(spark, args.queries)

    # similarity selection shared by the plain and boost/recency paths
    sim, sim_param = "bm25", None
    if args.qld:
        sim, sim_param = "qld", args.mu
    elif args.lmjm:
        sim, sim_param = "lmjm", args.lam
    elif args.f2exp:
        sim, sim_param = "f2exp", args.f2exp_s
    elif args.f2log:
        sim, sim_param = "f2log", args.f2exp_s
    elif args.tfidf:
        sim, sim_param = "tfidf", None
    elif args.inl2:
        sim, sim_param = "inl2", args.dfr_c
    elif args.spl:
        sim, sim_param = "spl", args.dfr_c
    elif args.dph:
        sim, sim_param = "dph", None
    if (args.boost or args.recency) and sim != "bm25" and len(
        args.index_dirs
    ) > 1:
        p.error("federated --boost/--recency currently scores BM25 only "
                "(MultiSearcher.search_boosted has no sim=); drop the "
                "similarity flag or query per shard")

    t0 = time.time()
    if len(args.index_dirs) > 1:
        from dhr_spark.operators.federate import MultiSearcher

        ms = MultiSearcher(spark, args.index_dirs, k1=args.k1, b=args.b)
        if args.boost:
            run = ms.search_boosted(
                queries, args.boost, scale=args.boost_scale, k=args.k,
                window=args.rescore_window, prune=not args.no_prune,
            )
        elif args.recency:
            run = ms.search_recency(
                queries, args.recency,
                now=args.now if args.now is not None else int(time.time()),
                half_life_s=args.half_life, k=args.k,
                window=args.rescore_window, prune=not args.no_prune,
            )
        else:
            run = ms.search(queries, k=args.k, prune=not args.no_prune)
    else:
        searcher = Searcher(
            spark, args.index_dirs[0], k1=args.k1, b=args.b,
            snapshot=args.snapshot,
        )
        if args.phrases:
            run = searcher.search_phrase_batch(
                queries.withColumnRenamed("text", "phrase")
            )
        elif args.boost:
            # takes precedence over the similarity flags, which feed its
            # sim= (e.g. --boost n_chars --qld = QLD-relevance FunctionScore)
            run = searcher.search_boosted(
                queries, args.boost, scale=args.boost_scale, k=args.k,
                window=args.rescore_window, sim=sim, sim_param=sim_param,
                prune=not args.no_prune,
            )
        elif args.recency:
            run = searcher.search_recency(
                queries, args.recency,
                now=args.now if args.now is not None else int(time.time()),
                half_life_s=args.half_life, k=args.k,
                window=args.rescore_window, sim=sim, sim_param=sim_param,
                prune=not args.no_prune,
            )
        elif args.qld:
            run = searcher.search_qld(
                queries, k=args.k, mu=args.mu, prune=not args.no_prune,
            )
        elif args.f2exp:
            run = searcher.search_f2exp(
                queries, k=args.k, s=args.f2exp_s, kexp=args.f2exp_k,
                prune=not args.no_prune,
            )
        elif args.f2log:
            run = searcher.search_f2log(
                queries, k=args.k, s=args.f2exp_s, prune=not args.no_prune,
            )
        elif args.tfidf:
            run = searcher.search_tfidf(
                queries, k=args.k, prune=not args.no_prune,
            )
        elif args.inl2:
            run = searcher.search_inl2(
                queries, k=args.k, c=args.dfr_c, prune=not args.no_prune,
            )
        elif args.spl:
            run = searcher.search_spl(
                queries, k=args.k, c=args.dfr_c, prune=not args.no_prune,
            )
        elif args.dph:
            run = searcher.search_dph(
                queries, k=args.k, prune=not args.no_prune,
            )
        elif args.fuse:
            run = searcher.search_fused(
                queries, sims=["bm25", args.fuse], k=args.k,
                prune=not args.no_prune,
            )
        elif args.lmjm:
            run = searcher.search_lmjm(
                queries, k=args.k, lam=args.lam, prune=not args.no_prune,
            )
        elif args.rocchio:
            run = searcher.search_rocchio(
                queries, k=args.k, fb_docs=args.fb_docs,
                fb_terms=args.fb_terms, alpha=args.rocchio_alpha,
                beta=args.rocchio_beta, gamma=args.rocchio_gamma,
                bottom_docs=args.bottom_docs, fb_depth=args.fb_depth,
                prune=not args.no_prune,
            )
        elif args.rm3:
            run = searcher.search_rm3(
                queries, k=args.k, fb_docs=args.fb_docs,
                fb_terms=args.fb_terms, orig_weight=args.rm3_beta,
                prune=not args.no_prune,
            )
        elif args.highlight:
            run = searcher.highlight(queries, k=args.k, width=args.width)
        elif args.rewrite:
            pairs = [(r["qid"], r["text"]) for r in queries.collect()]
            prune = not args.no_prune
            if args.rewrite == "mlt":
                run = searcher.search_like(
                    [(q, int(t)) for q, t in pairs], k=args.k,
                    max_query_terms=args.mlt_terms, prune=prune,
                )
            elif args.rewrite == "fuzzy":
                run = searcher.search_fuzzy(
                    pairs, k=args.k, max_edits=args.max_edits,
                    prefix_len=args.prefix_len,
                    max_expansions=args.max_expansions or 50, prune=prune,
                )
            else:
                fn = {"prefix": searcher.search_prefix,
                      "wildcard": searcher.search_wildcard,
                      "regexp": searcher.search_regexp}[args.rewrite]
                run = fn(pairs, k=args.k,
                         max_expansions=args.max_expansions or 1024,
                         prune=prune)
        elif args.syntax:
            run = searcher.search_syntax(
                queries, k=args.k,
                min_should_match=args.min_should_match,
            )
        elif args.count:
            run = searcher.count(queries)
        elif args.explain:
            run = searcher.explain(
                queries, searcher.search(queries, k=args.k,
                                         prune=not args.no_prune)
            )
        elif getattr(searcher, "_scoring", "bm25") == "impact":
            # learned-sparse index (index/impact.py): the manifest says the
            # postings carry integer impacts, so plain queries route to
            # impact scoring automatically (similarity flags are refused by
            # the Searcher with a pointed error)
            run = searcher.search_impact(
                queries, k=args.k, prune=not args.no_prune
            )
        else:
            run = searcher.search(queries, k=args.k, prune=not args.no_prune)
    if args.output:
        if args.trec:
            write_trec_run(run, args.output)
        else:
            run.write.mode("overwrite").parquet(args.output)
        n = spark.read.parquet(args.output).count() if not args.trec else -1
    else:
        n = run.count()
    dt = time.time() - t0
    nq = queries.count()
    print(f"{nq} queries, k={args.k}: {dt:.2f}s "
          f"({nq / dt:.2f} q/s), {n} result rows")
    spark.stop()


if __name__ == "__main__":
    main()
