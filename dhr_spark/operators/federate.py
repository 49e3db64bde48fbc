"""Federated search over multiple indexes — the Lucene MultiReader /
sharded-serving analogue.

Why: a 10^12-turn deployment does not maintain one monolithic index; it
partitions by time (daily/weekly indexes) or tenant, appends to the hot
partition, and retires cold ones. Queries must still rank GLOBALLY — BM25
idf and avgdl are corpus-wide functions, and scoring each shard under its
local stats silently skews rankings toward small shards (a term rare in
one shard but common overall gets an inflated idf there).

The stats-free v2 segment layout makes exact global scoring a pure
query-time composition: segments store raw (tf, dl) and the per-block
(max_tf, min_dl) bound is admissible under ANY (idf, avgdl), so federating
N indexes needs no re-encoding — only merged statistics:

    df_g(term)  = sum_i df_i(term)        (term dictionaries, full outer)
    n_docs_g    = sum_i n_docs_i
    avgdl_g     = sum_i total_dl_i / n_docs_g
    idf_g       = bm25-idf(df_g, n_docs_g)

Each member Searcher then runs its ordinary block-max WAND pass with the
GLOBAL stats injected (Searcher(corpus_stats=...)), and the per-index
top-k streams merge losslessly into the global top-k — the same
shard-merge contract the chunk layer already uses inside one index
(reference anchor: per-shard result merge, /root/reference/retrieval/
merge_result.py + SURVEY.md T5). Scores are IDENTICAL to a single index
built over the union corpus (tests/test_federate.py).

Scale shape: stats merge is one |V|-sized groupBy at MultiSearcher
construction (cacheable, refreshed only when a member index changes);
per-query work is N independent WAND passes + a k·N-row merge per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dhr_spark.functions.bm25 import idf_col
from dhr_spark.index.builder import load_manifest
from dhr_spark.operators.topk import topk
from dhr_spark.operators.wand import Searcher

# index_id lives above the docid bits in the merge's tie-break key; v2
# docids are < 2^48 by construction (chunk_bits <= 31, chunks < 2^17)
_INDEX_SHIFT = 48


class MultiSearcher:
    """Search N v2 indexes as one logical corpus with exact global BM25.

    All member indexes must share the analyzer mode (a query analyzes to
    the same terms everywhere) and the v2 layout. k1/b overrides apply to
    every member uniformly.
    """

    def __init__(
        self,
        spark: SparkSession,
        index_dirs: list[str],
        cache: bool = True,
        k1: float | None = None,
        b: float | None = None,
    ):
        if not index_dirs:
            raise ValueError("MultiSearcher needs at least one index dir")
        self.spark = spark
        self.index_dirs = list(index_dirs)
        mans = []
        for d in index_dirs:
            man = load_manifest(d)
            if man is None:
                raise FileNotFoundError(f"no manifest in {d}")
            if int(man.get("version", 1)) < 2:
                raise ValueError(f"index at {d} is pre-v2; rebuild it")
            mans.append(man)
        modes = {m["analyzer_mode"] for m in mans}
        if len(modes) > 1:
            raise ValueError(
                f"member indexes disagree on analyzer_mode ({sorted(modes)}) "
                "— a query would tokenize differently per shard"
            )

        n_docs_g = sum(int(m["n_docs"]) for m in mans)
        total_dl_g = sum(int(m["total_dl"]) for m in mans)
        avgdl_g = total_dl_g / n_docs_g
        self.n_docs = n_docs_g
        self.avgdl = avgdl_g

        # global df (and ctf, when every member has it): full-outer merge of
        # the member term dictionaries — one |V|-row groupBy, done once per
        # MultiSearcher. Global ctf + total_dl make QLD a federated
        # similarity too (search_qld scores every shard under the merged
        # collection LM, exactly like idf/avgdl federate BM25).
        union = None
        all_ctf = True
        for d, m in zip(index_dirs, mans):
            td_raw = spark.read.parquet(
                f"{d}/{m.get('term_dict_dir', 'term_dict')}"
            )
            if "ctf" not in td_raw.columns:
                all_ctf = False
            union_cols = ["term", "df"] + (
                ["ctf"] if "ctf" in td_raw.columns else []
            )
            td = td_raw.select(*union_cols)
            if "ctf" not in td.columns:
                td = td.withColumn("ctf", F.lit(None).cast("long"))
            union = td if union is None else union.unionByName(td)
        merged = union.groupBy("term").agg(
            F.sum("df").alias("df"), F.sum("ctf").alias("ctf")
        )
        idf_g = merged.withColumn(
            "idf", idf_col(F.col("df"), F.lit(n_docs_g))
        ).select("term", "idf", "ctf", "df")
        total_terms = sum(int(m.get("n_terms", 0)) for m in mans)
        # merged df + global n_docs make F2EXP a federated similarity too
        # (search_f2exp scores every shard under the global power-law idf)
        stats: dict = {"avgdl": avgdl_g, "n_docs": n_docs_g}
        if all_ctf:
            stats["total_dl"] = total_dl_g
        if total_terms <= 2_000_000:
            # small vocabulary: ship the merged stats as driver dicts so
            # each member's query prep stays zero-Spark-jobs (tid cache)
            rows = idf_g.collect()
            stats["idf"] = {r["term"]: float(r["idf"]) for r in rows}
            stats["df"] = {r["term"]: int(r["df"]) for r in rows}
            if all_ctf:
                stats["ctf"] = {r["term"]: int(r["ctf"]) for r in rows}
        else:
            cached = idf_g.cache()
            stats["idf"] = cached.select("term", "idf")
            stats["df"] = cached.select("term", "df")
            if all_ctf:
                stats["ctf"] = cached.select("term", "ctf")
        self.searchers = [
            Searcher(spark, d, cache=cache, k1=k1, b=b, corpus_stats=stats)
            for d in index_dirs
        ]

    def search(
        self, queries: DataFrame, k: int = 1000, prune: bool = True
    ) -> DataFrame:
        """queries (qid, text) -> (qid, index_id, docid, rank, score):
        global top-k across all member indexes under merged statistics.

        Each member returns its local top-k (sufficient: the global top-k
        per query is a subset of the union of local top-ks), then one
        k·N-row merge re-ranks globally. Ties break (score desc, index_id
        asc, docid asc) — the member-order analogue of the single-index
        docid tie-break."""
        per = [
            s.search(queries, k=k, prune=prune)
            .withColumn("index_id", F.lit(i))
            for i, s in enumerate(self.searchers)
        ]
        u = per[0]
        for p in per[1:]:
            u = u.unionByName(p)
        # reuse the exact single-index top-k ordering by packing the
        # tie-break into a synthetic global docid (index above docid bits)
        merged = topk(
            u.select(
                "qid",
                (
                    F.shiftleft(F.col("index_id").cast("long"), _INDEX_SHIFT)
                    + F.col("docid")
                ).alias("docid"),
                "score",
            ),
            k,
        )
        return self._unpack(merged)

    def search_phrase(self, phrase: str, slop: int = 0) -> DataFrame:
        """(index_id, docid, n_matches, first_pos): federated phrase
        matching — positional matching is STATISTICS-FREE (no df/idf in
        the result), so federation is a plain union of per-member matches;
        every member needs the positional artifact. Identical rows to
        search_phrase on a union-corpus index (modulo the member-local
        docid spaces the index_id column disambiguates)."""
        per = [
            s.search_phrase(phrase, slop=slop).withColumn(
                "index_id", F.lit(i)
            )
            for i, s in enumerate(self.searchers)
        ]
        u = per[0]
        for p in per[1:]:
            u = u.unionByName(p)
        return u.select("index_id", "docid", "n_matches", "first_pos")

    def search_phrase_prefix(
        self, phrase: str, max_expansions: int = 50
    ) -> DataFrame:
        """(index_id, docid, n_matches, first_pos): federated
        match_phrase_prefix. The expansion set must be GLOBAL for identity
        with a union-corpus index (a per-member term-ASC cap could admit
        different completions per shard), so the members' dictionaries
        merge under one term-ASC cap first — each member contributes its
        own capped candidate slice (the global top-N is a subset of the
        union of per-member top-Ns), then matches only the merged set via
        the ``expansions`` hook."""
        from dhr_spark.functions.analyzer import analyze_positions

        mode = self.searchers[0].manifest["analyzer_mode"]
        pairs = analyze_positions(mode, phrase)
        if not pairs:
            raise ValueError(f"phrase {phrase!r} has no indexable terms")
        prefix = pairs[-1][1]
        cands: set[str] = set()
        for s in self.searchers:
            if s._tid_cache is not None:
                member = sorted(
                    t for t in s._tid_cache if t.startswith(prefix)
                )[:max_expansions]
            else:
                member = [
                    r["term"]
                    for r in s._tdict.filter(
                        F.col("term").startswith(prefix)
                    )
                    .orderBy("term")
                    .limit(max_expansions)
                    .collect()
                ]
            cands.update(member)
        merged = sorted(cands)[:max_expansions]
        per = [
            s.search_phrase_prefix(phrase, expansions=merged).withColumn(
                "index_id", F.lit(i)
            )
            for i, s in enumerate(self.searchers)
        ]
        u = per[0]
        for p in per[1:]:
            u = u.unionByName(p)
        return u.select("index_id", "docid", "n_matches", "first_pos")

    def search_qld(
        self, queries: DataFrame, k: int = 1000,
        mu: float = 1000.0, prune: bool = True,
    ) -> DataFrame:
        """Federated QLD: every member scores under the MERGED collection
        LM (global ctf/total_dl) — score-identical to search_qld on a
        union-corpus index, by the same argument as BM25 federation (the
        per-doc weight depends only on tf, dl and global stats). Raises if
        any member dictionary predates the ctf column."""
        per = [
            s.search_qld(queries, k=k, mu=mu, prune=prune)
            .withColumn("index_id", F.lit(i))
            for i, s in enumerate(self.searchers)
        ]
        u = per[0]
        for p in per[1:]:
            u = u.unionByName(p)
        merged = topk(
            u.select(
                "qid",
                (
                    F.shiftleft(F.col("index_id").cast("long"), _INDEX_SHIFT)
                    + F.col("docid")
                ).alias("docid"),
                "score",
            ),
            k,
        )
        return self._unpack(merged)

    def search_lmjm(
        self, queries: DataFrame, k: int = 1000,
        lam: float = 0.1, prune: bool = True,
    ) -> DataFrame:
        """Federated LM Jelinek-Mercer — same merged collection LM
        (ctf/total_dl) as search_qld, same union-index identity argument."""
        per = [
            s.search_lmjm(queries, k=k, lam=lam, prune=prune)
            .withColumn("index_id", F.lit(i))
            for i, s in enumerate(self.searchers)
        ]
        u = per[0]
        for p in per[1:]:
            u = u.unionByName(p)
        merged = topk(
            u.select(
                "qid",
                (
                    F.shiftleft(F.col("index_id").cast("long"), _INDEX_SHIFT)
                    + F.col("docid")
                ).alias("docid"),
                "score",
            ),
            k,
        )
        return self._unpack(merged)

    def search_f2exp(
        self, queries: DataFrame, k: int = 1000,
        s: float = 0.5, kexp: float = 0.35, prune: bool = True,
    ) -> DataFrame:
        """Federated axiomatic F2EXP — every member scores under the merged
        df/n_docs (global power-law idf), same union-index identity argument
        as BM25/QLD federation."""
        per = [
            sr.search_f2exp(queries, k=k, s=s, kexp=kexp, prune=prune)
            .withColumn("index_id", F.lit(i))
            for i, sr in enumerate(self.searchers)
        ]
        u = per[0]
        for p in per[1:]:
            u = u.unionByName(p)
        merged = topk(
            u.select(
                "qid",
                (
                    F.shiftleft(F.col("index_id").cast("long"), _INDEX_SHIFT)
                    + F.col("docid")
                ).alias("docid"),
                "score",
            ),
            k,
        )
        return self._unpack(merged)

    def search_f2log(
        self, queries: DataFrame, k: int = 1000,
        s: float = 0.5, prune: bool = True,
    ) -> DataFrame:
        """Federated axiomatic F2LOG — every member scores under the merged
        df/n_docs (global log idf), same union-index identity argument as
        F2EXP federation (the df/n_docs override feeds both shapes)."""
        per = [
            sr.search_f2log(queries, k=k, s=s, prune=prune)
            .withColumn("index_id", F.lit(i))
            for i, sr in enumerate(self.searchers)
        ]
        u = per[0]
        for p in per[1:]:
            u = u.unionByName(p)
        merged = topk(
            u.select(
                "qid",
                (
                    F.shiftleft(F.col("index_id").cast("long"), _INDEX_SHIFT)
                    + F.col("docid")
                ).alias("docid"),
                "score",
            ),
            k,
        )
        return self._unpack(merged)

    def search_tfidf(
        self, queries: DataFrame, k: int = 1000, prune: bool = True,
    ) -> DataFrame:
        """Federated ClassicSimilarity TF-IDF — every member scores under
        the merged df/n_docs (global idf²), same union-index identity
        argument as the axiomatic federations (the df/n_docs override
        feeds every df-derived stat shape)."""
        per = [
            sr.search_tfidf(queries, k=k, prune=prune)
            .withColumn("index_id", F.lit(i))
            for i, sr in enumerate(self.searchers)
        ]
        u = per[0]
        for p in per[1:]:
            u = u.unionByName(p)
        merged = topk(
            u.select(
                "qid",
                (
                    F.shiftleft(F.col("index_id").cast("long"), _INDEX_SHIFT)
                    + F.col("docid")
                ).alias("docid"),
                "score",
            ),
            k,
        )
        return self._unpack(merged)

    def search_inl2(
        self, queries: DataFrame, k: int = 1000,
        c: float = 0.1, prune: bool = True,
    ) -> DataFrame:
        """Federated DFR InL2 — every member scores under the merged
        df/n_docs (global log2((N+1)/(df+0.5)) stat), same union-index
        identity argument as the axiomatic federations (the df/n_docs
        override feeds every df-derived stat shape)."""
        per = [
            sr.search_inl2(queries, k=k, c=c, prune=prune)
            .withColumn("index_id", F.lit(i))
            for i, sr in enumerate(self.searchers)
        ]
        u = per[0]
        for p in per[1:]:
            u = u.unionByName(p)
        merged = topk(
            u.select(
                "qid",
                (
                    F.shiftleft(F.col("index_id").cast("long"), _INDEX_SHIFT)
                    + F.col("docid")
                ).alias("docid"),
                "score",
            ),
            k,
        )
        return self._unpack(merged)

    def search_spl(
        self, queries: DataFrame, k: int = 1000,
        c: float = 0.1, prune: bool = True,
    ) -> DataFrame:
        """Federated information-based SPL — every member scores under the
        merged ctf/n_docs (global λ = min(ctf/N, 1−1e−6)), extending the
        QLD/LMJM merged-collection-LM contract with the per-document
        denominator. avgdl federates through the same merged override."""
        per = [
            sr.search_spl(queries, k=k, c=c, prune=prune)
            .withColumn("index_id", F.lit(i))
            for i, sr in enumerate(self.searchers)
        ]
        u = per[0]
        for p in per[1:]:
            u = u.unionByName(p)
        merged = topk(
            u.select(
                "qid",
                (
                    F.shiftleft(F.col("index_id").cast("long"), _INDEX_SHIFT)
                    + F.col("docid")
                ).alias("docid"),
                "score",
            ),
            k,
        )
        return self._unpack(merged)

    def search_dph(
        self, queries: DataFrame, k: int = 1000, prune: bool = True,
    ) -> DataFrame:
        """Federated DFR DPH — parameter-free; every member scores under
        the merged ctf/n_docs (global λ = ctf/N) and merged avgdl, the
        same override contract as federated SPL, so the federation is
        score-identical to a union-corpus index under DPH."""
        per = [
            sr.search_dph(queries, k=k, prune=prune)
            .withColumn("index_id", F.lit(i))
            for i, sr in enumerate(self.searchers)
        ]
        u = per[0]
        for p in per[1:]:
            u = u.unionByName(p)
        merged = topk(
            u.select(
                "qid",
                (
                    F.shiftleft(F.col("index_id").cast("long"), _INDEX_SHIFT)
                    + F.col("docid")
                ).alias("docid"),
                "score",
            ),
            k,
        )
        return self._unpack(merged)

    @staticmethod
    def _unpack(merged: DataFrame) -> DataFrame:
        return merged.select(
            "qid",
            F.shiftright(F.col("docid"), _INDEX_SHIFT)
            .cast("int")
            .alias("index_id"),
            (F.col("docid") - F.shiftleft(
                F.shiftright(F.col("docid"), _INDEX_SHIFT), _INDEX_SHIFT
            )).alias("docid"),
            "rank",
            "score",
        )

    def search_filtered(
        self,
        queries: DataFrame,
        field: str,
        lo=None,
        hi=None,
        values: list | None = None,
        k: int = 1000,
    ) -> DataFrame:
        """Federated docvalues-filtered search (Searcher.search_filtered):
        each member scores exhaustively under the merged global stats and
        gates by its own doc_map column, so the union of local filtered
        top-ks contains the global filtered top-k — the same subset
        argument as ``search``, and score-identical to a union-corpus
        index (tests/test_federate.py)."""
        per = [
            s.search_filtered(queries, field, lo=lo, hi=hi, values=values, k=k)
            .withColumn("index_id", F.lit(i))
            for i, s in enumerate(self.searchers)
        ]
        u = per[0]
        for p in per[1:]:
            u = u.unionByName(p)
        merged = topk(
            u.select(
                "qid",
                (
                    F.shiftleft(F.col("index_id").cast("long"), _INDEX_SHIFT)
                    + F.col("docid")
                ).alias("docid"),
                "score",
            ),
            k,
        )
        return self._unpack(merged)

    def search_boosted(
        self,
        queries: DataFrame,
        field: str,
        scale: float = 250.0,
        k: int = 1000,
        window: int | None = None,
        prune: bool = True,
    ) -> DataFrame:
        """Federated FunctionScore (Searcher.search_boosted): each member
        boosts its own docvalues column under the merged global relevance
        stats. Exact mode (window=None) is score-identical to a
        union-corpus index — per-member boosted sets are exhaustive, so
        the union of local boosted top-ks contains the global boosted
        top-k. Window mode rescopes the ES rescore window PER MEMBER
        (N·window candidates globally — at least as accurate as a single
        index's window)."""
        per = [
            s.search_boosted(
                queries, field, scale=scale, k=k, window=window, prune=prune
            ).withColumn("index_id", F.lit(i))
            for i, s in enumerate(self.searchers)
        ]
        return self._merge_raw(per, k)

    def search_recency(
        self,
        queries: DataFrame,
        field: str,
        now: int,
        half_life_s: int = 7 * 86400,
        k: int = 1000,
        window: int | None = None,
        prune: bool = True,
    ) -> DataFrame:
        """Federated recency boosting — the time-partitioned deployment's
        natural query: cold shards surface only when relevance beats the
        decay. Same identity argument as search_boosted; ``now`` is shared
        so every member decays against the same clock."""
        per = [
            s.search_recency(
                queries, field, now=now, half_life_s=half_life_s, k=k,
                window=window, prune=prune,
            ).withColumn("index_id", F.lit(i))
            for i, s in enumerate(self.searchers)
        ]
        return self._merge_raw(per, k)

    def search_boosting(
        self,
        queries: DataFrame,
        negatives: DataFrame,
        negative_boost: float = 0.5,
        k: int = 1000,
        window: int | None = None,
        prune: bool = True,
    ) -> DataFrame:
        """Federated boosting query (Searcher.search_boosting): each member
        scores the positive side under the merged global stats and demotes
        its own negative matches — the factor is per-document, so exact
        mode is score-identical to a union-corpus index by the usual
        exhaustive-union argument; window mode rescopes per member like
        search_boosted. Demoted scores follow the raw no-final-rounding
        contract (operators/boost.py), hence the raw merge."""
        per = [
            s.search_boosting(
                queries, negatives, negative_boost=negative_boost, k=k,
                window=window, prune=prune,
            ).withColumn("index_id", F.lit(i))
            for i, s in enumerate(self.searchers)
        ]
        return self._merge_raw(per, k)

    def postings_list(self, terms: list[str]) -> DataFrame:
        """(index_id, term, docid, tf): every member's decoded posting
        lists for the given raw terms (Searcher.postings_list). Members
        hold disjoint documents and the rows are stats-free, so federation
        is a plain union — each member resolves the terms under its OWN
        dictionary (same analyzer by the federation guard)."""
        per = [
            s.postings_list(terms).withColumn("index_id", F.lit(i))
            for i, s in enumerate(self.searchers)
        ]
        u = per[0]
        for p in per[1:]:
            u = u.unionByName(p)
        return u.select("index_id", "term", "docid", "tf")

    def _merge_raw(self, per: list[DataFrame], k: int) -> DataFrame:
        """k·N-row global merge that preserves RAW scores (boosted scores
        follow operators/boost.py's no-final-rounding contract, so the
        topk() helper's 6-decimal re-round would perturb them)."""
        from pyspark.sql import Window

        u = per[0].select("qid", "docid", "score", "index_id")
        for p in per[1:]:
            u = u.unionByName(p.select("qid", "docid", "score", "index_id"))
        packed = u.select(
            "qid",
            (
                F.shiftleft(F.col("index_id").cast("long"), _INDEX_SHIFT)
                + F.col("docid")
            ).alias("docid"),
            "score",
        )
        w = Window.partitionBy("qid").orderBy(
            F.col("score").desc(), F.col("docid").asc()
        )
        merged = (
            packed.withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= k)
        )
        return self._unpack(merged)

    def count(self, queries: DataFrame) -> DataFrame:
        """(qid, n): exact global hit count — member shards hold disjoint
        documents, so the federation total is the per-shard sum."""
        u = self.searchers[0].count(queries)
        for s in self.searchers[1:]:
            u = u.unionByName(s.count(queries))
        return u.groupBy("qid").agg(F.sum("n").alias("n"))

    def search_after(
        self,
        queries: DataFrame,
        after: dict[str, tuple[float, int, int]],
        size: int = 10,
        prune: bool = True,
    ) -> DataFrame:
        """Federated searchAfter. ``after`` maps qid -> (score, index_id,
        docid) — the last hit of the previous page as ``search`` emitted it.
        The global order is (score DESC, index_id ASC, docid ASC); each
        member gets the cursor translated into its LOCAL (score, docid)
        form: shards before the cursor shard keep only strictly-lower
        scores, the cursor shard resumes at its docid, later shards may
        repeat the score from any docid. The size-per-shard merge then
        reproduces the exact global page."""
        per = []
        for i, s in enumerate(self.searchers):
            aft_i = {}
            for qid, (cs, ci, cd) in after.items():
                if i < int(ci):
                    local = (float(cs), 1 << 62)  # only scores < cs survive
                elif i == int(ci):
                    local = (float(cs), int(cd))
                else:
                    local = (float(cs), -1)  # ties at cs survive from doc 0
                aft_i[qid] = local
            per.append(
                s.search_after(queries, aft_i, size=size, prune=prune)
                .withColumn("index_id", F.lit(i))
            )
        u = per[0]
        for p in per[1:]:
            u = u.unionByName(p)
        merged = topk(
            u.select(
                "qid",
                (
                    F.shiftleft(F.col("index_id").cast("long"), _INDEX_SHIFT)
                    + F.col("docid")
                ).alias("docid"),
                "score",
            ),
            size,
        )
        return self._unpack(merged)

    # --------------------------------------------------------- CORI selection

    def rank_shards(
        self,
        queries: DataFrame,
        b: float = 0.4,
        k_t: float = 50.0,
        b_t: float = 150.0,
    ) -> DataFrame:
        """(qid, index_id, belief, rank): CORI resource ranking (Callan,
        Lu & Croft, SIGIR 1995) — which member collections look most
        promising for each query, from per-shard term statistics alone:

            T = df_i(t) / (df_i(t) + k_t + b_t * cw_i / avg_cw)
            I = ln((N_c + 0.5) / cf(t)) / ln(N_c + 1.0)
            p(t|C_i) = b + (1 - b) * T * I,   belief = mean over query terms

        df_i = term's doc frequency in shard i (its dictionary), cw_i =
        shard collection length (total_dl), cf(t) = number of shards whose
        dictionary contains t, N_c = member count. Terms no shard contains
        are skipped (OOV — same treatment as query scoring); terms the
        SHARD lacks contribute the default belief ``b``. Everything reads
        dictionaries and manifests only — no postings are touched, which is
        the point: selection cost is O(|q| * N_c) rows, independent of
        corpus size.

        Determinism contract: each per-term belief is lifted to integer
        micros (floor(p * 1e6 + 0.5) — round-half-up, the engines' shared
        convention), and the mean is ONE exactly-rounded IEEE division of
        the exact integer sum — summation-order independence for the
        cross-engine oracle.

        Queries collect to the driver (the Searcher convention); all member
        dictionaries are probed with a term isin pushdown.
        """
        import math

        if not (0.0 <= b < 1.0):
            raise ValueError(f"default belief b must be in [0, 1), got {b}")
        s0 = self.searchers[0]
        qrows = (
            queries.select("qid", "text")
            .limit(s0.MAX_COLLECTED_QUERIES + 1)
            .collect()
        )
        if len(qrows) > s0.MAX_COLLECTED_QUERIES:
            raise ValueError(
                "query set too large for driver-side CORI ranking; batch it"
            )
        qterms: dict[str, list[str]] = {}
        for r in qrows:
            toks = sorted(set(s0._analyze(r["text"] or "")))
            if toks:
                qterms[r["qid"]] = toks
        all_terms = sorted({t for ts in qterms.values() for t in ts})
        if not all_terms:
            return self.spark.createDataFrame(
                [], "qid string, index_id int, belief double, rank int"
            )
        # per-shard df of the query terms, straight from each dictionary
        dfs: list[dict[str, int]] = []
        cws: list[int] = []
        for d, s in zip(self.index_dirs, self.searchers):
            man = s.manifest
            td = self.spark.read.parquet(
                f"{d}/{man.get('term_dict_dir', 'term_dict')}"
            )
            rows = td.filter(F.col("term").isin(all_terms)).select(
                "term", "df"
            ).collect()
            dfs.append({r["term"]: int(r["df"]) for r in rows})
            cws.append(int(man["total_dl"]))
        n_c = len(self.searchers)
        avg_cw = sum(cws) / n_c
        cf = {
            t: sum(1 for dfi in dfs if dfi.get(t, 0) > 0) for t in all_terms
        }
        log_den = math.log(n_c + 1.0)
        out = []
        for qid, terms in qterms.items():
            live = [t for t in terms if cf[t] > 0]
            if not live:
                continue
            for i in range(n_c):
                tot = 0
                for t in live:
                    df_i = dfs[i].get(t, 0)
                    tval = df_i / (df_i + k_t + b_t * cws[i] / avg_cw)
                    ival = math.log((n_c + 0.5) / cf[t]) / log_den
                    p = b + (1.0 - b) * tval * ival
                    tot += int(math.floor(p * 1e6 + 0.5))
                out.append((qid, i, tot / (len(live) * 1e6)))
        ranked = self.spark.createDataFrame(
            out, "qid string, index_id int, belief double"
        )
        from pyspark.sql import Window

        w = Window.partitionBy("qid").orderBy(
            F.col("belief").desc(), F.col("index_id").asc()
        )
        return ranked.withColumn(
            "rank", F.row_number().over(w).cast("int")
        )

    def search_cori(
        self,
        queries: DataFrame,
        k: int = 1000,
        n_select: int = 1,
        prune: bool = True,
        b: float = 0.4,
    ) -> DataFrame:
        """Approximate federated search with CORI shard selection: each
        query runs only against its top-``n_select`` shards by belief.
        Scores stay EXACT (merged global statistics, like every federated
        pass) — the approximation is recall-only: documents living in
        unselected shards cannot be returned. ``n_select >= N_c`` is
        therefore identical to ``search`` (pytest-pinned). The standard
        large-federation latency/recall knob (Callan 2000, distributed IR
        survey)."""
        if n_select < 1:
            raise ValueError(f"n_select must be >= 1, got {n_select}")
        if n_select >= len(self.searchers):
            return self.search(queries, k=k, prune=prune)
        sel_rows = (
            self.rank_shards(queries, b=b)
            .filter(F.col("rank") <= n_select)
            .collect()
        )
        return self._search_selected(queries, sel_rows, k, prune)

    def search_redde(
        self,
        queries: DataFrame,
        sample_dir: str,
        k: int = 1000,
        n_select: int = 1,
        n: int = 100,
        prune: bool = True,
    ) -> DataFrame:
        """Approximate federated search with ReDDE shard selection: each
        query runs only against its top-``n_select`` members by estimated
        relevant-document count (rank_shards_redde over the CSI at
        ``sample_dir``). Same contract as search_cori: scores stay EXACT
        (merged global statistics); the approximation is recall-only, and
        ``n_select >= N_c`` is identical to ``search``."""
        if n_select < 1:
            raise ValueError(f"n_select must be >= 1, got {n_select}")
        if n_select >= len(self.searchers):
            return self.search(queries, k=k, prune=prune)
        sel_rows = (
            self.rank_shards_redde(queries, sample_dir, n=n, prune=prune)
            .filter(F.col("rank") <= n_select)
            .collect()
        )
        return self._search_selected(queries, sel_rows, k, prune)

    def _search_selected(
        self, queries: DataFrame, sel_rows, k: int, prune: bool
    ) -> DataFrame:
        """Run each query against only its selected members (rows carrying
        qid + index_id) and merge — shared by CORI and ReDDE selection."""
        by_shard: dict[int, list[str]] = {}
        for r in sel_rows:
            by_shard.setdefault(int(r["index_id"]), []).append(r["qid"])
        per = []
        for i, qids in sorted(by_shard.items()):
            sub = queries.filter(F.col("qid").isin(qids))
            per.append(
                self.searchers[i]
                .search(sub, k=k, prune=prune)
                .withColumn("index_id", F.lit(i))
            )
        if not per:
            return self.spark.createDataFrame(
                [], "qid string, index_id int, docid long, rank int, score double"
            )
        u = per[0]
        for p in per[1:]:
            u = u.unionByName(p)
        merged = topk(
            u.select(
                "qid",
                (
                    F.shiftleft(F.col("index_id").cast("long"), _INDEX_SHIFT)
                    + F.col("docid")
                ).alias("docid"),
                "score",
            ),
            k,
        )
        return self._unpack(merged)

    def search_impact(
        self, queries: DataFrame, k: int = 1000, prune: bool = True
    ) -> DataFrame:
        """Federated impact search (learned-sparse shards, index/impact.py).
        Impact scores carry NO corpus statistics — score(q, d) = Σ qweight ·
        impact reads only the posting — so federation needs no stat merge at
        all: per-shard top-k, one global merge, bit-identical to a single
        union-corpus impact index by construction. Every member must be an
        impact index (each Searcher refuses otherwise)."""
        per = [
            s.search_impact(queries, k=k, prune=prune)
            .withColumn("index_id", F.lit(i))
            for i, s in enumerate(self.searchers)
        ]
        u = per[0]
        for p in per[1:]:
            u = u.unionByName(p)
        merged = topk(
            u.select(
                "qid",
                (
                    F.shiftleft(F.col("index_id").cast("long"), _INDEX_SHIFT)
                    + F.col("docid")
                ).alias("docid"),
                "score",
            ),
            k,
        )
        return self._unpack(merged)

    def build_sample_index(
        self,
        out_dir: str,
        denom: int = 8,
        **build_kw,
    ) -> dict:
        """Build the Central Sample Index (CSI) for ReDDE resource
        selection (Si & Callan, SIGIR 2003): a deterministic ~1/denom
        uniform sample of every member's live documents, indexed as ONE
        small corpus, plus the sidecars selection needs — ``origin``
        (which member each sampled doc came from) and ``redde_meta.json``
        (per-member live size and sample size). Members must be built with
        ``stored=True`` (the CSI re-indexes original text).

        The sample gate is the portable row hash (tokhash60 of
        'csi:conv_id|turn_idx') mod denom — the same engine-replayable
        sampling every sketch uses, so a rebuilt CSI over unchanged
        members is byte-stable, and the DataFrame twin (redde_scores over
        a hash-gated sample) reproduces it exactly.

        Scale shape: the sample is 1/denom of the federation, built once
        and refreshed on the members' append cadence; selection cost then
        never touches member postings. (conv_id, turn_idx) must be unique
        ACROSS members (disjoint shards — the federation contract);
        duplicates raise rather than mis-attributing votes.
        """
        import json
        import os

        from dhr_spark.index.builder import build_index
        from dhr_spark.operators.textstats import tokhash60

        if denom < 1:
            raise ValueError(f"denom must be >= 1, got {denom}")
        per = []
        meta = []
        for i, (d, s) in enumerate(zip(self.index_dirs, self.searchers)):
            if not s.manifest.get("stored"):
                raise ValueError(
                    f"member {i} ({d}) was built without stored=True — the "
                    "CSI needs original text to re-index the sample"
                )
            dm = s._filter_live(
                self.spark.read.parquet(f"{d}/doc_map")
            ).select("docid", "conv_id", "turn_idx")
            st = self.spark.read.parquet(f"{d}/stored").select("docid", "text")
            gate = (
                tokhash60(
                    F.concat(
                        F.lit("csi:"),
                        F.col("conv_id"),
                        F.lit("|"),
                        F.col("turn_idx").cast("string"),
                    )
                )
                % denom
                == 0
            )
            samp = (
                dm.join(st, "docid")
                .filter(gate)
                .select(
                    "conv_id",
                    "turn_idx",
                    "text",
                    F.lit(i).cast("int").alias("index_id"),
                )
            )
            n_docs = dm.count()
            n_sample = samp.count()
            meta.append(
                {"index_id": i, "n_docs": n_docs, "n_sample": n_sample}
            )
            per.append(samp)
        u = per[0]
        for p in per[1:]:
            u = u.unionByName(p)
        u = u.cache()
        try:
            dup = (
                u.groupBy("conv_id", "turn_idx")
                .agg(F.count("*").alias("c"))
                .filter(F.col("c") > 1)
                .limit(1)
                .collect()
            )
            if dup:
                raise ValueError(
                    "members share (conv_id, turn_idx) "
                    f"{(dup[0]['conv_id'], dup[0]['turn_idx'])} — federation "
                    "members must hold disjoint documents for ReDDE origin "
                    "attribution"
                )
            man = build_index(
                self.spark,
                u.select("conv_id", "turn_idx", "text"),
                os.path.join(out_dir, "csi"),
                analyzer_mode=self.searchers[0].manifest["analyzer_mode"],
                **build_kw,
            )
            (
                u.select("conv_id", "turn_idx", "index_id")
                .repartition(1)
                .write.mode("overwrite")
                .parquet(os.path.join(out_dir, "origin"))
            )
        finally:
            u.unpersist()
        with open(os.path.join(out_dir, "redde_meta.json"), "w") as f:
            json.dump({"denom": denom, "members": meta}, f)
        return man

    def rank_shards_redde(
        self,
        queries: DataFrame,
        sample_dir: str,
        n: int = 100,
        prune: bool = True,
    ) -> DataFrame:
        """(qid, index_id, votes, est_rel, rank): ReDDE resource ranking
        (Si & Callan, SIGIR 2003) — the sample-based complement to CORI's
        statistics-based rank_shards: run the query against the Central
        Sample Index (build_sample_index), and let each of the top-``n``
        sampled hits vote for its source member, scaled by that member's
        inverse sampling rate:

            est_rel_i = votes_i * n_docs_i / n_sample_i

        (the expected number of relevant docs member i holds, under the
        uniform-sample assumption). Ranks every member for EVERY input
        query — including queries whose terms miss the CSI sample
        entirely, which fall back to ranking members by n_docs DESC
        (reduced-recall degradation, never silent query loss) — and
        zero-vote members rank last with est_rel 0. Exactness: votes and
        n_docs are exact integers; est_rel is ONE IEEE division, so ranks
        are engine-stable. Selection cost is one top-n search of a
        1/denom-sized index — member postings are never touched."""
        import json
        import os

        with open(os.path.join(sample_dir, "redde_meta.json")) as f:
            meta = json.load(f)
        csi = Searcher(self.spark, os.path.join(sample_dir, "csi"))
        hits = csi.search(queries, k=n, prune=prune)
        dm = self.spark.read.parquet(
            os.path.join(sample_dir, "csi", "doc_map")
        ).select("docid", "conv_id", "turn_idx")
        origin = self.spark.read.parquet(os.path.join(sample_dir, "origin"))
        tagged = (
            hits.join(F.broadcast(dm), "docid")
            .join(
                F.broadcast(origin), ["conv_id", "turn_idx"]
            )
            .select("qid", "index_id", "rank")
        )
        stats = self.spark.createDataFrame(
            [
                (m["index_id"], m["n_docs"], m["n_sample"])
                for m in meta["members"]
            ],
            "index_id int, n_docs long, n_sample long",
        )
        return redde_scores(tagged, stats, n=n, qids=queries)


def redde_scores(
    sample_hits: DataFrame,
    shard_stats: DataFrame,
    n: int = 100,
    qids: DataFrame | None = None,
) -> DataFrame:
    """(qid, index_id, votes, est_rel, rank): the ReDDE vote aggregation
    (Si & Callan, SIGIR 2003) as pure DataFrame algebra — independent of
    how the sample was searched, so the index-backed path
    (MultiSearcher.rank_shards_redde) and a corpus-scan twin share it.

    ``sample_hits``: (qid, index_id, rank) — one row per retrieved sample
    doc, already attributed to its source shard. ``shard_stats``:
    (index_id, n_docs, n_sample) — live size and sample size per shard.
    ``qids``: the query universe (any frame with a qid column). When given,
    EVERY input query gets a full member ranking even if none of its terms
    hit the CSI sample — zero-vote queries degrade to ranking members by
    n_docs DESC (largest shard first), never to silent query loss. When
    omitted, the grid falls back to the qids present in ``sample_hits``
    (the pre-round-4 behavior, kept for twins that share the hit frame).
    Every (qid, shard) pair is emitted (zero votes → est_rel 0.0);
    est_rel = (votes·n_docs)/n_sample with an exact int64 numerator and
    ONE IEEE division; ranks break est_rel ties by n_docs DESC then
    index_id ASC."""
    from pyspark.sql import Window

    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    votes = (
        sample_hits.filter(F.col("rank") <= n)
        .groupBy("qid", "index_id")
        .agg(F.count("*").cast("long").alias("votes"))
    )
    base = qids if qids is not None else sample_hits
    grid = base.select("qid").distinct().crossJoin(
        F.broadcast(shard_stats.select("index_id", "n_docs", "n_sample"))
    )
    out = grid.join(votes, ["qid", "index_id"], "left").select(
        "qid",
        "index_id",
        F.coalesce(F.col("votes"), F.lit(0)).cast("long").alias("votes"),
        F.when(
            F.col("n_sample") > 0,
            (
                F.coalesce(F.col("votes"), F.lit(0)) * F.col("n_docs")
            ).cast("double")
            / F.col("n_sample").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("est_rel"),
        "n_docs",
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("est_rel").desc(), F.col("n_docs").desc(), F.col("index_id").asc()
    )
    return (
        out.withColumn("rank", F.row_number().over(w).cast("int"))
        .drop("n_docs")
    )
