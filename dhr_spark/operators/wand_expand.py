"""Multi-term query rewrites and the classic query-syntax layer —
prefix/wildcard/regexp/fuzzy/MoreLikeThis expansion, k-gram candidate
cuts, explain, and the term/completion/phrase suggesters (split out of
wand.py in round 4; same code, unchanged semantics)."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dhr_spark.index.builder import load_manifest
from dhr_spark.index.codec import (
    for_decode_stream,
    pfor_decode_stream,
    segmented_cumsum_decode,
    varint_decode,
)
from dhr_spark.index.segments import bm25_weights_np
from dhr_spark.operators.topk import topk
from dhr_spark.operators.wand_kernels import (
    RESULT_SCHEMA,
    _block_lens,
    _count_chunk,
    _decode_selected,
    _presence_chunk,
    _score_chunk,
)


class ExpandMixin:
    def _lookup_tid(self, term: str) -> tuple[int, float] | None:
        if self._tid_cache is not None:
            return self._tid_cache.get(term)
        rows = self._tdict.filter(F.col("term") == term).collect()
        return (
            (int(rows[0]["term_id"]), float(rows[0]["idf"])) if rows else None
        )

    def _expand_clause(
        self, kind: str, body: str, max_expansions: int, prefix_len: int
    ) -> list[tuple[int, float]]:
        """Dictionary expansions of a WILDCARD/FUZZY/REGEXP clause body,
        capped by (df DESC, term ASC) — the operators/expand.py cap rules."""
        from dhr_spark.operators.expand import (
            levenshtein_py,
            wildcard_to_regex,
        )
        from dhr_spark.operators.queryparser import FUZZY, REGEXP

        def _rx_pattern(b: str) -> str:
            # REGEXP: whole-term anchor around the verbatim body (Lucene
            # RegexpQuery); WILDCARD: translated * / ? pattern (pre-anchored)
            return f"^(?:{b})$" if kind == REGEXP else wildcard_to_regex(b)

        if self._tid_cache is not None:
            if kind == FUZZY:
                body_t, edits = body
                hits = [
                    (idf, t, tid)
                    for t, (tid, idf) in self._tid_cache.items()
                    if (
                        (not prefix_len or t[: prefix_len] == body_t[: prefix_len])
                        and abs(len(t) - len(body_t)) <= edits
                        and levenshtein_py(body_t, t) <= edits
                    )
                ]
                cap = 50
            else:
                rx = re.compile(_rx_pattern(body))
                hits = [
                    (idf, t, tid)
                    for t, (tid, idf) in self._tid_cache.items()
                    if rx.match(t)
                ]
                cap = max_expansions
            hits.sort(key=lambda x: (x[0], x[1]))
            return [(tid, idf) for idf, _, tid in hits[:cap]]
        from dhr_spark.index.kgram import fuzzy_grams, wildcard_grams

        grams = None
        kg = self.manifest.get("kgram")
        if kind == FUZZY:
            body_t, edits = body
            cond = F.levenshtein(F.col("term"), F.lit(body_t)) <= edits
            if prefix_len:
                cond = cond & (
                    F.substring(F.col("term"), 1, prefix_len)
                    == body_t[:prefix_len]
                )
            cap = 50
            if kg:
                grams = fuzzy_grams(body_t, edits, int(kg["k"]))
        else:
            cond = F.col("term").rlike(_rx_pattern(body))
            cap = max_expansions
            # REGEXP stays a dictionary scan (no literal-extraction pass);
            # WILDCARD pre-filters through the k-gram table when present
            if kg and kind != REGEXP:
                grams = wildcard_grams(body, int(kg["k"]))
        rows = (
            self._dict_for_grams(grams)
            .filter(cond)
            .orderBy(F.col("idf").asc(), F.col("term").asc())
            .limit(cap)
            .collect()
        )
        return [(int(r["term_id"]), float(r["idf"])) for r in rows]

    def search_syntax(
        self,
        queries: DataFrame,
        k: int = 1000,
        max_expansions: int = 1024,
        fuzzy_prefix_len: int = 1,
        min_should_match: int = 0,
    ) -> DataFrame:
        """Execute Lucene classic-syntax query strings EXACTLY —
        (qid, docid, rank, score) under scoring-boolean semantics
        (operators/queryparser.py documents the supported subset and the
        execution plan; docstring contract: a pure SHOULD-of-terms string
        is routed to the ordinary block-max WAND path and is
        score-identical to ``search``).

        Clause scoring: TERM via BM25 (duplicate terms accumulate qtf);
        WILDCARD/FUZZY via capped dictionary expansion at qtf=1 each;
        PHRASE via Lucene's sloppy-freq BM25 (tf := n_matches from the
        positional artifact, df := matching-doc count). MUST gates
        membership but still scores; MUST_NOT only filters. An
        unsatisfiable MUST (OOV term, no-match phrase) empties its query,
        as in Lucene. FIELD clauses (role:user) are filter-context over
        doc_map docvalues columns — they gate (or, with -, exclude) and
        never score; a query made ONLY of field clauses therefore returns
        no rows (use search_filtered / boolean_match for pure filtering).

        ``min_should_match``: Lucene BooleanQuery's
        minimumNumberShouldMatch — a doc must satisfy at least this many
        distinct SHOULD scoring clauses (each analyzed token of a TERM is
        its own clause, as in Lucene; an OOV SHOULD clause counts toward
        the requirement but can never be satisfied; FIELD filter-context
        clauses never count). Queries with no SHOULD clauses ignore it;
        a requirement above a query's SHOULD count empties that query."""
        from dhr_spark.operators import queryparser as QP

        qrows = (
            queries.select("qid", "text")
            .limit(self.MAX_COLLECTED_QUERIES + 1)
            .collect()
        )
        if len(qrows) > self.MAX_COLLECTED_QUERIES:
            raise ValueError(
                f"query set exceeds {self.MAX_COLLECTED_QUERIES} rows; "
                "parse+plan is driver-side — split the batch"
            )
        parsed = {r["qid"]: QP.parse_query(r["text"] or "") for r in qrows}
        # msm<=1 keeps the fast path: every OR hit satisfies >=1 clause
        if min_should_match <= 1 and all(
            p.pure_should_terms for p in parsed.values()
        ):
            return self.search(queries, k=k)

        pos: dict[str, dict[int, tuple[float, float]]] = {}
        must_sets: dict[str, np.ndarray] = {}  # per-clause pseudo-qid
        n_must: dict[str, int] = {}
        not_sets: dict[str, set[int]] = {}
        phrase_jobs: list[tuple[str, str, str, int, float]] = []  # qid, occur, body, slop, boost
        must_frames: list[DataFrame] = []
        not_frames: list[DataFrame] = []
        msm_sets: dict[str, np.ndarray] = {}  # SHOULD-clause pseudo-qids
        msm_frames: list[DataFrame] = []  # SHOULD phrase memberships
        n_should: dict[str, int] = {}

        def add_pos(qid: str, tid: int, idf: float, qtf: float) -> None:
            slot = pos.setdefault(qid, {})
            old = slot.get(tid)
            slot[tid] = (qtf + (old[0] if old else 0.0), idf)

        for qid, pq in parsed.items():
            ci = 0
            for c in pq.clauses:
                if c.kind in (QP.FIELD, QP.FIELD_RANGE):
                    # filter-context docvalues match (never scores):
                    # SHOULD/MUST both gate — a bare role:user is how
                    # Lucene users write keyword filters — MUST_NOT
                    # excludes. The docvalues read is a pushed-down
                    # doc_map column scan; literals cast to the column's
                    # type (so turn_idx:3 and n_chars:[10 TO 90] work).
                    dvf = self.docvalues_frame([c.field_name])
                    col = F.col(c.field_name)
                    if c.kind == QP.FIELD:
                        pred = col == c.text
                    else:
                        dt = dict(dvf.dtypes)[c.field_name]
                        pred = None
                        if c.lo != "*":
                            pred = col >= F.lit(c.lo).cast(dt)
                        if c.hi != "*":
                            p2 = col <= F.lit(c.hi).cast(dt)
                            pred = p2 if pred is None else pred & p2
                    member = dvf.filter(pred).select(
                        F.lit(qid).alias("qid"), "docid"
                    )
                    if c.occur == QP.MUST_NOT:
                        not_frames.append(member)
                    else:
                        n_must[qid] = n_must.get(qid, 0) + 1
                        must_frames.append(
                            member.withColumn(
                                "clause", F.lit(f"fd\x01{ci}")
                            )
                        )
                        ci += 1
                    continue
                if c.kind == QP.PHRASE:
                    phrase_jobs.append(
                        (qid, c.occur, c.text, c.slop, c.boost)
                    )
                    if c.occur == QP.MUST:
                        n_must[qid] = n_must.get(qid, 0) + 1
                    elif (
                        c.occur == QP.SHOULD and min_should_match > 0
                    ):
                        n_should[qid] = n_should.get(qid, 0) + 1
                    continue
                if c.kind == QP.TERM:
                    toks = self._analyze(c.text)
                    groups = [[t] for t in toks]  # each token its own clause
                else:
                    groups = [[c]]  # expanded below
                for g in groups:
                    if c.kind == QP.TERM:
                        hit = self._lookup_tid(g[0])
                        exp = [hit] if hit else []
                    elif c.kind in (QP.WILDCARD, QP.REGEXP):
                        # Lucene analyzes wildcard bodies minimally
                        # (lowercase only — no stemming, no stop removal);
                        # regex bodies pass verbatim (never analyzed)
                        body = (
                            c.text.lower() if c.kind == QP.WILDCARD else c.text
                        )
                        exp = self._expand_clause(
                            c.kind, body, max_expansions, 0
                        )
                    else:  # FUZZY
                        exp = self._expand_clause(
                            c.kind, (c.text.lower(), c.edits), max_expansions,
                            fuzzy_prefix_len,
                        )
                    if c.occur in (QP.SHOULD, QP.MUST):
                        # clause boost folds into qtf: BM25 contribution is
                        # qtf-linear, so qtf *= boost IS Lucene BoostQuery
                        for tid, idf in exp:
                            add_pos(qid, tid, idf, c.boost)
                    if c.occur == QP.MUST:
                        n_must[qid] = n_must.get(qid, 0) + 1
                        must_sets[f"{qid}\x01{ci}"] = np.array(
                            [t for t, _ in exp], dtype=np.int64
                        )
                        ci += 1
                    elif c.occur == QP.MUST_NOT:
                        not_sets.setdefault(qid, set()).update(
                            t for t, _ in exp
                        )
                    elif min_should_match > 0:  # SHOULD, msm active
                        n_should[qid] = n_should.get(qid, 0) + 1
                        msm_sets[f"{qid}\x01{ci}"] = np.array(
                            [t for t, _ in exp], dtype=np.int64
                        )
                        ci += 1

        # ---- positive term scoring (exhaustive: boolean filters must see
        # every matching doc, so no chunk-local pruning/cutoff) ----
        qinfo: dict[str, tuple] = {}
        for qid, slot in pos.items():
            trips = sorted((tid, q, i) for tid, (q, i) in slot.items())
            if trips:
                qinfo[qid] = (
                    np.array([t for t, _, _ in trips], dtype=np.int64),
                    np.array([q for _, q, _ in trips], dtype=np.float64),
                    np.array([i for _, _, i in trips], dtype=np.float64),
                )
        all_terms = sorted(
            {int(t) for tids, _, _ in qinfo.values() for t in tids}
        )
        chunk_docs = 1 << int(self.manifest["chunk_bits"])
        frames = []
        if qinfo:
            frames.append(
                self._scored_frame(qinfo, all_terms, chunk_docs, prune=False)
            )

        # ---- phrase clauses: sloppy-freq BM25 + membership frames ----
        n_docs = int(self.manifest["n_docs"])
        cb = int(self.manifest["chunk_bits"])
        for pj, (qid, occur, body, slop, boost) in enumerate(phrase_jobs):
            hits = self.search_phrase(body, slop=slop).cache()
            df_p = hits.count()
            if df_p == 0:
                # SHOULD: no contribution. MUST: unsatisfiable — n_must
                # already counts this clause and no membership frame will
                # ever satisfy it, so the qid naturally empties. MUST_NOT:
                # no-op.
                continue
            member = hits.select(F.lit(qid).alias("qid"), "docid")
            if occur == QP.MUST_NOT:
                not_frames.append(member)
                continue
            if occur == QP.MUST:
                must_frames.append(
                    member.withColumn("clause", F.lit(f"ph\x01{pj}"))
                )
            elif min_should_match > 0:  # SHOULD phrase counts toward msm
                msm_frames.append(
                    member.withColumn("clause", F.lit(f"mp\x01{pj}"))
                )
            idf_p = float(np.log(1.0 + (n_docs - df_p + 0.5) / (df_p + 0.5)))
            chs = [
                int(r[0])
                for r in hits.select(
                    F.shiftright("docid", cb).alias("c")
                ).distinct().limit(self.MAX_CHUNK_ISIN + 1).collect()
            ]
            dlf = self.doc_lengths_frame(
                chs if len(chs) <= self.MAX_CHUNK_ISIN else None
            )
            nm = F.col("n_matches").cast("double")
            norm = F.lit(self.k1) * (
                F.lit(1.0 - self.b)
                + F.lit(self.b) * F.col("dl").cast("double") / F.lit(self._avgdl)
            )
            frames.append(
                hits.join(dlf, "docid").select(
                    F.lit(qid).alias("qid"),
                    "docid",
                    (F.lit(boost) * F.lit(idf_p) * nm / (nm + norm)).alias(
                        "score"
                    ),
                )
            )

        if not frames:
            return self.spark.createDataFrame(
                [], "qid string, docid long, rank int, score double"
            )
        scored = frames[0]
        for fr in frames[1:]:
            scored = scored.unionByName(fr)
        scored = scored.groupBy("qid", "docid").agg(
            F.sum("score").alias("score")
        )

        # ---- MUST membership: each clause satisfied by >=1 of its terms
        # (or its phrase); a doc survives iff it satisfies ALL clauses ----
        if must_sets:
            kern = _presence_chunk(
                must_sets, int(self.manifest["block_size"]), cb,
                tombstones=self._tombstones, codec=self._codec,
            )
            seg = self._seg_for_terms(
                sorted({int(t) for s in must_sets.values() for t in s})
            )
            pres = self._by_chunk(seg).applyInPandas(
                kern, "qid string, docid long, n_hit long"
            )
            must_frames.append(
                pres.select(
                    F.split_part(F.col("qid"), F.lit("\x01"), F.lit(1)).alias(
                        "qid"
                    ),
                    "docid",
                    F.col("qid").alias("clause"),
                )
            )
        if n_must:
            if must_frames:
                mf = must_frames[0]
                for fr in must_frames[1:]:
                    mf = mf.unionByName(fr)
                sat = (
                    mf.distinct()
                    .groupBy("qid", "docid")
                    .agg(F.count("*").alias("n_sat"))
                )
            else:
                sat = self.spark.createDataFrame(
                    [], "qid string, docid long, n_sat long"
                )
            req = self.spark.createDataFrame(
                list(n_must.items()), "qid string, n_req long"
            )
            scored = (
                scored.join(sat, ["qid", "docid"], "left")
                .join(F.broadcast(req), "qid", "left")
                .filter(
                    F.coalesce(F.col("n_req"), F.lit(0))
                    == F.coalesce(F.col("n_sat"), F.lit(0))
                )
                .select("qid", "docid", "score")
            )

        # ---- MUST_NOT exclusion ----
        if not_sets:
            kern = _presence_chunk(
                {q: np.array(sorted(s), dtype=np.int64)
                 for q, s in not_sets.items()},
                int(self.manifest["block_size"]), cb,
                tombstones=self._tombstones, codec=self._codec,
            )
            seg = self._seg_for_terms(
                sorted({int(t) for s in not_sets.values() for t in s})
            )
            not_frames.append(
                self._by_chunk(seg)
                .applyInPandas(kern, "qid string, docid long, n_hit long")
                .select("qid", "docid")
            )
        if not_frames:
            nf = not_frames[0]
            for fr in not_frames[1:]:
                nf = nf.unionByName(fr)
            scored = scored.join(nf.distinct(), ["qid", "docid"], "left_anti")

        # ---- minimumNumberShouldMatch: >= msm distinct SHOULD clauses ----
        if min_should_match > 0 and n_should:
            if msm_sets:
                kern = _presence_chunk(
                    msm_sets, int(self.manifest["block_size"]), cb,
                    tombstones=self._tombstones, codec=self._codec,
                )
                seg = self._seg_for_terms(
                    sorted({int(t) for s in msm_sets.values() for t in s})
                )
                msm_frames.append(
                    self._by_chunk(seg)
                    .applyInPandas(kern, "qid string, docid long, n_hit long")
                    .select(
                        F.split_part(
                            F.col("qid"), F.lit("\x01"), F.lit(1)
                        ).alias("qid"),
                        "docid",
                        F.col("qid").alias("clause"),
                    )
                )
            if msm_frames:
                sf_ = msm_frames[0]
                for fr in msm_frames[1:]:
                    sf_ = sf_.unionByName(fr)
                sat_s = (
                    sf_.distinct()
                    .groupBy("qid", "docid")
                    .agg(F.count("*").alias("n_sat_s"))
                )
            else:
                sat_s = self.spark.createDataFrame(
                    [], "qid string, docid long, n_sat_s long"
                )
            # qids with SHOULD clauses require msm; others are untouched
            req_s = self.spark.createDataFrame(
                [(q, min_should_match) for q in n_should],
                "qid string, n_req_s long",
            )
            scored = (
                scored.join(sat_s, ["qid", "docid"], "left")
                .join(F.broadcast(req_s), "qid", "left")
                .filter(
                    F.coalesce(F.col("n_sat_s"), F.lit(0))
                    >= F.coalesce(F.col("n_req_s"), F.lit(0))
                )
                .select("qid", "docid", "score")
            )

        return topk(scored, k)

    def explain(self, queries: DataFrame, results: DataFrame) -> DataFrame:
        """Per-term BM25 score breakdown for each (qid, docid) hit — the
        Lucene ``IndexSearcher.explain`` analogue, flattened relationally:
        one row per matching query term with every scoring input exposed.

        Returns (qid, docid, term, qtf, tf, dl, idf, weight) where
        weight = qtf · idf · tf/(tf + k1(1-b+b·dl/avgdl)) under THIS
        searcher's k1/b/avgdl (overrides included), so
        sum(weight) GROUP BY (qid, docid) reproduces ``search`` scores
        exactly. Non-matching query terms emit no row (Lucene's "no match
        on required clause" leaf is an absence here).

        Serving shape: term vectors come from the FORWARD index (build with
        ``forward_index=True``); the result docids' chunk set prunes the
        scan to hit partitions and the docid isin pushes into row groups —
        explaining a page of hits reads kilobytes. Query analysis and term
        lookup reuse the resident dictionary (zero extra jobs); beyond
        MAX_FETCH_DOCS distinct docids it degrades to a broadcast hash join
        over the manifest-pruned forward scan (offline-audit shape)."""
        if not self.manifest.get("forward_index"):
            raise ValueError(
                "index was built without forward_index=True; explain needs "
                "the doc-major term vectors (rebuild or append with the flag)"
            )
        qinfo, _ = self._query_info(queries)
        id2term = (
            {tid: t for t, (tid, _) in self._tid_cache.items()}
            if self._tid_cache is not None
            else None
        )
        qrows = []
        for qid, (tids, qtfs, idfs) in qinfo.items():
            for tid, qtf, idf in zip(tids, qtfs, idfs):
                qrows.append((qid, int(tid), float(qtf), float(idf)))
        if not qrows:
            return self.spark.createDataFrame(
                [], "qid string, docid long, term string, qtf long, "
                    "tf long, dl long, idf double, weight double"
            )
        qterms = self.spark.createDataFrame(
            qrows, "qid string, term_id long, qtf double, idf double"
        )
        if id2term is not None:
            term_of = {tid: id2term[tid] for _, tid, _, _ in qrows}
            qterms = qterms.withColumn(
                "term",
                F.element_at(
                    F.create_map(
                        *[F.lit(x) for kv in term_of.items() for x in kv]
                    ),
                    F.col("term_id"),
                ),
            )
        else:
            qterms = qterms.join(
                self._tdict.select("term_id", "term"), "term_id"
            )
        chunk_bits = int(self.manifest["chunk_bits"])
        fwd = self.spark.read.parquet(f"{self.index_dir}/forward")
        # search never returns tombstoned docs; keep explain consistent
        pairs = self._filter_live(results.select("qid", "docid").distinct())
        ids = [
            int(r["docid"])
            for r in pairs.select("docid")
            .distinct()
            .limit(self.MAX_FETCH_DOCS + 1)
            .collect()
        ]
        if len(ids) <= self.MAX_FETCH_DOCS:
            chunks = sorted({i >> chunk_bits for i in ids})
            fwd = fwd.filter(
                F.col("chunk").isin(chunks) & F.col("docid").isin(ids)
            )
        else:
            fwd = self._prune_to_manifest(fwd)
        from dhr_spark.functions.bm25 import bm25_weight_col

        return (
            fwd.join(F.broadcast(pairs), "docid")
            .join(F.broadcast(qterms), ["qid", "term_id"])
            .select(
                "qid",
                "docid",
                "term",
                F.col("qtf").cast("long").alias("qtf"),
                F.col("tf").cast("long").alias("tf"),
                F.col("dl").cast("long").alias("dl"),
                "idf",
                (
                    F.col("qtf")
                    * bm25_weight_col(
                        F.col("tf"), F.col("dl"), F.col("idf"),
                        F.lit(self._avgdl), self.k1, self.b,
                    )
                ).alias("weight"),
            )
        )
    def _dict_for_grams(self, grams) -> DataFrame:
        """Dictionary rows pre-filtered through the k-gram term index
        (index/kgram.py) when the index carries one and the pattern yields
        required grams — a NECESSARY-condition cut, so the caller's exact
        pattern verification keeps results bit-identical to the full |V|
        scan. Terms above the committed gram watermark (appended/merged
        after the last build_kgram_index) scan the plain dictionary slice,
        keeping a stale gram table exact rather than wrong."""
        kg = self.manifest.get("kgram")
        if not kg or grams is None:
            return self._tdict
        from dhr_spark.index.kgram import kgram_candidates

        cand = kgram_candidates(
            self.spark, self.index_dir, self.manifest, grams
        )
        covered = self._tdict.filter(
            F.col("term_id") <= int(kg["max_term_id"])
        ).join(cand, "term_id", "left_semi")
        newer = self._tdict.filter(F.col("term_id") > int(kg["max_term_id"]))
        return covered.unionByName(newer)

    def _expanded_qinfo(
        self,
        pairs: list[tuple[str, str]],
        match_py,
        match_col,
        max_expansions: int,
        grams_fn=None,
    ) -> tuple[dict, list[int]]:
        qinfo: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
        for qid, pat in pairs:
            if self._tid_cache is not None:
                hits = [
                    (idf, t, tid)
                    for t, (tid, idf) in self._tid_cache.items()
                    if match_py(pat, t)
                ]
                hits.sort(key=lambda x: (x[0], x[1]))
                trips = [(tid, 1.0, idf) for idf, _, tid in hits[:max_expansions]]
            else:
                base = self._dict_for_grams(
                    grams_fn(pat) if grams_fn is not None else None
                )
                rows = (
                    base.filter(match_col(pat))
                    .orderBy(F.col("idf").asc(), F.col("term").asc())
                    .limit(max_expansions)
                    .collect()
                )
                trips = [(int(r["term_id"]), 1.0, float(r["idf"])) for r in rows]
            if trips:
                trips.sort()
                qinfo[qid] = (
                    np.array([t for t, _, _ in trips], dtype=np.int64),
                    np.array([q for _, q, _ in trips], dtype=np.float64),
                    np.array([i for _, _, i in trips], dtype=np.float64),
                )
        all_terms = sorted({int(t) for tids, _, _ in qinfo.values() for t in tids})
        return qinfo, all_terms

    def search_prefix(
        self,
        pairs: list[tuple[str, str]],
        k: int = 1000,
        max_expansions: int = 1024,
        prune: bool = True,
    ) -> DataFrame:
        """PrefixQuery: ``pairs`` = [(qid, prefix)] -> (qid, docid, rank,
        score) top-k over terms starting with each prefix."""
        from dhr_spark.index.kgram import prefix_grams

        qinfo, all_terms = self._expanded_qinfo(
            pairs,
            lambda p, t: t.startswith(p),
            lambda p: F.col("term").startswith(p),
            max_expansions,
            grams_fn=self._kgram_fn(prefix_grams),
        )
        return self._search_prepared(qinfo, all_terms, k, prune)

    def _kgram_fn(self, fn, *extra):
        """Bind a kgram query-gram extractor to this index's gram geometry;
        None (no gram table) keeps the full-dictionary path."""
        kg = self.manifest.get("kgram")
        if not kg:
            return None
        return lambda pat: fn(pat, *extra, int(kg["k"]))

    def search_wildcard(
        self,
        pairs: list[tuple[str, str]],
        k: int = 1000,
        max_expansions: int = 1024,
        prune: bool = True,
    ) -> DataFrame:
        """WildcardQuery (* = any run, ? = one char). A leading wildcard
        scans the whole dictionary (as in Lucene) — still |V|, never the
        corpus."""
        from dhr_spark.operators.expand import wildcard_to_regex

        def py(p, t, _c={}):
            rx = _c.get(p)
            if rx is None:
                rx = _c[p] = re.compile(wildcard_to_regex(p))
            return rx.match(t) is not None

        from dhr_spark.index.kgram import wildcard_grams

        qinfo, all_terms = self._expanded_qinfo(
            pairs,
            py,
            lambda p: F.col("term").rlike(wildcard_to_regex(p)),
            max_expansions,
            grams_fn=self._kgram_fn(wildcard_grams),
        )
        return self._search_prepared(qinfo, all_terms, k, prune)

    def search_regexp(
        self,
        pairs: list[tuple[str, str]],
        k: int = 1000,
        max_expansions: int = 1024,
        prune: bool = True,
    ) -> DataFrame:
        """RegexpQuery: pattern anchored to the whole term (Lucene's
        automaton-accepts-entire-term semantics). Dialect caveat documented
        at operators/expand.py expand_regexp — keep to the Java/RE2-common
        regex core for oracle parity."""

        def py(p, t, _c={}):
            rx = _c.get(p)
            if rx is None:
                rx = _c[p] = re.compile("(?:" + p + ")")
            return rx.fullmatch(t) is not None

        qinfo, all_terms = self._expanded_qinfo(
            pairs,
            py,
            lambda p: F.col("term").rlike("^(?:" + p + ")$"),
            max_expansions,
        )
        return self._search_prepared(qinfo, all_terms, k, prune)

    def search_fuzzy(
        self,
        pairs: list[tuple[str, str]],
        k: int = 1000,
        max_edits: int = 2,
        prefix_len: int = 1,
        max_expansions: int = 50,
        prune: bool = True,
    ) -> DataFrame:
        """FuzzyQuery: plain Levenshtein <= max_edits with an exact
        ``prefix_len``-char prefix gate (Lucene prefixLength; it is also the
        scan bound a sorted term dictionary would use). maxExpansions=50 is
        Lucene's default."""
        from dhr_spark.operators.expand import levenshtein_py

        def py(p, t):
            if prefix_len and t[:prefix_len] != p[:prefix_len]:
                return False
            if abs(len(t) - len(p)) > max_edits:
                return False
            return levenshtein_py(p, t) <= max_edits

        def col(p):
            c = F.levenshtein(F.col("term"), F.lit(p)) <= max_edits
            if prefix_len:
                c = c & (
                    F.substring(F.col("term"), 1, prefix_len) == p[:prefix_len]
                )
            return c

        from dhr_spark.index.kgram import fuzzy_grams

        qinfo, all_terms = self._expanded_qinfo(
            pairs, py, col, max_expansions,
            grams_fn=self._kgram_fn(fuzzy_grams, max_edits),
        )
        return self._search_prepared(qinfo, all_terms, k, prune)

    def search_like(
        self,
        seeds: list[tuple[str, int]],
        k: int = 1000,
        max_query_terms: int = 10,
        prune: bool = True,
    ) -> DataFrame:
        """MoreLikeThis: ``seeds`` = [(qid, seed_docid)] -> top-k documents
        similar to each seed, the seed itself excluded BEFORE ranking.

        Query construction reads the seed documents' term vectors from the
        FORWARD index (build with ``forward_index=True``; docid isin prunes
        to the seeds' chunks), ranks terms by round(tf·idf, 6) DESC then term
        ASC (Lucene MoreLikeThis interestingness order, made
        engine-deterministic by the rounding), keeps ``max_query_terms``, and
        scores them as a SHOULD-of-terms query (qtf=1). Searches k+1 deep so
        dropping the seed still yields k dense ranks."""
        from dhr_spark.operators.expand import exclude_seeds_and_rank

        if not self.manifest.get("forward_index"):
            raise ValueError(
                "index was built without forward_index=True; MoreLikeThis "
                "needs the doc-major term vectors (rebuild or append with "
                "the flag)"
            )
        ids = sorted({int(d) for _, d in seeds})
        fwd = self._prune_to_manifest(
            self.spark.read.parquet(f"{self.index_dir}/forward")
        )
        vec_rows = (
            F.broadcast(fwd.filter(F.col("docid").isin(ids)))
            .join(self._tdict, "term_id")
            .select("docid", "term", "term_id", "idf", "tf")
            .collect()
        )
        by_doc: dict[int, list] = {}
        for r in vec_rows:
            by_doc.setdefault(int(r["docid"]), []).append(r)
        qinfo: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
        for qid, d in seeds:
            rows = by_doc.get(int(d), [])
            ranked = sorted(
                rows,
                key=lambda r: (-round(r["tf"] * r["idf"], 6), r["term"]),
            )[:max_query_terms]
            trips = sorted(
                (int(r["term_id"]), 1.0, float(r["idf"])) for r in ranked
            )
            if trips:
                qinfo[qid] = (
                    np.array([t for t, _, _ in trips], dtype=np.int64),
                    np.array([q for _, q, _ in trips], dtype=np.float64),
                    np.array([i for _, _, i in trips], dtype=np.float64),
                )
        all_terms = sorted({int(t) for tids, _, _ in qinfo.values() for t in tids})
        res = self._search_prepared(qinfo, all_terms, k + 1, prune)
        return exclude_seeds_and_rank(
            res.select("qid", "docid", "score"), seeds, k
        )
    def suggest(
        self,
        terms: list[str],
        max_edits: int = 2,
        prefix_len: int = 1,
        n: int = 5,
    ) -> DataFrame:
        """(input, suggestion, dist, rank): spell suggestions per input term
        — the Lucene DirectSpellChecker shape. Candidates are dictionary
        terms within plain Levenshtein ``max_edits`` sharing an exact
        ``prefix_len``-char prefix, ranked by document frequency DESC (idf
        ASC) then term ASC, top ``n`` kept; the input term itself (dist 0)
        is never suggested. Touches only the |V|-row dictionary. Rows are
        per DISTINCT input on both tiers (the distributed fallback's gram
        cut collapses duplicates; the resident path matches it)."""
        from dhr_spark.operators.expand import levenshtein_py

        terms = list(dict.fromkeys(terms))
        rows = []
        if self._tid_cache is not None:
            for inp in terms:
                cands = []
                for t, (_, idf) in self._tid_cache.items():
                    if prefix_len and t[:prefix_len] != inp[:prefix_len]:
                        continue
                    if abs(len(t) - len(inp)) > max_edits or t == inp:
                        continue
                    d = levenshtein_py(inp, t)
                    if d <= max_edits:
                        cands.append((idf, t, d))
                cands.sort(key=lambda x: (x[0], x[1]))
                rows += [
                    (inp, t, d, r + 1)
                    for r, (_, t, d) in enumerate(cands[:n])
                ]
            return self.spark.createDataFrame(
                rows, "input string, suggestion string, dist int, rank int"
            )
        # huge-vocabulary fallback: gram-cut dictionary scan, batched over
        # the whole input list (_fuzzy_candidate_rows). The prefix gate and
        # self-exclusion verify AFTER the cut — extra necessary conditions
        # narrow, never widen, so results equal the plain |V| scan.
        slim = (
            self._fuzzy_candidate_rows(list(terms), max_edits)
            .filter(
                (F.col("term") != F.col("qt"))
                & (
                    F.substring(F.col("term"), 1, prefix_len)
                    == F.substring(F.col("qt"), 1, prefix_len)
                    if prefix_len
                    else F.lit(True)
                )
            )
            .select(
                "qt",
                "term_id",
                F.levenshtein(F.col("term"), F.col("qt"))
                .cast("int")
                .alias("dist"),
            )
        )
        # idf rides in from _tdict, NOT the helper's raw dictionary column —
        # under a federated idf override the ranking must use the global idf
        cand = self._tdict.join(F.broadcast(slim), "term_id").select(
            F.col("qt").alias("input"),
            F.col("term").alias("suggestion"),
            "dist",
            "idf",
        )
        from pyspark.sql import Window

        w = Window.partitionBy("input").orderBy(
            F.col("idf").asc(), F.col("suggestion").asc()
        )
        return (
            cand.withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= n)
            .drop("idf")
        )

    def suggest_complete(self, prefixes: list[str], n: int = 5) -> DataFrame:
        """(input, suggestion, rank): prefix autocomplete over the term
        dictionary — the Lucene suggest-module / ES completion-suggester
        shape with document frequency as the suggestion weight. Candidates
        are dictionary terms extending (or equal to) the lowercased prefix,
        ranked df DESC (idf ASC — identical order) then term ASC, top ``n``
        kept. Unlike ``suggest`` (spell correction) the input itself IS a
        legal completion — ES returns the exact match first. Touches only
        the |V|-row dictionary; the resident-dictionary fast path costs
        zero Spark jobs, and the distributed twin broadcast-joins the
        prefix batch against the dictionary scan (never the corpus)."""
        inputs = [p.lower() for p in prefixes]
        if self._tid_cache is not None:
            rows = []
            for inp in inputs:
                cands = sorted(
                    (idf, t)
                    for t, (_, idf) in self._tid_cache.items()
                    if t.startswith(inp)
                )
                rows += [
                    (inp, t, r + 1) for r, (_, t) in enumerate(cands[:n])
                ]
            return self.spark.createDataFrame(
                rows, "input string, suggestion string, rank int"
            )
        from pyspark.sql import Window

        inp_df = self.spark.createDataFrame(
            [(t,) for t in inputs], "input string"
        )
        cand = self._tdict.join(
            F.broadcast(inp_df), F.col("term").startswith(F.col("input"))
        ).select("input", F.col("term").alias("suggestion"), "idf")
        w = Window.partitionBy("input").orderBy(
            F.col("idf").asc(), F.col("suggestion").asc()
        )
        return (
            cand.withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= n)
            .drop("idf")
        )

    def _fuzzy_candidate_rows(
        self, qterms: list[str], max_edits: int
    ) -> DataFrame:
        """(qt, term, term_id, df, ctf): dictionary terms within plain
        Levenshtein ``max_edits`` of each input term — the phrase
        suggester's candidate relation, batched across ALL inputs in one
        job. When the index carries a k-gram table (index/kgram.py) the
        |V|-row levenshtein scan is cut first: ONE broadcast of the inputs'
        (qt, gram) pairs against the gram-sorted table resolves every
        input's candidate slice in a single pass (shared-gram count vs the
        per-input pigeonhole threshold), exact levenshtein then verifies.
        Terms above the gram watermark and inputs whose gram bound is
        vacuous fall back to the dictionary scan — the cut is a NECESSARY
        condition only, so results are bit-identical to the full join.
        Rows are per DISTINCT input (the shared-gram count assumes distinct
        (qt, gram) pairs, so duplicates are collapsed up front); an empty
        input yields an empty frame."""
        qterms = sorted(set(qterms))
        full = self.spark.read.parquet(
            f"{self.index_dir}/"
            f"{self.manifest.get('term_dict_dir', 'term_dict')}"
        ).select("term", "term_id", "df", "ctf", "idf")
        sel = ["qt", "term", "term_id", "df", "ctf", "idf"]

        def lev_join(terms: list[str]) -> DataFrame:
            inp = self.spark.createDataFrame(
                [(t,) for t in terms], "qt string"
            )
            return full.join(
                F.broadcast(inp),
                F.levenshtein(F.col("term"), F.col("qt")) <= max_edits,
            ).select(*sel)

        kg = self.manifest.get("kgram")
        if not kg:
            return lev_join(qterms)
        from dhr_spark.index.kgram import fuzzy_grams, kgram_candidates_batch

        batched: list[tuple[str, list[str], int]] = []
        vacuous: list[str] = []
        for qt in qterms:
            g = fuzzy_grams(qt, max_edits, int(kg["k"]))
            if g is None:
                vacuous.append(qt)
            else:
                batched.append((qt, g[0], g[1]))
        parts: list[DataFrame] = []
        if batched:
            cand_ids = kgram_candidates_batch(
                self.spark, self.index_dir, batched
            )
            parts.append(
                cand_ids.join(full, "term_id")
                .filter(
                    F.levenshtein(F.col("term"), F.col("qt")) <= max_edits
                )
                .select(*sel)
            )
            # gram'd inputs still levenshtein-scan the post-watermark slice
            # (terms appended after the last build_kgram_index refresh)
            inp_g = self.spark.createDataFrame(
                [(qt,) for qt, _, _ in batched], "qt string"
            )
            parts.append(
                full.filter(F.col("term_id") > int(kg["max_term_id"]))
                .join(
                    F.broadcast(inp_g),
                    F.levenshtein(F.col("term"), F.col("qt")) <= max_edits,
                )
                .select(*sel)
            )
        if vacuous:
            parts.append(lev_join(vacuous))
        if not parts:  # empty input: typed empty frame, never IndexError
            return lev_join([])
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def suggest_phrase(
        self,
        texts: list[str],
        max_per_term: int = 3,
        top: int = 3,
        max_edits: int = 1,
    ) -> DataFrame:
        """(input, suggestion, score, rank): the ES phrase suggester
        ("did you mean") — whole-phrase spell correction ranked by a
        bigram language model with stupid backoff (Brants et al. 2007).

        Per analyzed slot, candidates are the dictionary terms within
        ``max_edits`` Levenshtein of the input term (the input term itself
        included when in-vocabulary), capped at ``max_per_term`` by
        (df DESC, term ASC) — DirectSpellChecker's popularity order. Every
        candidate combination is scored

            P(c) = P(c1) * prod_i P(ci | ci-1)
            P(c1) = ctf(c1) / T
            P(ci|ci-1) = bg(ci-1, ci) / ctf(ci-1)     when the bigram exists
                       = 0.4 * ctf(ci) / T            backoff otherwise

        over the committed bigram artifact (index/shingles.py; T = the
        manifest's total_dl token count). Scoring is EXACT-integer: one
        numerator/denominator product pair per combination (the 0.4
        backoff rides as 2/5), a single IEEE division at the end — so a
        DuckDB oracle reproduces scores bit-for-bit. The verbatim input
        phrase is excluded (a correction, not an echo); ties break
        suggestion ASC.

        Interactive shape: ONE distributed dictionary job resolves all
        candidates (_fuzzy_candidate_rows — k-gram-accelerated when the
        index carries a gram table, the |V| levenshtein scan otherwise),
        one bounded bigram slice read (candidate-pair pushdown), then
        driver-side enumeration over at most max_per_term^slots
        combinations (capped; slots capped at 6, which also keeps the
        oracle's decimal(38) products exact at test scale). Nothing
        touches the corpus.
        """
        from pyspark.sql import Window

        from dhr_spark.functions.analyzer import analyze_positions
        from dhr_spark.index.shingles import read_bigrams

        if not 1 <= max_per_term <= 10:
            raise ValueError(f"max_per_term must be in [1, 10], got {max_per_term}")
        if max_edits < 1:
            raise ValueError(f"max_edits must be >= 1, got {max_edits}")
        # fail fast on a missing/stale bigram table — before any work
        bg_rel = read_bigrams(self.spark, self.index_dir, self.manifest)
        mode = self.manifest["analyzer_mode"]
        plans: dict[str, list[str]] = {}
        for text in texts:
            terms = [t for _, t in analyze_positions(mode, text or "")]
            if not terms:
                continue
            if len(terms) > 6:
                raise ValueError(
                    f"phrase suggest supports up to 6 terms, got "
                    f"{len(terms)} for {text!r}"
                )
            plans[text] = terms
        empty = self.spark.createDataFrame(
            [], "input string, suggestion string, score double, rank int"
        )
        if not plans:
            return empty
        qterms = sorted({t for ts in plans.values() for t in ts})
        w = Window.partitionBy("qt").orderBy(
            F.col("df").desc(), F.col("term").asc()
        )
        cand_rows = (
            self._fuzzy_candidate_rows(qterms, max_edits)
            .withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") <= max_per_term)
            .select("qt", "term", "term_id", "ctf")
            .collect()
        )
        cands: dict[str, list[tuple[str, int, int]]] = {}
        for r in cand_rows:
            cands.setdefault(r["qt"], []).append(
                (r["term"], int(r["term_id"]), int(r["ctf"]))
            )
        import itertools

        combos_by_input: dict[str, list[tuple]] = {}
        t1_ids, t2_ids = set(), set()
        for text, terms in plans.items():
            slots = [cands.get(t) for t in terms]
            if any(not s for s in slots):
                continue  # an uncorrectable slot -> no suggestion (ES)
            n_combos = 1
            for s in slots:
                n_combos *= len(s)
            if n_combos > 4096:
                raise ValueError(
                    f"{n_combos} candidate combinations for {text!r} — "
                    "lower max_per_term (cap 4096)"
                )
            combos = list(itertools.product(*slots))
            combos_by_input[text] = combos
            for c in combos:
                for a, b in zip(c, c[1:]):
                    t1_ids.add(a[1])
                    t2_ids.add(b[1])
        if not combos_by_input:
            return empty
        bg = {
            (int(r["t1"]), int(r["t2"])): int(r["n"])
            for r in bg_rel.filter(
                F.col("t1").isin(sorted(t1_ids))
                & F.col("t2").isin(sorted(t2_ids))
            ).collect()
        }
        T = int(self.manifest["total_dl"])
        out = []
        for text, combos in combos_by_input.items():
            orig = tuple(plans[text])
            scored = []
            for c in combos:
                terms_c = tuple(t for t, _, _ in c)
                if terms_c == orig:
                    continue
                num, den = c[0][2], T
                for (pt, pid, pctf), (ct, cid, cctf) in zip(c, c[1:]):
                    n = bg.get((pid, cid), 0)
                    if n:
                        num *= n
                        den *= pctf
                    else:
                        num *= 2 * cctf
                        den *= 5 * T
                # float() each side BEFORE dividing: the oracle casts the
                # exact-integer num/den to DOUBLE then divides, and Python's
                # int/int true division rounds once from the exact rational
                # — two roundings vs one can differ by 1 ulp
                scored.append((float(num) / float(den), " ".join(terms_c)))
            scored.sort(key=lambda x: (-x[0], x[1]))
            out += [
                (text, s, sc, r + 1)
                for r, (sc, s) in enumerate(scored[:top])
            ]
        if not out:
            return empty
        return self.spark.createDataFrame(
            out, "input string, suggestion string, score double, rank int"
        )
