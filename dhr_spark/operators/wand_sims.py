"""Pluggable similarities over the same index — impact, QLD (Dirichlet),
LM Jelinek-Mercer, axiomatic F2EXP/F2LOG, classic TF-IDF, DFR InL2,
IB SPL, DPH, and score fusion (split out of wand.py in round 4;
same code, unchanged semantics)."""

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


class SimilarityMixin:
    def search_impact(
        self, queries: DataFrame, k: int = 1000, prune: bool = True
    ) -> DataFrame:
        """Impact top-k over a learned-sparse index (index/impact.py):
        score(q, d) = Σ_t qweight(t) · impact(t, d) — the reference's gated
        inner product with precomputed weights on both sides
        (gip_retrieval.py:117-126; densify_corpus.py:109 model switch).

        ``queries`` is either (qid, text) — analyzed with the manifest's
        analyzer and term COUNTS become query weights (the DeepImpact query
        convention, densify_query.py:81-91) — or (qid, term, weight) rows
        from a query encoder (uniCOIL convention), which bypass the
        analyzer entirely. Runs the ordinary block-max WAND kernel with the
        per-block bound qweight · block_max_impact (dl-independent)."""
        if self._scoring != "impact":
            raise ValueError(
                f"search_impact needs an impact index (manifest scoring="
                f"{self._scoring!r}); build one with "
                "index.impact.build_impact_index"
            )
        cols = set(queries.columns)
        if {"term", "weight"} <= cols:
            qrows = (
                queries.select("qid", "term", "weight")
                .limit(self.MAX_COLLECTED_QUERIES + 1)
                .collect()
            )
            if len(qrows) > self.MAX_COLLECTED_QUERIES:
                raise ValueError(
                    f"weighted query set exceeds {self.MAX_COLLECTED_QUERIES}"
                    " rows; run huge offline evals through the distributed "
                    "slow path (operators.impact.impact_topk)"
                )
            by_q: dict[str, dict[str, float]] = {}
            for r in qrows:
                w = float(r["weight"])
                if w > 0:
                    qd = by_q.setdefault(r["qid"], {})
                    qd[r["term"]] = qd.get(r["term"], 0.0) + w
            terms = sorted({t for qd in by_q.values() for t in qd})
            if self._tid_cache is not None:
                tid = {
                    t: self._tid_cache[t][0]
                    for t in terms
                    if t in self._tid_cache
                }
            else:
                tid = {
                    r["term"]: int(r["term_id"])
                    for r in self._tdict.filter(
                        F.col("term").isin(terms)
                    ).collect()
                }
            qinfo: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
            for qid, qd in by_q.items():
                trips = sorted(
                    (tid[t], w) for t, w in qd.items() if t in tid
                )
                if trips:
                    qinfo[qid] = (
                        np.array([t for t, _ in trips], dtype=np.int64),
                        np.array([w for _, w in trips], dtype=np.float64),
                        np.ones(len(trips), dtype=np.float64),
                    )
            all_terms = sorted(tid.values())
        else:
            qinfo, all_terms = self._query_info(queries)
            # the stat slot (idf for BM25) is unused by the impact kernel;
            # normalize it to 1 so qinfo is similarity-agnostic
            qinfo = {
                qid: (tids, qtfs, np.ones_like(idfs))
                for qid, (tids, qtfs, idfs) in qinfo.items()
            }
        return self._search_prepared(qinfo, all_terms, k, prune, sim="impact")

    def search_qld(
        self,
        queries: DataFrame,
        k: int = 1000,
        mu: float = 1000.0,
        prune: bool = True,
    ) -> DataFrame:
        """Query-likelihood Dirichlet top-k over the SAME index — the
        reference searcher's other ranking model (Pyserini
        ``SimpleSearcher.set_qld``; semantics = operators/qld.qld_weights,
        Lucene LMDirichletSimilarity with the per-term >= 0 clamp).

        The stats-free segment layout makes the similarity pluggable at
        query time: segments store raw (tf, dl) with (max_tf, min_dl)
        block bounds, and the QLD weight is monotone ↑tf ↓dl, so the same
        block-max pruning applies under an admissible QLD bound — no
        reindex to switch models. P(t|C) = ctf/total_dl comes from the
        dictionary's ctf column (written by current builds, maintained
        additively by appends and subtractively by exact-stats deletes);
        pre-ctf indexes raise with a rebuild hint. total_dl is the LIVE
        manifest value, so appends/deletes shift the collection LM exactly
        as they shift idf/avgdl for BM25."""
        if mu <= 0:
            raise ValueError(f"mu must be > 0, got {mu}")
        qinfo, all_terms = self._query_info(queries)
        if not all_terms:
            return self._search_prepared({}, [], k, prune)
        qinfo2 = self._lm_query_probs(qinfo, all_terms)
        return self._search_prepared(
            qinfo2, all_terms, k, prune, sim="qld", mu=mu
        )

    def search_lmjm(
        self,
        queries: DataFrame,
        k: int = 1000,
        lam: float = 0.1,
        prune: bool = True,
    ) -> DataFrame:
        """LM Jelinek-Mercer top-k over the same index (Lucene
        LMJelinekMercerSimilarity):

            w(t, d) = log(1 + ((1-λ)·tf/dl) / (λ·P(t|C)))

        — the linear-interpolation smoothing twin of Dirichlet. Always
        positive for tf > 0 (no clamp), monotone ↑tf ↓dl, so the same
        stats-free (max_tf, min_dl) block bound prunes it. Shares the ctf
        dictionary column and the federated ctf/total_dl override with
        search_qld. Lucene's title default is λ=0.1 (long text: 0.7)."""
        if not (0.0 < lam < 1.0):
            raise ValueError(f"lambda must be in (0, 1), got {lam}")
        qinfo, all_terms = self._query_info(queries)
        if not all_terms:
            return self._search_prepared({}, [], k, prune)
        qinfo2 = self._lm_query_probs(qinfo, all_terms)
        return self._search_prepared(
            qinfo2, all_terms, k, prune, sim="lmjm", mu=lam
        )

    def _prep_sim(
        self, queries: DataFrame, sim: str, param: float | None = None
    ):
        """(qinfo2, all_terms, kernel_sim, mu): query-side stats + kernel
        branch + parameter for ANY pluggable similarity, so filter-context
        paths (search_filtered, search_min_docid) compose with every
        scorer the way Lucene filters do. ``param`` is the similarity's
        single knob (qld mu | lmjm lambda | f2exp/f2log s); defaults match
        the dedicated search_* methods. F2EXP's kexp stays at the Anserini
        default here — use search_f2exp for a custom exponent."""
        defaults = {
            "bm25": 0.0, "qld": 1000.0, "lmjm": 0.1,
            "f2exp": 0.5, "f2log": 0.5, "tfidf": 0.0,
            "inl2": 0.1, "spl": 0.1, "dph": 0.0,
        }
        if sim not in defaults:
            raise ValueError(
                f"unknown similarity {sim!r} ({' | '.join(defaults)})"
            )
        mu = defaults[sim] if param is None else float(param)
        if sim == "qld" and mu <= 0:
            raise ValueError(f"mu must be > 0, got {mu}")
        if sim == "lmjm" and not (0.0 < mu < 1.0):
            raise ValueError(f"lambda must be in (0, 1), got {mu}")
        if sim in ("f2exp", "f2log") and mu <= 0:
            raise ValueError(f"s must be > 0, got {mu}")
        if sim in ("inl2", "spl") and mu <= 0:
            raise ValueError(f"c must be > 0, got {mu}")
        if sim == "dph" and param is not None:
            raise ValueError("dph is parameter-free — no knob to pass")
        qinfo, all_terms = self._query_info(queries)
        if not all_terms:
            return {}, [], "bm25", 0.0
        if sim in ("qld", "lmjm"):
            return self._lm_query_probs(qinfo, all_terms), all_terms, sim, mu
        if sim in ("spl", "dph"):
            q2 = self._lm_query_probs(qinfo, all_terms, per_doc=True)
            return q2, all_terms, sim, mu
        if sim == "inl2":
            q2 = self._f2_query_stats(qinfo, all_terms, 0.0, shape="inl2")
            return q2, all_terms, "inl2", mu
        if sim == "f2exp":
            q2 = self._f2_query_stats(qinfo, all_terms, 0.35, shape="exp")
            return q2, all_terms, "f2exp", mu
        if sim == "f2log":
            q2 = self._f2_query_stats(qinfo, all_terms, 0.0, shape="log")
            return q2, all_terms, "f2exp", mu
        if sim == "tfidf":
            q2 = self._f2_query_stats(qinfo, all_terms, 0.0, shape="tfidf")
            return q2, all_terms, "tfidf", mu
        return qinfo, all_terms, "bm25", mu

    def _lm_query_probs(
        self, qinfo: dict, all_terms: list[int], per_doc: bool = False
    ) -> dict:
        """qinfo with the third slot (idf for BM25) replaced by a
        collection-frequency stat: P(t|C) = ctf/total_dl (the stat both LM
        similarities score with), or with ``per_doc=True`` the SPL model's
        λ = ctf/N (per-document mean frequency, raw — the kernel's spl
        branch handles λ ≥ SPL_LAMBDA_LIMIT, operators/dfr.py). Raises on
        a pre-ctf dictionary or an idf-only federated override."""
        need_denom = (
            self._n_docs_over if per_doc else self._total_dl_over
        )
        if self._stats_override and (
            self._ctf_over is None or need_denom is None
        ):
            raise ValueError(
                "LM/SPL scoring under a corpus_stats override needs global "
                "'ctf' and '" + ("n_docs" if per_doc else "total_dl")
                + "' in the override (MultiSearcher provides them when "
                "every member dictionary has ctf) — this override does not"
            )
        td_dir = self.manifest.get("term_dict_dir", "term_dict")
        dict_df = self.spark.read.parquet(f"{self.index_dir}/{td_dir}")
        if "ctf" not in dict_df.columns and self._ctf_over is None:
            raise ValueError(
                "index dictionary has no ctf column (built before QLD "
                "support) — rebuild the index to materialize collection "
                "term frequencies (appends keep a legacy dictionary legacy "
                "by design; only a rebuild adds the column)"
            )
        if self._ctf_over is not None:
            # global ctf is keyed by TERM (member term_ids differ across
            # shards): map this index's query term_ids back to strings,
            # then look up the merged collection frequency
            trows = (
                dict_df.filter(
                    F.col("term_id").isin([int(t) for t in all_terms])
                )
                .select("term_id", "term")
                .collect()
            )
            if isinstance(self._ctf_over, dict):
                cmap = self._ctf_over
            else:
                terms = [r["term"] for r in trows]
                cmap = {
                    r["term"]: int(r["ctf"])
                    for r in self._ctf_over.filter(
                        F.col("term").isin(terms)
                    ).collect()
                }
            ctf = {int(r["term_id"]): int(cmap.get(r["term"], 0)) for r in trows}
            if any(c <= 0 for c in ctf.values()):
                # every term in a member dictionary contributes >= 1 to the
                # merged ctf — a zero means the override predates an append
                raise ValueError(
                    "corpus_stats ctf override is missing query terms that "
                    "exist in this member's dictionary — rebuild the "
                    "MultiSearcher after index changes (stats merge is "
                    "constructed once and cached)"
                )
            cl = float(
                self._n_docs_over if per_doc else self._total_dl_over
            )
        else:
            rows = (
                dict_df.filter(
                    F.col("term_id").isin([int(t) for t in all_terms])
                )
                .select("term_id", "ctf")
                .collect()
            )
            ctf = {int(r["term_id"]): int(r["ctf"]) for r in rows}
            cl = float(
                self.manifest["n_docs"] if per_doc
                else self.manifest["total_dl"]
            )
        stat = lambda c: c / cl  # noqa: E731
        return {
            qid: (
                tids,
                qtfs,
                np.array(
                    [stat(ctf[int(t)]) for t in tids], dtype=np.float64
                ),
            )
            for qid, (tids, qtfs, _idfs) in qinfo.items()
        }

    def search_f2exp(
        self,
        queries: DataFrame,
        k: int = 1000,
        s: float = 0.5,
        kexp: float = 0.35,
        prune: bool = True,
    ) -> DataFrame:
        """Axiomatic F2EXP top-k over the same index (Anserini
        AxiomaticF2EXP; semantics = operators/axiomatic.f2exp_weights):

            w(t, d) = ((N+1)/df)^kexp · tf / (tf + s + s·dl/avgdl)

        Fourth pluggable query-time similarity: monotone ↑tf ↓dl, so the
        stats-free (max_tf, min_dl) block bound prunes it unchanged. The
        per-term stat ((N+1)/df)^kexp comes from the dictionary's df column
        with the LIVE manifest n_docs (appends/deletes shift it exactly as
        they shift BM25's idf). Defaults s=0.5, kexp=0.35 (Anserini /
        Fang & Zhai 2005)."""
        if s <= 0:
            raise ValueError(f"s must be > 0, got {s}")
        if kexp <= 0:
            raise ValueError(f"kexp must be > 0, got {kexp}")
        qinfo, all_terms = self._query_info(queries)
        if not all_terms:
            return self._search_prepared({}, [], k, prune)
        qinfo2 = self._f2_query_stats(qinfo, all_terms, kexp)
        return self._search_prepared(
            qinfo2, all_terms, k, prune, sim="f2exp", mu=s
        )

    def search_f2log(
        self,
        queries: DataFrame,
        k: int = 1000,
        s: float = 0.5,
        prune: bool = True,
    ) -> DataFrame:
        """Axiomatic F2LOG top-k over the same index (Anserini
        AxiomaticF2LOG; semantics = operators/axiomatic.f2log_weights):

            w(t, d) = ln((N+1)/df) · tf / (tf + s + s·dl/avgdl)

        F2EXP's sibling with a log idf in place of the power law. The tf
        saturation factor is identical, so the scoring reuses the f2exp
        kernel branch verbatim — only the query-side per-term stat changes.
        df < N+1 always, so the stat (and every weight) stays > 0."""
        if s <= 0:
            raise ValueError(f"s must be > 0, got {s}")
        qinfo, all_terms = self._query_info(queries)
        if not all_terms:
            return self._search_prepared({}, [], k, prune)
        qinfo2 = self._f2_query_stats(qinfo, all_terms, 0.0, shape="log")
        return self._search_prepared(
            qinfo2, all_terms, k, prune, sim="f2exp", mu=s
        )

    def search_tfidf(
        self,
        queries: DataFrame,
        k: int = 1000,
        prune: bool = True,
    ) -> DataFrame:
        """Vector-space TF-IDF top-k over the same index (Lucene
        ClassicSimilarity; semantics = operators/classic.tfidf_weights):

            w(t, d) = (1 + ln(N/(df+1)))² · sqrt(tf) / sqrt(dl)

        — Lucene's tf = sqrt(freq), idf(t)² (query idf × index idf), and
        lengthNorm = 1/sqrt(dl) WITHOUT the historical byte-lossy norm
        encoding (we keep dl exact; the reference's Lucene backend would
        quantize). Sixth pluggable query-time similarity; the per-term
        stat idf² rides in query-side from the dictionary's df with the
        LIVE manifest n_docs, like the axiomatic family."""
        qinfo, all_terms = self._query_info(queries)
        if not all_terms:
            return self._search_prepared({}, [], k, prune)
        qinfo2 = self._f2_query_stats(qinfo, all_terms, 0.0, shape="tfidf")
        return self._search_prepared(
            qinfo2, all_terms, k, prune, sim="tfidf"
        )

    def search_fused(
        self,
        queries: DataFrame,
        sims: list[str | tuple[str, float | None]] = ("bm25", "qld"),
        k: int = 1000,
        k_rrf: int = 60,
        prune: bool = True,
    ) -> DataFrame:
        """(qid, docid, rank, score): reciprocal-rank fusion of two or more
        pluggable similarities over the SAME index in one call — each sim
        runs its WAND pass (one segment scan per sim; the scans share the
        parquet cache) and the runs fuse through operators/fusion.rrf_fuse.
        ``sims`` entries are a similarity name or (name, param) pair with
        _prep_sim's knob semantics. The ranker-diversity ensemble Pyserini
        assembles from separate run files, index-backed."""
        from dhr_spark.operators.fusion import rrf_fuse

        if len(sims) < 2:
            raise ValueError(f"search_fused needs >= 2 sims, got {sims}")
        runs = []
        for s in sims:
            name, param = s if isinstance(s, tuple) else (s, None)
            qinfo, all_terms, ksim, mu = self._prep_sim(queries, name, param)
            runs.append(
                self._search_prepared(qinfo, all_terms, k, prune,
                                      sim=ksim, mu=mu)
            )
        return rrf_fuse(runs, k_rrf=k_rrf, k=k)

    def search_inl2(
        self,
        queries: DataFrame,
        k: int = 1000,
        c: float = 0.1,
        prune: bool = True,
    ) -> DataFrame:
        """DFR InL2 top-k over the same index (Amati & van Rijsbergen TOIS
        2002; Anserini SearchCollection ``-inl2``; semantics =
        operators/dfr.inl2_weights):

            tfn = tf · log2(1 + c·avgdl/dl)
            w(t, d) = log2((N+1)/(df+0.5)) · tfn/(tfn+1)

        Seventh pluggable query-time similarity. The per-term stat
        log2((N+1)/(df+0.5)) rides in query-side from the dictionary's df
        with the LIVE manifest n_docs, exactly like the axiomatic family —
        appends/deletes shift it the way they shift BM25's idf. Monotone
        ↑tf ↓dl, so the stats-free (max_tf, min_dl) block bound prunes it
        unchanged. Default c=0.1 (Anserini's ``-inl2.c``)."""
        if c <= 0:
            raise ValueError(f"c must be > 0, got {c}")
        qinfo, all_terms = self._query_info(queries)
        if not all_terms:
            return self._search_prepared({}, [], k, prune)
        qinfo2 = self._f2_query_stats(qinfo, all_terms, 0.0, shape="inl2")
        return self._search_prepared(
            qinfo2, all_terms, k, prune, sim="inl2", mu=c
        )

    def search_spl(
        self,
        queries: DataFrame,
        k: int = 1000,
        c: float = 0.1,
        prune: bool = True,
    ) -> DataFrame:
        """Information-based SPL top-k over the same index (Clinchant &
        Gaussier SIGIR 2010; Anserini SearchCollection ``-spl``; semantics
        = operators/dfr.spl_weights):

            λ = ctf/N;  tfn = tf · log2(1 + c·avgdl/dl)
            w(t, d) = −log2((λ^(tfn/(tfn+1)) − λ) / (1 − λ))    (λ < 1−1e−6)
            w(t, d) = log2(tfn + 1)                             (otherwise)

        Eighth pluggable query-time similarity (the λ ≥ 1−1e−6 branch is
        the formula's analytic λ→1 limit — operators/dfr.py explains the
        numerics). The per-term stat λ is a collection frequency like
        QLD's P(t|C) but per-document (÷N), so it shares the dictionary's
        ctf column and the federated ctf/n_docs override contract.
        Monotone ↑tf ↓dl (λ^x falls as x rises), block bound admissible;
        raises on a pre-ctf legacy dictionary like search_qld."""
        if c <= 0:
            raise ValueError(f"c must be > 0, got {c}")
        qinfo, all_terms = self._query_info(queries)
        if not all_terms:
            return self._search_prepared({}, [], k, prune)
        qinfo2 = self._lm_query_probs(qinfo, all_terms, per_doc=True)
        return self._search_prepared(
            qinfo2, all_terms, k, prune, sim="spl", mu=c
        )

    def search_dph(
        self,
        queries: DataFrame,
        k: int = 1000,
        prune: bool = True,
    ) -> DataFrame:
        """DFR DPH top-k over the same index (Amati's hypergeometric model
        with Popper normalization — Terrier's PARAMETER-FREE default
        similarity; semantics = operators/dfr.dph_weights):

            f = tf/dl;  λ = ctf/N
            w = [(1−f)²/(tf+1)] · (tf·log2((tf·avgdl/dl)/λ)
                                    + 0.5·log2(2π·tf·(1−f)))

        clamped at 0 (QLD contract; dfr.py documents why negatives would
        also invalidate WAND's theta bootstrap), with the tf == dl
        analytic-limit branch (weight 0). Ninth pluggable similarity; no
        knob at all — the point of DPH is zero tuning. The per-term stat
        shares SPL's λ = ctf/N dictionary column and the federated
        ctf/n_docs override contract; raises on a pre-ctf legacy
        dictionary like search_qld. DPH is not monotone ↑tf, so the
        kernel scores it under a factored (looser, admissible) block
        bound — dfr.py has the proof."""
        qinfo, all_terms = self._query_info(queries)
        if not all_terms:
            return self._search_prepared({}, [], k, prune)
        qinfo2 = self._lm_query_probs(qinfo, all_terms, per_doc=True)
        return self._search_prepared(
            qinfo2, all_terms, k, prune, sim="dph", mu=0.0
        )

    def _f2_query_stats(
        self, qinfo: dict, all_terms: list[int], kexp: float,
        shape: str = "exp",
    ) -> dict:
        """qinfo with the third slot replaced by a df-derived stat:
        ((N+1)/df)^kexp for shape='exp', ln((N+1)/df) for shape='log',
        Lucene Classic idf² = (1 + ln(N/(df+1)))² for shape='tfidf'.
        Under a federated corpus_stats override the merged df/n_docs must
        be present (MultiSearcher always provides them)."""
        if self._stats_override:
            if self._df_over is None or self._n_docs_over is None:
                raise ValueError(
                    "F2EXP under a corpus_stats override needs global 'df' "
                    "and 'n_docs' in the override (MultiSearcher provides "
                    "them) — this override carries neither"
                )
            td_dir = self.manifest.get("term_dict_dir", "term_dict")
            dict_df = self.spark.read.parquet(f"{self.index_dir}/{td_dir}")
            trows = (
                dict_df.filter(
                    F.col("term_id").isin([int(t) for t in all_terms])
                )
                .select("term_id", "term")
                .collect()
            )
            if isinstance(self._df_over, dict):
                dmap = self._df_over
            else:
                terms = [r["term"] for r in trows]
                dmap = {
                    r["term"]: int(r["df"])
                    for r in self._df_over.filter(
                        F.col("term").isin(terms)
                    ).collect()
                }
            dfm = {int(r["term_id"]): int(dmap.get(r["term"], 0)) for r in trows}
            if any(d <= 0 for d in dfm.values()):
                raise ValueError(
                    "corpus_stats df override is missing query terms that "
                    "exist in this member's dictionary — rebuild the "
                    "MultiSearcher after index changes"
                )
            n_docs = int(self._n_docs_over)
        else:
            td_dir = self.manifest.get("term_dict_dir", "term_dict")
            dict_df = self.spark.read.parquet(f"{self.index_dir}/{td_dir}")
            rows = (
                dict_df.filter(
                    F.col("term_id").isin([int(t) for t in all_terms])
                )
                .select("term_id", "df")
                .collect()
            )
            # exact-stats deletes keep fully-dead terms at df=0 (Lucene
            # keeps them in the dict until merge); they can match no live
            # doc, so drop them from the query like OOV terms — a 0 df must
            # never reach the power-law idf
            dfm = {int(r["term_id"]): int(r["df"]) for r in rows if int(r["df"]) > 0}
            n_docs = int(self.manifest["n_docs"])
        if shape == "exp":
            stat = lambda n, d: ((n + 1.0) / d) ** float(kexp)  # noqa: E731
        elif shape == "log":
            stat = lambda n, d: np.log((n + 1.0) / d)  # noqa: E731
        elif shape == "tfidf":
            stat = lambda n, d: (1.0 + np.log(n / (d + 1.0))) ** 2  # noqa: E731
        elif shape == "inl2":
            stat = lambda n, d: np.log2((n + 1.0) / (d + 0.5))  # noqa: E731
        else:
            raise ValueError(f"unknown df-stat shape {shape!r}")
        out: dict = {}
        for qid, (tids, qtfs, _idfs) in qinfo.items():
            keep = np.array([int(t) in dfm for t in tids], dtype=bool)
            if not keep.any():
                continue
            t2, q2 = tids[keep], qtfs[keep]
            out[qid] = (
                t2,
                q2,
                np.array(
                    [stat(float(n_docs), float(dfm[int(t)])) for t in t2],
                    dtype=np.float64,
                ),
            )
        return out
