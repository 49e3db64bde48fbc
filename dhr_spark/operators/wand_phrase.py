"""Positional layer — exact/sloppy phrase, batch phrase, intervals,
match_phrase_prefix, span first/not/or, SynonymQuery, and proximity
(split out of wand.py in round 4; same code, unchanged semantics)."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
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


class PhraseMixin:
    def search_phrase(self, phrase: str, slop: int = 0) -> DataFrame:
        """(docid, n_matches, first_pos): phrase matches served from the
        POSITIONAL artifact (build with ``positional=True``) — no corpus
        text scan; reads only the phrase terms' position rows (term_id
        pushdown). ``slop=0`` is the exact phrase at the query's analyzed
        position offsets (shifted position-array intersection); ``slop>0``
        is the Lucene-slop analogue — ordered occurrence with total span ≤
        expected_span+slop (phrase.sloppy_anchors); n_matches then counts
        valid anchors.

        Positions carry Lucene position increments (stopwords consume a
        position under the lucene chain — builder.write_positions): the
        query phrase is analyzed with the same increments, so "new york"
        does NOT exact-match "new the york"-gapped text, while slop=1 does
        — Anserini PhraseQuery behavior.
        """
        from dhr_spark.functions.analyzer import analyze_positions

        if not self.manifest.get("positional"):
            raise ValueError(
                "index was built without positional=True; phrase search "
                "needs the positions artifact (or use operators.phrase."
                "phrase_match over the corpus text)"
            )
        pairs = analyze_positions(self.manifest["analyzer_mode"], phrase)
        if not pairs:
            raise ValueError(f"phrase {phrase!r} has no indexable terms")
        # offsets relative to the first indexed term (a leading stopword
        # only shifts the anchor, exactly as Lucene's query parser does)
        offs = [p - pairs[0][0] for p, _ in pairs]
        terms = [t for _, t in pairs]
        if self._tid_cache is not None:
            tid = {t: self._tid_cache[t][0] for t in set(terms)
                   if t in self._tid_cache}
        else:
            rows = self._tdict.filter(F.col("term").isin(list(set(terms)))).collect()
            tid = {r["term"]: int(r["term_id"]) for r in rows}
        empty = self.spark.createDataFrame(
            [], "docid long, n_matches long, first_pos long"
        )
        if any(t not in tid for t in terms):
            return empty  # an OOV phrase term can never match
        pos = self._prune_to_manifest(
            self.spark.read.parquet(f"{self.index_dir}/positions")
        )

        def _shift_by(i: int):
            # closure, NOT a default arg: a 2-param lambda would receive the
            # array index as its second argument (PySpark HOF arity rules)
            return lambda p: p - F.lit(i)

        def _shifted(j: int, off: int, t: str):
            # exact mode pre-shifts by -offset so matching reduces to array
            # intersection; sloppy mode keeps raw positions for the
            # ordered-window chain
            col = (
                F.transform(F.col("positions"), _shift_by(off))
                if off and not slop
                else F.col("positions")
            )
            return pos.filter(F.col("term_id") == tid[t]).select(
                "docid", col.alias(f"p{j}")
            )

        joined = _shifted(0, offs[0], terms[0])
        for j in range(1, len(terms)):
            joined = joined.join(_shifted(j, offs[j], terms[j]), "docid")
        if slop:
            from dhr_spark.operators.phrase import sloppy_anchors

            starts = sloppy_anchors(
                [F.col(f"p{j}") for j in range(len(terms))], slop,
                base_span=offs[-1],
            )
        else:
            starts = F.col("p0")
            for j in range(1, len(terms)):
                starts = F.array_intersect(starts, F.col(f"p{j}"))
        starts = F.array_sort(starts)
        return self._filter_live(
            joined.select(
                "docid",
                F.size(starts).cast("long").alias("n_matches"),
                F.try_element_at(starts, F.lit(1)).cast("long").alias("first_pos"),
            )
            .filter(F.col("n_matches") > 0)
        )

    def search_phrase_batch(self, phrases: DataFrame) -> DataFrame:
        """Batch exact-phrase search: (qid, phrase) -> (qid, docid,
        n_matches, first_pos) — the many-phrase twin of ``search_phrase``,
        same result shape as ``search``.

        One scan of the positions artifact serves ALL phrases: the union of
        every phrase's term_ids is pushed down once (parquet row-group
        pruning), the tiny (qid, slot, term_id, offset) plan broadcasts into
        that scan, per-row position arrays are pre-shifted by the slot's
        query offset (Lucene position increments, as search_phrase), and a
        per-(qid, docid) fold intersects the arrays — a doc qualifies only
        when all k slots matched. No per-phrase jobs, no driver loops over
        results; phrases with an OOV term are dropped up front (they cannot
        match). Position semantics identical to search_phrase (exact mode)."""
        from dhr_spark.functions.analyzer import analyze_positions

        if not self.manifest.get("positional"):
            raise ValueError(
                "index was built without positional=True; phrase search "
                "needs the positions artifact"
            )
        rows = (
            phrases.select("qid", "phrase")
            .limit(self.MAX_COLLECTED_QUERIES + 1)
            .collect()
        )
        if len(rows) > self.MAX_COLLECTED_QUERIES:
            raise ValueError(
                f"phrase set exceeds {self.MAX_COLLECTED_QUERIES} rows"
            )
        mode = self.manifest["analyzer_mode"]
        plans: dict[str, list[tuple[int, str]]] = {}
        for r in rows:
            pairs = analyze_positions(mode, r["phrase"] or "")
            if pairs:
                base = pairs[0][0]
                plans[r["qid"]] = [(p - base, t) for p, t in pairs]
        terms = sorted({t for ps in plans.values() for _, t in ps})
        if self._tid_cache is not None:
            tid = {t: self._tid_cache[t][0] for t in terms
                   if t in self._tid_cache}
        else:
            trows = self._tdict.filter(F.col("term").isin(terms)).collect()
            tid = {r["term"]: int(r["term_id"]) for r in trows}
        qp = [
            (qid, j, tid[t], off, len(ps))
            for qid, ps in plans.items()
            if all(t in tid for _, t in ps)
            for j, (off, t) in enumerate(ps)
        ]
        empty = self.spark.createDataFrame(
            [], "qid string, docid long, n_matches long, first_pos long"
        )
        if not qp:
            return empty
        qp_df = self.spark.createDataFrame(
            qp, "qid string, j int, term_id long, off int, k int"
        )
        pos = self._prune_to_manifest(
            self.spark.read.parquet(f"{self.index_dir}/positions")
        )
        needed = sorted({t for _, _, t, _, _ in qp})
        if len(needed) <= 10_000:
            pos = pos.filter(F.col("term_id").isin(needed))
        shifted = F.transform(F.col("positions"), lambda p: p - F.col("off"))
        matched = pos.join(F.broadcast(qp_df), "term_id").select(
            "qid", "docid", "k", shifted.alias("shifted")
        )
        g = (
            matched.groupBy("qid", "docid")
            .agg(
                F.count("*").alias("nt"),
                F.first("k").alias("k"),
                F.collect_list("shifted").alias("arrs"),
            )
            .filter(F.col("nt") == F.col("k"))
        )
        starts = F.array_sort(
            F.aggregate(
                F.slice(F.col("arrs"), F.lit(2), F.greatest(F.size("arrs") - 1, F.lit(1))),
                F.element_at(F.col("arrs"), 1),
                lambda acc, a: F.array_intersect(acc, a),
            )
        )
        return self._filter_live(
            g.select(
                "qid",
                "docid",
                F.size(starts).cast("long").alias("n_matches"),
                F.try_element_at(starts, F.lit(1)).cast("long").alias("first_pos"),
            )
            .filter(F.col("n_matches") > 0)
        )

    MAX_INTERVAL_EXPANSIONS = 128  # Lucene multiterm intervals cap

    def _interval_spec_tids(
        self, specs: list, max_expansions: int
    ) -> dict:
        """Resolve each leaf spec to its dictionary term_id set. Term
        leaves pass through the index analyzer (stemming under the lucene
        chain; analyzer-dropped or OOV -> empty set, Lucene's absent-term
        behavior). Prefix/wildcard leaves expand against the dictionary
        UN-analyzed (Lucene Intervals.prefix/wildcard semantics) and
        refuse past ``max_expansions`` completions — silently capping
        would silently change match semantics."""
        import re as _re

        from dhr_spark.functions.analyzer import analyze_positions

        mode = self.manifest["analyzer_mode"]
        out: dict = {}
        for kind, value in specs:
            if kind == "term":
                pairs = analyze_positions(mode, value)
                t = pairs[0][1] if pairs else None
                if t is None:
                    out[(kind, value)] = []
                elif self._tid_cache is not None:
                    hit = self._tid_cache.get(t)
                    out[(kind, value)] = [hit[0]] if hit else []
                else:
                    rows = self._tdict.filter(
                        F.col("term") == t
                    ).collect()
                    out[(kind, value)] = [int(r["term_id"]) for r in rows]
                continue
            if kind == "prefix":
                if self._tid_cache is not None:
                    cands = sorted(
                        self._tid_cache[t][0]
                        for t in self._tid_cache
                        if t.startswith(value)
                    )
                    n = len(cands)
                else:
                    rows = (
                        self._tdict.filter(
                            F.col("term").startswith(value)
                        )
                        .orderBy("term")
                        .limit(max_expansions + 1)
                        .collect()
                    )
                    cands = [int(r["term_id"]) for r in rows]
                    n = len(cands)
            else:  # wildcard
                rx = (
                    "^"
                    + _re.escape(value).replace(r"\*", ".*").replace(
                        r"\?", "."
                    )
                    + "$"
                )
                if self._tid_cache is not None:
                    pat = _re.compile(rx)
                    cands = sorted(
                        self._tid_cache[t][0]
                        for t in self._tid_cache
                        if pat.match(t)
                    )
                    n = len(cands)
                else:
                    rows = (
                        self._tdict.filter(F.col("term").rlike(rx))
                        .orderBy("term")
                        .limit(max_expansions + 1)
                        .collect()
                    )
                    cands = [int(r["term_id"]) for r in rows]
                    n = len(cands)
            if n > max_expansions:
                raise ValueError(
                    f"interval {kind} {value!r} expands to more than "
                    f"{max_expansions} dictionary terms — narrow the "
                    "pattern or raise max_expansions"
                )
            out[(kind, value)] = cands
        return out

    def search_intervals(
        self, source: dict, max_expansions: int | None = None
    ) -> DataFrame:
        """(docid, n_matches, first_start, first_end): interval query
        (Lucene IntervalsSource / ES ``intervals`` — minimal-interval
        semantics, operators/intervals.py) served from the POSITIONAL
        artifact. Reads ONLY the tree's leaf specs' position rows (term_id
        pushdown into parquet row groups), pivots them per docid with one
        grouped exchange, and runs the same per-doc algebra kernel as the
        corpus-scan twin (intervals.interval_match) — identity between the
        two is pinned in tests/test_intervals.py. Multiterm leaves
        (prefix/wildcard) expand against the dictionary, capped at
        ``max_expansions`` (refused when exceeded, Lucene behavior)."""
        out = self.search_intervals_batch(
            [("", source)], max_expansions=max_expansions
        )
        return out.drop("qid")

    def search_intervals_batch(
        self,
        trees: list[tuple[str, dict]],
        max_expansions: int | None = None,
    ) -> DataFrame:
        """(qid, docid, n_matches, first_start, first_end) for a BATCH of
        interval queries: the union of every tree's leaf specs rides ONE
        positions scan (term_id pushdown) and one docid-grouped pivot; the
        kernel then evaluates all trees against each doc's shared posmap —
        the same one-scan-serves-all contract as search_phrase_batch."""
        from dhr_spark.operators.intervals import (
            _interval_batch_kernel,
            leaf_specs,
        )

        if not self.manifest.get("positional"):
            raise ValueError(
                "index was built without positional=True; interval search "
                "needs the positions artifact (or use operators.intervals."
                "interval_match over the corpus text)"
            )
        if max_expansions is None:
            max_expansions = self.MAX_INTERVAL_EXPANSIONS
        specs: list = []
        for _, tree in trees:
            for s in leaf_specs(tree):
                if s not in specs:
                    specs.append(s)
        tidmap = self._interval_spec_tids(specs, max_expansions)
        schema = (
            "qid string, docid long, n_matches long, "
            "first_start long, first_end long"
        )
        live_tids = sorted({t for v in tidmap.values() for t in v})
        if not live_tids:
            return self.spark.createDataFrame([], schema)
        pos = self._prune_to_manifest(
            self.spark.read.parquet(f"{self.index_dir}/positions")
        ).filter(F.col("term_id").isin(live_tids))
        # pivot: one row per docid, one sorted position array per leaf
        # spec (empty when the doc matches nothing; multiterm specs union
        # their expansions' arrays — distinct terms occupy distinct
        # positions, so the flatten stays duplicate-free)
        aggs = []
        for j, s in enumerate(specs):
            tids = tidmap[s]
            if not tids:
                aggs.append(F.array().cast("array<int>").alias(f"p{j}"))
            elif len(tids) == 1:
                aggs.append(
                    F.coalesce(
                        F.first(
                            F.when(
                                F.col("term_id") == tids[0],
                                F.col("positions"),
                            ),
                            ignorenulls=True,
                        ),
                        F.array().cast("array<int>"),
                    ).alias(f"p{j}")
                )
            else:
                aggs.append(
                    F.sort_array(
                        F.flatten(
                            F.collect_list(
                                F.when(
                                    F.col("term_id").isin(tids),
                                    F.col("positions"),
                                )
                            )
                        )
                    ).alias(f"p{j}")
                )
        pivoted = pos.groupBy("docid").agg(*aggs)
        out = pivoted.mapInPandas(
            _interval_batch_kernel(trees, specs, "docid"), schema
        )
        return self._filter_live(out)

    def search_phrase_prefix(
        self,
        phrase: str,
        max_expansions: int = 50,
        expansions: list[str] | None = None,
    ) -> DataFrame:
        """(docid, n_matches, first_pos): ES ``match_phrase_prefix`` /
        Lucene ``MultiPhraseQuery`` served from the positional artifact —
        every analyzed term but the last matches exactly at its position
        increment; the LAST term is a prefix completed by up to
        ``max_expansions`` dictionary terms in term (TermsEnum) order.
        n_matches counts distinct qualifying starts: completions landing
        on the same start collapse to one phrase occurrence, exactly as
        MultiPhraseQuery enumerates positions.

        The prefix is the ANALYZED last token (stemmed under the lucene
        chain), matched against the equally-stemmed dictionary — ES
        semantics, where the index analyzer runs before expansion. The
        expansion resolves against the resident dictionary cache when
        present, else one k-gram-accelerated (index/kgram.py) bounded
        dictionary job (<= max_expansions rows collected). Matching reads
        ONLY the fixed + expansion terms' position rows (term_id pushdown
        into parquet row groups); the last slot's per-doc position arrays
        union with one (docid)-keyed aggregation over those rows — never
        the corpus. Scale shape == search_phrase plus a dictionary-bounded
        prepass."""
        from dhr_spark.functions.analyzer import analyze_positions
        from dhr_spark.index.kgram import prefix_grams

        if not self.manifest.get("positional"):
            raise ValueError(
                "index was built without positional=True; phrase-prefix "
                "search needs the positions artifact (or use operators."
                "phrase.phrase_prefix_match over the corpus text)"
            )
        pairs = analyze_positions(self.manifest["analyzer_mode"], phrase)
        if not pairs:
            raise ValueError(f"phrase {phrase!r} has no indexable terms")
        offs = [p - pairs[0][0] for p, _ in pairs]
        terms = [t for _, t in pairs]
        prefix, fixed = terms[-1], terms[:-1]
        empty = self.spark.createDataFrame(
            [], "docid long, n_matches long, first_pos long"
        )
        # ---- expansion set: dictionary terms completing the prefix ----
        # ``expansions`` (federation hook): the candidate completions were
        # already resolved globally (MultiSearcher merges member
        # dictionaries under ONE term-ASC cap); this member just maps them
        # to its own term ids — terms absent here contribute nothing
        if expansions is not None:
            if self._tid_cache is not None:
                exp_tids = [
                    self._tid_cache[t][0]
                    for t in expansions
                    if t in self._tid_cache
                ]
            else:
                exp_tids = [
                    int(r["term_id"])
                    for r in self._tdict.filter(
                        F.col("term").isin(list(expansions))
                    ).collect()
                ]
        elif self._tid_cache is not None:
            exp_tids = [
                tid
                for _, tid in sorted(
                    (t, tid)
                    for t, (tid, _idf) in self._tid_cache.items()
                    if t.startswith(prefix)
                )[:max_expansions]
            ]
        else:
            gfn = self._kgram_fn(prefix_grams)
            base = self._dict_for_grams(gfn(prefix) if gfn else None)
            exp_tids = [
                int(r["term_id"])
                for r in (
                    base.filter(F.col("term").startswith(prefix))
                    .orderBy("term")
                    .limit(max_expansions)
                    .collect()
                )
            ]
        if not exp_tids:
            return empty
        # ---- fixed-slot term ids (any OOV fixed term -> no match) ----
        if self._tid_cache is not None:
            tid = {t: self._tid_cache[t][0] for t in set(fixed)
                   if t in self._tid_cache}
        else:
            rows = self._tdict.filter(
                F.col("term").isin(list(set(fixed)))
            ).collect()
            tid = {r["term"]: int(r["term_id"]) for r in rows}
        if any(t not in tid for t in fixed):
            return empty
        pos = self._prune_to_manifest(
            self.spark.read.parquet(f"{self.index_dir}/positions")
        )
        needed = sorted({tid[t] for t in fixed} | set(exp_tids))
        if len(needed) <= 10_000:
            pos = pos.filter(F.col("term_id").isin(needed))
        off_last = offs[-1]
        last = (
            pos.filter(F.col("term_id").isin(exp_tids))
            .groupBy("docid")
            .agg(F.flatten(F.collect_list("positions")).alias("pl"))
            .select(
                "docid",
                F.transform(
                    F.array_sort("pl"), lambda p: p - F.lit(off_last)
                ).alias("plast"),
            )
        )

        def _shift_by(i: int):
            # closure, NOT a default arg (PySpark HOF arity rules)
            return lambda p: p - F.lit(i)

        joined = last
        arrs = [F.col("plast")]
        for j, t in enumerate(fixed):
            col = (
                F.transform(F.col("positions"), _shift_by(offs[j]))
                if offs[j]
                else F.col("positions")
            )
            joined = joined.join(
                pos.filter(F.col("term_id") == tid[t]).select(
                    "docid", col.alias(f"p{j}")
                ),
                "docid",
            )
            arrs.append(F.col(f"p{j}"))
        starts = arrs[0]
        for a in arrs[1:]:
            starts = F.array_intersect(starts, a)
        starts = F.array_sort(starts)
        return self._filter_live(
            joined.select(
                "docid",
                F.size(starts).cast("long").alias("n_matches"),
                F.try_element_at(starts, F.lit(1)).cast("long")
                .alias("first_pos"),
            ).filter(F.col("n_matches") > 0)
        )

    def _phrase_starts_frame(self, phrase: str):
        """(DataFrame (docid, starts array<int>), span_width) for an exact
        phrase over the positions artifact — the shared front half of the
        index-backed span queries. starts are sorted ascending; span_width
        is the Lucene span length INCLUDING position-increment gaps
        (offs[-1] + 1), so span end (exclusive) = start + span_width.
        Returns (None, 0) for an OOV phrase (it can never match)."""
        from dhr_spark.functions.analyzer import analyze_positions

        if not self.manifest.get("positional"):
            raise ValueError(
                "index was built without positional=True; span search "
                "needs the positions artifact (or use operators.phrase "
                "over the corpus text)"
            )
        pairs = analyze_positions(self.manifest["analyzer_mode"], phrase)
        if not pairs:
            raise ValueError(f"phrase {phrase!r} has no indexable terms")
        offs = [p - pairs[0][0] for p, _ in pairs]
        terms = [t for _, t in pairs]
        if self._tid_cache is not None:
            tid = {t: self._tid_cache[t][0] for t in set(terms)
                   if t in self._tid_cache}
        else:
            rows = self._tdict.filter(
                F.col("term").isin(list(set(terms)))
            ).collect()
            tid = {r["term"]: int(r["term_id"]) for r in rows}
        if any(t not in tid for t in terms):
            return None, 0
        pos = self._prune_to_manifest(
            self.spark.read.parquet(f"{self.index_dir}/positions")
        )

        def _shift_by(i: int):
            return lambda p: p - F.lit(i)

        def _shifted(j: int, off: int, t: str):
            col = (
                F.transform(F.col("positions"), _shift_by(off))
                if off
                else F.col("positions")
            )
            return pos.filter(F.col("term_id") == tid[t]).select(
                "docid", col.alias(f"p{j}")
            )

        joined = _shifted(0, offs[0], terms[0])
        for j in range(1, len(terms)):
            joined = joined.join(_shifted(j, offs[j], terms[j]), "docid")
        starts = F.col("p0")
        for j in range(1, len(terms)):
            starts = F.array_intersect(starts, F.col(f"p{j}"))
        frame = joined.select(
            "docid", F.array_sort(starts).alias("starts")
        ).filter(F.size("starts") > 0)
        return frame, offs[-1] + 1

    @staticmethod
    def _span_hits(frame: DataFrame, starts: Column) -> DataFrame:
        starts = F.array_sort(starts)
        return frame.select(
            "docid",
            F.size(starts).cast("long").alias("n_matches"),
            F.try_element_at(starts, F.lit(1)).cast("long").alias("first_pos"),
        ).filter(F.col("n_matches") > 0)

    def search_span_first(self, phrase: str, end: int) -> DataFrame:
        """(docid, n_matches, first_pos): Lucene SpanFirstQuery served from
        the positional artifact — the phrase span must END at position <=
        ``end`` (exclusive span end), i.e. start <= end - span_width.
        Index-backed twin of operators.phrase.span_first_match; span_width
        counts position-increment gaps under the lucene analyzer chain."""
        frame, width = self._phrase_starts_frame(phrase)
        empty = self.spark.createDataFrame(
            [], "docid long, n_matches long, first_pos long"
        )
        if frame is None:
            return empty
        limit = int(end) - width
        kept = F.filter(F.col("starts"), lambda s: s <= F.lit(limit))
        return self._filter_live(self._span_hits(frame, kept))

    def search_span_not(
        self, include: str, exclude: str, pre: int = 0, post: int = 0
    ) -> DataFrame:
        """(docid, n_matches, first_pos): Lucene SpanNotQuery served from
        the positional artifact — occurrences of ``include`` whose span
        does not overlap any ``exclude`` occurrence widened by pre/post.
        Overlap (exclusive ends): e + m_width - 1 >= s - pre AND
        e <= s + n_width - 1 + post. Docs with include matches but no
        exclude occurrences keep every span (LEFT join, null-safe).
        Index-backed twin of operators.phrase.span_not_match."""
        if pre < 0 or post < 0:
            raise ValueError(
                f"pre/post must be >= 0, got pre={pre} post={post}"
            )
        inc, n_w = self._phrase_starts_frame(include)
        empty = self.spark.createDataFrame(
            [], "docid long, n_matches long, first_pos long"
        )
        if inc is None:
            return empty
        exc, m_w = self._phrase_starts_frame(exclude)
        if exc is None:
            # exclusion never matches anywhere: every include span survives
            return self._filter_live(self._span_hits(inc, F.col("starts")))
        joined = inc.join(
            exc.select("docid", F.col("starts").alias("_exc")), "docid", "left"
        )
        exc_arr = F.coalesce(F.col("_exc"), F.array().cast("array<int>"))

        def _survives(s: Column) -> Column:
            return ~F.exists(
                exc_arr,
                lambda e: (e + F.lit(m_w - 1) >= s - F.lit(pre))
                & (e <= s + F.lit(n_w - 1 + post)),
            )

        kept = F.filter(F.col("starts"), _survives)
        return self._filter_live(self._span_hits(joined, kept))

    def search_span_or(self, phrases: list[str]) -> DataFrame:
        """(docid, n_matches, first_pos): Lucene SpanOrQuery served from
        the positional artifact — distinct-start union of the member
        phrases' spans (operators.phrase.span_or_match contract). OOV
        members contribute nothing (so do members the analyzer drops
        entirely, e.g. a stopword-only phrase under lucene mode — the
        parser-built SpanOr simply has no clause for them); all
        no-op members returns empty."""
        from dhr_spark.functions.analyzer import analyze_positions

        if not phrases:
            raise ValueError("span_or needs at least one phrase")
        mode = self.manifest["analyzer_mode"]
        frames = []
        for p in phrases:
            if not analyze_positions(mode, p):
                continue  # analyzer-dropped member: no clause, like OOV
            fr, _w = self._phrase_starts_frame(p)
            if fr is not None:
                frames.append(fr)
        empty = self.spark.createDataFrame(
            [], "docid long, n_matches long, first_pos long"
        )
        if not frames:
            return empty
        u = frames[0]
        for fr in frames[1:]:
            u = u.unionByName(fr)
        merged = u.groupBy("docid").agg(
            F.array_sort(
                F.array_distinct(F.flatten(F.collect_list("starts")))
            ).alias("starts")
        )
        return self._filter_live(self._span_hits(merged, F.col("starts")))

    def search_synonym(
        self,
        queries: DataFrame,
        groups: list[list[str]],
        k: int = 1000,
    ) -> DataFrame:
        """(qid, docid, rank, score): BM25 top-k where query terms matching
        a synonym set score as ONE Lucene SynonymQuery clause — member tfs
        sum BEFORE saturation, blended docFreq = max member df (the exact
        semantics of operators/synonyms.py, served from the index).

        Needs the forward index (term-major scan with term_id pushdown):
        synonym scoring merges member tfs per doc BEFORE the weight
        function, which the per-term WAND kernel cannot express — so this
        path scores exhaustively over the members' postings (the same
        trade search_filtered makes; member postings are a tiny slice of
        the corpus). Query terms outside any set stay singleton clauses;
        OOV members simply don't contribute (Lucene scores the present
        ones). Group stats use LIVE dictionary df + manifest n_docs/avgdl,
        so appends/deletes shift scores exactly as they do for BM25."""
        if not self.manifest.get("forward_index"):
            raise ValueError(
                "index was built without forward_index=True; synonym "
                "scoring needs the doc-major term-vector artifact (or use "
                "operators.synonyms.synonym_topk over the corpus text)"
            )
        from dhr_spark.operators.synonyms import synonym_groups_df
        from dhr_spark.operators.topk import score_all, topk

        memb = {}  # term -> group label
        for r in synonym_groups_df(self.spark, groups).collect():
            memb[r["term"]] = r["syn"]

        # group clauses per query from RAW analyzed tokens (pre-dictionary):
        # an OOV query term whose group has in-dict members must still
        # match them, exactly as an analyzer-level synonym expansion would.
        # qtf sums when several query terms land in the same group (one
        # SynonymQuery clause with boost = count).
        qrows = (
            queries.select("qid", "text")
            .limit(self.MAX_COLLECTED_QUERIES + 1)
            .collect()
        )
        if len(qrows) > self.MAX_COLLECTED_QUERIES:
            raise ValueError(
                f"query set exceeds {self.MAX_COLLECTED_QUERIES} rows; "
                "run huge synonym evals through operators.synonyms."
                "synonym_topk (fully distributed) instead"
            )
        clause_rows = []
        needed_groups: set[str] = set()
        for r in qrows:
            agg: dict[str, int] = {}
            for t in self._analyze(r["text"] or ""):
                g = memb.get(t, t)
                agg[g] = agg.get(g, 0) + 1
            for g, c in agg.items():
                clause_rows.append((r["qid"], g, c))
                needed_groups.add(g)
        empty = self.spark.createDataFrame(
            [], "qid string, docid long, rank int, score double"
        )
        if not clause_rows:
            return empty

        # member terms of every needed group (a query term that IS a
        # member pulls in its whole set), resolved to term_ids
        need_terms = {
            t for t, g in memb.items() if g in needed_groups
        } | needed_groups
        if self._tid_cache is not None:
            t2id = {
                t: self._tid_cache[t][0]
                for t in need_terms
                if t in self._tid_cache
            }
        else:
            t2id = {
                r["term"]: int(r["term_id"])
                for r in self._tdict.filter(
                    F.col("term").isin(sorted(need_terms))
                ).collect()
            }
        if not t2id:
            return empty
        id2group = {
            tid: memb.get(t, t) for t, tid in t2id.items()
        }
        # blended per-group df from the dictionary's df column (max member)
        td_dir = self.manifest.get("term_dict_dir", "term_dict")
        drows = (
            self.spark.read.parquet(f"{self.index_dir}/{td_dir}")
            .filter(F.col("term_id").isin(sorted(t2id.values())))
            .select("term_id", "df")
            .collect()
        )
        df_g: dict[str, int] = {}
        for r in drows:
            g = id2group[int(r["term_id"])]
            df_g[g] = max(df_g.get(g, 0), int(r["df"]))

        from dhr_spark.functions.bm25 import bm25_weight_col, idf_col

        n_docs = (
            int(self._n_docs_over)
            if self._n_docs_over is not None
            else int(self.manifest["n_docs"])
        )
        map_df = self.spark.createDataFrame(
            [(tid, g, df_g[g]) for tid, g in id2group.items()],
            "term_id long, grp string, df long",
        )
        fwd = self._prune_to_manifest(
            self.spark.read.parquet(f"{self.index_dir}/forward")
        ).filter(F.col("term_id").isin(sorted(t2id.values())))
        merged = (
            fwd.join(F.broadcast(map_df), "term_id")
            .groupBy("docid", "grp")
            .agg(
                F.sum("tf").alias("tf"),
                F.max("dl").alias("dl"),
                F.max("df").alias("df"),
            )
        )
        post = merged.select(
            F.col("grp").alias("term"),
            "docid",
            F.round(
                bm25_weight_col(
                    F.col("tf"),
                    F.col("dl"),
                    idf_col(F.col("df"), n_docs),
                    F.lit(self._avgdl),
                    self.k1,
                    self.b,
                ),
                6,
            ).alias("weight"),
        )
        qdf = self.spark.createDataFrame(
            clause_rows, "qid string, term string, qtf long"
        )
        # tombstones masked BEFORE ranking so ranks stay dense 1..k
        return topk(score_all(qdf, self._filter_live(post), on="term"), k)

    def search_proximity(self, terms_raw: list[str], window: int) -> DataFrame:
        """(docid, window_start): docs where ALL terms co-occur within any
        ``window``-token span, served from the positional artifact (the
        index-backed twin of operators.phrase.proximity_match — same
        candidate-start cover test, exact)."""
        if not self.manifest.get("positional"):
            raise ValueError(
                "index was built without positional=True; proximity search "
                "needs the positions artifact"
            )
        terms = sorted({t for raw in terms_raw for t in self._analyze(raw)})
        if not terms:
            raise ValueError("no indexable terms")
        if self._tid_cache is not None:
            tid = {t: self._tid_cache[t][0] for t in terms if t in self._tid_cache}
        else:
            rows = self._tdict.filter(F.col("term").isin(terms)).collect()
            tid = {r["term"]: int(r["term_id"]) for r in rows}
        empty = self.spark.createDataFrame([], "docid long, window_start long")
        if any(t not in tid for t in terms):
            return empty
        pos = self._prune_to_manifest(
            self.spark.read.parquet(f"{self.index_dir}/positions")
        )
        joined = None
        for i, t in enumerate(terms):
            rel = pos.filter(F.col("term_id") == tid[t]).select(
                "docid", F.col("positions").alias(f"m{i}")
            )
            joined = rel if joined is None else joined.join(rel, "docid")
        m_cols = [F.col(f"m{i}") for i in range(len(terms))]
        all_pos = F.array_sort(F.array_distinct(F.flatten(F.array(*m_cols))))

        def covers(s):
            ok = F.lit(True)
            for mc in m_cols:
                ok = ok & F.exists(
                    mc, lambda q: (q >= s) & (q < s + F.lit(window))
                )
            return ok

        valid = F.filter(all_pos, covers)
        return self._filter_live(
            joined.select(
                "docid",
                F.try_element_at(valid, F.lit(1)).cast("long").alias("window_start"),
            )
            .filter(F.col("window_start").isNotNull())
        )

    MAX_FETCH_DOCS = 1_000_000
