"""Docvalues, result aggregations, sorted/filtered/boosted serving —
count/pagination, search_sorted over index-time sort, facets,
histograms, composite/pipeline aggs, collapse, block-join parents,
function-score and recency boosts (split out of wand.py in round 4;
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


class ReaderMixin:
    def count(self, queries: DataFrame) -> DataFrame:
        """(qid, n): EXACT total hit count per query under OR semantics —
        Lucene ``IndexSearcher.count`` / TotalHitCountCollector. Decodes
        only the query terms' docid blocks (tf bytes never read, nothing
        scored); chunk partitioning makes the global distinct count a plain
        sum of per-chunk counts — one tiny shuffle of |Q|·n_chunks rows.
        Queries with zero hits (or all-OOV / empty text) emit no row."""
        qinfo, all_terms = self._query_info(queries)
        seg = self._seg_for_terms(all_terms)
        kernel = _count_chunk(
            qinfo,
            int(self.manifest["block_size"]),
            int(self.manifest["chunk_bits"]),
            tombstones=self._tombstones,
            codec=self._codec,
        )
        counted = self._by_chunk(seg).applyInPandas(
            kernel, "qid string, n long"
        )
        return counted.groupBy("qid").agg(F.sum("n").alias("n"))

    def search_after(
        self,
        queries: DataFrame,
        after: dict[str, tuple[float, int]],
        size: int = 10,
        prune: bool = True,
    ) -> DataFrame:
        """Cursor pagination — Lucene ``IndexSearcher.searchAfter``.
        ``after`` maps qid -> (score, docid) of the LAST hit of the previous
        page, exactly as ``search`` emitted it (scores are round-6). Returns
        the next ``size`` hits strictly after each cursor in (score DESC,
        docid ASC) order, with page-local ranks 1..size; qids without a
        cursor start at page one. Deterministic across page walks because
        ranking ties are pinned the same way everywhere (topk round-6 +
        docid tie-break) — no shifting results between pages.

        Cost shape: cursor queries skip the block-pruning bootstrap (see
        _score_chunk) so they decode all their terms' postings — the price
        Lucene's searchAfter re-collection pays as well; the term_id
        pushdown and chunk-local top-size merge are unchanged."""
        aft = {
            q: (float(s), int(d)) for q, (s, d) in after.items()
        }
        qinfo, all_terms = self._query_info(queries)
        return self._search_prepared(qinfo, all_terms, size, prune, after=aft)

    def _matched_docs(self, queries: DataFrame) -> DataFrame:
        """(qid, docid): every live document matching >= 1 query term (OR
        semantics) — docid-blocks-only decode, nothing scored."""
        qinfo, all_terms = self._query_info(queries)
        qsets = {qid: tids for qid, (tids, _, _) in qinfo.items()}
        kern = _presence_chunk(
            qsets, int(self.manifest["block_size"]),
            int(self.manifest["chunk_bits"]), tombstones=self._tombstones,
            codec=self._codec,
        )
        return (
            self._by_chunk(self._seg_for_terms(all_terms))
            .applyInPandas(kern, "qid string, docid long, n_hit long")
            .select("qid", "docid")
        )

    def docvalues_frame(self, fields: list[str]) -> DataFrame:
        """(docid, *fields) from the doc_map docvalues columns (Lucene
        DocValues). Fields must have been declared at build time
        (build_index(docvalues=[...])). Committed in-place updates
        (index/dvupdate.update_docvalues — Lucene updateDocValues) are
        overlaid latest-generation-wins, snapshot-consistently (the
        manifest's dv_gens is the watermark)."""
        import os

        from dhr_spark.index.dvupdate import overlay_fields

        if not os.path.isdir(os.path.join(self.index_dir, "doc_map")):
            raise ValueError(
                "index has no doc_map artifact — build with a doc_map_df "
                "(build_index writes one automatically) to use docvalues"
            )
        dm = self.spark.read.parquet(f"{self.index_dir}/doc_map")
        have = set(dm.columns) - {"docid", "seg_batch"}
        missing = [f for f in fields if f not in have]
        if missing:
            raise ValueError(
                f"docvalues {missing} not in this index's doc_map (has "
                f"{sorted(have)}); rebuild with build_index(docvalues=[...])"
            )
        return overlay_fields(
            self.spark,
            self.index_dir,
            self.manifest,
            dm.select("docid", *fields),
            fields,
        )

    def search_sorted(
        self,
        queries: DataFrame,
        by: str,
        k: int = 100,
        ascending: bool = False,
        after: dict | None = None,
    ) -> DataFrame:
        """(qid, docid, rank, <by>): the top-k MATCHING docs ordered by a
        docvalues field instead of score — Lucene's Sort(SortField). Exact:
        every matching doc is enumerated (docid-blocks-only decode, no
        scoring work), joined to the columnar field, and ranked per query
        with docid as the deterministic tie-break.

        When the index was built with ``index_sort=(by, ascending)`` (same
        field AND direction — Lucene early-terminates under the same
        condition), this early-terminates instead: within every chunk,
        docid order IS the requested order (appends preserve the per-chunk
        invariant), so the kernel keeps only each chunk's first k matches
        and only n_chunks·k·|Q| candidate rows reach the field join and
        the global window — the full match set is never materialized,
        sorted, or joined. At 10^12 turns that is the difference between
        sorting a billion-row match set for "the latest 10 matching
        turns" and merging a few thousand candidates. Results are
        bit-identical to the exhaustive path (each chunk's first-k by
        docid is a superset of its contribution to the global top-k; ties
        agree because within-tie docid order is corpus order on both
        paths). A direction mismatch falls back to the exhaustive path
        (a reversed in-chunk cut would break tie semantics).

        ``after``: ``{qid: (value, docid)}`` cursor — resume strictly AFTER
        that (field value, docid) row in the sort order: searchAfter for
        field-sorted hits, page-locally renumbered 1..k. Qids absent from
        the cursor start at the top. On the sorted fast path the cursor is
        pushed INTO the per-chunk kernel: one doc_map aggregation derives,
        per (qid, chunk), the first docid past the cursor (within a sorted
        chunk the post-cursor matches form a docid suffix), so page N of
        "the latest matching turns" still touches only k candidate rows
        per chunk — deep pagination never re-materializes the match set."""
        from pyspark.sql import Window

        dv = self.docvalues_frame([by])
        order = F.col(by).asc() if ascending else F.col(by).desc()
        w = Window.partitionBy("qid").orderBy(order, F.col("docid").asc())

        cur_df = None
        if after:
            if len(after) > self.MAX_COLLECTED_QUERIES:
                raise ValueError(
                    f"cursor set of {len(after)} exceeds "
                    f"{self.MAX_COLLECTED_QUERIES}"
                )
            cur_df = self.spark.createDataFrame(
                [(q, v, int(d)) for q, (v, d) in after.items()],
                ["qid", "_cv", "_cd"],
            ).withColumn("_cv", F.col("_cv").cast(dv.schema[by].dataType))

        def _past_cursor(fld):
            strict = fld > F.col("_cv") if ascending else fld < F.col("_cv")
            return strict | (
                fld.eqNullSafe(F.col("_cv")) & (F.col("docid") > F.col("_cd"))
            )

        iso = self.manifest.get("index_sort")
        if (
            iso
            and iso.get("field") == by
            and bool(iso.get("ascending")) == bool(ascending)
        ):
            qinfo, all_terms = self._query_info(queries)
            qsets = {qid: tids for qid, (tids, _, _) in qinfo.items()}
            starts, cursor_qids = None, None
            if after:
                bits = int(self.manifest["chunk_bits"])
                rows = (
                    dv.crossJoin(F.broadcast(cur_df))
                    .filter(_past_cursor(F.col(by)))
                    .groupBy(
                        "qid", F.shiftright("docid", bits).alias("_chunk")
                    )
                    .agg(F.min("docid").alias("_start"))
                    .collect()
                )
                starts = {}
                for r in rows:
                    starts.setdefault(r["qid"], {})[int(r["_chunk"])] = int(
                        r["_start"]
                    )
                cursor_qids = frozenset(after)
            kern = _presence_chunk(
                qsets,
                int(self.manifest["block_size"]),
                int(self.manifest["chunk_bits"]),
                tombstones=self._tombstones,
                codec=self._codec,
                limit=int(k),
                starts=starts,
                cursor_qids=cursor_qids,
            )
            cand = (
                self._by_chunk(self._seg_for_terms(all_terms))
                .applyInPandas(kern, "qid string, docid long, n_hit long")
                .select("qid", "docid")
            )
            return (
                cand.join(dv, "docid")
                .withColumn("rank", F.row_number().over(w).cast("int"))
                .filter(F.col("rank") <= k)
                .select("qid", "docid", "rank", by)
            )
        res = self._matched_docs(queries).join(dv, "docid")
        if after:
            res = (
                res.join(F.broadcast(cur_df), "qid", "left")
                .filter(
                    F.col("_cv").isNull() | _past_cursor(F.col(by))
                )
                .drop("_cv", "_cd")
            )
        return (
            res.withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= k)
            .select("qid", "docid", "rank", by)
        )

    def result_facets(self, queries: DataFrame, field: str) -> DataFrame:
        """(qid, <field>, n): facet counts over the MATCHING documents of
        each query (Lucene faceting on hits, not the corpus): exact OR-match
        enumeration joined to the docvalues column, one count per distinct
        field value per query."""
        dv = self.docvalues_frame([field])
        return (
            self._matched_docs(queries)
            .join(dv, "docid")
            .groupBy("qid", field)
            .agg(F.count("*").alias("n"))
        )

    def result_facet_ranges(
        self,
        queries: DataFrame,
        field: str,
        bounds: list,
    ) -> DataFrame:
        """(qid, bucket, lo, hi, n): histogram facets over the MATCHING
        documents of each query — Lucene RangeFacetCounts. ``bounds``
        [b0, b1, ..., bm] defines m half-open buckets [b_i, b_{i+1});
        values outside [b0, bm) are not counted (Lucene ranges are
        explicit too). Same plan shape as result_facets: exact OR-match
        enumeration (docid blocks only, nothing scored) joined to the
        pushed-down docvalues column, then a codegen'd bucket expression —
        empty buckets emit no row."""
        if len(bounds) < 2 or sorted(bounds) != list(bounds):
            raise ValueError("bounds must be >= 2 ascending values")
        dv = self.docvalues_frame([field]).filter(
            (F.col(field) >= bounds[0]) & (F.col(field) < bounds[-1])
        )
        # bucket index via half-open comparison chain — m is user-tiny, the
        # CASE chain stays whole-stage-codegen
        b = F.lit(len(bounds) - 2)
        for i in range(len(bounds) - 2, -1, -1):
            b = F.when(F.col(field) < bounds[i + 1], F.lit(i)).otherwise(b)
        lows = F.array(*[F.lit(x) for x in bounds[:-1]])
        highs = F.array(*[F.lit(x) for x in bounds[1:]])
        return (
            self._matched_docs(queries)
            .join(dv, "docid")
            .withColumn("bucket", b.cast("int"))
            .groupBy("qid", "bucket")
            .agg(F.count("*").alias("n"))
            .select(
                "qid",
                "bucket",
                F.element_at(lows, F.col("bucket") + 1).alias("lo"),
                F.element_at(highs, F.col("bucket") + 1).alias("hi"),
                "n",
            )
        )

    def result_stats(self, queries: DataFrame, field: str) -> DataFrame:
        """(qid, n, min, max, sum, avg, variance, std_dev): ES
        extended_stats over an integer docvalues field of each query's
        MATCHING documents. Exact OR-match enumeration (docid blocks only)
        joined to the columnar field; moments ride exact integer sums
        (operators/hitstats.py)."""
        from dhr_spark.operators.hitstats import hit_stats

        return hit_stats(
            self._matched_docs(queries), self.docvalues_frame([field]), field
        )

    def result_histogram(
        self,
        queries: DataFrame,
        field: str,
        interval: int,
        offset: int = 0,
    ) -> DataFrame:
        """(qid, bucket, n): ES ``histogram`` / fixed-interval
        ``date_histogram`` over an integer docvalues field of each query's
        MATCHING documents — fixed-width buckets
        floor((v−offset)/interval)·interval + offset, non-empty only,
        all-integer arithmetic (operators/hitstats.hit_histogram; pass a
        time-unit interval on an epoch field for the date variant)."""
        from dhr_spark.operators.hitstats import hit_histogram

        return hit_histogram(
            self._matched_docs(queries),
            self.docvalues_frame([field]),
            field,
            interval,
            offset,
        )

    def result_adjacency(self, queries: DataFrame) -> DataFrame:
        """(qid_a, qid_b, n): ES ``adjacency_matrix`` over the queries'
        MATCHING documents — pairwise hit-set intersection counts plus the
        diagonal (operators/hitstats.hit_adjacency)."""
        from dhr_spark.operators.hitstats import hit_adjacency

        return hit_adjacency(self._matched_docs(queries))

    def search_random(
        self, queries: DataFrame, seed: int, k: int = 10
    ) -> DataFrame:
        """(qid, docid, rank, score): seeded random sampling of each
        query's MATCHING documents — ES function_score random_score
        (operators/boost.random_hits_topk): deterministic uniform draw per
        (seed, docid), integer-hash ordering, reproducible across runs."""
        from dhr_spark.operators.boost import random_hits_topk

        # _matched_docs is already live-only (tombstones mask in-kernel)
        return random_hits_topk(self._matched_docs(queries), seed, k)

    def result_histogram_pipeline(
        self,
        queries: DataFrame,
        field: str,
        interval: int,
        offset: int = 0,
        window: int = 3,
    ) -> DataFrame:
        """(qid, bucket, n, cum_n, derivative, moving_avg): ES pipeline
        aggregations (cumulative_sum / derivative / moving_avg) over each
        query's date/number histogram (operators/hitstats.
        histogram_pipeline over result_histogram)."""
        from dhr_spark.operators.hitstats import histogram_pipeline

        return histogram_pipeline(
            self.result_histogram(queries, field, interval, offset),
            window=window,
        )

    def result_composite(
        self,
        queries: DataFrame,
        sources: list[tuple],
        size: int,
        after: dict | None = None,
    ) -> DataFrame:
        """(qid, <source names...>, n): ES ``composite`` aggregation over
        each query's MATCHING documents — paginated multi-source bucket
        enumeration with a resumable ``after`` cursor (operators/hitstats.
        hit_composite). Source fields resolve through docvalues (committed
        dv-update generations overlaid)."""
        from dhr_spark.operators.hitstats import hit_composite

        fields = sorted(
            {s[2] if s[1] == "terms" else s[2][0] for s in sources}
        )
        return hit_composite(
            self._matched_docs(queries),
            self.docvalues_frame(fields),
            sources,
            size,
            after,
        )

    def result_percentiles(
        self,
        queries: DataFrame,
        field: str,
        pcts: list[int] = [25, 50, 75, 95, 99],
    ) -> DataFrame:
        """(qid, pct, value, n): ES percentiles aggregation (nearest-rank,
        exact — no TDigest approximation needed: the sort is per-hit-set,
        not per-corpus) over an integer docvalues field of each query's
        MATCHING documents."""
        from dhr_spark.operators.hitstats import hit_percentiles

        return hit_percentiles(
            self._matched_docs(queries),
            self.docvalues_frame([field]),
            field,
            pcts,
        )

    def result_correlation(
        self, queries: DataFrame, field_a: str, field_b: str
    ) -> DataFrame:
        """(qid, n, corr): Pearson correlation of two integer docvalues
        fields over each query's MATCHING documents — ES ``matrix_stats``'
        correlation cell (operators/hitstats.hit_correlation; exact integer
        moments, fixed two-sqrt/one-divide float shape)."""
        from dhr_spark.operators.hitstats import hit_correlation

        return hit_correlation(
            self._matched_docs(queries),
            self.docvalues_frame(
                [field_a, field_b] if field_a != field_b else [field_a]
            ),
            field_a,
            field_b,
        )

    def result_cardinality(
        self, queries: DataFrame, field: str, p: int = 10
    ) -> DataFrame:
        """(qid, m, used, zeros, sum_pow, raw_est): ES ``cardinality``
        aggregation (HyperLogLog) of a docvalues field over each query's
        MATCHING documents — approximate distinct count carried as fixed
        O(2^p) register state per query, the only shape that survives hit
        sets of 10^10 docs (an exact count_distinct would shuffle every
        hit on the value)."""
        from dhr_spark.operators.sketches import hll_cardinality

        hits = self._matched_docs(queries).join(
            self.docvalues_frame([field]), "docid"
        )
        return hll_cardinality(hits, field, p, group_cols=["qid"])

    def search_collapse(
        self,
        queries: DataFrame,
        field: str,
        k: int = 100,
        group_limit: int = 1,
    ) -> DataFrame:
        """(qid, docid, rank, score, <field>): BM25 top-k collapsed to at
        most ``group_limit`` best docs per value of a docvalues field —
        Lucene's CollapsingTopDocsCollector (SERP-style one-hit-per-group).

        Exact: scoring is exhaustive (no chunk-local cutoff — a pruned
        top-k could starve a group whose best doc hides below another
        group's flood), then a per-(qid, field) window keeps each group's
        best ``group_limit`` docs and a per-qid window ranks the
        survivors. Lucene's collapsing collector visits every hit too."""
        from pyspark.sql import Window

        qinfo, all_terms = self._query_info(queries)
        chunk_docs = 1 << int(self.manifest["chunk_bits"])
        scored = self._scored_frame(qinfo, all_terms, chunk_docs, prune=False)
        dv = self.docvalues_frame([field])
        r6 = F.round(F.col("score"), 6)
        wg = Window.partitionBy("qid", field).orderBy(
            r6.desc(), F.col("docid").asc()
        )
        wq = Window.partitionBy("qid").orderBy(r6.desc(), F.col("docid").asc())
        return (
            scored.join(dv, "docid")
            .withColumn("_g", F.row_number().over(wg))
            .filter(F.col("_g") <= group_limit)
            .withColumn("rank", F.row_number().over(wq).cast("int"))
            .filter(F.col("rank") <= k)
            .select("qid", "docid", "rank", r6.alias("score"), field)
        )

    def result_top_hits(
        self,
        queries: DataFrame,
        field: str,
        n_buckets: int = 10,
        hits_per_bucket: int = 3,
    ) -> DataFrame:
        """(qid, <field>, bucket_n, docid, rank, score): Elasticsearch's
        ``terms`` aggregation with a ``top_hits`` sub-aggregation — for each
        query, the ``n_buckets`` largest buckets of a docvalues field over
        the MATCHING documents (bucket size = hit count, ties by field value
        ascending), and inside each bucket the ``hits_per_bucket`` best hits
        by BM25 (docid tie-break). ``rank`` is the in-bucket hit rank.

        Exact by the same argument as search_collapse: scoring is
        exhaustive (a pruned top-k could starve a large-but-low-scoring
        bucket entirely), then two windows over the HIT SET only — bucket
        sizing and in-bucket ranking never touch non-matching docs, and
        the docvalues join is hit-set-proportional. At 10^12 turns the
        scored frame is the dominant cost and is identical to the plain
        exhaustive-search plan; the aggregation adds one hash agg and two
        hit-set windows, no corpus shuffle."""
        from pyspark.sql import Window

        qinfo, all_terms = self._query_info(queries)
        chunk_docs = 1 << int(self.manifest["chunk_bits"])
        scored = self._scored_frame(qinfo, all_terms, chunk_docs, prune=False)
        dv = self.docvalues_frame([field])
        r6 = F.round(F.col("score"), 6)
        j = scored.join(dv, "docid").select(
            "qid", "docid", r6.alias("s6"), field
        )
        wb = Window.partitionBy("qid").orderBy(
            F.col("bucket_n").desc(), F.col(field).asc()
        )
        buckets = (
            j.groupBy("qid", field)
            .agg(F.count("*").alias("bucket_n"))
            .withColumn("_b", F.row_number().over(wb))
            .filter(F.col("_b") <= n_buckets)
            .drop("_b")
        )
        wh = Window.partitionBy("qid", field).orderBy(
            F.col("s6").desc(), F.col("docid").asc()
        )
        hits = (
            j.withColumn("rank", F.row_number().over(wh).cast("int"))
            .filter(F.col("rank") <= hits_per_bucket)
        )
        return hits.join(buckets, ["qid", field]).select(
            "qid", field, "bucket_n", "docid", "rank",
            F.col("s6").alias("score"),
        )

    def search_parents(
        self,
        queries: DataFrame,
        k: int = 100,
        score_mode: str = "max",
        parent_field: str = "conv_id",
    ) -> DataFrame:
        """(qid, parent, rank, score): Lucene ToParentBlockJoinQuery over
        the index — per-turn (child) BM25 hits rolled up to their parent
        conversation under a ScoreMode (max/total/avg/min;
        operators/conversations.block_join_topk is the DataFrame twin this
        delegates to). ``parent_field`` is a doc_map column (conv_id by
        default — every transcripts index carries it).

        Exact for every ScoreMode: child scoring is exhaustive (no
        chunk-local cutoff — the same starvation argument as
        search_collapse: under total/avg/min ANY pruned child changes the
        parent score, and under max the representative child may rank
        below another parent's flood). The rollup joins the hit set, not
        the corpus, and the join is chunk-colocated with doc_map."""
        from dhr_spark.operators.conversations import block_join_topk

        qinfo, all_terms = self._query_info(queries)
        chunk_docs = 1 << int(self.manifest["chunk_bits"])
        scored = self._scored_frame(qinfo, all_terms, chunk_docs, prune=False)
        child = scored.select(
            "qid", "docid", F.round("score", 6).alias("score")
        )
        parents = self.docvalues_frame([parent_field]).select(
            "docid", F.col(parent_field).alias("parent")
        )
        return block_join_topk(
            child, parents, k=k, score_mode=score_mode
        ).withColumnRenamed("docid", "parent")

    def search_filtered(
        self,
        queries: DataFrame,
        field: str,
        lo=None,
        hi=None,
        values: list | None = None,
        k: int = 1000,
        sim: str = "bm25",
        sim_param: float | None = None,
    ) -> DataFrame:
        """(qid, docid, rank, score): top-k restricted to docs whose
        docvalues ``field`` passes a range ([lo, hi], either bound may be
        None) or a value set — Lucene's FILTER-clause
        RangeQuery/TermInSetQuery over DocValues. ``sim``/``sim_param``
        pick the scorer (bm25 | qld | lmjm | f2exp | f2log | tfidf, knob
        semantics per _prep_sim) — a filter clause composes with every
        similarity, exactly as in Lucene
        (IndexOrDocValuesQuery; the reference's Anserini layer exposes it
        as filtered search).

        Exact by construction: scoring is exhaustive (prune=False — WAND's
        theta reflects the UNFILTERED score distribution, so chunk-local
        pruning could starve in-filter docs ranked below out-of-filter
        flood), then the docvalues predicate — pushed down into the
        doc_map parquet scan — gates the hits before the per-qid ranking
        window. Lucene instead leapfrogs the filter iterator against the
        scorer; the Spark twin is this join, which AQE demotes to a
        broadcast when the filter is selective. BM25 stats are the global
        (unfiltered) ones, matching Lucene: a filter clause never
        contributes to scoring."""
        if values is None and lo is None and hi is None:
            raise ValueError("pass values=, lo=, and/or hi=")
        dv = self.docvalues_frame([field])
        if values is not None:
            dv = dv.filter(F.col(field).isin(list(values)))
        if lo is not None:
            dv = dv.filter(F.col(field) >= lo)
        if hi is not None:
            dv = dv.filter(F.col(field) <= hi)
        qinfo, all_terms, ksim, mu = self._prep_sim(queries, sim, sim_param)
        chunk_docs = 1 << int(self.manifest["chunk_bits"])
        scored = self._scored_frame(
            qinfo, all_terms, chunk_docs, False, sim=ksim, mu=mu
        )
        return topk(scored.join(dv.select("docid"), "docid"), k)

    def search_boosted(
        self,
        queries: DataFrame,
        field: str,
        scale: float = 250.0,
        k: int = 1000,
        window: int | None = None,
        sim: str = "bm25",
        sim_param: float | None = None,
        prune: bool = True,
    ) -> DataFrame:
        """(qid, docid, rank, score): FunctionScoreQuery — relevance
        multiplied by the saturation prior ``v / (v + scale)`` over the
        docvalues ``field`` (Lucene FeatureField.newSaturationQuery /
        Elasticsearch function_score; operators/boost.py documents the
        integer-micros determinism contract the emitted score follows).
        ``sim``/``sim_param`` pick the relevance scorer, composing like
        search_filtered does.

        ``window=None`` (exact): every matching doc is scored exhaustively
        (prune=False — WAND's theta bounds the RELEVANCE ranking, which a
        multiplicative prior reorders, so chunk-local pruning could drop
        the boosted winner) and the prior re-ranks the full hit set. This
        is the oracle mode.

        ``window=W``: Elasticsearch ``rescore`` semantics — relevance
        top-W via block-max WAND, then the prior re-ranks only that
        window and the top-k is cut from it. Bounded work at any corpus
        size; exact whenever the true boosted top-k lies inside the
        relevance top-W (factors are monotone in score for fixed v, so a
        generous W — the ES default is 10x k — converges quickly; the
        exact/window identity is pinned in tests at W >= |matches|)."""
        from dhr_spark.operators.boost import boosted_rank

        scored, dv = self._boost_scored(
            queries, field, window, sim, sim_param, prune
        )
        return boosted_rank(scored, dv, scale=scale, signal_col=field, k=k)

    def search_recency(
        self,
        queries: DataFrame,
        field: str,
        now: int,
        half_life_s: int = 7 * 86400,
        k: int = 1000,
        window: int | None = None,
        sim: str = "bm25",
        sim_param: float | None = None,
        prune: bool = True,
    ) -> DataFrame:
        """(qid, docid, rank, score): recency-boosted retrieval — relevance
        x ``h / (h + age)`` half-life decay over the epoch-seconds
        docvalues ``field`` (operators/boost.recency_boost_col; future
        timestamps clamp to factor 1). The transcript-search staple:
        "prefer recent conversations". Same exact/window split and
        similarity composition as search_boosted."""
        from dhr_spark.operators.boost import recency_rank

        scored, dv = self._boost_scored(
            queries, field, window, sim, sim_param, prune
        )
        return recency_rank(
            scored, dv, ts_col=field, now=now, half_life_s=half_life_s, k=k
        )

    def search_boosting(
        self,
        queries: DataFrame,
        negatives: DataFrame,
        negative_boost: float = 0.5,
        k: int = 1000,
        window: int | None = None,
        sim: str = "bm25",
        sim_param: float | None = None,
        prune: bool = True,
    ) -> DataFrame:
        """(qid, docid, rank, score): Lucene BoostingQuery / Elasticsearch
        ``boosting`` query — ``queries`` (qid, text) score as usual, but a
        document that ALSO matches the qid's row in ``negatives`` (qid,
        text; any analyzed term present) keeps matching with its score
        scaled by ``negative_boost`` (a multiple of 1/16 in [0, 1] — the
        integer-exact demotion contract, operators/boost.demoted_rank).
        The classic use: push down near-spam/boilerplate hits without the
        hard exclusion a MUST_NOT would impose. Qids with no negatives row
        (or an all-OOV negative) are untouched.

        ``window=None`` scores the positive side exhaustively (exact — the
        oracle mode: a demoted winner can come from arbitrarily deep in
        the relevance ranking); ``window=W`` is the ES rescore shape:
        relevance top-W via block-max WAND, demotion re-ranks the window.
        The negative side never scores — one docid-blocks-only presence
        pass (_presence_chunk), the MUST_NOT machinery's cost."""
        qinfo2, all_terms2, ksim, mu = self._prep_sim(queries, sim, sim_param)
        if window is None:
            chunk_docs = 1 << int(self.manifest["chunk_bits"])
            scored = self._scored_frame(
                qinfo2, all_terms2, chunk_docs, False, sim=ksim, mu=mu
            )
        else:
            scored = self._search_prepared(
                qinfo2, all_terms2, int(window), prune, sim=ksim, mu=mu
            ).select("qid", "docid", "score")
        # merge duplicate-qid negative rows BEFORE query prep: _query_info
        # keeps one tf dict per qid (last collected row wins, order
        # nondeterministic) — the union of analyzed term SETS is what the
        # presence gate needs, and concatenation order cannot change a set
        negatives = negatives.groupBy("qid").agg(
            F.concat_ws(" ", F.collect_list("text")).alias("text")
        )
        neg_info, _ = self._query_info(negatives)
        from dhr_spark.operators.boost import demoted_rank

        if not neg_info:
            neg = self.spark.createDataFrame([], "qid string, docid long")
        else:
            qsets = {q: tids for q, (tids, _, _) in neg_info.items()}
            kern = _presence_chunk(
                qsets,
                int(self.manifest["block_size"]),
                int(self.manifest["chunk_bits"]),
                tombstones=self._tombstones,
                codec=self._codec,
            )
            seg = self._seg_for_terms(
                sorted({int(t) for s in qsets.values() for t in s})
            )
            neg = self._by_chunk(seg).applyInPandas(
                kern, "qid string, docid long, n_hit long"
            ).select("qid", "docid")
            if window is not None:
                # rescore mode: the scored window (<= |Q|·W rows) is the
                # small side — broadcast-semi it into the negative stream
                # so a common negative term's corpus-scale match set
                # (measured ~30M rows for 50 q x 'the' at 986k turns)
                # shuffles nothing. A driver-side collect-and-gate variant
                # was measured SLOWER (the 400k-row round trip cost ~37s —
                # more than the emission it saved); exact mode skips the
                # probe since its scored set is itself corpus-scale.
                neg = neg.join(
                    F.broadcast(scored.select("qid", "docid")),
                    ["qid", "docid"],
                    "left_semi",
                )
        # the presence kernel emits one row per (qid, doc) — a doc lives in
        # exactly one chunk — so the defensive dedup shuffle is skippable
        return demoted_rank(
            scored, neg, negative_boost=negative_boost, k=k, neg_unique=True
        )

    def _boost_scored(self, queries, field, window, sim, sim_param, prune):
        """Shared FunctionScore plumbing: (relevance scored set, docvalues
        column). window=None -> exhaustive (exact mode, prune disabled —
        WAND's theta bounds the relevance ranking, which a prior reorders);
        window=W -> relevance top-W via block-max WAND (ES rescore)."""
        dv = self.docvalues_frame([field])
        qinfo, all_terms, ksim, mu = self._prep_sim(queries, sim, sim_param)
        if window is None:
            chunk_docs = 1 << int(self.manifest["chunk_bits"])
            scored = self._scored_frame(
                qinfo, all_terms, chunk_docs, False, sim=ksim, mu=mu
            )
        else:
            scored = self._search_prepared(
                qinfo, all_terms, int(window), prune, sim=ksim, mu=mu
            ).select("qid", "docid", "score")
        return scored, dv

    def doc_lengths_frame(self, chunks: list[int] | None = None) -> DataFrame:
        """(docid, dl): per-document lengths exploded from the packed
        doclens arrays, optionally restricted to a chunk list (partition
        pruning). Holes (docs with no postings) are skipped."""
        dl = self._dl
        if chunks is not None:
            dl = dl.filter(F.col("chunk").isin([int(c) for c in chunks]))

        def gen(it):
            for pdf in it:
                for _, row in pdf.iterrows():
                    arr = np.frombuffer(row["dls"], dtype=np.int32)
                    nz = np.flatnonzero(arr)
                    yield pd.DataFrame(
                        {
                            "docid": nz + int(row["base_docid"]),
                            "dl": arr[nz].astype(np.int64),
                        }
                    )

        return dl.mapInPandas(gen, "docid long, dl long")
