"""Block-max WAND top-k over segment indexes — the fast query path.

Algorithm per (chunk, query), all numpy-vectorized inside a cogrouped Arrow
UDF (no per-row Python):

  1. Per-block weight bounds computed AT QUERY TIME from the stored
     (max_tf, min_dl) pairs under the CURRENT stats:
         bound[t][b] = idf_t · f(max_tf, min_dl),  f = tf/(tf+k1(1-b+b·dl/avgdl))
     (w is monotone ↑tf ↓dl, so the bound is admissible under any idf/avgdl
     — what keeps committed segments valid across incremental appends).
     Term upper bounds U_t = qtf_t * max_b bound[t][b].
  2. Safe threshold bootstrap: fully score the single highest-impact term t*;
     theta = k-th largest single-term score (a lower bound on the chunk's
     true k-th best total score when df_chunk(t*) >= k, else -inf).
  3. Block pruning: skip block b of term t iff
         qtf_t * bound[t][b]  +  sum_{t' != t} U_t'  <  theta.
     Any doc confined to a pruned block has total upper bound < theta, hence
     cannot enter the true top-k (BM25 weights are strictly positive), and
     cannot even tie the k-th doc (strict inequality). Surviving blocks are
     decoded independently (absolute-restart delta blocks + byte offsets)
     and scored EXACTLY, so the emitted top-k docids AND scores are exact —
     the safe-pruning analogue of the reference's two-stage
     candidates->rescore contract (/root/reference/retrieval/
     gip_retrieval.py:128-156) without its approximation.
  4. Per-chunk local top-k -> global window top-k merge (lossless, the
     reference's shard-merge, merge.result.py:22-41).

Scale shape: parquet predicate pushdown reads ONLY the query terms' segment
rows; chunks are the parallel unit (1000 executors each score their chunks'
local top-k); the merge moves only n_chunks * k * |Q| tiny rows.
"""
from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dhr_spark.index.builder import load_manifest
from dhr_spark.index.codec import (
    codec_of,
    for_decode_stream,
    index_codec,
    pfor_decode_stream,
    segmented_cumsum_decode,
    varint_decode,
)
from dhr_spark.index.segments import bm25_weights_np
from dhr_spark.operators.topk import topk
from dhr_spark.operators.wand_expand import ExpandMixin
from dhr_spark.operators.wand_kernels import (  # noqa: F401 — re-exported
    RESULT_SCHEMA,
    _block_lens,
    _count_chunk,
    _decode_selected,
    _presence_chunk,
    _score_chunk,
)
from dhr_spark.operators.wand_phrase import PhraseMixin
from dhr_spark.operators.wand_reader import ReaderMixin
from dhr_spark.operators.wand_sims import SimilarityMixin


class Searcher(SimilarityMixin, ReaderMixin, ExpandMixin, PhraseMixin):
    """Reusable query session over a built index.

    Holds the manifest, the analyzer, and CACHED doclens so repeated
    searches skip per-call parquet footer/listing work — the Spark analogue
    of the reference keeping its index tensors resident between queries
    (gip_retrieval.py:287-315). Segments intentionally stay ON DISK: they are
    read with a term_id pushdown per search (only the query terms' rows move),
    which is the behavior that survives indexes far larger than cluster RAM.

    ``interactive=True`` tunes the SESSION for point-query latency: AQE's
    stage-by-stage scheduling and wide shuffle fan-out only pay off for
    throughput; a single query wants a fixed few-partition plan (measured
    p50 1.65 s -> 1.21 s on local[32]). Session-global and sticky by design
    — use a dedicated session (or Searcher) per serving mode, exactly as a
    real deployment separates its interactive and batch query tiers.
    """

    INTERACTIVE_SHUFFLE_PARTITIONS = 8

    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        cache: bool = True,
        interactive: bool = False,
        k1: float | None = None,
        b: float | None = None,
        corpus_stats: dict | None = None,
        snapshot: int | None = None,
    ):
        """``snapshot`` pins this searcher to an earlier committed state
        (builder.list_snapshots ids): the archived manifest's chunk list,
        dictionary version, stats, and tombstone watermark drive every
        read, so later appends/deletes are invisible — an Iceberg-style
        point-in-time read. Valid until a compaction's GC replaces the
        chunk files that snapshot references.

        ``k1``/``b`` override the manifest's BM25 parameters for THIS
        searcher — Lucene's per-IndexSearcher setSimilarity analogue. The
        stats-free segment layout makes this sound at query time: segments
        store raw (tf, dl) with (max_tf, min_dl) block bounds, and
        w = idf·tf/(tf + k1(1-b+b·dl/avgdl)) stays monotone ↑tf ↓dl for any
        k1 > 0, 0 <= b <= 1, so the WAND pruning bound remains admissible
        under the overridden parameters. No reindex, ever.

        ``corpus_stats`` replaces the index's OWN statistics with externally
        merged ones — {"avgdl": float, "idf": {term: idf} or DataFrame
        (term, idf)} — which is how federated search (operators.federate.
        MultiSearcher) makes N shard indexes score as one logical corpus:
        each shard runs its ordinary WAND pass under the GLOBAL idf/avgdl.
        Admissibility is unaffected (any stats are sound); terms absent
        from the override keep their local idf."""
        from dhr_spark.functions.analyzer import _ANALYZERS

        self.spark = spark
        self.index_dir = index_dir
        self._interactive = bool(interactive)
        if interactive:
            spark.conf.set("spark.sql.adaptive.enabled", "false")
            spark.conf.set(
                "spark.sql.shuffle.partitions",
                str(self.INTERACTIVE_SHUFFLE_PARTITIONS),
            )
        man = load_manifest(index_dir, snapshot=snapshot)
        if man is None:
            raise FileNotFoundError(f"no manifest in {index_dir}")
        if int(man.get("version", 1)) < 2:
            raise ValueError(
                f"index at {index_dir} is manifest version "
                f"{man.get('version', 1)} (pre-stats-free block bounds); "
                "rebuild it with the current builder"
            )
        self.manifest = man
        # "bm25" family (tf/dl postings) vs "impact" (learned-sparse integer
        # impacts, index/impact.py) — the stored per-posting integer means a
        # different thing in each, so cross-use is refused in _scored_frame
        self._scoring = man.get("scoring", "bm25")
        # posting-bytes codec ("varint" default, "for" bit-packed) — every
        # decode kernel this searcher builds dispatches on it
        # str for a uniform index; {chunk: codec, -1: default} for a
        # mixed-tier index (compact_index(codec=...) cold tiers)
        self._codec = index_codec(man)
        self.k1 = float(man["k1"]) if k1 is None else float(k1)
        self.b = float(man["b"]) if b is None else float(b)
        if self.k1 <= 0 or not (0.0 <= self.b <= 1.0):
            raise ValueError(
                f"BM25 override out of range (k1={self.k1}, b={self.b}): "
                "the block-max bound is admissible only for k1 > 0 and "
                "0 <= b <= 1"
            )
        self._analyze = _ANALYZERS[man["analyzer_mode"]]
        self._avgdl = float(man["avgdl"])
        self._stats_override = bool(corpus_stats)
        idf_over = None
        self._ctf_over = None
        self._total_dl_over = None
        self._df_over = None
        self._n_docs_over = None
        if corpus_stats:
            self._avgdl = float(corpus_stats.get("avgdl", self._avgdl))
            idf_over = corpus_stats.get("idf")
            # federated QLD: global collection term frequencies + total
            # collection length (MultiSearcher merges them when every
            # member dictionary carries ctf)
            self._ctf_over = corpus_stats.get("ctf")
            if corpus_stats.get("total_dl") is not None:
                self._total_dl_over = int(corpus_stats["total_dl"])
            # federated F2EXP: merged document frequencies + global doc count
            self._df_over = corpus_stats.get("df")
            if corpus_stats.get("n_docs") is not None:
                self._n_docs_over = int(corpus_stats["n_docs"])
        self._idf_dict_over = idf_over if isinstance(idf_over, dict) else None
        td_dir = man.get("term_dict_dir", "term_dict")
        self._tdict = spark.read.parquet(f"{index_dir}/{td_dir}").select(
            "term", "term_id", "idf"
        )
        if idf_over is not None and self._idf_dict_over is None:
            # DataFrame override (huge federated vocabularies): swap in the
            # global idf column; terms outside the override keep local idf
            self._tdict = (
                self._tdict.withColumnRenamed("idf", "_lidf")
                .join(
                    idf_over.withColumnRenamed("idf", "_gidf"), "term", "left"
                )
                .select(
                    "term",
                    "term_id",
                    F.coalesce("_gidf", "_lidf").alias("idf"),
                )
            )
        self._seg = self._prune_to_manifest(
            spark.read.parquet(f"{index_dir}/segments")
        )
        self._dl = self._prune_to_manifest(
            spark.read.parquet(f"{index_dir}/doclens")
        )
        self._tid_cache: dict[str, int] | None = None
        # conversation-granularity appends tombstone superseded docids
        # (index/conv.py); the set is driver-resident and masked inside the
        # scoring kernel. Bounded by MAX_TOMBSTONES — compaction (a rebuild
        # over live docs) clears it, exactly like a Lucene segment merge.
        self._tombstones: np.ndarray | None = None
        n_tomb = int(man.get("tombstones", 0))
        if n_tomb:
            if n_tomb > self.MAX_TOMBSTONES:
                raise ValueError(
                    f"index carries {n_tomb} tombstones (> "
                    f"{self.MAX_TOMBSTONES}); compact it (rebuild over live "
                    "docs) before serving"
                )
            from dhr_spark.index.builder import read_tombstones

            rows = read_tombstones(spark, index_dir, man).collect()
            self._tombstones = np.array(
                sorted(int(r["docid"]) for r in rows), dtype=np.int64
            )
        self._dl_bc = None
        if cache:
            # doclens: one small row per chunk — always worth pinning
            self._dl = self._dl.cache()
            # interactive fast path: when the packed doclens fit comfortably
            # in a broadcast (4 bytes/doc), ship them to the workers ONCE and
            # score with a single-frame kernel — drops the doclens scan +
            # cogroup shuffle (2 stages) from EVERY point query (measured
            # p50 1.31 -> 1.26 s warm). Interactive tier only: the batch
            # tier measured ~18% SLOWER under the broadcast (per-worker
            # deserialization across 32 shuffle partitions outweighs the
            # saved stages), and beyond the size gate (10^12-doc territory)
            # the cogrouped plan is the only scalable shape.
            if (
                interactive
                and int(man["n_docs"]) * 4 <= self.MAX_DL_BROADCAST_BYTES
            ):
                self._dl_bc = spark.sparkContext.broadcast(
                    {
                        int(r["chunk"]): (
                            int(r["base_docid"]),
                            bytes(r["dls"]),
                        )
                        for r in self._dl.collect()
                    }
                )
            if int(man.get("n_terms", 1 << 62)) <= 2_000_000:
                # small vocabulary: resident driver-side dict — query prep
                # becomes zero Spark jobs (at 10^7+ terms stay distributed)
                ov = self._idf_dict_over or {}
                self._tid_cache = {
                    r["term"]: (
                        int(r["term_id"]),
                        float(ov.get(r["term"], r["idf"])),
                    )
                    for r in self._tdict.collect()
                }

    MAX_COLLECTED_QUERIES = 100_000
    MAX_CHUNK_ISIN = 100_000
    MAX_TOMBSTONES = 5_000_000
    MAX_DL_BROADCAST_BYTES = 64 << 20  # 16M docs; beyond -> cogrouped plan

    def _kernel_partitions(self) -> int:
        """Explicit exchange width for the per-chunk kernel stages.

        AQE coalesces shuffle partitions by INPUT BYTES, but segment rows
        are a compressed proxy: the decode+score work per shuffled byte is
        orders of magnitude above a normal row operator's, so byte-based
        coalescing serializes the scoring stage (measured on this harness:
        the 200-query batch kernel ran on 5 of 32 cores — 2.3s of a 3.2s
        batch — and the 100k-query fan stage on 5 of 32, 133s of CPU).
        Chunks are the kernel's parallel unit and the shuffle-partitions
        conf carries the deployment's sizing, so pin the exchange at
        min(n_chunks, spark.sql.shuffle.partitions) — scale-adaptive on
        both axes, never a constant."""
        n_chunks = max(1, len(self.manifest.get("chunks", {})))
        sp = int(self.spark.conf.get("spark.sql.shuffle.partitions"))
        return max(1, min(n_chunks, sp))

    def _by_chunk(self, df: DataFrame):
        """(chunk)-grouped view of ``df`` with the kernel exchange pinned at
        _kernel_partitions width (repartition with an explicit partition
        count is exempt from AQE coalescing; the following groupBy reuses
        the exchange — one shuffle either way)."""
        return df.repartition(self._kernel_partitions(), "chunk").groupBy(
            "chunk"
        )

    def _prune_to_manifest(self, df: DataFrame) -> DataFrame:
        """Restrict a chunk-partitioned artifact scan to the chunks committed
        in the manifest lineage. A crashed append leaves orphan chunk
        partitions on disk (the manifest rewrite is the atomic commit point);
        without this filter those never-committed docs would be scored and
        returned with no doc_map entry. ``chunk`` is the partition column, so
        the predicate is pure partition pruning — no data files of pruned
        chunks are even listed. Exact ``isin`` up to MAX_CHUNK_ISIN committed
        chunks; beyond that (10^12-turn scale: millions of chunks) the
        contiguity invariant (the base build numbers chunks densely and every
        append starts at the next chunk boundary) makes a <=max-chunk range
        predicate equivalent and O(1) to plan."""
        chunks = [int(c) for c in self.manifest["chunks"]]
        if len(chunks) <= self.MAX_CHUNK_ISIN:
            return df.filter(F.col("chunk").isin(chunks))
        if self.manifest.get("pending_gc"):
            # a committed compaction whose GC hasn't finished leaves stale
            # chunk partitions on disk; the <=max fallback predicate below
            # cannot exclude them (the dropped chunk ids sit inside the
            # live range), so exact pruning is mandatory until GC runs
            raise ValueError(
                "index has a pending compaction GC and too many chunks for "
                "exact pruning — run index.compact.gc_index first"
            )
        return df.filter(F.col("chunk") <= max(chunks))

    def _filter_live(self, df: DataFrame) -> DataFrame:
        """Drop tombstoned docids from a (docid, ...) result frame — the
        positional/phrase twins of the kernel's dead-doc mask."""
        if self._tombstones is None or not self._tombstones.size:
            return df
        ids = [int(x) for x in self._tombstones]
        if len(ids) <= 10_000:
            return df.filter(~F.col("docid").isin(ids))
        tomb = self.spark.createDataFrame([(i,) for i in ids], "docid long")
        return df.join(F.broadcast(tomb), "docid", "left_anti")

    def _query_info(self, queries: DataFrame, want_qlen: bool = False):
        """Driver-side query prep: the query set is collected into the
        scoring kernel regardless (the reference loads all queries up front,
        gip_retrieval.py:263-283); analyzing |Q| strings here removes a
        pandas-UDF stage + broadcast join + extra job from every search.

        ``want_qlen=True`` additionally returns {qid: analyzed token count
        INCLUDING out-of-vocabulary terms} — RM3's query-model denominator —
        so callers never re-collect the query set.

        Guarded at MAX_COLLECTED_QUERIES: an offline eval over millions of
        queries should not funnel through the driver — route it through the
        distributed slow path (operators.topk.search_slow_path), which
        scores all queries in one shuffled join with no driver state."""
        # No coalesce here, interactive or not: a point query arrives as an
        # RDD-backed frame (createDataFrame from a list) whose per-PARTITION
        # Python evaluation costs ~60-80 ms each; coalesce(8) makes each of
        # 8 tasks evaluate 4 parent partitions SERIALLY (~0.64 s measured),
        # while the plain CollectLimit — with the session's one-shot
        # spark.sql.limit.initialNumPartitions — runs every partition in one
        # parallel round (~0.30 s; p50 0.94 -> 0.62 s end-to-end on
        # local[32]). Task metrics, not guesswork: each coalesced task
        # showed ~500 ms Executor Run Time for a 1-row output.
        q = queries.select("qid", "text")
        qrows = q.limit(self.MAX_COLLECTED_QUERIES + 1).collect()
        if len(qrows) > self.MAX_COLLECTED_QUERIES:
            raise ValueError(
                f"query set exceeds {self.MAX_COLLECTED_QUERIES} rows; "
                "Searcher collects queries to the driver for interactive/"
                "batch use — run huge offline evals through the distributed "
                "slow path (operators.topk.search_slow_path) instead"
            )
        qterm_tf: dict[str, dict[str, int]] = {}
        qlen: dict[str, int] = {}
        for r in qrows:
            tf: dict[str, int] = {}
            toks = self._analyze(r["text"] or "")
            for t in toks:
                tf[t] = tf.get(t, 0) + 1
            if tf:
                qterm_tf[r["qid"]] = tf
                qlen[r["qid"]] = len(toks)
        terms = sorted({t for tf in qterm_tf.values() for t in tf})
        if self._tid_cache is not None:
            tid = {t: self._tid_cache[t] for t in terms if t in self._tid_cache}
        else:
            ov = self._idf_dict_over or {}
            tid = {
                r["term"]: (
                    int(r["term_id"]),
                    float(ov.get(r["term"], r["idf"])),
                )
                for r in self._tdict.filter(F.col("term").isin(terms)).collect()
            }
        qinfo: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
        for qid, tf in qterm_tf.items():
            # (term_id, qtf, current idf) triples — idf travels with the
            # query so the kernel scores under CURRENT stats (appends shift
            # idf/avgdl; committed segments never re-encode)
            trips = [(tid[t][0], c, tid[t][1]) for t, c in tf.items() if t in tid]
            if trips:
                trips.sort()
                a = np.array([(t, c) for t, c, _ in trips], dtype=np.int64)
                idfs = np.array([x[2] for x in trips], dtype=np.float64)
                qinfo[qid] = (a[:, 0], a[:, 1].astype(np.float64), idfs)
        if want_qlen:
            return qinfo, sorted(i for i, _ in tid.values()), qlen
        return qinfo, sorted(i for i, _ in tid.values())

    def search(self, queries: DataFrame, k: int = 1000, prune: bool = True) -> DataFrame:
        """queries (qid, text) -> (qid, docid, rank, score) top-k."""
        qinfo, all_terms = self._query_info(queries)
        return self._search_prepared(qinfo, all_terms, k, prune)

    # above this many queries the batch plan stops broadcasting the query
    # term table and takes the fully shuffled fallback (a two-term query
    # set at the cap broadcasts ~70 MB of (qn, term_id, qtf) longs)
    MAX_BROADCAST_BATCH_QUERIES = 1_000_000

    def search_batch(self, queries: DataFrame, k: int = 1000) -> DataFrame:
        """(qid, docid, rank, score): FULLY DISTRIBUTED batch search — the
        first-class form of the > MAX_COLLECTED_QUERIES path that the
        ``_query_info`` gate error points at. No driver-resident query
        state at ANY query-set size: analysis runs as an Arrow UDF stage
        over the query frame, the dictionary resolves by equi-join (never
        a collected term dict), and postings decode per segment partition
        into (term_id, docid, tf) rows. Rank/score contract is identical
        to ``search`` (round-6 score ties broken by docid ASC) — pinned by
        a pytest identity test and the driver's ``bm25_topk_bigbatch``
        oracle.

        When to use which: ``search`` (the collected-kernel path) is
        faster below ~10^5 queries — query prep is zero or one tiny job
        and the scoring kernel early-terminates per chunk. This path is
        for offline evals at 10^5–10^9 queries, where a driver query dict
        is the scale killer; its cost is one full decode of the matched
        posting lists (no block-max pruning — with 10^5+ queries batched,
        essentially every block contains some query's candidate anyway,
        so pruning would buy nothing).

        Scale shape, two tiers by |Q| (the per-posting BM25 weight is
        computed BEFORE the query fan-out in both — w depends only on
        (tf, dl, idf), so the dl join and float math run at |posts| rows,
        never at |posts|x|queries-per-term|):

        * |Q| <= MAX_BROADCAST_BATCH_QUERIES: weighted postings are
          repartitioned by docid (a |posts|-sized exchange), the query
          term table broadcasts into the fan-out join, and — because
          HashPartitioning(docid) satisfies the (qid, docid) clustering —
          the score aggregate runs PARTITION-LOCAL with no shuffle of the
          fanned rows. qids ride as xxhash64 longs through the hot agg +
          window (string keys measured ~2x slower at 40M rows) and join
          back at k rows/query; a (collision-impossible-in-practice but
          checked) qn->qid ambiguity falls back to the shuffled tier.
          Measured at 100k queries: 66s -> 8-18s on this harness.
        * above the cap: no broadcast — fan-out shuffles on term_id and
          the aggregate shuffles on (qid, docid); nothing anywhere is
          proportional to |Q| except the data itself.
        """
        from dhr_spark.functions.bm25 import bm25_weight_col
        from dhr_spark.index.compact import decode_doclens, decode_segments
        from dhr_spark.operators.termfreq import with_tokens
        from dhr_spark.operators.topk import topk

        if self._scoring != "bm25":
            raise ValueError(
                "search_batch scores text (bm25) indexes; impact indexes "
                "take the distributed path operators.impact.impact_topk"
            )
        qtok = with_tokens(
            queries.select("qid", "text"),
            mode=self.manifest["analyzer_mode"],
        )
        qtfs = (
            qtok.select("qid", F.explode("tokens").alias("term"))
            .groupBy("qid", "term")
            .agg(F.count("*").alias("qtf"))
        )
        tdict = self._tdict
        if self._idf_dict_over:
            ov = self.spark.createDataFrame(
                [(t, float(v)) for t, v in self._idf_dict_over.items()],
                "term string, _oidf double",
            )
            tdict = (
                tdict.join(F.broadcast(ov), "term", "left")
                .select(
                    "term", "term_id",
                    F.coalesce("_oidf", "idf").alias("idf"),
                )
            )
        qterms = qtfs.join(tdict, "term").select("qid", "term_id", "qtf", "idf")

        n_queries = queries.select("qid").count()
        if n_queries <= self.MAX_BROADCAST_BATCH_QUERIES:
            # the analyzed query table is reused five times below (term
            # pruning, idf table, fan-out, qid map, collision check) —
            # persist it so the Arrow tokenize + dictionary join run ONCE.
            # The cache lives as long as the returned frame references it;
            # ContextCleaner reclaims it after that.
            from pyspark.storagelevel import StorageLevel

            qterms = qterms.withColumn("qn", F.xxhash64("qid")).persist(
                StorageLevel.MEMORY_AND_DISK
            )
            qmap = qterms.select("qn", "qid").distinct()
            collision_free = qmap.groupBy("qn").agg(
                F.count("*").alias("c")
            ).filter(F.col("c") > 1).isEmpty()
        else:
            collision_free = False

        tids = qterms.select("term_id").distinct()
        seg = self._seg.join(tids, "term_id", "left_semi")
        posts = self._filter_live(
            decode_segments(
                seg, int(self.manifest["block_size"]), codec=self._codec
            )
        )
        dl = decode_doclens(self._dl).select("docid", "dl")
        w = bm25_weight_col(
            F.col("tf"), F.col("dl"), F.col("idf"),
            F.lit(self._avgdl), self.k1, self.b,
        )
        idf_t = qterms.select("term_id", "idf").distinct()
        posts_w = (
            posts.join(dl, "docid")
            .join(F.broadcast(idf_t), "term_id")
            .select("term_id", "docid", w.alias("w"))
        )

        if collision_free:
            # explicit width: AQE would coalesce this exchange by the
            # (small) weighted-postings bytes, but the broadcast fan-out
            # below multiplies every row by the queries sharing its term —
            # measured here, byte-based coalescing ran the fan+aggregate
            # stage on 5 of 32 cores (133s of CPU serialized into 5 tasks).
            # The shuffle-partitions conf carries the deployment sizing.
            sp = int(self.spark.conf.get("spark.sql.shuffle.partitions"))
            fan = posts_w.repartition(sp, "docid").join(
                F.broadcast(qterms.select("qn", "term_id", "qtf")), "term_id"
            )
            # docid partitioning satisfies the (qn, docid) clustering:
            # this aggregate adds NO exchange (tests/test_plan_shapes)
            scored = fan.groupBy("qn", "docid").agg(
                F.sum(F.col("qtf") * F.col("w")).alias("score")
            )
            rw = Window.partitionBy("qn").orderBy(
                F.round(F.col("score"), 6).desc(), F.col("docid").asc()
            )
            return (
                scored.withColumn("rank", F.row_number().over(rw))
                .filter(F.col("rank") <= k)
                .join(qmap, "qn")
                .select(
                    "qid", "docid", "rank",
                    F.round(F.col("score"), 6).alias("score"),
                )
            )

        scored = (
            posts_w.join(qterms.select("qid", "term_id", "qtf"), "term_id")
            .groupBy("qid", "docid")
            .agg(F.sum(F.col("qtf") * F.col("w")).alias("score"))
        )
        return topk(scored, k)

    def _seg_for_terms(self, all_terms: list[int]) -> DataFrame:
        # literal isin list -> parquet row-group pushdown on term_id; for
        # huge query sets switch to a broadcast semi-join instead
        if len(all_terms) <= 10_000:
            return self._seg.filter(F.col("term_id").isin(all_terms))
        terms_df = self.spark.createDataFrame(
            [(t,) for t in all_terms], "term_id long"
        )
        return self._seg.join(F.broadcast(terms_df), "term_id", "left_semi")

    def _scored_frame(
        self,
        qinfo: dict,
        all_terms: list[int],
        k: int,
        prune: bool,
        after: dict | None = None,
        sim: str = "bm25",
        mu: float = 1000.0,
        min_chunk: int | None = None,
    ) -> DataFrame:
        """Raw per-chunk scored candidates (pre-merge): (qid, docid, score)
        with at most k rows per (chunk, qid). ``min_chunk`` restricts the
        scan to chunk partitions >= it (partition pruning; the percolation
        path's 'only the chunks appended since the watermark')."""
        if (self._scoring == "impact") != (sim == "impact"):
            raise ValueError(
                f"index scoring is {self._scoring!r} but the requested "
                f"similarity is {sim!r}: impact indexes store integer "
                "impacts (not term frequencies) in the tf stream — use "
                "search_impact on impact indexes and the tf/dl similarities "
                "on text-built indexes"
            )
        seg = self._seg_for_terms(all_terms)
        dl = self._dl
        if min_chunk is not None:
            seg = seg.filter(F.col("chunk") >= int(min_chunk))
            if dl is not None:
                dl = dl.filter(F.col("chunk") >= int(min_chunk))
        man = self.manifest
        kernel = _score_chunk(
            qinfo, k, self._avgdl, self.k1, self.b,
            int(man["block_size"]), prune, tombstones=self._tombstones,
            after=after, dl_bc=self._dl_bc, sim=sim, mu=mu,
            codec=self._codec,
        )
        if self._dl_bc is not None:
            return self._by_chunk(seg).applyInPandas(kernel, RESULT_SCHEMA)
        return (
            self._by_chunk(seg)
            .cogroup(self._by_chunk(dl))
            .applyInPandas(kernel, RESULT_SCHEMA)
        )

    def search_min_docid(
        self,
        queries: DataFrame,
        min_docid: int,
        k: int = 1000,
        sim: str = "bm25",
        sim_param: float | None = None,
    ) -> DataFrame:
        """(qid, docid, rank, score): BM25 top-k restricted to docs with
        docid >= ``min_docid`` — the percolation primitive ("hits among
        documents indexed since a watermark"). Appends allocate docids only
        at-or-past the prior next_docid, so the scan prunes to the chunk
        partitions at-or-after the watermark's; scoring is exhaustive
        within them (the boundary chunk can mix old and new docs, and a
        chunk-local top-k under pruning could fill with soon-to-be-masked
        old docs), then the exact docid gate applies before ranking.
        Scores use the LIVE corpus stats, like every filter-context query
        (a Lucene filter clause never changes scoring)."""
        if min_docid < 0:
            raise ValueError(f"min_docid must be >= 0, got {min_docid}")
        qinfo, all_terms, ksim, mu = self._prep_sim(queries, sim, sim_param)
        c0 = min_docid >> int(self.manifest["chunk_bits"])
        # kernel k = chunk capacity: disables the chunk-local cut (same
        # exhaustiveness trick as search_filtered — a cut before the docid
        # gate could fill with old docs and starve new ones)
        chunk_docs = 1 << int(self.manifest["chunk_bits"])
        scored = self._scored_frame(
            qinfo, all_terms, chunk_docs, False, min_chunk=c0,
            sim=ksim, mu=mu,
        )
        return topk(scored.filter(F.col("docid") >= min_docid), k)

    def _search_prepared(
        self,
        qinfo: dict,
        all_terms: list[int],
        k: int,
        prune: bool,
        after: dict | None = None,
        sim: str = "bm25",
        mu: float = 1000.0,
    ) -> DataFrame:
        return topk(
            self._scored_frame(
                qinfo, all_terms, k, prune, after=after, sim=sim, mu=mu
            ),
            k,
        )

    def search_rm3(
        self,
        queries: DataFrame,
        k: int = 1000,
        fb_docs: int = 10,
        fb_terms: int = 10,
        orig_weight: float = 0.5,
        prune: bool = True,
    ) -> DataFrame:
        """BM25 + RM3 pseudo-relevance feedback over the index (Anserini's
        default expansion ranker; semantics = operators/rm3.rm3_expand,
        two-stage contract anchor: /root/reference/retrieval/
        gip_retrieval.py:128-156).

        Fully distributed dataflow: first pass (WAND top-``fb_docs``) →
        broadcast the tiny (qid, docid, score) feedback set into the FORWARD
        index scan (doc-major term vectors, build with ``forward_index=True``)
        → relevance model + interpolation as DataFrame algebra with the same
        integer-micros arithmetic as rm3_expand → second WAND pass. Forward
        index rows are never collected; the only driver funnel is the final
        expanded query model (≤ |Q|·(fb_terms+|q|) rows — the same scale as
        the query set itself, which Searcher holds driver-side by design)."""
        from pyspark.sql import Window

        man = self.manifest
        if not man.get("forward_index"):
            raise ValueError(
                "index was built without forward_index=True; RM3 needs the "
                "doc-major term vectors (rebuild or append with the flag)"
            )
        qinfo, all_terms, qlen = self._query_info(queries, want_qlen=True)
        first = self._search_prepared(qinfo, all_terms, fb_docs, prune)
        fwd = self._prune_to_manifest(
            self.spark.read.parquet(f"{self.index_dir}/forward")
        )
        # P(t|d)·score contributions: the feedback set (|Q|·fb_docs rows)
        # broadcasts into the forward scan — non-feedback docs are pruned at
        # the join, nothing wider than the expansion table ever moves
        ptd = fwd.join(
            F.broadcast(first.select("qid", "docid", "score")), "docid"
        ).select(
            "qid",
            "term_id",
            (F.col("tf") / F.col("dl") * F.col("score")).alias("contrib"),
        )
        # integer-micros sums: round to 6 decimals then scale to int64 so the
        # normalizing sums are exact integer arithmetic (order-independent,
        # bit-identical to operators/rm3.rm3_expand and its DuckDB oracle)
        rm1 = (
            ptd.groupBy("qid", "term_id")
            .agg(
                F.round(F.round(F.sum("contrib"), 6) * 1e6)
                .cast("long")
                .alias("rm1_i")
            )
            .filter(F.col("rm1_i") > 0)
        )
        # term string (Anserini tie order) + current idf ride in from the
        # dictionary; rm1 is tiny, so it broadcasts against the |V|-row scan
        rm1 = self._tdict.join(F.broadcast(rm1), "term_id")
        w_cut = Window.partitionBy("qid").orderBy(
            F.col("rm1_i").desc(), F.col("term").asc()
        )
        rm1_norm = (
            rm1.withColumn("_r", F.row_number().over(w_cut))
            .filter(F.col("_r") <= fb_terms)
            .withColumn(
                "rm1",
                F.col("rm1_i") / F.sum("rm1_i").over(Window.partitionBy("qid")),
            )
            .select("qid", "term_id", "rm1", F.col("idf").alias("idf_fb"))
        )
        # original query model from the already-prepped driver arrays; the
        # denominator counts analyzed-but-OOV terms (they carry weight mass
        # even though they cannot score), matching rm3_expand's qmodel
        qm_rows = [
            (qid, int(t), float(c) / qlen[qid], float(i))
            for qid, (tids, qtfs, idfs) in qinfo.items()
            for t, c, i in zip(tids, qtfs, idfs)
        ]
        qmodel = self.spark.createDataFrame(
            qm_rows, "qid string, term_id long, pq double, idf double"
        )
        beta = F.lit(float(orig_weight))
        expanded = (
            qmodel.join(rm1_norm, ["qid", "term_id"], "full_outer")
            .select(
                "qid",
                "term_id",
                F.round(
                    beta * F.coalesce(F.col("pq"), F.lit(0.0))
                    + (F.lit(1.0) - beta) * F.coalesce(F.col("rm1"), F.lit(0.0)),
                    6,
                ).alias("weight"),
                F.coalesce(F.col("idf"), F.col("idf_fb")).alias("idf_q"),
            )
            .filter(F.col("weight") > 0)
        )
        qinfo2: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
        by_q: dict[str, list[tuple[int, float, float]]] = {}
        for r in expanded.collect():
            by_q.setdefault(r["qid"], []).append(
                (int(r["term_id"]), float(r["weight"]), float(r["idf_q"]))
            )
        for qid, trips in by_q.items():
            trips.sort()
            qinfo2[qid] = (
                np.array([t for t, _, _ in trips], dtype=np.int64),
                np.array([w for _, w, _ in trips], dtype=np.float64),
                np.array([i for _, _, i in trips], dtype=np.float64),
            )
        all_terms2 = sorted(
            {int(t) for tids, _, _ in qinfo2.values() for t in tids}
        )
        return self._search_prepared(qinfo2, all_terms2, k, prune)

    def search_rocchio(
        self,
        queries: DataFrame,
        k: int = 1000,
        fb_docs: int = 10,
        fb_terms: int = 10,
        alpha: float = 1.0,
        beta: float = 0.75,
        gamma: float = 0.0,
        bottom_docs: int = 10,
        fb_depth: int = 50,
        prune: bool = True,
    ) -> DataFrame:
        """BM25 + Rocchio pseudo-relevance feedback over the index (the
        reference searcher's other PRF switch — Pyserini
        ``SimpleSearcher.set_rocchio``; semantics =
        operators/rocchio.rocchio_expand, including the optional
        negative-feedback arm when ``gamma > 0``).

        Same fully distributed dataflow as ``search_rm3``: first pass (WAND
        top-``fb_depth``) → broadcast the feedback set into the FORWARD
        index scan → centroid + vector update as DataFrame algebra with
        integer-micros arithmetic → second WAND pass. FB⁺ = the top
        ``fb_docs`` of the first pass; FB⁻ = the bottom ``bottom_docs`` of
        the same ``fb_depth``-deep ranked list (Anserini's use_negative
        convention). Forward-index rows are never collected; the only
        driver funnel is the final expanded model (≤ |Q|·(fb_terms+|q|))."""
        from pyspark.sql import Window

        man = self.manifest
        if not man.get("forward_index"):
            raise ValueError(
                "index was built without forward_index=True; Rocchio needs "
                "the doc-major term vectors (rebuild or append with the flag)"
            )
        qinfo, all_terms, qlen = self._query_info(queries, want_qlen=True)
        first = self._search_prepared(qinfo, all_terms, fb_depth, prune)
        fwd = self._prune_to_manifest(
            self.spark.read.parquet(f"{self.index_dir}/forward")
        )

        def _centroid(fb, n_col):
            # mean of P(t|d) over the feedback docs, integer-micros
            ptd = fwd.join(F.broadcast(fb), "docid").select(
                "qid",
                "term_id",
                (F.col("tf") / F.col("dl") / F.col(n_col)).alias("contrib"),
            )
            return (
                ptd.groupBy("qid", "term_id")
                .agg(
                    F.round(F.round(F.sum("contrib"), 6) * 1e6)
                    .cast("long")
                    .alias("cent_i")
                )
                .filter(F.col("cent_i") > 0)
            )

        pos = first.filter(F.col("rank") <= fb_docs).select("qid", "docid")
        n_pos = pos.groupBy("qid").agg(F.count("*").alias("n_fb"))
        cent = _centroid(pos.join(n_pos, "qid"), "n_fb")
        # term string (cut tie order) + idf from the dictionary; the
        # centroid table is tiny, so it broadcasts against the |V|-row scan
        cent = self._tdict.join(F.broadcast(cent), "term_id")
        w_cut = Window.partitionBy("qid").orderBy(
            F.col("cent_i").desc(), F.col("term").asc()
        )
        cent_norm = (
            cent.withColumn("_r", F.row_number().over(w_cut))
            .filter(F.col("_r") <= fb_terms)
            .withColumn(
                "cpos",
                F.col("cent_i")
                / F.sum("cent_i").over(Window.partitionBy("qid")),
            )
            .select("qid", "term_id", "cpos", F.col("idf").alias("idf_fb"))
        )
        qm_rows = [
            (qid, int(t), float(c) / qlen[qid], float(i))
            for qid, (tids, qtfs, idfs) in qinfo.items()
            for t, c, i in zip(tids, qtfs, idfs)
        ]
        qmodel = self.spark.createDataFrame(
            qm_rows, "qid string, term_id long, pq double, idf double"
        )
        a, b = F.lit(float(alpha)), F.lit(float(beta))
        expanded = qmodel.join(cent_norm, ["qid", "term_id"], "full_outer").select(
            "qid",
            "term_id",
            (
                a * F.coalesce(F.col("pq"), F.lit(0.0))
                + b * F.coalesce(F.col("cpos"), F.lit(0.0))
            ).alias("w_pos"),
            F.coalesce(F.col("idf"), F.col("idf_fb")).alias("idf_q"),
        )
        if gamma > 0.0:
            w_max = first.groupBy("qid").agg(F.max("rank").alias("max_rank"))
            neg = (
                first.join(w_max, "qid")
                .filter(F.col("rank") > F.col("max_rank") - bottom_docs)
                .select("qid", "docid")
            )
            n_neg = neg.groupBy("qid").agg(F.count("*").alias("n_neg"))
            cent_n = self._tdict.join(
                F.broadcast(_centroid(neg.join(n_neg, "qid"), "n_neg")),
                "term_id",
            )
            neg_norm = cent_n.withColumn(
                "cneg",
                F.col("cent_i")
                / F.sum("cent_i").over(Window.partitionBy("qid")),
            ).select("qid", "term_id", "cneg", F.col("idf").alias("idf_neg"))
            expanded = expanded.join(
                neg_norm, ["qid", "term_id"], "full_outer"
            ).select(
                "qid",
                "term_id",
                (
                    F.coalesce(F.col("w_pos"), F.lit(0.0))
                    - F.lit(float(gamma)) * F.coalesce(F.col("cneg"), F.lit(0.0))
                ).alias("w_pos"),
                F.coalesce(F.col("idf_q"), F.col("idf_neg")).alias("idf_q"),
            )
        expanded = expanded.select(
            "qid",
            "term_id",
            F.round(F.col("w_pos"), 6).alias("weight"),
            "idf_q",
        ).filter(F.col("weight") > 0)
        qinfo2: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
        by_q: dict[str, list[tuple[int, float, float]]] = {}
        for r in expanded.collect():
            by_q.setdefault(r["qid"], []).append(
                (int(r["term_id"]), float(r["weight"]), float(r["idf_q"]))
            )
        for qid, trips in by_q.items():
            trips.sort()
            qinfo2[qid] = (
                np.array([t for t, _, _ in trips], dtype=np.int64),
                np.array([w for _, w, _ in trips], dtype=np.float64),
                np.array([i for _, _, i in trips], dtype=np.float64),
            )
        all_terms2 = sorted(
            {int(t) for tids, _, _ in qinfo2.values() for t in tids}
        )
        return self._search_prepared(qinfo2, all_terms2, k, prune)

    # ------------------------------------------------- multi-term rewrites
    # Lucene PrefixQuery / WildcardQuery / FuzzyQuery / MoreLikeThis over the
    # index: expand against the term DICTIONARY, cap at max_expansions
    # keeping highest-df terms (== lowest idf; the stored idf is strictly
    # decreasing in df, so (idf ASC, term ASC) is exactly Lucene's
    # top-terms-by-docFreq rewrite order), then score the expansion as an
    # ordinary SHOULD-of-terms query (qtf=1 per term) through the same WAND
    # kernel. Semantics twin: operators/expand.py (the DataFrame slow path
    # the DuckDB oracles check). NOTE under a federated corpus_stats idf
    # override the cap orders by the OVERRIDDEN (global) idf — that is the
    # correct federation behavior (all shards cap identically).
    def term_vectors(self, docids: list[int] | DataFrame) -> DataFrame:
        """(docid, term, tf, dl): a document's analyzed term vector — the
        Lucene ``IndexReader.getTermVector`` analogue, served from the
        forward index (build with ``forward_index=True``).

        A literal docid list prunes to the docids' chunk partitions with
        row-group isin pushdown (kilobytes read per doc); a DataFrame
        argument (offline audits) broadcast-semi-joins the manifest-pruned
        forward scan instead. Tombstoned docids emit no rows."""
        if not self.manifest.get("forward_index"):
            raise ValueError(
                "index was built without forward_index=True; term_vectors "
                "reads the doc-major vectors (rebuild or append with the flag)"
            )
        fwd = self.spark.read.parquet(f"{self.index_dir}/forward")
        if isinstance(docids, DataFrame):
            fwd = self._prune_to_manifest(fwd).join(
                F.broadcast(docids.select("docid").distinct()),
                "docid",
                "left_semi",
            )
        else:
            ids = sorted({int(d) for d in docids})
            chunk_bits = int(self.manifest["chunk_bits"])
            chunks = sorted({i >> chunk_bits for i in ids})
            fwd = fwd.filter(
                F.col("chunk").isin(chunks) & F.col("docid").isin(ids)
            )
        out = fwd.join(
            F.broadcast(self._tdict.select("term_id", "term")), "term_id"
        ).select("docid", "term", "tf", "dl")
        return self._filter_live(out)

    def ltr_features(
        self,
        queries: DataFrame,
        k: int = 100,
        mu: float = 1000.0,
        lam: float = 0.1,
    ) -> DataFrame:
        """(qid, docid, bm25, tfidf, qld, lmjm, matched, qlen, coverage,
        sum_tf, dl): the LTR feature matrix (operators/ltr.py) for each
        query's first-pass BM25 top-``k`` candidates — the standard
        two-stage rerank/training shape. Term vectors come from the
        forward index (``forward_index=True`` required), collection
        statistics from the dictionary/manifest (exact under appends and
        exact-stats deletes), so every feature equals the corpus-scan
        operator's output on the same candidates. Cost: one search + one
        candidate-pruned forward read + one aggregation — never a corpus
        scan."""
        from dhr_spark.operators.ltr import ltr_features as _ltr
        from dhr_spark.operators.termfreq import (
            query_term_freqs, with_tokens,
        )

        if not self.manifest.get("forward_index"):
            raise ValueError(
                "index was built without forward_index=True; LTR features "
                "read candidate term vectors from the forward index"
            )
        cand = self.search(queries, k=k).select("qid", "docid")
        tv = self.term_vectors(cand.select("docid").distinct())
        qtfs = query_term_freqs(
            with_tokens(queries, mode=self.manifest["analyzer_mode"])
        )
        full_dict = self.spark.read.parquet(
            f"{self.index_dir}/{self.manifest.get('term_dict_dir', 'term_dict')}"
        )
        return _ltr(
            qtfs,
            tv.select("docid", "term", "tf"),
            tv.select("docid", "dl").distinct(),
            k1=self.k1,
            b=self.b,
            mu=mu,
            lam=lam,
            candidates=cand,
            stats=(
                int(self.manifest["n_docs"]),
                float(self.manifest["avgdl"]),
                float(self.manifest["total_dl"]),
            ),
            term_stats=full_dict.select("term", "df", "ctf"),
        )

    def postings_list(self, terms: list[str]) -> DataFrame:
        """(term, docid, tf): the fully decoded posting lists of the given
        RAW terms — Pyserini ``IndexReader.get_postings_list`` parity (the
        reference's Lucene backend exposes it through that API; terms are
        analyzed under the index's analyzer first, exactly as Pyserini
        does by default). On an impact index the tf column carries the
        stored integer impact (the tf stream's contract there).

        Scale shape: term_id pushdown reads only the requested rows
        (parquet row-group pruning via the isin, like every search), and
        a mapInPandas varint decode emits (docid, tf) pairs — no shuffle
        at all; tombstoned docs are masked like the scoring kernels.
        Out-of-vocabulary terms simply yield no rows."""
        analyzed = sorted(
            {t for raw in terms for t in self._analyze(raw or "")}
        )
        schema = "term string, docid long, tf long"
        if self._tid_cache is not None:
            tid = {
                t: self._tid_cache[t][0]
                for t in analyzed
                if t in self._tid_cache
            }
        else:
            tid = {
                r["term"]: int(r["term_id"])
                for r in self._tdict.filter(
                    F.col("term").isin(analyzed)
                ).collect()
            }
        if not tid:
            return self.spark.createDataFrame([], schema)
        id2term = {v: k for k, v in tid.items()}
        block_size = int(self.manifest["block_size"])
        codec = self._codec
        tomb = self._tombstones

        def decode(batches):
            for pdf in batches:
                out_t: list[np.ndarray] = []
                out_d: list[np.ndarray] = []
                out_f: list[np.ndarray] = []
                for r in pdf.itertuples(index=False):
                    lens = _block_lens(int(r.n), block_size)
                    sel = np.arange(lens.size)
                    ck = codec_of(codec, int(r.chunk))
                    docids, _ = _decode_selected(
                        bytes(r.doc_gaps),
                        np.asarray(r.block_doc_off, dtype=np.int64),
                        lens, sel, restarts=True, codec=ck,
                    )
                    tfs, _ = _decode_selected(
                        bytes(r.tfs),
                        np.asarray(r.block_tf_off, dtype=np.int64),
                        lens, sel, restarts=False, codec=ck,
                    )
                    if tomb is not None and tomb.size:
                        keep = ~np.isin(docids, tomb)
                        docids, tfs = docids[keep], tfs[keep]
                    if docids.size:
                        out_t.append(
                            np.repeat(id2term[int(r.term_id)], docids.size)
                        )
                        out_d.append(docids)
                        out_f.append(tfs)
                if out_t:
                    yield pd.DataFrame(
                        {
                            "term": np.concatenate(out_t),
                            "docid": np.concatenate(out_d).astype(np.int64),
                            "tf": np.concatenate(out_f).astype(np.int64),
                        }
                    )

        return self._seg_for_terms(sorted(id2term)).mapInPandas(
            decode, schema
        )

    def significant_terms(
        self,
        queries: DataFrame,
        k: int = 10,
        top_hits: int = 100,
        min_fg: int = 2,
        prune: bool = True,
    ) -> DataFrame:
        """(qid, term, fg, fg_total, bg, score, rank): ES-style
        significant_terms over each query's top-``top_hits`` result set,
        served from the forward index (build with ``forward_index=True``).
        Semantics and the JLH scoring contract live in
        operators/significant.significant_terms — this method only assembles
        the index-backed inputs: first-pass WAND hits (tombstone-filtered by
        construction), foreground term vectors via a broadcast semi-join of
        the hit docids into the manifest-pruned forward scan (non-hit docs
        never shuffle), and background df from the |V|-row dictionary.
        Background stats are the dictionary's committed df / manifest
        n_docs (exact-stats deletes keep both current; mask-only deletes
        leave background counts slightly stale, same as Lucene before a
        merge)."""
        from dhr_spark.operators.significant import significant_terms as _sig

        if not self.manifest.get("forward_index"):
            raise ValueError(
                "index was built without forward_index=True; "
                "significant_terms reads the doc-major vectors (rebuild or "
                "append with the flag)"
            )
        hits = self.search(queries, k=top_hits, prune=prune).select(
            "qid", "docid"
        )
        fwd = self._prune_to_manifest(
            self.spark.read.parquet(f"{self.index_dir}/forward")
        )
        fg_rows = fwd.join(
            F.broadcast(hits.select("docid").distinct()), "docid", "left_semi"
        )
        doc_terms = fg_rows.join(
            F.broadcast(self._tdict.select("term_id", "term")), "term_id"
        ).select("docid", "term")
        td_dir = self.manifest.get("term_dict_dir", "term_dict")
        tdf = self.spark.read.parquet(f"{self.index_dir}/{td_dir}").select(
            "term", "df"
        )
        return _sig(
            hits,
            doc_terms,
            tdf,
            int(self.manifest["n_docs"]),
            k=k,
            min_fg=min_fg,
        )

    def rare_terms(
        self,
        queries: DataFrame,
        max_doc_count: int = 1,
        k: int = 100,
        top_hits: int = 100,
        prune: bool = True,
    ) -> DataFrame:
        """(qid, term, fg, bg, rank): ES ``rare_terms`` over each query's
        top-``top_hits`` result set — long-tail terms with background df
        <= ``max_doc_count``, rarest first (operators/significant.
        rare_terms). Index-backed inputs assembled exactly as
        significant_terms: the df cutoff prunes the dictionary BEFORE the
        forward-index join, so only the rare slice ever shuffles."""
        from dhr_spark.operators.significant import rare_terms as _rare

        if not self.manifest.get("forward_index"):
            raise ValueError(
                "index was built without forward_index=True; rare_terms "
                "reads the doc-major vectors (rebuild or append with the "
                "flag)"
            )
        hits = self.search(queries, k=top_hits, prune=prune).select(
            "qid", "docid"
        )
        fwd = self._prune_to_manifest(
            self.spark.read.parquet(f"{self.index_dir}/forward")
        )
        fg_rows = fwd.join(
            F.broadcast(hits.select("docid").distinct()), "docid", "left_semi"
        )
        doc_terms = fg_rows.join(
            F.broadcast(self._tdict.select("term_id", "term")), "term_id"
        ).select("docid", "term")
        td_dir = self.manifest.get("term_dict_dir", "term_dict")
        tdf = self.spark.read.parquet(f"{self.index_dir}/{td_dir}").select(
            "term", "df"
        )
        return _rare(
            hits, doc_terms, tdf, max_doc_count=max_doc_count, k=k
        )
    def stats_df(self) -> DataFrame:
        """One-row index statistics — the Lucene CheckIndex/IndexReader
        stats surface: (n_docs, n_terms, total_dl, avgdl, total_postings,
        n_chunks). Counts come from the manifest (the atomic commit record);
        total_postings sums the per-(chunk, term) posting counts stored in
        the segment rows — no posting decode."""
        man = self.manifest
        tp = self._seg.agg(F.sum("n").alias("tp")).collect()[0]["tp"]
        return self.spark.createDataFrame(
            [
                (
                    int(man["n_docs"]),
                    int(man["n_terms"]),
                    int(man["total_dl"]),
                    float(man["total_dl"]) / int(man["n_docs"]),
                    int(tp),
                    len(man["chunks"]),
                )
            ],
            "n_docs long, n_terms long, total_dl long, avgdl double, "
            "total_postings long, n_chunks long",
        )

    def fetch_stored(self, results: DataFrame) -> DataFrame:
        """Attach the stored original text to a (docid, ...) result frame —
        Lucene stored-field retrieval. Requires ``build_index(...,
        stored=True)``.

        Serving shape: the distinct result docids are collected (bounded by
        MAX_FETCH_DOCS — top-k output is k x |Q|, driver-tiny), their CHUNK
        set prunes the stored scan to only the hit partitions, and the docid
        isin predicate pushes into parquet row groups — rendering a page of
        results reads kilobytes of one chunk file, never the corpus. Beyond
        the bound it degrades to a full-scan hash join with the results side
        broadcast (an offline job's shape, still no driver state)."""
        if not self.manifest.get("stored"):
            raise ValueError(
                "index was built without stored fields — rebuild or append "
                "with stored=True to use fetch_stored/highlight"
            )
        chunk_bits = int(self.manifest["chunk_bits"])
        stored = self.spark.read.parquet(f"{self.index_dir}/stored")
        ids = [
            int(r["docid"])
            for r in results.select("docid")
            .distinct()
            .limit(self.MAX_FETCH_DOCS + 1)
            .collect()
        ]
        if len(ids) <= self.MAX_FETCH_DOCS:
            chunks = sorted({i >> chunk_bits for i in ids})
            stored = stored.filter(
                F.col("chunk").isin(chunks) & F.col("docid").isin(ids)
            )
        else:
            stored = self._prune_to_manifest(stored)
        return results.join(stored.select("docid", "text"), "docid", "left")

    def highlight(
        self, queries: DataFrame, k: int = 10, width: int = 10
    ) -> DataFrame:
        """Index-backed result highlighting: BM25 top-k + stored-field fetch
        + keyword-in-context snippet, no corpus scan anywhere.

        Returns (qid, docid, rank, score, start, n_hits, snippet) where the
        snippet is the ``width``-token window of the stored text covering
        the most distinct query terms (ties earliest) — exactly
        operators.phrase.best_snippet's selection, computed by its Arrow
        row-kernel twin over only the k x |Q| fetched rows."""
        from dhr_spark.operators.phrase import snippet_struct_udf

        res = self.search(queries, k=k)
        fetched = self.fetch_stored(res)
        q = queries.select("qid", F.col("text").alias("_qtext"))
        snip = snippet_struct_udf(width)(F.col("text"), F.col("_qtext"))
        return (
            fetched.join(F.broadcast(q), "qid")
            .withColumn("_s", snip)
            .select(
                "qid", "docid", "rank", "score",
                F.col("_s.start").alias("start"),
                F.col("_s.n_hits").alias("n_hits"),
                F.col("_s.snippet").alias("snippet"),
            )
        )

    def highlight_fragments(
        self,
        queries: DataFrame,
        k: int = 10,
        width: int = 10,
        n_fragments: int = 2,
    ) -> DataFrame:
        """Multi-fragment highlighting — the ES unified highlighter's
        ``number_of_fragments``: up to ``n_fragments`` NON-OVERLAPPING
        ``width``-token windows per hit, greedily covering the most
        distinct query terms (ties earliest; operators/phrase.
        snippet_fragments semantics — frag 1 is exactly ``highlight``'s
        single snippet). Returns (qid, docid, rank, score, frag, start,
        n_hits, snippet); hits with no raw-token window emit no fragment
        rows. Same serving shape as highlight: top-k + stored fetch +
        Arrow row kernel over k x |Q| rows only."""
        from dhr_spark.operators.phrase import snippet_frags_udf

        if n_fragments < 1:
            raise ValueError(
                f"n_fragments must be >= 1, got {n_fragments}"
            )
        res = self.search(queries, k=k)
        fetched = self.fetch_stored(res)
        q = queries.select("qid", F.col("text").alias("_qtext"))
        frags = snippet_frags_udf(width, n_fragments)(
            F.col("text"), F.col("_qtext")
        )
        return (
            fetched.join(F.broadcast(q), "qid")
            .withColumn("_f", F.explode(frags))
            .select(
                "qid", "docid", "rank", "score",
                F.col("_f.frag").alias("frag"),
                F.col("_f.start").alias("start"),
                F.col("_f.n_hits").alias("n_hits"),
                F.col("_f.snippet").alias("snippet"),
            )
        )


def search_wand(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int = 1000,
    prune: bool = True,
) -> DataFrame:
    """One-shot convenience wrapper; for repeated querying build a Searcher
    once and call .search()."""
    return Searcher(spark, index_dir, cache=False).search(queries, k, prune)
