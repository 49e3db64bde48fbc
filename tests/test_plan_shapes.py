"""Physical-plan assertions: the optimizations we claim must be visible in
the executed plan — predicate pushdown to parquet, column pruning, broadcast
joins on the dictionary/query side, and the bounded-group-size invariant that
is our head-term skew defense."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dhr_spark.data.synthetic import synth_queries, synth_transcripts
from dhr_spark.index.builder import build_index


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("planidx") / "idx")
    build_index(spark, synth_transcripts(spark, 40), d, chunk_bits=7,
                block_size=16, docid_strategy="window")
    return d


def test_segment_scan_pushes_term_filter(spark, idx):
    seg = spark.read.parquet(f"{idx}/segments").filter(
        F.col("term_id").isin([1, 2, 3])
    )
    plan = _plan(seg)
    assert "PushedFilters" in plan
    assert "term_id" in plan.split("PushedFilters")[1][:200], plan[:500]


def test_segment_scan_prunes_columns(spark, idx):
    seg = spark.read.parquet(f"{idx}/segments").select("term_id", "n")
    plan = _plan(seg)
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "doc_gaps" not in read_schema and "block_max_tf" not in read_schema


def test_slow_path_broadcasts_query_side(spark, idx):
    from dhr_spark.operators.topk import score_all

    post = spark.createDataFrame(
        [(1, 10, 0.5), (2, 11, 0.4)], "term_id long, docid long, weight double"
    )
    qtfs = spark.createDataFrame(
        [("q1", 1, 1)], "qid string, term_id long, qtf long"
    )
    plan = _plan(score_all(qtfs, post))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_wand_searcher_filters_before_cogroup(spark, idx):
    from dhr_spark.operators.wand import Searcher

    s = Searcher(spark, idx)
    res = s.search(synth_queries(spark, 3), k=5)
    plan = _optimized(res)
    # the term filter must sit under the cogroup, not above it
    assert "term_id IN" in plan or "term_id#" in plan


@pytest.fixture(scope="module")
def docs_small(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_simhash_blocked_pairs_no_cartesian(spark, docs_small):
    """The pigeonhole scale path must plan as an equi-join on (chunk_idx,
    chunk_value) — any CartesianProduct would mean the blocking decomposition
    silently degraded to the brute path."""
    from dhr_spark.operators.dedup import simhash_blocked_pairs

    plan = _plan(simhash_blocked_pairs(docs_small, max_hamming=3))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_embedding_lsh_pairs_no_cartesian(spark):
    from dhr_spark.operators.dedup import embedding_dup_pairs_lsh

    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    plan = _plan(embedding_dup_pairs_lsh(embs))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_minhash_signatures_fully_codegen(spark, docs_small):
    """The signature path must stay JVM-side: no Python UDF evaluation
    (BatchEvalPython / ArrowEvalPython) anywhere in the plan."""
    from dhr_spark.operators.dedup import minhash_signatures

    plan = _plan(minhash_signatures(docs_small))
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    # map-side combine: the 16 min-aggregates must have a partial phase
    assert "partial_min" in plan


def test_maxsim_broadcasts_query_tokens(spark):
    from dhr_spark.operators.maxsim import maxsim_score

    qt = spark.createDataFrame(
        [("q1", 0, "alpha")], "qid string, qpos int, term string"
    )
    post = spark.createDataFrame(
        [("alphabet", 1, 1.0)], "term string, docid long, weight double"
    )
    plan = _plan(maxsim_score(qt, post))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    # two-level contraction: partial max then sum — two HashAggregates
    assert plan.count("HashAggregate") >= 2


def test_hybrid_fusion_broadcasts_both_small_sides(spark):
    """Hybrid fusion: the dense query side and the lexical qtf side must
    broadcast; the corpus/postings sides stream (never broadcast-exploded
    through a nested-loop join except the intended dense cross join)."""
    from dhr_spark.operators.hybrid import hybrid_score

    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    dq = embs.limit(3).select(F.col("vec_id").alias("qid"), "embedding")
    qtfs = spark.createDataFrame(
        [(1, "alpha", 1)], "qid long, term string, qtf long"
    )
    post = spark.createDataFrame(
        [("alpha", 1, 1.0)], "term string, docid long, weight double"
    )
    plan = _plan(hybrid_score(dq, embs, qtfs, post))
    assert plan.count("BroadcastExchange") >= 2
    # the fusion join itself is an equi-join on (qid, docid), not a loop join
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan or (
        "ShuffledHashJoin" in plan
    )


def test_segment_groups_bounded_by_chunk(spark, idx):
    """Skew defense invariant: no (term, chunk) posting group may exceed
    2^chunk_bits postings, no matter how skewed the term distribution."""
    seg = spark.read.parquet(f"{idx}/segments")
    assert seg.agg(F.max("n")).collect()[0][0] <= 1 << 7


def test_manifest_skew_metrics_present(spark, idx):
    from dhr_spark.index.builder import load_manifest

    man = load_manifest(idx)
    for c in man["chunks"].values():
        assert set(c) >= {"postings", "bytes", "terms", "skew_ratio"}


def test_phrase_match_prunes_scan_to_id_and_text(spark, tmp_path):
    # phrase matching over a 100 TB corpus must read only (doc_id, text).
    # Scan a private copy: other modules .cache() the shared testdata path,
    # and a cache hit replaces the file scan (full ReadSchema) in the plan.
    import shutil

    from dhr_spark.operators.phrase import phrase_match

    p = str(tmp_path / "docs.parquet")
    shutil.copyfile("/root/testdata/sf0.001/documents.parquet", p)
    docs = spark.read.parquet(p)
    plan = _plan(phrase_match(docs, "table hash"))
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "text" in read_schema and "doc_id" in read_schema
    assert "lang" not in read_schema and "source" not in read_schema
    assert "Exchange" not in plan  # zero-shuffle map-side scan


def test_snippet_and_repetition_zero_shuffle(spark):
    from dhr_spark.operators.phrase import best_snippet
    from dhr_spark.operators.textstats import repetition_stats

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert "Exchange" not in _plan(best_snippet(docs, ["table"], width=5))
    assert "Exchange" not in _plan(repetition_stats(docs))


def test_conv_documents_single_exchange(spark):
    # one hash-shuffle keyed by conv_id and nothing else
    from dhr_spark.data.synthetic import synth_transcripts
    from dhr_spark.operators.conversations import conv_documents

    plan = _plan(conv_documents(synth_transcripts(spark, 20)))
    assert plan.count("Exchange") <= 2  # initial agg exchange (+AQE read)


def test_phrase_batch_single_positions_scan_no_cartesian(spark, tmp_path):
    """The batch phrase plan must read positions ONCE (no per-phrase scans),
    broadcast the tiny phrase plan, and contain no cartesian product."""
    from dhr_spark.operators.wand import Searcher

    d = str(tmp_path / "idx")
    build_index(spark, synth_transcripts(spark, 30), d, chunk_bits=7,
                block_size=16, docid_strategy="window", positional=True,
                analyzer_mode="simple")
    ph = spark.createDataFrame(
        [("a", "spark index"), ("b", "merge batch"), ("c", "query")],
        "qid string, phrase string",
    )
    out = Searcher(spark, d).search_phrase_batch(ph)
    plan = _plan(out)
    # exactly ONE parquet scan: the positions artifact read once for all
    # phrases (the "positions" string also names expression columns, so
    # count scans, not the word)
    assert plan.lower().count("scan parquet") == 1, plan
    assert "Cartesian" not in plan
    assert "BroadcastHashJoin" in plan


def test_ivfpq_broadcasts_probes_and_tables(spark):
    """IVF-PQ: probe table and ADC tables broadcast; no cartesian anywhere —
    the not-all-pairs contract of the served ANN configuration."""
    from dhr_spark.operators.pq import cosine_topk_ivfpq

    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qs = embs.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    out = cosine_topk_ivfpq(qs, embs, k=5)
    plan = _plan(out)
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_expansion_touches_dictionary_not_corpus(spark, idx):
    """Query-rewrite expansion (prefix/wildcard/fuzzy) is a |V|-row
    dictionary scan with a per-qid window cap — no corpus/postings read and
    no cartesian anywhere in the expansion subplan."""
    from dhr_spark.operators.expand import expand_prefix

    tdict = spark.read.parquet(f"{idx}/term_dict")
    out = expand_prefix(tdict, [("q1", "a"), ("q2", "b")], max_expansions=4)
    plan = _plan(out)
    assert plan.lower().count("scan parquet") == 2  # one per pattern, dict only
    assert "segments" not in plan and "Cartesian" not in plan


def test_bm25f_single_tf_shuffle_and_broadcast_df(spark):
    """BM25F adds NO shuffle over plain term-frequency extraction: one
    explode -> groupBy((conv,term)) exchange (+ wdl agg + df agg), with the
    tiny per-term df joined broadcast."""
    from dhr_spark.operators.fielded import bm25f_postings

    turns = spark.createDataFrame(
        [(0, "user", ["a", "b"]), (0, "tool", ["b", "c"]), (1, "user", ["c"])],
        "conv_id long, role string, tokens array<string>",
    )
    out = bm25f_postings(turns, {"user": 2.0, "tool": 0.5})
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_count_scan_pushes_term_filter_and_prunes_tf_bytes(spark, idx):
    """Searcher.count reads only the query terms' segment rows; the count
    kernel never touches the tfs byte column... but column pruning happens
    at the scan for the KERNEL'S declared input, so assert the term_id
    pushdown (the I/O win) and that no cartesian/shuffle-heavy shape
    appears — the kernel itself decodes doc_gaps only (unit-tested)."""
    from dhr_spark.data.synthetic import synth_queries
    from dhr_spark.operators.wand import Searcher

    s = Searcher(spark, idx)
    out = s.count(synth_queries(spark, 4))
    plan = _plan(out)
    assert "PushedFilters" in plan and "term_id" in plan
    assert "CartesianProduct" not in plan


def test_search_after_keeps_term_pushdown(spark, idx):
    from dhr_spark.data.synthetic import synth_queries
    from dhr_spark.operators.wand import Searcher

    s = Searcher(spark, idx)
    q = synth_queries(spark, 2)
    qid = q.collect()[0]["qid"]
    out = s.search_after(q, {qid: (1.0, 5)}, size=3)
    plan = _plan(out)
    assert "PushedFilters" in plan and "term_id" in plan
    assert "CartesianProduct" not in plan


def test_syntax_boolean_path_no_cartesian_and_broadcast_req(spark, idx):
    """The boolean syntax plan: membership gates join on (qid, docid)
    without any cartesian product, and the per-qid MUST-count table is
    broadcast."""
    from dhr_spark.operators.wand import Searcher

    s = Searcher(spark, idx)
    q = spark.createDataFrame(
        [("b", "+table merge -slow")], "qid string, text string"
    )
    out = s.search_syntax(q, k=5)
    plan = _plan(out)
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan or "BroadcastHashJoin" in plan


def test_search_filtered_pushes_docvalues_predicate(spark, idx):
    """The docvalues range predicate of Searcher.search_filtered reaches the
    doc_map parquet scan as a pushed filter (partition-level row-group skip
    at scale), and the hit-gating join is not a cartesian."""
    from dhr_spark.data.synthetic import synth_queries
    from dhr_spark.operators.wand import Searcher

    s = Searcher(spark, idx)
    df = s.search_filtered(synth_queries(spark, 3), "turn_idx", lo=2, hi=8, k=5)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "PushedFilters" in plan
    pushed = [
        seg[:300] for seg in plan.split("PushedFilters")[1:]
    ]
    assert any("turn_idx" in p for p in pushed), plan[:2000]


def test_qld_weights_broadcast_ctf_no_cartesian(spark):
    """QLD adds exactly one corpus-wide prepass over BM25's (the ctf
    groupBy, same class as the df groupBy); the scoring join broadcasts
    the per-term stats — no cartesian anywhere."""
    from dhr_spark.operators.qld import qld_weights
    from dhr_spark.operators.termfreq import doc_lengths, term_freqs, with_tokens

    docs = spark.createDataFrame(
        [(0, "a b c"), (1, "b c d")], "docid long, text string"
    )
    tok = with_tokens(docs, mode="simple")
    plan = _plan(qld_weights(term_freqs(tok), doc_lengths(tok)))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_rocchio_expansion_broadcasts_feedback(spark):
    """The Rocchio centroid join keys the tiny feedback set against the tf
    table — broadcast, never a corpus-wide shuffle join of tf x tf."""
    from dhr_spark.operators.rocchio import rocchio_expand
    from dhr_spark.operators.termfreq import doc_lengths, term_freqs, with_tokens

    docs = spark.createDataFrame(
        [(0, "a b c"), (1, "b c d"), (2, "d e f")], "docid long, text string"
    )
    tok = with_tokens(docs, mode="simple")
    first = spark.createDataFrame(
        [("q1", 0, 1, 2.0), ("q1", 1, 2, 1.0)],
        "qid string, docid long, rank int, score double",
    )
    qtfs = spark.createDataFrame(
        [("q1", "a", 1)], "qid string, term string, qtf long"
    )
    plan = _plan(
        rocchio_expand(qtfs, first, term_freqs(tok), doc_lengths(tok),
                       gamma=0.2)
    )
    assert "CartesianProduct" not in plan


def test_block_join_single_agg_over_hits(spark):
    """search_parents' rollup is one hash aggregate over the hit set — the
    optimized plan has no join wider than hits x doc_map and no cartesian."""
    from dhr_spark.operators.conversations import block_join_topk

    child = spark.createDataFrame(
        [("q1", 0, 1.0)], "qid string, docid long, score double"
    )
    parent = spark.createDataFrame([(0, 10)], "docid long, parent long")
    plan = _plan(block_join_topk(child, parent, k=5, score_mode="total"))
    assert "CartesianProduct" not in plan
    assert "HashAggregate" in plan


def test_search_boosted_no_cartesian_prunes_docvalue_columns(spark, idx):
    """FunctionScore's docvalues join is an equi-join on docid (never a
    cartesian), and the doc_map scan reads only (docid, field) — the
    ReadSchema must not drag the full doc_map row width into the boost."""
    from dhr_spark.data.synthetic import synth_queries
    from dhr_spark.operators.wand import Searcher

    s = Searcher(spark, idx)
    df = s.search_boosted(synth_queries(spark, 3), "turn_idx", k=5, window=20)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    # the doc_map scan is column-pruned to the join key + signal
    scans = [seg[:400] for seg in plan.split("ReadSchema")[1:]]
    dm = [p for p in scans if "turn_idx" in p]
    assert dm, plan[:2000]
    assert not any("conv_id" in p for p in dm), dm


def test_duplicate_spans_no_cartesian_and_codegen(spark, docs_small):
    """Span dedup must plan as a shingle-key window + per-doc window — no
    self-join, no pair blow-up, no Python UDF (pure column math)."""
    from dhr_spark.operators.dedup import duplicate_spans

    plan = _plan(duplicate_spans(docs_small, n=3))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_impact_slow_path_broadcasts_query_side(spark, docs_small):
    """The impact slow path mirrors the BM25 plan: the query-weight side
    broadcasts; the impacts relation never shuffles for the join."""
    from dhr_spark.operators.impact import impact_topk

    imp = docs_small.selectExpr(
        "doc_id AS docid", "lower(text) AS term", "1 AS impact"
    )
    qw = spark.createDataFrame(
        [("q", "spark", 1)], "qid string, term string, qweight long"
    )
    plan = _plan(impact_topk(imp, qw, k=5))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_kmv_sketch_no_raw_distinct_shuffle(spark, docs_small):
    """KMV must aggregate through the mapInPandas partial (FlatMapGroups /
    MapInPandas stage) — the merge groupBy sees only bounded partial arrays,
    never the raw hashed value stream."""
    from dhr_spark.operators.sketches import kmv_sketch

    df = docs_small.selectExpr("text AS v")
    plan = _plan(kmv_sketch(df, "v", k=8))
    assert "MapInPandas" in plan
    # no distinct aggregation of the raw values before the partial stage
    assert "CartesianProduct" not in plan


def test_phrase_prefix_pushes_term_ids_into_positions(spark, tmp_path):
    """search_phrase_prefix must read only the fixed + expansion terms'
    position rows (term_id isin pushdown), never the whole artifact."""
    from dhr_spark.index.builder import build_index
    from dhr_spark.operators.wand import Searcher

    d = str(tmp_path / "ppidx")
    build_index(spark, synth_transcripts(spark, 15), d, chunk_bits=7,
                block_size=16, positional=True, docid_strategy="window")
    res = Searcher(spark, d).search_phrase_prefix("the tabl")
    plan = _plan(res)
    pushed = plan.split("PushedFilters")
    assert len(pushed) > 1 and "term_id" in pushed[1][:300], plan[:800]
    assert "CartesianProduct" not in plan


def test_composite_agg_keys_on_hit_set_with_partial_agg(spark):
    """hit_composite reduces with map-side combine on (qid, keys) and the
    after-cursor joins BROADCAST (tiny per-qid key rows)."""
    from dhr_spark.operators.hitstats import hit_composite

    hits = spark.createDataFrame(
        [("q1", 1), ("q1", 2)], "qid string, docid long"
    )
    values = spark.createDataFrame(
        [(1, "a", 3), (2, "b", 9)], "docid long, c string, f long"
    )
    srcs = [("c", "terms", "c"), ("b", "histogram", ("f", 5))]
    res = hit_composite(hits, values, srcs, 2, after={"q1": ("a", 0)})
    plan = _plan(res)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    # partial (map-side) aggregation before the exchange
    assert "partial_count" in plan or "HashAggregate" in plan


def test_ltr_features_broadcasts_stats_single_agg(spark):
    """ltr_features pays ONE (qid, docid) aggregation; term stats and qlen
    broadcast; no cartesian anywhere."""
    from dhr_spark.operators.ltr import ltr_features
    from dhr_spark.operators.termfreq import (
        doc_lengths, query_term_freqs, term_freqs, with_tokens,
    )

    docs = spark.createDataFrame(
        [(0, "spark table"), (1, "table join")], "docid long, text string"
    )
    tok = with_tokens(docs, mode="simple")
    q = spark.createDataFrame([("q1", "table")], "qid string, text string")
    res = ltr_features(
        query_term_freqs(with_tokens(q, mode="simple")),
        term_freqs(tok), doc_lengths(tok),
    )
    plan = _plan(res)
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastExchange") >= 2  # term stats + qlen


def test_semdedup_no_cartesian_single_cluster_shuffle(spark):
    """SemDeDup's pair work happens inside the per-cluster Arrow kernel —
    the plan must show NO CartesianProduct (the cluster gate is the whole
    point) and the assignment join keeps the pair stage to the k-bounded
    groupBy(cid) exchange."""
    from dhr_spark.operators.dedup import semdedup_pairs

    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    plan = _plan(semdedup_pairs(embs, threshold=0.5, k=4, iters=1))
    assert "CartesianProduct" not in plan, plan[:800]
    assert "FlatMapGroupsInPandas" in plan or "FlatMapGroupsIn" in plan


def test_redde_scores_broadcasts_shard_stats(spark):
    """The qid x shard grid is |Q| x N_c rows — the shard-stats side must
    broadcast (nested-loop over a broadcast is fine; a shuffled cartesian
    would mean the tiny dim drove an exchange)."""
    from dhr_spark.operators.federate import redde_scores

    hits = spark.createDataFrame(
        [("q1", 0, 1), ("q1", 1, 2), ("q2", 0, 1)],
        "qid string, index_id int, rank int",
    )
    stats = spark.createDataFrame(
        [(0, 100, 10), (1, 80, 8)], "index_id int, n_docs long, n_sample long"
    )
    plan = _plan(redde_scores(hits, stats, n=10))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan, plan[:800]


def test_search_batch_no_cartesian_and_term_semijoin(spark, idx):
    # the distributed big-batch path: no CartesianProduct anywhere; the
    # segment scan is gated by the queried term_ids (semi join), and no
    # collect-backed driver state feeds the plan (the frame builds lazily)
    from dhr_spark.operators.wand import Searcher

    s = Searcher(spark, idx)
    df = s.search_batch(synth_queries(spark, 6), k=5)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "LeftSemi" in plan or "left_semi" in plan.lower()
    # broadcast tier: the score aggregate keyed (qn, docid) must add NO
    # exchange — the docid repartition before the broadcast fan-out
    # satisfies its clustering (HashPartitioning(docid) ⊆ (qn, docid)), so
    # 40M fanned rows aggregate partition-local; the only qn exchange left
    # is the k-bounded window merge
    import re

    assert re.search(r"hashpartitioning\(qn#\d+, docid#", plan) is None, (
        plan[:1200]
    )
    assert re.search(r"hashpartitioning\(docid#", plan) is not None


def test_encode_term_weights_broadcasts_df_stats(spark, docs_small):
    # the from-text encoder: df stats broadcast back onto tf rows — one
    # wide shuffle (the tf groupBy), never a cartesian
    from dhr_spark.operators.impact import encode_term_weights
    from dhr_spark.operators.termfreq import with_tokens

    docs = docs_small.select(
        F.col("doc_id").alias("docid"), "text"
    )
    w = encode_term_weights(with_tokens(docs, mode="simple"))
    plan = _plan(w)
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
