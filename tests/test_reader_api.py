"""Index-reader surfaces: term_vectors / suggest / stats_df.

Contracts: term vectors round-trip the analyzed corpus exactly (tf/dl per
(docid, term) equal the tokenizer's counts); suggest's resident-dict and
distributed paths are identical; stats_df agrees with a direct recount.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dhr_spark.data.synthetic import synth_transcripts
from dhr_spark.index.builder import build_index
from dhr_spark.operators.docids import with_docids
from dhr_spark.operators.termfreq import doc_lengths, term_freqs, with_tokens
from dhr_spark.operators.wand import Searcher


@pytest.fixture(scope="module")
def env(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("reader_idx") / "idx")
    tr = synth_transcripts(spark, 40)
    build_index(
        spark, tr, idx, chunk_bits=6, block_size=8,
        docid_strategy="window", forward_index=True,
    )
    tok = with_tokens(with_docids(tr, "window"), mode="lucene")
    return dict(
        idx=idx,
        searcher=Searcher(spark, idx),
        tfs=term_freqs(tok),
        dls=doc_lengths(tok),
    )


def test_term_vectors_roundtrip_corpus(spark, env):
    ids = [1, 7, 23]
    got = {
        (r["docid"], r["term"]): (r["tf"], r["dl"])
        for r in env["searcher"].term_vectors(ids).collect()
    }
    exp_tf = env["tfs"].filter(F.col("docid").isin(ids)).collect()
    exp_dl = {
        r["docid"]: r["dl"]
        for r in env["dls"].filter(F.col("docid").isin(ids)).collect()
    }
    assert got and len(got) == len(exp_tf)
    for r in exp_tf:
        assert got[(r["docid"], r["term"])] == (r["tf"], exp_dl[r["docid"]])


def test_term_vectors_dataframe_arg_matches_list(spark, env):
    ids = [2, 9]
    df_arg = spark.createDataFrame([(i,) for i in ids], "docid long")
    a = sorted(map(tuple, env["searcher"].term_vectors(ids).collect()))
    b = sorted(map(tuple, env["searcher"].term_vectors(df_arg).collect()))
    assert a == b and a


def test_term_vectors_requires_forward_index(spark, tmp_path):
    idx = str(tmp_path / "nofwd")
    build_index(spark, synth_transcripts(spark, 8), idx, chunk_bits=6,
                block_size=8, docid_strategy="window")
    with pytest.raises(ValueError, match="forward_index"):
        Searcher(spark, idx).term_vectors([0])


def test_suggest_resident_equals_distributed(spark, env):
    s = env["searcher"]
    terms = ["tabel", "quary", "xqzwv", "sow"]
    fast = sorted(map(tuple, s.suggest(terms, n=4).collect()))
    assert s._tid_cache is not None
    saved = s._tid_cache
    try:
        s._tid_cache = None
        slow = sorted(map(tuple, s.suggest(terms, n=4).collect()))
    finally:
        s._tid_cache = saved
    assert fast == slow and fast
    # never suggests the input itself; respects rank bounds
    for inp, sug, dist, rank in fast:
        assert sug != inp and 1 <= rank <= 4 and 1 <= dist <= 2


def test_suggest_no_candidates(spark, env):
    assert env["searcher"].suggest(["zzzzzzz"]).count() == 0


def test_suggest_distributed_kgram_identity(spark, tmp_path):
    """With a k-gram table the distributed suggest fallback takes the
    batched gram cut (_fuzzy_candidate_rows); results must equal the
    resident scan. Inputs cover the vacuous-bound fallback ('sow': 5
    grams - 3*2 edits < 1), the gram path ('tabel*' shapes), prefix_len=0
    (no prefix gate), and a no-candidate input."""
    from dhr_spark.index.kgram import build_kgram_index

    idx = str(tmp_path / "kg")
    build_index(spark, synth_transcripts(spark, 40), idx, chunk_bits=6,
                block_size=8, docid_strategy="window")
    build_kgram_index(spark, idx)
    s = Searcher(spark, idx)
    assert s.manifest.get("kgram") and s._tid_cache is not None
    terms = ["tabel", "quary", "xqzwv", "sow"]
    for plen in (1, 0):
        fast = sorted(
            map(tuple, s.suggest(terms, n=4, prefix_len=plen).collect())
        )
        saved = s._tid_cache
        try:
            s._tid_cache = None
            slow = sorted(
                map(tuple, s.suggest(terms, n=4, prefix_len=plen).collect())
            )
        finally:
            s._tid_cache = saved
        assert fast == slow and fast


def test_stats_df_matches_recount(spark, env):
    row = env["searcher"].stats_df().collect()[0]
    n_docs = env["dls"].count()
    total_dl = env["dls"].agg(F.sum("dl")).collect()[0][0]
    n_terms = env["tfs"].select("term").distinct().count()
    postings = env["tfs"].count()
    assert row["n_docs"] == n_docs
    assert row["total_dl"] == total_dl
    assert row["n_terms"] == n_terms
    assert row["total_postings"] == postings
    assert row["avgdl"] == pytest.approx(total_dl / n_docs)
    assert row["n_chunks"] >= 1


# --------------------------------------------------------------- docvalues

def test_docvalues_sort_and_facets(spark, tmp_path):
    """DocValues on a transcripts index: search_sorted orders matching docs
    by the field exactly; result_facets counts match a corpus recount; an
    append carries the docvalues columns through."""
    from dhr_spark.data.synthetic import synth_queries
    from dhr_spark.index.incremental import append_to_index
    from dhr_spark.operators.docids import with_docids

    idx = str(tmp_path / "dv_idx")
    tr = synth_transcripts(spark, 30)
    build_index(spark, tr, idx, chunk_bits=6, block_size=8,
                docid_strategy="window", docvalues=["role", "ts"])
    s = Searcher(spark, idx)
    q = synth_queries(spark, 4)

    matched = {(r["qid"], r["docid"])
               for r in s._matched_docs(q).collect()}
    assert matched

    rows = s.search_sorted(q, by="ts", k=10, ascending=True).collect()
    assert rows
    by_q: dict = {}
    for r in sorted(rows, key=lambda r: (r["qid"], r["rank"])):
        assert (r["qid"], r["docid"]) in matched
        by_q.setdefault(r["qid"], []).append((r["ts"], r["docid"]))
    for seq in by_q.values():
        assert seq == sorted(seq)

    fac = {(r["qid"], r["role"]): r["n"]
           for r in s.result_facets(q, "role").collect()}
    roles = {r["docid"]: r["role"]
             for r in with_docids(tr, "window").select("docid", "role").collect()}
    from collections import Counter
    want = Counter((qid, roles[d]) for qid, d in matched)
    assert fac == dict(want)

    with pytest.raises(ValueError, match="docvalues"):
        s.search_sorted(q, by="nonexistent_field", k=5)

    # append: docvalues ride the new seg_batch partition
    extra = synth_transcripts(spark, 6, seed=99).withColumn(
        "conv_id", F.concat(F.lit("x-"), F.col("conv_id"))
    )
    append_to_index(spark, extra, idx)
    s2 = Searcher(spark, idx)
    dv = s2.docvalues_frame(["role", "ts"])
    assert dv.count() == s2.stats_df().collect()[0]["n_docs"]


def test_search_collapse_group_limit(spark, tmp_path):
    """Collapse keeps at most group_limit docs per (qid, field) and ranks
    survivors exactly as an ordinary search restricted to them."""
    from dhr_spark.data.synthetic import synth_queries

    idx = str(tmp_path / "col_idx")
    tr = synth_transcripts(spark, 25)
    build_index(spark, tr, idx, chunk_bits=6, block_size=8,
                docid_strategy="window", docvalues=["role"])
    s = Searcher(spark, idx)
    q = synth_queries(spark, 4)
    rows = s.search_collapse(q, "role", k=8, group_limit=2).collect()
    assert rows
    from collections import Counter
    per_group = Counter((r["qid"], r["role"]) for r in rows)
    assert max(per_group.values()) <= 2
    # survivors are ordered by (round6 score desc, docid) with dense ranks
    by_q: dict = {}
    for r in sorted(rows, key=lambda r: (r["qid"], r["rank"])):
        by_q.setdefault(r["qid"], []).append((-r["score"], r["docid"], r["rank"]))
    for seq in by_q.values():
        assert [x[2] for x in seq] == list(range(1, len(seq) + 1))
        assert seq == sorted(seq, key=lambda x: (x[0], x[1]))
    # group_limit=1: each group appears once, and every kept doc is its
    # group's best from the full search
    full = s.search(q, k=1_000_000, prune=False)
    dv = s.docvalues_frame(["role"])
    best = {}
    for r in full.join(dv, "docid").collect():
        key = (r["qid"], r["role"])
        cand = (-round(r["score"], 6), r["docid"])
        if key not in best or cand < best[key]:
            best[key] = cand
    c1 = s.search_collapse(q, "role", k=100, group_limit=1).collect()
    assert c1
    for r in c1:
        assert best[(r["qid"], r["role"])][1] == r["docid"]


def test_search_filtered_range_and_values(spark, tmp_path):
    """search_filtered == full-depth search restricted to the in-filter
    docs and re-ranked densely; the filter never changes a survivor's
    score (global stats, Lucene FILTER-clause semantics)."""
    from dhr_spark.data.synthetic import synth_queries

    idx = str(tmp_path / "flt_idx")
    tr = synth_transcripts(spark, 30)
    # turn_idx is a base doc_map column — usable as a docvalue without
    # declaring it; role is an extra carried via docvalues=
    build_index(spark, tr, idx, chunk_bits=6, block_size=8,
                docid_strategy="window", docvalues=["role"])
    s = Searcher(spark, idx)
    q = synth_queries(spark, 5)

    lo, hi = 2, 9
    got = s.search_filtered(q, "turn_idx", lo=lo, hi=hi, k=1_000_000)
    rows = sorted(
        ((r["qid"], r["docid"], r["rank"], r["score"]) for r in got.collect()),
    )
    dv = {r["docid"]: r["turn_idx"]
          for r in s.docvalues_frame(["turn_idx"]).collect()}
    full = s.search(q, k=1_000_000).collect()
    by_q: dict = {}
    for r in sorted(full, key=lambda r: (r["qid"], r["rank"])):
        if lo <= dv[r["docid"]] <= hi:
            by_q.setdefault(r["qid"], []).append((r["docid"], r["score"]))
    want = sorted(
        (qid, d, i + 1, sc)
        for qid, seq in by_q.items()
        for i, (d, sc) in enumerate(seq)
    )
    assert rows and rows == want

    # values= mode on a string field agrees with the range machinery
    gv = s.search_filtered(q, "role", values=["user"], k=50)
    roles = {r["docid"]: r["role"]
             for r in s.docvalues_frame(["role"]).collect()}
    got_v = gv.collect()
    assert got_v and all(roles[r["docid"]] == "user" for r in got_v)

    with pytest.raises(ValueError, match="values=, lo=, and/or hi="):
        s.search_filtered(q, "role")


def test_significant_terms_index_matches_corpus_scan(spark, env):
    """Index-backed significant_terms == the generic operator fed the same
    foreground/background inputs rebuilt from the analyzed corpus."""
    from dhr_spark.data.synthetic import synth_queries
    from dhr_spark.operators.significant import significant_terms as sig

    s = env["searcher"]
    q = synth_queries(spark, 6)
    got = s.significant_terms(q, k=8, top_hits=15, min_fg=2)
    hits = s.search(q, k=15).select("qid", "docid")
    tdf = env["tfs"].groupBy("term").agg(F.count("*").alias("df"))
    n_docs = int(s.manifest["n_docs"])
    exp = sig(
        hits, env["tfs"].select("docid", "term"), tdf, n_docs, k=8, min_fg=2
    )
    ga = sorted(map(tuple, got.collect()))
    ea = sorted(map(tuple, exp.collect()))
    assert ga and ga == ea
    # every score positive and monotone within each qid rank order
    by_q = {}
    for r in got.collect():
        by_q.setdefault(r["qid"], []).append((r["rank"], r["score"]))
    for qid, rows in by_q.items():
        rows.sort()
        assert all(s_ > 0 for _, s_ in rows)
        assert all(rows[i][1] >= rows[i + 1][1] for i in range(len(rows) - 1))


def test_significant_terms_guards(spark, env, tmp_path):
    from dhr_spark.data.synthetic import synth_queries, synth_transcripts

    # no forward index -> ValueError
    idx2 = str(tmp_path / "nofwd")
    build_index(
        spark, synth_transcripts(spark, 10), idx2, chunk_bits=6,
        block_size=8, docid_strategy="window",
    )
    with pytest.raises(ValueError, match="forward_index"):
        Searcher(spark, idx2).significant_terms(synth_queries(spark, 2))
    from dhr_spark.operators.significant import significant_terms as sig

    empty = spark.createDataFrame([], "qid string, docid long")
    with pytest.raises(ValueError, match="k must"):
        sig(empty, empty.select("docid", F.lit("t").alias("term")),
            empty.select(F.lit("t").alias("term"), F.lit(1).alias("df")),
            10, k=0)


def test_result_top_hits_matches_manual_recompute(spark, tmp_path):
    """ES terms+top_hits: buckets are the n_buckets largest by hit count
    (field-asc ties), hits inside each are the best by exhaustive BM25
    (docid-asc ties) — recomputed manually from search(prune=False) joined
    to the docvalues column."""
    from collections import Counter

    from dhr_spark.data.synthetic import synth_queries, synth_transcripts
    from dhr_spark.operators.docids import with_docids

    idx = str(tmp_path / "th_idx")
    tr = synth_transcripts(spark, 40)
    build_index(spark, tr, idx, chunk_bits=6, block_size=8,
                docid_strategy="window", docvalues=["role"])
    s = Searcher(spark, idx)
    q = synth_queries(spark, 4)
    n_buckets, per = 2, 2

    got = s.result_top_hits(q, "role", n_buckets=n_buckets,
                            hits_per_bucket=per).collect()
    assert got

    roles = {r["docid"]: r["role"]
             for r in with_docids(tr, "window").select("docid", "role").collect()}
    full = s.search(q, k=10**6, prune=False).collect()
    by_q: dict = {}
    for r in full:
        by_q.setdefault(r["qid"], []).append(
            (roles[r["docid"]], r["docid"], round(r["score"], 6))
        )
    expect = set()
    bucket_n = {}
    for qid, rows in by_q.items():
        counts = Counter(role for role, _, _ in rows)
        top = sorted(counts, key=lambda v: (-counts[v], v))[:n_buckets]
        for role in top:
            bucket_n[(qid, role)] = counts[role]
            hits = sorted(
                [(d, sc) for v, d, sc in rows if v == role],
                key=lambda t: (-t[1], t[0]),
            )[:per]
            for rank, (d, _) in enumerate(hits, 1):
                expect.add((qid, role, d, rank))
    assert {(r["qid"], r["role"], r["docid"], r["rank"]) for r in got} == expect
    for r in got:
        assert r["bucket_n"] == bucket_n[(r["qid"], r["role"])]


def test_suggest_complete_resident_equals_distributed(spark, env):
    s = env["searcher"]
    prefixes = ["Pro", "de", "xqzwv", "s"]
    fast = sorted(map(tuple, s.suggest_complete(prefixes, n=4).collect()))
    assert s._tid_cache is not None
    saved = s._tid_cache
    try:
        s._tid_cache = None
        slow = sorted(
            map(tuple, s.suggest_complete(prefixes, n=4).collect())
        )
    finally:
        s._tid_cache = saved
    assert fast == slow and fast
    for inp, sug, rank in fast:
        assert sug.startswith(inp.lower()) and 1 <= rank <= 4


def test_suggest_complete_df_weight_order(spark, env):
    # rank order == document frequency DESC (idf ASC), term ASC — and the
    # exact term is a legal completion (ES returns the exact match too)
    s = env["searcher"]
    tok = with_tokens(with_docids(synth_transcripts(spark, 40), "window"),
                      mode="lucene")
    df = (
        tok.select("docid", F.explode(F.array_distinct("tokens")).alias("t"))
        .groupBy("t").count()
    )
    rows = {r["t"]: r["count"] for r in df.collect() if r["t"].startswith("s")}
    want = sorted(((-c, t) for t, c in rows.items()))[:4]
    got = [
        (r.suggestion, r.rank)
        for r in s.suggest_complete(["s"], n=4).orderBy("rank").collect()
    ]
    assert [t for _, t in want] == [t for t, _ in got]
    exact = [t for t in rows if t == "s"]
    if exact:
        assert any(t == "s" for t, _ in got) or len(got) == 4


def test_rare_terms_semantics(spark):
    """rare_terms: background cutoff gates, rarest-first order, diagonal
    inputs as significant_terms; guards."""
    import pytest as _pt

    from dhr_spark.operators.significant import rare_terms

    hits = spark.createDataFrame(
        [("q", 1), ("q", 2)], "qid string, docid long"
    )
    doc_terms = spark.createDataFrame(
        [(1, "common"), (1, "odd"), (2, "common"), (2, "unique")],
        "docid long, term string",
    )
    tdf = spark.createDataFrame(
        [("common", 90), ("odd", 3), ("unique", 1)],
        "term string, df long",
    )
    got = [
        (r["term"], r["fg"], r["bg"], r["rank"])
        for r in rare_terms(hits, doc_terms, tdf, max_doc_count=5, k=10)
        .orderBy("rank").collect()
    ]
    assert got == [("unique", 1, 1, 1), ("odd", 1, 3, 2)]
    with _pt.raises(ValueError, match="max_doc_count"):
        rare_terms(hits, doc_terms, tdf, max_doc_count=0)
    with _pt.raises(ValueError, match="k must be"):
        rare_terms(hits, doc_terms, tdf, k=0)


def test_postings_list_matches_corpus_recount(spark, env):
    # raw (unanalyzed) inputs: the lucene index stems "tables" -> "tabl"
    got = {
        (r["term"], r["docid"]): r["tf"]
        for r in env["searcher"].postings_list(["Tables", "merge"]).collect()
    }
    want = {
        (r["term"], r["docid"]): r["tf"]
        for r in env["tfs"].filter(F.col("term").isin(["tabl", "merg"]))
        .collect()
    }
    assert got == want and got
    # OOV -> empty, no crash; empty input -> empty
    assert env["searcher"].postings_list(["zzqqxxnever"]).count() == 0
    assert env["searcher"].postings_list([]).count() == 0


def test_postings_list_masks_deleted_docs(spark, tmp_path):
    from dhr_spark.index.delete import delete_docs

    idx = str(tmp_path / "pl_del")
    build_index(spark, synth_transcripts(spark, 10), idx, chunk_bits=6,
                block_size=8, docid_strategy="window", forward_index=True)
    s = Searcher(spark, idx)
    rows = s.postings_list(["the"]).collect() or s.postings_list(
        ["spark"]
    ).collect()
    assert rows
    victim = int(rows[0]["docid"])
    delete_docs(spark, idx, docids=[victim], exact_stats=False)
    after = {r["docid"] for r in Searcher(spark, idx).postings_list(
        [rows[0]["term"]]
    ).collect()}
    assert victim not in after
