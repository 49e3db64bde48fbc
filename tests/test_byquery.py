"""Query-driven bulk mutations (index/byquery.py) — ES _update_by_query /
_delete_by_query.

The match set must equal an independent corpus-side token scan; updates
must equal a rebuild with the new values baked in; deletes must equal a
rebuild minus the matching docs; filters gate over CURRENT (overlaid)
values; no-match calls are manifest no-ops."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from dhr_spark.data.synthetic import synth_queries, synth_transcripts
from dhr_spark.functions.analyzer import tokenize_udf
from dhr_spark.index.builder import build_index_from_docs, load_manifest
from dhr_spark.index.byquery import delete_by_query, update_by_query
from dhr_spark.operators.docids import doc_map, with_docids
from dhr_spark.operators.wand import Searcher

CHUNK_BITS, BLOCK = 5, 8
QUERY = "retrieval segment"  # mid-frequency terms: matches some, not all


def _docs(spark):
    d = with_docids(synth_transcripts(spark, 10, seed=31))
    return d.withColumn("pop", (F.col("docid") % 7).cast("long"))


def _build(spark, docs, d):
    shutil.rmtree(d, ignore_errors=True)
    return build_index_from_docs(
        spark, docs, d,
        chunk_bits=CHUNK_BITS, block_size=BLOCK,
        doc_map_df=doc_map(docs, ("role", "pop")),
        forward_index=True, docvalues=("role", "pop"),
    )


def _corpus_match(docs, query: str):
    """Independent corpus-side OR match set: analyzed doc tokens intersect
    analyzed query terms (same lucene analyzer chain, no index involved)."""
    tok = tokenize_udf("lucene")
    qterms = (
        docs.sparkSession.createDataFrame([(query,)], "text string")
        .select(F.explode(tok(F.col("text"))).alias("t"))
        .distinct()
    )
    terms = [r.t for r in qterms.collect()]
    arr = F.array(*[F.lit(t) for t in terms])
    return docs.withColumn("_toks", tok(F.col("text"))).filter(
        F.size(F.array_intersect(F.array_distinct("_toks"), arr)) > 0
    ).drop("_toks")


@pytest.fixture(scope="module")
def env(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("byq")
    docs = _docs(spark).cache()
    docs.count()
    matched = _corpus_match(docs, QUERY).select("docid").cache()
    n_matched = matched.count()
    assert n_matched > 0, "fixture query must match some docs"
    assert n_matched < docs.count(), "fixture query must not match all docs"
    return {"root": root, "docs": docs, "matched": matched}


def _ranked(spark, d, sim="bm25"):
    res = Searcher(spark, d).search(synth_queries(spark, 6), k=1_000_000)
    return {
        (r.qid, r.docid): (r.rank, r.score) for r in res.collect()
    }


def test_update_by_query_equals_rebuild(spark, env):
    idx = str(env["root"] / "upd")
    _build(spark, env["docs"], idx)
    update_by_query(
        spark, idx, QUERY, {"pop": F.col("pop") + 1000, "role": "flagged"}
    )
    # expected values: matched docs bumped, others untouched
    exp = env["docs"].join(
        env["matched"].withColumn("_m", F.lit(True)), "docid", "left"
    ).select(
        "docid",
        F.when(F.col("_m"), F.col("pop") + 1000)
        .otherwise(F.col("pop")).alias("pop"),
        F.when(F.col("_m"), F.lit("flagged"))
        .otherwise(F.col("role")).alias("role"),
    )
    got = Searcher(spark, idx).docvalues_frame(["pop", "role"])
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0


def test_update_by_query_rerun_increments_again(spark, env):
    idx = str(env["root"] / "upd2")
    _build(spark, env["docs"], idx)
    update_by_query(spark, idx, QUERY, {"pop": F.col("pop") + 1})
    update_by_query(spark, idx, QUERY, {"pop": F.col("pop") + 1})
    man = load_manifest(idx)
    assert man["dv_gens"] == {"pop": 2}
    got = {
        r.docid: r.pop
        for r in Searcher(spark, idx).docvalues_frame(["pop"]).collect()
    }
    base = {r.docid: r.pop for r in env["docs"].select("docid", "pop").collect()}
    m = {r.docid for r in env["matched"].collect()}
    for d, v in base.items():
        assert got[d] == (v + 2 if d in m else v), d


def test_update_by_query_filter_gates_current_values(spark, env):
    idx = str(env["root"] / "updf")
    _build(spark, env["docs"], idx)
    # move half the matched docs to pop=999 first, then update only those
    half = env["matched"].filter(F.col("docid") % 2 == 0)
    assert half.count() > 0
    from dhr_spark.index.dvupdate import update_docvalues

    update_docvalues(
        spark, idx, half.select("docid", F.lit(999).cast("long").alias("pop"))
    )
    update_by_query(
        spark, idx, QUERY, {"role": "hot"},
        filter_field="pop", lo=999, hi=999,
    )
    got = {
        r.docid: r.role
        for r in Searcher(spark, idx).docvalues_frame(["role"]).collect()
    }
    hot = {d for d, r in got.items() if r == "hot"}
    assert hot == {r.docid for r in half.collect()}


def test_delete_by_query_equals_rebuild_minus(spark, env):
    idx = str(env["root"] / "del")
    ref = str(env["root"] / "delref")
    _build(spark, env["docs"], idx)
    delete_by_query(spark, idx, QUERY)
    kept = env["docs"].join(env["matched"], "docid", "left_anti")
    _build(spark, kept, ref)
    a, b = _ranked(spark, idx), _ranked(spark, ref)
    # identical (qid, docid) -> score maps; ranks likewise (exact stats)
    assert set(a) == set(b)
    for k in a:
        assert a[k][1] == pytest.approx(b[k][1], abs=1e-6), k
    deleted = {r.docid for r in env["matched"].collect()}
    assert not deleted & {d for _, d in a}


def test_delete_by_query_filter_and_mask_only(spark, env):
    idx = str(env["root"] / "delm")
    _build(spark, env["docs"], idx)
    man0 = load_manifest(idx)
    sub = env["matched"].filter(F.col("docid") % 3 == 0)
    delete_by_query(
        spark, idx, QUERY, filter_field="pop",
        values=[r.pop for r in env["docs"].join(sub, "docid")
                .select("pop").distinct().collect()],
        exact_stats=False,
    )
    man = load_manifest(idx)
    assert man.get("stale_stats") is True
    assert man["n_docs"] == man0["n_docs"]  # mask-only keeps stats
    res = Searcher(spark, idx).search(synth_queries(spark, 6), k=1_000_000)
    alive = {r.docid for r in res.collect()}
    gone = {
        r.docid
        for r in env["docs"].join(sub, "docid", "left_semi")
        .select("docid").collect()
    }
    assert not alive & gone


def test_no_match_is_noop(spark, env):
    idx = str(env["root"] / "noop")
    _build(spark, env["docs"], idx)
    man0 = load_manifest(idx)
    m1 = update_by_query(spark, idx, "zzzqx nonexistenttoken", {"pop": 1})
    m2 = delete_by_query(spark, idx, "zzzqx nonexistenttoken")
    assert not m1.get("dv_gens")
    assert m2["n_docs"] == man0["n_docs"]
    assert load_manifest(idx).get("dv_gens") in (None, {})


def test_guards(spark, env):
    idx = str(env["root"] / "guard")
    _build(spark, env["docs"], idx)
    with pytest.raises(ValueError, match="non-empty string"):
        update_by_query(spark, idx, "  ", {"pop": 1})
    with pytest.raises(ValueError, match="identity columns"):
        update_by_query(spark, idx, QUERY, {"turn_idx": 0})
    with pytest.raises(ValueError, match="not in this index's doc_map"):
        update_by_query(spark, idx, QUERY, {"nope": 1})
    with pytest.raises(ValueError, match=">= 1 field"):
        update_by_query(spark, idx, QUERY, {})
    with pytest.raises(ValueError, match="filter_field"):
        update_by_query(spark, idx, QUERY, {"pop": 1}, lo=3)
    with pytest.raises(ValueError, match="needs lo=, hi="):
        delete_by_query(spark, idx, QUERY, filter_field="pop")
