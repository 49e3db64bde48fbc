"""In-place docvalue updates (index/dvupdate.py) — Lucene updateDocValues.

Committed generations must overlay every docvalues read path latest-wins,
equal a rebuild with the updated column, respect snapshots, survive
compaction's docid remap, and refuse identity-column / malformed updates."""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from dhr_spark.data.synthetic import synth_queries, synth_transcripts
from dhr_spark.index.builder import build_index_from_docs, load_manifest
from dhr_spark.index.dvupdate import update_docvalues
from dhr_spark.operators.docids import doc_map, with_docids
from dhr_spark.operators.wand import Searcher

CHUNK_BITS, BLOCK = 5, 8


def _docs(spark):
    d = with_docids(synth_transcripts(spark, 10, seed=13))
    # a numeric docvalue to sort/boost on (deterministic per doc)
    return d.withColumn("pop", (F.col("docid") % 7).cast("long"))


def _build(spark, docs, d):
    return build_index_from_docs(
        spark, docs, d,
        chunk_bits=CHUNK_BITS, block_size=BLOCK,
        doc_map_df=doc_map(docs, ("role", "pop")),
        forward_index=True, docvalues=("role", "pop"),
    )


@pytest.fixture(scope="module")
def env(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("dvu")
    docs = _docs(spark).cache()
    idx = str(root / "idx")
    man0 = _build(spark, docs, idx)
    # flip pop to 1000+docid for docids 3..7, role of docid 4 to "edited"
    upd = docs.filter(F.col("docid").between(3, 7)).select(
        "docid", (F.col("docid") + F.lit(1000)).cast("long").alias("pop")
    )
    update_docvalues(spark, idx, upd)
    update_docvalues(
        spark, idx,
        spark.createDataFrame([(4, "edited")], "docid long, role string"),
    )
    # the rebuild twin: same corpus with the updated values baked in
    docs2 = docs.withColumn(
        "pop",
        F.when(F.col("docid").between(3, 7), F.col("docid") + 1000)
        .otherwise(F.col("pop")).cast("long"),
    ).withColumn(
        "role",
        F.when(F.col("docid") == 4, F.lit("edited")).otherwise(F.col("role")),
    )
    ref = str(root / "ref")
    _build(spark, docs2, ref)
    return dict(idx=idx, ref=ref, docs=docs, snap0=int(man0["snapshot_id"]))


@pytest.fixture(scope="module")
def queries(spark):
    return synth_queries(spark, n_queries=6)


def test_docvalues_frame_overlaid(spark, env):
    got = {
        r["docid"]: (r["pop"], r["role"])
        for r in Searcher(spark, env["idx"])
        .docvalues_frame(["pop", "role"]).collect()
    }
    want = {
        r["docid"]: (r["pop"], r["role"])
        for r in Searcher(spark, env["ref"])
        .docvalues_frame(["pop", "role"]).collect()
    }
    assert got == want
    assert got[4] == (1004, "edited") and got[2][0] == 2


def test_sorted_boosted_facets_match_rebuild(spark, env, queries):
    s, r = Searcher(spark, env["idx"]), Searcher(spark, env["ref"])

    def rows(df, cols):
        return sorted(tuple(x[c] for c in cols) for x in df.collect())

    assert rows(
        s.search_sorted(queries, by="pop", k=50), ["qid", "docid", "rank"]
    ) == rows(
        r.search_sorted(queries, by="pop", k=50), ["qid", "docid", "rank"]
    )
    a = s.search_boosted(queries, "pop", scale=10.0, k=50)
    b = r.search_boosted(queries, "pop", scale=10.0, k=50)
    assert rows(a, ["qid", "docid", "rank"]) == rows(b, ["qid", "docid", "rank"])
    fa = rows(s.result_facets(queries, "role"), ["qid", "role"])
    fb = rows(r.result_facets(queries, "role"), ["qid", "role"])
    assert fa == fb


def test_latest_generation_wins(spark, env):
    update_docvalues(
        spark, env["idx"],
        spark.createDataFrame([(4, 7777)], "docid long, pop long"),
    )
    got = {
        r["docid"]: r["pop"]
        for r in Searcher(spark, env["idx"]).docvalues_frame(["pop"]).collect()
    }
    assert got[4] == 7777 and got[5] == 1005
    # restore for later tests
    update_docvalues(
        spark, env["idx"],
        spark.createDataFrame([(4, 1004)], "docid long, pop long"),
    )


def test_snapshot_sees_pre_update_values(spark, env):
    s0 = Searcher(spark, env["idx"], snapshot=env["snap0"])
    got = {
        r["docid"]: (r["pop"], r["role"])
        for r in s0.docvalues_frame(["pop", "role"]).collect()
    }
    assert got[4] == (4, got[4][1]) and got[4][1] != "edited"
    assert got[5][0] == 5


def test_delete_by_match_sees_updated_values(spark, tmp_path):
    from dhr_spark.index.delete import delete_docs

    docs = _docs(spark)
    idx = str(tmp_path / "del")
    _build(spark, docs, idx)
    update_docvalues(
        spark, idx,
        spark.createDataFrame([(6, "zap"), (9, "zap")],
                              "docid long, role string"),
    )
    man = delete_docs(spark, idx, match=("role", ["zap"]))
    assert man["tombstones"] == 2
    alive = {
        r["docid"]
        for r in Searcher(spark, idx).docvalues_frame(["role"]).collect()
    }
    # docvalues_frame reads doc_map (not tombstone-masked), but search must
    # never return the deleted docs
    res = Searcher(spark, idx).search(synth_queries(spark, 6), k=10**6)
    assert not {6, 9} & {r["docid"] for r in res.collect()}
    assert alive  # sanity


def test_validation_contract(spark, env):
    idx = env["idx"]
    with pytest.raises(ValueError, match="identity columns"):
        update_docvalues(
            spark, idx,
            spark.createDataFrame([(1, 0)], "docid long, turn_idx int"),
        )
    with pytest.raises(ValueError, match="not in this index's doc_map"):
        update_docvalues(
            spark, idx,
            spark.createDataFrame([(1, 1)], "docid long, nope long"),
        )
    with pytest.raises(ValueError, match="duplicate docids"):
        update_docvalues(
            spark, idx,
            spark.createDataFrame([(1, 1), (1, 2)], "docid long, pop long"),
        )
    with pytest.raises(ValueError, match="NULL"):
        update_docvalues(
            spark, idx,
            spark.createDataFrame([(1, None)], "docid long, pop long"),
        )
    with pytest.raises(ValueError, match="beyond the corpus"):
        update_docvalues(
            spark, idx,
            spark.createDataFrame([(10**9, 1)], "docid long, pop long"),
        )
    with pytest.raises(ValueError, match="empty"):
        update_docvalues(
            spark, idx,
            spark.createDataFrame([], "docid long, pop long"),
        )


def test_crash_retry_idempotent(spark, tmp_path):
    docs = _docs(spark)
    idx = str(tmp_path / "crash")
    _build(spark, docs, idx)
    before = open(os.path.join(idx, "manifest.json")).read()
    upd = spark.createDataFrame([(2, 555)], "docid long, pop long")
    update_docvalues(spark, idx, upd)
    # simulate a crash BETWEEN the sidecar write and the manifest commit:
    # rewind the manifest; the orphan gen must be invisible, and the retry
    # must overwrite it and land the same committed state
    with open(os.path.join(idx, "manifest.json"), "w") as fh:
        fh.write(before)
    got = {
        r["docid"]: r["pop"]
        for r in Searcher(spark, idx).docvalues_frame(["pop"]).collect()
    }
    assert got[2] == 2  # orphan not visible
    update_docvalues(spark, idx, upd)
    man = load_manifest(idx)
    assert man["dv_gens"] == {"pop": 1}
    got = {
        r["docid"]: r["pop"]
        for r in Searcher(spark, idx).docvalues_frame(["pop"]).collect()
    }
    assert got[2] == 555


def test_append_then_update_coexist(spark, env, tmp_path):
    from dhr_spark.index.incremental import append_docs_to_index

    docs = _docs(spark)
    idx = str(tmp_path / "app")
    _build(spark, docs, idx)
    update_docvalues(
        spark, idx,
        spark.createDataFrame([(0, 999)], "docid long, pop long"),
    )
    man = load_manifest(idx)
    chunk_docs = 1 << CHUNK_BITS
    floor = -(-int(man["next_docid"]) // chunk_docs) * chunk_docs
    extra = (
        with_docids(synth_transcripts(spark, 2, seed=77))
        .withColumn("docid", F.col("docid") + F.lit(floor))
        .withColumn("pop", F.lit(50).cast("long"))
    )
    append_docs_to_index(spark, extra, idx)
    got = {
        r["docid"]: r["pop"]
        for r in Searcher(spark, idx).docvalues_frame(["pop"]).collect()
    }
    assert got[0] == 999 and all(got[d] == 50 for d in got if d >= floor)


def test_updates_survive_compaction(spark, queries, tmp_path):
    from dhr_spark.index.compact import compact_index
    from dhr_spark.index.incremental import append_docs_to_index

    docs = _docs(spark)
    idx = str(tmp_path / "cmp")
    _build(spark, docs, idx)
    man = load_manifest(idx)
    chunk_docs = 1 << CHUNK_BITS
    floor = -(-int(man["next_docid"]) // chunk_docs) * chunk_docs
    extra = (
        with_docids(synth_transcripts(spark, 2, seed=77))
        .withColumn("docid", F.col("docid") + F.lit(floor))
        .withColumn("pop", F.lit(50).cast("long"))
    )
    append_docs_to_index(spark, extra, idx)
    update_docvalues(
        spark, idx,
        spark.createDataFrame(
            [(1, 444), (int(floor), 888)], "docid long, pop long"
        ),
    )
    pre = {
        (r["conv_id"], r["turn_idx"]): r["pop"]
        for r in spark.read.parquet(f"{idx}/doc_map")
        .select("docid", "conv_id", "turn_idx")
        .join(
            Searcher(spark, idx).docvalues_frame(["pop"]), "docid"
        )
        .collect()
    }
    man2 = compact_index(spark, idx, fill_threshold=0.95)
    assert man2.get("compactions", 0) >= 1
    assert man2.get("dv_dir", "").startswith("dv_updates_v")
    assert not os.path.isdir(os.path.join(idx, "dv_updates"))  # GC'd
    s = Searcher(spark, idx)
    post = {
        (r["conv_id"], r["turn_idx"]): r["pop"]
        for r in spark.read.parquet(f"{idx}/doc_map")
        .select("docid", "conv_id", "turn_idx")
        .join(s.docvalues_frame(["pop"]), "docid")
        .collect()
    }
    assert post == pre
    # and the boosted ranking still reflects the updated values
    res = s.search_boosted(queries, "pop", scale=10.0, k=20)
    assert res.count() > 0


def test_sql_view_overlaid(spark, env):
    from dhr_spark.sql import register_index_views

    register_index_views(spark, env["idx"], prefix="dvu")
    got = {
        r["docid"]: r["pop"]
        for r in spark.sql("SELECT docid, pop FROM dvu_doc_map").collect()
    }
    assert got[5] == 1005 and got[2] == 2


def test_merge_refuses_src_with_updates(spark, tmp_path):
    from dhr_spark.index.merge import merge_indexes

    docs = _docs(spark)
    cut = 2 * (1 << CHUNK_BITS)
    da, db = str(tmp_path / "a"), str(tmp_path / "b")
    _build(spark, docs.filter(F.col("docid") < cut), da)
    _build(spark, docs.filter(F.col("docid") >= cut), db)
    update_docvalues(
        spark, db,
        spark.createDataFrame([(cut + 1, 5)], "docid long, pop long"),
    )
    with pytest.raises(ValueError, match="docvalue update generations"):
        merge_indexes(spark, da, db)
