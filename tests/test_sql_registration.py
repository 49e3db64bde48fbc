"""SQL-parity layer (dhr_spark/sql.py): analyzer UDFs callable from
spark.sql, index artifacts as live-doc temp views, and the headline
contract — pure-SQL Lucene BM25 over the views is rank- AND
score-identical to Searcher.search (SURVEY §4 "spark.udf registration
layer"; BM25 convention §7.2).
"""

from __future__ import annotations

import pytest

from dhr_spark.data.synthetic import synth_queries, synth_transcripts
from dhr_spark.functions.analyzer import analyze_lucene
from dhr_spark.index.builder import build_index, load_manifest
from dhr_spark.index.delete import delete_docs
from dhr_spark.operators.wand import Searcher
from dhr_spark.sql import register_functions, register_index_views

N_CONVS = 30
K = 10

# Lucene BM25 (no (k1+1) factor, SURVEY §7.2) as one SQL statement over the
# registered views — the whole point of the layer. Ties: score DESC, docid
# ASC (the engine's deterministic order).
BM25_SQL = """
WITH q AS (
  SELECT qid, term, COUNT(*) AS qtf
  FROM (SELECT qid, explode(dhr_analyze(text)) AS term FROM queries)
  GROUP BY qid, term
),
scored AS (
  SELECT q.qid, f.docid,
         SUM(q.qtf
             * ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
             * f.tf / (f.tf + s.k1 * (1 - s.b + s.b * l.dl / s.avgdl))
         ) AS score
  FROM q
  JOIN dhr_dictionary d USING (term)
  JOIN dhr_forward f USING (term_id)
  JOIN dhr_doclens l USING (docid)
  CROSS JOIN dhr_stats s
  GROUP BY q.qid, f.docid
)
SELECT qid, docid, rank, score FROM (
  SELECT qid, docid, score,
         ROW_NUMBER() OVER (
           PARTITION BY qid ORDER BY score DESC, docid ASC
         ) AS rank
  FROM scored
) WHERE rank <= {k}
"""


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("sqlidx") / "idx")
    tr = synth_transcripts(spark, N_CONVS)
    build_index(
        spark, tr, idx, chunk_bits=6, block_size=8,
        docid_strategy="window", forward_index=True, stored=True,
        positional=True,
    )
    register_functions(spark)
    queries = synth_queries(spark, 12).cache()
    queries.createOrReplaceTempView("queries")
    return dict(idx=idx, queries=queries)


def test_analyze_udfs_in_sql(spark, built):
    row = spark.sql(
        "SELECT dhr_analyze('The Quick brown foxes are running!') AS a, "
        "dhr_analyze_simple('The Quick brown') AS b, "
        "dhr_analyze_gaps('the quick brown') AS g"
    ).first()
    assert row["a"] == analyze_lucene("The Quick brown foxes are running!")
    assert "the" not in row["a"] and "run" in row["a"]  # stopword + stem
    assert row["b"] == ["the", "quick", "brown"]
    # gap mode: the stopword slot survives as NULL (position increment)
    assert row["g"][0] is None and row["g"][1:] == ["quick", "brown"]


def test_views_registered_and_consistent(spark, built):
    man = register_index_views(spark, built["idx"])
    n_dict = spark.sql("SELECT COUNT(*) c FROM dhr_dictionary").first()["c"]
    assert n_dict == man["n_terms"]
    st = spark.sql("SELECT * FROM dhr_stats").first()
    assert st["n_docs"] == man["n_docs"]
    n_docs_view = spark.sql("SELECT COUNT(*) c FROM dhr_doclens").first()["c"]
    assert n_docs_view == man["n_docs"]
    # forward view is doc-major: per-doc tf sums reproduce doclens dl
    bad = spark.sql(
        "SELECT COUNT(*) c FROM ("
        "  SELECT f.docid, SUM(f.tf) AS s FROM dhr_forward f GROUP BY f.docid"
        ") j JOIN dhr_doclens l USING (docid) WHERE j.s != l.dl"
    ).first()["c"]
    assert bad == 0
    # stored view serves the original text, keyed by docid
    n_stored = spark.sql(
        "SELECT COUNT(*) c FROM dhr_stored WHERE text IS NULL OR text = ''"
    ).first()["c"]
    assert n_stored == 0
    joined = spark.sql(
        "SELECT COUNT(*) c FROM dhr_stored s JOIN dhr_doc_map m USING (docid)"
    ).first()["c"]
    assert joined == spark.sql("SELECT COUNT(*) c FROM dhr_doc_map").first()["c"]
    # three-way parity: positions recomputed from the STORED text with the
    # gap analyzer UDF must equal the positional artifact exactly
    mism = spark.sql(
        """
        WITH toks AS (
          SELECT docid, pos, term FROM (
            SELECT docid, posexplode(dhr_analyze_gaps(text)) AS (pos, term)
            FROM dhr_stored
          ) WHERE term IS NOT NULL
        ),
        re AS (
          SELECT t.docid, d.term_id,
                 sort_array(collect_list(t.pos)) AS positions
          FROM toks t JOIN dhr_dictionary d USING (term)
          GROUP BY t.docid, d.term_id
        )
        SELECT COUNT(*) c FROM re
        FULL OUTER JOIN dhr_positions p USING (docid, term_id)
        WHERE re.positions IS NULL OR p.positions IS NULL
           OR re.positions != p.positions
        """
    ).first()["c"]
    assert mism == 0


def test_pure_sql_bm25_matches_searcher(spark, built):
    register_index_views(spark, built["idx"])
    got = spark.sql(BM25_SQL.format(k=K)).collect()
    want = Searcher(spark, built["idx"]).search(built["queries"], k=K).collect()

    def as_map(rows):
        m = {}
        for r in sorted(rows, key=lambda r: (r["qid"], r["rank"])):
            m.setdefault(r["qid"], []).append((r["docid"], r["rank"], r["score"]))
        return m

    g, w = as_map(got), as_map(want)
    assert set(g) == set(w)
    for qid in w:
        assert [t[:2] for t in g[qid]] == [t[:2] for t in w[qid]]
        for (_, _, sg), (_, _, sw) in zip(g[qid], w[qid]):
            assert sg == pytest.approx(sw, abs=1e-6)


def test_views_are_live_after_delete(spark, built):
    # delete one whole conversation; views must drop its docs and stats
    # must shrink (exact-stats delete), with no re-registration drift
    man0 = load_manifest(built["idx"])
    victim = spark.sql(
        "SELECT conv_id FROM dhr_doc_map ORDER BY conv_id LIMIT 1"
    ).first()["conv_id"]
    delete_docs(spark, built["idx"], match=("conv_id", [victim]))
    man = register_index_views(spark, built["idx"])
    assert man["n_docs"] < man0["n_docs"]
    for view in ("dhr_doclens", "dhr_doc_map", "dhr_forward", "dhr_stored"):
        n = spark.sql(
            f"SELECT COUNT(*) c FROM {view} l JOIN dhr_doc_map m USING (docid) "
            f"WHERE m.conv_id = '{victim}'"
        ).first()["c"]
        assert n == 0
    n_docs_view = spark.sql("SELECT COUNT(*) c FROM dhr_doclens").first()["c"]
    assert n_docs_view == man["n_docs"]
    # and the SQL BM25 statement still matches the engine post-delete
    got = spark.sql(BM25_SQL.format(k=5)).collect()
    want = Searcher(spark, built["idx"]).search(built["queries"], k=5).collect()
    gm = {(r["qid"], r["rank"]): r["docid"] for r in got}
    wm = {(r["qid"], r["rank"]): r["docid"] for r in want}
    assert gm == wm
