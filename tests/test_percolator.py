"""Percolation: standing queries over incrementally-appended indexes.

Contracts under test:
* Searcher.search_min_docid == full search restricted to docid >= W
  (exact, including docs below the chunk-local top-k inside the boundary
  chunk — the starvation case the exhaustive kernel k guards against).
* Percolator.poll returns each appended batch's hits exactly once,
  nothing from before its construction watermark, and empty frames when
  nothing was appended.
"""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from dhr_spark.index.builder import build_index
from dhr_spark.index.incremental import append_to_index
from dhr_spark.operators.wand import Searcher
from dhr_spark.streaming.percolator import Percolator

pytestmark = pytest.mark.usefixtures("spark")


def _turns(spark, lo, hi, word):
    rows = [
        (f"c{i}", 0, "user", f"alpha beta {word} t{i}", None, None)
        for i in range(lo, hi)
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp",
    )


@pytest.fixture()
def idx(spark, tmp_path):
    d = str(tmp_path / "percidx")
    build_index(
        spark, _turns(spark, 0, 40, "oldbatch"), d,
        analyzer_mode="simple", chunk_bits=5, block_size=8,
        docid_strategy="window",
    )
    return d


def test_search_min_docid_equals_filtered_full_search(spark, idx):
    s = Searcher(spark, idx)
    q = spark.createDataFrame(
        [("q1", "alpha oldbatch"), ("q2", "zzyzx")], "qid string, text string"
    )
    for wm in (0, 7, 17, 32, 39, 40):
        got = {
            (r["qid"], r["docid"]): (r["rank"], round(r["score"], 6))
            for r in s.search_min_docid(q, wm, k=100).collect()
        }
        full = s.search(q, k=100_000, prune=False)
        want_rows = (
            full.filter(F.col("docid") >= wm)
            .withColumn(
                "rank",
                F.row_number().over(
                    Window.partitionBy("qid").orderBy(
                        F.round("score", 6).desc(), F.col("docid").asc()
                    )
                ),
            )
            .collect()
        )
        want = {
            (r["qid"], r["docid"]): (r["rank"], round(r["score"], 6))
            for r in want_rows
        }
        assert got == want, f"wm={wm}"
    assert s.search_min_docid(q, 40, k=10).count() == 0
    with pytest.raises(ValueError, match="min_docid"):
        s.search_min_docid(q, -1)


def test_percolator_alerts_once_per_batch(spark, idx):
    q = spark.createDataFrame(
        [("alert", "freshterm"), ("always", "alpha")],
        "qid string, text string",
    )
    p = Percolator(spark, idx, q, k=50)
    # nothing appended yet: empty (existing corpus is below the watermark)
    assert p.poll().count() == 0

    append_to_index(spark, _turns(spark, 100, 110, "freshterm"), idx)
    hits1 = p.poll().collect()
    by_qid = {}
    for r in hits1:
        by_qid.setdefault(r["qid"], set()).add(r["docid"])
    # both standing queries fire on the batch: 10 new docs contain
    # "freshterm" AND "alpha"
    assert len(by_qid.get("alert", ())) == 10
    assert by_qid["alert"] == by_qid["always"]
    # the same batch never re-alerts
    assert p.poll().count() == 0

    # second append alerts only its own docs
    append_to_index(spark, _turns(spark, 200, 203, "freshterm"), idx)
    hits2 = {r["docid"] for r in p.poll().filter("qid = 'alert'").collect()}
    assert len(hits2) == 3 and hits2.isdisjoint(by_qid["alert"])


def test_percolator_from_start_sees_existing_corpus(spark, idx):
    q = spark.createDataFrame([("a", "oldbatch")], "qid string, text string")
    p = Percolator(spark, idx, q, k=100, from_start=True)
    assert p.poll().count() == 40
    assert p.poll().count() == 0
