"""Sketches (HLL / Count-Min) and hit-set statistics.

Contracts: HLL register tables merge associatively (shard sketches ==
whole-corpus sketch), estimates land inside the published error envelopes
on deterministic inputs, and Count-Min NEVER underestimates. Hit stats
match a driver-side recount, and the Searcher twins equal the corpus-scan
path on the same matched sets.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from dhr_spark.operators.hitstats import hit_percentiles, hit_stats
from dhr_spark.operators.sketches import (
    bloom_bits,
    bloom_contains,
    cms_counters,
    cms_lookup,
    hll_cardinality,
    hll_corrected,
    hll_merge,
    hll_registers,
)


def _values(spark, n, prefix="v"):
    return spark.range(n).select(
        F.concat(F.lit(prefix), F.col("id")).alias("val")
    )


# ------------------------------------------------------------------- HLL


def test_hll_merge_equals_whole(spark):
    df = _values(spark, 3000)
    whole = hll_registers(df, "val", p=7)
    a = hll_registers(df.filter(F.col("val").substr(-1, 1).isin("0", "2", "4")), "val", p=7)
    b = hll_registers(df.filter(~F.col("val").substr(-1, 1).isin("0", "2", "4")), "val", p=7)
    merged = hll_merge(a, b)
    lhs = sorted(map(tuple, merged.collect()))
    rhs = sorted(map(tuple, whole.collect()))
    assert lhs == rhs and lhs


def test_hll_accuracy_raw(spark):
    # n >> 2.5m: the raw estimate applies; 1.04/sqrt(256) ~ 6.5% stderr,
    # give 4 sigma on this fixed (md5-deterministic) draw
    n = 5000
    row = hll_cardinality(_values(spark, n), "val", p=8).collect()[0]
    assert row["m"] == 256
    assert row["used"] + row["zeros"] == 256
    assert abs(row["raw_est"] - n) / n < 0.26


def test_hll_corrected_small_range(spark):
    # n ~ m: raw HLL is biased high, linear counting recovers the count
    n = 100
    row = hll_cardinality(_values(spark, n), "val", p=6).collect()[0]
    est = hll_corrected(row["raw_est"], row["zeros"], p=6)
    assert est != row["raw_est"]  # LC branch actually fired (n < 2.5m)
    assert abs(est - n) / n < 0.2
    # above the LC regime the helper is the identity
    assert hll_corrected(1000.0, 0, p=6) == 1000.0


def test_hll_duplicates_do_not_move_registers(spark):
    df = _values(spark, 500)
    dup = df.unionByName(df).unionByName(df)
    a = sorted(map(tuple, hll_registers(df, "val", p=6).collect()))
    b = sorted(map(tuple, hll_registers(dup, "val", p=6).collect()))
    assert a == b


def test_hll_p_validation(spark):
    with pytest.raises(ValueError, match="p must be"):
        hll_registers(_values(spark, 10), "val", p=2)
    with pytest.raises(ValueError, match="at least one"):
        hll_merge()


def test_hll_grouped_matches_per_group_sketches(spark):
    # a grouped sketch row set == independently-built per-group sketches
    df = spark.range(1200).select(
        F.concat(F.lit("g"), F.pmod(F.col("id"), F.lit(3))).alias("grp"),
        F.concat(F.lit("v"), F.col("id")).alias("val"),
    )
    grouped = sorted(
        map(tuple, hll_cardinality(df, "val", p=6, group_cols=["grp"]).collect())
    )
    single = sorted(
        (g,) + tuple(
            hll_cardinality(df.filter(F.col("grp") == g), "val", p=6)
            .collect()[0]
        )
        for g in ("g0", "g1", "g2")
    )
    assert grouped == single and len(grouped) == 3


# ------------------------------------------------------------------- Bloom


def test_bloom_no_false_negatives_and_fp_rate(spark):
    members = _values(spark, 400, "in")
    bloom = bloom_bits(members, "val", m_bits=8192, k=4)
    # the packed table never exceeds the fixed word domain; masks positive
    rows = bloom.collect()
    assert len(rows) <= 8192 // 32
    assert all(r["bits"] > 0 for r in rows)
    got = {
        r["val"]: r["member"]
        for r in bloom_contains(bloom, members, "val", 8192, 4).collect()
    }
    assert all(got.values()) and len(got) == 400  # zero false negatives
    outside = _values(spark, 400, "out")
    fp = sum(
        r["member"]
        for r in bloom_contains(bloom, outside, "val", 8192, 4).collect()
    )
    # ~ (1 - e^{-4*400/8192})^4 ~ 0.1%; allow a generous deterministic cap
    assert fp <= 12


def test_bloom_validation(spark):
    df = _values(spark, 5)
    with pytest.raises(ValueError, match="m_bits"):
        bloom_bits(df, "val", m_bits=100)
    with pytest.raises(ValueError, match="k must"):
        bloom_contains(df, df, "val", 4096, 0)


def test_decontaminate_bloom_superset_of_exact(spark):
    from dhr_spark.operators.dedup import decontaminate, decontaminate_bloom

    docs = spark.createDataFrame(
        [
            ("d1", "alpha beta gamma delta epsilon"),
            ("d2", "the quick brown fox jumps over the dog"),
            ("d3", "no overlap here at all friends"),
            ("d4", "xy"),  # shorter than n tokens: never flagged
        ],
        "doc_id string, text string",
    )
    bench = spark.createDataFrame(
        [("b1", "beta gamma delta"), ("b2", "quick brown fox jumps")],
        "doc_id string, text string",
    )
    exact = {r["doc_id"]: r for r in decontaminate(docs, bench, n=3).collect()}
    # big filter: no false positives at this scale -> exact equality
    big = {
        r["doc_id"]: r
        for r in decontaminate_bloom(docs, bench, n=3, m_bits=65536).collect()
    }
    assert set(big) == set(exact)
    for d, r in big.items():
        assert r["n_hits"] >= exact[d]["n_hits"], d  # never under
        assert exact[d]["contaminated"] <= r["contaminated"], d
    assert big["d1"]["contaminated"] and big["d2"]["contaminated"]
    assert not exact["d4"]["contaminated"] and big["d4"]["n_hits"] == 0


# -------------------------------------------------------------- Count-Min


def test_cms_never_underestimates_and_bound(spark):
    # zipf-ish stream: value v_k appears k times, k = 1..60 (N = 1830)
    rows = spark.range(1, 61).select(
        F.concat(F.lit("t"), F.col("id")).alias("val"), F.col("id").alias("k")
    )
    stream = rows.select(
        F.explode(F.expr("sequence(1, k)")).alias("_"), "val"
    ).select("val")
    n_total = 1830
    depth, width = 4, 64
    ctr = cms_counters(stream, "val", depth=depth, width=width)
    # counter table state is bounded by the fixed key domain
    assert ctr.count() <= depth * width
    tot = {r["depth"]: r["s"] for r in ctr.groupBy("depth").agg(F.sum("count").alias("s")).collect()}
    assert tot == {d: n_total for d in range(depth)}  # each row counts everything
    est = {
        r["val"]: r["est"]
        for r in cms_lookup(ctr, rows.select("val"), "val", depth=depth, width=width).collect()
    }
    exact = {f"t{k}": k for k in range(1, 61)}
    assert set(est) == set(exact)
    for v, e in est.items():
        assert e >= exact[v]  # the CM one-sided guarantee
        assert e - exact[v] <= math.ceil(2 * math.e * n_total / width)


def test_cms_weighted_matches_pre_aggregated(spark):
    # weighting by a count column == hashing the expanded stream
    rows = spark.range(1, 31).select(
        F.concat(F.lit("w"), F.col("id")).alias("val"), F.col("id").alias("k")
    )
    stream = rows.select(F.explode(F.expr("sequence(1, k)")).alias("_"), "val").select("val")
    a = sorted(map(tuple, cms_counters(stream, "val", 4, 128).collect()))
    b = sorted(map(tuple, cms_counters(rows, "val", 4, 128, weight_col="k").collect()))
    assert a == b and a


def test_cms_validation(spark):
    with pytest.raises(ValueError, match="depth"):
        cms_counters(_values(spark, 5), "val", depth=0)


# ------------------------------------------------------------- hit stats


@pytest.fixture(scope="module")
def hits_env(spark):
    hits = spark.createDataFrame(
        [("q1", 1), ("q1", 2), ("q1", 3), ("q2", 2), ("q2", 4)],
        "qid string, docid long",
    )
    values = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 40), (4, 7), (5, 999)],
        "docid long, f long",
    )
    return hits, values


def test_hit_stats_matches_manual(spark, hits_env):
    hits, values = hits_env
    got = {r["qid"]: r for r in hit_stats(hits, values, "f").collect()}
    # q1: [10, 20, 40] — population moments
    q1 = got["q1"]
    assert (q1["n"], q1["min"], q1["max"], q1["sum"]) == (3, 10, 40, 70)
    assert q1["avg"] == pytest.approx(70 / 3)
    var = (3 * (100 + 400 + 1600) - 70 * 70) / 9
    assert q1["variance"] == pytest.approx(var)
    assert q1["std_dev"] == pytest.approx(math.sqrt(var))
    q2 = got["q2"]
    assert (q2["n"], q2["min"], q2["max"], q2["sum"]) == (2, 7, 20, 27)
    assert q2["variance"] == pytest.approx(((20 - 13.5) ** 2 + (7 - 13.5) ** 2) / 2)


def test_hit_percentiles_nearest_rank(spark, hits_env):
    hits, values = hits_env
    got = {
        (r["qid"], r["pct"]): (r["value"], r["n"])
        for r in hit_percentiles(hits, values, "f", [25, 50, 100]).collect()
    }
    # q1 ascending: [10, 20, 40]; ceil(.25*3)=1, ceil(.5*3)=2, ceil(1*3)=3
    assert got[("q1", 25)] == (10, 3)
    assert got[("q1", 50)] == (20, 3)
    assert got[("q1", 100)] == (40, 3)
    # q2 ascending: [7, 20]; ceil(.25*2)=1, ceil(.5*2)=1, ceil(1*2)=2
    assert got[("q2", 25)] == (7, 2)
    assert got[("q2", 50)] == (7, 2)
    assert got[("q2", 100)] == (20, 2)
    with pytest.raises(ValueError, match="pcts"):
        hit_percentiles(hits, values, "f", [0])


def test_searcher_result_stats_percentiles_identity(spark, tmp_path):
    """Index-backed twins equal the corpus-scan recount over the same
    matched sets (ts docvalue cast to epoch-seconds longs)."""
    from dhr_spark.data.synthetic import synth_queries, synth_transcripts
    from dhr_spark.index.builder import build_index
    from dhr_spark.operators.docids import with_docids
    from dhr_spark.operators.wand import Searcher

    idx = str(tmp_path / "hs_idx")
    tr = synth_transcripts(spark, 30)
    build_index(spark, tr, idx, chunk_bits=6, block_size=8,
                docid_strategy="window", docvalues=["ts"])
    s = Searcher(spark, idx)
    q = synth_queries(spark, 4)
    matched = s._matched_docs(q)
    dv = with_docids(tr, "window").select(
        "docid", F.col("ts").cast("long").alias("ts")
    )
    a = sorted(map(tuple, s.result_stats(q, "ts").collect()))
    b = sorted(map(tuple, hit_stats(matched, dv, "ts").collect()))
    assert a == b and a
    c = sorted(map(tuple, s.result_percentiles(q, "ts", [50, 95]).collect()))
    d = sorted(map(tuple, hit_percentiles(matched, dv, "ts", [50, 95]).collect()))
    assert c == d and c
    # ES cardinality agg: grouped HLL over the same matched sets, and the
    # estimate tracks the exact per-qid distinct count at p=8 (~6.5% se)
    card = {r["qid"]: r for r in s.result_cardinality(q, "ts", p=8).collect()}
    exact = {
        r["qid"]: r["n"]
        for r in matched.join(dv, "docid")
        .groupBy("qid")
        .agg(F.count_distinct("ts").alias("n"))
        .collect()
    }
    assert set(card) == set(exact) and card
    for qid, n in exact.items():
        est = hll_corrected(card[qid]["raw_est"], card[qid]["zeros"], p=8)
        assert abs(est - n) / max(n, 1) < 0.3, (qid, est, n)


# ------------------------------------------------------------------ KMV


def test_kmv_merge_equals_whole_and_partition_invariance(spark):
    from dhr_spark.operators.sketches import kmv_sketch

    df = _values(spark, 3000)
    whole = kmv_sketch(df, "val", k=32).collect()[0]["kmv"]
    re = kmv_sketch(df.repartition(17), "val", k=32).collect()[0]["kmv"]
    assert list(whole) == list(re) and len(whole) == 32
    # shard sketches merged == whole-corpus sketch: union arrays, cut k
    a = kmv_sketch(df.filter(F.col("val") < "v1"), "val", k=32).collect()[0]["kmv"]
    b = kmv_sketch(df.filter(F.col("val") >= "v1"), "val", k=32).collect()[0]["kmv"]
    merged = sorted(set(a) | set(b))[:32]
    assert merged == sorted(whole)


def test_kmv_estimate_exact_when_unsaturated_and_close_when_not(spark):
    from dhr_spark.operators.sketches import kmv_estimate, kmv_sketch

    small = _values(spark, 20)
    r = kmv_estimate(kmv_sketch(small, "val", k=64), k=64).collect()[0]
    assert (r["n_in_sketch"], r["est"]) == (20, 20)
    big = _values(spark, 5000)
    r = kmv_estimate(kmv_sketch(big, "val", k=256), k=256).collect()[0]
    assert r["n_in_sketch"] == 256
    assert abs(r["est"] - 5000) / 5000 < 0.25, r["est"]


def test_kmv_jaccard_tracks_true_overlap(spark):
    from dhr_spark.operators.sketches import kmv_jaccard, kmv_sketch

    # A = v0..v999, B = v500..v1499 -> true J = 500/1500 = 1/3
    a_df = _values(spark, 1000)
    b_df = spark.createDataFrame(
        [(f"v{i}",) for i in range(500, 1500)], "val string"
    )
    a = kmv_sketch(a_df, "val", k=128)
    b = kmv_sketch(b_df, "val", k=128)
    r = kmv_jaccard(a, b, k=128).collect()[0]
    assert r["n_union_sketch"] == 128
    assert abs(r["jaccard"] - 1 / 3) < 0.15, r["jaccard"]
    # identical sets -> exactly 1.0
    r2 = kmv_jaccard(a, kmv_sketch(a_df, "val", k=128), k=128).collect()[0]
    assert r2["jaccard"] == 1.0


def test_kmv_k_guard(spark):
    from dhr_spark.operators.sketches import kmv_sketch

    with pytest.raises(ValueError, match="k must be"):
        kmv_sketch(_values(spark, 5), "val", k=1)


def test_hit_correlation_and_index_twin(spark, tmp_path):
    from dhr_spark.index.builder import build_index_from_docs
    from dhr_spark.operators.hitstats import hit_correlation
    from dhr_spark.operators.wand import Searcher

    docs = spark.createDataFrame(
        [
            (0, "alpha beta", 10, 100),
            (1, "alpha gamma", 20, 210),
            (2, "alpha beta gamma", 30, 290),
            (3, "delta", 40, 400),
            (4, "alpha", 50, 505),
        ],
        "docid long, text string, xa long, xb long",
    )
    d = str(tmp_path / "corr_idx")
    build_index_from_docs(
        spark, docs, d, analyzer_mode="simple", chunk_bits=3,
        doc_map_df=docs.select("docid", "xa", "xb"), docvalues=["xa", "xb"],
    )
    q = spark.createDataFrame(
        [("q1", "alpha"), ("q2", "beta gamma"), ("q3", "delta")],
        "qid string, text string",
    )
    s = Searcher(spark, d)
    got = {r["qid"]: (r["n"], r["corr"]) for r in
           s.result_correlation(q, "xa", "xb").collect()}
    # manual twin over the same match sets
    hits = spark.createDataFrame(
        [("q1", i) for i in (0, 1, 2, 4)]
        + [("q2", i) for i in (0, 1, 2)]
        + [("q3", 3)],
        "qid string, docid long",
    )
    want = {r["qid"]: (r["n"], r["corr"]) for r in
            hit_correlation(hits, docs, "xa", "xb").collect()}
    assert got == want
    # near-linear (xb ~ 10*xa) -> corr close to 1; n<2 -> NULL
    assert got["q1"][1] is not None and got["q1"][1] > 0.99
    assert got["q3"] == (1, None)
    # zero variance -> NULL
    zv = spark.createDataFrame(
        [(0, 1, 5), (1, 1, 9)], "docid long, xa long, xb long"
    )
    h2 = spark.createDataFrame([("q", 0), ("q", 1)], "qid string, docid long")
    r = hit_correlation(h2, zv, "xa", "xb").collect()[0]
    assert r["corr"] is None and r["n"] == 2
    # same-field correlation == 1.0 exactly (num == denominator squared)
    r2 = s.result_correlation(q.filter(F.col("qid") == "q1"), "xa", "xa").collect()[0]
    assert r2["corr"] == 1.0


def test_hit_histogram_buckets_and_guards(spark, hits_env):
    from dhr_spark.operators.hitstats import hit_histogram

    hits, values = hits_env
    got = {
        (r["qid"], r["bucket"]): r["n"]
        for r in hit_histogram(hits, values, "f", 15, offset=5).collect()
    }
    # q1 values [10, 20, 40] -> buckets 5, 20, 35; q2 [20, 7] -> 20, 5
    assert got == {
        ("q1", 5): 1, ("q1", 20): 1, ("q1", 35): 1,
        ("q2", 20): 1, ("q2", 5): 1,
    }
    # negative values floor correctly (ES Math.floorDiv semantics):
    # v=-7, interval=15, offset=5 -> floor(-12/15)=-1 -> bucket -10
    neg = spark.createDataFrame([(1, -7)], "docid long, f long")
    one = spark.createDataFrame([("q", 1)], "qid string, docid long")
    assert hit_histogram(one, neg, "f", 15, offset=5).collect()[0][
        "bucket"
    ] == -10
    with pytest.raises(ValueError, match="interval"):
        hit_histogram(hits, values, "f", 0)
    with pytest.raises(ValueError, match="offset"):
        hit_histogram(hits, values, "f", 15, offset=15)


def test_searcher_result_histogram_identity(spark, tmp_path):
    """Index-backed date-histogram (epoch-seconds ts, daily buckets) equals
    a corpus-scan recount over the same matched sets."""
    from pyspark.sql import functions as F

    from dhr_spark.data.synthetic import synth_queries, synth_transcripts
    from dhr_spark.index.builder import build_index
    from dhr_spark.operators.docids import with_docids
    from dhr_spark.operators.hitstats import hit_histogram
    from dhr_spark.operators.wand import Searcher

    idx = str(tmp_path / "hist_idx")
    tr = synth_transcripts(spark, 20)
    build_index(
        spark, tr, idx, chunk_bits=6, block_size=16,
        docvalues=["ts"], docid_strategy="window",
    )
    sr = Searcher(spark, idx)
    q = synth_queries(spark, 5)
    day = 86_400
    fast = {
        (r["qid"], r["bucket"]): r["n"]
        for r in sr.result_histogram(q, "ts", interval=day).collect()
    }
    docs = with_docids(tr)
    vals = docs.select(
        "docid", F.col("ts").cast("long").alias("ts")
    )
    slow = {
        (r["qid"], r["bucket"]): r["n"]
        for r in hit_histogram(
            sr._matched_docs(q), vals, "ts", day
        ).collect()
    }
    assert fast == slow and fast


# ------------------------------------------------------- composite agg


def test_hit_composite_pages_and_cursor(spark):
    """ES composite aggregation: buckets enumerate in composite-key order,
    size cuts the page, the after cursor resumes STRICTLY past its key,
    and paging walks the full bucket space with no overlap or gap."""
    from dhr_spark.operators.hitstats import hit_composite

    hits = spark.createDataFrame(
        [("q1", d) for d in range(1, 7)] + [("q2", 1), ("q2", 6)],
        "qid string, docid long",
    )
    values = spark.createDataFrame(
        [
            (1, "a", 10), (2, "a", 17), (3, "a", 31),
            (4, "b", 5), (5, "b", 12), (6, None, 99),
        ],
        "docid long, cat string, f long",
    )
    srcs = [("cat", "terms", "cat"), ("bkt", "histogram", ("f", 15))]
    full = hit_composite(hits, values, srcs, size=100)
    rows = [
        (r["cat"], r["bkt"], r["n"])
        for r in full.filter(F.col("qid") == "q1")
        .orderBy("cat", "bkt").collect()
    ]
    # docid 6 (NULL cat) is skipped (missing_bucket=false); buckets of 15:
    # a:[10,17,31] -> 0(x1),15(x1),30(x1); b:[5,12] -> 0(x2)
    assert rows == [("a", 0, 1), ("a", 15, 1), ("a", 30, 1), ("b", 0, 2)]
    page1 = hit_composite(hits, values, srcs, size=2)
    p1 = [
        (r["cat"], r["bkt"])
        for r in page1.filter(F.col("qid") == "q1")
        .orderBy("cat", "bkt").collect()
    ]
    assert p1 == [("a", 0), ("a", 15)]
    page2 = hit_composite(
        hits, values, srcs, size=2, after={"q1": ("a", 15)}
    )
    p2 = [
        (r["cat"], r["bkt"])
        for r in page2.filter(F.col("qid") == "q1")
        .orderBy("cat", "bkt").collect()
    ]
    assert p2 == [("a", 30), ("b", 0)]
    # a cursor for q1 leaves q2 (no cursor) starting at its beginning
    q2rows = page2.filter(F.col("qid") == "q2").count()
    assert q2rows == 1  # docid 6 skipped (NULL cat); only docid 1 buckets


def test_hit_composite_guards(spark):
    from dhr_spark.operators.hitstats import hit_composite

    hits = spark.createDataFrame([("q", 1)], "qid string, docid long")
    values = spark.createDataFrame([(1, "a", 3)], "docid long, c string, f long")
    with pytest.raises(ValueError, match="at least one"):
        hit_composite(hits, values, [], 5)
    with pytest.raises(ValueError, match="duplicate"):
        hit_composite(
            hits, values,
            [("x", "terms", "c"), ("x", "histogram", ("f", 5))], 5,
        )
    with pytest.raises(ValueError, match="size"):
        hit_composite(hits, values, [("x", "terms", "c")], 0)
    with pytest.raises(ValueError, match="one per source"):
        hit_composite(
            hits, values, [("x", "terms", "c")], 5, after={"q": ("a", 1)}
        )
    with pytest.raises(ValueError, match="unknown composite source"):
        hit_composite(hits, values, [("x", "range", "c")], 5)
    with pytest.raises(ValueError, match="interval"):
        hit_composite(hits, values, [("x", "histogram", ("f", 0))], 5)


def test_searcher_result_composite_identity(spark, tmp_path):
    """Index-backed composite (docvalues role + ts daily histogram) equals
    the corpus-scan operator over the same matched sets, cursor included."""
    from dhr_spark.data.synthetic import synth_queries, synth_transcripts
    from dhr_spark.index.builder import build_index
    from dhr_spark.operators.docids import with_docids
    from dhr_spark.operators.hitstats import hit_composite
    from dhr_spark.operators.wand import Searcher

    idx = str(tmp_path / "comp_idx")
    tr = synth_transcripts(spark, 20)
    build_index(
        spark, tr, idx, chunk_bits=6, block_size=16,
        docvalues=["role", "ts"], docid_strategy="window",
    )
    sr = Searcher(spark, idx)
    q = synth_queries(spark, 5)
    srcs = [("role", "terms", "role"), ("day", "histogram", ("ts", 86_400))]

    def as_set(df):
        return {
            (r["qid"], r["role"], r["day"], r["n"]) for r in df.collect()
        }

    vals = with_docids(tr).select(
        "docid", "role", F.col("ts").cast("long").alias("ts")
    )
    for after in (None, {"q0": ("user", 0)}):
        fast = as_set(sr.result_composite(q, srcs, size=3, after=after))
        slow = as_set(
            hit_composite(sr._matched_docs(q), vals, srcs, 3, after)
        )
        assert fast == slow and fast


def test_histogram_pipeline_hand_values(spark):
    """cumulative_sum / derivative / moving_avg over hand buckets: ES
    semantics — no derivative on the first bucket, trailing simple moving
    average over what exists."""
    from dhr_spark.operators.hitstats import histogram_pipeline

    b = spark.createDataFrame(
        [("q", 0, 4), ("q", 10, 1), ("q", 30, 7), ("q2", 5, 2)],
        "qid string, bucket long, n long",
    )
    got = {
        (r["qid"], r["bucket"]): (r["cum_n"], r["derivative"], r["moving_avg"])
        for r in histogram_pipeline(b, window=2).collect()
    }
    assert got[("q", 0)] == (4, None, 4.0)
    assert got[("q", 10)] == (5, -3, 2.5)
    assert got[("q", 30)] == (12, 6, 4.0)
    assert got[("q2", 5)] == (2, None, 2.0)
    import pytest as _pt

    with _pt.raises(ValueError, match="window"):
        histogram_pipeline(b, window=0)


def test_searcher_histogram_pipeline_consistent(spark, tmp_path):
    """Index-backed pipeline rows recompute exactly from the histogram."""
    from dhr_spark.data.synthetic import synth_queries, synth_transcripts
    from dhr_spark.index.builder import build_index
    from dhr_spark.operators.hitstats import histogram_pipeline
    from dhr_spark.operators.wand import Searcher

    idx = str(tmp_path / "pipe_idx")
    build_index(
        spark, synth_transcripts(spark, 15), idx, chunk_bits=6,
        block_size=16, docvalues=["ts"], docid_strategy="window",
    )
    s = Searcher(spark, idx)
    q = synth_queries(spark, 4)
    fast = {
        (r["qid"], r["bucket"]): (r["cum_n"], r["derivative"], r["moving_avg"])
        for r in s.result_histogram_pipeline(
            q, "ts", interval=86_400
        ).collect()
    }
    slow = {
        (r["qid"], r["bucket"]): (r["cum_n"], r["derivative"], r["moving_avg"])
        for r in histogram_pipeline(
            s.result_histogram(q, "ts", interval=86_400)
        ).collect()
    }
    assert fast == slow and fast


def test_hit_adjacency_hand_counts(spark):
    from dhr_spark.operators.hitstats import hit_adjacency

    hits = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", 3), ("b", 2), ("b", 3), ("c", 9)],
        "qid string, docid long",
    )
    got = {
        (r["qid_a"], r["qid_b"]): r["n"]
        for r in hit_adjacency(hits).collect()
    }
    # diagonal = plain counts; ab intersection = {2,3}; empty pairs absent
    assert got == {
        ("a", "a"): 3, ("b", "b"): 2, ("c", "c"): 1, ("a", "b"): 2,
    }


# ------------------------------------------------- quantile (bottom-k) sketch


def _qs_rows(spark, n=500):
    # deterministic skewed values: v = (id*id) % 997 keyed by a string id
    return spark.range(n).select(
        F.concat(F.lit("k"), F.col("id")).alias("key"),
        ((F.col("id") * F.col("id")) % 997).alias("v"),
        (F.col("id") % 2 == 0).cast("string").alias("grp"),
    )


def test_quantile_sketch_unsaturated_is_exact(spark):
    from dhr_spark.operators.sketches import quantile_estimate, quantile_sketch

    df = _qs_rows(spark, 200)
    sk = quantile_sketch(df, "v", "key", k=1024)  # k > n: sample == population
    est = {
        r["pct"]: (r["n_in_sample"], r["est"])
        for r in quantile_estimate(sk, (0, 50, 100)).collect()
    }
    vals = sorted(r["v"] for r in df.collect())
    n = len(vals)
    assert est[0] == (n, vals[0])
    assert est[50] == (n, vals[(50 * (n - 1)) // 100])
    assert est[100] == (n, vals[n - 1])


def test_quantile_sketch_mergeable(spark):
    # sketch(A ∪ B) == cut-k(merge(sketch(A), sketch(B))): bottom-k by row
    # hash is closed under union, the property the final groupBy relies on
    from dhr_spark.operators.sketches import quantile_sketch

    df = _qs_rows(spark, 600)
    whole = quantile_sketch(df, "v", "key", k=64).collect()[0]["sample"]
    a = quantile_sketch(df.filter(F.col("grp") == "true"), "v", "key", k=64)
    b = quantile_sketch(df.filter(F.col("grp") == "false"), "v", "key", k=64)
    merged = sorted(
        [tuple(x) for x in a.collect()[0]["sample"]]
        + [tuple(x) for x in b.collect()[0]["sample"]]
    )[:64]
    assert [tuple(x) for x in whole] == merged


def test_quantile_sketch_grouped_and_partition_invariant(spark):
    from dhr_spark.operators.sketches import quantile_sketch

    df = _qs_rows(spark, 400)
    one = quantile_sketch(df.coalesce(1), "v", "key", k=32, group_cols=("grp",))
    many = quantile_sketch(df.repartition(13), "v", "key", k=32, group_cols=("grp",))
    lhs = {r["grp"]: [tuple(x) for x in r["sample"]] for r in one.collect()}
    rhs = {r["grp"]: [tuple(x) for x in r["sample"]] for r in many.collect()}
    assert lhs == rhs and set(lhs) == {"true", "false"}
    assert all(len(s) == 32 for s in lhs.values())
    # samples are sorted by (h, v) and h is the portable tokhash60
    for s in lhs.values():
        assert s == sorted(s)


def test_quantile_sketch_int_group_col_keeps_type(spark):
    # non-string group columns must survive the partial pass with their
    # input type (an int category must not be coerced to string)
    from pyspark.sql.types import IntegerType

    from dhr_spark.operators.sketches import quantile_sketch

    df = _qs_rows(spark, 200).withColumn(
        "cat", (F.col("v") % 3).cast("int")
    )
    sk = quantile_sketch(df, "v", "key", k=16, group_cols=("cat",))
    assert isinstance(sk.schema["cat"].dataType, IntegerType)
    rows = sk.collect()
    assert {r["cat"] for r in rows} == {0, 1, 2}
    # same merge result as the equivalent stringified grouping
    via_str = quantile_sketch(
        df.withColumn("cat", F.col("cat").cast("string")),
        "v", "key", k=16, group_cols=("cat",),
    )
    lhs = {str(r["cat"]): [tuple(x) for x in r["sample"]] for r in rows}
    rhs = {r["cat"]: [tuple(x) for x in r["sample"]] for r in via_str.collect()}
    assert lhs == rhs


def test_quantile_estimate_accuracy_and_guards(spark):
    from dhr_spark.operators.sketches import quantile_estimate, quantile_sketch

    df = _qs_rows(spark, 2000)
    sk = quantile_sketch(df, "v", "key", k=256)
    est = {r["pct"]: r["est"] for r in quantile_estimate(sk, (50,)).collect()}
    vals = sorted(r["v"] for r in df.collect())
    true_med = vals[(len(vals) - 1) // 2]
    # uniform 256-sample median: generous 4-sigma band on the value scale
    assert abs(est[50] - true_med) <= 997 * 0.25

    with pytest.raises(ValueError):
        quantile_sketch(df, "v", "key", k=1)
    with pytest.raises(ValueError):
        quantile_estimate(sk, (101,))


def test_quantile_rank_exact_when_unsaturated(spark):
    from dhr_spark.operators.sketches import quantile_rank, quantile_sketch

    df = _qs_rows(spark, 300)
    sk = quantile_sketch(df, "v", "key", k=1024)  # unsaturated: exact
    vals = sorted(r["v"] for r in df.collect())
    got = {
        r["val"]: (r["n_in_sample"], r["n_le"], r["pct_rank"])
        for r in quantile_rank(sk, (0, 500, 10_000)).collect()
    }
    n = len(vals)
    for probe in (0, 500, 10_000):
        n_le = sum(1 for v in vals if v <= probe)
        assert got[probe] == (n, n_le, 100.0 * n_le / n)
    # below-min probe ranks 0 only if no zero values; above-max is 100
    assert got[10_000][2] == 100.0

    import pytest as _pt

    with _pt.raises(ValueError, match="non-empty"):
        quantile_rank(sk, ())


def test_quantile_rank_grouped(spark):
    from dhr_spark.operators.sketches import quantile_rank, quantile_sketch

    df = _qs_rows(spark, 200)
    sk = quantile_sketch(df, "v", "key", k=64, group_cols=("grp",))
    rows = quantile_rank(sk, (100,)).collect()
    assert {r["grp"] for r in rows} == {"true", "false"}
    for r in rows:
        assert r["n_in_sample"] == 64 and 0 <= r["n_le"] <= 64
        assert r["pct_rank"] == 100.0 * r["n_le"] / r["n_in_sample"]
