"""Federated multi-index search (operators/federate.py): exact global BM25
over sharded indexes — score-identical to a single index built over the
union corpus — plus guards and k1/b override propagation."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dhr_spark.data.synthetic import synth_queries, synth_transcripts
from dhr_spark.index.builder import build_index
from dhr_spark.operators.federate import MultiSearcher
from dhr_spark.operators.wand import Searcher

CHUNK_BITS, BLOCK = 7, 16


def _batch(spark, n, seed, prefix):
    return synth_transcripts(spark, n, seed=seed).withColumn(
        "conv_id", F.concat(F.lit(prefix), F.col("conv_id"))
    )


@pytest.fixture(scope="module")
def sharded(spark, tmp_path_factory):
    """Three shard indexes (disjoint corpora) + one union index."""
    root = tmp_path_factory.mktemp("fed")
    parts = [
        _batch(spark, 14, 42, "a-"),
        _batch(spark, 10, 91, "b-"),
        _batch(spark, 7, 77, "c-"),
    ]
    dirs = []
    for i, p in enumerate(parts):
        d = str(root / f"shard{i}")
        build_index(spark, p, d, chunk_bits=CHUNK_BITS, block_size=BLOCK)
        dirs.append(d)
    union = parts[0]
    for p in parts[1:]:
        union = union.unionByName(p)
    full = str(root / "full")
    build_index(spark, union, full, chunk_bits=CHUNK_BITS, block_size=BLOCK)
    return dict(dirs=dirs, full=full)


@pytest.fixture(scope="module")
def queries(spark):
    return synth_queries(spark, n_queries=12)


def _by_turn(spark, res, dirs_or_full, fed: bool):
    """{(qid, conv_id, turn_idx): round6 score} — docid/shard independent."""
    if fed:
        maps = []
        for i, d in enumerate(dirs_or_full):
            dm = spark.read.parquet(os.path.join(d, "doc_map")).withColumn(
                "index_id", F.lit(i)
            )
            maps.append(dm)
        dm = maps[0]
        for m in maps[1:]:
            dm = dm.unionByName(m)
        joined = res.join(dm, ["index_id", "docid"])
    else:
        dm = spark.read.parquet(os.path.join(dirs_or_full, "doc_map"))
        joined = res.join(dm, "docid")
    return {
        (r["qid"], r["conv_id"], r["turn_idx"]): round(r["score"], 6)
        for r in joined.collect()
    }


def test_federated_equals_union_index(spark, sharded, queries):
    ms = MultiSearcher(spark, sharded["dirs"])
    fed = _by_turn(
        spark, ms.search(queries, k=100_000), sharded["dirs"], fed=True
    )
    single = _by_turn(
        spark,
        Searcher(spark, sharded["full"]).search(queries, k=100_000),
        sharded["full"],
        fed=False,
    )
    assert fed == single
    assert ms.n_docs == sum(1 for _ in single) or ms.n_docs > 0  # sanity


def test_federated_topk_ranking(spark, sharded, queries):
    """At small k the global ranking (scores by rank) matches the union
    index; tie-breaks may reorder equal-score rows across shards."""
    ms = MultiSearcher(spark, sharded["dirs"])
    fed = ms.search(queries, k=10).collect()
    single = Searcher(spark, sharded["full"]).search(queries, k=10).collect()

    def seq(rows):
        m = {}
        for r in sorted(rows, key=lambda r: (r["qid"], r["rank"])):
            m.setdefault(r["qid"], []).append(round(r["score"], 6))
        return m

    assert seq(fed) == seq(single)


def test_federated_guards(spark, sharded, tmp_path, queries):
    with pytest.raises(ValueError, match="at least one"):
        MultiSearcher(spark, [])
    with pytest.raises(FileNotFoundError):
        MultiSearcher(spark, [str(tmp_path / "nope")])
    # analyzer mismatch refused
    other = str(tmp_path / "simple_idx")
    build_index(spark, _batch(spark, 5, 11, "x-"), other,
                analyzer_mode="simple", chunk_bits=CHUNK_BITS,
                block_size=BLOCK)
    with pytest.raises(ValueError, match="analyzer_mode"):
        MultiSearcher(spark, [sharded["dirs"][0], other])


def test_federated_k1_b_override(spark, sharded, queries):
    """k1/b overrides propagate to every member and match the overridden
    union-index searcher exactly."""
    ms = MultiSearcher(spark, sharded["dirs"], k1=1.2, b=0.75)
    fed = _by_turn(
        spark, ms.search(queries, k=100_000), sharded["dirs"], fed=True
    )
    single = _by_turn(
        spark,
        Searcher(spark, sharded["full"], k1=1.2, b=0.75).search(
            queries, k=100_000
        ),
        sharded["full"],
        fed=False,
    )
    assert fed == single


def test_federated_count_sums_shards(spark, sharded, queries):
    ms = MultiSearcher(spark, sharded["dirs"])
    full = Searcher(spark, sharded["full"])
    got = {r["qid"]: r["n"] for r in ms.count(queries).collect()}
    exp = {r["qid"]: r["n"] for r in full.count(queries).collect()}
    assert got == exp and got


def test_federated_page_walk_reconstructs_search(spark, sharded, queries):
    """searchAfter across shards: walking size-4 pages reproduces the
    federated search(k=12) ranking exactly, cursors carrying index_id."""
    ms = MultiSearcher(spark, sharded["dirs"])
    k, size = 12, 4
    want = {}
    for r in ms.search(queries, k=k).collect():
        want.setdefault(r["qid"], []).append(
            (r["rank"], r["index_id"], r["docid"], r["score"])
        )
    got: dict[str, list] = {q: [] for q in want}
    cursors: dict[str, tuple[float, int, int]] = {}
    qdf = queries
    for page in range(k // size):
        res = (
            ms.search(qdf, k=size)
            if page == 0
            else ms.search_after(qdf, cursors, size=size)
        )
        rows = res.collect()
        if not rows:
            break
        last: dict[str, tuple[float, int, int]] = {}
        for r in sorted(rows, key=lambda r: (r["qid"], r["rank"])):
            got[r["qid"]].append(
                (page * size + r["rank"], r["index_id"], r["docid"],
                 r["score"])
            )
            last[r["qid"]] = (r["score"], r["index_id"], r["docid"])
        cursors = last
        qdf = queries.filter(F.col("qid").isin(list(last.keys())))
        if not last:
            break
    assert got == want


def test_federated_filtered_equals_union_index(spark, sharded, queries):
    """search_filtered across shards == the union-corpus index's filtered
    search — full-depth sets, same docvalues predicate on the base
    turn_idx doc_map column."""
    ms = MultiSearcher(spark, sharded["dirs"])
    lo, hi = 2, 9
    fed = _by_turn(
        spark,
        ms.search_filtered(queries, "turn_idx", lo=lo, hi=hi, k=100_000),
        sharded["dirs"],
        fed=True,
    )
    single = _by_turn(
        spark,
        Searcher(spark, sharded["full"]).search_filtered(
            queries, "turn_idx", lo=lo, hi=hi, k=100_000
        ),
        sharded["full"],
        fed=False,
    )
    assert fed and fed == single
    assert all(lo <= t <= hi for (_, _, t) in fed)


def test_federated_qld_equals_union_index(spark, sharded, queries):
    """QLD federates exactly like BM25: merged ctf/total_dl make every
    shard score under the global collection LM, so the federated result is
    score-identical to search_qld on the union-corpus index."""
    ms = MultiSearcher(spark, sharded["dirs"])
    fed = _by_turn(
        spark, ms.search_qld(queries, k=100_000), sharded["dirs"], fed=True
    )
    single = _by_turn(
        spark,
        Searcher(spark, sharded["full"]).search_qld(queries, k=100_000),
        sharded["full"],
        fed=False,
    )
    assert fed == single and fed


def test_federated_qld_legacy_member_raises(spark, sharded, queries,
                                            tmp_path):
    """A member whose dictionary predates the ctf column blocks federated
    QLD with a clear error (BM25 federation still works)."""
    import shutil

    legacy = str(tmp_path / "legacy_shard")
    shutil.copytree(sharded["dirs"][0], legacy)
    td = spark.read.parquet(f"{legacy}/term_dict").drop("ctf").toPandas()
    shutil.rmtree(f"{legacy}/term_dict")
    spark.createDataFrame(td).write.parquet(f"{legacy}/term_dict")
    ms = MultiSearcher(spark, [legacy, sharded["dirs"][1]])
    assert ms.search(queries, k=5).count() > 0  # BM25 unaffected
    with pytest.raises(ValueError, match="ctf"):
        ms.search_qld(queries, k=5)


def test_federated_lmjm_equals_union_index(spark, sharded, queries):
    ms = MultiSearcher(spark, sharded["dirs"])
    fed = _by_turn(
        spark, ms.search_lmjm(queries, k=100_000, lam=0.7),
        sharded["dirs"], fed=True,
    )
    single = _by_turn(
        spark,
        Searcher(spark, sharded["full"]).search_lmjm(
            queries, k=100_000, lam=0.7
        ),
        sharded["full"],
        fed=False,
    )
    assert fed == single and fed


def test_federated_f2exp_equals_union_index(spark, sharded, queries):
    """F2EXP federates through merged df + global n_docs: the per-match
    weight depends only on (tf, dl, global stats), so the federated result
    is score-identical to search_f2exp on the union-corpus index."""
    ms = MultiSearcher(spark, sharded["dirs"])
    fed = _by_turn(
        spark, ms.search_f2exp(queries, k=100_000), sharded["dirs"], fed=True
    )
    single = _by_turn(
        spark,
        Searcher(spark, sharded["full"]).search_f2exp(queries, k=100_000),
        sharded["full"],
        fed=False,
    )
    assert fed == single and fed


def test_federated_f2log_equals_union_index(spark, sharded, queries):
    """F2LOG federates through the same merged df + global n_docs override
    as F2EXP — only the idf shape differs, so the identity argument holds
    unchanged."""
    ms = MultiSearcher(spark, sharded["dirs"])
    fed = _by_turn(
        spark, ms.search_f2log(queries, k=100_000), sharded["dirs"], fed=True
    )
    single = _by_turn(
        spark,
        Searcher(spark, sharded["full"]).search_f2log(queries, k=100_000),
        sharded["full"],
        fed=False,
    )
    assert fed == single and fed


def test_federated_tfidf_equals_union_index(spark, sharded, queries):
    """ClassicSimilarity federates through the same merged df + global
    n_docs override as the axiomatic family — the idf² stat is df-derived,
    so the union-index identity argument holds unchanged."""
    ms = MultiSearcher(spark, sharded["dirs"])
    fed = _by_turn(
        spark, ms.search_tfidf(queries, k=100_000), sharded["dirs"], fed=True
    )
    single = _by_turn(
        spark,
        Searcher(spark, sharded["full"]).search_tfidf(queries, k=100_000),
        sharded["full"],
        fed=False,
    )
    assert fed == single and fed


def test_federated_inl2_equals_union_index(spark, sharded, queries):
    """DFR InL2 federates through the same merged df + global n_docs
    override as the axiomatic family — the log2((N+1)/(df+0.5)) stat is
    df-derived, so the union-index identity argument holds unchanged."""
    ms = MultiSearcher(spark, sharded["dirs"])
    fed = _by_turn(
        spark, ms.search_inl2(queries, k=100_000), sharded["dirs"], fed=True
    )
    single = _by_turn(
        spark,
        Searcher(spark, sharded["full"]).search_inl2(queries, k=100_000),
        sharded["full"],
        fed=False,
    )
    assert fed == single and fed


def test_federated_spl_equals_union_index(spark, sharded, queries):
    """SPL federates through the merged ctf + global n_docs override — the
    QLD/LMJM collection-LM contract with the per-document denominator; the
    λ→1 limit branch fires identically (same merged λ at every member)."""
    ms = MultiSearcher(spark, sharded["dirs"])
    fed = _by_turn(
        spark, ms.search_spl(queries, k=100_000), sharded["dirs"], fed=True
    )
    single = _by_turn(
        spark,
        Searcher(spark, sharded["full"]).search_spl(queries, k=100_000),
        sharded["full"],
        fed=False,
    )
    assert fed == single and fed


def test_federated_dph_equals_union_index(spark, sharded, queries):
    """DPH federates through the same merged ctf + global n_docs override
    as SPL (λ = ctf/N) plus merged avgdl — parameter-free, so the
    federation has no knob to disagree on."""
    ms = MultiSearcher(spark, sharded["dirs"])
    fed = _by_turn(
        spark, ms.search_dph(queries, k=100_000), sharded["dirs"], fed=True
    )
    single = _by_turn(
        spark,
        Searcher(spark, sharded["full"]).search_dph(queries, k=100_000),
        sharded["full"],
        fed=False,
    )
    assert fed == single and fed


def test_federated_boosted_and_recency_equal_union_index(spark, sharded, queries):
    """FunctionScore federates exactly: per-member exhaustive boosted sets
    under merged global relevance stats == union-corpus index, for both the
    saturation prior and the recency half-life decay (base doc_map column
    turn_idx doubles as the docvalue)."""
    ms = MultiSearcher(spark, sharded["dirs"])
    sr = Searcher(spark, sharded["full"])
    legs = [
        ("boost",
         ms.search_boosted(queries, "turn_idx", scale=5.0, k=100_000),
         sr.search_boosted(queries, "turn_idx", scale=5.0, k=100_000)),
        ("recency",
         ms.search_recency(queries, "turn_idx", now=1000, half_life_s=50,
                           k=100_000),
         sr.search_recency(queries, "turn_idx", now=1000, half_life_s=50,
                           k=100_000)),
    ]
    for name, fed_res, single_res in legs:
        fed = _by_turn(spark, fed_res, sharded["dirs"], fed=True)
        single = _by_turn(spark, single_res, sharded["full"], fed=False)
        assert fed == single, name


# -------------------------------------------------------- CORI selection


def test_cori_rank_shards_shape_and_sanity(spark, sharded, queries):
    ms = MultiSearcher(spark, sharded["dirs"])
    ranks = ms.rank_shards(queries)
    rows = ranks.collect()
    assert rows, "no shard rankings produced"
    by_q = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append(r)
    n = len(sharded["dirs"])
    for qid, rs in by_q.items():
        assert len(rs) == n  # every member ranked for every live query
        assert sorted(r["rank"] for r in rs) == list(range(1, n + 1))
        # belief order matches the emitted rank order
        by_belief = sorted(rs, key=lambda r: (-r["belief"], r["index_id"]))
        assert [r["rank"] for r in by_belief] == list(range(1, n + 1))
        for r in rs:
            assert 0.4 <= r["belief"] <= 1.0  # b floor, beliefs bounded


def test_cori_belief_hand_computed(spark, tmp_path):
    import math

    a = spark.createDataFrame(
        [(0, "apple banana"), (1, "apple cherry")], "docid long, text string"
    )
    b_ = spark.createDataFrame(
        [(2, "apple apple durian")], "docid long, text string"
    )
    da, db = str(tmp_path / "a"), str(tmp_path / "b")
    from dhr_spark.index.builder import build_index_from_docs

    build_index_from_docs(spark, a, da, analyzer_mode="simple", chunk_bits=4)
    build_index_from_docs(spark, b_, db, analyzer_mode="simple", chunk_bits=4)
    ms = MultiSearcher(spark, [da, db])
    q = spark.createDataFrame([("q", "apple banana")], "qid string, text string")
    got = {
        r["index_id"]: r["belief"] for r in ms.rank_shards(q).collect()
    }
    # replicate: cw_a = 4 tokens, cw_b = 3; avg 3.5; cf(apple)=2, cf(banana)=1
    cws, n_c = [4, 3], 2
    avg = 3.5
    dfs = [{"apple": 2, "banana": 1}, {"apple": 1}]
    exp = {}
    for i in range(2):
        tot = 0
        for t in ["apple", "banana"]:
            df_i = dfs[i].get(t, 0)
            tval = df_i / (df_i + 50.0 + 150.0 * cws[i] / avg)
            ival = math.log((n_c + 0.5) / (2 if t == "apple" else 1)) / math.log(n_c + 1.0)
            tot += int(math.floor((0.4 + 0.6 * tval * ival) * 1e6 + 0.5))
        exp[i] = tot / 2e6
    assert got == exp


def test_cori_select_all_equals_full_search(spark, sharded, queries):
    ms = MultiSearcher(spark, sharded["dirs"])
    full = ms.search(queries, k=15)
    sel = ms.search_cori(queries, k=15, n_select=len(sharded["dirs"]))
    fs = sorted(map(tuple, full.collect()))
    ss = sorted(map(tuple, sel.collect()))
    assert fs == ss


def test_cori_select_one_is_subset_with_exact_scores(spark, sharded, queries):
    ms = MultiSearcher(spark, sharded["dirs"])
    # effectively-unbounded reference run: a selected shard's local top-k
    # can include docs outside a truncated global top-k
    full = {
        (r["qid"], r["index_id"], r["docid"]): r["score"]
        for r in ms.search(queries, k=100_000, prune=False).collect()
    }
    sel = ms.search_cori(queries, k=50, n_select=1)
    rows = sel.collect()
    assert rows
    for r in rows:
        key = (r["qid"], r["index_id"], r["docid"])
        # scores are the global-stats scores — exact wherever the doc exists
        assert key in full and full[key] == r["score"], key
    # one shard per query only
    shards_per_q = {}
    for r in rows:
        shards_per_q.setdefault(r["qid"], set()).add(r["index_id"])
    assert all(len(s) == 1 for s in shards_per_q.values())
    with pytest.raises(ValueError, match="n_select"):
        ms.search_cori(queries, k=5, n_select=0)


def test_federated_phrase_and_prefix_equal_union(spark, tmp_path):
    """Positional federation: phrase (exact + slop) and phrase-prefix
    matches over sharded members equal the union-corpus index row-for-row
    (keys mapped through doc_map; prefix expansion capped GLOBALLY)."""
    a = _batch(spark, 10, 11, "pa-")
    b = _batch(spark, 8, 23, "pb-")
    dirs, parts = [], [a, b]
    for i, p in enumerate(parts):
        d = str(tmp_path / f"ps{i}")
        build_index(spark, p, d, chunk_bits=CHUNK_BITS, block_size=BLOCK,
                    positional=True)
        dirs.append(d)
    full = str(tmp_path / "pfull")
    build_index(spark, a.unionByName(b), full, chunk_bits=CHUNK_BITS,
                block_size=BLOCK, positional=True)
    ms = MultiSearcher(spark, dirs)
    single = Searcher(spark, full)

    def fed_keys(res):
        out = {}
        for i, d in enumerate(dirs):
            dm = spark.read.parquet(os.path.join(d, "doc_map"))
            sub = res.filter(F.col("index_id") == i).join(dm, "docid")
            for r in sub.collect():
                out[(r["conv_id"], r["turn_idx"])] = (
                    r["n_matches"], r["first_pos"],
                )
        return out

    def single_keys(res):
        dm = spark.read.parquet(os.path.join(full, "doc_map"))
        return {
            (r["conv_id"], r["turn_idx"]): (r["n_matches"], r["first_pos"])
            for r in res.join(dm, "docid").collect()
        }

    for fed, sing in (
        (ms.search_phrase("the table"), single.search_phrase("the table")),
        (
            ms.search_phrase("table merge", slop=2),
            single.search_phrase("table merge", slop=2),
        ),
        (
            ms.search_phrase_prefix("the tabl", max_expansions=3),
            single.search_phrase_prefix("the tabl", max_expansions=3),
        ),
    ):
        fk, sk = fed_keys(fed), single_keys(sing)
        assert fk == sk and fk


def test_federated_boosting_equals_union_index(spark, sharded, queries):
    """Boosting-query federation: per-member demotion under merged stats
    == a union-corpus index, exact mode (k covers everything)."""
    negs = spark.createDataFrame(
        [(r["qid"], "the data") for r in queries.limit(3).collect()],
        "qid string, text string",
    )
    ms = MultiSearcher(spark, sharded["dirs"])
    fed = _by_turn(
        spark,
        ms.search_boosting(queries, negs, negative_boost=0.25, k=100_000),
        sharded["dirs"], fed=True,
    )
    single = _by_turn(
        spark,
        Searcher(spark, sharded["full"]).search_boosting(
            queries, negs, negative_boost=0.25, k=100_000
        ),
        sharded["full"], fed=False,
    )
    assert fed == single and fed


def test_federated_postings_list_equals_union(spark, sharded):
    ms = MultiSearcher(spark, sharded["dirs"])
    terms = ["data", "the", "zzznever"]

    def keyed(res, dirs_or_full, fed):
        if fed:
            maps = []
            for i, d in enumerate(dirs_or_full):
                dm = spark.read.parquet(os.path.join(d, "doc_map")) \
                    .withColumn("index_id", F.lit(i))
                maps.append(dm)
            dm = maps[0]
            for m in maps[1:]:
                dm = dm.unionByName(m)
            j = res.join(dm, ["index_id", "docid"])
        else:
            dm = spark.read.parquet(
                os.path.join(dirs_or_full, "doc_map")
            )
            j = res.join(dm, "docid")
        return {
            (r["term"], r["conv_id"], r["turn_idx"], r["tf"])
            for r in j.collect()
        }

    fed = keyed(ms.postings_list(terms), sharded["dirs"], True)
    single = keyed(
        Searcher(spark, sharded["full"]).postings_list(terms),
        sharded["full"], False,
    )
    assert fed == single and fed


# ----------------------------------------------------------------- ReDDE


@pytest.fixture(scope="module")
def stored_pair(spark, tmp_path_factory):
    """Two stored=True members (disjoint corpora) for CSI building."""
    root = tmp_path_factory.mktemp("redde")
    parts = [_batch(spark, 16, 3, "ra-"), _batch(spark, 12, 5, "rb-")]
    dirs = []
    for i, p in enumerate(parts):
        d = str(root / f"m{i}")
        build_index(spark, p, d, chunk_bits=CHUNK_BITS, block_size=BLOCK,
                    stored=True)
        dirs.append(d)
    return dict(dirs=dirs, parts=parts, root=root)


def test_redde_csi_build_and_rank(spark, stored_pair, queries):
    from dhr_spark.operators.textstats import tokhash60

    ms = MultiSearcher(spark, stored_pair["dirs"])
    sdir = str(stored_pair["root"] / "csi_out")
    ms.build_sample_index(sdir, denom=2, chunk_bits=CHUNK_BITS,
                          block_size=BLOCK)
    # origin == the hash-gated sample of each member's live corpus
    import json

    with open(os.path.join(sdir, "redde_meta.json")) as f:
        meta = json.load(f)
    assert meta["denom"] == 2
    origin = spark.read.parquet(os.path.join(sdir, "origin"))
    for i, p in enumerate(stored_pair["parts"]):
        gate = (
            tokhash60(
                F.concat(F.lit("csi:"), F.col("conv_id"), F.lit("|"),
                         F.col("turn_idx").cast("string"))
            ) % 2 == 0
        )
        want = {
            (r["conv_id"], r["turn_idx"])
            for r in p.filter(gate).select("conv_id", "turn_idx").collect()
        }
        got = {
            (r["conv_id"], r["turn_idx"])
            for r in origin.filter(F.col("index_id") == i).collect()
        }
        assert got == want
        m = next(m for m in meta["members"] if m["index_id"] == i)
        assert m["n_sample"] == len(want)
        assert m["n_docs"] == p.count()

    ranks = ms.rank_shards_redde(queries, sdir, n=20)
    rows = ranks.collect()
    assert rows, "synthetic queries should hit the sample"
    by_q = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append(r)
    stats = {m["index_id"]: m for m in meta["members"]}
    for qid, rs in by_q.items():
        # every member ranked once per qid, dense ranks, exact est_rel
        assert sorted(r["index_id"] for r in rs) == [0, 1]
        assert sorted(r["rank"] for r in rs) == [1, 2]
        for r in rs:
            m = stats[r["index_id"]]
            assert r["est_rel"] == r["votes"] * m["n_docs"] / m["n_sample"]
        a, b = sorted(rs, key=lambda r: r["rank"])
        # est_rel DESC, ties by n_docs DESC then index_id ASC
        assert (
            a["est_rel"], stats[a["index_id"]]["n_docs"], -a["index_id"]
        ) >= (
            b["est_rel"], stats[b["index_id"]]["n_docs"], -b["index_id"]
        )


def test_redde_guards(spark, stored_pair, sharded, queries, tmp_path):
    ms_plain = MultiSearcher(spark, sharded["dirs"][:2])
    with pytest.raises(ValueError, match="stored=True"):
        ms_plain.build_sample_index(str(tmp_path / "x"), denom=2)

    ms = MultiSearcher(spark, stored_pair["dirs"])
    with pytest.raises(ValueError, match="denom"):
        ms.build_sample_index(str(tmp_path / "y"), denom=0)

    # duplicate (conv_id, turn_idx) across members -> refuse attribution
    dup_root = tmp_path / "dup"
    p = _batch(spark, 6, 11, "dup-")
    d1, d2 = str(dup_root / "a"), str(dup_root / "b")
    build_index(spark, p, d1, chunk_bits=CHUNK_BITS, block_size=BLOCK,
                stored=True)
    build_index(spark, p, d2, chunk_bits=CHUNK_BITS, block_size=BLOCK,
                stored=True)
    with pytest.raises(ValueError, match="disjoint"):
        MultiSearcher(spark, [d1, d2]).build_sample_index(
            str(dup_root / "csi"), denom=1,
            chunk_bits=CHUNK_BITS, block_size=BLOCK,
        )

    from dhr_spark.operators.federate import redde_scores

    hits = spark.createDataFrame([("q", 0, 1)], "qid string, index_id int, rank int")
    st = spark.createDataFrame([(0, 10, 5)], "index_id int, n_docs long, n_sample long")
    with pytest.raises(ValueError, match="n must"):
        redde_scores(hits, st, n=0)
    # zero-sample shard: est_rel 0.0, never a division error
    st2 = spark.createDataFrame(
        [(0, 10, 5), (1, 99, 0)], "index_id int, n_docs long, n_sample long"
    )
    out = {r["index_id"]: r for r in redde_scores(hits, st2, n=5).collect()}
    assert out[1]["votes"] == 0 and out[1]["est_rel"] == 0.0
    assert out[0]["est_rel"] == 2.0  # 1 vote * 10 / 5
    # a query with ZERO sample hits still gets a full member ranking
    # (n_docs DESC fallback), never silent query loss
    qframe = spark.createDataFrame([("q",), ("qmiss",)], "qid string")
    out2 = redde_scores(hits, st2, n=5, qids=qframe).collect()
    miss = sorted(
        (r for r in out2 if r["qid"] == "qmiss"), key=lambda r: r["rank"]
    )
    assert [r["index_id"] for r in miss] == [1, 0]  # 99 docs ranks first
    assert all(r["votes"] == 0 and r["est_rel"] == 0.0 for r in miss)


def test_redde_select_all_equals_full_search(spark, stored_pair, queries):
    ms = MultiSearcher(spark, stored_pair["dirs"])
    sdir = str(stored_pair["root"] / "csi_out2")
    ms.build_sample_index(sdir, denom=2, chunk_bits=CHUNK_BITS,
                          block_size=BLOCK)
    full = ms.search(queries, k=10)
    sel_all = ms.search_redde(queries, sdir, k=10, n_select=2)
    lhs = {(r["qid"], r["index_id"], r["docid"], r["rank"], round(r["score"], 6))
           for r in full.collect()}
    rhs = {(r["qid"], r["index_id"], r["docid"], r["rank"], round(r["score"], 6))
           for r in sel_all.collect()}
    assert lhs == rhs
    # n_select=1: subset of the full result with EXACT (global) scores
    sel_one = ms.search_redde(queries, sdir, k=10, n_select=1)
    full_scores = {(r["qid"], r["index_id"], r["docid"]): round(r["score"], 6)
                   for r in full.collect()}
    for r in sel_one.collect():
        key = (r["qid"], r["index_id"], r["docid"])
        if key in full_scores:  # survivors keep exact global scores
            assert round(r["score"], 6) == full_scores[key]
    with pytest.raises(ValueError, match="n_select"):
        ms.search_redde(queries, sdir, n_select=0)
