"""k-gram term index (index/kgram.py) — wildcard/fuzzy/prefix acceleration.

The gram table is a NECESSARY-condition pre-filter with exact verification,
so every accelerated path must be bit-identical to the full dictionary
scan; stale tables (post-append) must stay exact via the watermark
remainder; refreshes fold only new terms."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dhr_spark.data.synthetic import synth_transcripts
from dhr_spark.index.builder import build_index, load_manifest
from dhr_spark.index.kgram import (
    build_kgram_index,
    fuzzy_grams,
    prefix_grams,
    wildcard_grams,
)
from dhr_spark.operators.wand import Searcher

WILD = [("w1", "tab*"), ("w2", "*tion"), ("w3", "s?ark"), ("w4", "zz*qx")]
FUZZ = [("f1", "tabel"), ("f2", "spark"), ("f3", "zzzzzzz")]
PREF = [("p1", "ret"), ("p2", "qu"), ("p3", "zzz")]


def test_gram_extraction_pins():
    assert wildcard_grams("te*rm", 3) == (["^te", "rm$"], 2)
    assert wildcard_grams("*able", 3) == (["abl", "ble", "le$"], 3)
    assert wildcard_grams("a*", 3) is None            # no full gram
    assert wildcard_grams("te?t", 3) == (["^te"], 1)  # ? splits segments
    assert wildcard_grams(r"te\*rm", 3) is None       # escapes: fall back
    g, t = fuzzy_grams("table", 1, 3)
    assert g == ["^ta", "abl", "ble", "le$", "tab"] and t == 2
    assert fuzzy_grams("ab", 2, 3) is None            # vacuous threshold
    assert prefix_grams("ta", 3) == (["^ta"], 1)
    assert prefix_grams("t", 3) is None


@pytest.fixture(scope="module")
def env(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("kgram")
    idx = str(root / "idx")
    tr = synth_transcripts(spark, 40, seed=7)
    build_index(spark, tr, idx, chunk_bits=7, block_size=16,
                docid_strategy="window")
    man = build_kgram_index(spark, idx)
    assert man["kgram"]["batches"] == 1 and man["kgram"]["k"] == 3
    return {"idx": idx, "root": root, "tr": tr}


def _runs(spark, idx, use_kgram: bool):
    s = Searcher(spark, idx)
    s._tid_cache = None  # force the distributed dictionary path
    if not use_kgram:
        s.manifest = dict(s.manifest)
        s.manifest.pop("kgram", None)
    out = {}
    out["wild"] = sorted(map(tuple, s.search_wildcard(WILD, k=30).collect()))
    out["fuzz"] = sorted(map(tuple, s.search_fuzzy(FUZZ, k=30).collect()))
    out["pref"] = sorted(map(tuple, s.search_prefix(PREF, k=30).collect()))
    q = spark.createDataFrame(
        [("s1", "tab* spark"), ("s2", "quary~")], "qid string, text string"
    )
    out["syntax"] = sorted(map(tuple, s.search_syntax(q, k=30).collect()))
    return out


def test_kgram_identical_to_dictionary_scan(spark, env):
    fast = _runs(spark, env["idx"], use_kgram=True)
    slow = _runs(spark, env["idx"], use_kgram=False)
    assert fast == slow
    assert fast["wild"] and fast["fuzz"] and fast["pref"] and fast["syntax"]
    # resident driver path agrees too
    s = Searcher(spark, env["idx"])
    assert s._tid_cache is not None
    res = sorted(map(tuple, s.search_wildcard(WILD, k=30).collect()))
    assert res == fast["wild"]


def test_stale_table_stays_exact_then_refreshes(spark, env):
    from dhr_spark.index.incremental import append_to_index

    idx = str(env["root"] / "grow")
    build_index(spark, env["tr"], idx, chunk_bits=7, block_size=16,
                docid_strategy="window")
    build_kgram_index(spark, idx)
    wm0 = load_manifest(idx)["kgram"]["max_term_id"]
    # append turns carrying brand-new terms (above the gram watermark)
    extra = spark.createDataFrame(
        [("conv-zzz", i, "user", f"zzfreshqx{i} zzfreshqx{i} table", None, 0.0)
         for i in range(4)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts double",
    )
    append_to_index(spark, extra, idx)
    pairs = [("n1", "zzfreshqx*")]
    s = Searcher(spark, idx)
    s._tid_cache = None
    hit_docids = {r.docid for r in s.search_wildcard(pairs, k=10).collect()}
    assert len(hit_docids) == 4  # stale gram table + watermark remainder
    man2 = build_kgram_index(spark, idx)
    assert man2["kgram"]["batches"] == 2
    assert man2["kgram"]["max_term_id"] > wm0
    s2 = Searcher(spark, idx)
    s2._tid_cache = None
    assert {
        r.docid for r in s2.search_wildcard(pairs, k=10).collect()
    } == hit_docids
    # no growth -> no-op (no new batch)
    man3 = build_kgram_index(spark, idx)
    assert man3["kgram"]["batches"] == 2


def test_guards(spark, env):
    with pytest.raises(ValueError, match="k must be >= 2"):
        build_kgram_index(spark, env["idx"], k=1)
    with pytest.raises(ValueError, match="one geometry"):
        build_kgram_index(spark, env["idx"], k=4)
    with pytest.raises(FileNotFoundError, match="no manifest"):
        build_kgram_index(spark, str(env["root"] / "nope"))


def test_gram_isin_reaches_parquet_scan(spark, env):
    from dhr_spark.index.kgram import kgram_candidates

    man = load_manifest(env["idx"])
    plan = kgram_candidates(
        spark, env["idx"], man, (["^ta", "abl"], 2)
    )._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "gram" in plan
