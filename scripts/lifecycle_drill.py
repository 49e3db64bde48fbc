"""Full index-lifecycle drill at the largest corpus this sandbox holds.

Runs the whole operational story end-to-end on ~1M synthetic transcript
turns — the scale the per-op pytest suite does NOT exercise — and asserts
the same identities the small-scale tests pin:

  build (forward+stored+docvalues) -> resume no-op -> batch/search parity
  -> slow-path parity -> incremental append -> crash-retry (manifest
  rewind, idempotent re-append) -> exact-stats delete by docvalue match
  -> mixed-tier compaction (PFOR cold chunks) with search identity ->
  check_index(decode=True) clean.

Output: one JSON line with per-phase seconds + assertion results
(committed as LIFECYCLE_r05.json). Every assertion failure raises — a
non-zero exit IS the signal.

Usage:
    python scripts/lifecycle_drill.py [N_CONVS] [OUT.json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("DHR_SHM_SCRATCH", "1")

from pyspark.sql import functions as F


def keyed_frame(spark, idx, res_df):
    """(qid, conv_id, turn_idx, round-4 score) — the docid-independent view
    of a result set (docids move across compaction; doc_map keys do not).
    Same comparison shape as tests/test_compact.py::_results, kept as a
    DataFrame so million-row result sets never funnel through the driver."""
    dm = spark.read.parquet(f"{idx}/doc_map").select(
        "docid", "conv_id", "turn_idx"
    )
    return res_df.join(dm, "docid").select(
        "qid", "conv_id", "turn_idx", F.round("score", 4).alias("s")
    )


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 48_000
    out_path = sys.argv[2] if len(sys.argv) > 2 else "LIFECYCLE_r05.json"
    idx = "/tmp/dhr_lifecycle_idx"
    shutil.rmtree(idx, ignore_errors=True)

    from dhr_spark.data.synthetic import synth_queries, synth_transcripts
    from dhr_spark.index.builder import MANIFEST, build_index, load_manifest
    from dhr_spark.index.check import check_index
    from dhr_spark.index.compact import compact_index
    from dhr_spark.index.delete import delete_docs
    from dhr_spark.index.incremental import append_to_index
    from dhr_spark.operators.topk import search_slow_path
    from dhr_spark.operators.wand import Searcher
    from dhr_spark.session import get_spark

    spark = get_spark(
        app_name="lifecycle_drill", master="local[32]", shuffle_partitions=32
    )
    rec: dict = {"n_convs": n_convs}
    t_all = time.time()

    # ---- corpus: 7/8 base + 1/8 append batch + a small retry batch ------
    tr = synth_transcripts(spark, n_convs).cache()
    n_turns = tr.count()
    rec["n_turns"] = n_turns
    cid = F.abs(F.hash("conv_id"))
    base = tr.filter(cid % 16 < 13)
    batch1 = tr.filter(cid % 16 == 13)
    batch2 = tr.filter(cid % 16 >= 14)

    def phase(name, fn):
        t0 = time.time()
        out = fn()
        rec[name + "_sec"] = round(time.time() - t0, 2)
        print(f"{name}: {rec[name + '_sec']}s", flush=True)
        return out

    # ---- 1. build: the full serving config --------------------------------
    man = phase(
        "build",
        lambda: build_index(
            spark, base, idx,
            forward_index=True, stored=True, docvalues=["role", "ts"],
        ),
    )
    rec["build_n_docs"] = int(man["n_docs"])
    rec["build_turns_per_sec"] = round(rec["build_n_docs"] / rec["build_sec"], 1)
    rec["build_phase_seconds"] = man.get("phase_seconds")
    rec["build_chunks"] = len(man["chunks"])

    # ---- 2. resume on a complete index is a no-op -------------------------
    man2 = phase(
        "resume_noop",
        lambda: build_index(
            spark, base, idx, resume=True,
            forward_index=True, stored=True, docvalues=["role", "ts"],
        ),
    )
    assert sorted(man2["chunks"]) == sorted(man["chunks"]), "resume changed chunks"
    assert int(man2["n_docs"]) == rec["build_n_docs"], "resume changed n_docs"

    # ---- 3. search / search_batch rank+score identity ---------------------
    q50 = synth_queries(spark, 50).cache()
    q50.count()
    s = Searcher(spark, idx)
    r_search = s.search(q50, k=100).cache()
    rec["search_rows"] = phase("search_50q", lambda: r_search.count())
    r_batch = phase(
        "search_batch_50q", lambda: s.search_batch(q50, k=100).collect()
    )
    a = {(r["qid"], r["docid"], r["rank"], round(r["score"], 6)) for r in r_search.collect()}
    b = {(r["qid"], r["docid"], r["rank"], round(r["score"], 6)) for r in r_batch}
    assert a == b, "search_batch != search"
    rec["batch_identity"] = True

    # ---- 4. slow-path parity: independent DataFrame dataflow, 8 queries ---
    # same contract as the driver's wand_vs_slow_identity entry (round-4
    # rows, exceptAll both ways empty), at 8x that entry's corpus
    from dhr_spark.functions.bm25 import bm25_weight_col, idf_col
    from dhr_spark import B, K1
    from dhr_spark.operators.termfreq import (
        doc_lengths, term_freqs, with_tokens,
    )

    q8 = q50.limit(8).cache()
    q8.count()

    def _slow():
        docs = base.join(
            spark.read.parquet(f"{idx}/doc_map").select(
                "docid", "conv_id", "turn_idx"
            ),
            ["conv_id", "turn_idx"],
        ).select("docid", "text")
        tok = with_tokens(docs).select("docid", "tokens")
        tfs = term_freqs(tok)
        dls = doc_lengths(tok)
        cs = dls.agg(F.count("*").alias("n"), F.avg("dl").alias("a")).collect()[0]
        ts = tfs.groupBy("term").agg(F.count("*").alias("df")).withColumn(
            "idf", idf_col(F.col("df"), int(cs["n"]))
        )
        post = (
            tfs.join(dls, "docid")
            .join(F.broadcast(ts.select("term", "idf")), "term")
            .select(
                "term", "docid",
                bm25_weight_col(
                    F.col("tf"), F.col("dl"), F.col("idf"),
                    F.lit(float(cs["a"])), K1, B,
                ).alias("weight"),
            )
        )
        qtok = with_tokens(q8.select("qid", "text"))
        qtfs = (
            qtok.select("qid", F.explode("tokens").alias("term"))
            .groupBy("qid", "term").agg(F.count("*").alias("qtf"))
        )
        return search_slow_path(qtfs, post, k=100, on="term")

    def _r4(df):
        return df.withColumn("score", F.round("score", 4))

    r_slow = phase("slow_path_8q", _slow)
    fast8 = _r4(s.search(q8, k=100))
    slow4 = _r4(r_slow)
    mism = fast8.exceptAll(slow4).unionAll(slow4.exceptAll(fast8)).count()
    assert mism == 0, f"slow path mismatch: {mism} rows differ"
    rec["slow_path_identity"] = True

    # ---- 5. incremental append (1/16 of the corpus) -----------------------
    man3 = phase("append", lambda: append_to_index(spark, batch1, idx))
    n_after_append = int(man3["n_docs"])
    rec["append_turns"] = n_after_append - rec["build_n_docs"]
    rec["append_turns_per_sec"] = round(rec["append_turns"] / rec["append_sec"], 1)

    # ---- 6. crash-retry: rewind manifest between append attempts ----------
    man_path = os.path.join(idx, MANIFEST)
    saved = open(man_path).read()
    phase("append2_first_try", lambda: append_to_index(spark, batch2, idx))
    with open(man_path, "w") as f:  # simulated crash AFTER data, BEFORE commit
        f.write(saved)
    man4 = phase("append2_retry", lambda: append_to_index(spark, batch2, idx))
    dm = spark.read.parquet(f"{idx}/doc_map")
    n_docs_final = int(man4["n_docs"])
    dup = (
        dm.groupBy("conv_id", "turn_idx").agg(F.count("*").alias("c"))
        .filter(F.col("c") > 1).count()
    )
    assert dup == 0, f"{dup} duplicate doc_map keys after crash-retry"
    assert n_docs_final == n_turns, f"manifest n_docs {n_docs_final} != corpus {n_turns}"
    rec["crash_retry_no_dups"] = True

    # ---- 7. exact-stats delete by docvalue match --------------------------
    s2 = Searcher(spark, idx)
    n_tool = s2.docvalues_frame(["role"]).filter(F.col("role") == "tool").count()
    man5 = phase("delete_role_tool", lambda: delete_docs(spark, idx, match=("role", ["tool"])))
    rec["deleted_docs"] = n_tool
    s3 = Searcher(spark, idx)
    r_after_del = s3.search(q50, k=100).cache()
    hit_roles = (
        r_after_del.join(spark.read.parquet(f"{idx}/doc_map"), "docid")
        .filter(F.col("role") == "tool").count()
    )
    assert hit_roles == 0, f"{hit_roles} deleted (role=tool) docs still returned"
    rec["delete_excluded_from_search"] = True

    # ---- 8. mixed-tier compaction: PFOR cold chunks, search identity ------
    # unbounded k (no cutoff boundary): tie groups at a k-cutoff may
    # legally reorder when compaction renumbers docids, so the identity
    # contract — like tests/test_compact.py — is over the FULL match set
    K_ALL = 10_000_000
    pre_dir = "/tmp/dhr_lifecycle_pre"
    shutil.rmtree(pre_dir, ignore_errors=True)
    # materialize to disk, not cache: compaction's GC deletes the old chunk
    # files, and a partially-cached plan would try to recompute from them
    keyed_frame(spark, idx, s3.search(q8, k=K_ALL)).write.mode(
        "overwrite"
    ).parquet(pre_dir)
    pre = spark.read.parquet(pre_dir)
    rec["compact_cmp_rows"] = pre.count()
    man6 = phase(
        "compact_pfor",
        lambda: compact_index(spark, idx, fill_threshold=0.97, codec="pfor"),
    )
    rec["chunks_before_compact"] = len(man4["chunks"])
    rec["chunks_after_compact"] = len(man6["chunks"])
    s4 = Searcher(spark, idx)
    post = keyed_frame(spark, idx, s4.search(q8, k=K_ALL))
    mism_c = pre.exceptAll(post).unionAll(post.exceptAll(pre)).count()
    assert mism_c == 0, f"compaction changed results: {mism_c} rows differ"
    rec["compaction_identity"] = True
    from dhr_spark.index.codec import index_codec

    eff = index_codec(man6)
    rec["codecs_after_compact"] = (
        sorted(set(eff.values())) if isinstance(eff, dict) else eff
    )

    # ---- 9. integrity -----------------------------------------------------
    chk = phase("check_index", lambda: check_index(spark, idx, decode=True))
    assert chk["ok"], f"check_index problems: {chk['problems']}"
    rec["check_index_ok"] = True
    rec["check_orphans"] = len(chk.get("orphans", []))

    rec["total_sec"] = round(time.time() - t_all, 1)
    with open(out_path, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))
    spark.stop()


if __name__ == "__main__":
    main()
