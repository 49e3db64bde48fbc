"""Manifest snapshots: point-in-time reads and rollback (Iceberg shape).

Every _write_manifest commit self-archives under snapshots/<id>.json.
Contracts pinned here:
  * Searcher(snapshot=N) reproduces the exact results the index served at
    commit N — later appends and deletes are invisible (chunk-list pruning
    + versioned dictionary + tombstone watermark all ride the manifest);
  * rollback_index restores an earlier state as a NEW commit, and the
    next append after a rollback overwrites the orphaned chunks exactly
    like a crash-retry would.
"""

import pytest

from dhr_spark.index.builder import (
    build_index,
    list_snapshots,
    load_manifest,
    rollback_index,
)
from dhr_spark.index.delete import delete_docs
from dhr_spark.index.incremental import append_to_index
from dhr_spark.operators.wand import Searcher

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


def _res(searcher, q, k=100):
    return {
        (r["qid"], r["docid"]): (r["rank"], round(r["score"], 6))
        for r in searcher.search(q, k=k).collect()
    }


def test_snapshot_reads_and_rollback(spark, tmp_path):
    d = str(tmp_path / "snapidx")
    q = spark.createDataFrame(
        [("q1", "alpha beta"), ("q2", "newword")], "qid string, text string"
    )

    man1 = build_index(
        spark, _turns(spark, 0, 30, "base"), d,
        analyzer_mode="simple", chunk_bits=5, block_size=8,
        docid_strategy="window", forward_index=True,
    )
    s1_id = man1["snapshot_id"]
    at_build = _res(Searcher(spark, d), q)

    man2 = append_to_index(spark, _turns(spark, 100, 110, "newword"), d)
    s2_id = man2["snapshot_id"]
    at_append = _res(Searcher(spark, d), q)
    assert at_append != at_build  # new docs visible, idf/avgdl moved

    victim = min(doc for (_qid, doc) in at_append if _qid == "q2")
    man3 = delete_docs(spark, d, docids=[victim])
    at_delete = _res(Searcher(spark, d), q)
    assert (("q2", victim) in at_append) and ("q2", victim) not in at_delete

    # ascending ids; current == max
    ids = list_snapshots(d)
    assert ids == sorted(ids) and ids[-1] == man3["snapshot_id"]
    assert s1_id < s2_id < man3["snapshot_id"]

    # point-in-time reads reproduce each state exactly
    assert _res(Searcher(spark, d, snapshot=s1_id), q) == at_build
    assert _res(Searcher(spark, d, snapshot=s2_id), q) == at_append
    assert _res(Searcher(spark, d, snapshot=man3["snapshot_id"]), q) == at_delete

    # unknown snapshot fails loudly
    with pytest.raises(FileNotFoundError, match="no snapshot"):
        Searcher(spark, d, snapshot=99999)

    # rollback to the pre-append state: current reads == at_build, committed
    # as a NEW snapshot (audit trail), roll-forward still possible
    rb = rollback_index(d, s1_id)
    assert rb["snapshot_id"] == man3["snapshot_id"] + 1
    assert _res(Searcher(spark, d), q) == at_build
    assert _res(Searcher(spark, d, snapshot=s2_id), q) == at_append

    # an append after rollback allocates from the rolled-back high-water
    # mark and overwrites the orphaned chunks (crash-retry invariant)
    man5 = append_to_index(spark, _turns(spark, 200, 205, "postroll"), d)
    assert man5["n_docs"] == 35  # 30 base + 5 new; the undone 10 stay gone
    q2 = spark.createDataFrame(
        [("a", "postroll"), ("b", "newword")], "qid string, text string"
    )
    hits = Searcher(spark, d).search(q2, k=50).collect()
    by = {}
    for r in hits:
        by.setdefault(r["qid"], set()).add(r["docid"])
    assert len(by.get("a", ())) == 5
    assert "b" not in by  # rolled-back batch is really gone


def test_snapshot_ids_monotone_across_retry(spark, tmp_path):
    """A manifest rewind + retry (the crash-replay pattern every mutating
    op's tests use) re-derives the SAME snapshot id and overwrites the
    orphan archive instead of forking the history."""
    import shutil

    d = str(tmp_path / "retryidx")
    build_index(
        spark, _turns(spark, 0, 10, "base"), d,
        analyzer_mode="simple", chunk_bits=5, block_size=8,
        docid_strategy="window",
    )
    shutil.copy(f"{d}/manifest.json", f"{d}/manifest.rewind")
    append_to_index(spark, _turns(spark, 50, 53, "x"), d)
    ids_after = list_snapshots(d)
    # simulate the crash: rewind the manifest, retry the same batch
    shutil.copy(f"{d}/manifest.rewind", f"{d}/manifest.json")
    man = append_to_index(spark, _turns(spark, 50, 53, "x"), d)
    assert list_snapshots(d) == ids_after  # same id reused, no fork
    assert man["snapshot_id"] == ids_after[-1]
