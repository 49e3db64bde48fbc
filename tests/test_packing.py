"""Sequence packing (operators/packing.py): the distributed two-phase
prefix sum must equal a single-partition pandas oracle, be independent of
the partition count, and pin the straddle/empty-doc edge semantics."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from dhr_spark.operators.packing import pack_offsets, pack_stats

SEQ = 64


def _counts(spark, n=500, parts=None):
    # deterministic pseudo-random token counts incl. zeros and > SEQ docs
    rows = [(i, (i * 37 + 11) % 150 if i % 17 else 0) for i in range(n)]
    df = spark.createDataFrame(rows, "docid long, n_tokens long")
    return df.repartition(parts) if parts else df


def _pandas_oracle(rows, seq):
    pdf = pd.DataFrame(rows, columns=["docid", "n_tokens"]).sort_values(
        "docid"
    )
    n = pdf["n_tokens"].to_numpy(dtype="int64")
    start = np.cumsum(n) - n
    off = start % seq
    pdf["start_tok"] = start
    pdf["pack_id"] = start // seq
    pdf["offset"] = off
    pdf["n_packs"] = np.where(n == 0, 0, (off + n - 1) // seq + 1)
    return {
        tuple(int(v) for v in r)
        for r in pdf.itertuples(index=False, name=None)
    }


def test_matches_pandas_oracle_across_partitions(spark):
    df = _counts(spark, 500, parts=7)
    got = {
        tuple(int(r[c]) for c in
              ["docid", "n_tokens", "start_tok", "pack_id", "offset",
               "n_packs"])
        for r in pack_offsets(df, SEQ, num_partitions=7).collect()
    }
    rows = [(r["docid"], r["n_tokens"]) for r in df.collect()]
    assert got == _pandas_oracle(rows, SEQ)


def test_partition_count_invariance(spark):
    df = _counts(spark, 300)
    a = sorted(map(tuple, pack_offsets(df, SEQ, num_partitions=1).collect()))
    b = sorted(map(tuple, pack_offsets(df, SEQ, num_partitions=8).collect()))
    assert a == b


def test_straddle_and_empty_semantics(spark):
    df = spark.createDataFrame(
        [(0, 60), (1, 10), (2, 0), (3, 130), (4, 5)],
        "docid long, n_tokens long",
    )
    got = {r["docid"]: r for r in pack_offsets(df, SEQ).collect()}
    # doc 1 starts at 60, crosses the 64-boundary -> spans 2 windows
    assert (got[1]["pack_id"], got[1]["offset"], got[1]["n_packs"]) == (0, 60, 2)
    # empty doc anchors a position but occupies nothing
    assert (got[2]["start_tok"], got[2]["n_packs"]) == (70, 0)
    # doc 3: 130 tokens starting at offset 6 of pack 1 -> spans 3 windows
    assert (got[3]["pack_id"], got[3]["offset"], got[3]["n_packs"]) == (1, 6, 3)
    # totals line up exactly
    assert got[4]["start_tok"] == 200


def test_pack_stats(spark):
    df = spark.createDataFrame(
        [(0, 60), (1, 10), (2, 0), (3, 130), (4, 5)],
        "docid long, n_tokens long",
    )
    s = pack_stats(pack_offsets(df, SEQ), SEQ).collect()[0]
    assert s["n_docs"] == 5
    assert s["total_tokens"] == 205
    assert s["n_packs"] == 4          # ceil(205/64)
    assert s["straddling_docs"] == 2  # docs 1 and 3
    assert s["tail_padding"] == 4 * 64 - 205


def test_bad_seq_len_raises(spark):
    df = _counts(spark, 10)
    with pytest.raises(ValueError, match="seq_len"):
        pack_offsets(df, 0)
    with pytest.raises(ValueError, match="seq_len"):
        pack_stats(df, -1)


def test_no_single_partition_window(spark):
    # the scale claim: no WindowExec over an unpartitioned frame. The
    # range exchange runs inside the eager local checkpoint's own job
    # (recompute-proof numbering — operators/docids.py), so the final
    # plan is mapInPandas over the checkpointed scan: still no Window,
    # and the base must be the checkpoint scan, not a re-sort.
    plan = pack_offsets(_counts(spark, 100), SEQ)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Window" not in plan, plan[:1500]
    assert (
        "rangepartitioning" in plan.lower()
        or "existingrdd" in plan.lower()
        or "scan existing" in plan.lower()
    ), plan[:1500]
