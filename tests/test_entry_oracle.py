"""Driver-contract rehearsal: every __spark_entry__ query with an oracle must
match its DuckDB twin at sf0.01 — row count, column names, and values
(order-insensitive), exactly as CORRECTNESS_r{N}.json will check."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con.execute(sql).fetchdf()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    out = df[sorted(df.columns)].copy()
    for c in out.columns:
        if out[c].dtype == object:
            out[c] = out[c].astype(str)
    return out.sort_values(by=list(out.columns), ignore_index=True)


ORACLES = entry_mod.oracle_sql()
ALL_QUERIES = entry_mod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, name):
    spark_df = ALL_QUERIES[name](spark, SF_DIR).toPandas()
    duck_df = _duck(ORACLES[name])
    assert sorted(spark_df.columns) == sorted(duck_df.columns), (
        f"{name}: columns {sorted(spark_df.columns)} != {sorted(duck_df.columns)}"
    )
    assert len(spark_df) == len(duck_df), (
        f"{name}: {len(spark_df)} rows (spark) != {len(duck_df)} rows (duck)"
    )
    s, d = _canon(spark_df), _canon(duck_df)
    for c in s.columns:
        sv, dv = s[c].to_numpy(), d[c].to_numpy()
        if s[c].dtype.kind == "f":
            bad = [
                (i, a, b)
                for i, (a, b) in enumerate(zip(sv, dv))
                if not (a == b or (math.isnan(a) and math.isnan(b)))
            ]
        else:
            bad = [(i, a, b) for i, (a, b) in enumerate(zip(sv, dv)) if a != b]
        assert not bad, f"{name}.{c}: first mismatches {bad[:5]}"


@pytest.mark.parametrize("name", sorted(set(ALL_QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = ALL_QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


def test_wand_vs_slow_identity_is_empty(spark):
    # the entry emits a single mismatch-count row; assert it is zero
    rows = ALL_QUERIES["wand_vs_slow_identity"](spark, SF_DIR).collect()
    assert len(rows) == 1 and rows[0]["mismatches"] == 0
