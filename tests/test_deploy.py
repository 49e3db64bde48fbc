"""Deployment-path verification: the transcripts source contract and the
spark-submit --py-files artifact (BASELINE.json north_rule: 'run via
spark-submit --py-files on a multi-executor cluster')."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dhr_spark.sources.transcripts import canonicalize_transcripts, read_transcripts

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_canonicalize_happy_path_and_column_order(spark):
    df = spark.createDataFrame(
        [("hi", "c1", 0, "user", None, None)],
        "text string, conv_id string, turn_idx int, role string, tool string, ts timestamp",
    ).selectExpr("*", "1 AS extra")
    out = canonicalize_transcripts(df)
    assert [f.name for f in out.schema.fields] == [
        "conv_id", "turn_idx", "role", "text", "tool", "ts",
    ]  # surplus column dropped, contract order restored


def test_canonicalize_safe_casts(spark):
    df = spark.createDataFrame(
        [("c1", 7, "user", "hi", None)],
        "conv_id string, turn_idx bigint, role string, text string, tool string",
    ).selectExpr("*", "timestamp_ntz'2026-01-01 00:00:00' AS ts")
    out = canonicalize_transcripts(df)
    types = {f.name: f.dataType.simpleString() for f in out.schema.fields}
    assert types["turn_idx"] == "int" and types["ts"] == "timestamp"
    assert out.first()["turn_idx"] == 7


def test_canonicalize_rejects_bad_schema(spark):
    df = spark.createDataFrame([("c1",)], "conv_id string")
    with pytest.raises(ValueError) as e:
        canonicalize_transcripts(df)
    msg = str(e.value)
    assert "missing column 'text'" in msg and "missing column 'ts'" in msg
    df2 = spark.createDataFrame(
        [("c1", "zero", "user", "hi", None, None)],
        "conv_id string, turn_idx string, role string, text string, "
        "tool string, ts timestamp",
    )
    with pytest.raises(ValueError, match="incompatible type"):
        canonicalize_transcripts(df2)


def test_read_transcripts_table_and_path(spark, tmp_path):
    from dhr_spark.data.synthetic import synth_transcripts

    tr = synth_transcripts(spark, 5)
    p = str(tmp_path / "tr.parquet")
    tr.write.parquet(p)
    assert read_transcripts(spark, p).count() == tr.count()
    # catalog-name route (temp view stands in for an Iceberg catalog table —
    # spark.read.table is the same call either way)
    tr.createOrReplaceTempView("tr_view")
    assert read_transcripts(spark, "tr_view").count() == tr.count()


def test_packaged_zip_is_deterministic(tmp_path):
    from scripts.package_pyfiles import build_zip

    a = build_zip(str(tmp_path / "a.zip"))
    b = build_zip(str(tmp_path / "b.zip"))
    assert open(a, "rb").read() == open(b, "rb").read()


@pytest.mark.slow
def test_spark_submit_pyfiles_end_to_end(tmp_path):
    """Full deployment rehearsal: package the engine, ship it with
    spark-submit --py-files, build an index from OUTSIDE the repo tree so
    imports genuinely resolve from the zip, and check the manifest."""
    from scripts.package_pyfiles import build_zip

    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")
    z = build_zip(str(tmp_path / "dhr_spark.zip"))
    driver = tmp_path / "bi.py"
    shutil.copy(os.path.join(REPO, "scripts", "build_index.py"), driver)
    idx = str(tmp_path / "idx")
    out = subprocess.run(
        [spark_submit, "--master", "local[4]", "--py-files", z,
         str(driver), "--synthetic", "20", "--index-dir", idx],
        cwd=str(tmp_path), capture_output=True, text=True, timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    manifest = json.loads(out.stdout.strip().splitlines()[-1])
    assert manifest["n_docs"] > 0 and manifest["n_terms"] > 0
    assert os.path.exists(os.path.join(idx, "manifest.json"))


def test_canonicalize_int64_overflow_fails_fast(spark):
    """Narrowing int64->int32 must raise at execution for out-of-range
    values, not silently null them (ADVICE r2: stable turn ordering)."""
    from pyspark.errors import PySparkRuntimeError, SparkRuntimeException

    df = spark.createDataFrame(
        [("c1", 2**40, "user", "hi", None, None)],
        "conv_id string, turn_idx bigint, role string, text string, "
        "tool string, ts timestamp",
    )
    out = canonicalize_transcripts(df)  # plan builds fine; action raises
    with pytest.raises((PySparkRuntimeError, SparkRuntimeException, Exception)) as e:
        out.collect()
    assert "overflows the contract's int32" in str(e.value)
    # in-range values still pass through the guard untouched
    ok = spark.createDataFrame(
        [("c1", 2**31 - 1, "user", "hi", None, None)],
        "conv_id string, turn_idx bigint, role string, text string, "
        "tool string, ts timestamp",
    )
    assert canonicalize_transcripts(ok).first()["turn_idx"] == 2**31 - 1


def test_curate_corpus_cli_end_to_end(tmp_path):
    """The composed curation pipeline CLI: synthetic transcripts through
    quality gates + near-dedup + packing; one JSON audit line whose
    stage arithmetic is self-consistent and whose outputs land."""
    import json
    import os
    import sys

    out_dir = str(tmp_path / "curated")
    r = subprocess.run(
        [sys.executable, "scripts/curate_corpus.py", "--synthetic", "40",
         "--output", out_dir, "--seq-len", "512"],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    audit = json.loads(r.stdout.strip().splitlines()[-1])
    st = audit["stages"]
    assert st["conversations"]["docs"] == 40
    assert st["curation"]["in"] == 40
    assert st["curation"]["out"] == st["near_dedup"]["in"]
    assert audit["final_docs"] == st["near_dedup"]["out"]
    assert st["packing"]["n_docs"] == audit["final_docs"]
    assert os.path.isdir(f"{out_dir}/docs")
    assert os.path.isdir(f"{out_dir}/pack_plan")
