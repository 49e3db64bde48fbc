"""Extra measurement harness for the optimization round — bench.py is FROZEN
for the driver's measurement, so all iteration tooling lives here.

Subcommands (all honor $SPARK_GRAFT_SF_DIR / $SPARK_GRAFT_CPUS like bench.py):

  time <name...>         best-of-2 per-op timings (same methodology as
                         bench.py's per-op loop: warm _wand_index_dir
                         untimed, then time qmap[name](spark, SF).count())
  noop <name...>         same, but the timing drives a noop sink instead of
                         .count() (guide §1.4 — forces every column)
  plan <tag> <name...>   write plans/r06/<name>_<tag>.txt with the
                         .explain("formatted") output of each entry
  headline               timed index build + 200q WAND batch + p50 latency
                         (the bench headline, without scaling legs)
  append                 timed incremental append (1/8 corpus) onto a fresh
                         build (matches bench.py's incremental_append row)
  bigbatch [codec]       timed 100k-query search_batch against a small index
                         (matches bench.py's bm25_bigbatch_100k row)
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

os.environ.setdefault("DHR_SHM_SCRATCH", "1")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
K = 1000
N_QUERIES = 200
REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def _spark(shuffle_partitions: int | None = None):
    from dhr_spark.session import get_spark

    return get_spark(
        app_name=f"dhr_bench_extra_{CPUS}",
        master=f"local[{CPUS}]",
        shuffle_partitions=shuffle_partitions or max(CPUS, 8),
    )


def _sf() -> float:
    base = os.path.basename(SF_DIR.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def _n_convs(sf: float) -> int:
    return max(50, int(60_000 * sf))


def _build(spark, n_convs: int, idx: str, codec: str = "varint"):
    from dhr_spark.data.synthetic import synth_transcripts
    from dhr_spark.index.builder import build_index

    transcripts = synth_transcripts(spark, n_convs=n_convs)
    shutil.rmtree(idx, ignore_errors=True)
    t0 = time.time()
    man = build_index(spark, transcripts, idx, analyzer_mode="lucene",
                      chunk_bits=12, block_size=128, codec=codec)
    return time.time() - t0, int(man["n_docs"])


def cmd_time(names: list[str], sink: str = "count") -> None:
    import __spark_entry__ as entry_mod

    spark = _spark()
    entry_mod._wand_index_dir(spark, SF_DIR)
    qmap = entry_mod.queries()
    out = {}
    for name in names:
        best = float("inf")
        for _ in range(2):
            spark.sparkContext.setJobDescription(f"op:{name}")
            t0 = time.time()
            df = qmap[name](spark, SF_DIR)
            if sink == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            best = min(best, time.time() - t0)
        out[name] = round(best, 2)
        print(f"{name}: {out[name]}", flush=True)
    print(json.dumps(out))
    spark.stop()


def cmd_plan(tag: str, names: list[str]) -> None:
    import __spark_entry__ as entry_mod

    spark = _spark()
    entry_mod._wand_index_dir(spark, SF_DIR)
    qmap = entry_mod.queries()
    os.makedirs(os.path.join(REPO, "plans", "r06"), exist_ok=True)
    for name in names:
        df = qmap[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        p = os.path.join(REPO, "plans", "r06", f"{name}_{tag}.txt")
        with open(p, "w") as f:
            f.write(plan)
        print(f"wrote {p}", flush=True)
    spark.stop()


def cmd_headline() -> None:
    from dhr_spark.data.synthetic import synth_queries
    from dhr_spark.operators.wand import Searcher

    sf = _sf()
    n_convs = _n_convs(sf)
    spark = _spark()
    idx = f"/tmp/dhr_extra_idx_full{CPUS}"
    _build(spark, 200, "/tmp/dhr_extra_warm")
    builds = []
    for _ in range(2):
        dt, n_turns = _build(spark, n_convs, idx)
        builds.append(round(dt, 2))
    queries = synth_queries(spark, n_queries=N_QUERIES).cache()
    queries.count()
    searcher = Searcher(spark, idx)
    searcher.search(queries.limit(5), k=K).count()
    qruns = []
    for _ in range(2):
        t0 = time.time()
        searcher.search(queries, k=K).count()
        qruns.append(round(time.time() - t0, 2))
    # p50 interactive
    searcher_i = Searcher(spark, idx, interactive=True)
    lat = []
    for row in queries.limit(8).collect():
        q1 = spark.createDataFrame(
            [(row["qid"], row["text"])], "qid string, text string"
        )
        t0 = time.time()
        searcher_i.search(q1, k=K).count()
        lat.append(time.time() - t0)
    print(json.dumps({
        "build_runs": builds, "build": min(builds),
        "query_runs": qruns, "wand_batch_200q": min(qruns),
        "p50": round(statistics.median(lat), 3),
        "lat": [round(x, 3) for x in lat],
        "n_turns": n_turns,
    }))
    spark.stop()


def cmd_append() -> None:
    from dhr_spark.data.synthetic import synth_transcripts
    from dhr_spark.index.incremental import append_to_index
    from pyspark.sql import functions as SF

    sf = _sf()
    n_convs = _n_convs(sf)
    spark = _spark()
    idx = f"/tmp/dhr_extra_idx_app{CPUS}"
    _build(spark, 200, "/tmp/dhr_extra_warm")
    dt, n_turns = _build(spark, n_convs, idx)
    batch = synth_transcripts(
        spark, n_convs=max(50, n_convs // 8), seed=9
    ).withColumn("conv_id", SF.concat(SF.lit("inc-"), SF.col("conv_id")))
    t0 = time.time()
    man = append_to_index(spark, batch, idx)
    t_append = time.time() - t0
    print(json.dumps({
        "append_sec": round(t_append, 2),
        "append_turns": int(man["n_docs"]) - n_turns,
        "turns_per_sec": round((int(man["n_docs"]) - n_turns) / t_append, 1),
    }))
    spark.stop()


def cmd_bigbatch(codec: str = "varint") -> None:
    from dhr_spark.operators.wand import Searcher
    from pyspark.sql import functions as SF

    sf = _sf()
    n_convs = _n_convs(sf)
    spark = _spark()
    _build(spark, 200, "/tmp/dhr_extra_warm")
    idx_bb = f"/tmp/dhr_extra_idx_bb{CPUS}_{codec}"
    _build(spark, max(60, n_convs // 10), idx_bb, codec=codec)
    qbig = spark.range(100_000).select(
        SF.format_string("bq-%06d", SF.col("id")).alias("qid"),
        SF.format_string(
            "tk%04d tk%04d",
            SF.pmod(SF.col("id"), SF.lit(2000)),
            SF.pmod(SF.col("id") * 7 + 13, SF.lit(2000)),
        ).alias("text"),
    )
    t_bb, n_bb = float("inf"), 0
    for _ in range(2):
        t0 = time.time()
        n_bb = Searcher(spark, idx_bb).search_batch(qbig, k=10).count()
        t_bb = min(t_bb, time.time() - t0)
    print(json.dumps({
        "bigbatch_sec": round(t_bb, 2),
        "rows": int(n_bb),
        "q_per_sec": round(100_000 / t_bb, 1),
        "codec": codec,
    }))
    spark.stop()


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "time"
    if cmd == "time":
        cmd_time(sys.argv[2:])
    elif cmd == "noop":
        cmd_time(sys.argv[2:], sink="noop")
    elif cmd == "plan":
        cmd_plan(sys.argv[2], sys.argv[3:])
    elif cmd == "headline":
        cmd_headline()
    elif cmd == "append":
        cmd_append()
    elif cmd == "bigbatch":
        cmd_bigbatch(sys.argv[2] if len(sys.argv) > 2 else "varint")
    else:
        raise SystemExit(f"unknown subcommand {cmd!r}")
