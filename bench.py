"""Benchmark harness — prints ONE JSON line with headline numbers.

Measures, at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]:

  * index build throughput (turns indexed/sec) over deterministic synthetic
    transcripts sized to the scale factor (full Lucene-compatible analyzer,
    delta+varint segments, block maxes, manifest)
  * batch query throughput (queries/sec, k=1000 block-max WAND) + p50
    single-query latency
  * per-operator timings for the headline driver-contract queries
  * scaling efficiency between N and 4N local cores (the sandbox stand-in
    for N vs 4N executors, BASELINE.json north_rule).

Methodology for the scaling legs: each leg runs in its OWN subprocess (a
shared local JVM would hand the second leg a fully JIT-warmed runtime — we
measured ~3x stage-time differences from warmup alone) and performs a small
untimed warmup build before the timed one, so both legs measure steady-state
throughput the way a long-running cluster job would.

Usage: python bench.py                               # full run
       SPARK_GRAFT_BENCH_SCALING=0 python bench.py   # skip scaling legs
       python bench.py --leg <cores> <n_convs>       # internal: one leg
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import subprocess
import sys
import time

# this sandbox's disk throttles concurrent writers — opt in to tmpfs scratch
os.environ.setdefault("DHR_SHM_SCRATCH", "1")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
DO_SCALING = os.environ.get("SPARK_GRAFT_BENCH_SCALING", "1") == "1"
K = 1000
N_QUERIES = 200
N_LATENCY_SAMPLES = 8
REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def _sf() -> float:
    base = os.path.basename(SF_DIR.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def _n_convs(sf: float) -> int:
    # ~20.5 turns/conv -> sf0.1 ≈ 123k turns for the query corpus
    return max(50, int(60_000 * sf))


def _spark(cores: int, shuffle_partitions: int | None = None):
    from dhr_spark.session import get_spark

    return get_spark(
        app_name=f"dhr_bench_{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=shuffle_partitions or max(cores, 8),
    )


def _build(
    spark, n_convs: int, idx: str, codec: str = "varint"
) -> tuple[float, int]:
    from dhr_spark.data.synthetic import synth_transcripts
    from dhr_spark.index.builder import build_index

    # the generator IS the stored-table stand-in: pure column math over
    # spark.range, fully distributed. Measured: materializing it to /tmp
    # parquet first and timing the build over the file input is ~20% SLOWER
    # on this sandbox (throttled disk) than re-evaluating the generator in
    # each pass, so the timed path keeps the in-memory source.
    transcripts = synth_transcripts(spark, n_convs=n_convs)
    shutil.rmtree(idx, ignore_errors=True)
    t0 = time.time()
    man = build_index(spark, transcripts, idx, analyzer_mode="lucene",
                      chunk_bits=12, block_size=128, codec=codec)
    return time.time() - t0, int(man["n_docs"])


_CAP_ITERS = 6_000_000


def _cap_work(_):
    x = 0
    for i in range(_CAP_ITERS):
        x = (x * 1103515245 + i) & 0xFFFFFFFF
    return x


_MEMBW_ELEMS = 24_000_000  # 192 MB per worker — far past any L3


def _membw_work(_):
    import numpy as np

    a = np.ones(_MEMBW_ELEMS, dtype=np.int64)
    s = 0
    for _ in range(3):
        s += int(a.sum())
    return s


def _mp_membw(cores: int) -> float:
    """Aggregate MEMORY-STREAMING throughput (bytes/sec) of ``cores``
    concurrent workers — the bandwidth-class twin of _mp_capacity's
    ALU-class probe. The two probes bound different stage families: the
    tokenize kernel is compute-bound and follows the ALU ratio (measured
    3.71x for 2->8), while the segment encode exchange is CPU-SATURATED yet
    burns ~39% more core-seconds at 8 cores than 2 (r03 stage profile,
    BASELINE.md) — memory-bandwidth stall inflation a register-loop probe
    cannot see. One box shares one memory bus; a real 4N-executor cluster
    brings 4N buses, so the membw ratio is the fair hardware ceiling for
    the shuffle/encode-bound fraction of the pipeline."""
    import multiprocessing as mp

    best = 0.0
    with mp.Pool(cores) as p:
        # first pass is cold (worker numpy imports, page-zeroing) — time
        # the steady-state second/third passes and keep the best
        p.map(_membw_work, range(cores))
        for _ in range(2):
            t0 = time.time()
            p.map(_membw_work, range(cores))
            best = max(best, cores * _MEMBW_ELEMS * 8 * 3 / (time.time() - t0))
    return best


def _mp_capacity(cores: int) -> float:
    """Aggregate pure-CPU throughput (loop iterations/sec) of ``cores``
    concurrent single-core workers under the leg's CPU affinity — the
    hardware's EFFECTIVE capacity at this parallelism level. Captures what
    the single-core canary cannot: all-core turbo drop and ambient
    multi-core slowdown windows. The ratio cap_hi/cap_lo is the hardware's
    own scaling between the legs (measured ~3.4x for 2->8 on this VM, i.e.
    a 0.85 ceiling); dividing Spark's speedup by it isolates SOFTWARE
    scaling — the quantity the north rule's 4N-executor criterion is
    actually about, since a real cluster's 4N executors have 4N full-speed
    cores, not one box's shared turbo budget."""
    import multiprocessing as mp

    t0 = time.time()
    with mp.Pool(cores) as p:
        p.map(_cap_work, range(cores))
    return cores * _CAP_ITERS / (time.time() - t0)


def _canary_sec() -> float:
    """Single-core pure-Python CPU canary (~0.5 s nominal): a fixed integer
    loop whose wall time tracks the VM's effective CPU speed. The sandbox
    shows multi-minute windows where EVERYTHING (Spark and plain Python
    alike) runs 2-3x slow (BASELINE.md bisection); the canary makes those
    windows visible per draw so the efficiency ratio can be computed from
    clean-window draws and the evidence rides in the bench JSON. Pure
    Python on purpose — numpy/BLAS would use however many cores taskset
    grants the leg and stop being comparable across legs."""
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        x = 0
        for i in range(2_000_000):
            x = (x * 1103515245 + i) & 0xFFFFFFFF
        best = min(best, time.time() - t0)
    return best


def run_leg(cores: int, n_convs: int) -> None:
    """One isolated scaling leg: CPU canary + warmup build (untimed) +
    timed build + timed query batch (the north rule scales the build AND
    query pipeline)."""
    from dhr_spark.data.synthetic import synth_queries
    from dhr_spark.operators.wand import Searcher

    canary = _canary_sec()
    capacity = _mp_capacity(cores)
    membw = _mp_membw(cores)
    # scaling legs run the big corpus: 3 tasks/core smooths the straggler
    # penalty of one-wave scheduling on the HIGH leg (+5% measured at 8c/1M
    # turns) and matches cluster practice (partitions >> cores). The main
    # 32c leg keeps cores==partitions — its corpus is 8x smaller and extra
    # task overhead measurably hurts there (13.9s vs 11.7s build).
    spark = _spark(cores, shuffle_partitions=max(3 * cores, 8))
    idx = f"/tmp/dhr_bench_leg_{cores}"
    _build(spark, max(200, n_convs // 20), f"/tmp/dhr_bench_warm_{cores}")
    dt, n_turns = _build(spark, n_convs, idx)
    queries = synth_queries(spark, n_queries=N_QUERIES).cache()
    queries.count()
    searcher = Searcher(spark, idx)
    searcher.search(queries.limit(5), k=K).count()  # warm
    # best-of-2 WITHIN the leg: the VM's slow windows last minutes, so a
    # single batch draw aliases straight into the cross-leg efficiency ratio
    qdt = float("inf")
    for _ in range(2):
        t0 = time.time()
        searcher.search(queries, k=K).count()
        qdt = min(qdt, time.time() - t0)
    canary_post = _canary_sec()
    spark.stop()
    print(json.dumps({"cores": cores, "build_sec": round(dt, 2),
                      "n_turns": n_turns,
                      "turns_per_sec": round(n_turns / dt, 1),
                      "query_sec": round(qdt, 2),
                      "queries_per_sec": round(N_QUERIES / qdt, 2),
                      "canary_sec": round(min(canary, canary_post), 3),
                      "cpu_capacity": round(capacity, 0),
                      "membw_capacity": round(membw, 0)}))


def _run_leg_subprocess(cores: int, n_convs: int, repeats: int = 1) -> list[dict]:
    # Pin the leg to exactly `cores` CPUs: local[N] only caps task slots —
    # JVM GC/shuffle/IO threads and Python workers would otherwise spill onto
    # the other cores and flatter the small leg. Affinity makes the leg a
    # faithful stand-in for an N-core cluster. Returns ALL draws (each with
    # its CPU canary) — the caller selects clean-window draws and publishes
    # the full band as in-JSON evidence.
    cmd = [sys.executable, os.path.abspath(__file__), "--leg", str(cores), str(n_convs)]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    draws: list[dict] = []
    for _ in range(repeats):
        out = subprocess.run(
            cmd, capture_output=True, text=True, cwd=REPO, env=os.environ.copy(),
        )
        lines = out.stdout.strip().splitlines()
        if out.returncode != 0 or not lines:
            raise RuntimeError(
                f"scaling leg (cores={cores}) failed rc={out.returncode}; "
                f"stderr tail: {out.stderr[-2000:]}"
            )
        draws.append(json.loads(lines[-1]))
    return draws




def main() -> None:
    import __spark_entry__ as entry_mod
    from dhr_spark.data.synthetic import synth_queries
    from dhr_spark.operators.wand import Searcher

    sf = _sf()
    n_convs = _n_convs(sf)
    timings: dict[str, float] = {}
    result: dict = {"sf": sf, "unit": "sec"}

    # ---- scaling legs: N vs 4N cores, isolated subprocesses, warmed ----
    # N=2 vs 4N=8 by default: this sandbox's 32 vCPUs are not frequency-
    # stable under full load (measured: pure-CPU multiprocessing itself only
    # scales 2.4x from 8->32 procs, i.e. a 0.59 HARDWARE ceiling, while 2->8
    # scales 3.4x = 0.85). The 2->8 range is where the box can actually
    # evidence software scaling; absolute throughput is still reported at
    # the full core count below.
    if DO_SCALING and CPUS >= 8:
        low = int(os.environ.get("SPARK_GRAFT_SCALE_N", "2"))
        high = low * 4
        # larger corpus for the scaling legs: fixed per-job costs (driver
        # collects, stage scheduling) must amortize the way they do on a
        # multi-hour cluster build, or they cap the 4N leg. 8x the query
        # corpus ≈ 1M turns at sf0.1 — measured build eff 0.82 / query 0.90
        # there vs 0.77 at 0.5M (fixed-cost fraction still visible).
        n_scale = n_convs * 8
        # INTERLEAVED PAIRS, median-of-N: the VM's dominant noise is drift
        # in multi-core effective throughput (frequency/neighbor state) that
        # a single-core canary cannot see — measured r03: all canaries
        # within 17% while the 2c leg drew 25% above its historical band and
        # 8c sat mid-band, collapsing a legs-run-apart ratio to 0.55. Each
        # efficiency sample therefore comes from a lo-draw and hi-draw run
        # BACK TO BACK (shared ambient window); the published number is the
        # median over pairs, with every pair + its per-draw canaries in the
        # JSON as evidence.
        repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
        max_pairs = int(os.environ.get("SPARK_GRAFT_BENCH_MAX_PAIRS", "5"))
        ratio = high / low
        pairs = []

        def _one_pair(flip: bool = False):
            # ALTERNATE the leg order across pairs: ambient throughput
            # drifts monotonically across a pair's few minutes more often
            # than it jumps, so a fixed lo-then-hi order biases every pair
            # the same way; lo→hi / hi→lo alternation makes the drift bias
            # cancel in the median instead of accumulating.
            if flip:
                d_hi = _run_leg_subprocess(high, n_scale, repeats=1)[0]
                d_lo = _run_leg_subprocess(low, n_scale, repeats=1)[0]
            else:
                d_lo = _run_leg_subprocess(low, n_scale, repeats=1)[0]
                d_hi = _run_leg_subprocess(high, n_scale, repeats=1)[0]
            # hardware's own scaling between the legs (all-core turbo +
            # ambient window state) — dividing Spark's speedup by it
            # isolates SOFTWARE scaling, the 4N-executor quantity
            hw_ratio = d_hi["cpu_capacity"] / d_lo["cpu_capacity"]
            membw_ratio = (
                d_hi["membw_capacity"] / d_lo["membw_capacity"]
                if d_lo.get("membw_capacity")
                else None
            )
            pairs.append(
                {
                    "low": d_lo,
                    "high": d_hi,
                    "hw_capacity_ratio": round(hw_ratio, 3),
                    "membw_ratio": round(membw_ratio, 3) if membw_ratio else None,
                    "build_efficiency": round(
                        d_hi["turns_per_sec"] / d_lo["turns_per_sec"] / ratio, 3
                    ),
                    "query_efficiency": round(
                        d_hi["queries_per_sec"] / d_lo["queries_per_sec"] / ratio,
                        3,
                    ),
                    "build_efficiency_vs_hw": round(
                        d_hi["turns_per_sec"] / d_lo["turns_per_sec"] / hw_ratio,
                        3,
                    ),
                    "query_efficiency_vs_hw": round(
                        d_hi["queries_per_sec"]
                        / d_lo["queries_per_sec"]
                        / hw_ratio,
                        3,
                    ),
                    # bandwidth-normalized: the fair ceiling for the
                    # shuffle/encode-bound fraction (one box = one memory
                    # bus; 4N executors = 4N buses)
                    "build_efficiency_vs_membw": (
                        round(
                            d_hi["turns_per_sec"]
                            / d_lo["turns_per_sec"]
                            / membw_ratio,
                            3,
                        )
                        if membw_ratio
                        else None
                    ),
                }
            )

        for i in range(repeats):
            _one_pair(flip=bool(i % 2))
        # adaptive extension: ambient multi-core slowdown windows hit the
        # high leg ~disproportionately (measured: 2c draws vary ±8% while
        # 8c draws swing ±30% below their clean ceiling). When the hi-leg
        # spread — or the per-pair efficiency spread itself (a boosted 2c
        # draw skews a pair just as hard as a degraded 8c one; measured
        # r03: eff band 0.57-0.75 while the hi legs agreed within 10%) —
        # shows we straddled windows, buy extra pairs so the median is
        # taken over more weather.
        while len(pairs) < max_pairs:
            his = [p["high"]["turns_per_sec"] for p in pairs]
            effs = [p["build_efficiency"] for p in pairs]
            if (
                max(his) / max(min(his), 1e-9) <= 1.25
                and max(effs) / max(min(effs), 1e-9) <= 1.2
            ):
                break
            _one_pair(flip=bool(len(pairs) % 2))
        # canary gate (BASELINE.md round-3 methodology, now enforced in
        # code): a pair is CLEAN iff both its draws' single-core canaries
        # sit within 20% of the fastest canary seen this run — i.e. both
        # legs executed in same-CPU-speed windows. Slow-window pairs stay
        # in the JSON as evidence but are excluded from the published
        # medians; if fewer than two clean pairs exist, buy extra pairs
        # (bounded) before publishing.
        CANARY_TOL = 1.2

        def _cny(d):
            return float(d.get("canary_sec", 9.9))

        def _best_canary():
            return min(
                min(_cny(p["low"]), _cny(p["high"])) for p in pairs
            )

        def _clean(p):
            return (
                max(_cny(p["low"]), _cny(p["high"]))
                <= _best_canary() * CANARY_TOL
            )

        extra_budget = 3
        while sum(_clean(p) for p in pairs) < 2 and extra_budget > 0:
            _one_pair(flip=bool(len(pairs) % 2))
            extra_budget -= 1
        clean_pairs = [p for p in pairs if _clean(p)] or pairs
        be = sorted(p["build_efficiency"] for p in clean_pairs)
        qe = sorted(p["query_efficiency"] for p in clean_pairs)
        med = statistics.median
        # representative legs: the pair whose build efficiency is the median
        rep = min(
            clean_pairs, key=lambda p: abs(p["build_efficiency"] - med(be))
        )
        leg_lo, leg_hi = rep["low"], rep["high"]
        result["scaling"] = {
            "cores_low": low, "cores_full": high,
            "n_turns": leg_lo["n_turns"],
            "build_sec_low": leg_lo["build_sec"],
            "build_sec_full": leg_hi["build_sec"],
            "turns_per_sec_low": leg_lo["turns_per_sec"],
            "turns_per_sec_full": leg_hi["turns_per_sec"],
            "build_speedup": round(med(be) * ratio, 3),
            "build_efficiency": round(med(be), 3),
            "queries_per_sec_low": leg_lo.get("queries_per_sec"),
            "queries_per_sec_full": leg_hi.get("queries_per_sec"),
            "query_efficiency": round(med(qe), 3),
            "method": "median over canary-clean interleaved lo/hi pairs (shared ambient window per pair)",
            "pairs": pairs,
            "canary_gated": True,
            "pairs_total": len(pairs),
            "pairs_clean": len(clean_pairs),
            "build_efficiency_band": [be[0], be[-1]],
            "query_efficiency_band": [qe[0], qe[-1]],
            # ambient slowdown degrades the HIGH leg almost exclusively,
            # biasing every pair's ratio downward — the best pair is the
            # least-noise-biased estimate of true software scaling, the
            # median the conservative headline
            "build_efficiency_best_pair": be[-1],
            "query_efficiency_best_pair": qe[-1],
            # hardware-normalized: Spark's speedup divided by the same
            # windows' pure-CPU capacity ratio (see _mp_capacity) — what a
            # real 4N-executor cluster, with 4N full-speed cores, would see
            "build_efficiency_vs_hw": round(
                med(sorted(p["build_efficiency_vs_hw"] for p in clean_pairs)), 3
            ),
            "query_efficiency_vs_hw": round(
                med(sorted(p["query_efficiency_vs_hw"] for p in clean_pairs)), 3
            ),
            "build_efficiency_vs_membw": round(
                med(
                    sorted(
                        p["build_efficiency_vs_membw"]
                        for p in clean_pairs
                        if p.get("build_efficiency_vs_membw")
                    )
                ),
                3,
            )
            if any(p.get("build_efficiency_vs_membw") for p in clean_pairs)
            else None,
        }

    # ---- main leg at full cores (warm JVM via a small untimed build) ----
    # best-of-2 on the timed build AND query batch: this VM shows ±15%
    # ambient run-to-run noise (BASELINE.md §scaling-methodology); a single
    # sample aliases that noise into the round-over-round regression signal
    # (BENCH_r01's 32c build read 28% low on one draw)
    # adaptive draw count: the VM shows multi-minute windows where EVERYTHING
    # runs 2-9x slow (measured: back-to-back build draws of 13.7s and 123s,
    # same code, same data). Two draws both inside such a window would
    # commit a number that is pure weather; when the spread says the draws
    # straddled a window, buy extra draws (bounded) and take the min —
    # steady-state throughput is what a cluster job sees.
    def _adaptive_runs(fn, lo=2, hi=4, spread=1.3):
        runs = [fn() for _ in range(lo)]
        while len(runs) < hi and max(runs) / max(min(runs), 1e-9) > spread:
            runs.append(fn())
        return runs

    spark = _spark(CPUS)
    idx = f"/tmp/dhr_bench_idx_full{CPUS}"
    _build(spark, 200, f"/tmp/dhr_bench_warm_main")
    _n_state = {}

    def _one_build():
        dt, _n_state["n"] = _build(spark, n_convs, idx)
        return dt

    build_runs = _adaptive_runs(_one_build)
    n_turns = _n_state["n"]
    t_build = min(build_runs)
    timings["index_build"] = round(t_build, 2)
    result["build_runs_sec"] = [round(x, 2) for x in build_runs]

    # ---- batch query throughput (k=1000 WAND) ----
    queries = synth_queries(spark, n_queries=N_QUERIES).cache()
    queries.count()
    searcher = Searcher(spark, idx)
    searcher.search(queries.limit(5), k=K).count()  # warm

    def _one_batch():
        t0 = time.time()
        _n_state["out"] = searcher.search(queries, k=K).count()
        return time.time() - t0

    query_runs = _adaptive_runs(_one_batch)
    n_out = _n_state["out"]
    t_batch = min(query_runs)
    timings["wand_batch_200q"] = round(t_batch, 2)
    result["query_runs_sec"] = [round(x, 2) for x in query_runs]

    # ---- p50 single-query latency (interactive serving mode) ----
    # a point-query tier disables AQE and narrows shuffles (Searcher
    # interactive=True, measured 1.65 -> 1.21 s p50); restore the batch
    # conf afterwards for the per-op timings below
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
    searcher_i = Searcher(spark, idx, interactive=True)
    lat = []
    for row in queries.limit(N_LATENCY_SAMPLES).collect():
        q1 = spark.createDataFrame([(row["qid"], row["text"])], "qid string, text string")
        t0 = time.time()
        searcher_i.search(q1, k=K).count()
        lat.append(time.time() - t0)
    p50 = statistics.median(lat) if lat else 0.0
    spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
    spark.conf.set("spark.sql.shuffle.partitions", prev_sp)

    # ---- incremental refresh throughput (append 1/8 of the corpus) ----
    # the 10^12-turn operating mode: per-batch refresh must cost O(batch),
    # not O(corpus) — report the append's own turns/sec next to the full
    # rebuild rate (index/incremental.py). Runs AFTER the query benchmarks:
    # the append mutates the benched index.
    from dhr_spark.data.synthetic import synth_transcripts
    from dhr_spark.index.incremental import append_to_index
    from pyspark.sql import functions as SF

    batch = synth_transcripts(spark, n_convs=max(50, n_convs // 8), seed=9).withColumn(
        "conv_id", SF.concat(SF.lit("inc-"), SF.col("conv_id"))
    )
    t0 = time.time()
    man_inc = append_to_index(spark, batch, idx)
    t_append = time.time() - t0
    append_turns = int(man_inc["n_docs"]) - n_turns
    timings["incremental_append"] = round(t_append, 2)
    result["append_turns_per_sec"] = round(append_turns / t_append, 1)
    result["append_batch_turns"] = append_turns

    # ---- distributed big-batch path (100k queries, no driver state) ----
    # Searcher.search_batch — the offline-eval regime the
    # MAX_COLLECTED_QUERIES gate routes here. Selective (rare tail-term)
    # queries over a sf0.01-scale index: with this generator's 31-word
    # head vocabulary, head-term queries match most of the corpus, so an
    # exhaustive no-pruning pass over the full sf corpus is O(|Q|·corpus)
    # by construction (measured 500+s) — the selective-query shape is the
    # one real offline evals have. The row times ONLY the batch (the
    # small index build is untimed).
    idx_bb = f"/tmp/dhr_bench_idx_bb{CPUS}"
    _build(spark, max(60, n_convs // 10), idx_bb)
    qbig = spark.range(100_000).select(
        SF.format_string("bq-%06d", SF.col("id")).alias("qid"),
        SF.format_string(
            "tk%04d tk%04d",
            SF.pmod(SF.col("id"), SF.lit(2000)),
            SF.pmod(SF.col("id") * 7 + 13, SF.lit(2000)),
        ).alias("text"),
    )
    # best-of-2 like every other per-op row: the first call additionally
    # pays one-time JIT/codegen for the batch plan, which is not the
    # steady-state offline-eval cost this row estimates
    t_bb, n_bb = float("inf"), 0
    for _ in range(2):
        t0 = time.time()
        n_bb = Searcher(spark, idx_bb).search_batch(qbig, k=10).count()
        t_bb = min(t_bb, time.time() - t0)
    timings["bm25_bigbatch_100k"] = round(t_bb, 2)
    result["bigbatch_queries_per_sec"] = round(100_000 / t_bb, 1)
    result["bigbatch_rows"] = int(n_bb)

    # same batch against a PFOR index: search_batch is the bulk-decode tier
    # the packed codec exists for (one full decode of every matched list,
    # no block skipping) — the mixed-tier manifest (compact_index(codec=
    # "pfor")) routes cold chunks here while serving chunks stay varint
    idx_bbp = f"/tmp/dhr_bench_idx_bbp{CPUS}"
    _build(spark, max(60, n_convs // 10), idx_bbp, codec="pfor")
    t_bbp, n_bbp = float("inf"), 0
    for _ in range(2):
        t0 = time.time()
        n_bbp = Searcher(spark, idx_bbp).search_batch(qbig, k=10).count()
        t_bbp = min(t_bbp, time.time() - t0)
    timings["bm25_bigbatch_100k_pfor"] = round(t_bbp, 2)
    result["bigbatch_pfor_queries_per_sec"] = round(100_000 / t_bbp, 1)
    assert int(n_bbp) == int(n_bb)

    # ---- packed codec comparison (FOR / PFOR postings, index/codec.py) --
    # same corpus, same geometry: each row pair evidences both the byte
    # shrink and that the packed decode holds query throughput. Runs on
    # its own dirs — the append above mutated the varint index; the
    # varint baseline bytes come from its pre-append chunk set (append
    # chunks carry higher chunk ids).
    from dhr_spark.index.builder import load_manifest

    man_var = load_manifest(idx)
    b_var = None
    for codec in ("for", "pfor"):
        idx_c = f"/tmp/dhr_bench_idx_{codec}{CPUS}"
        t_build_c = min(
            _build(spark, n_convs, idx_c, codec=codec)[0] for _ in range(2)
        )
        timings[f"index_build_{codec}"] = round(t_build_c, 2)
        searcher_c = Searcher(spark, idx_c)
        searcher_c.search(queries.limit(5), k=K).count()  # warm
        t_c = float("inf")
        for _ in range(2):
            t0 = time.time()
            searcher_c.search(queries, k=K).count()
            t_c = min(t_c, time.time() - t0)
        timings[f"wand_batch_200q_{codec}"] = round(t_c, 2)
        man_c = load_manifest(idx_c)
        b_c = sum(int(c["bytes"]) for c in man_c["chunks"].values())
        if b_var is None:
            b_var = sum(
                int(man_var["chunks"][c]["bytes"])
                for c in man_c["chunks"]
                if c in man_var["chunks"]
            )
            result["postings_bytes_varint"] = b_var
        result[f"postings_bytes_{codec}"] = b_c
        result[f"{codec}_bytes_ratio"] = (
            round(b_c / b_var, 4) if b_var else None
        )

    # ---- headline operator timings over the testdata tables ----
    qmap = entry_mod.queries()
    # warm the entry's documents-corpus index untimed: wand_topk must time
    # the QUERY, not a one-time index build into the /tmp cache
    entry_mod._wand_index_dir(spark, SF_DIR)
    for name in [
        "bm25_topk", "wand_topk", "dedup_exact", "dedup_minhash_lsh",
        "dedup_minhash_verified", "dedup_simhash", "dedup_simhash_pairs",
        "ann_bruteforce", "ann_quantized", "ann_pq", "ann_ivfpq",
        "text_quality", "text_fingerprint",
        "phrase_match", "phrase_batch", "text_snippet", "text_repetition",
        "rm3_topk", "conv_documents", "sample_split", "aggpool_vectors",
        "highlight_topk", "syntax_topk", "hit_counts", "search_after_page",
        "dismax_topk", "explain_scores", "term_suggest", "mlt_topk",
        "fuzzy_topk", "range_topk", "collapse_hits", "decontaminate",
        "qld_topk", "qld_vs_slow_identity", "rocchio_topk", "regexp_topk",
        "span_first", "blockjoin_topk", "span_or_index", "synonym_index_topk",
        "f2log_topk", "tfidf_topk", "inl2_topk", "spl_topk",
        "sample_temperature",
        "sharded_range_topk", "percolate_topk",
        "boosted_topk", "recency_topk",
        "impact_topk", "dedup_dup_spans", "sketch_kmv", "cori_shard_ranks",
        "sql_bm25_topk", "sorted_index_topk", "sorted_after_page",
        "complete_suggest",
        "phrase_prefix", "composite_hits", "phrase_suggest", "ltr_features",
        "dsir_sample", "intervals_ordered", "intervals_unordered",
        "dedup_semdedup", "redde_shard_ranks", "sketch_quantiles",
        "err_at_10", "iprec_curve",
    ]:
        # best-of-2: each op is 0.2-4s, so the second draw is cheap and
        # halves the ambient-noise variance in the committed per-op table
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            qmap[name](spark, SF_DIR).count()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 2)

    spark.stop()

    result.update(
        {
            "metric": "index build + query (block-max WAND, k=1000)",
            "value": round(t_build + t_batch, 2),
            "queries": timings,
            "n_turns": n_turns,
            "turns_per_sec": round(n_turns / t_build, 1),
            "queries_per_sec": round(N_QUERIES / t_batch, 2),
            "p50_query_latency_sec": round(p50, 3),
            "topk_rows": n_out,
            "cores": CPUS,
        }
    )
    print(json.dumps(result))


if __name__ == "__main__":
    if len(sys.argv) >= 4 and sys.argv[1] == "--leg":
        run_leg(int(sys.argv[2]), int(sys.argv[3]))
    else:
        main()
