"""SparkSession factory with scale-oriented defaults.

Designed for multi-executor clusters (AQE on, Arrow on, sensible shuffle
partitioning); tested on local[N].
"""

from __future__ import annotations

import os
import re

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "dhr_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or max(cpus, 8)
    # heap sized to parallelism, capped: measured on this workload, 8-16g is
    # the sweet spot at 32 slots — huge heaps (48g) REGRESSED build time ~2x
    # (GC ergonomics / page-touch costs dominate), tiny heaps thrash GC
    m = re.match(r"local\[(\d+)\]", master)
    n_slots = int(m.group(1)) if m else cpus
    default_mem = f"{min(16, max(8, n_slots // 2))}g"
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime coalesce + skew-join split complement our explicit salting
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow for all pandas UDF exchange (no per-row Python on the hot path)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 32k rows/batch: fewer Arrow boundaries for the fused tokenize+TF
        # kernel (best-of-N build ~13.3k vs ~11.9k turns/s at 10k rows);
        # 64k regressed (batch imbalance) — don't raise further blindly
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "32768")
        # one-shot limit evaluation: CollectLimit's default 1→4→16… partition
        # escalation costs one full job-scheduling round per step — a point
        # query's tiny (qid, text) frame spread over defaultParallelism
        # partitions paid FOUR jobs (~0.7s of a 1.3s p50) just collecting
        # the query row. Covering all partitions in round one is scale-safe
        # here: every limit+collect in this engine runs on query/result/
        # metadata frames, never an unbounded corpus scan.
        .config("spark.sql.limit.initialNumPartitions", str(max(cpus * 4, 64)))
        .config("spark.driver.memory", os.environ.get("DHR_DRIVER_MEM", default_mem))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    # Shuffle/spill scratch: OPT-IN tmpfs only. DHR_LOCAL_DIR pins a specific
    # directory; DHR_SHM_SCRATCH=1 selects RAM-backed /dev/shm — a measured
    # win on hosts whose local disk throttles concurrent writers (this test
    # sandbox: ~150MB/s, serialized every wide shuffle), but a failure mode
    # anywhere shuffle spill can exceed free RAM (tmpfs cannot spill to
    # disk). With neither set, spark.local.dir is left alone so cluster
    # resource managers keep control of scratch placement.
    local_dir = os.environ.get("DHR_LOCAL_DIR")
    if not local_dir and os.environ.get("DHR_SHM_SCRATCH") == "1" and os.path.isdir(
        "/dev/shm"
    ):
        local_dir = "/dev/shm/dhr-spark-local"
    if local_dir:
        b = b.config("spark.local.dir", local_dir)
    # shuffle/spill block codec A/B knob (lz4 default; zstd trades spare
    # CPU for shuffle bytes — relevant on membw-bound hosts and real
    # networks; see BASELINE.md round-5 scaling notes)
    io_codec = os.environ.get("DHR_IO_CODEC")
    if io_codec:
        b = b.config("spark.io.compression.codec", io_codec)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
