"""Standing queries over an incrementally-appended index (percolation).

The Elasticsearch percolate / Lucene-Luwak "reverse search" shape, re-cast
for a batch-append pipeline: instead of matching one incoming document
against a store of queries, each ``poll()`` matches everything indexed
since the last poll against the standing query set and returns only those
new hits — the alerting loop a 10^12-turn ingest pipeline runs after every
micro-batch (streaming/ingest.refresh_index → Percolator.poll).

Why this is cheap here: appends allocate docids only at-or-past the prior
``next_docid`` (index/incremental.py), so "new since watermark W" is a
chunk-partition-pruned scan of the segments written after W plus one exact
docid gate (Searcher.search_min_docid). Cost is proportional to the BATCH,
not the index — the property that makes per-micro-batch alerting viable at
10^12 docs.

Semantics notes (documented, deliberate):
* Scores use the LIVE corpus statistics at poll time, like every
  filter-context query — two polls over identical new docs can score
  differently if the corpus grew in between (exactly as Lucene/ES
  percolation scores against the current index state).
* At-least-once across crashes: the watermark lives in this object; a
  restarted Percolator re-alerts anything since its construction
  watermark. Persist ``watermark`` alongside the consumer's own offsets
  for exactly-once delivery (the same discipline as streaming/ingest's
  batch ids).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dhr_spark.index.builder import load_manifest


class Percolator:
    """Match standing queries against everything indexed after a watermark.

    ``queries``: (qid, text) DataFrame — the registered alert queries.
    ``from_start=True`` alerts on the existing corpus too (first poll
    returns hits over every live doc); default alerts only on appends made
    after construction.
    """

    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        queries: DataFrame,
        k: int = 1000,
        from_start: bool = False,
        sim: str = "bm25",
        sim_param: float | None = None,
    ):
        man = load_manifest(index_dir)
        if man is None:
            raise FileNotFoundError(f"no manifest in {index_dir}")
        self.spark = spark
        self.index_dir = index_dir
        self.queries = queries
        self.k = int(k)
        self.sim = sim
        self.sim_param = sim_param
        self.watermark = 0 if from_start else int(man["next_docid"])

    def poll(self) -> DataFrame:
        """(qid, docid, rank, score) over docs indexed since the last poll
        (rank is per-qid within this batch of new docs). Advances the
        watermark to the CURRENT manifest's next_docid; returns an empty
        frame when nothing new was appended."""
        from dhr_spark.operators.wand import Searcher

        man = load_manifest(self.index_dir)
        if man is None:
            raise FileNotFoundError(f"no manifest in {self.index_dir}")
        cur = int(man["next_docid"])
        if cur <= self.watermark:
            return self.spark.createDataFrame(
                [], "qid string, docid long, rank int, score double"
            )
        # fresh Searcher per poll: the manifest (chunks, stats, term dict
        # pointer) moved with the append; construction cost is one
        # dictionary load, amortized across the whole standing query set
        hits = Searcher(self.spark, self.index_dir).search_min_docid(
            self.queries, self.watermark, k=self.k,
            sim=self.sim, sim_param=self.sim_param,
        )
        self.watermark = cur
        return hits
