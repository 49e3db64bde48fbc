"""Physical index merge — Lucene ``IndexWriter.addIndexes(Directory...)``.

Folds a separately-built index (``src``) into another (``dst``) with ZERO
re-tokenization and ZERO postings decode/re-encode. This is possible because
of two layout decisions the builder made for scale:

* postings blobs are self-contained per (chunk, term) row — each block's
  first docid is stored absolute (index/segments.py block encode), so a row
  is valid wherever it lives as long as its docids stay unchanged. Merging
  indexes whose CHUNK SETS are disjoint therefore never touches a blob.
* segments are stats-free (per-block max_tf/min_dl) — idf/avgdl are applied
  query-side from the dictionary + manifest, so src rows stay admissible
  under the merged corpus statistics with no rewrite (the same property that
  makes incremental appends sound, index/incremental.py).

The only data that must change is the TERM-ID SPACE: the two builds assigned
dense ids independently. Shared terms take dst's id; src-only terms get
fresh ids after dst's maximum (src-df DESC, term ASC — the same
deterministic order appends use). The remap is a column rewrite of src's
segment/forward/positions rows (a dictionary-sized join against rows that
carry the blobs OPAQUELY — the blobs themselves are never parsed).

Cost at scale: O(|src| columnar metadata) writes + one dictionary-sized
join; dst is never read beyond its dictionary and manifest, and nothing is
re-scored. Merging a 10^11-turn backfill shard into a live index moves
bytes, not CPU. The reference's analogue is its split-index concat
(/root/reference/retrieval/index.py:26-47, np.concatenate of pickled
shards); the Lucene analogue is addIndexes, whose "docbase renumbering" we
replace with the chunk-disjointness contract (range-sharded builds already
allocate docids from a global sequence, index/sharded.py).

Contract (validated, ValueError on violation):

* both manifests version >= 2, same chunk_bits / block_size /
  analyzer_mode / scoring family; neither statically pruned
  (``prune_per_term`` is a corpus-global cut, same refusal as appends);
* identical artifact sets (forward_index / positional / stored / docvalues /
  doc_map presence, ctf column presence) — merging a forward-indexed dst
  with a src lacking one would leave the feature half-populated;
* chunk sets disjoint (docid ranges may interleave at chunk granularity —
  per-chunk top-k merges losslessly either way).

Query-time parameters (k1/b) keep dst's manifest defaults — they are
per-Searcher overrides, not index state. Committed src tombstones carry
over as one new tomb_batch; exact-stats deletes already subtracted their
df/dl in src's dictionary/manifest, so the merged stats inherit the
subtraction automatically.

After the merge, searches over dst are score-identical to an index built
over the union corpus (tested: tests/test_merge.py), because every scoring
input — postings, tf, dl, df, ctf, n_docs, total_dl — is either untouched
or exactly additive.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dhr_spark.functions.bm25 import idf_col
from dhr_spark.index.builder import (
    _write_manifest,
    load_manifest,
    read_tombstones,
)
from dhr_spark.operators.docids import with_global_ids

# below this many src-only+shared terms the remap is broadcast; above, a
# plain shuffle join (AQE) — the blobs ride one exchange, never more
BROADCAST_TERM_CAP = 2_000_000

_EQUAL_KEYS = ("chunk_bits", "block_size", "analyzer_mode", "codec")


def _validate(dst: dict, src: dict, dst_dir: str, src_dir: str) -> None:
    problems: list[str] = []
    for m, d in ((dst, dst_dir), (src, src_dir)):
        if int(m.get("version", 1)) < 2:
            problems.append(f"{d}: merge requires a version>=2 index")
        if m.get("prune_per_term"):
            problems.append(
                f"{d}: statically pruned (prune_per_term="
                f"{m['prune_per_term']}) — the per-term cut is corpus-global "
                "and cannot be extended by a merge; rebuild to re-prune"
            )
    defaults = {"codec": "varint"}
    for k in _EQUAL_KEYS:
        if dst.get(k, defaults.get(k)) != src.get(k, defaults.get(k)):
            problems.append(
                f"{k} differs: dst={dst.get(k)!r} vs src={src.get(k)!r}"
            )
    if dst.get("scoring") != src.get("scoring"):
        problems.append(
            f"scoring family differs: dst={dst.get('scoring')!r} vs "
            f"src={src.get('scoring')!r} (impact and tf/dl postings store "
            "different integers in the tf stream)"
        )
    for flag in ("forward_index", "positional", "stored"):
        if bool(dst.get(flag)) != bool(src.get(flag)):
            problems.append(
                f"{flag} differs: dst={bool(dst.get(flag))} vs "
                f"src={bool(src.get(flag))} — the merged feature would be "
                "half-populated"
            )
    if set(dst.get("docvalues") or []) != set(src.get("docvalues") or []):
        problems.append(
            f"docvalues differ: dst={sorted(dst.get('docvalues') or [])} vs "
            f"src={sorted(src.get('docvalues') or [])}"
        )
    if (dst.get("index_sort") or None) != (src.get("index_sort") or None):
        problems.append(
            f"index_sort differs: dst={dst.get('index_sort')} vs "
            f"src={src.get('index_sort')} — the sorted-search fast path "
            "needs every chunk internally sorted by the SAME field/"
            "direction"
        )
    if src.get("dv_gens"):
        problems.append(
            f"{src_dir}: has committed docvalue update generations "
            f"({sorted(src['dv_gens'])}) — the merge copies doc_map rows, "
            "not dv sidecars, and would silently lose the updates; "
            "materialize or drop them first (dst generations are kept)"
        )
    overlap = set(dst["chunks"]) & set(src["chunks"])
    if overlap:
        problems.append(
            f"chunk sets overlap ({sorted(overlap)[:5]}…): build src with "
            "docids above dst's chunk ceiling (or any disjoint chunk range)"
        )
    if problems:
        raise ValueError("cannot merge indexes: " + "; ".join(problems))


def merge_indexes(
    spark: SparkSession,
    dst_dir: str,
    src_dir: str,
    extra_manifest: dict | None = None,
) -> dict:
    """Fold the committed index at ``src_dir`` into ``dst_dir`` physically.

    Idempotent under crash-and-retry exactly like appends: every write is a
    dynamic partition overwrite of partitions only this merge produces
    (src's chunk ids / a fresh seg_batch / a fresh tomb_batch / a fresh
    versioned dictionary dir), and the dst manifest rewrite is the single
    atomic commit point. ``src_dir`` is never modified.

    Returns dst's updated manifest.
    """
    t0 = time.time()
    dst_man = load_manifest(dst_dir)
    src_man = load_manifest(src_dir)
    if dst_man is None:
        raise FileNotFoundError(f"no manifest in {dst_dir}")
    if src_man is None:
        raise FileNotFoundError(f"no manifest in {src_dir}")
    _validate(dst_man, src_man, dst_dir, src_dir)

    dst_dm = os.path.isdir(os.path.join(dst_dir, "doc_map"))
    src_dm = os.path.isdir(os.path.join(src_dir, "doc_map"))
    if dst_dm != src_dm:
        raise ValueError(
            f"doc_map presence differs (dst={dst_dm}, src={src_dm})"
        )

    # ---- dictionary merge: dst ids are authoritative; src-only terms get
    # fresh ids after dst's maximum (src df DESC, term ASC) ---------------
    dstd = spark.read.parquet(
        os.path.join(dst_dir, dst_man.get("term_dict_dir", "term_dict"))
    )
    srcd = spark.read.parquet(
        os.path.join(src_dir, src_man.get("term_dict_dir", "term_dict"))
    )
    has_ctf = "ctf" in dstd.columns
    if has_ctf != ("ctf" in srcd.columns):
        raise ValueError(
            "ctf column presence differs between the dictionaries — QLD/LM "
            "similarities would score from a half-populated column; rebuild "
            "the older index once with the current builder"
        )
    stat_cols = ["df"] + (["ctf"] if has_ctf else [])
    d = dstd.select("term", "term_id", *stat_cols)
    s = srcd.select(
        "term",
        F.col("term_id").alias("src_term_id"),
        *[F.col(c).alias(f"{c}_s") for c in stat_cols],
    )
    joined = d.join(s, "term", "full_outer").cache()

    n_docs = int(dst_man["n_docs"]) + int(src_man["n_docs"])
    total_dl = int(dst_man["total_dl"]) + int(src_man["total_dl"])
    avgdl = total_dl / max(n_docs, 1)

    known = joined.filter(F.col("term_id").isNotNull()).select(
        "term",
        "term_id",
        "src_term_id",
        *[
            (
                F.coalesce(F.col(c), F.lit(0))
                + F.coalesce(F.col(f"{c}_s"), F.lit(0))
            )
            .cast("long")
            .alias(c)
            for c in stat_cols
        ],
    )
    fresh = with_global_ids(
        joined.filter(F.col("term_id").isNull()).select(
            "term",
            "src_term_id",
            *[F.col(f"{c}_s").cast("long").alias(c) for c in stat_cols],
        ),
        [F.col("df").desc(), F.col("term").asc()],
        "_new_id",
    ).select(
        "term",
        (F.col("_new_id") + F.lit(int(dst_man["n_terms"])))
        .cast("long")
        .alias("term_id"),
        "src_term_id",
        *stat_cols,
    )
    tdict = (
        known.unionByName(fresh)
        .withColumn("idf", idf_col(F.col("df"), F.lit(n_docs)))
        .cache()
    )
    n_terms = tdict.count()

    # src_term_id -> merged term_id, for every term src knows
    remap = tdict.filter(F.col("src_term_id").isNotNull()).select(
        F.col("src_term_id"), F.col("term_id").alias("new_term_id")
    )
    n_src_terms = int(src_man["n_terms"])
    if n_src_terms <= BROADCAST_TERM_CAP:
        remap = F.broadcast(remap)

    def _remapped(reldir: str) -> DataFrame:
        rel = spark.read.parquet(os.path.join(src_dir, reldir))
        keep = [c for c in rel.columns if c != "term_id"]
        return (
            rel.withColumnRenamed("term_id", "src_term_id")
            .join(remap, "src_term_id")
            .select(*keep, F.col("new_term_id").alias("term_id"))
        )

    dyn = {"partitionOverwriteMode": "dynamic"}

    def _write_chunked(df: DataFrame, reldir: str) -> None:
        # one file per chunk partition, same clustering as the builder
        (
            df.repartition("chunk")
            .write.mode("overwrite")
            .options(**dyn)
            .partitionBy("chunk")
            .parquet(os.path.join(dst_dir, reldir))
        )

    # ---- segments: term_id column rewrite, blobs copied opaquely ---------
    _write_chunked(_remapped("segments"), "segments")
    # ---- doclens: no term ids inside — verbatim chunk copy ---------------
    _write_chunked(
        spark.read.parquet(os.path.join(src_dir, "doclens")), "doclens"
    )
    if dst_man.get("forward_index"):
        _write_chunked(_remapped("forward"), "forward")
    if dst_man.get("positional"):
        _write_chunked(_remapped("positions"), "positions")
    if dst_man.get("stored"):
        _write_chunked(
            spark.read.parquet(os.path.join(src_dir, "stored")), "stored"
        )

    op_no = int(dst_man.get("appends", 0)) + 1
    if src_dm:
        src_map = spark.read.parquet(os.path.join(src_dir, "doc_map"))
        dst_cols = [
            c
            for c in spark.read.parquet(
                os.path.join(dst_dir, "doc_map")
            ).columns
            if c != "seg_batch"
        ]
        missing = [c for c in dst_cols if c not in src_map.columns]
        if missing:
            raise ValueError(
                f"src doc_map is missing columns {missing} that dst carries"
            )
        (
            src_map.select(*dst_cols)
            .withColumn("seg_batch", F.lit(op_no))
            .write.mode("overwrite")
            .options(**dyn)
            .partitionBy("seg_batch")
            .parquet(os.path.join(dst_dir, "doc_map"))
        )

    # ---- committed src tombstones carry over as one new batch ------------
    src_tombs = read_tombstones(spark, src_dir, src_man)
    n_tombs_in = 0
    if src_tombs is not None:
        n_tombs_in = int(src_man.get("tombstones", 0))
        (
            src_tombs.withColumn("tomb_batch", F.lit(op_no))
            .write.mode("overwrite")
            .options(**dyn)
            .partitionBy("tomb_batch")
            .parquet(
                os.path.join(
                    dst_dir, dst_man.get("tombstones_dir", "tombstones")
                )
            )
        )

    td_dir = f"term_dict_v{op_no}"
    tdict.drop("src_term_id").write.mode("overwrite").parquet(
        os.path.join(dst_dir, td_dir)
    )

    chunks = dict(dst_man["chunks"])
    for cid, m in src_man["chunks"].items():
        chunks[cid] = dict(m)  # postings/bytes/terms/skew unchanged by remap

    man2 = dict(dst_man)
    man2.update(
        {
            "n_docs": n_docs,
            "avgdl": avgdl,
            "total_dl": total_dl,
            "next_docid": max(
                int(dst_man["next_docid"]), int(src_man["next_docid"])
            ),
            "n_terms": int(n_terms),
            "appends": op_no,
            "term_dict_dir": td_dir,
            "tombstones": int(dst_man.get("tombstones", 0)) + n_tombs_in,
            "chunks": chunks,
            "last_merge": {
                "src": os.path.abspath(src_dir),
                "src_docs": int(src_man["n_docs"]),
                "src_terms": n_src_terms,
                "src_tombstones": n_tombs_in,
                "src_last_delete": src_man.get("last_delete"),
                "seconds": round(time.time() - t0, 2),
            },
        }
    )
    if extra_manifest:
        man2.update(extra_manifest)
    _write_manifest(dst_dir, man2)
    joined.unpersist()
    tdict.unpersist()
    return man2
