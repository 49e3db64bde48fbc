"""Index build orchestration: transcripts -> on-disk index + manifest.

On-disk layout (all parquet unless noted):
  <index_dir>/segments/   partitioned by chunk= (partition pruning at query)
  <index_dir>/doclens/
  <index_dir>/term_dict/
  <index_dir>/doc_map/
  <index_dir>/manifest.json   build params + global stats + per-chunk
                              lineage & metrics (postings, bytes, skew ratio)

Resumability (BASELINE.json north_rule): the manifest is the checkpoint.
``resume=True`` skips chunks already recorded as completed and appends only
the missing ones — idempotent at chunk granularity. The reference's analogue
is its per-split pickle files re-globbed by retrieval/index.py:26-47; ours
adds lineage + metrics per unit.

Resume is ONLY valid for re-running the SAME corpus after an interrupted
build: the term dictionary ordering (df DESC) is frozen in the prior
manifest, so rebuilding the remaining chunks over a grown corpus would
assign different term ids than the committed chunks carry. The build asserts
corpus identity (n_docs, avgdl, term count) against the prior manifest and
raises otherwise. For NEW data use index/incremental.append_to_index — the
v2 stats-free segment layout (per-block max_tf/min_dl, query-side idf/avgdl)
makes appends sound without touching committed chunks.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dhr_spark import B, K1
from dhr_spark.index.segments import build_doclens, build_segments
from dhr_spark.operators.docids import doc_map, with_docids
from dhr_spark.operators.stats import term_dictionary, term_stats
from dhr_spark.operators.termfreq import doc_term_freqs

MANIFEST = "manifest.json"


def _manifest_path(index_dir: str) -> str:
    return os.path.join(index_dir, MANIFEST)


def load_manifest(index_dir: str, snapshot: int | None = None) -> dict | None:
    """The CURRENT committed manifest, or — with ``snapshot`` — the exact
    manifest of that earlier commit (Iceberg-style point-in-time read; see
    _write_manifest for what a snapshot id is and when it expires)."""
    if snapshot is not None:
        p = os.path.join(index_dir, "snapshots", f"{int(snapshot)}.json")
        if not os.path.exists(p):
            raise FileNotFoundError(
                f"no snapshot {snapshot} in {index_dir}/snapshots "
                f"(have: {sorted(list_snapshots(index_dir))})"
            )
        with open(p) as f:
            return json.load(f)
    p = _manifest_path(index_dir)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def list_snapshots(index_dir: str) -> list[int]:
    """Committed snapshot ids, ascending (the current state is always the
    max id — every commit archives itself)."""
    d = os.path.join(index_dir, "snapshots")
    if not os.path.isdir(d):
        return []
    out = []
    for n in os.listdir(d):
        if n.endswith(".json"):
            try:
                out.append(int(n[:-5]))
            except ValueError:
                pass
    return sorted(out)


def rollback_index(index_dir: str, snapshot: int) -> dict:
    """Restore the index to an earlier snapshot's state — the undo for
    appends/deletes (Iceberg rollback). Data files are untouched: readers
    prune to the manifest's chunk list, orphaned newer chunks are invisible
    and a later append dynamic-partition-OVERWRITES them (the same
    invariant that makes crash-retry idempotent). The rollback itself
    commits as a NEW snapshot (audit trail preserved; roll-forward stays
    possible). Snapshots taken before a chunk-rewriting compaction's GC may
    reference replaced files — expired, exactly like Iceberg snapshots
    after expire_snapshots."""
    man = load_manifest(index_dir, snapshot=snapshot)
    man = dict(man)
    man.pop("snapshot_id", None)  # _write_manifest assigns the new id
    _write_manifest(index_dir, man)
    return man


def _write_manifest(index_dir: str, m: dict) -> None:
    """Atomic commit + self-archive: every committed manifest also lands in
    snapshots/<snapshot_id>.json, giving point-in-time reads
    (Searcher(snapshot=)) and rollback for free. The id is assigned here —
    monotone per index, prior+1 — and written into the caller's dict so
    returned manifests carry it. Crash between the snapshot write and the
    manifest replace leaves an orphan snapshot file; the retry re-derives
    the same id and overwrites it."""
    os.makedirs(index_dir, exist_ok=True)
    prior = load_manifest(index_dir)
    m["snapshot_id"] = (
        int(prior.get("snapshot_id", 0)) + 1 if prior is not None else 1
    )
    blob = json.dumps(m, indent=1, sort_keys=True)
    snap_dir = os.path.join(index_dir, "snapshots")
    os.makedirs(snap_dir, exist_ok=True)
    snap_tmp = os.path.join(snap_dir, f"{m['snapshot_id']}.json.tmp")
    with open(snap_tmp, "w") as f:
        f.write(blob)
    os.replace(snap_tmp, os.path.join(snap_dir, f"{m['snapshot_id']}.json"))
    tmp = _manifest_path(index_dir) + ".tmp"
    with open(tmp, "w") as f:
        f.write(blob)
    os.replace(tmp, _manifest_path(index_dir))  # atomic commit


def auto_chunk_bits(
    docid_space: int, cores: int, chunks_per_core: int = 4
) -> int:
    """Pick chunk_bits so the index has ~``chunks_per_core`` chunks per
    core (bounded to [10, 22] bits, i.e. 1k-4M docs per chunk).

    Why it matters (measured, BASELINE.md round-3 corpus-scale section): the
    batch query kernel parallelizes per chunk and the global top-k merge
    moves n_chunks * k * |Q| rows — a 9.3M-doc corpus built at
    chunk_bits=12 (2,278 chunks) answered the 200-query batch at 3-4 q/s,
    the same corpus at chunk_bits=17 (72 chunks) is the intended shape.
    Too FEW chunks starves parallelism and bloats per-chunk decode memory.
    At real cluster scale pass total executor cores, not one node's."""
    import math

    target = max(32, cores * chunks_per_core)
    bits = math.ceil(math.log2(max(1.0, docid_space / target)))
    return max(10, min(22, bits))


def read_tombstones(
    spark: SparkSession, index_dir: str, manifest: dict
) -> DataFrame | None:
    """COMMITTED tombstoned docids as a (docid) DataFrame, or None when the
    manifest records none.

    Tombstone dirs are ``tomb_batch``-partitioned and every mutating op
    (conversation append, explicit delete) writes its partition BEFORE the
    manifest commit — so a crash between the two leaves an orphan
    ``tomb_batch`` partition on disk whose docids were never accounted for
    in the manifest's stats. Reading the whole dir would mask those docs
    while their df/dl contributions still count (score drift), and a
    retried op that anti-joins "prior tombstones" would silently skip
    re-deriving them. The manifest is the commit point, so committed ⇔
    ``tomb_batch <= manifest["appends"]`` (compaction carries survivors as
    batch 0 in a fresh versioned dir): the partition-column filter prunes
    orphans without listing their files.
    """
    if not int(manifest.get("tombstones", 0)):
        return None
    tomb_dir = os.path.join(
        index_dir, manifest.get("tombstones_dir", "tombstones")
    )
    committed = int(manifest.get("appends", 0))
    return (
        spark.read.parquet(tomb_dir)
        .filter(F.col("tomb_batch") <= committed)
        .select("docid")
    )


def build_index(
    spark: SparkSession,
    transcripts: DataFrame,
    index_dir: str,
    analyzer_mode: str = "lucene",
    chunk_bits: int | str = 17,
    block_size: int = 128,
    k1: float = K1,
    b: float = B,
    docid_strategy: str = "scalable",
    resume: bool = False,
    forward_index: bool = False,
    positional: bool = False,
    stored: bool = False,
    docvalues: tuple[str, ...] | list[str] = (),
    index_sort: tuple[str, bool] | None = None,
    extra_manifest: dict | None = None,
    codec: str = "varint",
) -> dict:
    """Build (or resume) an index over transcripts (conv_id, turn_idx, ...,
    text): assigns stable docids, then delegates to build_index_from_docs.
    ``extra_manifest`` fields ride the SINGLE atomic manifest commit
    (build_index_from_docs) — e.g. the clustered-reorder marker.

    ``docvalues``: transcript columns (e.g. role, ts) carried into doc_map
    as per-doc columnar fields — the Lucene DocValues analogue backing
    Searcher.search_sorted / result_facets.

    ``index_sort``: ``(field, ascending)`` — Lucene
    ``IndexWriterConfig.setIndexSort``: docids are assigned in (field,
    conv_id, turn_idx) order instead of corpus order, so matching-docs-
    sorted-by-field queries early-terminate per chunk instead of sorting
    the full match set (Searcher.search_sorted fast path; the field is
    auto-declared a docvalue). Appends keep the PER-CHUNK invariant
    (index/incremental.py sorts each batch), which is all the query path
    needs."""
    order = None
    if index_sort is not None:
        field, asc = index_sort
        if field not in transcripts.columns:
            raise ValueError(
                f"index_sort field {field!r} not in transcript columns "
                f"{sorted(transcripts.columns)}"
            )
        from dhr_spark.operators.docids import ORDER_COLS

        if field in ORDER_COLS:
            raise ValueError(
                f"index_sort on identity column {field!r} is the default "
                "corpus order — pick a docvalues field"
            )
        order = [F.col(field).asc() if asc else F.col(field).desc()] + [
            F.col(c).asc() for c in ORDER_COLS
        ]
        if field not in docvalues:
            docvalues = tuple(docvalues) + (field,)
    docs = with_docids(transcripts, docid_strategy, order=order)
    try:
        return build_index_from_docs(
            spark,
            docs,
            index_dir,
            analyzer_mode=analyzer_mode,
            chunk_bits=chunk_bits,
            block_size=block_size,
            k1=k1,
            b=b,
            resume=resume,
            doc_map_df=doc_map(docs, docvalues),
            forward_index=forward_index,
            positional=positional,
            stored=stored,
            docvalues=docvalues,
            index_sort=index_sort,
            extra_manifest=extra_manifest,
            codec=codec,
        )
    finally:
        # the scalable docid path persists its range-partitioned base so the
        # count and numbering passes see identical bounds; release it here or
        # every build leaks one cached copy of the corpus (executor storage)
        cached = getattr(docs, "_dhr_persisted", None)
        if cached is not None:
            cached.unpersist()


def write_positions(
    docs: DataFrame,
    tdict: DataFrame,
    index_dir: str,
    analyzer_mode: str,
    chunk_bits: int,
    mode: str = "overwrite",
    dynamic: bool = False,
) -> None:
    """Write the positional artifact: (chunk, docid, term_id, positions).

    Positions carry Lucene position increments: removed tokens (stopwords
    under the lucene chain) consume a position but emit nothing, exactly as
    Lucene's StopFilter records them — "new the york" stores new@0/york@2,
    so the exact phrase "new york" does not match it while slop=1 does
    (Anserini PhraseQuery behavior; the reference's Lucene backend,
    /root/reference/densify/output_vector.py:24-31, reads from such an
    index). The simple chain removes nothing, so its positions are the
    plain token-stream indexes — which keeps every positional operator
    DuckDB-oracle-expressible. Costs one extra tokenization pass over the
    corpus; opt-in.
    """
    from dhr_spark.functions.analyzer import tokenize_udf

    tokc = tokenize_udf(analyzer_mode, keep_gaps=True)(F.col("text"))
    rel = (
        docs.select("docid", F.posexplode(tokc).alias("pos", "term"))
        .filter(F.col("term").isNotNull())
        .groupBy("docid", "term")
        .agg(F.sort_array(F.collect_list("pos")).alias("positions"))
        .join(F.broadcast(tdict.select("term", "term_id")), "term")
        .select(
            F.shiftright(F.col("docid"), chunk_bits).cast("int").alias("chunk"),
            "docid",
            "term_id",
            "positions",
        )
    )
    w = rel.repartition("chunk").write.mode(mode)
    if dynamic:
        w = w.options(partitionOverwriteMode="dynamic")
    w.partitionBy("chunk").parquet(os.path.join(index_dir, "positions"))


def _assert_index_sorted(
    doc_map_df: DataFrame, index_sort: tuple[str, bool], chunk_bits: int
) -> None:
    """Verify the index-sort contract: within every chunk, docid order
    agrees with the sort field's order (one lag-window pass; fails the
    build rather than letting the search_sorted fast path mis-rank)."""
    from pyspark.sql import Window

    field, asc = index_sort
    if field not in doc_map_df.columns:
        raise ValueError(
            f"index_sort field {field!r} must be carried in doc_map "
            "(declare it in docvalues)"
        )
    w = Window.partitionBy(
        F.shiftright(F.col("docid"), int(chunk_bits))
    ).orderBy(F.col("docid").asc())
    prev = F.lag(F.col(field)).over(w)
    bad = F.when(
        prev.isNotNull()
        & (prev > F.col(field) if asc else prev < F.col(field)),
        1,
    )
    n_bad = (
        doc_map_df.select(bad.alias("_bad"))
        .agg(F.count("_bad").alias("n"))
        .collect()[0]["n"]
    )
    if int(n_bad):
        raise ValueError(
            f"index_sort contract violated: {int(n_bad)} within-chunk "
            f"docid pairs disagree with {field!r} "
            f"{'ascending' if asc else 'descending'} order — assign docids "
            "in sort order (build_index does; generic corpora must order "
            "before build_index_from_docs)"
        )


def build_index_from_docs(
    spark: SparkSession,
    docs: DataFrame,
    index_dir: str,
    analyzer_mode: str = "lucene",
    chunk_bits: int | str = 17,
    block_size: int = 128,
    k1: float = K1,
    b: float = B,
    resume: bool = False,
    doc_map_df: DataFrame | None = None,
    extra_manifest: dict | None = None,
    forward_index: bool = False,
    positional: bool = False,
    stored: bool = False,
    docvalues: tuple[str, ...] | list[str] = (),
    prune_per_term: int | None = None,
    index_sort: tuple[str, bool] | None = None,
    codec: str = "varint",
) -> dict:
    """Build (or resume) the index over any corpus with (docid long, text).

    ``index_sort``: ``(field, ascending)`` metadata (Lucene setIndexSort) —
    the CALLER promises docids were assigned in that field's order (the
    transcripts entrypoint build_index does it; generic corpora order
    before assigning). The promise is VERIFIED here against doc_map_df
    (one lag-window pass per build: a chunk whose docid order disagrees
    with the field order fails the build rather than silently mis-ranking
    the search_sorted fast path), and recorded in the manifest.

    ``prune_per_term``: opt-in static index pruning (Carmel et al. 2001,
    term-centric top-k — operators/postings.prune_postings_topk): every
    posting list is cut to its ``prune_per_term`` highest-BM25-weight
    entries before segment encode. LOSSY by design (the head-term tail can
    no longer score); the manifest records the setting, corpus statistics
    (n_docs/avgdl/df/dl) stay those of the FULL corpus so kept postings
    score identically to the unpruned index.

    The generic entry: the transcripts pipeline, the driver-contract
    documents corpus, and pytest fixtures all funnel through here.
    ``extra_manifest`` fields ride the atomic manifest commit — callers (the
    streaming compactor) use it to commit their own watermark transactionally
    with the build."""
    t0 = time.time()
    _ph: dict[str, float] = {}
    _pt = [t0]

    def _mark(name: str) -> None:
        now = time.time()
        _ph[name] = round(now - _pt[0], 2)
        _pt[0] = now

    prior = load_manifest(index_dir) if resume else None
    done_chunks = set(prior["chunks"].keys()) if prior else set()

    # fused analyze+TF kernel: per-doc term freqs + doc lengths with no
    # shuffle (see doc_term_freqs) — the segment groupBy below is the build's
    # only wide exchange. Cached because three consumers read it; at true
    # 10^12 scale swap .cache() for a checkpoint to cluster storage.
    fused = doc_term_freqs(docs, mode=analyzer_mode).cache()
    cs = fused.agg(
        F.count(F.when(F.col("first"), 1)).alias("n_docs"),
        F.avg(F.when(F.col("first"), F.col("dl"))).alias("avgdl"),
        F.sum(F.when(F.col("first"), F.col("dl"))).alias("total_dl"),
        F.max(F.when(F.col("first"), F.col("docid"))).alias("max_docid"),
    ).collect()[0]
    if cs["n_docs"] == 0 or cs["avgdl"] is None:
        fused.unpersist()
        raise ValueError(
            "cannot build an index over an empty corpus (0 documents)"
        )
    n_docs, avgdl = int(cs["n_docs"]), float(cs["avgdl"])
    total_dl, max_docid = int(cs["total_dl"]), int(cs["max_docid"])
    _mark("tokenize_stats")

    # chunk sizing: "auto" targets ~4 chunks/core over the docid space
    # (auto_chunk_bits documents why); a resume MUST keep the prior build's
    # bits — done_chunks skip and all partition layouts key on them
    if chunk_bits == "auto":
        chunk_bits = (
            int(prior["chunk_bits"])
            if prior is not None
            else auto_chunk_bits(
                max_docid + 1, spark.sparkContext.defaultParallelism
            )
        )
    if prior is not None and int(prior["chunk_bits"]) != chunk_bits:
        raise ValueError(
            f"resume=True with chunk_bits={chunk_bits} but the prior build "
            f"used {prior['chunk_bits']} — the chunk skip-list and every "
            "partition layout key on it; pass the same value (or 'auto', "
            "which adopts the prior's)"
        )
    if prior is not None:
        # committed chunks were encoded under the prior codec; a resumed
        # build MUST keep writing the same byte format
        codec = prior.get("codec", "varint")

    if prior is not None and (
        int(prior["n_docs"]) != n_docs
        or abs(float(prior["avgdl"]) - avgdl) > 1e-9
    ):
        raise ValueError(
            "resume=True requires the SAME corpus as the prior build "
            f"(manifest n_docs={prior['n_docs']} avgdl={prior['avgdl']}, got "
            f"n_docs={n_docs} avgdl={avgdl}). Resume only re-runs an "
            "interrupted build (chunk-level skip needs the frozen term-id "
            "order); for NEW data use index.incremental.append_to_index, "
            "or a full rebuild (resume=False)."
        )

    tfs = fused.filter(F.col("term").isNotNull())
    dls = fused.filter(F.col("first")).select("docid", "dl")

    # ctf (collection term frequency) rides in the dictionary so query-time
    # similarities beyond BM25 — LM-Dirichlet needs P(t|C) = ctf/total_dl
    # (Searcher.search_qld) — stay one dictionary lookup, never a postings
    # decode. Additive under append, subtractive under exact-stats delete.
    # df and ctf come out of ONE groupBy over the tf rows (they used to be
    # two separate full shuffles + a join — the dictionary phase's cost was
    # 2x what the aggregation needs).
    from dhr_spark.functions.bm25 import idf_col as _idf_col

    ts = (
        tfs.groupBy("term")
        .agg(
            F.count("*").alias("df"),
            F.sum("tf").cast("long").alias("ctf"),
        )
        .withColumn("idf", _idf_col(F.col("df"), F.lit(n_docs)))
    )
    tdict = term_dictionary(ts).cache()
    if tdict.limit(1).count() == 0:
        fused.unpersist()
        tdict.unpersist()
        raise ValueError(
            "corpus produced zero index terms (every document is empty or "
            "all-stopword after analysis) — an index over it cannot answer "
            "any query; nothing was written"
        )
    if prior is not None and tdict.count() != int(prior["n_terms"]):
        raise ValueError(
            "resume=True requires the SAME corpus as the prior build: term "
            f"dictionary has {tdict.count()} terms vs manifest "
            f"n_terms={prior['n_terms']}. Run a full rebuild."
        )

    _mark("dictionary")
    # idf deliberately NOT joined into the postings: segments are stats-free
    # (query-time idf comes from the term dictionary), which keeps one double
    # per posting out of the build's only wide shuffle AND makes the rows
    # immutable under incremental appends
    post = tfs.join(
        F.broadcast(tdict.select("term", "term_id")), "term"
    ).select("term_id", "docid", "tf", "dl")
    # static pruning applies to the SCORING postings (segments) only — the
    # forward index / positions / stored fields keep the full data, exactly
    # as Lucene pruning leaves stored term vectors intact. The cut is
    # decided over the FULL corpus before any resume filter, so a resumed
    # build keeps bit-identical decisions.
    seg_src = post
    if prune_per_term is not None:
        from dhr_spark.operators.postings import prune_postings_topk

        seg_src = prune_postings_topk(
            post, prune_per_term, avgdl, k1, b, n_docs=n_docs
        )
    if done_chunks:
        done_ints = [int(c) for c in done_chunks]
        post = post.filter(
            ~F.shiftright(F.col("docid"), chunk_bits).cast("int").isin(done_ints)
        )
        if prune_per_term is not None:
            seg_src = seg_src.filter(
                ~F.shiftright(F.col("docid"), chunk_bits)
                .cast("int")
                .isin(done_ints)
            )
        else:
            seg_src = post

    if forward_index:
        # doc-major term vectors (the forward index): what pseudo-relevance
        # feedback (Searcher.search_rm3) reads for its handful of feedback
        # docs — chunk-partitioned so the lookup prunes to the docs' chunks
        (
            post.withColumn(
                "chunk", F.shiftright(F.col("docid"), chunk_bits).cast("int")
            )
            .repartition("chunk")
            .write.mode("append" if done_chunks else "overwrite")
            .partitionBy("chunk")
            .parquet(os.path.join(index_dir, "forward"))
        )

    if positional:
        # same done-chunk filter as the postings/doclens paths: on resume the
        # positions for committed chunks are already on disk, and the append
        # write below would duplicate every (docid, term) row for them —
        # phrase/proximity join on docid, so duplicates multiply results
        pos_docs = docs
        if done_chunks:
            pos_docs = docs.filter(
                ~F.shiftright(F.col("docid"), chunk_bits)
                .cast("int")
                .isin(done_ints)
            )
        write_positions(
            pos_docs, tdict, index_dir, analyzer_mode, chunk_bits,
            mode="append" if done_chunks else "overwrite",
        )

    if stored:
        # stored fields (Lucene parity): the original text, chunk-partitioned
        # so result rendering fetches only the hit docs' chunks — serving
        # never rescans the source table. Opt-in: it duplicates the corpus
        # text into the index (parquet-compressed), exactly like Lucene's
        # stored-field cost.
        st_docs = docs
        if done_chunks:
            st_docs = docs.filter(
                ~F.shiftright(F.col("docid"), chunk_bits)
                .cast("int")
                .isin(done_ints)
            )
        (
            st_docs.select(
                F.shiftright(F.col("docid"), chunk_bits)
                .cast("int")
                .alias("chunk"),
                "docid",
                "text",
            )
            .repartition("chunk")
            .write.mode("append" if done_chunks else "overwrite")
            .partitionBy("chunk")
            .parquet(os.path.join(index_dir, "stored"))
        )

    seg = build_segments(seg_src, chunk_bits, block_size, codec)
    seg_path = os.path.join(index_dir, "segments")
    dl_path = os.path.join(index_dir, "doclens")
    mode = "append" if done_chunks else "overwrite"

    dls_for_chunks = dls
    if done_chunks:
        dls_for_chunks = dls.filter(
            ~F.shiftright(F.col("docid"), chunk_bits).cast("int").isin(done_ints)
        )

    # the four artifact writes are independent jobs over disjoint data —
    # submit them from driver threads so the small ones (doclens, dict,
    # doc_map) fill the segment shuffle's scheduling gaps and stage tails
    # instead of serializing after it (Spark supports concurrent actions
    # from threads; a failure in any write re-raises via .result()).
    # Atomicity is unchanged: nothing is visible until the manifest commit.
    def _w_segments():
        # cluster one chunk per task before the partitioned write: one
        # file per chunk instead of (tasks x chunks) shards — small-file
        # listing cost at read time dominated the old layout
        seg.repartition("chunk").write.mode(mode).partitionBy(
            "chunk"
        ).parquet(seg_path)

    def _w_doclens():
        build_doclens(dls_for_chunks, chunk_bits).write.mode(
            mode
        ).partitionBy("chunk").parquet(dl_path)

    def _w_dict_map():
        if done_chunks:
            return int(prior["n_terms"])
        td_path = os.path.join(index_dir, "term_dict")
        tdict.write.mode("overwrite").parquet(td_path)
        # row count from parquet footers — metadata-only, no extra agg job
        nt = spark.read.parquet(td_path).count()
        if doc_map_df is not None:
            # seg_batch partitioning: 0 = base build; incremental appends
            # write their own seg_batch= partition with dynamic overwrite,
            # so a crashed-and-retried append replaces rather than
            # duplicates
            doc_map_df.withColumn("seg_batch", F.lit(0)).write.mode(
                "overwrite"
            ).partitionBy("seg_batch").parquet(
                os.path.join(index_dir, "doc_map")
            )
        if index_sort is not None:
            _assert_index_sorted(doc_map_df, index_sort, chunk_bits)
        return int(nt)

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=3) as _ex:
        f_seg = _ex.submit(_w_segments)
        f_dl = _ex.submit(_w_doclens)
        f_dm = _ex.submit(_w_dict_map)
        f_seg.result()
        _mark("segments_write")
        f_dl.result()
        n_terms = f_dm.result()
    _mark("doclens_dict_docmap")

    # per-chunk lineage + metrics from the committed files (A7 analogue:
    # the reference's collision/build counters, densify_corpus.py:85-91)
    written = spark.read.parquet(seg_path)
    metrics = (
        written.groupBy("chunk")
        .agg(
            F.sum("n").alias("postings"),
            F.sum("bytes").alias("bytes"),
            F.count("*").alias("terms"),
            (F.max("n") / F.avg("n")).alias("skew_ratio"),
        )
        .collect()
    )
    chunks = {
        str(r["chunk"]): {
            "postings": int(r["postings"]),
            "bytes": int(r["bytes"]),
            "terms": int(r["terms"]),
            "skew_ratio": round(float(r["skew_ratio"]), 3),
        }
        for r in metrics
    }
    manifest = {
        "version": 2,
        "k1": k1,
        "b": b,
        "chunk_bits": chunk_bits,
        "block_size": block_size,
        "codec": codec,
        "analyzer_mode": analyzer_mode,
        "n_docs": n_docs,
        "avgdl": avgdl,
        "total_dl": total_dl,
        "next_docid": max_docid + 1,
        "appends": 0,
        "term_dict_dir": "term_dict",
        "forward_index": bool(forward_index),
        "positional": bool(positional),
        "stored": bool(stored),
        "n_terms": int(n_terms),
        "docvalues": list(docvalues),
        "prune_per_term": prune_per_term,
        "index_sort": (
            {"field": index_sort[0], "ascending": bool(index_sort[1])}
            if index_sort is not None
            else None
        ),
        "build_seconds": round(time.time() - t0, 2),
        "phase_seconds": dict(_ph, metrics=round(time.time() - _pt[0], 2)),
        "resumed_from": sorted(done_chunks) if done_chunks else [],
        "chunks": chunks,
    }
    if extra_manifest:
        manifest.update(extra_manifest)
    _write_manifest(index_dir, manifest)
    fused.unpersist()
    tdict.unpersist()
    return manifest
