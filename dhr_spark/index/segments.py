"""Posting-list segment construction — the distributed index build.

Layout: the docid space is split into fixed-width CHUNKS
(``chunk = docid >> chunk_bits``). A segment row is one (term_id, chunk)
group: postings sorted by docid, delta-gap + varint encoded, with per-block
(``block_size`` postings) (max tf, min dl) pairs and first-docids for
block-max WAND skipping. Block bounds are stats-free — the query-time bound
idf·f(max_tf, min_dl) is admissible under any current (idf, avgdl) — so
committed segment rows survive incremental corpus growth unchanged.

Why chunked (scale rationale):
  * bounded group size — a head term with df=10^10 never materializes one
    giant group; every (term, chunk) group holds <= 2^chunk_bits postings.
    This is the deterministic doc-space form of salting (SURVEY.md F5) and
    the explicit head-term skew handling mandated by BASELINE.json.
  * chunk == query-time parallel unit — per-chunk local top-k merges
    losslessly into global top-k (reference shard contract,
    /root/reference/retrieval/merge.result.py:22-41).
  * chunk == resume unit — per-chunk lineage rows in the manifest make the
    build idempotently restartable (completed chunks are skipped).

The reference's analogue is its file-split + Pool(workers) + pickle-merge
pipeline (/root/reference/densify/densify_corpus.py:137-161,
/root/reference/retrieval/index.py:26-47), re-expressed as one shuffled
groupBy + applyInPandas (Arrow-batched; numpy inside, no per-row Python).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dhr_spark import B, K1
from dhr_spark.index.codec import (
    for_encode_stream,
    pfor_encode_stream,
    segmented_cumsum_decode,
    varint_decode,
    varint_encode,
    varint_lengths,
)

SEGMENT_SCHEMA = (
    "chunk int, term_id long, n long, doc_gaps binary, tfs binary, "
    "block_max_tf array<long>, block_min_dl array<long>, "
    "block_first array<long>, "
    "block_doc_off array<long>, block_tf_off array<long>, bytes long"
)

DOCLEN_SCHEMA = "chunk int, base_docid long, n_docs long, dls binary"


def bm25_weights_np(
    tf: np.ndarray, dl: np.ndarray, idf: float, avgdl: float,
    k1: float = K1, b: float = B,
) -> np.ndarray:
    """float64 numpy twin of functions.bm25.bm25_weight_col — identical
    operation order so build-time block maxes / query-time scores agree with
    the Column-math slow path to machine precision."""
    tf = tf.astype(np.float64)
    return idf * tf / (tf + k1 * (1.0 - b + b * dl.astype(np.float64) / avgdl))


def _encode_batch_vectorized(
    pdf: pd.DataFrame, block_size: int
) -> pd.DataFrame:
    """Encode ALL (chunk, term_id) groups in a sorted batch at once.

    Every heavy step — delta gaps with per-block absolute restarts, varint
    encode, per-block (max tf, min dl) — runs as ONE numpy op over the whole
    batch (segmented via reduceat/searchsorted), leaving only cheap buffer
    slicing in the per-group loop. ~10x over a per-group kernel.

    Blocks store (max_tf, min_dl), NOT precomputed max BM25 weights: the
    BM25 weight w(tf, dl) = idf·tf/(tf + k1(1-b+b·dl/avgdl)) is monotone
    increasing in tf and decreasing in dl, so idf·f(max_tf, min_dl) is an
    admissible per-block upper bound under WHATEVER (idf, avgdl) hold at
    query time. That makes segment rows immutable under corpus growth —
    incremental appends only update the term dictionary and manifest stats,
    never the committed postings (index/incremental.py)."""
    chunks = pdf["chunk"].to_numpy()
    tids = pdf["term_id"].to_numpy()
    docids = pdf["docid"].to_numpy().astype(np.int64)
    tfs = pdf["tf"].to_numpy().astype(np.int64)
    dls = pdf["dl"].to_numpy().astype(np.int64)
    n = len(pdf)

    bounds = np.flatnonzero((np.diff(chunks) != 0) | (np.diff(tids) != 0))
    starts = np.concatenate(([0], bounds + 1))
    ends = np.concatenate((bounds + 1, [n]))

    # global block-start positions: every block_size-th posting within a group
    ingroup = np.arange(n, dtype=np.int64) - np.repeat(starts, ends - starts)
    bstarts = np.flatnonzero(ingroup % block_size == 0)
    block_max_tf_all = np.maximum.reduceat(tfs, bstarts)
    block_min_dl_all = np.minimum.reduceat(dls, bstarts)
    block_first_all = docids[bstarts]

    # delta gaps with absolute restart at every block boundary
    gaps = np.empty_like(docids)
    gaps[0] = docids[0]
    np.subtract(docids[1:], docids[:-1], out=gaps[1:])
    gaps[bstarts] = docids[bstarts]
    if (gaps[ingroup % block_size != 0] <= 0).any():
        raise ValueError("docids must be strictly increasing per group")
    u = gaps.astype(np.uint64)
    doc_cum = np.concatenate(([0], np.cumsum(varint_lengths(u))))
    doc_buf = varint_encode(u)
    tf_u = tfs.astype(np.uint64)
    tf_cum = np.concatenate(([0], np.cumsum(varint_lengths(tf_u))))
    tf_buf = varint_encode(tf_u)

    # block index range per group
    b0 = np.searchsorted(bstarts, starts)
    b1 = np.searchsorted(bstarts, ends)
    bstart_doc_bytes = doc_cum[bstarts]
    bstart_tf_bytes = tf_cum[bstarts]

    rows = []
    for g in range(len(starts)):
        s, e = starts[g], ends[g]
        d0, d1 = doc_cum[s], doc_cum[e]
        t0, t1 = tf_cum[s], tf_cum[e]
        rows.append(
            {
                "chunk": int(chunks[s]),
                "term_id": int(tids[s]),
                "n": int(e - s),
                "doc_gaps": doc_buf[d0:d1],
                "tfs": tf_buf[t0:t1],
                "block_max_tf": block_max_tf_all[b0[g] : b1[g]].tolist(),
                "block_min_dl": block_min_dl_all[b0[g] : b1[g]].tolist(),
                "block_first": block_first_all[b0[g] : b1[g]].tolist(),
                "block_doc_off": (bstart_doc_bytes[b0[g] : b1[g]] - d0).tolist(),
                "block_tf_off": (bstart_tf_bytes[b0[g] : b1[g]] - t0).tolist(),
                "bytes": int((d1 - d0) + (t1 - t0)),
            }
        )
    return pd.DataFrame(rows)


def _encode_batch_arrow(
    chunks: np.ndarray,
    tids: np.ndarray,
    docids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    block_size: int,
    codec: str = "varint",
):
    """Arrow-native twin of _encode_batch_vectorized: identical encode math,
    but the OUTPUT is assembled zero-copy — (chunk, term_id) groups tile the
    varint buffers and the block arrays contiguously, so the per-row binary
    and list columns are just offset vectors over the already-built numpy
    buffers (pa.BinaryArray/ListArray.from_buffers), never a Python dict or
    pandas row. The old per-group Python loop was the encode stage's
    residual per-row work (BASELINE.md r03 profile).

    ``codec``: "varint" (delta-gap LEB128, block-start slot absolute) or
    "for" (Lucene ForUtil-style fixed-width bit packing per block; the
    absolute first docid rides in each block header, codec.for_encode_stream)
    or "pfor" (patched FOR, Lucene PForUtil: up to 7 outliers per block kept
    out of the packed width, codec.pfor_encode_stream)
    — both emit the same segment schema, so everything downstream (block-max
    skipping, offsets, compaction) is codec-agnostic up to the byte
    decoder."""
    import pyarrow as pa

    n = len(docids)
    bounds = np.flatnonzero((np.diff(chunks) != 0) | (np.diff(tids) != 0))
    starts = np.concatenate(([0], bounds + 1))
    ends = np.concatenate((bounds + 1, [n]))

    ingroup = np.arange(n, dtype=np.int64) - np.repeat(starts, ends - starts)
    bstarts = np.flatnonzero(ingroup % block_size == 0)
    block_max_tf_all = np.maximum.reduceat(tfs, bstarts)
    block_min_dl_all = np.minimum.reduceat(dls, bstarts)
    block_first_all = docids[bstarts]

    gaps = np.empty_like(docids)
    gaps[0] = docids[0]
    np.subtract(docids[1:], docids[:-1], out=gaps[1:])
    gaps[bstarts] = docids[bstarts]
    if (gaps[ingroup % block_size != 0] <= 0).any():
        raise ValueError("docids must be strictly increasing per group")
    tf_u = tfs.astype(np.uint64)
    b0 = np.searchsorted(bstarts, starts)
    b1 = np.searchsorted(bstarts, ends)
    n_groups = len(starts)
    sb = np.append(starts, n)  # group boundaries incl. final end
    blk_off = np.append(b0, len(bstarts))

    if codec in ("for", "pfor"):
        enc = for_encode_stream if codec == "for" else pfor_encode_stream
        block_lens_all = np.diff(np.append(bstarts, n)).astype(np.int64)
        gaps[bstarts] = 0  # absolute first lives in the block header
        doc_buf, blk_doc = enc(
            gaps.astype(np.uint64), block_lens_all, firsts=block_first_all
        )
        tf_buf, blk_tf = enc(tf_u, block_lens_all)
        bstart_doc_bytes = blk_doc
        bstart_tf_bytes = blk_tf
        # group byte boundaries: groups start exactly at block boundaries
        d_off = np.append(blk_doc[b0], len(doc_buf))
        t_off = np.append(blk_tf[b0], len(tf_buf))
    else:
        u = gaps.astype(np.uint64)
        doc_cum = np.concatenate(([0], np.cumsum(varint_lengths(u))))
        doc_buf = varint_encode(u)
        tf_cum = np.concatenate(([0], np.cumsum(varint_lengths(tf_u))))
        tf_buf = varint_encode(tf_u)
        bstart_doc_bytes = doc_cum[bstarts]
        bstart_tf_bytes = tf_cum[bstarts]
        d_off = doc_cum[sb]  # contiguous tiling: ends[g] == starts[g+1]
        t_off = tf_cum[sb]

    def _bin(buf: bytes, off: np.ndarray) -> "pa.Array":
        return pa.BinaryArray.from_buffers(
            pa.binary(),
            n_groups,
            [None, pa.py_buffer(off.astype(np.int32)), pa.py_buffer(buf)],
        )

    def _lst(values: np.ndarray) -> "pa.Array":
        return pa.ListArray.from_arrays(
            pa.array(blk_off.astype(np.int32)),
            pa.array(values.astype(np.int64)),
        )

    # per-block byte offsets relative to each group's buffer start
    rep = (b1 - b0).astype(np.int64)
    doc_rel = bstart_doc_bytes - np.repeat(d_off[:-1], rep)
    tf_rel = bstart_tf_bytes - np.repeat(t_off[:-1], rep)

    return pa.RecordBatch.from_arrays(
        [
            pa.array(chunks[starts].astype(np.int32)),
            pa.array(tids[starts].astype(np.int64)),
            pa.array((ends - starts).astype(np.int64)),
            _bin(doc_buf, d_off),
            _bin(tf_buf, t_off),
            _lst(block_max_tf_all),
            _lst(block_min_dl_all),
            _lst(block_first_all),
            _lst(doc_rel),
            _lst(tf_rel),
            pa.array(
                ((d_off[1:] - d_off[:-1]) + (t_off[1:] - t_off[:-1])).astype(
                    np.int64
                )
            ),
        ],
        names=[
            "chunk", "term_id", "n", "doc_gaps", "tfs", "block_max_tf",
            "block_min_dl", "block_first", "block_doc_off", "block_tf_off",
            "bytes",
        ],
    )


def build_segments(
    postings: DataFrame,
    chunk_bits: int = 17,
    block_size: int = 128,
    codec: str = "varint",
    packed_exchange: bool | None = None,
) -> DataFrame:
    """postings (term_id, docid, tf, dl) -> segment rows.

    One shuffle either way; two exchange layouts:

    * ``packed_exchange=False`` (default, env DHR_PACKED_EXCHANGE): the
      raw-row exchange — repartition + sortWithinPartitions + one encode
      kernel per partition (one Python call per partition, never per
      group). On a single node this wins: the shuffle is lz4-compressed
      memcpy, and the whole JVM pipeline from the tf aggregate into the
      exchange stays in one codegen stage.
    * ``packed_exchange=True``: map-side combine — each input partition
      sorts its postings in numpy and ships ONE varint-packed partial run
      per (chunk, term_id) group (~5 B/posting); the reduce kernel merges
      the sorted runs and encodes byte-identical segment rows
      (tests/test_packed_exchange.py). Worth it only when the exchange
      crosses a real network; on this harness the extra Arrow round-trip
      of the raw stream measured 2x slower at 8c / 1.15x at 32c
      (BASELINE.md round-5 record).

    ``codec``: posting-bytes codec — "varint", "for", or "pfor"
    (_encode_batch_arrow).
    """
    if codec not in ("varint", "for", "pfor"):
        raise ValueError(f"unknown postings codec {codec!r}")
    if packed_exchange is None:
        # default OFF on single-node: measured on this harness (1M-turn
        # corpus), the packed path built 2x slower at 8c and 1.15x slower
        # at 32c — the extra Arrow round-trip of the raw posting stream
        # through the Python pack stage costs more than the exchange bytes
        # it saves, because a local shuffle is lz4-compressed memcpy, not
        # network. DHR_PACKED_EXCHANGE=1 opts in for deployments where the
        # exchange crosses a real network (~5x fewer shuffled bytes).
        packed_exchange = os.environ.get("DHR_PACKED_EXCHANGE", "0") == "1"
    # tf/dl travel the build's one wide exchange as int32: both are
    # per-document counts (or 31-bit-capped impacts, index/impact.py) —
    # the encode stage is memory-bandwidth-bound (BASELINE.md r03 profile),
    # so every byte off the shuffled row is wall-clock. The docid travels
    # as its int32 IN-CHUNK OFFSET (chunk_bits <= 22, so offsets fit) and
    # the kernel reconstructs (chunk << chunk_bits) + off — 4 fewer bytes
    # on every shuffled/sorted row of the build's only wide exchange
    # (guide §2.3: narrower types, project before the exchange).
    src = postings.withColumn(
        "chunk", F.shiftright(F.col("docid"), chunk_bits).cast("int")
    ).select(
        "chunk",
        "term_id",
        (F.col("docid") - F.shiftleft(F.shiftright(F.col("docid"), chunk_bits), chunk_bits))
        .cast("int")
        .alias("off"),
        F.col("tf").cast("int").alias("tf"),
        F.col("dl").cast("int").alias("dl"),
    )
    if packed_exchange:
        # explicit partition count: the packed exchange is ~5 B/posting, so
        # AQE's size-based coalescing would fold the reduce side into one or
        # two partitions and serialize the ENCODE stage (the expensive one);
        # an explicit numPartitions keeps the merge+encode at full width
        nparts = int(
            postings.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )
        return (
            src.mapInArrow(_pack_partials(chunk_bits), _PARTIAL_SCHEMA)
            .repartition(nparts, "chunk", "term_id")
            .sortWithinPartitions("chunk", "term_id")
            .mapInArrow(
                _merge_partials(chunk_bits, block_size, codec),
                SEGMENT_SCHEMA,
            )
        )

    # explicit width (same rationale as the packed path below): the encode
    # kernel's work per shuffled byte is far above a row operator's, so
    # AQE's byte-based coalescing must not shrink this stage
    nparts = int(
        postings.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    parted = src.repartition(nparts, "chunk", "term_id").sortWithinPartitions(
        "chunk", "term_id", "off"
    )

    def _build(batches):
        # Arrow-native: input columns come out zero-copy as numpy views,
        # output batches are offset vectors over the encode buffers
        # (_encode_batch_arrow) — no pandas construction on either side.
        # The trailing (chunk, term_id) group of each batch carries into
        # the next so a group split across Arrow batches encodes once.
        carry: tuple | None = None
        for rb in batches:
            chunk_col = rb.column(0).to_numpy(zero_copy_only=False)
            off_col = rb.column(2).to_numpy(zero_copy_only=False)
            cols = (
                chunk_col,                                            # chunk
                rb.column(1).to_numpy(zero_copy_only=False),          # term_id
                (chunk_col.astype(np.int64) << chunk_bits)
                + off_col.astype(np.int64),                           # docid
                rb.column(3).to_numpy(zero_copy_only=False),          # tf
                rb.column(4).to_numpy(zero_copy_only=False),          # dl
            )
            if carry is not None and len(carry[0]):
                cols = tuple(
                    np.concatenate([c, b]) for c, b in zip(carry, cols)
                )
            n = len(cols[0])
            if n == 0:
                carry = None
                continue
            tail_mask = (cols[0] == cols[0][-1]) & (cols[1] == cols[1][-1])
            head_idx = np.flatnonzero(~tail_mask)
            head_end = int(head_idx[-1]) + 1 if head_idx.size else 0
            carry = tuple(c[head_end:] for c in cols)
            if head_end:
                yield _encode_batch_arrow(
                    *(c[:head_end] for c in cols), block_size, codec
                )
        if carry is not None and len(carry[0]):
            yield _encode_batch_arrow(*carry, block_size, codec)

    return parted.mapInArrow(_build, SEGMENT_SCHEMA)


_PARTIAL_SCHEMA = (
    "chunk int, term_id long, n long, offs binary, tfs binary, dls binary"
)

# rows accumulated inside the pack/merge kernels before a sort+encode pass:
# Arrow delivers ~32k-row micro-batches (session conf), far too small for an
# effective map-side combine — the kernels re-batch to this many rows
_PACK_ROWS = 1 << 20


def _pack_partials(chunk_bits: int):
    """mapInArrow kernel factory — the build's MAP-SIDE COMBINE.

    Sorts each accumulated super-batch by (chunk, term_id, docid) and emits
    one varint-packed partial posting run per (chunk, term_id) group:
    docid-offsets-in-chunk as delta+LEB128 (first absolute), tf and dl as
    LEB128. The wide exchange then moves ~5 bytes per posting instead of a
    28-byte (chunk, term_id, docid, tf, dl) row — the r03/r04 profiles pin
    the build stage on the shared memory bus, so shuffled bytes ARE
    wall-clock, and the combine also removes the JVM row sort the old
    sortWithinPartitions did over the full posting stream (the reduce side
    merges already-sorted runs in numpy instead)."""
    import pyarrow as pa

    def _flush(cols):
        chunks, tids, offs, tfs, dls = cols
        n = len(offs)
        order = np.lexsort((offs, tids, chunks))
        chunks, tids, offs = chunks[order], tids[order], offs[order]
        tfs, dls = tfs[order], dls[order]
        bounds = np.flatnonzero((np.diff(chunks) != 0) | (np.diff(tids) != 0))
        starts = np.concatenate(([0], bounds + 1))
        sb = np.append(starts, n)
        d = np.empty_like(offs)
        d[0] = offs[0]
        np.subtract(offs[1:], offs[:-1], out=d[1:])
        d[starts] = offs[starts]

        def _col(vals):
            u = vals.astype(np.uint64)
            cum = np.concatenate(([0], np.cumsum(varint_lengths(u))))
            return varint_encode(u), cum[sb]

        def _bin(buf, off):
            return pa.BinaryArray.from_buffers(
                pa.binary(), len(starts),
                [None, pa.py_buffer(off.astype(np.int32)), pa.py_buffer(buf)],
            )

        o_buf, o_off = _col(d)
        t_buf, t_off = _col(tfs)
        l_buf, l_off = _col(dls)
        return pa.RecordBatch.from_arrays(
            [
                pa.array(chunks[starts].astype(np.int32)),
                pa.array(tids[starts].astype(np.int64)),
                pa.array((sb[1:] - starts).astype(np.int64)),
                _bin(o_buf, o_off),
                _bin(t_buf, t_off),
                _bin(l_buf, l_off),
            ],
            names=["chunk", "term_id", "n", "offs", "tfs", "dls"],
        )

    def _pack(batches):
        acc: list[tuple] = []
        acc_rows = 0
        for rb in batches:
            if rb.num_rows == 0:
                continue
            acc.append(
                tuple(
                    rb.column(i).to_numpy(zero_copy_only=False)
                    for i in range(5)
                )
            )
            acc_rows += rb.num_rows
            if acc_rows >= _PACK_ROWS:
                cols = tuple(
                    np.concatenate([a[i] for a in acc]) for i in range(5)
                )
                acc, acc_rows = [], 0
                yield _flush(
                    (cols[0], cols[1], cols[2].astype(np.int64),
                     cols[3], cols[4])
                )
        if acc_rows:
            cols = tuple(np.concatenate([a[i] for a in acc]) for i in range(5))
            yield _flush(
                (cols[0], cols[1], cols[2].astype(np.int64), cols[3], cols[4])
            )

    return _pack


def _merge_partials(chunk_bits: int, block_size: int, codec: str):
    """mapInArrow kernel factory — the REDUCE side of the packed exchange.

    Partition rows are partial runs sorted by (chunk, term_id); each run is
    internally docid-sorted, so one vectorized decode (shared varint buffer
    per column, segmented cumsum with per-run restarts) plus one lexsort
    restores the exact globally sorted posting stream, which then feeds the
    SAME _encode_batch_arrow as the unpacked path — byte-identical segment
    rows. The trailing (chunk, term_id) group of each accumulated batch
    carries into the next so a group split across batches encodes once."""

    def _cols_of(rb):
        return (
            rb.column(0).to_numpy(zero_copy_only=False),
            rb.column(1).to_numpy(zero_copy_only=False),
            rb.column(2).to_numpy(zero_copy_only=False),
            rb.column(3).to_pylist(),
            rb.column(4).to_pylist(),
            rb.column(5).to_pylist(),
        )

    def _encode(cols):
        chunks, tids, ns, offs_b, tfs_b, dls_b = cols
        ns = ns.astype(np.int64)
        total = int(ns.sum())
        offs_v = varint_decode(
            np.frombuffer(b"".join(offs_b), dtype=np.uint8), total
        )
        offs_abs = segmented_cumsum_decode(offs_v, ns)
        tf_v = varint_decode(
            np.frombuffer(b"".join(tfs_b), dtype=np.uint8), total
        ).astype(np.int64)
        dl_v = varint_decode(
            np.frombuffer(b"".join(dls_b), dtype=np.uint8), total
        ).astype(np.int64)
        chunk_pv = np.repeat(chunks.astype(np.int64), ns)
        tid_pv = np.repeat(tids.astype(np.int64), ns)
        order = np.lexsort((offs_abs, tid_pv, chunk_pv))
        chunk_pv, tid_pv = chunk_pv[order], tid_pv[order]
        docid = (chunk_pv << chunk_bits) + offs_abs[order]
        return _encode_batch_arrow(
            chunk_pv, tid_pv, docid, tf_v[order], dl_v[order],
            block_size, codec,
        )

    def _merge(batches):
        carry = None
        acc: list[tuple] = []
        acc_rows = 0

        def _drain(cols):
            m = len(cols[0])
            tail = (cols[0] == cols[0][-1]) & (cols[1] == cols[1][-1])
            head_idx = np.flatnonzero(~tail)
            head_end = int(head_idx[-1]) + 1 if head_idx.size else 0
            new_carry = tuple(c[head_end:] for c in cols)
            head = tuple(c[:head_end] for c in cols) if head_end else None
            return head, new_carry

        for rb in batches:
            if rb.num_rows == 0:
                continue
            acc.append(_cols_of(rb))
            acc_rows += rb.num_rows
            if acc_rows < _PACK_ROWS:
                continue
            cols = tuple(
                np.concatenate([a[i] for a in acc]) if i < 3
                else [x for a in acc for x in a[i]]
                for i in range(6)
            )
            acc, acc_rows = [], 0
            if carry is not None:
                cols = tuple(
                    np.concatenate([carry[i], cols[i]]) if i < 3
                    else list(carry[i]) + list(cols[i])
                    for i in range(6)
                )
            head, carry = _drain(
                (cols[0], cols[1], cols[2],
                 np.asarray(cols[3], dtype=object),
                 np.asarray(cols[4], dtype=object),
                 np.asarray(cols[5], dtype=object))
            )
            if head is not None:
                yield _encode(head)
        if acc:
            cols = tuple(
                np.concatenate([a[i] for a in acc]) if i < 3
                else [x for a in acc for x in a[i]]
                for i in range(6)
            )
            if carry is not None:
                cols = tuple(
                    np.concatenate([carry[i], cols[i]]) if i < 3
                    else list(carry[i]) + list(cols[i])
                    for i in range(6)
                )
            carry = (cols[0], cols[1], cols[2],
                     np.asarray(cols[3], dtype=object),
                     np.asarray(cols[4], dtype=object),
                     np.asarray(cols[5], dtype=object))
        if carry is not None and len(carry[0]):
            yield _encode(carry)

    return _merge


def build_doclens(dls: DataFrame, chunk_bits: int = 17) -> DataFrame:
    """(docid, dl) -> one row per chunk: positional int32 dl array
    (docid - base_docid indexes into it; holes, e.g. role-filtered docs, are 0
    = never scored since they have no postings)."""
    src = dls.withColumn("chunk", F.shiftright(F.col("docid"), chunk_bits).cast("int"))
    chunk_docs = 1 << chunk_bits

    def _build(key, pdf: pd.DataFrame) -> pd.DataFrame:
        chunk = int(key[0])
        base = chunk << chunk_bits
        docids = pdf["docid"].to_numpy().astype(np.int64) - base
        arr = np.zeros(chunk_docs, dtype=np.int32)
        arr[docids] = pdf["dl"].to_numpy().astype(np.int32)
        hi = int(docids.max()) + 1
        return pd.DataFrame(
            {
                "chunk": [chunk],
                "base_docid": [base],
                "n_docs": [len(pdf)],
                "dls": [arr[:hi].tobytes()],
            }
        )

    # explicit exchange width: the (docid, dl) rows are tiny bytes-wise, so
    # AQE's byte-based coalescing collapses this kernel stage to ONE task
    # (measured 2.5s serial at 123k docs — the per-chunk array fills are
    # the work, not the shuffled bytes); the conf carries cluster sizing
    sp = int(dls.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return src.repartition(sp, "chunk").groupBy("chunk").applyInPandas(
        _build, DOCLEN_SCHEMA
    )
