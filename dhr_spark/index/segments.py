"""Posting-list segment construction — the distributed index build.

Layout: the docid space is split into fixed-width CHUNKS
(``chunk = docid >> chunk_bits``). A segment row is one (term_id, chunk)
group: postings sorted by docid, delta-gap + varint encoded, with per-block
(``block_size`` postings) max BM25 weights and first-docids for block-max
WAND skipping.

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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dhr_spark import B, K1
from dhr_spark.index.codec import block_delta_encode, encode_tfs, varint_lengths

SEGMENT_SCHEMA = (
    "chunk int, term_id long, n long, doc_gaps binary, tfs binary, "
    "block_max array<double>, block_first array<long>, "
    "block_doc_off array<long>, block_tf_off array<long>, "
    "idf double, bytes long"
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


def build_segments(
    postings: DataFrame,
    avgdl: float,
    chunk_bits: int = 17,
    block_size: int = 128,
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """postings (term_id, docid, tf, dl, weight?, idf) -> segment rows.

    One shuffle: groupBy(term_id, chunk). Group size bounded by 2^chunk_bits.
    """
    src = postings.withColumn(
        "chunk", F.shiftright(F.col("docid"), chunk_bits).cast("int")
    )

    def _build(key, pdf: pd.DataFrame) -> pd.DataFrame:
        chunk, term_id = int(key[0]), int(key[1])
        order = np.argsort(pdf["docid"].to_numpy(), kind="stable")
        docids = pdf["docid"].to_numpy()[order].astype(np.int64)
        tfs = pdf["tf"].to_numpy()[order].astype(np.int64)
        dls = pdf["dl"].to_numpy()[order].astype(np.int64)
        idf = float(pdf["idf"].iloc[0])
        w = bm25_weights_np(tfs, dls, idf, avgdl, k1, b)
        n = len(docids)
        nblocks = (n + block_size - 1) // block_size
        pad = nblocks * block_size - n
        wpad = np.concatenate([w, np.full(pad, -np.inf)]) if pad else w
        block_max = wpad.reshape(nblocks, block_size).max(axis=1)
        block_first = docids[:: block_size].astype(np.int64)
        gaps, doc_off = block_delta_encode(docids, block_size)
        tf_enc = encode_tfs(tfs)
        tf_lens = varint_lengths(tfs.astype(np.uint64))
        tf_cum = np.concatenate(([0], np.cumsum(tf_lens)))
        tf_off = tf_cum[:: block_size][:nblocks]
        return pd.DataFrame(
            {
                "chunk": [chunk],
                "term_id": [term_id],
                "n": [n],
                "doc_gaps": [gaps],
                "tfs": [tf_enc],
                "block_max": [block_max.tolist()],
                "block_first": [block_first.tolist()],
                "block_doc_off": [doc_off.tolist()],
                "block_tf_off": [tf_off.tolist()],
                "idf": [idf],
                "bytes": [len(gaps) + len(tf_enc)],
            }
        )

    return src.groupBy("chunk", "term_id").applyInPandas(_build, SEGMENT_SCHEMA)


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

    return src.groupBy("chunk").applyInPandas(_build, DOCLEN_SCHEMA)
