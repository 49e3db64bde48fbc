"""Block-max WAND top-k over segment indexes — the fast query path.

Algorithm per (chunk, query), all numpy-vectorized inside a cogrouped Arrow
UDF (no per-row Python):

  1. Per-block weight bounds computed AT QUERY TIME from the stored
     (max_tf, min_dl) pairs under the CURRENT stats:
         bound[t][b] = idf_t · f(max_tf, min_dl),  f = tf/(tf+k1(1-b+b·dl/avgdl))
     (w is monotone ↑tf ↓dl, so the bound is admissible under any idf/avgdl
     — what keeps committed segments valid across incremental appends).
     Term upper bounds U_t = qtf_t * max_b bound[t][b].
  2. Safe threshold bootstrap: fully score the single highest-impact term t*;
     theta = k-th largest single-term score (a lower bound on the chunk's
     true k-th best total score when df_chunk(t*) >= k, else -inf).
  3. Block pruning: skip block b of term t iff
         qtf_t * bound[t][b]  +  sum_{t' != t} U_t'  <  theta.
     Any doc confined to a pruned block has total upper bound < theta, hence
     cannot enter the true top-k (BM25 weights are strictly positive), and
     cannot even tie the k-th doc (strict inequality). Surviving blocks are
     decoded independently (absolute-restart delta blocks + byte offsets)
     and scored EXACTLY, so the emitted top-k docids AND scores are exact —
     the safe-pruning analogue of the reference's two-stage
     candidates->rescore contract (/root/reference/retrieval/
     gip_retrieval.py:128-156) without its approximation.
  4. Per-chunk local top-k -> global window top-k merge (lossless, the
     reference's shard-merge, merge.result.py:22-41).

Scale shape: parquet predicate pushdown reads ONLY the query terms' segment
rows; chunks are the parallel unit (1000 executors each score their chunks'
local top-k); the merge moves only n_chunks * k * |Q| tiny rows.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dhr_spark.index.builder import load_manifest
from dhr_spark.index.codec import (
    for_decode_stream,
    pfor_decode_stream,
    segmented_cumsum_decode,
    varint_decode,
)
from dhr_spark.index.segments import bm25_weights_np
from dhr_spark.operators.topk import topk

RESULT_SCHEMA = "qid string, docid long, score double"


def _block_lens(n: int, block_size: int) -> np.ndarray:
    nblocks = (n + block_size - 1) // block_size
    lens = np.full(nblocks, block_size, dtype=np.int64)
    if n % block_size:
        lens[-1] = n % block_size
    return lens


def _decode_selected(
    buf: bytes,
    offs: np.ndarray,
    lens: np.ndarray,
    sel: np.ndarray,
    *,
    restarts: bool,
    codec: str = "varint",
) -> tuple[np.ndarray, np.ndarray]:
    """Decode selected block indices (sorted). Returns (values, block_lens).
    ``restarts=True`` applies the segmented cumsum (docid blocks).
    ``codec`` selects the byte format (manifest["codec"]): LEB128 varints
    or FOR bit-packed blocks (codec.for_decode_stream) — block offsets and
    the returned shape are identical either way."""
    if codec == "for":
        return for_decode_stream(buf, offs, lens, sel, restarts=restarts)
    if codec == "pfor":
        return pfor_decode_stream(buf, offs, lens, sel, restarts=restarts)
    total = int(lens.sum())
    byte_ends = np.concatenate((offs[1:], [len(buf)]))
    # contiguous runs of selected blocks decode as single slices
    runs = np.split(sel, np.flatnonzero(np.diff(sel) > 1) + 1) if sel.size else []
    vals_parts = []
    for run in runs:
        lo, hi = run[0], run[-1]
        raw = varint_decode(
            np.frombuffer(buf, dtype=np.uint8)[offs[lo] : byte_ends[hi]],
            int(lens[lo : hi + 1].sum()),
        )
        vals_parts.append(raw)
    if not vals_parts:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    vals = np.concatenate(vals_parts)
    sel_lens = lens[sel]
    if restarts:
        return segmented_cumsum_decode(vals, sel_lens), sel_lens
    return vals.astype(np.int64), sel_lens


def _count_chunk(
    qinfo: dict,
    block_size: int,
    chunk_bits: int,
    tombstones: np.ndarray | None = None,
    codec: str = "varint",
):
    """Per-chunk exact hit counting (OR semantics) — the TotalHitCount
    collector's shape: decode ONLY the docid blocks of the query terms
    (tfs never touched, nothing scored), union per query, mask dead docs,
    emit one (qid, n) row per chunk. Docids are chunk-partitioned, so the
    global distinct count is the plain SUM of chunk counts."""

    def kernel(key, seg: pd.DataFrame) -> pd.DataFrame:
        if seg.empty:
            return pd.DataFrame({"qid": [], "n": []}).astype(
                {"qid": "str", "n": "int64"}
            )
        chunk = int(key[0])
        base = chunk << chunk_bits
        chunk_docs = 1 << chunk_bits
        dead: np.ndarray | None = None
        if tombstones is not None and tombstones.size:
            in_chunk = tombstones[
                (tombstones >= base) & (tombstones < base + chunk_docs)
            ]
            if in_chunk.size:
                dead = (in_chunk - base).astype(np.int64)
        term_row = {int(t): i for i, t in enumerate(seg["term_id"].to_numpy())}
        seg_rows = list(seg.itertuples(index=False))
        doc_cache: dict[int, np.ndarray] = {}

        def docs_of(row_i: int) -> np.ndarray:
            hit = doc_cache.get(row_i)
            if hit is None:
                r = seg_rows[row_i]
                lens = _block_lens(int(r.n), block_size)
                docids, _ = _decode_selected(
                    bytes(r.doc_gaps),
                    np.asarray(r.block_doc_off, dtype=np.int64),
                    lens, np.arange(lens.size), restarts=True, codec=codec,
                )
                hit = doc_cache[row_i] = docids - base
            return hit

        qids, ns = [], []
        for qid, (tids, _qtfs, _idfs) in qinfo.items():
            rows = [term_row[int(t)] for t in tids if int(t) in term_row]
            if not rows:
                continue
            touched = np.zeros(chunk_docs, dtype=bool)
            for i in rows:
                touched[docs_of(i)] = True
            if dead is not None:
                touched[dead] = False
            n = int(touched.sum())
            if n:
                qids.append(qid)
                ns.append(n)
        return pd.DataFrame({"qid": qids, "n": np.array(ns, dtype=np.int64)})

    return kernel


def _presence_chunk(
    qsets: dict,
    block_size: int,
    chunk_bits: int,
    tombstones: np.ndarray | None = None,
    limit: int | None = None,
    starts: dict[str, dict[int, int]] | None = None,
    cursor_qids: frozenset | None = None,
    codec: str = "varint",
):
    """Per-chunk term-presence counting for boolean masks: ``qsets`` maps
    qid -> np.ndarray of term_ids; emits one (qid, docid, n_hit) row per
    doc containing >= 1 of the qid's terms, n_hit = how many of them.
    Same docid-blocks-only decode as _count_chunk (no tf bytes, no
    scores). ``limit``: keep only each qid's FIRST ``limit`` matching
    docids in the chunk — the sorted-index early-termination cut
    (Searcher.search_sorted): when docid order within the chunk IS the
    index sort order, the chunk's contribution to a global top-k by that
    sort can never exceed its first k matches. ``starts``/``cursor_qids``:
    sorted-index cursor pagination — for a qid in ``cursor_qids``, matches
    before ``starts[qid][chunk]`` are skipped BEFORE the limit cut (within
    a sorted chunk the post-cursor matches form a docid suffix); a cursor
    qid with no starts row for this chunk has no qualifying docs here and
    is skipped outright."""

    def kernel(key, seg: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"qid": [], "docid": [], "n_hit": []}).astype(
            {"qid": "str", "docid": "int64", "n_hit": "int64"}
        )
        if seg.empty:
            return empty
        chunk = int(key[0])
        base = chunk << chunk_bits
        chunk_docs = 1 << chunk_bits
        dead: np.ndarray | None = None
        if tombstones is not None and tombstones.size:
            in_chunk = tombstones[
                (tombstones >= base) & (tombstones < base + chunk_docs)
            ]
            if in_chunk.size:
                dead = (in_chunk - base).astype(np.int64)
        term_row = {int(t): i for i, t in enumerate(seg["term_id"].to_numpy())}
        seg_rows = list(seg.itertuples(index=False))
        doc_cache: dict[int, np.ndarray] = {}

        def docs_of(row_i: int) -> np.ndarray:
            hit = doc_cache.get(row_i)
            if hit is None:
                r = seg_rows[row_i]
                lens = _block_lens(int(r.n), block_size)
                docids, _ = _decode_selected(
                    bytes(r.doc_gaps),
                    np.asarray(r.block_doc_off, dtype=np.int64),
                    lens, np.arange(lens.size), restarts=True, codec=codec,
                )
                hit = doc_cache[row_i] = docids - base
            return hit

        out_qid, out_doc, out_n = [], [], []
        for qid, tids in qsets.items():
            rows = [term_row[int(t)] for t in tids if int(t) in term_row]
            if not rows:
                continue
            counts = np.zeros(chunk_docs, dtype=np.int64)
            for i in rows:
                counts[docs_of(i)] += 1
            if dead is not None:
                counts[dead] = 0
            nz = np.flatnonzero(counts)
            if cursor_qids is not None and qid in cursor_qids:
                st = (starts or {}).get(qid, {}).get(chunk)
                if st is None:
                    continue
                nz = nz[nz >= st - base]
            if limit is not None:
                nz = nz[: int(limit)]
            if nz.size:
                out_qid.append(qid)
                out_doc.append(nz + base)
                out_n.append(counts[nz])
        if not out_qid:
            return empty
        reps = [len(d) for d in out_doc]
        return pd.DataFrame(
            {
                "qid": np.repeat(out_qid, reps),
                "docid": np.concatenate(out_doc).astype(np.int64),
                "n_hit": np.concatenate(out_n).astype(np.int64),
            }
        )

    return kernel


def _score_chunk(
    qinfo: dict,
    k: int,
    avgdl: float,
    k1: float,
    b: float,
    block_size: int,
    prune: bool,
    tombstones: np.ndarray | None = None,
    after: dict | None = None,
    dl_bc=None,
    sim: str = "bm25",
    mu: float = 1000.0,
    codec: str = "varint",
):
    """Returns the scoring applyInPandas kernel — cogrouped with the
    doclens frame by default, or single-frame when ``dl_bc`` (a Spark
    broadcast of {chunk: (base_docid, dls_bytes)}) is provided: the
    interactive fast path that skips the doclens scan + cogroup shuffle
    (two whole stages per query). The broadcast mode is gated by
    Searcher.MAX_DL_BROADCAST_BYTES — at 10^12 docs the doclens are far
    beyond broadcast range and the cogrouped plan is the scalable shape.

    ``tombstones``: sorted global docids that must never score (deleted /
    superseded docs from conversation-granularity appends, index/conv.py).
    They are masked BEFORE top-k selection AND before the theta bootstrap —
    a dead doc's single-term score must not raise the pruning threshold
    above the true k-th live score, or live docs could be pruned away
    (Lucene's liveDocs applied during, not after, collection).

    ``after``: {qid: (round6_score, docid)} pagination cursors
    (searchAfter). A doc survives iff it sorts strictly after the cursor in
    (round6 DESC, docid ASC) order. Cursor queries SKIP the theta bootstrap:
    theta derives from single-term scores of arbitrary docs, and a
    pre-cursor doc's score could push it above the k-th AFTER-cursor total,
    pruning blocks that hold page members — so they decode all their terms'
    blocks (what Lucene's searchAfter re-collection pays too).

    ``sim``: the similarity. "bm25" (default) scores idf·tf/(tf + k1(1-b +
    b·dl/avgdl)) with the per-term stat = idf. "qld" scores Lucene
    LMDirichletSimilarity max(0, log(1 + tf/(mu·p)) + log(mu/(dl + mu)))
    with the per-term stat = P(t|C) (collection probability, threaded in
    qinfo's third slot where BM25 carries idf). QLD unit weights round to
    6 decimals (matching operators/qld.qld_weights bit-for-bit, modulo the
    measure-zero np-vs-JVM midpoint case); the block bound adds 5e-7 so it
    stays admissible over the rounded weights. Both weight functions are
    monotone ↑tf ↓dl, so the (max_tf, min_dl) stats-free block bound is
    admissible for either — one index serves both ranking models."""

    # drop_zero: QLD's and DPH's clamps yield weight-0 matches, which are
    # NON-matches (qld_weights/dph_weights filter them; Lucene never
    # surfaces a zero-scoring term-only hit) — mask them out of decoded
    # postings so a doc matched only by clamped terms is never emitted.
    # BM25 weights are always > 0.
    drop_zero = sim in ("qld", "dph")
    if sim == "qld":

        def _unit_w(tfs_a, dls_a, stat):
            raw = np.log1p(tfs_a / (mu * stat)) + np.log(mu / (dls_a + mu))
            return np.round(np.maximum(raw, 0.0), 6)

        def _bound(tf_b, dl_b, stat):
            raw = np.log1p(tf_b / (mu * stat)) + np.log(mu / (dl_b + mu))
            return np.maximum(raw, 0.0) + 5e-7
    elif sim == "lmjm":
        # Lucene LMJelinekMercerSimilarity; here ``mu`` carries λ. Always
        # > 0 for tf > 0, so no clamp and no zero-drop; same 6-round +
        # bound headroom contract as QLD.
        jm = (1.0 - mu) / mu

        def _unit_w(tfs_a, dls_a, stat):
            return np.round(np.log1p(jm * tfs_a / dls_a / stat), 6)

        def _bound(tf_b, dl_b, stat):
            return np.log1p(jm * tf_b / dl_b / stat) + 5e-7
    elif sim == "f2exp":
        # Axiomatic F2EXP (operators/axiomatic.py); ``mu`` carries s. The
        # per-term stat is ((N+1)/df)^kexp, computed query-side from the
        # dictionary's df column — same stats-on-the-query-side contract as
        # BM25's idf, so segments stay valid across appends. Monotone ↑tf
        # ↓dl; same 6-round + bound headroom contract as QLD/LMJM.
        def _unit_w(tfs_a, dls_a, stat):
            return np.round(
                stat * tfs_a / (tfs_a + mu + mu * dls_a / avgdl), 6
            )

        def _bound(tf_b, dl_b, stat):
            return stat * tf_b / (tf_b + mu + mu * dl_b / avgdl) + 5e-7
    elif sim == "tfidf":
        # Lucene ClassicSimilarity (vector-space TF-IDF); the per-term stat
        # is idf² = (1 + ln(N/(df+1)))², computed query-side from the
        # dictionary's df like the axiomatic stats. sqrt(tf)·idf²/sqrt(dl)
        # is monotone ↑tf ↓dl, so the stats-free block bound is admissible;
        # always > 0 (idf > 1 − ln 2 even at df = N).
        def _unit_w(tfs_a, dls_a, stat):
            return np.round(stat * np.sqrt(tfs_a) / np.sqrt(dls_a), 6)

        def _bound(tf_b, dl_b, stat):
            return stat * np.sqrt(tf_b) / np.sqrt(dl_b) + 5e-7
    elif sim == "inl2":
        # DFR InL2 (operators/dfr.py); ``mu`` carries the normalization-2
        # c. Per-term stat = log2((N+1)/(df+0.5)), query-side from the
        # dictionary's df. tfn rises with tf and falls with dl, and
        # tfn/(tfn+1) rises with tfn, so the stats-free block bound stays
        # admissible; always > 0 (df <= N < N+0.5 keeps the log positive).
        def _unit_w(tfs_a, dls_a, stat):
            tfn = tfs_a * np.log2(1.0 + mu * avgdl / dls_a)
            return np.round(stat * tfn / (tfn + 1.0), 6)

        def _bound(tf_b, dl_b, stat):
            tfn = tf_b * np.log2(1.0 + mu * avgdl / dl_b)
            return stat * tfn / (tfn + 1.0) + 5e-7
    elif sim == "spl":
        # Information-based SPL (operators/dfr.py); ``mu`` carries c. The
        # per-term stat is λ = ctf/N riding in query-side (same
        # collection-frequency contract as QLD's P(t|C), per-doc
        # denominator); λ >= SPL_LAMBDA_LIMIT scores the analytic λ→1
        # limit log2(tfn+1) — dfr.py explains why a clamp would wreck the
        # 6-decimal contract. λ^x falls as x = tfn/(tfn+1) rises, so −log2
        # of the ratio rises with tfn → monotone ↑tf ↓dl (both branches),
        # bound admissible; always > 0 (λ^x > λ for 0 < x < 1).
        from dhr_spark.operators.dfr import SPL_LAMBDA_LIMIT

        def _spl_w(tfn, stat):
            hi = stat >= SPL_LAMBDA_LIMIT
            s_f = np.where(hi, 0.5, stat)  # dummy lanes; branch discarded
            x = tfn / (tfn + 1.0)
            return np.where(
                hi,
                np.log2(tfn + 1.0),
                -np.log2((np.power(s_f, x) - s_f) / (1.0 - s_f)),
            )

        def _unit_w(tfs_a, dls_a, stat):
            tfn = tfs_a * np.log2(1.0 + mu * avgdl / dls_a)
            return np.round(_spl_w(tfn, stat), 6)

        def _bound(tf_b, dl_b, stat):
            tfn = tf_b * np.log2(1.0 + mu * avgdl / dl_b)
            return _spl_w(tfn, stat) + 5e-7
    elif sim == "dph":
        # DFR DPH (operators/dfr.py — Terrier's parameter-free default;
        # Amati hypergeometric + Popper normalization). Per-term stat =
        # λ = ctf/N (the SPL dictionary stat); no knob, ``mu`` unused.
        # Clamped at 0 like QLD; tf == dl lanes take the (1−f)²→0
        # analytic-limit branch (weight 0; dummy denominators keep the
        # discarded lanes finite). DPH is NOT monotone ↑tf — dfr.py
        # proves the factored block bound used here admissible.
        from dhr_spark.operators.dfr import TWO_PI

        def _unit_w(tfs_a, dls_a, stat):
            dls_s = np.where(tfs_a >= dls_a, tfs_a + 1.0, dls_a)
            f = tfs_a / dls_s
            om = 1.0 - f
            norm = om * om / (tfs_a + 1.0)
            a = tfs_a * np.log2(tfs_a * avgdl / dls_s / stat)
            bb = 0.5 * np.log2(TWO_PI * tfs_a * om)
            w = np.round(np.maximum(norm * (a + bb), 0.0), 6)
            return np.where(tfs_a >= dls_a, 0.0, w)

        def _bound(tf_b, dl_b, stat):
            lmax = np.log2(tf_b * avgdl / dl_b / stat)
            bmax = 0.5 * np.log2(TWO_PI * tf_b)
            return (
                np.maximum(lmax, 0.0)
                + 0.5 * np.maximum(bmax, 0.0)
                + 5e-7
            )
    elif sim == "impact":
        # learned-sparse impact scoring (index/impact.py): the stored "tf"
        # IS the integer impact and the unit weight is the impact itself —
        # score(q, d) = Σ qweight · impact, no length normalization
        # (gip_retrieval.py:117-126 with encoder weights on both sides).
        # Exact: integers in float64 carry no rounding, so no 6-round and
        # no bound headroom; the block bound is just block_max_tf (= the
        # block-max impact), dl-independent and trivially admissible.
        def _unit_w(tfs_a, dls_a, stat):
            return np.asarray(tfs_a, dtype=np.float64)

        def _bound(tf_b, dl_b, stat):
            return np.asarray(tf_b, dtype=np.float64)
    elif sim == "bm25":

        def _unit_w(tfs_a, dls_a, stat):
            return bm25_weights_np(tfs_a, dls_a, stat, avgdl, k1, b)

        def _bound(tf_b, dl_b, stat):
            return stat * tf_b / (tf_b + k1 * (1.0 - b + b * dl_b / avgdl))
    else:
        raise ValueError(
            f"unknown similarity {sim!r} "
            "(bm25 | qld | lmjm | f2exp | tfidf | inl2 | spl | dph | impact)"
        )

    def _empty() -> pd.DataFrame:
        return pd.DataFrame({"qid": [], "docid": [], "score": []}).astype(
            {"qid": "str", "docid": "int64", "score": "float64"}
        )

    def kernel_bcast(key, seg: pd.DataFrame) -> pd.DataFrame:
        if seg.empty:
            return _empty()
        hit = dl_bc.value.get(int(key[0]))
        if hit is None:
            return _empty()
        base, dls_bytes = hit
        return score_frame(
            seg, int(base), np.frombuffer(dls_bytes, dtype=np.int32)
        )

    def kernel(key, seg: pd.DataFrame, dl: pd.DataFrame) -> pd.DataFrame:
        if seg.empty or dl.empty:
            return _empty()
        return score_frame(
            seg,
            int(dl["base_docid"].iloc[0]),
            np.frombuffer(dl["dls"].iloc[0], dtype=np.int32),
        )

    def score_frame(seg: pd.DataFrame, base: int, dls: np.ndarray) -> pd.DataFrame:
        dead: np.ndarray | None = None
        if tombstones is not None and tombstones.size:
            in_chunk = tombstones[
                (tombstones >= base) & (tombstones < base + dls.size)
            ]
            if in_chunk.size:
                dead = (in_chunk - base).astype(np.int64)
        term_row = {int(t): i for i, t in enumerate(seg["term_id"].to_numpy())}
        seg_rows = list(seg.itertuples(index=False))

        out_qid: list[str] = []
        out_doc: list[np.ndarray] = []
        out_score: list[np.ndarray] = []

        # how many queries need each term in this chunk — terms shared across
        # queries are decoded (and weighted) once, amortized over the batch.
        # idf rides in on the QUERY side (current term-dictionary stats) —
        # segment rows are stats-free, so they stay valid across appends.
        usage: dict[int, int] = {}
        row_idf: dict[int, float] = {}
        for tids, _, idfs in qinfo.values():
            for t, t_idf in zip(tids, idfs):
                i = term_row.get(int(t))
                if i is not None:
                    usage[i] = usage.get(i, 0) + 1
                    row_idf[i] = float(t_idf)

        bound_cache: dict[int, np.ndarray] = {}

        def block_bounds(row_i: int) -> np.ndarray:
            """Admissible per-block weight upper bounds under CURRENT stats:
            idf·f(max_tf, min_dl) — w is monotone ↑tf, ↓dl."""
            hit = bound_cache.get(row_i)
            if hit is None:
                r = seg_rows[row_i]
                tf_b = np.asarray(r.block_max_tf, dtype=np.float64)
                dl_b = np.asarray(r.block_min_dl, dtype=np.float64)
                hit = bound_cache[row_i] = _bound(tf_b, dl_b, row_idf[row_i])
            return hit

        def decode_term(row_i: int, sel: np.ndarray | None):
            r = seg_rows[row_i]
            lens = _block_lens(int(r.n), block_size)
            if sel is None:
                sel = np.arange(lens.size)
            docids, _ = _decode_selected(
                bytes(r.doc_gaps), np.asarray(r.block_doc_off, dtype=np.int64),
                lens, sel, restarts=True, codec=codec,
            )
            tfs, _ = _decode_selected(
                bytes(r.tfs), np.asarray(r.block_tf_off, dtype=np.int64),
                lens, sel, restarts=False, codec=codec,
            )
            return docids - base, tfs

        full_cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}

        def get_full(row_i: int) -> tuple[np.ndarray, np.ndarray]:
            """(local docids, unit BM25 weights) with full decode, cached."""
            hit = full_cache.get(row_i)
            if hit is None:
                d_loc, tfs = decode_term(row_i, None)
                wts = _unit_w(tfs, dls[d_loc], row_idf[row_i])
                if drop_zero and wts.size:
                    keep = wts > 0
                    d_loc, wts = d_loc[keep], wts[keep]
                hit = full_cache[row_i] = (d_loc, wts)
            return hit

        def emit(qid: str, scores: np.ndarray, touched: np.ndarray) -> None:
            if dead is not None:
                touched[dead] = False
            cand = np.flatnonzero(touched)
            if cand.size == 0:
                return
            cs = scores[cand]
            aft = after.get(qid) if after else None
            if aft is not None:
                a_score, a_doc = float(aft[0]), int(aft[1])
                cs6 = np.round(cs, 6)
                keep = (cs6 < a_score) | (
                    (cs6 == a_score) & (cand + base > a_doc)
                )
                cand, cs = cand[keep], cs[keep]
                if cand.size == 0:
                    return
            if cand.size > k:
                # deterministic cut: round6 score DESC, docid ASC — matches
                # the global merge's tie-break so ties at the kth slot never
                # depend on partition order
                keep = np.lexsort((cand, -np.round(cs, 6)))[:k]
                cand, cs = cand[keep], cs[keep]
            out_qid.append(qid)
            out_doc.append(cand + base)
            out_score.append(cs)

        for qid, (tids, qtfs, _idfs) in qinfo.items():
            present = [
                (term_row[t], float(w)) for t, w in zip(tids, qtfs) if t in term_row
            ]
            if not present:
                continue

            # batch fast path: every term shared (or already decoded) —
            # vectorized exact scoring straight off the cache
            if not prune or all(
                usage[i] > 1 or i in full_cache for i, _ in present
            ):
                scores = np.zeros(dls.size, dtype=np.float64)
                touched = np.zeros(dls.size, dtype=bool)
                for i, w in present:
                    d_loc, wts = get_full(i)
                    scores[d_loc] += w * wts
                    touched[d_loc] = True
                emit(qid, scores, touched)
                continue

            # block-max WAND path (single-use terms: skipping blocks saves
            # real decode work)
            U = np.array(
                [w * float(block_bounds(i).max()) for i, w in present]
            )
            scores = np.zeros(dls.size, dtype=np.float64)
            touched = np.zeros(dls.size, dtype=bool)

            theta = -np.inf
            order = np.argsort(-U)
            if len(present) > 1 and not (after and qid in after):
                i_star, w_star = present[order[0]]
                if int(seg_rows[i_star].n) >= k:
                    d_loc, wts = get_full(i_star)
                    if dead is not None:
                        wts = wts[~np.isin(d_loc, dead)]
                    if wts.size >= k:
                        theta = float(np.partition(w_star * wts, -k)[-k])

            sumU = float(U.sum())
            for oi in order:
                i, w = present[oi]
                if i in full_cache or usage[i] > 1:
                    d_loc, wts = get_full(i)
                    scores[d_loc] += w * wts
                    touched[d_loc] = True
                    continue
                bm = block_bounds(i)
                others = sumU - float(U[oi])
                sel_arg = None
                if theta > -np.inf:
                    sel = np.flatnonzero(w * bm + others >= theta)
                    if sel.size == 0:
                        continue
                    if sel.size < bm.size:
                        sel_arg = sel
                d_loc, tfs = decode_term(i, sel_arg)
                if d_loc.size == 0:
                    continue
                wts_i = _unit_w(tfs, dls[d_loc], row_idf[i])
                if drop_zero:
                    keep = wts_i > 0
                    d_loc, wts_i = d_loc[keep], wts_i[keep]
                    if d_loc.size == 0:
                        continue
                scores[d_loc] += w * wts_i
                touched[d_loc] = True

            emit(qid, scores, touched)

        if not out_qid:
            return pd.DataFrame({"qid": [], "docid": [], "score": []}).astype(
                {"qid": "str", "docid": "int64", "score": "float64"}
            )
        reps = [len(d) for d in out_doc]
        return pd.DataFrame(
            {
                "qid": np.repeat(out_qid, reps),
                "docid": np.concatenate(out_doc).astype(np.int64),
                "score": np.concatenate(out_score),
            }
        )

    return kernel_bcast if dl_bc is not None else kernel


class Searcher:
    """Reusable query session over a built index.

    Holds the manifest, the analyzer, and CACHED doclens so repeated
    searches skip per-call parquet footer/listing work — the Spark analogue
    of the reference keeping its index tensors resident between queries
    (gip_retrieval.py:287-315). Segments intentionally stay ON DISK: they are
    read with a term_id pushdown per search (only the query terms' rows move),
    which is the behavior that survives indexes far larger than cluster RAM.

    ``interactive=True`` tunes the SESSION for point-query latency: AQE's
    stage-by-stage scheduling and wide shuffle fan-out only pay off for
    throughput; a single query wants a fixed few-partition plan (measured
    p50 1.65 s -> 1.21 s on local[32]). Session-global and sticky by design
    — use a dedicated session (or Searcher) per serving mode, exactly as a
    real deployment separates its interactive and batch query tiers.
    """

    INTERACTIVE_SHUFFLE_PARTITIONS = 8

    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        cache: bool = True,
        interactive: bool = False,
        k1: float | None = None,
        b: float | None = None,
        corpus_stats: dict | None = None,
        snapshot: int | None = None,
    ):
        """``snapshot`` pins this searcher to an earlier committed state
        (builder.list_snapshots ids): the archived manifest's chunk list,
        dictionary version, stats, and tombstone watermark drive every
        read, so later appends/deletes are invisible — an Iceberg-style
        point-in-time read. Valid until a compaction's GC replaces the
        chunk files that snapshot references.

        ``k1``/``b`` override the manifest's BM25 parameters for THIS
        searcher — Lucene's per-IndexSearcher setSimilarity analogue. The
        stats-free segment layout makes this sound at query time: segments
        store raw (tf, dl) with (max_tf, min_dl) block bounds, and
        w = idf·tf/(tf + k1(1-b+b·dl/avgdl)) stays monotone ↑tf ↓dl for any
        k1 > 0, 0 <= b <= 1, so the WAND pruning bound remains admissible
        under the overridden parameters. No reindex, ever.

        ``corpus_stats`` replaces the index's OWN statistics with externally
        merged ones — {"avgdl": float, "idf": {term: idf} or DataFrame
        (term, idf)} — which is how federated search (operators.federate.
        MultiSearcher) makes N shard indexes score as one logical corpus:
        each shard runs its ordinary WAND pass under the GLOBAL idf/avgdl.
        Admissibility is unaffected (any stats are sound); terms absent
        from the override keep their local idf."""
        from dhr_spark.functions.analyzer import _ANALYZERS

        self.spark = spark
        self.index_dir = index_dir
        if interactive:
            spark.conf.set("spark.sql.adaptive.enabled", "false")
            spark.conf.set(
                "spark.sql.shuffle.partitions",
                str(self.INTERACTIVE_SHUFFLE_PARTITIONS),
            )
        man = load_manifest(index_dir, snapshot=snapshot)
        if man is None:
            raise FileNotFoundError(f"no manifest in {index_dir}")
        if int(man.get("version", 1)) < 2:
            raise ValueError(
                f"index at {index_dir} is manifest version "
                f"{man.get('version', 1)} (pre-stats-free block bounds); "
                "rebuild it with the current builder"
            )
        self.manifest = man
        # "bm25" family (tf/dl postings) vs "impact" (learned-sparse integer
        # impacts, index/impact.py) — the stored per-posting integer means a
        # different thing in each, so cross-use is refused in _scored_frame
        self._scoring = man.get("scoring", "bm25")
        # posting-bytes codec ("varint" default, "for" bit-packed) — every
        # decode kernel this searcher builds dispatches on it
        self._codec = man.get("codec", "varint")
        self.k1 = float(man["k1"]) if k1 is None else float(k1)
        self.b = float(man["b"]) if b is None else float(b)
        if self.k1 <= 0 or not (0.0 <= self.b <= 1.0):
            raise ValueError(
                f"BM25 override out of range (k1={self.k1}, b={self.b}): "
                "the block-max bound is admissible only for k1 > 0 and "
                "0 <= b <= 1"
            )
        self._analyze = _ANALYZERS[man["analyzer_mode"]]
        self._avgdl = float(man["avgdl"])
        self._stats_override = bool(corpus_stats)
        idf_over = None
        self._ctf_over = None
        self._total_dl_over = None
        self._df_over = None
        self._n_docs_over = None
        if corpus_stats:
            self._avgdl = float(corpus_stats.get("avgdl", self._avgdl))
            idf_over = corpus_stats.get("idf")
            # federated QLD: global collection term frequencies + total
            # collection length (MultiSearcher merges them when every
            # member dictionary carries ctf)
            self._ctf_over = corpus_stats.get("ctf")
            if corpus_stats.get("total_dl") is not None:
                self._total_dl_over = int(corpus_stats["total_dl"])
            # federated F2EXP: merged document frequencies + global doc count
            self._df_over = corpus_stats.get("df")
            if corpus_stats.get("n_docs") is not None:
                self._n_docs_over = int(corpus_stats["n_docs"])
        self._idf_dict_over = idf_over if isinstance(idf_over, dict) else None
        td_dir = man.get("term_dict_dir", "term_dict")
        self._tdict = spark.read.parquet(f"{index_dir}/{td_dir}").select(
            "term", "term_id", "idf"
        )
        if idf_over is not None and self._idf_dict_over is None:
            # DataFrame override (huge federated vocabularies): swap in the
            # global idf column; terms outside the override keep local idf
            self._tdict = (
                self._tdict.withColumnRenamed("idf", "_lidf")
                .join(
                    idf_over.withColumnRenamed("idf", "_gidf"), "term", "left"
                )
                .select(
                    "term",
                    "term_id",
                    F.coalesce("_gidf", "_lidf").alias("idf"),
                )
            )
        self._seg = self._prune_to_manifest(
            spark.read.parquet(f"{index_dir}/segments")
        )
        self._dl = self._prune_to_manifest(
            spark.read.parquet(f"{index_dir}/doclens")
        )
        self._tid_cache: dict[str, int] | None = None
        # conversation-granularity appends tombstone superseded docids
        # (index/conv.py); the set is driver-resident and masked inside the
        # scoring kernel. Bounded by MAX_TOMBSTONES — compaction (a rebuild
        # over live docs) clears it, exactly like a Lucene segment merge.
        self._tombstones: np.ndarray | None = None
        n_tomb = int(man.get("tombstones", 0))
        if n_tomb:
            if n_tomb > self.MAX_TOMBSTONES:
                raise ValueError(
                    f"index carries {n_tomb} tombstones (> "
                    f"{self.MAX_TOMBSTONES}); compact it (rebuild over live "
                    "docs) before serving"
                )
            from dhr_spark.index.builder import read_tombstones

            rows = read_tombstones(spark, index_dir, man).collect()
            self._tombstones = np.array(
                sorted(int(r["docid"]) for r in rows), dtype=np.int64
            )
        self._dl_bc = None
        if cache:
            # doclens: one small row per chunk — always worth pinning
            self._dl = self._dl.cache()
            # interactive fast path: when the packed doclens fit comfortably
            # in a broadcast (4 bytes/doc), ship them to the workers ONCE and
            # score with a single-frame kernel — drops the doclens scan +
            # cogroup shuffle (2 stages) from EVERY point query (measured
            # p50 1.31 -> 1.26 s warm). Interactive tier only: the batch
            # tier measured ~18% SLOWER under the broadcast (per-worker
            # deserialization across 32 shuffle partitions outweighs the
            # saved stages), and beyond the size gate (10^12-doc territory)
            # the cogrouped plan is the only scalable shape.
            if (
                interactive
                and int(man["n_docs"]) * 4 <= self.MAX_DL_BROADCAST_BYTES
            ):
                self._dl_bc = spark.sparkContext.broadcast(
                    {
                        int(r["chunk"]): (
                            int(r["base_docid"]),
                            bytes(r["dls"]),
                        )
                        for r in self._dl.collect()
                    }
                )
            if int(man.get("n_terms", 1 << 62)) <= 2_000_000:
                # small vocabulary: resident driver-side dict — query prep
                # becomes zero Spark jobs (at 10^7+ terms stay distributed)
                ov = self._idf_dict_over or {}
                self._tid_cache = {
                    r["term"]: (
                        int(r["term_id"]),
                        float(ov.get(r["term"], r["idf"])),
                    )
                    for r in self._tdict.collect()
                }

    MAX_COLLECTED_QUERIES = 100_000
    MAX_CHUNK_ISIN = 100_000
    MAX_TOMBSTONES = 5_000_000
    MAX_DL_BROADCAST_BYTES = 64 << 20  # 16M docs; beyond -> cogrouped plan

    def _prune_to_manifest(self, df: DataFrame) -> DataFrame:
        """Restrict a chunk-partitioned artifact scan to the chunks committed
        in the manifest lineage. A crashed append leaves orphan chunk
        partitions on disk (the manifest rewrite is the atomic commit point);
        without this filter those never-committed docs would be scored and
        returned with no doc_map entry. ``chunk`` is the partition column, so
        the predicate is pure partition pruning — no data files of pruned
        chunks are even listed. Exact ``isin`` up to MAX_CHUNK_ISIN committed
        chunks; beyond that (10^12-turn scale: millions of chunks) the
        contiguity invariant (the base build numbers chunks densely and every
        append starts at the next chunk boundary) makes a <=max-chunk range
        predicate equivalent and O(1) to plan."""
        chunks = [int(c) for c in self.manifest["chunks"]]
        if len(chunks) <= self.MAX_CHUNK_ISIN:
            return df.filter(F.col("chunk").isin(chunks))
        if self.manifest.get("pending_gc"):
            # a committed compaction whose GC hasn't finished leaves stale
            # chunk partitions on disk; the <=max fallback predicate below
            # cannot exclude them (the dropped chunk ids sit inside the
            # live range), so exact pruning is mandatory until GC runs
            raise ValueError(
                "index has a pending compaction GC and too many chunks for "
                "exact pruning — run index.compact.gc_index first"
            )
        return df.filter(F.col("chunk") <= max(chunks))

    def _filter_live(self, df: DataFrame) -> DataFrame:
        """Drop tombstoned docids from a (docid, ...) result frame — the
        positional/phrase twins of the kernel's dead-doc mask."""
        if self._tombstones is None or not self._tombstones.size:
            return df
        ids = [int(x) for x in self._tombstones]
        if len(ids) <= 10_000:
            return df.filter(~F.col("docid").isin(ids))
        tomb = self.spark.createDataFrame([(i,) for i in ids], "docid long")
        return df.join(F.broadcast(tomb), "docid", "left_anti")

    def _query_info(self, queries: DataFrame, want_qlen: bool = False):
        """Driver-side query prep: the query set is collected into the
        scoring kernel regardless (the reference loads all queries up front,
        gip_retrieval.py:263-283); analyzing |Q| strings here removes a
        pandas-UDF stage + broadcast join + extra job from every search.

        ``want_qlen=True`` additionally returns {qid: analyzed token count
        INCLUDING out-of-vocabulary terms} — RM3's query-model denominator —
        so callers never re-collect the query set.

        Guarded at MAX_COLLECTED_QUERIES: an offline eval over millions of
        queries should not funnel through the driver — route it through the
        distributed slow path (operators.topk.search_slow_path), which
        scores all queries in one shuffled join with no driver state."""
        qrows = (
            queries.select("qid", "text")
            .limit(self.MAX_COLLECTED_QUERIES + 1)
            .collect()
        )
        if len(qrows) > self.MAX_COLLECTED_QUERIES:
            raise ValueError(
                f"query set exceeds {self.MAX_COLLECTED_QUERIES} rows; "
                "Searcher collects queries to the driver for interactive/"
                "batch use — run huge offline evals through the distributed "
                "slow path (operators.topk.search_slow_path) instead"
            )
        qterm_tf: dict[str, dict[str, int]] = {}
        qlen: dict[str, int] = {}
        for r in qrows:
            tf: dict[str, int] = {}
            toks = self._analyze(r["text"] or "")
            for t in toks:
                tf[t] = tf.get(t, 0) + 1
            if tf:
                qterm_tf[r["qid"]] = tf
                qlen[r["qid"]] = len(toks)
        terms = sorted({t for tf in qterm_tf.values() for t in tf})
        if self._tid_cache is not None:
            tid = {t: self._tid_cache[t] for t in terms if t in self._tid_cache}
        else:
            ov = self._idf_dict_over or {}
            tid = {
                r["term"]: (
                    int(r["term_id"]),
                    float(ov.get(r["term"], r["idf"])),
                )
                for r in self._tdict.filter(F.col("term").isin(terms)).collect()
            }
        qinfo: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
        for qid, tf in qterm_tf.items():
            # (term_id, qtf, current idf) triples — idf travels with the
            # query so the kernel scores under CURRENT stats (appends shift
            # idf/avgdl; committed segments never re-encode)
            trips = [(tid[t][0], c, tid[t][1]) for t, c in tf.items() if t in tid]
            if trips:
                trips.sort()
                a = np.array([(t, c) for t, c, _ in trips], dtype=np.int64)
                idfs = np.array([x[2] for x in trips], dtype=np.float64)
                qinfo[qid] = (a[:, 0], a[:, 1].astype(np.float64), idfs)
        if want_qlen:
            return qinfo, sorted(i for i, _ in tid.values()), qlen
        return qinfo, sorted(i for i, _ in tid.values())

    def search(self, queries: DataFrame, k: int = 1000, prune: bool = True) -> DataFrame:
        """queries (qid, text) -> (qid, docid, rank, score) top-k."""
        qinfo, all_terms = self._query_info(queries)
        return self._search_prepared(qinfo, all_terms, k, prune)

    def search_batch(self, queries: DataFrame, k: int = 1000) -> DataFrame:
        """(qid, docid, rank, score): FULLY DISTRIBUTED batch search — the
        first-class form of the > MAX_COLLECTED_QUERIES path that the
        ``_query_info`` gate error points at. No driver-resident query
        state at ANY query-set size: analysis runs as an Arrow UDF stage
        over the query frame, the dictionary resolves by equi-join (never
        a collected term dict), postings decode per segment partition into
        (term_id, docid, tf) rows, and scoring is one shuffled aggregate.
        Rank/score contract is identical to ``search`` (round-6 score ties
        broken by docid ASC) — pinned by a pytest identity test and the
        driver's ``bm25_topk_bigbatch`` oracle.

        When to use which: ``search`` (the collected-kernel path) is
        faster below ~10^5 queries — query prep is zero or one tiny job
        and the scoring kernel early-terminates per chunk. This path is
        for offline evals at 10^5–10^9 queries, where a driver query dict
        is the scale killer; its cost is one full decode of the matched
        posting lists (no block-max pruning — with 10^5+ queries batched,
        essentially every block contains some query's candidate anyway,
        so pruning would buy nothing).

        Scale shape: segments prune to the queried term_ids by semi-join
        (AQE picks build side), decode is mapInPandas over the pruned
        partitions, the scoring join shuffles on term_id then aggregates
        on (qid, docid) — the same two-wide-shuffle plan as the oracle
        slow path, with no collect anywhere.
        """
        from dhr_spark.functions.bm25 import bm25_weight_col
        from dhr_spark.index.compact import decode_doclens, decode_segments
        from dhr_spark.operators.termfreq import with_tokens
        from dhr_spark.operators.topk import topk

        if self._scoring != "bm25":
            raise ValueError(
                "search_batch scores text (bm25) indexes; impact indexes "
                "take the distributed path operators.impact.impact_topk"
            )
        qtok = with_tokens(
            queries.select("qid", "text"),
            mode=self.manifest["analyzer_mode"],
        )
        qtfs = (
            qtok.select("qid", F.explode("tokens").alias("term"))
            .groupBy("qid", "term")
            .agg(F.count("*").alias("qtf"))
        )
        tdict = self._tdict
        if self._idf_dict_over:
            ov = self.spark.createDataFrame(
                [(t, float(v)) for t, v in self._idf_dict_over.items()],
                "term string, _oidf double",
            )
            tdict = (
                tdict.join(F.broadcast(ov), "term", "left")
                .select(
                    "term", "term_id",
                    F.coalesce("_oidf", "idf").alias("idf"),
                )
            )
        qterms = qtfs.join(tdict, "term").select("qid", "term_id", "qtf", "idf")
        tids = qterms.select("term_id").distinct()
        seg = self._seg.join(tids, "term_id", "left_semi")
        posts = self._filter_live(
            decode_segments(
                seg, int(self.manifest["block_size"]), codec=self._codec
            )
        )
        dl = decode_doclens(self._dl).select("docid", "dl")
        w = bm25_weight_col(
            F.col("tf"), F.col("dl"), F.col("idf"),
            F.lit(self._avgdl), self.k1, self.b,
        )
        scored = (
            posts.join(qterms, "term_id")
            .join(dl, "docid")
            .groupBy("qid", "docid")
            .agg(F.sum(F.col("qtf") * w).alias("score"))
        )
        return topk(scored, k)

    def search_impact(
        self, queries: DataFrame, k: int = 1000, prune: bool = True
    ) -> DataFrame:
        """Impact top-k over a learned-sparse index (index/impact.py):
        score(q, d) = Σ_t qweight(t) · impact(t, d) — the reference's gated
        inner product with precomputed weights on both sides
        (gip_retrieval.py:117-126; densify_corpus.py:109 model switch).

        ``queries`` is either (qid, text) — analyzed with the manifest's
        analyzer and term COUNTS become query weights (the DeepImpact query
        convention, densify_query.py:81-91) — or (qid, term, weight) rows
        from a query encoder (uniCOIL convention), which bypass the
        analyzer entirely. Runs the ordinary block-max WAND kernel with the
        per-block bound qweight · block_max_impact (dl-independent)."""
        if self._scoring != "impact":
            raise ValueError(
                f"search_impact needs an impact index (manifest scoring="
                f"{self._scoring!r}); build one with "
                "index.impact.build_impact_index"
            )
        cols = set(queries.columns)
        if {"term", "weight"} <= cols:
            qrows = (
                queries.select("qid", "term", "weight")
                .limit(self.MAX_COLLECTED_QUERIES + 1)
                .collect()
            )
            if len(qrows) > self.MAX_COLLECTED_QUERIES:
                raise ValueError(
                    f"weighted query set exceeds {self.MAX_COLLECTED_QUERIES}"
                    " rows; run huge offline evals through the distributed "
                    "slow path (operators.impact.impact_topk)"
                )
            by_q: dict[str, dict[str, float]] = {}
            for r in qrows:
                w = float(r["weight"])
                if w > 0:
                    qd = by_q.setdefault(r["qid"], {})
                    qd[r["term"]] = qd.get(r["term"], 0.0) + w
            terms = sorted({t for qd in by_q.values() for t in qd})
            if self._tid_cache is not None:
                tid = {
                    t: self._tid_cache[t][0]
                    for t in terms
                    if t in self._tid_cache
                }
            else:
                tid = {
                    r["term"]: int(r["term_id"])
                    for r in self._tdict.filter(
                        F.col("term").isin(terms)
                    ).collect()
                }
            qinfo: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
            for qid, qd in by_q.items():
                trips = sorted(
                    (tid[t], w) for t, w in qd.items() if t in tid
                )
                if trips:
                    qinfo[qid] = (
                        np.array([t for t, _ in trips], dtype=np.int64),
                        np.array([w for _, w in trips], dtype=np.float64),
                        np.ones(len(trips), dtype=np.float64),
                    )
            all_terms = sorted(tid.values())
        else:
            qinfo, all_terms = self._query_info(queries)
            # the stat slot (idf for BM25) is unused by the impact kernel;
            # normalize it to 1 so qinfo is similarity-agnostic
            qinfo = {
                qid: (tids, qtfs, np.ones_like(idfs))
                for qid, (tids, qtfs, idfs) in qinfo.items()
            }
        return self._search_prepared(qinfo, all_terms, k, prune, sim="impact")

    def search_qld(
        self,
        queries: DataFrame,
        k: int = 1000,
        mu: float = 1000.0,
        prune: bool = True,
    ) -> DataFrame:
        """Query-likelihood Dirichlet top-k over the SAME index — the
        reference searcher's other ranking model (Pyserini
        ``SimpleSearcher.set_qld``; semantics = operators/qld.qld_weights,
        Lucene LMDirichletSimilarity with the per-term >= 0 clamp).

        The stats-free segment layout makes the similarity pluggable at
        query time: segments store raw (tf, dl) with (max_tf, min_dl)
        block bounds, and the QLD weight is monotone ↑tf ↓dl, so the same
        block-max pruning applies under an admissible QLD bound — no
        reindex to switch models. P(t|C) = ctf/total_dl comes from the
        dictionary's ctf column (written by current builds, maintained
        additively by appends and subtractively by exact-stats deletes);
        pre-ctf indexes raise with a rebuild hint. total_dl is the LIVE
        manifest value, so appends/deletes shift the collection LM exactly
        as they shift idf/avgdl for BM25."""
        if mu <= 0:
            raise ValueError(f"mu must be > 0, got {mu}")
        qinfo, all_terms = self._query_info(queries)
        if not all_terms:
            return self._search_prepared({}, [], k, prune)
        qinfo2 = self._lm_query_probs(qinfo, all_terms)
        return self._search_prepared(
            qinfo2, all_terms, k, prune, sim="qld", mu=mu
        )

    def search_lmjm(
        self,
        queries: DataFrame,
        k: int = 1000,
        lam: float = 0.1,
        prune: bool = True,
    ) -> DataFrame:
        """LM Jelinek-Mercer top-k over the same index (Lucene
        LMJelinekMercerSimilarity):

            w(t, d) = log(1 + ((1-λ)·tf/dl) / (λ·P(t|C)))

        — the linear-interpolation smoothing twin of Dirichlet. Always
        positive for tf > 0 (no clamp), monotone ↑tf ↓dl, so the same
        stats-free (max_tf, min_dl) block bound prunes it. Shares the ctf
        dictionary column and the federated ctf/total_dl override with
        search_qld. Lucene's title default is λ=0.1 (long text: 0.7)."""
        if not (0.0 < lam < 1.0):
            raise ValueError(f"lambda must be in (0, 1), got {lam}")
        qinfo, all_terms = self._query_info(queries)
        if not all_terms:
            return self._search_prepared({}, [], k, prune)
        qinfo2 = self._lm_query_probs(qinfo, all_terms)
        return self._search_prepared(
            qinfo2, all_terms, k, prune, sim="lmjm", mu=lam
        )

    def _prep_sim(
        self, queries: DataFrame, sim: str, param: float | None = None
    ):
        """(qinfo2, all_terms, kernel_sim, mu): query-side stats + kernel
        branch + parameter for ANY pluggable similarity, so filter-context
        paths (search_filtered, search_min_docid) compose with every
        scorer the way Lucene filters do. ``param`` is the similarity's
        single knob (qld mu | lmjm lambda | f2exp/f2log s); defaults match
        the dedicated search_* methods. F2EXP's kexp stays at the Anserini
        default here — use search_f2exp for a custom exponent."""
        defaults = {
            "bm25": 0.0, "qld": 1000.0, "lmjm": 0.1,
            "f2exp": 0.5, "f2log": 0.5, "tfidf": 0.0,
            "inl2": 0.1, "spl": 0.1, "dph": 0.0,
        }
        if sim not in defaults:
            raise ValueError(
                f"unknown similarity {sim!r} ({' | '.join(defaults)})"
            )
        mu = defaults[sim] if param is None else float(param)
        if sim == "qld" and mu <= 0:
            raise ValueError(f"mu must be > 0, got {mu}")
        if sim == "lmjm" and not (0.0 < mu < 1.0):
            raise ValueError(f"lambda must be in (0, 1), got {mu}")
        if sim in ("f2exp", "f2log") and mu <= 0:
            raise ValueError(f"s must be > 0, got {mu}")
        if sim in ("inl2", "spl") and mu <= 0:
            raise ValueError(f"c must be > 0, got {mu}")
        if sim == "dph" and param is not None:
            raise ValueError("dph is parameter-free — no knob to pass")
        qinfo, all_terms = self._query_info(queries)
        if not all_terms:
            return {}, [], "bm25", 0.0
        if sim in ("qld", "lmjm"):
            return self._lm_query_probs(qinfo, all_terms), all_terms, sim, mu
        if sim in ("spl", "dph"):
            q2 = self._lm_query_probs(qinfo, all_terms, per_doc=True)
            return q2, all_terms, sim, mu
        if sim == "inl2":
            q2 = self._f2_query_stats(qinfo, all_terms, 0.0, shape="inl2")
            return q2, all_terms, "inl2", mu
        if sim == "f2exp":
            q2 = self._f2_query_stats(qinfo, all_terms, 0.35, shape="exp")
            return q2, all_terms, "f2exp", mu
        if sim == "f2log":
            q2 = self._f2_query_stats(qinfo, all_terms, 0.0, shape="log")
            return q2, all_terms, "f2exp", mu
        if sim == "tfidf":
            q2 = self._f2_query_stats(qinfo, all_terms, 0.0, shape="tfidf")
            return q2, all_terms, "tfidf", mu
        return qinfo, all_terms, "bm25", mu

    def _lm_query_probs(
        self, qinfo: dict, all_terms: list[int], per_doc: bool = False
    ) -> dict:
        """qinfo with the third slot (idf for BM25) replaced by a
        collection-frequency stat: P(t|C) = ctf/total_dl (the stat both LM
        similarities score with), or with ``per_doc=True`` the SPL model's
        λ = ctf/N (per-document mean frequency, raw — the kernel's spl
        branch handles λ ≥ SPL_LAMBDA_LIMIT, operators/dfr.py). Raises on
        a pre-ctf dictionary or an idf-only federated override."""
        need_denom = (
            self._n_docs_over if per_doc else self._total_dl_over
        )
        if self._stats_override and (
            self._ctf_over is None or need_denom is None
        ):
            raise ValueError(
                "LM/SPL scoring under a corpus_stats override needs global "
                "'ctf' and '" + ("n_docs" if per_doc else "total_dl")
                + "' in the override (MultiSearcher provides them when "
                "every member dictionary has ctf) — this override does not"
            )
        td_dir = self.manifest.get("term_dict_dir", "term_dict")
        dict_df = self.spark.read.parquet(f"{self.index_dir}/{td_dir}")
        if "ctf" not in dict_df.columns and self._ctf_over is None:
            raise ValueError(
                "index dictionary has no ctf column (built before QLD "
                "support) — rebuild the index to materialize collection "
                "term frequencies (appends keep a legacy dictionary legacy "
                "by design; only a rebuild adds the column)"
            )
        if self._ctf_over is not None:
            # global ctf is keyed by TERM (member term_ids differ across
            # shards): map this index's query term_ids back to strings,
            # then look up the merged collection frequency
            trows = (
                dict_df.filter(
                    F.col("term_id").isin([int(t) for t in all_terms])
                )
                .select("term_id", "term")
                .collect()
            )
            if isinstance(self._ctf_over, dict):
                cmap = self._ctf_over
            else:
                terms = [r["term"] for r in trows]
                cmap = {
                    r["term"]: int(r["ctf"])
                    for r in self._ctf_over.filter(
                        F.col("term").isin(terms)
                    ).collect()
                }
            ctf = {int(r["term_id"]): int(cmap.get(r["term"], 0)) for r in trows}
            if any(c <= 0 for c in ctf.values()):
                # every term in a member dictionary contributes >= 1 to the
                # merged ctf — a zero means the override predates an append
                raise ValueError(
                    "corpus_stats ctf override is missing query terms that "
                    "exist in this member's dictionary — rebuild the "
                    "MultiSearcher after index changes (stats merge is "
                    "constructed once and cached)"
                )
            cl = float(
                self._n_docs_over if per_doc else self._total_dl_over
            )
        else:
            rows = (
                dict_df.filter(
                    F.col("term_id").isin([int(t) for t in all_terms])
                )
                .select("term_id", "ctf")
                .collect()
            )
            ctf = {int(r["term_id"]): int(r["ctf"]) for r in rows}
            cl = float(
                self.manifest["n_docs"] if per_doc
                else self.manifest["total_dl"]
            )
        stat = lambda c: c / cl  # noqa: E731
        return {
            qid: (
                tids,
                qtfs,
                np.array(
                    [stat(ctf[int(t)]) for t in tids], dtype=np.float64
                ),
            )
            for qid, (tids, qtfs, _idfs) in qinfo.items()
        }

    def search_f2exp(
        self,
        queries: DataFrame,
        k: int = 1000,
        s: float = 0.5,
        kexp: float = 0.35,
        prune: bool = True,
    ) -> DataFrame:
        """Axiomatic F2EXP top-k over the same index (Anserini
        AxiomaticF2EXP; semantics = operators/axiomatic.f2exp_weights):

            w(t, d) = ((N+1)/df)^kexp · tf / (tf + s + s·dl/avgdl)

        Fourth pluggable query-time similarity: monotone ↑tf ↓dl, so the
        stats-free (max_tf, min_dl) block bound prunes it unchanged. The
        per-term stat ((N+1)/df)^kexp comes from the dictionary's df column
        with the LIVE manifest n_docs (appends/deletes shift it exactly as
        they shift BM25's idf). Defaults s=0.5, kexp=0.35 (Anserini /
        Fang & Zhai 2005)."""
        if s <= 0:
            raise ValueError(f"s must be > 0, got {s}")
        if kexp <= 0:
            raise ValueError(f"kexp must be > 0, got {kexp}")
        qinfo, all_terms = self._query_info(queries)
        if not all_terms:
            return self._search_prepared({}, [], k, prune)
        qinfo2 = self._f2_query_stats(qinfo, all_terms, kexp)
        return self._search_prepared(
            qinfo2, all_terms, k, prune, sim="f2exp", mu=s
        )

    def search_f2log(
        self,
        queries: DataFrame,
        k: int = 1000,
        s: float = 0.5,
        prune: bool = True,
    ) -> DataFrame:
        """Axiomatic F2LOG top-k over the same index (Anserini
        AxiomaticF2LOG; semantics = operators/axiomatic.f2log_weights):

            w(t, d) = ln((N+1)/df) · tf / (tf + s + s·dl/avgdl)

        F2EXP's sibling with a log idf in place of the power law. The tf
        saturation factor is identical, so the scoring reuses the f2exp
        kernel branch verbatim — only the query-side per-term stat changes.
        df < N+1 always, so the stat (and every weight) stays > 0."""
        if s <= 0:
            raise ValueError(f"s must be > 0, got {s}")
        qinfo, all_terms = self._query_info(queries)
        if not all_terms:
            return self._search_prepared({}, [], k, prune)
        qinfo2 = self._f2_query_stats(qinfo, all_terms, 0.0, shape="log")
        return self._search_prepared(
            qinfo2, all_terms, k, prune, sim="f2exp", mu=s
        )

    def search_tfidf(
        self,
        queries: DataFrame,
        k: int = 1000,
        prune: bool = True,
    ) -> DataFrame:
        """Vector-space TF-IDF top-k over the same index (Lucene
        ClassicSimilarity; semantics = operators/classic.tfidf_weights):

            w(t, d) = (1 + ln(N/(df+1)))² · sqrt(tf) / sqrt(dl)

        — Lucene's tf = sqrt(freq), idf(t)² (query idf × index idf), and
        lengthNorm = 1/sqrt(dl) WITHOUT the historical byte-lossy norm
        encoding (we keep dl exact; the reference's Lucene backend would
        quantize). Sixth pluggable query-time similarity; the per-term
        stat idf² rides in query-side from the dictionary's df with the
        LIVE manifest n_docs, like the axiomatic family."""
        qinfo, all_terms = self._query_info(queries)
        if not all_terms:
            return self._search_prepared({}, [], k, prune)
        qinfo2 = self._f2_query_stats(qinfo, all_terms, 0.0, shape="tfidf")
        return self._search_prepared(
            qinfo2, all_terms, k, prune, sim="tfidf"
        )

    def search_fused(
        self,
        queries: DataFrame,
        sims: list[str | tuple[str, float | None]] = ("bm25", "qld"),
        k: int = 1000,
        k_rrf: int = 60,
        prune: bool = True,
    ) -> DataFrame:
        """(qid, docid, rank, score): reciprocal-rank fusion of two or more
        pluggable similarities over the SAME index in one call — each sim
        runs its WAND pass (one segment scan per sim; the scans share the
        parquet cache) and the runs fuse through operators/fusion.rrf_fuse.
        ``sims`` entries are a similarity name or (name, param) pair with
        _prep_sim's knob semantics. The ranker-diversity ensemble Pyserini
        assembles from separate run files, index-backed."""
        from dhr_spark.operators.fusion import rrf_fuse

        if len(sims) < 2:
            raise ValueError(f"search_fused needs >= 2 sims, got {sims}")
        runs = []
        for s in sims:
            name, param = s if isinstance(s, tuple) else (s, None)
            qinfo, all_terms, ksim, mu = self._prep_sim(queries, name, param)
            runs.append(
                self._search_prepared(qinfo, all_terms, k, prune,
                                      sim=ksim, mu=mu)
            )
        return rrf_fuse(runs, k_rrf=k_rrf, k=k)

    def search_inl2(
        self,
        queries: DataFrame,
        k: int = 1000,
        c: float = 0.1,
        prune: bool = True,
    ) -> DataFrame:
        """DFR InL2 top-k over the same index (Amati & van Rijsbergen TOIS
        2002; Anserini SearchCollection ``-inl2``; semantics =
        operators/dfr.inl2_weights):

            tfn = tf · log2(1 + c·avgdl/dl)
            w(t, d) = log2((N+1)/(df+0.5)) · tfn/(tfn+1)

        Seventh pluggable query-time similarity. The per-term stat
        log2((N+1)/(df+0.5)) rides in query-side from the dictionary's df
        with the LIVE manifest n_docs, exactly like the axiomatic family —
        appends/deletes shift it the way they shift BM25's idf. Monotone
        ↑tf ↓dl, so the stats-free (max_tf, min_dl) block bound prunes it
        unchanged. Default c=0.1 (Anserini's ``-inl2.c``)."""
        if c <= 0:
            raise ValueError(f"c must be > 0, got {c}")
        qinfo, all_terms = self._query_info(queries)
        if not all_terms:
            return self._search_prepared({}, [], k, prune)
        qinfo2 = self._f2_query_stats(qinfo, all_terms, 0.0, shape="inl2")
        return self._search_prepared(
            qinfo2, all_terms, k, prune, sim="inl2", mu=c
        )

    def search_spl(
        self,
        queries: DataFrame,
        k: int = 1000,
        c: float = 0.1,
        prune: bool = True,
    ) -> DataFrame:
        """Information-based SPL top-k over the same index (Clinchant &
        Gaussier SIGIR 2010; Anserini SearchCollection ``-spl``; semantics
        = operators/dfr.spl_weights):

            λ = ctf/N;  tfn = tf · log2(1 + c·avgdl/dl)
            w(t, d) = −log2((λ^(tfn/(tfn+1)) − λ) / (1 − λ))    (λ < 1−1e−6)
            w(t, d) = log2(tfn + 1)                             (otherwise)

        Eighth pluggable query-time similarity (the λ ≥ 1−1e−6 branch is
        the formula's analytic λ→1 limit — operators/dfr.py explains the
        numerics). The per-term stat λ is a collection frequency like
        QLD's P(t|C) but per-document (÷N), so it shares the dictionary's
        ctf column and the federated ctf/n_docs override contract.
        Monotone ↑tf ↓dl (λ^x falls as x rises), block bound admissible;
        raises on a pre-ctf legacy dictionary like search_qld."""
        if c <= 0:
            raise ValueError(f"c must be > 0, got {c}")
        qinfo, all_terms = self._query_info(queries)
        if not all_terms:
            return self._search_prepared({}, [], k, prune)
        qinfo2 = self._lm_query_probs(qinfo, all_terms, per_doc=True)
        return self._search_prepared(
            qinfo2, all_terms, k, prune, sim="spl", mu=c
        )

    def search_dph(
        self,
        queries: DataFrame,
        k: int = 1000,
        prune: bool = True,
    ) -> DataFrame:
        """DFR DPH top-k over the same index (Amati's hypergeometric model
        with Popper normalization — Terrier's PARAMETER-FREE default
        similarity; semantics = operators/dfr.dph_weights):

            f = tf/dl;  λ = ctf/N
            w = [(1−f)²/(tf+1)] · (tf·log2((tf·avgdl/dl)/λ)
                                    + 0.5·log2(2π·tf·(1−f)))

        clamped at 0 (QLD contract; dfr.py documents why negatives would
        also invalidate WAND's theta bootstrap), with the tf == dl
        analytic-limit branch (weight 0). Ninth pluggable similarity; no
        knob at all — the point of DPH is zero tuning. The per-term stat
        shares SPL's λ = ctf/N dictionary column and the federated
        ctf/n_docs override contract; raises on a pre-ctf legacy
        dictionary like search_qld. DPH is not monotone ↑tf, so the
        kernel scores it under a factored (looser, admissible) block
        bound — dfr.py has the proof."""
        qinfo, all_terms = self._query_info(queries)
        if not all_terms:
            return self._search_prepared({}, [], k, prune)
        qinfo2 = self._lm_query_probs(qinfo, all_terms, per_doc=True)
        return self._search_prepared(
            qinfo2, all_terms, k, prune, sim="dph", mu=0.0
        )

    def _f2_query_stats(
        self, qinfo: dict, all_terms: list[int], kexp: float,
        shape: str = "exp",
    ) -> dict:
        """qinfo with the third slot replaced by a df-derived stat:
        ((N+1)/df)^kexp for shape='exp', ln((N+1)/df) for shape='log',
        Lucene Classic idf² = (1 + ln(N/(df+1)))² for shape='tfidf'.
        Under a federated corpus_stats override the merged df/n_docs must
        be present (MultiSearcher always provides them)."""
        if self._stats_override:
            if self._df_over is None or self._n_docs_over is None:
                raise ValueError(
                    "F2EXP under a corpus_stats override needs global 'df' "
                    "and 'n_docs' in the override (MultiSearcher provides "
                    "them) — this override carries neither"
                )
            td_dir = self.manifest.get("term_dict_dir", "term_dict")
            dict_df = self.spark.read.parquet(f"{self.index_dir}/{td_dir}")
            trows = (
                dict_df.filter(
                    F.col("term_id").isin([int(t) for t in all_terms])
                )
                .select("term_id", "term")
                .collect()
            )
            if isinstance(self._df_over, dict):
                dmap = self._df_over
            else:
                terms = [r["term"] for r in trows]
                dmap = {
                    r["term"]: int(r["df"])
                    for r in self._df_over.filter(
                        F.col("term").isin(terms)
                    ).collect()
                }
            dfm = {int(r["term_id"]): int(dmap.get(r["term"], 0)) for r in trows}
            if any(d <= 0 for d in dfm.values()):
                raise ValueError(
                    "corpus_stats df override is missing query terms that "
                    "exist in this member's dictionary — rebuild the "
                    "MultiSearcher after index changes"
                )
            n_docs = int(self._n_docs_over)
        else:
            td_dir = self.manifest.get("term_dict_dir", "term_dict")
            dict_df = self.spark.read.parquet(f"{self.index_dir}/{td_dir}")
            rows = (
                dict_df.filter(
                    F.col("term_id").isin([int(t) for t in all_terms])
                )
                .select("term_id", "df")
                .collect()
            )
            # exact-stats deletes keep fully-dead terms at df=0 (Lucene
            # keeps them in the dict until merge); they can match no live
            # doc, so drop them from the query like OOV terms — a 0 df must
            # never reach the power-law idf
            dfm = {int(r["term_id"]): int(r["df"]) for r in rows if int(r["df"]) > 0}
            n_docs = int(self.manifest["n_docs"])
        if shape == "exp":
            stat = lambda n, d: ((n + 1.0) / d) ** float(kexp)  # noqa: E731
        elif shape == "log":
            stat = lambda n, d: np.log((n + 1.0) / d)  # noqa: E731
        elif shape == "tfidf":
            stat = lambda n, d: (1.0 + np.log(n / (d + 1.0))) ** 2  # noqa: E731
        elif shape == "inl2":
            stat = lambda n, d: np.log2((n + 1.0) / (d + 0.5))  # noqa: E731
        else:
            raise ValueError(f"unknown df-stat shape {shape!r}")
        out: dict = {}
        for qid, (tids, qtfs, _idfs) in qinfo.items():
            keep = np.array([int(t) in dfm for t in tids], dtype=bool)
            if not keep.any():
                continue
            t2, q2 = tids[keep], qtfs[keep]
            out[qid] = (
                t2,
                q2,
                np.array(
                    [stat(float(n_docs), float(dfm[int(t)])) for t in t2],
                    dtype=np.float64,
                ),
            )
        return out

    def count(self, queries: DataFrame) -> DataFrame:
        """(qid, n): EXACT total hit count per query under OR semantics —
        Lucene ``IndexSearcher.count`` / TotalHitCountCollector. Decodes
        only the query terms' docid blocks (tf bytes never read, nothing
        scored); chunk partitioning makes the global distinct count a plain
        sum of per-chunk counts — one tiny shuffle of |Q|·n_chunks rows.
        Queries with zero hits (or all-OOV / empty text) emit no row."""
        qinfo, all_terms = self._query_info(queries)
        seg = self._seg_for_terms(all_terms)
        kernel = _count_chunk(
            qinfo,
            int(self.manifest["block_size"]),
            int(self.manifest["chunk_bits"]),
            tombstones=self._tombstones,
            codec=self._codec,
        )
        counted = seg.groupBy("chunk").applyInPandas(
            kernel, "qid string, n long"
        )
        return counted.groupBy("qid").agg(F.sum("n").alias("n"))

    def search_after(
        self,
        queries: DataFrame,
        after: dict[str, tuple[float, int]],
        size: int = 10,
        prune: bool = True,
    ) -> DataFrame:
        """Cursor pagination — Lucene ``IndexSearcher.searchAfter``.
        ``after`` maps qid -> (score, docid) of the LAST hit of the previous
        page, exactly as ``search`` emitted it (scores are round-6). Returns
        the next ``size`` hits strictly after each cursor in (score DESC,
        docid ASC) order, with page-local ranks 1..size; qids without a
        cursor start at page one. Deterministic across page walks because
        ranking ties are pinned the same way everywhere (topk round-6 +
        docid tie-break) — no shifting results between pages.

        Cost shape: cursor queries skip the block-pruning bootstrap (see
        _score_chunk) so they decode all their terms' postings — the price
        Lucene's searchAfter re-collection pays as well; the term_id
        pushdown and chunk-local top-size merge are unchanged."""
        aft = {
            q: (float(s), int(d)) for q, (s, d) in after.items()
        }
        qinfo, all_terms = self._query_info(queries)
        return self._search_prepared(qinfo, all_terms, size, prune, after=aft)

    def _matched_docs(self, queries: DataFrame) -> DataFrame:
        """(qid, docid): every live document matching >= 1 query term (OR
        semantics) — docid-blocks-only decode, nothing scored."""
        qinfo, all_terms = self._query_info(queries)
        qsets = {qid: tids for qid, (tids, _, _) in qinfo.items()}
        kern = _presence_chunk(
            qsets, int(self.manifest["block_size"]),
            int(self.manifest["chunk_bits"]), tombstones=self._tombstones,
            codec=self._codec,
        )
        return (
            self._seg_for_terms(all_terms)
            .groupBy("chunk")
            .applyInPandas(kern, "qid string, docid long, n_hit long")
            .select("qid", "docid")
        )

    def docvalues_frame(self, fields: list[str]) -> DataFrame:
        """(docid, *fields) from the doc_map docvalues columns (Lucene
        DocValues). Fields must have been declared at build time
        (build_index(docvalues=[...])). Committed in-place updates
        (index/dvupdate.update_docvalues — Lucene updateDocValues) are
        overlaid latest-generation-wins, snapshot-consistently (the
        manifest's dv_gens is the watermark)."""
        import os

        from dhr_spark.index.dvupdate import overlay_fields

        if not os.path.isdir(os.path.join(self.index_dir, "doc_map")):
            raise ValueError(
                "index has no doc_map artifact — build with a doc_map_df "
                "(build_index writes one automatically) to use docvalues"
            )
        dm = self.spark.read.parquet(f"{self.index_dir}/doc_map")
        have = set(dm.columns) - {"docid", "seg_batch"}
        missing = [f for f in fields if f not in have]
        if missing:
            raise ValueError(
                f"docvalues {missing} not in this index's doc_map (has "
                f"{sorted(have)}); rebuild with build_index(docvalues=[...])"
            )
        return overlay_fields(
            self.spark,
            self.index_dir,
            self.manifest,
            dm.select("docid", *fields),
            fields,
        )

    def search_sorted(
        self,
        queries: DataFrame,
        by: str,
        k: int = 100,
        ascending: bool = False,
        after: dict | None = None,
    ) -> DataFrame:
        """(qid, docid, rank, <by>): the top-k MATCHING docs ordered by a
        docvalues field instead of score — Lucene's Sort(SortField). Exact:
        every matching doc is enumerated (docid-blocks-only decode, no
        scoring work), joined to the columnar field, and ranked per query
        with docid as the deterministic tie-break.

        When the index was built with ``index_sort=(by, ascending)`` (same
        field AND direction — Lucene early-terminates under the same
        condition), this early-terminates instead: within every chunk,
        docid order IS the requested order (appends preserve the per-chunk
        invariant), so the kernel keeps only each chunk's first k matches
        and only n_chunks·k·|Q| candidate rows reach the field join and
        the global window — the full match set is never materialized,
        sorted, or joined. At 10^12 turns that is the difference between
        sorting a billion-row match set for "the latest 10 matching
        turns" and merging a few thousand candidates. Results are
        bit-identical to the exhaustive path (each chunk's first-k by
        docid is a superset of its contribution to the global top-k; ties
        agree because within-tie docid order is corpus order on both
        paths). A direction mismatch falls back to the exhaustive path
        (a reversed in-chunk cut would break tie semantics).

        ``after``: ``{qid: (value, docid)}`` cursor — resume strictly AFTER
        that (field value, docid) row in the sort order: searchAfter for
        field-sorted hits, page-locally renumbered 1..k. Qids absent from
        the cursor start at the top. On the sorted fast path the cursor is
        pushed INTO the per-chunk kernel: one doc_map aggregation derives,
        per (qid, chunk), the first docid past the cursor (within a sorted
        chunk the post-cursor matches form a docid suffix), so page N of
        "the latest matching turns" still touches only k candidate rows
        per chunk — deep pagination never re-materializes the match set."""
        from pyspark.sql import Window

        dv = self.docvalues_frame([by])
        order = F.col(by).asc() if ascending else F.col(by).desc()
        w = Window.partitionBy("qid").orderBy(order, F.col("docid").asc())

        cur_df = None
        if after:
            if len(after) > self.MAX_COLLECTED_QUERIES:
                raise ValueError(
                    f"cursor set of {len(after)} exceeds "
                    f"{self.MAX_COLLECTED_QUERIES}"
                )
            cur_df = self.spark.createDataFrame(
                [(q, v, int(d)) for q, (v, d) in after.items()],
                ["qid", "_cv", "_cd"],
            ).withColumn("_cv", F.col("_cv").cast(dv.schema[by].dataType))

        def _past_cursor(fld):
            strict = fld > F.col("_cv") if ascending else fld < F.col("_cv")
            return strict | (
                fld.eqNullSafe(F.col("_cv")) & (F.col("docid") > F.col("_cd"))
            )

        iso = self.manifest.get("index_sort")
        if (
            iso
            and iso.get("field") == by
            and bool(iso.get("ascending")) == bool(ascending)
        ):
            qinfo, all_terms = self._query_info(queries)
            qsets = {qid: tids for qid, (tids, _, _) in qinfo.items()}
            starts, cursor_qids = None, None
            if after:
                bits = int(self.manifest["chunk_bits"])
                rows = (
                    dv.crossJoin(F.broadcast(cur_df))
                    .filter(_past_cursor(F.col(by)))
                    .groupBy(
                        "qid", F.shiftright("docid", bits).alias("_chunk")
                    )
                    .agg(F.min("docid").alias("_start"))
                    .collect()
                )
                starts = {}
                for r in rows:
                    starts.setdefault(r["qid"], {})[int(r["_chunk"])] = int(
                        r["_start"]
                    )
                cursor_qids = frozenset(after)
            kern = _presence_chunk(
                qsets,
                int(self.manifest["block_size"]),
                int(self.manifest["chunk_bits"]),
                tombstones=self._tombstones,
                codec=self._codec,
                limit=int(k),
                starts=starts,
                cursor_qids=cursor_qids,
            )
            cand = (
                self._seg_for_terms(all_terms)
                .groupBy("chunk")
                .applyInPandas(kern, "qid string, docid long, n_hit long")
                .select("qid", "docid")
            )
            return (
                cand.join(dv, "docid")
                .withColumn("rank", F.row_number().over(w).cast("int"))
                .filter(F.col("rank") <= k)
                .select("qid", "docid", "rank", by)
            )
        res = self._matched_docs(queries).join(dv, "docid")
        if after:
            res = (
                res.join(F.broadcast(cur_df), "qid", "left")
                .filter(
                    F.col("_cv").isNull() | _past_cursor(F.col(by))
                )
                .drop("_cv", "_cd")
            )
        return (
            res.withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= k)
            .select("qid", "docid", "rank", by)
        )

    def result_facets(self, queries: DataFrame, field: str) -> DataFrame:
        """(qid, <field>, n): facet counts over the MATCHING documents of
        each query (Lucene faceting on hits, not the corpus): exact OR-match
        enumeration joined to the docvalues column, one count per distinct
        field value per query."""
        dv = self.docvalues_frame([field])
        return (
            self._matched_docs(queries)
            .join(dv, "docid")
            .groupBy("qid", field)
            .agg(F.count("*").alias("n"))
        )

    def result_facet_ranges(
        self,
        queries: DataFrame,
        field: str,
        bounds: list,
    ) -> DataFrame:
        """(qid, bucket, lo, hi, n): histogram facets over the MATCHING
        documents of each query — Lucene RangeFacetCounts. ``bounds``
        [b0, b1, ..., bm] defines m half-open buckets [b_i, b_{i+1});
        values outside [b0, bm) are not counted (Lucene ranges are
        explicit too). Same plan shape as result_facets: exact OR-match
        enumeration (docid blocks only, nothing scored) joined to the
        pushed-down docvalues column, then a codegen'd bucket expression —
        empty buckets emit no row."""
        if len(bounds) < 2 or sorted(bounds) != list(bounds):
            raise ValueError("bounds must be >= 2 ascending values")
        dv = self.docvalues_frame([field]).filter(
            (F.col(field) >= bounds[0]) & (F.col(field) < bounds[-1])
        )
        # bucket index via half-open comparison chain — m is user-tiny, the
        # CASE chain stays whole-stage-codegen
        b = F.lit(len(bounds) - 2)
        for i in range(len(bounds) - 2, -1, -1):
            b = F.when(F.col(field) < bounds[i + 1], F.lit(i)).otherwise(b)
        lows = F.array(*[F.lit(x) for x in bounds[:-1]])
        highs = F.array(*[F.lit(x) for x in bounds[1:]])
        return (
            self._matched_docs(queries)
            .join(dv, "docid")
            .withColumn("bucket", b.cast("int"))
            .groupBy("qid", "bucket")
            .agg(F.count("*").alias("n"))
            .select(
                "qid",
                "bucket",
                F.element_at(lows, F.col("bucket") + 1).alias("lo"),
                F.element_at(highs, F.col("bucket") + 1).alias("hi"),
                "n",
            )
        )

    def result_stats(self, queries: DataFrame, field: str) -> DataFrame:
        """(qid, n, min, max, sum, avg, variance, std_dev): ES
        extended_stats over an integer docvalues field of each query's
        MATCHING documents. Exact OR-match enumeration (docid blocks only)
        joined to the columnar field; moments ride exact integer sums
        (operators/hitstats.py)."""
        from dhr_spark.operators.hitstats import hit_stats

        return hit_stats(
            self._matched_docs(queries), self.docvalues_frame([field]), field
        )

    def result_histogram(
        self,
        queries: DataFrame,
        field: str,
        interval: int,
        offset: int = 0,
    ) -> DataFrame:
        """(qid, bucket, n): ES ``histogram`` / fixed-interval
        ``date_histogram`` over an integer docvalues field of each query's
        MATCHING documents — fixed-width buckets
        floor((v−offset)/interval)·interval + offset, non-empty only,
        all-integer arithmetic (operators/hitstats.hit_histogram; pass a
        time-unit interval on an epoch field for the date variant)."""
        from dhr_spark.operators.hitstats import hit_histogram

        return hit_histogram(
            self._matched_docs(queries),
            self.docvalues_frame([field]),
            field,
            interval,
            offset,
        )

    def result_adjacency(self, queries: DataFrame) -> DataFrame:
        """(qid_a, qid_b, n): ES ``adjacency_matrix`` over the queries'
        MATCHING documents — pairwise hit-set intersection counts plus the
        diagonal (operators/hitstats.hit_adjacency)."""
        from dhr_spark.operators.hitstats import hit_adjacency

        return hit_adjacency(self._matched_docs(queries))

    def search_random(
        self, queries: DataFrame, seed: int, k: int = 10
    ) -> DataFrame:
        """(qid, docid, rank, score): seeded random sampling of each
        query's MATCHING documents — ES function_score random_score
        (operators/boost.random_hits_topk): deterministic uniform draw per
        (seed, docid), integer-hash ordering, reproducible across runs."""
        from dhr_spark.operators.boost import random_hits_topk

        # _matched_docs is already live-only (tombstones mask in-kernel)
        return random_hits_topk(self._matched_docs(queries), seed, k)

    def result_histogram_pipeline(
        self,
        queries: DataFrame,
        field: str,
        interval: int,
        offset: int = 0,
        window: int = 3,
    ) -> DataFrame:
        """(qid, bucket, n, cum_n, derivative, moving_avg): ES pipeline
        aggregations (cumulative_sum / derivative / moving_avg) over each
        query's date/number histogram (operators/hitstats.
        histogram_pipeline over result_histogram)."""
        from dhr_spark.operators.hitstats import histogram_pipeline

        return histogram_pipeline(
            self.result_histogram(queries, field, interval, offset),
            window=window,
        )

    def result_composite(
        self,
        queries: DataFrame,
        sources: list[tuple],
        size: int,
        after: dict | None = None,
    ) -> DataFrame:
        """(qid, <source names...>, n): ES ``composite`` aggregation over
        each query's MATCHING documents — paginated multi-source bucket
        enumeration with a resumable ``after`` cursor (operators/hitstats.
        hit_composite). Source fields resolve through docvalues (committed
        dv-update generations overlaid)."""
        from dhr_spark.operators.hitstats import hit_composite

        fields = sorted(
            {s[2] if s[1] == "terms" else s[2][0] for s in sources}
        )
        return hit_composite(
            self._matched_docs(queries),
            self.docvalues_frame(fields),
            sources,
            size,
            after,
        )

    def result_percentiles(
        self,
        queries: DataFrame,
        field: str,
        pcts: list[int] = [25, 50, 75, 95, 99],
    ) -> DataFrame:
        """(qid, pct, value, n): ES percentiles aggregation (nearest-rank,
        exact — no TDigest approximation needed: the sort is per-hit-set,
        not per-corpus) over an integer docvalues field of each query's
        MATCHING documents."""
        from dhr_spark.operators.hitstats import hit_percentiles

        return hit_percentiles(
            self._matched_docs(queries),
            self.docvalues_frame([field]),
            field,
            pcts,
        )

    def result_correlation(
        self, queries: DataFrame, field_a: str, field_b: str
    ) -> DataFrame:
        """(qid, n, corr): Pearson correlation of two integer docvalues
        fields over each query's MATCHING documents — ES ``matrix_stats``'
        correlation cell (operators/hitstats.hit_correlation; exact integer
        moments, fixed two-sqrt/one-divide float shape)."""
        from dhr_spark.operators.hitstats import hit_correlation

        return hit_correlation(
            self._matched_docs(queries),
            self.docvalues_frame(
                [field_a, field_b] if field_a != field_b else [field_a]
            ),
            field_a,
            field_b,
        )

    def result_cardinality(
        self, queries: DataFrame, field: str, p: int = 10
    ) -> DataFrame:
        """(qid, m, used, zeros, sum_pow, raw_est): ES ``cardinality``
        aggregation (HyperLogLog) of a docvalues field over each query's
        MATCHING documents — approximate distinct count carried as fixed
        O(2^p) register state per query, the only shape that survives hit
        sets of 10^10 docs (an exact count_distinct would shuffle every
        hit on the value)."""
        from dhr_spark.operators.sketches import hll_cardinality

        hits = self._matched_docs(queries).join(
            self.docvalues_frame([field]), "docid"
        )
        return hll_cardinality(hits, field, p, group_cols=["qid"])

    def search_collapse(
        self,
        queries: DataFrame,
        field: str,
        k: int = 100,
        group_limit: int = 1,
    ) -> DataFrame:
        """(qid, docid, rank, score, <field>): BM25 top-k collapsed to at
        most ``group_limit`` best docs per value of a docvalues field —
        Lucene's CollapsingTopDocsCollector (SERP-style one-hit-per-group).

        Exact: scoring is exhaustive (no chunk-local cutoff — a pruned
        top-k could starve a group whose best doc hides below another
        group's flood), then a per-(qid, field) window keeps each group's
        best ``group_limit`` docs and a per-qid window ranks the
        survivors. Lucene's collapsing collector visits every hit too."""
        from pyspark.sql import Window

        qinfo, all_terms = self._query_info(queries)
        chunk_docs = 1 << int(self.manifest["chunk_bits"])
        scored = self._scored_frame(qinfo, all_terms, chunk_docs, prune=False)
        dv = self.docvalues_frame([field])
        r6 = F.round(F.col("score"), 6)
        wg = Window.partitionBy("qid", field).orderBy(
            r6.desc(), F.col("docid").asc()
        )
        wq = Window.partitionBy("qid").orderBy(r6.desc(), F.col("docid").asc())
        return (
            scored.join(dv, "docid")
            .withColumn("_g", F.row_number().over(wg))
            .filter(F.col("_g") <= group_limit)
            .withColumn("rank", F.row_number().over(wq).cast("int"))
            .filter(F.col("rank") <= k)
            .select("qid", "docid", "rank", r6.alias("score"), field)
        )

    def result_top_hits(
        self,
        queries: DataFrame,
        field: str,
        n_buckets: int = 10,
        hits_per_bucket: int = 3,
    ) -> DataFrame:
        """(qid, <field>, bucket_n, docid, rank, score): Elasticsearch's
        ``terms`` aggregation with a ``top_hits`` sub-aggregation — for each
        query, the ``n_buckets`` largest buckets of a docvalues field over
        the MATCHING documents (bucket size = hit count, ties by field value
        ascending), and inside each bucket the ``hits_per_bucket`` best hits
        by BM25 (docid tie-break). ``rank`` is the in-bucket hit rank.

        Exact by the same argument as search_collapse: scoring is
        exhaustive (a pruned top-k could starve a large-but-low-scoring
        bucket entirely), then two windows over the HIT SET only — bucket
        sizing and in-bucket ranking never touch non-matching docs, and
        the docvalues join is hit-set-proportional. At 10^12 turns the
        scored frame is the dominant cost and is identical to the plain
        exhaustive-search plan; the aggregation adds one hash agg and two
        hit-set windows, no corpus shuffle."""
        from pyspark.sql import Window

        qinfo, all_terms = self._query_info(queries)
        chunk_docs = 1 << int(self.manifest["chunk_bits"])
        scored = self._scored_frame(qinfo, all_terms, chunk_docs, prune=False)
        dv = self.docvalues_frame([field])
        r6 = F.round(F.col("score"), 6)
        j = scored.join(dv, "docid").select(
            "qid", "docid", r6.alias("s6"), field
        )
        wb = Window.partitionBy("qid").orderBy(
            F.col("bucket_n").desc(), F.col(field).asc()
        )
        buckets = (
            j.groupBy("qid", field)
            .agg(F.count("*").alias("bucket_n"))
            .withColumn("_b", F.row_number().over(wb))
            .filter(F.col("_b") <= n_buckets)
            .drop("_b")
        )
        wh = Window.partitionBy("qid", field).orderBy(
            F.col("s6").desc(), F.col("docid").asc()
        )
        hits = (
            j.withColumn("rank", F.row_number().over(wh).cast("int"))
            .filter(F.col("rank") <= hits_per_bucket)
        )
        return hits.join(buckets, ["qid", field]).select(
            "qid", field, "bucket_n", "docid", "rank",
            F.col("s6").alias("score"),
        )

    def search_parents(
        self,
        queries: DataFrame,
        k: int = 100,
        score_mode: str = "max",
        parent_field: str = "conv_id",
    ) -> DataFrame:
        """(qid, parent, rank, score): Lucene ToParentBlockJoinQuery over
        the index — per-turn (child) BM25 hits rolled up to their parent
        conversation under a ScoreMode (max/total/avg/min;
        operators/conversations.block_join_topk is the DataFrame twin this
        delegates to). ``parent_field`` is a doc_map column (conv_id by
        default — every transcripts index carries it).

        Exact for every ScoreMode: child scoring is exhaustive (no
        chunk-local cutoff — the same starvation argument as
        search_collapse: under total/avg/min ANY pruned child changes the
        parent score, and under max the representative child may rank
        below another parent's flood). The rollup joins the hit set, not
        the corpus, and the join is chunk-colocated with doc_map."""
        from dhr_spark.operators.conversations import block_join_topk

        qinfo, all_terms = self._query_info(queries)
        chunk_docs = 1 << int(self.manifest["chunk_bits"])
        scored = self._scored_frame(qinfo, all_terms, chunk_docs, prune=False)
        child = scored.select(
            "qid", "docid", F.round("score", 6).alias("score")
        )
        parents = self.docvalues_frame([parent_field]).select(
            "docid", F.col(parent_field).alias("parent")
        )
        return block_join_topk(
            child, parents, k=k, score_mode=score_mode
        ).withColumnRenamed("docid", "parent")

    def search_filtered(
        self,
        queries: DataFrame,
        field: str,
        lo=None,
        hi=None,
        values: list | None = None,
        k: int = 1000,
        sim: str = "bm25",
        sim_param: float | None = None,
    ) -> DataFrame:
        """(qid, docid, rank, score): top-k restricted to docs whose
        docvalues ``field`` passes a range ([lo, hi], either bound may be
        None) or a value set — Lucene's FILTER-clause
        RangeQuery/TermInSetQuery over DocValues. ``sim``/``sim_param``
        pick the scorer (bm25 | qld | lmjm | f2exp | f2log | tfidf, knob
        semantics per _prep_sim) — a filter clause composes with every
        similarity, exactly as in Lucene
        (IndexOrDocValuesQuery; the reference's Anserini layer exposes it
        as filtered search).

        Exact by construction: scoring is exhaustive (prune=False — WAND's
        theta reflects the UNFILTERED score distribution, so chunk-local
        pruning could starve in-filter docs ranked below out-of-filter
        flood), then the docvalues predicate — pushed down into the
        doc_map parquet scan — gates the hits before the per-qid ranking
        window. Lucene instead leapfrogs the filter iterator against the
        scorer; the Spark twin is this join, which AQE demotes to a
        broadcast when the filter is selective. BM25 stats are the global
        (unfiltered) ones, matching Lucene: a filter clause never
        contributes to scoring."""
        if values is None and lo is None and hi is None:
            raise ValueError("pass values=, lo=, and/or hi=")
        dv = self.docvalues_frame([field])
        if values is not None:
            dv = dv.filter(F.col(field).isin(list(values)))
        if lo is not None:
            dv = dv.filter(F.col(field) >= lo)
        if hi is not None:
            dv = dv.filter(F.col(field) <= hi)
        qinfo, all_terms, ksim, mu = self._prep_sim(queries, sim, sim_param)
        chunk_docs = 1 << int(self.manifest["chunk_bits"])
        scored = self._scored_frame(
            qinfo, all_terms, chunk_docs, False, sim=ksim, mu=mu
        )
        return topk(scored.join(dv.select("docid"), "docid"), k)

    def search_boosted(
        self,
        queries: DataFrame,
        field: str,
        scale: float = 250.0,
        k: int = 1000,
        window: int | None = None,
        sim: str = "bm25",
        sim_param: float | None = None,
        prune: bool = True,
    ) -> DataFrame:
        """(qid, docid, rank, score): FunctionScoreQuery — relevance
        multiplied by the saturation prior ``v / (v + scale)`` over the
        docvalues ``field`` (Lucene FeatureField.newSaturationQuery /
        Elasticsearch function_score; operators/boost.py documents the
        integer-micros determinism contract the emitted score follows).
        ``sim``/``sim_param`` pick the relevance scorer, composing like
        search_filtered does.

        ``window=None`` (exact): every matching doc is scored exhaustively
        (prune=False — WAND's theta bounds the RELEVANCE ranking, which a
        multiplicative prior reorders, so chunk-local pruning could drop
        the boosted winner) and the prior re-ranks the full hit set. This
        is the oracle mode.

        ``window=W``: Elasticsearch ``rescore`` semantics — relevance
        top-W via block-max WAND, then the prior re-ranks only that
        window and the top-k is cut from it. Bounded work at any corpus
        size; exact whenever the true boosted top-k lies inside the
        relevance top-W (factors are monotone in score for fixed v, so a
        generous W — the ES default is 10x k — converges quickly; the
        exact/window identity is pinned in tests at W >= |matches|)."""
        from dhr_spark.operators.boost import boosted_rank

        scored, dv = self._boost_scored(
            queries, field, window, sim, sim_param, prune
        )
        return boosted_rank(scored, dv, scale=scale, signal_col=field, k=k)

    def search_recency(
        self,
        queries: DataFrame,
        field: str,
        now: int,
        half_life_s: int = 7 * 86400,
        k: int = 1000,
        window: int | None = None,
        sim: str = "bm25",
        sim_param: float | None = None,
        prune: bool = True,
    ) -> DataFrame:
        """(qid, docid, rank, score): recency-boosted retrieval — relevance
        x ``h / (h + age)`` half-life decay over the epoch-seconds
        docvalues ``field`` (operators/boost.recency_boost_col; future
        timestamps clamp to factor 1). The transcript-search staple:
        "prefer recent conversations". Same exact/window split and
        similarity composition as search_boosted."""
        from dhr_spark.operators.boost import recency_rank

        scored, dv = self._boost_scored(
            queries, field, window, sim, sim_param, prune
        )
        return recency_rank(
            scored, dv, ts_col=field, now=now, half_life_s=half_life_s, k=k
        )

    def search_boosting(
        self,
        queries: DataFrame,
        negatives: DataFrame,
        negative_boost: float = 0.5,
        k: int = 1000,
        window: int | None = None,
        sim: str = "bm25",
        sim_param: float | None = None,
        prune: bool = True,
    ) -> DataFrame:
        """(qid, docid, rank, score): Lucene BoostingQuery / Elasticsearch
        ``boosting`` query — ``queries`` (qid, text) score as usual, but a
        document that ALSO matches the qid's row in ``negatives`` (qid,
        text; any analyzed term present) keeps matching with its score
        scaled by ``negative_boost`` (a multiple of 1/16 in [0, 1] — the
        integer-exact demotion contract, operators/boost.demoted_rank).
        The classic use: push down near-spam/boilerplate hits without the
        hard exclusion a MUST_NOT would impose. Qids with no negatives row
        (or an all-OOV negative) are untouched.

        ``window=None`` scores the positive side exhaustively (exact — the
        oracle mode: a demoted winner can come from arbitrarily deep in
        the relevance ranking); ``window=W`` is the ES rescore shape:
        relevance top-W via block-max WAND, demotion re-ranks the window.
        The negative side never scores — one docid-blocks-only presence
        pass (_presence_chunk), the MUST_NOT machinery's cost."""
        qinfo2, all_terms2, ksim, mu = self._prep_sim(queries, sim, sim_param)
        if window is None:
            chunk_docs = 1 << int(self.manifest["chunk_bits"])
            scored = self._scored_frame(
                qinfo2, all_terms2, chunk_docs, False, sim=ksim, mu=mu
            )
        else:
            scored = self._search_prepared(
                qinfo2, all_terms2, int(window), prune, sim=ksim, mu=mu
            ).select("qid", "docid", "score")
        # merge duplicate-qid negative rows BEFORE query prep: _query_info
        # keeps one tf dict per qid (last collected row wins, order
        # nondeterministic) — the union of analyzed term SETS is what the
        # presence gate needs, and concatenation order cannot change a set
        negatives = negatives.groupBy("qid").agg(
            F.concat_ws(" ", F.collect_list("text")).alias("text")
        )
        neg_info, _ = self._query_info(negatives)
        from dhr_spark.operators.boost import demoted_rank

        if not neg_info:
            neg = self.spark.createDataFrame([], "qid string, docid long")
        else:
            qsets = {q: tids for q, (tids, _, _) in neg_info.items()}
            kern = _presence_chunk(
                qsets,
                int(self.manifest["block_size"]),
                int(self.manifest["chunk_bits"]),
                tombstones=self._tombstones,
                codec=self._codec,
            )
            seg = self._seg_for_terms(
                sorted({int(t) for s in qsets.values() for t in s})
            )
            neg = seg.groupBy("chunk").applyInPandas(
                kern, "qid string, docid long, n_hit long"
            ).select("qid", "docid")
            if window is not None:
                # rescore mode: the scored window (<= |Q|·W rows) is the
                # small side — broadcast-semi it into the negative stream
                # so a common negative term's corpus-scale match set
                # (measured ~30M rows for 50 q x 'the' at 986k turns)
                # shuffles nothing. A driver-side collect-and-gate variant
                # was measured SLOWER (the 400k-row round trip cost ~37s —
                # more than the emission it saved); exact mode skips the
                # probe since its scored set is itself corpus-scale.
                neg = neg.join(
                    F.broadcast(scored.select("qid", "docid")),
                    ["qid", "docid"],
                    "left_semi",
                )
        # the presence kernel emits one row per (qid, doc) — a doc lives in
        # exactly one chunk — so the defensive dedup shuffle is skippable
        return demoted_rank(
            scored, neg, negative_boost=negative_boost, k=k, neg_unique=True
        )

    def _boost_scored(self, queries, field, window, sim, sim_param, prune):
        """Shared FunctionScore plumbing: (relevance scored set, docvalues
        column). window=None -> exhaustive (exact mode, prune disabled —
        WAND's theta bounds the relevance ranking, which a prior reorders);
        window=W -> relevance top-W via block-max WAND (ES rescore)."""
        dv = self.docvalues_frame([field])
        qinfo, all_terms, ksim, mu = self._prep_sim(queries, sim, sim_param)
        if window is None:
            chunk_docs = 1 << int(self.manifest["chunk_bits"])
            scored = self._scored_frame(
                qinfo, all_terms, chunk_docs, False, sim=ksim, mu=mu
            )
        else:
            scored = self._search_prepared(
                qinfo, all_terms, int(window), prune, sim=ksim, mu=mu
            ).select("qid", "docid", "score")
        return scored, dv

    def doc_lengths_frame(self, chunks: list[int] | None = None) -> DataFrame:
        """(docid, dl): per-document lengths exploded from the packed
        doclens arrays, optionally restricted to a chunk list (partition
        pruning). Holes (docs with no postings) are skipped."""
        dl = self._dl
        if chunks is not None:
            dl = dl.filter(F.col("chunk").isin([int(c) for c in chunks]))

        def gen(it):
            for pdf in it:
                for _, row in pdf.iterrows():
                    arr = np.frombuffer(row["dls"], dtype=np.int32)
                    nz = np.flatnonzero(arr)
                    yield pd.DataFrame(
                        {
                            "docid": nz + int(row["base_docid"]),
                            "dl": arr[nz].astype(np.int64),
                        }
                    )

        return dl.mapInPandas(gen, "docid long, dl long")

    def _lookup_tid(self, term: str) -> tuple[int, float] | None:
        if self._tid_cache is not None:
            return self._tid_cache.get(term)
        rows = self._tdict.filter(F.col("term") == term).collect()
        return (
            (int(rows[0]["term_id"]), float(rows[0]["idf"])) if rows else None
        )

    def _expand_clause(
        self, kind: str, body: str, max_expansions: int, prefix_len: int
    ) -> list[tuple[int, float]]:
        """Dictionary expansions of a WILDCARD/FUZZY/REGEXP clause body,
        capped by (df DESC, term ASC) — the operators/expand.py cap rules."""
        from dhr_spark.operators.expand import (
            levenshtein_py,
            wildcard_to_regex,
        )
        from dhr_spark.operators.queryparser import FUZZY, REGEXP

        def _rx_pattern(b: str) -> str:
            # REGEXP: whole-term anchor around the verbatim body (Lucene
            # RegexpQuery); WILDCARD: translated * / ? pattern (pre-anchored)
            return f"^(?:{b})$" if kind == REGEXP else wildcard_to_regex(b)

        if self._tid_cache is not None:
            if kind == FUZZY:
                body_t, edits = body
                hits = [
                    (idf, t, tid)
                    for t, (tid, idf) in self._tid_cache.items()
                    if (
                        (not prefix_len or t[: prefix_len] == body_t[: prefix_len])
                        and abs(len(t) - len(body_t)) <= edits
                        and levenshtein_py(body_t, t) <= edits
                    )
                ]
                cap = 50
            else:
                rx = re.compile(_rx_pattern(body))
                hits = [
                    (idf, t, tid)
                    for t, (tid, idf) in self._tid_cache.items()
                    if rx.match(t)
                ]
                cap = max_expansions
            hits.sort(key=lambda x: (x[0], x[1]))
            return [(tid, idf) for idf, _, tid in hits[:cap]]
        from dhr_spark.index.kgram import fuzzy_grams, wildcard_grams

        grams = None
        kg = self.manifest.get("kgram")
        if kind == FUZZY:
            body_t, edits = body
            cond = F.levenshtein(F.col("term"), F.lit(body_t)) <= edits
            if prefix_len:
                cond = cond & (
                    F.substring(F.col("term"), 1, prefix_len)
                    == body_t[:prefix_len]
                )
            cap = 50
            if kg:
                grams = fuzzy_grams(body_t, edits, int(kg["k"]))
        else:
            cond = F.col("term").rlike(_rx_pattern(body))
            cap = max_expansions
            # REGEXP stays a dictionary scan (no literal-extraction pass);
            # WILDCARD pre-filters through the k-gram table when present
            if kg and kind != REGEXP:
                grams = wildcard_grams(body, int(kg["k"]))
        rows = (
            self._dict_for_grams(grams)
            .filter(cond)
            .orderBy(F.col("idf").asc(), F.col("term").asc())
            .limit(cap)
            .collect()
        )
        return [(int(r["term_id"]), float(r["idf"])) for r in rows]

    def search_syntax(
        self,
        queries: DataFrame,
        k: int = 1000,
        max_expansions: int = 1024,
        fuzzy_prefix_len: int = 1,
        min_should_match: int = 0,
    ) -> DataFrame:
        """Execute Lucene classic-syntax query strings EXACTLY —
        (qid, docid, rank, score) under scoring-boolean semantics
        (operators/queryparser.py documents the supported subset and the
        execution plan; docstring contract: a pure SHOULD-of-terms string
        is routed to the ordinary block-max WAND path and is
        score-identical to ``search``).

        Clause scoring: TERM via BM25 (duplicate terms accumulate qtf);
        WILDCARD/FUZZY via capped dictionary expansion at qtf=1 each;
        PHRASE via Lucene's sloppy-freq BM25 (tf := n_matches from the
        positional artifact, df := matching-doc count). MUST gates
        membership but still scores; MUST_NOT only filters. An
        unsatisfiable MUST (OOV term, no-match phrase) empties its query,
        as in Lucene. FIELD clauses (role:user) are filter-context over
        doc_map docvalues columns — they gate (or, with -, exclude) and
        never score; a query made ONLY of field clauses therefore returns
        no rows (use search_filtered / boolean_match for pure filtering).

        ``min_should_match``: Lucene BooleanQuery's
        minimumNumberShouldMatch — a doc must satisfy at least this many
        distinct SHOULD scoring clauses (each analyzed token of a TERM is
        its own clause, as in Lucene; an OOV SHOULD clause counts toward
        the requirement but can never be satisfied; FIELD filter-context
        clauses never count). Queries with no SHOULD clauses ignore it;
        a requirement above a query's SHOULD count empties that query."""
        from dhr_spark.operators import queryparser as QP

        qrows = (
            queries.select("qid", "text")
            .limit(self.MAX_COLLECTED_QUERIES + 1)
            .collect()
        )
        if len(qrows) > self.MAX_COLLECTED_QUERIES:
            raise ValueError(
                f"query set exceeds {self.MAX_COLLECTED_QUERIES} rows; "
                "parse+plan is driver-side — split the batch"
            )
        parsed = {r["qid"]: QP.parse_query(r["text"] or "") for r in qrows}
        # msm<=1 keeps the fast path: every OR hit satisfies >=1 clause
        if min_should_match <= 1 and all(
            p.pure_should_terms for p in parsed.values()
        ):
            return self.search(queries, k=k)

        pos: dict[str, dict[int, tuple[float, float]]] = {}
        must_sets: dict[str, np.ndarray] = {}  # per-clause pseudo-qid
        n_must: dict[str, int] = {}
        not_sets: dict[str, set[int]] = {}
        phrase_jobs: list[tuple[str, str, str, int, float]] = []  # qid, occur, body, slop, boost
        must_frames: list[DataFrame] = []
        not_frames: list[DataFrame] = []
        msm_sets: dict[str, np.ndarray] = {}  # SHOULD-clause pseudo-qids
        msm_frames: list[DataFrame] = []  # SHOULD phrase memberships
        n_should: dict[str, int] = {}

        def add_pos(qid: str, tid: int, idf: float, qtf: float) -> None:
            slot = pos.setdefault(qid, {})
            old = slot.get(tid)
            slot[tid] = (qtf + (old[0] if old else 0.0), idf)

        for qid, pq in parsed.items():
            ci = 0
            for c in pq.clauses:
                if c.kind in (QP.FIELD, QP.FIELD_RANGE):
                    # filter-context docvalues match (never scores):
                    # SHOULD/MUST both gate — a bare role:user is how
                    # Lucene users write keyword filters — MUST_NOT
                    # excludes. The docvalues read is a pushed-down
                    # doc_map column scan; literals cast to the column's
                    # type (so turn_idx:3 and n_chars:[10 TO 90] work).
                    dvf = self.docvalues_frame([c.field_name])
                    col = F.col(c.field_name)
                    if c.kind == QP.FIELD:
                        pred = col == c.text
                    else:
                        dt = dict(dvf.dtypes)[c.field_name]
                        pred = None
                        if c.lo != "*":
                            pred = col >= F.lit(c.lo).cast(dt)
                        if c.hi != "*":
                            p2 = col <= F.lit(c.hi).cast(dt)
                            pred = p2 if pred is None else pred & p2
                    member = dvf.filter(pred).select(
                        F.lit(qid).alias("qid"), "docid"
                    )
                    if c.occur == QP.MUST_NOT:
                        not_frames.append(member)
                    else:
                        n_must[qid] = n_must.get(qid, 0) + 1
                        must_frames.append(
                            member.withColumn(
                                "clause", F.lit(f"fd\x01{ci}")
                            )
                        )
                        ci += 1
                    continue
                if c.kind == QP.PHRASE:
                    phrase_jobs.append(
                        (qid, c.occur, c.text, c.slop, c.boost)
                    )
                    if c.occur == QP.MUST:
                        n_must[qid] = n_must.get(qid, 0) + 1
                    elif (
                        c.occur == QP.SHOULD and min_should_match > 0
                    ):
                        n_should[qid] = n_should.get(qid, 0) + 1
                    continue
                if c.kind == QP.TERM:
                    toks = self._analyze(c.text)
                    groups = [[t] for t in toks]  # each token its own clause
                else:
                    groups = [[c]]  # expanded below
                for g in groups:
                    if c.kind == QP.TERM:
                        hit = self._lookup_tid(g[0])
                        exp = [hit] if hit else []
                    elif c.kind in (QP.WILDCARD, QP.REGEXP):
                        # Lucene analyzes wildcard bodies minimally
                        # (lowercase only — no stemming, no stop removal);
                        # regex bodies pass verbatim (never analyzed)
                        body = (
                            c.text.lower() if c.kind == QP.WILDCARD else c.text
                        )
                        exp = self._expand_clause(
                            c.kind, body, max_expansions, 0
                        )
                    else:  # FUZZY
                        exp = self._expand_clause(
                            c.kind, (c.text.lower(), c.edits), max_expansions,
                            fuzzy_prefix_len,
                        )
                    if c.occur in (QP.SHOULD, QP.MUST):
                        # clause boost folds into qtf: BM25 contribution is
                        # qtf-linear, so qtf *= boost IS Lucene BoostQuery
                        for tid, idf in exp:
                            add_pos(qid, tid, idf, c.boost)
                    if c.occur == QP.MUST:
                        n_must[qid] = n_must.get(qid, 0) + 1
                        must_sets[f"{qid}\x01{ci}"] = np.array(
                            [t for t, _ in exp], dtype=np.int64
                        )
                        ci += 1
                    elif c.occur == QP.MUST_NOT:
                        not_sets.setdefault(qid, set()).update(
                            t for t, _ in exp
                        )
                    elif min_should_match > 0:  # SHOULD, msm active
                        n_should[qid] = n_should.get(qid, 0) + 1
                        msm_sets[f"{qid}\x01{ci}"] = np.array(
                            [t for t, _ in exp], dtype=np.int64
                        )
                        ci += 1

        # ---- positive term scoring (exhaustive: boolean filters must see
        # every matching doc, so no chunk-local pruning/cutoff) ----
        qinfo: dict[str, tuple] = {}
        for qid, slot in pos.items():
            trips = sorted((tid, q, i) for tid, (q, i) in slot.items())
            if trips:
                qinfo[qid] = (
                    np.array([t for t, _, _ in trips], dtype=np.int64),
                    np.array([q for _, q, _ in trips], dtype=np.float64),
                    np.array([i for _, _, i in trips], dtype=np.float64),
                )
        all_terms = sorted(
            {int(t) for tids, _, _ in qinfo.values() for t in tids}
        )
        chunk_docs = 1 << int(self.manifest["chunk_bits"])
        frames = []
        if qinfo:
            frames.append(
                self._scored_frame(qinfo, all_terms, chunk_docs, prune=False)
            )

        # ---- phrase clauses: sloppy-freq BM25 + membership frames ----
        n_docs = int(self.manifest["n_docs"])
        cb = int(self.manifest["chunk_bits"])
        for pj, (qid, occur, body, slop, boost) in enumerate(phrase_jobs):
            hits = self.search_phrase(body, slop=slop).cache()
            df_p = hits.count()
            if df_p == 0:
                # SHOULD: no contribution. MUST: unsatisfiable — n_must
                # already counts this clause and no membership frame will
                # ever satisfy it, so the qid naturally empties. MUST_NOT:
                # no-op.
                continue
            member = hits.select(F.lit(qid).alias("qid"), "docid")
            if occur == QP.MUST_NOT:
                not_frames.append(member)
                continue
            if occur == QP.MUST:
                must_frames.append(
                    member.withColumn("clause", F.lit(f"ph\x01{pj}"))
                )
            elif min_should_match > 0:  # SHOULD phrase counts toward msm
                msm_frames.append(
                    member.withColumn("clause", F.lit(f"mp\x01{pj}"))
                )
            idf_p = float(np.log(1.0 + (n_docs - df_p + 0.5) / (df_p + 0.5)))
            chs = [
                int(r[0])
                for r in hits.select(
                    F.shiftright("docid", cb).alias("c")
                ).distinct().limit(self.MAX_CHUNK_ISIN + 1).collect()
            ]
            dlf = self.doc_lengths_frame(
                chs if len(chs) <= self.MAX_CHUNK_ISIN else None
            )
            nm = F.col("n_matches").cast("double")
            norm = F.lit(self.k1) * (
                F.lit(1.0 - self.b)
                + F.lit(self.b) * F.col("dl").cast("double") / F.lit(self._avgdl)
            )
            frames.append(
                hits.join(dlf, "docid").select(
                    F.lit(qid).alias("qid"),
                    "docid",
                    (F.lit(boost) * F.lit(idf_p) * nm / (nm + norm)).alias(
                        "score"
                    ),
                )
            )

        if not frames:
            return self.spark.createDataFrame(
                [], "qid string, docid long, rank int, score double"
            )
        scored = frames[0]
        for fr in frames[1:]:
            scored = scored.unionByName(fr)
        scored = scored.groupBy("qid", "docid").agg(
            F.sum("score").alias("score")
        )

        # ---- MUST membership: each clause satisfied by >=1 of its terms
        # (or its phrase); a doc survives iff it satisfies ALL clauses ----
        if must_sets:
            kern = _presence_chunk(
                must_sets, int(self.manifest["block_size"]), cb,
                tombstones=self._tombstones, codec=self._codec,
            )
            seg = self._seg_for_terms(
                sorted({int(t) for s in must_sets.values() for t in s})
            )
            pres = seg.groupBy("chunk").applyInPandas(
                kern, "qid string, docid long, n_hit long"
            )
            must_frames.append(
                pres.select(
                    F.split_part(F.col("qid"), F.lit("\x01"), F.lit(1)).alias(
                        "qid"
                    ),
                    "docid",
                    F.col("qid").alias("clause"),
                )
            )
        if n_must:
            if must_frames:
                mf = must_frames[0]
                for fr in must_frames[1:]:
                    mf = mf.unionByName(fr)
                sat = (
                    mf.distinct()
                    .groupBy("qid", "docid")
                    .agg(F.count("*").alias("n_sat"))
                )
            else:
                sat = self.spark.createDataFrame(
                    [], "qid string, docid long, n_sat long"
                )
            req = self.spark.createDataFrame(
                list(n_must.items()), "qid string, n_req long"
            )
            scored = (
                scored.join(sat, ["qid", "docid"], "left")
                .join(F.broadcast(req), "qid", "left")
                .filter(
                    F.coalesce(F.col("n_req"), F.lit(0))
                    == F.coalesce(F.col("n_sat"), F.lit(0))
                )
                .select("qid", "docid", "score")
            )

        # ---- MUST_NOT exclusion ----
        if not_sets:
            kern = _presence_chunk(
                {q: np.array(sorted(s), dtype=np.int64)
                 for q, s in not_sets.items()},
                int(self.manifest["block_size"]), cb,
                tombstones=self._tombstones, codec=self._codec,
            )
            seg = self._seg_for_terms(
                sorted({int(t) for s in not_sets.values() for t in s})
            )
            not_frames.append(
                seg.groupBy("chunk")
                .applyInPandas(kern, "qid string, docid long, n_hit long")
                .select("qid", "docid")
            )
        if not_frames:
            nf = not_frames[0]
            for fr in not_frames[1:]:
                nf = nf.unionByName(fr)
            scored = scored.join(nf.distinct(), ["qid", "docid"], "left_anti")

        # ---- minimumNumberShouldMatch: >= msm distinct SHOULD clauses ----
        if min_should_match > 0 and n_should:
            if msm_sets:
                kern = _presence_chunk(
                    msm_sets, int(self.manifest["block_size"]), cb,
                    tombstones=self._tombstones, codec=self._codec,
                )
                seg = self._seg_for_terms(
                    sorted({int(t) for s in msm_sets.values() for t in s})
                )
                msm_frames.append(
                    seg.groupBy("chunk")
                    .applyInPandas(kern, "qid string, docid long, n_hit long")
                    .select(
                        F.split_part(
                            F.col("qid"), F.lit("\x01"), F.lit(1)
                        ).alias("qid"),
                        "docid",
                        F.col("qid").alias("clause"),
                    )
                )
            if msm_frames:
                sf_ = msm_frames[0]
                for fr in msm_frames[1:]:
                    sf_ = sf_.unionByName(fr)
                sat_s = (
                    sf_.distinct()
                    .groupBy("qid", "docid")
                    .agg(F.count("*").alias("n_sat_s"))
                )
            else:
                sat_s = self.spark.createDataFrame(
                    [], "qid string, docid long, n_sat_s long"
                )
            # qids with SHOULD clauses require msm; others are untouched
            req_s = self.spark.createDataFrame(
                [(q, min_should_match) for q in n_should],
                "qid string, n_req_s long",
            )
            scored = (
                scored.join(sat_s, ["qid", "docid"], "left")
                .join(F.broadcast(req_s), "qid", "left")
                .filter(
                    F.coalesce(F.col("n_sat_s"), F.lit(0))
                    >= F.coalesce(F.col("n_req_s"), F.lit(0))
                )
                .select("qid", "docid", "score")
            )

        return topk(scored, k)

    def explain(self, queries: DataFrame, results: DataFrame) -> DataFrame:
        """Per-term BM25 score breakdown for each (qid, docid) hit — the
        Lucene ``IndexSearcher.explain`` analogue, flattened relationally:
        one row per matching query term with every scoring input exposed.

        Returns (qid, docid, term, qtf, tf, dl, idf, weight) where
        weight = qtf · idf · tf/(tf + k1(1-b+b·dl/avgdl)) under THIS
        searcher's k1/b/avgdl (overrides included), so
        sum(weight) GROUP BY (qid, docid) reproduces ``search`` scores
        exactly. Non-matching query terms emit no row (Lucene's "no match
        on required clause" leaf is an absence here).

        Serving shape: term vectors come from the FORWARD index (build with
        ``forward_index=True``); the result docids' chunk set prunes the
        scan to hit partitions and the docid isin pushes into row groups —
        explaining a page of hits reads kilobytes. Query analysis and term
        lookup reuse the resident dictionary (zero extra jobs); beyond
        MAX_FETCH_DOCS distinct docids it degrades to a broadcast hash join
        over the manifest-pruned forward scan (offline-audit shape)."""
        if not self.manifest.get("forward_index"):
            raise ValueError(
                "index was built without forward_index=True; explain needs "
                "the doc-major term vectors (rebuild or append with the flag)"
            )
        qinfo, _ = self._query_info(queries)
        id2term = (
            {tid: t for t, (tid, _) in self._tid_cache.items()}
            if self._tid_cache is not None
            else None
        )
        qrows = []
        for qid, (tids, qtfs, idfs) in qinfo.items():
            for tid, qtf, idf in zip(tids, qtfs, idfs):
                qrows.append((qid, int(tid), float(qtf), float(idf)))
        if not qrows:
            return self.spark.createDataFrame(
                [], "qid string, docid long, term string, qtf long, "
                    "tf long, dl long, idf double, weight double"
            )
        qterms = self.spark.createDataFrame(
            qrows, "qid string, term_id long, qtf double, idf double"
        )
        if id2term is not None:
            term_of = {tid: id2term[tid] for _, tid, _, _ in qrows}
            qterms = qterms.withColumn(
                "term",
                F.element_at(
                    F.create_map(
                        *[F.lit(x) for kv in term_of.items() for x in kv]
                    ),
                    F.col("term_id"),
                ),
            )
        else:
            qterms = qterms.join(
                self._tdict.select("term_id", "term"), "term_id"
            )
        chunk_bits = int(self.manifest["chunk_bits"])
        fwd = self.spark.read.parquet(f"{self.index_dir}/forward")
        # search never returns tombstoned docs; keep explain consistent
        pairs = self._filter_live(results.select("qid", "docid").distinct())
        ids = [
            int(r["docid"])
            for r in pairs.select("docid")
            .distinct()
            .limit(self.MAX_FETCH_DOCS + 1)
            .collect()
        ]
        if len(ids) <= self.MAX_FETCH_DOCS:
            chunks = sorted({i >> chunk_bits for i in ids})
            fwd = fwd.filter(
                F.col("chunk").isin(chunks) & F.col("docid").isin(ids)
            )
        else:
            fwd = self._prune_to_manifest(fwd)
        from dhr_spark.functions.bm25 import bm25_weight_col

        return (
            fwd.join(F.broadcast(pairs), "docid")
            .join(F.broadcast(qterms), ["qid", "term_id"])
            .select(
                "qid",
                "docid",
                "term",
                F.col("qtf").cast("long").alias("qtf"),
                F.col("tf").cast("long").alias("tf"),
                F.col("dl").cast("long").alias("dl"),
                "idf",
                (
                    F.col("qtf")
                    * bm25_weight_col(
                        F.col("tf"), F.col("dl"), F.col("idf"),
                        F.lit(self._avgdl), self.k1, self.b,
                    )
                ).alias("weight"),
            )
        )

    def _seg_for_terms(self, all_terms: list[int]) -> DataFrame:
        # literal isin list -> parquet row-group pushdown on term_id; for
        # huge query sets switch to a broadcast semi-join instead
        if len(all_terms) <= 10_000:
            return self._seg.filter(F.col("term_id").isin(all_terms))
        terms_df = self.spark.createDataFrame(
            [(t,) for t in all_terms], "term_id long"
        )
        return self._seg.join(F.broadcast(terms_df), "term_id", "left_semi")

    def _scored_frame(
        self,
        qinfo: dict,
        all_terms: list[int],
        k: int,
        prune: bool,
        after: dict | None = None,
        sim: str = "bm25",
        mu: float = 1000.0,
        min_chunk: int | None = None,
    ) -> DataFrame:
        """Raw per-chunk scored candidates (pre-merge): (qid, docid, score)
        with at most k rows per (chunk, qid). ``min_chunk`` restricts the
        scan to chunk partitions >= it (partition pruning; the percolation
        path's 'only the chunks appended since the watermark')."""
        if (self._scoring == "impact") != (sim == "impact"):
            raise ValueError(
                f"index scoring is {self._scoring!r} but the requested "
                f"similarity is {sim!r}: impact indexes store integer "
                "impacts (not term frequencies) in the tf stream — use "
                "search_impact on impact indexes and the tf/dl similarities "
                "on text-built indexes"
            )
        seg = self._seg_for_terms(all_terms)
        dl = self._dl
        if min_chunk is not None:
            seg = seg.filter(F.col("chunk") >= int(min_chunk))
            if dl is not None:
                dl = dl.filter(F.col("chunk") >= int(min_chunk))
        man = self.manifest
        kernel = _score_chunk(
            qinfo, k, self._avgdl, self.k1, self.b,
            int(man["block_size"]), prune, tombstones=self._tombstones,
            after=after, dl_bc=self._dl_bc, sim=sim, mu=mu,
            codec=self._codec,
        )
        if self._dl_bc is not None:
            return seg.groupBy("chunk").applyInPandas(kernel, RESULT_SCHEMA)
        return (
            seg.groupBy("chunk")
            .cogroup(dl.groupBy("chunk"))
            .applyInPandas(kernel, RESULT_SCHEMA)
        )

    def search_min_docid(
        self,
        queries: DataFrame,
        min_docid: int,
        k: int = 1000,
        sim: str = "bm25",
        sim_param: float | None = None,
    ) -> DataFrame:
        """(qid, docid, rank, score): BM25 top-k restricted to docs with
        docid >= ``min_docid`` — the percolation primitive ("hits among
        documents indexed since a watermark"). Appends allocate docids only
        at-or-past the prior next_docid, so the scan prunes to the chunk
        partitions at-or-after the watermark's; scoring is exhaustive
        within them (the boundary chunk can mix old and new docs, and a
        chunk-local top-k under pruning could fill with soon-to-be-masked
        old docs), then the exact docid gate applies before ranking.
        Scores use the LIVE corpus stats, like every filter-context query
        (a Lucene filter clause never changes scoring)."""
        if min_docid < 0:
            raise ValueError(f"min_docid must be >= 0, got {min_docid}")
        qinfo, all_terms, ksim, mu = self._prep_sim(queries, sim, sim_param)
        c0 = min_docid >> int(self.manifest["chunk_bits"])
        # kernel k = chunk capacity: disables the chunk-local cut (same
        # exhaustiveness trick as search_filtered — a cut before the docid
        # gate could fill with old docs and starve new ones)
        chunk_docs = 1 << int(self.manifest["chunk_bits"])
        scored = self._scored_frame(
            qinfo, all_terms, chunk_docs, False, min_chunk=c0,
            sim=ksim, mu=mu,
        )
        return topk(scored.filter(F.col("docid") >= min_docid), k)

    def _search_prepared(
        self,
        qinfo: dict,
        all_terms: list[int],
        k: int,
        prune: bool,
        after: dict | None = None,
        sim: str = "bm25",
        mu: float = 1000.0,
    ) -> DataFrame:
        return topk(
            self._scored_frame(
                qinfo, all_terms, k, prune, after=after, sim=sim, mu=mu
            ),
            k,
        )

    def search_rm3(
        self,
        queries: DataFrame,
        k: int = 1000,
        fb_docs: int = 10,
        fb_terms: int = 10,
        orig_weight: float = 0.5,
        prune: bool = True,
    ) -> DataFrame:
        """BM25 + RM3 pseudo-relevance feedback over the index (Anserini's
        default expansion ranker; semantics = operators/rm3.rm3_expand,
        two-stage contract anchor: /root/reference/retrieval/
        gip_retrieval.py:128-156).

        Fully distributed dataflow: first pass (WAND top-``fb_docs``) →
        broadcast the tiny (qid, docid, score) feedback set into the FORWARD
        index scan (doc-major term vectors, build with ``forward_index=True``)
        → relevance model + interpolation as DataFrame algebra with the same
        integer-micros arithmetic as rm3_expand → second WAND pass. Forward
        index rows are never collected; the only driver funnel is the final
        expanded query model (≤ |Q|·(fb_terms+|q|) rows — the same scale as
        the query set itself, which Searcher holds driver-side by design)."""
        from pyspark.sql import Window

        man = self.manifest
        if not man.get("forward_index"):
            raise ValueError(
                "index was built without forward_index=True; RM3 needs the "
                "doc-major term vectors (rebuild or append with the flag)"
            )
        qinfo, all_terms, qlen = self._query_info(queries, want_qlen=True)
        first = self._search_prepared(qinfo, all_terms, fb_docs, prune)
        fwd = self._prune_to_manifest(
            self.spark.read.parquet(f"{self.index_dir}/forward")
        )
        # P(t|d)·score contributions: the feedback set (|Q|·fb_docs rows)
        # broadcasts into the forward scan — non-feedback docs are pruned at
        # the join, nothing wider than the expansion table ever moves
        ptd = fwd.join(
            F.broadcast(first.select("qid", "docid", "score")), "docid"
        ).select(
            "qid",
            "term_id",
            (F.col("tf") / F.col("dl") * F.col("score")).alias("contrib"),
        )
        # integer-micros sums: round to 6 decimals then scale to int64 so the
        # normalizing sums are exact integer arithmetic (order-independent,
        # bit-identical to operators/rm3.rm3_expand and its DuckDB oracle)
        rm1 = (
            ptd.groupBy("qid", "term_id")
            .agg(
                F.round(F.round(F.sum("contrib"), 6) * 1e6)
                .cast("long")
                .alias("rm1_i")
            )
            .filter(F.col("rm1_i") > 0)
        )
        # term string (Anserini tie order) + current idf ride in from the
        # dictionary; rm1 is tiny, so it broadcasts against the |V|-row scan
        rm1 = self._tdict.join(F.broadcast(rm1), "term_id")
        w_cut = Window.partitionBy("qid").orderBy(
            F.col("rm1_i").desc(), F.col("term").asc()
        )
        rm1_norm = (
            rm1.withColumn("_r", F.row_number().over(w_cut))
            .filter(F.col("_r") <= fb_terms)
            .withColumn(
                "rm1",
                F.col("rm1_i") / F.sum("rm1_i").over(Window.partitionBy("qid")),
            )
            .select("qid", "term_id", "rm1", F.col("idf").alias("idf_fb"))
        )
        # original query model from the already-prepped driver arrays; the
        # denominator counts analyzed-but-OOV terms (they carry weight mass
        # even though they cannot score), matching rm3_expand's qmodel
        qm_rows = [
            (qid, int(t), float(c) / qlen[qid], float(i))
            for qid, (tids, qtfs, idfs) in qinfo.items()
            for t, c, i in zip(tids, qtfs, idfs)
        ]
        qmodel = self.spark.createDataFrame(
            qm_rows, "qid string, term_id long, pq double, idf double"
        )
        beta = F.lit(float(orig_weight))
        expanded = (
            qmodel.join(rm1_norm, ["qid", "term_id"], "full_outer")
            .select(
                "qid",
                "term_id",
                F.round(
                    beta * F.coalesce(F.col("pq"), F.lit(0.0))
                    + (F.lit(1.0) - beta) * F.coalesce(F.col("rm1"), F.lit(0.0)),
                    6,
                ).alias("weight"),
                F.coalesce(F.col("idf"), F.col("idf_fb")).alias("idf_q"),
            )
            .filter(F.col("weight") > 0)
        )
        qinfo2: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
        by_q: dict[str, list[tuple[int, float, float]]] = {}
        for r in expanded.collect():
            by_q.setdefault(r["qid"], []).append(
                (int(r["term_id"]), float(r["weight"]), float(r["idf_q"]))
            )
        for qid, trips in by_q.items():
            trips.sort()
            qinfo2[qid] = (
                np.array([t for t, _, _ in trips], dtype=np.int64),
                np.array([w for _, w, _ in trips], dtype=np.float64),
                np.array([i for _, _, i in trips], dtype=np.float64),
            )
        all_terms2 = sorted(
            {int(t) for tids, _, _ in qinfo2.values() for t in tids}
        )
        return self._search_prepared(qinfo2, all_terms2, k, prune)

    def search_rocchio(
        self,
        queries: DataFrame,
        k: int = 1000,
        fb_docs: int = 10,
        fb_terms: int = 10,
        alpha: float = 1.0,
        beta: float = 0.75,
        gamma: float = 0.0,
        bottom_docs: int = 10,
        fb_depth: int = 50,
        prune: bool = True,
    ) -> DataFrame:
        """BM25 + Rocchio pseudo-relevance feedback over the index (the
        reference searcher's other PRF switch — Pyserini
        ``SimpleSearcher.set_rocchio``; semantics =
        operators/rocchio.rocchio_expand, including the optional
        negative-feedback arm when ``gamma > 0``).

        Same fully distributed dataflow as ``search_rm3``: first pass (WAND
        top-``fb_depth``) → broadcast the feedback set into the FORWARD
        index scan → centroid + vector update as DataFrame algebra with
        integer-micros arithmetic → second WAND pass. FB⁺ = the top
        ``fb_docs`` of the first pass; FB⁻ = the bottom ``bottom_docs`` of
        the same ``fb_depth``-deep ranked list (Anserini's use_negative
        convention). Forward-index rows are never collected; the only
        driver funnel is the final expanded model (≤ |Q|·(fb_terms+|q|))."""
        from pyspark.sql import Window

        man = self.manifest
        if not man.get("forward_index"):
            raise ValueError(
                "index was built without forward_index=True; Rocchio needs "
                "the doc-major term vectors (rebuild or append with the flag)"
            )
        qinfo, all_terms, qlen = self._query_info(queries, want_qlen=True)
        first = self._search_prepared(qinfo, all_terms, fb_depth, prune)
        fwd = self._prune_to_manifest(
            self.spark.read.parquet(f"{self.index_dir}/forward")
        )

        def _centroid(fb, n_col):
            # mean of P(t|d) over the feedback docs, integer-micros
            ptd = fwd.join(F.broadcast(fb), "docid").select(
                "qid",
                "term_id",
                (F.col("tf") / F.col("dl") / F.col(n_col)).alias("contrib"),
            )
            return (
                ptd.groupBy("qid", "term_id")
                .agg(
                    F.round(F.round(F.sum("contrib"), 6) * 1e6)
                    .cast("long")
                    .alias("cent_i")
                )
                .filter(F.col("cent_i") > 0)
            )

        pos = first.filter(F.col("rank") <= fb_docs).select("qid", "docid")
        n_pos = pos.groupBy("qid").agg(F.count("*").alias("n_fb"))
        cent = _centroid(pos.join(n_pos, "qid"), "n_fb")
        # term string (cut tie order) + idf from the dictionary; the
        # centroid table is tiny, so it broadcasts against the |V|-row scan
        cent = self._tdict.join(F.broadcast(cent), "term_id")
        w_cut = Window.partitionBy("qid").orderBy(
            F.col("cent_i").desc(), F.col("term").asc()
        )
        cent_norm = (
            cent.withColumn("_r", F.row_number().over(w_cut))
            .filter(F.col("_r") <= fb_terms)
            .withColumn(
                "cpos",
                F.col("cent_i")
                / F.sum("cent_i").over(Window.partitionBy("qid")),
            )
            .select("qid", "term_id", "cpos", F.col("idf").alias("idf_fb"))
        )
        qm_rows = [
            (qid, int(t), float(c) / qlen[qid], float(i))
            for qid, (tids, qtfs, idfs) in qinfo.items()
            for t, c, i in zip(tids, qtfs, idfs)
        ]
        qmodel = self.spark.createDataFrame(
            qm_rows, "qid string, term_id long, pq double, idf double"
        )
        a, b = F.lit(float(alpha)), F.lit(float(beta))
        expanded = qmodel.join(cent_norm, ["qid", "term_id"], "full_outer").select(
            "qid",
            "term_id",
            (
                a * F.coalesce(F.col("pq"), F.lit(0.0))
                + b * F.coalesce(F.col("cpos"), F.lit(0.0))
            ).alias("w_pos"),
            F.coalesce(F.col("idf"), F.col("idf_fb")).alias("idf_q"),
        )
        if gamma > 0.0:
            w_max = first.groupBy("qid").agg(F.max("rank").alias("max_rank"))
            neg = (
                first.join(w_max, "qid")
                .filter(F.col("rank") > F.col("max_rank") - bottom_docs)
                .select("qid", "docid")
            )
            n_neg = neg.groupBy("qid").agg(F.count("*").alias("n_neg"))
            cent_n = self._tdict.join(
                F.broadcast(_centroid(neg.join(n_neg, "qid"), "n_neg")),
                "term_id",
            )
            neg_norm = cent_n.withColumn(
                "cneg",
                F.col("cent_i")
                / F.sum("cent_i").over(Window.partitionBy("qid")),
            ).select("qid", "term_id", "cneg", F.col("idf").alias("idf_neg"))
            expanded = expanded.join(
                neg_norm, ["qid", "term_id"], "full_outer"
            ).select(
                "qid",
                "term_id",
                (
                    F.coalesce(F.col("w_pos"), F.lit(0.0))
                    - F.lit(float(gamma)) * F.coalesce(F.col("cneg"), F.lit(0.0))
                ).alias("w_pos"),
                F.coalesce(F.col("idf_q"), F.col("idf_neg")).alias("idf_q"),
            )
        expanded = expanded.select(
            "qid",
            "term_id",
            F.round(F.col("w_pos"), 6).alias("weight"),
            "idf_q",
        ).filter(F.col("weight") > 0)
        qinfo2: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
        by_q: dict[str, list[tuple[int, float, float]]] = {}
        for r in expanded.collect():
            by_q.setdefault(r["qid"], []).append(
                (int(r["term_id"]), float(r["weight"]), float(r["idf_q"]))
            )
        for qid, trips in by_q.items():
            trips.sort()
            qinfo2[qid] = (
                np.array([t for t, _, _ in trips], dtype=np.int64),
                np.array([w for _, w, _ in trips], dtype=np.float64),
                np.array([i for _, _, i in trips], dtype=np.float64),
            )
        all_terms2 = sorted(
            {int(t) for tids, _, _ in qinfo2.values() for t in tids}
        )
        return self._search_prepared(qinfo2, all_terms2, k, prune)

    # ------------------------------------------------- multi-term rewrites
    # Lucene PrefixQuery / WildcardQuery / FuzzyQuery / MoreLikeThis over the
    # index: expand against the term DICTIONARY, cap at max_expansions
    # keeping highest-df terms (== lowest idf; the stored idf is strictly
    # decreasing in df, so (idf ASC, term ASC) is exactly Lucene's
    # top-terms-by-docFreq rewrite order), then score the expansion as an
    # ordinary SHOULD-of-terms query (qtf=1 per term) through the same WAND
    # kernel. Semantics twin: operators/expand.py (the DataFrame slow path
    # the DuckDB oracles check). NOTE under a federated corpus_stats idf
    # override the cap orders by the OVERRIDDEN (global) idf — that is the
    # correct federation behavior (all shards cap identically).

    def _dict_for_grams(self, grams) -> DataFrame:
        """Dictionary rows pre-filtered through the k-gram term index
        (index/kgram.py) when the index carries one and the pattern yields
        required grams — a NECESSARY-condition cut, so the caller's exact
        pattern verification keeps results bit-identical to the full |V|
        scan. Terms above the committed gram watermark (appended/merged
        after the last build_kgram_index) scan the plain dictionary slice,
        keeping a stale gram table exact rather than wrong."""
        kg = self.manifest.get("kgram")
        if not kg or grams is None:
            return self._tdict
        from dhr_spark.index.kgram import kgram_candidates

        cand = kgram_candidates(
            self.spark, self.index_dir, self.manifest, grams
        )
        covered = self._tdict.filter(
            F.col("term_id") <= int(kg["max_term_id"])
        ).join(cand, "term_id", "left_semi")
        newer = self._tdict.filter(F.col("term_id") > int(kg["max_term_id"]))
        return covered.unionByName(newer)

    def _expanded_qinfo(
        self,
        pairs: list[tuple[str, str]],
        match_py,
        match_col,
        max_expansions: int,
        grams_fn=None,
    ) -> tuple[dict, list[int]]:
        qinfo: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
        for qid, pat in pairs:
            if self._tid_cache is not None:
                hits = [
                    (idf, t, tid)
                    for t, (tid, idf) in self._tid_cache.items()
                    if match_py(pat, t)
                ]
                hits.sort(key=lambda x: (x[0], x[1]))
                trips = [(tid, 1.0, idf) for idf, _, tid in hits[:max_expansions]]
            else:
                base = self._dict_for_grams(
                    grams_fn(pat) if grams_fn is not None else None
                )
                rows = (
                    base.filter(match_col(pat))
                    .orderBy(F.col("idf").asc(), F.col("term").asc())
                    .limit(max_expansions)
                    .collect()
                )
                trips = [(int(r["term_id"]), 1.0, float(r["idf"])) for r in rows]
            if trips:
                trips.sort()
                qinfo[qid] = (
                    np.array([t for t, _, _ in trips], dtype=np.int64),
                    np.array([q for _, q, _ in trips], dtype=np.float64),
                    np.array([i for _, _, i in trips], dtype=np.float64),
                )
        all_terms = sorted({int(t) for tids, _, _ in qinfo.values() for t in tids})
        return qinfo, all_terms

    def search_prefix(
        self,
        pairs: list[tuple[str, str]],
        k: int = 1000,
        max_expansions: int = 1024,
        prune: bool = True,
    ) -> DataFrame:
        """PrefixQuery: ``pairs`` = [(qid, prefix)] -> (qid, docid, rank,
        score) top-k over terms starting with each prefix."""
        from dhr_spark.index.kgram import prefix_grams

        qinfo, all_terms = self._expanded_qinfo(
            pairs,
            lambda p, t: t.startswith(p),
            lambda p: F.col("term").startswith(p),
            max_expansions,
            grams_fn=self._kgram_fn(prefix_grams),
        )
        return self._search_prepared(qinfo, all_terms, k, prune)

    def _kgram_fn(self, fn, *extra):
        """Bind a kgram query-gram extractor to this index's gram geometry;
        None (no gram table) keeps the full-dictionary path."""
        kg = self.manifest.get("kgram")
        if not kg:
            return None
        return lambda pat: fn(pat, *extra, int(kg["k"]))

    def search_wildcard(
        self,
        pairs: list[tuple[str, str]],
        k: int = 1000,
        max_expansions: int = 1024,
        prune: bool = True,
    ) -> DataFrame:
        """WildcardQuery (* = any run, ? = one char). A leading wildcard
        scans the whole dictionary (as in Lucene) — still |V|, never the
        corpus."""
        from dhr_spark.operators.expand import wildcard_to_regex

        def py(p, t, _c={}):
            rx = _c.get(p)
            if rx is None:
                rx = _c[p] = re.compile(wildcard_to_regex(p))
            return rx.match(t) is not None

        from dhr_spark.index.kgram import wildcard_grams

        qinfo, all_terms = self._expanded_qinfo(
            pairs,
            py,
            lambda p: F.col("term").rlike(wildcard_to_regex(p)),
            max_expansions,
            grams_fn=self._kgram_fn(wildcard_grams),
        )
        return self._search_prepared(qinfo, all_terms, k, prune)

    def search_regexp(
        self,
        pairs: list[tuple[str, str]],
        k: int = 1000,
        max_expansions: int = 1024,
        prune: bool = True,
    ) -> DataFrame:
        """RegexpQuery: pattern anchored to the whole term (Lucene's
        automaton-accepts-entire-term semantics). Dialect caveat documented
        at operators/expand.py expand_regexp — keep to the Java/RE2-common
        regex core for oracle parity."""

        def py(p, t, _c={}):
            rx = _c.get(p)
            if rx is None:
                rx = _c[p] = re.compile("(?:" + p + ")")
            return rx.fullmatch(t) is not None

        qinfo, all_terms = self._expanded_qinfo(
            pairs,
            py,
            lambda p: F.col("term").rlike("^(?:" + p + ")$"),
            max_expansions,
        )
        return self._search_prepared(qinfo, all_terms, k, prune)

    def search_fuzzy(
        self,
        pairs: list[tuple[str, str]],
        k: int = 1000,
        max_edits: int = 2,
        prefix_len: int = 1,
        max_expansions: int = 50,
        prune: bool = True,
    ) -> DataFrame:
        """FuzzyQuery: plain Levenshtein <= max_edits with an exact
        ``prefix_len``-char prefix gate (Lucene prefixLength; it is also the
        scan bound a sorted term dictionary would use). maxExpansions=50 is
        Lucene's default."""
        from dhr_spark.operators.expand import levenshtein_py

        def py(p, t):
            if prefix_len and t[:prefix_len] != p[:prefix_len]:
                return False
            if abs(len(t) - len(p)) > max_edits:
                return False
            return levenshtein_py(p, t) <= max_edits

        def col(p):
            c = F.levenshtein(F.col("term"), F.lit(p)) <= max_edits
            if prefix_len:
                c = c & (
                    F.substring(F.col("term"), 1, prefix_len) == p[:prefix_len]
                )
            return c

        from dhr_spark.index.kgram import fuzzy_grams

        qinfo, all_terms = self._expanded_qinfo(
            pairs, py, col, max_expansions,
            grams_fn=self._kgram_fn(fuzzy_grams, max_edits),
        )
        return self._search_prepared(qinfo, all_terms, k, prune)

    def search_like(
        self,
        seeds: list[tuple[str, int]],
        k: int = 1000,
        max_query_terms: int = 10,
        prune: bool = True,
    ) -> DataFrame:
        """MoreLikeThis: ``seeds`` = [(qid, seed_docid)] -> top-k documents
        similar to each seed, the seed itself excluded BEFORE ranking.

        Query construction reads the seed documents' term vectors from the
        FORWARD index (build with ``forward_index=True``; docid isin prunes
        to the seeds' chunks), ranks terms by round(tf·idf, 6) DESC then term
        ASC (Lucene MoreLikeThis interestingness order, made
        engine-deterministic by the rounding), keeps ``max_query_terms``, and
        scores them as a SHOULD-of-terms query (qtf=1). Searches k+1 deep so
        dropping the seed still yields k dense ranks."""
        from dhr_spark.operators.expand import exclude_seeds_and_rank

        if not self.manifest.get("forward_index"):
            raise ValueError(
                "index was built without forward_index=True; MoreLikeThis "
                "needs the doc-major term vectors (rebuild or append with "
                "the flag)"
            )
        ids = sorted({int(d) for _, d in seeds})
        fwd = self._prune_to_manifest(
            self.spark.read.parquet(f"{self.index_dir}/forward")
        )
        vec_rows = (
            F.broadcast(fwd.filter(F.col("docid").isin(ids)))
            .join(self._tdict, "term_id")
            .select("docid", "term", "term_id", "idf", "tf")
            .collect()
        )
        by_doc: dict[int, list] = {}
        for r in vec_rows:
            by_doc.setdefault(int(r["docid"]), []).append(r)
        qinfo: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
        for qid, d in seeds:
            rows = by_doc.get(int(d), [])
            ranked = sorted(
                rows,
                key=lambda r: (-round(r["tf"] * r["idf"], 6), r["term"]),
            )[:max_query_terms]
            trips = sorted(
                (int(r["term_id"]), 1.0, float(r["idf"])) for r in ranked
            )
            if trips:
                qinfo[qid] = (
                    np.array([t for t, _, _ in trips], dtype=np.int64),
                    np.array([q for _, q, _ in trips], dtype=np.float64),
                    np.array([i for _, _, i in trips], dtype=np.float64),
                )
        all_terms = sorted({int(t) for tids, _, _ in qinfo.values() for t in tids})
        res = self._search_prepared(qinfo, all_terms, k + 1, prune)
        return exclude_seeds_and_rank(
            res.select("qid", "docid", "score"), seeds, k
        )

    def search_phrase(self, phrase: str, slop: int = 0) -> DataFrame:
        """(docid, n_matches, first_pos): phrase matches served from the
        POSITIONAL artifact (build with ``positional=True``) — no corpus
        text scan; reads only the phrase terms' position rows (term_id
        pushdown). ``slop=0`` is the exact phrase at the query's analyzed
        position offsets (shifted position-array intersection); ``slop>0``
        is the Lucene-slop analogue — ordered occurrence with total span ≤
        expected_span+slop (phrase.sloppy_anchors); n_matches then counts
        valid anchors.

        Positions carry Lucene position increments (stopwords consume a
        position under the lucene chain — builder.write_positions): the
        query phrase is analyzed with the same increments, so "new york"
        does NOT exact-match "new the york"-gapped text, while slop=1 does
        — Anserini PhraseQuery behavior.
        """
        from dhr_spark.functions.analyzer import analyze_positions

        if not self.manifest.get("positional"):
            raise ValueError(
                "index was built without positional=True; phrase search "
                "needs the positions artifact (or use operators.phrase."
                "phrase_match over the corpus text)"
            )
        pairs = analyze_positions(self.manifest["analyzer_mode"], phrase)
        if not pairs:
            raise ValueError(f"phrase {phrase!r} has no indexable terms")
        # offsets relative to the first indexed term (a leading stopword
        # only shifts the anchor, exactly as Lucene's query parser does)
        offs = [p - pairs[0][0] for p, _ in pairs]
        terms = [t for _, t in pairs]
        if self._tid_cache is not None:
            tid = {t: self._tid_cache[t][0] for t in set(terms)
                   if t in self._tid_cache}
        else:
            rows = self._tdict.filter(F.col("term").isin(list(set(terms)))).collect()
            tid = {r["term"]: int(r["term_id"]) for r in rows}
        empty = self.spark.createDataFrame(
            [], "docid long, n_matches long, first_pos long"
        )
        if any(t not in tid for t in terms):
            return empty  # an OOV phrase term can never match
        pos = self._prune_to_manifest(
            self.spark.read.parquet(f"{self.index_dir}/positions")
        )

        def _shift_by(i: int):
            # closure, NOT a default arg: a 2-param lambda would receive the
            # array index as its second argument (PySpark HOF arity rules)
            return lambda p: p - F.lit(i)

        def _shifted(j: int, off: int, t: str):
            # exact mode pre-shifts by -offset so matching reduces to array
            # intersection; sloppy mode keeps raw positions for the
            # ordered-window chain
            col = (
                F.transform(F.col("positions"), _shift_by(off))
                if off and not slop
                else F.col("positions")
            )
            return pos.filter(F.col("term_id") == tid[t]).select(
                "docid", col.alias(f"p{j}")
            )

        joined = _shifted(0, offs[0], terms[0])
        for j in range(1, len(terms)):
            joined = joined.join(_shifted(j, offs[j], terms[j]), "docid")
        if slop:
            from dhr_spark.operators.phrase import sloppy_anchors

            starts = sloppy_anchors(
                [F.col(f"p{j}") for j in range(len(terms))], slop,
                base_span=offs[-1],
            )
        else:
            starts = F.col("p0")
            for j in range(1, len(terms)):
                starts = F.array_intersect(starts, F.col(f"p{j}"))
        starts = F.array_sort(starts)
        return self._filter_live(
            joined.select(
                "docid",
                F.size(starts).cast("long").alias("n_matches"),
                F.try_element_at(starts, F.lit(1)).cast("long").alias("first_pos"),
            )
            .filter(F.col("n_matches") > 0)
        )

    def search_phrase_batch(self, phrases: DataFrame) -> DataFrame:
        """Batch exact-phrase search: (qid, phrase) -> (qid, docid,
        n_matches, first_pos) — the many-phrase twin of ``search_phrase``,
        same result shape as ``search``.

        One scan of the positions artifact serves ALL phrases: the union of
        every phrase's term_ids is pushed down once (parquet row-group
        pruning), the tiny (qid, slot, term_id, offset) plan broadcasts into
        that scan, per-row position arrays are pre-shifted by the slot's
        query offset (Lucene position increments, as search_phrase), and a
        per-(qid, docid) fold intersects the arrays — a doc qualifies only
        when all k slots matched. No per-phrase jobs, no driver loops over
        results; phrases with an OOV term are dropped up front (they cannot
        match). Position semantics identical to search_phrase (exact mode)."""
        from dhr_spark.functions.analyzer import analyze_positions

        if not self.manifest.get("positional"):
            raise ValueError(
                "index was built without positional=True; phrase search "
                "needs the positions artifact"
            )
        rows = (
            phrases.select("qid", "phrase")
            .limit(self.MAX_COLLECTED_QUERIES + 1)
            .collect()
        )
        if len(rows) > self.MAX_COLLECTED_QUERIES:
            raise ValueError(
                f"phrase set exceeds {self.MAX_COLLECTED_QUERIES} rows"
            )
        mode = self.manifest["analyzer_mode"]
        plans: dict[str, list[tuple[int, str]]] = {}
        for r in rows:
            pairs = analyze_positions(mode, r["phrase"] or "")
            if pairs:
                base = pairs[0][0]
                plans[r["qid"]] = [(p - base, t) for p, t in pairs]
        terms = sorted({t for ps in plans.values() for _, t in ps})
        if self._tid_cache is not None:
            tid = {t: self._tid_cache[t][0] for t in terms
                   if t in self._tid_cache}
        else:
            trows = self._tdict.filter(F.col("term").isin(terms)).collect()
            tid = {r["term"]: int(r["term_id"]) for r in trows}
        qp = [
            (qid, j, tid[t], off, len(ps))
            for qid, ps in plans.items()
            if all(t in tid for _, t in ps)
            for j, (off, t) in enumerate(ps)
        ]
        empty = self.spark.createDataFrame(
            [], "qid string, docid long, n_matches long, first_pos long"
        )
        if not qp:
            return empty
        qp_df = self.spark.createDataFrame(
            qp, "qid string, j int, term_id long, off int, k int"
        )
        pos = self._prune_to_manifest(
            self.spark.read.parquet(f"{self.index_dir}/positions")
        )
        needed = sorted({t for _, _, t, _, _ in qp})
        if len(needed) <= 10_000:
            pos = pos.filter(F.col("term_id").isin(needed))
        shifted = F.transform(F.col("positions"), lambda p: p - F.col("off"))
        matched = pos.join(F.broadcast(qp_df), "term_id").select(
            "qid", "docid", "k", shifted.alias("shifted")
        )
        g = (
            matched.groupBy("qid", "docid")
            .agg(
                F.count("*").alias("nt"),
                F.first("k").alias("k"),
                F.collect_list("shifted").alias("arrs"),
            )
            .filter(F.col("nt") == F.col("k"))
        )
        starts = F.array_sort(
            F.aggregate(
                F.slice(F.col("arrs"), F.lit(2), F.greatest(F.size("arrs") - 1, F.lit(1))),
                F.element_at(F.col("arrs"), 1),
                lambda acc, a: F.array_intersect(acc, a),
            )
        )
        return self._filter_live(
            g.select(
                "qid",
                "docid",
                F.size(starts).cast("long").alias("n_matches"),
                F.try_element_at(starts, F.lit(1)).cast("long").alias("first_pos"),
            )
            .filter(F.col("n_matches") > 0)
        )

    MAX_INTERVAL_EXPANSIONS = 128  # Lucene multiterm intervals cap

    def _interval_spec_tids(
        self, specs: list, max_expansions: int
    ) -> dict:
        """Resolve each leaf spec to its dictionary term_id set. Term
        leaves pass through the index analyzer (stemming under the lucene
        chain; analyzer-dropped or OOV -> empty set, Lucene's absent-term
        behavior). Prefix/wildcard leaves expand against the dictionary
        UN-analyzed (Lucene Intervals.prefix/wildcard semantics) and
        refuse past ``max_expansions`` completions — silently capping
        would silently change match semantics."""
        import re as _re

        from dhr_spark.functions.analyzer import analyze_positions

        mode = self.manifest["analyzer_mode"]
        out: dict = {}
        for kind, value in specs:
            if kind == "term":
                pairs = analyze_positions(mode, value)
                t = pairs[0][1] if pairs else None
                if t is None:
                    out[(kind, value)] = []
                elif self._tid_cache is not None:
                    hit = self._tid_cache.get(t)
                    out[(kind, value)] = [hit[0]] if hit else []
                else:
                    rows = self._tdict.filter(
                        F.col("term") == t
                    ).collect()
                    out[(kind, value)] = [int(r["term_id"]) for r in rows]
                continue
            if kind == "prefix":
                if self._tid_cache is not None:
                    cands = sorted(
                        self._tid_cache[t][0]
                        for t in self._tid_cache
                        if t.startswith(value)
                    )
                    n = len(cands)
                else:
                    rows = (
                        self._tdict.filter(
                            F.col("term").startswith(value)
                        )
                        .orderBy("term")
                        .limit(max_expansions + 1)
                        .collect()
                    )
                    cands = [int(r["term_id"]) for r in rows]
                    n = len(cands)
            else:  # wildcard
                rx = (
                    "^"
                    + _re.escape(value).replace(r"\*", ".*").replace(
                        r"\?", "."
                    )
                    + "$"
                )
                if self._tid_cache is not None:
                    pat = _re.compile(rx)
                    cands = sorted(
                        self._tid_cache[t][0]
                        for t in self._tid_cache
                        if pat.match(t)
                    )
                    n = len(cands)
                else:
                    rows = (
                        self._tdict.filter(F.col("term").rlike(rx))
                        .orderBy("term")
                        .limit(max_expansions + 1)
                        .collect()
                    )
                    cands = [int(r["term_id"]) for r in rows]
                    n = len(cands)
            if n > max_expansions:
                raise ValueError(
                    f"interval {kind} {value!r} expands to more than "
                    f"{max_expansions} dictionary terms — narrow the "
                    "pattern or raise max_expansions"
                )
            out[(kind, value)] = cands
        return out

    def search_intervals(
        self, source: dict, max_expansions: int | None = None
    ) -> DataFrame:
        """(docid, n_matches, first_start, first_end): interval query
        (Lucene IntervalsSource / ES ``intervals`` — minimal-interval
        semantics, operators/intervals.py) served from the POSITIONAL
        artifact. Reads ONLY the tree's leaf specs' position rows (term_id
        pushdown into parquet row groups), pivots them per docid with one
        grouped exchange, and runs the same per-doc algebra kernel as the
        corpus-scan twin (intervals.interval_match) — identity between the
        two is pinned in tests/test_intervals.py. Multiterm leaves
        (prefix/wildcard) expand against the dictionary, capped at
        ``max_expansions`` (refused when exceeded, Lucene behavior)."""
        out = self.search_intervals_batch(
            [("", source)], max_expansions=max_expansions
        )
        return out.drop("qid")

    def search_intervals_batch(
        self,
        trees: list[tuple[str, dict]],
        max_expansions: int | None = None,
    ) -> DataFrame:
        """(qid, docid, n_matches, first_start, first_end) for a BATCH of
        interval queries: the union of every tree's leaf specs rides ONE
        positions scan (term_id pushdown) and one docid-grouped pivot; the
        kernel then evaluates all trees against each doc's shared posmap —
        the same one-scan-serves-all contract as search_phrase_batch."""
        from dhr_spark.operators.intervals import (
            _interval_batch_kernel,
            leaf_specs,
        )

        if not self.manifest.get("positional"):
            raise ValueError(
                "index was built without positional=True; interval search "
                "needs the positions artifact (or use operators.intervals."
                "interval_match over the corpus text)"
            )
        if max_expansions is None:
            max_expansions = self.MAX_INTERVAL_EXPANSIONS
        specs: list = []
        for _, tree in trees:
            for s in leaf_specs(tree):
                if s not in specs:
                    specs.append(s)
        tidmap = self._interval_spec_tids(specs, max_expansions)
        schema = (
            "qid string, docid long, n_matches long, "
            "first_start long, first_end long"
        )
        live_tids = sorted({t for v in tidmap.values() for t in v})
        if not live_tids:
            return self.spark.createDataFrame([], schema)
        pos = self._prune_to_manifest(
            self.spark.read.parquet(f"{self.index_dir}/positions")
        ).filter(F.col("term_id").isin(live_tids))
        # pivot: one row per docid, one sorted position array per leaf
        # spec (empty when the doc matches nothing; multiterm specs union
        # their expansions' arrays — distinct terms occupy distinct
        # positions, so the flatten stays duplicate-free)
        aggs = []
        for j, s in enumerate(specs):
            tids = tidmap[s]
            if not tids:
                aggs.append(F.array().cast("array<int>").alias(f"p{j}"))
            elif len(tids) == 1:
                aggs.append(
                    F.coalesce(
                        F.first(
                            F.when(
                                F.col("term_id") == tids[0],
                                F.col("positions"),
                            ),
                            ignorenulls=True,
                        ),
                        F.array().cast("array<int>"),
                    ).alias(f"p{j}")
                )
            else:
                aggs.append(
                    F.sort_array(
                        F.flatten(
                            F.collect_list(
                                F.when(
                                    F.col("term_id").isin(tids),
                                    F.col("positions"),
                                )
                            )
                        )
                    ).alias(f"p{j}")
                )
        pivoted = pos.groupBy("docid").agg(*aggs)
        out = pivoted.mapInPandas(
            _interval_batch_kernel(trees, specs, "docid"), schema
        )
        return self._filter_live(out)

    def search_phrase_prefix(
        self,
        phrase: str,
        max_expansions: int = 50,
        expansions: list[str] | None = None,
    ) -> DataFrame:
        """(docid, n_matches, first_pos): ES ``match_phrase_prefix`` /
        Lucene ``MultiPhraseQuery`` served from the positional artifact —
        every analyzed term but the last matches exactly at its position
        increment; the LAST term is a prefix completed by up to
        ``max_expansions`` dictionary terms in term (TermsEnum) order.
        n_matches counts distinct qualifying starts: completions landing
        on the same start collapse to one phrase occurrence, exactly as
        MultiPhraseQuery enumerates positions.

        The prefix is the ANALYZED last token (stemmed under the lucene
        chain), matched against the equally-stemmed dictionary — ES
        semantics, where the index analyzer runs before expansion. The
        expansion resolves against the resident dictionary cache when
        present, else one k-gram-accelerated (index/kgram.py) bounded
        dictionary job (<= max_expansions rows collected). Matching reads
        ONLY the fixed + expansion terms' position rows (term_id pushdown
        into parquet row groups); the last slot's per-doc position arrays
        union with one (docid)-keyed aggregation over those rows — never
        the corpus. Scale shape == search_phrase plus a dictionary-bounded
        prepass."""
        from dhr_spark.functions.analyzer import analyze_positions
        from dhr_spark.index.kgram import prefix_grams

        if not self.manifest.get("positional"):
            raise ValueError(
                "index was built without positional=True; phrase-prefix "
                "search needs the positions artifact (or use operators."
                "phrase.phrase_prefix_match over the corpus text)"
            )
        pairs = analyze_positions(self.manifest["analyzer_mode"], phrase)
        if not pairs:
            raise ValueError(f"phrase {phrase!r} has no indexable terms")
        offs = [p - pairs[0][0] for p, _ in pairs]
        terms = [t for _, t in pairs]
        prefix, fixed = terms[-1], terms[:-1]
        empty = self.spark.createDataFrame(
            [], "docid long, n_matches long, first_pos long"
        )
        # ---- expansion set: dictionary terms completing the prefix ----
        # ``expansions`` (federation hook): the candidate completions were
        # already resolved globally (MultiSearcher merges member
        # dictionaries under ONE term-ASC cap); this member just maps them
        # to its own term ids — terms absent here contribute nothing
        if expansions is not None:
            if self._tid_cache is not None:
                exp_tids = [
                    self._tid_cache[t][0]
                    for t in expansions
                    if t in self._tid_cache
                ]
            else:
                exp_tids = [
                    int(r["term_id"])
                    for r in self._tdict.filter(
                        F.col("term").isin(list(expansions))
                    ).collect()
                ]
        elif self._tid_cache is not None:
            exp_tids = [
                tid
                for _, tid in sorted(
                    (t, tid)
                    for t, (tid, _idf) in self._tid_cache.items()
                    if t.startswith(prefix)
                )[:max_expansions]
            ]
        else:
            gfn = self._kgram_fn(prefix_grams)
            base = self._dict_for_grams(gfn(prefix) if gfn else None)
            exp_tids = [
                int(r["term_id"])
                for r in (
                    base.filter(F.col("term").startswith(prefix))
                    .orderBy("term")
                    .limit(max_expansions)
                    .collect()
                )
            ]
        if not exp_tids:
            return empty
        # ---- fixed-slot term ids (any OOV fixed term -> no match) ----
        if self._tid_cache is not None:
            tid = {t: self._tid_cache[t][0] for t in set(fixed)
                   if t in self._tid_cache}
        else:
            rows = self._tdict.filter(
                F.col("term").isin(list(set(fixed)))
            ).collect()
            tid = {r["term"]: int(r["term_id"]) for r in rows}
        if any(t not in tid for t in fixed):
            return empty
        pos = self._prune_to_manifest(
            self.spark.read.parquet(f"{self.index_dir}/positions")
        )
        needed = sorted({tid[t] for t in fixed} | set(exp_tids))
        if len(needed) <= 10_000:
            pos = pos.filter(F.col("term_id").isin(needed))
        off_last = offs[-1]
        last = (
            pos.filter(F.col("term_id").isin(exp_tids))
            .groupBy("docid")
            .agg(F.flatten(F.collect_list("positions")).alias("pl"))
            .select(
                "docid",
                F.transform(
                    F.array_sort("pl"), lambda p: p - F.lit(off_last)
                ).alias("plast"),
            )
        )

        def _shift_by(i: int):
            # closure, NOT a default arg (PySpark HOF arity rules)
            return lambda p: p - F.lit(i)

        joined = last
        arrs = [F.col("plast")]
        for j, t in enumerate(fixed):
            col = (
                F.transform(F.col("positions"), _shift_by(offs[j]))
                if offs[j]
                else F.col("positions")
            )
            joined = joined.join(
                pos.filter(F.col("term_id") == tid[t]).select(
                    "docid", col.alias(f"p{j}")
                ),
                "docid",
            )
            arrs.append(F.col(f"p{j}"))
        starts = arrs[0]
        for a in arrs[1:]:
            starts = F.array_intersect(starts, a)
        starts = F.array_sort(starts)
        return self._filter_live(
            joined.select(
                "docid",
                F.size(starts).cast("long").alias("n_matches"),
                F.try_element_at(starts, F.lit(1)).cast("long")
                .alias("first_pos"),
            ).filter(F.col("n_matches") > 0)
        )

    def _phrase_starts_frame(self, phrase: str):
        """(DataFrame (docid, starts array<int>), span_width) for an exact
        phrase over the positions artifact — the shared front half of the
        index-backed span queries. starts are sorted ascending; span_width
        is the Lucene span length INCLUDING position-increment gaps
        (offs[-1] + 1), so span end (exclusive) = start + span_width.
        Returns (None, 0) for an OOV phrase (it can never match)."""
        from dhr_spark.functions.analyzer import analyze_positions

        if not self.manifest.get("positional"):
            raise ValueError(
                "index was built without positional=True; span search "
                "needs the positions artifact (or use operators.phrase "
                "over the corpus text)"
            )
        pairs = analyze_positions(self.manifest["analyzer_mode"], phrase)
        if not pairs:
            raise ValueError(f"phrase {phrase!r} has no indexable terms")
        offs = [p - pairs[0][0] for p, _ in pairs]
        terms = [t for _, t in pairs]
        if self._tid_cache is not None:
            tid = {t: self._tid_cache[t][0] for t in set(terms)
                   if t in self._tid_cache}
        else:
            rows = self._tdict.filter(
                F.col("term").isin(list(set(terms)))
            ).collect()
            tid = {r["term"]: int(r["term_id"]) for r in rows}
        if any(t not in tid for t in terms):
            return None, 0
        pos = self._prune_to_manifest(
            self.spark.read.parquet(f"{self.index_dir}/positions")
        )

        def _shift_by(i: int):
            return lambda p: p - F.lit(i)

        def _shifted(j: int, off: int, t: str):
            col = (
                F.transform(F.col("positions"), _shift_by(off))
                if off
                else F.col("positions")
            )
            return pos.filter(F.col("term_id") == tid[t]).select(
                "docid", col.alias(f"p{j}")
            )

        joined = _shifted(0, offs[0], terms[0])
        for j in range(1, len(terms)):
            joined = joined.join(_shifted(j, offs[j], terms[j]), "docid")
        starts = F.col("p0")
        for j in range(1, len(terms)):
            starts = F.array_intersect(starts, F.col(f"p{j}"))
        frame = joined.select(
            "docid", F.array_sort(starts).alias("starts")
        ).filter(F.size("starts") > 0)
        return frame, offs[-1] + 1

    @staticmethod
    def _span_hits(frame: DataFrame, starts: Column) -> DataFrame:
        starts = F.array_sort(starts)
        return frame.select(
            "docid",
            F.size(starts).cast("long").alias("n_matches"),
            F.try_element_at(starts, F.lit(1)).cast("long").alias("first_pos"),
        ).filter(F.col("n_matches") > 0)

    def search_span_first(self, phrase: str, end: int) -> DataFrame:
        """(docid, n_matches, first_pos): Lucene SpanFirstQuery served from
        the positional artifact — the phrase span must END at position <=
        ``end`` (exclusive span end), i.e. start <= end - span_width.
        Index-backed twin of operators.phrase.span_first_match; span_width
        counts position-increment gaps under the lucene analyzer chain."""
        frame, width = self._phrase_starts_frame(phrase)
        empty = self.spark.createDataFrame(
            [], "docid long, n_matches long, first_pos long"
        )
        if frame is None:
            return empty
        limit = int(end) - width
        kept = F.filter(F.col("starts"), lambda s: s <= F.lit(limit))
        return self._filter_live(self._span_hits(frame, kept))

    def search_span_not(
        self, include: str, exclude: str, pre: int = 0, post: int = 0
    ) -> DataFrame:
        """(docid, n_matches, first_pos): Lucene SpanNotQuery served from
        the positional artifact — occurrences of ``include`` whose span
        does not overlap any ``exclude`` occurrence widened by pre/post.
        Overlap (exclusive ends): e + m_width - 1 >= s - pre AND
        e <= s + n_width - 1 + post. Docs with include matches but no
        exclude occurrences keep every span (LEFT join, null-safe).
        Index-backed twin of operators.phrase.span_not_match."""
        if pre < 0 or post < 0:
            raise ValueError(
                f"pre/post must be >= 0, got pre={pre} post={post}"
            )
        inc, n_w = self._phrase_starts_frame(include)
        empty = self.spark.createDataFrame(
            [], "docid long, n_matches long, first_pos long"
        )
        if inc is None:
            return empty
        exc, m_w = self._phrase_starts_frame(exclude)
        if exc is None:
            # exclusion never matches anywhere: every include span survives
            return self._filter_live(self._span_hits(inc, F.col("starts")))
        joined = inc.join(
            exc.select("docid", F.col("starts").alias("_exc")), "docid", "left"
        )
        exc_arr = F.coalesce(F.col("_exc"), F.array().cast("array<int>"))

        def _survives(s: Column) -> Column:
            return ~F.exists(
                exc_arr,
                lambda e: (e + F.lit(m_w - 1) >= s - F.lit(pre))
                & (e <= s + F.lit(n_w - 1 + post)),
            )

        kept = F.filter(F.col("starts"), _survives)
        return self._filter_live(self._span_hits(joined, kept))

    def search_span_or(self, phrases: list[str]) -> DataFrame:
        """(docid, n_matches, first_pos): Lucene SpanOrQuery served from
        the positional artifact — distinct-start union of the member
        phrases' spans (operators.phrase.span_or_match contract). OOV
        members contribute nothing (so do members the analyzer drops
        entirely, e.g. a stopword-only phrase under lucene mode — the
        parser-built SpanOr simply has no clause for them); all
        no-op members returns empty."""
        from dhr_spark.functions.analyzer import analyze_positions

        if not phrases:
            raise ValueError("span_or needs at least one phrase")
        mode = self.manifest["analyzer_mode"]
        frames = []
        for p in phrases:
            if not analyze_positions(mode, p):
                continue  # analyzer-dropped member: no clause, like OOV
            fr, _w = self._phrase_starts_frame(p)
            if fr is not None:
                frames.append(fr)
        empty = self.spark.createDataFrame(
            [], "docid long, n_matches long, first_pos long"
        )
        if not frames:
            return empty
        u = frames[0]
        for fr in frames[1:]:
            u = u.unionByName(fr)
        merged = u.groupBy("docid").agg(
            F.array_sort(
                F.array_distinct(F.flatten(F.collect_list("starts")))
            ).alias("starts")
        )
        return self._filter_live(self._span_hits(merged, F.col("starts")))

    def search_synonym(
        self,
        queries: DataFrame,
        groups: list[list[str]],
        k: int = 1000,
    ) -> DataFrame:
        """(qid, docid, rank, score): BM25 top-k where query terms matching
        a synonym set score as ONE Lucene SynonymQuery clause — member tfs
        sum BEFORE saturation, blended docFreq = max member df (the exact
        semantics of operators/synonyms.py, served from the index).

        Needs the forward index (term-major scan with term_id pushdown):
        synonym scoring merges member tfs per doc BEFORE the weight
        function, which the per-term WAND kernel cannot express — so this
        path scores exhaustively over the members' postings (the same
        trade search_filtered makes; member postings are a tiny slice of
        the corpus). Query terms outside any set stay singleton clauses;
        OOV members simply don't contribute (Lucene scores the present
        ones). Group stats use LIVE dictionary df + manifest n_docs/avgdl,
        so appends/deletes shift scores exactly as they do for BM25."""
        if not self.manifest.get("forward_index"):
            raise ValueError(
                "index was built without forward_index=True; synonym "
                "scoring needs the doc-major term-vector artifact (or use "
                "operators.synonyms.synonym_topk over the corpus text)"
            )
        from dhr_spark.operators.synonyms import synonym_groups_df
        from dhr_spark.operators.topk import score_all, topk

        memb = {}  # term -> group label
        for r in synonym_groups_df(self.spark, groups).collect():
            memb[r["term"]] = r["syn"]

        # group clauses per query from RAW analyzed tokens (pre-dictionary):
        # an OOV query term whose group has in-dict members must still
        # match them, exactly as an analyzer-level synonym expansion would.
        # qtf sums when several query terms land in the same group (one
        # SynonymQuery clause with boost = count).
        qrows = (
            queries.select("qid", "text")
            .limit(self.MAX_COLLECTED_QUERIES + 1)
            .collect()
        )
        if len(qrows) > self.MAX_COLLECTED_QUERIES:
            raise ValueError(
                f"query set exceeds {self.MAX_COLLECTED_QUERIES} rows; "
                "run huge synonym evals through operators.synonyms."
                "synonym_topk (fully distributed) instead"
            )
        clause_rows = []
        needed_groups: set[str] = set()
        for r in qrows:
            agg: dict[str, int] = {}
            for t in self._analyze(r["text"] or ""):
                g = memb.get(t, t)
                agg[g] = agg.get(g, 0) + 1
            for g, c in agg.items():
                clause_rows.append((r["qid"], g, c))
                needed_groups.add(g)
        empty = self.spark.createDataFrame(
            [], "qid string, docid long, rank int, score double"
        )
        if not clause_rows:
            return empty

        # member terms of every needed group (a query term that IS a
        # member pulls in its whole set), resolved to term_ids
        need_terms = {
            t for t, g in memb.items() if g in needed_groups
        } | needed_groups
        if self._tid_cache is not None:
            t2id = {
                t: self._tid_cache[t][0]
                for t in need_terms
                if t in self._tid_cache
            }
        else:
            t2id = {
                r["term"]: int(r["term_id"])
                for r in self._tdict.filter(
                    F.col("term").isin(sorted(need_terms))
                ).collect()
            }
        if not t2id:
            return empty
        id2group = {
            tid: memb.get(t, t) for t, tid in t2id.items()
        }
        # blended per-group df from the dictionary's df column (max member)
        td_dir = self.manifest.get("term_dict_dir", "term_dict")
        drows = (
            self.spark.read.parquet(f"{self.index_dir}/{td_dir}")
            .filter(F.col("term_id").isin(sorted(t2id.values())))
            .select("term_id", "df")
            .collect()
        )
        df_g: dict[str, int] = {}
        for r in drows:
            g = id2group[int(r["term_id"])]
            df_g[g] = max(df_g.get(g, 0), int(r["df"]))

        from dhr_spark.functions.bm25 import bm25_weight_col, idf_col

        n_docs = (
            int(self._n_docs_over)
            if self._n_docs_over is not None
            else int(self.manifest["n_docs"])
        )
        map_df = self.spark.createDataFrame(
            [(tid, g, df_g[g]) for tid, g in id2group.items()],
            "term_id long, grp string, df long",
        )
        fwd = self._prune_to_manifest(
            self.spark.read.parquet(f"{self.index_dir}/forward")
        ).filter(F.col("term_id").isin(sorted(t2id.values())))
        merged = (
            fwd.join(F.broadcast(map_df), "term_id")
            .groupBy("docid", "grp")
            .agg(
                F.sum("tf").alias("tf"),
                F.max("dl").alias("dl"),
                F.max("df").alias("df"),
            )
        )
        post = merged.select(
            F.col("grp").alias("term"),
            "docid",
            F.round(
                bm25_weight_col(
                    F.col("tf"),
                    F.col("dl"),
                    idf_col(F.col("df"), n_docs),
                    F.lit(self._avgdl),
                    self.k1,
                    self.b,
                ),
                6,
            ).alias("weight"),
        )
        qdf = self.spark.createDataFrame(
            clause_rows, "qid string, term string, qtf long"
        )
        # tombstones masked BEFORE ranking so ranks stay dense 1..k
        return topk(score_all(qdf, self._filter_live(post), on="term"), k)

    def search_proximity(self, terms_raw: list[str], window: int) -> DataFrame:
        """(docid, window_start): docs where ALL terms co-occur within any
        ``window``-token span, served from the positional artifact (the
        index-backed twin of operators.phrase.proximity_match — same
        candidate-start cover test, exact)."""
        if not self.manifest.get("positional"):
            raise ValueError(
                "index was built without positional=True; proximity search "
                "needs the positions artifact"
            )
        terms = sorted({t for raw in terms_raw for t in self._analyze(raw)})
        if not terms:
            raise ValueError("no indexable terms")
        if self._tid_cache is not None:
            tid = {t: self._tid_cache[t][0] for t in terms if t in self._tid_cache}
        else:
            rows = self._tdict.filter(F.col("term").isin(terms)).collect()
            tid = {r["term"]: int(r["term_id"]) for r in rows}
        empty = self.spark.createDataFrame([], "docid long, window_start long")
        if any(t not in tid for t in terms):
            return empty
        pos = self._prune_to_manifest(
            self.spark.read.parquet(f"{self.index_dir}/positions")
        )
        joined = None
        for i, t in enumerate(terms):
            rel = pos.filter(F.col("term_id") == tid[t]).select(
                "docid", F.col("positions").alias(f"m{i}")
            )
            joined = rel if joined is None else joined.join(rel, "docid")
        m_cols = [F.col(f"m{i}") for i in range(len(terms))]
        all_pos = F.array_sort(F.array_distinct(F.flatten(F.array(*m_cols))))

        def covers(s):
            ok = F.lit(True)
            for mc in m_cols:
                ok = ok & F.exists(
                    mc, lambda q: (q >= s) & (q < s + F.lit(window))
                )
            return ok

        valid = F.filter(all_pos, covers)
        return self._filter_live(
            joined.select(
                "docid",
                F.try_element_at(valid, F.lit(1)).cast("long").alias("window_start"),
            )
            .filter(F.col("window_start").isNotNull())
        )

    MAX_FETCH_DOCS = 1_000_000

    def term_vectors(self, docids: list[int] | DataFrame) -> DataFrame:
        """(docid, term, tf, dl): a document's analyzed term vector — the
        Lucene ``IndexReader.getTermVector`` analogue, served from the
        forward index (build with ``forward_index=True``).

        A literal docid list prunes to the docids' chunk partitions with
        row-group isin pushdown (kilobytes read per doc); a DataFrame
        argument (offline audits) broadcast-semi-joins the manifest-pruned
        forward scan instead. Tombstoned docids emit no rows."""
        if not self.manifest.get("forward_index"):
            raise ValueError(
                "index was built without forward_index=True; term_vectors "
                "reads the doc-major vectors (rebuild or append with the flag)"
            )
        fwd = self.spark.read.parquet(f"{self.index_dir}/forward")
        if isinstance(docids, DataFrame):
            fwd = self._prune_to_manifest(fwd).join(
                F.broadcast(docids.select("docid").distinct()),
                "docid",
                "left_semi",
            )
        else:
            ids = sorted({int(d) for d in docids})
            chunk_bits = int(self.manifest["chunk_bits"])
            chunks = sorted({i >> chunk_bits for i in ids})
            fwd = fwd.filter(
                F.col("chunk").isin(chunks) & F.col("docid").isin(ids)
            )
        out = fwd.join(
            F.broadcast(self._tdict.select("term_id", "term")), "term_id"
        ).select("docid", "term", "tf", "dl")
        return self._filter_live(out)

    def ltr_features(
        self,
        queries: DataFrame,
        k: int = 100,
        mu: float = 1000.0,
        lam: float = 0.1,
    ) -> DataFrame:
        """(qid, docid, bm25, tfidf, qld, lmjm, matched, qlen, coverage,
        sum_tf, dl): the LTR feature matrix (operators/ltr.py) for each
        query's first-pass BM25 top-``k`` candidates — the standard
        two-stage rerank/training shape. Term vectors come from the
        forward index (``forward_index=True`` required), collection
        statistics from the dictionary/manifest (exact under appends and
        exact-stats deletes), so every feature equals the corpus-scan
        operator's output on the same candidates. Cost: one search + one
        candidate-pruned forward read + one aggregation — never a corpus
        scan."""
        from dhr_spark.operators.ltr import ltr_features as _ltr
        from dhr_spark.operators.termfreq import (
            query_term_freqs, with_tokens,
        )

        if not self.manifest.get("forward_index"):
            raise ValueError(
                "index was built without forward_index=True; LTR features "
                "read candidate term vectors from the forward index"
            )
        cand = self.search(queries, k=k).select("qid", "docid")
        tv = self.term_vectors(cand.select("docid").distinct())
        qtfs = query_term_freqs(
            with_tokens(queries, mode=self.manifest["analyzer_mode"])
        )
        full_dict = self.spark.read.parquet(
            f"{self.index_dir}/{self.manifest.get('term_dict_dir', 'term_dict')}"
        )
        return _ltr(
            qtfs,
            tv.select("docid", "term", "tf"),
            tv.select("docid", "dl").distinct(),
            k1=self.k1,
            b=self.b,
            mu=mu,
            lam=lam,
            candidates=cand,
            stats=(
                int(self.manifest["n_docs"]),
                float(self.manifest["avgdl"]),
                float(self.manifest["total_dl"]),
            ),
            term_stats=full_dict.select("term", "df", "ctf"),
        )

    def postings_list(self, terms: list[str]) -> DataFrame:
        """(term, docid, tf): the fully decoded posting lists of the given
        RAW terms — Pyserini ``IndexReader.get_postings_list`` parity (the
        reference's Lucene backend exposes it through that API; terms are
        analyzed under the index's analyzer first, exactly as Pyserini
        does by default). On an impact index the tf column carries the
        stored integer impact (the tf stream's contract there).

        Scale shape: term_id pushdown reads only the requested rows
        (parquet row-group pruning via the isin, like every search), and
        a mapInPandas varint decode emits (docid, tf) pairs — no shuffle
        at all; tombstoned docs are masked like the scoring kernels.
        Out-of-vocabulary terms simply yield no rows."""
        analyzed = sorted(
            {t for raw in terms for t in self._analyze(raw or "")}
        )
        schema = "term string, docid long, tf long"
        if self._tid_cache is not None:
            tid = {
                t: self._tid_cache[t][0]
                for t in analyzed
                if t in self._tid_cache
            }
        else:
            tid = {
                r["term"]: int(r["term_id"])
                for r in self._tdict.filter(
                    F.col("term").isin(analyzed)
                ).collect()
            }
        if not tid:
            return self.spark.createDataFrame([], schema)
        id2term = {v: k for k, v in tid.items()}
        block_size = int(self.manifest["block_size"])
        codec = self._codec
        tomb = self._tombstones

        def decode(batches):
            for pdf in batches:
                out_t: list[np.ndarray] = []
                out_d: list[np.ndarray] = []
                out_f: list[np.ndarray] = []
                for r in pdf.itertuples(index=False):
                    lens = _block_lens(int(r.n), block_size)
                    sel = np.arange(lens.size)
                    docids, _ = _decode_selected(
                        bytes(r.doc_gaps),
                        np.asarray(r.block_doc_off, dtype=np.int64),
                        lens, sel, restarts=True, codec=codec,
                    )
                    tfs, _ = _decode_selected(
                        bytes(r.tfs),
                        np.asarray(r.block_tf_off, dtype=np.int64),
                        lens, sel, restarts=False, codec=codec,
                    )
                    if tomb is not None and tomb.size:
                        keep = ~np.isin(docids, tomb)
                        docids, tfs = docids[keep], tfs[keep]
                    if docids.size:
                        out_t.append(
                            np.repeat(id2term[int(r.term_id)], docids.size)
                        )
                        out_d.append(docids)
                        out_f.append(tfs)
                if out_t:
                    yield pd.DataFrame(
                        {
                            "term": np.concatenate(out_t),
                            "docid": np.concatenate(out_d).astype(np.int64),
                            "tf": np.concatenate(out_f).astype(np.int64),
                        }
                    )

        return self._seg_for_terms(sorted(id2term)).mapInPandas(
            decode, schema
        )

    def significant_terms(
        self,
        queries: DataFrame,
        k: int = 10,
        top_hits: int = 100,
        min_fg: int = 2,
        prune: bool = True,
    ) -> DataFrame:
        """(qid, term, fg, fg_total, bg, score, rank): ES-style
        significant_terms over each query's top-``top_hits`` result set,
        served from the forward index (build with ``forward_index=True``).
        Semantics and the JLH scoring contract live in
        operators/significant.significant_terms — this method only assembles
        the index-backed inputs: first-pass WAND hits (tombstone-filtered by
        construction), foreground term vectors via a broadcast semi-join of
        the hit docids into the manifest-pruned forward scan (non-hit docs
        never shuffle), and background df from the |V|-row dictionary.
        Background stats are the dictionary's committed df / manifest
        n_docs (exact-stats deletes keep both current; mask-only deletes
        leave background counts slightly stale, same as Lucene before a
        merge)."""
        from dhr_spark.operators.significant import significant_terms as _sig

        if not self.manifest.get("forward_index"):
            raise ValueError(
                "index was built without forward_index=True; "
                "significant_terms reads the doc-major vectors (rebuild or "
                "append with the flag)"
            )
        hits = self.search(queries, k=top_hits, prune=prune).select(
            "qid", "docid"
        )
        fwd = self._prune_to_manifest(
            self.spark.read.parquet(f"{self.index_dir}/forward")
        )
        fg_rows = fwd.join(
            F.broadcast(hits.select("docid").distinct()), "docid", "left_semi"
        )
        doc_terms = fg_rows.join(
            F.broadcast(self._tdict.select("term_id", "term")), "term_id"
        ).select("docid", "term")
        td_dir = self.manifest.get("term_dict_dir", "term_dict")
        tdf = self.spark.read.parquet(f"{self.index_dir}/{td_dir}").select(
            "term", "df"
        )
        return _sig(
            hits,
            doc_terms,
            tdf,
            int(self.manifest["n_docs"]),
            k=k,
            min_fg=min_fg,
        )

    def rare_terms(
        self,
        queries: DataFrame,
        max_doc_count: int = 1,
        k: int = 100,
        top_hits: int = 100,
        prune: bool = True,
    ) -> DataFrame:
        """(qid, term, fg, bg, rank): ES ``rare_terms`` over each query's
        top-``top_hits`` result set — long-tail terms with background df
        <= ``max_doc_count``, rarest first (operators/significant.
        rare_terms). Index-backed inputs assembled exactly as
        significant_terms: the df cutoff prunes the dictionary BEFORE the
        forward-index join, so only the rare slice ever shuffles."""
        from dhr_spark.operators.significant import rare_terms as _rare

        if not self.manifest.get("forward_index"):
            raise ValueError(
                "index was built without forward_index=True; rare_terms "
                "reads the doc-major vectors (rebuild or append with the "
                "flag)"
            )
        hits = self.search(queries, k=top_hits, prune=prune).select(
            "qid", "docid"
        )
        fwd = self._prune_to_manifest(
            self.spark.read.parquet(f"{self.index_dir}/forward")
        )
        fg_rows = fwd.join(
            F.broadcast(hits.select("docid").distinct()), "docid", "left_semi"
        )
        doc_terms = fg_rows.join(
            F.broadcast(self._tdict.select("term_id", "term")), "term_id"
        ).select("docid", "term")
        td_dir = self.manifest.get("term_dict_dir", "term_dict")
        tdf = self.spark.read.parquet(f"{self.index_dir}/{td_dir}").select(
            "term", "df"
        )
        return _rare(
            hits, doc_terms, tdf, max_doc_count=max_doc_count, k=k
        )

    def suggest(
        self,
        terms: list[str],
        max_edits: int = 2,
        prefix_len: int = 1,
        n: int = 5,
    ) -> DataFrame:
        """(input, suggestion, dist, rank): spell suggestions per input term
        — the Lucene DirectSpellChecker shape. Candidates are dictionary
        terms within plain Levenshtein ``max_edits`` sharing an exact
        ``prefix_len``-char prefix, ranked by document frequency DESC (idf
        ASC) then term ASC, top ``n`` kept; the input term itself (dist 0)
        is never suggested. Touches only the |V|-row dictionary. Rows are
        per DISTINCT input on both tiers (the distributed fallback's gram
        cut collapses duplicates; the resident path matches it)."""
        from dhr_spark.operators.expand import levenshtein_py

        terms = list(dict.fromkeys(terms))
        rows = []
        if self._tid_cache is not None:
            for inp in terms:
                cands = []
                for t, (_, idf) in self._tid_cache.items():
                    if prefix_len and t[:prefix_len] != inp[:prefix_len]:
                        continue
                    if abs(len(t) - len(inp)) > max_edits or t == inp:
                        continue
                    d = levenshtein_py(inp, t)
                    if d <= max_edits:
                        cands.append((idf, t, d))
                cands.sort(key=lambda x: (x[0], x[1]))
                rows += [
                    (inp, t, d, r + 1)
                    for r, (_, t, d) in enumerate(cands[:n])
                ]
            return self.spark.createDataFrame(
                rows, "input string, suggestion string, dist int, rank int"
            )
        # huge-vocabulary fallback: gram-cut dictionary scan, batched over
        # the whole input list (_fuzzy_candidate_rows). The prefix gate and
        # self-exclusion verify AFTER the cut — extra necessary conditions
        # narrow, never widen, so results equal the plain |V| scan.
        slim = (
            self._fuzzy_candidate_rows(list(terms), max_edits)
            .filter(
                (F.col("term") != F.col("qt"))
                & (
                    F.substring(F.col("term"), 1, prefix_len)
                    == F.substring(F.col("qt"), 1, prefix_len)
                    if prefix_len
                    else F.lit(True)
                )
            )
            .select(
                "qt",
                "term_id",
                F.levenshtein(F.col("term"), F.col("qt"))
                .cast("int")
                .alias("dist"),
            )
        )
        # idf rides in from _tdict, NOT the helper's raw dictionary column —
        # under a federated idf override the ranking must use the global idf
        cand = self._tdict.join(F.broadcast(slim), "term_id").select(
            F.col("qt").alias("input"),
            F.col("term").alias("suggestion"),
            "dist",
            "idf",
        )
        from pyspark.sql import Window

        w = Window.partitionBy("input").orderBy(
            F.col("idf").asc(), F.col("suggestion").asc()
        )
        return (
            cand.withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= n)
            .drop("idf")
        )

    def suggest_complete(self, prefixes: list[str], n: int = 5) -> DataFrame:
        """(input, suggestion, rank): prefix autocomplete over the term
        dictionary — the Lucene suggest-module / ES completion-suggester
        shape with document frequency as the suggestion weight. Candidates
        are dictionary terms extending (or equal to) the lowercased prefix,
        ranked df DESC (idf ASC — identical order) then term ASC, top ``n``
        kept. Unlike ``suggest`` (spell correction) the input itself IS a
        legal completion — ES returns the exact match first. Touches only
        the |V|-row dictionary; the resident-dictionary fast path costs
        zero Spark jobs, and the distributed twin broadcast-joins the
        prefix batch against the dictionary scan (never the corpus)."""
        inputs = [p.lower() for p in prefixes]
        if self._tid_cache is not None:
            rows = []
            for inp in inputs:
                cands = sorted(
                    (idf, t)
                    for t, (_, idf) in self._tid_cache.items()
                    if t.startswith(inp)
                )
                rows += [
                    (inp, t, r + 1) for r, (_, t) in enumerate(cands[:n])
                ]
            return self.spark.createDataFrame(
                rows, "input string, suggestion string, rank int"
            )
        from pyspark.sql import Window

        inp_df = self.spark.createDataFrame(
            [(t,) for t in inputs], "input string"
        )
        cand = self._tdict.join(
            F.broadcast(inp_df), F.col("term").startswith(F.col("input"))
        ).select("input", F.col("term").alias("suggestion"), "idf")
        w = Window.partitionBy("input").orderBy(
            F.col("idf").asc(), F.col("suggestion").asc()
        )
        return (
            cand.withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= n)
            .drop("idf")
        )

    def _fuzzy_candidate_rows(
        self, qterms: list[str], max_edits: int
    ) -> DataFrame:
        """(qt, term, term_id, df, ctf): dictionary terms within plain
        Levenshtein ``max_edits`` of each input term — the phrase
        suggester's candidate relation, batched across ALL inputs in one
        job. When the index carries a k-gram table (index/kgram.py) the
        |V|-row levenshtein scan is cut first: ONE broadcast of the inputs'
        (qt, gram) pairs against the gram-sorted table resolves every
        input's candidate slice in a single pass (shared-gram count vs the
        per-input pigeonhole threshold), exact levenshtein then verifies.
        Terms above the gram watermark and inputs whose gram bound is
        vacuous fall back to the dictionary scan — the cut is a NECESSARY
        condition only, so results are bit-identical to the full join.
        Rows are per DISTINCT input (the shared-gram count assumes distinct
        (qt, gram) pairs, so duplicates are collapsed up front); an empty
        input yields an empty frame."""
        qterms = sorted(set(qterms))
        full = self.spark.read.parquet(
            f"{self.index_dir}/"
            f"{self.manifest.get('term_dict_dir', 'term_dict')}"
        ).select("term", "term_id", "df", "ctf", "idf")
        sel = ["qt", "term", "term_id", "df", "ctf", "idf"]

        def lev_join(terms: list[str]) -> DataFrame:
            inp = self.spark.createDataFrame(
                [(t,) for t in terms], "qt string"
            )
            return full.join(
                F.broadcast(inp),
                F.levenshtein(F.col("term"), F.col("qt")) <= max_edits,
            ).select(*sel)

        kg = self.manifest.get("kgram")
        if not kg:
            return lev_join(qterms)
        from dhr_spark.index.kgram import fuzzy_grams, kgram_candidates_batch

        batched: list[tuple[str, list[str], int]] = []
        vacuous: list[str] = []
        for qt in qterms:
            g = fuzzy_grams(qt, max_edits, int(kg["k"]))
            if g is None:
                vacuous.append(qt)
            else:
                batched.append((qt, g[0], g[1]))
        parts: list[DataFrame] = []
        if batched:
            cand_ids = kgram_candidates_batch(
                self.spark, self.index_dir, batched
            )
            parts.append(
                cand_ids.join(full, "term_id")
                .filter(
                    F.levenshtein(F.col("term"), F.col("qt")) <= max_edits
                )
                .select(*sel)
            )
            # gram'd inputs still levenshtein-scan the post-watermark slice
            # (terms appended after the last build_kgram_index refresh)
            inp_g = self.spark.createDataFrame(
                [(qt,) for qt, _, _ in batched], "qt string"
            )
            parts.append(
                full.filter(F.col("term_id") > int(kg["max_term_id"]))
                .join(
                    F.broadcast(inp_g),
                    F.levenshtein(F.col("term"), F.col("qt")) <= max_edits,
                )
                .select(*sel)
            )
        if vacuous:
            parts.append(lev_join(vacuous))
        if not parts:  # empty input: typed empty frame, never IndexError
            return lev_join([])
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def suggest_phrase(
        self,
        texts: list[str],
        max_per_term: int = 3,
        top: int = 3,
        max_edits: int = 1,
    ) -> DataFrame:
        """(input, suggestion, score, rank): the ES phrase suggester
        ("did you mean") — whole-phrase spell correction ranked by a
        bigram language model with stupid backoff (Brants et al. 2007).

        Per analyzed slot, candidates are the dictionary terms within
        ``max_edits`` Levenshtein of the input term (the input term itself
        included when in-vocabulary), capped at ``max_per_term`` by
        (df DESC, term ASC) — DirectSpellChecker's popularity order. Every
        candidate combination is scored

            P(c) = P(c1) * prod_i P(ci | ci-1)
            P(c1) = ctf(c1) / T
            P(ci|ci-1) = bg(ci-1, ci) / ctf(ci-1)     when the bigram exists
                       = 0.4 * ctf(ci) / T            backoff otherwise

        over the committed bigram artifact (index/shingles.py; T = the
        manifest's total_dl token count). Scoring is EXACT-integer: one
        numerator/denominator product pair per combination (the 0.4
        backoff rides as 2/5), a single IEEE division at the end — so a
        DuckDB oracle reproduces scores bit-for-bit. The verbatim input
        phrase is excluded (a correction, not an echo); ties break
        suggestion ASC.

        Interactive shape: ONE distributed dictionary job resolves all
        candidates (_fuzzy_candidate_rows — k-gram-accelerated when the
        index carries a gram table, the |V| levenshtein scan otherwise),
        one bounded bigram slice read (candidate-pair pushdown), then
        driver-side enumeration over at most max_per_term^slots
        combinations (capped; slots capped at 6, which also keeps the
        oracle's decimal(38) products exact at test scale). Nothing
        touches the corpus.
        """
        from pyspark.sql import Window

        from dhr_spark.functions.analyzer import analyze_positions
        from dhr_spark.index.shingles import read_bigrams

        if not 1 <= max_per_term <= 10:
            raise ValueError(f"max_per_term must be in [1, 10], got {max_per_term}")
        if max_edits < 1:
            raise ValueError(f"max_edits must be >= 1, got {max_edits}")
        # fail fast on a missing/stale bigram table — before any work
        bg_rel = read_bigrams(self.spark, self.index_dir, self.manifest)
        mode = self.manifest["analyzer_mode"]
        plans: dict[str, list[str]] = {}
        for text in texts:
            terms = [t for _, t in analyze_positions(mode, text or "")]
            if not terms:
                continue
            if len(terms) > 6:
                raise ValueError(
                    f"phrase suggest supports up to 6 terms, got "
                    f"{len(terms)} for {text!r}"
                )
            plans[text] = terms
        empty = self.spark.createDataFrame(
            [], "input string, suggestion string, score double, rank int"
        )
        if not plans:
            return empty
        qterms = sorted({t for ts in plans.values() for t in ts})
        w = Window.partitionBy("qt").orderBy(
            F.col("df").desc(), F.col("term").asc()
        )
        cand_rows = (
            self._fuzzy_candidate_rows(qterms, max_edits)
            .withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") <= max_per_term)
            .select("qt", "term", "term_id", "ctf")
            .collect()
        )
        cands: dict[str, list[tuple[str, int, int]]] = {}
        for r in cand_rows:
            cands.setdefault(r["qt"], []).append(
                (r["term"], int(r["term_id"]), int(r["ctf"]))
            )
        import itertools

        combos_by_input: dict[str, list[tuple]] = {}
        t1_ids, t2_ids = set(), set()
        for text, terms in plans.items():
            slots = [cands.get(t) for t in terms]
            if any(not s for s in slots):
                continue  # an uncorrectable slot -> no suggestion (ES)
            n_combos = 1
            for s in slots:
                n_combos *= len(s)
            if n_combos > 4096:
                raise ValueError(
                    f"{n_combos} candidate combinations for {text!r} — "
                    "lower max_per_term (cap 4096)"
                )
            combos = list(itertools.product(*slots))
            combos_by_input[text] = combos
            for c in combos:
                for a, b in zip(c, c[1:]):
                    t1_ids.add(a[1])
                    t2_ids.add(b[1])
        if not combos_by_input:
            return empty
        bg = {
            (int(r["t1"]), int(r["t2"])): int(r["n"])
            for r in bg_rel.filter(
                F.col("t1").isin(sorted(t1_ids))
                & F.col("t2").isin(sorted(t2_ids))
            ).collect()
        }
        T = int(self.manifest["total_dl"])
        out = []
        for text, combos in combos_by_input.items():
            orig = tuple(plans[text])
            scored = []
            for c in combos:
                terms_c = tuple(t for t, _, _ in c)
                if terms_c == orig:
                    continue
                num, den = c[0][2], T
                for (pt, pid, pctf), (ct, cid, cctf) in zip(c, c[1:]):
                    n = bg.get((pid, cid), 0)
                    if n:
                        num *= n
                        den *= pctf
                    else:
                        num *= 2 * cctf
                        den *= 5 * T
                # float() each side BEFORE dividing: the oracle casts the
                # exact-integer num/den to DOUBLE then divides, and Python's
                # int/int true division rounds once from the exact rational
                # — two roundings vs one can differ by 1 ulp
                scored.append((float(num) / float(den), " ".join(terms_c)))
            scored.sort(key=lambda x: (-x[0], x[1]))
            out += [
                (text, s, sc, r + 1)
                for r, (sc, s) in enumerate(scored[:top])
            ]
        if not out:
            return empty
        return self.spark.createDataFrame(
            out, "input string, suggestion string, score double, rank int"
        )

    def stats_df(self) -> DataFrame:
        """One-row index statistics — the Lucene CheckIndex/IndexReader
        stats surface: (n_docs, n_terms, total_dl, avgdl, total_postings,
        n_chunks). Counts come from the manifest (the atomic commit record);
        total_postings sums the per-(chunk, term) posting counts stored in
        the segment rows — no posting decode."""
        man = self.manifest
        tp = self._seg.agg(F.sum("n").alias("tp")).collect()[0]["tp"]
        return self.spark.createDataFrame(
            [
                (
                    int(man["n_docs"]),
                    int(man["n_terms"]),
                    int(man["total_dl"]),
                    float(man["total_dl"]) / int(man["n_docs"]),
                    int(tp),
                    len(man["chunks"]),
                )
            ],
            "n_docs long, n_terms long, total_dl long, avgdl double, "
            "total_postings long, n_chunks long",
        )

    def fetch_stored(self, results: DataFrame) -> DataFrame:
        """Attach the stored original text to a (docid, ...) result frame —
        Lucene stored-field retrieval. Requires ``build_index(...,
        stored=True)``.

        Serving shape: the distinct result docids are collected (bounded by
        MAX_FETCH_DOCS — top-k output is k x |Q|, driver-tiny), their CHUNK
        set prunes the stored scan to only the hit partitions, and the docid
        isin predicate pushes into parquet row groups — rendering a page of
        results reads kilobytes of one chunk file, never the corpus. Beyond
        the bound it degrades to a full-scan hash join with the results side
        broadcast (an offline job's shape, still no driver state)."""
        if not self.manifest.get("stored"):
            raise ValueError(
                "index was built without stored fields — rebuild or append "
                "with stored=True to use fetch_stored/highlight"
            )
        chunk_bits = int(self.manifest["chunk_bits"])
        stored = self.spark.read.parquet(f"{self.index_dir}/stored")
        ids = [
            int(r["docid"])
            for r in results.select("docid")
            .distinct()
            .limit(self.MAX_FETCH_DOCS + 1)
            .collect()
        ]
        if len(ids) <= self.MAX_FETCH_DOCS:
            chunks = sorted({i >> chunk_bits for i in ids})
            stored = stored.filter(
                F.col("chunk").isin(chunks) & F.col("docid").isin(ids)
            )
        else:
            stored = self._prune_to_manifest(stored)
        return results.join(stored.select("docid", "text"), "docid", "left")

    def highlight(
        self, queries: DataFrame, k: int = 10, width: int = 10
    ) -> DataFrame:
        """Index-backed result highlighting: BM25 top-k + stored-field fetch
        + keyword-in-context snippet, no corpus scan anywhere.

        Returns (qid, docid, rank, score, start, n_hits, snippet) where the
        snippet is the ``width``-token window of the stored text covering
        the most distinct query terms (ties earliest) — exactly
        operators.phrase.best_snippet's selection, computed by its Arrow
        row-kernel twin over only the k x |Q| fetched rows."""
        from dhr_spark.operators.phrase import snippet_struct_udf

        res = self.search(queries, k=k)
        fetched = self.fetch_stored(res)
        q = queries.select("qid", F.col("text").alias("_qtext"))
        snip = snippet_struct_udf(width)(F.col("text"), F.col("_qtext"))
        return (
            fetched.join(F.broadcast(q), "qid")
            .withColumn("_s", snip)
            .select(
                "qid", "docid", "rank", "score",
                F.col("_s.start").alias("start"),
                F.col("_s.n_hits").alias("n_hits"),
                F.col("_s.snippet").alias("snippet"),
            )
        )

    def highlight_fragments(
        self,
        queries: DataFrame,
        k: int = 10,
        width: int = 10,
        n_fragments: int = 2,
    ) -> DataFrame:
        """Multi-fragment highlighting — the ES unified highlighter's
        ``number_of_fragments``: up to ``n_fragments`` NON-OVERLAPPING
        ``width``-token windows per hit, greedily covering the most
        distinct query terms (ties earliest; operators/phrase.
        snippet_fragments semantics — frag 1 is exactly ``highlight``'s
        single snippet). Returns (qid, docid, rank, score, frag, start,
        n_hits, snippet); hits with no raw-token window emit no fragment
        rows. Same serving shape as highlight: top-k + stored fetch +
        Arrow row kernel over k x |Q| rows only."""
        from dhr_spark.operators.phrase import snippet_frags_udf

        if n_fragments < 1:
            raise ValueError(
                f"n_fragments must be >= 1, got {n_fragments}"
            )
        res = self.search(queries, k=k)
        fetched = self.fetch_stored(res)
        q = queries.select("qid", F.col("text").alias("_qtext"))
        frags = snippet_frags_udf(width, n_fragments)(
            F.col("text"), F.col("_qtext")
        )
        return (
            fetched.join(F.broadcast(q), "qid")
            .withColumn("_f", F.explode(frags))
            .select(
                "qid", "docid", "rank", "score",
                F.col("_f.frag").alias("frag"),
                F.col("_f.start").alias("start"),
                F.col("_f.n_hits").alias("n_hits"),
                F.col("_f.snippet").alias("snippet"),
            )
        )


def search_wand(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int = 1000,
    prune: bool = True,
) -> DataFrame:
    """One-shot convenience wrapper; for repeated querying build a Searcher
    once and call .search()."""
    return Searcher(spark, index_dir, cache=False).search(queries, k, prune)
