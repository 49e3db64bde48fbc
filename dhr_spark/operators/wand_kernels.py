"""Block-max WAND scoring kernels — the numpy/Arrow per-chunk engines
behind :class:`dhr_spark.operators.wand.Searcher` (split out of wand.py in
round 4; same code, unchanged semantics). Everything here is a module-level
function returning a cogrouped/applyInPandas kernel or a decode helper; the
Searcher composes them into DataFrame plans. Reference dataflow anchor:
/root/reference/retrieval/gip_retrieval.py (scoring), Lucene block-max WAND
(Ding & Suel, SIGIR 2011) for the pruning bound.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dhr_spark.index.builder import load_manifest
from dhr_spark.index.codec import (
    codec_of,
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
        # mixed-tier index: each chunk decodes under its own codec
        ck = codec_of(codec, chunk)
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
                    lens, np.arange(lens.size), restarts=True, codec=ck,
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
        # mixed-tier index: each chunk decodes under its own codec
        ck = codec_of(codec, chunk)
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
                    lens, np.arange(lens.size), restarts=True, codec=ck,
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
            seg, int(base), np.frombuffer(dls_bytes, dtype=np.int32),
            codec_of(codec, int(key[0])),
        )

    def kernel(key, seg: pd.DataFrame, dl: pd.DataFrame) -> pd.DataFrame:
        if seg.empty or dl.empty:
            return _empty()
        return score_frame(
            seg,
            int(dl["base_docid"].iloc[0]),
            np.frombuffer(dl["dls"].iloc[0], dtype=np.int32),
            codec_of(codec, int(key[0])),
        )

    def score_frame(
        seg: pd.DataFrame, base: int, dls: np.ndarray, ck: str = "varint"
    ) -> pd.DataFrame:
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
                lens, sel, restarts=True, codec=ck,
            )
            tfs, _ = _decode_selected(
                bytes(r.tfs), np.asarray(r.block_tf_off, dtype=np.int64),
                lens, sel, restarts=False, codec=ck,
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

