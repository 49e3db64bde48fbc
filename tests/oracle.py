"""Pure-pandas brute-force BM25 oracle — the test-side twin of the engine.

Semantics of the reference's exact retrieval: sparse dot product of query TF
against per-doc BM25 weight vectors (/root/reference/retrieval/
gip_retrieval.py:60-85,117-126), with Lucene BM25 k1=0.9 b=0.4 and ties
broken (round(score,6) DESC, docid ASC) — SURVEY.md §5 "Oracle end-to-end".
Deliberately independent of the Spark code paths: plain dict/loops.
"""

from __future__ import annotations

import math
from collections import Counter

from dhr_spark import B, K1
from dhr_spark.functions.analyzer import analyze_lucene


def oracle_topk(
    corpus: list[tuple[int, str]],
    queries: list[tuple[str, str]],
    k: int = 10,
    k1: float = K1,
    b: float = B,
) -> dict[str, list[tuple[int, int, float]]]:
    """corpus: [(docid, text)], queries: [(qid, text)] ->
    {qid: [(docid, rank, score), ...]} using the full Lucene-chain analyzer."""
    doc_tf: dict[int, Counter] = {}
    dl: dict[int, int] = {}
    df: Counter = Counter()
    for docid, text in corpus:
        toks = analyze_lucene(text)
        doc_tf[docid] = Counter(toks)
        dl[docid] = len(toks)
        for t in set(toks):
            df[t] += 1
    n = len(corpus)
    avgdl = sum(dl.values()) / n if n else 0.0

    out: dict[str, list[tuple[int, int, float]]] = {}
    for qid, qtext in queries:
        qtf = Counter(analyze_lucene(qtext))
        scores: dict[int, float] = {}
        for docid in doc_tf:
            s = 0.0
            matched = False
            for t, qf in qtf.items():
                tf = doc_tf[docid].get(t, 0)
                if tf == 0:
                    continue
                matched = True
                idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
                s += qf * idf * tf / (tf + k1 * (1.0 - b + b * dl[docid] / avgdl))
            if matched:
                scores[docid] = s
        ranked = sorted(
            scores.items(), key=lambda kv: (-round(kv[1], 6), kv[0])
        )[:k]
        out[qid] = [
            (docid, i + 1, round(s, 6)) for i, (docid, s) in enumerate(ranked)
        ]
    return out
