"""Result diversification — Maximal Marginal Relevance (MMR) re-ranking.

Carbonell & Goldstein (SIGIR 1998): greedily re-order a candidate list so
each pick balances relevance against redundancy with what is already
selected,

    pick = argmax_d  λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s)

MMR is the standard diversification pass LLM retrieval stacks run on top-k
results (LangChain / vector-DB "mmr" search mode) and the natural companion
to the embedding near-dup family (operators/dedup.py): dedup removes
corpus-level duplicates offline, MMR removes RESULT-level redundancy at
query time. The reference has no diversification (ranked ids only).

Exactness contract: relevance and pairwise cosine lift to integer micros
(round half-away-from-zero — Spark HALF_UP and DuckDB round() both round
away from zero, and cosines can be negative), λ is constrained to a
multiple of 1/16 so the greedy objective is the ALL-INTEGER expression

    mmr16 = 16λ·rel_i − (16−16λ)·maxsim_i

and every pick is an integer argmax with docid-ascending ties. The DuckDB
oracle replays the same greedy loop as a recursive CTE over the same
integer tables, so the full selection ORDER hashes identically.

Scale shape: the candidate set is |Q|·k rows — it broadcast-semi-joins
into the embedding table scan (corpus embeddings never shuffle), and the
greedy loop runs per-qid inside one applyInPandas kernel over ≤ k
candidates (k² cosines on ≤ k vectors: trivially partition-local). The
iterative selection is inherently sequential per query, but queries
parallelize freely — the same shape Spark gives every per-group
re-ranker.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _away(x: np.ndarray) -> np.ndarray:
    """Round half away from zero (Spark HALF_UP / DuckDB round parity)."""
    return np.copysign(np.floor(np.abs(x) + 0.5), x)


def mmr_rerank(
    results: DataFrame,
    embeddings: DataFrame,
    lam: float = 0.75,
    k: int = 10,
    qid_col: str = "qid",
    id_col: str = "vec_id",
    rel_col: str = "cosine",
    vec_col: str = "embedding",
) -> DataFrame:
    """(qid, vec_id, rank): MMR-diversified selection order, rank 1..k.

    ``results``    — per-query candidates with a relevance column on the
                     COSINE scale (pre-normalize upstream if mixing scales;
                     combsum_fuse's min-max lift is the repo recipe).
    ``embeddings`` — (vec_id, embedding) for at least every candidate;
                     candidates missing an embedding raise (a silent drop
                     would skew the greedy order).
    ``lam``        — relevance/diversity trade-off, a multiple of 1/16 in
                     [0, 1] (keeps the objective integer-exact). λ=1 is
                     pure relevance order; λ=0 maximizes dissimilarity
                     after the top-relevance seed pick.
    """
    if not (0.0 <= lam <= 1.0):
        raise ValueError(f"lam must be in [0, 1], got {lam}")
    p16 = round(lam * 16)
    if abs(lam * 16 - p16) > 1e-12:
        raise ValueError(
            f"lam must be a multiple of 1/16 for integer-exact scoring, "
            f"got {lam}"
        )
    if k <= 0:
        raise ValueError("k must be positive")
    p16 = int(p16)
    cand = results.select(
        F.col(qid_col).alias("qid"),
        F.col(id_col).alias("vec_id"),
        F.round(F.col(rel_col) * F.lit(1e6)).cast("long").alias("rel_i"),
    )
    joined = cand.join(
        embeddings.select(
            F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_emb")
        ),
        "vec_id",
        "left",
    )
    qid_type = results.schema[qid_col].dataType.simpleString()
    id_type = results.schema[id_col].dataType.simpleString()
    out_schema = f"qid {qid_type}, vec_id {id_type}, rank int"

    def _greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf["_emb"].isna().any():
            missing = pdf.loc[pdf["_emb"].isna(), "vec_id"].tolist()[:5]
            raise ValueError(
                f"candidates missing embeddings (first few: {missing})"
            )
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        E = np.stack(pdf["_emb"].to_numpy()).astype(np.float64)
        n = np.linalg.norm(E, axis=1)
        n[n == 0.0] = 1.0
        # dot / (|a|·|b|) mirrors DuckDB list_cosine_similarity's shape
        S = (E @ E.T) / np.outer(n, n)
        sim_i = _away(S * 1e6).astype(np.int64)
        rel_i = pdf["rel_i"].to_numpy(np.int64)
        ids = pdf["vec_id"].to_numpy()
        m = len(pdf)
        chosen: list[int] = []
        remaining = list(range(m))
        # seed: max relevance, id-ascending ties (rows pre-sorted by id)
        seed = int(np.argmax(rel_i))
        chosen.append(seed)
        remaining.remove(seed)
        while remaining and len(chosen) < k:
            rem = np.array(remaining)
            ms = sim_i[np.ix_(rem, chosen)].max(axis=1)
            mmr16 = p16 * rel_i[rem] - (16 - p16) * ms
            best = int(rem[int(np.argmax(mmr16))])
            chosen.append(best)
            remaining.remove(best)
        return pd.DataFrame(
            {
                "qid": pdf["qid"].iloc[0],
                "vec_id": ids[chosen],
                "rank": np.arange(1, len(chosen) + 1, dtype=np.int32),
            }
        )

    return joined.groupBy("qid").applyInPandas(_greedy, out_schema)
