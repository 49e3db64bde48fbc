"""IVF (inverted-file) ANN over embedding columns — the cluster-partitioned
scale path, sibling of the LSH path in operators.similarity.

The reference's CPU index is faiss PQ/IVF-family
(/root/reference/retrieval/quantize_index.py:29-35, utils/util.py:79-108);
this is its coarse-quantizer half as declarative DataFrame ops:

  1. ``ivf_centroids``  — spherical k-means with DETERMINISTIC seeding (the
     k smallest vec_ids) and a fixed iteration count, all row-form column
     math (posexplode -> join -> agg), every intermediate rounded to 6
     decimals so any engine reproduces the identical centroids.
  2. ``ivf_assign``     — nearest-centroid (max dot on unit vectors) per
     corpus vector: the partition key. At scale the corpus is WRITTEN
     partitioned by ``cid`` so a probe prunes whole files.
  3. ``cosine_topk_ivf`` — queries probe their ``n_probe`` nearest
     centroids and score exact cosine ONLY inside probed cells.

Row-form (vec_id, i, x) math keeps the whole pipeline SQL-expressible —
the DuckDB oracle replays k-means bit-for-bit, so the approximate path is
value-hash-verified like the LSH path, not just recall-bounded. A
production kernel would swap the explode-join dot products for a Pandas-UDF
matmul per partition; the plan shape (centroid broadcast, corpus never
reshuffled after assignment) is the part that matters at 100 TB.

Recall contract: a vector's own cell is always its first probe, so
self-neighbors are exact; cross-cell neighbors are found iff a probed cell
holds them (raise n_probe to trade work for recall, same knob as faiss
nprobe).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dhr_spark.operators.similarity import _unit

IVF_K = 8
IVF_ITERS = 2
IVF_PROBE = 2


def _unit_rows(embs: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(vec_id, i, x): unit-normalized vectors in row form."""
    return embs.select(
        F.col(id_col).alias("vec_id"),
        F.posexplode(_unit(F.col(vec_col))).alias("i", "x"),
    )


IVF_TRAIN_SAMPLE = 65_536


def _np_units(vecs):
    import numpy as np

    norms = np.sqrt((vecs * vecs).sum(axis=1))
    return vecs / norms[:, None]


def ivf_centroids(
    embs: DataFrame,
    k: int = IVF_K,
    iters: int = IVF_ITERS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_sample: int = IVF_TRAIN_SAMPLE,
) -> DataFrame:
    """(cid, i, c): k spherical-k-means centroids in row form.

    Seeds = the k smallest ids' unit vectors; each iteration assigns every
    vector to its max-dot centroid (ties: cid ASC) and re-normalizes the
    member mean. All values rounded to 6 decimals per step — the
    determinism contract that makes the DuckDB twin bit-identical.

    Training is DRIVER-SIDE numpy over the ``train_sample`` lowest ids
    (faiss practice: train the coarse quantizer on a bounded sample, assign
    everything) — the same rounded algebra, without |corpus|·k·iters join
    rows; the row-form result frame is unchanged."""
    import numpy as np

    rows = (
        embs.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))
        .orderBy("vec_id")
        .limit(train_sample)
        .collect()
    )
    ids = np.array([int(r["vec_id"]) for r in rows], dtype=np.int64)
    U = _np_units(np.array([r["v"] for r in rows], dtype=np.float64))
    seed_rows = sorted(np.flatnonzero(ids < k), key=lambda r: ids[r])
    cents = [(int(ids[r]), np.round(U[r], 6)) for r in seed_rows]
    for _ in range(iters):
        C = np.stack([c for _, c in cents])
        dots = (U @ C.T).round(6)
        assign = dots.argmax(axis=1)  # first max = smallest cid (sorted)
        new = []
        for j, (cid, _) in enumerate(cents):
            members = U[assign == j]
            if not len(members):
                continue
            m = np.round(members.mean(axis=0), 6)
            nrm = np.round(np.sqrt((m * m).sum()), 6)
            if nrm > 0:
                new.append((cid, np.round(m / nrm, 6)))
        cents = new
    out = [
        (int(cid), i, float(c[i])) for cid, c in cents for i in range(len(c))
    ]
    return embs.sparkSession.createDataFrame(out, "cid long, i int, c double")


def _assign(comp: DataFrame, cent: DataFrame, rank_to: int = 1) -> DataFrame:
    """(vec_id, cid [, probe_rank]): nearest centroid(s) by rounded dot."""
    dots = (
        comp.join(F.broadcast(cent), "i")
        .groupBy("vec_id", "cid")
        .agg(F.round(F.sum(F.col("x") * F.col("c")), 6).alias("dot"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("dot").desc(), F.col("cid").asc())
    ranked = dots.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= rank_to
    )
    if rank_to == 1:
        return ranked.select("vec_id", "cid")
    return ranked.select("vec_id", "cid", F.col("_rn").alias("probe_rank"))


def ivf_assign(
    embs: DataFrame,
    cent: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cid): the corpus partition key — write the corpus
    partitioned by cid so probes prune whole partitions at scale.

    Vectorized: the (tiny) centroid table ships inside an Arrow-batched
    pandas UDF; assignment is one numpy matmul per batch — no join, no
    shuffle, the corpus is scanned once. Same rounded dots / cid-ASC ties
    as the row-form `_assign` the DuckDB oracle replays."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    by_cid: dict[int, dict[int, float]] = {}
    for r in cent.collect():
        by_cid.setdefault(int(r["cid"]), {})[int(r["i"])] = float(r["c"])
    cids = np.array(sorted(by_cid), dtype=np.int64)
    dim = max(max(v) for v in by_cid.values()) + 1
    C = np.zeros((len(cids), dim))
    for j, cid in enumerate(cids):
        for i, c in by_cid[int(cid)].items():
            C[j, i] = c

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            U = _np_units(np.array(pdf["v"].tolist(), dtype=np.float64))
            dots = (U @ C.T).round(6)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "cid": cids[dots.argmax(axis=1)],
                }
            )

    src = embs.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))
    return src.mapInPandas(assign, "vec_id long, cid long")


def cosine_topk_ivf(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_centroids: int = IVF_K,
    iters: int = IVF_ITERS,
    n_probe: int = IVF_PROBE,
    qid_col: str = "qid",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(qid, vec_id, rank, cosine): IVF-probed approximate cosine top-k.

    Exact cosine inside probed cells (precision exact, recall = probe
    coverage). The cell join is an equi-join on cid — broadcastable query
    side, corpus side untouched beyond its one assignment pass."""
    cent = ivf_centroids(corpus, n_centroids, iters, id_col, vec_col)
    cells = ivf_assign(corpus, cent, id_col, vec_col)
    qprobes = _assign(
        _unit_rows(queries, qid_col, vec_col), cent, rank_to=n_probe
    ).select(F.col("vec_id").alias("qid"), "cid")
    qu = queries.select(
        F.col(qid_col).alias("qid"), _unit(F.col(vec_col)).alias("uq")
    )
    cu = corpus.select(F.col(id_col), _unit(F.col(vec_col)).alias("uc"))
    cand = (
        F.broadcast(qprobes)
        .join(cells, "cid")
        .select("qid", "vec_id")
        .distinct()
    )
    dot = F.aggregate(
        F.zip_with(F.col("uq"), F.col("uc"), lambda x, y: x * y),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    scored = (
        cand.join(qu, "qid")
        .join(cu, id_col)
        .select("qid", F.col(id_col), F.round(dot, 6).alias("cosine"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", id_col, "rank", "cosine")
    )
