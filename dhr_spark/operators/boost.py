"""FunctionScoreQuery: relevance score x a per-document signal factor.

Lucene's ``FunctionScoreQuery`` (and the ``FeatureField`` saturation
function it typically wraps) folds a document-level prior — popularity,
recency, length — into the relevance ranking by multiplying each hit's
score by a factor computed from a stored per-doc value. Elasticsearch
exposes the same thing as ``function_score`` / ``rank_feature``. The
reference's Lucene backend (Pyserini ``SimpleSearcher``,
/root/reference/densify/output_vector.py:1) ships these query types with
every index; this module is their DataFrame re-expression, plus the
engine extension every transcript-search deployment wants: recency
boosting over agent conversations.

Factor family: the saturation prior ``sat(v) = v / (v + scale)`` —
exactly Lucene ``FeatureField.newSaturationQuery``'s ``S / (S + pivot)``
shape. Unlike log/exp priors (libm implementations differ in the last
ulp across engines), saturation is ONE IEEE division of exact inputs, so
Spark, DuckDB and the index kernel agree bit-for-bit.

Determinism contract (the repo's integer-micros pattern): the relevance
score is first pinned to 6 decimals (the engine-wide ranking precision,
operators/topk.SCORE_DECIMALS), lifted to exact integer micros, scaled by
the integer signal value, and divided ONCE:

    boosted = round6(score) * 1e6 * v   /   (v + scale)
              `---- exact int64 ----'      one IEEE division

No final rounding — the emitted double is fully determined by
(round6(score), v, scale), so fast path == slow path == oracle without
midpoint hazards (BASELINE.md sf0.1 sweep: round-of-float-composite
midpoints are the one cross-engine split this repo has seen).

Plan shape (corpus slow path): standard BM25 scored set (broadcast query
x postings, operators/topk.score_all) -> join the (docid, v) signal
column -> codegen'd multiply/divide -> per-qid rank window. The signal
join happens AFTER the (qid, docid) aggregation, so it touches |hits|
rows, not |postings|; at 100 TB the signal rides the doc_map (already
docid-partitioned in the index layout) and AQE broadcasts whichever side
is small. The index-backed twin (operators/wand.Searcher.search_boosted)
adds Elasticsearch ``rescore``-window semantics for bounded work at
scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dhr_spark.operators.topk import SCORE_DECIMALS, score_all


def saturation_boost_col(score_col, signal_col, scale: float):
    """Boosted-score expression: ``round6(score)·1e6·v / (v + scale)``.

    ``score_col`` is a relevance score already comparable at 6 decimals;
    ``signal_col`` a non-negative numeric doc signal. The 1e6 lift keeps
    the integer product exact (score < ~9e3 and v < ~1e9 stay well inside
    int64); the single trailing division is exactly rounded IEEE, hence
    engine-portable. The 1e6 factor is deliberately NOT divided back out:
    ranking and hashes only need a strictly monotone transform."""
    if float(scale) <= 0:
        # Lucene FeatureField pivots are > 0; scale=0 would make v=0 docs
        # score 0/0 = NaN, which Spark's descending sort ranks FIRST
        raise ValueError(f"scale must be positive, got {scale}")
    v = signal_col.cast("long")
    return (_score_micros(score_col) * v).cast("double") / (
        v.cast("double") + F.lit(float(scale))
    )


def recency_boost_col(score_col, ts_col, now: int, half_life_s: int):
    """Boosted-score expression with a RECENCY half-life prior:

        boosted = round6(score)·1e6·h / (h + age_s),
        age_s   = max(now − ts, 0)

    At ``age = half_life_s`` the factor is exactly 1/2 — a true half-life
    — and documents from the future (clock skew, in-flight appends) clamp
    to factor 1 like Elasticsearch decay functions do. Same exactness
    argument as ``saturation_boost_col``: integer numerator, integer
    denominator terms, ONE IEEE division."""
    h = int(half_life_s)
    if h <= 0:
        raise ValueError(f"half_life_s must be positive, got {half_life_s}")
    age = F.greatest(
        F.lit(0).cast("long"),
        F.lit(int(now)).cast("long") - ts_col.cast("long"),
    )
    return (_score_micros(score_col) * F.lit(h).cast("long")).cast(
        "double"
    ) / (age.cast("double") + F.lit(float(h)))


def _score_micros(score_col):
    """Relevance pinned to 6 decimals and lifted to exact int64 micros."""
    return F.round(
        F.round(score_col, SCORE_DECIMALS) * F.lit(1e6), 0
    ).cast("long")


def _ranked(boosted: DataFrame, k: int) -> DataFrame:
    """Shared FunctionScore ranking contract: raw-score DESC, docid ASC,
    dense int ranks cut at k."""
    w = Window.partitionBy("qid").orderBy(
        F.col("score").desc(), F.col("docid").asc()
    )
    return (
        boosted.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("qid", "docid", "rank", "score")
    )


def boosted_rank(scored: DataFrame, signal: DataFrame, *, scale: float,
                 signal_col: str, k: int) -> DataFrame:
    """(qid, docid, rank, score) from a (qid, docid, score) relevance set
    and a (docid, <signal_col>) doc-signal table. Docs missing a signal
    row drop out, and so do NEGATIVE signals (Lucene FeatureField
    semantics: features must be non-negative; a negative value would
    silently invert the ranking below zero, so it is treated as "no
    feature, no match" rather than scored)."""
    return _ranked(
        scored.join(signal.filter(F.col(signal_col) >= 0), "docid")
        .withColumn(
            "score",
            saturation_boost_col(F.col("score"), F.col(signal_col), scale),
        ),
        k,
    )


def recency_rank(scored: DataFrame, signal: DataFrame, *, ts_col: str,
                 now: int, half_life_s: int, k: int) -> DataFrame:
    """(qid, docid, rank, score): relevance set re-ranked by the recency
    half-life prior over a (docid, <ts_col>) table of epoch seconds.
    Negative timestamps are legitimate (pre-1970 epochs) — unlike
    boosted_rank's signal there is no sign filter; the age clamp alone
    bounds the factor to (0, 1]."""
    return _ranked(
        scored.join(signal, "docid").withColumn(
            "score",
            recency_boost_col(F.col("score"), F.col(ts_col), now, half_life_s),
        ),
        k,
    )


def boosted_topk(
    qtfs: DataFrame,
    postings: DataFrame,
    signal: DataFrame,
    k: int = 1000,
    scale: float = 250.0,
    on: str = "term_id",
    signal_col: str = "signal",
) -> DataFrame:
    """Corpus slow path: FunctionScore top-k = BM25 scored set x saturation
    prior, exact over ALL matching docs (no window approximation — this is
    the oracle plan the index-backed rescore path is verified against)."""
    return boosted_rank(
        score_all(qtfs, postings, on=on),
        signal,
        scale=scale,
        signal_col=signal_col,
        k=k,
    )


def recency_topk(
    qtfs: DataFrame,
    postings: DataFrame,
    timestamps: DataFrame,
    now: int,
    half_life_s: int = 7 * 86400,
    k: int = 1000,
    on: str = "term_id",
    ts_col: str = "ts_s",
) -> DataFrame:
    """Corpus slow path: recency-boosted top-k — the transcript-search
    staple ("prefer recent conversations"). ``timestamps`` is a
    (docid, <ts_col>) table of epoch seconds; semantics per
    recency_boost_col (exact over all matching docs)."""
    return recency_rank(
        score_all(qtfs, postings, on=on),
        timestamps,
        ts_col=ts_col,
        now=now,
        half_life_s=half_life_s,
        k=k,
    )


def demoted_rank(
    scored: DataFrame,
    neg_hits: DataFrame,
    *,
    negative_boost: float,
    k: int,
    neg_unique: bool = False,
) -> DataFrame:
    """Lucene BoostingQuery / Elasticsearch ``boosting`` query: documents
    in ``neg_hits`` (qid, docid) STILL MATCH but their relevance is scaled
    by ``negative_boost``; documents matching only the negative side never
    enter (``scored`` defines the match set). ``negative_boost`` must be a
    multiple of 1/16 in [0, 1] (mmr_rerank's integer-exact contract): the
    demotion is then round6(score)·1e6·(16·nb) — exact int64 — divided
    ONCE by 16e6, so fast path == slow path == oracle bit-for-bit.
    nb = 0 is legal (ES allows it): demoted docs sink to score 0 and rank
    by docid among themselves.

    ``neg_unique=True`` skips the defensive dedup of ``neg_hits`` — a
    common negative term's match set is corpus-scale (measured ~30M rows
    for 50 queries x 'the' at 986k turns), and when the producer already
    emits unique (qid, docid) rows (the presence kernel: one row per doc
    per qid, a doc lives in exactly one chunk) the distinct is a pure
    extra shuffle of that whole set."""
    nb16 = round(float(negative_boost) * 16)
    if not (0.0 <= negative_boost <= 1.0) or abs(
        nb16 - float(negative_boost) * 16
    ) > 1e-9:
        raise ValueError(
            "negative_boost must be a multiple of 1/16 in [0, 1] "
            f"(integer-exact demotion), got {negative_boost}"
        )
    neg = neg_hits.select("qid", "docid")
    if not neg_unique:
        neg = neg.distinct()
    neg = neg.withColumn("_neg", F.lit(1))
    factor = F.when(F.col("_neg").isNotNull(), F.lit(nb16)).otherwise(
        F.lit(16)
    ).cast("long")
    return _ranked(
        scored.join(neg, ["qid", "docid"], "left")
        .withColumn(
            "score",
            (_score_micros(F.col("score")) * factor).cast("double")
            / F.lit(16e6),
        )
        .drop("_neg"),
        k,
    )


def boosting_topk(
    qtfs: DataFrame,
    postings: DataFrame,
    neg_hits: DataFrame,
    k: int = 1000,
    negative_boost: float = 0.5,
    on: str = "term_id",
) -> DataFrame:
    """Corpus slow path: boosting-query top-k — BM25 scored set with the
    (qid, docid) negative match set demoted by ``negative_boost``. Exact
    over all matching docs (the oracle plan the index-backed
    Searcher.search_boosting is verified against)."""
    return demoted_rank(
        score_all(qtfs, postings, on=on),
        neg_hits,
        negative_boost=negative_boost,
        k=k,
    )


def random_hits_topk(hits: DataFrame, seed: int, k: int = 10) -> DataFrame:
    """(qid, docid, rank, score): Elasticsearch ``function_score`` /
    ``random_score`` with a seed — a DETERMINISTIC uniform draw per
    (seed, docid), ranked descending, top-``k`` per query. The canonical
    training-data use: "k uniformly random documents matching each query",
    reproducible across runs and engines.

    The draw is the portable 60-bit md5 hash (textstats.tokhash60) of
    ``"{seed}:{docid}"`` — ORDERING uses the integer hash (bit-exact in
    any engine), and the reported score is the single IEEE division
    hash / 2^60 in [0, 1). One per-qid window over the hit set; no
    corpus access, no RNG state."""
    from dhr_spark.operators.textstats import tokhash60

    h = tokhash60(
        F.concat(F.lit(f"{int(seed)}:"), F.col("docid").cast("string"))
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("_h").desc(), F.col("docid").asc()
    )
    return (
        hits.select("qid", "docid", h.alias("_h"))
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= int(k))
        .select(
            "qid",
            "docid",
            "rank",
            (F.col("_h").cast("double") / F.lit(float(2 ** 60)))
            .alias("score"),
        )
    )
