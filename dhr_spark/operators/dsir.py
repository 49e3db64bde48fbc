"""DSIR — Data Selection with Importance Resampling (Xie et al.,
NeurIPS 2023) over hashed n-gram features.

The missing step between this repo's quality FILTERS (curation.py,
textstats.quality_scores) and its mixture SAMPLERS (temperature/mixture/
stratified): select raw pretraining documents whose n-gram distribution
matches a small TARGET corpus (e.g. curated books/wiki), by importance
weighting under two bag-of-hashed-ngram models and Gumbel-top-k
resampling. This is the published recipe behind "data selection for
language models via importance resampling":

    features(d)  = counts over hashed unigrams + bigrams (B buckets)
    log w(d)     = sum_b  cnt_b(d) * [ln p_target(b) - ln p_raw(b)]
    resample     = top-k of  log w(d) + Gumbel_d   (without replacement,
                   inclusion probability proportional to w(d))

Determinism/parity contract (the house rules of textstats.py/boost.py):

* the feature hash is the portable 60-bit md5 hash (tokhash60), so any
  engine with md5 reproduces buckets bit-for-bit;
* bucket log-ratios are INTEGER MICROS: one libm expression rounded once
  to 1e-6 (``round(x * 1e6)``), so the per-document sum is exact integer
  arithmetic — order-independent across partitions, engines, retries;
* the Gumbel noise is hash-derived (seeded, per doc_id): u = (h%1e6 +
  0.5)/1e6, g = -ln(-ln(u)) — no RNG state, replayable in SQL. The
  deterministic u grid bounds g to about [-2.7, 14.6], so a log-weight
  margin above ~17.3 nats guarantees selection (pinned in tests).

Smoothing is Lidstone add-1/2 per bucket: p(b) = (cnt_b + 0.5) /
(total + 0.5·B) — buckets unseen in either model stay finite, and the
+0.5 keeps every ratio well-defined without a vocabulary pass.

Scale shape (100 TB raw pool): feature extraction is ONE (id, bucket)
aggregation — the same shuffle class as every TF operator here; the two
bucket models are B-row aggregates (B defaults to 10^4 — driver-trivial);
the log-ratio table broadcasts into the feature frame; resampling is a
global top-k (TakeOrdered — no full sort materialization). The target
corpus is small by definition of the method; the raw pool never moves
except through its (id, bucket) features.

Reference anchor: the reference repo selects training data by dense/
lexical retrieval scores (tevatron msmarco pipelines); DSIR is the
corpus-level analogue the brief's LLM-pipeline family asks for.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dhr_spark.operators.textstats import tokhash60, with_simple_tokens

DSIR_BUCKETS = 10_000


def _ngram_col(toks: Column) -> Column:
    """array<string> of unigrams + space-joined bigrams — pure column math
    (codegen), no UDF. Bigrams via zip_with over the two shifted slices."""
    n = F.size(toks)
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(toks, bigrams)


def hashed_ngram_counts(
    docs: DataFrame,
    id_col: str = "doc_id",
    buckets: int = DSIR_BUCKETS,
    text_col: str = "text",
) -> DataFrame:
    """(id, bucket, cnt): the hashed unigram+bigram bag of each document —
    DSIR's feature extractor. One explode + one (id, bucket) aggregation;
    empty docs yield no rows (P6 empty-text convention)."""
    if buckets < 2:
        raise ValueError(f"buckets must be >= 2, got {buckets}")
    toks = with_simple_tokens(docs.select(id_col, F.col(text_col).alias("text")))
    grams = toks.select(
        id_col, F.explode(_ngram_col(F.col("tokens"))).alias("g")
    )
    return (
        grams.select(id_col, (tokhash60(F.col("g")) % buckets).alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def hashed_ngram_model(feats: DataFrame) -> DataFrame:
    """(bucket, cnt): fold per-document features into a bucket unigram
    model — B rows, mergeable (it is a plain SUM, so models of corpus
    slices add)."""
    return feats.groupBy("bucket").agg(F.sum("cnt").alias("cnt"))


def _log_ratio_micros(
    target_model: DataFrame,
    raw_model: DataFrame,
    buckets: int,
) -> tuple[DataFrame, int]:
    """(bucket, lrm) — integer-micros Lidstone log-ratio table (one
    full-outer join of two B-row frames), plus the constant lrm of a
    bucket NEITHER model saw (both sides take the 0.5 floor) — the
    coalesce default for features outside both models' support."""
    import math

    # B-row frames referenced twice each (total aggregate + the join):
    # materialize once so their corpus-scan lineages don't re-run
    target_model = target_model.localCheckpoint()
    raw_model = raw_model.localCheckpoint()
    t_total = int(
        target_model.agg(F.coalesce(F.sum("cnt"), F.lit(0))).collect()[0][0]
    )
    r_total = int(
        raw_model.agg(F.coalesce(F.sum("cnt"), F.lit(0))).collect()[0][0]
    )
    if t_total == 0:
        raise ValueError("empty target corpus: no n-gram features")
    if r_total == 0:
        raise ValueError("empty raw corpus: no n-gram features")
    t = target_model.select("bucket", F.col("cnt").alias("tc"))
    r = raw_model.select("bucket", F.col("cnt").alias("rc"))
    dt, dr = float(t_total) + 0.5 * buckets, float(r_total) + 0.5 * buckets
    den_t, den_r = F.lit(dt), F.lit(dr)
    lr = (
        t.join(r, "bucket", "full_outer")
        .select(
            "bucket",
            F.round(
                (
                    F.log((F.coalesce(F.col("tc"), F.lit(0)) + 0.5) / den_t)
                    - F.log((F.coalesce(F.col("rc"), F.lit(0)) + 0.5) / den_r)
                )
                * 1e6
            )
            .cast("long")
            .alias("lrm"),
        )
    )
    unseen = int(round((math.log(0.5 / dt) - math.log(0.5 / dr)) * 1e6))
    return lr, unseen


def dsir_log_weights(
    raw_feats: DataFrame,
    target_model: DataFrame,
    raw_model: DataFrame | None = None,
    buckets: int = DSIR_BUCKETS,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_feats, logw): per-document log importance weight under the
    hashed n-gram models (natural log; logw carried as exact integer
    micros internally, emitted as the one IEEE division lwm/1e6).

    ``raw_model`` defaults to the model of ``raw_feats`` itself — the
    standard DSIR setup where the raw pool is its own background. Buckets
    a document hits that NEITHER model saw still score (left join +
    the never-seen Lidstone constant — an explicit sample-estimated
    ``raw_model`` need not cover the pool's buckets); feature-less
    documents (empty text) emit no row.

    ``raw_feats`` feeds the default background model AND the weights join
    — two passes over the corpus-scale lineage, and that is DELIBERATE:
    checkpointing the feature relation instead was measured to pin ~150M
    rows of executor storage at 986k turns and starve the hash
    aggregation sharing the unified pool (AGGREGATE_OUT_OF_MEMORY).
    Recomputing a tokenize+hash pass is CPU that scales with the cluster;
    a pinned corpus-sized cache is a memory ceiling that does not. Only
    the B-row models are checkpointed (in _log_ratio_micros)."""
    if raw_model is None:
        raw_model = hashed_ngram_model(raw_feats)
    lr, unseen = _log_ratio_micros(target_model, raw_model, buckets)
    return (
        raw_feats.join(F.broadcast(lr), "bucket", "left")
        .withColumn("lrm", F.coalesce(F.col("lrm"), F.lit(unseen)))
        .groupBy(id_col)
        .agg(
            F.sum("cnt").cast("long").alias("n_feats"),
            F.sum(F.col("cnt") * F.col("lrm")).cast("long").alias("_lwm"),
        )
        .select(
            id_col,
            "n_feats",
            (F.col("_lwm") / F.lit(1e6)).alias("logw"),
        )
    )


def gumbel_key_col(id_col: Column, logw: Column, seed: int) -> Column:
    """logw + hash-Gumbel(seed, id): the resampling key. round-6 of one
    addition over engine-identical inputs (integer-micros logw, libm chain
    on an exact (h%1e6 + 0.5)/1e6 uniform)."""
    u = (
        tokhash60(F.concat(F.lit(f"{seed}:"), id_col.cast("string")))
        % 1_000_000
        + F.lit(0.5)
    ) / F.lit(1e6)
    return F.round(logw + -F.log(-F.log(u)), 6)


def dsir_resample(
    raw_docs: DataFrame,
    target_docs: DataFrame,
    k: int,
    buckets: int = DSIR_BUCKETS,
    seed: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(rank, id, logw, key): the k raw documents selected by DSIR —
    Gumbel-top-k over log importance weights, i.e. a without-replacement
    sample with inclusion probability proportional to the importance
    weight. Deterministic under (corpus, buckets, seed); rank is dense
    1..min(k, candidates), ties broken id ASC at the round-6 key."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    raw_feats = hashed_ngram_counts(
        raw_docs, id_col=id_col, buckets=buckets, text_col=text_col
    )
    target_model = hashed_ngram_model(
        hashed_ngram_counts(
            target_docs, id_col=id_col, buckets=buckets, text_col=text_col
        )
    )
    w = dsir_log_weights(
        raw_feats, target_model, buckets=buckets, id_col=id_col
    )
    keyed = w.select(
        id_col,
        "logw",
        gumbel_key_col(F.col(id_col), F.col("logw"), seed).alias("key"),
    )
    # global top-k: orderBy+limit plans as TakeOrdered (no full sort
    # materialization); the re-rank window runs over k rows only
    from pyspark.sql import Window

    top = keyed.orderBy(F.col("key").desc(), F.col(id_col).asc()).limit(k)
    wr = Window.orderBy(F.col("key").desc(), F.col(id_col).asc())
    return top.select(
        F.row_number().over(wr).cast("int").alias("rank"),
        id_col,
        F.round("logw", 6).alias("logw"),
        "key",
    )
