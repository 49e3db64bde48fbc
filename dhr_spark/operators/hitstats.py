"""Statistical aggregations over result sets: extended_stats + percentiles.

Elasticsearch's ``stats``/``extended_stats`` and ``percentiles``
aggregations, computed over the documents MATCHING each query — the result
analytics companions to ``facet_counts``/``result_facet_ranges``
(operators/boolquery.py, Searcher.result_facets) and ``significant_terms``.
The reference emits ranked ids only (/root/reference/retrieval/
gip_retrieval.py writes TREC run lines), so like the facet family this
extends the query surface sideways rather than mirroring a reference op.

Inputs are the generic shapes the rest of the repo already produces —
``hits`` = (qid, docid) from any matcher (Searcher._matched_docs, a boolean
corpus match, a top-k), ``values`` = (docid, <field>) from docvalues or a
corpus projection — so the same operator backs both the index path
(Searcher.result_stats / result_percentiles) and the corpus-scan oracle
twin.

Determinism: the value column is integer-contracted. Moments are carried
as exact integer sums (n, sum, sum of squares); floats appear only as
  avg      = sum / n                                (one division)
  variance = (n*sum_sq - sum^2) / n^2               (one division)
  std_dev  = sqrt(variance)                         (exactly rounded)
each exactly rounded in IEEE order, so a DuckDB oracle matches bit-for-bit
(same discipline as metrics.paired_diff_test's integer-micros t).
Percentiles use the nearest-rank definition (value at row ceil(p*n/100) of
the ascending sort, docid tie-break) — pure integer selection, no
interpolation, so the hash pins exact field values.

Scale: one shuffle on qid for the moments (map-side partial agg), one
window sort per qid for percentiles — both keyed on the hit set
(|Q| * matches), never the corpus; ``values`` joins in by docid before
aggregation so non-matching docs are pruned at the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hit_stats(hits: DataFrame, values: DataFrame, field: str) -> DataFrame:
    """(qid, n, min, max, sum, avg, variance, std_dev) of ``field`` over
    each query's hit set. Population variance (divide by n), matching ES
    extended_stats."""
    joined = hits.select("qid", "docid").join(
        values.select(
            "docid", F.col(field).cast("long").alias("_v")
        ),
        "docid",
    )
    # moments ride decimal(38,0): x^2 of an epoch-seconds long already
    # overflows int64 when summed, and n*sum_sq grows two more factors
    v19 = F.col("_v").cast("decimal(19,0)")
    agg = joined.groupBy("qid").agg(
        F.count("*").cast("long").alias("n"),
        F.min("_v").alias("min"),
        F.max("_v").alias("max"),
        F.sum("_v").alias("sum"),
        F.sum(v19 * v19).alias("_sum_sq"),
    )
    s19 = F.col("sum").cast("decimal(19,0)")
    num = agg["n"].cast("decimal(19,0)") * F.col("_sum_sq") - s19 * s19
    den = agg["n"] * agg["n"]
    variance = num.cast("double") / den.cast("double")
    return agg.select(
        "qid",
        "n",
        "min",
        "max",
        "sum",
        (F.col("sum").cast("double") / F.col("n").cast("double")).alias("avg"),
        variance.alias("variance"),
        F.sqrt(variance).alias("std_dev"),
    )


def hit_percentiles(
    hits: DataFrame,
    values: DataFrame,
    field: str,
    pcts: list[int] = [25, 50, 75, 95, 99],
) -> DataFrame:
    """(qid, pct, value, n): nearest-rank percentiles of ``field`` over each
    query's hit set — value at row ceil(pct*n/100) of the ascending
    (field, docid) order. Integer selection end-to-end."""
    if not pcts or any(not 0 < p <= 100 for p in pcts):
        raise ValueError(f"pcts must be in (0, 100], got {pcts}")
    joined = hits.select("qid", "docid").join(
        values.select("docid", F.col(field).cast("long").alias("_v")),
        "docid",
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("_v").asc(), F.col("docid").asc()
    )
    ranked = joined.select(
        "qid",
        "_v",
        F.row_number().over(w).cast("long").alias("_rn"),
        F.count("*").over(Window.partitionBy("qid")).cast("long").alias("n"),
    )
    p = F.explode(
        F.array(*[F.lit(int(x)).cast("int") for x in sorted(set(pcts))])
    ).alias("pct")
    # nearest-rank: ceil(pct*n/100) in exact integer arithmetic
    target = -F.floor(-(F.col("pct").cast("long") * F.col("n")) / F.lit(100))
    return (
        ranked.select("qid", "_v", "_rn", "n", p)
        .filter(F.col("_rn") == target)
        .select("qid", "pct", F.col("_v").alias("value"), "n")
    )


def hit_correlation(
    hits: DataFrame, values: DataFrame, field_a: str, field_b: str
) -> DataFrame:
    """(qid, n, corr): Pearson correlation of two integer-contracted fields
    over each query's hit set — the correlation cell of Elasticsearch's
    ``matrix_stats`` aggregation ("do longer hits skew newer?" style result
    diagnostics).

    Same determinism discipline as hit_stats: all five moments ride exact
    decimal(38,0) integer sums; floats appear only as

      corr = (n*sab - sa*sb) / (sqrt(n*saa - sa^2) * sqrt(n*sbb - sb^2))

    — two exactly-rounded sqrts, one multiply, one division, in a fixed
    shape both engines reproduce bit-for-bit. NULL when either field has
    zero variance over the hit set or n < 2 (ES returns nothing there too).
    """
    joined = hits.select("qid", "docid").join(
        values.select(
            "docid",
            F.col(field_a).cast("long").alias("_a"),
            F.col(field_b).cast("long").alias("_b"),
        ),
        "docid",
    )
    a19 = F.col("_a").cast("decimal(19,0)")
    b19 = F.col("_b").cast("decimal(19,0)")
    agg = joined.groupBy("qid").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("_a").alias("_sa"),
        F.sum("_b").alias("_sb"),
        F.sum(a19 * b19).alias("_sab"),
        F.sum(a19 * a19).alias("_saa"),
        F.sum(b19 * b19).alias("_sbb"),
    )
    n19 = F.col("n").cast("decimal(19,0)")
    sa19 = F.col("_sa").cast("decimal(19,0)")
    sb19 = F.col("_sb").cast("decimal(19,0)")
    num = n19 * F.col("_sab") - sa19 * sb19
    var_a = n19 * F.col("_saa") - sa19 * sa19
    var_b = n19 * F.col("_sbb") - sb19 * sb19
    corr = num.cast("double") / (
        F.sqrt(var_a.cast("double")) * F.sqrt(var_b.cast("double"))
    )
    return agg.select(
        "qid",
        "n",
        F.when((F.col("n") >= 2) & (var_a > 0) & (var_b > 0), corr).alias(
            "corr"
        ),
    )


def hit_histogram(
    hits: DataFrame,
    values: DataFrame,
    field: str,
    interval: int,
    offset: int = 0,
) -> DataFrame:
    """(qid, bucket, n): Elasticsearch ``histogram`` aggregation over each
    query's hit set — fixed-width integer buckets

        bucket = floor((v − offset) / interval) · interval + offset

    emitting non-empty buckets only (ES ``min_doc_count: 1``; the
    default's empty-bucket back-fill is a rendering concern, not an
    aggregation — callers can sequence-join the gaps). ES
    ``date_histogram`` with a ``fixed_interval`` IS this aggregation on an
    epoch timestamp field: pass the interval in the field's time unit
    (e.g. 86400 on epoch seconds for daily buckets). Calendar intervals
    (months, DST-aware days) are intentionally out of scope.

    All-integer bucket arithmetic — the floor for negative values rides a
    positive-mod identity (v − pmod(v − offset, interval)), never float
    division, so a DuckDB oracle hashes bit-for-bit. One shuffle on
    (qid, bucket) with map-side combine; keyed on the hit set, never the
    corpus."""
    interval = int(interval)
    offset = int(offset)
    if interval <= 0:
        raise ValueError(f"interval must be a positive integer, got {interval}")
    if not 0 <= offset < interval:
        raise ValueError(
            f"offset must be in [0, interval), got {offset} for {interval}"
        )
    joined = hits.select("qid", "docid").join(
        values.select("docid", F.col(field).cast("long").alias("_v")),
        "docid",
    )
    bucket = F.col("_v") - F.pmod(
        F.col("_v") - F.lit(offset), F.lit(interval)
    )
    return (
        joined.select("qid", bucket.alias("bucket"))
        .groupBy("qid", "bucket")
        .agg(F.count("*").cast("long").alias("n"))
    )


def hit_composite(
    hits: DataFrame,
    values: DataFrame,
    sources: list[tuple],
    size: int,
    after: dict | None = None,
) -> DataFrame:
    """(qid, <source names...>, n): Elasticsearch ``composite`` aggregation
    over each query's hit set — paginated enumeration of multi-source
    buckets in composite-key order.

    ``sources`` is the ordered source list, each
    ``(name, "terms", field)`` or ``(name, "histogram", (field, interval[,
    offset]))`` — name is the output column, order defines the composite
    key. Buckets sort ascending by the key (terms: the field's natural
    order; histogram: the bucket's numeric lower bound — ES's ordering),
    and each call returns the first ``size`` buckets per qid STRICTLY
    AFTER ``after[qid]`` (a tuple of key values, ES's ``after_key``; qids
    without a cursor start at the beginning). Docs with a NULL source
    value are skipped (ES ``missing_bucket: false``, the default).

    Why composite exists — and why this shape survives 100 TB: a terms
    aggregation with millions of buckets cannot return in one response;
    composite pages through the bucket space with a resumable cursor.
    Here the bucket counts reduce distributed (one (qid, key) shuffle with
    map-side combine, keyed on the hit set, never the corpus); only the
    page cut is a per-qid window over the already-reduced buckets, and the
    cursor predicate prunes BEFORE ranking, so a deep page never pays for
    the pages before it beyond the reduced bucket relation itself.
    """
    if not sources:
        raise ValueError("composite needs at least one source")
    names = [s[0] for s in sources]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate source names: {names}")
    if size < 1:
        raise ValueError(f"size must be >= 1, got {size}")
    if after is not None and any(
        len(t) != len(sources) for t in after.values()
    ):
        raise ValueError(
            f"after keys must carry {len(sources)} values (one per source)"
        )
    cols = []
    for src in sources:
        name, kind = src[0], src[1]
        if kind == "terms":
            cols.append(F.col(src[2]).alias(name))
        elif kind == "histogram":
            field, interval = src[2][0], int(src[2][1])
            offset = int(src[2][2]) if len(src[2]) > 2 else 0
            if interval <= 0:
                raise ValueError(
                    f"interval must be a positive integer, got {interval}"
                )
            if not 0 <= offset < interval:
                raise ValueError(
                    f"offset must be in [0, interval), got {offset}"
                )
            v = F.col(field).cast("long")
            cols.append(
                (v - F.pmod(v - F.lit(offset), F.lit(interval))).alias(name)
            )
        else:
            raise ValueError(f"unknown composite source kind {kind!r}")
    joined = hits.select("qid", "docid").join(values, "docid")
    keyed = joined.select("qid", *cols).na.drop(subset=names)
    buckets = keyed.groupBy("qid", *names).agg(
        F.count("*").cast("long").alias("n")
    )
    if after:
        spark = hits.sparkSession
        adf = spark.createDataFrame(
            [(q, *t) for q, t in after.items()],
            schema=["qid"] + [f"_a{i}" for i in range(len(sources))],
        )
        buckets = buckets.join(F.broadcast(adf), "qid", "left")
        # strict lexicographic key > cursor; no cursor -> keep everything
        gt = F.lit(False)
        eq = F.lit(True)
        for i, nm in enumerate(names):
            a = F.col(f"_a{i}")
            gt = gt | (eq & (F.col(nm) > a))
            eq = eq & (F.col(nm) == a)
        buckets = buckets.filter(F.col("_a0").isNull() | gt).drop(
            *[f"_a{i}" for i in range(len(sources))]
        )
    w = Window.partitionBy("qid").orderBy(*[F.col(n).asc() for n in names])
    return (
        buckets.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= size)
        .drop("_rn")
    )


def histogram_pipeline(
    buckets: DataFrame,
    window: int = 3,
) -> DataFrame:
    """(qid, bucket, n, cum_n, derivative, moving_avg): Elasticsearch
    PIPELINE aggregations over a per-query histogram — ``cumulative_sum``
    (running doc count in bucket order), ``derivative`` (delta vs the
    previous non-empty bucket; NULL for each qid's first bucket, as ES
    emits no derivative there), and ``moving_avg`` over the trailing
    ``window`` non-empty buckets (simple model; fewer buckets than the
    window average what exists — ES ``minimize: false`` behavior).

    Input is any (qid, bucket, n) relation (hit_histogram /
    Searcher.result_histogram output). Arithmetic is exact-integer until
    the single moving-average division (sum::double / count::double), so
    a DuckDB oracle matches bit-for-bit. One window sort per qid over the
    already-reduced bucket relation — bucket-count-sized, never hit- or
    corpus-sized, which is what makes pipeline aggs free at any corpus
    scale."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    w = Window.partitionBy("qid").orderBy(F.col("bucket").asc())
    trail = w.rowsBetween(-(window - 1), 0)
    return buckets.select(
        "qid",
        "bucket",
        "n",
        F.sum("n").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).cast("long").alias("cum_n"),
        (F.col("n") - F.lag("n").over(w)).cast("long").alias("derivative"),
        (
            F.sum("n").over(trail).cast("double")
            / F.count("n").over(trail).cast("double")
        ).alias("moving_avg"),
    )


def hit_adjacency(hits: DataFrame) -> DataFrame:
    """(qid_a, qid_b, n): Elasticsearch ``adjacency_matrix`` aggregation —
    document counts of every pairwise INTERSECTION of the queries' hit
    sets, plus the diagonal (qid_a == qid_b, the plain hit count). Pairs
    emit once in (qid_a < qid_b) order; empty intersections are absent
    (ES omits zero buckets).

    One self-equi-join on docid + one (qid_a, qid_b) count with map-side
    combine — keyed on the hit set, never the corpus, and the join is
    docid-co-partitioned so the matrix costs one exchange. ES caps the
    filter count (~100) for the same quadratic-output reason; callers
    pass the query set they can afford to square."""
    a = hits.select(F.col("qid").alias("qid_a"), "docid")
    b = hits.select(F.col("qid").alias("qid_b"), "docid")
    return (
        a.join(b, "docid")
        .filter(F.col("qid_a") <= F.col("qid_b"))
        .groupBy("qid_a", "qid_b")
        .agg(F.count("*").cast("long").alias("n"))
    )
