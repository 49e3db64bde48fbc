"""Mergeable sketches: HyperLogLog cardinality and Count-Min frequency.

The training-data curation loop needs corpus-scale *approximate* statistics
long before it needs exact ones: "how many distinct shingles / terms /
conv_ids are in this 10^12-row table" (dedup sizing, vocabulary budgeting)
and "what is roughly the frequency of this term" (head-term skew detection
for the salting decisions operators/termfreq.py makes). Exact answers need a
full-width shuffle keyed on the value (`count_distinct` / `groupBy(term)`);
a sketch needs a constant-size state that partial aggregation folds
map-side, so the shuffle moves O(tasks * sketch_size) rows no matter how
many input rows there are. That is the whole 100-TB story of this module:
every sketch here is a groupBy whose key domain is FIXED (m registers,
depth*width counters), so Spark's map-side combine bounds the shuffle.

The reference counts exact unique ids in driver memory (e.g. the dict
accumulation in /root/reference/retrieval/gip_retrieval.py and the eval
set handling in /root/reference/custom_metrics.py) — viable at single-node
corpus sizes, not at 10^12 rows. These sketches are the distributed
replacement.

Determinism / oracle discipline (same rules as operators/similarity.py's
md5-derived hyperplanes): all hash bits come from ``tokhash60`` (60 bits of
md5), so DuckDB regenerates the exact registers/counters from the same
parquet and the estimates are bit-for-bit comparable. Estimates touch
floats only through exactly-rounded IEEE ops (int->double casts, one
multiply chain, divisions) in a fixed order — no ``ln``/``exp`` anywhere on
the oracle-checked path (the HyperLogLog linear-counting correction, which
needs ``ln``, lives in the Python helper ``hll_corrected`` and is
pytest-only, because Java's Math.log and libm's log are not guaranteed to
round identically).

HyperLogLog (Flajolet et al. 2007):
  * ``p`` index bits -> m = 2**p registers; the next ``HLL_SUB_BITS`` = 24
    hash bits form the rank substream, so register values are in [1, 25].
  * register[j] = max rank of any value hashing to bucket j -> the register
    table is mergeable by ``groupBy(bucket).max`` (union of sketches ==
    sketch of union; tested).
  * raw estimate = alpha_m * m^2 / sum_j 2^(-M[j]). We carry the indicator
    sum as the exact INTEGER ``sum_pow = sum_j 2^(24 - M[j])`` (empty
    registers contribute 2^24), so
    raw_est = (alpha_micros*m*m as double) * 2^24 / sum_pow / 1e6.
  * standard error ~ 1.04/sqrt(m).

Count-Min (Cormode & Muthukrishnan 2005):
  * ``depth`` rows x ``width`` counters; row d hashes value v to bucket
    tokhash60(d || ':' || v) % width.
  * point estimate = min over rows of counter[d][bucket_d(v)] — always an
    OVERESTIMATE (never under), within e/width * N with prob 1 - e^-depth.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dhr_spark.operators.textstats import tokhash60

HLL_SUB_BITS = 24  # rank substream width; registers in [1, HLL_SUB_BITS+1]

# Flajolet's bias-correction constants, in integer micros so the estimate
# numerator is exact integer arithmetic until the final double chain.
_ALPHA_MICROS = {4: 673000, 5: 697000, 6: 709000}


def hll_alpha_micros(p: int) -> int:
    """alpha_m * 1e6 for m = 2**p (0.7213/(1+1.079/m) above m=64)."""
    if p in _ALPHA_MICROS:
        return _ALPHA_MICROS[p]
    m = 1 << p
    return round(0.7213 / (1.0 + 1.079 / m) * 1_000_000)


def _hll_rank(sub: Column) -> Column:
    """1-based position of the leftmost 1-bit in the 24-bit substream
    (leading zeros + 1); 25 when the substream is all zeros. String-domain
    on purpose: lpad(bin(x)) + instr is portable to any engine with the
    same two functions, where a float log2 would not be exact."""
    padded = F.lpad(F.bin(sub), HLL_SUB_BITS, "0")
    pos = F.instr(padded, "1")
    return F.when(pos == 0, F.lit(HLL_SUB_BITS + 1)).otherwise(pos)


def hll_registers(
    df: DataFrame, col: str, p: int = 6, group_cols: list[str] | None = None
) -> DataFrame:
    """(*group_cols, bucket int, register int): the HyperLogLog register
    table of the values in ``df[col]`` with m = 2**p buckets — one
    independent sketch per ``group_cols`` key (ES ``cardinality``
    sub-aggregation shape) when given.

    One md5 per row, then a fixed-key groupBy: partial aggregation folds
    each task's rows into <= m register rows map-side (per group), so the
    shuffle is O(tasks * m * |groups|) regardless of input size. Buckets
    no value hashed to are absent (treated as register 0 by the
    estimator)."""
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    g = list(group_cols or [])
    m = 1 << p
    h = tokhash60(F.col(col).cast("string"))
    sub = F.pmod(F.floor(h / F.lit(m)).cast("long"), F.lit(1 << HLL_SUB_BITS))
    return (
        df.select(
            *g,
            F.pmod(h, F.lit(m)).cast("int").alias("bucket"),
            _hll_rank(sub).cast("int").alias("rank"),
        )
        .groupBy(*g, "bucket")
        .agg(F.max("rank").alias("register"))
    )


def hll_merge(
    *register_tables: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Merge sketches built with the same ``p``: union + per-bucket max.
    This is why the sketch distributes: shard-local sketches merge into
    exactly the sketch of the whole corpus (associative max)."""
    if not register_tables:
        raise ValueError("need at least one register table")
    g = list(group_cols or [])
    out = register_tables[0]
    for t in register_tables[1:]:
        out = out.unionByName(t)
    return out.groupBy(*g, "bucket").agg(F.max("register").alias("register"))


def hll_estimate(
    registers: DataFrame, p: int, group_cols: list[str] | None = None
) -> DataFrame:
    """(*group_cols, m, used, zeros, sum_pow, raw_est) — one row per group
    (one total row without ``group_cols``) from a register table.

    ``sum_pow`` = sum over ALL m registers of 2^(24 - register) (absent
    buckets contribute 2^24) — the exact-integer carrier of the HLL
    indicator sum; ``raw_est`` is Flajolet's raw estimate reached from
    integers through one fixed chain of exactly-rounded double ops, so an
    oracle in any IEEE engine reproduces it bit-for-bit. The small-range
    linear-counting correction needs ln() and is applied by
    ``hll_corrected`` (driver-side, pytest-only)."""
    g = list(group_cols or [])
    m = 1 << p
    alpha = hll_alpha_micros(p)
    agg = registers.groupBy(*g).agg(
        F.count("*").cast("long").alias("used"),
        F.coalesce(
            F.sum(F.expr(f"shiftleft(1L, {HLL_SUB_BITS} - register)")),
            F.lit(0),
        ).cast("long").alias("present_pow"),
    )
    sum_pow = (
        F.col("present_pow")
        + (F.lit(m) - F.col("used")) * F.lit(1 << HLL_SUB_BITS)
    ).cast("long")
    return agg.select(
        *g,
        F.lit(m).cast("int").alias("m"),
        F.col("used"),
        (F.lit(m) - F.col("used")).cast("long").alias("zeros"),
        sum_pow.alias("sum_pow"),
        (
            F.lit(float(alpha * m * m))
            * F.lit(float(1 << HLL_SUB_BITS))
            / sum_pow.cast("double")
            / F.lit(1_000_000.0)
        ).alias("raw_est"),
    )


def hll_cardinality(
    df: DataFrame, col: str, p: int = 6, group_cols: list[str] | None = None
) -> DataFrame:
    """Convenience: registers -> estimate in one call."""
    return hll_estimate(hll_registers(df, col, p, group_cols), p, group_cols)


def hll_corrected(raw_est: float, zeros: int, p: int) -> float:
    """Flajolet's small-range correction (linear counting when the raw
    estimate is under 2.5m and empty registers remain). Python-side: the
    ln() makes it non-portable under the bit-exact oracle discipline, and
    it consumes a 5-field estimate row, not a DataFrame."""
    import math

    m = 1 << p
    if raw_est <= 2.5 * m and zeros > 0:
        return m * math.log(m / zeros)
    return raw_est


# --------------------------------------------------------------- Count-Min


def _cms_bucket(col: Column, d: int, width: int) -> Column:
    """Row-``d`` bucket for a value: md5-derived, engine-portable."""
    return F.pmod(
        tokhash60(F.concat(F.lit(f"{d}:"), col.cast("string"))), F.lit(width)
    ).cast("int")


def cms_counters(
    df: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 256,
    weight_col: str | None = None,
) -> DataFrame:
    """(depth int, bucket int, count long): the Count-Min counter table of
    the values in ``df[col]`` (each row counts ``weight_col`` or 1).

    ``depth`` md5 hashes per row feed a groupBy over the FIXED key domain
    depth*width, so partial aggregation bounds the shuffle at
    O(tasks * depth * width) — the sketch's whole point at corpus scale."""
    if depth < 1 or width < 2:
        raise ValueError(f"need depth >= 1 and width >= 2, got {depth}x{width}")
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    rows = F.array(
        *[
            F.struct(
                F.lit(d).cast("int").alias("depth"),
                _cms_bucket(F.col(col), d, width).alias("bucket"),
            )
            for d in range(depth)
        ]
    )
    return (
        df.select(F.explode(rows).alias("r"), w.alias("w"))
        .groupBy(F.col("r.depth").alias("depth"), F.col("r.bucket").alias("bucket"))
        .agg(F.sum("w").alias("count"))
    )


def cms_lookup(
    counters: DataFrame,
    items: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """(<col>, est long): Count-Min point estimates for each item.

    The counter table is depth*width rows — broadcast it; items never
    shuffle. ``est`` is min over the ``depth`` rows, so it never
    underestimates the true total (CM guarantee). ``depth``/``width`` must
    match the ``cms_counters`` call that built ``counters``."""
    probes = F.array(
        *[
            F.struct(
                F.lit(d).cast("int").alias("depth"),
                _cms_bucket(F.col(col), d, width).alias("bucket"),
            )
            for d in range(depth)
        ]
    )
    return (
        items.select(col, F.explode(probes).alias("r"))
        .join(
            F.broadcast(counters),
            (F.col("r.depth") == counters["depth"])
            & (F.col("r.bucket") == counters["bucket"]),
        )
        .groupBy(col)
        .agg(F.min("count").cast("long").alias("est"))
    )


# ------------------------------------------------------------------- Bloom
#
# Packed 32-bit words on purpose: every mask is a positive long in both
# engines (1 << 31 would be the int32 sign bit; at 64 the long sign bit),
# so bit_or never crosses a signedness edge and the DuckDB oracle replays
# the table verbatim. The word domain m_bits/32 is FIXED, so the build is
# one bounded groupBy — same scale shape as the sketches above — and the
# finished filter is m_bits/32 rows: broadcastable at any corpus size.
# That is the decontamination story at 10^12 rows: the benchmark shingle
# SET may be too big to broadcast, its Bloom filter never is.

BLOOM_WORD_BITS = 32


def _bloom_probes(col: Column, k: int, m_bits: int) -> Column:
    """array<struct<word int, mask long>>: the k bit positions of a value
    (md5-derived, engine-portable), packed as (word index, 32-bit mask)."""
    pos = [
        F.pmod(
            tokhash60(F.concat(F.lit(f"b{i}:"), col.cast("string"))),
            F.lit(m_bits),
        )
        for i in range(k)
    ]
    return F.array_distinct(
        F.array(
            *[
                F.struct(
                    F.floor(p / F.lit(BLOOM_WORD_BITS)).cast("int").alias("word"),
                    # F.shiftleft only takes a literal shift; call the SQL
                    # function directly for a column shift
                    F.call_function(
                        "shiftleft",
                        F.lit(1).cast("long"),
                        F.pmod(p, F.lit(BLOOM_WORD_BITS)).cast("int"),
                    ).alias("mask"),
                )
                for p in pos
            ]
        )
    )


def _bloom_validate(m_bits: int, k: int) -> None:
    if m_bits < BLOOM_WORD_BITS or m_bits % BLOOM_WORD_BITS:
        raise ValueError(f"m_bits must be a positive multiple of 32, got {m_bits}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")


def bloom_bits(df: DataFrame, col: str, m_bits: int = 4096, k: int = 4) -> DataFrame:
    """(word int, bits long): the Bloom filter of the values in ``df[col]``
    as m_bits/32 packed words (absent words are all-zero). ``k`` hash
    functions; false-positive rate ~ (1 - e^(-k*n/m))^k, zero false
    negatives. bit_or's partial aggregation folds each task into at most
    m_bits/32 rows map-side — bounded shuffle, any input size."""
    _bloom_validate(m_bits, k)
    return (
        df.select(F.explode(_bloom_probes(F.col(col), k, m_bits)).alias("r"))
        .groupBy(F.col("r.word").alias("word"))
        .agg(F.bit_or("r.mask").alias("bits"))
    )


def bloom_contains(
    bloom: DataFrame, items: DataFrame, col: str, m_bits: int = 4096, k: int = 4
) -> DataFrame:
    """(<col>, member boolean): Bloom membership probe for each item.
    ``member`` is true iff ALL k probe bits are set — may be a false
    positive, never a false negative. The filter table is m_bits/32 rows:
    broadcast, so items never shuffle. ``m_bits``/``k`` must match the
    ``bloom_bits`` call that built ``bloom``."""
    _bloom_validate(m_bits, k)
    probes = items.select(
        col,
        F.size(_bloom_probes(F.col(col), k, m_bits)).alias("_np"),
        F.explode(_bloom_probes(F.col(col), k, m_bits)).alias("r"),
    )
    return (
        probes.join(
            F.broadcast(bloom), probes["r.word"] == bloom["word"], "left"
        )
        .select(
            col,
            "_np",
            (
                F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("r.mask"))
                != 0
            ).cast("int").alias("_hit"),
        )
        .groupBy(col)
        .agg(
            (F.sum("_hit") == F.first("_np")).alias("member"),
        )
    )


# --------------------------------------------------------------------------
# KMV (bottom-k / K-Minimum-Values) distinct sketch + set resemblance
# --------------------------------------------------------------------------

KMV_DOMAIN = 1 << 60  # tokhash60 values are uniform in [0, 2^60)


def kmv_sketch(
    df: DataFrame,
    col: str,
    k: int = 256,
    group_cols: tuple[str, ...] | list[str] = (),
) -> DataFrame:
    """(group..., kmv array<long>): the k smallest DISTINCT tokhash60 values
    of ``col`` per group — the classic KMV / bottom-k distinct sketch
    (Bar-Yossef et al. 2002; Beyer et al. SIGMOD 2007). Complements the HLL
    register sketch: same mergeability (union = merge-sort + cut at k), and
    additionally supports SET RESEMBLANCE between corpora (kmv_jaccard) —
    the domain-overlap triage a curation loop runs before any exact join.

    Scale shape: a mapInPandas PARTIAL pass keeps only the k smallest
    uniques per (partition, group) — O(groups*k) state per task, nothing
    proportional to input rows — then ONE groupBy merges the partials
    (flatten + distinct + sort + cut, <= n_partitions*k values per group).
    No distinct-shuffle of the raw value stream, which is what makes this a
    sketch rather than an exact bottom-k.

    Determinism: md5-derived hashes + set algebra; any engine replaying
    tokhash60 produces the identical array (the DuckDB oracle does).
    Groups with fewer than k distinct values carry ALL of them — the
    estimate is then exact (kmv_estimate returns size(kmv) directly).
    """
    import numpy as np
    import pandas as pd

    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    gcols = list(group_cols)
    hashed = df.select(*gcols, tokhash60(F.col(col)).alias("_h"))

    out_fields = ", ".join(f"{g} string" for g in gcols)
    schema = (out_fields + ", " if out_fields else "") + "partial array<long>"

    def partial(it):
        state: dict[tuple, np.ndarray] = {}
        for pdf in it:
            if gcols:
                groups = pdf.groupby(gcols, sort=False)
            else:
                groups = [((), pdf)]
            for key, sub in groups:
                if gcols and not isinstance(key, tuple):
                    key = (key,)
                hs = np.unique(sub["_h"].to_numpy(dtype=np.int64))
                cur = state.get(key)
                merged = hs if cur is None else np.union1d(cur, hs)
                state[key] = merged[:k]
        rows = [
            dict(zip(gcols, key), partial=arr.tolist())
            for key, arr in state.items()
        ]
        if rows:
            yield pd.DataFrame(rows, columns=gcols + ["partial"])
        else:
            # empty partition: object-dtype empties (a float64 empty column
            # fails Arrow's ndarray -> list<int64> conversion)
            yield pd.DataFrame(
                {c: pd.Series([], dtype=object) for c in gcols + ["partial"]}
            )

    partials = hashed.mapInPandas(partial, schema)
    agg = partials.groupBy(*gcols).agg(
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("partial")))),
            1,
            k,
        ).alias("kmv")
    )
    return agg


def kmv_estimate(sketch: DataFrame, k: int = 256) -> DataFrame:
    """(group..., n_in_sketch, est): distinct-count estimate from a KMV
    sketch — exact size when the sketch is unsaturated (< k values), else
    the unbiased (k-1) * DOMAIN / h_k with integer division (h_k > 0 by
    construction, hashes are uniform in [0, 2^60))."""
    others = [c for c in sketch.columns if c != "kmv"]
    n = F.size("kmv").cast("long")
    # (k-1) * 2^60 overflows int64 for k > 8 — run the multiply/divide in
    # decimal(38,0) (exact; DuckDB's twin uses HUGEINT //)
    est = F.when(n < k, n).otherwise(
        F.expr(
            f"CAST(CAST({k - 1} AS DECIMAL(38,0)) * CAST({KMV_DOMAIN} AS DECIMAL(38,0))"
            f" DIV CAST(element_at(kmv, {k}) AS DECIMAL(38,0)) AS BIGINT)"
        )
    )
    return sketch.select(
        *others, n.alias("n_in_sketch"), est.cast("long").alias("est")
    )


def kmv_jaccard(sk_a: DataFrame, sk_b: DataFrame, k: int = 256) -> DataFrame:
    """(n_union_sketch, n_common, jaccard): set resemblance of two KMV
    sketches (Beyer et al. 2007): take the k smallest values of the sketch
    UNION (itself a valid sketch of A ∪ B), count how many of those lie in
    both sketches, divide. One row in, one row out — pure column math over
    two <= k arrays; the only float is ONE exactly-rounded int/int division.

    Exact when both sides are unsaturated (the union sketch then IS
    A ∪ B)."""
    a = sk_a.select(F.col("kmv").alias("_a"))
    b = sk_b.select(F.col("kmv").alias("_b"))
    both = a.crossJoin(b)
    union_k = F.slice(
        F.array_sort(F.array_union(F.col("_a"), F.col("_b"))), 1, k
    )
    common = F.size(
        F.filter(
            union_k,
            lambda x: F.array_contains(F.col("_a"), x)
            & F.array_contains(F.col("_b"), x),
        )
    )
    nu = F.size(union_k)
    return both.select(
        nu.cast("long").alias("n_union_sketch"),
        common.cast("long").alias("n_common"),
        (common.cast("double") / nu.cast("double")).alias("jaccard"),
    )


def quantile_sketch(
    df: DataFrame,
    value_col: str,
    key_col: str,
    k: int = 256,
    group_cols: tuple[str, ...] | list[str] = (),
) -> DataFrame:
    """(group..., sample array<struct<h:long, v:long>>): a mergeable
    QUANTILE sketch — the k rows whose portable row hash (tokhash60 of the
    row key) is smallest, carrying their values. Bottom-k by a uniform hash
    is a uniform random sample of the rows (the KMV trick applied to row
    identity instead of value identity), so sample quantiles estimate
    population quantiles with the usual sqrt(k) error; and bottom-k is
    MERGEABLE exactly like KMV: union two sketches, re-sort, cut at k —
    which is also precisely what the final groupBy does to the per-partition
    partials. Completes the sketch family (HLL/CMS/Bloom/KMV) with the
    quantile member an ES `percentiles` aggregation or a shuffle-free p99
    monitor needs at corpus scale.

    Scale shape: identical to kmv_sketch — a mapInPandas PARTIAL pass holds
    only the k smallest (h, v) pairs per (partition, group), then ONE
    groupBy merges <= n_partitions*k pairs per group. No global sort of the
    value stream (the thing an exact percentile would shuffle).

    Determinism: ties in h (duplicate keys) are broken by v, so the sample
    is the multiset bottom-k under lexicographic (h, v) — replayable by any
    engine with the same md5-derived hash (the DuckDB oracle's
    row_number() OVER (ORDER BY h, v) twin). Groups with <= k rows carry
    ALL rows — estimates are then exact.
    """
    import numpy as np
    import pandas as pd

    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    gcols = list(group_cols)
    hashed = df.select(
        *gcols,
        tokhash60(F.col(key_col).cast("string")).alias("_h"),
        F.col(value_col).cast("long").alias("_v"),
    )

    # group columns keep their INPUT types (an int category must not be
    # silently stringified by the partial pass) — read them off the
    # projected frame's schema instead of hardcoding string
    gtypes = {f.name: f.dataType.simpleString() for f in hashed.schema.fields}
    out_fields = ", ".join(f"{g} {gtypes[g]}" for g in gcols)
    schema = (
        (out_fields + ", " if out_fields else "")
        + "ph array<long>, pv array<long>"
    )

    def partial(it):
        state: dict[tuple, np.ndarray] = {}
        for pdf in it:
            if gcols:
                groups = pdf.groupby(gcols, sort=False)
            else:
                groups = [((), pdf)]
            for key, sub in groups:
                if gcols and not isinstance(key, tuple):
                    key = (key,)
                pairs = np.stack(
                    [
                        sub["_h"].to_numpy(dtype=np.int64),
                        sub["_v"].to_numpy(dtype=np.int64),
                    ],
                    axis=1,
                )
                cur = state.get(key)
                if cur is not None:
                    pairs = np.concatenate([cur, pairs])
                order = np.lexsort((pairs[:, 1], pairs[:, 0]))
                state[key] = pairs[order[:k]]
        rows = [
            dict(zip(gcols, key), ph=arr[:, 0].tolist(), pv=arr[:, 1].tolist())
            for key, arr in state.items()
        ]
        if rows:
            yield pd.DataFrame(rows, columns=gcols + ["ph", "pv"])
        else:
            yield pd.DataFrame(
                {c: pd.Series([], dtype=object) for c in gcols + ["ph", "pv"]}
            )

    partials = hashed.mapInPandas(partial, schema)
    pairs = F.arrays_zip(F.col("ph"), F.col("pv")).cast(
        "array<struct<h:bigint,v:bigint>>"
    )
    return (
        partials.select(*gcols, pairs.alias("pairs"))
        .groupBy(*gcols)
        .agg(
            F.slice(
                F.array_sort(F.flatten(F.collect_list("pairs"))), 1, k
            ).alias("sample")
        )
    )


def quantile_estimate(
    sketch: DataFrame, pcts: tuple[int, ...] | list[int] = (50, 90, 99)
) -> DataFrame:
    """(group..., pct, n_in_sample, est): percentile estimates from a
    quantile sketch — the 'lower' interpolant v_sorted[(pct*(n-1))//100]
    over the sample's values, ALL-integer index arithmetic (no float ever
    touches the estimate; the estimate IS a population value). Exact when
    the sketch is unsaturated (sample == population)."""
    for p in pcts:
        if not (0 <= int(p) <= 100):
            raise ValueError(f"pct must be in [0, 100], got {p}")
    others = [c for c in sketch.columns if c != "sample"]
    vals = F.array_sort(F.transform(F.col("sample"), lambda x: x["v"]))
    n = F.size("sample").cast("long")
    pct_rows = F.explode(
        F.array(*[F.lit(int(p)) for p in pcts])
    ).alias("pct")
    # integer floor division: (pct*(n-1)) div 100, then 1-based element_at
    idx = F.expr("CAST(pct AS BIGINT) * (size(sample) - 1) DIV 100") + 1
    return sketch.select(*others, "sample", pct_rows).select(
        *others,
        F.col("pct").cast("int").alias("pct"),
        n.alias("n_in_sample"),
        F.element_at(vals, idx.cast("int")).alias("est"),
    )


def quantile_rank(
    sketch: DataFrame, values: tuple[int, ...] | list[int]
) -> DataFrame:
    """(group..., val, n_in_sample, n_le, pct_rank): percentile RANKS from a
    quantile sketch — for each probe value, the percent of sampled rows
    whose value is <= it (ES ``percentile_ranks``, the inverse lookup of
    quantile_estimate). n_le is an exact integer count over the sample;
    pct_rank = 100·n_le/n is the ONE IEEE division (exact population
    fraction when the sketch is unsaturated). Empty probe list raises."""
    if not values:
        raise ValueError("values must be non-empty")
    others = [c for c in sketch.columns if c != "sample"]
    probe = F.explode(
        F.array(*[F.lit(int(v)).cast("long") for v in values])
    ).alias("val")
    n_le = F.size(
        F.filter("sample", lambda x: x["v"] <= F.col("val"))
    ).cast("long")
    n = F.size("sample").cast("long")
    return sketch.select(*others, "sample", probe).select(
        *others,
        "val",
        n.alias("n_in_sample"),
        n_le.alias("n_le"),
        (F.lit(100.0) * n_le.cast("double") / n.cast("double")).alias(
            "pct_rank"
        ),
    )
