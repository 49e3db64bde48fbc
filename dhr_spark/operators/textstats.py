"""Text-analysis operators for large-scale training-data pipelines.

All hot paths are pure Column expressions (whole-stage codegen, zero Python):
language ID (stopword-hit heuristic), quality scoring (length / punctuation /
stopword ratios), token counting (whitespace + BPE-ish regex), and document
fingerprinting (position-weighted token hash).

Portability contract: every function here has an exact ANSI-SQL twin in
``__spark_entry__.oracle_sql`` (DuckDB), so the driver's value-hash comparison
pins the semantics. The portable token hash is the integer value of the first
15 hex chars of md5(term) — computable in any engine with md5 + string ops.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dhr_spark.functions.analyzer import LUCENE_STOPWORDS, simple_tokens_col

# tiny per-language stopword marker sets for the n-gram/stopword-hit language
# heuristic; real pipelines would plug a fastText-style model in as a pandas
# UDF — the *operator shape* (tokens -> per-language hit score -> argmax) is
# what matters at 100 TB, and it is identical either way.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "it", "for", "on"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "zu"),
    "fr": ("le", "la", "les", "des", "est", "une", "dans", "que", "pour"),
    "es": ("el", "los", "las", "es", "una", "para", "con", "por", "del"),
}

# BPE-ish token pattern: letter runs, digit runs, or single non-space symbol
BPE_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"

FP_MOD = 1 << 20  # fingerprint modulus: keeps pos-weighted sums in int64


def tokhash60(term: Column) -> Column:
    """Portable 60-bit token hash: int(md5(term)[:15], 16).

    Engine-agnostic by construction (md5 is standardized); the DuckDB twin
    is a strpos/substr digit sum — see __spark_entry__.oracle_sql.
    """
    return F.conv(F.substring(F.md5(term), 1, 15), 16, 10).cast("long")


def with_simple_tokens(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("tokens", simple_tokens_col(F.col(text_col)))


def token_counts(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, ws_tokens, bpe_tokens, n_chars): whitespace + BPE-ish counts."""
    ws = F.size(F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != ""))
    bpe = F.size(F.regexp_extract_all(F.lower(F.col("text")), F.lit(BPE_RE), 0))
    return docs.select(
        id_col,
        ws.cast("long").alias("ws_tokens"),
        bpe.cast("long").alias("bpe_tokens"),
        F.length("text").cast("long").alias("n_chars"),
    )


def quality_scores(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, n_tokens, avg_token_len, stopword_ratio, alnum_ratio, quality).

    The classic cheap-filter stack (Gopher/C4-style rules) as pure columns;
    `quality` is a [0,1] composite used as a keep/drop threshold upstream of
    expensive stages. All ratios double, rounded to 6 for cross-engine hashing.
    """
    toks = simple_tokens_col(F.col("text"))
    n = F.size(toks).cast("double")
    stop_arr = F.array(*[F.lit(w) for w in sorted(LUCENE_STOPWORDS)])
    n_stop = F.size(F.array_intersect(toks, stop_arr)).cast("double")
    tok_chars = F.aggregate(
        toks, F.lit(0).cast("double"), lambda acc, t: acc + F.length(t)
    )
    alnum = F.length(F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9]", ""))
    total = F.length("text").cast("double")
    avg_len = F.when(n > 0, F.round(tok_chars / n, 6)).otherwise(F.lit(0.0))
    stop_ratio = F.when(n > 0, F.round(n_stop / n, 6)).otherwise(F.lit(0.0))
    alnum_ratio = F.when(total > 0, F.round(alnum / total, 6)).otherwise(F.lit(0.0))
    # composite in EXACT integer tenth-micros: the rounded-to-6 ratios are
    # integers in micros, n*20000 caps the length term exactly, and the
    # weighted sum (x5/x3/x2, /10) never rounds — a float composite kept
    # landing on .xxxxxx5 midpoints where Spark (HALF_UP on decimal) and
    # DuckDB (nearest-even on doubles) disagree in the 6th decimal
    # (measured at sf0.1: 0.5975645 -> .597564 vs .597565)
    len_i = F.least(F.size(toks).cast("long") * F.lit(20000), F.lit(1_000_000))
    alnum_i = F.round(alnum_ratio * F.lit(1e6)).cast("long")
    stop_i = F.least(
        F.round(stop_ratio * F.lit(1e6)).cast("long") * F.lit(4),
        F.lit(1_000_000),
    )
    quality = (
        (len_i * F.lit(5) + alnum_i * F.lit(3) + stop_i * F.lit(2))
        .cast("double")
        / F.lit(1e7)
    )
    return docs.select(
        id_col,
        F.size(toks).cast("long").alias("n_tokens"),
        avg_len.alias("avg_token_len"),
        stop_ratio.alias("stopword_ratio"),
        alnum_ratio.alias("alnum_ratio"),
        quality.alias("quality"),
    )


def lang_id(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, lang_pred, lang_hits): stopword-marker language heuristic.

    Per language: hits = |tokens ∩ markers(lang)| (distinct). Prediction =
    argmax hits with deterministic tie-break on language code ASC; 'und'
    (undetermined) when no marker hits at all.
    """
    toks = F.array_distinct(simple_tokens_col(F.col("text")))
    hit_cols = []
    for code in sorted(LANG_MARKERS):
        markers = F.array(*[F.lit(w) for w in LANG_MARKERS[code]])
        hit_cols.append(
            F.struct(
                F.size(F.array_intersect(toks, markers)).cast("long").alias("hits"),
                F.lit(code).alias("lang"),
            )
        )
    # array_max over (hits, lang) structs orders by hits then lang — we want
    # hits DESC, lang ASC, so invert lang by sorting ourselves: take max hits,
    # then first lang achieving it in sorted order.
    arr = F.array(*hit_cols)
    best_hits = F.array_max(F.transform(arr, lambda s: s["hits"]))
    best_lang = F.element_at(
        F.filter(arr, lambda s: s["hits"] == best_hits), 1
    )["lang"]
    return docs.select(
        id_col,
        F.when(best_hits > 0, best_lang).otherwise(F.lit("und")).alias("lang_pred"),
        best_hits.alias("lang_hits"),
    )


def term_cooccurrence(
    docs: DataFrame, min_count: int = 5, id_col: str = "doc_id"
) -> DataFrame:
    """(term_a, term_b, cooc): docs containing both terms, term_a < term_b.

    The reference's vocab-adjacency analysis tool ``vocab_adj[m,n] += 1``
    (/root/reference/tevatron/utils/util.py:295-305) as an explode +
    self-join + count. Scale note: the self-join is quadratic in distinct
    terms per doc — cap docs upstream or raise min_count; the reference holds
    the full |V|^2 matrix in RAM, which this avoids entirely.
    """
    # materialized once: both self-join sides reference the tokenize plan
    t = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(F.array_distinct(simple_tokens_col(F.col("text")))).alias("term"),
    ).localCheckpoint()
    a = t.select("_id", F.col("term").alias("term_a"))
    b = t.select("_id", F.col("term").alias("term_b"))
    return (
        a.join(b, "_id")
        .filter(F.col("term_a") < F.col("term_b"))
        .groupBy("term_a", "term_b")
        .agg(F.count("*").alias("cooc"))
        .filter(F.col("cooc") >= min_count)
    )


def repetition_stats(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, n_tokens, top_token_frac, top_bigram_frac, distinct_ratio):
    Gopher-style repetition filters (most-frequent-token mass and
    most-frequent-bigram mass; high values flag boilerplate/spam docs).

    Pure column math: per distinct token/bigram, count its occurrences with
    a filter scan over the array and take the max — O(n·distinct) per doc in
    whole-stage codegen, zero shuffle, and an exact DuckDB list-ops twin.
    Ratios rounded to 6 for cross-engine hashing.
    """
    toks = simple_tokens_col(F.col("text"))
    n = F.size(toks)

    def top_count(arr: Column) -> Column:
        distinct = F.array_distinct(arr)
        return F.array_max(
            F.transform(
                distinct,
                lambda d: F.size(F.filter(arr, lambda t: t == d)),
            )
        )

    bigrams = F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.concat_ws(
            " ", F.element_at(toks, i), F.element_at(toks, i + 1)
        ),
    )
    top_tok = F.when(n > 0, F.round(top_count(toks) / n.cast("double"), 6)).otherwise(0.0)
    top_bg = F.when(
        n > 1, F.round(top_count(bigrams) / (n - 1).cast("double"), 6)
    ).otherwise(0.0)
    dr = F.when(
        n > 0, F.round(F.size(F.array_distinct(toks)) / n.cast("double"), 6)
    ).otherwise(0.0)
    return docs.select(
        id_col,
        n.cast("long").alias("n_tokens"),
        top_tok.alias("top_token_frac"),
        top_bg.alias("top_bigram_frac"),
        dr.alias("distinct_ratio"),
    )


# default PII-shaped scrub rules: portable across Java regex (Spark) and
# RE2 (DuckDB) — simple character classes only, no lookaround
REDACT_RULES: list[tuple[str, str]] = [
    (r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z][a-zA-Z]+", "<EMAIL>"),
    (r"[0-9]+", "<NUM>"),
]


def redact(
    df: DataFrame,
    text_col: str,
    id_col: str,
    rules: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """(id, redacted, n_redacted): pattern scrubbing for training-data
    pipelines (PII-shaped tokens → placeholders). Rules apply in order;
    n_redacted counts matches of each rule BEFORE its rewrite (an earlier
    rule's placeholder is never double-counted by a later one because
    counting happens on that rule's own input)."""
    rules = REDACT_RULES if rules is None else rules
    cur = F.col(text_col)
    total = F.lit(0)
    for pat, repl in rules:
        total = total + F.size(F.regexp_extract_all(cur, F.lit(pat), 0))
        cur = F.regexp_replace(cur, pat, repl)
    return df.select(
        id_col,
        cur.alias("redacted"),
        total.cast("long").alias("n_redacted"),
    )


def hash_split(
    docs: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """(id, bucket, split): deterministic train/val/test assignment by
    portable content-free hash of the id — stable across engines, runs and
    cluster sizes (no RNG state; the split of a given id never changes when
    the corpus grows, unlike randomSplit)."""
    bucket = tokhash60(F.col(id_col).cast("string")) % 100
    split = (
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return docs.select(
        id_col, bucket.cast("long").alias("bucket"), split.alias("split")
    )


def fingerprints(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, fingerprint): order-sensitive rolling document fingerprint.

    fp = sum over positions i (1-based) of (tokhash60(t_i) % FP_MOD) * i,
    all mod FP_MOD. Position-weighting makes it order-sensitive (unlike a
    bag-of-words hash) while staying exactly portable: every intermediate
    fits int64 for documents up to ~2^43 tokens.
    """
    toks = simple_tokens_col(F.col("text"))
    pos_terms = F.transform(toks, lambda t, i: (tokhash60(t) % FP_MOD) * (i + 1))
    fp = F.aggregate(pos_terms, F.lit(0).cast("long"), lambda a, x: a + x) % FP_MOD
    return docs.select(id_col, fp.alias("fingerprint"))


def unigram_xent(
    docs: DataFrame,
    id_col: str = "doc_id",
    lm: DataFrame | None = None,
    lm_total: int | None = None,
) -> DataFrame:
    """(id, n_tokens, xent, ppl): per-document cross-entropy against a
    unigram collection language model — the CCNet/Gopher-style perplexity
    quality signal for LLM-training-data filtering (docs scoring far above
    the corpus mean are boilerplate/noise candidates).

        H(d)   = -(1/|d|) * sum_t tf(t, d) * log2(P(t | C))
        ppl(d) = 2^H(d)

    ``lm`` (term, ctf) + ``lm_total`` plug an EXTERNAL reference LM (e.g.
    built once on a clean corpus, reused across crawls); terms absent from
    it take an add-half floor ctf=0.5 (Lidstone smoothing) so OOV tokens
    penalize rather than crash. Default: the corpus is its own LM (no OOV
    by construction).

    Scale: tokenize -> (id, term, tf) -> broadcast-join the |V|-row LM ->
    one (id) re-aggregation. The LM is dictionary-sized; the only wide
    shuffle is the same (id, term) aggregation every TF operator pays.
    Empty docs are dropped (P6 empty-text guard convention).
    """
    toks = with_simple_tokens(docs.select(id_col, "text"))
    tf = (
        toks.select(id_col, F.explode("tokens").alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    if lm is None:
        lm = tf.groupBy("term").agg(F.sum("tf").alias("ctf"))
        cl = float(tf.agg(F.sum("tf")).collect()[0][0] or 0)
        if cl == 0:
            raise ValueError("empty corpus: no tokens to build the LM from")
        joined = tf.join(F.broadcast(lm), "term")
        p = F.col("ctf") / F.lit(cl)
    else:
        if lm_total is None:
            raise ValueError("external lm needs lm_total (collection length)")
        cl = float(lm_total)
        joined = tf.join(F.broadcast(lm.select("term", "ctf")), "term", "left")
        p = F.coalesce(F.col("ctf"), F.lit(0.5)) / F.lit(cl)
    per_doc = joined.groupBy(id_col).agg(
        F.sum("tf").cast("long").alias("n_tokens"),
        (-F.sum(F.col("tf") * F.log2(p))).alias("bits"),
    )
    xent = F.col("bits") / F.col("n_tokens")
    return per_doc.select(
        id_col,
        "n_tokens",
        F.round(xent, 6).alias("xent"),
        F.round(F.pow(F.lit(2.0), xent), 4).alias("ppl"),
    )


def stratified_sample(
    docs: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum downsampling — the domain-rebalancing step
    of LLM-data curation (e.g. keep 100% of books, 10% of common-crawl).

    A row survives iff hash(id) % 10^6 < rate(stratum) · 10^6 — the same
    content-free portable hash as hash_split, so membership is stable
    across engines, runs, cluster sizes AND corpus growth (a kept id stays
    kept when new data arrives; sampleBy's RNG gives none of that). Strata
    absent from ``rates`` take ``default_rate``. Rates are validated into
    [0, 1]; keep fractions are exact at the 10^-6 granularity.

    Scale: one broadcast of the tiny rate map as a CASE column + a
    map-side filter — zero shuffle, fully codegen.
    """
    for s, r in rates.items():
        if not (0.0 <= r <= 1.0):
            raise ValueError(f"rate for stratum {s!r} must be in [0,1], got {r}")
    if not (0.0 <= default_rate <= 1.0):
        raise ValueError(f"default_rate must be in [0,1], got {default_rate}")
    bucket = tokhash60(F.col(id_col).cast("string")) % 1_000_000
    rate = F.lit(int(round(default_rate * 1_000_000)))
    for s, r in sorted(rates.items()):
        rate = F.when(
            F.col(strata_col) == F.lit(s), F.lit(int(round(r * 1_000_000)))
        ).otherwise(rate)
    return docs.filter(bucket < rate)


def temperature_sample(
    docs: DataFrame,
    domain_col: str,
    alpha: float = 0.5,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic temperature-flattened domain resampling — the
    multilingual/multi-domain mixing step of LLM-data curation (sample
    domains ∝ p_d^α, α = 1/T; Conneau & Lample's exponentiated-smoothing
    and the mT5/XLM-R recipe). Downsample-only: target share q_d ∝ p_d^α
    with α ≤ 1 flattens toward uniform, so the per-domain keep rate is

        r_d = (c_min / c_d)^(1-α)        (the smallest domain keeps 100%)

    — the p_d^(α-1) ratio with the corpus total cancelled, computed from
    exact integer counts so every engine derives bit-identical rates
    (rounded to 6 decimals, 10^-6 keep-fraction granularity). Membership
    is the same content-free portable hash as stratified_sample /
    hash_split: stable across engines, runs, cluster sizes and corpus
    slices at fixed counts.

    Scale: one tiny domain-count aggregate (|domains| rows to the driver)
    + a broadcast CASE filter — zero shuffle on the corpus itself.
    """
    if not (0.0 <= alpha <= 1.0):
        raise ValueError(f"alpha must be in [0,1], got {alpha}")
    rows = docs.groupBy(domain_col).agg(F.count("*").alias("c")).collect()
    if not rows:
        return docs
    c_min = min(int(r["c"]) for r in rows)
    micros = {
        r[domain_col]: int(round(
            round((c_min / int(r["c"])) ** (1.0 - alpha), 6) * 1_000_000
        ))
        for r in rows
    }
    return _keep_by_rate(docs, domain_col, micros, id_col)


def _keep_by_rate(
    docs: DataFrame, domain_col: str, micro_rates: dict, id_col: str
) -> DataFrame:
    """Per-domain micro-fraction keep filter over the content-free
    portable hash — the SINGLE membership definition every sampler
    (temperature_sample, mixture_sample) shares, so a change to the
    hash/bucket contract cannot desynchronize them. Domains missing from
    ``micro_rates`` keep nothing (rate 0)."""
    bucket = tokhash60(F.col(id_col).cast("string")) % 1_000_000
    rate = F.lit(0)
    for d in sorted(micro_rates, key=str):
        rate = F.when(
            F.col(domain_col) == F.lit(d), F.lit(int(micro_rates[d]))
        ).otherwise(rate)
    return docs.filter(bucket < rate)


def mixture_sample(
    docs: DataFrame,
    domain_col: str,
    weights: dict,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic downsample-only EXPLICIT mixture targeting — the
    "train on W parts web, 1 part books, 2 parts code" step of LLM-data
    curation (fixed mixing ratios a la GPT-3/Pile/DoReMi-static, where
    temperature_sample instead derives ratios from corpus shares).

    ``weights`` maps domain value -> positive INTEGER weight. The kept
    corpus has expected domain proportions exactly ∝ weights, scaled to
    the largest feasible size: the BINDING domain (argmin c_d/w_d, ties
    by domain value) keeps 100%, every other keeps

        rate_d = (10^6 · w_d · c_bind) // (w_bind · c_d)   micro-fraction

    — all-integer arithmetic (exact in any engine; integer weights are
    the contract precisely so no float rounding can split engines).
    Domains absent from ``weights`` are dropped (weight 0); weighted
    domains absent from the corpus raise (their target share is
    unsatisfiable by downsampling). Membership uses the same content-free
    portable hash as temperature_sample / hash_split: stable across
    engines, runs and cluster sizes at fixed counts.

    Scale: one |domains|-row count aggregate + a broadcast CASE filter —
    zero shuffle on the corpus itself.
    """
    if not weights:
        raise ValueError("weights must be a non-empty {domain: int} map")
    for d, w in weights.items():
        if not isinstance(w, int) or isinstance(w, bool) or w <= 0:
            raise ValueError(
                f"weights must be positive integers, got {d!r}: {w!r}"
            )
    rows = docs.groupBy(domain_col).agg(F.count("*").alias("c")).collect()
    counts = {r[domain_col]: int(r["c"]) for r in rows}
    missing = sorted(str(d) for d in weights if d not in counts)
    if missing:
        raise ValueError(
            f"weighted domains absent from the corpus: {missing} — a "
            "downsample-only mixer cannot reach their target share"
        )
    # binding domain: smallest c/w (exact float quotient of ints, ties by
    # domain value — the same comparison the SQL oracle performs)
    bind = min(weights, key=lambda d: (counts[d] / weights[d], str(d)))
    cb, wb = counts[bind], weights[bind]
    micros = {
        d: (1_000_000 * weights[d] * cb) // (wb * counts[d]) for d in weights
    }
    return _keep_by_rate(docs, domain_col, micros, id_col)
