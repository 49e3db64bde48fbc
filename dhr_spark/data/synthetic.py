"""Deterministic synthetic transcripts + query sets (FIXTURES.md §1-2).

Everything is derived from murmur3 ``hash()`` column expressions over
``spark.range`` — fully distributed generation with no driver-side loops, no
wall-clock, no RNG state. The same (n_convs, seed) always yields byte-identical
tables regardless of parallelism, so docid/text invariants are testable across
local[8] vs local[32].

Mirrors the reference corpus role of MS MARCO JSONL ``{"id","contents"}``
(/root/reference/densify/tokenize_corpus.py:31-36) transplanted onto the
transcripts schema from BASELINE.json input_hint.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Zipfian-ish vocabulary: head words repeated many times in the sampling pool so
# head-term skew paths (salting, block pruning) are exercised. Includes Lucene
# stopwords, mixed-case forms and punctuation-bearing tokens for the analyzer.
_HEAD = [
    "the", "and", "data", "query", "spark", "index", "search", "table",
    "token", "model", "agent", "tool", "turn", "user", "plan", "code",
]
_MID = [
    "retrieval", "posting", "segment", "merge", "shuffle", "partition",
    "broadcast", "lexical", "vector", "score", "ranking", "corpus",
    "document", "passage", "engine", "cluster", "executor", "compress",
    "varint", "block", "wand", "bm25", "stemming", "analyzer", "filter",
    "join", "window", "aggregate", "salting", "skew", "manifest", "lineage",
]
_TAIL = [
    "Anserini", "Lucene's", "fp16", "delta-gap", "checkpoint", "resumable",
    "idempotent", "hypothesis", "quixotic", "zephyr", "obelisk", "katabatic",
    "petrichor", "sesquipedalian", "borborygmus", "vellichor", "apricity",
    "nudiustertian", "limerence", "sonder", "Uppercase", "MixedCase",
    "trailing.", "comma,", "paren(thetical)", "quo'ted",
]


N_TAIL_TYPES = 2000  # generated rare words tk0000..tk1999 (Heaps-law tail)
TAIL_FRACTION = 3  # ~1/3 of tokens drawn from the generated tail


def _sampling_pool() -> list[str]:
    """Word pool with Zipf-like multiplicity: head 64x, mid 8x, tail 1x."""
    pool = list(
        itertools.chain(
            itertools.chain.from_iterable([w] * 64 for w in _HEAD),
            itertools.chain.from_iterable([w] * 8 for w in _MID),
            _TAIL,
        )
    )
    return pool


def _word_expr(vocab, vlen: int, h):
    """One sampled word from hash column h: ~1/3 generated rare tail word
    (tkNNNN, ~2k types — Heaps-law stand-in so block-max pruning and salting
    see realistic selective terms), else a Zipf-weighted pool word. Pure
    column arithmetic — no giant literal arrays (a 3k-literal array is
    re-materialized per row by the interpreter)."""
    tail_word = F.concat(
        F.lit("tk"),
        F.lpad(F.pmod(F.hash(h, F.lit(99)), F.lit(N_TAIL_TYPES)).cast("string"), 4, "0"),
    )
    pool_word = F.element_at(vocab, F.pmod(h, F.lit(vlen)) + 1)
    return F.when(
        F.pmod(F.hash(h, F.lit(7)), F.lit(TAIL_FRACTION)) == 0, tail_word
    ).otherwise(pool_word)


def synth_transcripts(
    spark: SparkSession, n_convs: int = 500, seed: int = 42
) -> DataFrame:
    """Deterministic transcripts(conv_id, turn_idx, role, text, tool, ts)."""
    pool = _sampling_pool()
    vocab = F.array(*[F.lit(w) for w in pool])
    vlen = len(pool)

    conv = spark.range(n_convs).select(
        F.format_string("conv-%06d", F.col("id")).alias("conv_id"),
        (F.pmod(F.hash(F.col("id") * 2654435761 + seed), F.lit(40)) + 1).alias(
            "n_turns"
        ),
        F.col("id").alias("_cid"),
    )
    t = conv.select(
        "conv_id",
        "_cid",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )
    h = F.hash(F.col("_cid"), F.col("turn_idx"), F.lit(seed))
    role = (
        F.when(F.pmod(h, F.lit(10)) < 4, F.lit("user"))
        .when(F.pmod(h, F.lit(10)) < 8, F.lit("assistant"))
        .when(F.pmod(h, F.lit(10)) < 9, F.lit("tool"))
        .otherwise(F.lit("system"))
    )
    n_words = F.when(F.pmod(h, F.lit(37)) == 0, F.lit(0)).otherwise(
        F.pmod(F.hash(h, F.lit(1)), F.lit(196)) + 5
    )
    words = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda i: _word_expr(
            vocab, vlen, F.hash(F.col("_cid"), F.col("turn_idx"), i, F.lit(seed))
        ),
    )
    return t.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        F.concat_ws(" ", words).alias("text"),
        F.when(
            role == "tool",
            F.element_at(
                F.array(F.lit("bash"), F.lit("grep"), F.lit("read"), F.lit("edit")),
                F.pmod(F.hash(h, F.lit(2)), F.lit(4)) + 1,
            ),
        ).alias("tool"),
        (
            F.to_timestamp(F.lit("2026-01-01 00:00:00"))
            + F.make_interval(secs=F.col("_cid") * 3600 + F.col("turn_idx") * 30)
        ).alias("ts"),
    )


def synth_queries(spark: SparkSession, n_queries: int = 50, seed: int = 7) -> DataFrame:
    """Deterministic queries(qid, text): 2-12 words, some stopword-only /
    out-of-vocabulary / repeated-term queries (FIXTURES.md §2)."""
    pool = _sampling_pool() + ["xylophone", "unseenterm", "zzyzx"]
    vocab = F.array(*[F.lit(w) for w in pool])
    vlen = len(pool)
    q = spark.range(n_queries)
    h = F.hash(F.col("id"), F.lit(seed))
    n_words = F.pmod(h, F.lit(11)) + 2
    words = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda i: _word_expr(vocab, vlen, F.hash(F.col("id"), i, F.lit(seed))),
    )
    stop_only = F.pmod(h, F.lit(17)) == 0
    repeated = F.pmod(h, F.lit(13)) == 0
    text = (
        F.when(stop_only, F.lit("the and of to"))
        .when(repeated, F.concat_ws(" ", words, words))
        .otherwise(F.concat_ws(" ", words))
    )
    return q.select(F.format_string("q-%04d", F.col("id")).alias("qid"), text.alias("text"))
