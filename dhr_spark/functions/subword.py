"""Native subword tokenization: BPE training/encoding + WordPiece encoding.

Closes the one remaining `partial` in the operator inventory (SURVEY F3):
the reference tokenizes with HuggingFace WordPiece
(/root/reference/tokenize_corpus.py:28-34); this container has no
`transformers`, so functions/wordpiece.py ships only an optional HF slot.
This module implements the algorithms themselves, dependency-free:

* ``train_bpe`` — byte-pair-encoding merge learning (Sennrich et al.
  2016) in the exact shape the HF tokenizers trainer uses: the CORPUS
  pass is one distributed word-frequency aggregation (the only part that
  scales with data volume), and the merge loop runs driver-side over the
  |word-vocab|-bounded frequency dict. Heaps' law keeps a web-scale word
  vocabulary ~10^7; MAX_WORD_VOCAB guards the funnel exactly like
  Searcher's dictionary cache. Determinism: ties on pair count break by
  pair lexicographic order, so the same corpus always yields the same
  merge table on any engine or cluster size.
* ``bpe_encode_udf`` — merge-rank BPE encoding (lowest-rank pair first,
  the canonical encode loop) as a vectorized pandas UDF; the end-of-word
  sentinel ``</w>`` stays visible in final tokens.
* ``wordpiece_encode_udf`` — the real WordPiece inference algorithm
  (greedy longest-match-first against a vocabulary, ``##`` continuation
  prefix, whole-word ``[UNK]`` on failure, BERT's 100-char guard) — what
  ``tokenizer.tokenize`` does inside HF, minus the dependency.

Training is iterative (merge t depends on merge t-1), so there is no
SQL twin — the correctness story is pinned-hand-example pytest
(tests/test_subword.py replays Sennrich's low/lower/newest/widest
corpus) plus a distributed==driver parity check, and the driver-contract
entry is rows-only by design, like stateful streaming.
"""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from dhr_spark.functions.analyzer import simple_tokens_col

EOW = "</w>"
MAX_WORD_VOCAB = 2_000_000


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n): corpus word frequencies under the simple analyzer — the
    distributed pass of BPE training (everything after it is bounded by
    the word VOCABULARY, not the corpus)."""
    toks = docs.select(simple_tokens_col(F.col(text_col)).alias("_t"))
    return (
        toks.select(F.explode("_t").alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("n"))
    )


def _pair_counts(words: dict[tuple[str, ...], int]) -> Counter:
    c: Counter = Counter()
    for syms, n in words.items():
        for a, b in zip(syms, syms[1:]):
            c[(a, b)] += n
    return c


def _merge_word(
    syms: tuple[str, ...], pair: tuple[str, str]
) -> tuple[str, ...]:
    out: list[str] = []
    i, merged = 0, pair[0] + pair[1]
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == pair[0] and syms[i + 1] == pair[1]:
            out.append(merged)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def train_bpe(
    docs: DataFrame,
    n_merges: int = 200,
    min_count: int = 2,
    text_col: str = "text",
) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` BPE merges from the corpus. Returns the
    ordered merge table (rank = list position). Stops early when the best
    remaining pair occurs fewer than ``min_count`` times (merging noise
    learns nothing). Deterministic: (count DESC, pair ASC) selection."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    rows = (
        word_freqs(docs, text_col)
        .limit(MAX_WORD_VOCAB + 1)
        .collect()
    )
    if len(rows) > MAX_WORD_VOCAB:
        raise ValueError(
            f"word vocabulary exceeds {MAX_WORD_VOCAB}; BPE training "
            "funnels the word-frequency dict through the driver — shard "
            "the corpus or pre-truncate the tail"
        )
    if not rows:
        raise ValueError("empty corpus: no words to train BPE on")
    words: dict[tuple[str, ...], int] = {
        tuple(r["word"]) + (EOW,): int(r["n"]) for r in rows
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts = _pair_counts(words)
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if counts[best] < min_count:
            break
        merges.append(best)
        words = {_merge_word(s, best): n for s, n in words.items()}
    return merges


def bpe_encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Canonical BPE encode: repeatedly merge the LOWEST-RANK adjacent
    pair (training order) until none of the word's pairs are in the merge
    table. The ``</w>`` sentinel stays on the final token."""
    syms = list(word) + [EOW]
    while len(syms) > 1:
        pairs = [(ranks.get((a, b)), i)
                 for i, (a, b) in enumerate(zip(syms, syms[1:]))]
        ranked = [(r, i) for r, i in pairs if r is not None]
        if not ranked:
            break
        r_best = min(ranked)[0]
        out: list[str] = []
        i = 0
        while i < len(syms):
            if (
                i + 1 < len(syms)
                and ranks.get((syms[i], syms[i + 1])) == r_best
            ):
                out.append(syms[i] + syms[i + 1])
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


_SIMPLE_RE = re.compile(r"[a-z0-9]+")


def bpe_encode_udf(merges: list[tuple[str, str]]):
    """pandas UDF: text -> array<string> of BPE tokens under the learned
    merge table (simple-analyzer word split first, like training). The
    merge table broadcasts via closure capture — it is merge-count-sized,
    not corpus-sized."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}

    @F.pandas_udf(ArrayType(StringType()))
    def _enc(s):
        def one(text: str | None) -> list[str]:
            out: list[str] = []
            for w in _SIMPLE_RE.findall((text or "").lower()):
                out += bpe_encode_word(w, ranks)
            return out

        return s.map(one)

    return _enc


def wordpiece_encode_word(
    word: str,
    vocab: set[str],
    unk: str = "[UNK]",
    max_chars: int = 100,
) -> list[str]:
    """Greedy longest-match-first WordPiece (the BERT tokenizer's exact
    inference loop): the first piece matches verbatim, continuations
    carry the ``##`` prefix; any unmatchable position (or a word past
    ``max_chars``) collapses the WHOLE word to ``unk``."""
    if len(word) > max_chars:
        return [unk]
    out: list[str] = []
    start = 0
    while start < len(word):
        end = len(word)
        piece = None
        while end > start:
            sub = word[start:end]
            if start > 0:
                sub = "##" + sub
            if sub in vocab:
                piece = sub
                break
            end -= 1
        if piece is None:
            return [unk]
        out.append(piece)
        start = end
    return out


def wordpiece_encode_udf(
    vocab: list[str] | set[str], unk: str = "[UNK]", max_chars: int = 100
):
    """pandas UDF: text -> array<string> of WordPiece tokens against
    ``vocab`` (any iterable of pieces, ``##``-prefixed continuations
    included) — the native replacement for functions/wordpiece.py's
    optional HF slot."""
    vset = set(vocab)

    @F.pandas_udf(ArrayType(StringType()))
    def _enc(s):
        def one(text: str | None) -> list[str]:
            out: list[str] = []
            for w in _SIMPLE_RE.findall((text or "").lower()):
                out += wordpiece_encode_word(w, vset, unk, max_chars)
            return out

        return s.map(one)

    return _enc


def bpe_vocab(merges: list[tuple[str, str]], docs: DataFrame,
              text_col: str = "text") -> list[str]:
    """The token vocabulary a merge table induces over a corpus: the
    corpus alphabet (+ ``</w>``) plus every merge product. Sorted for
    determinism."""
    alpha_rows = (
        docs.select(
            F.explode(
                F.split(
                    F.concat_ws(
                        "", simple_tokens_col(F.col(text_col))
                    ),
                    "",
                )
            ).alias("ch")
        )
        .filter(F.col("ch") != "")
        .distinct()
        .collect()
    )
    vocab = {r["ch"] for r in alpha_rows} | {EOW}
    vocab |= {a + b for a, b in merges}
    return sorted(vocab)
