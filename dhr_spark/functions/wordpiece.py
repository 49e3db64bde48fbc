"""Optional HuggingFace WordPiece tokenizer slot (SURVEY F3).

The reference tokenizes corpora with HF WordPiece for its neural models
(/root/reference/tokenize_corpus.py:28-34) and plugs encoders by name
(/root/reference/densify/densify_query.py:45-61). The BM25 path does not
need it, so this repo ships the slot, not the dependency: a vectorized
pandas-UDF factory that imports ``transformers`` lazily and fails with a
clear message where it is not installed (this container).

Native, dependency-free implementations of the ALGORITHMS live in
functions/subword.py: BPE training (distributed word counts + the HF
trainer's driver-side merge loop), merge-rank BPE encoding, and the real
greedy longest-match WordPiece encoder (what ``tokenizer.tokenize`` runs
inside HF) — use those where ``transformers`` is absent. The BPE-ish
regex counter (operators.textstats.BPE_RE) remains the cheap
SQL-expressible stand-in for counting.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType


def hf_wordpiece_udf(model_name: str = "bert-base-uncased"):
    """pandas UDF: text -> array<string> of WordPiece tokens
    (tokenizer.tokenize, add_special_tokens=False — tokenize_corpus.py:31).

    Raises ImportError where ``transformers`` is unavailable; callers that
    want a soft fallback should catch it and use the regex stand-in."""
    try:
        from transformers import AutoTokenizer  # noqa: PLC0415
    except ImportError as e:  # pragma: no cover - exercised by tests
        raise ImportError(
            "the WordPiece path needs the optional `transformers` package "
            "(not installed in this environment); use the BPE-ish regex "
            "stand-in in operators.textstats for counting, or install "
            "transformers to enable real WordPiece tokenization"
        ) from e

    tok = AutoTokenizer.from_pretrained(model_name, use_fast=True)

    @F.pandas_udf(ArrayType(StringType()))
    def _wp(s):
        return s.map(lambda t: tok.tokenize(t or ""))

    return _wp
