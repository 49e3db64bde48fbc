"""Tokenization -> per-doc term frequencies + doc lengths (SURVEY.md A1/A2).

Reference analogue: per-query TF accumulation ``vector[term] += 1``
(/root/reference/densify/densify_query.py:86-89) and per-doc Lucene term
vectors (/root/reference/densify/output_vector.py:24-31). Here both corpus
and query side share one exploded hash-aggregate path — map-side partial
aggregation is free from Catalyst.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dhr_spark.functions.analyzer import _ANALYZERS, simple_tokens_col, tokenize_udf

FUSED_SCHEMA = "docid long, term string, tf long, dl long, first boolean"


def with_tokens(df: DataFrame, text_col: str = "text", mode: str = "lucene") -> DataFrame:
    """Adds ``tokens array<string>``. ``lucene`` mode = Arrow UDF chain;
    ``simple`` mode = pure Column expression (whole-stage codegen)."""
    if mode == "simple":
        tok = simple_tokens_col(F.col(text_col))
    else:
        tok = tokenize_udf(mode)(F.col(text_col))
    return df.withColumn("tokens", tok)


def term_freqs(docs_tok: DataFrame, id_col: str = "docid") -> DataFrame:
    """(id, term, tf): explode + hash agg. Empty-token docs drop out here but
    stay in doc_lengths with dl=0 (reference empty-text guard, data.py:240)."""
    return (
        docs_tok.select(id_col, F.explode("tokens").alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )


def doc_lengths(docs_tok: DataFrame, id_col: str = "docid") -> DataFrame:
    """(id, dl): token count per document (BM25 length norm input)."""
    return docs_tok.select(id_col, F.size("tokens").alias("dl"))


def doc_term_freqs(
    docs: DataFrame, text_col: str = "text", mode: str = "lucene"
) -> DataFrame:
    """Fused analyze+aggregate: (docid, text) -> (docid, term, tf, dl, first).

    The index build's hot path. Because every token of a document lives in
    ONE input row, per-doc term frequencies and doc length need no shuffle at
    all — they are per-row computations. The separate explode -> groupBy
    (docid, term) plan is correct but pays an exchange Catalyst can't elide
    (it can't prove the grouping key is row-local); fusing into one Arrow
    kernel removes that exchange AND the doc-length join, leaving the
    segment-clustering groupBy as the build's only wide shuffle.

    Row contract: one row per distinct (doc, term); `dl` on every row;
    `first` marks one row per doc (corpus stats = count_if(first) /
    avg-if(first)). Empty documents emit a single (docid, NULL, 0, 0, true)
    sentinel so n_docs/avgdl still count them (reference empty-text guard,
    data.py:240-241).
    """
    analyze = _ANALYZERS[mode]
    src = docs.select(F.col("docid"), F.col(text_col).alias("_text"))

    def kernel(batches):
        # mapInArrow, not mapInPandas: building a pandas object column for
        # 10^7 term strings costs more than the analysis itself (measured
        # 7.1s pandas vs 0.1s arrow per 61k-doc partition). Per-doc work is
        # ONLY analyze + Counter + list appends; array construction is one
        # vectorized np.repeat/cumsum per batch.
        import pyarrow as pa

        for batch in batches:
            if batch.num_rows == 0:
                continue
            in_docids = batch.column(0).to_numpy(zero_copy_only=False)
            texts = batch.column(1).to_pylist()
            counts: list[int] = []
            dls: list[int] = []
            terms: list[str | None] = []
            tfs: list[int] = []
            for text in texts:
                c = Counter(analyze(text)) if isinstance(text, str) else {}
                if c:
                    counts.append(len(c))
                    dls.append(sum(c.values()))
                    terms.extend(c.keys())
                    tfs.extend(c.values())
                else:
                    counts.append(1)
                    dls.append(0)
                    terms.append(None)
                    tfs.append(0)
            counts_a = np.asarray(counts, dtype=np.int64)
            total = int(counts_a.sum())
            first = np.zeros(total, dtype=bool)
            first[np.concatenate(([0], np.cumsum(counts_a)[:-1]))] = True
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.repeat(in_docids, counts_a), type=pa.int64()),
                    pa.array(terms, type=pa.string()),
                    pa.array(np.asarray(tfs, dtype=np.int64), type=pa.int64()),
                    pa.array(
                        np.repeat(np.asarray(dls, dtype=np.int64), counts_a),
                        type=pa.int64(),
                    ),
                    pa.array(first),
                ],
                names=["docid", "term", "tf", "dl", "first"],
            )

    return src.mapInArrow(kernel, FUSED_SCHEMA)


def query_term_freqs(queries_tok: DataFrame) -> DataFrame:
    """(qid, term, qtf) — query term frequency as scoring weight
    (densify_query.py:86-89)."""
    return term_freqs(queries_tok, id_col="qid").withColumnRenamed("tf", "qtf")
