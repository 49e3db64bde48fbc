"""Tokenization -> per-doc term frequencies + doc lengths (SURVEY.md A1/A2).

Reference analogue: per-query TF accumulation ``vector[term] += 1``
(/root/reference/densify/densify_query.py:86-89) and per-doc Lucene term
vectors (/root/reference/densify/output_vector.py:24-31). Here both corpus
and query side share one exploded hash-aggregate path — map-side partial
aggregation is free from Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dhr_spark.functions.analyzer import simple_tokens_col, tokenize_udf


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


def query_term_freqs(queries_tok: DataFrame) -> DataFrame:
    """(qid, term, qtf) — query term frequency as scoring weight
    (densify_query.py:86-89)."""
    return term_freqs(queries_tok, id_col="qid").withColumnRenamed("tf", "qtf")
