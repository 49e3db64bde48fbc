"""Sources & sinks: TSV queries/corpus, JSONL corpus, TREC runs, qrels.

Spark-native twins of the reference's readers/writers (SURVEY.md §2.1):
  S1  TSV scan          (densify_query.py:78-80, data_reader.py:18-24)
  S2  JSONL corpus scan (tokenize_corpus.py:11-26)
  S9  TREC run scan     (merge.result.py:22-28, data_reader.py:45-60)
  S10 qrels scan        (rcap_eval.py:11-18)
  S11 TREC run sink     (gip_retrieval.py:329-342, util.py:46-76)

All are schema-pinned `spark.read` calls — splittable, predicate-pushdown-
capable, and codec-transparent (.gz handled by Spark), unlike the
reference's line-at-a-time Python loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TREC_RUN_SCHEMA = "qid string, q0 string, docid long, rank int, score double, tag string"
QRELS_SCHEMA = "qid string, it string, docid long, rel int"


def read_tsv_queries(spark: SparkSession, path: str) -> DataFrame:
    """qid \\t text  (S1)."""
    return spark.read.csv(path, sep="\t", schema="qid string, text string")


def read_tsv_corpus(spark: SparkSession, path: str) -> DataFrame:
    """docid \\t text  (S1 corpus flavor)."""
    return spark.read.csv(path, sep="\t", schema="docid long, text string")


def read_jsonl_corpus(
    spark: SparkSession, path: str, id_field: str = "id", text_field: str = "contents"
) -> DataFrame:
    """JSONL {"id":…, "contents":…} -> (docid, text); field names match the
    reference's DATA_ITEM map (tokenize_corpus.py:11-12). Gzip transparent."""
    return (
        spark.read.schema(f"{id_field} string, {text_field} string")
        .json(path)
        .select(
            F.col(id_field).cast("long").alias("docid"),
            F.col(text_field).alias("text"),
        )
    )


def read_trec_run(spark: SparkSession, path: str) -> DataFrame:
    """`qid Q0 docid rank score tag` -> (qid, docid, rank, score)  (S9)."""
    return (
        spark.read.csv(path, sep=" ", schema=TREC_RUN_SCHEMA)
        .select("qid", "docid", "rank", "score")
    )


def read_qrels(spark: SparkSession, path: str) -> DataFrame:
    """`qid 0 docid rel` TSV -> (qid, docid, rel)  (S10)."""
    return (
        spark.read.csv(path, sep="\t", schema=QRELS_SCHEMA)
        .select("qid", "docid", "rel")
    )


def trec_run_lines(
    run: DataFrame, run_name: str = "dhr_spark", self_hit_filter: bool = False
) -> DataFrame:
    """(qid, docid, line): TREC-format lines `qid Q0 docid rank score tag`.

    ``self_hit_filter`` drops docid == qid rows the way the reference does at
    write time for symmetric corpora (gip_retrieval.py:340, P4)."""
    out = run
    if self_hit_filter:
        out = out.filter(F.col("docid").cast("string") != F.col("qid"))
    return out.select(
        "qid",
        "docid",
        F.concat_ws(
            " ",
            F.col("qid"),
            F.lit("Q0"),
            F.col("docid").cast("string"),
            F.col("rank").cast("string"),
            F.format_string("%.4f", F.col("score")),
            F.lit(run_name),
        ).alias("line"),
    )


def write_trec_run(
    run: DataFrame, path: str, run_name: str = "dhr_spark", single_file: bool = False
) -> None:
    """TREC sink (S11). ``single_file`` coalesces for eval-tool compatibility;
    leave False at scale (one part per partition, same as the reference's
    per-shard run files pre-merge)."""
    lines = trec_run_lines(run, run_name).select("line")
    if single_file:
        lines = lines.coalesce(1)
    lines.write.mode("overwrite").text(path)
