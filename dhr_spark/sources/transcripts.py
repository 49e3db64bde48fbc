"""Transcript-table source: Iceberg-catalog or parquet-path, schema-pinned.

The engine's contract input (BASELINE.json input_hint) is an Iceberg table of
multi-turn transcripts with columns

    conv_id:string, turn_idx:int, role:string, text:string,
    tool:string, ts:timestamp

``read_transcripts`` resolves either source kind and then VALIDATES +
canonicalizes the frame, so every downstream operator (index build, conv
reshaping, streaming compaction) sees exactly one shape:

  * ``table:db.transcripts``  (or any name without a '/')   → catalog read
    via ``spark.read.table`` — works against Iceberg/Hive/Unity catalogs
    configured with the usual ``--conf spark.sql.catalog.*`` submit flags;
    the read is format-transparent from here on and keeps Iceberg's
    partition pruning + column pruning (it is a plain DataSourceV2 scan).
  * a path (contains '/' or ends in .parquet)                → parquet read.

Validation is strict: missing columns raise; surplus columns are dropped;
safe type mismatches (int32/int64, string/varchar) are cast; an
incompatible type raises rather than silently coercing. No data movement —
everything is a projection on the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TRANSCRIPT_FIELDS: list[tuple[str, T.DataType]] = [
    ("conv_id", T.StringType()),
    ("turn_idx", T.IntegerType()),
    ("role", T.StringType()),
    ("text", T.StringType()),
    ("tool", T.StringType()),
    ("ts", T.TimestampType()),
]

# widenings/narrowings we accept silently (lossless for the contract's use)
_SAFE_CASTS: dict[type, tuple[type, ...]] = {
    T.IntegerType: (T.ByteType, T.ShortType, T.LongType),
    T.StringType: (T.VarcharType, T.CharType),
    T.TimestampType: (T.TimestampNTZType,),
}


def canonicalize_transcripts(df: DataFrame) -> DataFrame:
    """Project ``df`` onto the transcript contract schema (order, names,
    types); raise ValueError naming every missing/incompatible column."""
    by_name = {f.name: f.dataType for f in df.schema.fields}
    problems: list[str] = []
    cols = []
    for name, want in TRANSCRIPT_FIELDS:
        have = by_name.get(name)
        if have is None:
            problems.append(f"missing column {name!r} ({want.simpleString()})")
            continue
        if have == want:
            cols.append(F.col(name))
        elif isinstance(have, _SAFE_CASTS.get(type(want), ())):
            col = F.col(name)
            if isinstance(have, T.LongType) and isinstance(want, T.IntegerType):
                # narrowing: with ANSI off an out-of-range int64 silently
                # becomes NULL and breaks stable turn ordering — fail fast at
                # execution instead (the guard is codegen'd scalar math)
                col = F.when(
                    col.between(-(2**31), 2**31 - 1), col
                ).otherwise(
                    F.raise_error(
                        F.concat(
                            F.lit(
                                f"transcripts column {name!r}: int64 value "
                            ),
                            col.cast("string"),
                            F.lit(" overflows the contract's int32"),
                        )
                    )
                )
            cols.append(col.cast(want).alias(name))
        else:
            problems.append(
                f"column {name!r} has incompatible type "
                f"{have.simpleString()} (want {want.simpleString()})"
            )
    if problems:
        raise ValueError(
            "transcripts source does not match the contract schema: "
            + "; ".join(problems)
        )
    return df.select(*cols)


def read_transcripts(
    spark: SparkSession, source: str, fmt: str | None = None
) -> DataFrame:
    """Load a transcripts table from an Iceberg/Hive catalog name or a
    parquet path and canonicalize it to the contract schema.

    ``fmt``: force "table" or "parquet"; default infers (a '/'-free name
    that isn't a file → catalog table).
    """
    if fmt is None:
        fmt = "parquet" if ("/" in source or source.endswith(".parquet")) else "table"
    if fmt == "table":
        raw = spark.read.table(source.removeprefix("table:"))
    elif fmt == "parquet":
        raw = spark.read.parquet(source)
    else:
        raise ValueError(f"unknown transcripts format {fmt!r}")
    return canonicalize_transcripts(raw)
