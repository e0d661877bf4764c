"""Fixed StructType schemas for every pipeline table (SURVEY.md §1.2).

The reference era inferred ad-hoc JSON shapes per script; we pin explicit
schemas and fail fast on drift (validate_schema below).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

PAGES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

RECORDS = T.StructType(
    [
        T.StructField("record_id", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("norm_text", T.StringType(), True),
        T.StructField("tokens", T.ArrayType(T.StringType()), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

BLOCKS = T.StructType(
    [
        T.StructField("block_key", T.StringType(), False),
        T.StructField("strategy", T.StringType(), False),
        T.StructField("record_id", T.LongType(), False),
        T.StructField("salt", T.IntegerType(), False),
    ]
)

CAND_PAIRS = T.StructType(
    [
        T.StructField("id1", T.LongType(), False),
        T.StructField("id2", T.LongType(), False),
    ]
)

SCORED_PAIRS = T.StructType(
    [
        T.StructField("id1", T.LongType(), False),
        T.StructField("id2", T.LongType(), False),
        T.StructField("jw", T.DoubleType(), True),
        T.StructField("lev_sim", T.DoubleType(), True),
        T.StructField("tfidf_cos", T.DoubleType(), True),
        T.StructField("score", T.DoubleType(), True),
        T.StructField("is_match", T.BooleanType(), True),
    ]
)

EDGES = T.StructType(
    [
        T.StructField("src", T.LongType(), False),
        T.StructField("dst", T.LongType(), False),
    ]
)

CLUSTERS = T.StructType(
    [
        T.StructField("record_id", T.LongType(), False),
        T.StructField("cluster_id", T.LongType(), False),
    ]
)

LABELS = T.StructType(
    [
        T.StructField("id1", T.LongType(), False),
        T.StructField("id2", T.LongType(), False),
        T.StructField("label", T.BooleanType(), False),
    ]
)

META = T.StructType(
    [
        T.StructField("stage", T.StringType(), False),
        T.StructField("run_id", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("rows_out", T.LongType(), False),
        T.StructField("total_rows", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
    ]
)


class SchemaDriftError(RuntimeError):
    pass


def validate_schema(df: DataFrame, expected: T.StructType, table: str) -> DataFrame:
    """Fail fast when a checkpointed table no longer matches its contract.

    Nullability is advisory in parquet round-trips, so compare (name, dataType)
    pairs only.
    """
    got = [(f.name, f.dataType) for f in df.schema.fields]
    want = [(f.name, f.dataType) for f in expected.fields]
    if got != want:
        raise SchemaDriftError(f"{table}: schema drift\n  got:  {got}\n  want: {want}")
    return df
