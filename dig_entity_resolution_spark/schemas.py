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

# 128-bit record id (ERConfig.id_bits=128): two independently seeded
# xxhash64 halves — collision-safe at 10^12-doc scale where the 64-bit
# birthday bound expects ~27k silent url merges (functions.hashing)
ID128 = T.StructType(
    [
        T.StructField("hi", T.LongType(), False),
        T.StructField("lo", T.LongType(), False),
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
        # snapshot timestamp of the resolved crawl — run_incremental's
        # latest-wins mode compares it to decide whether a recrawled url
        # replaces the base snapshot (NULL when the source has no ts)
        T.StructField("warc_ts", T.TimestampType(), True),
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


def records_schema(id_bits: int = 64) -> T.StructType:
    """RECORDS with the configured id width: 64 → LongType record_id,
    128 → struct<hi,lo>. Every downstream operator is id-type-agnostic
    (joins, least/greatest, min, xxhash64 all accept structs), so only
    the schema gate needs to know."""
    if id_bits == 64:
        return RECORDS
    if id_bits != 128:
        raise ValueError(f"id_bits must be 64 or 128, got {id_bits}")
    return T.StructType(
        [
            T.StructField("record_id", ID128, False)
            if f.name == "record_id"
            else f
            for f in RECORDS.fields
        ]
    )


class SchemaDriftError(RuntimeError):
    pass


def _denull(dt: T.DataType) -> T.DataType:
    """Strip nullability RECURSIVELY — parquet round-trips and expression
    derivations rewrite containsNull/valueContainsNull/nested-field
    nullability freely (the struct record_id surfaced this: xxhash64-derived
    struct fields come back nullable)."""
    if isinstance(dt, T.StructType):
        return T.StructType(
            [T.StructField(f.name, _denull(f.dataType), True) for f in dt.fields]
        )
    if isinstance(dt, T.ArrayType):
        return T.ArrayType(_denull(dt.elementType), True)
    if isinstance(dt, T.MapType):
        return T.MapType(_denull(dt.keyType), _denull(dt.valueType), True)
    return dt


def validate_schema(df: DataFrame, expected: T.StructType, table: str) -> DataFrame:
    """Fail fast when a checkpointed table no longer matches its contract.

    Nullability is advisory in parquet round-trips, so compare
    (name, nullability-stripped dataType) pairs only.
    """
    got = [(f.name, _denull(f.dataType)) for f in df.schema.fields]
    want = [(f.name, _denull(f.dataType)) for f in expected.fields]
    if got != want:
        raise SchemaDriftError(f"{table}: schema drift\n  got:  {got}\n  want: {want}")
    return df
