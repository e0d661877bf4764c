"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship ER slice on sf0.001 (token blocking → shared-token
                edges → large-star/small-star connected components →
                cluster-size histogram).
queries()     — one entry per implemented operator (SURVEY.md §2), from
                dig_entity_resolution_spark.queries.
oracle_sql()  — DuckDB twins for every SQL-expressible query.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dig_entity_resolution_spark import queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: end-to-end blocking →
    pairing → transitive clustering, returning the cluster-size histogram."""
    sf_dir = "/root/testdata/sf0.001"
    clusters = Q.spark_queries()["connected_components"](spark, sf_dir)
    return (
        clusters.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .groupBy("n_members")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .orderBy("n_members")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return Q.spark_queries()


def oracle_sql() -> dict[str, str]:
    return Q.oracle_queries()
