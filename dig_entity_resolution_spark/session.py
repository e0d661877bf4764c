"""SparkSession factory tuned for the ER workload.

Local-mode settings mirror what a multi-executor cluster submission
(`spark-submit --py-files er_engine.zip run_pipeline.py`) would set: AQE on
(runtime coalescing + skew-join splitting as belt-and-braces on top of our
explicit salting), Arrow enabled for the pandas-UDF scoring kernels, and
shuffle partitions sized to the parallelism level rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "dig_entity_resolution_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    cpus=None → local[*]. On a real cluster this function is still valid:
    spark-submit's --master wins over the builder's master for an existing
    session, and every .config here is cluster-appropriate.
    """
    if cpus is None:
        cpus_env = os.environ.get("SPARK_GRAFT_CPUS")
        cpus = int(cpus_env) if cpus_env else None
    master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus or (os.cpu_count() or 8), 8)
    # local-mode shuffles hit spark.local.dir hard at high parallelism;
    # 32 concurrent writers on real disk are 4-5x slower than tmpfs
    local_dir = os.environ.get("SPARK_LOCAL_DIRS")
    if not local_dir and os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm/spark-local"
        os.makedirs(local_dir, exist_ok=True)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # floor on scan parallelism (r8, guide §6): checkpointed stage
        # tables are small multi-file parquet locally, and the default
        # openCost packing hands a CPU-heavy consumer (LM scoring,
        # classifier, shingling) a handful of splits on a 32-core
        # session. Scale-adaptive by construction — derived from the
        # session's parallelism, not a constant; at real scale splits
        # already exceed it and it is a no-op.
        .config(
            "spark.sql.files.minPartitionNum", str(shuffle_partitions)
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Spark 4.1's partitioning-aware UnionExec (default on) zips
        # same-index partitions of identically-partitioned union children.
        # Under AQE each branch's shuffle stages coalesce INDEPENDENTLY, so
        # the two branches can materialize with different partition counts
        # and any downstream join that trusted the union's claimed
        # partitioning dies with "Can't zip RDDs with unequal numbers of
        # partitions" (hit by the incremental near-dup state plans, where
        # the optimizer pushes semi-joins through the assign/edges segment
        # unions and both branches end hash-partitioned on the same key).
        # Disable it: unions report UnknownPartitioning and EnsureRequirements
        # inserts the exchange, which is always sound.
        .config("spark.sql.unionOutputPartitioning", "false")
    )
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
