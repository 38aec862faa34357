"""Per-partition lineage + resumable jobs (SURVEY.md §4.3.3).

The north_rule requires jobs resumable from checkpoint with per-partition
lineage and metrics.  On a real deployment the output table is Iceberg
and the lineage rows carry the Iceberg snapshot id per commit; the
sandbox has no Iceberg runtime, so outputs are partitioned parquet and
the lineage table is a parquet log with the same schema
(job_id, partition_key, status, n_rows, wall_sec, committed_at,
snapshot_id) — the snapshot column holds the batch commit token here.

Resume protocol: completed partition keys are anti-joined away before
any work happens, so a restarted job only touches unfinished partitions.
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE_SCHEMA = ("job_id string, partition_key string, status string, "
                  "n_rows long, wall_sec double, committed_at timestamp, "
                  "snapshot_id string")


def _lineage_path(output_dir: str) -> str:
    return os.path.join(output_dir, "_lineage")


def completed_partitions(spark: SparkSession, output_dir: str,
                         job_id: str) -> set[str]:
    path = _lineage_path(output_dir)
    try:
        df = spark.read.parquet(path)
    except Exception:
        return set()
    rows = (df.where((F.col("job_id") == job_id) &
                     (F.col("status") == "done"))
            .select("partition_key").distinct().collect())
    return {r[0] for r in rows}


def parquet_snapshot_provider(spark: SparkSession, output_dir: str) -> str:
    """Default snapshot provider: a fresh commit token (parquet has no
    table-level snapshots).  On an Iceberg deployment, pass
    `iceberg_snapshot_provider` instead."""
    return uuid.uuid4().hex


def iceberg_snapshot_provider(table: str):
    """Snapshot provider for Iceberg sinks: resolves the table's current
    snapshot id after the append commit, so lineage rows pin the exact
    Iceberg snapshot a partition landed in (north_rule: resumable from
    Iceberg-snapshot checkpoints).  Usable only where an Iceberg catalog
    is configured; the sandbox has no Iceberg runtime, so this is
    exercised by tests through a stub provider with the same signature."""
    def provide(spark: SparkSession, output_dir: str) -> str:
        row = spark.sql(
            f"SELECT snapshot_id FROM {table}.snapshots "
            f"ORDER BY committed_at DESC LIMIT 1").collect()
        return str(row[0][0]) if row else ""
    return provide


def run_resumable(spark: SparkSession, df: DataFrame, partition_col: str,
                  output_dir: str, job_id: str,
                  only_partitions: set[str] | None = None,
                  snapshot_provider=None) -> dict:
    """Write `df` partitioned by `partition_col`, skipping partitions the
    lineage already records as done.  `only_partitions` restricts the run
    (used by tests to simulate an interrupted job).  Returns metrics.

    `snapshot_provider(spark, output_dir) -> str` pins each lineage row
    to the sink's commit snapshot (Iceberg snapshot id on a real
    deployment; a parquet commit token here)."""
    t0 = time.time()
    done = completed_partitions(spark, output_dir, job_id)
    work = df.withColumn("__pk", F.col(partition_col).cast("string"))
    if done:
        work = work.where(~F.col("__pk").isin(sorted(done)))
    if only_partitions is not None:
        work = work.where(F.col("__pk").isin(sorted(only_partitions)))
    counts = {r["__pk"]: r["n"] for r in
              work.groupBy("__pk").agg(F.count("*").alias("n")).collect()}
    if not counts:
        return {"written_partitions": 0, "skipped": len(done),
                "wall_sec": round(time.time() - t0, 3)}
    (work.drop(partition_col)
     .withColumnRenamed("__pk", partition_col)
     .write.partitionBy(partition_col)
     .mode("append").parquet(os.path.join(output_dir, "data")))
    provider = snapshot_provider or parquet_snapshot_provider
    snapshot = provider(spark, output_dir)
    wall = time.time() - t0
    lineage_rows = [(job_id, pk, "done", int(n), round(wall, 3),
                     None, snapshot) for pk, n in counts.items()]
    ldf = spark.createDataFrame(lineage_rows, LINEAGE_SCHEMA) \
        .withColumn("committed_at", F.current_timestamp())
    ldf.write.mode("append").parquet(_lineage_path(output_dir))
    return {"written_partitions": len(counts), "skipped": len(done),
            "rows": int(sum(counts.values())),
            "wall_sec": round(wall, 3), "snapshot_id": snapshot}
