"""Materialize a 10x 'sf1' table set for the full-board run (VERDICT
r5 item 8: push value-checked correctness to the bench anchor scale).

No sf1 parquet is provided by the driver, so sf1 is CONSTRUCTED from
sf0.1: the three data tables the registry queries read (documents,
embeddings, events) are replicated 10x with ids remapped to stay
unique (id * 10 + rep); replicas keep their payloads, which makes the
documents corpus the heavy-duplication (mirror-page) regime — the
regime that dominates at 100 TB.  The TPC-H dimension/fact tables are
copied verbatim (no registry query aggregates them at scale).  Both
Spark and the DuckDB oracles read the SAME parquet, so every row stays
value-checked.

Usage: python scripts/board_sf1_prep.py [out_dir]
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
REPL = 10
REPLICATED = {"documents": "doc_id", "embeddings": "vec_id",
              "events": "event_id"}
COPIED = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem"]


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/s2_sf1"
    os.makedirs(out, exist_ok=True)
    from pyspark.sql import functions as F

    from s2_geometry_kotlin_spark.session import get_spark
    spark = get_spark("sf1-prep", cpus=16, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    for t in COPIED:
        dst = f"{out}/{t}.parquet"
        if os.path.isdir(dst):
            shutil.rmtree(dst)
        elif os.path.exists(dst):
            os.unlink(dst)
        shutil.copyfile(f"{SRC}/{t}.parquet", dst)
    import glob
    for t, key in REPLICATED.items():
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        tmp = f"{out}/_tmp_{t}"
        # single part file so DuckDB's read_parquet('<path>') sees a
        # plain file, exactly like the driver's testdata layout
        (df.withColumn("rep", F.explode(F.array(
             *[F.lit(i) for i in range(REPL)])))
         .withColumn(key, F.col(key) * REPL + F.col("rep"))
         .drop("rep")
         .coalesce(1)
         .write.mode("overwrite").parquet(tmp))
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        dst = f"{out}/{t}.parquet"
        if os.path.exists(dst):
            (shutil.rmtree if os.path.isdir(dst) else os.unlink)(dst)
        shutil.move(part, dst)
        shutil.rmtree(tmp)
        n = spark.read.parquet(dst).count()
        print(t, n, flush=True)
    spark.stop()
    print(f"MATERIALIZED {out}")


if __name__ == "__main__":
    main()
