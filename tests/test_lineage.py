"""Resume protocol: an interrupted partitioned job completes on rerun
without recomputing finished partitions."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from s2_geometry_kotlin_spark.session import get_spark
    s = get_spark("lineage-tests", cpus=8, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


def test_resume_skips_completed_partitions(spark, tmp_path_factory):
    from s2_geometry_kotlin_spark import functions as s2f
    from s2_geometry_kotlin_spark.plans import lineage as L
    from s2_geometry_kotlin_spark.sources import pages as P

    out = str(tmp_path_factory.mktemp("resumable_out"))
    geo = (P.geoparse(P.load_pages(spark, "/root/testdata/sf0.001"))
           .where(F.col("lat").isNotNull())
           .select("url", "lat", "lon")
           .withColumn("cell_id", s2f.s2_cellid("lat", "lon"))
           .withColumn("face", F.shiftrightunsigned("cell_id", 61)
                       .cast("string")))

    all_faces = {r[0] for r in geo.select("face").distinct().collect()}
    assert len(all_faces) >= 4
    half = set(sorted(all_faces)[: len(all_faces) // 2])

    # "crash" after writing only half the partitions
    m1 = L.run_resumable(spark, geo, "face", out, "job1",
                         only_partitions=half)
    assert m1["written_partitions"] == len(half)
    assert L.completed_partitions(spark, out, "job1") == half

    # resume: finishes the rest, skips the done ones
    m2 = L.run_resumable(spark, geo, "face", out, "job1")
    assert m2["written_partitions"] == len(all_faces) - len(half)
    assert m2["skipped"] == len(half)

    # third run is a no-op
    m3 = L.run_resumable(spark, geo, "face", out, "job1")
    assert m3["written_partitions"] == 0

    # output equals the full dataset exactly (no dups, no gaps)
    got = spark.read.parquet(f"{out}/data")
    assert got.count() == geo.count()
    assert got.select("url").distinct().count() == \
        geo.select("url").distinct().count()


def test_pluggable_snapshot_provider(spark, tmp_path_factory):
    """Lineage rows pin the snapshot id returned by the injected
    provider (Iceberg snapshot id on a real deployment)."""
    from pyspark.sql import functions as F
    from s2_geometry_kotlin_spark.plans import lineage as L

    out = str(tmp_path_factory.mktemp("snap_out"))
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 3).cast("string").alias("bucket"))
    calls = []

    def fake_iceberg_provider(spark_, output_dir_):
        calls.append(output_dir_)
        return f"iceberg-snap-{len(calls)}"

    m1 = L.run_resumable(spark, df, "bucket", out, "jobS",
                         only_partitions={"0"},
                         snapshot_provider=fake_iceberg_provider)
    assert m1["snapshot_id"] == "iceberg-snap-1"
    m2 = L.run_resumable(spark, df, "bucket", out, "jobS",
                         snapshot_provider=fake_iceberg_provider)
    assert m2["snapshot_id"] == "iceberg-snap-2"
    assert m2["skipped"] == 1
    lin = spark.read.parquet(f"{out}/_lineage")
    snaps = {r["partition_key"]: r["snapshot_id"] for r in lin.collect()}
    # each partition's lineage row carries the snapshot of ITS commit
    assert snaps["0"] == "iceberg-snap-1"
    assert snaps["1"] == snaps["2"] == "iceberg-snap-2"
