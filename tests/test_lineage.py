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
