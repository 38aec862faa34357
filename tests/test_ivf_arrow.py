"""IVF assignment kernels: the Arrow argmin path must agree with the
Catalyst higher-order fold exactly (same centroids, same tie-break)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from s2_geometry_kotlin_spark.session import get_spark
    s = get_spark("ivf-arrow-tests", cpus=4, shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


def test_arrow_assignment_matches_hof(spark):
    from s2_geometry_kotlin_spark.operators import similarity as sim

    sf = "/root/testdata/sf0.001"
    emb = (spark.read.parquet(f"{sf}/embeddings.parquet")
           .select("vec_id",
                   F.col("embedding").cast("array<double>").alias("v")))
    cents = sim._ivf_centroids(sim._ivf_train_path(sf))
    arrow = sim.ivf_assign_arrow(emb, cents).select("vec_id", "cid")
    hof = emb.withColumn(
        "cid", sim._ivf_assign_expr(cents, F.col("v")).cid
    ).select("vec_id", "cid")
    a = {r["vec_id"]: r["cid"] for r in arrow.collect()}
    h = {r["vec_id"]: r["cid"] for r in hof.collect()}
    assert a == h
    assert len(a) > 0
