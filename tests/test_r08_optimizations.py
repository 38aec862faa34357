"""r8 optimization-round regression tests: every optimization that
changed an operator's internals is pinned against its pre-r8 semantics.

- make_pip_udf(with_interior=True) must equal `is_interior | pip(...)`
- make_pip_sql_predicate's single-evaluation crossing form must equal
  the Arrow-kernel verdicts (join-level equality)
- connected_components(assume_distinct=True) must equal the default on
  already-distinct pairs (and tolerate duplicate-edge inputs when the
  flag is off)
- the driver-side covering memos must return the same rows as a fresh
  computation
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from s2_geometry_kotlin_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("S2_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def spark():
    sp = get_spark("test-r08", cpus=4, shuffle_partitions=4)
    sp.sparkContext.setLogLevel("ERROR")
    yield sp


@pytest.fixture(scope="module")
def geo(spark):
    from s2_geometry_kotlin_spark import functions as s2f
    from s2_geometry_kotlin_spark.sources import pages as P
    df = (P.geoparse(P.load_pages(spark, SF_DIR))
          .where(F.col("lat").isNotNull())
          .select("url", "lat", "lon")
          .withColumn("cell_id", s2f.s2_cellid("lat", "lon"))).cache()
    df.count()
    return df


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_pip_udf_interior_equivalence(spark, geo):
    """with_interior=True (kernel skipped on fast-accept rows) must
    produce exactly the rows of `is_interior OR pip(...)`."""
    from s2_geometry_kotlin_spark.operators import spatial_join as SJ
    from s2_geometry_kotlin_spark.sources.layers import fixture_layer
    layer = fixture_layer()
    rows = SJ.build_covering_rows(layer)
    cov = spark.createDataFrame(rows, SJ._COV_SCHEMA)
    levels = sorted({r[3] for r in rows})
    parents = F.array(*[
        (F.col("cell_id").bitwiseAND(F.lit(~(2 * (1 << (2 * (30 - lv))) - 1)))
         .bitwiseOR(F.lit(1 << (2 * (30 - lv))))).cast("long")
        for lv in levels])
    joined = (geo.withColumn("probe_cell", F.explode(parents))
              .join(F.broadcast(cov.withColumnRenamed("cell_id",
                                                      "probe_cell")),
                    "probe_cell", "inner"))
    plain = SJ.make_pip_udf(layer)
    fused = SJ.make_pip_udf(layer, with_interior=True)
    old = joined.where(
        F.col("is_interior") | plain(F.col("polygon_id"), F.col("lat"),
                                     F.col("lon"))
    ).select("url", "layer", "polygon_id")
    new = joined.where(
        fused(F.col("polygon_id"), F.col("lat"), F.col("lon"),
              F.col("is_interior"))
    ).select("url", "layer", "polygon_id")
    assert _rows(old) == _rows(new)


def test_sqlverify_equals_kernel(spark, geo):
    """The r8 single-evaluation crossing fold (branch on sign(op.c),
    precomputed op columns) must match the Arrow-kernel join rows."""
    from s2_geometry_kotlin_spark.operators.spatial_join import spatial_join
    from s2_geometry_kotlin_spark.sources.layers import fixture_layer
    layer = fixture_layer()
    kernel = spatial_join(geo, spark, layer, strategy="broadcast")
    sql = spatial_join(geo, spark, layer, strategy="broadcast",
                       verify="sql")
    assert _rows(kernel) == _rows(sql)


def test_components_assume_distinct_equivalence(spark):
    from s2_geometry_kotlin_spark.operators.components import \
        connected_components
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9), (10, 11), (11, 12), (3, 5)],
        "doc_a long, doc_b long")
    base = connected_components(pairs)
    fast = connected_components(pairs, assume_distinct=True)
    assert _rows(base) == _rows(fast)
    # duplicate edges with the flag OFF must still converge identically
    dup = pairs.unionAll(pairs)
    assert _rows(connected_components(dup)) == _rows(base)


def test_route_covering_memo(spark):
    from s2_geometry_kotlin_spark.operators import routes as R
    routes = R.fixture_routes()
    rad = 150000.0 / 6371010.0
    R._ROUTE_COV_CACHE.clear()
    fresh = R.buffered_route_covering(routes, rad, max_cells=64)
    memo = R.buffered_route_covering(routes, rad, max_cells=64)
    assert fresh is memo        # cache hit returns the same object
    R._ROUTE_COV_CACHE.clear()
    again = R.buffered_route_covering(routes, rad, max_cells=64)
    assert again == fresh       # recompute is deterministic


def test_query_covering_memo():
    from s2_geometry_kotlin_spark.operators import knn as K
    qs = [(0, 48.8566, 2.3522), (1, 40.7128, -74.006)]
    K._QCOV_CACHE.clear()
    fresh = K._query_covering_rows(qs, 0.02)
    memo = K._query_covering_rows(qs, 0.02)
    assert fresh is memo
    K._QCOV_CACHE.clear()
    assert K._query_covering_rows(qs, 0.02) == fresh
