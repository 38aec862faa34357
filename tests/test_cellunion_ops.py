"""DataFrame-level cell-union algebra (operators/cellunion.py) against
the scalar kernel implementations."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from s2_geometry_kotlin_spark.kernel import cellid as ck
from s2_geometry_kotlin_spark.kernel.coverer import RegionCoverer
from s2_geometry_kotlin_spark.kernel.coverer import normalize as knorm
from s2_geometry_kotlin_spark.kernel.regions import Cap


@pytest.fixture(scope="module")
def spark():
    from s2_geometry_kotlin_spark.session import get_spark
    s = get_spark("cu-tests", cpus=8, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


def _signed(v):
    return v - (1 << 64) if v >= (1 << 63) else v


def _cov(lat, lon, radius_deg, max_cells=16):
    return RegionCoverer(max_cells=max_cells).get_covering(
        Cap.from_latlng_radius_deg(lat, lon, radius_deg))


def test_normalize_df_matches_kernel(spark):
    from s2_geometry_kotlin_spark.operators import cellunion as cu
    cov = _cov(48.85, 2.35, 3.0)
    # denormalize to children then re-normalize through the DataFrame op
    children = []
    for cid in cov:
        children.extend(ck.sc_child(cid, p) for p in range(4))
    df = spark.createDataFrame(
        [(1, _signed(c)) for c in children], "geom_id long, cell_id long")
    got = sorted(r["cell_id"] for r in cu.normalize_df(df).collect())
    expect = sorted(_signed(c) for c in knorm(children))
    assert got == expect == sorted(_signed(c) for c in cov)


def test_leaf_cells_covered(spark):
    from s2_geometry_kotlin_spark.operators import cellunion as cu
    cov = _cov(10.0, 10.0, 1.0)
    df = spark.createDataFrame([(7, _signed(c)) for c in cov],
                               "geom_id long, cell_id long")
    got = cu.leaf_cells_covered(df).collect()[0]["n_leaves"]
    expect = sum((ck.sc_range_max(c) - ck.sc_range_min(c)) // 2 + 1
                 for c in cov)
    assert int(got) == expect


def test_contains_cell_join(spark):
    from s2_geometry_kotlin_spark.operators import cellunion as cu
    cov = _cov(40.7, -74.0, 2.0)
    cells = spark.createDataFrame([(1, _signed(c)) for c in cov],
                                  "geom_id long, cell_id long")
    # probes: leaves inside the cap and far away
    inside = ck.from_latlng_deg(np.array([40.7, 40.75]),
                                np.array([-74.0, -73.9]))
    outside = ck.from_latlng_deg(np.array([-30.0]), np.array([100.0]))
    probes = spark.createDataFrame(
        [(int(ck.to_signed(v)),) for v in
         np.concatenate([inside, outside])],
        "cell_id long")
    got = cu.contains_cell_join(cells, probes).count()
    assert got == 2


def test_intersection_matches_setwise(spark):
    from s2_geometry_kotlin_spark.operators import cellunion as cu
    a = _cov(0.0, 0.0, 5.0)
    b = _cov(1.0, 1.0, 5.0)
    da = spark.createDataFrame([(1, _signed(c)) for c in a],
                               "geom_id long, cell_id long")
    db = spark.createDataFrame([(1, _signed(c)) for c in b],
                               "geom_id long, cell_id long")
    got = {r["cell_id"] for r in cu.intersection(da, db).collect()}
    # oracle: leaf-range intersection, expressed back as the smaller cell
    expect = set()
    for x in a:
        for y in b:
            if ck.sc_range_min(y) <= ck.sc_range_max(x) and \
                    ck.sc_range_max(y) >= ck.sc_range_min(x):
                smaller = x if ck.sc_level(x) >= ck.sc_level(y) else y
                expect.add(_signed(smaller))
    assert got == expect and got


def test_expand_union_covers_neighbors(spark):
    from s2_geometry_kotlin_spark.operators import cellunion as cu
    cov = _cov(51.5, -0.12, 0.5, max_cells=8)
    df = spark.createDataFrame([(1, _signed(c)) for c in cov],
                               "geom_id long, cell_id long")
    lvl = max(ck.sc_level(c) for c in cov)
    expanded = {r["cell_id"] for r in
                cu.expand_union(df, lvl).collect()}
    # every original cell (at >= lvl) plus each of its neighbors must be
    # covered by the expansion
    exp_cells = [c + (1 << 64) if c < 0 else c for c in expanded]
    for cid in cov:
        base = ck.sc_parent(cid, lvl) if ck.sc_level(cid) > lvl else cid
        for nbr in ck.get_all_neighbors(base, lvl):
            assert any(ck.sc_range_min(e) <= nbr <= ck.sc_range_max(e)
                       for e in exp_cells)
