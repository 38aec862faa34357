"""Spark surface of the mixed-dimension boolean kernel: mapInPandas
wrapper agrees with the driver-side kernel and shuffles nothing."""

import pytest


@pytest.fixture(scope="module")
def spark():
    from s2_geometry_kotlin_spark.session import get_spark
    s = get_spark("mixed-boolean-tests", cpus=4, shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


def test_matches_kernel_and_pins_counts(spark):
    from s2_geometry_kotlin_spark.kernel.boolean_mixed import (
        MixedOptions, boolean_op_mixed)
    from s2_geometry_kotlin_spark.kernel.textparser import make_index
    from s2_geometry_kotlin_spark.operators.mixed_boolean import (
        boolean_op_table, fixture_pairs)
    pairs = fixture_pairs(spark)
    rows = {(r.pair_id): (r.geom_a, r.geom_b)
            for r in pairs.collect()}
    for op in ("union", "intersection", "difference",
               "symmetric_difference"):
        got = {r.pair_id: r for r in
               boolean_op_table(pairs, op).collect()}
        for pid, (ga, gb) in rows.items():
            res = boolean_op_mixed(make_index(ga), make_index(gb), op,
                                   MixedOptions())
            r = got[pid]
            assert (r.n_points, r.n_polyline_edges,
                    r.n_polygon_edges) == (
                len(res.edges[0]), len(res.edges[1]),
                len(res.edges[2])), (op, pid)
            assert r.is_empty == res.is_empty()
    # a couple of reference-pinned spot values (pointPolygonInterior
    # intersection keeps exactly the interior point)
    inter = {r.pair_id: r for r in
             boolean_op_table(pairs, "intersection").collect()}
    assert inter[1].n_points == 1 and inter[1].n_polygon_edges == 0
    assert inter[4].n_polygon_edges == 4   # inner square only


def test_plan_has_no_shuffle(spark):
    from s2_geometry_kotlin_spark.operators.mixed_boolean import (
        boolean_op_table, fixture_pairs)
    plan = (boolean_op_table(fixture_pairs(spark), "union")
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan


def test_pinned_results_match_engine(spark):
    """The PINNED_RESULTS literal (the driver's VALUES-table oracle for
    mixed_boolean_counts) must track the engine bit-for-bit — if a
    kernel change legitimately shifts an output, re-pin the literal AND
    re-justify it against the reference parity suite."""
    from s2_geometry_kotlin_spark.operators.mixed_boolean import (
        PINNED_RESULTS, q_mixed_boolean_counts)
    got = [(r.pair_id, r.op, r.n_points, r.n_polyline_edges,
            r.n_polygon_edges, r.is_empty, r.is_full)
           for r in q_mixed_boolean_counts(spark, "").collect()]
    assert sorted(got) == sorted(PINNED_RESULTS)


def test_key_resolution_collision_raises():
    """ADVICE r5: distinct vertices closer than the kernel's 1e-6-degree
    key resolution must be rejected loudly, not silently merged."""
    import numpy as np
    import pytest as _pt

    from s2_geometry_kotlin_spark.kernel.boolean_mixed import (
        LaxGeometry, boolean_op_mixed)

    def pt(lat, lng):
        import math
        la, ln = math.radians(lat), math.radians(lng)
        return np.array([math.cos(la) * math.cos(ln),
                         math.cos(la) * math.sin(ln), math.sin(la)])

    a = LaxGeometry(points=[pt(10.0, 10.0)])
    b = LaxGeometry(points=[pt(10.0, 10.0 + 2e-7)])  # < 1e-6 deg apart
    with _pt.raises(ValueError, match="key resolution"):
        boolean_op_mixed(a, b, "union")
    # well-separated vertices are unaffected
    ok = LaxGeometry(points=[pt(10.0, 11.0)])
    res = boolean_op_mixed(a, ok, "union")
    assert len(res.edges[0]) == 2
