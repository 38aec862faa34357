"""Spark surface of the polyline-vector layer: the fixture-case table
assembles to the PINNED_RESULTS constants (the driver's value-hash
oracle), the plan has no shuffle, and the pins agree with the ported
reference expectations."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def spark():
    from s2_geometry_kotlin_spark.session import get_spark
    s = get_spark("pv-operator-tests", cpus=4, shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


def test_pinned_results_match_engine(spark):
    """CI drift guard: the VALUES oracle is the engine's own output
    over FIXTURE_CASES; any kernel change that moves it must update
    the pin (and the ported reference suite will say whether the move
    is legitimate)."""
    from s2_geometry_kotlin_spark.operators.polyline_vector import (
        PINNED_RESULTS, q_polyline_vector_layer)
    got = [tuple(r) for r in q_polyline_vector_layer(spark, "").collect()]
    assert got == PINNED_RESULTS


def test_pins_agree_with_reference_expectations():
    """The pinned endpoints/counts for the order-sensitive cases are
    derivable from the reference suite's expected strings — spot-check
    the loop case (inputEdgeStartsMultipleLoops) and the joining case
    against the literals in S2PolylineVectorLayerUnitTest.kt."""
    from s2_geometry_kotlin_spark.operators.polyline_vector import \
        PINNED_RESULTS
    by_case = {}
    for row in PINNED_RESULTS:
        by_case.setdefault(row[0], []).append(row)
    # joiningPolylines directed: "3:3, 2:2" then "0:0, 1:1, 2:2"
    assert [(r[2], r[3], r[4], r[5], r[6]) for r in by_case[1]] == [
        (2, 30000000, 30000000, 20000000, 20000000),
        (3, 0, 0, 20000000, 20000000)]
    # inputEdgeStartsMultipleLoops: five 5-vertex closed loops starting
    # 0:1, 0:3, 0:5, 0:7, 0:9 in that order
    assert [(r[2], r[3], r[4]) for r in by_case[5]] == [
        (5, 0, 10000000), (5, 0, 30000000), (5, 0, 50000000),
        (5, 0, 70000000), (5, 0, 90000000)]
    for r in by_case[5]:  # closed: first == last vertex
        assert (r[3], r[4]) == (r[5], r[6])


def test_plan_has_no_shuffle(spark):
    from s2_geometry_kotlin_spark.operators.polyline_vector import (
        assemble_table, fixture_cases)
    plan = assemble_table(fixture_cases(spark)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_oracle_sql_runs_in_duckdb():
    import duckdb

    from s2_geometry_kotlin_spark.operators.polyline_vector import (
        PINNED_RESULTS, polyline_vector_oracle_sql)
    rows = duckdb.sql(polyline_vector_oracle_sql()).fetchall()
    assert [tuple(r) for r in rows] == PINNED_RESULTS
