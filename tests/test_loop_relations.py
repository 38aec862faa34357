"""P8 loop-relation tests against S2LoopUnitTest's named-fixture
relationships (loopRelations test, S2LoopUnitTest.kt:231-334)."""

from s2_geometry_kotlin_spark.kernel.loop_relations import (
    loop_contains_loop, loop_intersects_loop)
from s2_geometry_kotlin_spark.kernel.regions import Loop

mk = Loop.from_latlng_text
NORTH = mk("0:-180, 0:-90, 0:0, 0:90")
SOUTH = mk("0:90, 0:0, 0:-90, 0:-180")
WEST = mk("0:-180, -90:0, 0:0, 90:0")
EAST = mk("90:0, 0:0, -90:0, 0:-180")
CANDY = mk("-20:150, -20:-70, 0:70, 10:-150, 10:70, -10:-70")
ARCTIC = mk("80:-150, 80:-30, 80:90")
ANTARCTIC = mk("-80:120, -80:0, -80:-120")
LOOP_A = mk("0:178, -1:180, 0:-179, 1:-180")
LOOP_B = mk("0:179, -1:180, 0:-178, 1:-180")
A_AND_B = mk("0:179, -1:180, 0:-179, 1:-180")
A_OR_B = mk("0:178, -1:180, 0:-178, 1:-180")


def test_complement_hemispheres():
    # same boundary, opposite interiors: neither contains, no interior
    # intersection
    assert not loop_contains_loop(NORTH, SOUTH)
    assert not loop_contains_loop(SOUTH, NORTH)
    assert not loop_intersects_loop(NORTH, SOUTH)


def test_nested_loops():
    assert loop_contains_loop(NORTH, ARCTIC)
    assert not loop_contains_loop(ARCTIC, NORTH)
    assert loop_intersects_loop(NORTH, ARCTIC)
    assert loop_contains_loop(SOUTH, ANTARCTIC)
    assert not loop_contains_loop(NORTH, ANTARCTIC)
    assert not loop_intersects_loop(NORTH, ANTARCTIC)


def test_overlapping_hemispheres():
    # north and west hemispheres properly overlap
    assert loop_intersects_loop(NORTH, WEST)
    assert not loop_contains_loop(NORTH, WEST)
    assert not loop_contains_loop(WEST, NORTH)
    assert loop_intersects_loop(EAST, CANDY)


def test_antimeridian_diamonds():
    # loop_a and loop_b overlap; their intersection/union fixtures nest
    assert loop_intersects_loop(LOOP_A, LOOP_B)
    assert not loop_contains_loop(LOOP_A, LOOP_B)
    assert not loop_contains_loop(LOOP_B, LOOP_A)
    assert loop_contains_loop(LOOP_A, A_AND_B)
    assert loop_contains_loop(LOOP_B, A_AND_B)
    assert loop_contains_loop(A_OR_B, LOOP_A)
    assert loop_contains_loop(A_OR_B, LOOP_B)
    assert loop_contains_loop(A_OR_B, A_AND_B)
    assert not loop_contains_loop(A_AND_B, A_OR_B)


def test_self_relations():
    for lp in (NORTH, CANDY, ARCTIC, LOOP_A):
        assert loop_contains_loop(lp, lp)
        assert loop_intersects_loop(lp, lp)
