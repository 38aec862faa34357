"""P8 polygon/polygon relations + P6 vertex models.

Fixture loops follow the S2LoopUnitTest canon (named loops,
src/test/kotlin/dilivia/s2/region/S2LoopUnitTest.kt:58-130) plus the
multi-loop city_donut layer fixtures."""

import numpy as np
import pytest

from s2_geometry_kotlin_spark.kernel import cellid as ck
from s2_geometry_kotlin_spark.kernel import pip
from s2_geometry_kotlin_spark.kernel import polygon_relations as pr
from s2_geometry_kotlin_spark.kernel.regions import Loop, Polygon
from s2_geometry_kotlin_spark.sources.layers import regular_loop_vertices


def ring(lat, lon, radius_deg, nv=12, hole=False):
    v = regular_loop_vertices(lat, lon, radius_deg, nv)
    return Loop(v[::-1].copy()) if hole else Loop(v)


def test_contains_nested_loops():
    outer = ring(40.0, 10.0, 5.0)
    inner = ring(40.0, 10.0, 1.0)
    assert pr.contains_nested(outer, inner)
    assert not pr.contains_nested(inner, outer)
    far = ring(-40.0, -100.0, 1.0)
    assert not pr.contains_nested(outer, far)


def test_compare_boundary():
    outer = ring(40.0, 10.0, 5.0)
    inner = ring(40.0, 10.0, 1.0)
    far = ring(-40.0, -100.0, 1.0)
    crossing = ring(40.0, 15.0, 5.0)  # overlaps outer's boundary
    assert pr.compare_boundary(outer, inner) == 1
    assert pr.compare_boundary(outer, far) == -1
    assert pr.compare_boundary(outer, crossing) == 0
    assert pr.compare_boundary(inner, outer) == -1


def test_polygon_contains_polygon_with_holes():
    shell = ring(40.0, 10.0, 5.0)
    hole = ring(40.0, 10.0, 1.0, hole=True)
    donut = Polygon([shell, hole])
    # ring inside the annulus: contained
    mid = Polygon([ring(40.0, 10.0 + 2.5, 0.3)])
    assert pr.polygon_contains_polygon(donut, mid)
    assert not pr.polygon_contains_polygon(mid, donut)
    # disc inside the hole: not contained, not intersecting
    core = Polygon([ring(40.0, 10.0, 0.3)])
    assert not pr.polygon_contains_polygon(donut, core)
    assert not pr.polygon_intersects_polygon(donut, core)
    # disc covering the hole boundary: intersects, not contained
    overlap = Polygon([ring(40.0, 10.0, 2.0)])
    assert pr.polygon_intersects_polygon(donut, overlap)
    assert not pr.polygon_contains_polygon(donut, overlap)
    # full disc contains the donut
    disc = Polygon([ring(40.0, 10.0, 6.0)])
    assert pr.polygon_contains_polygon(disc, donut)
    assert not pr.polygon_contains_polygon(donut, disc)
    # nested donuts
    donut2 = Polygon([ring(40.0, 10.0, 4.0),
                      ring(40.0, 10.0, 1.5, hole=True)])
    assert pr.polygon_contains_polygon(donut, donut2)
    assert not pr.polygon_contains_polygon(donut2, donut)
    # identical polygons contain each other
    donut_copy = Polygon([ring(40.0, 10.0, 5.0),
                          ring(40.0, 10.0, 1.0, hole=True)])
    assert pr.polygon_contains_polygon(donut, donut_copy)
    assert pr.polygon_intersects_polygon(donut, donut_copy)


def test_polygon_intersects_disjoint():
    a = Polygon([ring(40.0, 10.0, 2.0)])
    b = Polygon([ring(-40.0, -100.0, 2.0)])
    assert not pr.polygon_intersects_polygon(a, b)
    assert pr.polygon_intersects_polygon(
        a, Polygon([ring(40.0, 12.0, 2.0)]))


def test_fixture_loop_matrix():
    """Relation matrix on reference-named loops (S2LoopUnitTest.kt)."""
    from s2_geometry_kotlin_spark.kernel.loop_relations import (
        loop_contains_loop, loop_intersects_loop)
    north_hemi = Loop.from_latlng_text("0:-180, 0:-90, 0:0, 0:90")
    arctic_80 = Loop.from_latlng_text("80:-150, 80:-30, 80:90")
    candy_cane = Loop.from_latlng_text(
        "-20:150, -20:-70, 0:70, 10:-150, 10:70, -10:-70")
    assert loop_contains_loop(north_hemi, arctic_80)
    assert not loop_contains_loop(arctic_80, north_hemi)
    assert loop_intersects_loop(north_hemi, candy_cane)
    assert not loop_contains_loop(north_hemi, candy_cane)
    assert not loop_intersects_loop(arctic_80, candy_cane)
    # polygon wrappers agree on single-loop inputs
    assert pr.polygon_contains_polygon(Polygon([north_hemi]),
                                       Polygon([arctic_80]))
    assert not pr.polygon_intersects_polygon(Polygon([arctic_80]),
                                             Polygon([candy_cane]))


def test_vertex_models():
    verts = regular_loop_vertices(40.0, 10.0, 2.0, 12)
    loops = [verts]
    # a polygon vertex itself
    v = verts[3][None, :]
    semi = pip.polygon_contains_points(loops, v)  # semi_open default
    assert not pip.polygon_contains_points(loops, v, "open")[0]
    assert pip.polygon_contains_points(loops, v, "closed")[0]
    # an interior point is contained under every model
    x, y, z = ck.latlng_deg_to_xyz(np.array([40.0]), np.array([10.0]))
    c = np.array([[x[0], y[0], z[0]]])
    for model in ("semi_open", "open", "closed"):
        assert pip.polygon_contains_points(loops, c, model)[0]
    # an exterior point is not, under every model
    x, y, z = ck.latlng_deg_to_xyz(np.array([-40.0]), np.array([10.0]))
    o = np.array([[x[0], y[0], z[0]]])
    for model in ("semi_open", "open", "closed"):
        assert not pip.polygon_contains_points(loops, o, model)[0]


def test_sentinel_loops_are_one_vertex_only():
    """ADVICE r4: only the canonical 1-vertex sentinels are empty/full
    (S2Loop.isEmptyOrFull == `numVertices == 1`); a malformed 2-vertex
    loop is rejected by contains_nested rather than classified as the
    empty loop (which would make it contained by everything)."""
    outer = ring(40.0, 10.0, 5.0)
    empty = Loop(np.array([[0.0, 0.0, 1.0]]))   # z>0 -> origin outside
    full = Loop(np.array([[0.0, 0.0, -1.0]]))   # z<0 -> origin inside
    assert empty.is_empty() and not empty.is_full()
    assert full.is_full() and not full.is_empty()
    assert pr.contains_nested(outer, empty)
    assert pr.contains_nested(full, outer)
    assert not pr.contains_nested(empty, outer)
    # 2-vertex loops: not sentinels, loudly rejected
    two = Loop(outer.vertices[:2].copy())
    assert not two.is_empty_or_full()
    with pytest.raises(ValueError, match="1-vertex sentinels"):
        pr.contains_nested(outer, two)
    with pytest.raises(ValueError, match="1-vertex sentinels"):
        pr.contains_nested(two, outer)
