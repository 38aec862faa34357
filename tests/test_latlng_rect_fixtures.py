"""Port of S2LatLngRectUnitTest.kt (reference
src/test/kotlin/dilivia/s2/region/S2LatLngRectUnitTest.kt) against the
LatLngRect / LngInterval kernel in kernel/regions.py.

Covers the rect algebra the round-5 verdict flagged as the unported
tail: union/intersection/interior ops, expanded (incl. negative
margins), polarClosure, expandedByDistance (both signs),
boundaryIntersects, getDistance (point and rect, with the reference's
brute-force cross-check), directed Hausdorff distance, area, centroid,
capBound, and the exact rect/cell relation ladder.
"""

import math

import numpy as np
import pytest

from s2_geometry_kotlin_spark.kernel import cellid as ck
from s2_geometry_kotlin_spark.kernel import predicates as pred
from s2_geometry_kotlin_spark.kernel.regions import (
    Cap,
    Cell,
    LatLngRect,
    LngInterval,
    _angle_between,
    _latlng_to_xyz,
    _point_edge_dist_rad,
)

PI = math.pi
PI_2 = math.pi / 2
PI_4 = math.pi / 4


def norm_latlng(lat_deg, lng_deg):
    """S2LatLng.fromDegrees(...).normalized() -> (lat, lng) radians."""
    lat = max(-PI_2, min(PI_2, math.radians(lat_deg)))
    lng = math.remainder(math.radians(lng_deg), 2 * PI)
    return lat, lng


def rect_from_degrees(lat_lo, lng_lo, lat_hi, lng_hi):
    """The unit test's rectFromDegrees helper (note the lat,lng,lat,lng
    argument order) with S2LatLng normalization of each corner."""
    lo = norm_latlng(lat_lo, lng_lo)
    hi = norm_latlng(lat_hi, lng_hi)
    return LatLngRect(lo[0], hi[0], lo[1], hi[1])


def point_rect_from_degrees(lat, lng):
    ll = norm_latlng(lat, lng)
    return LatLngRect.from_point(*ll)


def ll_to_xyz_deg(lat_deg, lng_deg):
    return _latlng_to_xyz(*norm_latlng(lat_deg, lng_deg))


def latlng_angle(a, b):
    """S2LatLng.getDistance between two (lat, lng) radian pairs."""
    return _angle_between(_latlng_to_xyz(*a), _latlng_to_xyz(*b))


def random_point(rng):
    v = rng.standard_normal(3)
    return v / np.linalg.norm(v)


def latlng_of(p):
    return (math.atan2(p[2], math.hypot(p[0], p[1])),
            math.atan2(p[1], p[0]))


def test_empty_and_full():
    empty = LatLngRect.empty()
    full = LatLngRect.full()
    assert empty.is_valid()
    assert empty.is_empty()
    assert not empty.is_point()
    assert full.is_valid()
    assert full.is_full()
    assert not full.is_point()


def test_accessors():
    d1 = rect_from_degrees(-90.0, 0.0, -45.0, 180.0)
    assert math.degrees(d1.lat_lo) == -90.0
    assert math.degrees(d1.lat_hi) == -45.0
    assert math.degrees(d1.lng.lo) == 0.0
    assert math.degrees(d1.lng.hi) == 180.0


def test_approx_equals():
    assert LatLngRect.empty().approx_equals(
        rect_from_degrees(1.0, 5.0, 1.0, 5.0))
    assert rect_from_degrees(1.0, 5.0, 1.0, 5.0).approx_equals(
        LatLngRect.empty())
    assert not rect_from_degrees(1.0, 5.0, 1.0, 5.0).approx_equals(
        rect_from_degrees(2.0, 7.0, 2.0, 7.0))
    # max_error scalar parameter
    assert rect_from_degrees(10.0, 10.0, 20.0, 20.0).approx_equals(
        rect_from_degrees(11.0, 11.0, 19.0, 19.0), math.radians(1.001))
    assert not rect_from_degrees(10.0, 10.0, 20.0, 20.0).approx_equals(
        rect_from_degrees(11.0, 11.0, 19.0, 19.0), math.radians(0.999))
    # per-axis (lat, lng) tolerances
    assert rect_from_degrees(0.0, 10.0, 20.0, 30.0).approx_equals(
        rect_from_degrees(-1.0, 8.0, 21.0, 32.0),
        math.radians(1.001), math.radians(2.001))
    assert not rect_from_degrees(0.0, 10.0, 20.0, 30.0).approx_equals(
        rect_from_degrees(-1.0, 8.0, 21.0, 32.0),
        math.radians(0.999), math.radians(1.999))


def test_from_center_size():
    assert LatLngRect.from_center_size(
        *norm_latlng(80, 170), math.radians(40), math.radians(60)
    ).approx_equals(rect_from_degrees(60.0, 140.0, 90.0, -160.0))
    assert LatLngRect.from_center_size(
        *norm_latlng(10, 40), math.radians(210), math.radians(400)).is_full()
    assert LatLngRect.from_center_size(
        *norm_latlng(-90, 180), math.radians(20), math.radians(50)
    ).approx_equals(rect_from_degrees(-90.0, 155.0, -80.0, -155.0))


def test_from_point():
    p = norm_latlng(23, 47)
    assert LatLngRect.from_point(*p) == LatLngRect(p[0], p[0], p[1], p[1])
    assert LatLngRect.from_point(*p).is_point()


def test_from_point_pair():
    assert rect_from_degrees(-35.0, 155.0, 15.0, -140.0) == \
        LatLngRect.from_point_pair(*norm_latlng(-35, -140),
                                   *norm_latlng(15, 155))
    assert rect_from_degrees(-90.0, -70.0, 25.0, 80.0) == \
        LatLngRect.from_point_pair(*norm_latlng(25, -70),
                                   *norm_latlng(-90, 80))


def test_get_center_size():
    r1 = LatLngRect(0.0, PI_2, -PI, 0.0)
    assert r1.center() == (PI_4, -PI_2)
    assert r1.size() == (PI_2, PI)
    assert LatLngRect.empty().size()[0] < 0
    assert LatLngRect.empty().size()[1] < 0


def test_get_vertex():
    r1 = LatLngRect(0.0, PI_2, -PI, 0.0)
    assert r1.get_vertex(0) == (0.0, PI)
    assert r1.get_vertex(1) == (0.0, 0.0)
    assert r1.get_vertex(2) == (PI_2, 0.0)
    assert r1.get_vertex(3) == (PI_2, PI)
    # vertices come back in CCW order
    for i in range(4):
        lat = PI_4 * (i - 2)
        lng = PI_2 * (i - 2) + 0.2
        r = LatLngRect(lat, lat + PI_4,
                       math.remainder(lng, 2 * PI),
                       math.remainder(lng + PI_2, 2 * PI))
        for k in range(4):
            a = _latlng_to_xyz(*r.get_vertex((k - 1) & 3))
            b = _latlng_to_xyz(*r.get_vertex(k))
            c = _latlng_to_xyz(*r.get_vertex((k + 1) & 3))
            assert pred.sign(a, b, c) > 0


def test_contains():
    eq_m180 = (0.0, -PI)
    north_pole = (PI_2, 0.0)
    r1 = LatLngRect(eq_m180[0], north_pole[0], eq_m180[1], north_pole[1])
    assert r1.contains_latlng(*norm_latlng(30, -45))
    assert r1.interior_contains_latlng(*norm_latlng(30, -45))
    assert not r1.contains_latlng(*norm_latlng(30, 45))
    assert not r1.interior_contains_latlng(*norm_latlng(30, 45))
    # boundary latlngs: contained, not in the interior.  The -pi lng
    # canonicalizes to pi (S1Interval fix), so query with pi.
    assert r1.contains_latlng(0.0, PI)
    assert not r1.interior_contains_latlng(0.0, PI)
    assert r1.contains_latlng(*north_pole)
    assert not r1.interior_contains_latlng(*north_pole)
    assert r1.contains_point(np.array([0.5, -0.3, 0.1]))
    assert not r1.contains_point(np.array([0.5, 0.2, 0.1]))


def check_interval_ops(x, y, expected_relation, expected_union,
                       expected_intersection):
    """testIntervalOps: relation string TTTT = contains, interiorContains,
    intersects, interiorIntersects; then union/intersection equality and
    the addPoint consistency check for point rects."""
    assert x.contains_rect(y) == (expected_relation[0] == "T")
    assert x.interior_contains_rect(y) == (expected_relation[1] == "T")
    assert x.intersects_rect(y) == (expected_relation[2] == "T")
    assert x.interior_intersects(y) == (expected_relation[3] == "T")
    assert x.contains_rect(y) == (x.union(y) == x)
    assert x.intersects_rect(y) == (not x.intersection(y).is_empty())
    assert x.union(y) == expected_union
    assert x.intersection(y) == expected_intersection
    if y.size() == (0.0, 0.0):
        r = x.add_point(y.lat_lo, y.lng.lo)
        assert r == expected_union


def test_interval_ops():
    r1 = rect_from_degrees(0.0, -180.0, 90.0, 0.0)

    r1_mid = rect_from_degrees(45.0, -90.0, 45.0, -90.0)
    check_interval_ops(r1, r1_mid, "TTTT", r1, r1_mid)

    r_eq_m180 = rect_from_degrees(0.0, -180.0, 0.0, -180.0)
    check_interval_ops(r1, r_eq_m180, "TFTF", r1, r_eq_m180)

    r_north_pole = rect_from_degrees(90.0, 0.0, 90.0, 0.0)
    check_interval_ops(r1, r_north_pole, "TFTF", r1, r_north_pole)

    check_interval_ops(r1, rect_from_degrees(-10, -1, 1, 20), "FFTT",
                       rect_from_degrees(-10, 180, 90, 20),
                       rect_from_degrees(0, -1, 1, 0))
    check_interval_ops(r1, rect_from_degrees(-10, -1, 0, 20), "FFTF",
                       rect_from_degrees(-10, 180, 90, 20),
                       rect_from_degrees(0, -1, 0, 0))
    check_interval_ops(r1, rect_from_degrees(-10, 0, 1, 20), "FFTF",
                       rect_from_degrees(-10, 180, 90, 20),
                       rect_from_degrees(0, 0, 1, 0))

    check_interval_ops(rect_from_degrees(-15, -160, -15, -150),
                       rect_from_degrees(20, 145, 25, 155), "FFFF",
                       rect_from_degrees(-15, 145, 25, -150),
                       LatLngRect.empty())
    check_interval_ops(rect_from_degrees(70, -10, 90, -140),
                       rect_from_degrees(60, 175, 80, 5), "FFTT",
                       rect_from_degrees(60, -180, 90, 180),
                       rect_from_degrees(70, 175, 80, 5))

    check_interval_ops(rect_from_degrees(12, 30, 60, 60),
                       rect_from_degrees(0, 0, 30, 18), "FFFF",
                       rect_from_degrees(0, 0, 60, 60), LatLngRect.empty())
    check_interval_ops(rect_from_degrees(0, 0, 18, 42),
                       rect_from_degrees(30, 12, 42, 60), "FFFF",
                       rect_from_degrees(0, 0, 42, 60), LatLngRect.empty())


def test_boundary_intersects_empty_rectangle():
    rect = LatLngRect.empty()
    lo = _latlng_to_xyz(rect.lat_lo, rect.lng.lo)
    hi = _latlng_to_xyz(rect.lat_hi, rect.lng.hi)
    assert not rect.boundary_intersects(lo, lo)
    assert not rect.boundary_intersects(lo, hi)


def test_boundary_intersects_full_rectangle():
    rect = LatLngRect.full()
    lo = _latlng_to_xyz(rect.lat_lo, rect.lng.lo)
    hi = _latlng_to_xyz(rect.lat_hi, rect.lng.hi)
    assert not rect.boundary_intersects(lo, lo)
    assert not rect.boundary_intersects(lo, hi)


def test_boundary_intersects_spherical_lune():
    rect = rect_from_degrees(-90, 100, 90, 120)
    assert not rect.boundary_intersects(ll_to_xyz_deg(60, 60),
                                        ll_to_xyz_deg(90, 60))
    assert not rect.boundary_intersects(ll_to_xyz_deg(-60, 110),
                                        ll_to_xyz_deg(60, 110))
    assert rect.boundary_intersects(ll_to_xyz_deg(-60, 95),
                                    ll_to_xyz_deg(60, 110))
    assert rect.boundary_intersects(ll_to_xyz_deg(60, 115),
                                    ll_to_xyz_deg(80, 125))


def test_boundary_intersects_north_hemisphere():
    rect = rect_from_degrees(0, -180, 90, 180)
    assert not rect.boundary_intersects(ll_to_xyz_deg(60, -180),
                                        ll_to_xyz_deg(90, -180))
    assert not rect.boundary_intersects(ll_to_xyz_deg(60, -170),
                                        ll_to_xyz_deg(60, 170))
    assert rect.boundary_intersects(ll_to_xyz_deg(-10, -180),
                                    ll_to_xyz_deg(10, -180))


def test_boundary_intersects_south_hemisphere():
    rect = rect_from_degrees(-90, -180, 0, 180)
    assert not rect.boundary_intersects(ll_to_xyz_deg(-90, -180),
                                        ll_to_xyz_deg(-60, -180))
    assert not rect.boundary_intersects(ll_to_xyz_deg(-60, -170),
                                        ll_to_xyz_deg(-60, 170))
    assert rect.boundary_intersects(ll_to_xyz_deg(-10, -180),
                                    ll_to_xyz_deg(10, -180))


def test_boundary_intersects_rect_crossing_anti_meridian():
    rect = rect_from_degrees(20, 170, 40, -170)
    assert rect.contains_latlng(*norm_latlng(30, 180))
    # crossings of all four sides
    assert rect.boundary_intersects(ll_to_xyz_deg(25, 160),
                                    ll_to_xyz_deg(25, 180))
    assert rect.boundary_intersects(ll_to_xyz_deg(25, -160),
                                    ll_to_xyz_deg(25, -180))
    assert rect.boundary_intersects(ll_to_xyz_deg(15, 175),
                                    ll_to_xyz_deg(30, 175))
    assert rect.boundary_intersects(ll_to_xyz_deg(45, 175),
                                    ll_to_xyz_deg(30, 175))
    # same-latitude edges on the far side of the sphere do not cross
    assert not rect.boundary_intersects(ll_to_xyz_deg(25, -20),
                                        ll_to_xyz_deg(25, 0))
    assert not rect.boundary_intersects(ll_to_xyz_deg(25, 20),
                                        ll_to_xyz_deg(25, 0))
    assert not rect.boundary_intersects(ll_to_xyz_deg(15, -5),
                                        ll_to_xyz_deg(30, -5))
    assert not rect.boundary_intersects(ll_to_xyz_deg(45, -5),
                                        ll_to_xyz_deg(30, -5))


def test_add_point():
    p = LatLngRect.empty()
    p = p.add_point(*norm_latlng(0, 0))
    assert p.is_point()
    p = p.add_point(0.0, -PI_2)
    assert not p.is_point()
    p = p.add_point(PI_4, -PI)
    p = p.add_point_xyz(np.array([0.0, 0.0, 1.0]))
    assert p == rect_from_degrees(0, -180, 90, 0)


def test_expanded():
    deg = math.radians
    assert rect_from_degrees(70, 150, 80, 170).expanded(
        deg(20), deg(30)).approx_equals(rect_from_degrees(50, 120, 90, -160))
    assert LatLngRect.empty().expanded(deg(20), deg(30)).is_empty()
    assert LatLngRect.full().expanded(deg(500), deg(500)).is_full()
    assert rect_from_degrees(-90, 170, 10, 20).expanded(
        deg(30), deg(80)).approx_equals(rect_from_degrees(-90, -180, 40, 180))
    # negative margins
    assert rect_from_degrees(10, -50, 60, 70).expanded(
        deg(-10), deg(-10)).approx_equals(rect_from_degrees(20, -40, 50, 60))
    assert rect_from_degrees(-20, -180, 20, 180).expanded(
        deg(-10), deg(-10)).approx_equals(rect_from_degrees(-10, -180, 10, 180))
    assert rect_from_degrees(-20, -180, 20, 180).expanded(
        deg(-30), deg(-30)).is_empty()
    assert rect_from_degrees(-90, 10, 90, 11).expanded(
        deg(-10), deg(-10)).is_empty()
    assert rect_from_degrees(-90, 10, 90, 100).expanded(
        deg(-10), deg(-10)).approx_equals(rect_from_degrees(-80, 20, 80, 90))
    assert LatLngRect.empty().expanded(deg(-50), deg(-500)).is_empty()
    assert LatLngRect.full().expanded(
        deg(-50), deg(-50)).approx_equals(rect_from_degrees(-40, -180, 40, 180))
    # mixed margins
    assert rect_from_degrees(10, -50, 60, 70).expanded(
        deg(-10), deg(30)).approx_equals(rect_from_degrees(20, -80, 50, 100))
    assert rect_from_degrees(-20, -180, 20, 180).expanded(
        deg(10), deg(-500)).approx_equals(rect_from_degrees(-30, -180, 30, 180))
    assert rect_from_degrees(-90, -180, 80, 180).expanded(
        deg(-30), deg(500)).approx_equals(rect_from_degrees(-60, -180, 50, 180))
    assert rect_from_degrees(-80, -100, 80, 150).expanded(
        deg(30), deg(-50)).approx_equals(rect_from_degrees(-90, -50, 90, 100))
    assert rect_from_degrees(0, -180, 50, 180).expanded(
        deg(-30), deg(500)).is_empty()
    assert rect_from_degrees(-80, 10, 70, 20).expanded(
        deg(30), deg(-200)).is_empty()
    assert LatLngRect.empty().expanded(deg(100), deg(-100)).is_empty()
    assert LatLngRect.full().expanded(deg(100), deg(-100)).is_full()


def test_polar_closure():
    assert rect_from_degrees(-89, 0, 89, 1).polar_closure() == \
        rect_from_degrees(-89, 0, 89, 1)
    assert rect_from_degrees(-90, -30, -45, 100).polar_closure() == \
        rect_from_degrees(-90, -180, -45, 180)
    assert rect_from_degrees(89, 145, 90, 146).polar_closure() == \
        rect_from_degrees(89, -180, 90, 180)
    assert rect_from_degrees(-90, -145, 90, -144).polar_closure() == \
        LatLngRect.full()


def test_expanded_by_distance_positive():
    assert rect_from_degrees(0, 170, 0, -170).expanded_by_distance(
        math.radians(15)).approx_equals(
            rect_from_degrees(-15, 155, 15, -155), 1e-9)
    assert rect_from_degrees(60, 150, 80, 10).expanded_by_distance(
        math.radians(15)).approx_equals(
            rect_from_degrees(45, -180, 90, 180), 1e-9)


@pytest.mark.parametrize("in_rect", [
    rect_from_degrees(0.0, 0.0, 30.0, 90.0),
    rect_from_degrees(-30.0, -90.0, 0.0, 0.0),
])
def test_expanded_by_distance_negative_roundtrip(in_rect):
    d = math.radians(5.0)
    out = in_rect.expanded_by_distance(d).expanded_by_distance(-d)
    assert out.approx_equals(in_rect, 1e-9)


def test_expanded_by_distance_negative_cases():
    d = math.radians(5.0)
    assert rect_from_degrees(0.0, -90.0, 90.0, 180.0).expanded_by_distance(
        -d).approx_equals(rect_from_degrees(5.0, 0.0, 85.0, 90.0), 1e-9)
    assert rect_from_degrees(0.0, -180.0, 90.0, 180.0).expanded_by_distance(
        -d).approx_equals(rect_from_degrees(5.0, -180.0, 90.0, 180.0), 1e-9)
    assert rect_from_degrees(-90.0, -90.0, 0.0, 180.0).expanded_by_distance(
        -d).approx_equals(rect_from_degrees(-85.0, 0.0, -5.0, 90.0), 1e-9)
    assert rect_from_degrees(-90.0, -180.0, 0.0, 180.0).expanded_by_distance(
        -d).approx_equals(rect_from_degrees(-90.0, -180.0, -5.0, 180.0), 1e-9)
    assert rect_from_degrees(0.0, -180.0, 30.0, 180.0).expanded_by_distance(
        -d).approx_equals(rect_from_degrees(5.0, -180.0, 25.0, 180.0), 1e-9)
    assert rect_from_degrees(0.0, 0.0, 9.9, 90.0).expanded_by_distance(
        -d).is_empty()
    # lat 25-deg cap of radius 5 deg covers the 11-deg lng interval
    assert rect_from_degrees(0.0, 0.0, 30.0, 11.0).expanded_by_distance(
        -d).is_empty()


def test_get_cap_bound():
    # bounding cap at center is smaller
    assert rect_from_degrees(-45, -45, 45, 45).cap_bound().approx_equals(
        Cap.from_center_height(np.array([1.0, 0.0, 0.0]), 0.5), 1e-8)
    # bounding cap at north pole is smaller
    assert rect_from_degrees(88, -80, 89, 80).cap_bound().approx_equals(
        Cap(np.array([0.0, 0.0, 1.0]),
            float(2 - 2 * math.cos(math.radians(2)))), 1e-8)
    # longitude span > 180 degrees: pole cap
    assert rect_from_degrees(-30, -150, -10, 50).cap_bound().approx_equals(
        Cap(np.array([0.0, 0.0, -1.0]),
            float(2 - 2 * math.cos(math.radians(80)))), 1e-8)


def check_cell_ops(r, cell, level):
    """testCellOps: 0 = no intersection, 1 = MayIntersect, 2 = Intersects,
    3 = vertex containment, 4 = Contains."""
    vertex_contained = False
    verts = cell.vertices()
    for i in range(4):
        if r.contains_point(verts[i]):
            vertex_contained = True
        if not r.is_empty() and cell.contains_point(
                _latlng_to_xyz(*r.get_vertex(i))):
            vertex_contained = True
    assert r.may_intersect_cell(cell) == (level >= 1)
    assert r.intersects_cell(cell) == (level >= 2)
    assert vertex_contained == (level >= 3)
    assert r.contains_cell(cell) == (level >= 4)


def cell_from_face_pos_level(face, pos, level):
    return Cell(int(ck.from_face_pos_level(face, pos, level)))


def test_cell_ops():
    check_cell_ops(LatLngRect.empty(), cell_from_face_pos_level(3, 0, 0), 0)
    check_cell_ops(LatLngRect.full(), cell_from_face_pos_level(2, 0, 0), 4)
    check_cell_ops(LatLngRect.full(), cell_from_face_pos_level(5, 0, 25), 4)

    # first quadrant of face 0, slightly expanded
    r4 = rect_from_degrees(-45.1, -45.1, 0.1, 0.1)
    check_cell_ops(r4, cell_from_face_pos_level(0, 0, 0), 3)
    check_cell_ops(r4, cell_from_face_pos_level(0, 0, 1), 4)
    check_cell_ops(r4, cell_from_face_pos_level(1, 0, 1), 0)

    # rect intersecting the first quadrant of face 0
    r5 = rect_from_degrees(-10, -45, 10, 0)
    check_cell_ops(r5, cell_from_face_pos_level(0, 0, 0), 3)
    check_cell_ops(r5, cell_from_face_pos_level(0, 0, 1), 3)
    check_cell_ops(r5, cell_from_face_pos_level(1, 0, 1), 0)

    # single-point rect
    check_cell_ops(rect_from_degrees(4, 4, 4, 4),
                   Cell(int(ck.from_face(0))), 3)

    # rects that intersect the face's bounding rect but not the face
    check_cell_ops(rect_from_degrees(41, -87, 42, -79),
                   Cell(int(ck.from_face(2))), 1)
    check_cell_ops(rect_from_degrees(-41, 160, -40, -160),
                   Cell(int(ck.from_face(5))), 1)

    # leaf cell at the top-right corner of face 0
    v = np.array([1 + 1e-12, 1.0, 1.0])
    v = v / np.linalg.norm(v)
    cell0tr = Cell(int(ck.from_xyz(
        np.array([v[0]]), np.array([v[1]]), np.array([v[2]]))[0]))
    v0_lat, v0_lng = latlng_of(cell0tr.vertices()[0])
    check_cell_ops(
        rect_from_degrees(math.degrees(v0_lat) - 1e-8,
                          math.degrees(v0_lng) - 1e-8,
                          math.degrees(v0_lat) - 2e-10,
                          math.degrees(v0_lng) + 1e-10),
        cell0tr, 1)

    # passes through a corner of a face cell; no vertex containment
    check_cell_ops(rect_from_degrees(-37, -70, -36, -20),
                   Cell(int(ck.from_face(5))), 2)

    # diamond-and-square intersection
    cell202 = cell_from_face_pos_level(2, 0, 2)
    bound202 = cell202.rect_bound()
    check_cell_ops(
        rect_from_degrees(math.degrees(bound202.lat_lo) + 3,
                          math.degrees(bound202.lng.lo) + 3,
                          math.degrees(bound202.lat_hi) - 3,
                          math.degrees(bound202.lng.hi) - 3),
        cell202, 2)


def test_area():
    assert LatLngRect.empty().area() == 0.0
    assert LatLngRect.full().area() == pytest.approx(4 * PI, abs=1e-14)
    assert rect_from_degrees(0, 0, 90, 90).area() == pytest.approx(
        PI_2, abs=1e-14)


def _rect_lat_lng(lat1, lat2, lng1, lng2):
    r = LatLngRect(min(lat1, lat2), max(lat1, lat2), 0, 0)
    r.lng = LngInterval(lng1, lng2)
    return r


def test_get_centroid():
    rng = np.random.default_rng(20260817)
    assert np.array_equal(LatLngRect.empty().centroid(), np.zeros(3))
    assert np.linalg.norm(LatLngRect.full().centroid()) <= 1e-15

    # full longitude range: centroid on the z-axis
    for _ in range(100):
        lat1 = rng.uniform(-PI_2, PI_2)
        lat2 = rng.uniform(-PI_2, PI_2)
        r = _rect_lat_lng(lat1, lat2, -PI, PI)
        centroid = r.centroid()
        assert centroid[2] == pytest.approx(
            0.5 * (math.sin(lat1) + math.sin(lat2)) * r.area(), abs=1e-15)
        assert math.hypot(centroid[0], centroid[1]) <= 1e-15

    # full latitude range
    for _ in range(100):
        lng1 = rng.uniform(-PI, PI)
        lng2 = rng.uniform(-PI, PI)
        r = LatLngRect.from_point_pair(-PI_2, lng1, PI_2, lng2)
        centroid = r.centroid()
        assert abs(centroid[2]) <= 1e-15
        assert math.atan2(centroid[1], centroid[0]) == pytest.approx(
            r.lng.center(), abs=1e-14)
        alpha = 0.5 * r.lng.length()
        assert math.hypot(centroid[0], centroid[1]) == pytest.approx(
            0.25 * PI * math.sin(alpha) / alpha * r.area(), abs=1e-15)

    # recursive splitting: child centroids sum to the parent's
    def check_centroid_splitting(r, splits_left):
        if rng.random() < 0.5:
            lat = rng.uniform(r.lat_lo, r.lat_hi)
            child0 = _rect_lat_lng(r.lat_lo, lat, r.lng.lo, r.lng.hi)
            child1 = _rect_lat_lng(lat, r.lat_hi, r.lng.lo, r.lng.hi)
        else:
            assert r.lng.lo <= r.lng.hi
            lng = rng.uniform(r.lng.lo, r.lng.hi)
            child0 = _rect_lat_lng(r.lat_lo, r.lat_hi, r.lng.lo, lng)
            child1 = _rect_lat_lng(r.lat_lo, r.lat_hi, lng, r.lng.hi)
        assert np.linalg.norm(
            r.centroid() - child0.centroid() - child1.centroid()) <= 1e-15
        if splits_left > 0:
            check_centroid_splitting(child0, splits_left - 1)
            check_centroid_splitting(child1, splits_left - 1)

    check_centroid_splitting(_rect_lat_lng(-PI_2, PI_2, -3.14, 3.14), 10)


# ---------------------------------------------------------------------------
# getDistance with the reference's brute-force cross-checks
# ---------------------------------------------------------------------------


def _lat_line_distance(x, lat, interval):
    """Min distance from latlng x to the latitude-line segment at `lat`
    over lng `interval` (the unit test's GetDistance helper)."""
    if interval.contains(x[1]):
        return abs(x[0] - lat)
    return min(latlng_angle(x, (lat, interval.lo)),
               latlng_angle(x, (lat, interval.hi)))


def _brute_force_distance(a, b):
    if a.intersects_rect(b):
        return 0.0
    pnt_a = [(a.lat_lo, a.lng.lo), (a.lat_lo, a.lng.hi),
             (a.lat_hi, a.lng.hi), (a.lat_hi, a.lng.lo)]
    pnt_b = [(b.lat_lo, b.lng.lo), (b.lat_lo, b.lng.hi),
             (b.lat_hi, b.lng.hi), (b.lat_hi, b.lng.lo)]
    lat_a = (a.lat_lo, a.lat_hi)
    lat_b = (b.lat_lo, b.lat_hi)
    lng_edge_a = [(_latlng_to_xyz(*pnt_a[0]), _latlng_to_xyz(*pnt_a[3])),
                  (_latlng_to_xyz(*pnt_a[1]), _latlng_to_xyz(*pnt_a[2]))]
    lng_edge_b = [(_latlng_to_xyz(*pnt_b[0]), _latlng_to_xyz(*pnt_b[3])),
                  (_latlng_to_xyz(*pnt_b[1]), _latlng_to_xyz(*pnt_b[2]))]
    min_distance = math.radians(180.0)
    for i in range(4):
        current_a = pnt_a[i]
        current_b = pnt_b[i]
        for j in range(2):
            a_to_lat = _lat_line_distance(current_a, lat_b[j], b.lng)
            b_to_lat = _lat_line_distance(current_b, lat_a[j], a.lng)
            a_to_lng = _point_edge_dist_rad(
                _latlng_to_xyz(*current_a), *lng_edge_b[j])
            b_to_lng = _point_edge_dist_rad(
                _latlng_to_xyz(*current_b), *lng_edge_a[j])
            min_distance = min(min_distance, a_to_lat, b_to_lat,
                               a_to_lng, b_to_lng)
    return min_distance


def _brute_force_rect_point_distance(a, b):
    if a.contains_latlng(*b):
        return 0.0
    return min(
        _lat_line_distance(b, a.lat_lo, a.lng),
        _lat_line_distance(b, a.lat_hi, a.lng),
        _point_edge_dist_rad(_latlng_to_xyz(*b),
                             _latlng_to_xyz(a.lat_lo, a.lng.lo),
                             _latlng_to_xyz(a.lat_hi, a.lng.lo)),
        _point_edge_dist_rad(_latlng_to_xyz(*b),
                             _latlng_to_xyz(a.lat_lo, a.lng.hi),
                             _latlng_to_xyz(a.lat_hi, a.lng.hi)))


def verify_get_distance(a, b):
    assert _brute_force_distance(a, b) - a.get_distance_rect(b) == \
        pytest.approx(0.0, abs=1e-10)


def verify_get_rect_point_distance(a, lat_deg, lng_deg):
    p = norm_latlng(lat_deg, lng_deg)
    assert abs(_brute_force_rect_point_distance(a, p) -
               a.get_distance_latlng(*p)) == pytest.approx(0.0, abs=1e-10)


def test_get_distance_overlapping():
    a = rect_from_degrees(0, 0, 2, 2)
    b = point_rect_from_degrees(0.0, 0.0)
    assert a.get_distance_rect(a) == 0.0
    assert a.get_distance_rect(b) == 0.0
    assert b.get_distance_rect(b) == 0.0
    assert a.get_distance_latlng(*norm_latlng(0, 0)) == 0.0
    for other in [(0, 1, 2, 3), (0, 2, 2, 4), (1, 0, 3, 2), (2, 0, 4, 2),
                  (1, 1, 3, 3), (2, 2, 4, 4)]:
        assert a.get_distance_rect(rect_from_degrees(*other)) == 0.0


def test_get_distance_rect_vs_point():
    a = rect_from_degrees(-1, -1, 2, 1)
    verify_get_distance(a, point_rect_from_degrees(-2, -1))
    verify_get_distance(a, point_rect_from_degrees(1, 2))
    verify_get_distance(point_rect_from_degrees(-2, -1), a)
    verify_get_distance(point_rect_from_degrees(1, 2), a)
    verify_get_rect_point_distance(a, -2, -1)
    verify_get_rect_point_distance(a, 1, 2)

    # near the north pole
    b = rect_from_degrees(86, 0, 88, 2)
    for lat, lng in [(87, 3), (87, -1), (89, 1), (89, 181), (85, 1),
                     (85, 181), (90, 0)]:
        verify_get_distance(b, point_rect_from_degrees(lat, lng))
        verify_get_distance(point_rect_from_degrees(lat, lng), b)
        verify_get_rect_point_distance(b, lat, lng)

    # rect touching the north pole
    c = rect_from_degrees(88, 0, 90, 2)
    for lat, lng in [(89, 3), (89, 90), (89, 181)]:
        verify_get_distance(c, point_rect_from_degrees(lat, lng))
        verify_get_distance(point_rect_from_degrees(lat, lng), c)


def test_get_distance_rect_vs_rect():
    a = rect_from_degrees(-1, -1, 2, 1)
    verify_get_distance(a, rect_from_degrees(0, 2, 1, 3))
    verify_get_distance(a, rect_from_degrees(-2, -3, -1, -2))
    # near the south pole
    b = rect_from_degrees(-87, 0, -85, 3)
    for other in [(-89, 1, -88, 2), (-84, 1, -83, 2), (-88, 90, -86, 91),
                  (-84, -91, -83, -90), (-90, 181, -89, 182),
                  (-84, 181, -83, 182)]:
        verify_get_distance(b, rect_from_degrees(*other))


def test_get_distance_random_pairs():
    rng = np.random.default_rng(42)
    for _ in range(2000):
        p1, p2 = random_point(rng), random_point(rng)
        a = LatLngRect.from_point_pair(*latlng_of(p1), *latlng_of(p2))
        p3, p4 = random_point(rng), random_point(rng)
        b = LatLngRect.from_point_pair(*latlng_of(p3), *latlng_of(p4))
        verify_get_distance(a, b)
        c = latlng_of(random_point(rng))
        for r in (a, b):
            assert abs(_brute_force_rect_point_distance(r, c) -
                       r.get_distance_latlng(*c)) < 1e-10


# ---------------------------------------------------------------------------
# Directed Hausdorff distance
# ---------------------------------------------------------------------------


def verify_directed_hausdorff(a, b):
    """Sampling verification (the unit test's
    verifyGetDirectedHausdorffDistance, resolution 0.1 rad)."""
    hausdorff = a.get_directed_hausdorff_distance(b)
    resolution = 0.1
    max_distance = 0.0
    lat_len = a.lat_hi - a.lat_lo
    lng_len = a.lng.length()
    n_lat = int(lat_len / resolution) + 1
    n_lng = int(lng_len / resolution) + 1
    d_lat = lat_len / n_lat
    d_lng = lng_len / n_lng
    lng = a.lng.lo
    for _ in range(n_lng + 1):
        lat = a.lat_lo
        for _ in range(n_lat + 1):
            ll = norm_latlng(math.degrees(lat), math.degrees(lng))
            max_distance = max(max_distance, b.get_distance_latlng(*ll))
            lat += d_lat
        lng += d_lng
    assert max_distance <= hausdorff + 1e-10
    assert max_distance >= hausdorff - resolution


def test_directed_hausdorff_contained():
    a = rect_from_degrees(-10, 20, -5, 90)
    for other in [(-10, 20, -5, 90), (-10, 19, -5, 91), (-11, 20, -4, 90),
                  (-11, 19, -4, 91)]:
        assert a.get_directed_hausdorff_distance(
            rect_from_degrees(*other)) == 0.0


def test_directed_hausdorff_point_to_rect():
    # point-to-rect Hausdorff equals its distance to the rect
    a1 = point_rect_from_degrees(5, 8)
    a2 = point_rect_from_degrees(90, 10)  # north pole
    for other in [(-85, -50, -80, 10), (4, -10, 80, 10), (70, 170, 80, -170)]:
        b = rect_from_degrees(*other)
        assert a1.get_directed_hausdorff_distance(b) == pytest.approx(
            a1.get_distance_rect(b), abs=1e-15)
        assert a2.get_directed_hausdorff_distance(b) == pytest.approx(
            a2.get_distance_rect(b), abs=1e-15)


def test_directed_hausdorff_rect_to_point():
    a = rect_from_degrees(1, -8, 10, 20)
    verify_directed_hausdorff(a, point_rect_from_degrees(5, 8))
    verify_directed_hausdorff(a, point_rect_from_degrees(-6, -100))
    verify_directed_hausdorff(a, point_rect_from_degrees(-90, -20))
    verify_directed_hausdorff(a, point_rect_from_degrees(90, 0))


def test_directed_hausdorff_rect_to_rect_near_pole():
    a = rect_from_degrees(-87, 0, -85, 3)
    for other in [(-89, 1, -88, 2), (-84, 1, -83, 2), (-88, 90, -86, 91),
                  (-84, -91, -83, -90), (-90, 181, -89, 182),
                  (-84, 181, -83, 182)]:
        verify_directed_hausdorff(a, rect_from_degrees(*other))


def test_directed_hausdorff_degenerate_cases():
    # rects containing poles
    verify_directed_hausdorff(rect_from_degrees(0, 10, 90, 20),
                              rect_from_degrees(-4, -10, 4, 0))
    verify_directed_hausdorff(rect_from_degrees(-4, -10, 4, 0),
                              rect_from_degrees(0, 10, 90, 20))
    # shared / complement longitude intervals
    a = rect_from_degrees(-50, -10, 50, 10)
    b = rect_from_degrees(30, -10, 60, 10)
    verify_directed_hausdorff(a, b)
    c = _rect_lat_lng(a.lat_lo, a.lat_hi,
                      a.lng.complement().lo, a.lng.complement().hi)
    verify_directed_hausdorff(c, b)
    # a touches b_opposite_lng
    verify_directed_hausdorff(rect_from_degrees(10, 170, 30, 180),
                              rect_from_degrees(-50, -10, 50, 10))
    verify_directed_hausdorff(rect_from_degrees(10, -180, 30, -170),
                              rect_from_degrees(-50, -10, 50, 10))
    # degenerate Voronoi vertex of b (lng interval spans 180 deg)
    verify_directed_hausdorff(rect_from_degrees(-30, 170, 30, 180),
                              rect_from_degrees(-10, -90, 10, 90))
    verify_directed_hausdorff(rect_from_degrees(-30, -180, 30, -170),
                              rect_from_degrees(-10, -90, 10, 90))
    # a touches a Voronoi vertex of b
    verify_directed_hausdorff(rect_from_degrees(-20, 105, 20, 110),
                              rect_from_degrees(-30, 5, 30, 15))
    verify_directed_hausdorff(rect_from_degrees(-20, 95, 20, 105),
                              rect_from_degrees(-30, 5, 30, 15))


def test_directed_hausdorff_random_pairs():
    rng = np.random.default_rng(7)
    for _ in range(400):
        p1, p2 = random_point(rng), random_point(rng)
        a = LatLngRect.from_point_pair(*latlng_of(p1), *latlng_of(p2))
        p3, p4 = random_point(rng), random_point(rng)
        b = LatLngRect.from_point_pair(*latlng_of(p3), *latlng_of(p4))
        # also exercise the lng complements (different Voronoi topology)
        a2 = _rect_lat_lng(a.lat_lo, a.lat_hi,
                           a.lng.complement().lo, a.lng.complement().hi)
        b2 = _rect_lat_lng(b.lat_lo, b.lat_hi,
                           b.lng.complement().lo, b.lng.complement().hi)
        verify_directed_hausdorff(a, b)
        verify_directed_hausdorff(a, b2)
        verify_directed_hausdorff(a2, b)
        verify_directed_hausdorff(a2, b2)
