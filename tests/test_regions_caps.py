"""Cap/LatLngRect completion: addPoint, expanded, union, rectBound,
expandedByDistance, getDistance (S2Cap.kt:224-295,340-388;
S2LatLngRect.kt:435-447,620-650)."""

import math

import numpy as np

from s2_geometry_kotlin_spark.kernel import cellid as ck
from s2_geometry_kotlin_spark.kernel import distance as dist
from s2_geometry_kotlin_spark.kernel.regions import Cap, LatLngRect


def _pt(lat, lon):
    x, y, z = ck.latlng_deg_to_xyz(np.array([lat]), np.array([lon]))
    return np.array([x[0], y[0], z[0]])


def test_cap_add_point():
    cap = Cap(_pt(0, 0), -1.0)  # empty
    cap = cap.add_point(_pt(10, 10))
    assert not cap.is_empty() and cap.contains_point(_pt(10, 10))
    cap2 = cap.add_point(_pt(12, 10))
    assert cap2.contains_point(_pt(12, 10))
    assert cap2.contains_point(_pt(10, 10))


def test_cap_expanded():
    cap = Cap.from_latlng_radius_deg(20, 30, 1.0)
    grown = cap.expanded(math.radians(2.0))
    p = _pt(20, 30 + 2.8)  # ~2.63 deg away, inside 3-degree cap
    assert not cap.contains_point(p)
    assert grown.contains_point(p)
    empty = Cap(_pt(0, 0), -1.0).expanded(1.0)
    assert empty.is_empty()


def test_cap_union():
    a = Cap.from_latlng_radius_deg(0, 0, 2.0)
    b = Cap.from_latlng_radius_deg(0, 10, 2.0)
    u = a.union(b)
    for p in (_pt(0, -1.9), _pt(0, 11.9), _pt(0, 5)):
        assert u.contains_point(p)
    # containment short-circuit: union with a nested cap is this cap
    c = Cap.from_latlng_radius_deg(0, 0, 0.5)
    assert a.union(c).radius2 == a.radius2


def test_cap_rect_bound():
    cap = Cap.from_latlng_radius_deg(40, 10, 3.0)
    r = cap.rect_bound()
    assert r.contains_latlng(math.radians(42.9), math.radians(10))
    assert not r.contains_latlng(math.radians(44), math.radians(10))
    # longitude width grows with latitude: wider than 3 deg at lat 40
    assert r.lng.hi - r.lng.lo > 2 * math.radians(3.0)
    # a polar cap covers all longitudes
    polar = Cap.from_latlng_radius_deg(89, 0, 3.0)
    assert polar.rect_bound().lng.is_full()


def test_rect_expanded_by_distance():
    r = LatLngRect.from_degrees(10, 20, 30, 40)
    g = r.expanded_by_distance(math.radians(2.0))
    assert g.contains_latlng(math.radians(21.5), math.radians(35))
    assert g.contains_latlng(math.radians(15), math.radians(41.5))
    assert not g.contains_latlng(math.radians(25), math.radians(35))


def test_rect_get_distance():
    r = LatLngRect.from_degrees(10, 20, 30, 40)
    assert r.get_distance_latlng(math.radians(15),
                                 math.radians(35)) == 0.0
    # due north of the rect: pure latitude difference
    d = r.get_distance_latlng(math.radians(25), math.radians(35))
    assert abs(d - math.radians(5)) < 1e-12
    # due east: distance to the nearest meridian edge at same latitude
    d = r.get_distance_latlng(math.radians(15), math.radians(45))
    expected = math.radians(5) * math.cos(math.radians(15))
    assert abs(d - expected) < 1e-3
