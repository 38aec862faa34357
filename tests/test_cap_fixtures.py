"""S2CapUnitTest.basic port (region/S2CapUnitTest.kt:46-151), adapted
to this repo's Cap API (center + squared-chord radius; cap-cap
containment is checked via center distance + radii in angle space)."""

from __future__ import annotations

import math

import numpy as np

from s2_geometry_kotlin_spark.kernel.regions import Cap

EPS = 1e-15


def n(*xyz):
    v = np.asarray(xyz, dtype=np.float64)
    return v / np.linalg.norm(v)


def from_angle(center, rad):
    if rad < 0:
        return Cap(center, -1.0)
    s = math.sin(min(rad, math.pi) / 2.0)
    return Cap(center, min(4.0, 4.0 * s * s))


def radius_rad(cap):
    if cap.is_empty():
        return -1.0
    return 2.0 * math.asin(min(1.0, math.sqrt(max(0.0, cap.radius2))
                               / 2.0))


def cap_contains_cap(a, b):
    if b.is_empty():
        return True
    if a.is_empty():
        return False
    d = math.atan2(float(np.linalg.norm(np.cross(a.center, b.center))),
                   float(a.center @ b.center))
    return radius_rad(a) >= d + radius_rad(b) - 1e-15


def ll(lat, lng):
    la, lo = math.radians(lat), math.radians(lng)
    return np.array([math.cos(la) * math.cos(lo),
                     math.cos(la) * math.sin(lo), math.sin(la)])


def test_cap_basic():
    empty = Cap(np.array([1.0, 0.0, 0.0]), -1.0)
    full = Cap(np.array([1.0, 0.0, 0.0]), 4.0)
    assert empty.is_empty() and not empty.is_full()
    assert empty.complement().is_full()
    assert full.is_full()
    assert full.complement().is_empty()
    assert abs(radius_rad(full) - math.pi) < 1e-15

    # out-of-range radii clamp to empty / full
    assert from_angle(n(1, 0, 0), -20.0).is_empty()
    assert from_angle(n(1, 0, 0), 5.0).is_full()

    # singleton caps
    xaxis = Cap(n(1, 0, 0), 0.0)
    assert xaxis.contains_point(n(1, 0, 0))
    assert not xaxis.contains_point(np.array([1.0, 1e-20, 0.0]))
    assert radius_rad(xaxis) == 0.0
    yaxis = Cap(n(0, 1, 0), 0.0)
    assert not yaxis.contains_point(xaxis.center)
    # complement of a singleton is full; complement of that is empty
    xcomp = xaxis.complement()
    assert xcomp.is_full()
    assert xcomp.contains_point(xaxis.center)
    assert xcomp.complement().is_empty()

    # tiny caps represent accurately
    k_tiny = 1e-10
    tiny_c = n(1, 2, 3)
    tiny = from_angle(tiny_c, k_tiny)
    tangent = np.cross(tiny_c, n(3, 2, 1))
    tangent /= np.linalg.norm(tangent)
    assert tiny.contains_point(tiny_c + 0.99 * k_tiny * tangent)
    assert not tiny.contains_point(tiny_c + 1.01 * k_tiny * tangent)

    # hemispherical cap
    hemi_c = n(1, 0, 1)
    hemi = Cap(hemi_c, 2.0)
    comp = hemi.complement()
    assert np.allclose(comp.center, -hemi_c)
    assert abs(comp.radius2 - 2.0) < 1e-15
    assert hemi.contains_point(n(1, 0, 0))
    assert not comp.contains_point(n(1, 0, 0))
    assert hemi.contains_point(n(1.0, 0.0, -(1 - EPS)))

    # concave cap containment at both error extremes
    center = ll(80.0, 10.0)
    for delta, want in ((1e-14, True), (-1e-14, False)):
        cap = from_angle(center, math.radians(150.0) + delta)
        assert cap.contains_point(ll(-70, 10)) == want
        assert cap.contains_point(ll(-50, -170)) == want

    # cap-cap containment table
    assert not cap_contains_cap(empty, xaxis)
    assert cap_contains_cap(full, xaxis)
    assert not cap_contains_cap(xaxis, full)
    assert cap_contains_cap(xaxis, xaxis)
    assert cap_contains_cap(xaxis, empty)
    assert cap_contains_cap(hemi, tiny)
    assert cap_contains_cap(
        hemi, from_angle(n(1, 0, 0), math.pi / 4 - EPS))
    assert not cap_contains_cap(
        hemi, from_angle(n(1, 0, 0), math.pi / 4 + 1e-7))
    concave = from_angle(ll(80.0, 10.0), math.radians(150.0))
    assert cap_contains_cap(concave, hemi)
    assert not cap_contains_cap(
        concave, Cap(-concave.center, 4.0 * 0.05 * 0.05))


def test_cap_add_point_and_union():
    a = Cap(n(1, 0, 0), 0.0)
    b = a.add_point(n(0, 1, 0))
    assert b.contains_point(n(1, 0, 0))
    assert b.contains_point(n(0, 1, 0))
    mid = n(1, 1, 0)
    assert b.contains_point(mid)
    # union covers both operands
    c = Cap(n(0, 0, 1), 0.1)
    u = b.union(c)
    for p in (n(1, 0, 0), n(0, 1, 0), n(0, 0, 1)):
        assert u.contains_point(p)
