"""S2EdgeDistancesUnitTest named-case ports
(edge/S2EdgeDistancesUnitTest.kt): the distance/project table (:126-146)
and the interpolate table (:204-245) against the D2 kernels."""

from __future__ import annotations

import math

import numpy as np
import pytest

from s2_geometry_kotlin_spark.kernel.edges import (
    interpolate, point_edge_chord2_pairwise, project_to_edge)

PI = math.pi


def n(*xyz):
    v = np.asarray(xyz, dtype=np.float64)
    return v / np.linalg.norm(v)


def dist_rad(x, a, b) -> float:
    d2 = float(point_edge_chord2_pairwise(
        x[None, :], a[None, :], b[None, :])[0])
    return 2.0 * math.asin(min(1.0, math.sqrt(d2) / 2.0))


DISTANCE_CASES = [
    # (x, a, b, distance_radians, expected_closest or None for "a or b")
    ((1, 0, 0), (1, 0, 0), (0, 1, 0), 0.0, (1, 0, 0)),
    ((0, 1, 0), (1, 0, 0), (0, 1, 0), 0.0, (0, 1, 0)),
    ((1, 3, 0), (1, 0, 0), (0, 1, 0), 0.0, (1, 3, 0)),
    ((0, 0, 1), (1, 0, 0), (0, 1, 0), PI / 2, (1, 0, 0)),
    ((0, 0, -1), (1, 0, 0), (0, 1, 0), PI / 2, (1, 0, 0)),
    ((-1, -1, 0), (1, 0, 0), (0, 1, 0), 0.75 * PI, None),
    ((0, 1, 0), (1, 0, 0), (1, 1, 0), PI / 4, (1, 1, 0)),
    ((0, -1, 0), (1, 0, 0), (1, 1, 0), PI / 2, (1, 0, 0)),
    ((0, -1, 0), (1, 0, 0), (-1, 1, 0), PI / 2, (1, 0, 0)),
    ((-1, -1, 0), (1, 0, 0), (-1, 1, 0), PI / 2, (-1, 1, 0)),
    ((1, 1, 1), (1, 0, 0), (0, 1, 0),
     math.asin(math.sqrt(1.0 / 3.0)), (1, 1, 0)),
    ((1, 1, -1), (1, 0, 0), (0, 1, 0),
     math.asin(math.sqrt(1.0 / 3.0)), (1, 1, 0)),
    ((-1, 0, 0), (1, 1, 0), (1, 1, 0), 0.75 * PI, (1, 1, 0)),
    ((0, 0, -1), (1, 1, 0), (1, 1, 0), PI / 2, (1, 1, 0)),
    ((-1, 0, 0), (1, 0, 0), (1, 0, 0), PI, (1, 0, 0)),
]


@pytest.mark.parametrize("case", range(len(DISTANCE_CASES)))
def test_distance_and_project(case):
    x, a, b, want, closest = DISTANCE_CASES[case]
    x, a, b = n(*x), n(*a), n(*b)
    assert abs(dist_rad(x, a, b) - want) < 1e-14
    got = project_to_edge(x[None, :], a[None, :], b[None, :])[0]
    if closest is None:
        assert np.allclose(got, a, atol=1e-14) or \
            np.allclose(got, b, atol=1e-14)
    else:
        c = n(*closest)
        assert ang(got, c) < 1e-13


def ipol(t, a, b):
    return interpolate(a[None, :], b[None, :], t)[0]


def ang(p, q) -> float:
    """Precise small-angle measure (S1Angle(x, y): atan2(|pxq|, p.q) —
    arccos of a dot product cannot resolve below ~1e-8)."""
    return math.atan2(float(np.linalg.norm(np.cross(p, q))),
                      float(p @ q))


def approx(p, q, tol=3e-15):
    return ang(p, q) <= tol + 1e-15


def test_interpolate_table():
    """:204-245 including the long-edge accuracy sweep and the
    antipodal-edge distance property."""
    p1 = n(0.1, 1e-30, 0.3)
    p2 = n(-0.7, -0.55, -1e30)
    assert approx(ipol(0.0, p1, p1), p1)
    assert approx(ipol(1.0, p1, p1), p1)
    assert approx(ipol(0.0, p1, p2), p1)
    assert approx(ipol(1.0, p1, p2), p2)
    assert approx(ipol(0.5, p1, p2), n(*(0.5 * (p1 + p2))))
    s3 = math.sqrt(3.0)
    assert approx(ipol(1 / 3, n(1, 0, 0), n(0, 1, 0)), n(s3, 1, 0))
    assert approx(ipol(2 / 3, n(1, 0, 0), n(0, 1, 0)), n(1, s3, 0))
    # long-edge accuracy: fractions down to 1e-15 of a near-pi edge
    k_lng = PI - 1e-2
    a = n(1, 0, 0)
    b = np.array([math.cos(k_lng), math.sin(k_lng), 0.0])
    f = 0.4
    while f > 1e-15:
        for t in (f, 1 - f):
            want = np.array([math.cos(t * k_lng),
                             math.sin(t * k_lng), 0.0])
            assert approx(ipol(t, a, b), want, tol=3e-15), (f, t)
        f *= 0.1
    # antipodal edge: distance from the start grows as t*pi
    t = 0.0
    while t <= 1.0:
        got = ipol(t, p1, -p1)
        measured = ang(got, p1) if t <= 0.5 else PI - ang(got, -p1)
        assert abs(measured - t * PI) < 3e-15
        t += 0.125


def test_distance_optimization_is_conservative():
    """:149-159: a case that used to defeat the fast lower bound."""
    x = np.array([-0.017952729194524016, -0.30232422079175203,
                  0.95303607751077712])
    a = np.array([-0.017894725505830295, -0.30229974986194175,
                  0.95304493075220664])
    b = np.array([-0.017986591360900289, -0.30233851195954353,
                  0.95303090543659963])
    d = dist_rad(x, a, b)
    # the distance is tiny but must be finite and nonnegative, and the
    # projection must land on the edge (between the endpoints)
    assert 0.0 <= d < 1e-4
    p = project_to_edge(x[None, :], a[None, :], b[None, :])[0]
    assert float((p - a) @ (b - a)) >= 0
    assert float((p - b) @ (a - b)) >= 0
