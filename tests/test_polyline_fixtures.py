"""S2PolylineUnitTest ports (region/S2PolylineUnitTest.kt): the
interpolate, project, intersects and subsampleVertices fixture tables
against the Polyline kernel."""

from __future__ import annotations

import math

import numpy as np
import pytest

from s2_geometry_kotlin_spark.kernel.polyline import Polyline


def n(*xyz):
    v = np.asarray(xyz, dtype=np.float64)
    return v / np.linalg.norm(v)


def ang(p, q) -> float:
    return math.atan2(float(np.linalg.norm(np.cross(p, q))),
                      float(p @ q))


def approx(p, q, tol=1e-13):
    return ang(p, q) <= tol


def test_interpolate():
    """:103-137: fractions along a 3-quarter-circle polyline."""
    verts = np.array([n(1, 0, 0), n(0, 1, 0), n(0, 1, 1), n(0, 0, 1)])
    line = Polyline(verts)
    assert np.array_equal(line.interpolate(-0.1), verts[0])
    assert approx(line.interpolate(0.1),
                  n(1.0, math.tan(0.2 * math.pi / 2), 0.0))
    assert approx(line.interpolate(0.25), n(1, 1, 0))
    assert approx(line.interpolate(0.5), verts[1])
    assert approx(line.interpolate(0.75), verts[2])
    assert np.array_equal(line.interpolate(1.1), verts[-1])


def test_project():
    """:167-190: projections onto an L-shaped polyline, with the index
    of the following vertex."""
    line = Polyline.from_latlng_deg([(0, 0), (0, 1), (0, 2), (1, 2)])

    def ll(lat, lng):
        la, lo = math.radians(lat), math.radians(lng)
        return np.array([math.cos(la) * math.cos(lo),
                         math.cos(la) * math.sin(lo), math.sin(la)])

    p, nxt = line.project(ll(0.5, -0.5))
    assert approx(p, ll(0, 0), 1e-10) and nxt == 1
    p, nxt = line.project(ll(0.5, 0.5))
    assert approx(p, ll(0, 0.5), 1e-6) and nxt == 1
    p, nxt = line.project(ll(0.5, 1.0))
    assert approx(p, ll(0, 1), 1e-10) and nxt == 2
    p, nxt = line.project(ll(-0.5, 2.5))
    assert approx(p, ll(0, 2), 1e-10) and nxt == 3
    p, nxt = line.project(ll(2, 2))
    assert approx(p, ll(1, 2), 1e-10) and nxt == 4


def PL(text):
    return Polyline.from_latlng_text(text)


def test_intersects():
    """:235-266: crossing, non-crossing, shared-vertex and
    vertex-on-edge cases in both directions."""
    line1 = PL("1:1, 4:4")
    assert line1.intersects(PL("1:2, 2:1"))
    assert not line1.intersects(PL("1:2, 2:3"))
    assert line1.intersects(PL("1:2, 2:3, 4:3"))
    # vertex intersections
    l1 = PL("1:1, 4:4, 4:6")
    assert l1.intersects(PL("1:1, 1:2"))
    assert l1.intersects(PL("5:1, 4:4, 2:2"))
    # vertex-on-edge: all four direction combinations
    hlr = PL("0:1, 0:3")
    vbt = PL("-1:2, 0:2, 1:2")
    hrl = PL("0:3, 0:1")
    vtb = PL("1:2, 0:2, -1:2")
    assert hlr.intersects(vbt)
    assert hlr.intersects(vtb)
    assert hrl.intersects(vbt)
    assert hrl.intersects(vtb)


SUBSAMPLE_CASES = [
    ("0:1", 1.0, "0"),
    ("10:10, 11:11", 5.0, "0,1"),
    ("-1:0, 0:0, 1:0", 1e-15, "0,2"),
    ("-1:0, 0:0, 1:1", 0.0, "0,1,2"),
    ("-1:0, 0:0, 1:1", -1.0, "0,1,2"),
    ("0:1, 0:2, 0:3, 0:4, 0:5", 1.0, "0,4"),
    ("0:1, 0:1, 0:1, 0:2", 0.0, "0,3"),
    # simple example (:299-307)
    ("0:0, 0:1, -1:2, 0:3, 0:4, 1:4, 2:4.5, 3:4, 3.5:4, 4:4", 3.0,
     "0,9"),
    ("0:0, 0:1, -1:2, 0:3, 0:4, 1:4, 2:4.5, 3:4, 3.5:4, 4:4", 2.0,
     "0,6,9"),
    ("0:0, 0:1, -1:2, 0:3, 0:4, 1:4, 2:4.5, 3:4, 3.5:4, 4:4", 0.9,
     "0,2,6,9"),
    ("0:0, 0:1, -1:2, 0:3, 0:4, 1:4, 2:4.5, 3:4, 3.5:4, 4:4", 0.4,
     "0,1,2,3,4,6,9"),
    ("0:0, 0:1, -1:2, 0:3, 0:4, 1:4, 2:4.5, 3:4, 3.5:4, 4:4", 0.0,
     "0,1,2,3,4,5,6,7,8,9"),
    # guarantees (:309-328)
    ("10:10, 12:12, 10:10", 5.0, "0"),
    ("0:0, 1:1, 0:0, 0:120, 0:130", 5.0, "0,3,4"),
    ("90:0, 50:180, 20:180, -20:180, -50:180, -90:0, 30:0, 90:0", 5.0,
     "0,2,4,5,6,7"),
    ("10:10, 10:20, 10:30, 10:15, 10:40", 5.0, "0,2,3,4"),
    ("10:10, 10:20, 10:30, 10:10, 10:30, 10:40", 5.0, "0,2,3,5"),
    ("10:10, 12:12, 9:9, 10:20, 10:30", 5.0, "0,4"),
]


@pytest.mark.parametrize("case", range(len(SUBSAMPLE_CASES)))
def test_subsample_vertices_table(case):
    text, tol_deg, expected = SUBSAMPLE_CASES[case]
    line = PL(text)
    got = line.subsample_vertices(math.radians(tol_deg))
    assert ",".join(str(i) for i in got) == expected, (case, got)
