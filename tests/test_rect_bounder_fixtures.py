"""S2LatLngRectBounder ports
(region/S2LatLngRectBounderUnitTest.kt): the simple max-latitude table
(:61-83) and the random max-latitude sweep (:86-117) against the
extracted per-edge bound kernel."""

from __future__ import annotations

import math
import random

import numpy as np
import pytest

from s2_geometry_kotlin_spark.kernel.regions import edge_lat_lng_bound

# kRectError (S2LatLngRectBounder.maxErrorForTests): the reference
# allows ~4.6 dbl-eps in latitude for edge bounds
LAT_ERR = 10 * 2.220446049250313e-16


def n(*xyz):
    v = np.asarray(xyz, dtype=np.float64)
    return v / np.linalg.norm(v)


def lat_of(p) -> float:
    return math.atan2(float(p[2]), math.hypot(float(p[0]),
                                              float(p[1])))


def bound(a, b):
    return edge_lat_lng_bound(n(*a), n(*b))


def test_max_latitude_simple():
    """:61-83: vertex-attained extremes, edge-interior extremes and
    pole-crossing edges."""
    cube_lat = math.asin(1 / math.sqrt(3.0))
    lo, hi, li = bound((1, 1, 1), (1, -1, -1))
    assert abs(lo + cube_lat) < LAT_ERR and abs(hi - cube_lat) < LAT_ERR
    assert li.contains(-math.pi / 4) and li.contains(math.pi / 4)
    lo, hi, _ = bound((1, -1, 1), (1, 1, -1))
    assert abs(lo + cube_lat) < LAT_ERR and abs(hi - cube_lat) < LAT_ERR
    # edge-interior latitude extremes (all four orientations)
    _, hi, _ = bound((1, 1, 1), (1, -1, 1))
    assert abs(hi - math.pi / 4) < LAT_ERR
    _, hi, _ = bound((1, -1, 1), (1, 1, 1))
    assert abs(hi - math.pi / 4) < LAT_ERR
    lo, _, _ = bound((1, -1, -1), (-1, -1, -1))
    assert abs(lo + math.pi / 4) < LAT_ERR
    lo, _, _ = bound((-1, 1, -1), (-1, -1, -1))
    assert abs(lo + math.pi / 4) < LAT_ERR
    # pole-crossing edges reach the pole exactly
    _, hi, _ = bound((0.3, 0.4, 1.0), (-0.3, -0.4, 1.0))
    assert hi == math.pi / 2
    lo, _, _ = bound((0.3, 0.4, -1.0), (-0.3, -0.4, -1.0))
    assert lo == -math.pi / 2


@pytest.mark.parametrize("seed", [71, 72])
def test_max_latitude_random(seed):
    """:86-117: segments through a point U slightly above the equator
    (resp. a point W near the pole) have max latitude equal to U's
    (resp. W's) latitude, to within the error bound."""
    rng = random.Random(seed)
    for _ in range(100):
        p = np.array([rng.gauss(0, 1), rng.gauss(0, 1), 0.0])
        p[2] = 2.22e-16 * 1e-6 * (1e12 ** rng.random())
        u = p / np.linalg.norm(p)
        v = np.cross(np.array([0.0, 0.0, 1.0]), u)
        v /= np.linalg.norm(v)
        w = np.cross(u, v)
        w /= np.linalg.norm(w)
        a = n(*(u - rng.random() * v))
        b = n(*(u + rng.random() * v))
        _, hi, _ = edge_lat_lng_bound(a, b)
        assert abs(hi - lat_of(u)) < LAT_ERR
        c = n(*(w - rng.random() * v))
        d = n(*(w + rng.random() * v))
        _, hi, _ = edge_lat_lng_bound(c, d)
        assert abs(hi - lat_of(w)) < LAT_ERR


@pytest.mark.parametrize("seed", [73])
def test_edge_bound_contains_sampled_points(seed):
    """The bound must contain densely sampled points of the edge
    (the bounder's contract used by every covering)."""
    from s2_geometry_kotlin_spark.kernel.edges import interpolate
    rng = random.Random(seed)
    for _ in range(50):
        a = n(rng.gauss(0, 1), rng.gauss(0, 1), rng.gauss(0, 1))
        b = n(rng.gauss(0, 1), rng.gauss(0, 1), rng.gauss(0, 1))
        lo, hi, li = edge_lat_lng_bound(a, b)
        ts = np.linspace(0, 1, 64)
        pts = interpolate(np.broadcast_to(a, (64, 3)),
                          np.broadcast_to(b, (64, 3)), ts)
        for p in pts:
            la = lat_of(p)
            lng = math.atan2(float(p[1]), float(p[0]))
            assert lo - 1e-14 <= la <= hi + 1e-14
            # expand slightly for the comparison only
            assert li.expanded(1e-14).contains(lng)


def test_equatorial_edge_does_not_reach_poles():
    """ADVICE r5 regression: an exactly-equatorial edge (great circle
    normal = +-z) has its latitude extremes at its vertices — the old
    'meridian through a pole' branch matched these edges (nxy == 0) and
    its degenerate arc test (0 >= 0) stretched every equator edge's
    bound to both poles.  Reference: S2LatLngRectBounder gives ~[0,0]
    for an equator loop."""
    a = n(1.0, 0.0, 0.0)
    b = n(0.0, 1.0, 0.0)
    lo, hi, _ = edge_lat_lng_bound(a, b)
    assert abs(lo) < 1e-15 and abs(hi) < 1e-15
    # reversed orientation too
    lo, hi, _ = edge_lat_lng_bound(b, a)
    assert abs(lo) < 1e-15 and abs(hi) < 1e-15
    # a CCW equator loop (interior = northern hemisphere, contains the
    # N pole) bounds lat [0, pi/2]: pi/2 comes from loop-level pole
    # containment, NOT from the edge bounder — the bug gave
    # [-pi/2, pi/2] (edge bounder volunteering both poles)
    from s2_geometry_kotlin_spark.kernel.regions import Loop
    eq = Loop(np.array([n(1, 0, 0), n(0, 1, 0), n(-1, 0, 0),
                        n(0, -1, 0)]))
    rb = eq.rect_bound()
    assert abs(rb.lat_lo) < 1e-9 and abs(rb.lat_hi - math.pi / 2) < 1e-12


def test_meridian_edge_through_pole_still_bounds_pole():
    """The genuine pole-crossing case (nrm[2] == 0, nxy > 0) must keep
    reaching the pole through the main branch."""
    a = n(1.0, 0.0, 1.0)     # lat 45, lng 0
    b = n(-1.0, 0.0, 1.0)    # lat 45, lng 180 — shorter arc over N pole
    _, hi, _ = edge_lat_lng_bound(a, b)
    assert abs(hi - math.pi / 2) < 1e-12
