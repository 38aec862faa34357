"""B4 S2PolylineSimplifier parity: the deterministic fixture cases of
the reference's S2PolylineSimplifierUnitTest (reuse, noConstraints,
targetOnePoint, avoidOnePoint, targetAndAvoid) plus tolerance-guarantee
property tests for simplify_polyline."""

import math

import numpy as np

from s2_geometry_kotlin_spark.kernel import cellid as ck
from s2_geometry_kotlin_spark.kernel import edges as ek
from s2_geometry_kotlin_spark.kernel.polyline import Polyline
from s2_geometry_kotlin_spark.kernel.polyline_simplifier import (
    PolylineSimplifier, simplify_polyline)


def mk(text: str) -> np.ndarray:
    lat, lng = text.split(":")
    x, y, z = ck.latlng_deg_to_xyz(np.array([float(lat)]),
                                   np.array([float(lng)]))
    return np.array([x[0], y[0], z[0]])


def mks(text: str) -> list[np.ndarray]:
    return [mk(t.strip()) for t in text.split(",")] if text else []


def check_simplify(src, dst, target, avoid, disc_on_left, radius_deg,
                   expected):
    s = PolylineSimplifier()
    s.init(mk(src))
    r = math.radians(radius_deg)
    for p in mks(target):
        s.target_disc(p, r)
    for p, left in zip(mks(avoid), disc_on_left):
        s.avoid_disc(p, r, left)
    assert s.extend(mk(dst)) == expected, (src, dst, target, avoid)


def norm(v):
    return v / np.linalg.norm(v)


def test_reuse():
    s = PolylineSimplifier()
    r = math.radians(10)
    s.init(np.array([1.0, 0.0, 0.0]))
    assert s.target_disc(norm(np.array([1.0, 1.0, 0.0])), r)
    assert s.target_disc(norm(np.array([1.0, 1.0, 0.1])), r)
    assert not s.extend(norm(np.array([1.0, 1.0, 0.4])))
    s.init(np.array([0.0, 1.0, 0.0]))
    assert s.target_disc(norm(np.array([1.0, 1.0, 0.3])), r)
    assert s.target_disc(norm(np.array([1.0, 1.0, 0.2])), r)
    assert not s.extend(norm(np.array([1.0, 1.0, 0.0])))


def test_no_constraints():
    check_simplify("0:1", "0:1", "", "", [], 0.0, True)
    check_simplify("0:1", "1:0", "", "", [], 0.0, True)
    # edges > 90 degrees unsupported
    check_simplify("0:0", "0:91", "", "", [], 0.0, False)


def test_target_one_point():
    check_simplify("0:0", "0:2", "0:1", "", [], 1e-10, True)
    check_simplify("0:0", "0:2", "1:1", "", [], 0.9, False)
    # target disc containing the source vertex
    check_simplify("0:0", "0:2", "0:0.1", "", [], 1.0, True)
    # target disc containing the destination vertex
    check_simplify("0:0", "0:2", "0:2.1", "", [], 1.0, True)


def test_avoid_one_point():
    check_simplify("0:0", "0:2", "", "0:1", [True], 1e-10, False)
    check_simplify("0:0", "0:2", "", "1:1", [True], 0.9, True)
    # point is on the left but client requires right
    check_simplify("0:0", "0:2", "", "1:1", [False], 1e-10, False)


def test_target_and_avoid():
    check_simplify("0:0", "10:10", "2:3, 4:3, 7:8",
                   "4:2, 7:5, 7:9", [True, True, False], 1.0, True)
    # one targeted point 1.4 degrees away
    check_simplify("0:0", "10:10", "2:3, 4:6, 7:8",
                   "4:2, 7:5, 7:9", [True, True, False], 1.0, False)
    # one avoided point 0.7 degrees away
    check_simplify("0:0", "10:10", "2:3, 4:3, 7:8",
                   "4:2, 6:5, 7:9", [True, True, False], 1.0, False)


def _pts(latlons):
    la = np.array([p[0] for p in latlons])
    lo = np.array([p[1] for p in latlons])
    x, y, z = ck.latlng_deg_to_xyz(la, lo)
    return np.stack([x, y, z], axis=1)


def _worst_deviation(v, idx):
    worst = 0.0
    for a, b in zip(idx[:-1], idx[1:]):
        seg = v[a:b + 1]
        d2 = ek.point_edge_chord2_pairwise(
            seg, np.broadcast_to(v[a], seg.shape).copy(),
            np.broadcast_to(v[b], seg.shape).copy())
        worst = max(worst, float(
            (2 * np.arcsin(0.5 * np.sqrt(np.clip(d2, 0, 4)))).max()))
    return worst


def test_simplify_polyline_tolerance_guarantee():
    rng = np.random.RandomState(11)
    lat, lon = 40.0, -74.0
    path = [(lat, lon)]
    for _ in range(300):
        lat += rng.uniform(-0.05, 0.05)
        lon += rng.uniform(0.05, 0.1)
        path.append((lat, lon))
    v = _pts(path)
    for tol_deg in (0.5, 0.1, 0.02):
        tol = math.radians(tol_deg)
        idx = simplify_polyline(v, tol)
        assert idx[0] == 0 and idx[-1] == len(v) - 1
        assert sorted(set(idx)) == idx
        assert _worst_deviation(v, idx) <= tol
        assert len(idx) < len(v)
    # monotone: coarser tolerance keeps fewer vertices
    n_coarse = len(simplify_polyline(v, math.radians(0.5)))
    n_fine = len(simplify_polyline(v, math.radians(0.02)))
    assert n_coarse <= n_fine


def test_simplify_beats_subsample():
    """The bearing-window simplifier should thin at least as well as the
    greedy subsample at the same tolerance on a wiggly path."""
    rng = np.random.RandomState(3)
    lats = [0.0 + 0.004 * rng.standard_normal() for _ in range(100)]
    lons = [float(i) * 0.05 for i in range(100)]
    pl = Polyline(_pts(list(zip(lats, lons))))
    tol = math.radians(0.05)
    n_simpl = len(pl.simplify(tol).vertices)
    n_subs = len(pl.subsample_vertices(tol))
    assert n_simpl <= n_subs
    assert n_simpl < 100


def test_straight_line_collapses():
    v = _pts([(0.0, float(i) * 0.1) for i in range(50)])
    idx = simplify_polyline(v, math.radians(1e-6))
    assert idx == [0, 49]
