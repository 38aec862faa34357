"""B3 shared-boundary operands: boolean ops on polygons that share
exact vertices / border chains (the adjacent-admin-polygons case).

Reference semantics: S2BooleanOperation with PolygonModel.SEMI_OPEN
(S2BooleanOperation.kt:287) resolved through CrossingProcessor's
degenerate-edge accounting; this repo's independent construction
classifies exact shared sub-edges directly (kernel/booleanop.py
_kept_subedges + the clockwise stitch junction rule).
"""

import math

import numpy as np
import pytest

from s2_geometry_kotlin_spark.kernel import measures
from s2_geometry_kotlin_spark.kernel.booleanop import polygon_boolean
from s2_geometry_kotlin_spark.kernel.polygon_relations import loop_depths
from s2_geometry_kotlin_spark.kernel.regions import Loop, Polygon


def polygon_area(p: Polygon) -> float:
    tot = 0.0
    for lp, d in zip(p.loops, loop_depths(p)):
        a = measures.loop_area(lp.vertices)
        tot += a if d % 2 == 0 else -a
    return tot


def quad(lat0, lat1, lng0, lng1, mid_lat=None, shared_side=None):
    """Lat/lng quad, CCW (interior on left).  With mid_lat+shared_side
    ('east'/'west'), an extra vertex splits that meridian side so two
    adjacent quads carry an identical multi-edge border chain."""
    pts = [(lat0, lng0), (lat0, lng1), (lat1, lng1), (lat1, lng0)]
    if shared_side == "east":
        pts = [(lat0, lng0), (lat0, lng1), (mid_lat, lng1),
               (lat1, lng1), (lat1, lng0)]
    elif shared_side == "west":
        pts = [(lat0, lng0), (lat0, lng1), (lat1, lng1),
               (lat1, lng0), (mid_lat, lng0)]
    txt = ", ".join(f"{la}:{lo}" for la, lo in pts)
    return Polygon([Loop.from_latlng_text(txt)])


def pt(lat, lng):
    from s2_geometry_kotlin_spark.kernel import cellid as ck
    x, y, z = ck.latlng_deg_to_xyz(np.array([lat]), np.array([lng]))
    return np.array([x[0], y[0], z[0]])


# West quad [0,10]x[0,10] and east quad [0,10]x[10,20] share the
# meridian chain lng=10 with an interior vertex at lat=5 — the chain
# appears with IDENTICAL coordinates (same lat/lng text) in both.
W = quad(0, 10, 0, 10, mid_lat=5, shared_side="east")
E = quad(0, 10, 10, 20, mid_lat=5, shared_side="west")

PROBES = [(5, 5), (2, 3), (8, 7),        # inside W only
          (5, 15), (2, 13), (8, 17),     # inside E only
          (5, 25), (-3, 5), (13, 15)]    # outside both


def _member(poly, probes=PROBES):
    return [poly.contains_point(pt(la, lo)) for la, lo in probes]


def test_adjacent_union_merges_border():
    u = polygon_boolean(W, E, "union")
    assert len(u.loops) == 1
    # membership = OR of operands at every probe
    got = _member(u)
    exp = [a or b for a, b in zip(_member(W), _member(E))]
    assert got == exp
    # area additivity (disjoint interiors)
    assert math.isclose(polygon_area(u), polygon_area(W) + polygon_area(E),
                        rel_tol=1e-12)
    # the shared chain is gone: no union vertex at the interior chain
    # vertex (5, 10) — junction endpoints (0,10)/(10,10) may remain
    mid = pt(5, 10)
    for lp in u.loops:
        assert not any(np.array_equal(v, mid) for v in lp.vertices)


def test_adjacent_intersection_is_empty():
    i = polygon_boolean(W, E, "intersection")
    assert len(i.loops) == 0  # SEMI_OPEN: touching boundary -> empty


def test_adjacent_differences_return_operands():
    d1 = polygon_boolean(W, E, "difference")
    d2 = polygon_boolean(E, W, "difference")
    assert math.isclose(polygon_area(d1), polygon_area(W), rel_tol=1e-12)
    assert math.isclose(polygon_area(d2), polygon_area(E), rel_tol=1e-12)
    assert _member(d1) == _member(W)
    assert _member(d2) == _member(E)


def test_adjacent_symmetric_difference_is_union():
    x = polygon_boolean(W, E, "symmetric_difference")
    exp = [a != b for a, b in zip(_member(W), _member(E))]
    assert _member(x) == exp
    assert math.isclose(polygon_area(x), polygon_area(W) + polygon_area(E),
                        rel_tol=1e-12)


def test_identical_operands():
    a = quad(20, 30, 40, 50)
    b = quad(20, 30, 40, 50)  # same text -> identical coordinates
    u = polygon_boolean(a, b, "union")
    i = polygon_boolean(a, b, "intersection")
    d = polygon_boolean(a, b, "difference")
    x = polygon_boolean(a, b, "symmetric_difference")
    assert math.isclose(polygon_area(u), polygon_area(a), rel_tol=1e-12)
    assert math.isclose(polygon_area(i), polygon_area(a), rel_tol=1e-12)
    assert len(d.loops) == 0
    assert len(x.loops) == 0
    probes = [(25, 45), (21, 41), (35, 45), (25, 55)]
    assert _member(u, probes) == _member(a, probes)
    assert _member(i, probes) == _member(a, probes)


def test_contained_operand_sharing_border_chain():
    """B = [0,10]x[0,20] split internally: A = its west half (shares
    B's west/south/north-west border? no — shares only the part of B's
    boundary on the west rectangle's outer sides).  B - A must equal
    the east half."""
    big = quad(0, 10, 0, 20)
    west = quad(0, 10, 0, 10)
    # shared features here: corner vertices (0,0),(10,0) and the south/
    # west/north boundary SEGMENTS differ in vertex placement (big's
    # south edge spans 0..20 in one edge, west's in two) -> that's a
    # T-junction, out of scope.  Instead share exactly: build big as
    # explicit two-half outline so every shared edge matches 1:1.
    big = Polygon([Loop.from_latlng_text(
        "0:0, 0:10, 0:20, 10:20, 10:10, 10:0")])
    east = Polygon([Loop.from_latlng_text(
        "0:10, 0:20, 10:20, 10:10")])
    d = polygon_boolean(big, west, "difference")
    assert math.isclose(polygon_area(d), polygon_area(east), rel_tol=1e-12)
    probes = [(5, 5), (5, 15), (5, 25), (-3, 5)]
    assert _member(d, probes) == _member(east, probes)
    # and west ∪ east reassembles big
    u = polygon_boolean(west, east, "union")
    assert math.isclose(polygon_area(u), polygon_area(big), rel_tol=1e-12)


def test_vertex_touching_union_two_loops():
    """Two quads sharing exactly ONE vertex (pinch point): the union
    keeps both rings; the clockwise stitch rule must produce two simple
    loops touching at the vertex, not one self-crossing loop."""
    a = Polygon([Loop.from_latlng_text("-10:-10, 0:0, -10:10")])
    b = Polygon([Loop.from_latlng_text("10:10, 0:0, 10:-10")])
    # triangles touching at (0,0); orientation: a below, CCW?
    # a: (-10,-10) -> (0,0) -> (-10,10): interior must be the southern
    # triangle; verify membership instead of assuming orientation
    pa, pb = pt(-8, 0), pt(8, 0)
    if not a.contains_point(pa):
        a = Polygon([Loop.from_latlng_text("-10:10, 0:0, -10:-10")])
    if not b.contains_point(pb):
        b = Polygon([Loop.from_latlng_text("10:-10, 0:0, 10:10")])
    assert a.contains_point(pa) and b.contains_point(pb)
    u = polygon_boolean(a, b, "union")
    assert len(u.loops) == 2
    assert u.contains_point(pa) and u.contains_point(pb)
    assert not u.contains_point(pt(0, 8))
    assert math.isclose(polygon_area(u), polygon_area(a) + polygon_area(b),
                        rel_tol=1e-12)
    i = polygon_boolean(a, b, "intersection")
    assert len(i.loops) == 0


def test_adjacent_fixture_layer_builds():
    """The driver fixture: both adjacent pairs union into single rings
    and contain their city centers."""
    from s2_geometry_kotlin_spark.operators.booleans import (
        adjacent_pairs, adjacent_union_layer)
    layer = adjacent_union_layer()
    assert len(layer) == len(adjacent_pairs()) == 2
    centers = [(48.8566, 2.3522), (51.5072, -0.1276)]
    for (name, k, poly), (la, lo) in zip(layer, centers):
        assert name == "adj_union"
        assert len(poly.loops) == 1
        # center sits ON the former shared chain -> probe just off it
        assert poly.contains_point(pt(la, lo + 0.01))
        assert poly.contains_point(pt(la, lo - 0.01))


def test_grid_tiling_union_fold_random_orders():
    """Compositional shared-boundary stress: a 3x2 grid of quads tiling
    a rectangle, union-folded in random orders.  Every intermediate
    union shares whole border chains with the next tile (including
    junction vertices of earlier merges), so this exercises repeated
    shared-edge classification + junction stitching.  The final result
    must equal the bounding rectangle by area and membership."""
    import random

    rng = random.Random(3)
    lat_cuts = [0, 7, 14]
    lng_cuts = [0, 6, 12, 18]
    tiles = []
    for i in range(2):
        for j in range(3):
            la0, la1 = lat_cuts[i], lat_cuts[i + 1]
            lo0, lo1 = lng_cuts[j], lng_cuts[j + 1]
            tiles.append(Polygon([Loop.from_latlng_text(
                f"{la0}:{lo0}, {la0}:{lo1}, {la1}:{lo1}, {la1}:{lo0}")]))
    total_area = sum(polygon_area(t) for t in tiles)
    probes = [(3, 3), (3, 9), (3, 15), (10, 3), (10, 9), (10, 15),
              (3, 21), (-2, 9), (16, 9), (10, -1)]
    exp = [any(t.contains_point(pt(*p)) for t in tiles) for p in probes]
    for _ in range(6):
        order = list(range(len(tiles)))
        rng.shuffle(order)
        acc = tiles[order[0]]
        for k in order[1:]:
            acc = polygon_boolean(acc, tiles[k], "union")
        got = [acc.contains_point(pt(*p)) for p in probes]
        assert got == exp, order
        assert math.isclose(polygon_area(acc), total_area,
                            rel_tol=1e-11), order


def test_inverted_operand_booleans():
    """Operands representing MORE than half the sphere (the Polygon
    `inverted` parity bit) reduce through complement identities; the
    round-3 code raised NotImplementedError here."""
    from s2_geometry_kotlin_spark.sources.layers import \
        regular_loop_vertices

    PARIS = (48.8566, 2.3522)
    big = Polygon([Loop(regular_loop_vertices(*PARIS, 120.0, 24))])
    small = Polygon([Loop(regular_loop_vertices(*PARIS, 2.0, 16))])
    assert big.inverted and not small.inverted

    def area_r(p):
        a = polygon_area(p)
        return 4 * math.pi - a if p.inverted else a

    probes = [pt(*PARIS), pt(48.0, 10.0), pt(-48.8566, -177.65),
              pt(-20.0, -150.0), pt(49.5, 2.36)]

    def member(p):
        return [p.contains_point(q) for q in probes]

    cases = {
        "intersection": lambda x, y: x and y,
        "union": lambda x, y: x or y,
        "difference": lambda x, y: x and not y,
        "symmetric_difference": lambda x, y: x != y,
    }
    mb, ms = member(big), member(small)
    for op, rule in cases.items():
        res = polygon_boolean(big, small, op)
        assert member(res) == [rule(x, y) for x, y in zip(mb, ms)], op
        res = polygon_boolean(small, big, op)
        assert member(res) == [rule(y, x) for x, y in zip(mb, ms)], op
    # area identities: small is strictly inside big
    assert math.isclose(area_r(polygon_boolean(big, small,
                                               "intersection")),
                        area_r(small), rel_tol=1e-12)
    assert math.isclose(area_r(polygon_boolean(big, small, "union")),
                        area_r(big), rel_tol=1e-12)
    assert math.isclose(area_r(polygon_boolean(big, small,
                                               "difference")),
                        area_r(big) - area_r(small), rel_tol=1e-9)
    assert len(polygon_boolean(small, big, "difference").loops) == 0
    # both inverted: union of two > half-sphere caps covers the sphere
    # minus the intersection of their complements
    big2 = Polygon([Loop(regular_loop_vertices(-48.8566, -177.6478,
                                               120.0, 24))])
    assert big2.inverted
    u = polygon_boolean(big, big2, "union")
    i = polygon_boolean(big, big2, "intersection")
    mb2 = member(big2)
    assert member(u) == [x or y for x, y in zip(mb, mb2)]
    assert member(i) == [x and y for x, y in zip(mb, mb2)]
    # inclusion-exclusion on the pair
    assert math.isclose(area_r(u) + area_r(i),
                        area_r(big) + area_r(big2), rel_tol=1e-9)


def test_t_junction_operands_rescued_by_pair_snap():
    """A vertex of one operand in the INTERIOR of the other's edge (a
    T-junction, the classic adjacent-but-differently-discretized
    border): the auto-snap retry now snaps the PAIR against one shared
    site set, so the junction vertices split the long edge and the
    shared-boundary classification takes over.  Round-3 (and the
    per-operand snap retry) failed the stitch here."""
    a = Polygon([Loop.from_latlng_text("0:0, 0:10, 10:10, 10:0")])
    # east neighbour attached to the MIDDLE of A's east edge
    b = Polygon([Loop.from_latlng_text("3:10, 3:14, 7:14, 7:10")])
    probes = [(5, 5), (5, 12), (5, 15), (1, 12), (5, 9.99), (5, 10.01)]
    ma = [a.contains_point(pt(*p)) for p in probes]
    mb = [b.contains_point(pt(*p)) for p in probes]
    rules = {"union": lambda x, y: x or y,
             "intersection": lambda x, y: x and y,
             "difference": lambda x, y: x and not y,
             "symmetric_difference": lambda x, y: x != y}
    for op, rule in rules.items():
        r = polygon_boolean(a, b, op)
        got = [r.contains_point(pt(*p)) for p in probes]
        assert got == [rule(x, y) for x, y in zip(ma, mb)], op
    # area sanity on the union (snap at level 20 moves vertices ~10 m;
    # tolerance reflects that, not the construction)
    u = polygon_boolean(a, b, "union")
    assert math.isclose(polygon_area(u),
                        polygon_area(a) + polygon_area(b), rel_tol=1e-4)


def test_random_strip_tilings_boolean_identities():
    """Randomized adversarial sweep: a rectangle cut into vertical
    strips at random meridians (all strips share exact borders).
    Identities checked per seed: union-fold == rectangle; rect minus
    one strip == union of the others; xor of adjacent strips == their
    union; intersection of non-adjacent strips == empty."""
    import random

    for seed in range(5):
        rng = random.Random(100 + seed)
        n_cuts = rng.randrange(2, 5)
        cuts = sorted(rng.sample(range(1, 20), n_cuts))
        lngs = [0] + cuts + [20]
        strips = [Polygon([Loop.from_latlng_text(
            f"0:{lngs[i]}, 0:{lngs[i+1]}, 8:{lngs[i+1]}, 8:{lngs[i]}")])
            for i in range(len(lngs) - 1)]
        rect = Polygon([Loop.from_latlng_text("0:0, 0:20, 8:20, 8:0")])
        probes = [(4, x + 0.5) for x in range(0, 20, 2)] + \
            [(9, 5), (-1, 5), (4, 21)]

        def member(p):
            return [p.contains_point(pt(*q)) for q in probes]

        order = list(range(len(strips)))
        rng.shuffle(order)
        acc = strips[order[0]]
        for k in order[1:]:
            acc = polygon_boolean(acc, strips[k], "union")
        assert member(acc) == member(rect), (seed, cuts)
        # NOTE: the union does NOT equal the rect exactly — the rect's
        # top/bottom edges are single long geodesics while the strips
        # chain shorter ones along the same parallels, different curves
        # (thin lens-shaped slivers).  Probes sit away from those
        # slivers; the exact identity is area(union) == sum of strip
        # areas (disjoint interiors).
        assert math.isclose(polygon_area(acc),
                            sum(polygon_area(s) for s in strips),
                            rel_tol=1e-11), (seed, cuts)
        # rect minus strip k == union of the rest.  NOTE: rect's border
        # vertices differ from the strips' cut vertices (T-junctions at
        # the cuts), so this leg also exercises the pair-snap rescue;
        # compare by membership at probes off the snapped seams
        k = rng.randrange(len(strips))
        rest = [s for i, s in enumerate(strips) if i != k]
        acc2 = rest[0]
        for s2 in rest[1:]:
            acc2 = polygon_boolean(acc2, s2, "union")
        d = polygon_boolean(rect, strips[k], "difference")
        assert member(d) == member(acc2), (seed, cuts, k)
        if len(strips) >= 3:
            x = polygon_boolean(strips[0], strips[1],
                                "symmetric_difference")
            u = polygon_boolean(strips[0], strips[1], "union")
            assert member(x) == member(u), (seed, cuts)
            i = polygon_boolean(strips[0], strips[2], "intersection")
            assert len(i.loops) == 0, (seed, cuts)


def test_constructed_results_pass_validation():
    """Every polygon built by the boolean ops must pass the validation
    scanner (no self-intersections, no cross-loop crossings, no
    duplicate vertices, no shared edges) — construction quality gate
    over the shared-boundary fixtures."""
    from s2_geometry_kotlin_spark.kernel.validation import \
        find_validation_error

    cases = []
    for op in ("union", "intersection", "difference",
               "symmetric_difference"):
        cases.append(polygon_boolean(W, E, op))
        cases.append(polygon_boolean(E, W, op))
    big = Polygon([Loop.from_latlng_text(
        "0:0, 0:10, 0:20, 10:20, 10:10, 10:0")])
    west = quad(0, 10, 0, 10)
    cases.append(polygon_boolean(big, west, "difference"))
    # T-junction rescue output
    a = Polygon([Loop.from_latlng_text("0:0, 0:10, 10:10, 10:0")])
    b = Polygon([Loop.from_latlng_text("3:10, 3:14, 7:14, 7:10")])
    cases.append(polygon_boolean(a, b, "union"))
    for k, p in enumerate(cases):
        if not p.loops:
            continue
        err = find_validation_error([lp.vertices for lp in p.loops])
        assert err is None, (k, err)
