"""Port of the reference polygon-layer suite
(dilivia/s2/builder/layers/S2PolygonLayerUnitTest.kt), directed-edge
cases, against assemble_polygon
(s2_geometry_kotlin_spark/kernel/builder_graph.py) + Polygon.

Pins the loop-stitching semantics: nested loops pass through unchanged,
sibling pairs across loops cancel (three loops merging into one), a
shell with touching CW holes decomposes into positive triangles, loops
touching at shared vertices stay separate, partial loops and
self-intersections fail loudly, and duplicate edges still assemble
before validation reports them.

Comparison is on the SET of rotation-normalized rings (loop order is
an S2Polygon.initNested artifact our Polygon does not replicate)."""

import numpy as np
import pytest

from s2_geometry_kotlin_spark.kernel import cellid as ck
from s2_geometry_kotlin_spark.kernel.builder_graph import assemble_polygon
from s2_geometry_kotlin_spark.kernel.regions import Loop, Polygon
from s2_geometry_kotlin_spark.kernel.textparser import parse_latlngs


def ring_pts(text: str) -> np.ndarray:
    lls = parse_latlngs(text)
    lat = np.array([a for a, _ in lls])
    lng = np.array([b for _, b in lls])
    x, y, z = ck.latlng_deg_to_xyz(lat, lng)
    return np.stack([x, y, z], axis=1)


def _loops_of(text: str) -> list[np.ndarray]:
    return [ring_pts(part) for part in text.split(";") if part.strip()]


def build(input_strs: list[str]) -> list[np.ndarray]:
    """Directed polygon-layer assembly: intern exact vertices, stitch
    with the polygon graph policy, return vertex rings."""
    vmap: dict[tuple, int] = {}
    verts: list[np.ndarray] = []

    def vid(p) -> int:
        t = tuple(p)
        if t not in vmap:
            vmap[t] = len(verts)
            verts.append(p)
        return vmap[t]

    edges = []
    for s in input_strs:
        for ring in _loops_of(s):
            ids = [vid(p) for p in ring]
            n = len(ids)
            edges.extend((ids[i], ids[(i + 1) % n]) for i in range(n))
    varr = np.array(verts) if verts else np.zeros((0, 3))
    rings, _degs = assemble_polygon(varr, edges)
    return [varr[r] for r in rings]


def build_undirected(input_strs: list[str]) -> list[np.ndarray]:
    """Undirected polygon-layer assembly (S2PolygonLayer with
    EdgeType.UNDIRECTED): double each input edge into a sibling pair
    (input ids on the forward copy only), apply the polygon graph
    policy for undirected graphs, take slot 0 of each undirected
    component, and normalize each loop to enclose at most half the
    sphere (S2PolygonLayer.kt:164-183)."""
    from s2_geometry_kotlin_spark.kernel.builder_graph import (
        NO_INPUT_ID, DegenerateEdges, DuplicateEdges, EdgeType,
        GraphOptions, SiblingPairs, get_undirected_components,
        process_edges)
    from s2_geometry_kotlin_spark.kernel.measures import loop_curvature
    vmap: dict[tuple, int] = {}
    verts: list[np.ndarray] = []

    def vid(p) -> int:
        t = tuple(p)
        if t not in vmap:
            vmap[t] = len(verts)
            verts.append(p)
        return vmap[t]

    edges, ids = [], []
    k = 0
    for s in input_strs:
        for ring in _loops_of(s):
            rid = [vid(p) for p in ring]
            n = len(rid)
            for i in range(n):
                edges.append((rid[i], rid[(i + 1) % n]))
                ids.append([k])
                edges.append((rid[(i + 1) % n], rid[i]))
                ids.append([])
                k += 1
    varr = np.array(verts) if verts else np.zeros((0, 3))
    opts = GraphOptions(EdgeType.UNDIRECTED, DegenerateEdges.DISCARD,
                        DuplicateEdges.KEEP, SiblingPairs.DISCARD)
    kept, kept_ids, _err = process_edges(opts, edges, input_ids=ids)
    min_ids = [min(s) if s else NO_INPUT_ID for s in kept_ids]
    comps = get_undirected_components(kept, varr,
                                      min_input_ids=min_ids)
    out = []
    for comp in comps:
        for loop in comp[0]:
            ring = varr[[kept[e][0] for e in loop]]
            if loop_curvature(ring) < 0:
                ring = ring[::-1].copy()
            out.append(ring)
    return out


def canon(ring: np.ndarray) -> tuple:
    """Rotation-normalized ring key (orientation-preserving)."""
    tups = [tuple(v) for v in ring]
    best = None
    for r in range(len(tups)):
        rot = tuple(tups[r:] + tups[:r])
        if best is None or rot < best:
            best = rot
    return best


def check(input_strs: list[str], expected_str: str):
    got = {canon(r) for r in build(input_strs)}
    want = {canon(r) for r in _loops_of(expected_str)}
    assert got == want, (got, want)
    # undirected assembly: complement 0 of each component, loops
    # normalized to enclose <= half the sphere — compare against the
    # expected rings normalized the same way
    from s2_geometry_kotlin_spark.kernel.measures import loop_curvature

    def norm(r):
        return r[::-1].copy() if loop_curvature(r) < 0 else r

    got_u = {canon(norm(r)) for r in build_undirected(input_strs)}
    want_u = {canon(norm(r)) for r in _loops_of(expected_str)}
    assert got_u == want_u, (got_u, want_u)


def check_unchanged(s: str):
    check([s], s)


def test_empty():
    assert build([""]) == []


def test_small_loop():
    check_unchanged("0:0, 0:1, 1:1")


def test_three_loops():
    # the second two loops are nested
    check_unchanged("0:1, 1:1, 0:0; 3:3, 3:6, 6:6, 6:3; "
                    "4:4, 4:5, 5:5, 5:4")


def test_three_loops_into_one():
    # two shells and one hole combine into one loop (shared opposite
    # sub-edges cancel)
    check(
        ["10:0, 0:0, 0:10, 5:10, 10:10, 10:5",
         "0:10, 0:15, 5:15, 5:10",
         "10:10, 5:10, 5:5, 10:5"],
        "10:5, 10:0, 0:0, 0:10, 0:15, 5:15, 5:10, 5:5")


def test_triangle_pyramid():
    # a big CCW triangle with 3 CW triangular holes decomposes into 6
    # positive triangles
    check(
        ["0:0, 0:2, 0:4, 0:6, 1:5, 2:4, 3:3, 2:2, 1:1",
         "0:2, 1:1, 1:3",
         "0:4, 1:3, 1:5",
         "1:3, 2:2, 2:4"],
        "0:4, 0:6, 1:5; 2:4, 3:3, 2:2; 2:2, 1:1, 1:3; 1:1, 0:0, 0:2; "
        "1:3, 0:2, 0:4; 1:3, 1:5, 2:4")


def test_complex_nesting():
    check_unchanged(
        "47:15, 47:5, 5:5, 5:15; "
        "35:12, 35:7, 27:7, 27:12; "
        "1:50, 50:50, 50:1, 1:1; "
        "42:22, 10:22, 10:25, 42:25; "
        "47:30, 47:17, 5:17, 5:30; "
        "7:27, 45:27, 45:20, 7:20; "
        "37:7, 37:12, 45:12, 45:7; "
        "47:47, 47:32, 5:32, 5:47; "
        "50:60, 50:55, 1:55, 1:60; "
        "25:7, 17:7, 17:12, 25:12; "
        "7:7, 7:12, 15:12, 15:7")


def test_five_loops_touching_at_one_common_point():
    check_unchanged("0:0, 0:10, 10:10, 10:0; 0:0, 1:9, 9:9, 9:1; "
                    "0:0, 2:8, 8:8, 8:2; 0:0, 3:7, 7:7, 7:3; "
                    "0:0, 4:6, 6:6, 6:4")


def test_four_nested_diamonds_touching_at_two_points_per_pair():
    check(
        ["0:10, -10:0, 0:-10, 10:0",
         "0:-20, -10:0, 0:20, 10:0",
         "0:-10, -5:0, 0:10, 5:0",
         "0:5, -5:0, 0:-5, 5:0"],
        "10:0, 0:10, -10:0, 0:20; 0:-20, -10:0, 0:-10, 10:0; "
        "5:0, 0:-10, -5:0, 0:-5; 0:5, -5:0, 0:10, 5:0")


def test_seven_diamonds_touching_at_one_point_per_pair():
    check_unchanged(
        "0:-70, -70:0, 0:70, 70:0; 0:-70, -60:0, 0:60, 60:0; "
        "0:-50, -60:0, 0:50, 50:0; 0:-40, -40:0, 0:50, 40:0; "
        "0:-30, -30:0, 0:30, 40:0; 0:-20, -20:0, 0:30, 20:0; "
        "0:-10, -20:0, 0:10, 10:0")


def _polyline_edges(text: str):
    pts = ring_pts(text)
    return pts


def test_partial_loop_raises():
    # open chains cannot assemble into loops
    pts = ring_pts("0:1, 2:3, 4:5")
    vmap, verts = {}, []

    def vid(p):
        t = tuple(p)
        if t not in vmap:
            vmap[t] = len(verts)
            verts.append(p)
        return vmap[t]

    edges = [(vid(pts[i]), vid(pts[i + 1])) for i in range(len(pts) - 1)]
    with pytest.raises(ValueError):
        assemble_polygon(np.array(verts), edges)


def test_invalid_polygon_detected():
    # "0:0, 0:10, 10:0, 10:10" self-intersects; assembly succeeds but
    # validation must reject it (LOOP_SELF_INTERSECTION)
    pts = ring_pts("0:0, 0:10, 10:0, 10:10")
    poly = Polygon([Loop(pts)])
    assert not poly.is_valid()


def test_duplicate_input_edges():
    # the closed walk 0:0,0:2,2:2,1:1,0:2,2:2,2:0,0:0 contains the
    # duplicate edge 0:2->2:2; assembly still yields the two loops, and
    # validation reports the shared edge
    pts = ring_pts("0:0, 0:2, 2:2, 1:1, 0:2, 2:2, 2:0, 0:0")
    vmap, verts = {}, []

    def vid(p):
        t = tuple(p)
        if t not in vmap:
            vmap[t] = len(verts)
            verts.append(p)
        return vmap[t]

    ids = [vid(p) for p in pts]
    edges = [(ids[i], ids[i + 1]) for i in range(len(ids) - 1)]
    varr = np.array(verts)
    rings, _ = assemble_polygon(varr, edges)
    got = {canon(varr[r]) for r in rings}
    want = {canon(ring_pts("0:0, 0:2, 2:2, 2:0")),
            canon(ring_pts("0:2, 2:2, 1:1"))}
    assert got == want
    poly = Polygon([Loop(varr[r]) for r in rings])
    assert not poly.is_valid()  # POLYGON_LOOPS_SHARE_EDGE
