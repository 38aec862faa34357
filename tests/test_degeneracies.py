"""B5 fixtures: degenerate edges and sibling pairs classified as
shells/holes (S2FindPolygonDegeneracies semantics)."""

import numpy as np

from s2_geometry_kotlin_spark.kernel import cellid as ck
from s2_geometry_kotlin_spark.kernel.degeneracies import (
    PolygonDegeneracy, find_polygon_degeneracies)


def _pts(lls):
    lat = np.array([p[0] for p in lls], dtype=np.float64)
    lon = np.array([p[1] for p in lls], dtype=np.float64)
    x, y, z = ck.latlng_deg_to_xyz(lat, lon)
    return np.stack([x, y, z], axis=1)


# a CCW square around (0, 0), ~2 degrees across
SQ = [(-1, -1), (-1, 1), (1, 1), (1, -1)]
SQ_EDGES = [(0, 1), (1, 2), (2, 3), (3, 0)]


def test_interior_sibling_pair_is_hole():
    verts = _pts(SQ + [(0.0, -0.2), (0.0, 0.2)])  # interior segment
    edges = SQ_EDGES + [(4, 5), (5, 4)]
    got = find_polygon_degeneracies(verts, edges)
    assert got == [PolygonDegeneracy(4, True), PolygonDegeneracy(5, True)]


def test_exterior_sibling_pair_is_shell():
    verts = _pts(SQ + [(5.0, 5.0), (5.0, 5.4)])   # far outside
    edges = SQ_EDGES + [(4, 5), (5, 4)]
    got = find_polygon_degeneracies(verts, edges)
    assert got == [PolygonDegeneracy(4, False),
                   PolygonDegeneracy(5, False)]


def test_self_loop_classified_by_location():
    verts = _pts(SQ + [(0.0, 0.0), (6.0, 0.0)])
    edges = SQ_EDGES + [(4, 4), (5, 5)]
    got = {d.edge_id: d.is_hole
           for d in find_polygon_degeneracies(verts, edges)}
    assert got == {4: True, 5: False}


def test_no_degeneracies():
    assert find_polygon_degeneracies(_pts(SQ), SQ_EDGES) == []


def test_fully_degenerate_graph():
    verts = _pts([(0.0, 0.0), (0.0, 1.0)])
    edges = [(0, 1), (1, 0)]
    empty = find_polygon_degeneracies(verts, edges,
                                      is_full_if_degenerate=False)
    full = find_polygon_degeneracies(verts, edges,
                                     is_full_if_degenerate=True)
    assert [d.is_hole for d in empty] == [False, False]
    assert [d.is_hole for d in full] == [True, True]


def test_unbalanced_multiset_pairs_minimum():
    """Three copies of (4,5) against one (5,4): exactly one pair
    cancels; the two unpaired copies are NOT degeneracies.  (Marking
    only — classifying an unbalanced graph needs the reference's
    contains-vertex-sign machinery, documented out of scope.)"""
    from s2_geometry_kotlin_spark.kernel.degeneracies import \
        mark_degeneracies
    edges = SQ_EDGES + [(4, 5), (4, 5), (4, 5), (5, 4)]
    got = mark_degeneracies(edges)
    assert got == [False] * 4 + [True, False, False, True]

# ---------------------------------------------------------------------------
# Reference parity: S2FindPolygonDegeneraciesUnitTest.kt fixtures,
# including the UNBALANCED attached-sibling-pair graphs the previous
# scoped version documented out (contains-vertex-sign path :309-371).
# ---------------------------------------------------------------------------

def _graph(loops_txt: str):
    """'lat:lng, lat:lng; ...' -> (vertices, edges) with exact-shared
    vertices deduplicated (the unit-test graphs attach spikes at loop
    vertices).  A single-vertex loop contributes a self edge."""
    vids: dict[tuple, int] = {}
    verts: list[tuple] = []
    edges: list[tuple[int, int]] = []
    for loop_txt in loops_txt.split(";"):
        loop_txt = loop_txt.strip()
        if not loop_txt:
            continue
        ids = []
        for tok in loop_txt.split(","):
            lat, lng = (float(t) for t in tok.strip().split(":"))
            key = (lat, lng)
            if key not in vids:
                vids[key] = len(verts)
                verts.append(key)
            ids.append(vids[key])
        if len(ids) == 1:
            edges.append((ids[0], ids[0]))
        else:
            edges.extend((ids[i], ids[(i + 1) % len(ids)])
                         for i in range(len(ids)))
    return _pts(verts), edges


def _expect(loops_txt: str, expected: dict[tuple[int, int], bool],
            is_full: bool = False):
    verts, edges = _graph(loops_txt)
    got = find_polygon_degeneracies(verts, edges,
                                    is_full_if_degenerate=is_full)
    got_map = {edges[d.edge_id]: d.is_hole for d in got}
    assert got_map == expected, (got_map, expected)
    assert len(got) == len(expected)


def test_ref_empty_and_no_degeneracies():
    _expect("", {})
    _expect("0:0, 0:1, 1:0", {})


def test_ref_point_shell():
    verts, edges = _graph("0:0")
    got = find_polygon_degeneracies(verts, edges)
    assert got == [PolygonDegeneracy(0, False)]


def test_ref_sibling_pair_shells_fully_degenerate():
    # two reversed triangles: every edge has its sibling -> fully
    # degenerate graph, classified by is_full_if_degenerate
    verts, edges = _graph("0:0, 0:1, 1:0; 1:0, 0:1, 0:0")
    got = find_polygon_degeneracies(verts, edges)
    assert len(got) == 6 and all(not d.is_hole for d in got)


def test_ref_attached_sibling_pair_shells_unbalanced():
    # triangle + spike attached at a triangle vertex, pointing OUTSIDE:
    # the non-degenerate remainder (triangle) is balanced but the graph
    # as a whole routes classification through the unbalanced-vertex
    # contains-vertex-sign path
    _expect("0:0, 0:1, 1:0; 1:0, 2:0",
            {(2, 3): False, (3, 2): False})


def test_ref_attached_sibling_pair_holes_unbalanced():
    # spike attached at a vertex, pointing INSIDE the triangle
    _expect("0:0, 0:3, 3:0; 0:0, 1:1",
            {(0, 3): True, (3, 0): True})


def test_ref_attached_shells_and_holes_mixed():
    _expect("0:0, 0:3, 3:0; 3:0, 1:1; 3:0, 5:5",
            {(2, 3): True, (3, 2): True, (2, 4): False, (4, 2): False})


def test_ref_degenerate_shells_outside_loop():
    _expect("0:0, 0:3, 3:3, 3:0; 4:4, 5:5; 6:6",
            {(4, 5): False, (5, 4): False, (6, 6): False})


def test_ref_degenerate_holes_within_loop():
    _expect("0:0, 0:5, 5:5, 5:0; 1:1, 2:2; 3:3",
            {(4, 5): True, (5, 4): True, (6, 6): True})


def test_ref_holes_within_full():
    # 'full' polygon contributes no edges; the rest is fully degenerate
    _expect("0:0", {(0, 0): True}, is_full=True)
    verts, edges = _graph("0:0, 0:1, 1:0; 1:0, 0:1, 0:0")
    got = find_polygon_degeneracies(verts, edges,
                                    is_full_if_degenerate=True)
    assert len(got) == 6 and all(d.is_hole for d in got)
