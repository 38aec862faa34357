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