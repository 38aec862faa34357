"""Two more shape-layer ports:

- S2CrossingEdgePairsScannerUnitTest.findSelfIntersectionBasic
  (:138-155) with the full cyclic-permutation sweep, against the
  validation scanner (any error == "has self intersection");
- S2ContainsVertexQueryUnitTest (:27-70) against the degeneracy
  finder's contains_vertex_sign."""

from __future__ import annotations

import numpy as np
import pytest

from s2_geometry_kotlin_spark.kernel.textparser import parse_latlngs
from s2_geometry_kotlin_spark.kernel import cellid as ck
from s2_geometry_kotlin_spark.kernel.validation import \
    find_validation_error


def pts(text):
    lls = parse_latlngs(text)
    x, y, z = ck.latlng_deg_to_xyz(np.array([t[0] for t in lls]),
                                   np.array([t[1] for t in lls]))
    return np.stack([x, y, z], axis=1)


SELF_INTERSECTION_CASES = [
    ("0:0, 0:1, 0:2, 1:2, 1:1, 1:0", False),
    ("0:0, 0:1, 0:2, 1:2, 0:1, 1:0", True),    # duplicate vertex
    ("0:0, 0:1, 1:0, 1:1", True),              # edge crossing
    ("0:0, 1:1, 0:1; 0:0, 1:1, 1:0", True),    # duplicate edge
    ("0:0, 1:1, 0:1; 1:1, 0:0, 1:0", True),    # reversed edge
    ("0:0, 0:2, 2:2, 2:0; 1:1, 0:2, 3:1, 2:0", True),  # vertex crossing
]


@pytest.mark.parametrize("case", range(len(SELF_INTERSECTION_CASES)))
def test_find_self_intersection_basic(case):
    """Every cyclic rotation of every loop must give the same
    verdict (testHasCrossingPermutations)."""
    text, has_crossing = SELF_INTERSECTION_CASES[case]
    loops = [pts(part) for part in text.split(";")]

    def sweep(i, current):
        if i == len(loops):
            got = find_validation_error(current) is not None
            assert got == has_crossing, (case, [len(c) for c in current])
            return
        base = loops[i]
        n = len(base)
        for j in range(n):
            rotated = np.vstack([base[j:], base[:j]])
            sweep(i + 1, current + [rotated])

    sweep(0, [])


def _query_sign(center_text, edges):
    """Build a one-vertex star graph and return contains_vertex_sign:
    edges = [(other_text, direction)] with +1 outgoing, -1 incoming."""
    from s2_geometry_kotlin_spark.kernel.degeneracies import _Finder
    verts = [pts(center_text)[0]]
    vid = {center_text: 0}
    pairs = []
    for other, d in edges:
        if other not in vid:
            vid[other] = len(verts)
            verts.append(pts(other)[0])
        if d > 0:
            pairs.append((0, vid[other]))
        else:
            pairs.append((vid[other], 0))
    f = _Finder(np.asarray(verts), pairs)
    return f.contains_vertex_sign(0)


def test_contains_vertex_query_fixtures():
    """:27-56: undetermined (matched pair), contained / not contained
    with duplicates — the unmatched edge immediately clockwise from
    ortho decides."""
    assert _query_sign("1:2", [("3:4", 1), ("3:4", -1)]) == 0
    assert _query_sign("0:0", [("3:-3", -1), ("1:-5", 1),
                               ("2:-4", 1), ("1:-5", -1)]) == 1
    assert _query_sign("1:1", [("1:-5", 1), ("2:-4", -1),
                               ("3:-3", 1), ("1:-5", -1)]) == -1


def test_contains_vertex_matches_loop_containment():
    """:56-70: for every vertex of a regular loop, the vertex query
    with edges (prev incoming, next outgoing) must agree with the
    loop's semi-open point containment."""
    from s2_geometry_kotlin_spark.kernel.regions import Loop
    from s2_geometry_kotlin_spark.sources.layers import \
        regular_loop_vertices
    v = regular_loop_vertices(89.0, -179.0, 10.0, 100)
    lp = Loop(v)
    from s2_geometry_kotlin_spark.kernel.degeneracies import _Finder
    n = len(v)
    for i in range(0, n, 7):
        verts = np.asarray([v[i], v[(i - 1) % n], v[(i + 1) % n]])
        f = _Finder(verts, [(1, 0), (0, 2)])
        q = f.contains_vertex_sign(0)
        assert lp.contains_point(v[i]) == (q > 0), i
