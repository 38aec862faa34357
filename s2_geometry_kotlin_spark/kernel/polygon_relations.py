"""Polygon/polygon and loop-boundary relations (SURVEY.md §2.4 P8,
completing loop_relations.py to multi-loop polygons).

Ports the loop-level machinery the reference uses for polygon
containment testing — containsNested (region/S2Loop.kt:769-790),
compareBoundary (:812-833), wedgeContainsSemiwedge — and composes them
into polygon relations.  The reference's S2Polygon.contains/intersects
delegate to S2BooleanOperation (S2Polygon.kt:587-639), which SURVEY §7
defers (B3); for non-degenerate inputs the boundary-relation
composition below is equivalent:

  A contains B  <=>  no boundary crossing, every B-loop's boundary is
                     inside region A, and no A-loop boundary is strictly
                     inside region B (an A-hole carving into B).
  A intersects B <=> any boundary crossing, or some B boundary inside
                     A, or some A boundary inside B.

Layer-side (small polygons); never on the page hot path.
"""

from __future__ import annotations

import numpy as np

from . import predicates as pred
from .loop_relations import wedge_contains
from .regions import Loop, Polygon


def find_vertex(a: Loop, p: np.ndarray) -> int:
    """Index of vertex p in loop a, or -1 (S2Loop.findVertex)."""
    for i, v in enumerate(a.vertices):
        if np.array_equal(v, p):
            return i
    return -1


def wedge_contains_semiwedge(a0, ab1, a2, b2, reverse_b: bool) -> bool:
    """True if wedge A contains the semi-wedge (edge ab1->b2 side of B)
    (S2LoopRelation.kt:148-155, used by containsNonCrossingBoundary)."""
    if np.array_equal(b2, a0) or np.array_equal(b2, a2):
        # shared or reversed edge
        return np.array_equal(b2, a0) == reverse_b
    return pred.ordered_ccw(a0, a2, b2, ab1)


def _loops_cross(a: Loop, b: Loop) -> bool:
    """Any proper interior crossing between boundary edges."""
    av, bv = a.vertices, b.vertices
    for i in range(len(av)):
        a0, a1 = av[i], av[(i + 1) % len(av)]
        for j in range(len(bv)):
            if pred.crossing_sign(a0, a1, bv[j],
                                  bv[(j + 1) % len(bv)]) > 0:
                return True
    return False


def contains_nested(a: Loop, b: Loop) -> bool:
    """S2Loop.containsNested (S2Loop.kt:769-790): given that A and B
    share no edges and either nest or are disjoint, does A contain B?"""
    if a.is_empty_or_full() or b.is_empty_or_full():
        # reference: isEmptyOrFull() || b.isEmptyOrFull() short-circuits
        # to isFull() || b.isEmpty() — the full loop contains everything
        # and every loop contains the empty loop (S2Loop.kt:771-772);
        # only 1-vertex canonical sentinels qualify
        return a.is_full() or b.is_empty()
    if len(a.vertices) < 3 or len(b.vertices) < 3:
        # malformed (2-vertex) input is neither a sentinel nor a valid
        # loop; refuse rather than misclassify (ADVICE r4)
        raise ValueError("contains_nested requires loops with >=3 "
                         "vertices or 1-vertex sentinels")
    if not a.rect_bound().contains_rect(b.rect_bound()) and \
            not a.rect_bound().intersects_rect(b.rect_bound()):
        return False
    m = find_vertex(a, b.vertices[1])
    if m < 0:
        return a.contains_point(b.vertices[1])
    n = len(a.vertices)
    return wedge_contains(a.vertices[(m - 1) % n], a.vertices[m],
                          a.vertices[(m + 1) % n],
                          b.vertices[0], b.vertices[2])


def compare_boundary(a: Loop, b: Loop, b_is_hole: bool = False) -> int:
    """S2Loop.compareBoundary (S2Loop.kt:812-833): +1 if A contains the
    boundary of B, -1 if A excludes it, 0 if they cross.  Shared edges:
    A contains edge XY iff Reversed(XY) == b_is_hole."""
    if not a.rect_bound().intersects_rect(b.rect_bound()):
        return -1
    # full loops are handled as though surrounding the whole sphere
    # (S2Loop.kt:819-821)
    if a.is_full():
        return 1
    if b.is_full():
        return -1
    if _loops_cross(a, b):
        return 0
    # shared vertices: process EVERY shared-vertex semiwedge, tracking
    # whether any B edge is contained and any excluded; both together
    # mean the boundaries cross (CompareBoundaryRelation.wedgesCross,
    # S2LoopRelation.kt:123-133)
    av, bv = a.vertices, b.vertices
    nb = len(bv)
    na = len(av)
    found_shared = False
    contains_edge = False
    excludes_edge = False
    for j in range(nb):
        m = find_vertex(a, bv[j])
        if m < 0:
            continue
        found_shared = True
        if wedge_contains_semiwedge(av[(m - 1) % na], av[m],
                                    av[(m + 1) % na],
                                    bv[(j + 1) % nb], b_is_hole):
            contains_edge = True
        else:
            excludes_edge = True
        if contains_edge and excludes_edge:
            return 0
    if found_shared:
        return 1 if contains_edge else -1
    return 1 if a.contains_point(bv[0]) else -1


def loop_depths(poly: Polygon) -> list[int]:
    """Nesting depth of each loop among its polygon's loops (holes have
    odd depth, S2Polygon.kt:236-238)."""
    out = []
    for i, li in enumerate(poly.loops):
        d = 0
        for j, lj in enumerate(poly.loops):
            if i != j and contains_nested(lj, li):
                d += 1
        out.append(d)
    return out


def _region_contains_boundary(poly: Polygon, lp: Loop,
                              lp_is_hole: bool = False) -> int:
    """+1 if region `poly` (even-odd over its loops) contains loop lp's
    boundary (the vanishingly-small side toward lp's polygon interior,
    per compareBoundary's shared-edge rule), -1 if excluded, 0 if any
    poly-loop crosses lp."""
    for al in poly.loops:
        if _loops_cross(al, lp):
            return 0
    # shared-vertex handling: compare per-loop semiwedges, composing by
    # parity — a shared vertex with exactly one A-loop reduces to that
    # loop's semiwedge verdict xor containment by the remaining loops
    for j in range(len(lp.vertices)):
        owners = [al for al in poly.loops
                  if find_vertex(al, lp.vertices[j]) >= 0]
        if not owners:
            return 1 if poly.contains_point(lp.vertices[j]) else -1
        if len(owners) == 1:
            al = owners[0]
            others_contain = False
            for ol in poly.loops:
                if ol is not al:
                    others_contain ^= ol.contains_point(lp.vertices[j])
            edge_in = compare_boundary(al, lp, lp_is_hole) > 0
            return 1 if (edge_in ^ others_contain) else -1
    return 1 if poly.contains_point(lp.vertices[0]) else -1


def polygon_contains_polygon(a: Polygon, b: Polygon) -> bool:
    """A contains B (region containment, boundary-relation composition).

    Shared-EDGE inputs beyond exact loop coincidence are B3 territory
    (S2BooleanOperation, deferred per SURVEY §7) — handled here only for
    the loop-coincidence case."""
    b_depths = loop_depths(b)
    for bl, d in zip(b.loops, b_depths):
        if _region_contains_boundary(a, bl, lp_is_hole=(d % 2 == 1)) <= 0:
            return False
    # an A-loop strictly inside region B would carve a hole out of B;
    # loops lying ON B's boundary (all vertices shared) don't carve
    for al in a.loops:
        shared = all(any(find_vertex(bl, v) >= 0 for bl in b.loops)
                     for v in al.vertices)
        if shared:
            continue
        r = _region_contains_boundary(b, al)
        if r == 0:
            return False
        if r > 0:
            # A's strictly-interior boundary inside B: a point just
            # outside this A-loop is in B but not in A
            return False
    return True


def polygon_intersects_polygon(a: Polygon, b: Polygon) -> bool:
    """A intersects B (shares at least one interior point)."""
    for al in a.loops:
        for bl in b.loops:
            if _loops_cross(al, bl):
                return True
    for bl in b.loops:
        if bool(a.contains_points(bl.vertices).any()):
            return True
    for al in a.loops:
        if bool(b.contains_points(al.vertices).any()):
            return True
    return False
