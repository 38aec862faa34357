"""Polygon validation: self-intersection / cross-loop error detection.

Reference: index/shape/S2CrossingEdgePairsScanner.kt
(findSelfIntersection :101-115, findCrossingError :211-256) with the
wedge classification from S2WedgeRelations.kt:45-74.  The reference
walks a shape index cell-by-cell to find candidate pairs; layers here
are driver-sized, so the scan is the brute-force pair sweep over the
same predicates (P2 crossingSign for interior crossings, the wedge
relation at shared vertices).  Rejected states and their upstream
error codes:

- LOOP_SELF_INTERSECTION: two edges of one loop properly cross;
- POLYGON_LOOPS_CROSS: edges of two different loops properly cross, or
  their wedges at a shared vertex properly overlap in both rotations;
- DUPLICATE_VERTICES: one loop visits a vertex twice;
- POLYGON_LOOPS_SHARE_EDGE: two loops share an edge (either direction).
"""

from __future__ import annotations

import numpy as np

from . import predicates as pred

WEDGE_EQUALS = "WEDGE_EQUALS"
WEDGE_PROPERLY_CONTAINS = "WEDGE_PROPERLY_CONTAINS"
WEDGE_IS_PROPERLY_CONTAINED = "WEDGE_IS_PROPERLY_CONTAINED"
WEDGE_PROPERLY_OVERLAPS = "WEDGE_PROPERLY_OVERLAPS"
WEDGE_IS_DISJOINT = "WEDGE_IS_DISJOINT"

LOOP_SELF_INTERSECTION = "LOOP_SELF_INTERSECTION"
POLYGON_LOOPS_CROSS = "POLYGON_LOOPS_CROSS"
DUPLICATE_VERTICES = "DUPLICATE_VERTICES"
POLYGON_LOOPS_SHARE_EDGE = "POLYGON_LOOPS_SHARE_EDGE"
LOOP_NOT_ENOUGH_VERTICES = "LOOP_NOT_ENOUGH_VERTICES"
INVALID_VERTEX = "INVALID_VERTEX"
EMPTY_OR_FULL_LOOP = "EMPTY_OR_FULL_LOOP"


def get_wedge_relation(a0, ab1, a2, b0, b2) -> str:
    """S2WedgeRelations.getWedgeRelation (:45-74): classify the wedges
    (a0, ab1, a2) and (b0, ab1, b2) sharing the center vertex ab1."""
    if np.array_equal(a0, b0) and np.array_equal(a2, b2):
        return WEDGE_EQUALS
    if pred.ordered_ccw(a0, a2, b2, ab1):
        # cases 1, 5, 6 (2 if a2 == b2)
        if pred.ordered_ccw(b2, b0, a0, ab1):
            return WEDGE_PROPERLY_CONTAINS
        return (WEDGE_IS_PROPERLY_CONTAINED if np.array_equal(a2, b2)
                else WEDGE_PROPERLY_OVERLAPS)
    if pred.ordered_ccw(a0, b0, b2, ab1):
        return WEDGE_IS_PROPERLY_CONTAINED
    return (WEDGE_IS_DISJOINT if pred.ordered_ccw(a0, b0, a2, ab1)
            else WEDGE_PROPERLY_OVERLAPS)


def find_validation_error(loops: list[np.ndarray]) -> tuple | None:
    """First validation error among the loops of one polygon (loops are
    vertex rings; orientation does not matter for these checks), or
    None if the boundary is valid.  Returns (code, chain_a, edge_a,
    chain_b, edge_b) mirroring findCrossingError's reporting."""
    loops = [np.asarray(lv, dtype=np.float64) for lv in loops]
    # structural pre-checks, in the reference's findValidationError
    # order (S2Loop.findValidationErrorNoIndex + S2Polygon checks):
    # vertices must be finite unit vectors; every non-sentinel loop
    # needs >= 3 vertices; the empty/full sentinel loops are only valid
    # as a polygon's SINGLE loop (S2PolygonIsValidUnitTest emptyLoop /
    # fullLoop / vertexCount / duplicateVertex cases)
    for li, lv in enumerate(loops):
        if not np.isfinite(lv).all():
            return (INVALID_VERTEX, li, 0, li, 0)
        norms = np.linalg.norm(lv, axis=1)
        if (np.abs(norms - 1.0) > 1e-12).any():
            return (INVALID_VERTEX, li, 0, li, 0)
        if len(lv) == 1:
            if len(loops) > 1:
                return (EMPTY_OR_FULL_LOOP, li, 0, li, 0)
            continue
        if len(lv) < 3:
            return (LOOP_NOT_ENOUGH_VERTICES, li, 0, li, 0)
        seen: dict = {}
        for i, v in enumerate(lv):
            k = (float(v[0]), float(v[1]), float(v[2]))
            if k in seen:
                return (DUPLICATE_VERTICES, li, seen[k], li, i)
            seen[k] = i
    edges = []  # (chain, offset, v0, v1)
    for li, lv in enumerate(loops):
        n = len(lv)
        for i in range(n):
            edges.append((li, i, lv[i], lv[(i + 1) % n]))

    def nxt(li: int, i: int) -> np.ndarray:
        lv = loops[li]
        return lv[(i + 2) % len(lv)]

    for x in range(len(edges)):
        la, ia, a0, a1 = edges[x]
        for y in range(x + 1, len(edges)):
            lb, ib, b0, b1 = edges[y]
            if la == lb:
                # skip adjacent edges of the same ring (AB, BC) — the
                # reference's need_adjacent=False optimization; their
                # shared vertex is checked through non-adjacent pairs
                n = len(loops[la])
                if (ia + 1) % n == ib or (ib + 1) % n == ia:
                    continue
            sign = pred.crossing_sign(a0, a1, b0, b1)
            if sign > 0:
                code = (LOOP_SELF_INTERSECTION if la == lb
                        else POLYGON_LOOPS_CROSS)
                return (code, la, ia, lb, ib)
            if sign < 0:
                continue
            # shared vertex: check each vertex once by requiring the
            # edges to share their END vertex (findCrossingError:224-228)
            if not np.array_equal(a1, b1):
                continue
            if la == lb:
                return (DUPLICATE_VERTICES, la, ia, lb, ib)
            a2 = nxt(la, ia)
            b2 = nxt(lb, ib)
            if np.array_equal(a0, b0) or np.array_equal(a0, b2):
                return (POLYGON_LOOPS_SHARE_EDGE, la, ia, lb, ib)
            # interior-on-left orientation: also test the complement
            # rotation (findCrossingError:244-255)
            if (get_wedge_relation(a0, a1, a2, b0, b2)
                    == WEDGE_PROPERLY_OVERLAPS and
                    get_wedge_relation(a0, a1, a2, b2, b0)
                    == WEDGE_PROPERLY_OVERLAPS):
                return (POLYGON_LOOPS_CROSS, la, ia, lb, ib)
    return None
