"""B3: constructive boolean operations on spherical polygons.

The reference exposes these as S2BooleanOperation
(index/shape/S2BooleanOperation.kt:191-229 — opType UNION / INTERSECTION /
DIFFERENCE / SYMMETRIC_DIFFERENCE; :429 build), executed there through
S2Builder graphs + CrossingProcessor (S2BooleanOperationImpl.kt,
CrossingProcessor.kt).  S2Polygon wraps them as
initToIntersection/Union/Difference (S2Polygon.kt:768-801).

This implementation is an independent construction on the repo's own
kernels — P2 crossingSign (predicates.py), M8 edge_intersection
(edges.py:129), P4/P5 xor containment (regions.py), loop_depths
(polygon_relations.py) — using the classic split/classify/stitch scheme:

1. orient every loop so the polygon interior is on the LEFT of its
   directed edges (holes, i.e. odd-depth loops of the xor model, are
   walked reversed);
2. split every edge of A at its proper crossings with edges of B (and
   vice versa); the crossing point is computed ONCE per edge pair and
   shared by both sides, so stitching keys match bit-for-bit;
3. keep each sub-edge according to the op's rule, testing the sub-edge
   midpoint against the OTHER polygon (uncrossed loops are kept or
   dropped whole by the same rule, which subsumes every
   containment/disjoint special case);
4. stitch kept directed sub-edges into loops by exact endpoint match.

Preconditions (the reference removes these with S2Builder snap rounding;
see builder_snap.py for the B1 path): polygons are valid, boundaries in
general position — no shared vertices, no overlapping edges, no
vertex-on-edge incidences.  Inputs violating this should be snapped
first (snap_polygon).
"""

from __future__ import annotations

import math

import numpy as np

from . import edges as ek
from . import predicates as pred
from .polygon_relations import loop_depths
from .regions import Loop, Polygon

OPS = ("intersection", "union", "difference", "symmetric_difference")


def oriented_boundary_loops(poly: Polygon) -> list[np.ndarray]:
    """Loops oriented interior-on-left: the xor model stores every loop
    as a disc (S2Polygon.kt:83-84 normalization), so odd-depth loops
    (holes) are reversed back to hole orientation."""
    if getattr(poly, "inverted", False):
        raise NotImplementedError(
            "boolean ops on inverted (more-than-half-sphere) polygons "
            "require the complement form; invert the operands instead")
    depths = loop_depths(poly)
    out = []
    for lp, d in zip(poly.loops, depths):
        v = lp.vertices
        out.append(v if d % 2 == 0 else v[::-1].copy())
    return out


def _edge_param(origin: np.ndarray, p: np.ndarray) -> float:
    """Monotone position of p along a geodesic edge leaving `origin`
    (edges are < pi, so the angle is monotone)."""
    d = float(np.clip(origin @ p, -1.0, 1.0))
    return math.acos(d)


def _split_edges(loops_a: list[np.ndarray], loops_b: list[np.ndarray]):
    """All directed sub-edges of A split at proper crossings with B.

    Returns (subedges_a, subedges_b): lists of (v0, v1) unit-vector
    pairs.  Crossing points are computed once per crossing pair and
    appear in both outputs, so endpoint keys match exactly."""
    ea = [(lv[i], lv[(i + 1) % len(lv)])
          for lv in loops_a for i in range(len(lv))]
    eb = [(lv[i], lv[(i + 1) % len(lv)])
          for lv in loops_b for i in range(len(lv))]
    cuts_a: list[list[np.ndarray]] = [[] for _ in ea]
    cuts_b: list[list[np.ndarray]] = [[] for _ in eb]
    for i, (a0, a1) in enumerate(ea):
        for j, (b0, b1) in enumerate(eb):
            if pred.crossing_sign(a0, a1, b0, b1) > 0:
                x = ek.edge_intersection(a0, a1, b0, b1)
                cuts_a[i].append(x)
                cuts_b[j].append(x)

    def subdivide(edges, cuts):
        out = []
        for (v0, v1), xs in zip(edges, cuts):
            if not xs:
                out.append((v0, v1))
                continue
            xs = sorted(xs, key=lambda p: _edge_param(v0, p))
            chain = [v0] + xs + [v1]
            out.extend((chain[k], chain[k + 1])
                       for k in range(len(chain) - 1))
        return out

    return subdivide(ea, cuts_a), subdivide(eb, cuts_b)


def _midpoint(v0: np.ndarray, v1: np.ndarray) -> np.ndarray:
    m = v0 + v1
    n = float(np.linalg.norm(m))
    if n == 0.0:  # antipodal endpoints cannot occur on a valid sub-edge
        raise ValueError("degenerate sub-edge")
    return m / n


def _stitch(subedges: list[tuple[np.ndarray, np.ndarray]]) \
        -> list[np.ndarray]:
    """Assemble directed sub-edges into closed loops by exact endpoint
    match (general position => each kept vertex has exactly one kept
    outgoing edge)."""
    by_start: dict[tuple, list[int]] = {}
    for i, (v0, _) in enumerate(subedges):
        by_start.setdefault((float(v0[0]), float(v0[1]), float(v0[2])),
                            []).append(i)
    used = [False] * len(subedges)
    loops = []
    for i in range(len(subedges)):
        if used[i]:
            continue
        verts = [subedges[i][0]]
        cur = i
        used[i] = True
        while True:
            end = subedges[cur][1]
            key = (float(end[0]), float(end[1]), float(end[2]))
            start_key = (float(verts[0][0]), float(verts[0][1]),
                         float(verts[0][2]))
            if key == start_key:
                break
            nxts = by_start.get(key)
            if not nxts:
                raise ValueError(
                    "boolean-op stitch failed: open chain (inputs not in "
                    "general position? snap them first)")
            nxt = next((k for k in nxts if not used[k]), None)
            if nxt is None:
                raise ValueError("boolean-op stitch failed: reused vertex")
            verts.append(end)
            used[nxt] = True
            cur = nxt
        if len(verts) >= 3:
            loops.append(np.asarray(verts, dtype=np.float64))
    return loops


# keep-rules per op: (keep A-sub iff mid-inside-B == this, reverse kept
# A-subs, same for B)
_RULES = {
    "intersection": (True, False, True, False),
    "union": (False, False, False, False),
    "difference": (False, False, True, True),
}


def clip_polyline(line_vertices: np.ndarray, poly: Polygon,
                  keep_inside: bool = True) -> list[np.ndarray]:
    """Polyline operand support (S2BooleanOperation accepts polyline
    layers; dimension-1 semantics of S2BooleanOperation.kt: a polyline
    INTERSECTION keeps the portions inside the polygon, a DIFFERENCE
    the portions outside).  Splits each polyline edge at its proper
    crossings with the polygon boundary and keeps each piece by its
    midpoint verdict — returns the kept sub-polylines in order, merged
    across consecutive kept pieces."""
    lb = oriented_boundary_loops(poly)
    pedges = [(lv[i], lv[(i + 1) % len(lv)])
              for lv in lb for i in range(len(lv))]
    pieces: list[np.ndarray] = []
    cur: list[np.ndarray] = []
    for i in range(len(line_vertices) - 1):
        a0, a1 = line_vertices[i], line_vertices[i + 1]
        xs = [ek.edge_intersection(a0, a1, b0, b1)
              for b0, b1 in pedges
              if pred.crossing_sign(a0, a1, b0, b1) > 0]
        chain = [a0] + sorted(xs, key=lambda p: _edge_param(a0, p)) + [a1]
        for k in range(len(chain) - 1):
            v0, v1 = chain[k], chain[k + 1]
            if poly.contains_point(_midpoint(v0, v1)) == keep_inside:
                if not cur:
                    cur = [v0]
                cur.append(v1)
            elif cur:
                pieces.append(np.asarray(cur))
                cur = []
    if cur:
        pieces.append(np.asarray(cur))
    return pieces


def polygon_boolean(a: Polygon, b: Polygon, op: str,
                    snap_on_failure: bool = True) -> Polygon:
    """A op B as a new Polygon (op: intersection | union | difference |
    symmetric_difference).  Semantics of
    S2Polygon.initToIntersection/Union/Difference (S2Polygon.kt:768-801)
    for operands in general position; symmetric difference follows
    S2BooleanOperation.OpType.SYMMETRIC_DIFFERENCE (S2BooleanOperation.kt
    opType) as (A-B) xor-composed with (B-A).  With snap_on_failure, a
    stitch failure triggers one B1 snap-rounding pass over both
    operands and a retry (dirty-input ingestion, see inline note)."""
    if op not in OPS:
        raise ValueError(f"op must be one of {OPS}")
    if snap_on_failure:
        try:
            return polygon_boolean(a, b, op, snap_on_failure=False)
        except ValueError:
            # general-position violation inside one operand (duplicate
            # vertices, near-degenerate edges): snap-round both operands
            # to level-20 cell centers (~10 m sites) — the reference's
            # S2Builder ingestion step — and retry once.  The snap
            # decision is made ONCE for the operand pair, so composed
            # ops (symmetric_difference = two differences) see the same
            # inputs on both legs and their seams match bit-for-bit.
            # Does NOT rescue operands sharing exact vertices/edges
            # with each other (those snap to the same sites; the
            # reference resolves them through CrossingProcessor's
            # vertex-crossing machinery — see polygon_boolean_shared).
            from .builder_snap import CellIdSnap, snap_polygon
            snap = CellIdSnap(20)
            return polygon_boolean(snap_polygon(a, snap),
                                   snap_polygon(b, snap), op,
                                   snap_on_failure=False)
    if op == "symmetric_difference":
        d1 = polygon_boolean(a, b, "difference", snap_on_failure=False)
        d2 = polygon_boolean(b, a, "difference", snap_on_failure=False)
        # the two differences are disjoint (boundaries may touch at the
        # original crossing points only), so the xor model composes them
        return Polygon([Loop(v.copy()) for p in (d1, d2)
                        for v in (lp.vertices for lp in p.loops)])
    la = oriented_boundary_loops(a)
    lb = oriented_boundary_loops(b)
    sub_a, sub_b = _split_edges(la, lb)
    want_a, rev_a, want_b, rev_b = _RULES[op]
    kept = []
    for v0, v1 in sub_a:
        if b.contains_point(_midpoint(v0, v1)) == want_a:
            kept.append((v1, v0) if rev_a else (v0, v1))
    for v0, v1 in sub_b:
        if a.contains_point(_midpoint(v0, v1)) == want_b:
            kept.append((v1, v0) if rev_b else (v0, v1))
    loops = _stitch(kept)
    return Polygon([Loop(v) for v in loops])
