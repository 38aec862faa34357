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

Operands may share exact features with each other (the adjacent-admin-
polygons case): sub-edges of A that coincide exactly (same endpoint
coordinates) with sub-edges of B are classified by the SEMI_OPEN
shared-edge rules the reference implements through CrossingProcessor's
degenerate-edge accounting (CrossingProcessor.kt isDegenerate/sibling
handling; PolygonModel.SEMI_OPEN defaults of S2BooleanOperation.kt:287),
and vertices where four or more kept edges meet (shared vertices, pinch
points) are stitched with the planar-subdivision face rule: continue
with the next edge CLOCKWISE from the incoming direction in the tangent
plane, which is exactly the vertex-crossing resolution P3's
edgeOrVertexCrossing encodes (S2EdgeCrossings.kt:146-206).

Remaining preconditions: polygons are valid, and coincident features
either match EXACTLY (a border shared by two layers carrying identical
vertex coordinates — true for layer data ingested through one snap
pass) or are rescued by the auto-snap retry, which snaps the operand
PAIR against one shared site set (snap_polygon_pair): T-junction
incidences — a vertex of one operand in the interior of the other's
edge — become exact shared sub-edges after the junction site splits
the long edge.  The retry moves coordinates by at most the level-20
snap radius (~10 m); callers needing exact input coordinates must
pre-snap their layers to a shared grid instead.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

from . import edges as ek
from . import predicates as pred
from .polygon_relations import loop_depths
from .regions import Loop, Polygon

OPS = ("intersection", "union", "difference", "symmetric_difference")


def oriented_boundary_loops_any(poly: Polygon) -> list[np.ndarray]:
    """oriented_boundary_loops accepting the inverted
    (more-than-half-sphere) representation too: the boundary point set
    is identical, interior-on-left is the REVERSE of the complement's
    orientation."""
    if getattr(poly, "inverted", False):
        return [lo[::-1].copy()
                for lo in oriented_boundary_loops(poly.complement())]
    return oriented_boundary_loops(poly)


def oriented_boundary_loops(poly: Polygon) -> list[np.ndarray]:
    """Loops oriented interior-on-left: the xor model stores every loop
    as a disc (S2Polygon.kt:83-84 normalization), so odd-depth loops
    (holes) are reversed back to hole orientation."""
    if getattr(poly, "inverted", False):
        # internal invariant: polygon_boolean strips inversion via the
        # complement identities before classification reaches here
        raise AssertionError(
            "oriented_boundary_loops called with an inverted polygon; "
            "use Polygon.complement() first")
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


def _vkey(v: np.ndarray) -> tuple:
    return (float(v[0]), float(v[1]), float(v[2]))


# (The former tangent-plane nearest-clockwise junction rule lived here;
# loop assembly now goes through the reference left-turn map in
# builder_graph._left_turn_map, which handles touching multi-loop
# junctions with the rank-interleaved LIFO pairing.)


def _stitch(subedges: list[tuple[np.ndarray, np.ndarray]]) \
        -> list[np.ndarray]:
    """Assemble directed sub-edges into closed loops — UNIFIED onto the
    builder graph substrate (the reference's actual architecture: the
    boolean op emits an edge graph and the polygon layer assembles it,
    Graph.kt:945-953): endpoints are interned to vertex ids, the edge
    multiset runs through the polygon-layer GraphOptions policy
    (DegenerateEdges.DISCARD + SiblingPairs.DISCARD) and
    get_directed_loops with the geometric clockwise-face continuation,
    so one assembly path serves B1, B3 and B5."""
    from .builder_graph import assemble_polygon
    vid: dict[tuple, int] = {}
    verts: list[np.ndarray] = []
    edges: list[tuple[int, int]] = []
    for (v0, v1) in subedges:
        ids = []
        for v in (v0, v1):
            k = _vkey(v)
            if k not in vid:
                vid[k] = len(verts)
                verts.append(np.asarray(v, dtype=np.float64))
            ids.append(vid[k])
        edges.append((ids[0], ids[1]))
    rings, _degs = assemble_polygon(verts, edges)
    return [np.asarray([verts[i] for i in ring], dtype=np.float64)
            for ring in rings if len(ring) >= 3]


# keep-rules per op: (keep A-sub iff mid-inside-B == this, reverse kept
# A-subs, same for B)
_RULES = {
    "intersection": (True, False, True, False),
    "union": (False, False, False, False),
    "difference": (False, False, True, True),
}

# shared-edge keep rules (PolygonModel.SEMI_OPEN, the reference default:
# S2BooleanOperation.kt:287).  A sub-edge of A coinciding exactly with a
# sub-edge of B is kept at most ONCE, in A's direction.  Derivation by
# sides: with the interiors of A and B on the SAME side of the edge
# (same direction), the edge separates inside-both from outside-both —
# it is boundary of the union and of the intersection, interior to
# neither difference.  With the interiors on OPPOSITE sides (reversed
# direction, the adjacent-polygons border), both sides are inside the
# union (edge interior, drop), both sides outside the intersection
# (degenerate, SEMI_OPEN drops it), and A's side only is inside A - B
# (keep, A direction).
_SHARED_KEEP = {
    # (op, same_direction) -> keep?
    ("intersection", True): True,
    ("intersection", False): False,
    ("union", True): True,
    ("union", False): False,
    ("difference", True): False,
    ("difference", False): True,
}


def _match_shared(sub_a, sub_b):
    """Exact shared sub-edges between the operands: returns
    (shared_a: a-index -> same_direction, shared_b: set of b-indices)."""
    b_by_key: dict[tuple, int] = {}
    for j, (w0, w1) in enumerate(sub_b):
        b_by_key[(_vkey(w0), _vkey(w1))] = j
    shared_b: set = set()
    shared_a: dict[int, bool] = {}
    for i, (v0, v1) in enumerate(sub_a):
        j = b_by_key.get((_vkey(v0), _vkey(v1)))
        if j is not None:
            shared_a[i] = True
            shared_b.add(j)
            continue
        j = b_by_key.get((_vkey(v1), _vkey(v0)))
        if j is not None:
            shared_a[i] = False
            shared_b.add(j)
    return shared_a, shared_b


def _kept_subedges(a: Polygon, b: Polygon, op: str) \
        -> list[tuple[np.ndarray, np.ndarray]]:
    """Directed sub-edges of the boundary of (A op B): split, classify
    (midpoint PIP for generic sub-edges, _SHARED_KEEP for sub-edges the
    operands share exactly), orient per the op's rule."""
    la = oriented_boundary_loops(a)
    lb = oriented_boundary_loops(b)
    sub_a, sub_b = _split_edges(la, lb)
    shared_a, shared_b = _match_shared(sub_a, sub_b)
    want_a, rev_a, want_b, rev_b = _RULES[op]
    kept = []
    for i, (v0, v1) in enumerate(sub_a):
        if i in shared_a:
            if _SHARED_KEEP[(op, shared_a[i])]:
                kept.append((v0, v1))  # always A's direction
            continue
        if b.contains_point(_midpoint(v0, v1)) == want_a:
            kept.append((v1, v0) if rev_a else (v0, v1))
    for j, (v0, v1) in enumerate(sub_b):
        if j in shared_b:
            continue  # shared edges contribute at most A's copy
        if a.contains_point(_midpoint(v0, v1)) == want_b:
            kept.append((v1, v0) if rev_b else (v0, v1))
    return kept


def clip_polyline(line_vertices: np.ndarray, poly: Polygon,
                  keep_inside: bool = True,
                  polygon_model: str = "SEMI_OPEN") -> list[np.ndarray]:
    """Polyline operand support (S2BooleanOperation accepts polyline
    layers; dimension-1 semantics of S2BooleanOperation.kt: a polyline
    INTERSECTION keeps the portions inside the polygon, a DIFFERENCE
    the portions outside).  Splits each polyline edge at its proper
    crossings with the polygon boundary and keeps each piece by its
    midpoint verdict — returns the kept sub-polylines in order, merged
    across consecutive kept pieces.

    polygon_model decides polyline sub-edges that COINCIDE exactly with
    a polygon boundary edge (S2BooleanOperation.kt:119-127): SEMI_OPEN
    — "a polyline and polygon edge with the same endpoints intersect if
    and only if they are in the same direction" (:121-123), so a
    same-direction sub-edge counts as inside, a reversed one as
    outside; CLOSED — coincident sub-edges in either direction are
    inside ("the only model where polygons that touch ... along an edge
    intersect", :126-127); OPEN — polygons contain no edges, so both
    directions are outside (a polyline following the boundary does not
    intersect, :115-116)."""
    if polygon_model not in POLYGON_MODELS:
        raise ValueError(f"polygon_model must be one of {POLYGON_MODELS}")
    lb = oriented_boundary_loops(poly)
    pedges = [(lv[i], lv[(i + 1) % len(lv)])
              for lv in lb for i in range(len(lv))]
    fwd_keys = {(_vkey(b0), _vkey(b1)) for b0, b1 in pedges}
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
            k01 = (_vkey(v0), _vkey(v1))
            if k01 in fwd_keys or (k01[1], k01[0]) in fwd_keys:
                if polygon_model == "CLOSED":
                    inside = True
                elif polygon_model == "OPEN":
                    inside = False
                else:  # SEMI_OPEN: direction decides
                    inside = k01 in fwd_keys
            else:
                inside = poly.contains_point(_midpoint(v0, v1))
            if inside == keep_inside:
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
    operands and a retry (dirty-input ingestion, see inline note).
    Inverted (more-than-half-sphere) operands are supported via the
    complement identities — see the reduction block below."""
    if op not in OPS:
        raise ValueError(f"op must be one of {OPS}")
    ai = getattr(a, "inverted", False)
    bi = getattr(b, "inverted", False)
    if ai or bi:
        # inverted (more-than-half-sphere) operands reduce to ops on
        # their complements via De Morgan / difference identities
        # (S2Polygon.initToComplement composition); the result may need
        # one final complement, which is a parity-bit flip.
        a0 = a.complement() if ai else a
        b0 = b.complement() if bi else b
        s = snap_on_failure
        if op == "symmetric_difference":
            res = polygon_boolean(a0, b0, op, s)
            return res.complement() if (ai != bi) else res
        if op == "intersection":
            if ai and bi:   # c(A).c(B) = c(A+B)
                return polygon_boolean(a0, b0, "union", s).complement()
            if ai:          # c(A).B = B-A
                return polygon_boolean(b0, a0, "difference", s)
            return polygon_boolean(a0, b0, "difference", s)  # A.c(B)=A-B
        if op == "union":
            if ai and bi:   # c(A)+c(B) = c(A.B)
                return polygon_boolean(a0, b0, "intersection",
                                       s).complement()
            if ai:          # c(A)+B = c(A-B)
                return polygon_boolean(a0, b0, "difference",
                                       s).complement()
            return polygon_boolean(b0, a0, "difference",  # A+c(B)=c(B-A)
                                   s).complement()
        # difference
        if ai and bi:       # c(A)-c(B) = B-A
            return polygon_boolean(b0, a0, "difference", s)
        if ai:              # c(A)-B = c(A+B)
            return polygon_boolean(a0, b0, "union", s).complement()
        return polygon_boolean(a0, b0, "intersection", s)  # A-c(B)=A.B
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
            # Operands sharing exact vertices/edges with each other do
            # not need this rescue: _kept_subedges classifies exact
            # shared sub-edges directly (the CrossingProcessor
            # vertex-crossing analogue).  T-junction-style incidences
            # (a vertex of one operand on an edge of the other) DO
            # reach this path, and the pair must snap against ONE
            # shared site set: the junction vertex becomes a site that
            # splits the other operand's edge, turning the T into
            # exact shared sub-edges.
            from .builder_snap import CellIdSnap, snap_polygon_pair
            sa, sb = snap_polygon_pair(a, b, CellIdSnap(20))
            return polygon_boolean(sa, sb, op, snap_on_failure=False)
    if op == "symmetric_difference":
        # compose at the SUB-EDGE level: kept(A-B) + kept(B-A), then
        # cancel exact sibling pairs — an edge kept by both legs in
        # opposite directions (the shared border of adjacent operands)
        # is interior to the xor and must vanish (the B5 sibling-pair
        # rule of S2FindPolygonDegeneracies applied at build time)
        kept = _kept_subedges(a, b, "difference") + \
            _kept_subedges(b, a, "difference")
        index: dict[tuple, int] = {}
        cancelled = [False] * len(kept)
        for i, (v0, v1) in enumerate(kept):
            k_rev = (_vkey(v1), _vkey(v0))
            j = index.pop(k_rev, None)
            if j is not None:
                cancelled[i] = cancelled[j] = True
            else:
                index[(_vkey(v0), _vkey(v1))] = i
        kept = [e for i, e in enumerate(kept) if not cancelled[i]]
    else:
        kept = _kept_subedges(a, b, op)
    loops = _stitch(kept)
    return Polygon([Loop(v) for v in loops])


# ---------------------------------------------------------------------------
# B3 polygon boundary models (PolygonModel OPEN / SEMI_OPEN / CLOSED)
# ---------------------------------------------------------------------------

POLYGON_MODELS = ("OPEN", "SEMI_OPEN", "CLOSED")


@dataclass
class BooleanResult:
    """Result of a boolean op under an explicit PolygonModel
    (S2BooleanOperation.kt:114-130 model definitions; :287 SEMI_OPEN
    default).  The solid rings are MODEL-INDEPENDENT for polygon/polygon
    ops — the models determine which measure-zero DEGENERATE features
    the touching boundaries produce, which the reference emits as
    degenerate edges/points for the output layers to keep or discard
    ("the client can easily discard degeneracies", :94-95).  This repo's
    Polygon cannot carry degenerate edges (like S2Polygon, unlike
    S2LaxPolygonShape), so they are returned explicitly:

    - degenerate_edge_shells: isolated edges belonging to the result
      (CLOSED intersection of polygons touching along an edge — "the
      only model where polygons that touch at a vertex or along an edge
      intersect", :126-127).
    - degenerate_edge_holes: slit edges EXCLUDED from the otherwise
      solid result (OPEN union / OPEN+CLOSED symmetric difference of
      adjacent polygons: the shared border belongs to neither open
      operand, resp. to both closed ones, so the point set omits it).
    - degenerate_point_shells / _holes: the vertex-touch analogues.
    """
    polygon: Polygon
    degenerate_edge_shells: list = field(default_factory=list)
    degenerate_edge_holes: list = field(default_factory=list)
    degenerate_point_shells: list = field(default_factory=list)
    degenerate_point_holes: list = field(default_factory=list)


def polygon_boolean_full(a: Polygon, b: Polygon, op: str,
                         model: str = "SEMI_OPEN",
                         snap_on_failure: bool = True) -> BooleanResult:
    """polygon_boolean plus the PolygonModel-dependent degeneracies.

    SEMI_OPEN (the reference default) emits none: around any vertex /
    along any edge shared by tiling polygons, exactly one operand
    contains it (S2BooleanOperation.kt:119-123), so touching boundaries
    produce no measure-zero features.  OPEN and CLOSED do — see
    BooleanResult."""
    if model not in POLYGON_MODELS:
        raise ValueError(f"model must be one of {POLYGON_MODELS}")
    poly = polygon_boolean(a, b, op, snap_on_failure=snap_on_failure)
    res = BooleanResult(poly)
    if model == "SEMI_OPEN":
        return res
    # Inverted (more-than-half-sphere) operands need no special rules
    # here: inversion changes which side of the boundary is interior,
    # not the boundary itself, and every test below is region-semantic
    # — shared sub-edges are classified by interior-on-LEFT orientation
    # (inversion-aware via oriented_boundary_loops_any, the complement
    # identity applied to orientation), solid membership goes through
    # Polygon.contains_point (parity bit included), and the solid rings
    # come from polygon_boolean's own complement reduction.
    la = oriented_boundary_loops_any(a)
    lb = oriented_boundary_loops_any(b)
    sub_a, sub_b = _split_edges(la, lb)
    shared_a, _ = _match_shared(sub_a, sub_b)
    # shared sub-edges with the operand interiors on OPPOSITE sides
    # (the adjacent-border case); same-direction shared edges are
    # regular boundary in every model
    opp = [sub_a[i] for i, same in shared_a.items() if not same]
    if op == "intersection" and model == "CLOSED":
        res.degenerate_edge_shells = opp
    elif op == "union" and model == "OPEN":
        res.degenerate_edge_holes = opp
    elif op == "symmetric_difference":  # both OPEN and CLOSED slit it
        res.degenerate_edge_holes = opp
    # difference: the shared border lies on the result's regular rings
    # (or nowhere); its membership is the OUTPUT polygon's own boundary
    # interpretation, not an extra degeneracy — no emission.

    # shared vertices not already covered by a degenerate edge or lying
    # on a result ring exactly once (regular boundary vertex)
    averts = {}
    for lv in la:
        for v in lv:
            averts.setdefault(_vkey(v), v)
    bkeys = {_vkey(v) for lv in lb for v in lv}
    deg_edge_keys = {k for e in (res.degenerate_edge_shells +
                                 res.degenerate_edge_holes)
                     for k in (_vkey(e[0]), _vkey(e[1]))}
    ring_counts: dict[tuple, int] = {}
    for lp in poly.loops:
        for v in lp.vertices:
            k = _vkey(v)
            ring_counts[k] = ring_counts.get(k, 0) + 1
    for k, v in averts.items():
        if k not in bkeys or k in deg_edge_keys:
            continue
        cnt = ring_counts.get(k, 0)
        if op == "intersection" and model == "CLOSED":
            # isolated vertex touch: in both closed operands, but not in
            # (or on) the solid intersection
            if cnt == 0 and not poly.contains_point(v):
                res.degenerate_point_shells.append(v)
        elif ((op == "union" and model == "OPEN")
              or op == "symmetric_difference"):
            # pinch vertex: the solid result passes through it >= twice;
            # OPEN: in neither open operand; xor CLOSED: in both
            if cnt >= 2:
                res.degenerate_point_holes.append(v)
    return res
